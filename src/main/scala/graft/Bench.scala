package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: run every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, print ONE JSON line {"metric","value","unit","queries","sf"}.
  *
  * Each query is forced with a noop-format write: every operator including
  * final projections executes (a bare .count() lets Catalyst prune the
  * projection, under-measuring scalar-heavy queries) with no driver-side
  * result materialization. A warmup pass on the flagship query pays the
  * one-time codegen/JIT cost so per-query numbers reflect steady-state
  * execution.
  *
  * Each query is timed twice and the MIN is reported: steady-state cost,
  * robust to one-off stalls (GC pause, ambient machine contention — r03 saw a
  * 3 s query read 353 s from a single such stall).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warmup: JIT + codegen + filesystem metadata
    try force(SparkEntry.queries("q01_agg_pricing_summary")(spark, sfDir))
    catch { case _: Throwable => }
    // Optional args: run only the named queries (ad-hoc profiling).
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (k, _) => args.contains(k) }
    // Returns (seconds, succeeded). A query that throws must NOT be reported
    // with a normal-looking timing — min-of-2 would otherwise let one green
    // run mask one crash entirely.
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok = try { force(fn(spark, sfDir)); true } catch {
        case t: Throwable =>
          System.err.println(s"[bench] query failed: ${t.getClass.getSimpleName}: ${t.getMessage}")
          false
      }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (t1, ok1) = timeOnce(fn)
      val (t2, ok2) = timeOnce(fn)
      val succeeded = Seq((t1, ok1), (t2, ok2)).filter(_._2).map(_._1)
      // min of the successful runs; a query with zero successful runs is an err
      (name, if (succeeded.nonEmpty) Some(succeeded.min) else None)
    }
    val qs = results.map {
      case (k, Some(v)) => "\"" + k + "\":" + f"$v%.3f"
      case (k, None)    => "\"" + k + "\":\"err\""
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, None) => "\"" + k + "\"" }
    val total = results.flatMap(_._2).sum
    val json = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":${failed.mkString("[", ",", "]")},"sf":"$sfDir"}"""
    // Truncation-proofing: the driver tails a verbose sbt log, and r04 lost
    // the head of this (single, very long) line. Persist to a file first,
    // then print.
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("/root/repo/bench_out.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case t: Throwable => System.err.println(s"[bench] file write failed: ${t.getMessage}") }
    println(json)
    spark.stop()
  }
}
