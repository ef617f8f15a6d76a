package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.core.{Layout, PipelineContext, Runner}
import graft.load.ParquetLoad

/** Write-time clustering (core.Layout): the property under test is the one
  * scan-time skipping depends on — per-FILE min/max ranges of the clustered
  * keys are narrow (z-order) or fully disjoint (range clustering), where an
  * arrival-order write leaves every file spanning the whole domain.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def perFileRange(dir: String, c: String): Seq[(Double, Double)] = {
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    files.toSeq.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col(c).cast("double")), max(col(c).cast("double")))
        .head()
      (r.getDouble(0), r.getDouble(1))
    }
  }

  // deterministic "arrival order" frame: key uniform but shuffled, second
  // dimension anti-correlated so lexicographic clustering can't help it
  private def grid = spark.range(0, 4000).select(
    col("id"),
    pmod(col("id") * 2654435761L, lit(4000L)).as("x"),
    pmod(col("id") * 40503L + 7L, lit(4000L)).as("y"))

  test("cluster: per-file key ranges are disjoint; arrival order overlaps everywhere") {
    val base = Files.createTempDirectory("layout").toString
    grid.repartition(4).write.parquet(s"$base/plain")
    Layout.cluster(grid, Seq("x"), Some(4)).write.parquet(s"$base/clustered")

    def overlaps(rs: Seq[(Double, Double)]): Int =
      rs.combinations(2).count { case Seq((lo1, hi1), (lo2, hi2)) => lo1 <= hi2 && lo2 <= hi1 }

    val plain = perFileRange(s"$base/plain", "x")
    val clustered = perFileRange(s"$base/clustered", "x")
    assert(clustered.size >= 3, s"expected several files, got ${clustered.size}")
    assert(overlaps(clustered) == 0, s"clustered ranges overlap: $clustered")
    assert(overlaps(plain) > 0, s"arrival-order write unexpectedly clustered: $plain")
    // and the data survives intact
    assert(spark.read.parquet(s"$base/clustered").count() == 4000)
  }

  test("zorder: BOTH dimensions tighten per file; single-key clustering leaves y wide") {
    val base = Files.createTempDirectory("layout").toString
    Layout.cluster(grid, Seq("x"), Some(8)).write.parquet(s"$base/by_x")
    Layout.zorder(grid, Seq("x", "y"), bits = 8, numPartitions = Some(8))
      .write.parquet(s"$base/zorder")

    def avgSpan(dir: String, c: String): Double = {
      val rs = perFileRange(dir, c)
      rs.map { case (lo, hi) => hi - lo }.sum / rs.size
    }
    val domain = 4000.0
    // x-clustering: x disjoint (tiny spans) but y spans ~the whole domain
    assert(avgSpan(s"$base/by_x", "x") < domain / 4, "x clustering failed")
    assert(avgSpan(s"$base/by_x", "y") > domain * 0.8, "y should be unclustered here")
    // z-order: both spans strictly narrower than the domain — every file
    // skippable on either predicate dimension
    val zx = avgSpan(s"$base/zorder", "x")
    val zy = avgSpan(s"$base/zorder", "y")
    assert(zx < domain * 0.6, s"zorder x span too wide: $zx")
    assert(zy < domain * 0.6, s"zorder y span too wide: $zy")
    assert(spark.read.parquet(s"$base/zorder").count() == 4000)
  }

  test("zorderValue: null-safe, bounded, rejects bit overflow") {
    val df = Seq[(java.lang.Long, java.lang.Long)]((1L, 2L), (null, 3L), (5L, null))
      .toDF("a", "b")
    val vals = df.select(Layout.zorderValue(df, Seq("a", "b"), bits = 4)).as[Long].collect()
    assert(vals.length == 3 && vals.forall(v => v >= 0 && v < (1L << 8)))
    intercept[IllegalArgumentException] {
      Layout.zorderValue(df, Seq("a", "b"), bits = 32)
    }
  }

  test("ParquetLoad clusterBy/zOrderBy wire through the stage and HOCON config") {
    val base = Files.createTempDirectory("layout").toString
    val ctx = new PipelineContext(spark)
    grid.createOrReplaceTempView("grid_in")
    ctx.register("grid_in", grid)
    Runner.run(Seq(
      ParquetLoad("load_c", "grid_in", s"$base/stage_c", clusterBy = Seq("x"),
        numPartitions = Some(4)),
      ParquetLoad("load_z", "grid_in", s"$base/stage_z", zOrderBy = Seq("x", "y"),
        numPartitions = Some(4))
    ), ctx)
    def overlaps(rs: Seq[(Double, Double)]): Int =
      rs.combinations(2).count { case Seq((lo1, hi1), (lo2, hi2)) => lo1 <= hi2 && lo2 <= hi1 }
    assert(overlaps(perFileRange(s"$base/stage_c", "x")) == 0)
    assert(spark.read.parquet(s"$base/stage_z").count() == 4000)
    // HOCON parse carries the layout options through to the stage
    val stages = graft.core.PipelineConfig.parse(
      s"""{"stages":[{"type":"ParquetLoad","name":"l","inputView":"grid_in",
          "outputURI":"$base/hocon_out","clusterBy":["x"],"numPartitions":2}]}""")
    stages.head match {
      case p: ParquetLoad => assert(p.clusterBy == Seq("x"))
      case other          => fail(s"unexpected stage $other")
    }
  }
}

class QuantileBinSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("native binary-search bin matches the composable filter-count form") {
    val bounds = Array(1.0, 2.0, 2.0, 5.5, 9.0) // duplicates: approxQuantile emits them
    val vals = Seq[java.lang.Double](0.0, 1.0, 1.5, 2.0, 5.5, 8.0, 9.0, 99.0,
      Double.NaN, null).toDF("v")
    val native = vals.select(
      coalesce(graft.functions.QuantileBinExpr.quantile_bin($"v", bounds), lit(0)).as("b"))
      .as[Int].collect().toSeq
    val composable = vals.select(
      size(filter(array(bounds.toSeq.map(lit): _*), b => b <= $"v")).as("b"))
      .as[Int].collect().toSeq
    assert(native == composable, s"native=$native composable=$composable")
    // Spark double ordering: NaN above everything → top bin; null → 0
    assert(native(8) == bounds.length && native(9) == 0)
  }
}
