package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-correct as-of join: for each probe row, the latest build-side row
  * at-or-before the probe's timestamp (DuckDB `ASOF LEFT JOIN ... ON
  * probe.t >= build.t`).
  *
  * The classic union+window formulation needs ONE globally time-ordered
  * window — a single task regardless of cluster size (the round-2 q45
  * finding). Here the time axis is range-bucketed (calendar month), so the
  * heavy window runs per-bucket, fully parallel; a second bucket-LEVEL pass —
  * whose input is one row per distinct month, not per data row — carries the
  * as-of boundary forward across buckets, and a broadcast join stitches the
  * two. No single-partition operator ever sees the raw data.
  */
object AsOfJoin {

  /** Unkeyed as-of: adds `outputCol` = max(build.buildTime) ≤ probe.probeTime
    * (null when no build row precedes the probe). Output columns:
    * (probeId, outputCol).
    *
    * `granularity` sets the time-bucket width (any `date_trunc` unit:
    * "year"…"hour"…"minute") — pick it so the densest bucket fits one task;
    * the carry-forward pass stays tiny either way (one row per distinct
    * bucket).
    */
  def latestBefore(
      probe: DataFrame,
      probeTime: String,
      probeId: String,
      build: DataFrame,
      buildTime: String,
      outputCol: String = "last_order_date",
      granularity: String = "month"
  ): DataFrame = {
    def bucket(t: Column): Column = date_trunc(granularity, t)
    // side '0' (build) sorts before '1' (probe) at equal timestamps, so a
    // build row landing exactly on a probe's timestamp is visible to it (>=).
    val p = probe.select(
      lit("1").as("_side"),
      col(probeTime).as("_t"),
      bucket(col(probeTime)).as("_bkt"),
      col(probeId).as(probeId),
      lit(null).cast("timestamp").as("_bt")
    )
    val b = build.select(
      lit("0").as("_side"),
      col(buildTime).as("_t"),
      bucket(col(buildTime)).as("_bkt"),
      lit(null).cast(probe.schema(probeId).dataType).as(probeId),
      col(buildTime).as("_bt")
    )
    val w = Window
      .partitionBy(col("_bkt"))
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val inBucket = p.unionByName(b)
      .withColumn("_last_in_bucket", last(col("_bt"), ignoreNulls = true).over(w))
    // Bucket-level carry-forward: per-bucket max of the build side, then a
    // running max over buckets with probe buckets sorted BEFORE same-bucket
    // summaries — a probe bucket therefore sees strictly-earlier buckets only
    // (its own bucket is already covered by the in-bucket pass). This window
    // is single-partition BY DESIGN over ~#distinct-months rows, not data.
    val summaries = build
      .groupBy(bucket(col(buildTime)).as("_bkt"))
      .agg(max(col(buildTime)).as("_bmax"))
      .withColumn("_ord", lit(1))
    val probeBuckets = probe
      .select(bucket(col(probeTime)).as("_bkt"))
      .distinct()
      .withColumn("_bmax", lit(null).cast("timestamp"))
      .withColumn("_ord", lit(0))
    val wb = Window.orderBy(col("_bkt"), col("_ord")).rowsBetween(Window.unboundedPreceding, 0)
    val carried = probeBuckets
      .unionByName(summaries.select("_bkt", "_bmax", "_ord"))
      .withColumn("_prior_max", max(col("_bmax")).over(wb))
      .filter(col("_ord") === 0)
      .select(col("_bkt"), col("_prior_max"))
    inBucket
      .filter(col("_side") === "1")
      .join(broadcast(carried), Seq("_bkt"), "left")
      .select(col(probeId), coalesce(col("_last_in_bucket"), col("_prior_max")).as(outputCol))
  }

  /** Keyed as-of: when the join has an equality key (the common production
    * shape — "latest quote per symbol before each trade"), the union+window
    * partitions by the key directly: one shuffle, parallel across keys, no
    * bucketing machinery needed. Output: probe columns + `outputCol`.
    */
  def keyedLatestBefore(
      probe: DataFrame,
      probeTime: String,
      keys: Seq[String],
      build: DataFrame,
      buildTime: String,
      outputCol: String = "asof_time"
  ): DataFrame = {
    val probeCols = probe.columns.toSeq
    val p = probe
      .withColumn("_side", lit("1"))
      .withColumn("_t", col(probeTime))
      .withColumn("_bt", lit(null).cast("timestamp"))
    val b0 = build.select((keys.map(col) :+ col(buildTime).as("_t")): _*)
    val b = probeCols.filterNot(c => keys.contains(c)).foldLeft(b0) { (df, c) =>
      df.withColumn(c, lit(null).cast(probe.schema(c).dataType))
    }
      .withColumn("_side", lit("0"))
      .withColumn("_bt", col("_t"))
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    p.unionByName(b.select(p.columns.map(col): _*))
      .withColumn(outputCol, last(col("_bt"), ignoreNulls = true).over(w))
      .filter(col("_side") === "1")
      .select((probeCols.map(col) :+ col(outputCol)): _*)
  }

  /** Keyed FORWARD as-of: for each probe row, the earliest build time
    * at-or-after the probe's timestamp (DuckDB `ASOF ... ON probe.t <=
    * build.t`). Same one-shuffle union+window shape as [[keyedLatestBefore]],
    * mirrored: probe rows sort BEFORE build rows at equal timestamps (so an
    * exactly-simultaneous build row matches), and the frame looks forward.
    */
  def keyedEarliestAfter(
      probe: DataFrame,
      probeTime: String,
      keys: Seq[String],
      build: DataFrame,
      buildTime: String,
      outputCol: String = "asof_time"
  ): DataFrame = {
    val probeCols = probe.columns.toSeq
    val p = probe
      .withColumn("_side", lit("0"))
      .withColumn("_t", col(probeTime))
      .withColumn("_bt", lit(null).cast("timestamp"))
    val b0 = build.select((keys.map(col) :+ col(buildTime).as("_t")): _*)
    val b = probeCols.filterNot(c => keys.contains(c)).foldLeft(b0) { (df, c) =>
      df.withColumn(c, lit(null).cast(probe.schema(c).dataType))
    }
      .withColumn("_side", lit("1"))
      .withColumn("_bt", col("_t"))
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(0, Window.unboundedFollowing)
    p.unionByName(b.select(p.columns.map(col): _*))
      .withColumn(outputCol, first(col("_bt"), ignoreNulls = true).over(w))
      .filter(col("_side") === "0")
      .select((probeCols.map(col) :+ col(outputCol)): _*)
  }
}
