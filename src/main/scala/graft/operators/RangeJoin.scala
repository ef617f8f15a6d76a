package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-correct range (interval) joins.
  *
  * Spark plans `p.t BETWEEN b.lo AND b.hi` with no equality key as a
  * BroadcastNestedLoopJoin (or a cartesian product when neither side fits in
  * memory) — O(|probe|·|build|) comparisons, a non-starter at 100 TB. Here the
  * domain is tiled into fixed-width buckets: each interval is exploded to the
  * buckets it covers, each point to the single bucket containing it, and the
  * join becomes a shuffled equi-join on the bucket id with the range predicate
  * as a cheap residual filter. Cost is O(|probe| + |build|·span + matches)
  * where span = avg buckets per interval — pick `bucketWidth` near the typical
  * interval length so span stays O(1).
  *
  * Both joins operate on a LONG domain: callers convert timestamps with
  * `unix_micros`, dates with `datediff`, decimals by scaling — keeping this
  * operator agnostic of the time/number semantics (same contract as
  * zero-copy range partitioning in the engines this mirrors; ref
  * tripl-ai/arc-jupyter has no range join — this is a scale-path extension).
  */
object RangeJoin {

  /** Point-in-interval join: all (probe, build) pairs with
    * `lo <= point < hi` (closed-open, the natural window shape — adjacent
    * windows never double-claim a boundary point).
    *
    * Output: all probe columns + all build columns (caller pre-renames
    * clashes). Each matching pair appears exactly once — a point falls in
    * exactly one bucket, so no post-join dedup is needed.
    */
  def pointInInterval(
      probe: DataFrame,
      point: String,
      build: DataFrame,
      lo: String,
      hi: String,
      bucketWidth: Long
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = probe.withColumn("_rb", floorDiv(col(point), bucketWidth))
    // An interval [lo, hi) covers buckets floor(lo/w) .. floor((hi-1)/w);
    // empty intervals (hi <= lo) cover nothing and are dropped up front.
    val b = build
      .filter(col(lo) < col(hi))
      .withColumn(
        "_rb",
        explode(sequence(floorDiv(col(lo), bucketWidth), floorDiv(col(hi) - 1, bucketWidth)))
      )
    p.join(b, Seq("_rb"))
      .filter(col(lo) <= col(point) && col(point) < col(hi))
      .drop("_rb")
  }

  /** Interval-overlap join: all (left, right) pairs whose closed-open
    * intervals [aLo,aHi) and [bLo,bHi) intersect.
    *
    * Both sides explode to covered buckets, so a pair can meet in several
    * buckets; the pair is claimed ONLY in the bucket containing
    * max(aLo, bLo) — the first bucket where both are present — which yields
    * exactly-once output without a distinct/shuffle-dedup pass.
    */
  def intervalOverlap(
      left: DataFrame,
      aLo: String,
      aHi: String,
      right: DataFrame,
      bLo: String,
      bHi: String,
      bucketWidth: Long
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def tiled(df: DataFrame, lo: String, hi: String): DataFrame =
      df.filter(col(lo) < col(hi))
        .withColumn(
          "_rb",
          explode(sequence(floorDiv(col(lo), bucketWidth), floorDiv(col(hi) - 1, bucketWidth)))
        )
    tiled(left, aLo, aHi)
      .join(tiled(right, bLo, bHi), Seq("_rb"))
      .filter(col(aLo) < col(bHi) && col(bLo) < col(aHi))
      .filter(col("_rb") === floorDiv(greatest(col(aLo), col(bLo)), bucketWidth))
      .drop("_rb")
  }

  /** Floor division, exact over the whole long domain (a double division
    * would round above 2^53 — micros timestamps live at ~1.7e15 and nanos
    * beyond 2^53) and correct for negative values (buckets floor toward -inf
    * so the tiling stays contiguous across zero): subtract the positive
    * remainder, then divide the exact multiple as decimal.
    */
  private def floorDiv(c: org.apache.spark.sql.Column, w: Long) =
    ((c - pmod(c, lit(w))).cast("decimal(38,0)") / lit(w)).cast("long")
}
