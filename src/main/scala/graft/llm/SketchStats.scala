package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental corpus accounting with mergeable HLL sketches (Spark's
  * DataSketches-backed `hll_sketch_agg`/`hll_union_agg`).
  *
  * The 100 TB problem this solves: "distinct documents / users / tokens per
  * source" over a corpus that grows daily. An exact COUNT(DISTINCT) rescans
  * everything on every refresh; a plain approx_count_distinct per batch
  * cannot be combined later. A sketch SEGMENT — one row per group with a
  * binary sketch per tracked column — is small (KBs per group), writes to
  * parquet like any other table, and merges associatively: register-wise max,
  * so merge order and batch boundaries cannot change the estimate. Daily
  * cost is O(batch); corpus-wide numbers come from merging segment files
  * only.
  *
  * Scale shape: `segment` is one partial+final aggregate keyed on the group
  * columns (sketches combine map-side, so the exchange carries one sketch
  * per group per partition, never raw values). `merge` aggregates segment
  * ROWS — input size = groups × batches, independent of corpus row count.
  */
object SketchStats {

  /** Build a sketch segment: per `groupCols` row counts + one HLL sketch per
    * `sketchCols` entry. `lgK` trades size for accuracy (2^lgK registers;
    * 12 → ~1.6 KB per sketch, ~2% relative error).
    */
  def segment(
      df: DataFrame,
      groupCols: Seq[String],
      sketchCols: Seq[String],
      lgK: Int = 12): DataFrame = {
    require(sketchCols.nonEmpty, "sketchCols must not be empty")
    val aggs: Seq[Column] =
      count(lit(1)).as("n_rows") +:
        sketchCols.map(c => hll_sketch_agg(col(c), lit(lgK)).as(s"${c}_sketch"))
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge sketch segments (the union of any number of [[segment]] outputs,
    * e.g. read back from parquet) into per-group totals and distinct
    * estimates. Register-max union: associative and commutative, so any
    * batch split of the data yields the identical estimate.
    */
  def merge(
      segments: DataFrame,
      groupCols: Seq[String],
      sketchCols: Seq[String]): DataFrame = {
    require(sketchCols.nonEmpty, "sketchCols must not be empty")
    val aggs: Seq[Column] =
      sum(col("n_rows")).as("n_rows") +:
        sketchCols.map(c =>
          hll_sketch_estimate(hll_union_agg(col(s"${c}_sketch"), lit(true)))
            .as(s"${c}_distinct"))
    segments.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** One-shot convenience: estimates straight from the raw data (a segment
    * build + merge collapsed into a single aggregate).
    */
  def estimate(
      df: DataFrame,
      groupCols: Seq[String],
      sketchCols: Seq[String],
      lgK: Int = 12): DataFrame = {
    val aggs: Seq[Column] =
      count(lit(1)).as("n_rows") +:
        sketchCols.map(c =>
          hll_sketch_estimate(hll_sketch_agg(col(c), lit(lgK)))
            .as(s"${c}_distinct"))
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
