package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch as a DataFrame: approximate frequencies for
  * unbounded-cardinality keys (token streams, URL hosts, user ids) in
  * O(depth·width) space, with the classic one-sided guarantee
  * `exact ≤ estimate ≤ exact + (2/width)·N` (w.h.p. over seeds).
  *
  * Deterministic by construction: row `d` hashes a key to bucket
  * `hex32(md5(key ':' d)) mod width` — md5 and the 32-bit hex prefix are
  * engine-universal, so an external engine rebuilds the exact same matrix
  * (q141's DuckDB oracle does, cell for cell). Contrast
  * `spark.util.sketch.CountMinSketch`, whose murmur layout is
  * JVM-implementation-specific and whose driver-side `Aggregate` can't be
  * incrementally merged from stored segments.
  *
  * Scale shape: the build is a narrow map (key → depth tiny (d,b) pairs)
  * into ONE map-side-combined shuffle bounded by depth·width cells — the
  * corpus text never shuffles, and no driver state exists at any point.
  * Segments are plain DataFrames: persist them as parquet per batch and
  * [[merge]] (cell-wise sum — CMS is a linear sketch) to get the corpus
  * sketch without re-reading raw data, exactly like
  * [[SketchStats]]' HLL segments.
  */
object CmsSketch {

  private def bucket(key: Column, d: Column, width: Int): Column =
    conv(substring(md5(concat(key, lit(":"), d.cast("string"))), 1, 8), 16, 10)
      .cast("long") % width

  /** Build the depth×width count matrix over `key` (one increment per row,
    * or `weight` per row). Output schema: (d, b, cnt) — at most depth·width
    * rows regardless of input size.
    *
    * The per-key weights are aggregated BEFORE any hashing (guide §2.3,
    * applied to compute: the md5 bucket hash — the build's dominant
    * per-row cost — then runs depth times per DISTINCT key instead of
    * depth times per row; real frequency streams repeat keys heavily).
    * The matrix is identical cell-for-cell: summing weights per key and
    * then adding the sum to the key's buckets ≡ adding each row's weight
    * to the same buckets.
    */
  def build(df: DataFrame, key: Column, depth: Int = 4, width: Int = 1024,
      weight: Column = lit(1L)): DataFrame = {
    require(depth > 0 && width > 0, s"depth/width must be positive, got $depth/$width")
    df.select(key.cast("string").as("_k"), weight.cast("long").as("_w"))
      .groupBy("_k").agg(sum("_w").as("_w"))
      .select(explode(array((0 until depth).map(lit): _*)).as("d"), col("_k"), col("_w"))
      .withColumn("b", bucket(col("_k"), col("d"), width))
      .groupBy("d", "b").agg(sum("_w").as("cnt"))
  }

  /** Cell-wise sum of sketch segments (all built with the same depth/width
    * — CMS is linear, so merge-then-estimate ≡ build-over-the-union).
    */
  def merge(segments: DataFrame): DataFrame =
    segments.groupBy("d", "b").agg(sum("cnt").as("cnt"))

  /** Point estimates for a set of probe keys: min over the depth rows of
    * the key's bucket counts. The sketch is at most depth·width rows —
    * broadcast — so probing any number of keys is a narrow map plus a
    * broadcast join; a bucket no probe key ever touched contributes 0 via
    * the left join's coalesce.
    */
  def estimate(sketch: DataFrame, keys: DataFrame, key: Column, depth: Int = 4,
      width: Int = 1024, estCol: String = "est"): DataFrame = {
    require(depth > 0 && width > 0, s"depth/width must be positive, got $depth/$width")
    val probes = keys
      .select(key.cast("string").as("_k"), struct(keys.columns.map(col): _*).as("_row"))
      .select(col("_row"), col("_k"),
        explode(array((0 until depth).map(lit): _*)).as("d"))
      .withColumn("b", bucket(col("_k"), col("d"), width))
    probes
      .join(broadcast(sketch), Seq("d", "b"), "left")
      .groupBy("_row")
      .agg(min(coalesce(col("cnt"), lit(0L))).as(estCol))
      .select(col("_row.*"), col(estCol))
  }
}
