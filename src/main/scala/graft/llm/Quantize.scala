package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Let

/** Scalar int8 quantization of embedding columns — the standard 4× memory
  * shrink applied to ANN corpora before indexing (symmetric absmax scheme, as
  * used by faiss' SQ8 and every int8 embedding store).
  *
  *   scale = max_i |x_i|
  *   code_i = floor(x_i * 127 / scale + 0.5)   ∈ [-127, 127]
  *   dequant_i = code_i * scale / 127
  *
  * All arithmetic is IEEE-754 double with one operation per step, so results
  * are bit-identical across engines (the q35/q74 float-parity rule);
  * `floor(x + 0.5)` is used instead of `round` because round-half ties break
  * differently across engines. A zero vector quantizes to all-zero codes.
  *
  * Everything is built-in array expressions — a narrow, codegen'd projection
  * with zero shuffles, so quantizing a 100 TB embedding corpus is a single
  * scan. Aggregations over the result (`quantStats`) are order-independent
  * (integer sums, max) and therefore partition-layout-proof.
  */
object Quantize {

  /** absmax scale of a float/double array column, as DOUBLE. */
  def absmaxScale(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double"))))

  /** int8 codes (as array<int> for lossless transport). Non-finite inputs
    * are guarded explicitly: a NaN/±Inf element (or a NaN-poisoned scale)
    * makes the per-element expression NaN, and `nanvl` maps it to code 0 —
    * the same code a null element gets. Without the guard Spark's non-ANSI
    * NaN→int cast silently yields 0 while strict engines (DuckDB, ANSI
    * mode) raise — an engine-parity trap (q117's oracle mirrors the guard).
    */
  def int8Codes(vec: Column): Column =
    Let.bind(
      absmaxScale(vec),
      s =>
        transform(
          vec,
          x =>
            coalesce(
              nanvl(floor(x.cast("double") * 127d / nullif(s, lit(0d)) + 0.5d), lit(0d)),
              lit(0d)).cast("int")))

  /** Per-vector quantization report: dimension, scale, integer code
    * checksums (exact, order-independent), and the max absolute
    * reconstruction error (order-independent max of per-element IEEE ops).
    */
  def quantStats(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(
        col(idCol),
        col(vecCol).as("_v"),
        int8Codes(col(vecCol)).as("_c"),
        absmaxScale(col(vecCol)).as("scale"))
      .select(
        col(idCol),
        size(col("_v")).as("n_dim"),
        col("scale"),
        aggregate(col("_c"), lit(0L), (a, c) => a + c.cast("long")).as("code_sum"),
        aggregate(col("_c"), lit(0L), (a, c) => a + abs(c).cast("long")).as("code_l1"),
        array_max(
          zip_with(
            col("_v"),
            col("_c"),
            (x, c) => abs(x.cast("double") - c.cast("double") * col("scale") / 127d)))
          .as("max_abs_err"))
}
