package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md "Optimize for scale": salting for
  * skew). AQE's skew-join handling covers sort-merge joins automatically;
  * explicit salting is for the cases AQE can't split — aggregations on a hot
  * key and shuffle joins where one key dominates a whole executor.
  *
  * Salting is deterministic (hash of secondary columns, never `rand()`), so
  * results are reproducible and retried tasks stay consistent.
  */
object Skew {

  /** Deterministic salt in [0, factor) derived from the given columns (use
    * high-cardinality payload columns, not the skewed key itself).
    */
  def salt(factor: Int, from: Column*): Column =
    pmod(hash(from: _*), lit(factor))

  /** Two-phase skew-safe aggregation: groupBy (keys + salt) computes partial
    * aggregates across `factor` buckets, then a second narrow aggregation
    * merges buckets. The hot key's rows spread over `factor` reducers in
    * phase 1 instead of melting one.
    *
    * `partials` aggregate the raw rows; `merges` combine the partial columns
    * (e.g. partial `sum(x) as s` merged by `sum(s) as s`).
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      saltFrom: Seq[String],
      factor: Int,
      partials: Seq[Column],
      merges: Seq[Column]
  ): DataFrame = {
    val salted = df.withColumn("_salt", salt(factor, saltFrom.map(col): _*))
    val phase1 = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(merges.head, merges.tail: _*)
  }

  /** Skew-safe equi-join: the (large, skewed) left side gets a deterministic
    * salt; the right side is exploded `factor`× so every salted left row still
    * finds its match. Right-side explosion costs `factor`× its size — use for
    * moderate dimension tables with a hot join key when broadcast is too big
    * and AQE can't split the key.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      factor: Int,
      joinType: String = "inner"
  ): DataFrame = {
    // right/full outer would duplicate every unmatched right row `factor`×
    // (each exploded copy fails to match independently); left outer and semi
    // are safe because only the un-exploded left side drives the output.
    val allowed = Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti", "cross")
    require(
      allowed.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports ${allowed.mkString("/")} — '$joinType' would duplicate unmatched right rows ${factor}x")
    val saltCols = left.columns.filterNot(keys.contains).map(col)
    val saltedLeft = left.withColumn(
      "_salt",
      if (saltCols.isEmpty) pmod(spark_partition_id(), lit(factor)) else salt(factor, saltCols: _*)
    )
    val explodedRight = right.withColumn("_salt", explode(sequence(lit(0), lit(factor - 1))))
    saltedLeft
      .join(explodedRight, keys :+ "_salt", joinType)
      .drop("_salt")
  }
}
