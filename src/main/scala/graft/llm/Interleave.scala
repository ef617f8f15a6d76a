package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic weighted interleaving: materialize a training mix as ONE
  * total order in which each source appears at a specified rate — the "data
  * mixing schedule" step that turns per-source corpora into the sequential
  * stream a training reader consumes. Reference arc-jupyter has no ordering
  * stages; this is a scale-path extension like [[Sampling]] /
  * [[graft.core.GlobalOrder]].
  *
  * Semantics (weighted round-robin via virtual time): the row holding
  * within-source rank `i` (1-based, ordered by the salted md5 of `key` —
  * deterministic and unbiased, same discipline as every sampler) is
  * scheduled at virtual time `i / w_g` for source weight `w_g`. Sorting by
  * virtual time yields the classic stride schedule: a source with twice the
  * weight appears twice as often, uniformly spread, from the very first
  * rows — NOT blocks of one source followed by another. Any prefix of the
  * output is itself a mix at (approximately, ±1 per source) the target
  * rates, so truncated training runs still see the intended mixture.
  *
  * Determinism end to end: the md5 rank is exact; `i / w_g` is one
  * correctly-rounded IEEE division of an exact integer by the literal
  * weight, so any engine computes the identical virtual times; remaining
  * ties (equal vtime across sources, e.g. equal weights at equal rank)
  * break by (group, rank) — a total order, reproducible across engines,
  * retries, and partitionings.
  *
  * Scale shape: the within-source rank is [[Sampling.rankedByHash]] (a
  * dominant source ranks in parallel across slices — no per-group window
  * over data), and the global enumeration is
  * [[graft.core.GlobalOrder.withGlobalPosition]] (range-partitioned, never
  * a SinglePartition window). Weights live in a literal map (sources are
  * few; the map travels with the plan).
  */
object Interleave {

  /** Add `posCol`: the row's 0-based position in the interleaved order.
    * `weights` maps group values to positive rates (relative, not
    * normalized); `default` applies to unlisted groups.
    */
  def weightedInterleave(df: DataFrame, groupCol: String, weights: Map[String, Double],
      default: Double, key: Column, salt: String = "", posCol: String = "pos"): DataFrame = {
    require(default > 0, s"default weight must be positive, got $default")
    require(weights.values.forall(_ > 0), s"weights must be positive: $weights")
    val w = Sampling.groupRate(groupCol, weights, default)
    val h = md5(concat(key.cast("string"), lit(salt)))
    val ranked = Sampling.rankedByHash(df, Seq(groupCol), h)
      .withColumn("_vt", col("_rn").cast("double") / w)
    // pinned (the GlobalOrder default): rankedByHash's upstream checkpoint
    // makes the INPUT deterministic, but GlobalOrder range-partitions again
    // on _vt, and that boundary sampling is seeded per execution — without
    // its own pin the offsets job and the window job could land on
    // different boundaries and misnumber pos (duplicates/gaps) once
    // partitions outgrow the boundary sample
    graft.core.GlobalOrder
      .withGlobalPosition(ranked, Seq(col("_vt"), col(groupCol), col("_rn")), posCol)
      .drop("_vt", "_rn", "_n")
  }
}
