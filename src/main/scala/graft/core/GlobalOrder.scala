package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global enumeration: assign each row its 0-based position in
  * the total order defined by `order` — without ever collapsing the data to
  * one partition. The naive `row_number() OVER (ORDER BY ...)` plans a
  * SinglePartition window: every row through one task, the classic
  * 100 TB cliff.
  *
  * Shape: range-repartition on the order keys (so partition i holds keys
  * strictly below partition i+1), count rows per partition (a tiny
  * aggregation — one long per partition), then a per-partition row_number
  * plus the partition's cumulative offset from a literal map. Work per
  * partition is independent; the only global structure is the offsets map
  * (numPartitions entries on the driver, broadcast with the plan).
  *
  * The order must be TOTAL (add a unique tiebreaker to `order`) — ties
  * across a partition boundary would otherwise make positions
  * partitioning-dependent.
  *
  * Two jobs run over the ranged frame: the offsets collect and the final
  * window pass. The ranged frame is pinned ([[Lineage.pin]]) between them,
  * so both jobs are guaranteed to see the SAME partitioning. The pin is
  * required even for a fully deterministic input: `repartitionByRange`
  * picks its boundaries by SAMPLING the data with a seed derived from the
  * RDD id, which is assigned fresh per execution — once partitions are
  * large enough that the sample is partial, two executions of the same
  * plan can legally choose different boundaries, and the collected offsets
  * would then misnumber the second job's rows (silent duplicates/gaps in
  * `pos`). `pin = false` exists ONLY for plan inspection in tests (the
  * checkpoint truncates the visible plan at a scan); never execute an
  * unpinned frame twice.
  *
  * Main use: deterministic corpus shuffling for training order —
  * `withGlobalPosition(docs, Seq(md5(concat(id, lit(salt))), id))` gives
  * every doc a stable pseudo-random rank, reproducible across reruns and
  * retries (same rationale as [[graft.llm.Sampling]]'s salted md5).
  */
object GlobalOrder {

  def withGlobalPosition(
      df: DataFrame,
      order: Seq[Column],
      posCol: String = "pos",
      numPartitions: Option[Int] = None,
      pin: Boolean = true
  ): DataFrame = {
    require(order.nonEmpty, "order columns required")
    val shaped = numPartitions
      .map(n => df.repartitionByRange(n, order: _*))
      .getOrElse(df.repartitionByRange(order: _*))
      .withColumn("_gp", spark_partition_id())
    val ranged = if (pin) Lineage.pin(shaped) else shaped
    // partition sizes: tiny job, one row per partition
    val sizes = ranged.groupBy(col("_gp")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = sizes.scanLeft(0 -> 0L) { case ((_, acc), (p, n)) => p -> (acc + n) }
      .init.map(_._2) // cumulative row count before partition i (aligned with sizes)
    val offsetByP: Map[Int, Long] = sizes.map(_._1).zip(offsets).toMap
    val offsetExpr =
      if (offsetByP.isEmpty) lit(0L)
      else coalesce(
        element_at(
          map(offsetByP.toSeq.sortBy(_._1).flatMap { case (p, o) => Seq(lit(p), lit(o)) }: _*),
          col("_gp")),
        lit(0L))
    // the window re-shuffles by _gp (hash), re-sorting each partition's rows
    // by the order keys — parallel across partitions, never SinglePartition
    val w = Window.partitionBy(col("_gp")).orderBy(order: _*)
    ranged
      .withColumn(posCol, (row_number().over(w) - 1).cast("long") + offsetExpr)
      .drop("_gp")
  }
}
