package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing: fill fixed-size context windows with whole documents,
  * greedy first-fit in deterministic order — the step between "deduped corpus"
  * and "training batches" in an LLM data pipeline.
  *
  * The greedy recurrence (if the doc fits the open pack, append; else open a
  * new pack) is sequential, so it runs per SHARD: one shuffle to co-locate
  * each shard, a sort within partitions, then a single narrow pass holding
  * O(1) state. Shards are independent — parallelism = #shards, wasted tail
  * space is bounded by maxTokens per shard. Pick the shard key so shards are
  * thousands of docs (e.g. hash(doc_id) % N with N ≈ 100× cluster cores).
  */
object Packing {

  /** Adds `pack_id` (0-based, unique within shard): the context window this
    * row packs into. A document longer than `maxTokens` opens its own
    * (overflowing) pack — it is never split and never dropped; filter first
    * if oversized docs should be excluded.
    *
    * Deterministic given (shardCol, orderCol) — retried partitions repack
    * identically. orderCol must be unique within a shard for that to hold.
    */
  def packGreedy(
      df: DataFrame,
      shardCol: String,
      orderCol: String,
      tokensCol: String,
      maxTokens: Long
  ): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    val sorted = df.repartition(col(shardCol)).sortWithinPartitions(col(shardCol), col(orderCol))
    val schema = sorted.schema.add("pack_id", LongType, nullable = false)
    val shardIdx = sorted.schema.fieldIndex(shardCol)
    val tokensIdx = sorted.schema.fieldIndex(tokensCol)
    sorted.mapPartitions { rows =>
      // a hash partition holds several shards back-to-back (sorted by shard
      // first); reset the packing state at every shard boundary
      var shard: Any = null
      var started = false
      var pack = 0L
      var fill = 0L
      rows.map { r =>
        val s = r.get(shardIdx)
        val tok = r.getLong(tokensIdx)
        if (!started || s != shard) { shard = s; started = true; pack = 0L; fill = tok }
        else if (fill + tok <= maxTokens) fill += tok
        else { pack += 1L; fill = tok }
        Row.fromSeq(r.toSeq :+ pack)
      }
    }(RowEncoder.encoderFor(schema))
  }
}
