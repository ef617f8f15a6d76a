package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.expressions.Window
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

  /** Token-ID sequence packing with document boundaries — the step
    * [[packGreedy]] only approximates with counts: concatenate every
    * document's `[bos] ++ ids ++ [eos]` stream in deterministic
    * (shardCol, orderCol) order and cut it into consecutive fixed-length
    * context windows, splitting long documents across windows and
    * concatenating short ones into the same window. The last window of a
    * shard keeps its natural (shorter) length — padding policy belongs to
    * the training loader, not the corpus.
    *
    * Output: one row per context window —
    * `(shard, seq_id, ids, n_tokens, doc_spans)` where `seq_id` is
    * 0-based within the shard, `ids` is exactly
    * `contextLen` tokens (except the shard's final window) and
    * `doc_spans` maps every slice back to its document:
    * `(doc_id, start, end, doc_start)` = ids[start, end) holds the
    * document's decorated stream from offset `doc_start` (end exclusive;
    * spans tile the window with no gaps). Concatenating a document's
    * spans across windows in (seq_id, doc_start) order reconstructs
    * `[bos] ++ ids ++ [eos]` exactly — the LlmSpec property.
    *
    * NOT sequential state like the greedy packer: each document's window
    * range is pure prefix-sum arithmetic — `off` = running token count
    * before the doc (one window function), the doc then touches windows
    * `off div L .. (off+len-1) div L` and every fragment's bounds are
    * integer expressions. Plan shape: ONE exchange total — the per-shard
    * prefix-sum window hash-partitions on the shard, the doc-level
    * explode (1-2 rows per doc, NOT per token) stays narrow, and the
    * (shard, seq) assembly aggregate REUSES the shard partitioning
    * (shard-partitioning co-locates every window of a shard; PlanSpec
    * pins the single exchange) — token ids cross the wire exactly once
    * and no executor ever holds more than its windows.
    * Fully deterministic, so retried partitions repack identically, and
    * DuckDB reproduces the integer arithmetic byte-for-byte (q187).
    */
  def packTokenIds(
      df: DataFrame,
      docIdCol: String,
      shardCol: String,
      orderCol: String,
      idsCol: String,
      contextLen: Int,
      bosId: Long = 1L,
      eosId: Long = 2L
  ): DataFrame = {
    require(contextLen >= 2, s"contextLen must be >= 2, got $contextLen")
    // docIdCol breaks orderCol ties deterministically — without it a
    // retried partition could repack tied docs in a different order, the
    // exact retry-corruption the determinism contract forbids
    val w = Window.partitionBy(shardCol).orderBy(col(orderCol), col(docIdCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val L = lit(contextLen.toLong)
    val frags = df
      // NULL ids coalesce to an empty doc ([bos, eos]) — concat would
      // otherwise propagate the null and the explode would silently DROP
      // the document from the packed corpus (the tokArr discipline)
      .withColumn("_full", concat(array(lit(bosId)),
        coalesce(col(idsCol).cast("array<bigint>"),
          array().cast("array<bigint>")), array(lit(eosId))))
      .withColumn("_len", size(col("_full")).cast("long"))
      .withColumn("_off", coalesce(sum(col("_len")).over(w), lit(0L)))
      // the windows this doc overlaps — a doc-granularity explode
      .withColumn("seq_id", explode(sequence(
        expr(s"_off div $contextLen"),
        expr(s"(_off + _len - 1) div $contextLen"))))
      .withColumn("_gstart", greatest(col("_off"), col("seq_id") * L))
      .withColumn("_gend", least(col("_off") + col("_len"), (col("seq_id") + 1) * L))
      .withColumn("start", (col("_gstart") - col("seq_id") * L).cast("int"))
      .withColumn("end", (col("_gend") - col("seq_id") * L).cast("int"))
      .withColumn("doc_start", col("_gstart") - col("_off"))
      .withColumn("_frag", slice(col("_full"),
        (col("doc_start") + 1).cast("int"), (col("_gend") - col("_gstart")).cast("int")))
    frags
      .groupBy(col(shardCol).as("shard"), col("seq_id"))
      // `start` leads the struct: sort_array orders fragments by their
      // position in the window, making the flatten deterministic
      .agg(sort_array(collect_list(struct(col("start"), col("end"),
        col(docIdCol).cast("long").as("doc_id"), col("doc_start"), col("_frag")))).as("_frs"))
      .select(col("shard"), col("seq_id"),
        flatten(transform(col("_frs"), f => f.getField("_frag"))).as("ids"),
        transform(col("_frs"), f => struct(f.getField("doc_id").as("doc_id"),
          f.getField("start").as("start"), f.getField("end").as("end"),
          f.getField("doc_start").as("doc_start"))).as("doc_spans"))
      .withColumn("n_tokens", size(col("ids")).cast("long"))
  }
}
