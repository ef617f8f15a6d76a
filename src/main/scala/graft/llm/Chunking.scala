package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Context-window chunking: split each document into token windows of
  * `chunkSize` with `overlap` tokens carried between consecutive chunks —
  * the preprocessing step that turns variable-length documents into
  * training-window-sized pieces (complementary to [[Packing]], which then
  * packs short pieces together).
  *
  * Pure narrow map + explode: the token array is Let-bound (tokenized once
  * per row), windows are computed per row and exploded — no shuffle, scales
  * with the scan. Chunk ids are deterministic (position-derived), so reruns
  * and retries produce identical chunks.
  */
object Chunking {

  /** Explode `df` into (all original columns except textCol, chunk_id,
    * n_chunks, chunk_text, chunk_tokens). The last chunk of a document may
    * be shorter than `chunkSize`; documents shorter than one window yield
    * exactly one chunk. Tokens are whitespace-split (the same contract as
    * TextStats.tokenCount); `overlap` must be < chunkSize.
    */
  def chunkByTokens(
      df: DataFrame,
      textCol: String,
      chunkSize: Int,
      overlap: Int = 0
  ): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize), got $overlap (chunkSize $chunkSize)")
    val stride = chunkSize - overlap
    val chunks: Column = graft.functions.Let.bind(
      filter(split(trim(col(textCol)), "\\s+"), t => length(t) > 0),
      toks =>
        transform(
          // number of windows: 1 + ceil(max(0, n - chunkSize) / stride)
          sequence(
            lit(0),
            greatest(lit(0), ceil((size(toks) - chunkSize).cast("double") / stride).cast("int"))),
          i =>
            struct(
              i.cast("long").as("chunk_id"),
              concat_ws(" ", slice(toks, i * stride + 1, lit(chunkSize))).as("chunk_text"),
              least(size(toks) - i * stride, lit(chunkSize)).cast("long").as("chunk_tokens"))))
    df.withColumn("_chunks", chunks)
      .withColumn("n_chunks", size(col("_chunks")).cast("long"))
      .withColumn("_c", explode(col("_chunks")))
      .select(
        df.columns.filterNot(_ == textCol).map(col) ++ Seq(
          col("_c.chunk_id").as("chunk_id"),
          col("n_chunks"),
          col("_c.chunk_text").as("chunk_text"),
          col("_c.chunk_tokens").as("chunk_tokens")): _*)
  }

  /** Content-defined chunking ([[graft.functions.CdcChunksExpr]]): split
    * each document at gear-hash boundaries so an edit only perturbs the
    * chunk it lands in and later chunks re-synchronize — then fingerprint
    * every chunk (xxhash64) for edit-robust chunk-level dedup, the CDC
    * analog of [[Dedup.segmentDupStats]]'s fixed-width segments.
    *
    * Same shape as [[chunkByTokens]]: narrow map + explode, no shuffle.
    * Output: original columns except textCol + `chunk_id` (0-based position)
    * + `n_chunks` + `chunk_text` + `chunk_chars` + `chunk_hash`.
    */
  def chunkByContent(
      df: DataFrame,
      textCol: String,
      minLen: Int = 64,
      maskBits: Int = 8,
      maxLen: Int = 1024
  ): DataFrame = {
    val chunks = graft.functions.CdcChunksExpr.cdc_chunks(
      col(textCol), minLen, maskBits, maxLen)
    df.withColumn("_chunks", chunks)
      .withColumn("n_chunks", size(col("_chunks")).cast("long"))
      .select(
        df.columns.filterNot(_ == textCol).map(col) ++ Seq(
          col("n_chunks"), posexplode(col("_chunks")).as(Seq("_pos", "chunk_text"))): _*)
      .select(
        df.columns.filterNot(_ == textCol).map(col) ++ Seq(
          col("_pos").cast("long").as("chunk_id"),
          col("n_chunks"),
          col("chunk_text"),
          length(col("chunk_text")).cast("long").as("chunk_chars"),
          xxhash64(col("chunk_text")).as("chunk_hash")): _*)
  }
}
