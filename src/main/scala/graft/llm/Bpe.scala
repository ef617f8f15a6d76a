package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained byte-pair encoding (BPE): learn subword merges from the
  * corpus and tokenize with them — the step past [[TextStats]]' whitespace
  * and BPE-ish regex COUNTING: an actual trained subword vocabulary, the
  * tokenizer-fitting pass every training-data pipeline runs before it can
  * measure token budgets in its real vocabulary.
  *
  * Scale shape (the classic Sennrich et al. 2016 factorization):
  *
  *  1. [[wordCounts]] — ONE corpus scan + one shuffle keyed on the word;
  *     output is bounded by the WORD VOCABULARY, not the corpus (100 TB of
  *     text still has a capped distinct-word table, and the `maxWords`
  *     heavy-hitter cut bounds it explicitly via [[graft.operators.TopK]]).
  *  2. [[trainMerges]] — the merge loop runs DRIVER-SIDE on the collected
  *     word-frequency table. This is not a shortcut: each merge depends on
  *     the pair counts AFTER the previous merge, so the loop is inherently
  *     sequential, and running it on the vocabulary-bounded table (not the
  *     corpus) is exactly how reference implementations train. The corpus
  *     is never rescanned.
  *  3. [[tokenize]] — a narrow codegen'd expression
  *     ([[graft.functions.BpeTokenizeExpr]]); the merge ranks ride inside
  *     the expression as a reference object. Zero shuffles, streaming-safe.
  *
  * Determinism: pair selection breaks ties by (count desc, pair lexicographic),
  * so the same corpus always yields the same merge sequence — training is
  * reproducible across runs and cluster layouts (the counts are exact).
  */
object Bpe {

  /** Exact word-frequency table of `textCol` (whitespace tokenization):
    * (word, cnt), one shuffle, map-side combined.
    *
    * The split pattern (Java regex `\s+` = `[ \t\n\x0B\f\r]+`) is THE word
    * boundary definition — [[graft.functions.BpeApplier]] applies the
    * identical predicate, so training and tokenization always segment the
    * same way (a Unicode-whitespace split on one side only would train
    * merges against a segmentation apply never sees).
    */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(filter(split(trim(col(textCol)), "\\s+"), t => length(t) > 0))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Learn `numMerges` BPE merges from the corpus. The word table is capped
    * to the `maxWords` most frequent words (deterministic (cnt desc, word)
    * order) before collection. Returns merges in application order.
    */
  def trainMerges(df: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 50000): Seq[(String, String)] = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    val top = graft.operators.TopK.perKeySalted(
      wordCounts(df, textCol).withColumn("_g", lit(1)),
      Seq("_g"), "cnt", maxWords, descending = true, tiebreak = Seq("word"))
      .select("word", "cnt")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    trainFromCounts(top, numMerges)
  }

  /** The sequential merge loop on a word-frequency table (driver-local;
    * exposed for tests and for re-training from persisted counts).
    */
  def trainFromCounts(wordFreq: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    // each word as its code-point symbol sequence
    var words: Array[(Array[String], Long)] = wordFreq.map { case (w, c) =>
      (w.codePoints().toArray.map(cp => new String(Character.toChars(cp))), c)
    }.toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    while (i < numMerges) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          j += 1
        }
      }
      if (pairCounts.isEmpty) return merges.toSeq
      val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
      merges += best
      val joined = best._1 + best._2
      words = words.map { case (syms, c) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == best._1 && syms(j + 1) == best._2) {
            out += joined; j += 2
          } else { out += syms(j); j += 1 }
        }
        (out.toArray, c)
      }
      i += 1
    }
    merges.toSeq
  }

  /** Tokenize `text` with a trained merge list: whitespace-split, then each
    * word is merged greedily by rank (lowest-rank adjacent pair first — the
    * standard BPE apply). Returns all subword tokens in order,
    * `array<string>`. Narrow codegen'd expression — see
    * [[graft.functions.BpeTokenizeExpr]].
    */
  def tokenize(text: Column, merges: Seq[(String, String)]): Column =
    graft.functions.BpeTokenizeExpr.bpe_tokenize(text, merges)

  /** Tokenize + per-row count in one projection: (tokens, n_bpe_tokens). */
  def tokenized(df: DataFrame, textCol: String, merges: Seq[(String, String)]): DataFrame =
    df.withColumn("tokens", tokenize(col(textCol), merges))
      .withColumn("n_bpe_tokens", size(col("tokens")).cast("long"))

  /** Deterministic token vocabulary of the tokenized corpus: one row per
    * distinct subword token with its corpus frequency and a stable id
    * (frequency desc, then token — the same corpus always numbers tokens
    * identically). One bounded shuffle: the (token) aggregate after the
    * narrow tokenize scan; output is vocabulary-sized.
    */
  def vocab(df: DataFrame, textCol: String, merges: Seq[(String, String)]): DataFrame = {
    val counts = df
      .select(explode(tokenize(col(textCol), merges)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("freq").desc, col("token"))
    // vocabulary-sized frame: the global window is bounded by |vocab|,
    // not by the corpus (same discipline as the merge loop)
    counts.withColumn("id", (row_number().over(w) - 1).cast("long"))
      .select("token", "id", "freq")
  }

  /** Encode documents to id arrays against a vocab table: the collected
    * (vocab-bounded) token→id table rides inside a native expression as a
    * reference-object HashMap ([[graft.functions.BpeEncodeIdsExpr]]) —
    * O(1) probes per token. (A literal map column would blow the codegen
    * constant pool, and `element_at` on a broadcast MAP column
    * linear-scans the keys per token — measured dominant at real vocab
    * sizes.) Out-of-vocabulary tokens encode as −1 (a corpus encoded
    * against its own [[vocab]] has none). Output: input columns + `ids`
    * (array<long>) + `n_tokens` + `n_oov`.
    */
  def encodeIds(df: DataFrame, textCol: String,
      merges: Seq[(String, String)], vocabDf: DataFrame): DataFrame = {
    val entries = vocabDf.select("token", "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    df.withColumn("ids",
        graft.functions.BpeEncodeIdsExpr.bpe_encode_ids(
          tokenize(col(textCol), merges), entries, byteFallback = false))
      .withColumn("n_tokens", size(col("ids")).cast("long"))
      .withColumn("n_oov",
        size(filter(col("ids"), i => i === -1L)).cast("long"))
  }

  /** The 256 reserved byte tokens of the byte-fallback vocabulary
    * (SentencePiece `byte_fallback` / GPT-2 byte-level BPE): ids 0..255 ARE
    * the UTF-8 byte values; learned subword tokens start at 256. The marker
    * strings (`<0x41>`…) are display-only — encode/decode identify byte ids
    * by RANGE, never by string, so a document that literally contains the
    * text "<0x41>" cannot collide with the byte token.
    */
  val byteTokens: Seq[String] = (0 until 256).map(b => f"<0x$b%02X>")

  /** [[vocab]] with the byte-fallback id layout: rows 0..255 are the
    * reserved byte tokens (freq 0), learned tokens keep their
    * frequency-ordered ranks shifted to 256+. Total by construction — every
    * string encodes against it with zero OOV ([[encodeIdsTotal]]).
    */
  def vocabTotal(df: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bytes = byteTokens.zipWithIndex
      .map { case (t, i) => (t, i.toLong, 0L) }.toDF("token", "id", "freq")
    bytes.unionByName(
      vocab(df, textCol, merges)
        .select(col("token"), (col("id") + 256L).as("id"), col("freq")))
  }

  /** TOTAL text→ids encoding: tokens found in the learned vocab map to
    * their id (≥ 256); any out-of-vocabulary token decomposes to its UTF-8
    * bytes, one id per byte (ids 0..255) — so `ids` is defined for ANY
    * input string and n_oov ≡ 0 structurally (no −1 can be produced).
    * This is what makes token-budget accounting trustworthy on
    * unseen-domain data: unseen emoji/CJK cost bytes instead of silently
    * disappearing into −1.
    *
    * Same scale shape as [[encodeIds]] (reference-object HashMap inside a
    * native expression — O(1) probes, one narrow codegen'd projection,
    * zero shuffles; [[graft.functions.Utf8ByteIdsExpr]] exposes the bare
    * byte decomposition standalone). Output: input columns + `ids` +
    * `n_tokens` (post-fallback id count) + `n_oov` (structural 0) +
    * `n_fallback_tokens` (subword tokens that took the byte route).
    *
    * `vocabDf` must use the [[vocabTotal]] id layout (learned ids ≥ 256).
    */
  /** Collect a vocabTotal-layout table and ENFORCE the layout: exactly 256
    * reserved byte rows at ids 0..255 and learned tokens contiguous from
    * 256. A plain [[vocab]] table here would silently byte-encode its 256
    * most frequent tokens and shift every remaining id — fail fast with
    * the fix instead. */
  private def collectTotalLayout(vocabDf: DataFrame): Array[(String, Long)] = {
    val all = vocabDf.select("token", "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._2)
    val (bytes, learned) = all.partition(_._2 < 256L)
    require(bytes.length == 256 && bytes.map(_._2).toSeq == (0L until 256L),
      s"vocabDf is not a vocabTotal layout (found ${bytes.length} ids below 256, " +
        "expected the 256 reserved byte rows) — build it with Bpe.vocabTotal, " +
        "not Bpe.vocab")
    learned.zipWithIndex.foreach { case ((_, id), i) =>
      require(id == 256L + i,
        s"learned vocab ids must be contiguous from 256, found $id at rank $i")
    }
    learned
  }

  def encodeIdsTotal(df: DataFrame, textCol: String,
      merges: Seq[(String, String)], vocabDf: DataFrame): DataFrame = {
    val entries = collectTotalLayout(vocabDf).toSeq
    import graft.functions.BpeEncodeIdsExpr.{bpe_encode_ids, bpe_oov_count}
    df.withColumn("_toks", tokenize(col(textCol), merges))
      .withColumn("ids", bpe_encode_ids(col("_toks"), entries, byteFallback = true))
      .withColumn("n_fallback_tokens", bpe_oov_count(col("_toks"), entries))
      .drop("_toks")
      .withColumn("n_tokens", size(col("ids")).cast("long"))
      .withColumn("n_oov",
        size(filter(col("ids"), i => i < 0L)).cast("long"))
  }

  /** Per-group tokenizer evaluation — the fertility/coverage report every
    * tokenizer-fitting pass ends with: how many subword tokens a word
    * costs (fertility), how many text bytes a token carries, and what
    * fraction of tokens fell back to bytes (unseen-domain signal), per
    * `groupCol` (source, language, …).
    *
    * Uses the TOTAL encoder, so the numbers are defined on ANY input —
    * no silently-dropped OOV inflating coverage. One narrow
    * tokenize+encode projection then ONE group aggregate; `n_text_bytes`
    * is the UTF-8 byte length of the whitespace-stripped text, which by
    * the byte-fallback construction exactly equals the bytes the ids
    * decode to (the q185 in-band identity).
    *
    * Output per group: `n_docs`, `n_words`, `n_tokens`,
    * `n_fallback_tokens`, `n_text_bytes`, `fertility`
    * (tokens per word), `bytes_per_token`, `fallback_rate`.
    */
  def fertilityReport(df: DataFrame, textCol: String, groupCol: String,
      merges: Seq[(String, String)], vocabDf: DataFrame): DataFrame = {
    val enc = encodeIdsTotal(df, textCol, merges, vocabDf)
      .withColumn("_n_words",
        size(filter(split(trim(col(textCol)), "\\s+"), t => length(t) > 0)).cast("long"))
      .withColumn("_n_bytes",
        octet_length(regexp_replace(col(textCol), "\\s+", "")).cast("long"))
    enc.groupBy(groupCol)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("_n_words")).as("n_words"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_fallback_tokens")).as("n_fallback_tokens"),
        sum(col("_n_bytes")).as("n_text_bytes"))
      .withColumn("fertility",
        when(col("n_words") > 0, col("n_tokens").cast("double") / col("n_words")))
      .withColumn("bytes_per_token",
        when(col("n_tokens") > 0, col("n_text_bytes").cast("double") / col("n_tokens")))
      .withColumn("fallback_rate",
        when(col("n_tokens") > 0,
          col("n_fallback_tokens").cast("double") / col("n_tokens")))
  }

  /** Decode a byte-fallback id array back to its exact string (ids ≥ 256 →
    * learned token bytes, ids < 256 → that raw byte; see
    * [[graft.functions.BpeDecodeIdsExpr]]). The learned-token table is
    * collected once (vocab-bounded) and rides inside the expression; an id
    * outside the vocab decodes to NULL, never to a wrong string.
    * `vocabDf` must use the [[vocabTotal]] id layout.
    */
  def decodeIds(ids: Column, vocabDf: DataFrame): Column =
    graft.functions.BpeDecodeIdsExpr.bpe_decode_ids(
      ids, collectTotalLayout(vocabDf).map(_._1).toSeq)
}
