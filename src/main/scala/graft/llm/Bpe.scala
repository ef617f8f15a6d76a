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
    * (word, cnt), one shuffle, map-side combined. */
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

  /** Encode documents to id arrays against a vocab table: tokens map
    * through a broadcast token→id map riding as DATA (single-row cross
    * join, the codebook pattern — a literal map would blow the codegen
    * constant pool at real vocab sizes). Out-of-vocabulary tokens encode
    * as −1 (a corpus encoded against its own [[vocab]] has none). Output:
    * input columns + `ids` (array<long>) + `n_tokens` + `n_oov`.
    */
  def encodeIds(df: DataFrame, textCol: String,
      merges: Seq[(String, String)], vocabDf: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val entries = vocabDf.select("token", "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val mapDf = Seq(Tuple1(entries.toMap)).toDF("_vmap")
    df.crossJoin(broadcast(mapDf))
      .withColumn("ids",
        transform(tokenize(col(textCol), merges),
          t => coalesce(element_at(col("_vmap"), t), lit(-1L))))
      .drop("_vmap")
      .withColumn("n_tokens", size(col("ids")).cast("long"))
      .withColumn("n_oov",
        size(filter(col("ids"), i => i === -1L)).cast("long"))
  }
}
