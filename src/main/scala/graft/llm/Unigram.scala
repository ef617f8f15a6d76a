package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained unigram-LM tokenizer (the SentencePiece unigram model,
  * Kudo 2018) — the other half of the subword-tokenizer family next to
  * [[Bpe]]: instead of a merge list applied greedily, a PIECE VOCABULARY
  * with log-probabilities, applied by Viterbi (the segmentation
  * maximizing total log-prob over all segmentations). Unigram tokenizers
  * are what most modern LLM pipelines actually ship (Llama/T5-style
  * SentencePiece models); a training-data engine needs both families to
  * measure token budgets in the tokenizer the model will really use.
  *
  * Scale shape (the [[Bpe]] factorization, deliberately identical):
  *
  *  1. [[Bpe.wordCounts]] — ONE corpus scan + one shuffle keyed on the
  *     word; output is bounded by the WORD VOCABULARY, not the corpus,
  *     and capped to `maxWords` heavy hitters.
  *  2. [[trainFromCounts]] — seeding + hard-EM runs DRIVER-SIDE on the
  *     collected word-frequency table. Not a shortcut: each EM round's
  *     expected counts depend on the previous round's scores, so the loop
  *     is inherently sequential, and running it on the vocab-bounded
  *     table is how reference unigram trainers work (SentencePiece trains
  *     on a sentence SAMPLE for the same reason). The corpus is never
  *     rescanned.
  *  3. Encoding — a narrow codegen'd expression
  *     ([[graft.functions.UnigramEncodeExpr]]): the piece table rides as
  *     a reference object; Viterbi is O(word-len × max-piece-len) probes
  *     per word. Zero shuffles, streaming-safe.
  *
  * Determinism (everything the oracle/`ok` gates need):
  *  - Training uses HARD EM: the E-step assigns each word its single
  *    Viterbi-best segmentation (the encode kernel itself, so train and
  *    apply can never disagree about segmentation), giving exact INTEGER
  *    piece counts — no distributed float accumulation anywhere; the
  *    M-step's `ln(count) − ln(total)` runs in one fixed driver-side
  *    order.
  *  - All orderings tie-break deterministically: seed selection by
  *    (weighted count desc, piece asc), pruning likewise, Viterbi by
  *    longest-piece-wins (see [[graft.functions.UnigramEncoder]]).
  *  - The id layout is the [[Bpe.vocabTotal]] byte-fallback layout: ids
  *    0..255 ARE the UTF-8 byte values, learned pieces start at 256 —
  *    encoding is TOTAL on any string and [[Bpe.decodeIds]]' expression
  *    decodes unigram ids unchanged (same layout, same contract:
  *    decode(encode(text)) ≡ text stripped of whitespace).
  *
  * Every single corpus code point stays in the vocabulary regardless of
  * `vocabSize` (like SentencePiece's required character set): pruning only
  * ever removes multi-code-point pieces, so training-corpus encoding never
  * falls back, and `vocabSize` bounds the LEARNED table at
  * `max(singles, vocabSize)`.
  */
object Unigram {

  /** A trained model: pieces in id order (id = 256 + index), each with its
    * integer corpus count and log-prob score, plus the byte-fallback score
    * (strictly below every real piece score: a count-1 piece scores
    * `−ln(total)`, bytes score `−ln(max(total,1)) − 10` PER BYTE). */
  final case class Model(pieces: Seq[(String, Long, Double)], byteScore: Double) {
    def scored: Seq[(String, Double)] = pieces.map(p => (p._1, p._3))
  }

  /** Learn a unigram vocabulary from the corpus: word-count scan (capped
    * at `maxWords` most frequent words), then driver-side seed + hard-EM +
    * prune. `vocabSize` caps the LEARNED pieces (byte rows not counted).
    */
  def train(df: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int = 8, seedSize: Int = 20000, emIters: Int = 3,
      maxWords: Int = 50000): Model = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    val top = graft.operators.TopK.perKeySalted(
      Bpe.wordCounts(df, textCol).withColumn("_g", lit(1)),
      Seq("_g"), "cnt", maxWords, descending = true, tiebreak = Seq("word"))
      .select("word", "cnt")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    trainFromCounts(top, vocabSize, maxPieceLen, seedSize, emIters)
  }

  /** Seed + hard-EM + prune on a word-frequency table (driver-local;
    * exposed for tests and for re-training from persisted counts).
    *
    * Seeding: every substring of 1..maxPieceLen code points of every word
    * (words longer than 256 code points contribute only their first 256 —
    * the SentencePiece max-sentencepiece-length discipline; the word still
    * trains and encodes, its tail just doesn't NOMINATE pieces), weighted
    * by word frequency; the seed is all single code points plus the
    * `seedSize` heaviest multi-code-point substrings.
    *
    * Each EM round: Viterbi-segment every distinct word under the current
    * scores (hard E-step, integer counts weighted by word frequency), then
    * re-score `ln(count) − ln(total)` and drop zero-count multis (M-step).
    * After `emIters` rounds the table is pruned to the `vocabSize` heaviest
    * learned pieces (singles always kept) and ONE more EM round runs so the
    * final scores reflect the final vocabulary.
    */
  def trainFromCounts(wordFreq: Seq[(String, Long)], vocabSize: Int,
      maxPieceLen: Int = 8, seedSize: Int = 20000, emIters: Int = 3): Model = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    val words: Array[(Array[Int], Long)] = wordFreq.map { case (w, c) =>
      (w.codePoints().toArray, c)
    }.toArray

    // --- seed: substring counts (capped per word), singles mandatory ---
    val seedCap = 256
    val subCounts = new java.util.HashMap[String, java.lang.Long]()
    val singles = new java.util.TreeSet[String]()
    words.foreach { case (cps, c) =>
      var i = 0
      while (i < cps.length) {
        singles.add(new String(cps, i, 1))
        i += 1
      }
      val lim = math.min(cps.length, seedCap)
      i = 0
      while (i < lim) {
        var len = 2
        while (len <= maxPieceLen && i + len <= lim) {
          val p = new String(cps, i, len)
          val prev = subCounts.get(p)
          subCounts.put(p, java.lang.Long.valueOf((if (prev == null) 0L else prev.longValue()) + c))
          len += 1
        }
        i += 1
      }
    }
    import scala.jdk.CollectionConverters._
    val multiSeed = subCounts.entrySet().asScala.toSeq
      .map(e => (e.getKey, e.getValue.longValue()))
      .sortBy { case (p, c) => (-c, p) }
      .take(seedSize)
    // single-cp counts: occurrences in words, weighted (for initial scores)
    val singleCounts = new java.util.HashMap[String, java.lang.Long]()
    words.foreach { case (cps, c) =>
      var i = 0
      while (i < cps.length) {
        val p = new String(cps, i, 1)
        val prev = singleCounts.get(p)
        singleCounts.put(p, java.lang.Long.valueOf((if (prev == null) 0L else prev.longValue()) + c))
        i += 1
      }
    }
    var current: Seq[(String, Long)] =
      (singles.asScala.toSeq.map(p =>
        (p, math.max(singleCounts.getOrDefault(p, java.lang.Long.valueOf(1L)).longValue(), 1L)))
        ++ multiSeed)

    def rescore(counts: Seq[(String, Long)]): (Seq[(String, Double)], Double) = {
      val total = math.max(counts.iterator.map(_._2).sum, 1L).toDouble
      val lnTotal = math.log(total)
      (counts.map { case (p, c) =>
        // zero-count singles (kept for totality) score strictly below
        // count-1 pieces but strictly above byte fallback
        (p, if (c > 0) math.log(c.toDouble) - lnTotal else -lnTotal - 5.0)
      }, -lnTotal - 10.0)
    }

    def emRound(counts: Seq[(String, Long)]): Seq[(String, Long)] = {
      val (scored, byteScore) = rescore(counts)
      val enc = new graft.functions.UnigramEncoder(scored, byteScore)
      val used = new java.util.HashMap[String, java.lang.Long]()
      words.foreach { case (cps, c) =>
        val ps = enc.segmentForTraining(new String(cps, 0, cps.length))
        var i = 0
        while (i < ps.length) {
          val prev = used.get(ps(i))
          used.put(ps(i), java.lang.Long.valueOf((if (prev == null) 0L else prev.longValue()) + c))
          i += 1
        }
      }
      // keep every single (count from usage, 0 if unused); drop dead multis
      counts.flatMap { case (p, _) =>
        val u = used.get(p)
        val cnt = if (u == null) 0L else u.longValue()
        if (p.codePointCount(0, p.length) == 1) Some((p, cnt))
        else if (cnt > 0) Some((p, cnt)) else None
      }
    }

    var iter = 0
    while (iter < emIters) { current = emRound(current); iter += 1 }
    // prune to vocabSize learned pieces (singles always kept), then one
    // final round so scores reflect the final vocabulary
    val (sing, multi) = current.partition(p => p._1.codePointCount(0, p._1.length) == 1)
    val room = math.max(vocabSize - sing.size, 0)
    current = sing ++ multi.sortBy { case (p, c) => (-c, p) }.take(room)
    current = emRound(current)

    val (scoredFinal, byteScoreFinal) = rescore(current)
    val scoreMap = scoredFinal.toMap
    val ordered = current.sortBy { case (p, c) => (-c, p) }
      .map { case (p, c) => (p, c, scoreMap(p)) }
    Model(ordered, byteScoreFinal)
  }

  /** The model as a (token, id, freq, score) table in the
    * [[Bpe.vocabTotal]] id layout: rows 0..255 are the reserved byte
    * tokens (freq 0, score = the byte-fallback score), learned pieces
    * follow at 256+ in (freq desc, piece) order — [[Bpe.decodeIds]] and
    * `TokenizerTransform mode=decode` read it unchanged.
    */
  def vocabDf(spark: org.apache.spark.sql.SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    val bytes = Bpe.byteTokens.zipWithIndex
      .map { case (t, i) => (t, i.toLong, 0L, model.byteScore) }
    val learned = model.pieces.zipWithIndex
      .map { case ((p, c, s), i) => (p, 256L + i, c, s) }
    (bytes ++ learned).toDF("token", "id", "freq", "score")
  }

  /** Rebuild a [[Model]] from a persisted [[vocabDf]] table (vocab-bounded
    * collect; fails fast on a table that is not the vocabTotal layout). */
  def modelFromVocabDf(vocabDf: DataFrame): Model = {
    val all = vocabDf.select("token", "id", "freq", "score")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._2)
    val (bytes, learned) = all.partition(_._2 < 256L)
    require(bytes.length == 256 && bytes.map(_._2).toSeq == (0L until 256L),
      s"vocabDf is not a unigram vocabTotal layout (found ${bytes.length} ids below " +
        "256, expected the 256 reserved byte rows) — build it with Unigram.vocabDf")
    learned.zipWithIndex.foreach { case ((_, id, _, _), i) =>
      require(id == 256L + i,
        s"learned piece ids must be contiguous from 256, found $id at rank $i")
    }
    Model(learned.map(t => (t._1, t._3, t._4)).toSeq, bytes.head._4)
  }

  /** The raw encode struct column —
    * `(pieces, ids, score, greedy_score, n_fallback)`; see
    * [[graft.functions.UnigramEncodeExpr]]. */
  def encodeStruct(text: Column, model: Model): Column =
    graft.functions.UnigramEncodeExpr.unigram_encode(text, model.scored, model.byteScore)

  /** Encode documents to Viterbi piece-id arrays: input columns +
    * `ids` (array<bigint>, byte-fallback TOTAL — defined on any string) +
    * `n_tokens` + `n_fallback_tokens` (code points that took the byte
    * route) + `score` (the Viterbi log-prob). One narrow codegen'd
    * projection, zero shuffles.
    */
  def encodeIds(df: DataFrame, textCol: String, model: Model): DataFrame =
    df.withColumn("_enc", encodeStruct(col(textCol), model))
      .withColumn("ids", col("_enc.ids"))
      .withColumn("n_tokens", size(col("ids")).cast("long"))
      .withColumn("n_fallback_tokens", col("_enc.n_fallback"))
      .withColumn("score", col("_enc.score"))
      .drop("_enc")

  /** [[encodeIds]] plus the in-band verification columns (`pieces`,
    * `greedy_score`) — the q192 surface: `score >= greedy_score` is the
    * EXACT Viterbi-optimality witness (IEEE addition is monotone, both
    * sides are document-order left folds over the same table), and
    * decode(ids) must reproduce the whitespace-stripped text. */
  def encodeDetail(df: DataFrame, textCol: String, model: Model): DataFrame =
    df.withColumn("_enc", encodeStruct(col(textCol), model))
      .withColumn("pieces", col("_enc.pieces"))
      .withColumn("ids", col("_enc.ids"))
      .withColumn("n_tokens", size(col("ids")).cast("long"))
      .withColumn("n_fallback_tokens", col("_enc.n_fallback"))
      .withColumn("score", col("_enc.score"))
      .withColumn("greedy_score", col("_enc.greedy_score"))
      .drop("_enc")

  /** Decode unigram ids back to the exact (whitespace-stripped) text —
    * [[Bpe.decodeIds]]' expression on the shared byte-fallback layout. */
  def decodeIds(ids: Column, model: Model): Column =
    graft.functions.BpeDecodeIdsExpr.bpe_decode_ids(ids, model.pieces.map(_._1))
}
