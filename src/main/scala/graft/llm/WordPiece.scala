package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained WordPiece tokenizer (Schuster & Nakajima 2012; the BERT
  * tokenizer, Devlin et al. 2019) — the third production subword family
  * next to [[Bpe]] (merge-rank apply) and [[Unigram]] (Viterbi apply):
  * a LIKELIHOOD-scored merge loop at training time and GREEDY
  * LONGEST-MATCH-FIRST at apply time, with in-word continuation pieces
  * and un-segmentable words collapsing to ONE `[UNK]`. A training-data
  * engine needs all three families to measure token budgets in whatever
  * tokenizer the downstream model really uses.
  *
  * Scale shape (the [[Bpe]]/[[Unigram]] factorization, deliberately
  * identical):
  *
  *  1. [[Bpe.wordCounts]] — ONE corpus scan + one shuffle keyed on the
  *     word; output is bounded by the WORD VOCABULARY, not the corpus,
  *     and capped to `maxWords` heavy hitters.
  *  2. [[trainFromCounts]] — the merge loop runs DRIVER-SIDE on the
  *     collected word-frequency table. Not a shortcut: each merge's
  *     likelihood score depends on the counts AFTER the previous merge,
  *     so the loop is inherently sequential, and running it on the
  *     vocab-bounded table is how the published trainers work. The corpus
  *     is never rescanned.
  *  3. Encoding — a narrow codegen'd expression
  *     ([[graft.functions.WordPieceEncodeExpr]]): the vocabulary rides as
  *     a reference object; greedy longest-match is O(word-len ×
  *     max-piece-len) probes per word. Zero shuffles, streaming-safe.
  *
  * Determinism (everything the `ok` gates need):
  *  - The merge score is the WordPiece likelihood gain
  *    `count(ab) / (count(a) · count(b))` compared EXACTLY by BigInt
  *    cross-multiplication — no float ratio can reorder two merges —
  *    with ties broken by (pair count desc, left display asc, right
  *    display asc).
  *  - The id layout is positional: id 0 is `[UNK]`, the initial alphabet
  *    follows sorted by display form, merged tokens follow in merge
  *    order — the same corpus always numbers tokens identically.
  *  - Continuation-vs-word-initial is an EXPLICIT flag on every token
  *    (persisted as `is_continuation`), and `[UNK]` is identified by ID —
  *    corpus text containing literal "#"s or "[UNK]" cannot confuse
  *    encode or decode (see [[graft.functions.WordPieceEncodeExpr]]).
  *
  * Totality is deliberately NOT provided (unlike the byte-fallback BPE and
  * unigram layouts): a word containing an out-of-alphabet character in a
  * position class training never saw becomes `[UNK]` — the published
  * WordPiece contract, and q196 verifies word-by-word (non-UNK words
  * reconstruct byte-for-byte; UNK words are exactly the unmatched ones).
  */
object WordPiece {

  /** The UNK marker string (display + decode rendering; identity is id 0). */
  val UnkToken: String = graft.functions.WordPieceEncodeExpr.UnkToken

  /** A trained model: `entries(i) = (body, isContinuation, freq)` where
    * index 0 is the `[UNK]` row, the alphabet follows sorted by display
    * form, merged tokens follow in merge order; ids are positions. `freq`
    * is the token's weighted occurrence count in the final segmentation of
    * the training word table (0 for `[UNK]` and for symbols merged away).
    * The display form is `"##" + body` for continuations, `body` raw
    * otherwise. */
  final case class Model(entries: Seq[(String, Boolean, Long)]) {
    require(entries.nonEmpty && entries.head._1 == UnkToken && !entries.head._2,
      s"WordPiece model must start with the non-continuation $UnkToken row")
    /** (body, cont) pairs in id order — the expression-table form. */
    def vocab: Seq[(String, Boolean)] = entries.map(e => (e._1, e._2))
    /** Conventional display form: `##`-prefixed continuations. */
    def display(i: Int): String = {
      val (body, cont, _) = entries(i)
      if (cont) "##" + body else body
    }
  }

  /** Learn a WordPiece vocabulary from the corpus: word-count scan (capped
    * at `maxWords` most frequent words), then the driver-side likelihood
    * merge loop. `vocabSize` bounds the TOTAL vocabulary ([UNK] + alphabet
    * + merges); an alphabet already at/over the bound just stops merging
    * (the alphabet is never truncated — encoding corpus words must not
    * fail on a character training saw).
    */
  def train(df: DataFrame, textCol: String, vocabSize: Int,
      maxWords: Int = 50000): Model = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    val top = graft.operators.TopK.perKeySalted(
      Bpe.wordCounts(df, textCol).withColumn("_g", lit(1)),
      Seq("_g"), "cnt", maxWords, descending = true, tiebreak = Seq("word"))
      .select("word", "cnt")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    trainFromCounts(top, vocabSize)
  }

  // a symbol inside a word: its text and whether it continues a word
  private type Sym = (String, Boolean)

  private def display(s: Sym): String = if (s._2) "##" + s._1 else s._1

  /** The sequential likelihood merge loop on a word-frequency table
    * (driver-local; exposed for tests and re-training from persisted
    * counts). Each round: count every adjacent symbol pair AND every
    * symbol (weighted by word frequency), pick the pair maximizing
    * `count(ab)/(count(a)·count(b))` (exact BigInt comparison, ties by
    * pair count desc then display-form lexicographic), fuse every
    * occurrence. The fused symbol keeps the LEFT side's continuation
    * class. Stops at `vocabSize` total tokens or when no pair remains.
    */
  def trainFromCounts(wordFreq: Seq[(String, Long)], vocabSize: Int): Model = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    var words: Array[(Array[Sym], Long)] = wordFreq.map { case (w, c) =>
      val cps = w.codePoints().toArray
      val syms = new Array[Sym](cps.length)
      var i = 0
      while (i < cps.length) {
        syms(i) = (new String(Character.toChars(cps(i))), i > 0)
        i += 1
      }
      (syms, c)
    }.toArray

    val alphabet = words.iterator.flatMap(_._1).toSeq.distinct
      .sortBy(s => display(s))
    val vocab = scala.collection.mutable.ArrayBuffer[Sym]((UnkToken, false)) ++ alphabet
    val vocabSet = scala.collection.mutable.HashSet[Sym](vocab.toSeq: _*)
    // vocabSize is a merge BUDGET, not a hard cap: [UNK] + the alphabet are
    // always kept (dropping alphabet symbols would un-encode the corpus).
    // When they alone exceed vocabSize the loop below just never merges —
    // surface that, or a user asking for vocabSize=12 gets a bigger vocab
    // with no signal (the unigram path's layout-constraint discipline).
    if (vocab.size >= vocabSize)
      graft.core.LogBuffer.append(
        s"WordPiece.train: [UNK] + alphabet (${vocab.size} symbols) already " +
          s"reaches vocabSize=$vocabSize — no merges learned; final vocab " +
          s"is ${vocab.size} tokens")

    while (vocab.size < vocabSize) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(Sym, Sym), Long]
      val symCounts = scala.collection.mutable.HashMap.empty[Sym, Long]
      words.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length) {
          symCounts.update(syms(j), symCounts.getOrElse(syms(j), 0L) + c)
          if (j < syms.length - 1) {
            val p = (syms(j), syms(j + 1))
            pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          }
          j += 1
        }
      }
      if (pairCounts.isEmpty) return finish(words, vocab.toSeq)
      // argmax of count(ab)/(count(a)*count(b)) by exact cross-multiplication
      var best: ((Sym, Sym), Long) = null
      var bestDen: BigInt = null
      pairCounts.foreach { case (p, c) =>
        val den = BigInt(symCounts(p._1)) * BigInt(symCounts(p._2))
        val better =
          if (best == null) true
          else {
            // c/den > bestC/bestDen  <=>  c*bestDen > bestC*den
            val l = BigInt(c) * bestDen
            val r = BigInt(best._2) * den
            if (l != r) l > r
            else if (c != best._2) c > best._2
            else {
              val cmp1 = display(p._1).compareTo(display(best._1._1))
              if (cmp1 != 0) cmp1 < 0
              else display(p._2).compareTo(display(best._1._2)) < 0
            }
          }
        if (better) { best = (p, c); bestDen = den }
      }
      val (bl, br) = best._1
      // the fused symbol: left text + right text, left's continuation class
      val joined: Sym = (bl._1 + br._1, bl._2)
      if (!vocabSet.contains(joined)) { vocab += joined; vocabSet += joined }
      words = words.map { case (syms, c) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[Sym]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == bl && syms(j + 1) == br) {
            out += joined; j += 2
          } else { out += syms(j); j += 1 }
        }
        (out.toArray, c)
      }
    }
    finish(words, vocab.toSeq)
  }

  /** Final token frequencies from the end-state segmentation of the
    * training word table. Index 0 stays freq 0 even if a corpus word
    * literally fused into the text "[UNK]" (that fused symbol is never
    * ADDED to the vocabulary — greedy apply reconstructs such words from
    * the longest available sub-pieces instead, and the reserved row's
    * stats must not absorb them). */
  private def finish(words: Array[(Array[Sym], Long)], vocab: Seq[Sym]): Model = {
    val used = scala.collection.mutable.HashMap.empty[Sym, Long]
    words.foreach { case (syms, c) =>
      syms.foreach(s => used.update(s, used.getOrElse(s, 0L) + c))
    }
    Model(vocab.zipWithIndex.map { case (s, i) =>
      (s._1, s._2, if (i == 0) 0L else used.getOrElse(s, 0L))
    })
  }

  /** The model as a (token, id, freq, is_continuation) table: row 0 is
    * `[UNK]` (freq 0), the alphabet and merged tokens follow at their
    * positional ids; `token` is the conventional display form
    * (continuations `##`-prefixed) with the flag carried SEPARATELY —
    * `TokenizerTransform algo=wordpiece mode=encode|decode` reads it
    * unchanged. */
  def vocabDf(spark: org.apache.spark.sql.SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    model.entries.zipWithIndex
      .map { case ((_, cont, f), i) => (model.display(i), i.toLong, f, cont) }
      .toDF("token", "id", "freq", "is_continuation")
  }

  /** Rebuild a [[Model]] from a persisted [[vocabDf]] table (vocab-bounded
    * collect; fails fast on a table that is not the WordPiece layout). */
  def modelFromVocabDf(vocabDf: DataFrame): Model = {
    val all = vocabDf.select("token", "id", "freq", "is_continuation")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._2)
    require(all.nonEmpty && all.head._1 == UnkToken && all.head._2 == 0L && !all.head._4,
      s"vocabDf is not a WordPiece layout (id 0 must be the non-continuation " +
        s"$UnkToken row) — build it with WordPiece.vocabDf")
    all.zipWithIndex.foreach { case ((t, id, _, cont), i) =>
      require(id == i.toLong, s"WordPiece ids must be contiguous from 0, found $id at rank $i")
      require(i == 0 || !cont || t.startsWith("##"),
        s"continuation token '$t' (id $id) must carry the ## display prefix")
    }
    Model(all.zipWithIndex.map { case ((t, _, f, cont), i) =>
      val body = if (i == 0) UnkToken else if (cont) t.substring(2) else t
      (body, cont, f)
    }.toSeq)
  }

  /** The raw encode struct column — `(pieces, ids, n_unk, n_words)`; see
    * [[graft.functions.WordPieceEncodeExpr]]. */
  def encodeStruct(text: Column, model: Model, maxInputChars: Int = 100): Column =
    graft.functions.WordPieceEncodeExpr.wordpiece_encode(text, model.vocab, maxInputChars)

  /** Encode documents to greedy-longest-match piece-id arrays: input
    * columns + `ids` (array<bigint>) + `n_tokens` + `n_unk_words` (words
    * that collapsed to `[UNK]`) + `n_words`. One narrow codegen'd
    * projection, zero shuffles. */
  def encodeIds(df: DataFrame, textCol: String, model: Model,
      maxInputChars: Int = 100): DataFrame =
    df.withColumn("_enc", encodeStruct(col(textCol), model, maxInputChars))
      .withColumn("ids", col("_enc.ids"))
      .withColumn("n_tokens", size(col("ids")).cast("long"))
      .withColumn("n_unk_words", col("_enc.n_unk"))
      .withColumn("n_words", col("_enc.n_words"))
      .drop("_enc")

  /** [[encodeIds]] plus `pieces` — the q196 surface: word-by-word, decode
    * must reproduce every non-`[UNK]` word byte-for-byte. */
  def encodeDetail(df: DataFrame, textCol: String, model: Model,
      maxInputChars: Int = 100): DataFrame =
    df.withColumn("_enc", encodeStruct(col(textCol), model, maxInputChars))
      .withColumn("pieces", col("_enc.pieces"))
      .withColumn("ids", col("_enc.ids"))
      .withColumn("n_tokens", size(col("ids")).cast("long"))
      .withColumn("n_unk_words", col("_enc.n_unk"))
      .withColumn("n_words", col("_enc.n_words"))
      .drop("_enc")

  /** Decode WordPiece ids back to whitespace-normalized text (`[UNK]`
    * renders its marker; word boundaries survive) — see
    * [[graft.functions.WordPieceDecodeIdsExpr]]. */
  def decodeIds(ids: Column, model: Model): Column =
    graft.functions.WordPieceDecodeIdsExpr.wordpiece_decode_ids(ids, model.vocab)
}
