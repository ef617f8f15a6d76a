package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Character-n-gram language identification — the classic rank-order
  * profile method (Cavnar & Trenkle 1994, "N-Gram-Based Text
  * Categorization", the public TextCat algorithm): each language is a
  * ranked list of its most frequent character 1..5-grams; a document is
  * profiled the same way and scored by the "out-of-place" distance (sum
  * over the document's top grams of |doc rank − profile rank|, missing
  * grams costing the maximum); the nearest profile wins.
  *
  * This replaces the stopword-hit heuristic for real pipelines: rank
  * profiles separate close languages (es/pt/it, de/nl) and work on short
  * documents where whole-word stopword hits are sparse, because character
  * n-grams see morphology (suffixes, digraphs, diacritics) rather than
  * only whole function words.
  *
  * The profiles ride inside the expression as a reference object (the
  * [[BpeTokenizeExpr]] discipline): a narrow codegen'd projection — zero
  * shuffles, streaming-safe, profile training happens ONCE at class load
  * from the in-repo seed corpora ([[graft.llm.LangId]]), never per row or
  * per task.
  */
case class LangIdNgramExpr(child: Expression, scorer: LangIdScorer)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"langid_ngram requires a string, got ${other.sql}")
    }

  override def dataType: DataType = StringType

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(scorer.classify(s.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langIdScorer", scorer, classOf[LangIdScorer].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String" +
        s".fromString($ref.classify($c.toString()));")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "langid_ngram"
}

object LangIdNgramExpr {
  /** Column-level constructor (classic-session bridge). */
  def langid_ngram(text: Column, scorer: LangIdScorer): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      LangIdNgramExpr(GraftColumnBridge.expression(text), scorer))
  }
}

/** The TextCat kernel: profile building and out-of-place scoring.
  *
  * Normalization: lowercase, every non-letter becomes the word-boundary
  * pad `_`, runs collapse to one pad, and the text is wrapped in pads —
  * so grams see "_the_" exactly as the original paper's token padding
  * does. Grams of all lengths 1..5 are counted in one pass; a profile
  * keeps the `profileSize` most frequent with deterministic
  * (count desc, gram) ties.
  *
  * Per-document cost is bounded: only the first `maxChars` characters
  * are profiled (language is decided long before 4 KiB) — classification
  * is O(maxChars · 5) gram counting + |langs| · profileSize rank lookups,
  * independent of document length.
  */
final class LangIdScorer(
    languageProfiles: Seq[(String, Seq[String])],
    val profileSize: Int,
    maxChars: Int = 4096,
    undAbsCutoff: Double = 1.0,
    undRatioCutoff: Double = 1.0) extends Serializable {

  private val langs: Array[String] = languageProfiles.map(_._1).toArray
  private val ranks: Array[java.util.HashMap[String, Integer]] =
    languageProfiles.map { case (_, grams) =>
      val m = new java.util.HashMap[String, Integer]()
      grams.zipWithIndex.foreach { case (g, i) => m.put(g, i) }
      m
    }.toArray

  /** Normalized char array: lowercase letters, collapsed `_` boundaries,
    * leading/trailing pad. Empty input → just pads. */
  private def normalize(text: String): Array[Char] = {
    val n = math.min(text.length, maxChars)
    val sb = new java.lang.StringBuilder(n + 2)
    sb.append('_')
    var i = 0
    var lastPad = true
    while (i < n) {
      val c = text.charAt(i)
      if (Character.isLetter(c)) {
        sb.append(Character.toLowerCase(c)); lastPad = false
      } else if (!lastPad) { sb.append('_'); lastPad = true }
      i += 1
    }
    if (!lastPad) sb.append('_')
    val out = new Array[Char](sb.length())
    sb.getChars(0, sb.length(), out, 0)
    out
  }

  /** The document's ranked gram profile (count desc, gram asc), capped at
    * `profileSize`. Pure-pad grams ("_", "__", …) are skipped — they carry
    * no language signal and would crowd out real grams. */
  def profile(text: String): Array[String] = {
    val chars = normalize(text)
    val counts = new java.util.HashMap[String, Integer]()
    var start = 0
    while (start < chars.length) {
      var len = 1
      while (len <= 5 && start + len <= chars.length) {
        // skip grams that are only padding
        var allPad = true
        var j = start
        while (j < start + len && allPad) { if (chars(j) != '_') allPad = false; j += 1 }
        if (!allPad) {
          val g = new String(chars, start, len)
          val c = counts.get(g)
          counts.put(g, if (c == null) 1 else c + 1)
        }
        len += 1
      }
      start += 1
    }
    import scala.jdk.CollectionConverters._
    counts.entrySet().asScala.toArray
      .sortBy(e => (-e.getValue.intValue(), e.getKey))
      .take(profileSize)
      .map(_.getKey)
  }

  /** Every profile's normalized out-of-place distance for `text` —
    * diagnostics and floor calibration (empty when no letters survive
    * normalization). */
  def allScores(text: String): Seq[(String, Double)] = {
    val doc = profile(text)
    if (doc.isEmpty) Nil
    else langs.indices.map { i =>
      (langs(i), distance(doc, i).toDouble / (doc.length.toDouble * profileSize))
    }.toSeq
  }

  /** Out-of-place distance of a document profile to language `li`. */
  private def distance(doc: Array[String], li: Int): Long = {
    val rank = ranks(li)
    var d = 0L
    var i = 0
    while (i < doc.length) {
      val r = rank.get(doc(i))
      d += (if (r == null) profileSize else math.abs(r.intValue() - i))
      i += 1
    }
    d
  }

  /** Best language for `text`, `und` when no letters survive
    * normalization. Ties break by language code (deterministic).
    *
    * Non-Latin scripts are decided by SCRIPT, not n-grams (the standard
    * langid architecture: script identification first, statistical models
    * only within a script): when > 50% of the sampled letters sit in one
    * detectable non-Latin script, the script's dominant language is
    * returned directly — zh/ja/ko (ja when kana accompanies the Han
    * ideographs), ru, el, ar, he, hi, th. This is the documented
    * dominant-language-per-script approximation; separating languages
    * WITHIN such a script (ru vs uk, ar vs fa) takes trained profiles,
    * added exactly like the Latin seed corpora.
    */
  def classify(text: String): String = classifyWithScore(text)._1

  /** Language plus the normalized out-of-place distance of the winning
    * Latin profile: 0 = every document gram sits at its profile rank,
    * 1 = no document gram appears in the profile at all. Script-gated
    * documents score 0 (the script IS the evidence); letterless documents
    * score 1.
    *
    * The `und` confidence floor (TextCat's unknown cutoff, calibrated in
    * LangIdCalib/LangIdSpec): a document is out-of-set — an unprofiled
    * Latin language, code, letter soup — exactly when BOTH hold:
    * the best profile is absolutely far (normalized distance >
    * `undAbsCutoff`) AND no profile stands out from the pack (best/mean
    * ratio > `undRatioCutoff`; the miss-cost floor a hard document pays
    * is paid to EVERY profile, so the ratio is length-robust where the
    * absolute distance is not). Then the answer is `und` — a langid
    * filter must never confidently mislabel out-of-set text. Held-out
    * sentences of all 10 profiled languages sit below at least one
    * cutoff; fi/hu/cs sentences, code and letter soup sit above both.
    * Both cutoffs default to 1.0 = floor disabled (distances and ratios
    * never exceed 1), the back-compatible always-answer mode.
    */
  def classifyWithScore(text: String): (String, Double) = {
    scriptGate(text) match {
      case null =>
        val doc = profile(text)
        if (doc.isEmpty) return ("und", 1.0)
        var best = 0
        var bestD = Long.MaxValue
        var sumD = 0.0
        var i = 0
        while (i < langs.length) {
          val d = distance(doc, i)
          sumD += d
          if (d < bestD || (d == bestD && langs(i) < langs(best))) { best = i; bestD = d }
          i += 1
        }
        val norm = doc.length.toDouble * profileSize
        val frac = bestD.toDouble / norm
        val ratio = if (sumD > 0) bestD.toDouble * langs.length / sumD else 1.0
        val out =
          if (frac > undAbsCutoff && ratio > undRatioCutoff) "und" else langs(best)
        (out, frac)
      case lang => (lang, 0.0)
    }
  }

  // scripts the gate recognizes, with the dominant language per script
  private val ScriptLangs: Array[(Character.UnicodeScript, String)] = Array(
    Character.UnicodeScript.HAN -> "zh",
    Character.UnicodeScript.HIRAGANA -> "ja",
    Character.UnicodeScript.KATAKANA -> "ja",
    Character.UnicodeScript.HANGUL -> "ko",
    Character.UnicodeScript.CYRILLIC -> "ru",
    Character.UnicodeScript.GREEK -> "el",
    Character.UnicodeScript.ARABIC -> "ar",
    Character.UnicodeScript.HEBREW -> "he",
    Character.UnicodeScript.DEVANAGARI -> "hi",
    Character.UnicodeScript.THAI -> "th")

  /** The non-Latin script decision, or null to fall through to profiles. */
  private def scriptGate(text: String): String = {
    val n = math.min(text.length, maxChars)
    val counts = new Array[Int](ScriptLangs.length)
    var letters = 0
    var i = 0
    while (i < n) {
      val cp = text.codePointAt(i)
      if (Character.isLetter(cp)) {
        letters += 1
        val s = Character.UnicodeScript.of(cp)
        var j = 0
        while (j < ScriptLangs.length) {
          if (ScriptLangs(j)._1 eq s) { counts(j) += 1; j = ScriptLangs.length }
          else j += 1
        }
      }
      i += Character.charCount(cp)
    }
    if (letters == 0) return null
    // Han + kana are ONE writing system (Japanese): any kana alongside Han
    // ideographs decides ja; Han alone decides zh
    val han = counts(0)
    val kana = counts(1) + counts(2)
    if ((han + kana) * 2 > letters) return if (kana > 0) "ja" else "zh"
    var j = 3
    while (j < ScriptLangs.length) {
      if (counts(j) * 2 > letters) return ScriptLangs(j)._2
      j += 1
    }
    null
  }
}
