package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native WordPiece encoding with a trained vocabulary
  * ([[graft.llm.WordPiece.train]]): whitespace-split (the exact
  * [[graft.llm.Bpe.wordCounts]] `\s+` contract — training and encoding
  * must segment words identically), then each word is segmented by GREEDY
  * LONGEST-MATCH-FIRST (maximum munch): at each position take the longest
  * vocabulary token — a word-initial token at word start, a continuation
  * token inside a word — and advance. A word where some position has NO
  * match (or longer than `maxInputChars` code points) becomes ONE `[UNK]`
  * token, the whole word — the published BERT behavior, deliberately
  * different from BPE's merge loop and unigram's Viterbi.
  *
  * The vocabulary rides as `(body, isContinuation)` pairs — continuation
  * is an EXPLICIT flag, never inferred from a `##` string prefix: a word
  * that literally starts with "#" characters can merge into a word-initial
  * token whose text is "##…", which a prefix convention would silently
  * misread on decode (the classic ambiguity of the marker convention; the
  * `##` form here is display-only, see `pieces`). Index 0 (the `[UNK]`
  * row) is never matchable: a word that is literally the text "[UNK]"
  * segments through the alphabet or collapses to the REAL unk id, keeping
  * `n_unk` consistent with the count of id-0 entries (the q196 invariant).
  *
  * The table rides inside the expression as a reference object
  * (`addReferenceObj`, the [[BpeTokenizeExpr]] discipline): interpreted
  * eval and generated code share one table and cannot drift. A narrow
  * codegen'd projection: zero shuffles, streaming-safe.
  *
  * Output is a STRUCT so one pass yields everything the caller and the
  * in-band verifier need:
  * `(pieces array<string>, ids array<bigint>, n_unk bigint,
  * n_words bigint)`; `pieces` render continuations with the conventional
  * `##` prefix for display.
  */
case class WordPieceEncodeExpr(child: Expression, vocab: Seq[(String, Boolean)],
    maxInputChars: Int) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"wordpiece_encode requires a string, got ${other.sql}")
    }

  override def dataType: DataType = WordPieceEncodeExpr.outputType

  @transient private lazy val encoder = new WordPieceEncoder(vocab, maxInputChars)

  override def nullSafeEval(s: Any): Any =
    encoder.encode(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordPieceEncoder", encoder, classOf[WordPieceEncoder].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "wordpiece_encode"
}

object WordPieceEncodeExpr {
  /** The UNK marker string (display + decode rendering; identity is id 0 —
    * never matched as a regular vocabulary token, see [[WordPieceEncoder]]). */
  val UnkToken: String = "[UNK]"

  val outputType: StructType = StructType(Seq(
    StructField("pieces", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("ids", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("n_unk", LongType, nullable = false),
    StructField("n_words", LongType, nullable = false)))

  /** Column-level constructor (classic-session bridge). */
  def wordpiece_encode(text: Column, vocab: Seq[(String, Boolean)],
      maxInputChars: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      WordPieceEncodeExpr(GraftColumnBridge.expression(text), vocab, maxInputChars))
  }
}

/** The encode kernel. Per word of n code points with vocab-body lengths
  * ≤ L the greedy scan is O(n·L) HashMap probes — the corpus never
  * materializes more than one word's buffers at a time. Vocab index 0 MUST
  * be the `[UNK]` row ([[graft.llm.WordPiece.Model]] layout — enforced at
  * model load, not trusted here); word-initial and continuation tokens
  * live in SEPARATE maps keyed by body, so no string convention can
  * collide.
  */
final class WordPieceEncoder(vocab: Seq[(String, Boolean)], maxInputChars: Int)
    extends Serializable {

  private val rootIds = new java.util.HashMap[String, java.lang.Long]()
  private val contIds = new java.util.HashMap[String, java.lang.Long]()
  vocab.zipWithIndex.drop(1).foreach { case ((body, cont), i) =>
    (if (cont) contIds else rootIds).putIfAbsent(body, java.lang.Long.valueOf(i.toLong))
  }

  // longest body a token can match, per position class
  private val maxMatchLen: Int = {
    val it = vocab.iterator.drop(1).map(t => t._1.codePointCount(0, t._1.length))
    if (it.isEmpty) 1 else it.max.max(1)
  }

  private val unkPiece = UTF8String.fromString(WordPieceEncodeExpr.UnkToken)

  // THE whitespace definition — identical to training's split("\\s+")
  // (Java regex \s = [ \t\n\x0B\f\r]); see BpeApplier.isWs for why
  // Character.isWhitespace would desynchronize training and encoding.
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Segment ONE word; appends pieces/ids, returns the number of `[UNK]`
    * emitted for it (0 or 1 — a failed word is ONE unk, whatever its
    * length). */
  private def segmentWord(word: String,
      outPieces: java.util.ArrayList[UTF8String],
      outIds: java.util.ArrayList[java.lang.Long]): Int = {
    val n = word.codePointCount(0, word.length)
    if (n > maxInputChars) {
      outPieces.add(unkPiece); outIds.add(java.lang.Long.valueOf(0L))
      return 1
    }
    val cps = new Array[Int](n)
    var ci = 0
    var k = 0
    while (ci < word.length) {
      val cp = word.codePointAt(ci)
      cps(k) = cp; k += 1
      ci += Character.charCount(cp)
    }
    // greedy longest-match; roll back to a single [UNK] if any position fails
    val mark = outPieces.size()
    var start = 0
    var failed = false
    while (start < n && !failed) {
      val table = if (start == 0) rootIds else contIds
      var len = math.min(maxMatchLen, n - start)
      var matched = 0
      while (len >= 1 && matched == 0) {
        val body = new String(cps, start, len)
        val id = table.get(body)
        if (id != null) {
          outPieces.add(UTF8String.fromString(if (start == 0) body else "##" + body))
          outIds.add(id)
          matched = len
        }
        len -= 1
      }
      if (matched == 0) failed = true else start += matched
    }
    if (failed) {
      while (outPieces.size() > mark) {
        outPieces.remove(outPieces.size() - 1)
        outIds.remove(outIds.size() - 1)
      }
      outPieces.add(unkPiece); outIds.add(java.lang.Long.valueOf(0L))
      1
    } else 0
  }

  def encode(s: UTF8String): InternalRow = {
    val str = s.toString
    val outPieces = new java.util.ArrayList[UTF8String]()
    val outIds = new java.util.ArrayList[java.lang.Long]()
    var nUnk = 0L
    var nWords = 0L
    val n = str.length
    var i = 0
    while (i < n) {
      while (i < n && isWs(str.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(str.charAt(i))) i += 1
      if (i > start) {
        nWords += 1
        nUnk += segmentWord(str.substring(start, i), outPieces, outIds)
      }
    }
    val idArr = new Array[Long](outIds.size())
    var j = 0
    while (j < idArr.length) { idArr(j) = outIds.get(j).longValue(); j += 1 }
    val row = new GenericInternalRow(4)
    row.update(0, new GenericArrayData(outPieces.toArray(new Array[AnyRef](outPieces.size()))))
    row.update(1, org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(idArr))
    row.setLong(2, nUnk)
    row.setLong(3, nWords)
    row
  }
}

/** Decode a WordPiece id array back to text: id 0 renders the `[UNK]`
  * marker, a continuation token appends its body to the current word, a
  * word-initial token starts a new word (single-space separated) — so
  * `decode(encode(text))` reproduces the whitespace-NORMALIZED text
  * exactly wherever no `[UNK]` fired, and word boundaries survive even
  * around `[UNK]`s (the q196 in-band invariant compares word-by-word).
  * Continuation is the model's EXPLICIT flag, never a string prefix. An
  * id outside [0, |vocab|) — or a NULL array element — decodes to NULL
  * rather than a silently-wrong string.
  */
case class WordPieceDecodeIdsExpr(child: Expression, vocab: Seq[(String, Boolean)])
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"wordpiece_decode_ids requires array<bigint>, got ${other.sql}")
    }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  @transient private lazy val decoder = new WordPieceDecoder(vocab)

  override def nullSafeEval(ids: Any): Any =
    decoder.decode(ids.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordPieceDecoder", decoder, classOf[WordPieceDecoder].getName)
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = $ref.decode($c); ${ev.isNull} = ${ev.value} == null;")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "wordpiece_decode_ids"
}

/** The decode kernel: two passes over the id array (size, then fill) — no
  * intermediate buffers, one allocation per row. */
final class WordPieceDecoder(vocab: Seq[(String, Boolean)]) extends Serializable {

  private val bodies: Array[Array[Byte]] = vocab.zipWithIndex.map { case ((body, _), i) =>
    (if (i == 0) WordPieceEncodeExpr.UnkToken else body)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }.toArray
  private val cont: Array[Boolean] = vocab.zipWithIndex.map { case ((_, c), i) =>
    i != 0 && c
  }.toArray

  def decode(ids: ArrayData): UTF8String = {
    val n = ids.numElements()
    var len = 0
    var i = 0
    while (i < n) {
      if (ids.isNullAt(i)) return null
      val id = ids.getLong(i)
      if (id < 0L || id >= bodies.length.toLong) return null
      val ii = id.toInt
      len += bodies(ii).length + (if (i > 0 && !cont(ii)) 1 else 0)
      i += 1
    }
    val out = new Array[Byte](len)
    var p = 0
    i = 0
    while (i < n) {
      val ii = ids.getLong(i).toInt
      if (i > 0 && !cont(ii)) { out(p) = ' '.toByte; p += 1 }
      val b = bodies(ii)
      System.arraycopy(b, 0, out, p, b.length)
      p += b.length
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}

object WordPieceDecodeIdsExpr {
  /** Column-level constructor (classic-session bridge). */
  def wordpiece_decode_ids(ids: Column, vocab: Seq[(String, Boolean)]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      WordPieceDecodeIdsExpr(GraftColumnBridge.expression(ids), vocab))
  }
}
