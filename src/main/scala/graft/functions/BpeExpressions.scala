package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE tokenization with a trained merge list
  * ([[graft.llm.Bpe.trainMerges]]): whitespace-split, then each word is
  * reduced by the standard greedy-by-rank loop — find the adjacent symbol
  * pair with the LOWEST merge rank, fuse every occurrence, repeat until no
  * ranked pair remains.
  *
  * The rank table rides inside the expression as a reference object
  * (`addReferenceObj`, the [[MultiContainsExpr]] discipline) — merges shape
  * the computation like winnowing's k/w, they are not data — so
  * interpreted eval and generated code share one table and cannot drift. A
  * narrow codegen'd projection: zero shuffles, streaming-safe.
  */
case class BpeTokenizeExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_tokenize requires a string, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val applier = new BpeApplier(merges)

  override def nullSafeEval(s: Any): Any =
    applier.tokenize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeApplier", applier, classOf[BpeApplier].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.tokenize($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bpe_tokenize"
}

/** The apply kernel: rank lookup keyed "left right" (space-separated — a
  * char no symbol can contain, see Sep); per word a greedy
  * min-rank merge loop (O(len² · merges-applied) worst case on the SYMBOL
  * count of one word — words are short; the corpus never materializes more
  * than one word's symbols at a time).
  */
final class BpeApplier(merges: Seq[(String, String)]) extends Serializable {

  // Rank-key separator: a SPACE cannot occur inside a symbol — symbols are
  // code points (and concatenations) of words produced by the Java-\s
  // whitespace split, which removes every ' ' — so "a b" parses uniquely
  // and the key is collision-free. (NUL would NOT be safe here: \0 is not
  // Java-\s whitespace, so a crawl corpus with embedded NULs can carry \0
  // INSIDE symbols, and "a\0"+Sep+"b" would collide with "a"+Sep+"\0b".)
  private val Sep = " "

  private val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.putIfAbsent(a + Sep + b, i)
    }
    m
  }

  private def applyWord(word: String, out: java.util.ArrayList[UTF8String]): Unit = {
    // split into code-point symbols
    var syms = new java.util.ArrayList[String]()
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      syms.add(new String(Character.toChars(cp)))
      i += Character.charCount(cp)
    }
    var done = false
    while (!done && syms.size() > 1) {
      var bestRank = Int.MaxValue
      var j = 0
      while (j < syms.size() - 1) {
        val r = rank.get(syms.get(j) + Sep + syms.get(j + 1))
        if (r != null && r < bestRank) bestRank = r
        j += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val next = new java.util.ArrayList[String](syms.size())
        var k = 0
        while (k < syms.size()) {
          if (k < syms.size() - 1) {
            val r = rank.get(syms.get(k) + Sep + syms.get(k + 1))
            if (r != null && r.intValue() == bestRank) {
              next.add(syms.get(k) + syms.get(k + 1)); k += 2
            } else { next.add(syms.get(k)); k += 1 }
          } else { next.add(syms.get(k)); k += 1 }
        }
        syms = next
      }
    }
    var t = 0
    while (t < syms.size()) { out.add(UTF8String.fromString(syms.get(t))); t += 1 }
  }

  // THE whitespace definition — identical to training's split("\\s+")
  // (Java regex \s = [ \t\n\x0B\f\r]). Character.isWhitespace would also
  // split on Unicode spaces (U+2028, U+2000…) that training does NOT split
  // on, so merges would be trained against a different segmentation than
  // the one tokenization applies.
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def tokenize(s: UTF8String): ArrayData = {
    val str = s.toString
    val out = new java.util.ArrayList[UTF8String]()
    val n = str.length
    var i = 0
    while (i < n) {
      while (i < n && isWs(str.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(str.charAt(i))) i += 1
      if (i > start) applyWord(str.substring(start, i), out)
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }
}

object BpeTokenizeExpr {
  /** Column-level constructor (classic-session bridge). */
  def bpe_tokenize(text: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      BpeTokenizeExpr(GraftColumnBridge.expression(text), merges))
  }
}

/** UTF-8 bytes of a string as `array<bigint>` of 0..255 values — the
  * byte-fallback decomposition of [[graft.llm.Bpe.encodeIdsTotal]]
  * (SentencePiece `byte_fallback` / GPT-2 byte-level BPE: ids 0..255 ARE
  * the byte values). A narrow codegen'd projection over the string's
  * existing UTF-8 representation (`UTF8String` is already UTF-8 — no
  * transcoding happens).
  */
case class Utf8ByteIdsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"utf8_byte_ids requires a string, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(s: Any): Any = {
    val bts = s.asInstanceOf[UTF8String].getBytes
    val out = new Array[Long](bts.length)
    var i = 0
    while (i < bts.length) { out(i) = bts(i) & 0xFFL; i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bts = ctx.freshName("bts")
      val arr = ctx.freshName("arr")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bts = $c.getBytes();
         |long[] $arr = new long[$bts.length];
         |for (int $i = 0; $i < $bts.length; $i++) { $arr[$i] = $bts[$i] & 0xFFL; }
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "utf8_byte_ids"
}

object Utf8ByteIdsExpr {
  /** Column-level constructor (classic-session bridge). */
  def utf8_byte_ids(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(Utf8ByteIdsExpr(GraftColumnBridge.expression(text)))
  }
}

/** Encode a token array to vocab ids with O(1) lookups: the learned-token
  * map rides as a reference object (java HashMap — constant-time probes),
  * replacing the broadcast-map formulation whose `element_at` on a map
  * column LINEAR-SCANS the keys per token (measured dominant in the
  * text→ids path at real vocab sizes). With `byteFallback` an
  * out-of-vocabulary token decomposes to its UTF-8 bytes (ids 0..255 —
  * the [[graft.llm.Bpe.encodeIdsTotal]] total contract); without, it
  * encodes as −1 (the legacy [[graft.llm.Bpe.encodeIds]] contract).
  */
case class BpeEncodeIdsExpr(child: Expression, learnedVocab: Seq[(String, Long)],
    byteFallback: Boolean) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_encode_ids requires array<string>, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val encoder = new BpeIdEncoder(learnedVocab, byteFallback)

  override def nullSafeEval(toks: Any): Any =
    encoder.encode(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeIdEncoder", encoder, classOf[BpeIdEncoder].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bpe_encode_ids"
}

/** Count of tokens NOT in the learned vocab — `n_fallback_tokens` for the
  * total encoder (not recoverable from the id array: one fallback token
  * becomes several byte ids). Same reference-object map, same O(tokens)
  * pass. */
case class BpeOovCountExpr(child: Expression, learnedVocab: Seq[(String, Long)])
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_oov_count requires array<string>, got ${other.sql}")
    }

  override def dataType: DataType = LongType

  @transient private lazy val encoder = new BpeIdEncoder(learnedVocab, byteFallback = true)

  override def nullSafeEval(toks: Any): Any =
    encoder.oovCount(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeIdEncoder", encoder, classOf[BpeIdEncoder].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.oovCount($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bpe_oov_count"
}

/** The encode kernel: one HashMap probe per token; two passes (size, then
  * fill) when byte fallback expands tokens. */
final class BpeIdEncoder(learnedVocab: Seq[(String, Long)], byteFallback: Boolean)
    extends Serializable {

  private val map: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    learnedVocab.foreach { case (t, id) => m.put(t, id) }
    m
  }

  def encode(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    var len = 0
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      val id = map.get(t.toString)
      len += (if (id != null || !byteFallback) 1 else t.numBytes())
      i += 1
    }
    val out = new Array[Long](len)
    var p = 0
    i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      val id = map.get(t.toString)
      if (id != null) { out(p) = id.longValue(); p += 1 }
      else if (!byteFallback) { out(p) = -1L; p += 1 }
      else {
        val bts = t.getBytes
        var j = 0
        while (j < bts.length) { out(p) = bts(j) & 0xFFL; p += 1; j += 1 }
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  def oovCount(toks: ArrayData): Long = {
    val n = toks.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (map.get(toks.getUTF8String(i).toString) == null) c += 1
      i += 1
    }
    c
  }
}

object BpeEncodeIdsExpr {
  /** Column-level constructors (classic-session bridge). */
  def bpe_encode_ids(tokens: Column, learnedVocab: Seq[(String, Long)],
      byteFallback: Boolean): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      BpeEncodeIdsExpr(GraftColumnBridge.expression(tokens), learnedVocab, byteFallback))
  }
  def bpe_oov_count(tokens: Column, learnedVocab: Seq[(String, Long)]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      BpeOovCountExpr(GraftColumnBridge.expression(tokens), learnedVocab))
  }
}

/** Decode a byte-fallback id array back to its string: ids < 256 append
  * that raw byte, ids ≥ 256 append the UTF-8 bytes of learned token
  * `id − 256`; the byte buffer then reads back as one UTF-8 string. The
  * learned-token table rides as a reference object (vocab-bounded — the
  * [[BpeTokenizeExpr]] merge-table discipline). An id outside
  * [0, 256 + |vocab|) — or a NULL array element — decodes to NULL rather
  * than a silently-wrong string.
  */
case class BpeDecodeIdsExpr(child: Expression, learnedTokens: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_decode_ids requires array<bigint>, got ${other.sql}")
    }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  @transient private lazy val decoder = new BpeDecoder(learnedTokens)

  override def nullSafeEval(ids: Any): Any =
    decoder.decode(ids.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeDecoder", decoder, classOf[BpeDecoder].getName)
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = $ref.decode($c); ${ev.isNull} = ${ev.value} == null;")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bpe_decode_ids"
}

/** The decode kernel: two passes over the id array (size, then fill) — no
  * intermediate buffers, one allocation per row. */
final class BpeDecoder(learnedTokens: Seq[String]) extends Serializable {

  private val tok: Array[Array[Byte]] =
    learnedTokens.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray

  def decode(ids: ArrayData): UTF8String = {
    val n = ids.numElements()
    var len = 0
    var i = 0
    while (i < n) {
      if (ids.isNullAt(i)) return null
      val id = ids.getLong(i)
      if (id < 0L || id >= 256L + tok.length) return null
      len += (if (id < 256L) 1 else tok((id - 256L).toInt).length)
      i += 1
    }
    val out = new Array[Byte](len)
    var p = 0
    i = 0
    while (i < n) {
      val id = ids.getLong(i)
      if (id < 256L) { out(p) = id.toByte; p += 1 }
      else {
        val b = tok((id - 256L).toInt)
        System.arraycopy(b, 0, out, p, b.length)
        p += b.length
      }
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}

object BpeDecodeIdsExpr {
  /** Column-level constructor (classic-session bridge). */
  def bpe_decode_ids(ids: Column, learnedTokens: Seq[String]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      BpeDecodeIdsExpr(GraftColumnBridge.expression(ids), learnedTokens))
  }
}
