package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native mojibake repair — the UTF-8-misread-as-legacy-charset fix (the
  * core transform of the public `ftfy` tool): text that was UTF-8 encoded
  * but DECODED as windows-1252/latin-1 somewhere upstream ("é" → "Ã©",
  * "'" → "â€™") is detected and inverted, iteratively for multiply-mangled
  * text ("Ã©" mangled again → "ÃÂ©"). Crawl corpora are full of
  * this; token counts, dedup keys and language ID all degrade on mangled
  * text.
  *
  * The repair pass per string:
  *
  *  1. Map every char back to the byte a windows-1252 decoder read it
  *     from: U+0000..U+00FF → that byte, except 0x80..0x9F which
  *     windows-1252 maps to 27 specific characters ("€‚ƒ„…†‡ˆ‰Š‹ŒŽ''""•–—˜™š›œžŸ");
  *     both those characters AND the raw C1 controls (a latin-1 decoder
  *     leaves 0x80..0x9F as-is) map back — the "sloppy windows-1252" of
  *     the public ftfy, covering both decoders at once. Any char above
  *     U+00FF outside that set ⇒ the string is NOT mojibake; stop.
  *  2. STRICTLY validate the byte string as UTF-8 (no overlongs, no
  *     surrogates, no > U+10FFFF, no truncation) AND require at least one
  *     multi-byte sequence. Anything less ⇒ stop (pure ASCII is a fixed
  *     point; a lone "é" has no valid re-reading).
  *  3. Replace the string with the re-decoded text; repeat (up to
  *     `maxPasses`, default 3 — double-mangling is common, deeper is
  *     vanishingly rare and each pass strictly shrinks the string).
  *
  * The inversion is EXACT: pass counts and outputs are deterministic
  * functions of the input bytes, so `repair(mangle^k(t)) == t` for any t
  * containing a multi-byte char and k ≤ maxPasses — the q197 in-band
  * contract. (Inherent ambiguity caveat: text a user GENUINELY meant as
  * "Ã©" is indistinguishable from mangled "é" — the repair prefers the
  * reading that survived an encode/decode round trip, as ftfy does.)
  *
  * Output is a STRUCT `(fixed string, n_passes int)` from one pass —
  * `n_passes = 0` means the input was already clean. A narrow codegen'd
  * projection (reference-object kernel, the [[BpeTokenizeExpr]]
  * discipline): zero shuffles, streaming-safe.
  */
case class FixMojibakeExpr(child: Expression, maxPasses: Int,
    perLine: Boolean = false)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"fix_mojibake requires a string, got ${other.sql}")
    }

  override def dataType: DataType = FixMojibakeExpr.outputType

  @transient private lazy val fixer = new MojibakeFixer(maxPasses, perLine)

  override def nullSafeEval(s: Any): Any =
    fixer.fix(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mojibakeFixer", fixer, classOf[MojibakeFixer].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.fix($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "fix_mojibake"
}

object FixMojibakeExpr {
  val outputType: StructType = StructType(Seq(
    StructField("fixed", StringType, nullable = false),
    StructField("n_passes", IntegerType, nullable = false)))

  /** Column-level constructor (classic-session bridge). `perLine = true`
    * repairs each '\n'-separated line independently (ftfy's segment
    * behavior): a genuine emoji/CJK char on one line of a mixed-content
    * crawl document no longer blocks repair of the mangled lines around
    * it. Document mode stays the default — it is the stricter contract
    * (the whole string must re-read as UTF-8). */
  def fix_mojibake(text: Column, maxPasses: Int = 3,
      perLine: Boolean = false): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      FixMojibakeExpr(GraftColumnBridge.expression(text), maxPasses, perLine))
  }
}

/** The repair kernel. One pass is two scans of the char array (byte-map +
  * strict UTF-8 validation) and one allocation; passes cap at `maxPasses`
  * and each strictly shrinks the string, so the worst case is
  * O(maxPasses · len).
  */
final class MojibakeFixer(maxPasses: Int, perLine: Boolean = false)
    extends Serializable {

  /** windows-1252's 0x80..0x9F row (0x81/0x8D/0x8F/0x90/0x9D are
    * undefined there — a cp1252 decoder typically passes the raw C1
    * control through, which the C1 fallback below already covers). */
  private val cp1252: java.util.HashMap[Character, Integer] = {
    val m = new java.util.HashMap[Character, Integer]()
    val row = Array(
      0x80 -> '€', 0x82 -> '‚', 0x83 -> 'ƒ', 0x84 -> '„',
      0x85 -> '…', 0x86 -> '†', 0x87 -> '‡', 0x88 -> 'ˆ',
      0x89 -> '‰', 0x8A -> 'Š', 0x8B -> '‹', 0x8C -> 'Œ',
      0x8E -> 'Ž', 0x91 -> '‘', 0x92 -> '’', 0x93 -> '“',
      0x94 -> '”', 0x95 -> '•', 0x96 -> '–', 0x97 -> '—',
      0x98 -> '˜', 0x99 -> '™', 0x9A -> 'š', 0x9B -> '›',
      0x9C -> 'œ', 0x9E -> 'ž', 0x9F -> 'Ÿ')
    row.foreach { case (b, c) => m.put(Character.valueOf(c), Integer.valueOf(b)) }
    m
  }

  /** One repair pass: null if the string is not mojibake. */
  private def onePass(s: String): String = {
    val n = s.length
    if (n == 0) return null
    val bytes = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c <= 'ÿ') bytes(i) = c.toByte
      else {
        val b = cp1252.get(Character.valueOf(c))
        if (b == null) return null
        bytes(i) = b.intValue().toByte
      }
      i += 1
    }
    // strict UTF-8 validation with >= 1 multi-byte sequence
    var multi = false
    i = 0
    while (i < n) {
      val b0 = bytes(i) & 0xFF
      if (b0 < 0x80) i += 1
      else if ((b0 & 0xE0) == 0xC0) {
        if (b0 < 0xC2 || i + 1 >= n || (bytes(i + 1) & 0xC0) != 0x80) return null
        multi = true; i += 2
      } else if ((b0 & 0xF0) == 0xE0) {
        if (i + 2 >= n || (bytes(i + 1) & 0xC0) != 0x80 ||
            (bytes(i + 2) & 0xC0) != 0x80) return null
        val cp = ((b0 & 0x0F) << 12) | ((bytes(i + 1) & 0x3F) << 6) | (bytes(i + 2) & 0x3F)
        if (cp < 0x800 || (cp >= 0xD800 && cp <= 0xDFFF)) return null
        multi = true; i += 3
      } else if ((b0 & 0xF8) == 0xF0) {
        if (i + 3 >= n || (bytes(i + 1) & 0xC0) != 0x80 ||
            (bytes(i + 2) & 0xC0) != 0x80 || (bytes(i + 3) & 0xC0) != 0x80) return null
        val cp = ((b0 & 0x07) << 18) | ((bytes(i + 1) & 0x3F) << 12) |
          ((bytes(i + 2) & 0x3F) << 6) | (bytes(i + 3) & 0x3F)
        if (cp < 0x10000 || cp > 0x10FFFF) return null
        multi = true; i += 4
      } else return null
    }
    if (!multi) return null
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  private def fixWhole(in: String): (String, Int) = {
    var s = in
    var passes = 0
    var done = false
    while (passes < maxPasses && !done) {
      val next = onePass(s)
      if (next == null) done = true
      else { s = next; passes += 1 }
    }
    (s, passes)
  }

  /** Repair. Document mode: the whole string must re-read as UTF-8 (one
    * genuine >U+00FF char outside the cp1252 row anywhere blocks repair —
    * the strict contract). Per-line mode: each '\n'-separated line repairs
    * independently (a mangled multi-byte sequence can never CONTAIN a real
    * '\n' — every byte of one is >= 0x80 — so the split is always safe);
    * `n_passes` is then the MAX pass depth across lines (0 = nothing
    * repaired anywhere). */
  def fix(u: UTF8String): InternalRow = {
    val in = u.toString
    var fixed: String = null
    var passes = 0
    if (!perLine || in.indexOf('\n') < 0) {
      val r = fixWhole(in); fixed = r._1; passes = r._2
    } else {
      // -1 keeps trailing empty lines so the join round-trips exactly
      val lines = in.split("\n", -1)
      val sb = new java.lang.StringBuilder(in.length)
      var i = 0
      while (i < lines.length) {
        val r = fixWhole(lines(i))
        if (i > 0) sb.append('\n')
        sb.append(r._1)
        if (r._2 > passes) passes = r._2
        i += 1
      }
      fixed = sb.toString
    }
    val row = new GenericInternalRow(2)
    row.update(0, UTF8String.fromString(fixed))
    row.setInt(1, passes)
    row
  }
}
