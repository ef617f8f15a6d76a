package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Two classical corpus-quality signals from the published filtering
  * literature, as narrow codegen'd expressions (zero shuffles,
  * streaming-safe — the [[FixMojibakeExpr]] discipline):
  *
  *  - [[CharEntropyExpr]] — Shannon entropy (nats) of the document's
  *    Unicode code-point distribution. Gibberish/binary-spill text runs
  *    HIGH (near-uniform bytes), keyboard-mash and single-char padding
  *    run LOW; natural language sits in a stable mid band, so both tails
  *    are prune candidates. Deterministic: counts accumulate per code
  *    point and the entropy sum runs in ASCENDING code-point order, so
  *    the float result is reproducible across partitions and runs.
  *  - [[DeflateRatioExpr]] — deflate(text).length / utf8(text).length
  *    (zlib, fixed level). The compression-ratio heuristic of
  *    Gopher-style quality filtering: templated/repetitious documents
  *    compress far below natural prose, so a LOW ratio flags boilerplate
  *    that token-level repetition stats can miss (long-range repeats),
  *    while a ratio near/above 1 flags high-entropy noise. zlib output
  *    for a fixed level is deterministic for fixed input bytes.
  */
case class CharEntropyExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_entropy requires a string, got ${other.sql}")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(s: Any): Any =
    QualitySignals.charEntropy(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.QualitySignals.charEntropy($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "char_entropy"
}

object CharEntropyExpr {
  def char_entropy(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(CharEntropyExpr(GraftColumnBridge.expression(text)))
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_entropy", exprs => CharEntropyExpr(exprs.head), "built-in")
}

case class DeflateRatioExpr(child: Expression, level: Int)
    extends UnaryExpression {
  require(level >= 1 && level <= 9, s"deflate level must be in [1, 9], got $level")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"deflate_ratio requires a string, got ${other.sql}")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(s: Any): Any =
    QualitySignals.deflateRatio(s.asInstanceOf[UTF8String], level)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.QualitySignals.deflateRatio($c, $level);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "deflate_ratio"
}

object DeflateRatioExpr {
  /** Level 6 = zlib's default speed/size balance; the RATIO ordering
    * between documents (what filtering thresholds consume) is stable
    * across levels. */
  def deflate_ratio(text: Column, level: Int = 6): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      DeflateRatioExpr(GraftColumnBridge.expression(text), level))
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "deflate_ratio",
      {
        case Seq(t) => DeflateRatioExpr(t, 6)
        case Seq(t, org.apache.spark.sql.catalyst.expressions.Literal(l: Int, IntegerType)) =>
          DeflateRatioExpr(t, l)
        case other => throw new IllegalArgumentException(
          s"deflate_ratio(text[, level]) — level must be an int literal, got $other")
      },
      "built-in")
}

/** Static kernels (called from generated code — must be public, stateless
  * and allocation-light). */
object QualitySignals {

  /** Shannon entropy in nats over Unicode code points; 0.0 for the empty
    * string. Counts in a sorted map so the float sum order is fixed. */
  def charEntropy(s: UTF8String): Double = {
    val str = s.toString
    if (str.isEmpty) return 0.0
    val counts = new java.util.TreeMap[Integer, Array[Long]]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1L)) else slot(0) += 1L
      i += Character.charCount(cp)
      n += 1L
    }
    var h = 0.0
    val it = counts.values.iterator
    while (it.hasNext) {
      val p = it.next()(0).toDouble / n
      h -= p * math.log(p)
    }
    h
  }

  /** deflate(utf8 bytes).length / bytes.length at `level`; 1.0 for the
    * empty string (nothing to compress, nothing saved). */
  def deflateRatio(s: UTF8String, level: Int): Double = {
    val bytes = s.getBytes
    if (bytes.isEmpty) return 1.0
    val d = new java.util.zip.Deflater(level)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / bytes.length
    } finally d.end()
  }
}
