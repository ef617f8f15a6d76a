package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Reconstruction kernels for [[graft.llm.SpanDedup]] — both are ONE
  * linear merge-walk over the token array and the SORTED removed-position
  * array. The higher-order-function formulation
  * (`filter(arr, (t, i) => !array_contains(rem, i))`) probes the removed
  * array per TOKEN: O(|arr|·|rem|) per document, quadratic on exactly the
  * documents span dedup exists for (a fully-duplicated 100k-token book
  * page costs 10^10 comparisons per row). The merge-walk is O(|arr|).
  */

/** Kept tokens joined by single spaces: tokens whose position appears in
  * the sorted `removed` array are skipped. */
case class RemovePositionsExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"remove_positions requires (array<string>, array<int>), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = StringType

  override def nullSafeEval(arr: Any, rem: Any): Any =
    SpanKernels.removePositions(arr.asInstanceOf[ArrayData], rem.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, r) =>
      s"graft.functions.SpanKernels.removePositions($a, $r)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)

  override def prettyName: String = "remove_positions"
}

/** Count of maximal runs in a sorted position array (gaps-and-islands in
  * one pass). */
case class SpanCountExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"span_count requires array<int>, got ${other.sql}")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(rem: Any): Any =
    SpanKernels.spanCount(rem.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, r => s"graft.functions.SpanKernels.spanCount($r)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "span_count"
}

/** Static kernels (called from generated code — keep them Java-callable). */
object SpanKernels {

  def removePositions(arr: ArrayData, rem: ArrayData): UTF8String = {
    val n = arr.numElements()
    val m = rem.numElements()
    val kept = new java.util.ArrayList[UTF8String](n)
    var i = 0
    var j = 0
    var bytes = 0
    while (i < n) {
      while (j < m && rem.getInt(j) < i) j += 1
      if (j < m && rem.getInt(j) == i) { j += 1 }
      else {
        val t = arr.getUTF8String(i)
        kept.add(t)
        bytes += t.numBytes() + 1
      }
      i += 1
    }
    if (kept.isEmpty) return UTF8String.EMPTY_UTF8
    val out = new Array[Byte](bytes - 1)
    var p = 0
    var k = 0
    while (k < kept.size()) {
      if (k > 0) { out(p) = ' '; p += 1 }
      val b = kept.get(k).getBytes
      System.arraycopy(b, 0, out, p, b.length)
      p += b.length
      k += 1
    }
    UTF8String.fromBytes(out)
  }

  def spanCount(rem: ArrayData): Long = {
    val m = rem.numElements()
    var c = 0L
    var i = 0
    while (i < m) {
      if (i == 0 || rem.getInt(i) != rem.getInt(i - 1) + 1) c += 1
      i += 1
    }
    c
  }
}

object SpanExpressions {
  /** Column-level constructors (classic-session bridge). */
  def remove_positions(tokens: Column, removed: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(RemovePositionsExpr(
      GraftColumnBridge.expression(tokens), GraftColumnBridge.expression(removed)))
  }
  def span_count(removed: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(SpanCountExpr(GraftColumnBridge.expression(removed)))
  }
}
