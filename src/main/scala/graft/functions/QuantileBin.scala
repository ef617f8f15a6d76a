package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Bin index of a double against a sorted boundary array: the count of
  * boundaries ≤ value (0 .. boundaries.length), by binary search.
  *
  * The composable form — `size(filter(lit(boundaries), b -> b <= v))` — runs
  * the interpreted HOF path: 2^bits-1 lambda evaluations per row per column.
  * This is one O(log bins) search. Comparison semantics match Spark SQL's
  * double ordering (NaN sorts above every value ⇒ bin = boundaries.length);
  * null input is handled by the CALLER (Layout wraps with coalesce(_, 0),
  * the composable form's behavior for nulls).
  */
case class QuantileBinExpr(child: Expression, boundaries: Array[Double])
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quantile_bin requires a double, got ${other.sql}")
    }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any): Any =
    QuantileBinExpr.compute(boundaries, v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boundsRef = ctx.addReferenceObj("bounds", boundaries, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.QuantileBinExpr.compute($boundsRef, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "quantile_bin"

  // Array[Double] equality is reference-based by default; make equal
  // boundary sets compare equal so plan canonicalization/CSE can dedupe.
  override def equals(other: Any): Boolean = other match {
    case QuantileBinExpr(c, b) => c == child && java.util.Arrays.equals(b, boundaries)
    case _                     => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(boundaries)
}

object QuantileBinExpr {

  /** Count of boundaries ≤ v. NaN counts above everything (Spark double
    * ordering), so it lands in the top bin.
    */
  def compute(bounds: Array[Double], v: Double): Int = {
    if (java.lang.Double.isNaN(v)) return bounds.length
    var lo = 0
    var hi = bounds.length // invariant: bounds(i) <= v for i < lo; > v for i >= hi
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  def quantile_bin(value: Column, boundaries: Array[Double]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      QuantileBinExpr(GraftColumnBridge.expression(value), boundaries))
  }
}
