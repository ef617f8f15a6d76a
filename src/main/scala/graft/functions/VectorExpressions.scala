package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two numeric arrays.
  *
  * The composable form — `aggregate(zip_with(a, b, _*_), 0d, _+_)` — is
  * codegen'd but materializes the intermediate products array per row; for
  * ANN scoring (millions of candidate pairs × 64-1024 dims) that allocation
  * is the hot path. This expression generates a single fused loop with no
  * intermediate allocation (`doGenCode`), with an interpreted fallback
  * (`nullSafeEval`) for non-codegen paths.
  *
  * Null elements are treated as 0. Arrays of different lengths dot over the
  * common prefix (same as `zip_with`'s null-padding followed by `+` ignoring
  * nulls would be wrong — we choose the stricter prefix semantics; inputs in
  * the engine always have equal dims).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(l: NumericType, _), ArrayType(r: NumericType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_dot requires two numeric arrays, got ${left.dataType.sql} and ${right.dataType.sql}")
    }
  }

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): NumericType =
    e.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

  override def nullSafeEval(l: Any, r: Any): Any = {
    val la = l.asInstanceOf[ArrayData]
    val ra = r.asInstanceOf[ArrayData]
    val lt = elemType(left)
    val rt = elemType(right)
    val n = math.min(la.numElements(), ra.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (!la.isNullAt(i) && !ra.isNullAt(i)) {
        sum += numeric(la, i, lt) * numeric(ra, i, rt)
      }
      i += 1
    }
    sum
  }

  private def numeric(a: ArrayData, i: Int, t: NumericType): Double = t match {
    case FloatType   => a.getFloat(i).toDouble
    case DoubleType  => a.getDouble(i)
    case IntegerType => a.getInt(i).toDouble
    case LongType    => a.getLong(i).toDouble
    case ShortType   => a.getShort(i).toDouble
    case ByteType    => a.getByte(i).toDouble
    case d: DecimalType => a.getDecimal(i, d.precision, d.scale).toDouble
  }

  private def accessor(t: NumericType, arr: String, idx: String): String = t match {
    case FloatType   => s"(double)$arr.getFloat($idx)"
    case DoubleType  => s"$arr.getDouble($idx)"
    case IntegerType => s"(double)$arr.getInt($idx)"
    case LongType    => s"(double)$arr.getLong($idx)"
    case ShortType   => s"(double)$arr.getShort($idx)"
    case ByteType    => s"(double)$arr.getByte($idx)"
    case d: DecimalType => s"$arr.getDecimal($idx, ${d.precision}, ${d.scale}).toDouble()"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lt = elemType(left)
    val rt = elemType(right)
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
        |int $n = java.lang.Math.min($l.numElements(), $r.numElements());
        |double $sum = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  if (!$l.isNullAt($i) && !$r.isNullAt($i)) {
        |    $sum += ${accessor(lt, l, i)} * ${accessor(rt, r, i)};
        |  }
        |}
        |${ev.value} = $sum;
      """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

/** Native cosine similarity: dot product and BOTH norms accumulated in ONE
  * fused loop — the composable form (`dot/(norm*norm)`) traverses each array
  * three times and the `aggregate(zip_with(...))` form allocates per pass;
  * ANN reranking scores millions of candidate pairs, so the traversal count
  * is the hot path. Zero-norm inputs yield 0.0 (matches
  * `Similarity.cosine`'s guard).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(_: NumericType, _), ArrayType(_: NumericType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_cosine requires two numeric arrays, got ${left.dataType.sql} and ${right.dataType.sql}")
    }

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): NumericType =
    e.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

  private def numeric(a: ArrayData, i: Int, t: NumericType): Double = t match {
    case FloatType      => a.getFloat(i).toDouble
    case DoubleType     => a.getDouble(i)
    case IntegerType    => a.getInt(i).toDouble
    case LongType       => a.getLong(i).toDouble
    case ShortType      => a.getShort(i).toDouble
    case ByteType       => a.getByte(i).toDouble
    case d: DecimalType => a.getDecimal(i, d.precision, d.scale).toDouble
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val la = l.asInstanceOf[ArrayData]
    val ra = r.asInstanceOf[ArrayData]
    val lt = elemType(left)
    val rt = elemType(right)
    val n = math.min(la.numElements(), ra.numElements())
    var dot = 0.0
    var nl = 0.0
    var nr = 0.0
    var i = 0
    while (i < n) {
      val x = if (la.isNullAt(i)) 0.0 else numeric(la, i, lt)
      val y = if (ra.isNullAt(i)) 0.0 else numeric(ra, i, rt)
      dot += x * y; nl += x * x; nr += y * y
      i += 1
    }
    val denom = math.sqrt(nl) * math.sqrt(nr)
    if (denom == 0.0) 0.0 else dot / denom
  }

  private def accessor(t: NumericType, arr: String, idx: String): String = t match {
    case FloatType      => s"(double)$arr.getFloat($idx)"
    case DoubleType     => s"$arr.getDouble($idx)"
    case IntegerType    => s"(double)$arr.getInt($idx)"
    case LongType       => s"(double)$arr.getLong($idx)"
    case ShortType      => s"(double)$arr.getShort($idx)"
    case ByteType       => s"(double)$arr.getByte($idx)"
    case d: DecimalType => s"$arr.getDecimal($idx, ${d.precision}, ${d.scale}).toDouble()"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lt = elemType(left)
    val rt = elemType(right)
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nl = ctx.freshName("nl")
      val nr = ctx.freshName("nr")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val denom = ctx.freshName("denom")
      s"""
        |int $n = java.lang.Math.min($l.numElements(), $r.numElements());
        |double $dot = 0.0; double $nl = 0.0; double $nr = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  double $x = $l.isNullAt($i) ? 0.0 : ${accessor(lt, l, i)};
        |  double $y = $r.isNullAt($i) ? 0.0 : ${accessor(rt, r, i)};
        |  $dot += $x * $y; $nl += $x * $x; $nr += $y * $y;
        |}
        |double $denom = java.lang.Math.sqrt($nl) * java.lang.Math.sqrt($nr);
        |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
      """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_cosine"
}

object VectorExpressions {

  /** Register `vec_dot` / `vec_cosine` for SQL use. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot",
      exprs => DotProduct(exprs(0), exprs(1)),
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_cosine",
      exprs => CosineSimilarity(exprs(0), exprs(1)),
      "built-in"
    )
  }

  /** Column-level native dot product (classic-session bridge: Spark 4's
    * public Column wraps a ColumnNode; see GraftColumnBridge).
    */
  def vec_dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      DotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  /** Column-level native fused cosine similarity. */
  def vec_cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      CosineSimilarity(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }
}
