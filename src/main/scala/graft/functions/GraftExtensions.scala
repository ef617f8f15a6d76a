package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: installs the native expressions in
  * every session of the cluster via configuration —
  *
  * {{{ spark.sql.extensions=graft.functions.GraftExtensions }}}
  *
  * — the deployment shape for a shared cluster (spark-defaults.conf), where
  * per-session `Udfs.register` calls would be missed by ad-hoc sessions
  * (thriftserver, scheduled jobs). Functions injected here resolve in plain
  * SQL with no session setup at all.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  // SQL-arity guard for single-argument expressions: `exprs.head` alone
  // would silently DROP extra arguments (`simhash64(a, b)` quietly hashing
  // only `a` is a wrong-answer generator, not a convenience)
  private def unary(fn: String,
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    if (exprs.length != 1) throw new IllegalArgumentException(
      s"$fn takes exactly 1 argument, got ${exprs.length} — usage: $fn(col)")
    exprs.head
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs(0), exprs(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "vec_cosine"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(exprs(0), exprs(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("winnowing_fingerprints"),
      new ExpressionInfo(classOf[WinnowingFingerprintsExpr].getName, "winnowing_fingerprints"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WinnowingFingerprintsExpr.fromExprs(exprs)
    ))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[Simhash64Expr].getName, "simhash64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Simhash64Expr(unary("simhash64", exprs))
    ))
    ext.injectFunction((
      FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalizeExpr].getName, "unicode_normalize"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        UnicodeNormalizeExpr.fromExprs(exprs)
    ))
    ext.injectFunction((
      FunctionIdentifier("md5_prefix64"),
      new ExpressionInfo(classOf[Md5Prefix64Expr].getName, "md5_prefix64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Md5Prefix64Expr(unary("md5_prefix64", exprs))
    ))
    ext.injectFunction((
      FunctionIdentifier("cdc_chunks"),
      new ExpressionInfo(classOf[CdcChunksExpr].getName, "cdc_chunks"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CdcChunksExpr.fromExprs(exprs)
    ))
    ext.injectFunction((
      FunctionIdentifier("multi_contains"),
      new ExpressionInfo(classOf[MultiContainsExpr].getName, "multi_contains"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MultiContainsExpr.fromExprs(exprs)
    ))
    ext.injectFunction((
      FunctionIdentifier("char_entropy"),
      new ExpressionInfo(classOf[CharEntropyExpr].getName, "char_entropy"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CharEntropyExpr(unary("char_entropy", exprs))
    ))
    ext.injectFunction((
      FunctionIdentifier("deflate_ratio"),
      new ExpressionInfo(classOf[DeflateRatioExpr].getName, "deflate_ratio"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        // the level must FOLD to an int (it configures the Deflater once,
        // it is not a per-row input): check foldability before eval() — a
        // non-foldable level used to die in an opaque unbound-expression
        // error and wrong arity in a MatchError. Foldable covers literals
        // of any integral width AND constant arithmetic (CAST(6 AS INT),
        // 1+5), which deployed SQL legitimately writes.
        exprs match {
          case Seq(t) => DeflateRatioExpr(t, 6)
          case Seq(t, l) if l.foldable =>
            l.eval() match {
              case i: java.lang.Integer => DeflateRatioExpr(t, i)
              case s: java.lang.Short => DeflateRatioExpr(t, s.toInt)
              case b: java.lang.Byte => DeflateRatioExpr(t, b.toInt)
              case lg: java.lang.Long
                  if lg >= Int.MinValue.toLong && lg <= Int.MaxValue.toLong =>
                DeflateRatioExpr(t, lg.toInt)
              case other => throw new IllegalArgumentException(
                s"deflate_ratio: level must fold to an integer, got " +
                  s"$other — usage: deflate_ratio(text[, level])")
            }
          case Seq(_, other) => throw new IllegalArgumentException(
            s"deflate_ratio: level must be a CONSTANT integer expression " +
              s"(it selects the Deflater level once, not per row), got " +
              s"non-foldable $other — usage: deflate_ratio(text[, level])")
          case other => throw new IllegalArgumentException(
            s"deflate_ratio takes 1 or 2 arguments (text[, level]), got " +
              s"${other.length}")
        }
    ))
  }
}
