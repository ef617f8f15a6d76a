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
        Simhash64Expr(exprs.head)
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
        Md5Prefix64Expr(exprs.head)
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
        CharEntropyExpr(exprs.head)
    ))
    ext.injectFunction((
      FunctionIdentifier("deflate_ratio"),
      new ExpressionInfo(classOf[DeflateRatioExpr].getName, "deflate_ratio"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        exprs match {
          case Seq(t) => DeflateRatioExpr(t, 6)
          case Seq(t, l) => DeflateRatioExpr(t,
            l.eval().asInstanceOf[Number].intValue())
        }
    ))
  }
}
