package graft.validate

import org.apache.spark.sql.DataFrame
import graft.core.{Params, PipelineContext, Stage, ValidationException}

/** SQLValidate — SQL returning exactly one row `[valid: Boolean, message]`;
  * `valid=false` aborts the pipeline with `message` (SURVEY.md §2.2; the
  * reference idiom is `SELECT bool, TO_JSON(NAMED_STRUCT(...)) FROM ...`,
  * Common.scala:437-446).
  */
final case class SQLValidate(
    name: String,
    sql: String,
    sqlParams: Map[String, String] = Map.empty
) extends Stage {
  val stageType = "SQLValidate"
  def execute(ctx: PipelineContext): Option[DataFrame] = {
    val df = ctx.spark.sql(Params.injectParameters(sql, ctx.sqlParams ++ sqlParams))
    val rows = df.limit(2).collect()
    require(
      rows.length == 1 && df.schema.length >= 1,
      s"SQLValidate $name: expected exactly one row, got ${rows.length}"
    )
    val row = rows.head
    val valid = row.get(0) match {
      case b: Boolean => b
      case other      => throw new ValidationException(s"SQLValidate $name: first column must be boolean, got $other")
    }
    val message = if (row.length > 1) String.valueOf(row.get(1)) else ""
    if (!valid) throw new ValidationException(s"SQLValidate $name failed: $message")
    None
  }
}

/** MetadataValidate — SQLValidate over the column-metadata view of
  * `inputView` (SURVEY.md §2.2; reference Common.scala:404-422).
  */
final case class MetadataValidate(
    name: String,
    inputView: String,
    sql: String,
    sqlParams: Map[String, String] = Map.empty
) extends Stage {
  val stageType = "MetadataValidate"
  def execute(ctx: PipelineContext): Option[DataFrame] = {
    val metaView = s"${inputView}_metadata"
    graft.schema.MetadataSchema
      .metadataDataFrame(ctx.spark, ctx.view(inputView))
      .createOrReplaceTempView(metaView)
    val resolved = Params
      .injectParameters(sql, ctx.sqlParams ++ sqlParams)
      .replace("${inputView}", metaView)
    SQLValidate(name, resolved).execute(ctx)
  }
}

/** EqualityValidate — two views must be schema- and multiset-equal
  * (SURVEY.md §2.2). Two `exceptAll` shuffles; at scale each is one
  * hash-partition pass, no collect of data rows.
  */
final case class EqualityValidate(
    name: String,
    leftView: String,
    rightView: String
) extends Stage {
  val stageType = "EqualityValidate"
  def execute(ctx: PipelineContext): Option[DataFrame] = {
    val l = ctx.view(leftView)
    val r = ctx.view(rightView)
    if (l.schema.map(f => (f.name, f.dataType)) != r.schema.map(f => (f.name, f.dataType)))
      throw new ValidationException(
        s"EqualityValidate $name: schema mismatch\n  left:  ${l.schema.simpleString}\n  right: ${r.schema.simpleString}"
      )
    val leftOnly = l.exceptAll(r).count()
    val rightOnly = r.exceptAll(l).count()
    if (leftOnly != 0 || rightOnly != 0)
      throw new ValidationException(
        s"EqualityValidate $name: $leftOnly rows only in $leftView, $rightOnly rows only in $rightView"
      )
    None
  }
}
