package graft

import org.apache.spark.sql.functions._
import graft.core.PipelineContext
import graft.schema.FieldSpec
import graft.transform.TypingTransform

class TypingSpec extends SparkSpec {
  import spark.implicits._

  private def typeRows(rows: Seq[(String, String, String)], specs: Seq[FieldSpec]) = {
    val ctx = new PipelineContext(spark)
    rows.toDF("i", "d", "ts").createOrReplaceTempView("typing_in")
    TypingTransform("t", specs, "typing_in", "typing_out").execute(ctx)
    spark.table("typing_out")
  }

  private val specs = Seq(
    FieldSpec("i", "integer", nullable = false),
    FieldSpec("d", "double"),
    FieldSpec("ts", "timestamp", formatters = Seq("yyyy-MM-dd HH:mm:ss"))
  )

  test("valid rows type cleanly with empty _errors") {
    val out = typeRows(Seq(("42", "3.5", "2020-01-02 03:04:05")), specs)
    val r = out.head()
    assert(r.getAs[Int]("i") == 42)
    assert(r.getAs[Double]("d") == 3.5)
    assert(r.getAs[java.sql.Timestamp]("ts").toString == "2020-01-02 03:04:05.0")
    assert(r.getSeq[Any](r.fieldIndex("_errors")).isEmpty)
  }

  test("bad values null out and accumulate per-field errors; row count preserved") {
    val rows = Seq(("xx", "notnum", "baddate"), ("7", "1.5", "2021-06-01 00:00:00"))
    val out = typeRows(rows, specs)
    assert(out.count() == 2)
    val bad = out.filter(size($"_errors") > 0).head()
    assert(bad.isNullAt(bad.fieldIndex("i")))
    val errs = bad.getSeq[org.apache.spark.sql.Row](bad.fieldIndex("_errors"))
    assert(errs.map(_.getString(0)).toSet == Set("i", "d", "ts"))
    assert(errs.forall(_.getString(1).nonEmpty))
  }

  test("nullableValues map to null; non-nullable null is an error") {
    val out = typeRows(Seq(("", "null", "2021-06-01 00:00:00")), specs)
    val r = out.head()
    assert(r.isNullAt(r.fieldIndex("i")))
    assert(r.isNullAt(r.fieldIndex("d")))
    val errs = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("_errors"))
    // i is non-nullable -> error; d is nullable -> no error
    assert(errs.map(_.getString(0)) == Seq("i"))
  }

  test("nullReplacementValue fills before typing") {
    val spec2 = Seq(FieldSpec("i", "integer", nullReplacementValue = Some("0")),
                    FieldSpec("d", "double"), FieldSpec("ts", "timestamp"))
    val out = typeRows(Seq(("", "1.0", "2021-06-01 00:00:00")), spec2)
    assert(out.head().getAs[Int]("i") == 0)
    assert({ val h = out.head(); h.getSeq[Any](h.fieldIndex("_errors")).isEmpty })
  }

  test("boolean true/false values and trim") {
    val ctx = new PipelineContext(spark)
    Seq(("  Y  ", "x")).toDF("b", "junk").createOrReplaceTempView("bool_in")
    TypingTransform(
      "t",
      Seq(FieldSpec("b", "boolean", trueValues = Seq("Y", "y"), falseValues = Seq("N", "n"))),
      "bool_in",
      "bool_out"
    ).execute(ctx)
    assert(spark.table("bool_out").head().getAs[Boolean]("b"))
  }

  test("failfast throws on first bad row") {
    val ctx = new PipelineContext(spark)
    Seq(("nope", "1", "2021-01-01 00:00:00")).toDF("i", "d", "ts").createOrReplaceTempView("ff_in")
    intercept[graft.core.ValidationException] {
      TypingTransform("t", specs, "ff_in", "ff_out", failMode = "failfast").execute(ctx)
    }
  }

  test("decimal and date with formatters") {
    val ctx = new PipelineContext(spark)
    Seq(("1234.567", "02/03/2021")).toDF("amt", "day").createOrReplaceTempView("dec_in")
    TypingTransform(
      "t",
      Seq(
        FieldSpec("amt", "decimal", precision = 10, scale = 2),
        FieldSpec("day", "date", formatters = Seq("dd/MM/yyyy"))
      ),
      "dec_in",
      "dec_out"
    ).execute(ctx)
    val r = spark.table("dec_out").head()
    assert(r.getAs[java.math.BigDecimal]("amt").toString == "1234.57")
    assert(r.getAs[java.sql.Date]("day").toString == "2021-03-02")
  }
}
