package graft

import org.apache.spark.sql.functions._
import graft.render.Render

class RenderSpec extends SparkSpec {
  import spark.implicits._

  private def one(colExpr: org.apache.spark.sql.Column, truncate: Int = 50): String = {
    val df = Seq(1).toDF("x").select(colExpr.as("v"))
    val formatted = Render.formatted(df, truncate)
    formatted.head().getString(0)
  }

  test("binary renders as spaced hex pairs in brackets") {
    assert(one(lit(Array[Byte](0x0a, 0xff.toByte))) == "[0A FF]")
    assert(one(lit(Array[Byte](0x00))) == "[00]")
  }

  test("double renders without grouping commas or trailing zeros") {
    assert(one(lit(1234567.5)) == "1234567.5")
    assert(one(lit(100.0)) == "100")
    assert(one(lit(0.1234567891011)) == "0.1234567891")
  }

  test("decimal renders at declared scale") {
    assert(one(lit(java.math.BigDecimal.valueOf(1234.5)).cast("decimal(10,2)")) == "1234.50")
  }

  test("timestamp renders as UTC RFC-3339 with trailing Z") {
    val s = one(lit(java.sql.Timestamp.valueOf("2020-01-02 03:04:05")))
    assert(s == "2020-01-02 03:04:05Z")
  }

  test("date renders yyyy-MM-dd") {
    assert(one(lit(java.sql.Date.valueOf("2020-01-02"))) == "2020-01-02")
  }

  test("null renders as literal null") {
    assert(one(lit(null).cast("string")) == "null")
  }

  test("long strings truncate with ellipsis; short truncate plain-cuts") {
    assert(one(lit("a" * 60), truncate = 10) == "a" * 7 + "...")
    assert(one(lit("abcdef"), truncate = 3) == "abc")
    assert(one(lit("short"), truncate = 10) == "short")
  }

  test("duplicate column names render via index suffix") {
    val df = Seq((1, 2)).toDF("x", "x")
    assert(Render.formatted(df).columns.toSeq == Seq("x0", "x1"))
  }

  test("renderHTML emits a table with all rows") {
    val html = Render.renderHTML(Seq((1, "a"), (2, "b")).toDF("n", "s"))
    assert(html.startsWith("<table>"))
    assert(html.contains("<th>n</th>"))
    assert(html.contains("<td>a</td>") && html.contains("<td>2</td>"))
  }
}
