package graft

/** Pins Spark's own decimal semantics — the parts q74_decimal_exact
  * deliberately does NOT oracle-check because oracle engines round
  * non-terminating quotients at version-dependent intermediate scales
  * (reference behavior surface: SURVEY.md §2.3 scalar/decimal class).
  *
  * q74 keeps cross-engine coverage for exact decimal multiply/cast and
  * dyadic terminating division; this suite keeps Spark-side DIVISION
  * semantics covered (ADVICE r5: don't let decimal division go untested).
  */
class DecimalSpec extends SparkSpec {

  private def one(sql: String): String =
    spark.sql(s"SELECT $sql AS v").collect()(0).get(0).toString

  test("decimal division result scale: (38,2)/(10,0) keeps >= 6 fractional digits") {
    val t = spark.sql("SELECT CAST(1 AS DECIMAL(38,2)) / CAST(3 AS DECIMAL(10,0)) AS v")
    val dt = t.schema("v").dataType.asInstanceOf[org.apache.spark.sql.types.DecimalType]
    assert(dt.scale >= 6, s"division scale collapsed to ${dt.scale}")
  }

  test("non-terminating quotient rounds HALF_UP at the result scale") {
    // 1/3 at scale 6 = 0.333333; 2/3 = 0.666667 (HALF_UP on the 7th digit)
    assert(one("CAST(CAST(1 AS DECIMAL(38,2)) / 3 AS DECIMAL(38,6))") == "0.333333")
    assert(one("CAST(CAST(2 AS DECIMAL(38,2)) / 3 AS DECIMAL(38,6))") == "0.666667")
  }

  test("terminating quotient is exact through the intermediate") {
    // cents/4 terminates at scale 4 — the q74 quarter_centi contract
    assert(one("CAST(CAST(3764497 AS DECIMAL(30,8)) / 4 AS DECIMAL(38,4))") == "941124.2500")
  }

  test("exact decimal multiplication never rounds within precision 38") {
    assert(one("CAST(CAST(12345678901234 AS DECIMAL(20,4)) * CAST(0.0001 AS DECIMAL(5,4)) AS DECIMAL(38,8))")
      == "1234567890.12340000")
  }

  test("double->decimal cast rounds the shortest decimal repr HALF_UP") {
    // 2.675 as a double is 2.67499999999999982…; Spark casts via the shortest
    // repr "2.675" -> HALF_UP -> 2.68. (Engines that round the binary value
    // give 2.67 — exactly why q74 derives decimals from FLOOR instead.)
    assert(one("CAST(CAST(2.675 AS DOUBLE) AS DECIMAL(10,2))") == "2.68")
  }

  test("decimal overflow on cast returns null under non-ANSI, throws under ANSI") {
    val v = spark.sql("SELECT try_cast(CAST(1 AS DECIMAL(38,0)) * 10000000000000000000000000000000000000 AS DECIMAL(4,2)) AS v")
      .collect()(0)
    assert(v.isNullAt(0))
  }
}
