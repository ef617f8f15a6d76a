package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("latestBefore picks the most recent build time <= probe time across bucket boundaries") {
    val probes = Seq(
      (1L, ts("2024-01-15 12:00:00")), // order in same month
      (2L, ts("2024-03-01 00:00:00")), // no order this month -> carry from Jan
      (3L, ts("2024-01-10 08:00:00")), // exactly at an order ts (>= includes it)
      (4L, ts("2023-12-01 00:00:00"))  // before every order -> null
    ).toDF("pid", "t")
    val builds = Seq(
      Tuple1(ts("2024-01-10 08:00:00")),
      Tuple1(ts("2024-01-12 09:00:00")),
      Tuple1(ts("2024-04-01 00:00:00"))
    ).toDF("bt")
    val out = AsOfJoin.latestBefore(probes, "t", "pid", builds, "bt", "last_bt")
      .as[(Long, Option[Timestamp])].collect().toMap
    assert(out(1L).contains(ts("2024-01-12 09:00:00")))
    assert(out(2L).contains(ts("2024-01-12 09:00:00"))) // carried across empty Feb
    assert(out(3L).contains(ts("2024-01-10 08:00:00"))) // equality included
    assert(out(4L).isEmpty)
  }

  test("latestBefore gives identical answers at day granularity") {
    val probes = Seq((1L, ts("2024-01-15 12:00:00")), (2L, ts("2024-03-01 00:00:00")))
      .toDF("pid", "t")
    val builds = Seq(Tuple1(ts("2024-01-12 09:00:00")), Tuple1(ts("2024-04-01 00:00:00")))
      .toDF("bt")
    val monthly = AsOfJoin.latestBefore(probes, "t", "pid", builds, "bt", "last_bt")
      .as[(Long, Option[Timestamp])].collect().toMap
    val daily = AsOfJoin.latestBefore(probes, "t", "pid", builds, "bt", "last_bt",
      granularity = "day").as[(Long, Option[Timestamp])].collect().toMap
    assert(monthly == daily)
    assert(daily(1L).contains(ts("2024-01-12 09:00:00")))
  }

  test("keyedLatestBefore partitions the as-of by key") {
    val trades = Seq(
      ("AAPL", ts("2024-01-01 10:00:05"), 1L),
      ("AAPL", ts("2024-01-01 10:00:00"), 2L), // exactly at quote time
      ("MSFT", ts("2024-01-01 10:00:05"), 3L), // MSFT has a later quote
      ("NVDA", ts("2024-01-01 10:00:05"), 4L)  // no quotes at all
    ).toDF("sym", "t", "trade_id")
    val quotes = Seq(
      ("AAPL", ts("2024-01-01 10:00:00")),
      ("AAPL", ts("2024-01-01 09:59:00")),
      ("MSFT", ts("2024-01-01 10:00:03"))
    ).toDF("sym", "qt")
    val out = AsOfJoin.keyedLatestBefore(trades, "t", Seq("sym"), quotes, "qt", "last_quote")
      .select("trade_id", "last_quote").as[(Long, Option[Timestamp])].collect().toMap
    assert(out(1L).contains(ts("2024-01-01 10:00:00")))
    assert(out(2L).contains(ts("2024-01-01 10:00:00"))) // >= semantics
    assert(out(3L).contains(ts("2024-01-01 10:00:03")))
    assert(out(4L).isEmpty) // key never quoted
  }

  test("keyedEarliestAfter mirrors forward: first build time >= probe time per key") {
    val views = Seq(
      ("u1", ts("2024-01-01 10:00:00"), 1L), // purchase at exactly this instant
      ("u1", ts("2024-01-01 10:00:04"), 2L), // next purchase is 10:00:06
      ("u2", ts("2024-01-01 10:00:05"), 3L), // u2's only purchase is EARLIER -> null
      ("u3", ts("2024-01-01 10:00:05"), 4L)  // no purchases at all -> null
    ).toDF("user", "t", "view_id")
    val purchases = Seq(
      ("u1", ts("2024-01-01 10:00:00")),
      ("u1", ts("2024-01-01 10:00:06")),
      ("u2", ts("2024-01-01 09:59:00"))
    ).toDF("user", "pt")
    val out = AsOfJoin.keyedEarliestAfter(views, "t", Seq("user"), purchases, "pt", "next_p")
      .select("view_id", "next_p").as[(Long, Option[Timestamp])].collect().toMap
    assert(out(1L).contains(ts("2024-01-01 10:00:00"))) // <= semantics: simultaneous matches
    assert(out(2L).contains(ts("2024-01-01 10:00:06")))
    assert(out(3L).isEmpty) // only earlier builds
    assert(out(4L).isEmpty) // key never built
  }
}

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("perKey matches the window formulation's score multisets") {
    val orders = spark.read.parquet(s"${sf()}/orders.parquet")
    def scoresOf(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Double]] =
      df.select($"o_custkey".cast("long"), $"o_totalprice")
        .as[(Long, Double)].collect().groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(_._2).sorted.toSeq }
    val viaOp = graft.operators.TopK.perKey(orders, Seq("o_custkey"), "o_totalprice", 3)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey").orderBy($"o_totalprice".desc)
    val viaWindow = orders
      .withColumn("rank", org.apache.spark.sql.functions.row_number().over(w))
      .filter($"rank" <= 3)
    assert(scoresOf(viaOp) == scoresOf(viaWindow))
    // rank column is 1..k per key
    val ranks = viaOp.groupBy("o_custkey").agg(
      org.apache.spark.sql.functions.max("rank").as("m"),
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
    assert(ranks.filter($"m" =!= $"n").count() == 0)
  }

  test("perKey with explicit tiebreak equals the window formulation exactly under boundary ties") {
    // 1000 rows, 10 keys, only 3 DISTINCT scores — every top-k boundary is
    // tied, so the kept SET (not just the score multiset) is only exact if
    // the local heap prune honors the tiebreak
    val df = spark.range(0, 1000)
      .selectExpr("id % 10 AS key", "CAST(id % 3 AS DOUBLE) AS score", "id AS uid")
      .repartition(16)
    val viaOp = graft.operators.TopK
      .perKey(df, Seq("key"), "score", 7, descending = true, tiebreak = Seq("uid"))
      .select("key", "score", "uid", "rank")
      .as[(Long, Double, Long, Int)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"key").orderBy($"score".desc, $"uid")
    val viaWindow = df
      .withColumn("rank", org.apache.spark.sql.functions.row_number().over(w))
      .filter($"rank" <= 7)
      .select("key", "score", "uid", "rank")
      .as[(Long, Double, Long, Int)].collect().toSet
    assert(viaOp == viaWindow)
    // ascending direction too (worst-first heap inverts)
    val ascOp = graft.operators.TopK
      .perKey(df, Seq("key"), "score", 5, descending = false, tiebreak = Seq("uid"))
      .select("key", "score", "uid", "rank")
      .as[(Long, Double, Long, Int)].collect().toSet
    val wAsc = org.apache.spark.sql.expressions.Window
      .partitionBy($"key").orderBy($"score".asc, $"uid")
    val ascWindow = df
      .withColumn("rank", org.apache.spark.sql.functions.row_number().over(wAsc))
      .filter($"rank" <= 5)
      .select("key", "score", "uid", "rank")
      .as[(Long, Double, Long, Int)].collect().toSet
    assert(ascOp == ascWindow)
  }

  test("perKeySalted equals the window formulation exactly, ties included") {
    val df = spark.range(0, 1000)
      .selectExpr("id % 10 AS key", "CAST(id % 3 AS DOUBLE) AS score", "id AS uid")
      .repartition(16)
    def windowed(desc: Boolean, k: Int) = {
      val s = if (desc) $"score".desc else $"score".asc
      val w = org.apache.spark.sql.expressions.Window.partitionBy($"key").orderBy(s, $"uid")
      df.withColumn("rank", org.apache.spark.sql.functions.row_number().over(w))
        .filter($"rank" <= k)
        .select("key", "score", "uid", "rank")
        .as[(Long, Double, Long, Int)].collect().toSet
    }
    def salted(desc: Boolean, k: Int, buckets: Int) = graft.operators.TopK
      .perKeySalted(df, Seq("key"), "score", k, descending = desc,
        tiebreak = Seq("uid"), buckets = buckets)
      .select("key", "score", "uid", "rank")
      .as[(Long, Double, Long, Int)].collect().toSet
    assert(salted(desc = true, 7, 8) == windowed(desc = true, 7))
    assert(salted(desc = false, 5, 8) == windowed(desc = false, 5))
    // one salt bucket degenerates to the plain window; many buckets (more
    // than rows per key) still exact
    assert(salted(desc = true, 7, 1) == windowed(desc = true, 7))
    assert(salted(desc = true, 7, 500) == windowed(desc = true, 7))
  }

  test("perKey prunes before the shuffle: survivors are bounded") {
    val df = spark.range(0, 100000).selectExpr("id % 5 AS key", "CAST(id AS DOUBLE) AS score")
    val out = graft.operators.TopK.perKey(df, Seq("key"), "score", 10)
    assert(out.count() == 50)
    // the winners are the true global top-10 per key
    val top = out.filter($"key" === 0).select("score").as[Double].collect().toSet
    assert(top == (0 until 10).map(i => (99995 - i * 5).toDouble).toSet)
  }
}

class HoconSpec extends org.scalatest.funsuite.AnyFunSuite {
  import org.json4s._
  import graft.core.Hocon

  test("dotted keys nest and duplicate objects deep-merge") {
    val v = Hocon.parse(
      """
      a.b.c = 1
      a.b.d = "x"   // merged into the same object
      a.e = true
      """)
    assert((v \ "a" \ "b" \ "c") == JInt(1))
    assert((v \ "a" \ "b" \ "d") == JString("x"))
    assert((v \ "a" \ "e") == JBool(true))
  }

  test("scalars last-win, comments and trailing commas tolerated") {
    val v = Hocon.parse(
      """{
        # hash comment
        n = 1,
        n = 2,          // last wins
        xs = [1, 2, 3,],
      }""")
    assert((v \ "n") == JInt(2))
    assert((v \ "xs") == JArray(List(JInt(1), JInt(2), JInt(3))))
  }

  test("triple-quoted strings keep newlines and quotes verbatim") {
    val v = Hocon.parse("sql = \"\"\"SELECT \"x\"\nFROM t\"\"\"")
    assert((v \ "sql") == JString("SELECT \"x\"\nFROM t"))
  }

  test("substitutions: required missing fails, optional missing vanishes") {
    val e = intercept[IllegalArgumentException](Hocon.parse("a = ${NOPE_MISSING_VAR_12345}"))
    assert(e.getMessage.contains("NOPE_MISSING_VAR_12345"))
    val v = Hocon.parse("a = ${?NOPE_MISSING_VAR_12345}\nb = 1")
    assert((v \ "a") == JNothing)
    assert((v \ "b") == JInt(1))
  }

  test("JSON is parsed identically") {
    val json = """{"stages": [{"type": "SQLTransform", "n": 1.5, "flag": false}]}"""
    assert(Hocon.parse(json) == org.json4s.jackson.JsonMethods.parse(json))
  }
}
