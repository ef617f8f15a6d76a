package graft

import org.apache.spark.sql.functions._
import graft.core.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAgg equals plain aggregation") {
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val plain = li.groupBy("l_returnflag")
      .agg(sum($"l_quantity".cast("decimal(18,2)")).as("q"), count(lit(1)).as("n"))
      .orderBy("l_returnflag").collect()
    val salted = Skew.saltedAgg(
      li,
      keys = Seq("l_returnflag"),
      saltFrom = Seq("l_orderkey", "l_linenumber"),
      factor = 8,
      partials = Seq(sum($"l_quantity".cast("decimal(18,2)")).as("q"), count(lit(1)).as("n")),
      merges = Seq(sum($"q").as("q"), sum($"n").as("n"))
    ).orderBy("l_returnflag").collect()
    assert(salted.map(_.toSeq).toSeq == plain.map(_.toSeq).toSeq)
  }

  test("saltedJoin equals plain join") {
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet").limit(2000)
    val p = spark.read.parquet(s"${sf()}/part.parquet")
      .withColumnRenamed("p_partkey", "l_partkey")
    val plain = li.join(p, Seq("l_partkey"))
      .agg(count(lit(1)), sum($"p_retailprice".cast("decimal(18,2)"))).collect()
    val salted = Skew.saltedJoin(li, p, Seq("l_partkey"), factor = 4)
      .agg(count(lit(1)), sum($"p_retailprice".cast("decimal(18,2)"))).collect()
    assert(salted.map(_.toSeq).toSeq == plain.map(_.toSeq).toSeq)
  }

  test("saltedJoin left outer preserves unmatched left rows exactly once") {
    val left = Seq((1L, "a"), (2L, "b"), (99L, "unmatched")).toDF("k", "v")
    val right = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "w")
    val out = Skew.saltedJoin(left, right, Seq("k"), factor = 4, joinType = "left").collect()
    assert(out.length == 3)
    assert(out.count(_.isNullAt(2)) == 1)
  }

  test("saltedJoin refuses right/full outer (would duplicate unmatched right rows)") {
    val df = Seq((1L, "a")).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Skew.saltedJoin(df, df.withColumnRenamed("v", "w"), Seq("k"), factor = 4, joinType = "full_outer")
    }
    assert(e.getMessage.contains("duplicate"))
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(df, df.withColumnRenamed("v", "w"), Seq("k"), factor = 4, joinType = "right")
    }
  }

  test("salt is deterministic and bounded") {
    val df = Seq((1L, "a"), (2L, "b"), (1L, "a")).toDF("k", "v")
    val salts = df.select(Skew.salt(8, $"k", $"v").as("s")).as[Int].collect()
    assert(salts.forall(s => s >= 0 && s < 8))
    assert(salts(0) == salts(2)) // same inputs -> same salt
  }
}
