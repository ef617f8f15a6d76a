package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import graft.core.Bucketing

/** Physical-plan assertions: the plans the 100 TB design depends on must stay
  * the plans Catalyst actually produces.
  */
class PlanSpec extends SparkSpec {

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q02: filters push down to the parquet scan and columns are pruned") {
    val plan = formatted(SparkEntry.queries("q02_filter_project")(spark, sf()))
    assert(plan.contains("PushedFilters:"), plan)
    assert(plan.contains("GreaterThanOrEqual(l_shipdate") || plan.contains("IsNotNull(l_shipdate"), plan)
    // projection needs 6 columns; the scan must not read all 11
    val readSchema = plan.linesIterator.find(_.trim.startsWith("ReadSchema:")).getOrElse("")
    assert(!readSchema.contains("l_returnflag") && !readSchema.contains("l_tax"), readSchema)
  }

  test("q30: dimensions broadcast — the fact table never shuffles for the join") {
    val plan = formatted(SparkEntry.queries("q30_join_broadcast_star")(spark, sf()))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q45: the as-of window is hash-partitioned, not single-partition") {
    val plan = formatted(SparkEntry.queries("q45_asof_join")(spark, sf()))
    assert(plan.contains("hashpartitioning(_bkt"), plan)
    // the only SinglePartition exchange feeds the bucket-LEVEL carry pass
    // (rows = distinct months), inside the broadcast subtree
    val singles = plan.linesIterator.count(_.contains("SinglePartition"))
    assert(singles <= 1, s"$singles single-partition exchanges:\n$plan")
  }

  test("bucketed tables sort-merge join with zero exchange") {
    val orders = spark.read.parquet(s"${sf()}/orders.parquet")
    val lineitem = spark.read.parquet(s"${sf()}/lineitem.parquet")
    Bucketing.writeBucketed(orders, "orders_b", Seq("o_orderkey"), 8)
    Bucketing.writeBucketed(lineitem, "lineitem_b", Seq("l_orderkey"), 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          spark.table("lineitem_b")("l_orderkey") === spark.table("orders_b")("o_orderkey"))
      val plan = formatted(joined)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"), plan)
      // and it computes the right thing
      assert(joined.count() == lineitem.join(orders,
        lineitem("l_orderkey") === orders("o_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
