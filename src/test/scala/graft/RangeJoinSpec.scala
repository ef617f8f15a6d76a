package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** RangeJoin correctness (vs brute-force cross-join oracle on deterministic
  * random data) and the scale property that justifies its existence: the plan
  * is an equi-join on the bucket id, never a nested-loop/cartesian product.
  */
class RangeJoinSpec extends SparkSpec {
  import testImplicits._
  private lazy val testImplicits = spark.implicits

  // Deterministic data: points on [0, 10000), intervals of mixed width
  // including empties, negatives, and spans much wider than the bucket.
  private def rng(seed: Long): Iterator[Long] = {
    var x = seed
    Iterator.continually {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      math.floorMod(x, 10000L) - 1000L
    }
  }

  private lazy val points = {
    val r = rng(42)
    (1 to 500).map(i => (i.toLong, r.next())).toDF("pid", "t")
  }
  private lazy val intervals = {
    val r = rng(7)
    (1 to 300).map { i =>
      val a = r.next(); val span = math.floorMod(r.next(), 400L) - 50L
      (i.toLong, a, a + span) // ~12% empty (span <= 0)
    }.toDF("iid", "lo", "hi")
  }

  test("pointInInterval matches brute force, exactly once per pair") {
    val got = RangeJoin
      .pointInInterval(points, "t", intervals, "lo", "hi", bucketWidth = 100L)
      .select("pid", "iid")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
    val want = points
      .crossJoin(intervals)
      .filter(col("lo") <= col("t") && col("t") < col("hi"))
      .select("pid", "iid")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
    assert(got.sorted == want.sorted) // == (not toSet): catches duplicates
    assert(want.nonEmpty, "degenerate test data: no matches")
  }

  test("intervalOverlap matches brute force, exactly once per pair") {
    val left = intervals.toDF("aid", "alo", "ahi")
    val right = {
      val r = rng(99)
      (1 to 200).map { i =>
        val a = r.next(); val span = math.floorMod(r.next(), 600L) - 50L
        (i.toLong, a, a + span)
      }.toDF("bid", "blo", "bhi")
    }
    val got = RangeJoin
      .intervalOverlap(left, "alo", "ahi", right, "blo", "bhi", bucketWidth = 128L)
      .select("aid", "bid")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
    val want = left
      .crossJoin(right)
      .filter(col("alo") < col("ahi") && col("blo") < col("bhi"))
      .filter(col("alo") < col("bhi") && col("blo") < col("ahi"))
      .select("aid", "bid")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
    assert(got.sorted == want.sorted)
    assert(want.nonEmpty, "degenerate test data: no overlaps")
  }

  test("plan is an equi-join on the bucket id — no nested loop, no cartesian") {
    val plan = RangeJoin
      .pointInInterval(points, "t", intervals, "lo", "hi", bucketWidth = 100L)
      .queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(
      plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
        plan.contains("BroadcastHashJoin"),
      plan
    )
  }

  test("bucket ids floor toward -inf across zero (no double-width bucket at 0)") {
    // point -1 and interval [-1, 1): with truncation both -1/100 and 0 would
    // collapse to bucket 0 silently; flooring puts -1 in bucket -1 and the
    // interval in buckets -1 and 0 — the match must still be found.
    val p = Seq((1L, -1L)).toDF("pid", "t")
    val iv = Seq((1L, -1L, 1L)).toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(p, "t", iv, "lo", "hi", 100L).count()
    assert(out == 1L)
  }
}
