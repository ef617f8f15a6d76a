package graft

/** Smoke coverage: every SparkEntry query must run and return rows at
  * sf0.001, and every oracle key must exist in queries. The value-level
  * DuckDB comparison is the driver's job (and tools/selfcheck.py locally).
  */
class QueriesSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle keys without queries: $missing")
  }

  // legitimately empty at tiny scale: every customer has orders; the synthetic
  // documents may have no pairs above the LSH similarity threshold
  private val mayBeEmpty = Set("q06_join_anti_notexists", "q16_except", "q46_similarity_join_lsh")

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sf())
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
      assert(df.columns.nonEmpty)
    }
  }
}
