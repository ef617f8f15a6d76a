package graft

import org.apache.spark.sql.SparkSession

/** GraftExtensions installs the native functions at session-build time (no
  * Udfs.register call). Needs its own SparkSession, so this suite stops the
  * shared one first; TestSpark rebuilds on demand for later suites.
  */
class ExtensionsSpec extends SparkSpec {

  test("spark.sql.extensions=GraftExtensions resolves vec_dot/vec_cosine in bare SQL") {
    spark.stop()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = s.sql(
        "SELECT vec_dot(array(1.0, 2.0), array(3.0, 4.0)) AS d, " +
          "vec_cosine(array(1.0, 0.0), array(1.0, 0.0)) AS c, " +
          "size(winnowing_fingerprints('the quick brown fox jumps')) AS w, " +
          "simhash64(array('alpha', 'beta')) AS s").head()
      assert(r.getDouble(0) == 11.0)
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-15)
      assert(r.getInt(2) > 0)
      assert(r.getLong(3) != 0L)
    } finally s.stop()
  }
}
