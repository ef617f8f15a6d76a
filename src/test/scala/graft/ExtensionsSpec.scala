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
          "simhash64(array('alpha', 'beta')) AS s, " +
          "char_entropy('abca') AS e, " +
          "deflate_ratio(repeat('boilerplate ', 50)) AS z, " +
          "deflate_ratio(repeat('boilerplate ', 50), 1) AS z1").head()
      assert(r.getDouble(0) == 11.0)
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-15)
      assert(r.getInt(2) > 0)
      assert(r.getLong(3) != 0L)
      // -(0.5 ln 0.5 + 2 · 0.25 ln 0.25)
      assert(math.abs(r.getDouble(4) - 1.0397207708399179) < 1e-12, r.getDouble(4))
      // 600 bytes of pure repetition deflate far below 20%
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) < 0.2, r.getDouble(5).toString)
      assert(r.getDouble(6) > 0.0 && r.getDouble(6) < 0.3, r.getDouble(6).toString)
      // arity/literal misuse fails LOUDLY at bind time — `exprs.head`-style
      // bindings would silently drop extra args, and a non-literal
      // deflate level used to die in an opaque unbound-expression eval
      def fails(sql: String, fragment: String): Unit = {
        val e = intercept[Exception](s.sql(sql).head())
        def msgs(t: Throwable): Seq[String] =
          if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
        assert(msgs(e).exists(_.contains(fragment)), s"$sql -> ${e.getMessage}")
      }
      fails("SELECT char_entropy('a', 'b')", "exactly 1 argument")
      fails("SELECT simhash64(array('a'), 'x')", "exactly 1 argument")
      fails("SELECT deflate_ratio('a', 'notalevel')", "fold to an integer")
      fails("SELECT deflate_ratio('a', CAST(rand() * 3 AS INT))", "non-foldable")
      fails("SELECT deflate_ratio('a', 1, 2)", "1 or 2 arguments")
      // CONSTANT integer expressions of any integral width keep working —
      // deployed SQL writes CAST(6 AS INT) / 1+5 / narrow literals freely
      val folded = s.sql(
        "SELECT deflate_ratio(repeat('boilerplate ', 50), CAST(6 AS INT)) AS a, " +
          "deflate_ratio(repeat('boilerplate ', 50), 1 + 5) AS b, " +
          "deflate_ratio(repeat('boilerplate ', 50), 6L) AS c").head()
      assert(folded.getDouble(0) == folded.getDouble(1) &&
        folded.getDouble(1) == folded.getDouble(2))
    } finally s.stop()
  }
}
