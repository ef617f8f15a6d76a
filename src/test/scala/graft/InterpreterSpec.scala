package graft

import graft.repl.Interpreter

class InterpreterSpec extends SparkSpec {

  private lazy val interp = {
    val i = new Interpreter(spark)
    i.execute(s"%sql outputView=nation_repl\nSELECT * FROM parquet.`${sf()}/nation.parquet`")
    i
  }

  test("plain SQL cell dispatches like %sql and registers outputView") {
    val r = interp.execute("SELECT 1 AS one")
    assert(r.success && r.df.isDefined)
    assert(r.text.contains("one"))
  }

  test("%sql with args renders and registers the view") {
    val r = interp.execute("%sql outputView=n2 numRows=5\nSELECT n_name FROM nation_repl ORDER BY n_name")
    assert(r.success)
    assert(spark.table("n2").columns.toSeq == Seq("n_name"))
    // numRows=5 caps displayed rows (header + separators + 5 data rows)
    assert(r.text.linesIterator.count(_.startsWith("| ")) == 6)
  }

  test("%schema / %printschema / %metadata / %printmetadata") {
    assert(interp.execute("%schema nation_repl").text.contains("\"name\""))
    assert(interp.execute("%printschema nation_repl").text.contains("n_name"))
    val m = interp.execute("%metadata nation_repl")
    assert(m.success && m.df.get.columns.contains("type"))
    assert(interp.execute("%printmetadata nation_repl").text.contains("\"type\""))
  }

  test("%env + ${param} substitution in SQL") {
    interp.execute("%env minkey=20")
    val r = interp.execute("%sql outputView=envq\nSELECT n_name FROM nation_repl WHERE n_nationkey >= ${minkey} ORDER BY n_name")
    assert(r.success)
    assert(spark.table("envq").count() == 5)
  }

  test("%secret masks values in echo") {
    val r = interp.execute("%secret apikey=hunter2")
    assert(r.success && !r.text.contains("hunter2"))
  }

  test("inline secret cell is rejected") {
    val r = interp.execute("""{"accessKey": "AKIA99"} SELECT 1""")
    assert(!r.success)
  }

  test("%sqlvalidate passes and fails correctly") {
    assert(interp.execute("%sqlvalidate\nSELECT true AS valid, 'ok' AS message").success)
    assert(!interp.execute("%sqlvalidate\nSELECT false AS valid, 'bad' AS message").success)
  }

  test("%list returns file rows") {
    val r = interp.execute(s"%list ${sf()}")
    assert(r.success)
    assert(r.df.get.columns.toSeq == Seq("path", "name", "modificationTime", "size", "bytes"))
    assert(r.df.get.count() >= 10)
  }

  test("%conf flips display settings, %summary computes stats, %version/%help respond") {
    assert(interp.execute("%conf numRows=7 truncate=20").text.contains("numRows=7"))
    val s = interp.execute("%summary nation_repl")
    assert(s.success && s.df.get.columns.contains("distinct"))
    assert(interp.execute("%version").text.contains("Spark"))
    assert(interp.execute("%help").text.contains("%sql"))
  }

  test("cell execution records task progress") {
    interp.execute("%sql outputView=prog\nSELECT COUNT(*) AS n FROM nation_repl")
    val p = interp.lastProgress
    assert(p.total > 0 && p.done == p.total, p.toString)
    assert(p.bar().contains("#"))
  }

  test("unknown magic fails gracefully") {
    assert(!interp.execute("%nope").success)
  }

  test("error unwrapping returns messages not stack traces") {
    val r = interp.execute("SELECT * FROM no_such_table_xyz")
    assert(!r.success && r.text.nonEmpty)
  }

  test("%log output is captured in the cell result (showLog)") {
    val r = interp.execute("%log\nSELECT 'pipeline reached checkpoint 7' AS message")
    assert(r.success)
    assert(r.log.exists(_.contains("pipeline reached checkpoint 7")), r.log.mkString("|"))
    // showLog=true folds the log into the rendered text
    val r2 = interp.execute("%sql showLog=true outputView=lg\nSELECT 1 AS x")
    assert(r2.success && r2.text.contains("SQLTransform"))
  }

  test("secrets never echo through error text") {
    interp.execute("%secret dbpass=s3cr3tv4l")
    val r = interp.execute("SELECT * FROM t_${dbpass}_x")
    assert(!r.success)
    assert(!r.text.contains("s3cr3tv4l"), r.text)
  }

  test("%explain shows the physical plan of a view") {
    interp.execute("%sql outputView=expl_v\nSELECT n_name FROM nation_repl WHERE n_nationkey > 3")
    val r = interp.execute("%explain expl_v")
    assert(r.success)
    assert(r.text.contains("Physical Plan"), r.text.take(200))
    assert(r.text.contains("Filter") || r.text.contains("PushedFilters"), r.text.take(500))
  }

  test("%conf environment= switches the %arc stage filter") {
    interp.execute("%conf environment=test")
    val r = interp.execute(
      """{stages: [
        {type = "SQLTransform", name = "t", sql = "SELECT 42 AS v",
         outputView = "env_only_test", environments = [test]}
      ]}""")
    assert(r.success, r.text)
    assert(spark.table("env_only_test").count() == 1)
    interp.execute("%conf environment=production")
  }
}

/** `%conf master=` restart — isolated suite: it stops the shared session
  * (reference ArcInterpreter.scala:520-525), and TestSpark builds a fresh one
  * for whoever asks next.
  */
class SessionRestartSpec extends SparkSpec {
  test("%conf master= stops the session and the next cell rebuilds it") {
    val interp = new Interpreter(spark)
    assert(interp.execute("%sql\nSELECT 1 AS x").success)
    interp.execute("%env keepme=yes")
    val c = interp.execute("%conf master=local[2]")
    assert(c.success)
    assert(interp.spark.sparkContext.isStopped)
    val r = interp.execute("%sql\nSELECT 2 AS y")
    assert(r.success, r.text)
    assert(interp.spark.sparkContext.master == "local[2]")
    // params survive the restart, like the reference
    assert(interp.ctx.params.contains("keepme"))
    interp.spark.stop() // leave a clean slate; TestSpark rebuilds on demand
  }

  test("memory guard text names both sizes") {
    val err = graft.repl.Boot.memoryGuard(runtime = 2L << 40, physical = 1L << 30)
    assert(err.isDefined && err.get.contains("exceeds"))
    assert(graft.repl.Boot.memoryGuard(runtime = 1L << 28, physical = 1L << 30).isEmpty)
  }
}
