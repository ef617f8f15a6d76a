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
}
