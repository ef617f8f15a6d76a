package graft.repl

import org.apache.spark.sql.SparkSession

/** CLI REPL: the notebook-kernel surface without Jupyter transport.
  * Cells are read from stdin, separated by lines containing only `;;`
  * (a blank-line separator would break multi-line SQL). EOF exits.
  *
  * `sbt "runMain graft.repl.Main"` then type cells, or pipe a script:
  * `printf '%%sql\nSELECT 1 AS x\n;;\n' | sbt "runMain graft.repl.Main"`
  */
object Main {
  def main(args: Array[String]): Unit = {
    Boot.memoryGuard().foreach { err =>
      System.err.println(err)
      sys.exit(1)
    }
    val spark = Boot.buildSession(sys.env.getOrElse("CONF_MASTER", "local[*]"))
    val interp = new Interpreter(spark)
    println(s"graft ${BuildInfo.version} on Spark ${spark.version} — cells end with ';;', EOF exits")
    val buf = new StringBuilder
    var line: String = null
    print("graft> ")
    Console.flush()
    val in = scala.io.Source.stdin.getLines()
    while (in.hasNext) {
      line = in.next()
      if (line.trim == ";;") {
        val cell = buf.toString
        buf.clear()
        if (cell.trim.nonEmpty) {
          val r = interp.execute(cell)
          if (r.text.nonEmpty) println(r.text)
          if (!r.success) println("[cell failed]")
        }
        print("graft> ")
        Console.flush()
      } else buf.append(line).append('\n')
    }
    spark.stop()
  }
}
