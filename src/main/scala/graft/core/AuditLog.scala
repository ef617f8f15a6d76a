package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Append-only JSON evidence records — the shared writer/reader behind
  * every takedown audit trail ([[graft.llm.IndexCompact.takedownLog]] for
  * the partitioned index tables, [[graft.llm.WordCounts]]/
  * [[graft.llm.NaiveBayes]] for the swapped count stores). One record =
  * one file named by its run id, written in a single create+close — no
  * partial records, no coordination between writers.
  *
  * Placement is the CALLER's concern and matters: parquet table dirs keep
  * the log INSIDE (`table/_takedown_log/` — the `_` prefix keeps reads
  * blind to it), but [[AtomicDir]]-swapped stores replace their whole
  * directory on every write, so their log must live in a SIBLING dir
  * (`store_takedown_log/`, the `store_tmp` naming convention) or evidence
  * would vanish with each rewrite.
  */
object AuditLog {

  private def jstr(s: String) = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  /** Write one record to `logDir/<runId>.json`. Values render as JSON
    * numbers when numeric, strings (escaped) otherwise; `runId` and
    * `completedAtMs` are appended automatically. */
  def append(spark: SparkSession, logDir: String, fields: Seq[(String, Any)],
      runId: String = java.util.UUID.randomUUID().toString): Unit = {
    val dir = new Path(logDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    val body = (fields :+ ("runId" -> runId) :+
      ("completedAtMs" -> System.currentTimeMillis()))
      .map {
        case (k, v: Long) => s"${jstr(k)}:$v"
        case (k, v: Int) => s"${jstr(k)}:$v"
        case (k, v) => s"${jstr(k)}:${jstr(String.valueOf(v))}"
      }.mkString("{", ",", "}")
    val out = fs.create(new Path(dir, s"$runId.json"), true)
    out.write(body.getBytes("UTF-8")); out.close()
  }

  /** Read a log directory back under an explicit schema; empty frame
    * (same schema) when no record was ever written. */
  def read(spark: SparkSession, logDir: String, schema: StructType): DataFrame = {
    val dir = new Path(logDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir))
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    else spark.read.schema(schema).json(dir.toString)
  }
}
