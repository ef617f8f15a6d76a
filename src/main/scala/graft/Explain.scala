package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Print the formatted physical plan of named queries:
  * `runMain graft.Explain <sfDir> <query...>`. Used to audit pushdown
  * (PushedFilters/ReadSchema), join strategy (Broadcast vs SortMerge), and
  * WholeStageCodegen coverage per SURVEY.md's scale checklist.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { name =>
      println(s"\n==================== $name ====================")
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
