package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc probe: time one named SparkEntry query at a given SF dir, N times.
  * Usage: runMain graft.tools.QProbe <queryName> <sfDir> [n]
  */
object QProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      val cnt = graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[probe] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$cnt")
    }
    spark.stop()
  }
}
