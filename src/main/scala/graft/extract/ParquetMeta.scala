package graft.extract

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** Driver-side parquet metadata reads — answers "how many rows" from the
  * file footers alone, without launching a Spark job. A parquet footer
  * records the exact row count of every row group, so summing footers is
  * exact and costs O(#files) metadata reads (the same listing Spark does
  * to plan a scan) instead of a cluster-wide count job.
  *
  * This is what lets plan-shaping scalars (e.g. the pool rate of
  * [[graft.llm.Sampling.negativeSample]]) be derived from a raw parquet
  * table with ZERO extra jobs. Only valid for a raw table path — a view
  * with filters/transforms on top has a different row count; pass a known
  * count there instead.
  */
object ParquetMeta {

  /** Exact row count of the parquet files under `path` (file or
    * directory; non-recursive over hidden/metadata files, matching
    * Spark's scan listing).
    */
  def rowCount(spark: SparkSession, path: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    // Spark's scan listing ignores hidden (_/.) path SEGMENTS at any depth
    // (an in-flight write's _temporary/… part files must not count) — so
    // the filter walks every ancestor up to the base, not just the name.
    // The walk stops at the QUALIFIED base (listFiles returns qualified
    // file:/… paths — comparing against the raw user path would never
    // match and the walk would wrongly judge the base's own ancestors),
    // and partition directories (`name=value`) are exempt exactly as in
    // Spark's listing — `_cluster=3/` is data, `_temporary/` is not.
    val qualifiedBase = fs.makeQualified(p)
    def hiddenUnder(f: Path): Boolean = {
      var cur = f
      while (cur != null && cur != qualifiedBase) {
        val n = cur.getName
        if ((n.startsWith("_") || n.startsWith(".")) && !n.contains("=")) return true
        cur = cur.getParent
      }
      false
    }
    val files = {
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Path]
      while (it.hasNext) {
        val f = it.next()
        if (f.isFile && f.getPath.getName.endsWith(".parquet") &&
          !hiddenUnder(f.getPath)) buf += f.getPath
      }
      buf.toSeq
    }
    require(files.nonEmpty, s"ParquetMeta.rowCount: no parquet files under $path")
    files.map { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try r.getRecordCount finally r.close()
    }.sum
  }
}
