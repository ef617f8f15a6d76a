package graft.llm

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Small-file compaction for the ingest-append persistent indexes
  * ([[SemIndex]], [[IvfIndex]]): every `ingest` batch appends one file set
  * per touched cluster/list directory, so a year of daily batches leaves
  * tens of thousands of tiny parquet files per partition and reads become
  * metadata-bound — the classic long-lived-index operational failure.
  *
  * `compactPartitioned` rewrites ONLY the partition directories whose
  * part-file count exceeds `maxFilesPerPartition`, each into
  * ceil(bytes / targetBytes) files, preserving the Hive-style layout
  * (`col=value/` directory names carry the partition value, so rows are
  * rewritten without the partition column and land back in the same
  * directory — bit-identical contents, fewer files). Centroids, params
  * and codebooks are untouched; query/dedup results are pinned identical
  * before/after by IndexCompactSpec.
  *
  * Scale shape: the driver lists partition directories (bounded by
  * nlist/nclusters, never by corpus size) and each oversized partition is
  * one partition-pruned read + write — cost proportional to the data
  * actually rewritten, nothing else. Like `ingest`, compaction is an
  * offline maintenance op: run it in the same window as ingests, not
  * concurrently with readers (the per-partition file swap is not atomic —
  * a crash mid-swap can leave one partition doubled in `_compact_tmp`;
  * re-running compact after restoring the directory is the recovery).
  */
object IndexCompact {

  /** Compact every `col=value` partition directory under `dir` whose
    * parquet part-file count exceeds `maxFilesPerPartition`. Returns
    * (partitionsCompacted, filesBefore, filesAfter) for observability —
    * silent maintenance is unauditable maintenance.
    */
  def compactPartitioned(spark: SparkSession, dir: String,
      maxFilesPerPartition: Int = 8,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Long, Long) = {
    require(maxFilesPerPartition >= 1, s"maxFilesPerPartition must be >= 1")
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root), s"IndexCompact: no directory at $dir")
    val partDirs = fs.listStatus(root).filter(s =>
      s.isDirectory && s.getPath.getName.contains("="))
    var compacted = 0
    var before = 0L
    var after = 0L
    partDirs.foreach { p =>
      val files = fs.listStatus(p.getPath).filter(f =>
        f.isFile && !f.getPath.getName.startsWith("_") &&
          !f.getPath.getName.startsWith("."))
      before += files.length
      if (files.length > maxFilesPerPartition) {
        val bytes = files.map(_.getLen).sum
        val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
        val tmp = new Path(root, s"_compact_tmp/${p.getPath.getName}")
        // rewrite this partition's rows alone (partition-pruned read; the
        // partition value lives in the directory name, not the rows)
        spark.read.parquet(p.getPath.toString)
          .coalesce(nOut)
          .write.mode("overwrite").parquet(tmp.toString)
        // swap: remove the old part files, move the new ones in. The new
        // files keep Spark's unique task-UUID names, so a crash between
        // the two loops cannot collide names on re-run.
        files.foreach(f => fs.delete(f.getPath, false))
        val moved = fs.listStatus(tmp).filter(f =>
          f.isFile && !f.getPath.getName.startsWith("_"))
        moved.foreach { f =>
          fs.rename(f.getPath, new Path(p.getPath, f.getPath.getName))
        }
        fs.delete(tmp, true)
        compacted += 1
        after += moved.length
      } else after += files.length
    }
    fs.delete(new Path(root, "_compact_tmp"), true)
    (compacted, before, after)
  }
}
