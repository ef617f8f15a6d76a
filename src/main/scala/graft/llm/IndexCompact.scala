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
  * Crash safety: the per-partition swap never holds a partition's only
  * copy in a directory that a cleanup pass deletes. Order per partition:
  * (1) write the compacted replacement under `_compact_tmp/part`,
  * (2) move the OLD part files aside to `_compact_old/part`,
  * (3) move the new files in (named `compact-<uuid>` so recovery can tell
  * them from originals), (4) COMMIT by atomically renaming
  * `_compact_old/part` to `_compact_done/part`, then delete it. The
  * commit rename matters: a recursive delete is file-by-file on most
  * filesystems, so deleting `_compact_old/part` directly would let a
  * crash leave a PARTIAL parked set that recovery would "restore" over
  * the complete new copy — the rename moves the originals out of
  * recovery's sight in one atomic step, and anything under
  * `_compact_done` is committed garbage recovery simply discards. A
  * crash at ANY point therefore leaves every row present in the live
  * partition, `_compact_old` or `_compact_tmp` — a recoverable superset,
  * never a loss. Every `fs.rename` return value is checked and aborts on
  * false (a silent rename failure must not fall through to a delete).
  * `compactPartitioned` REFUSES to start while `_compact_tmp` /
  * `_compact_old` hold files from an interrupted run — call [[recover]]
  * first, which restores the original part files and discards partial
  * output, then re-run compaction.
  *
  * Scale shape: the driver lists partition directories (bounded by
  * nlist/nclusters, never by corpus size) and each oversized partition is
  * one partition-pruned read + write — cost proportional to the data
  * actually rewritten, nothing else. Like `ingest`, compaction is an
  * offline maintenance op: run it in the same window as ingests, not
  * concurrently with readers (mid-swap a partition is transiently
  * incomplete on disk; the superset lives across the three directories).
  */
object IndexCompact {

  /** Bound a partitioned append's writer-task count by the batch's size:
    * a Hive-partitioned append lands one file per (writer task, touched
    * partition dir) pair, so a default-32-task write of a tiny daily
    * batch into 64 dirs leaves up to 32 × 64 files per table per ingest —
    * the very debris [[compactPartitioned]] exists to mop up. Coalescing
    * to ceil(rows / targetRowsPerFile) tasks (no shuffle; a no-op when
    * the frame already has fewer partitions) bounds a small batch at ONE
    * file per touched dir while leaving big batches parallel. */
  def coalesceForAppend(df: org.apache.spark.sql.DataFrame, rows: Long,
      targetRowsPerFile: Long = 1L << 20): org.apache.spark.sql.DataFrame = {
    val want = math.max(1L,
      math.min((rows + targetRowsPerFile - 1) / targetRowsPerFile, 1L << 16))
    df.coalesce(want.toInt)
  }

  private def liveFiles(fs: FileSystem, dir: Path) =
    fs.listStatus(dir).filter(f =>
      f.isFile && !f.getPath.getName.startsWith("_") &&
        !f.getPath.getName.startsWith("."))

  /** Any LIVE file under `dir`, recursively — `_`/`.`-prefixed metadata
    * (the `_runid` marker, parquet `_SUCCESS`) doesn't count. */
  private def hasAnyFile(fs: FileSystem, dir: Path): Boolean =
    fs.exists(dir) && fs.listStatus(dir).exists(s =>
      (s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith(".")) ||
        (s.isDirectory && hasAnyFile(fs, s.getPath)))

  private def renameOrAbort(fs: FileSystem, from: Path, to: Path): Unit =
    require(fs.rename(from, to),
      s"IndexCompact: rename failed ($from -> $to) — aborting before any delete; " +
        "run IndexCompact.recover to restore, then re-run compaction")

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
    val tmpRoot = new Path(root, "_compact_tmp")
    val oldRoot = new Path(root, "_compact_old")
    val doneRoot = new Path(root, "_compact_done")
    require(!hasAnyFile(fs, tmpRoot) && !hasAnyFile(fs, oldRoot),
      s"IndexCompact: $dir has leftover files from an interrupted compaction " +
        "(_compact_tmp/_compact_old non-empty) — run IndexCompact.recover " +
        "before compacting again")
    // committed-but-undeleted originals from an interrupted step (4):
    // the live partitions hold complete copies, so this is pure garbage
    fs.delete(doneRoot, true)
    val partDirs = fs.listStatus(root).filter(s =>
      s.isDirectory && s.getPath.getName.contains("="))
    // per-run id, embedded in every moved-in file name and recorded in a
    // marker BEFORE any file moves: recovery must delete exactly the
    // files THIS run moved in, never same-prefixed survivors of an
    // earlier completed compaction (whose live files are also compact-*).
    // Staging dirs are created lazily — a steady-state no-op run must
    // not churn the index root (object-store requests cost money)
    val runId = java.util.UUID.randomUUID().toString
    var staged = false
    def ensureStaging(): Unit = if (!staged) {
      staged = true
      fs.mkdirs(oldRoot)
      val marker = fs.create(new Path(oldRoot, "_runid"), true)
      marker.write(runId.getBytes("UTF-8")); marker.close()
    }
    var compacted = 0
    var before = 0L
    var after = 0L
    partDirs.foreach { p =>
      val files = liveFiles(fs, p.getPath)
      before += files.length
      if (files.length > maxFilesPerPartition) {
        val bytes = files.map(_.getLen).sum
        val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
        val tmp = new Path(tmpRoot, p.getPath.getName)
        // (1) rewrite this partition's rows alone (partition-pruned read;
        // the partition value lives in the directory name, not the rows)
        spark.read.parquet(p.getPath.toString)
          .coalesce(nOut)
          .write.mode("overwrite").parquet(tmp.toString)
        ensureStaging()
        // (2) move the old part files ASIDE, not away: until step (4)
        // they remain the authoritative copy recovery restores
        val oldPart = new Path(oldRoot, p.getPath.getName)
        fs.mkdirs(oldPart)
        files.foreach(f =>
          renameOrAbort(fs, f.getPath, new Path(oldPart, f.getPath.getName)))
        // (3) move the new files in under recovery-recognizable names
        // (`compact-<runId>-` prefix; Spark's task-UUID suffix keeps them
        // unique across re-runs and repeated compactions)
        val moved = liveFiles(fs, tmp)
        moved.foreach { f =>
          renameOrAbort(fs, f.getPath,
            new Path(p.getPath, s"compact-$runId-${f.getPath.getName}"))
        }
        // (4) COMMIT: one atomic rename moves the originals out of
        // recovery's restore set, THEN delete — a crash mid-delete of a
        // _compact_done dir is garbage, not a partial restore source
        fs.mkdirs(doneRoot)
        renameOrAbort(fs, oldPart, new Path(doneRoot, p.getPath.getName))
        fs.delete(new Path(doneRoot, p.getPath.getName), true)
        fs.delete(tmp, true)
        compacted += 1
        after += moved.length
      } else after += files.length
    }
    // both staging roots hold only empty directories now; verify rather
    // than trust (a file here means a logic error, not a crash)
    require(!hasAnyFile(fs, tmpRoot) && !hasAnyFile(fs, oldRoot),
      s"IndexCompact: staging directories not empty after compaction of $dir")
    if (staged) { fs.delete(tmpRoot, true); fs.delete(oldRoot, true) }
    fs.delete(doneRoot, true)
    (compacted, before, after)
  }

  /** True when `dir` holds leftover staging files from an interrupted
    * compaction or delete — [[deleteMatching]] and [[compactPartitioned]]
    * would refuse to start; run [[recover]] first. Lets an orchestrator
    * PREFLIGHT every store before mutating any of them, so the most common
    * refusal surfaces before a multi-store request is half-applied. */
  def hasInterruptedRun(spark: SparkSession, dir: String): Boolean = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(root) && (hasAnyFile(fs, new Path(root, "_compact_tmp")) ||
      hasAnyFile(fs, new Path(root, "_compact_old")))
  }

  /** Seq sugar over the DataFrame-native [[deleteMatching]] below — the
    * id list is takedown-sized (a legal request, not a corpus), so a
    * local Seq is a fine carrier; large or view-shaped id sets should use
    * the DataFrame overload directly. */
  def deleteMatching(spark: SparkSession, dir: String, idCol: String,
      partitionCol: String, ids: Seq[Long]): Long = {
    require(ids.nonEmpty, "deleteMatching needs at least one id")
    implicit val enc: org.apache.spark.sql.Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
    deleteMatching(spark, dir, idCol, partitionCol,
      spark.createDataset(ids).toDF(idCol))
  }

  /** Partition-directory path for a value, escaped the way Spark's own
    * writer escapes it (Hive-style percent-encoding) — so a partition
    * value that needs escaping (strings with `/`, `=`, spaces …) maps to
    * the directory the write actually produced instead of failing the
    * exists check or silently missing it. Integer values pass through
    * unchanged. */
  private def partitionDir(dir: String, partitionCol: String, value: String): String = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName
    s"$dir/${escapePathName(partitionCol)}=${escapePathName(value)}"
  }

  /** Crash-safe DELETION from a `col=value`-partitioned table — the
    * takedown path (right-to-be-forgotten, licensing retractions) a
    * long-lived 100 TB index cannot live without. Ids arrive as a
    * one-column DataFrame (any column name; values cast to long, nulls
    * fail fast), so config-surface callers never funnel an id view
    * through the driver. Discovery of the touched partitions:
    *
    *  - with `partitionOf` (tables whose partition value is COMPUTABLE
    *    from the id, e.g. the minhash tables' `_p = pmod(_id, idPartitions)`): the
    *    touched directories are derived from the ids with ZERO table IO
    *    and only those directories are read for the per-partition match
    *    counts;
    *  - otherwise: one column-pruned scan over the table, always bounded
    *    by the ids' pushed [min, max] range so parquet row-group stats
    *    prune it (ingest-appended files are id-clustered — a recent-batch
    *    takedown skips most of the table). Small id lists (≤ 1000)
    *    additionally ride as an `isin` literal; larger ones as a
    *    broadcast semi join (join predicates never reach the scan, which
    *    is why the range bound is applied separately).
    *
    * Only partitions holding matches rewrite, through the SAME staged
    * move-aside/commit machinery as [[compactPartitioned]] (identical
    * `_compact_*` staging and `compact-<runId>-` naming, so [[recover]]
    * restores an interrupted delete byte-identically — re-run it after
    * recovery). A completed run appends an audit record ([[takedownLog]])
    * AFTER the final commit — rows that exist are compliance evidence,
    * and a crash leaves no record for the interrupted run. Returns the
    * number of rows removed.
    *
    * Index semantics downstream: a deleted doc stops matching future
    * queries/ingests immediately. Survivor-index caveats hold — past
    * losers of a deleted keeper are not resurrected, the id watermark
    * does not move back (ids are permanently consumed), and a Bloom
    * sketch that remembers a deleted gram merely routes future probes to
    * a verification that now finds nothing (a false positive, the
    * contract blooms already carry).
    *
    * Readers vs takedown: like compaction, this is a MAINTENANCE-WINDOW
    * op under the stores' single-writer discipline. The staged renames
    * keep every row durable at all times, but a CONCURRENT
    * `spark.read.parquet` that lists a partition mid-swap can observe a
    * transient mix (old files parked but new not yet moved in — rows
    * temporarily invisible) or, between steps (3) and (4), both copies at
    * once. Queries running while a takedown commits should be treated
    * like queries during compaction: re-run them after the takedown
    * completes (the audit record is the completion signal).
    */
  def deleteMatching(spark: SparkSession, dir: String, idCol: String,
      partitionCol: String, idsDf: org.apache.spark.sql.DataFrame,
      partitionOf: Option[org.apache.spark.sql.Column => org.apache.spark.sql.Column] = None,
      targetBytes: Long = 128L * 1024 * 1024): Long = {
    import org.apache.spark.sql.functions.{broadcast, col, count, lit, max, min}
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root), s"IndexCompact: no directory at $dir")
    val tmpRoot = new Path(root, "_compact_tmp")
    val oldRoot = new Path(root, "_compact_old")
    val doneRoot = new Path(root, "_compact_done")
    require(!hasAnyFile(fs, tmpRoot) && !hasAnyFile(fs, oldRoot),
      s"IndexCompact: $dir has leftover files from an interrupted rewrite " +
        "(_compact_tmp/_compact_old non-empty) — run IndexCompact.recover first")
    fs.delete(doneRoot, true)
    require(idsDf.columns.nonEmpty, "deleteMatching: ids frame has no columns")
    // Normalize ONCE: distinct longs under the table's id column name. A
    // takedown-sized id set (≤ 1000, the common legal-request shape)
    // collects in ONE job — null checks, count and [min, max] come from
    // the local rows, and the frame that feeds discovery and the
    // rewrite's anti join is REBUILT from the collected values (a local
    // relation is trivially deterministic, so no pin job is needed).
    // Larger sets keep the pinned-frame path: one materialization, one
    // stats pass, broadcast semi joins. The split saves two Spark jobs
    // per table on the battery-shaped path — a six-table orchestrated
    // takedown runs this method six times on the same tiny id view.
    val normalized = idsDf.select(col(idsDf.columns.head).cast("long").as(idCol)).distinct()
    val headRows = normalized.limit(1001).collect()
    val small = headRows.length <= 1000
    val (idsLong, nIds, hasNull, idLo, idHi) = if (small) {
      require(headRows.nonEmpty, "deleteMatching needs at least one id")
      val nulls = headRows.exists(_.isNullAt(0))
      val vals = if (nulls) Array.empty[Long] else headRows.map(_.getLong(0))
      implicit val enc: org.apache.spark.sql.Encoder[Long] =
        org.apache.spark.sql.Encoders.scalaLong
      (spark.createDataset(vals.toIndexedSeq).toDF(idCol),
        headRows.length.toLong, nulls,
        if (nulls) 0L else vals.min, if (nulls) 0L else vals.max)
    } else {
      val pinned = graft.core.Lineage.pin(normalized)
      val stats = pinned.agg(count(lit(1)).as("n"), count(col(idCol)).as("nn"),
        min(col(idCol)).as("lo"), max(col(idCol)).as("hi")).head()
      (pinned, stats.getLong(0), stats.getLong(1) != stats.getLong(0),
        stats.getLong(2), stats.getLong(3))
    }
    require(nIds > 0, "deleteMatching needs at least one id")
    require(!hasNull,
      "deleteMatching: ids contain NULL (null rows, or values that do not " +
        "cast to long) — clean the id view before the takedown")
    val idsLocal: Option[Seq[Long]] =
      if (small) Some(headRows.map(_.getLong(0)).toSeq) else None
    val runId = java.util.UUID.randomUUID().toString
    // audit record of a COMPLETED takedown (GDPR/retraction evidence):
    // written only after every staged rename committed, so its absence
    // after a crash is itself the re-run signal; `_`-prefixed so table
    // reads never see it. No-op deletes (ids absent) record too — "the
    // request was processed" is evidence even when nothing matched.
    def writeAudit(rowsRemoved: Long, partitionsRewritten: Long): Unit =
      graft.core.AuditLog.append(spark, new Path(root, "_takedown_log").toString,
        Seq("table" -> dir, "idColumn" -> idCol, "partitionColumn" -> partitionCol,
          "nIds" -> nIds, "rowsRemoved" -> rowsRemoved,
          "partitionsRewritten" -> partitionsRewritten),
        runId)
    // DISCOVERY-ONLY filter (the rewrite's anti join must keep rows
    // outside the id range): the [min, max] bound ALWAYS pushes to the
    // parquet scan, so row-group stats prune — ingest-appended files are
    // id-clustered, so a recent-batch takedown skips most of the table's
    // row groups regardless of id count. The isin literal (≤ 1000 ids)
    // additionally pushes as per-value predicates when under the parquet
    // In-pushdown threshold; a broadcast semi join (join predicates never
    // reach the scan) handles the rest.
    def matching(df: org.apache.spark.sql.DataFrame) = {
      val bounded = df.filter(col(idCol).between(idLo, idHi))
      idsLocal match {
        case Some(seq) =>
          bounded.filter(col(idCol).isin(seq.map(java.lang.Long.valueOf): _*))
        case None => bounded.join(broadcast(idsLong), Seq(idCol), "left_semi")
      }
    }
    // discovery: which partition dirs hold matches, and how many rows each
    val scanBase: Option[org.apache.spark.sql.DataFrame] = partitionOf match {
      case Some(f) =>
        val vals = idsLong.select(f(col(idCol)).cast("string").as("_pv"))
          .distinct().collect().map(_.getString(0))
        val dirs = vals.map(v => partitionDir(dir, partitionCol, v))
          .filter(d => fs.exists(new Path(d))).toIndexedSeq
        if (dirs.isEmpty) None
        else Some(spark.read.option("basePath", dir).parquet(dirs: _*))
      case None => Some(spark.read.parquet(dir))
    }
    val touched: Map[String, Long] = scanBase match {
      case None => Map.empty
      case Some(base) =>
        matching(base.select(col(idCol), col(partitionCol)))
          .groupBy(col(partitionCol)).count()
          .collect().map { r =>
            require(!r.isNullAt(0),
              s"IndexCompact: null $partitionCol partition value in $dir — " +
                "takedown requires concrete partition values")
            (r.get(0).toString, r.getLong(1))
          }.toMap
    }
    if (touched.isEmpty) { writeAudit(0L, 0L); return 0L }
    fs.mkdirs(oldRoot)
    val marker = fs.create(new Path(oldRoot, "_runid"), true)
    marker.write(runId.getBytes("UTF-8")); marker.close()
    // (1) filtered rewrite of ALL touched partitions in ONE Spark job
    // (basePath keeps the partition column; a per-partition loop would run
    // one tiny job per directory — measured ~150 sequential jobs for a
    // 29-doc takedown across the three minhash tables). Writer tasks are
    // batch-sized, so a small takedown lands one file per touched dir.
    val touchedDirs = touched.keys.map(v => partitionDir(dir, partitionCol, v)).toSeq
    touchedDirs.foreach(d => require(fs.exists(new Path(d)),
      s"IndexCompact: expected partition dir $d"))
    val keptRows = spark.read.option("basePath", dir).parquet(touchedDirs: _*)
      .join(broadcast(idsLong), Seq(idCol), "left_anti")
    val touchedBytes = touchedDirs.map(d => liveFiles(fs, new Path(d)).map(_.getLen).sum).sum
    val nOut = math.max(touched.size.toLong,
      (touchedBytes + targetBytes - 1) / targetBytes)
    keptRows.coalesce(math.min(nOut, 1L << 16).toInt)
      .write.mode("overwrite").partitionBy(partitionCol).parquet(tmpRoot.toString)
    // Per-partition staged moves run CONCURRENTLY (bounded pool): each
    // partition's park→move-in→commit sequence touches only its own
    // directories, and [[recover]] handles every partition's interrupted
    // state independently, so ordering between partitions carries no
    // crash-safety meaning — but running them serially made the driver
    // the bottleneck (guide §2.6: measured 3.8 s of q202's wall was this
    // loop's filesystem round-trips; on an object store with 10–100 ms
    // per rename a wide takedown would serialize into minutes).
    fs.mkdirs(doneRoot)
    val moveErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(8, math.max(1, touched.size)))
    try {
      val tasks = touched.toSeq.map { case (value, _) =>
        pool.submit(new Runnable {
          def run(): Unit = try {
            val part = new Path(partitionDir(dir, partitionCol, value))
            val files = liveFiles(fs, part)
            val tmp = new Path(tmpRoot, part.getName)
            // (2) park originals; (3) move the new files in (a fully-
            // deleted partition has no tmp dir — nothing moves in);
            // (4) commit
            val oldPart = new Path(oldRoot, part.getName)
            fs.mkdirs(oldPart)
            files.foreach(f =>
              renameOrAbort(fs, f.getPath, new Path(oldPart, f.getPath.getName)))
            if (fs.exists(tmp)) liveFiles(fs, tmp).foreach { f =>
              renameOrAbort(fs, f.getPath,
                new Path(part, s"compact-$runId-${f.getPath.getName}"))
            }
            renameOrAbort(fs, oldPart, new Path(doneRoot, part.getName))
            fs.delete(new Path(doneRoot, part.getName), true)
            fs.delete(tmp, true)
          } catch { case t: Throwable => moveErr.compareAndSet(null, t) }
        })
      }
      tasks.foreach(_.get())
    } finally pool.shutdown()
    // an abort in ANY partition surfaces after the pool drains — the
    // other partitions are each in a recover-able state by construction
    if (moveErr.get() != null) throw moveErr.get()
    val removed = touched.valuesIterator.sum
    require(!hasAnyFile(fs, tmpRoot) && !hasAnyFile(fs, oldRoot),
      s"IndexCompact: staging directories not empty after delete in $dir")
    fs.delete(tmpRoot, true)
    fs.delete(oldRoot, true)
    fs.delete(doneRoot, true)
    writeAudit(removed, touched.size.toLong)
    removed
  }

  /** Columns of [[takedownLog]], in record order. */
  private val takedownLogSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("runId",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("table",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("idColumn",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("partitionColumn",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("nIds",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("rowsRemoved",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("partitionsRewritten",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("completedAtMs",
      org.apache.spark.sql.types.LongType)))

  /** The audit trail of COMPLETED takedowns on `dir` — one row per
    * successful [[deleteMatching]] run (no-op runs included), read from
    * the `_takedown_log/` records. A record is written only AFTER the
    * staged rewrite fully committed, so a crash mid-delete leaves NO row
    * for that run: compliance evidence is the rows that exist, and a
    * missing row for an issued request means `recover` + re-run. Empty
    * frame (same schema) when the table has never seen a takedown. */
  def takedownLog(spark: SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    graft.core.AuditLog.read(spark,
      new Path(new Path(dir), "_takedown_log").toString, takedownLogSchema)

  /** Restore `dir` after an interrupted [[compactPartitioned]]: for every
    * partition with files parked in `_compact_old`, delete the files THAT
    * run already moved into the live directory (identified by the
    * interrupted run's `compact-<runId>-` prefix, read from the
    * `_compact_old/_runid` marker — their rows duplicate the parked
    * originals; files from earlier COMPLETED compactions are themselves
    * originals and are never touched) and move the originals back, then
    * discard `_compact_tmp` (never-moved replacement output — pure
    * duplicates) and `_compact_done` (committed originals whose live
    * partitions already hold the complete new copy). Idempotent; returns
    * the number of partitions restored. After recovery the index is
    * byte-identical in content to its pre-compaction state and
    * compaction can be re-run.
    */
  def recover(spark: SparkSession, dir: String): Int = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root), s"IndexCompact: no directory at $dir")
    val tmpRoot = new Path(root, "_compact_tmp")
    val oldRoot = new Path(root, "_compact_old")
    var restored = 0
    if (fs.exists(oldRoot)) {
      val markerPath = new Path(oldRoot, "_runid")
      // no marker means the run crashed before any file move — there is
      // nothing live to delete, only parked/tmp dirs to fold back in
      val runPrefix: Option[String] =
        if (fs.exists(markerPath)) {
          // read to EOF — a single read() may return a prefix on remote
          // filesystems, and a truncated run id would fail to delete the
          // interrupted run's moved-in files (their rows would duplicate
          // the restored originals)
          val in = fs.open(markerPath)
          try {
            val bos = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](64)
            var n = in.read(buf)
            while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
            Some("compact-" + bos.toString("UTF-8") + "-")
          } finally in.close()
        } else None
      fs.listStatus(oldRoot).filter(_.isDirectory).foreach { parked =>
        val live = new Path(root, parked.getPath.getName)
        if (fs.exists(live))
          runPrefix.foreach { pre =>
            fs.listStatus(live).filter(f =>
              f.isFile && f.getPath.getName.startsWith(pre))
              .foreach(f => fs.delete(f.getPath, false))
          }
        else fs.mkdirs(live)
        val parkedFiles = liveFiles(fs, parked.getPath)
        if (parkedFiles.nonEmpty) {
          parkedFiles.foreach(f =>
            renameOrAbort(fs, f.getPath, new Path(live, f.getPath.getName)))
          restored += 1
        }
      }
      fs.delete(oldRoot, true)
    }
    fs.delete(tmpRoot, true)
    fs.delete(new Path(root, "_compact_done"), true)
    restored
  }
}
