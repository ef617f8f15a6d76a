package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental SemDeDup — the [[MinhashIndex]] discipline applied to
  * embedding dedup: [[Dedup.semDedup]] is one-shot (every new batch would
  * re-train KMeans and re-pair the whole corpus), so daily-ingest
  * pipelines persist the quantizer and the KEPT rows once and dedup each
  * new batch against them with O(batch) work.
  *
  * Layout at `path`:
  *   - `centroids/` — the trained coarse quantizer ((halfNorm, list, vec),
  *     the [[IvfIndex]] shape), frozen at build time: batches MUST assign
  *     with the build's centroids or batch and index rows would land in
  *     different clusters and near-dups would never meet.
  *   - `vectors/` — the kept rows (id, vec), partitioned by `_cluster`:
  *     a batch touching 3 clusters reads 3 directories, never the corpus.
  *   - `params/` — tau / maxClusterSize, so query-time semantics cannot
  *     drift from the build.
  *
  * Semantics (corpus-first, the [[MinhashIndex.dedupAgainst]] contract):
  * indexed rows always win — a batch row within `tau` cosine of ANY kept
  * row (directly or through a chain of batch rows) is dropped; among
  * pure-batch duplicate components the minimum id survives. With batch
  * ids above corpus ids this equals one-shot [[Dedup.semDedup]] on the
  * union under the SAME centroids (SemIndexSpec pins it); what the
  * incremental path cannot see is a chain through a row the BUILD already
  * dropped — the build keeps one representative per component, so a batch
  * row near-dup only to a dropped loser (cosine < tau to every kept row)
  * survives. That is the documented approximation, inherent to keeping
  * the index duplicate-free.
  */
object SemIndex {

  /** One-shot dedup of `corpus`, persisting quantizer + kept rows to
    * `path` (overwrites). Returns nothing — read back via
    * [[dedupAgainst]]/[[ingest]].
    */
  def write(corpus: DataFrame, idCol: String, vecCol: String, path: String,
      nclusters: Int = 16, tau: Double = 0.95, seed: Long = 42L,
      maxClusterSize: Int = 1024, samplePerCluster: Int = 256): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = Similarity.trainCoarseCentroids(
      corpus, idCol, vecCol, nclusters, seed, samplePerCluster, salt = "semindex-train")
      .sortBy(_._2)
    // pinned: pairsFromAssigned scans the assignment three times
    // (candidates + two vector joins) and the anti-join a fourth —
    // unpinned, each would re-run the full-corpus centroid attach. The
    // same pass enforces the non-negative-id contract the INCREMENTAL
    // path depends on: dedupAgainst encodes index rows as negative
    // sentinels, so a negative id persisted here would conflate with a
    // real batch id later and silently mis-attribute components.
    val assigned = graft.core.Lineage.pin(
      Dedup.assignToCentroids(corpus, idCol, vecCol, cents))
    val idRange = assigned.agg(min(col("_id").cast("long")), max(col("_id").cast("long"))).head()
    require(idRange.isNullAt(0) || idRange.getLong(0) >= 0L,
      s"SemIndex.write: corpus ids must be non-negative, found ${idRange.get(0)}")
    val maxId = if (idRange.isNullAt(1)) -1L else idRange.getLong(1)
    val pairs = Dedup.pairsFromAssigned(assigned, tau, maxClusterSize)
    val losers = Dedup.connectedComponents(pairs)
      .filter(col("id") =!= col("component"))
      .select(col("id").as("_lid"))
    assigned
      .join(losers, col("_id") === col("_lid"), "left_anti")
      .select(col("_id").as("id"), col("_v").as("vec"), col("_cluster"))
      .write.mode("overwrite").partitionBy("_cluster").parquet(s"$path/vectors")
    cents.map { case (hn, i, v) => (i, hn, v) }.toDF("list", "halfNorm", "vec")
      .repartition(1).write.mode("overwrite").parquet(s"$path/centroids")
    // maxId persists the one-shot-equivalence precondition (batch ids
    // strictly above every indexed id): ingest enforces and advances it
    writeParams(spark, path, tau, maxClusterSize, maxId)
  }

  /** Persist params via write-temp-then-rename: a plain mode("overwrite")
    * deletes the old params/ BEFORE writing the new one, so a crash
    * mid-overwrite would leave params/ empty and the whole index
    * unreadable (tau/maxClusterSize lost). With the swap, params/ holds a
    * complete copy at every instant except the delete→rename gap, and
    * [[readParams]] completes an interrupted swap from `params_tmp`.
    * Remaining documented window (ingest): a crash AFTER the vectors
    * append but BEFORE this call leaves a stale watermark, so re-running
    * the same batch passes the disjoint-id check against its own
    * half-landed rows. The re-run then drops every batch row against its
    * own appended copy: the INDEX converges to the correct kept set (the
    * copies are already there, nothing new appends), but the returned
    * survivor frame is empty-ish and must be discarded — take survivors
    * from the index itself (or rebuild) after a crashed ingest.
    */
  private def writeParams(spark: SparkSession, path: String,
      tau: Double, maxClusterSize: Int, maxId: Long): Unit = {
    import spark.implicits._
    graft.core.AtomicDir.swap(spark, s"$path/params") { tmp =>
      Seq((tau, maxClusterSize, maxId))
        .toDF("tau", "maxClusterSize", "maxId")
        .coalesce(1).write.mode("overwrite").json(tmp)
    }
  }

  private def readCentroids(spark: SparkSession, path: String): Seq[(Double, Int, Seq[Float])] =
    spark.read.parquet(s"$path/centroids")
      .collect().map(r => (r.getDouble(1), r.getInt(0), r.getSeq[Float](2))).toSeq
      .sortBy(_._2)

  /** Explicit schema — the MinhashIndex.paramsSchema rationale: no
    * inference job per read. */
  private val paramsSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("tau",
      org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("maxClusterSize",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("maxId",
      org.apache.spark.sql.types.LongType)))

  private def readParams(spark: SparkSession, path: String): (Double, Int, Long) = {
    graft.core.AtomicDir.recoverLive(spark, s"$path/params")
    val r = spark.read.schema(paramsSchema).json(s"$path/params").head()
    // pre-maxId indexes (older builds) read as -1 → the disjointness check
    // passes trivially once, then the first ingest persists a real maxId
    val maxId =
      if (!r.isNullAt(r.fieldIndex("maxId"))) r.getAs[Long]("maxId") else -1L
    (r.getAs[Double]("tau"), r.getAs[Long]("maxClusterSize").toInt, maxId)
  }

  /** Batch rows that survive dedup against the index AND against each
    * other (pure-batch duplicate components keep their minimum id).
    * O(batch): assignment is a narrow broadcast-centroid map, and only the
    * kept rows of the batch's TOUCHED clusters are read (partition-pruned).
    * Batch ids must be non-negative (index rows ride as negative sentinel
    * ids through the component pass so the corpus always wins).
    */
  def dedupAgainst(batch: DataFrame, idCol: String, vecCol: String,
      path: String): DataFrame = {
    val spark = batch.sparkSession
    val cents = readCentroids(spark, path)
    val (tau, maxClusterSize, _) = readParams(spark, path)
    val assigned = graft.core.Lineage.pin(
      Dedup.assignToCentroids(batch, idCol, vecCol, cents))
    // ≤ nclusters values, collected from the pinned batch assignment —
    // the isin filter prunes unread cluster directories. The same cheap
    // pass (pinned blocks, no recompute) enforces the non-negative-id
    // contract: a negative batch id would conflate with the sentinel
    // encoding of index rows below and silently mis-attribute components.
    val summary = assigned
      .agg(collect_set(col("_cluster")).as("_cs"),
        min(col("_id").cast("long")).as("_minId")).head()
    val touched = summary.getSeq[Int](0)
    require(summary.isNullAt(1) || summary.getLong(1) >= 0L,
      s"SemIndex.dedupAgainst: batch ids must be non-negative, found ${summary.get(1)}")
    val kept = spark.read.parquet(s"$path/vectors")
      .filter(col("_cluster").isin(touched.map(Integer.valueOf).toSeq: _*))
    // deterministic per-cluster cap on the INDEX side (the MinhashIndex
    // bucket-cap discipline): one dense cluster contributes a bounded
    // candidate set, never cluster × batch rows unbounded
    val keptCapped = graft.operators.TopK.perKeySalted(
      kept.withColumn("_h", xxhash64(col("id"))), Seq("_cluster"), "_h",
      maxClusterSize, descending = false, tiebreak = Seq("id"))
      .drop("_h")
    // batch × kept same-cluster candidates → (batchId, keptId) dup edges;
    // kept ids enter the component pass as negative sentinels so a mixed
    // component's minimum is ALWAYS an index row (corpus-first semantics)
    val crossPairs = assigned
      .join(keptCapped.select(col("_cluster"), col("id").as("_kid"), col("vec").as("_kv")),
        Seq("_cluster"))
      .filter(Similarity.cosine(col("_v"), col("_kv")) >= tau)
      .select((-col("_kid") - 1).as("idA"), col("_id").as("idB"))
    val batchPairs = Dedup.pairsFromAssigned(assigned, tau, maxClusterSize)
      .select(col("idA"), col("idB"))
    val losers = Dedup.connectedComponents(crossPairs.unionByName(batchPairs))
      .filter(col("id") >= 0 && col("id") =!= col("component"))
      .select(col("id").as(idCol))
    batch.join(losers, Seq(idCol), "left_anti")
  }

  /** [[dedupAgainst]] + append the survivors to the kept layout, so the
    * NEXT batch deduplicates against them too. Returns the survivors.
    * Fails fast if the layout at `path` does not match this build
    * (the [[IvfIndex.ingest]] mixed-schema guard).
    */
  def ingest(batch: DataFrame, idCol: String, vecCol: String, path: String): DataFrame = {
    val spark = batch.sparkSession
    val existing = spark.read.parquet(s"$path/vectors").schema
    require(existing.fieldNames.toSet == Set("id", "vec", "_cluster"),
      s"SemIndex.ingest: layout at $path has columns " +
        s"${existing.fieldNames.sorted.mkString(",")} — rebuild with " +
        "SemIndex.write before ingesting")
    // TYPES must match too, not just names: appending int ids next to long
    // ids (or float32 next to float64 vectors) leaves mixed parquet footers
    // and footer-dependent reads — the IvfIndex mixed-layout hazard
    val batchIdType = batch.schema(idCol).dataType
    val batchVecType = batch.schema(vecCol).dataType
    // .sql comparison: nullability differences are parquet-compatible —
    // only the physical type matters for footer consistency
    require(existing("id").dataType.sql == batchIdType.sql &&
      existing("vec").dataType.sql == batchVecType.sql,
      s"SemIndex.ingest: index at $path stores (id: ${existing("id").dataType.sql}, " +
        s"vec: ${existing("vec").dataType.sql}) but the batch carries " +
        s"(${batchIdType.sql}, ${batchVecType.sql}) — cast the batch or rebuild")
    val cents = readCentroids(spark, path)
    val (tau, maxClusterSize, indexedMax) = readParams(spark, path)
    // disjoint-id contract: a batch reusing an indexed id would append a
    // duplicate-id row to vectors/, silently breaking min-id attribution
    // and the one-shot-equivalence pin. Cheap: one agg on the batch vs the
    // persisted max — no index scan.
    val batchRange = batch.agg(
      min(col(idCol).cast("long")), max(col(idCol).cast("long"))).head()
    require(batchRange.isNullAt(0) || batchRange.getLong(0) > indexedMax,
      s"SemIndex.ingest: batch ids must be strictly above every indexed id " +
        s"(max indexed = $indexedMax, batch min = ${batchRange.get(0)}) — " +
        "renumber the batch or rebuild with SemIndex.write")
    val survivors = graft.core.Lineage.pin(
      dedupAgainst(batch, idCol, vecCol, path))
    // batch-sized append (IndexCompact.coalesceForAppend): survivors is
    // pinned, so the count is a cached-block scan; a small batch writes
    // ONE file per touched cluster dir instead of one per (task, dir)
    IndexCompact.coalesceForAppend(
      Dedup.assignToCentroids(survivors, idCol, vecCol, cents)
        .select(col("_id").as("id"), col("_v").as("vec"), col("_cluster")),
      survivors.count())
      .write.mode("append").partitionBy("_cluster").parquet(s"$path/vectors")
    // advance the persisted max so the NEXT batch is checked against this
    // one's ids too (dropped batch ids are consumed — max over the whole
    // batch, not just survivors)
    if (!batchRange.isNullAt(1))
      writeParams(spark, path, tau, maxClusterSize,
        math.max(indexedMax, batchRange.getLong(1)))
    survivors
  }

  /** Takedown: remove `ids` from the vector table (crash-safe staged
    * rewrite — [[IndexCompact.deleteMatching]]). Deleted vectors stop
    * matching future ingests immediately; past dedup victims are not
    * resurrected and the id watermark does not move back. Centroids are
    * untouched (the frozen-quantizer contract). Returns rows removed. */
  def delete(spark: SparkSession, path: String, ids: Seq[Long]): Long =
    IndexCompact.deleteMatching(spark, s"$path/vectors", "id", "_cluster", ids)

  /** DataFrame-native [[delete]]: `ids` is a one-column frame of vector
    * ids — the config surface passes its input view straight through, no
    * driver-side id collection. (`_cluster` is assignment-derived, not
    * computable from the id — discovery takes the column-pruned scan.) */
  def delete(spark: SparkSession, path: String, ids: DataFrame): Long =
    IndexCompact.deleteMatching(spark, s"$path/vectors", "id", "_cluster", ids)

  /** The vector table's takedown audit trail ([[IndexCompact.takedownLog]]). */
  def takedownLog(spark: SparkSession, path: String): DataFrame =
    IndexCompact.takedownLog(spark, s"$path/vectors")

  /** Small-file maintenance: every [[ingest]] appends one file set per
    * touched cluster directory — compact the oversized ones (see
    * [[IndexCompact]]). Centroids and params are untouched; dedup results
    * are identical before/after. Returns (partitionsCompacted,
    * filesBefore, filesAfter). */
  def compact(spark: SparkSession, path: String,
      maxFilesPerPartition: Int = 8): (Int, Long, Long) =
    IndexCompact.compactPartitioned(spark, s"$path/vectors", maxFilesPerPartition)
}
