package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persistent MinHash-LSH index for INCREMENTAL near-dedup — the daily-ingest
  * shape: the corpus is LSH'd once and saved; each new batch is banded and
  * joined against the saved buckets. Re-LSHing a 100 TB corpus per ingest
  * batch is a non-starter; querying the index costs
  * O(|batch| + matched buckets) instead.
  *
  * Layout under `path` (all parquet, partition-friendly):
  *  - `bands/`    — (_band, _bucket, _id): the corpus band buckets, bucket
  *                  size capped at build time (a >cap bucket is boilerplate;
  *                  keeping `cap` deterministic members preserves match-any
  *                  semantics for dedup while bounding query fan-out — the
  *                  same recall trade the self-join path's star links make).
  *  - `shingles/` — (_id, _sh): hashed shingle sets for exact Jaccard
  *                  verification of candidates.
  *  - `exact/`    — (_fp, _id): xxhash64 of the raw text per corpus doc.
  *                  Queries drop exact copies via this table FIRST (a batch-
  *                  sized join on an 8-byte key), so verbatim duplicates are
  *                  caught with probability 1 regardless of any LSH cap —
  *                  caps only ever trade recall on genuine NEAR-dups.
  *  - `params/`   — one JSON row pinning (shingleLen, bands, rowsPerBand,
  *                  maxBucketSize); queries READ these instead of trusting
  *                  caller arguments, so index and query banding can never
  *                  drift.
  *
  * Reference arc-jupyter has no incremental dedup (SURVEY.md §2); this is a
  * scale-path extension composing the same engine as `Dedup.minhashPairs`.
  */
object MinhashIndex {

  /** Build and save the index over `df`. Overwrites `path`. */
  def write(
      df: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      shingleLen: Int = 3,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      maxBucketSize: Int = 256
  ): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val numHashes = bands * rowsPerBand
    // The shingle+signature pass is the expensive part and feeds TWO write
    // jobs (bands + shingles); persist so the corpus is read and hashed once,
    // spilling to disk if it outgrows memory.
    val withSig = df
      .select(col(idCol).cast("long").as("_id"),
        Dedup.hashedShingles(col(textCol), shingleLen).as("_sh"))
      .filter(size(col("_sh")) > 0)
      .withColumn("_sig", Dedup.minhashSignature(col("_sh"), numHashes))
      .repartition(col("_id")) // materialize (_sh, _sig) once — see minhashPairs
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    try {
      val banded = withSig.select(
        col("_id"),
        posexplode(Dedup.bandKeys(col("_sig"), bands, rowsPerBand)).as(Seq("_band", "_bucket")))
      // Cap order = hash of the id: an unbiased DETERMINISTIC sample of each
      // bucket. Ordering by raw _id would keep the same lowest-id docs in
      // every hot bucket — systematically correlated, so a query doc's own
      // identical-text group would be crowded out of every bucket at once.
      val capped = banded
        .withColumn("_rn",
          row_number().over(
            Window.partitionBy("_band", "_bucket").orderBy(xxhash64(col("_id")), col("_id"))))
        .filter(col("_rn") <= maxBucketSize)
        .drop("_rn")
      capped.write.mode("overwrite").parquet(s"$path/bands")
      withSig.select(col("_id"), col("_sh")).write.mode("overwrite").parquet(s"$path/shingles")
    } finally withSig.unpersist()
    df.select(xxhash64(col(textCol)).as("_fp"), col(idCol).cast("long").as("_id"))
      .write.mode("overwrite").parquet(s"$path/exact")
    Seq((shingleLen, bands, rowsPerBand, maxBucketSize))
      .toDF("shingleLen", "bands", "rowsPerBand", "maxBucketSize")
      .coalesce(1).write.mode("overwrite").json(s"$path/params")
  }

  private case class Params(shingleLen: Int, bands: Int, rowsPerBand: Int, maxBucketSize: Int)

  private def readParams(spark: SparkSession, path: String): Params = {
    val r = spark.read.json(s"$path/params").head()
    Params(
      r.getAs[Long]("shingleLen").toInt,
      r.getAs[Long]("bands").toInt,
      r.getAs[Long]("rowsPerBand").toInt,
      r.getAs[Long]("maxBucketSize").toInt)
  }

  /** Exact-copy matches via the fingerprint table: (new_id, corpus_id, 1.0).
    * A batch-sized equi-join on an 8-byte key — no LSH involved, so exact
    * duplicates are found with probability 1 at any cap setting.
    */
  def exactMatches(newDf: DataFrame, idCol: String, textCol: String, path: String): DataFrame = {
    val corpusFp = newDf.sparkSession.read.parquet(s"$path/exact")
    newDf
      .select(col(idCol).cast("long").as("new_id"), xxhash64(col(textCol)).as("_fp"))
      .join(corpusFp, Seq("_fp"))
      .select(col("new_id"), col("_id").as("corpus_id"), lit(1.0).as("jaccard"))
  }

  /** Near-duplicate matches of `newDf` against the saved corpus:
    * (new_id, corpus_id, jaccard), jaccard ≥ threshold. Banding parameters
    * come from the index itself. Tiered: exact copies come from the
    * fingerprint table (always found), near-dups from the capped LSH query.
    *
    * `maxCandidatesPerDoc` bounds exact-Jaccard verifications per new doc
    * (deterministic hash-ordered choice among bucket-mates): a new doc
    * landing in a boilerplate-heavy cluster would otherwise verify against
    * every capped bucket member in every band — measured 4× of query cost at
    * the 400k probe. True near-dups share most buckets, so the caps cost
    * recall only for at-threshold pairs in hot clusters (same trade as
    * Dedup.bucketCandidates' star links); exact copies are exempt via the
    * fingerprint tier, and for ingest DEDUP any one match suffices.
    */
  def matches(
      newDf: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      threshold: Double = 0.8,
      maxCandidatesPerDoc: Int = 64
  ): DataFrame =
    exactMatches(newDf, idCol, textCol, path)
      .unionByName(lshMatches(newDf, idCol, textCol, path, threshold, maxCandidatesPerDoc))
      .dropDuplicates("new_id", "corpus_id")

  private def lshMatches(
      newDf: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      threshold: Double,
      maxCandidatesPerDoc: Int
  ): DataFrame = {
    val spark = newDf.sparkSession
    val p = readParams(spark, path)
    val numHashes = p.bands * p.rowsPerBand
    val corpusBands = spark.read.parquet(s"$path/bands")
    val corpusSh = spark.read.parquet(s"$path/shingles")
    val newSig = newDf
      .select(col(idCol).cast("long").as("_nid"),
        Dedup.hashedShingles(col(textCol), p.shingleLen).as("_nsh"))
      .filter(size(col("_nsh")) > 0)
      .withColumn("_sig", Dedup.minhashSignature(col("_nsh"), numHashes))
      .repartition(col("_nid"))
    val newBands = newSig.select(
      col("_nid"),
      posexplode(Dedup.bandKeys(col("_sig"), p.bands, p.rowsPerBand)).as(Seq("_band", "_bucket")))
    // The per-doc cap alone is not enough: in a boilerplate-heavy corpus a
    // whole batch lands in the SAME hot buckets, and batch×bucketCap×bands
    // candidate rows exist before any per-doc window can prune them
    // (measured: a 40k batch against the 400k templated probe corpus built
    // ~80M candidate rows — the query cost 4.5× the index BUILD). So corpus
    // bucket membership is first shrunk per (band, bucket) to the per-band
    // share of the candidate budget — one window over the bands table the
    // join shuffles anyway. Normal buckets are smaller than the share and
    // keep full membership; hot buckets degrade to deterministic
    // representatives, the same trade bucket capping already makes.
    val perBandCap = math.max(1, math.ceil(maxCandidatesPerDoc.toDouble / p.bands).toInt)
    val corpusBandsCapped = corpusBands
      .withColumn("_qrn", row_number().over(
        Window.partitionBy("_band", "_bucket").orderBy(xxhash64(col("_id")), col("_id"))))
      .filter(col("_qrn") <= perBandCap)
      .drop("_qrn")
    // candidates: ids only ride the band join; pairs dedupe BEFORE the
    // shingle fetch (a pair colliding in k bands pays the Jaccard once);
    // the per-doc window then enforces the exact budget over ≤ bands ×
    // perBandCap ≈ maxCandidatesPerDoc rows per doc
    val cand = newBands
      .join(corpusBandsCapped, Seq("_band", "_bucket"))
      .select(col("_nid"), col("_id"))
      .distinct()
      .withColumn("_rn", row_number().over(
        Window.partitionBy("_nid").orderBy(xxhash64(col("_nid"), col("_id")))))
      .filter(col("_rn") <= maxCandidatesPerDoc)
      .drop("_rn")
    cand
      .join(newSig.select(col("_nid"), col("_nsh")), Seq("_nid"))
      .join(corpusSh, Seq("_id"))
      .select(
        col("_nid").as("new_id"),
        col("_id").as("corpus_id"),
        Dedup.jaccard(col("_nsh"), col("_sh")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Rows of `newDf` with NO near-duplicate in the indexed corpus — the
    * ingest filter. Tiered: the exact-fingerprint anti-join runs FIRST, so
    * verbatim copies never reach the LSH query (they are both the most
    * common duplicate class in real ingest and the ones that made hot
    * clusters hot), then the capped LSH pass filters the remainder.
    */
  def dedupAgainst(
      newDf: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      threshold: Double = 0.8,
      maxCandidatesPerDoc: Int = 64
  ): DataFrame = {
    val exactLosers = exactMatches(newDf, idCol, textCol, path)
      .select(col("new_id").cast("long").as(idCol)).distinct()
    val survivors = newDf.join(exactLosers, Seq(idCol), "left_anti")
    val nearLosers = lshMatches(survivors, idCol, textCol, path, threshold, maxCandidatesPerDoc)
      .select(col("new_id").cast("long").as(idCol))
      .distinct()
    survivors.join(nearLosers, Seq(idCol), "left_anti")
  }
}
