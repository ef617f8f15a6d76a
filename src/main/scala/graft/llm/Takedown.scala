package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** One legal request, every store — the right-to-be-forgotten
  * ORCHESTRATOR over the six per-store takedown primitives
  * ([[MinhashIndex.delete]], [[SpanIndex.delete]], [[SemIndex.delete]],
  * [[IvfIndex.delete]], [[WordCounts.delete]], [[NaiveBayes.unlearn]]).
  *
  * A deployed curation pipeline persists state in up to six places; honoring
  * one deletion request by hand means six separately-addressed cells, and a
  * forgotten store is SILENT non-compliance that none of the per-store
  * machinery can detect. [[run]] takes the id view once, fans out to every
  * store named in the request, and publishes ONE consolidated view — plus,
  * when `auditURI` is set, one audit record per store under a shared
  * request id ([[consolidatedLog]] reads them back as a single trail).
  *
  * The count stores (word counts, classifier) subtract COUNTS, which carry
  * no provenance — they need the deleted documents' exact trained TEXT,
  * while a legal queue carries ids. [[recoverRows]] closes that gap
  * in-engine: the id view joins against `corpus` (the same post-cleaning
  * view that was ingested/trained — same pipeline version, same
  * normalization), recovering exactly the rows to subtract. Ids missing
  * from the corpus and ids matching MORE than one corpus row both fail
  * loudly before anything mutates: a missing id would silently
  * under-delete, a duplicated one double-subtract.
  *
  * Failure discipline: every store's removal is individually atomic and
  * individually audited (the per-store `_takedown_log` contract), and the
  * orchestrator PREFLIGHTS what it can before mutating anything — id
  * hygiene, corpus coverage, store existence, interrupted-rewrite staging
  * leftovers ([[IndexCompact.hasInterruptedRun]]). A failure between
  * stores still leaves every other store either cleanly committed or
  * untouched (the count stores run first and sequentially; the four index
  * deletes run concurrently — each an independent single-writer tree); the
  * consolidated log shows exactly which stores committed. Completing a
  * partially-applied request is MACHINE-ENFORCED, not operator
  * discipline: with `auditURI` set, re-running the same `requestId`
  * without `resume = true` REFUSES (count stores must not see the same
  * batch twice — counts carry no provenance, so a second subtraction of a
  * completed store de-syncs it silently), and `resume = true` replays the
  * consolidated trail, skipping every store that already holds a record
  * for the request and executing only the missing ones. Resume verifies
  * the re-supplied request is THE SAME request — per committed store the
  * recorded store URI, id count, and an order-independent hash of the id
  * set must match — so a drifted id view cannot split one legal request
  * into two inconsistent halves.
  *
  * Scale shape: the id view is takedown-sized and rides broadcast; each
  * index delete rewrites only touched partitions (discovery arithmetic or
  * a range-bounded pruned scan — [[IndexCompact.deleteMatching]]); the
  * count-store subtractions are one pass over the RECOVERED BATCH plus
  * vocab-shaped merges. The historical corpus is read only for the id
  * join, itself bounded by the ids' pushed [min, max] range.
  */
object Takedown {

  /** Normalize an id view once: first column cast to long, distinct,
    * NULLs rejected (null rows, or values that do not cast). Returned
    * pinned under column `_takedown_id`. */
  def normalizeIds(ids: DataFrame): (DataFrame, Long) = {
    require(ids.columns.nonEmpty, "Takedown: ids frame has no columns")
    val idsNorm = graft.core.Lineage.pin(
      ids.select(col(ids.columns.head).cast("long").as("_takedown_id")).distinct())
    val st = idsNorm.agg(count(lit(1)).as("n"), count(col("_takedown_id")).as("nn")).head()
    require(st.getLong(0) > 0, "Takedown: the id view is empty")
    require(st.getLong(1) == st.getLong(0),
      "Takedown: ids contain NULL (null rows, or values that do not cast " +
        "to long) — clean the id view before the takedown")
    (idsNorm, st.getLong(0))
  }

  /** Recover the corpus rows for an id view — the ids→text bridge the
    * count stores need. `idsNorm` carries `_takedown_id` (long, distinct, non-null
    * — [[normalizeIds]]); `corpus` must hold EXACTLY ONE row per requested
    * id under `idCol`. Returns the matched rows pinned (every requested
    * id, original corpus columns). The corpus scan is bounded by the ids'
    * [min, max] (pushed to a parquet-backed view's row-group stats) and
    * the ids broadcast into the join — one bounded pass, takedown-sized
    * output. */
  def recoverRows(idsNorm: DataFrame, nIds: Long,
      corpus: DataFrame, idCol: String): DataFrame = {
    val range = idsNorm.agg(min(col("_takedown_id")).as("lo"), max(col("_takedown_id")).as("hi")).head()
    recoverRows(idsNorm, nIds, corpus, idCol, range.getLong(0), range.getLong(1))
  }

  /** [[recoverRows]] with the ids' [min, max] already known — [[run]]
    * computes it in the same aggregate as the id hygiene checks, so the
    * bound is not re-derived with an extra job per call. */
  private def recoverRows(idsNorm: DataFrame, nIds: Long,
      corpus: DataFrame, idCol: String, idLo: Long, idHi: Long): DataFrame = {
    require(corpus.columns.contains(idCol),
      s"Takedown: corpus view has no column '$idCol' " +
        s"(columns: ${corpus.columns.mkString(", ")})")
    val matched = graft.core.Lineage.pin(
      corpus.withColumn("_takedown_id", col(idCol).cast("long"))
        .filter(col("_takedown_id").between(idLo, idHi))
        .join(broadcast(idsNorm), Seq("_takedown_id"), "left_semi"))
    val per = matched.groupBy("_takedown_id").agg(count(lit(1)).as("_n"))
    val st = per.agg(count(lit(1)).as("matched"),
      coalesce(max(col("_n")), lit(0L)).as("maxPer")).head()
    if (st.getLong(1) > 1L) {
      val dups = per.filter(col("_n") > 1).orderBy("_takedown_id").limit(5)
        .collect().map(_.getLong(0))
      throw new IllegalArgumentException(
        s"Takedown: corpus view holds MORE than one row for ${dups.length}+ " +
          s"requested id(s) (first: ${dups.mkString(", ")}) — a duplicated " +
          "row would subtract its counts twice and de-sync the count " +
          "stores. Deduplicate the corpus view per id first.")
    }
    if (st.getLong(0) < nIds) {
      val missing = idsNorm.join(per, Seq("_takedown_id"), "left_anti")
        .orderBy("_takedown_id").limit(5).collect().map(_.getLong(0))
      throw new IllegalArgumentException(
        s"Takedown: ${nIds - st.getLong(0)} requested id(s) are MISSING from " +
          s"the corpus view (first: ${missing.mkString(", ")}) — their text " +
          "cannot be recovered, so the count stores would silently " +
          "under-delete. Feed the same post-cleaning corpus that was " +
          "trained/ingested, or trim the id view deliberately.")
    }
    matched.drop("_takedown_id")
  }

  /** Partitioned table directories behind each index store — the surface
    * the staged-rewrite machinery (delete/compact/recover) operates on;
    * [[run]]'s preflight checks each for interrupted-rewrite leftovers. */
  private def indexTableDirs(minhashURI: String, spanURI: String,
      semURI: String, ivfURI: String): Seq[String] =
    Seq(minhashURI).filter(_.nonEmpty).flatMap(u =>
      Seq(s"$u/bands", s"$u/shingles", s"$u/exact")) ++
      Seq(spanURI).filter(_.nonEmpty).map(u => s"$u/grams") ++
      Seq(semURI).filter(_.nonEmpty).map(u => s"$u/vectors") ++
      Seq(ivfURI).filter(_.nonEmpty).map(u => s"$u/vectors")

  /** Consolidated-view / [[consolidatedLog]] schema. */
  val viewSchema: StructType = StructType(Seq(
    StructField("store", StringType),
    StructField("store_type", StringType),
    StructField("n_ids", LongType),
    StructField("rows_removed", LongType),
    StructField("request_id", StringType),
    StructField("completed_at_ms", LongType)))

  /** One committed (request, store) record replayed from the trail —
    * resume's ledger entry. `idsHash` is absent only for records written
    * before the hash was recorded. */
  private final case class Committed(store: String, nIds: Long,
      rowsRemoved: Long, completedAtMs: Long, idsHash: Option[Long])

  /** Execute one takedown request against every named store. Empty-string
    * URIs mean "not part of this request"; at least one must be set.
    * `corpus` is required when a count store (`countsURI` / `modelURI`) is
    * named and not yet committed — see [[recoverRows]]. Returns the
    * consolidated view (one row per store: store URI, store type, id
    * count, rows removed, request id, completion time); `rows_removed`
    * for the minhash store sums its three internal tables (per-table
    * detail lives in [[MinhashIndex.takedownLog]]). When `auditURI` is
    * set, each store's completion ALSO appends one record there under the
    * shared `requestId` — written immediately after that store commits,
    * so the records present after a crash are exactly the stores that
    * completed.
    *
    * CRASH RECOVERY is machine-enforced through that trail: calling `run`
    * again with a `requestId` that already holds records REFUSES unless
    * `resume = true` (a from-the-top re-run would subtract the count
    * stores twice, and counts carry no provenance — the de-sync is
    * silent). With `resume = true`, stores that already committed under
    * the request id are SKIPPED (their recorded rows replayed into the
    * returned view, no mutation, no duplicate audit record) and only the
    * missing stores execute. Resume first verifies the re-supplied
    * request matches what the committed records saw — store URI per
    * store type, id count, and an order-independent hash of the id set —
    * so a drifted id view or a moved store fails loudly instead of
    * splitting one legal request into two inconsistent halves.
    */
  def run(spark: SparkSession, ids: DataFrame,
      minhashURI: String = "", spanURI: String = "", semURI: String = "",
      ivfURI: String = "", countsURI: String = "", modelURI: String = "",
      corpus: Option[DataFrame] = None, corpusIdCol: String = "doc_id",
      textCol: String = "text",
      labelCol: String = "label", auditURI: String = "",
      requestId: String = java.util.UUID.randomUUID().toString,
      resume: Boolean = false): DataFrame = {
    val uris = Seq(minhashURI, spanURI, semURI, ivfURI, countsURI, modelURI)
    require(uris.exists(_.nonEmpty),
      "Takedown.run: no store URI set — name at least one of minhashURI/" +
        "spanURI/semURI/ivfURI/countsURI/modelURI")
    require(uris.filter(_.nonEmpty).distinct.size == uris.count(_.nonEmpty),
      "Takedown.run: two store parameters point at the SAME URI — each " +
        "store is a distinct directory")
    require(!resume || auditURI.nonEmpty,
      "Takedown.run: resume replays the consolidated audit trail to learn " +
        "which stores already committed — set auditURI (and pass the " +
        "interrupted request's requestId)")
    // [[normalizeIds]] inlined so ONE aggregate carries the hygiene
    // checks, the order-independent id-set fingerprint (recorded with
    // every store's audit record and re-verified on resume — same count,
    // different ids is exactly the drift nIds alone cannot catch) AND the
    // [min, max] bound recoverRows needs: three battery-shaped jobs fold
    // into one.
    require(ids.columns.nonEmpty, "Takedown: ids frame has no columns")
    val idsNorm = graft.core.Lineage.pin(
      ids.select(col(ids.columns.head).cast("long").as("_takedown_id")).distinct())
    val idSt = idsNorm.agg(count(lit(1)).as("n"), count(col("_takedown_id")).as("nn"),
      coalesce(sum(hash(col("_takedown_id")).cast("long")), lit(0L)).as("h"),
      min(col("_takedown_id")).as("lo"), max(col("_takedown_id")).as("hi")).head()
    require(idSt.getLong(0) > 0, "Takedown: the id view is empty")
    require(idSt.getLong(1) == idSt.getLong(0),
      "Takedown: ids contain NULL (null rows, or values that do not cast " +
        "to long) — clean the id view before the takedown")
    val nIds = idSt.getLong(0)
    val idsHash = idSt.getLong(2)

    // the resume ledger: stores already committed under this request id.
    // Read under an extended schema — idsHash is resume's concern, not
    // the public consolidated view's ([[consolidatedLog]]).
    val committed: Map[String, Committed] =
      if (auditURI.isEmpty) Map.empty
      else graft.core.AuditLog.read(spark, auditURI, StructType(Seq(
          StructField("requestId", StringType),
          StructField("store", StringType),
          StructField("storeType", StringType),
          StructField("nIds", LongType),
          StructField("rowsRemoved", LongType),
          StructField("idsHash", LongType),
          StructField("completedAtMs", LongType))))
        .filter(col("requestId") === requestId)
        .collect() // request-sized: at most one record per store type
        .map(r => r.getString(2) -> Committed(r.getString(1), r.getLong(3),
          r.getLong(4), r.getLong(6),
          if (r.isNullAt(5)) None else Some(r.getLong(5))))
        .toMap
    if (!resume && committed.nonEmpty)
      throw new IllegalArgumentException(
        s"Takedown.run: the audit trail already holds ${committed.size} " +
          s"record(s) for request '$requestId' (committed stores: " +
          s"${committed.keys.toSeq.sorted.mkString(", ")}) — re-running a " +
          "partially-applied request from the top would subtract the " +
          "count stores TWICE (counts carry no provenance; the de-sync is " +
          "silent). Pass resume = true to skip the committed stores and " +
          "complete only the missing ones.")
    val namedOf = Map("wordcounts" -> countsURI, "classifier" -> modelURI,
      "minhash" -> minhashURI, "span" -> spanURI, "sem" -> semURI,
      "ivf" -> ivfURI)
    committed.foreach { case (tpe, c) =>
      require(c.nIds == nIds && c.idsHash.forall(_ == idsHash),
        s"Takedown.run: resume of request '$requestId' — the supplied id " +
          s"view is NOT the one the committed $tpe record saw (recorded " +
          s"${c.nIds} id(s)${c.idsHash.map(h => s", id-set hash $h").getOrElse("")}; " +
          s"supplied $nIds, id-set hash $idsHash). One request = one id " +
          "set — a drifted view would leave the stores describing two " +
          "different requests. Submit the changed ids as a NEW request.")
      val named = namedOf.getOrElse(tpe, "")
      require(named.isEmpty || named == c.store,
        s"Takedown.run: resume of request '$requestId' — the trail " +
          s"records its $tpe store at ${c.store} but this call names " +
          s"$named; one request cannot move between stores")
    }
    val needWc = countsURI.nonEmpty && !committed.contains("wordcounts")
    val needNb = modelURI.nonEmpty && !committed.contains("classifier")
    require((!needWc && !needNb) || corpus.isDefined,
      "Takedown.run: countsURI/modelURI subtract counts, which carry no " +
        "provenance — pass the corpus view so the deleted documents' " +
        "exact trained text can be recovered from the ids")

    // PREFLIGHT before mutating anything: stores exist, no staged-rewrite
    // leftovers, and (for count stores) the ids fully resolve to corpus
    // rows — the likely failures all surface while every store is intact
    val fsOf = (d: String) => new org.apache.hadoop.fs.Path(d)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    uris.filter(_.nonEmpty).foreach { u =>
      require(fsOf(u).exists(new org.apache.hadoop.fs.Path(u)),
        s"Takedown.run: no store at $u — check the URI (a typo here, " +
          "caught late, would leave the request half-applied)")
    }
    val interrupted = indexTableDirs(minhashURI, spanURI, semURI, ivfURI)
      .filter(IndexCompact.hasInterruptedRun(spark, _))
    require(interrupted.isEmpty,
      s"Takedown.run: interrupted rewrite leftovers at " +
        s"${interrupted.mkString(", ")} — run IndexCompact.recover on " +
        "each, then re-run the request")
    val recovered: Option[DataFrame] =
      if (!needWc && !needNb) None
      else Some(recoverRows(idsNorm, nIds, corpus.get, corpusIdCol,
        idSt.getLong(3), idSt.getLong(4)))

    // store, type, nIds, removed, completedAtMs (Some = replayed record).
    // Appends are synchronized (the index deletes run concurrently) and
    // the view is emitted in the canonical store order below, so the
    // returned frame is byte-identical to the sequential formulation.
    val results = scala.collection.mutable.ListBuffer
      .empty[(String, String, Long, Long, Option[Long])]
    def complete(store: String, storeType: String, removed: Long): Unit = {
      if (auditURI.nonEmpty)
        graft.core.AuditLog.append(spark, auditURI,
          Seq("requestId" -> requestId, "store" -> store,
            "storeType" -> storeType, "nIds" -> nIds,
            "rowsRemoved" -> removed, "idsHash" -> idsHash),
          runId = s"$requestId-$storeType")
      graft.core.LogBuffer.append(
        s"Takedown[$requestId]: $storeType complete at $store, $removed rows removed")
      results.synchronized { results += ((store, storeType, nIds, removed, None)) }
    }
    // committed stores are UNTOUCHED on resume: their recorded row
    // replays into the view, no mutation, no duplicate audit record
    def runStore(uri: String, storeType: String)(exec: => Long): Unit =
      if (uri.nonEmpty) committed.get(storeType) match {
        case Some(c) =>
          graft.core.LogBuffer.append(
            s"Takedown[$requestId]: $storeType already committed at " +
              s"${c.store} (${c.rowsRemoved} rows) — resume skips it")
          results.synchronized {
            results += ((c.store, storeType, c.nIds, c.rowsRemoved,
              Some(c.completedAtMs)))
          }
        case None => complete(uri, storeType, exec)
      }

    // count stores FIRST: their failures are semantic (wrong corpus
    // version, not-a-subset) and therefore the most likely — the index
    // deletes that follow can only fail on conditions preflight checked
    runStore(countsURI, "wordcounts") {
      def total(): Long = WordCounts.read(spark, countsURI)
        .agg(coalesce(sum("cnt"), lit(0L))).head().getLong(0)
      val before = total()
      WordCounts.delete(recovered.get, textCol, countsURI)
      before - total()
    }
    runStore(modelURI, "classifier") {
      def docs(): Long = NaiveBayes.read(spark, modelURI).classTable
        .agg(coalesce(sum("n_docs"), lit(0L))).head().getLong(0)
      val before = docs()
      NaiveBayes.unlearn(recovered.get, textCol, labelCol, modelURI)
      before - docs()
    }
    // The four index deletes are independent single-writer directory
    // trees — run them CONCURRENTLY (guide §2.6: overlap independent
    // jobs; each delete is dozens of tiny driver-latency-bound actions,
    // and running them back to back serialized that latency four times
    // over). Each store remains individually atomic and individually
    // audited; a failure in one store no longer stops the others from
    // committing cleanly, and either way the consolidated trail records
    // exactly the committed set — the contract resume replays. The first
    // failure is rethrown after every store settles.
    val indexStores: Seq[(String, String, () => Long)] = Seq(
      (minhashURI, "minhash", () => {
        val (b, s, e) = MinhashIndex.delete(spark, minhashURI, idsNorm)
        b + s + e
      }),
      (spanURI, "span", () => SpanIndex.delete(spark, spanURI, idsNorm)),
      (semURI, "sem", () => SemIndex.delete(spark, semURI, idsNorm)),
      (ivfURI, "ivf", () => IvfIndex.delete(spark, ivfURI, idsNorm)))
    val active = indexStores.filter(_._1.nonEmpty)
    if (active.size <= 1)
      active.foreach { case (uri, tpe, exec) => runStore(uri, tpe)(exec()) }
    else {
      val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(active.size)
      try {
        active.map { case (uri, tpe, exec) =>
          pool.submit(new Runnable {
            def run(): Unit =
              try runStore(uri, tpe)(exec())
              catch { case t: Throwable => err.compareAndSet(null, t) }
          })
        }.foreach(_.get())
      } finally pool.shutdown()
      if (err.get() != null) throw err.get()
    }

    // canonical store order regardless of completion order — the view is
    // byte-identical to the sequential formulation's
    val storeOrder = Seq("wordcounts", "classifier", "minhash", "span",
      "sem", "ivf").zipWithIndex.toMap
    val now = System.currentTimeMillis()
    val rows = results.toList.sortBy(r => storeOrder(r._2))
      .map { case (store, tpe, n, removed, at) =>
        org.apache.spark.sql.Row(store, tpe, n, removed, requestId,
          at.getOrElse(now))
      }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, viewSchema)
  }

  /** DRY RUN: what [[run]] WOULD remove, with zero mutation — the sizing
    * step a legal queue wants before executing a request. Same preflight
    * (id hygiene, store existence, corpus coverage when a count store is
    * named), same discovery shapes (range-bounded pruned scans, broadcast
    * ids), no staged rewrite, no audit record. Returns one row per store:
    * (store, store_type, n_ids, rows_matched). For the count stores
    * `rows_matched` is the occurrences/docs the subtraction would remove;
    * a subset violation (text that was never ingested) surfaces here as
    * it would in the real run — preview is the place to discover it. */
  def preview(spark: SparkSession, ids: DataFrame,
      minhashURI: String = "", spanURI: String = "", semURI: String = "",
      ivfURI: String = "", countsURI: String = "", modelURI: String = "",
      corpus: Option[DataFrame] = None, corpusIdCol: String = "doc_id",
      textCol: String = "text", labelCol: String = "label"): DataFrame = {
    val uris = Seq(minhashURI, spanURI, semURI, ivfURI, countsURI, modelURI)
    require(uris.exists(_.nonEmpty),
      "Takedown.preview: no store URI set — name at least one of minhashURI/" +
        "spanURI/semURI/ivfURI/countsURI/modelURI")
    require(uris.filter(_.nonEmpty).distinct.size == uris.count(_.nonEmpty),
      "Takedown.preview: two store parameters point at the SAME URI — each " +
        "store is a distinct directory")
    require((countsURI.isEmpty && modelURI.isEmpty) || corpus.isDefined,
      "Takedown.preview: countsURI/modelURI need the corpus view (counts " +
        "carry no provenance — the ids' text sizes the subtraction)")
    val (idsNorm, nIds) = normalizeIds(ids)
    val fsOf = (d: String) => new org.apache.hadoop.fs.Path(d)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    uris.filter(_.nonEmpty).foreach { u =>
      require(fsOf(u).exists(new org.apache.hadoop.fs.Path(u)),
        s"Takedown.preview: no store at $u — check the URI")
    }
    // the same interrupted-rewrite preflight run() enforces: parked rows
    // under _compact_old are INVISIBLE to table reads, so sizing against
    // a half-recovered store would silently UNDERCOUNT — the one error a
    // dry run must never make
    val interrupted = indexTableDirs(minhashURI, spanURI, semURI, ivfURI)
      .filter(IndexCompact.hasInterruptedRun(spark, _))
    require(interrupted.isEmpty,
      s"Takedown.preview: interrupted rewrite leftovers at " +
        s"${interrupted.mkString(", ")} — sizing would undercount; run " +
        "IndexCompact.recover on each first")
    val recovered: Option[DataFrame] =
      if (countsURI.isEmpty && modelURI.isEmpty) None
      else Some(recoverRows(idsNorm, nIds, corpus.get, corpusIdCol))
    // discovery-shaped match count: pushed range bound + broadcast semi
    // join, the same scan deleteMatching's discovery runs (the ids'
    // [min, max] computed ONCE for the whole request, not per table)
    val range = idsNorm.agg(min(col("_takedown_id")).as("lo"),
      max(col("_takedown_id")).as("hi")).head()
    def matches(dir: String, idCol: String): Long =
      spark.read.parquet(dir)
        .select(col(idCol).cast("long").as("_takedown_id"))
        .filter(col("_takedown_id").between(range.getLong(0), range.getLong(1)))
        .join(broadcast(idsNorm), Seq("_takedown_id"), "left_semi")
        .count()
    val results = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
    if (countsURI.nonEmpty)
      // runs delete's exact subset check without the swap — a violation
      // fails HERE, before any real run could half-apply the request
      results += ((countsURI, "wordcounts",
        WordCounts.previewDelete(recovered.get, textCol, countsURI)))
    if (modelURI.nonEmpty) {
      // the model-level unlearn validates (subset checks) and returns the
      // would-be model without persisting anything — exactly a dry run
      val before = NaiveBayes.read(spark, modelURI)
      val after = NaiveBayes.unlearn(before, recovered.get, textCol, labelCol)
      def docs(m: NaiveBayes.Model): Long = m.classTable
        .agg(coalesce(sum("n_docs"), lit(0L))).head().getLong(0)
      results += ((modelURI, "classifier", docs(before) - docs(after)))
    }
    if (minhashURI.nonEmpty)
      results += ((minhashURI, "minhash",
        Seq("bands", "shingles", "exact")
          .map(t => matches(s"$minhashURI/$t", "_id")).sum))
    if (spanURI.nonEmpty)
      results += ((spanURI, "span", matches(s"$spanURI/grams", "keeper")))
    if (semURI.nonEmpty)
      results += ((semURI, "sem", matches(s"$semURI/vectors", "id")))
    if (ivfURI.nonEmpty)
      results += ((ivfURI, "ivf", matches(s"$ivfURI/vectors", "id")))
    val rows = results.toList.map { case (store, tpe, matched) =>
      org.apache.spark.sql.Row(store, tpe, nIds, matched)
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("store", StringType),
      StructField("store_type", StringType),
      StructField("n_ids", LongType),
      StructField("rows_matched", LongType))))
  }

  /** The consolidated request-level audit trail at `auditURI` — one row
    * per (request, store) completion, every request interleaved. Filter on
    * `request_id` for one request; a store missing for a request id means
    * that store's removal never completed (crash before commit — re-run
    * the request naming ONLY the missing stores). */
  def consolidatedLog(spark: SparkSession, auditURI: String): DataFrame =
    graft.core.AuditLog.read(spark, auditURI, StructType(Seq(
      StructField("requestId", StringType),
      StructField("store", StringType),
      StructField("storeType", StringType),
      StructField("nIds", LongType),
      StructField("rowsRemoved", LongType),
      StructField("runId", StringType),
      StructField("completedAtMs", LongType))))
      .select(col("store"), col("storeType").as("store_type"),
        col("nIds").as("n_ids"), col("rowsRemoved").as("rows_removed"),
        col("requestId").as("request_id"),
        col("completedAtMs").as("completed_at_ms"))
}
