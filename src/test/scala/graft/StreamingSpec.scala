package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StreamingSpec extends SparkSpec {

  /** The events table has been generated both with ns-int64 timestamps
    * (unreadable by Spark's parquet reader without nanosAsLong) and native µs
    * timestamps; materialize a copy whose `ts` is session-local TimestampType
    * (watermarks reject TIMESTAMP_NTZ, which the shared test session would
    * otherwise infer). Rebuilt whenever the source is newer than the cache —
    * a driver-side testdata regeneration must invalidate the copy, not
    * silently test stale data.
    */
  private lazy val eventsPath: String = {
    val out = "/tmp/graft_test_events_us.parquet"
    val src = new java.io.File(s"${sf()}/events.parquet")
    val outDir = new java.io.File(out)
    if (!outDir.exists() || src.lastModified() > outDir.lastModified()) {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(src.getPath)
      val fixed =
        if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
          raw.withColumn("ts", expr("TIMESTAMP_MICROS(ts DIV 1000)"))
        else raw.withColumn("ts", col("ts").cast("timestamp"))
      fixed.write.mode("overwrite").parquet(out)
    }
    out
  }

  test("file stream -> watermarked tumbling window agg -> memory sink") {
    val schema = spark.read.parquet(eventsPath).schema
    val stream = spark.readStream
      .schema(schema)
      .parquet(eventsPath)
    assert(stream.isStreaming)
    val agg = stream
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream
      .format("memory")
      .outputMode("append")
      .queryName("stream_agg_test")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    // append mode only emits windows below the final watermark; the final
    // window(s) stay open, so compare against the batch count minus the tail.
    val streamed = spark.table("stream_agg_test").count()
    val batch = spark.read.parquet(eventsPath)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .count()
      .count()
    assert(streamed > 0 && streamed <= batch)
  }

  test("stream-static broadcast join enriches a stream against a dimension") {
    // The dimension-enrichment shape: a streaming fact joined to a static
    // dim. The static side broadcasts per micro-batch — no stream state, no
    // shuffle of the stream beyond the batch itself; this is the plan that
    // holds at 1000 executors (dim ships once per batch, stream stays put).
    val schema = spark.read.parquet(eventsPath).schema
    val stream = spark.readStream.schema(schema).parquet(eventsPath)
    val dim = spark.read.parquet(s"${sf()}/customer.parquet")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val joined = stream.join(broadcast(dim), Seq("user_id"), "inner")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    val q = joined.writeStream
      .format("memory")
      .outputMode("complete")
      .queryName("stream_static_join_test")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val streamed = spark.table("stream_static_join_test")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = spark.read.parquet(eventsPath)
      .join(broadcast(dim), Seq("user_id"), "inner")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("rate source produces rows through RateExtract") {
    val ctx = new graft.core.PipelineContext(spark)
    val df = graft.extract.RateExtract("rate", "rate_view", rowsPerSecond = 100).execute(ctx).get
    assert(df.isStreaming)
    val q = df.writeStream.format("memory").outputMode("append").queryName("rate_test").start()
    try {
      var n = 0L
      val deadline = System.currentTimeMillis() + 15000
      while (n == 0 && System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        n = spark.table("rate_test").count()
      }
      assert(n > 0)
    } finally q.stop()
  }

  test("session_window aggregation on a stream (data-driven gaps)") {
    val schema = spark.read.parquet(eventsPath).schema
    val stream = spark.readStream.schema(schema).parquet(eventsPath)
    val q = stream
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .writeStream
      .format("memory")
      .outputMode("append")
      .queryName("stream_session_test")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val sessions = spark.table("stream_session_test")
    assert(sessions.count() > 0)
    // a session window must span at least its contents: start <= end
    assert(sessions.filter(col("session_window.start") > col("session_window.end")).count() == 0)
  }

  test("flatMapGroupsWithState: custom per-user running counter") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val schema = spark.read.parquet(eventsPath).schema
    val stream = spark.readStream.schema(schema).parquet(eventsPath)
      .select(col("user_id").as[Long], col("event_id").as[Long])
    // custom state machine: emit one row per (user, batch) with the total
    // events seen so far — the KeyValueGroupedDataset state API the reference
    // era lacked a stage for; this is the Spark-native shape.
    val counted = stream
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) =>
          val prev = state.getOption.getOrElse(0L)
          val total = prev + rows.size
          state.update(total)
          Iterator((user, total))
      }
      .toDF("user_id", "events_so_far")
    val q = counted.writeStream
      .format("memory")
      .outputMode("append")
      .queryName("stream_fmgws_test")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val out = spark.table("stream_fmgws_test")
    assert(out.count() > 0)
    // the final per-user counter equals the batch count for that user
    val batchCounts = spark.read.parquet(eventsPath)
      .groupBy("user_id").count().as[(Long, Long)].collect().toMap
    val lastPerUser = out.groupBy("user_id").agg(max("events_so_far").as("m"))
      .as[(Long, Long)].collect().toMap
    assert(lastPerUser.forall { case (u, n) => batchCounts(u) == n })
  }

  test("foreachBatch sink: per-microbatch parquet append with batch dedup") {
    val schema = spark.read.parquet(eventsPath).schema
    val outDir = "/tmp/graft_test_fb_out"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outDir))
    val stream = spark.readStream.schema(schema).parquet(eventsPath)
    // foreachBatch = the arbitrary-sink shape (JDBC upserts, dual writes):
    // each micro-batch is a normal DataFrame; batchId enables idempotent
    // retry handling in a real sink.
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        batch.dropDuplicates("event_id")
          .withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
          .write.mode("append").parquet(outDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val written = spark.read.parquet(outDir)
    assert(written.columns.contains("batch_id"))
    assert(written.select("event_id").distinct().count() ==
      spark.read.parquet(eventsPath).select("event_id").distinct().count())
  }

  test("streaming CMS: per-microbatch sketch segments merge to the batch sketch") {
    // The incremental-corpus-stats path for frequencies: each micro-batch
    // builds a tiny CMS segment (foreachBatch), segments append to a store,
    // and the merged store must equal the one-shot batch sketch exactly —
    // CMS is linear, so batch splits can't change any cell.
    import org.apache.spark.sql.functions.col
    val schema = spark.read.parquet(eventsPath).schema
    val segDir = "/tmp/graft_test_cms_segs"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(segDir))
    val stream = spark.readStream
      .option("maxFilesPerTrigger", 1).schema(schema).parquet(eventsPath)
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.llm.CmsSketch.build(batch, col("user_id"), depth = 4, width = 128)
          .write.mode("append").parquet(segDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val merged = graft.llm.CmsSketch.merge(spark.read.parquet(segDir))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val oneShot = graft.llm.CmsSketch
      .build(spark.read.parquet(eventsPath), col("user_id"), depth = 4, width = 128)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged == oneShot, s"merged ${merged.size} cells != batch ${oneShot.size}")
  }

  test("streaming Bloom: per-microbatch bitmap segments merge to the batch bitmap") {
    // The fourth mergeable-sketch leg (HLL, CMS and the histogram have this
    // case): each micro-batch builds a tiny bitmap segment, segments append
    // to a store, and the word-wise OR of the store must equal the one-shot
    // batch bitmap EXACTLY — bit positions are per-row and OR is
    // commutative/idempotent, so batch splits (even overlapping ones)
    // can't flip any bit.
    import org.apache.spark.sql.functions.col
    val schema = spark.read.parquet(eventsPath).schema
    val segDir = "/tmp/graft_test_bloom_segs"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(segDir))
    val stream = spark.readStream
      .option("maxFilesPerTrigger", 1).schema(schema).parquet(eventsPath)
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.llm.BloomSketch.build(batch, col("user_id"), bits = 8192, hashes = 3)
          .write.mode("append").parquet(segDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val merged = graft.llm.BloomSketch.merge(spark.read.parquet(segDir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val oneShot = graft.llm.BloomSketch
      .build(spark.read.parquet(eventsPath), col("user_id"), bits = 8192, hashes = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(merged == oneShot, s"merged ${merged.size} words != batch ${oneShot.size}")
  }

  test("streaming LM counts: per-microbatch gram segments merge to the batch counts") {
    // the fifth mergeable-segment leg (HLL, CMS, histogram, Bloom): bigram
    // counts are linear, so a model trained from streamed daily segments
    // must equal the one-shot batch training exactly
    import org.apache.spark.sql.functions.col
    // the sf documents table is a single parquet FILE; a file stream source
    // needs a directory — multiple files also force multiple micro-batches
    val dir = java.nio.file.Files.createTempDirectory("lmstream").toString
    val docsPath = s"$dir/docs"
    spark.read.parquet(s"${sf()}/documents.parquet").repartition(3)
      .write.mode("overwrite").parquet(docsPath)
    val schema = spark.read.parquet(docsPath).schema
    val segDir = "/tmp/graft_test_lm_segs"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(segDir))
    val q = spark.readStream
      .option("maxFilesPerTrigger", 1).schema(schema).parquet(docsPath)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.llm.LangModel.bigramCounts(batch, "text")
          .write.mode("append").parquet(segDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val merged = graft.llm.LangModel.mergeBigrams(spark.read.parquet(segDir))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val oneShot = graft.llm.LangModel.bigramCounts(spark.read.parquet(docsPath), "text")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(merged == oneShot, s"merged ${merged.size} grams != batch ${oneShot.size}")
  }

  test("streaming histogram: per-microbatch segments merge to the one-shot histogram") {
    // The third mergeable-sketch leg (HLL and CMS have this case; the
    // histogram must too): each micro-batch bins `value` into a tiny
    // segment, segments append to a store, and the merged store must equal
    // the one-shot batch histogram EXACTLY — binning is per-row and the
    // merge is a cell-wise sum, both linear, so batch splits can't move a
    // count between bins.
    import org.apache.spark.sql.functions.col
    val schema = spark.read.parquet(eventsPath).schema
    val segDir = "/tmp/graft_test_hist_segs"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(segDir))
    val stream = spark.readStream
      .option("maxFilesPerTrigger", 1).schema(schema).parquet(eventsPath)
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.llm.HistSketch.segment(batch, col("value"), lo = 0.0, hi = 1000.0, bins = 32)
          .write.mode("append").parquet(segDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val merged = graft.llm.HistSketch.merge(spark.read.parquet(segDir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val oneShot = graft.llm.HistSketch
      .segment(spark.read.parquet(eventsPath), col("value"), lo = 0.0, hi = 1000.0, bins = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(merged == oneShot, s"merged ${merged.size} bins != batch ${oneShot.size}")
  }

  test("ConsoleLoad drains a bounded file stream through the console sink") {
    val schema = spark.read.parquet(eventsPath).schema
    val ctx = new graft.core.PipelineContext(spark)
    spark.readStream.schema(schema).parquet(eventsPath)
      .limit(5).createOrReplaceTempView("console_in")
    // completes without error: starts the console sink, processes all
    // available input, stops
    graft.load.ConsoleLoad("c", "console_in", outputMode = "append").execute(ctx)
  }

  test("streaming dedup with dropDuplicates on stream") {
    val schema = spark.read.parquet(eventsPath).schema
    val stream = spark.readStream.schema(schema).parquet(eventsPath)
    val q = stream
      .withWatermark("ts", "1 hour")
      .dropDuplicates("user_id")
      .writeStream
      .format("memory")
      .outputMode("append")
      .queryName("stream_dedup_test")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val users = spark.table("stream_dedup_test").select("user_id").distinct().count()
    val total = spark.table("stream_dedup_test").count()
    assert(total == users) // each user exactly once
  }

  test("stream-stream interval join with watermarks matches the batch join") {
    val schema = spark.read.parquet(eventsPath).schema
    def side(tpe: String) = spark.readStream
      .schema(schema)
      .parquet(eventsPath)
      .filter(col("event_type") === tpe)
    // purchases within 30 minutes after a click by the same user: both sides
    // watermarked, join condition time-bounded — Spark can expire state for
    // rows older than (watermark - bound), the scalable stream-join shape.
    val clicks = side("click")
      .select(col("user_id").as("cu"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = side("purchase")
      .select(col("user_id").as("pu"), col("ts").as("buy_ts"))
      .withWatermark("buy_ts", "1 hour")
    val joined = clicks.join(
      purchases,
      expr("cu = pu AND buy_ts >= click_ts AND buy_ts <= click_ts + INTERVAL 30 MINUTES")
    )
    val q = joined.writeStream
      .format("memory")
      .outputMode("append")
      .queryName("stream_ss_join_test")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val batch = {
      val ev = spark.read.parquet(eventsPath)
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("ts").as("click_ts"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("ts").as("buy_ts"))
      c.join(p, col("cu") === col("pu") &&
          col("buy_ts") >= col("click_ts") &&
          col("buy_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
        .count()
    }
    val streamed = spark.table("stream_ss_join_test").count()
    assert(batch > 0, "degenerate data: no click->purchase pairs in 30 min")
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
  }

  test("dropDuplicatesWithinWatermark dedups (event_id) but keeps late re-keys") {
    val schema = spark.read.parquet(eventsPath).schema
    val stream = spark.readStream.schema(schema).parquet(eventsPath)
    val q = stream
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream
      .format("memory")
      .outputMode("append")
      .queryName("stream_dedup_wm_test")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val out = spark.table("stream_dedup_wm_test")
    val total = out.count()
    val distinctIds = out.select("event_id").distinct().count()
    val input = spark.read.parquet(eventsPath).count()
    // event_id is unique in the synthetic data, so within-watermark dedup
    // must pass everything through exactly once; the assertion shape still
    // holds if duplicates exist (never more rows than input, none dropped
    // beyond true duplicates within the watermark).
    assert(total == distinctIds, s"total=$total distinct=$distinctIds")
    assert(total <= input && total > 0)
  }

  test("streaming corpus ingest: native quality/fingerprint exprs + dedup on a stream") {
    // The LLM scoring path on a STREAM: the native expressions
    // (char_class_counts behind qualityScore, xxhash64 fingerprint) are pure
    // per-row projections, so they apply to streaming frames unchanged;
    // fingerprint dedup runs through streaming dropDuplicates state.
    import graft.llm.TextStats
    // the streaming file source needs a DIRECTORY; the test corpus is a
    // single parquet file — materialize a directory copy once
    val docsPath = "/tmp/graft_test_docs_dir.parquet"
    if (!new java.io.File(docsPath).exists()) {
      spark.read.parquet(s"${sf()}/documents.parquet")
        .write.mode("overwrite").parquet(docsPath)
    }
    val schema = spark.read.parquet(docsPath).schema
    val stream = spark.readStream.schema(schema).parquet(docsPath)
      .withColumn("quality", TextStats.qualityScore(col("text")))
      .withColumn("fp", TextStats.fingerprint(col("text")))
      .filter(col("quality") >= 0.25)
      .dropDuplicates("fp")
    assert(stream.isStreaming)
    val q = stream.writeStream
      .format("memory")
      .outputMode("append")
      .queryName("stream_corpus_test")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val streamed = spark.table("stream_corpus_test")
    val batch = spark.read.parquet(docsPath)
      .withColumn("quality", TextStats.qualityScore(col("text")))
      .withColumn("fp", TextStats.fingerprint(col("text")))
      .filter(col("quality") >= 0.25)
      .dropDuplicates("fp")
    // same survivor fingerprint SET (dropDuplicates keeps an arbitrary row
    // per key, but the key set is deterministic)
    val sFp = streamed.select("fp").collect().map(_.getLong(0)).toSet
    val bFp = batch.select("fp").collect().map(_.getLong(0)).toSet
    assert(sFp == bFp, s"stream kept ${sFp.size} fingerprints, batch ${bFp.size}")
    assert(sFp.nonEmpty)
  }

  test("streaming line filter + quantization: pure projections equal their batch results") {
    // The r7 cleaning/quantization ops are narrow projections with zero
    // shuffles — they must compose onto a stream unchanged and produce
    // EXACTLY the batch result (same rows, not just same counts).
    val docsPath = "/tmp/graft_test_docs_dir.parquet"
    if (!new java.io.File(docsPath).exists()) {
      spark.read.parquet(s"${sf()}/documents.parquet")
        .write.mode("overwrite").parquet(docsPath)
    }
    val schema = spark.read.parquet(docsPath).schema
    def shape(df: org.apache.spark.sql.DataFrame) =
      graft.llm.LineFilter.clean(df, "doc_id", "text", minWords = 2)
        .select(col("doc_id"), col("n_lines"), col("n_kept_lines"), col("drop_doc"),
          graft.llm.Quantize.int8Codes(
            org.apache.spark.sql.functions.array(
              col("n_lines").cast("float"), col("n_kept_lines").cast("float"))).as("codes"))
    val stream = shape(spark.readStream.schema(schema).parquet(docsPath))
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").outputMode("append")
      .queryName("stream_linefilter_test").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.table("stream_linefilter_test")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val batch = shape(spark.read.parquet(docsPath))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(streamed == batch, s"stream rows (${streamed.size}) != batch rows (${batch.size})")
    assert(streamed.nonEmpty)
  }

  test("streaming ingest against a persistent MinHash index via foreachBatch") {
    // The daily-ingest loop as a stream: each micro-batch dedups against the
    // SAVED corpus index (MinhashIndex.dedupAgainst is plain batch logic, so
    // it runs inside foreachBatch — the standard pattern for joining a
    // stream against slowly-changing reference data too big to broadcast).
    val dir = java.nio.file.Files.createTempDirectory("mhstream").toString
    val corpus = spark.read.parquet(s"${sf()}/documents.parquet")
      .filter(col("doc_id") < 400).select(col("doc_id"), col("text"))
    graft.llm.MinhashIndex.write(corpus, "doc_id", "text", s"$dir/idx")
    // incoming batch: 30 verbatim copies of corpus docs + the novel tail
    val incoming = corpus.filter(col("doc_id") < 30)
      .select((col("doc_id") + 5000).as("doc_id"), col("text"))
      .unionByName(spark.read.parquet(s"${sf()}/documents.parquet")
        .filter(col("doc_id") >= 400).select(col("doc_id"), col("text")))
    incoming.write.mode("overwrite").parquet(s"$dir/in")
    val kept = new java.util.concurrent.atomic.AtomicLong(-1)
    val copies = new java.util.concurrent.atomic.AtomicLong(-1)
    val q = spark.readStream.schema(incoming.schema).parquet(s"$dir/in")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val surv = graft.llm.MinhashIndex.dedupAgainst(batch, "doc_id", "text", s"$dir/idx")
        kept.set(surv.count())
        copies.set(surv.filter(col("doc_id") >= 5000).count())
        (): Unit
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(copies.get() == 0L, s"${copies.get()} verbatim copies survived the ingest filter")
    // novel docs may legitimately near-dup the corpus; just require the
    // filter actually let novel content through
    assert(kept.get() > 0L, "ingest filter dropped every novel doc")
  }

  test("streaming ingest into a persistent IVF index matches a one-shot batch build") {
    // Daily-ingest parity for the newest persistent structure (the
    // MinhashIndex discipline, for retrieval): seed the index with half the
    // embeddings, stream the rest through foreachBatch → IvfIndex.ingest in
    // multiple micro-batches, and the ingested index must answer EXACTLY
    // like an index batch-built over the full corpus under exhaustive
    // probes — quantizers differ (half-corpus vs full-corpus training), but
    // exhaustive-probe exactness is assignment-independent, so both must
    // equal brute force bit-for-bit.
    val dir = java.nio.file.Files.createTempDirectory("ivfstream").toString
    val em = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val seed = em.filter(col("vec_id") % 2 === 0)
    val incoming = em.filter(col("vec_id") % 2 === 1)
    graft.llm.IvfIndex.write(seed, "vec_id", "embedding", s"$dir/streamed", nlist = 4)
    graft.llm.IvfIndex.write(em, "vec_id", "embedding", s"$dir/batch", nlist = 4)
    // several files + maxFilesPerTrigger=1 → several micro-batches, so the
    // append path runs more than once
    incoming.repartition(3).write.mode("overwrite").parquet(s"$dir/in")
    val batches = new java.util.concurrent.atomic.AtomicLong(0)
    val q = spark.readStream.schema(incoming.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          graft.llm.IvfIndex.ingest(batch, "vec_id", "embedding", s"$dir/streamed")
          batches.incrementAndGet()
        }
        (): Unit
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(batches.get() >= 2, s"expected multiple ingest micro-batches, got ${batches.get()}")
    val queries = em.filter(col("vec_id") < 10)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("score"), 6))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val streamed = key(graft.llm.IvfIndex.topK(
      queries, "vec_id", "embedding", s"$dir/streamed", k = 5, nprobe = 4))
    val batch = key(graft.llm.IvfIndex.topK(
      queries, "vec_id", "embedding", s"$dir/batch", k = 5, nprobe = 4))
    assert(streamed == batch, "ingested index diverged from the one-shot build")
    val brute = key(graft.llm.Similarity.bruteForceTopK(em, "vec_id", "embedding",
      queries, "vec_id", "embedding", 5))
    assert(streamed == brute, "ingested index diverged from brute force")
  }

  test("streaming takedown requests through foreachBatch match one batch delete") {
    // Takedown requests arrive as a stream in practice (a legal queue,
    // not a one-shot list): stream id micro-batches through foreachBatch
    // → MinhashIndex.delete, and the index must end byte-identical to a
    // single delete of the union — with one audit record per (micro-
    // batch, table) on the trail.
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("tdstream").toString
    def freshIndex(path: String): Unit = {
      val docs = spark.range(20).select(col("id").as("doc_id"),
        concat_ws(" ", org.apache.spark.sql.functions.transform(
          org.apache.spark.sql.functions.sequence(lit(0), lit(11)),
          i => concat(lit("tk"), col("id"), lit("x"), i))).as("text"))
      graft.llm.MinhashIndex.write(docs, "doc_id", "text", path)
    }
    freshIndex(s"$base/streamed"); freshIndex(s"$base/batch")
    val victims = Seq(3L, 6L, 9L, 12L)
    victims.toDF("doc_id").repartition(2)
      .write.mode("overwrite").parquet(s"$base/requests")
    val batches = new java.util.concurrent.atomic.AtomicLong(0)
    val q = spark.readStream
      .schema(spark.read.parquet(s"$base/requests").schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$base/requests")
      .writeStream
      .foreachBatch { (ids: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!ids.isEmpty) {
          graft.llm.MinhashIndex.delete(spark, s"$base/streamed", ids)
          batches.incrementAndGet()
        }
        (): Unit
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(batches.get() >= 2, s"expected multiple delete micro-batches, got ${batches.get()}")
    graft.llm.MinhashIndex.delete(spark, s"$base/batch", victims)
    def table(path: String, t: String) =
      spark.read.parquet(s"$path/$t").collect().map(_.toSeq.toString).toSet
    Seq("exact", "shingles", "bands").foreach { t =>
      assert(table(s"$base/streamed", t) == table(s"$base/batch", t),
        s"$t diverged between streamed and one-shot takedown")
    }
    // one audit record per (micro-batch, table) on the streamed trail
    val nRecords = graft.llm.MinhashIndex.takedownLog(spark, s"$base/streamed").count()
    assert(nRecords == 3L * batches.get(), s"$nRecords records for ${batches.get()} batches")
  }

  test("streaming ORCHESTRATED takedown through foreachBatch matches one batch run") {
    // The legal queue drives the orchestrator, not a single store:
    // micro-batches of ids through foreachBatch → Takedown.run across a
    // minhash index AND a count store must leave every table
    // byte-identical to one run over the union — with one consolidated
    // audit record per (micro-batch, store).
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("tdorchstream").toString
    val docs = graft.core.Lineage.pin(
      spark.range(20).select(col("id").as("doc_id"),
        concat_ws(" ", org.apache.spark.sql.functions.transform(
          org.apache.spark.sql.functions.sequence(lit(0), lit(11)),
          i => concat(lit("tk"), col("id"), lit("x"), i))).as("text")))
    def freshWorld(w: String): Unit = {
      graft.llm.MinhashIndex.write(docs, "doc_id", "text", s"$base/$w/idx")
      graft.llm.WordCounts.write(docs, "text", s"$base/$w/wc")
    }
    freshWorld("streamed"); freshWorld("batch")
    val victims = Seq(3L, 6L, 9L, 12L)
    victims.toDF("doc_id").repartition(2)
      .write.mode("overwrite").parquet(s"$base/requests")
    val batches = new java.util.concurrent.atomic.AtomicLong(0)
    val q = spark.readStream
      .schema(spark.read.parquet(s"$base/requests").schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$base/requests")
      .writeStream
      .foreachBatch { (ids: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!ids.isEmpty) {
          graft.llm.Takedown.run(spark, ids,
            minhashURI = s"$base/streamed/idx", countsURI = s"$base/streamed/wc",
            corpus = Some(docs), corpusIdCol = "doc_id", textCol = "text",
            auditURI = s"$base/streamed/audit")
          batches.incrementAndGet()
        }
        (): Unit
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(batches.get() >= 2, s"expected multiple micro-batches, got ${batches.get()}")
    graft.llm.Takedown.run(spark, victims.toDF("doc_id"),
      minhashURI = s"$base/batch/idx", countsURI = s"$base/batch/wc",
      corpus = Some(docs), corpusIdCol = "doc_id", textCol = "text",
      auditURI = s"$base/batch/audit")
    def table(path: String) =
      spark.read.parquet(path).collect().map(_.toSeq.toString).toSet
    Seq("idx/exact", "idx/shingles", "idx/bands", "wc/counts").foreach { t =>
      assert(table(s"$base/streamed/$t") == table(s"$base/batch/$t"),
        s"$t diverged between streamed and one-shot orchestrated takedown")
    }
    // one consolidated record per (micro-batch, store) vs one per store
    val streamedLog = graft.llm.Takedown.consolidatedLog(spark, s"$base/streamed/audit")
    assert(streamedLog.count() == 2L * batches.get(),
      s"${streamedLog.count()} records for ${batches.get()} batches")
    assert(graft.llm.Takedown.consolidatedLog(spark, s"$base/batch/audit").count() == 2L)
    // every micro-batch shares one request id across its stores
    val perReq = streamedLog.groupBy("request_id").count()
      .collect().map(_.getLong(1)).toSeq
    assert(perReq.size == batches.get() && perReq.forall(_ == 2L), perReq.toString)
  }

  test("streaming canary detection: the Aho-Corasick projection equals its batch result") {
    // canaryHits is a pure narrow projection (automaton rides inside the
    // expression) — it must run unchanged on a streaming frame and emit
    // exactly the batch hit set.
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("canarystream").toString
    val docs = Seq(
      (1L, "the secret benchmark passage lives here"),
      (2L, "clean document"),
      (3L, "another secret benchmark passage plus a held-out probe string")
    )
    import spark.implicits._
    docs.toDF("id", "text").repartition(3).write.mode("overwrite").parquet(dir)
    val canaries = Seq("secret benchmark passage", "held-out probe", "absent")
    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val hits = graft.llm.Decontaminate.canaryHits(stream, "id", "text", canaries)
    assert(hits.isStreaming, "projection must stay streaming")
    val q = hits.writeStream.format("memory").queryName("canary_hits_mem")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.table("canary_hits_mem")
      .select("id", "canary").as[(Long, String)].collect().toSet
    val batch = graft.llm.Decontaminate
      .canaryHits(spark.read.parquet(dir), "id", "text", canaries)
      .select("id", "canary").as[(Long, String)].collect().toSet
    assert(streamed == batch && batch == Set(
      (1L, "secret benchmark passage"),
      (3L, "secret benchmark passage"), (3L, "held-out probe")))
  }

  test("streaming BPE tokenization: the trained-merges projection equals its batch result") {
    // bpe_tokenize is a pure narrow expression (rank table rides inside) —
    // it must run unchanged on a streaming frame and emit the batch tokens.
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpestream").toString
    val docs = Seq((1L, "the merger merged"), (2L, "the merging mergers"), (3L, "merge me"))
    docs.toDF("id", "text").repartition(3).write.mode("overwrite").parquet(dir)
    val merges = graft.llm.Bpe.trainMerges(spark.read.parquet(dir), "text", 8)
    val stream = spark.readStream.schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val toks = graft.llm.Bpe.tokenized(stream, "text", merges)
    assert(toks.isStreaming)
    val q = toks.writeStream.format("memory").queryName("bpe_stream_mem")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.table("bpe_stream_mem")
      .select(col("id"), col("tokens").cast("string"))
      .as[(Long, String)].collect().toSet
    val batch = graft.llm.Bpe.tokenized(spark.read.parquet(dir), "text", merges)
      .select(col("id"), col("tokens").cast("string"))
      .as[(Long, String)].collect().toSet
    assert(streamed == batch && batch.size == 3)
  }

  test("streaming language ID: the n-gram profile expression equals its batch result") {
    // langid_ngram is a pure narrow expression (profiles ride inside) — it
    // must run unchanged on a streaming frame and emit the batch labels.
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("langidstream").toString
    val rows = graft.llm.LangId.heldOutSentences.toSeq.sortBy(_._1)
      .flatMap { case (l, ss) => ss.take(2).map(s => (l, s)) }
      .zipWithIndex.map { case ((l, s), i) => (i.toLong, l, s) }
    rows.toDF("id", "lang", "text").repartition(3).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val pred = stream.withColumn("pred", graft.llm.LangId.languageIdNgram(col("text")))
    assert(pred.isStreaming)
    val q = pred.writeStream.format("memory").queryName("langid_stream_mem")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.table("langid_stream_mem")
      .select("id", "pred").as[(Long, String)].collect().toSet
    val batch = spark.read.parquet(dir)
      .withColumn("pred", graft.llm.LangId.languageIdNgram(col("text")))
      .select("id", "pred").as[(Long, String)].collect().toSet
    assert(streamed == batch && batch.size == rows.size)
    // and the labels are the true languages, streaming or not
    assert(spark.table("langid_stream_mem")
      .filter(col("pred") =!= col("lang")).count() == 0)
  }

  test("streaming byte-fallback encode: total text->ids equals its batch result") {
    // encodeIdsTotal = broadcast codebook (stream-static join) + narrow
    // tokenize/byte-decompose expressions — the ids of a streaming frame
    // must match batch, byte fallback included.
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpetotalstream").toString
    val docs = Seq((1L, "aa bb aa"), (2L, "aa 😀🌍 bb"), (3L, "zz aa"))
    docs.toDF("id", "text").repartition(3).write.mode("overwrite").parquet(dir)
    val train = Seq((0L, "aa bb aa bb")).toDF("id", "text")
    val merges = Seq(("a", "a"), ("b", "b"))
    val vocab = graft.llm.Bpe.vocabTotal(train, "text", merges)
    val stream = spark.readStream.schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val enc = graft.llm.Bpe.encodeIdsTotal(stream, "text", merges, vocab)
    assert(enc.isStreaming)
    val q = enc.writeStream.format("memory").queryName("bpetotal_stream_mem")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id"), col("ids").cast("string"), col("n_fallback_tokens"))
      .as[(Long, String, Long)].collect().toSet
    val streamed = key(spark.table("bpetotal_stream_mem"))
    val batch = key(graft.llm.Bpe.encodeIdsTotal(
      spark.read.parquet(dir), "text", merges, vocab))
    assert(streamed == batch && batch.size == 3)
    assert(streamed.exists(_._3 > 0), "the emoji doc must exercise the byte fallback")
  }

  test("streaming unigram encode: the Viterbi piece projection equals its batch result") {
    // unigram_encode is a pure narrow expression (piece table rides
    // inside) — it must run unchanged on a streaming frame and emit the
    // batch ids, byte fallback and optimality witness included.
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("unigramstream").toString
    val docs = Seq((1L, "the merger merged"), (2L, "the merging 😀 mergers"), (3L, "merge me"))
    docs.toDF("id", "text").repartition(3).write.mode("overwrite").parquet(dir)
    // train WITHOUT the emoji doc: 😀 must be out-of-vocabulary so the
    // streamed encode exercises the byte fallback
    val model = graft.llm.Unigram.train(
      spark.read.parquet(dir).filter(col("id") =!= 2L), "text", vocabSize = 30)
    val stream = spark.readStream.schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val enc = graft.llm.Unigram.encodeDetail(stream, "text", model)
    assert(enc.isStreaming)
    val q = enc.writeStream.format("memory").queryName("unigram_stream_mem")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id"), col("ids").cast("string"), col("n_fallback_tokens"),
        (col("score") >= col("greedy_score")))
      .as[(Long, String, Long, Boolean)].collect().toSet
    val streamed = key(spark.table("unigram_stream_mem"))
    val batch = key(graft.llm.Unigram.encodeDetail(
      spark.read.parquet(dir), "text", model))
    assert(streamed == batch && batch.size == 3)
    assert(streamed.exists(_._3 > 0), "the emoji doc must exercise the byte fallback")
    assert(streamed.forall(_._4), "viterbi >= greedy must hold on the stream too")
  }

  test("streaming multimodal decode: media metadata/features equal the batch result") {
    // decodeAndFeaturize is a partition-local mapPartitions — it must run
    // unchanged on a streaming frame and emit the batch metadata for all
    // three real codec paths (image, video, fake fallthrough).
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    def jpeg(shade: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 8).foreach(x => (0 until 8).foreach(y =>
        img.setRGB(x, y, (shade << 16) | (shade << 8) | shade)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpeg", bos)
      bos.toByteArray
    }
    val dir = java.nio.file.Files.createTempDirectory("mmstream").toString
    val blobs = Seq(
      (1L, jpeg(128)),
      (2L, graft.llm.Multimodal.buildMjpegAvi(Seq(jpeg(0), jpeg(255)), 8, 8, 25)),
      (3L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9)))
    blobs.toDF("id", "blob").repartition(3).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val dec = graft.llm.Multimodal.decodeAndFeaturize(stream, "blob")
      .select(col("id"), col("media_meta.mime").as("mime"),
        col("media_meta.width").as("w"), col("media_meta.frames").as("frames"),
        col("features").cast("string").as("f"))
    assert(dec.isStreaming)
    val q = dec.writeStream.format("memory").queryName("mm_stream_mem")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.table("mm_stream_mem")
      .as[(Long, String, Int, Option[Long], String)].collect().toSet
    val batch = graft.llm.Multimodal.decodeAndFeaturize(spark.read.parquet(dir), "blob")
      .select(col("id"), col("media_meta.mime").as("mime"),
        col("media_meta.width").as("w"), col("media_meta.frames").as("frames"),
        col("features").cast("string").as("f"))
      .as[(Long, String, Int, Option[Long], String)].collect().toSet
    assert(streamed == batch && batch.size == 3, (streamed, batch).toString)
    assert(streamed.exists(t => t._1 == 1L && t._2 == "image/jpeg"))
    assert(streamed.exists(t => t._1 == 2L && t._2 == "video/x-msvideo" && t._4.contains(2L)))
    assert(streamed.exists(t => t._1 == 3L && t._2 == "application/octet-stream"))
  }

  test("streaming AVI audio extraction: the WAV track equals the batch result") {
    // extractAudio is a partition-local mapPartitions like the decode —
    // it must run unchanged on a streaming frame, statuses included.
    import org.apache.spark.sql.functions.{col, md5}
    import spark.implicits._
    def jpeg(): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpeg", bos)
      bos.toByteArray
    }
    val pcm = Array.tabulate[Byte](800)(i => (i % 127).toByte)
    val dir = java.nio.file.Files.createTempDirectory("xastream").toString
    Seq(
      (1L, graft.llm.Multimodal.buildMjpegAviWithAudio(
        Seq(jpeg()), 8, 8, 25, pcm, 8000, 1, 16)),
      (2L, graft.llm.Multimodal.buildMjpegAvi(Seq(jpeg()), 8, 8, 25)),
      (3L, Array[Byte](9, 9, 9)))
      .toDF("id", "blob").repartition(3).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    def shape(df: org.apache.spark.sql.DataFrame) =
      graft.llm.Multimodal.extractAudio(df, "blob")
        .select(col("id"), col("audio_status"),
          md5(col("audio_track")).as("wav_md5"))
    val dec = shape(stream)
    assert(dec.isStreaming)
    val q = dec.writeStream.format("memory").queryName("xa_stream_mem")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.table("xa_stream_mem")
      .as[(Long, String, Option[String])].collect().toSet
    val batch = shape(spark.read.parquet(dir))
      .as[(Long, String, Option[String])].collect().toSet
    assert(streamed == batch && batch.size == 3, (streamed, batch).toString)
    assert(streamed.exists(t => t._1 == 1L && t._2 == "extracted" && t._3.nonEmpty))
    assert(streamed.exists(t => t._1 == 2L && t._2 == "no_audio" && t._3.isEmpty))
    assert(streamed.exists(t => t._1 == 3L && t._2 == "unsupported"))
  }

  test("streaming mojibake repair: the fix projection equals its batch result") {
    // fix_mojibake is a pure narrow expression — it must run unchanged on
    // a streaming frame, per-line mode included.
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    def mangle(s: String) =
      new String(s.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.charset.StandardCharsets.ISO_8859_1)
    val dir = java.nio.file.Files.createTempDirectory("mjstream").toString
    val docs = Seq(
      (1L, mangle(mangle("déjà vu — naïve"))),
      (2L, mangle("café crème") + "\n漢字 line\n" + mangle("l’été")),
      (3L, "already clean ascii"))
    docs.toDF("id", "text").repartition(3).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    def fixed(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("_fx",
        graft.functions.FixMojibakeExpr.fix_mojibake(col("text"), 3, perLine = true))
      .select(col("id"), col("_fx.fixed"), col("_fx.n_passes"))
    val enc = fixed(stream)
    assert(enc.isStreaming)
    val q = enc.writeStream.format("memory").queryName("mj_stream_mem")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.table("mj_stream_mem")
      .as[(Long, String, Int)].collect().toSet
    val batch = fixed(spark.read.parquet(dir)).as[(Long, String, Int)].collect().toSet
    assert(streamed == batch && batch.size == 3, (streamed, batch).toString)
    assert(streamed.contains((1L, "déjà vu — naïve", 2)))
    assert(streamed.contains((2L, "café crème\n漢字 line\nl’été", 1)),
      "per-line repair must work around the CJK line on the stream")
    assert(streamed.contains((3L, "already clean ascii", 0)))
  }

  test("streaming wordpiece encode: the greedy-match projection equals its batch result") {
    // wordpiece_encode is the same narrow-expression shape as the BPE and
    // unigram encodes (vocab rides inside as a reference object) — it must
    // run unchanged on a streaming frame and emit the batch ids, [UNK]
    // collapse included.
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wpstream").toString
    val docs = Seq((1L, "hugs hug pugs"), (2L, "hug 😀 hugs"), (3L, "pugs pug hug"))
    docs.toDF("id", "text").repartition(3).write.mode("overwrite").parquet(dir)
    // train WITHOUT the emoji doc: 😀 is outside the alphabet so the
    // streamed encode exercises the [UNK] collapse
    val model = graft.llm.WordPiece.train(
      spark.read.parquet(dir).filter(col("id") =!= 2L), "text", vocabSize = 12)
    val stream = spark.readStream.schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val enc = graft.llm.WordPiece.encodeDetail(stream, "text", model)
    assert(enc.isStreaming)
    val q = enc.writeStream.format("memory").queryName("wp_stream_mem")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id"), col("ids").cast("string"), col("pieces").cast("string"),
        col("n_unk_words"), col("n_words"))
      .as[(Long, String, String, Long, Long)].collect().toSet
    val streamed = key(spark.table("wp_stream_mem"))
    val batch = key(graft.llm.WordPiece.encodeDetail(
      spark.read.parquet(dir), "text", model))
    assert(streamed == batch && batch.size == 3, (streamed, batch).toString)
    assert(streamed.exists(_._4 > 0), "the emoji doc must exercise the [UNK] collapse")
    // decode round-trips the streamed ids for the fully-in-vocab doc
    val d3 = spark.table("wp_stream_mem").filter(col("id") === 3L)
      .withColumn("decoded", graft.llm.WordPiece.decodeIds(col("ids"), model))
      .select("decoded").as[String].head()
    assert(d3 == "pugs pug hug", d3)
  }

  test("streaming heavy hitters: micro-batch MG segments keep the bounds after compaction") {
    // The Misra–Gries leg of the segment-parity discipline (CMS/Bloom/LM/
    // histogram have theirs). MG is NOT linear — merged estimates depend on
    // batch boundaries within the PROVEN bounds — so the invariant is the
    // bound set, not bit equality: for the merged store (compacted to cap),
    //   est(k) ≤ true(k) for every reported key (soundness),
    //   every true heavy hitter (true > n/(cap+1)) is present,
    //   true(k) − est(k) ≤ n/(cap+1) for those hitters (integer-exact).
    import org.apache.spark.sql.functions.col
    val cap = 16
    val schema = spark.read.parquet(eventsPath).schema
    val segDir = "/tmp/graft_test_hh_segs"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(segDir))
    // skew the key so true hitters exist: 70% of events on 3 hot keys
    def keyed(df: org.apache.spark.sql.DataFrame) = df.select(
      when(col("user_id") % 10 < 7,
        concat(lit("hot-"), (col("user_id") % 3).cast("string")))
        .otherwise(concat(lit("cold-"), col("event_id").cast("string"))).as("key"))
    val stream = spark.readStream
      .option("maxFilesPerTrigger", 1).schema(schema).parquet(eventsPath)
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.llm.HeavyHitters.summarize(keyed(batch), col("key"), cap)
          .write.mode("append").parquet(segDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val merged = graft.llm.HeavyHitters.merge(spark.read.parquet(segDir), cap)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged.size <= cap, s"compaction left ${merged.size} > cap=$cap rows")
    val all = keyed(spark.read.parquet(eventsPath))
    val truth = all.groupBy("key").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = truth.values.sum
    merged.foreach { case (k, e) =>
      assert(e <= truth(k), s"streamed merge overestimated $k: $e > ${truth(k)}")
    }
    val hitters = truth.filter { case (_, c) => c * (cap + 1) > n }
    assert(hitters.nonEmpty, "fixture produced no true heavy hitters")
    hitters.foreach { case (k, c) =>
      assert(merged.contains(k), s"true hitter $k lost across micro-batch segments")
      assert((c - merged(k)) * (cap + 1) <= n,
        s"$k deficit ${c - merged(k)} exceeds n/(cap+1) = ${n / (cap + 1)}")
    }
  }
}
