package graft

/** Smoke coverage: every SparkEntry query must run and return rows at
  * sf0.001, and every oracle key must exist in queries. The value-level
  * DuckDB comparison is the driver's job (and tools/selfcheck.py locally).
  */
class QueriesSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle keys without queries: $missing")
  }

  // legitimately empty at tiny scale: every customer has orders; the synthetic
  // documents may have no pairs above the LSH similarity threshold
  private val mayBeEmpty = Set("q06_join_anti_notexists", "q16_except", "q46_similarity_join_lsh")

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sf())
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
      assert(df.columns.nonEmpty)
    }
  }

  // The queries without a DuckDB oracle (LSH / approx sketches / binary
  // decode) are SELF-verifying instead: each emits an `ok` column carrying
  // its own internal invariant (exact Jaccard/Hamming/cosine vs threshold,
  // HLL/percentile error bounds, brute-force score parity, codec contract).
  // This is the enforcement: no row may fail its own invariant.
  private val selfVerifying = Seq(
    "q36_dedup_minhash", "q37_dedup_simhash", "q46_similarity_join_lsh",
    "q59_fingerprints", "q60_embedding_neardup", "q61_multimodal_decode",
    "q62_similarity_ivf", "q64_approx_sketches", "q147_ivf_index",
    "q148_ivf_quantized", "q155_pq_topk", "q156_semdedup",
    "q157_heavy_hitters", "q158_ivf_pq", "q161_cdc_chunks", "q163_cdc_dedup",
    "q165_bpe_tokenize", "q174_bpe_ids", "q175_media_resize",
    "q178_bpe_byte_fallback", "q179_langid_ngram", "q181_audio_decode",
    "q185_tokenizer_fertility", "q186_langid_floor", "q189_audio_resample",
    "q191_minhash_index_ingest", "q192_unigram_encode", "q193_ann_recall_report",
    "q196_wordpiece_encode", "q199_video_frames", "q200_video_transcode",
    "q202_index_takedown", "q205_vector_takedown", "q206_video_audio_track",
    "q208_deflate_quality", "q210_takedown_orchestrated",
    "q211_quality_signal_gate")

  for (name <- selfVerifying) {
    test(s"$name: every row passes its own invariant (ok column)") {
      val df = SparkEntry.queries(name)(spark, sf())
      assert(df.columns.contains("ok"), s"$name lost its ok column")
      // NULL ok counts as FAILING: a three-valued invariant (e.g. a left
      // join miss) must not slip past the gate
      val bad = df.filter(!org.apache.spark.sql.functions.coalesce(
        org.apache.spark.sql.functions.col("ok"),
        org.apache.spark.sql.functions.lit(false))).count()
      assert(bad == 0, s"$name has $bad rows failing their own invariant")
    }
  }

  test("q62_similarity_ivf: ANN hits rank near the brute-force top at sf0.001") {
    import org.apache.spark.sql.functions.col
    val df = SparkEntry.queries("q62_similarity_ivf")(spark, sf())
    val n = df.count()
    val near = df.filter(col("bf_rank") <= 10).count()
    // nprobe=2 of nlist=16 — recall isn't 1.0 by design, but the majority
    // of returned neighbors must sit in the true top-10
    assert(near * 2 >= n, s"only $near of $n IVF hits are in the brute-force top-10")
  }
}
