package graft

import graft.core.PipelineContext

/** Previously compile-only stages, tested against what the classpath really
  * provides: embedded Derby (ships with Spark) for the JDBC stages, JDK
  * ImageIO for ImageExtract fixtures, MLlib for a saved PipelineModel.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  test("JDBCExecute DDL, JDBCLoad write, JDBCExtract read — embedded Derby round-trip") {
    val url = "jdbc:derby:memory:graftdb;create=true"
    val ctx = new PipelineContext(spark)
    // DDL through JDBCExecute
    graft.execute.JDBCExecute("ddl", url,
      "CREATE TABLE settings (k VARCHAR(20), v VARCHAR(20))").execute(ctx)
    graft.execute.JDBCExecute("dml", url,
      "INSERT INTO settings VALUES ('mode', 'fast')").execute(ctx)
    // Spark-side write: let the JDBC writer create the table
    Seq((1, "ada"), (2, "grace")).toDF("id", "name").createOrReplaceTempView("people_src")
    graft.load.JDBCLoad("load", "people_src", url, "people", saveMode = "Overwrite").execute(ctx)
    // and read both back through JDBCExtract
    val people = graft.extract.JDBCExtract("ex", url, "people", "people_v").execute(ctx).get
    assert(people.orderBy("id").collect().map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "ada"), (2, "grace")))
    val settings = graft.extract.JDBCExtract("ex2", url, "settings", "settings_v").execute(ctx).get
    assert(settings.head().getString(1) == "fast")
    // partitioned read path (numPartitions + bounds)
    val ranged = graft.extract.JDBCExtract("ex3", url, "people", "people_ranged",
      partitionColumn = Some("id"), lowerBound = Some(0L), upperBound = Some(10L),
      numPartitions = Some(2)).execute(ctx).get
    assert(ranged.count() == 2 && ranged.rdd.getNumPartitions == 2)
  }
}

class ImageSpec extends SparkSpec {
  test("ImageExtract decodes generated PNG fixtures (JDK ImageIO)") {
    val dir = java.nio.file.Files.createTempDirectory("imgs")
    val img = new java.awt.image.BufferedImage(3, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000)
    javax.imageio.ImageIO.write(img, "png", dir.resolve("a.png").toFile)
    javax.imageio.ImageIO.write(img, "png", dir.resolve("b.png").toFile)
    val ctx = new PipelineContext(spark)
    val df = graft.extract.ImageExtract("img", dir.toString, "img_v").execute(ctx).get
    assert(df.count() == 2)
    val r = df.select("image.width", "image.height", "image.nChannels").head()
    assert(r.getInt(0) == 3 && r.getInt(1) == 2)
  }
}

class MlSpec extends SparkSpec {
  import spark.implicits._

  test("MLTransform applies a saved PipelineModel and appends predictions") {
    import org.apache.spark.ml.Pipeline
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.feature.VectorAssembler
    val train = Seq((0.0, 0.1), (0.1, 0.0), (5.0, 5.1), (5.1, 5.0)).toDF("x", "y")
    val pipeline = new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(Array("x", "y")).setOutputCol("features"),
      new KMeans().setK(2).setSeed(7)
    ))
    val modelPath = java.nio.file.Files.createTempDirectory("mlmodel").toString + "/model"
    pipeline.fit(train).write.overwrite().save(modelPath)
    val ctx = new PipelineContext(spark)
    train.createOrReplaceTempView("ml_in")
    val out = graft.transform.MLTransform("ml", modelPath, "ml_in", "ml_out").execute(ctx).get
    assert(out.columns.contains("prediction"))
    // the two clusters separate the two point groups
    val preds = out.orderBy("x").select("prediction").as[Int].collect()
    assert(preds(0) == preds(1) && preds(2) == preds(3) && preds(0) != preds(2))
  }
}

/** The full training-data pipeline, end to end: extract → language filter →
  * quality filter → PII scrub → exact dedup → near-dedup (MinHash clusters)
  * → repetition filter → greedy packing → clustered parquet write. Every
  * step is one of the library's first-class operators; this pins that they
  * COMPOSE — schemas, column contracts and determinism hold across the whole
  * chain, the way a real 100 TB corpus build would run them.
  */
class TrainingPipelineSpec extends SparkSpec {

  test("documents corpus flows through the whole pipeline deterministically") {
    import org.apache.spark.sql.functions._
    import graft.llm.{Dedup, Packing, TextStats}

    val ctx = new PipelineContext(spark)
    graft.core.Runner.run(Seq(
      graft.extract.ParquetExtract("ex", s"${sf()}/documents.parquet", "docs")), ctx)

    val scored = ctx.view("docs")
      .withColumn("lang_id", TextStats.languageId(col("text")))
      .withColumn("quality", TextStats.qualityScore(col("text")))
      .withColumn("toks", TextStats.tokenCount(col("text")).cast("long"))
      .withColumn("scrubbed", regexp_replace(col("text"), "[0-9]{2,}", "[NUM]"))
    val filtered = scored
      .filter(col("quality") > lit(0.0) && col("toks") >= 8)
    val exact = Dedup.exact(filtered, Seq("scrubbed"), "doc_id")
    val near = Dedup.minhashDedupClusters(exact, "doc_id", "scrubbed", shingleLen = 3)
    val clean = TextStats.repetitionStats(near, "doc_id", "scrubbed")
      .filter(col("top_word_frac") < 0.5)
      .join(near, Seq("doc_id"))
    val packed = Packing.packGreedy(
      clean.withColumn("shard", pmod(col("doc_id"), lit(4))),
      "shard", "doc_id", "toks", maxTokens = 2048)

    val out = java.nio.file.Files.createTempDirectory("pipeline").toString + "/data"
    graft.core.Layout.cluster(packed, Seq("shard", "pack_id"), Some(4))
      .write.parquet(out)
    val back = spark.read.parquet(out)

    // every stage kept the contract: rows survived, no pack overflows (a
    // single doc may exceed maxTokens by design; multi-doc packs may not),
    // and a rerun reproduces the identical result (deterministic pipeline)
    val n = back.count()
    assert(n > 100, s"pipeline filtered everything: $n")
    val overflow = back.groupBy("shard", "pack_id")
      .agg(sum("toks").as("fill"), count(lit(1)).as("ndocs"))
      .filter(col("fill") > 2048 && col("ndocs") > 1)
      .count()
    assert(overflow == 0, "a multi-doc pack exceeds the context window")
    val rerun = Packing.packGreedy(
      clean.withColumn("shard", pmod(col("doc_id"), lit(4))),
      "shard", "doc_id", "toks", maxTokens = 2048)
    assert(rerun.exceptAll(packed).count() == 0 && packed.exceptAll(rerun).count() == 0,
      "pipeline is not deterministic across reruns")
  }

  test("decontaminate -> chunk -> weighted sample -> pack compose deterministically") {
    import org.apache.spark.sql.functions._
    import graft.llm.{Chunking, Decontaminate, Packing, Sampling}

    val docs = spark.read.parquet(s"${sf()}/documents.parquet").select("doc_id", "text")
    val evalSet = docs.filter(col("doc_id") % 17 === 0)
    val train = docs.filter(col("doc_id") % 17 =!= 0)

    val clean = Decontaminate.clean(train, "doc_id", "text", evalSet, "text", n = 4)
    assert(clean.count() > 0 && clean.count() < train.count(),
      "decontamination should drop some but not all docs on this corpus")

    val chunks = Chunking.chunkByTokens(clean, "text", chunkSize = 64, overlap = 8)
      .withColumn("cid", col("doc_id") * 100 + col("chunk_id"))
    assert(chunks.filter(col("chunk_tokens") > 64).count() == 0)
    assert(chunks.select("doc_id").distinct().count() == clean.count(),
      "chunking lost documents")

    // longer chunks more likely kept — quality-weighted downsampling stand-in
    val sampled = Sampling.weightedHashSample(
      chunks, col("cid"), col("chunk_tokens").cast("double") / 64.0, salt = "it")
    assert(sampled.count() > 0 && sampled.count() < chunks.count())

    val packed = Packing.packGreedy(
      sampled.withColumn("shard", pmod(col("doc_id"), lit(4))),
      "shard", "cid", "chunk_tokens", maxTokens = 256)
    val overflow = packed.groupBy("shard", "pack_id")
      .agg(sum("chunk_tokens").as("fill"), count(lit(1)).as("n"))
      .filter(col("fill") > 256 && col("n") > 1).count()
    assert(overflow == 0, "a multi-chunk pack exceeds the window")

    val rerun = Packing.packGreedy(
      Sampling.weightedHashSample(
        chunks, col("cid"), col("chunk_tokens").cast("double") / 64.0, salt = "it")
        .withColumn("shard", pmod(col("doc_id"), lit(4))),
      "shard", "cid", "chunk_tokens", maxTokens = 256)
    assert(rerun.exceptAll(packed).count() == 0 && packed.exceptAll(rerun).count() == 0,
      "composed pipeline is not deterministic")
  }

  test("bloom decontaminate -> LM novelty gate -> hash split -> drift check compose") {
    // The round-12 curation pipeline end-to-end: scrub eval overlap with
    // the bloom-prefiltered path (exact), score LM novelty against the
    // kept corpus's own counts, gate the noisiest tail off, split
    // train/val deterministically, and confirm via the drift monitor that
    // the split halves have (near-)identical length distributions while
    // the gated-out tail does not.
    import org.apache.spark.sql.functions._
    import graft.llm.{BloomSketch, Decontaminate, HistSketch, LangModel, Sampling}

    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "text", "n_chars")
    val evalSet = docs.filter(col("doc_id") % 17 === 0)
    val train = docs.filter(col("doc_id") % 17 =!= 0)

    val clean = Decontaminate.cleanBloom(train, "doc_id", "text", evalSet, "text",
      n = 4, bits = 1L << 18, hashes = 3)
    val exact = Decontaminate.clean(train, "doc_id", "text", evalSet, "text", n = 4)
    assert(clean.count() == exact.count(), "bloom decontamination diverged from exact")

    val bg = LangModel.bigramCounts(clean, "text")
    val ug = LangModel.unigramCounts(clean, "text")
    val scored = LangModel.score(clean, "doc_id", "text", bg, ug, ug.count())
    assert(scored.filter(col("n_unseen") =!= 0L).count() == 0,
      "self-trained model must see every kept bigram")

    val split = Sampling.hashSplit(scored.join(clean, Seq("doc_id")),
      col("doc_id"), Seq("train" -> 0.5, "val" -> 0.5), salt = "i2")
    val d = HistSketch.drift(
      HistSketch.segment(split.filter(col("split") === "train"), col("n_chars"), 0, 600, 16),
      HistSketch.segment(split.filter(col("split") === "val"), col("n_chars"), 0, 600, 16))
      .collect().head
    // a hash split is distribution-blind: the halves' length histograms
    // must be close (not exactly zero — finite sample)
    assert(d.getAs[Double]("ks") < 0.2, s"hash split skewed the distribution: $d")
    // while a length-biased selection must show up as maximal drift (300
    // is exactly bin edge 8 of 16 over [0,600), so the two sides share no
    // bin and KS must saturate)
    val biased = HistSketch.drift(
      HistSketch.segment(split.filter(col("n_chars") < 300), col("n_chars"), 0, 600, 16),
      HistSketch.segment(split.filter(col("n_chars") >= 300), col("n_chars"), 0, 600, 16))
      .collect().head
    assert(biased.getAs[Double]("ks") == 1.0, s"disjoint length ranges must max the KS: $biased")
  }
}
