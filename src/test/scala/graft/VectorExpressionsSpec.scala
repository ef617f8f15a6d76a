package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions
import graft.llm.Similarity

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot matches the composable zip_with form bit-for-bit") {
    val em = spark.read.parquet(s"${sf()}/embeddings.parquet").limit(100)
    val pairs = em.select($"vec_id".as("ia"), $"embedding".as("a"))
      .crossJoin(em.select($"vec_id".as("ib"), $"embedding".as("b")))
      .limit(500)
    val diff = pairs.select(
      (VectorExpressions.vec_dot($"a", $"b") - Similarity.dotComposable($"a", $"b")).as("d")
    ).agg(max(abs($"d"))).head().getDouble(0)
    assert(diff == 0.0) // same element order, same doubles
  }

  test("vec_dot handles known values, null elements, and length mismatch") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    assert(df.select(VectorExpressions.vec_dot($"a", $"b")).head().getDouble(0) == 32.0)
    val withNull = Seq((Seq(Some(1.0), None, Some(3.0)), Seq(1.0, 1.0, 1.0))).toDF("a", "b")
    assert(withNull.select(VectorExpressions.vec_dot($"a", $"b")).head().getDouble(0) == 4.0)
    val mismatch = Seq((Seq(1.0, 2.0, 9.0), Seq(3.0, 4.0))).toDF("a", "b")
    assert(mismatch.select(VectorExpressions.vec_dot($"a", $"b")).head().getDouble(0) == 11.0)
  }

  test("vec_dot null array yields null") {
    val df = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    assert(df.select(VectorExpressions.vec_dot($"a", $"b")).head().isNullAt(0))
  }

  test("vec_dot is registered for SQL and participates in codegen") {
    graft.udf.Udfs.register(spark)
    spark.read.parquet(s"${sf()}/embeddings.parquet").createOrReplaceTempView("emb_vx")
    val r = spark.sql(
      """SELECT vec_id, VEC_DOT(embedding, embedding) AS norm2
        FROM emb_vx ORDER BY vec_id LIMIT 3""").collect()
    assert(r.length == 3 && r.forall(_.getDouble(1) > 0))
    // plan stays inside whole-stage codegen (no UDF barrier)
    val plan = spark.sql("SELECT VEC_DOT(embedding, embedding) FROM emb_vx")
      .queryExecution.executedPlan.toString
    // '*(n)' prefix = operator inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project"), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }

  test("vec_cosine matches the composable cosine bit-for-bit") {
    val em = spark.read.parquet(s"${sf()}/embeddings.parquet").limit(100)
    val pairs = em.select($"vec_id".as("ia"), $"embedding".as("a"))
      .crossJoin(em.select($"vec_id".as("ib"), $"embedding".as("b")))
      .limit(500)
    val diff = pairs.select(
      (VectorExpressions.vec_cosine($"a", $"b") - Similarity.cosineComposable($"a", $"b")).as("d")
    ).agg(max(abs($"d"))).head().getDouble(0)
    assert(diff == 0.0)
  }

  test("vec_cosine known values, zero vector, SQL registration, codegen") {
    val df = Seq((Seq(1.0, 0.0), Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(0.0, 0.0)))
      .toDF("a", "b", "c", "z")
    val r = df.select(
      VectorExpressions.vec_cosine($"a", $"b"),
      VectorExpressions.vec_cosine($"a", $"c"),
      VectorExpressions.vec_cosine($"a", $"z")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-15)
    assert(math.abs(r.getDouble(1)) < 1e-15)
    assert(r.getDouble(2) == 0.0) // zero-norm guard
    graft.udf.Udfs.register(spark)
    spark.read.parquet(s"${sf()}/embeddings.parquet").createOrReplaceTempView("emb_vc")
    val plan = spark.sql("SELECT VEC_COSINE(embedding, embedding) FROM emb_vc")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    val self = spark.sql(
      "SELECT VEC_COSINE(embedding, embedding) AS c FROM emb_vc LIMIT 5").collect()
    assert(self.forall(r2 => math.abs(r2.getDouble(0) - 1.0) < 1e-12))
  }

  test("type mismatch is rejected at analysis") {
    val df = Seq((1, Seq(1.0))).toDF("n", "v")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(VectorExpressions.vec_dot($"n", $"v")).collect()
    }
  }
}

class TextExpressionsSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private val docs = Seq(
    "the quick brown fox jumps over the lazy dog",
    "The   Quick  BROWN fox ",                       // normalization collapses to the same prefix
    "ascii and unicode: żółć 画像データ mixed in — ok?", // multi-byte chars exercise the offset walk
    "short",                                          // < k+w-1 chars → empty set
    "tiny",                                           // < k chars → empty set
    "",                                               // empty → empty set
    "exactly11ch"                                     // == k+w-1: exactly one window
  ).toDF("t")

  test("native winnowing matches the composable HOF form bit-for-bit") {
    val native = docs.select(graft.llm.TextStats.winnowingFingerprints(col("t")).as("f"))
    val hof = docs.select(graft.llm.TextStats.winnowingFingerprintsComposable(col("t")).as("f"))
    val n = native.as[Seq[Long]].collect().toSeq
    val h = hof.as[Seq[Long]].collect().toSeq
    assert(n == h, s"native=$n\nhof=$h")
    assert(n(3).isEmpty && n(4).isEmpty && n(5).isEmpty)
    assert(n(6).size == 1)
    // normalized variants share their common-prefix fingerprints
    assert(n(0).toSet.intersect(n(1).toSet).nonEmpty)
  }

  test("native winnowing: null in, null out; non-default k/w parity") {
    val withNull = Seq[(Integer, String)]((1, "abcdefghijklmnop"), (2, null)).toDF("id", "t")
    val out = withNull
      .select(col("id"), graft.llm.TextStats.winnowingFingerprints(col("t"), k = 5, w = 3).as("f"))
      .orderBy("id").collect()
    assert(out(1).isNullAt(1), "null text must yield null, not empty")
    val hof = withNull
      .select(col("id"), graft.llm.TextStats.winnowingFingerprintsComposable(col("t"), k = 5, w = 3).as("f"))
      .orderBy("id").collect()
    assert(out(0).getSeq[Long](1) == hof(0).getSeq[Long](1))
  }

  test("winnowing_fingerprints registered for SQL, stays in whole-stage codegen") {
    graft.udf.Udfs.register(spark)
    spark.read.parquet(s"${sf()}/documents.parquet").createOrReplaceTempView("docs_wf")
    val r = spark.sql(
      "SELECT size(winnowing_fingerprints(text, 8, 4)) AS n FROM docs_wf LIMIT 5").collect()
    assert(r.map(_.getInt(0)).max > 5)
    val plan = spark.sql("SELECT winnowing_fingerprints(text) FROM docs_wf")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
  }
}

class HashExpressionsSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog and the dog sleeps",
    "one",
    "",
    "unicode żółć 画像 tokens too"
  ).toDF("t")

  test("native minhash_signature matches the composable aggregate bit-for-bit") {
    val sh = graft.llm.Dedup.shingles(col("t"), 2)
    val hashed = texts.select(
      array_distinct(transform(sh, s => xxhash64(s))).as("h"))
    for (n <- Seq(1, 8, 32)) {
      val nat = hashed.select(graft.llm.Dedup.minhashSignature(col("h"), n)).as[Seq[Long]].collect().toSeq
      val ref = hashed.select(graft.llm.Dedup.minhashSignatureComposable(col("h"), n)).as[Seq[Long]].collect().toSeq
      assert(nat == ref, s"numHashes=$n\nnative=$nat\nref=$ref")
    }
    // empty shingle set → all Long.MaxValue (both forms)
    val empty = Seq(Seq.empty[Long]).toDF("h")
      .select(graft.llm.Dedup.minhashSignature(col("h"), 4)).as[Seq[Long]].head()
    assert(empty == Seq.fill(4)(Long.MaxValue))
  }

  test("native simhash64 matches the composable vote bit-for-bit") {
    val nat = texts.select(graft.functions.Simhash64Expr.simhash64(graft.llm.Dedup.tokens(col("t"))))
      .as[Long].collect().toSeq
    val ref = texts.select(graft.llm.Dedup.simhashComposable(col("t"))).as[Long].collect().toSeq
    assert(nat == ref, s"native=$nat\nref=$ref")
  }

  test("simhash64/minhash_signature SQL registration + codegen, null semantics") {
    graft.udf.Udfs.register(spark)
    spark.read.parquet(s"${sf()}/documents.parquet").createOrReplaceTempView("docs_hx")
    val r = spark.sql(
      """SELECT simhash64(split(lower(text), ' ')) AS s,
               minhash_signature(array(xxhash64(text)), 4) AS m
        FROM docs_hx LIMIT 3""").collect()
    assert(r.length == 3 && r.forall(x => x.getSeq[Long](1).size == 4))
    val plan = spark.sql("SELECT simhash64(split(text, ' ')) FROM docs_hx")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    // null array in, null out for both
    val nulls = spark.sql(
      """SELECT simhash64(CAST(NULL AS ARRAY<STRING>)) AS s,
               minhash_signature(CAST(NULL AS ARRAY<BIGINT>), 2) AS m""").head()
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }
}

class CharClassCountsSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("native char-class counts match the regex reference on adversarial input") {
    val texts = Seq(
      "plain ascii words 123, punct! (all) of? it.",
      "unicode letters żółć ßÜÉ 画像データ — «guillemets» aren't \\p{Punct}",
      "numbers beyond Nd: Ⅷ ½ ¾ ³ vs 42",      // Nl and No categories
      "symbols +<=> $ @ # ^ _ | ~ are punct; € © ± × are NOT",
      "", " ", "\t\n",
      "emoji \ud83d\ude00 and \ud835\udc9c math letter (supplementary planes)"
    ).toDF("t")
    val native = texts.select(graft.llm.TextStats.qualityFeatures(col("t")).as("f")).collect()
    val ref = texts.select(graft.llm.TextStats.qualityFeaturesComposable(col("t")).as("f")).collect()
    native.zip(ref).zipWithIndex.foreach { case ((n, r), i) =>
      assert(n == r, s"row $i:\nnative=$n\nref=$r")
    }
  }

  test("char_class_counts SQL registration and null propagation") {
    graft.udf.Udfs.register(spark)
    val r = spark.sql(
      "SELECT char_class_counts('ab1!'), char_class_counts(CAST(NULL AS STRING))").head()
    val s = r.getStruct(0)
    assert((s.getInt(0), s.getInt(1), s.getInt(2), s.getInt(3)) == ((4, 2, 1, 1)))
    assert(r.isNullAt(1))
  }

  test("unicode_normalize matches java.text.Normalizer across forms") {
    import graft.functions.UnicodeNormalizeExpr.unicode_normalize
    val decomposed = "cafe\u0301 n\u0303 A\u030Angstro\u0308m"
    val composed = "caf\u00e9 \u00f1 \u00c5ngstr\u00f6m"
    val compat = "ﬁle ½ Ⅷ"                                    // ligature, fractions (NFKC targets)
    val df = Seq(decomposed, composed, compat).toDF("t")
    val out = df.select(
      unicode_normalize(col("t")).as("nfc"),
      unicode_normalize(col("t"), "NFD").as("nfd"),
      unicode_normalize(col("t"), "NFKC").as("nfkc")).collect()
    import java.text.Normalizer
    Seq(decomposed, composed, compat).zip(out).foreach { case (in, r) =>
      assert(r.getString(0) == Normalizer.normalize(in, Normalizer.Form.NFC))
      assert(r.getString(1) == Normalizer.normalize(in, Normalizer.Form.NFD))
      assert(r.getString(2) == Normalizer.normalize(in, Normalizer.Form.NFKC))
    }
    // canonical equivalence collapses under NFC
    assert(out(0).getString(0) == out(1).getString(0))
  }

  test("unicode_normalize SQL registration, codegen, null, and bad-form rejection") {
    graft.udf.Udfs.register(spark)
    val df = spark.sql(
      "SELECT unicode_normalize('café') AS a, " +
        "unicode_normalize('ﬁle', 'NFKC') AS b, " +
        "unicode_normalize(CAST(NULL AS STRING)) AS c")
    assert(df.head() == org.apache.spark.sql.Row("café", "file", null))
    // literal inputs CONSTANT-FOLD (the expression is pure); codegen is
    // asserted over a real scan, like the other native expressions
    spark.read.parquet(s"${sf()}/documents.parquet").createOrReplaceTempView("docs_un")
    val plan = spark.sql("SELECT unicode_normalize(text) FROM docs_un")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
    intercept[Exception] {
      spark.sql("SELECT unicode_normalize('x', 'NFX')").collect()
    }
  }

  test("native md5_prefix64 matches the conv/substring formulation bit-for-bit") {
    // the Bloom path's per-row hash: (h1 << 32) | h2 must equal the two
    // hex-parsed 32-bit md5 halves on real corpus text, unicode, empties
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("text").as("s"))
      .unionByName(Seq("", "caf\u00e9 \u4e2d\u6587", "  spaces  ", "0", "a" * 200).toDF("s"))
    val cmp = docs.select(
      graft.functions.Md5Prefix64Expr.md5_prefix64(col("s")).as("native"),
      (shiftleft(conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long"), 32) +
        conv(substring(md5(col("s")), 9, 8), 16, 10).cast("long")).as("hex"))
    assert(cmp.filter(col("native") =!= col("hex")).count() == 0)
    assert(cmp.count() > 0)
  }

  test("md5_prefix64 SQL registration, codegen, and null propagation") {
    graft.udf.Udfs.register(spark)
    val r = spark.sql(
      "SELECT md5_prefix64('abc') AS h, md5_prefix64(CAST(NULL AS STRING)) AS n")
    val row = r.collect().head
    // md5('abc') = 900150983cd24fb0...: h1 = 0x90015098, h2 = 0x3cd24fb0
    // (constant-folded at planning — which itself proves eval correctness)
    assert(row.getLong(0) == (0x90015098L << 32 | 0x3cd24fb0L), row.toString)
    assert(row.isNullAt(1), "null must propagate")
    // codegen over a non-literal input: the projection must stay in a
    // whole-stage-codegen'd Project with no ScalaUDF fallback
    spark.read.parquet(s"${sf()}/documents.parquet").createOrReplaceTempView("docs_md5p")
    val plan = spark.sql("SELECT md5_prefix64(text) FROM docs_md5p")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan.take(1000))
    assert(!plan.contains("ScalaUDF"), plan.take(1000))
  }
}
