package graft

import org.apache.spark.sql.functions._
import graft.llm.{Dedup, LineFilter, Quantize, Redact, Relevance}

/** Round-7 corpus-cleaning operators: C4-style line filtering, int8
  * quantization, token rarity, segment-level cleaning.
  */
class CleaningSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------------------------- LineFilter

  private def lineDocs = Seq(
    (1L, "This line has enough words.\nshort\nAnother good line stays here!\nno terminal punct here at all"),
    (2L, "Enable javascript to continue reading.\nA perfectly fine sentence stays."),
    (3L, "function f() { return 1; }\nA good sentence in a code doc."),
    (4L, "word"),
    (5L, "Lorem ipsum dolor sit amet.\nThe placeholder doc gets flagged.")
  ).toDF("doc_id", "text")

  test("line filter keeps punctuated multi-word lines only") {
    val out = LineFilter.clean(lineDocs, "doc_id", "text").orderBy("doc_id")
      .as[(Long, Int, Int, String, Boolean)].collect()
    val d1 = out(0)
    assert(d1._2 == 4 && d1._3 == 2)
    assert(d1._4 == "This line has enough words.\nAnother good line stays here!")
    assert(!d1._5)
    // javascript line dropped, clean sentence kept
    assert(out(1)._4 == "A perfectly fine sentence stays.")
    // curly brace flags the whole doc even though one line is fine
    assert(out(2)._5)
    // single word: nothing survives -> empty text + dropped
    assert(out(3)._3 == 0 && out(3)._4 == "" && out(3)._5)
    // lorem ipsum flags the doc
    assert(out(4)._5)
  }

  test("line filter plans a single split of the text column (let-bound)") {
    // parquet-backed input — a local Seq would constant-fold to a
    // LocalTableScan and hide the projection
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val plan = LineFilter.clean(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    val n = "split\\(text".r.findAllIn(plan).length
    assert(n == 1, s"expected one split(text...) in the plan, found $n:\n$plan")
  }

  test("line filter stage filter action rewrites text and drops flagged docs") {
    val ctx = new graft.core.PipelineContext(spark)
    lineDocs.createOrReplaceTempView("docs_lf")
    val out = graft.transform.LineFilterTransform(
      "lf", "docs_lf", "docs_clean", "doc_id", "text", action = "filter")
      .execute(ctx).get
    val rows = out.orderBy("doc_id").select("doc_id", "text").as[(Long, String)].collect()
    assert(rows.map(_._1).toSeq == Seq(1L, 2L))
    assert(rows(1)._2 == "A perfectly fine sentence stays.")
  }

  // ---------------------------------------------------------------- Quantize

  test("int8 codes are bounded, exact at extremes, and zero-vector safe") {
    val df = Seq(
      (1L, Array(1.0f, -1.0f, 0.5f, 0.0f)),
      (2L, Array(0.0f, 0.0f)),
      (3L, Array(-2.5f))
    ).toDF("id", "v")
    val codes = df.select($"id", Quantize.int8Codes($"v").as("c"))
      .orderBy("id").as[(Long, Seq[Int])].collect()
    assert(codes(0)._2 == Seq(127, -127, 64, 0)) // 0.5*127=63.5 -> floor(64.0)=64
    assert(codes(1)._2 == Seq(0, 0))             // zero scale -> zero codes
    assert(codes(2)._2 == Seq(-127))
    val stats = Quantize.quantStats(df, "id", "v").orderBy("id")
      .select("n_dim", "code_sum", "code_l1", "max_abs_err").as[(Int, Long, Long, Double)].collect()
    assert(stats(0) == ((4, 64L, 318L, 64.0 * 1.0 / 127 - 0.5)))
    assert(stats(1) == ((2, 0L, 0L, 0.0)))
    // reconstruction error is bounded by half a quantization step
    assert(stats.forall { case (_, _, _, err) => err <= 2.5 / 127 / 2 + 1e-12 })
  }

  test("int8 codes map non-finite elements to 0 (NaN guard, engine parity)") {
    val df = Seq(
      (1L, Array(Float.NaN, 1.0f)),       // NaN poisons the absmax scale
      (2L, Array(Float.PositiveInfinity, 1.0f)), // Inf/Inf = NaN on its own element
      (3L, Array(1.0f, -0.5f))            // finite control
    ).toDF("id", "v")
    val codes = df.select($"id", Quantize.int8Codes($"v").as("c"))
      .orderBy("id").as[(Long, Seq[Int])].collect()
    assert(codes(0)._2 == Seq(0, 0))
    assert(codes(1)._2 == Seq(0, 0))
    assert(codes(2)._2 == Seq(127, -63))
  }

  test("quantized dot ranking approximates float cosine ranking on aligned vectors") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f))
    ).toDF("id", "v")
    val codes = df.select($"id", Quantize.int8Codes($"v").as("c"))
    val q = codes.filter($"id" === 1L).select($"c".as("qc"))
    val scored = codes.crossJoin(q)
      .select($"id",
        aggregate(zip_with($"c", $"qc", (a, b) => a.cast("long") * b.cast("long")),
          lit(0L), (acc, x) => acc + x).as("dot"))
      .orderBy(desc("dot")).as[(Long, Long)].collect()
    assert(scored.map(_._1).toSeq == Seq(1L, 2L, 3L))
  }

  // ------------------------------------------------------------- tokenRarity

  test("token rarity counts corpus frequencies exactly") {
    val df = Seq(
      (1L, "alpha alpha beta"),
      (2L, "alpha gamma"),
      (3L, "zzz")
    ).toDF("id", "text")
    // corpus freq: alpha=3, beta=1, gamma=1, zzz=1
    val out = Relevance.tokenRarity(df, "id", "text", rareThreshold = 1L)
      .orderBy("id").select("n_tokens", "freq_sum", "n_rare").as[(Long, Long, Long)].collect()
    assert(out(0) == ((3L, 7L, 1L))) // 3+3+1; beta rare
    assert(out(1) == ((2L, 4L, 1L))) // 3+1; gamma rare
    assert(out(2) == ((1L, 1L, 1L)))
  }

  // ------------------------------------------------------------ segmentClean

  test("segment clean drops shared segments and preserves unique text") {
    val boiler = "one two three four five six seven eight"
    val df = Seq(
      (1L, s"$boiler unique alpha text here only doc one x"),
      (2L, s"$boiler other beta words appear solely doc two y"),
      (3L, "completely different content with no repeats at all")
    ).toDF("id", "text")
    val out = Dedup.segmentClean(df, "id", "text", segWords = 8, maxDocFreq = 1L)
      .orderBy("id").select("n_segments", "n_dropped", "clean_text")
      .as[(Long, Long, String)].collect()
    assert(out(0) == ((2L, 1L, "unique alpha text here only doc one x")))
    assert(out(1) == ((2L, 1L, "other beta words appear solely doc two y")))
    // untouched doc reconstructs exactly
    assert(out(2) == ((1L, 0L, "completely different content with no repeats at all")))
  }

  test("segment clean stage action rewrites the text column") {
    val ctx = new graft.core.PipelineContext(spark)
    Seq(
      (1L, "a b c d e f g h tail one"),
      (2L, "a b c d e f g h tail two")
    ).toDF("doc_id", "text").createOrReplaceTempView("docs_sc")
    val out = graft.transform.SegmentDedupTransform(
      "sc", "docs_sc", "docs_sc_clean", "doc_id", "text",
      segmentWords = 8, action = "clean")
      .execute(ctx).get
    val rows = out.orderBy("doc_id").select("text").as[String].collect()
    assert(rows.toSeq == Seq("tail one", "tail two"))
  }

  // ------------------------------------------------------------------ Redact

  test("dedupLines keeps first occurrences in order; stats and stage agree") {
    import spark.implicits._
    val df = Seq(
      (1L, "nav\nbody one\nnav\nbody two\nnav\nfooter\nfooter"),
      (2L, "only\nunique\nlines")
    ).toDF("doc_id", "text")
    val stats = LineFilter.lineDedupStats(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(stats(0).getLong(1) == 7 && stats(0).getLong(2) == 4)
    assert(stats(0).getString(3) == "nav\nbody one\nbody two\nfooter")
    assert(stats(1).getLong(1) == 3 && stats(1).getLong(2) == 3)
    df.createOrReplaceTempView("ld_in")
    val stage = graft.transform.LineFilterTransform(
      "ld", "ld_in", "ld_out", "doc_id", "text", action = "dedupLines")
    assert(stage.execute(new graft.core.PipelineContext(spark)).isDefined)
    val cleaned = spark.table("ld_out").orderBy("doc_id")
      .select("text").as[String].collect()
    assert(cleaned(0) == "nav\nbody one\nbody two\nfooter")
  }

  test("redact replaces every PII class and respects URL-before-email order") {
    val df = Seq(
      (1L, "mail a.b+c@corp.example.org now"),
      (2L, "see https://user@host.example/path?q=1 and http://plain.example/x"),
      (3L, "call +1 (415) 555-0100 or +44 20 7946 0958 today"),
      (4L, "host 10.0.12.5 peer 192.168.1.300x version 1.2.3.4000"),
      (5L, "clean text stays byte-identical."),
      (6L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), Redact.redact(col("text")).as("r"))
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(got(0)._2 == "mail <EMAIL> now")
    // the email-shaped userinfo inside the URL is swallowed by <URL>, not
    // split into scheme + <EMAIL>
    assert(got(1)._2 == "see <URL> and <URL>")
    assert(got(2)._2 == "call <PHONE> or <PHONE> today")
    // 192.168.1.300x fails the word boundary; 1.2.3.4000 too
    assert(got(3)._2 == "host <IP> peer 192.168.1.300x version 1.2.3.4000")
    assert(got(4)._2 == "clean text stays byte-identical.")
    assert(got(5)._2 == null)
  }

  test("piiCounts counts raw-text matches per class") {
    val df = Seq((1L, "a@b.co c@d.io at 10.0.0.1 via https://e.f/g call +12345678901")).toDF("doc_id", "text")
    val c = df.select(Redact.piiCounts(col("text")).as("c"))
      .selectExpr("c.n_urls", "c.n_emails", "c.n_phones", "c.n_ips")
      .collect()(0)
    assert((c.getLong(0), c.getLong(1), c.getLong(2), c.getLong(3)) == ((1L, 2L, 1L, 1L)))
  }

  test("redact is a pure narrow projection — zero exchanges over a scan") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val plan = docs.select(Redact.redact(col("text"))).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}


class MojibakeSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.functions.FixMojibakeExpr.fix_mojibake

  private def mangle(s: String) =
    new String(s.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.charset.StandardCharsets.ISO_8859_1)

  private def fixOne(s: String, maxPasses: Int = 3): (String, Int) = {
    val r = Seq(s).toDF("t").select(fix_mojibake(col("t"), maxPasses).as("f"))
      .select("f.*").head()
    (r.getString(0), r.getInt(1))
  }

  test("classic single mojibake: latin-1 misread reverses in one pass") {
    assert(fixOne("cafÃ©") == (("café", 1)))
    // 3-byte em dash (E2 80 94) misread by a LATIN-1 decoder keeps raw C1
    // controls as U+0080/U+0094
    assert(fixOne("a â\u0080\u0094 b") == (("a — b", 1)))
  }

  test("windows-1252 misread uses the punctuation row (right single quote case)") {
    // U+2019 (E2 80 99) misread by a CP1252 decoder: 0xE2, euro (0x80),
    // trademark (0x99)
    assert(fixOne("itâ€™s") == (("it’s", 1)))
    // curly quotes: 0x9C maps to the oe ligature; 0x9D is undefined in
    // cp1252 and stays the raw C1 control — the sloppy-cp1252 map takes
    // both back
    assert(fixOne("â€œqâ€\u009d") == (("“q”", 1)))
  }

  test("double mangling repairs in exactly two passes") {
    val original = "déjà vu — naïve"
    assert(fixOne(mangle(mangle(original))) == ((original, 2)))
    assert(fixOne(mangle(original)) == ((original, 1)))
  }

  test("clean text is a fixed point: ASCII, genuine accents, CJK/emoji, empty") {
    assert(fixOne("plain ascii text.") == (("plain ascii text.", 0)))
    // a lone e-acute followed by ASCII is not valid UTF-8 -> untouched
    assert(fixOne("café au lait") == (("café au lait", 0)))
    // chars above U+00FF outside the cp1252 row block the byte-map entirely
    assert(fixOne("漢字 and 😀") == (("漢字 and 😀", 0)))
    assert(fixOne("") == (("", 0)))
  }

  test("strict UTF-8 validation: overlongs, surrogates, truncation, beyond-max never repair") {
    // C0 80 would be an overlong NUL
    assert(fixOne("À\u0080") == (("À\u0080", 0)))
    // ED A0 80 would decode to the surrogate D800
    assert(fixOne("í \u0080") == (("í \u0080", 0)))
    // truncated lead byte at end of string
    assert(fixOne("abcÃ") == (("abcÃ", 0)))
    // F4 90 80 80 would be above U+10FFFF
    assert(fixOne("ô\u0090\u0080\u0080") == (("ô\u0090\u0080\u0080", 0)))
  }

  test("maxPasses caps the unwinding and reports honestly") {
    val original = "é"
    val threeDeep = mangle(mangle(mangle(original)))
    assert(fixOne(threeDeep, maxPasses = 3) == ((original, 3)))
    assert(fixOne(threeDeep, maxPasses = 1) == ((mangle(mangle(original)), 1)))
  }

  test("round-trip property: repair inverts k-fold mangling on random unicode text") {
    val rnd = new scala.util.Random(1315)
    // the anchor chars are > U+00FF and outside the cp1252 row, so the
    // ORIGINAL can never itself byte-map — repair must stop at exactly k
    val anchors = Array('κ', '漢', '☃')
    val body = "abc déjà ñ — test"
    val cases = (1 to 120).map { _ =>
      val s = (1 to (1 + rnd.nextInt(12))).map(_ => body(rnd.nextInt(body.length))).mkString +
        anchors(rnd.nextInt(anchors.length))
      val k = 1 + rnd.nextInt(2)
      val mangled = (1 to k).foldLeft(s)((acc, _) => mangle(acc))
      (s, k, mangled)
    }
    val out = cases.toDF("orig", "k", "mangled")
      .withColumn("f", fix_mojibake(col("mangled")))
      .select(col("orig"), col("k"), col("f.fixed"), col("f.n_passes"))
      .collect()
    out.foreach { r =>
      assert(r.getString(2) == r.getString(0),
        s"repair failed: '${r.getString(2)}' != '${r.getString(0)}'")
      assert(r.getInt(3) == r.getInt(1), s"passes ${r.getInt(3)} != k ${r.getInt(1)}")
    }
  }

  test("per-line mode repairs mangled lines around a genuine-emoji line; document mode blocks") {
    val mixed = mangle("café crème") + "\nreal emoji 😀 here\n" +
      mangle(mangle("déjà — vu")) + "\n"
    // document mode: the emoji blocks the whole-string byte-map
    assert(fixOne(mixed) == ((mixed, 0)))
    // per-line mode: each line repairs on its own; n_passes = max depth (2);
    // trailing empty line survives the split/join round trip
    val r = Seq(mixed).toDF("t")
      .select(fix_mojibake(col("t"), 3, perLine = true).as("f"))
      .select("f.*").head()
    assert(r.getString(0) == "café crème\nreal emoji 😀 here\ndéjà — vu\n",
      r.getString(0))
    assert(r.getInt(1) == 2)
    // no newline -> per-line ≡ document mode
    val one = Seq(mangle("naïve")).toDF("t")
      .select(fix_mojibake(col("t"), 3, perLine = true).as("f"))
      .select("f.*").head()
    assert(one.getString(0) == "naïve" && one.getInt(1) == 1)
  }

  test("MojibakeTransform mode=line from a config cell; bad mode fails fast") {
    import graft.core.{PipelineConfig, PipelineContext, Runner}
    Seq((1L, mangle("l’été") + "\n漢字 line")).toDF("id", "text")
      .createOrReplaceTempView("mjl_in")
    val hocon =
      """{stages: [
        { type = "MojibakeTransform", name = "fx", inputView = mjl_in,
          outputView = mjl_out, textField = text, mode = line }
      ]}"""
    assert(Runner.run(PipelineConfig.parse(hocon), new PipelineContext(spark)).isDefined)
    val row = spark.table("mjl_out").head()
    assert(row.getAs[String]("text_fixed") == "l’été\n漢字 line")
    assert(row.getAs[Long]("mojibake_passes") == 1L)
    val bad = graft.transform.MojibakeTransform("fx", "mjl_in", "mjl_bad",
      "text", mode = "word")
    val e = intercept[IllegalArgumentException] {
      bad.execute(new PipelineContext(spark))
    }
    assert(e.getMessage.contains("unknown mojibake mode"))
  }

  test("MojibakeTransform repairs from a config cell") {
    import graft.core.{PipelineConfig, PipelineContext, Runner}
    Seq((1L, mangle("café crème")), (2L, "already clean"))
      .toDF("id", "text").createOrReplaceTempView("mj_in")
    val hocon =
      """{stages: [
        { type = "MojibakeTransform", name = "fx", inputView = mj_in,
          outputView = mj_out, textField = text }
      ]}"""
    assert(Runner.run(PipelineConfig.parse(hocon), new PipelineContext(spark)).isDefined)
    val rows = spark.table("mj_out").orderBy("id").collect()
    assert(rows(0).getAs[String]("text_fixed") == "café crème")
    assert(rows(0).getAs[Long]("mojibake_passes") == 1L)
    assert(rows(1).getAs[String]("text_fixed") == "already clean")
    assert(rows(1).getAs[Long]("mojibake_passes") == 0L)
  }

  test("fix_mojibake stays a narrow projection: zero exchanges") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val plan = docs.select(fix_mojibake(col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
