package graft

import org.apache.spark.sql.functions._
import graft.llm.{Decontaminate, Relevance, TextStats}

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private def train = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "completely unrelated content about spark plans"),
    (3L, "short"),
    (4L, "Quick Brown FOX jumps --- over punctuation")
  ).toDF("id", "text")

  private def eval = Seq(
    (100L, "a quick brown fox jumps across")
  ).toDF("id", "text")

  test("overlap flags docs sharing a word n-gram, case/punct-insensitively") {
    val hits = Decontaminate.overlap(train, "id", "text", eval, "text", n = 4)
      .orderBy("id").as[(Long, Long)].collect()
    // 4-grams of eval include "quick brown fox jumps": doc 1 and (after
    // lowercasing + punctuation split) doc 4 contain it; docs 2/3 don't.
    assert(hits.map(_._1).toSeq == Seq(1L, 4L))
    assert(hits.forall(_._2 >= 1L))
  }

  test("clean removes exactly the flagged rows and keeps sub-n-gram docs") {
    val kept = Decontaminate.clean(train, "id", "text", eval, "text", n = 4)
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L, 3L))
  }

  test("hashed and string gram paths agree") {
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val ev = docs.filter(col("doc_id") % 17 === 0)
    val tr = docs.filter(col("doc_id") % 17 =!= 0)
    def rows(hashed: Boolean) =
      Decontaminate.overlap(tr, "doc_id", "text", ev, "text", n = 4, hashed = hashed)
        .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(rows(hashed = true) == rows(hashed = false))
  }

  test("bloom-prefiltered overlap/clean equal the exact paths, even collision-heavy") {
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val ev = docs.filter(col("doc_id") % 17 === 0)
    val tr = docs.filter(col("doc_id") % 17 =!= 0)
    // 512 bits for thousands of eval grams: nearly every probe reads maybe —
    // the exact semi-join must scrub every collision; and a well-sized
    // filter must produce the identical result by the no-false-negatives
    // contract
    for (bits <- Seq(512L, 1L << 20)) {
      val got = Decontaminate.overlapBloom(tr, "doc_id", "text", ev, "text",
          n = 4, bits = bits, hashes = 3)
        .orderBy("doc_id").as[(Long, Long)].collect().toSeq
      val want = Decontaminate.overlap(tr, "doc_id", "text", ev, "text", n = 4)
        .orderBy("doc_id").as[(Long, Long)].collect().toSeq
      assert(got == want, s"overlapBloom(bits=$bits) diverged: ${got.size} vs ${want.size}")
      val keptB = Decontaminate.cleanBloom(tr, "doc_id", "text", ev, "text",
          n = 4, bits = bits, hashes = 3)
        .select("doc_id").as[Long].collect().sorted.toSeq
      val kept = Decontaminate.clean(tr, "doc_id", "text", ev, "text", n = 4)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(keptB == kept, s"cleanBloom(bits=$bits) diverged")
    }
  }

  test("overlap is empty when the eval set shares nothing") {
    val ev = Seq((9L, "zz yy xx ww vv uu")).toDF("id", "text")
    assert(Decontaminate.overlap(train, "id", "text", ev, "text", n = 4).count() == 0L)
  }

  test("randomized corpus: clean and flagged partition the train set exactly") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    def doc() = Seq.fill(6 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val tr = (0L until 200L).map(i => (i, doc())).toDF("id", "text")
    val ev = (1000L until 1015L).map(i => (i, doc())).toDF("id", "text")
    val trainIds = tr.select("id").as[Long].collect().toSet
    val flagged = Decontaminate.overlap(tr, "id", "text", ev, "text", n = 5)
      .select("id").as[Long].collect().toSet
    val cleanIds = Decontaminate.clean(tr, "id", "text", ev, "text", n = 5)
      .select("id").as[Long].collect().toSet
    assert((flagged & cleanIds).isEmpty, "a doc was both flagged and clean")
    assert((flagged | cleanIds) == trainIds, "a doc was neither flagged nor clean")
    // small vocab → 5-gram collisions must actually occur, or the test is vacuous
    assert(flagged.nonEmpty, "randomized corpus produced no overlap; weaken n")
  }
}

class RelevanceSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark spark catalyst plan"),
    (2L, "spark shuffle"),
    (3L, "catalyst expression codegen codegen")
  ).toDF("id", "text")

  test("termCounts and docFreq") {
    val tc = Relevance.termCounts(docs, "id", "text")
    assert(tc.filter($"id" === 1L && $"term" === "spark").select("tf").as[Long].head() == 2L)
    val df = Relevance.docFreq(tc, "id")
    assert(df.filter($"term" === "spark").select("df").as[Long].head() == 2L)
    assert(df.filter($"term" === "codegen").select("df").as[Long].head() == 1L)
  }

  test("vocabulary ranks tokens by count with lexicographic tie-break") {
    val out = Relevance.vocabulary(docs, "text", 3)
      .orderBy("rank").as[(String, Long, Long)].collect()
    // counts: spark 3, catalyst 2, codegen 2 — tie broken catalyst < codegen
    assert(out.toSeq == Seq(("spark", 3L, 1L), ("catalyst", 2L, 2L), ("codegen", 2L, 3L)))
    // k caps the vocabulary
    assert(Relevance.vocabulary(docs, "text", 1).count() == 1)
  }

  test("tfIdfTopK rational: rare terms outrank common ones at equal tf") {
    val top = Relevance.tfIdfTopK(docs, "id", "text", nDocs = 3L, k = 2)
    // doc 2: shuffle (tf=1, df=1, score 3.0) beats spark (tf=1, df=2, 1.5)
    val d2 = top.filter($"id" === 2L).orderBy("rank").select("term").as[String].collect()
    assert(d2.toSeq == Seq("shuffle", "spark"))
    // doc 1: plan (tf=1, df=1) and spark (tf=2, df=2) tie at 3.0 — the
    // lexicographic tiebreak puts plan first, deterministically.
    val d1 = top.filter($"id" === 1L).orderBy("rank").select("term").as[String].collect()
    assert(d1.take(2).toSeq == Seq("plan", "spark"))
  }

  test("tfIdfTopK log variant: repetition outweighs rarity across the knee") {
    // log idf compresses rarity: spark scores 2·(ln(4/3)+1) ≈ 2.58 vs
    // plan 1·(ln(4/2)+1) ≈ 1.69 — the rational-variant tie breaks the other
    // way, which is exactly the semantic difference between the variants.
    val d1 = Relevance.tfIdfTopK(docs, "id", "text", 3L, k = 3, idf = "log")
      .filter($"id" === 1L).orderBy("rank").select("term").as[String].collect()
    assert(d1.take(2).toSeq == Seq("spark", "plan"))
    intercept[IllegalArgumentException](Relevance.tfIdfTopK(docs, "id", "text", 3L, 1, "bogus"))
  }

  test("bm25 ranks the term-dense short doc first and omits non-matching docs") {
    val scored = Relevance.bm25(docs, "id", "text", Seq("spark"), nDocs = 3L, avgdl = 10.0 / 3)
      .orderBy(desc("bm25")).as[(Long, Double)].collect()
    assert(scored.map(_._1).toSeq == Seq(1L, 2L)) // doc 3 has no 'spark'
    assert(scored.forall(_._2 > 0.0))
  }

  test("normalize collapses case, punctuation and whitespace runs") {
    val out = Seq("  The,, QUICK--fox!! ", "the quick fox").toDF("t")
      .select(TextStats.normalize($"t").as("n")).as[String].collect()
    assert(out.toSet == Set("the quick fox"))
  }
}

class MultiContainsSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("canaryHits finds overlapping, repeated, and multi-byte canaries exactly") {
    val canaries = Seq("he", "she", "hers", "café menu", "zzz")
    val docs = Seq(
      (1L, "ushers at the door"),          // "she" at 1, "he" at 2, "hers" at 2
      (2L, "the café menu lists café menu twice"),
      (3L, "nothing of note here"),        // "he" inside "here"
      (4L, "blank")
    ).toDF("id", "text")
    val hits = graft.llm.Decontaminate.canaryHits(docs, "id", "text", canaries)
      .select("id", "canary").as[(Long, String)].collect().toSet
    assert(hits == Set(
      (1L, "he"), (1L, "she"), (1L, "hers"),
      (2L, "he"), (2L, "café menu"),
      (3L, "he")))
  }

  test("matched indices are distinct and ascending; codegen and eval agree") {
    val df = Seq("she sells hers", "").toDF("t")
    val pats = Seq("she", "he", "hers", "s")
    import graft.functions.MultiContainsExpr.multi_contains
    val out = df.select(multi_contains(col("t"), pats).as("m"))
      .as[Seq[Int]].collect()
    assert(out(0) == Seq(0, 1, 2, 3) && out(1) == Seq.empty)
    // interpreted eval (direct kernel call) must agree with the plan result
    val aut = graft.functions.AhoCorasick.build(pats)
    val direct = aut.findDistinct(
      org.apache.spark.unsafe.types.UTF8String.fromString("she sells hers"))
    assert((0 until direct.numElements()).map(direct.getInt) == Seq(0, 1, 2, 3))
  }

  test("property: automaton matches naive contains for random texts and patterns") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val alpha = Gen.oneOf('a', 'b', 'c', ' ')
    val word = Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, alpha)).map(_.mkString)
    val prop = Prop.forAll(
      Gen.chooseNum(0, 60).flatMap(n => Gen.listOfN(n, alpha)).map(_.mkString),
      Gen.listOfN(6, word)) { (text, pats0) =>
      val pats = pats0.distinct
      val aut = graft.functions.AhoCorasick.build(pats)
      val got = {
        val a = aut.findDistinct(org.apache.spark.unsafe.types.UTF8String.fromString(text))
        (0 until a.numElements()).map(a.getInt).toSet
      }
      val want = pats.zipWithIndex.collect { case (p, i) if text.contains(p) => i }.toSet
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("SQL surface: multi_contains over a literal array") {
    graft.udf.Udfs.register(spark)
    val got = spark.sql(
      "SELECT multi_contains('the quick brown fox', array('quick', 'slow', 'own f')) AS m")
      .as[Seq[Int]].head
    assert(got == Seq(0, 2))
  }
}
