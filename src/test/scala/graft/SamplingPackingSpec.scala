package graft

import org.apache.spark.sql.functions._
import graft.llm.{Packing, Sampling}

class SamplingPackingSpec extends SparkSpec {

  private lazy val docs = {
    spark.read.parquet(s"${sf()}/documents.parquet")
  }

  test("hashSample: deterministic, near the target rate, and aligned across tables") {
    val a = Sampling.hashSample(docs, col("doc_id"), 0.2, "s1").select("doc_id")
    val b = Sampling.hashSample(docs, col("doc_id"), 0.2, "s1").select("doc_id")
    val idsA = a.collect().map(_.getLong(0)).toSet
    assert(idsA == b.collect().map(_.getLong(0)).toSet) // retry-stable
    val n = docs.count().toDouble
    assert(math.abs(idsA.size / n - 0.2) < 0.05, s"rate off: ${idsA.size / n}")
    // same key+salt on a projected "other table" selects the same ids
    val other = docs.select(col("doc_id"), length(col("text")).as("len"))
    val idsC = Sampling.hashSample(other, col("doc_id"), 0.2, "s1")
      .collect().map(_.getLong(0)).toSet
    assert(idsC == idsA)
    // different salt gives a (mostly) different sample
    val idsD = Sampling.hashSample(docs, col("doc_id"), 0.2, "s2")
      .collect().map(_.getLong(0)).toSet
    assert(idsD != idsA)
  }

  test("hashSample: rate 0 keeps nothing, rate 1 keeps all") {
    assert(Sampling.hashSample(docs, col("doc_id"), 0.0).count() == 0)
    assert(Sampling.hashSample(docs, col("doc_id"), 1.0).count() == docs.count())
  }

  test("groupCap: every group at most cap, lowest order keys kept") {
    val orders = spark.read.parquet(s"${sf()}/orders.parquet")
    val capped = Sampling.groupCap(orders, Seq("o_orderpriority"), Seq(col("o_orderkey")), 50)
    val sizes = capped.groupBy("o_orderpriority").count().collect()
    assert(sizes.nonEmpty && sizes.forall(_.getLong(1) <= 50))
    // kept rows are exactly the 50 smallest o_orderkey per priority
    val minKept = capped.groupBy("o_orderpriority").agg(max("o_orderkey").as("mx"))
    val viol = minKept
      .join(orders, Seq("o_orderpriority"))
      .filter(col("o_orderkey") < col("mx"))
      .groupBy("o_orderpriority").count()
      .filter(col("count") > lit(49))
      .count()
    assert(viol == 0)
  }

  test("sliced rank keeps exactly the window-rank set on a 90%-hot group") {
    // Equivalence pin for the hot-group-proof rank: on a skewed input
    // (one group holds 90% of rows), the sliced parallel rank must keep
    // EXACTLY the rows the naive per-group window formulation keeps —
    // same rows, not just same counts — since the oracle SQL is the
    // window formulation.
    import org.apache.spark.sql.expressions.Window
    val skewed = spark.range(0, 2000).select(
      col("id"),
      when(col("id") % 10 < 9, lit("hot")).otherwise((col("id") % 7).cast("string")).as("grp"))
    val got = Sampling.stratifiedExact(skewed, Seq("grp"), col("id"), 0.13, "eq")
      .collect().map(_.getLong(0)).toSet
    val h = md5(concat(col("id").cast("string"), lit("eq")))
    val naive = skewed
      .withColumn("_rn", row_number().over(Window.partitionBy("grp").orderBy(h)))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy("grp")))
      .filter(col("_rn") <= ceil(col("_n") * 0.13))
      .collect().map(_.getLong(0)).toSet
    assert(got == naive,
      s"sliced rank diverges from window rank: extra=${(got -- naive).take(5)}, missing=${(naive -- got).take(5)}")
    assert(got.size == math.ceil(1800 * 0.13).toInt + // hot group
      (0 until 7).map(g => math.ceil((0 until 2000).count(i => i % 10 == 9 && i % 7 == g) * 0.13).toInt).sum)
  }

  test("NULL group values form their own stratum — never silently dropped") {
    import spark.implicits._
    // 40 rows in group "a", 20 with a NULL group: the window formulation
    // treated NULL as its own stratum; the sliced rank must too (a plain
    // equi-join on the group key would drop every NULL-group row).
    val d = (1L to 60L).map(i => (i, if (i <= 40) "a" else null)).toDF("id", "g")
    val got = Sampling.stratifiedExact(d, Seq("g"), col("id"), 0.5, "n")
    val byG = got.groupBy("g").count().collect()
      .map(r => Option(r.getString(0)).getOrElse("NULL") -> r.getLong(1)).toMap
    assert(byG == Map("a" -> 20L, "NULL" -> 10L), s"got $byG")
    // interleave: the permutation covers ALL rows including the NULL group
    val pos = graft.llm.Interleave
      .weightedInterleave(d, "g", Map("a" -> 2.0), 1.0, col("id"))
      .select("pos").collect().map(_.getLong(0)).sorted
    assert(pos.toSeq == (0L until 60L).toSeq, s"permutation lost rows: ${pos.length}/60")
  }

  test("hashSplit: an above-one intermediate cumulative fraction stays in 32 bits") {
    // sum tolerance admits cum fractions a hair above 1; the threshold must
    // clamp to 8 hex chars or the string comparison breaks silently.
    // eps must exceed 0.5/0xffffffff ≈ 1.17e-10 so the unclamped round
    // actually overflows 32 bits (a smaller eps can't trigger the bug)
    val eps = 9e-10
    val got = Sampling.hashSplit(docs, col("doc_id"),
      Seq("a" -> 0.6, "b" -> (0.4 + eps), "c" -> 0.0), "cl")
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.getOrElse("c", 0L) == 0L, s"band c declared 0%% but got $got")
    assert(got("a") > 0 && got("b") > 0, s"bands collapsed: $got")
  }

  test("sliced-rank samplers and interleave handle empty and single-group inputs") {
    val empty = docs.filter(col("doc_id") < 0)
    assert(Sampling.stratifiedExact(empty, Seq("source"), col("doc_id"), 0.5).count() == 0)
    assert(graft.llm.Interleave
      .weightedInterleave(empty, "source", Map.empty, 1.0, col("doc_id")).count() == 0)
    // one group, no weights map: a plain deterministic shuffle — pos is the
    // full permutation
    val one = docs.limit(50).withColumn("only", lit("x"))
    val pos = graft.llm.Interleave
      .weightedInterleave(one, "only", Map.empty, 1.0, col("doc_id"))
      .select("pos").collect().map(_.getLong(0)).sorted
    assert(pos.toSeq == (0L until 50L).toSeq)
  }

  test("hashSplit: total partition, cross-table aligned, first band = hashSample") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val labeled = Sampling.hashSplit(docs, col("doc_id"), splits, "sp")
    val byLabel = labeled.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count()
    assert(byLabel.values.sum == n, "every row must get exactly one label")
    assert(math.abs(byLabel("train") / n.toDouble - 0.8) < 0.06, s"split sizes: $byLabel")
    // the first band keeps exactly the hashSample(0.8) rows — same hash,
    // same threshold, so samples and splits compose consistently
    val trainIds = labeled.filter(col("split") === "train")
      .collect().map(_.getLong(0)).toSet
    val sampleIds = Sampling.hashSample(docs, col("doc_id"), 0.8, "sp")
      .collect().map(_.getLong(0)).toSet
    assert(trainIds == sampleIds)
    // same key+salt on another table assigns the same labels
    val other = docs.select(col("doc_id"), length(col("text")).as("len"))
    val otherTrain = Sampling.hashSplit(other, col("doc_id"), splits, "sp")
      .filter(col("split") === "train").collect().map(_.getLong(0)).toSet
    assert(otherTrain == trainIds)
    // invalid fractions rejected
    intercept[IllegalArgumentException](
      Sampling.hashSplit(docs, col("doc_id"), Seq("a" -> 0.5, "b" -> 0.4)))
  }

  test("weightedInterleave: exact stride mix in every prefix, deterministic permutation") {
    // 20 sources x 25 docs; src0 at 4x, src1 at 2x, rest 1x. The stride
    // schedule admits an EXACT check: the prefix of all rows with virtual
    // time <= 5 holds floor(w*5) rows per source -> 20 + 10 + 18*5 = 120
    // rows with src0=20, src1=10, others=5.
    def run() = graft.llm.Interleave.weightedInterleave(
        docs, "source", Map("src0" -> 4.0, "src1" -> 2.0), 1.0, col("doc_id"), "i")
      .select("pos", "doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    val rows = run()
    assert(rows.map(_._1).toSeq == (0L until rows.length).toSeq, "pos must be a permutation")
    val prefix = rows.take(120).groupBy(_._3).view.mapValues(_.length).toMap
    assert(prefix.size == 20 && prefix.forall { case (s, c) =>
      c == (if (s == "src0") 20 else if (s == "src1") 10 else 5) }, s"prefix mix off: $prefix")
    // retry-stable: the whole permutation reproduces exactly
    assert(run().toSeq == rows.toSeq)
  }

  test("stratifiedExact: exact ceil(n*rate) per stratum, deterministic") {
    val customer = spark.read.parquet(s"${sf()}/customer.parquet")
    val rate = 0.1
    val got = Sampling.stratifiedExact(customer, Seq("c_mktsegment"), col("c_custkey"), rate, "z")
    val bySeg = got.groupBy("c_mktsegment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = customer.groupBy("c_mktsegment").count().collect()
      .map(r => r.getString(0) -> math.ceil(r.getLong(1) * rate).toLong).toMap
    assert(bySeg == want, s"got $bySeg want $want")
    val again = Sampling.stratifiedExact(customer, Seq("c_mktsegment"), col("c_custkey"), rate, "z")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(again == got.select("c_custkey").collect().map(_.getLong(0)).toSet)
  }

  test("weightedHashSample: keep rate tracks the weight, deterministic, clamped") {
    // weight 1 keeps everything, weight 0 nothing (clamping covers >1 / <0)
    assert(Sampling.weightedHashSample(docs, col("doc_id"), lit(5.0)).count() == docs.count())
    assert(Sampling.weightedHashSample(docs, col("doc_id"), lit(-1.0)).count() == 0)
    // constant weight w ≈ hashSample at rate w (same md5, same salt)
    val w = Sampling.weightedHashSample(docs, col("doc_id"), lit(0.2), "s1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val h = Sampling.hashSample(docs, col("doc_id"), 0.2, "s1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(w == h)
    // graded weights: the heavy half must survive more often than the light
    val graded = docs.select(col("doc_id"),
      when(col("doc_id") % 2 === 0, 0.8).otherwise(0.1).as("q"))
    val kept = Sampling.weightedHashSample(graded, col("doc_id"), col("q"), "g")
      .select("doc_id").collect().map(_.getLong(0))
    val (even, odd) = kept.partition(_ % 2 == 0)
    assert(even.length > odd.length * 3, s"even=${even.length} odd=${odd.length}")
  }

  test("mixtureExact: exact per-group counts from the target mix, default applied") {
    val out = Sampling.mixtureExact(docs, "source",
      Map("src0" -> 0.5, "src1" -> 0.25), default = 0.05, key = col("doc_id"), salt = "m")
    val got = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (src, n) =>
      val rate = src match { case "src0" => 0.5; case "src1" => 0.25; case _ => 0.05 }
      val want = math.ceil(n * rate).toLong
      assert(got.getOrElse(src, 0L) == want, s"$src: got ${got.getOrElse(src, 0L)} want $want")
    }
    // deterministic across runs
    val again = Sampling.mixtureExact(docs, "source",
      Map("src0" -> 0.5, "src1" -> 0.25), default = 0.05, key = col("doc_id"), salt = "m")
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet ==
      again.select("doc_id").collect().map(_.getLong(0)).toSet)
    intercept[IllegalArgumentException](
      Sampling.mixtureExact(docs, "source", Map("src0" -> 1.5), 0.1, col("doc_id")))
  }

  test("temperatureSample: kept counts are exactly ceil(sqrt(n)*scale), skew flattened") {
    val out = Sampling.temperatureSample(docs, "lang", scale = 3, key = col("doc_id"), salt = "t")
    val got = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (lang, n) =>
      val want = math.min(n, math.ceil(math.sqrt(n.toDouble) * 3.0).toLong)
      assert(got.getOrElse(lang, 0L) == want, s"$lang: got ${got.getOrElse(lang, 0L)} want $want")
    }
    // α=0.5 flattens the mix: the dominant group's kept SHARE must shrink
    val (bigLang, bigN) = sizes.maxBy(_._2)
    val rawShare = bigN.toDouble / sizes.values.sum
    val keptShare = got(bigLang).toDouble / got.values.sum
    assert(keptShare < rawShare, s"dominant $bigLang share $rawShare -> $keptShare did not shrink")
    // deterministic across runs
    val again = Sampling.temperatureSample(docs, "lang", scale = 3, key = col("doc_id"), salt = "t")
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet ==
      again.select("doc_id").collect().map(_.getLong(0)).toSet)
    intercept[IllegalArgumentException](
      Sampling.temperatureSample(docs, "lang", 0, col("doc_id")))
  }

  test("tokenBudgetSample: kept totals under budget, window parity, append-only budget raise") {
    import spark.implicits._
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val budgets = Map("en" -> 20000L, "fr" -> 8000L)
    val kept = Sampling.tokenBudgetSample(docs, "lang", col("n_chars"),
      budgets, default = 5000L, key = col("doc_id"), salt = "tb")
    // 1. no group exceeds its budget
    val totals = kept.groupBy("lang").agg(sum("n_chars").as("t"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    totals.foreach { case (lang, t) =>
      val b = lang.flatMap(budgets.get).getOrElse(5000L)
      assert(t <= b, s"group $lang kept $t > budget $b")
    }
    // 2. exactly the window formulation's kept set
    import org.apache.spark.sql.expressions.Window
    val h = md5(concat(col("doc_id").cast("string"), lit("tb")))
    val w = Window.partitionBy("lang").orderBy(h)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = docs.withColumn("_c", sum(col("n_chars").cast("long")).over(w))
      .filter(col("_c") <= coalesce(
        element_at(map(lit("en"), lit(20000L), lit("fr"), lit(8000L)), col("lang")),
        lit(5000L)))
      .select("doc_id").as[Long].collect().toSet
    val got = kept.select("doc_id").as[Long].collect().toSet
    assert(got == want, s"diverged from the window formulation: ${got.size} vs ${want.size}")
    // 3. raising one budget only APPENDS to that group's kept set
    val raised = Sampling.tokenBudgetSample(docs, "lang", col("n_chars"),
      budgets + ("en" -> 40000L), default = 5000L, key = col("doc_id"), salt = "tb")
      .select("doc_id").as[Long].collect().toSet
    assert(got.subsetOf(raised), "raising a budget must not evict previously kept rows")
    // 4. a budget of zero keeps nothing from unlisted groups
    val zeroed = Sampling.tokenBudgetSample(docs, "lang", col("n_chars"),
      budgets, default = 0L, key = col("doc_id"), salt = "tb")
    assert(zeroed.filter(!col("lang").isin("en", "fr")).count() == 0)
  }

  test("chunkByTokens: windows, overlap, short docs, and reconstruction") {
    import spark.implicits._
    val df = Seq(
      (1L, (1 to 100).map(i => s"t$i").mkString(" ")), // 100 tokens → 4 chunks at 32/8
      (2L, "a b c"),                                   // shorter than one window
      (3L, (1 to 32).map(i => s"x$i").mkString(" "))   // exactly one window
    ).toDF("id", "text")
    val out = graft.llm.Chunking.chunkByTokens(df, "text", chunkSize = 32, overlap = 8)
      .orderBy("id", "chunk_id").collect()
    val byId = out.groupBy(_.getLong(0))
    assert(byId(1L).length == 4 && byId(1L).head.getLong(2) == 4)
    assert(byId(2L).length == 1 && byId(2L).head.getString(3) == "a b c"
      && byId(2L).head.getLong(4) == 3)
    assert(byId(3L).length == 1 && byId(3L).head.getLong(4) == 32)
    // consecutive chunks share exactly `overlap` tokens at the seam
    val c = byId(1L).map(_.getString(3).split(" ").toSeq)
    (0 until 3).foreach { i =>
      assert(c(i).takeRight(8) == c(i + 1).take(8), s"seam $i overlap broken")
    }
    // stride-aligned reconstruction: drop each chunk's leading overlap
    val rebuilt = (c.head ++ c.tail.flatMap(_.drop(8))).mkString(" ")
    assert(rebuilt == (1 to 100).map(i => s"t$i").mkString(" "))
    // chunk_tokens: full windows then the remainder (100 = 32 + 3*24 → last is 28)
    assert(byId(1L).map(_.getLong(4)).toSeq == Seq(32L, 32L, 32L, 28L))
    intercept[IllegalArgumentException](
      graft.llm.Chunking.chunkByTokens(df, "text", chunkSize = 8, overlap = 8))
  }

  test("chunkByContent: reassembly, length bounds, and edit-local boundary shift") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    def randText(n: Int) = (1 to n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    val t1 = randText(3000) + " café 你好" // multi-byte tail
    val df = Seq((1L, t1)).toDF("id", "text")
    val out = graft.llm.Chunking.chunkByContent(df, "text", minLen = 16, maskBits = 6, maxLen = 256)
      .orderBy("chunk_id").collect()
    val chunks = out.map(_.getString(3))
    // exact reassembly (multi-byte chars never split) and length bounds
    assert(chunks.mkString("") == t1)
    assert(out.forall(_.getLong(4) <= 256))
    assert(out.dropRight(1).forall(_.getLong(4) >= 16), "non-final chunk under minLen")
    assert(chunks.length > 5, s"expected many chunks, got ${chunks.length}")
    // chunk_hash matches xxhash64 of the chunk text
    val h = Seq(chunks.head).toDF("t").select(xxhash64(col("t"))).head.getLong(0)
    assert(out.head.getLong(5) == h)
    // content-defined resync: an insertion near the start must leave the
    // trailing chunks identical (fixed-size chunking would shift them all)
    val t2 = t1.substring(0, 40) + "INSERTED-EDIT" + t1.substring(40)
    val c2 = graft.llm.Chunking.chunkByContent(
      Seq((1L, t2)).toDF("id", "text"), "text", minLen = 16, maskBits = 6, maxLen = 256)
      .orderBy("chunk_id").collect().map(_.getString(3))
    assert(c2.mkString("") == t2)
    val tailShared = chunks.reverse.zip(c2.reverse).takeWhile { case (a, b) => a == b }.length
    assert(tailShared * 2 > chunks.length,
      s"only $tailShared of ${chunks.length} trailing chunks re-synchronized")
    // determinism across evaluations
    val again = graft.llm.Chunking.chunkByContent(df, "text", minLen = 16, maskBits = 6, maxLen = 256)
      .orderBy("chunk_id").collect().map(_.getString(3))
    assert(again.toSeq == chunks.toSeq)
    // pathological content (one repeated char) degrades to maxLen pieces, never unbounded
    val flat = graft.llm.Chunking.chunkByContent(
      Seq((1L, "a" * 2000)).toDF("id", "text"), "text", minLen = 16, maskBits = 6, maxLen = 128)
      .collect()
    assert(flat.forall(_.getLong(4) <= 128))
    assert(flat.map(_.getString(3)).mkString("") == "a" * 2000)
    // SQL surface: cdc_chunks registered for %sql cells
    graft.udf.Udfs.register(spark)
    val viaSql = spark.sql(
      "SELECT cdc_chunks('" + ("ab" * 200) + "', 16, 6, 128) AS c")
      .head.getSeq[String](0)
    assert(viaSql.mkString("") == "ab" * 200)
  }

  test("negativeSample: deterministic, exclusion-respecting, prefix-stable in k") {
    import spark.implicits._
    val corpus = (0L until 200L).map(i => (i, s"src${i % 5}")).toDF("id", "source")
    val queries = corpus.filter(col("id") < 10)
    def run(k: Int) = graft.llm.Sampling.negativeSample(
      queries, col("id"), Seq("id", "source"),
      corpus, col("id"), Seq("id", "source"),
      k = k, poolSize = 50, salt = "t",
      exclude = col("q_id") === col("neg_id") || col("q_source") === col("neg_source"))
      .select("q_id", "neg_id", "neg_rank")
      .as[(Long, Long, Long)].collect().toSet
    val k4 = run(4)
    // every query gets exactly k negatives; no self / same-source pairs
    assert(k4.groupBy(_._1).forall(_._2.size == 4) && k4.groupBy(_._1).size == 10)
    k4.foreach { case (q, n, _) =>
      assert(n != q && n % 5 != q % 5, s"excluded pair ($q, $n) leaked") }
    // determinism + prefix property: k=2 is exactly the rank<=2 subset of k=4
    assert(run(4) == k4)
    assert(run(2) == k4.filter(_._3 <= 2))
    // negatives come only from the hash pool (pool membership is salted md5)
    val pool = graft.llm.Sampling.hashSample(corpus, col("id"), 50.0 / 200, "t-pool")
      .select("id").as[Long].collect().toSet
    assert(k4.forall { case (_, n, _) => pool.contains(n) })
  }

  test("packGreedy matches the sequential reference and respects maxTokens") {
    val maxTokens = 512L
    val withToks = docs
      .filter(col("doc_id") < 1000)
      .select(col("doc_id"), (col("doc_id") % 8).as("shard"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("toks"))
    val packed = Packing.packGreedy(withToks, "shard", "doc_id", "toks", maxTokens)
      .select("shard", "doc_id", "toks", "pack_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // sequential reference per shard
    val ref = packed
      .groupBy(_._1)
      .iterator
      .flatMap { case (_, rows) =>
        var pack = 0L; var fill = 0L; var first = true
        rows.sortBy(_._2).map { case (s, id, tok, _) =>
          if (first) { first = false; fill = tok }
          else if (fill + tok <= maxTokens) fill += tok
          else { pack += 1; fill = tok }
          (s, id) -> pack
        }
      }
      .toMap
    packed.foreach { case (s, id, _, got) =>
      assert(ref((s, id)) == got, s"shard=$s doc=$id: got $got want ${ref((s, id))}")
    }
    // every pack fits, except packs that consist of a single oversized doc
    val byPack = packed.groupBy(p => (p._1, p._4)).values
    byPack.foreach { rows =>
      val tot = rows.map(_._3).sum
      assert(tot <= maxTokens || rows.size == 1, s"overfull multi-doc pack: $rows")
    }
    assert(byPack.exists(_.size > 1), "degenerate: no pack got more than one doc")
  }

  test("packTokenIds: exact windows, tiling spans, and span concatenation reconstructs every doc") {
    import spark.implicits._
    val ctxLen = 64
    // lengths 0..149 cycle: empty docs, docs sharing a window, docs
    // spanning 2-3 windows — every packing shape in one corpus; one doc
    // carries NULL ids (must pack as an empty [bos, eos] doc, not vanish)
    val input = (0L until 200L).map { d =>
      val n = ((d * 7) % 150).toInt
      (d, d % 4, Seq.tabulate(n)(i => d * 1000L + i))
    } :+ ((200L, 0L, null: Seq[Long]))
    val packed = Packing.packTokenIds(
        input.toDF("doc_id", "shard", "ids"),
        "doc_id", "shard", "doc_id", "ids", ctxLen, bosId = 1L, eosId = 2L)
      .collect().map { r =>
        (r.getLong(r.fieldIndex("shard")), r.getLong(r.fieldIndex("seq_id")),
          r.getSeq[Long](r.fieldIndex("ids")),
          r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("doc_spans")))
      }
    // 1. within a shard the windows are 0..k contiguous, all exactly
    // ctxLen except the last
    packed.groupBy(_._1).foreach { case (shard, rows) =>
      val byId = rows.sortBy(_._2)
      assert(byId.map(_._2).toSeq == (0L until byId.length).toSeq, s"shard $shard seq ids")
      byId.dropRight(1).foreach { case (_, sid, ids, _) =>
        assert(ids.length == ctxLen, s"shard $shard seq $sid: ${ids.length}")
      }
      assert(byId.last._3.length <= ctxLen && byId.last._3.nonEmpty)
    }
    // 2. spans tile each window with no gaps or overlaps
    packed.foreach { case (shard, sid, ids, spans) =>
      val s = spans.map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      assert(s.head._2 == 0, s"shard $shard seq $sid: first span starts at ${s.head._2}")
      s.sliding(2).foreach {
        case Seq(a, b) => assert(a._3 == b._2, s"gap/overlap in shard $shard seq $sid")
        case _ =>
      }
      assert(s.last._3 == ids.length, s"shard $shard seq $sid: last span ends at ${s.last._3}")
    }
    // 3. concatenating a doc's spans across windows in stream order
    // reconstructs [bos] ++ ids ++ [eos] exactly — for EVERY doc,
    // including the empty ones
    val rebuilt = scala.collection.mutable.Map.empty[Long, Vector[(Long, Seq[Long])]]
    packed.foreach { case (_, _, ids, spans) =>
      spans.foreach { r =>
        val (docId, st, en, docStart) = (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))
        rebuilt(docId) = rebuilt.getOrElse(docId, Vector.empty) :+
          (docStart, ids.slice(st, en))
      }
    }
    input.foreach { case (d, _, ids) =>
      val got = rebuilt(d).sortBy(_._1).flatMap(_._2)
      val want = 1L +: Option(ids).getOrElse(Seq.empty) :+ 2L
      assert(got == want, s"doc $d: got $got want $want")
    }
    assert(rebuilt.keySet == input.map(_._1).toSet)
  }
}
