package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding retrieval — the compression step
  * past SQ8 ([[Quantize]]): split each `dim`-vector into `m` subvectors of
  * `dim/m` dims, learn a `ksub`-centroid KMeans codebook PER subspace, and
  * store each vector as `m` small codes (one byte each at ksub ≤ 256). The
  * corpus shrinks from 4·dim bytes/vector to m bytes/vector — 32× at
  * dim=64, m=8 — and approximate scoring never touches the float vectors:
  *
  *   dot(q, x) ≈ Σ_j LUT_q[j][code_j(x)]   (asymmetric distance, ADC)
  *
  * where `LUT_q[j][c] = dot(q_subj, codebook[j][c])` is a per-QUERY m×ksub
  * lookup table computed once from the float query (faiss `PQm` / ADC).
  *
  * Scale shape: codebooks train on a deterministic hash-sample (a few
  * hundred vectors per centroid — the [[IvfIndex.write]] discipline;
  * training never scans the corpus more than the one sampling pass);
  * encoding is a narrow codegen'd projection (argmin per subspace via the
  * same `array_sort`-of-structs trick as [[Similarity.rankedCentroidLists]],
  * zero shuffles); ADC scoring is `m` array lookups per candidate over the
  * codes column only; the float vectors are read for just the
  * `shortlistFactor × k` rescore candidates per query via broadcast joins.
  * Codebooks ship as broadcast DATA (single-row cross join, the
  * attachCentroidData pattern) — m×ksub×dsub literals would blow the
  * codegen constant pool at real sizes (m=16, ksub=256).
  *
  * Exactness contract (PqSpec + q155 pin): the rescore pass recomputes TRUE
  * cosine, so with a shortlist covering every candidate the result equals
  * [[Similarity.bruteForceTopK]] bit-for-bit — only the candidate ORDER
  * entering the shortlist is approximate, never a returned score.
  */
object Pq {

  /** One codebook entry: subspace, code id, 0.5·‖c‖² (for encode argmin),
    * centroid. */
  final case class CodebookEntry(sub: Int, code: Int, halfNorm: Double, vec: Seq[Float])

  /** Train per-subspace KMeans codebooks on a hash-sample of the corpus.
    * `dim % m == 0`; sample size targets `samplePerCode × ksub` vectors
    * (deterministic [[Sampling.hashSample]], so retraining on the same
    * corpus yields the same codebooks). The sampled slices are persisted
    * once so the `m` KMeans fits don't rescan the source.
    */
  def trainCodebooks(corpus: DataFrame, idCol: String, vecCol: String, dim: Int,
      m: Int = 8, ksub: Int = 16, seed: Long = 42L,
      samplePerCode: Int = 256): Seq[CodebookEntry] = {
    require(m > 0 && dim % m == 0, s"dim ($dim) must be divisible by m ($m)")
    require(ksub > 1, s"ksub must be > 1, got $ksub")
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val dsub = dim / m
    val target = samplePerCode.toLong * ksub
    val n = corpus.count()
    val src =
      if (n > target) Sampling.hashSample(corpus, col(idCol), target.toDouble / n, salt = "pq-train")
      else corpus
    val slices = src.select((0 until m).map(j =>
      array_to_vector(slice(col(vecCol), j * dsub + 1, dsub).cast("array<double>"))
        .as(s"_f$j")): _*)
      .persist()
    try {
      slices.count() // materialize once; the m fits below reuse the cache
      (0 until m).flatMap { j =>
        val model = new KMeans().setK(ksub).setSeed(seed + j).setMaxIter(10)
          .setFeaturesCol(s"_f$j").fit(slices)
        model.clusterCenters.zipWithIndex.map { case (c, i) =>
          CodebookEntry(j, i, 0.5 * c.dot(c), c.toArray.map(_.toFloat).toSeq)
        }
      }
    } finally slices.unpersist()
  }

  /** Codebooks as broadcast data: `_cb` = array indexed by subspace of
    * array of (halfNorm, code, vec) structs, attached to every row via a
    * broadcast single-row cross join (data, not plan constants).
    */
  private[llm] def attachCodebooks(df: DataFrame, cbs: Seq[CodebookEntry]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bySub: Seq[Seq[(Double, Int, Seq[Float])]] =
      cbs.groupBy(_.sub).toSeq.sortBy(_._1)
        .map(_._2.sortBy(_.code).map(e => (e.halfNorm, e.code, e.vec)))
    val cbDf = Seq(Tuple1(bySub)).toDF("_raw")
      .select(transform(col("_raw"), sub =>
        transform(sub, c =>
          struct(c.getField("_1").as("halfNorm"), c.getField("_2").as("code"),
            c.getField("_3").as("vec")))).as("_cb"))
    df.crossJoin(broadcast(cbDf))
  }

  /** PQ codes of `vec`: per subspace j, argmin_c ‖x_subj − c‖² via the
    * 0.5‖c‖² − x·c half-norm trick, ties to the lowest code id (struct
    * sort). Returns array<int> of length m. Narrow and codegen-friendly —
    * encoding a corpus is one scan.
    */
  private[llm] def pqCodes(vec: Column, cbCol: Column, m: Int, dsub: Int): Column =
    transform(sequence(lit(0), lit(m - 1)), j =>
      element_at(
        array_sort(transform(element_at(cbCol, j + 1), c =>
          struct(
            (c.getField("halfNorm") -
              Similarity.dot(slice(vec, j * lit(dsub) + 1, lit(dsub)), c.getField("vec"))).as("d"),
            c.getField("code").as("code")))),
        1).getField("code"))

  /** Per-query ADC lookup table: LUT[j][c] = dot(q_subj, codebook[j][c]),
    * an m×ksub array<array<double>> computed once per query row. */
  private[llm] def adcLut(qv: Column, cbCol: Column, m: Int, dsub: Int): Column =
    transform(sequence(lit(0), lit(m - 1)), j =>
      transform(element_at(cbCol, j + 1), c =>
        Similarity.dot(slice(qv, j * lit(dsub) + 1, lit(dsub)), c.getField("vec"))))

  /** ADC approximate dot product: Σ_j LUT[j][codes[j]]. */
  private[llm] def adcDot(codes: Column, lut: Column): Column =
    aggregate(
      zip_with(codes, lut, (c, row) => element_at(row, c + 1)),
      lit(0.0), (acc, x) => acc + x)

  /** Encode a corpus: (id, codes[m], vnorm). The stored norm turns the ADC
    * dot into an approximate cosine at query time without touching floats.
    */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
      cbs: Seq[CodebookEntry], dim: Int, m: Int): DataFrame = {
    require(m > 0 && dim % m == 0, s"dim ($dim) must be divisible by m ($m)")
    attachCodebooks(corpus, cbs)
      .select(col(idCol).as("id"),
        pqCodes(col(vecCol), col("_cb"), m, dim / m).as("codes"),
        Similarity.norm(col(vecCol)).as("vnorm"))
  }

  /** Top-k cosine retrieval with a PQ/ADC shortlist and exact float
    * rescore. Approximate cosine = adcDot / (‖q‖·vnorm) ranks candidates
    * from codes alone; the `shortlistFactor × k` survivors per query are
    * rescored with true cosine (same scoring and (score desc, neighbor_id)
    * tiebreak as [[Similarity.bruteForceTopK]]). Both top-k passes are
    * salted ([[graft.operators.TopK.perKeySalted]]) so no single task ever
    * sorts one query's full candidate set.
    */
  def pqTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      dim: Int, k: Int, m: Int = 8, ksub: Int = 16,
      shortlistFactor: Int = 4, seed: Long = 42L,
      samplePerCode: Int = 256,
      codebooks: Option[Seq[CodebookEntry]] = None): DataFrame = {
    require(k > 0 && shortlistFactor > 0,
      s"k/shortlistFactor must be positive, got $k/$shortlistFactor")
    val dsub = dim / m
    // precomputed codebooks let repeated query batches skip the m KMeans
    // fits (the persistent path is [[IvfIndex]] with pqSubspaces > 0)
    val cbs = codebooks.getOrElse(
      trainCodebooks(corpus, corpusId, corpusVec, dim, m, ksub, seed, samplePerCode))
    val coded = encode(corpus, corpusId, corpusVec, cbs, dim, m)
      .select(col("id").as("neighbor_id"), col("codes"), col("vnorm"))
    val q = attachCodebooks(
      queries.select(col(queryId).as("query_id"), col(queryVec).as("_qv")),
      cbs)
      .select(col("query_id"), col("_qv"),
        adcLut(col("_qv"), col("_cb"), m, dsub).as("_lut"),
        Similarity.norm(col("_qv")).as("_qnorm"))
    // shortlist pass: codes column only — the query side (with its LUTs)
    // broadcasts; the corpus codes stream through narrow and unshuffled
    val approx = coded
      .crossJoin(broadcast(q.select(col("query_id"), col("_lut"), col("_qnorm"))))
      .select(col("query_id"), col("neighbor_id"),
        coalesce(
          adcDot(col("codes"), col("_lut")) / nullif(col("_qnorm") * col("vnorm"), lit(0.0)),
          lit(0.0)).as("_adc"))
    val short = graft.operators.TopK
      .perKeySalted(approx, Seq("query_id"), "_adc", k * shortlistFactor,
        descending = true, tiebreak = Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
    // exact rescore: float vectors of the shortlist only
    val rescored = corpus
      .select(col(corpusId).as("neighbor_id"), col(corpusVec).as("_cv"))
      .join(broadcast(short), Seq("neighbor_id"))
      .join(broadcast(q.select(col("query_id"), col("_qv"))), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(col("_qv"), col("_cv")).as("score"))
    graft.operators.TopK.perKeySalted(rescored, Seq("query_id"), "score", k,
      descending = true, tiebreak = Seq("neighbor_id"))
  }
}
