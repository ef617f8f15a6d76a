package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Every method here is a pure DataFrame transformation built from codegen'd
  * built-ins (no UDFs, no driver-side loops), so the same code runs unchanged
  * on a 1000-executor cluster:
  *  - exact:   one hash shuffle on the dedup key.
  *  - MinHash: shingle → per-seed min-hash → band → bucket self-join. The LSH
  *    banding bounds the join to same-bucket candidates (never an all-pairs
  *    cross join), the verified Jaccard filter removes false positives.
  *  - SimHash: 64-bit fingerprint via per-bit majority vote over token hashes;
  *    near-dup pairs found by banding the fingerprint into 16-bit chunks
  *    (Hamming distance ≤ 3 ⇒ at least one of 4 chunks equal, by pigeonhole).
  *  - n-gram Jaccard: exact verification used by both LSH paths.
  */
object Dedup {

  /** Exact dedup: keep one row per key — the row with the smallest tiebreaker.
    * One shuffle on `keys`; with AQE skew handling a hot key splits
    * automatically.
    */
  def exact(df: DataFrame, keys: Seq[String], tiebreaker: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tiebreaker))
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** Normalized word tokens. */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "[^\\p{L}\\p{N}]+"), t => length(t) > 0)

  /** Word-level shingles (n-grams of tokens, joined by a space). */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    array_distinct(
      transform(
        TextStats.safeSeq(size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))
      )
    )
  }

  /** MinHash signature: for each seed, min over shingle hashes. Seeds are
    * mixed into the hash by prefixing the shingle — one codegen'd expression,
    * no UDF.
    */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    array((0 until numHashes).map { seed =>
      array_min(transform(shingleCol, s => xxhash64(lit(seed), s)))
    }: _*)

  /** Candidate near-duplicate pairs via MinHash-LSH banding + exact Jaccard
    * verification. Returns (idA, idB, jaccard) with idA < idB.
    *
    * bands × rowsPerBand = signature length; a pair lands in the same bucket
    * for one band with probability ≈ 1-(1-j^r)^b.
    */
  def minhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      threshold: Double = 0.8
  ): DataFrame = {
    val numHashes = bands * rowsPerBand
    // Shingles are hashed to longs immediately: the band join and Jaccard
    // verification then shuffle 8-byte hashes instead of shingle strings
    // (~10× smaller payload at scale; 64-bit collisions are negligible for
    // set-overlap estimation).
    // The repartition is load-bearing: without an exchange, Catalyst collapses
    // the projections and the band-explode below would inline (and recompute)
    // the whole shingle+minhash expression once per band per hash — measured
    // ~60× slowdown. The shuffle materializes (_id, _sh, _sig) exactly once;
    // at cluster scale this exchange also spreads the corpus before the
    // bucket join.
    val hashedShingles =
      array_distinct(transform(shingles(col(textCol), shingleLen), s => xxhash64(s)))
    val withSig = df
      .select(col(idCol).as("_id"), hashedShingles.as("_sh"))
      .filter(size(col("_sh")) > 0)
      .withColumn("_sig", minhashSignature(col("_sh"), numHashes))
      .repartition(col("_id"))
    // explode into (band index, band hash) bucket keys — ids only, the
    // shingle arrays stay out of the band join entirely
    val banded = withSig.select(
      col("_id"),
      posexplode(
        array((0 until bands).map { b =>
          xxhash64(slice(col("_sig"), b * rowsPerBand + 1, rowsPerBand), lit(b))
        }: _*)
      ).as(Seq("_band", "_bucket"))
    )
    val a = banded.select(col("_band"), col("_bucket"), col("_id").as("idA"))
    val b = banded.select(col("_band"), col("_bucket"), col("_id").as("idB"))
    // bucket self-join on (band, bucket): candidates only, 16 bytes per row.
    // Dedup the pair BEFORE fetching arrays — a pair colliding in k bands
    // would otherwise pay the Jaccard k times, and the array payload would
    // ride every shuffle.
    val candidatePairs = a
      .join(b, Seq("_band", "_bucket"))
      .filter(col("idA") < col("idB"))
      .select("idA", "idB")
      .distinct()
    val shingleSets = withSig.select(col("_id"), col("_sh"))
    candidatePairs
      .join(shingleSets.select(col("_id").as("idA"), col("_sh").as("_shA")), Seq("idA"))
      .join(shingleSets.select(col("_id").as("idB"), col("_sh").as("_shB")), Seq("idB"))
      .select(col("idA"), col("idB"), jaccard(col("_shA"), col("_shB")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Exact Jaccard similarity of two string arrays (as sets). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = (size(a) + size(b)).cast("double") - inter
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }

  /** Drop near-duplicates found by MinHash-LSH, keeping the smallest id of
    * each candidate pair (single-link, one LSH pass — the standard
    * first-order approximation; full transitive closure would iterate).
    */
  def minhashDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      threshold: Double = 0.8
  ): DataFrame = {
    val losers = minhashPairs(df, idCol, textCol, shingleLen, bands, rowsPerBand, threshold)
      .select(col("idB").as(idCol))
      .distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** 64-bit SimHash fingerprint per document: per-bit majority vote over
    * token hashes. One explode + one groupBy shuffle; the 64 bit-sums are a
    * single vectorized aggregate over `sequence(0,63)`.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(
      col(idCol),
      explode(tokens(col(textCol))).as("_tok")
    )
    val hashed = tok.withColumn("_h", xxhash64(col("_tok")))
    // For each bit j: sum(+1 if bit set else -1); fingerprint bit j = sign>0.
    // Bit positions are compile-time constants, so each vote/assemble step is
    // a plain codegen'd shift — 64 aggregate columns in one groupBy pass.
    val votes = (0 until 64).map { j =>
      sum(when(shiftright(col("_h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"_b$j")
    }
    val bitVotes = hashed.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
    val fingerprint = (0 until 64)
      .map(j => when(col(s"_b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    bitVotes.select(col(idCol), fingerprint.as("simhash"))
  }

  /** Near-duplicate pairs by SimHash Hamming distance ≤ maxDistance, using
    * 16-bit chunk banding (pigeonhole: distance ≤ 3 ⇒ ≥1 of 4 chunks equal).
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDistance: Int = 3
  ): DataFrame = {
    val fp = simhash(df, idCol, textCol)
    val banded = fp.select(
      col(idCol).as("_id"),
      col("simhash"),
      posexplode(
        array((0 until 4).map { c =>
          shiftright(col("simhash"), c * 16).bitwiseAND(0xffffL)
        }: _*)
      ).as(Seq("_chunk", "_key"))
    )
    val a = banded.select(col("_chunk"), col("_key"), col("_id").as("idA"), col("simhash").as("_fpA"))
    val b = banded.select(col("_chunk"), col("_key"), col("_id").as("idB"), col("simhash").as("_fpB"))
    a.join(b, Seq("_chunk", "_key"))
      .filter(col("idA") < col("idB"))
      .select(
        col("idA"),
        col("idB"),
        bit_count(col("_fpA").bitwiseXOR(col("_fpB"))).as("hamming")
      )
      .distinct()
      .filter(col("hamming") <= maxDistance)
  }

  /** Embedding near-duplicate pairs: random-hyperplane LSH buckets (sign bits
    * of dot products with `planes` fixed seeded hyperplanes) then exact cosine
    * within buckets. No cross join: one shuffle on the bucket signature.
    */
  def embeddingNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      planes: Int = 8,
      threshold: Double = 0.95,
      seed: Long = 42L
  ): DataFrame = {
    val sig = Similarity.hyperplaneSignature(col(vecCol), dim, planes, seed)
    val withSig = df.select(col(idCol).as("_id"), col(vecCol).as("_v"), sig.as("_sig"))
    val a = withSig.select(col("_sig"), col("_id").as("idA"), col("_v").as("_vA"))
    val b = withSig.select(col("_sig"), col("_id").as("idB"), col("_v").as("_vB"))
    a.join(b, Seq("_sig"))
      .filter(col("idA") < col("idB"))
      .select(col("idA"), col("idB"), Similarity.cosine(col("_vA"), col("_vB")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
