package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom filter as a DataFrame: compact set membership for
  * dedup-against-set and decontamination pre-filters. The missing member of
  * the mergeable-sketch family next to [[SketchStats]] (HLL),
  * [[CmsSketch]] and [[HistSketch]]: a corpus of n keys compresses to an
  * m-bit bitmap (`bits/8` bytes) with NO false negatives and false-positive
  * rate ≈ (1 − e^(−k·n/m))^k — m = 8n bits and k = 5 gives ~2%.
  *
  * Why it matters at 100 TB: "drop every document whose fingerprint is in
  * this blocklist / eval set" is an anti-join whose small side is often too
  * big to broadcast (10^9 fingerprints) — so the big side pays a full
  * shuffle. The Bloom bitmap of those 10^9 keys is ~1 GB at 1% fp (and the
  * PROBED words of a partition far less): broadcast the bitmap, let every
  * big-side partition discard its definite-nots locally, and only the
  * ~fp·|big| maybes reach the exact join ([[antiJoin]] keeps the result
  * EXACT — the filter only prunes, never decides). This is the same
  * runtime-filter idea Spark applies to equi-joins internally, made
  * persistable and incrementally mergeable.
  *
  * Deterministic by construction (the [[CmsSketch]] discipline): hash i of
  * a key sets bit `(h1 + i·h2) mod bits`, with h1/h2 the two unsigned
  * 32-bit halves of ONE md5 — Kirsch–Mitzenmacher double hashing, so k
  * positions cost one string hash, and md5 + hex halves are
  * engine-universal: an external engine reproduces membership bit-for-bit
  * (q149's DuckDB oracle does). Contrast
  * `DataFrameStatFunctions.bloomFilter`, which materializes the bitmap on
  * the DRIVER as a JVM object: not a DataFrame, not storable as a table,
  * not mergeable from stored segments, and murmur-layout-specific.
  *
  * Scale shape: the build is a narrow map (key → k tiny (word, mask) pairs)
  * into ONE map-side-combined `bit_or` shuffle bounded by ceil(bits/64)
  * rows — keys never shuffle whole, and no driver state exists. Segments
  * are plain DataFrames: persist per batch, [[merge]] (word-wise OR — the
  * bitmap is a lattice join) to get the corpus filter without re-reading
  * raw data.
  */
object BloomSketch {

  /** Position of hash function `i` for the packed md5 prefix of a key, by
    * the standard Kirsch–Mitzenmacher double-hashing scheme:
    * `(h1 + i·h2) mod bits`, with h1/h2 the two unsigned 32-bit halves of
    * ONE md5 prefix (the native [[graft.functions.Md5Prefix64Expr]] — no
    * hex round-trip; bit-identical to the conv/substring formulation the
    * q149 oracle uses, parity-pinned). ONE md5 per key serves all `hashes`
    * positions — at 100 TB the probe side pays one string hash per row,
    * not k. h1 + i·h2 < (i+1)·2^32 never overflows a long.
    */
  private def kmPosition(packed: Column, i: Column, bits: Long): Column =
    (shiftrightunsigned(packed, 32) +
      i.cast("long") * packed.bitwiseAND(lit(0xffffffffL))) % bits

  private def md5Packed(key: Column): Column =
    graft.functions.Md5Prefix64Expr.md5_prefix64(key.cast("string"))

  /** Explode each key into its `hashes` bit positions `_p`, keeping `keep`
    * alongside. */
  private def explodedPositions(df: DataFrame, key: Column, bits: Long, hashes: Int,
      keep: Seq[(Column, String)]): DataFrame = {
    // keep-expressions evaluate in the FIRST select (they reference df's
    // columns); later selects refer to them by alias only
    val kept = keep.map { case (_, n) => col(n) }
    df.select(keep.map { case (c, n) => c.as(n) } :+ md5Packed(key).as("_kh"): _*)
      .select(kept :+ col("_kh") :+ explode(array((0 until hashes).map(lit): _*)).as("_i"): _*)
      .withColumn("_p", kmPosition(col("_kh"), col("_i"), bits))
  }

  /** Build the bitmap over `key`. Output schema: (word, bits) — a sparse
    * 64-bit-word table, at most ceil(bits/64) rows regardless of input
    * size (absent words are all-zero).
    */
  def build(df: DataFrame, key: Column, bits: Long = 1L << 22, hashes: Int = 5): DataFrame = {
    require(bits > 0 && hashes > 0, s"bits/hashes must be positive, got $bits/$hashes")
    explodedPositions(df, key, bits, hashes, Seq.empty)
      // a NULL key hashes to a NULL position — drop it rather than emit a
      // garbage NULL-word row (probes of NULL keys read false, matching
      // left-anti semantics: NULL matches nothing)
      .filter(col("_p").isNotNull)
      .select(floor(col("_p") / 64).cast("long").as("word"),
        expr("shiftleft(1L, CAST(_p % 64 AS INT))").as("_mask"))
      .groupBy("word").agg(bit_or(col("_mask")).as("bits"))
  }

  /** Word-wise OR of filter segments (all built with the same bits/hashes —
    * the bitmap is a join-semilattice, so merge-then-probe ≡
    * build-over-the-union).
    */
  def merge(segments: DataFrame): DataFrame =
    segments.groupBy("word").agg(bit_or(col("bits")).as("bits"))

  /** Membership probe: `resultCol` is true iff ALL `hashes` bits of the
    * key are set — false means DEFINITELY absent (no false negatives),
    * true means present-or-collision.
    *
    * Shape: one broadcast hash join PER HASH FUNCTION against the
    * ≤ ceil(bits/64)-row word table (`word` is unique, so row count never
    * changes), then a codegen'd AND over the k bit tests. The probe side
    * stays NARROW end-to-end — no explode (which would multiply the big
    * side ×k) and no re-aggregation shuffle (an explode + `groupBy(row)`
    * formulation was measured 15× slower than a plain anti-join at 400k
    * rows — the groupBy shuffled the entire probe side). A word no build
    * key ever touched is absent from the sparse table and reads "bit
    * unset" via the left join's coalesce.
    */
  def mightContain(sketch: DataFrame, keys: DataFrame, key: Column,
      bits: Long = 1L << 22, hashes: Int = 5,
      resultCol: String = "might_contain"): DataFrame = {
    require(bits > 0 && hashes > 0, s"bits/hashes must be positive, got $bits/$hashes")
    val reserved = (0 until hashes).flatMap(i => Seq(s"_p$i", s"_w$i", s"_m$i", s"_b$i")) :+ "_kh"
    val clash = keys.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"input columns collide with mightContain internals: ${clash.mkString(", ")}")
    // ONE md5 per probe row; each hash function is integer arithmetic on it
    val withKey = keys.withColumn("_kh", md5Packed(key))
    val joined = (0 until hashes).foldLeft(withKey) { (d, i) =>
      d.withColumn(s"_p$i", kmPosition(col("_kh"), lit(i), bits))
        .withColumn(s"_w$i", floor(col(s"_p$i") / 64).cast("long"))
        .withColumn(s"_m$i", expr(s"shiftleft(1L, CAST(_p$i % 64 AS INT))"))
        .join(broadcast(sketch.select(col("word").as(s"_w$i"), col("bits").as(s"_b$i"))),
          Seq(s"_w$i"), "left")
    }
    val set = (0 until hashes)
      .map(i => coalesce(col(s"_b$i").bitwiseAND(col(s"_m$i")) =!= lit(0L), lit(false)))
      .reduce(_ && _)
    joined
      .withColumn(resultCol, set)
      .select(keys.columns.map(col) :+ col(resultCol): _*)
  }

  /** EXACT anti-join (rows of `big` whose `bigKey` appears nowhere in
    * `small`) with a Bloom pre-filter: definite-nots — the overwhelming
    * majority when the sets barely overlap, the decontamination shape —
    * short-circuit past the join entirely; only maybes (true members +
    * ~fp·|big| collisions) reach the exact anti-join against `small`.
    * No false negatives ⇒ every discarded-from-checking row is truly
    * absent ⇒ the union is exactly the anti-join, at a fraction of the
    * join input.
    *
    * Cost shape: `big` is scanned twice (once per branch), both times
    * narrowly — the trade is two cheap scans against shuffling the full
    * corpus into a merge join, which wins whenever shuffle write+read
    * outweighs a scan (always, at the 100 TB blocklist shape this targets).
    */
  def antiJoin(big: DataFrame, bigKey: Column, small: DataFrame, smallKey: Column,
      bits: Long = 1L << 22, hashes: Int = 5): DataFrame = {
    // pin the bitmap: both union branches broadcast it, and a pinned
    // ≤ bits/64-row frame materializes once instead of re-aggregating
    // `small` per branch
    val sketch = graft.core.Lineage.pin(build(small, smallKey, bits, hashes))
    val flagged = mightContain(sketch, big, bigKey, bits, hashes, "_mc")
    val definiteNot = flagged.filter(!col("_mc")).drop("_mc")
    val maybe = flagged.filter(col("_mc")).drop("_mc")
    val checked = maybe.join(small.select(smallKey.cast("string").as("_sk")),
      bigKey.cast("string") === col("_sk"), "left_anti")
    definiteNot.unionByName(checked)
  }
}
