package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus relevance statistics: term/document frequencies, TF-IDF top terms
  * per document, and BM25 scoring against a term set — the ranking/feature
  * layer a training-data pipeline uses for quality weighting, keyword
  * extraction and topic bucketing (alongside TextStats' quality signals).
  *
  * Scale shape: one explode of normalized tokens feeds BOTH aggregations —
  * per-(doc, term) counts (shuffle keyed by doc+term, map-side combinable)
  * and document frequencies (distinct-per-doc terms, shuffle keyed by term).
  * Document text never enters a shuffle; terms could travel hashed exactly
  * as in [[Decontaminate]], kept as strings here because the term itself IS
  * the output.
  *
  * IDF variants:
  *   - `rational` — N/df, every step an IEEE-754 double op (exact-rounded,
  *     bit-identical across engines) → the ORACLE-CHECKED variant (q91).
  *   - `log` — ln((N+1)/(df+1)) + 1, the textbook smoothing. `ln` is
  *     correctly-rounded on the JVM but NOT guaranteed so in every SQL
  *     engine, so this variant is spec-tested (monotonicity + hand values)
  *     rather than oracle-hashed.
  */
object Relevance {

  /** (idCol, term, tf) — term frequency per document; tokens lowercased and
    * split on non-alphanumerics (same normalization as [[Decontaminate]]).
    */
  def termCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
        col(idCol),
        explode(filter(split(lower(col(textCol)), "[^a-z0-9]+"), t => t =!= lit(""))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).cast("long").as("tf"))

  /** (term, df) — number of documents containing each term. Built from
    * termCounts, so the explode output is shuffled once on (doc, term) and
    * the df aggregation runs over the already-distinct pairs.
    */
  def docFreq(termCounts: DataFrame, idCol: String): DataFrame =
    termCounts.groupBy(col("term")).agg(count(lit(1)).cast("long").as("df"))

  /** Global vocabulary: the top-k tokens corpus-wide with total counts and a
    * dense 1-based rank (ties broken lexicographically — deterministic).
    * Tokenization is a raw single-space split (the corpus-count view of the
    * text, matching [[Dedup.segmentDupStats]]), not the lowercased term
    * normalization above.
    *
    * Shape at scale: explode → ONE shuffle on token for the partial+final
    * count (map-side combine collapses each partition's repeats first, so
    * the exchange carries ≈ distinct-tokens-per-partition rows, not corpus
    * tokens), then a top-k sort over the distinct-token table only. The
    * final global sort-limit runs on |vocab| rows, not |corpus| — Spark
    * plans it as TakeOrderedAndProject, no single-partition sort of data.
    */
  def vocabulary(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val counts = df
      .select(explode(filter(split(col(textCol), " "), t => t =!= lit(""))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).cast("long").as("n"))
    counts
      .orderBy(col("n").desc, col("token"))
      .limit(k)
      // Global (unpartitioned) Window: safe ONLY because it runs after
      // limit(k) — at most k rows pass through the single partition. Do not
      // copy this shape onto unbounded data; use GlobalOrder instead.
      .withColumn("rank",
        row_number().over(Window.orderBy(col("n").desc, col("token"))).cast("long"))
  }

  /** Top-k terms per document by TF-IDF. Returns
    * (idCol, term, tf, df, score, rank); ties broken lexicographically so
    * results are deterministic. `nDocs` is passed by the caller (it is a
    * corpus constant — computing it inline would add a count() barrier).
    */
  def tfIdfTopK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      nDocs: Long,
      k: Int,
      idf: String = "rational"
  ): DataFrame = {
    val tc = termCounts(df, idCol, textCol)
    val dfreq = docFreq(tc, idCol)
    val score = idf match {
      // (tf * N) / df: tf*N is exact in double far beyond any real tf, the
      // single division is exact-rounded — bit-identical across engines.
      case "rational" => col("tf").cast("double") * lit(nDocs.toDouble) / col("df").cast("double")
      case "log" =>
        col("tf").cast("double") *
          (log((lit(nDocs.toDouble) + 1.0) / (col("df").cast("double") + 1.0)) + 1.0)
      case other => throw new IllegalArgumentException(s"unknown idf variant '$other'")
    }
    val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("term"))
    tc.join(dfreq, Seq("term"))
      .withColumn("score", score)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("score"), col("rank"))
  }

  /** Token-rarity profile per document against corpus-wide frequencies — a
    * language-model-free proxy for the "perplexity filter" stage of published
    * pipelines (CCNet, RefinedWeb): documents dominated by tokens the corpus
    * has barely seen are gibberish/OCR noise; documents made ONLY of
    * ultra-common tokens are boilerplate. Returns
    * (idCol, n_tokens, freq_sum, n_rare, rare_frac) where `freq_sum` is the
    * exact integer sum of each token occurrence's corpus frequency (mean
    * corpus frequency = freq_sum / n_tokens) and `n_rare` counts occurrences
    * of tokens appearing ≤ `rareThreshold` times corpus-wide.
    *
    * Everything except the final `rare_frac` division is integer arithmetic —
    * order-independent, partition-layout-proof, oracle-exact.
    *
    * Scale shape: the explode is shuffled ONCE on (doc, term) into per-doc
    * term counts; corpus frequencies aggregate from those distinct pairs
    * (map-side combinable); the frequency join is keyed by term — per-key
    * fan-out is documents-carrying-the-term, weight is two longs (text never
    * shuffles). The per-doc rollup then combines counts, not occurrences.
    */
  def tokenRarity(
      df: DataFrame,
      idCol: String,
      textCol: String,
      rareThreshold: Long = 2L): DataFrame = {
    val tc = termCounts(df, idCol, textCol)
    val corpusFreq = tc.groupBy(col("term")).agg(sum(col("tf")).cast("long").as("_cf"))
    tc.join(corpusFreq, Seq("term"))
      .groupBy(col(idCol))
      .agg(
        sum(col("tf")).cast("long").as("n_tokens"),
        sum(col("tf") * col("_cf")).cast("long").as("freq_sum"),
        sum(when(col("_cf") <= rareThreshold, col("tf")).otherwise(0L)).cast("long").as("n_rare"))
      .withColumn("rare_frac", col("n_rare").cast("double") / col("n_tokens").cast("double"))
  }

  /** BM25 score of each document against a set of query terms:
    * sum over query terms of idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)).
    *
    * `avgdl` is passed in like nDocs (corpus constants; q91's oracle derives
    * them in a CTE). Documents matching no query term are omitted — at
    * corpus scale the semi-join on the (tiny, broadcast) query-term set
    * prunes the scoring join to matching (doc, term) pairs only.
    */
  def bm25(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      nDocs: Long,
      avgdl: Double,
      k1: Double = 1.2,
      b: Double = 0.75,
      idf: String = "rational"
  ): DataFrame = {
    val tc = termCounts(df, idCol, textCol)
    val dl = tc.groupBy(col(idCol)).agg(sum(col("tf")).cast("long").as("_dl"))
    val dfreq = docFreq(tc, idCol)
    val idfCol = idf match {
      case "rational" => lit(nDocs.toDouble) / col("df").cast("double")
      case "log" =>
        log((lit(nDocs.toDouble) - col("df").cast("double") + 0.5) /
          (col("df").cast("double") + 0.5) + 1.0)
      case other => throw new IllegalArgumentException(s"unknown idf variant '$other'")
    }
    val tfD = col("tf").cast("double")
    val term = idfCol * (tfD * (k1 + 1.0)) /
      (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * col("_dl").cast("double") / lit(avgdl)))
    // Deterministic summation: double addition is order-sensitive, and a
    // plain sum() accumulates in partition-arrival order — bitwise results
    // would vary across reruns/retries. Contributions are instead folded in
    // term-lexicographic order (sort_array on (term, contrib) structs, then
    // a left fold from 0.0) — reproducible at any scale, and exactly
    // mirrorable by the oracle (`list_reduce(list(c ORDER BY term), ...)`).
    // Bounded state: at most |queryTerms| entries per document.
    tc.filter(col("term").isInCollection(queryTerms))
      .join(dfreq, Seq("term"))
      .join(dl, Seq(idCol))
      .groupBy(col(idCol))
      .agg(
        aggregate(
          sort_array(collect_list(struct(col("term"), term.as("_c")))),
          lit(0.0),
          (acc, x) => acc + x.getField("_c")).as("bm25"))
  }
}
