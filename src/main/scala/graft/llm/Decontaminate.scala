package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: remove (or flag) training documents that share
  * a word n-gram with an evaluation set — the standard pre-training hygiene
  * pass (GPT-3 §C / PaLM-style 8-gram overlap; reference scope: the
  * training-data operations SURVEY.md lists alongside dedup).
  *
  * Shape, designed for a 100 TB train corpus vs a small-to-medium eval set:
  *   - Both sides tokenize and emit DISTINCT n-grams per document — a narrow
  *     map (`Let`-bound token array, so tokenization runs once per row, not
  *     once per gram).
  *   - Grams travel as 8-byte xxhash64 keys, never as strings: the only
  *     shuffle is an equi-join keyed on a long. Document text stays out of
  *     the shuffle entirely.
  *   - The eval side is distinct-ed first (eval corpora are tiny next to the
  *     train corpus, so the deduped gram set broadcasts; when it doesn't,
  *     AQE falls back to a shuffle join on the same key — both plans are
  *     one-pass over the train grams).
  *   - `left_semi`/`left_anti` joins, so matched train rows are emitted at
  *     most once regardless of how many grams hit.
  *
  * `hashed = false` keeps grams as strings end-to-end — bit-exact (no
  * collision caveat) and directly comparable to a SQL oracle; used by the
  * oracle-checked q90 and the parity spec. At scale, hashed keys shrink the
  * shuffle ~10× for typical gram lengths; a 64-bit collision needs ~2^32
  * distinct grams per band of the birthday bound, far beyond any eval set.
  */
object Decontaminate {

  /** Distinct word n-grams of `text`, lowercased, split on non-alphanumerics
    * (ASCII classes — matches the RE2 semantics a SQL oracle uses).
    */
  def wordGrams(text: Column, n: Int): Column =
    graft.functions.Let.bind(
      filter(split(lower(text), "[^a-z0-9]+"), t => t =!= lit("")),
      toks =>
        array_distinct(
          transform(
            TextStats.safeSeq(size(toks) - (n - 1)),
            i => concat_ws(" ", slice(toks, i, lit(n))))))

  private def gramKeys(text: Column, n: Int, hashed: Boolean): Column = {
    val g = wordGrams(text, n)
    if (hashed) transform(g, x => xxhash64(x)) else g
  }

  /** (id, gram) pairs, distinct per document. */
  private def explodedGrams(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      hashed: Boolean
  ): DataFrame =
    df.select(col(idCol), gramKeys(col(textCol), n, hashed).as("_grams"))
      .filter(size(col("_grams")) > 0)
      .select(col(idCol), explode(col("_grams")).as("_gram"))

  /** The distinct contaminated gram set of the eval corpus (hashed keys). */
  def evalGramSet(eval: DataFrame, textCol: String, n: Int, hashed: Boolean = true): DataFrame =
    eval.select(explode(gramKeys(col(textCol), n, hashed)).as("_gram")).distinct()

  /** Per-train-document contamination report: (idCol, n_matched) for every
    * document sharing at least one n-gram with the eval set. n_matched
    * counts the document's DISTINCT overlapping grams.
    */
  def overlap(
      train: DataFrame,
      idCol: String,
      textCol: String,
      eval: DataFrame,
      evalTextCol: String,
      n: Int = 8,
      hashed: Boolean = true
  ): DataFrame = {
    val trainGrams = explodedGrams(train, idCol, textCol, n, hashed)
    trainGrams
      .join(evalGramSet(eval, evalTextCol, n, hashed), Seq("_gram"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_matched"))
  }

  /** Train rows sharing NO n-gram with the eval set (the decontaminated
    * corpus). One semi-join to find contaminated ids, one anti-join to drop
    * them — the full-width train row never enters the gram shuffle.
    */
  def clean(
      train: DataFrame,
      idCol: String,
      textCol: String,
      eval: DataFrame,
      evalTextCol: String,
      n: Int = 8,
      hashed: Boolean = true
  ): DataFrame = {
    val contaminated = explodedGrams(train, idCol, textCol, n, hashed)
      .join(evalGramSet(eval, evalTextCol, n, hashed), Seq("_gram"), "left_semi")
      .select(col(idCol))
      .distinct()
    train.join(contaminated, Seq(idCol), "left_anti")
  }

  /** [[overlap]] for eval sets too large to broadcast (10^9-gram blocklists):
    * the train gram stream pre-filters against the [[BloomSketch]] bitmap of
    * eval grams — definite-nots, the overwhelming majority of a typical
    * corpus, never reach the semi-join; only true hits + ~fp·|grams|
    * collisions do, and the exact semi-join scrubs the collisions. No false
    * negatives ⇒ the result EXACTLY equals [[overlap]] (spec-pinned). The
    * bitmap is `bits/8` bytes regardless of eval size — broadcastable when
    * the gram set itself is not.
    */
  def overlapBloom(
      train: DataFrame,
      idCol: String,
      textCol: String,
      eval: DataFrame,
      evalTextCol: String,
      n: Int = 8,
      bits: Long = 1L << 26,
      hashes: Int = 5
  ): DataFrame = {
    val evalGrams = evalGramSet(eval, evalTextCol, n, hashed = true)
    val sketch = BloomSketch.build(evalGrams, col("_gram"), bits, hashes)
    val maybes = BloomSketch
      .mightContain(sketch, explodedGrams(train, idCol, textCol, n, hashed = true),
        col("_gram"), bits, hashes, "_mc")
      .filter(col("_mc")).drop("_mc")
    maybes
      .join(evalGrams, Seq("_gram"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_matched"))
  }

  /** [[clean]] at blocklist scale — see [[overlapBloom]]; exactly equals
    * [[clean]] with hashed keys.
    */
  def cleanBloom(
      train: DataFrame,
      idCol: String,
      textCol: String,
      eval: DataFrame,
      evalTextCol: String,
      n: Int = 8,
      bits: Long = 1L << 26,
      hashes: Int = 5
  ): DataFrame =
    train.join(
      overlapBloom(train, idCol, textCol, eval, evalTextCol, n, bits, hashes)
        .select(col(idCol)),
      Seq(idCol), "left_anti")

  /** Exact multi-canary substring search ([[graft.functions.MultiContainsExpr]]):
    * which of the literal `canaries` (benchmark strings, PII canaries,
    * licensed passages) appear VERBATIM in each document. One Aho–Corasick
    * pass per document — O(bytes + hits) regardless of |canaries|, where
    * `k × contains()` would scan every document k times and a 10k-literal
    * regex alternation would crawl. The automaton rides inside the
    * expression (built once per executor), so the scan is a narrow
    * codegen'd projection: no shuffle, no join, streaming-safe.
    *
    * Output: one row per (document, matched canary) —
    * `idCol, canary_id, canary` — empty for clean documents.
    */
  def canaryHits(
      df: DataFrame,
      idCol: String,
      textCol: String,
      canaries: Seq[String]): DataFrame = {
    import graft.functions.MultiContainsExpr.multi_contains
    val canaryLit = array(canaries.map(lit): _*)
    df.select(col(idCol),
        explode(multi_contains(col(textCol), canaries)).as("canary_id"))
      .withColumn("canary", element_at(canaryLit, col("canary_id") + 1))
  }
}
