package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact cross-document repeated-substring removal — the substring-level
  * complement to [[Dedup]]'s whole-doc and [[Chunking.cdcDupStats]]'
  * near-dup chunk passes: training pipelines also cut VERBATIM runs of
  * ≥ k tokens shared across documents (the public suffix-array dedup
  * method of Lee et al. 2021, "Deduplicating Training Data Makes Language
  * Models Better"), because a boilerplate paragraph repeated across a
  * thousand pages is memorization fuel even when every page is unique.
  *
  * Spark shape (window-hash formulation of the suffix method — same
  * duplicated-substring set, no giant suffix array):
  *
  *  1. Narrow projection: whitespace-normalize, split, build every
  *     k-token window's md5 IN the row (`transform` over indices — no
  *     shuffle, no per-doc window function), then explode only
  *     (doc, pos, hash). The text itself never travels.
  *  2. ONE pass keyed on hash (min-over-window): a window is duplicated
  *     when it occurs in ≥ 2 distinct documents; the keeper is min(doc)
  *     — deterministic min-doc attribution, so exactly one document
  *     keeps each shared run. An occurrence is marked iff its doc is
  *     not the min over its hash, which needs one exchange and ONE
  *     generation of the grams (the former aggregate+join-back shape
  *     generated them twice).
  *  3. Non-keeper window starts explode to their k covered token
  *     positions (dup-volume-bounded, factor k on marked windows only),
  *     collapse to one small sorted position array per document, and
  *     join back — ONE row per affected doc.
  *  4. Reconstruction is narrow again: kept tokens filter by index
  *     against the position array; spans (maximal runs of removed
  *     positions) count by integer gap arithmetic.
  *
  * Everything is md5/integer-exact, so a SQL oracle reproduces spans and
  * cleaned text byte-for-byte (the q180 contract).
  */
object SpanDedup {

  /** Whitespace-normalized token array of `text` (Java `\s+`, empties
    * dropped) — THE token/offset space all span arithmetic lives in.
    * NULL text normalizes to an empty array (n_tokens=0, empty
    * clean_text) — a null array would otherwise poison every downstream
    * size()/token count. */
  private[llm] def tokArr(text: Column): Column =
    filter(split(trim(coalesce(text, lit(""))), "\\s+"), t => length(t) > 0)

  /** Gram-key modes. `md5` (32-char hex string) is cross-engine exact —
    * the oracle queries reproduce it in DuckDB byte-for-byte. `xxhash64`
    * (8-byte long) is the SCALE mode: the (doc,pos,hash) explode is this
    * operator's entire shuffle, and the hex key is ~4× wider than the
    * 8-byte one — at 100 TB that is the difference between shuffling
    * ~0.3× and ~1.2× the corpus size. A 64-bit collision merely marks one
    * extra window as duplicated (removes ≤ k extra tokens), the standard
    * hash-dedup trade; SpanDedupSpec pins both modes identical on real
    * text. */
  val HashModes: Set[String] = Set("md5", "xxhash64")

  /** Every k-window's hash over the in-row token array — empty for docs
    * shorter than k tokens (a bare `sequence(0, size-k)` would run
    * BACKWARDS for them and fabricate windows). */
  private[llm] def windowHashes(arr: Column, k: Int, hashMode: String): Column = {
    require(HashModes(hashMode), s"hashMode must be one of ${HashModes.mkString("|")}, got $hashMode")
    hashMode match {
      case "md5" =>
        when(size(arr) >= k,
          transform(sequence(lit(0), size(arr) - k),
            i => md5(concat_ws(" ", slice(arr, i + 1, lit(k))))))
          .otherwise(array().cast("array<string>"))
      case "xxhash64" =>
        when(size(arr) >= k,
          transform(sequence(lit(0), size(arr) - k),
            i => xxhash64(concat_ws(" ", slice(arr, i + 1, lit(k))))))
          .otherwise(array().cast("array<bigint>"))
    }
  }

  /** Remove every ≥ k-token run shared across ≥ 2 documents from all but
    * the minimum-id document. Output: `idCol` (as doc_id, long) +
    * `n_tokens` (normalized token count) + `n_tokens_removed` + `n_spans`
    * (maximal removed runs) + `clean_text` (kept tokens joined by single
    * spaces — whitespace-normalized by construction).
    *
    * `k` is the minimum duplicated run length in TOKENS; every duplicated
    * run of length ≥ k is covered exactly by its k-windows, so the removed
    * set is precisely the union of duplicated k-windows (the suffix-array
    * method's guarantee).
    */
  def dedupSpans(df: DataFrame, idCol: String, textCol: String, k: Int,
      hashMode: String = "md5"): DataFrame = {
    require(k >= 2, s"k must be >= 2 tokens, got $k")
    val docs = df.select(col(idCol).cast("long").as("doc_id"),
      tokArr(col(textCol)).as("_arr"))
    // (doc, pos, hash) for every k-window — grams built in-row (narrow)
    val grams = docs
      .select(col("doc_id"),
        posexplode(windowHashes(col("_arr"), k, hashMode)).as(Seq("pos", "h")))
    // Shared windows (≥ 2 distinct docs) with min-doc attribution, as ONE
    // window pass: an occurrence is marked iff doc_id ≠ min(doc_id) over
    // its hash — that inequality holds exactly when the hash is seen by
    // ≥ 2 distinct docs AND this doc is not the keeper, so the marked set
    // is identical to the former {groupBy(h) agg + join-back} formulation
    // (SpanDedupSpec + the q180/q184/q188 oracles pin the identity).
    // Plan win (guide §2.4): the gram explode — the operator's dominant
    // per-task compute, every k-window tokenized/sliced/hashed — used to
    // appear TWICE in the physical plan (once under the aggregate, once
    // as the join's probe side) plus a two-exchange count-distinct; now
    // grams generate once and take one exchange on h.
    val marked = grams
      .withColumn("_keeper", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("h")))
      .filter(col("doc_id") =!= col("_keeper"))
      .select(col("doc_id"), col("pos"))
    removeCovered(docs, marked, k)
  }

  /** Within-document repeated-run removal — the same-document half of the
    * suffix-array method: every ≥ k-token run occurring ≥ 2 times INSIDE
    * one document keeps its first occurrence (minimum start position);
    * every later occurrence's windows are excised. Combines with
    * [[dedupSpans]] for the full "no substring of ≥ k tokens appears
    * twice" contract. Output schema identical to [[dedupSpans]].
    *
    * Shape: the (doc, pos, hash) explode + ONE aggregate keyed
    * (doc, hash) — positions only, the text never travels.
    */
  def dedupSpansWithinDoc(df: DataFrame, idCol: String, textCol: String, k: Int,
      hashMode: String = "md5"): DataFrame = {
    require(k >= 2, s"k must be >= 2 tokens, got $k")
    val docs = df.select(col(idCol).cast("long").as("doc_id"),
      tokArr(col(textCol)).as("_arr"))
    val grams = docs
      .select(col("doc_id"),
        posexplode(windowHashes(col("_arr"), k, hashMode)).as(Seq("pos", "h")))
    // same one-pass window formulation as [[dedupSpans]]: pos ≠ min(pos)
    // over (doc, h) holds exactly when the hash repeats within the doc
    // AND this occurrence is not the first — identical marked set to the
    // former {groupBy(doc,h) agg + join-back}, one gram generation.
    val marked = grams
      .withColumn("_first", min(col("pos")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id", "h")))
      .filter(col("pos") =!= col("_first"))
      .select(col("doc_id"), col("pos"))
    removeCovered(docs, marked, k)
  }

  /** Shared reconstruction: covered token positions from the marked window
    * starts (factor k on the duplicated volume only), ONE small sorted
    * array per doc, then a narrow rebuild via the linear merge-walk
    * kernels ([[graft.functions.SpanExpressions]] — the HOF
    * `array_contains`-per-token formulation is O(|arr|·|rem|), quadratic
    * on exactly the fully-duplicated long documents this operator exists
    * for). */
  private[llm] def removeCovered(docs: DataFrame, markedStarts: DataFrame, k: Int): DataFrame = {
    import graft.functions.SpanExpressions.{remove_positions, span_count}
    // no .distinct() before the aggregate: collect_set already
    // deduplicates (map-side via partial aggregation) — an explicit
    // distinct would be a second full exchange of the factor-k rows
    val removed = markedStarts
      .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + (k - 1))).as("p"))
      .groupBy("doc_id")
      .agg(array_sort(collect_set(col("p"))).as("_rem"))
    docs.join(removed, Seq("doc_id"), "left")
      .withColumn("_rem", coalesce(col("_rem"), array().cast("array<int>")))
      .select(
        col("doc_id"),
        size(col("_arr")).cast("long").as("n_tokens"),
        size(col("_rem")).cast("long").as("n_tokens_removed"),
        span_count(col("_rem")).as("n_spans"),
        remove_positions(col("_arr"), col("_rem")).as("clean_text"))
  }

  /** Report-only variant: the duplicated windows themselves — one row per
    * (hash) shared across ≥ 2 docs with its occurrence count, distinct-doc
    * count, and keeper. For corpus forensics (what IS the boilerplate?).
    */
  def repeatedWindows(df: DataFrame, idCol: String, textCol: String, k: Int,
      hashMode: String = "md5"): DataFrame = {
    require(k >= 2, s"k must be >= 2 tokens, got $k")
    val docs = df.select(col(idCol).cast("long").as("doc_id"),
      tokArr(col(textCol)).as("_arr"))
    docs
      .select(col("doc_id"),
        posexplode(windowHashes(col("_arr"), k, hashMode)).as(Seq("pos", "h")))
      .groupBy("h")
      .agg(count(lit(1)).as("n_occurrences"),
        count_distinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("keeper_doc"))
      .filter(col("n_docs") >= 2)
  }
}
