package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling operators for training-data pipelines.
  *
  * All three are deterministic: re-running the pipeline (or re-running one
  * failed partition, which Spark does silently) yields the same sample —
  * `df.sample()` does not guarantee that across retries, which corrupts
  * train/eval splits. Reference arc-jupyter exposes no sampling stages; these
  * are scale-path extensions shaped for 100 TB:
  * - hash sampling is a narrow map (no shuffle, pushes nothing, scans once);
  * - the exact-count samplers rank via [[rankedByHash]], which splits a hot
  *   group across partitions instead of sorting it in one task — a training
  *   mix where one source holds 90% of the corpus ranks in parallel.
  */
object Sampling {

  /** Per-group hash rank and group size WITHOUT a per-group window over the
    * data. `row_number() OVER (PARTITION BY group ORDER BY h)` puts an
    * entire group through ONE task — with a dominant source (80–90% of a
    * real training mix) that is a guaranteed sort/spill wall at 100 TB.
    *
    * Shape (the [[graft.core.GlobalOrder]] idea, per group): range-partition
    * on (group, h) so a hot group's rows split across MANY partitions in
    * hash order; aggregate per-(partition, group) counts — a tiny table,
    * ≤ #groups + #partitions rows, because each range partition holds a
    * contiguous (group, h) slice; turn counts into each slice's rank offset
    * (a window over the counts TABLE, never the data) and each group's
    * total; broadcast-join those back and add the slice-local row_number.
    * Every window here partitions by (_gp, group) or runs over the bounded
    * counts table — a dominant group sorts in parallel across its slices.
    *
    * Two jobs read the ranged frame (the broadcast of the counts table and
    * the final pass), so it is lineage-pinned ([[graft.core.Lineage.pin]])
    * to guarantee both see the same partitioning.
    *
    * Output: the input columns plus `_rn` (1-based rank of `h` within the
    * group) and `_n` (group size). Ties in `h` rank arbitrarily but count
    * correctly (same contract as a window rank); callers use a unique key.
    */
  private[llm] def rankedByHash(df: DataFrame, groupCols: Seq[String], h: Column): DataFrame =
    slicedPrefix(df, groupCols, h, lit(1L))
      .withColumnRenamed("_cum", "_rn")
      .withColumnRenamed("_tot", "_n")

  /** The generalized slice engine behind [[rankedByHash]] and
    * [[tokenBudgetSample]]: inclusive prefix sum of `w` in `h` order
    * within each group, plus the group total — WITHOUT a per-group window
    * over the data. With `w = 1` the prefix sum IS the rank and the total
    * the group size. Output: the input columns + `_cum` + `_tot`.
    *
    * Ties in `h` accumulate in arbitrary order between the tied rows (the
    * same contract as rankedByHash's rank ties); callers hash a unique key.
    */
  private[llm] def slicedPrefix(df: DataFrame, groupCols: Seq[String], h: Column,
      w: Column): DataFrame = {
    // Group keys travel STRUCT-WRAPPED throughout: struct equality treats a
    // null field as equal to a null field (row-comparison semantics), so a
    // NULL group value is its own stratum — the window formulation this
    // replaces treated it that way, and a plain equi-join on the raw column
    // would silently DROP every NULL-group row. Wrapping (instead of a <=>
    // join condition) keeps ONE key expression across the range partition,
    // the window, and the join, preserving exchange reuse.
    val gks = groupCols.indices.map(i => s"_gk$i")
    val reserved = Set("_h", "_w", "_gp", "_lcum", "_off", "_tot", "_cum", "_c",
      "_rn", "_n") ++ gks
    val clash = df.columns.toSet.intersect(reserved)
    require(clash.isEmpty,
      s"input columns collide with slicedPrefix internals: ${clash.mkString(", ")} — rename them")
    val kcols = gks.map(col)
    val withKeys = groupCols.zip(gks).foldLeft(df) { case (d, (g, k)) =>
      d.withColumn(k, struct(col(g)))
    }
    val ranged = graft.core.Lineage.pin(
      withKeys.withColumn("_h", h).withColumn("_w", coalesce(w.cast("long"), lit(0L)))
        .repartitionByRange(kcols :+ col("_h"): _*)
        .withColumn("_gp", spark_partition_id()))
    val counts = ranged.groupBy(col("_gp") +: kcols: _*).agg(sum("_w").as("_c"))
    val perGroup = Window.partitionBy(kcols: _*)
    val stats = counts
      .withColumn("_off", coalesce(
        sum("_c").over(perGroup.orderBy("_gp").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("_tot", sum("_c").over(perGroup))
      .select(col("_gp") +: kcols :+ col("_off") :+ col("_tot"): _*)
    val sliceW = Window.partitionBy(col("_gp") +: kcols: _*).orderBy(col("_h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // No broadcast hint on the stats join, deliberately: with millions of
    // strata the counts table outgrows any broadcast budget. The windowed
    // side is already hash-partitioned AND sorted on (_gp, _gk*, _h), so a
    // sort-merge join on (_gp, _gk*) reuses that exchange and sort order —
    // zero extra work on the data side — while AQE still promotes the tiny
    // stats side to a runtime broadcast in the common few-groups case.
    ranged
      .withColumn("_lcum", sum("_w").over(sliceW))
      .join(stats, "_gp" +: gks)
      .withColumn("_cum", col("_lcum") + col("_off"))
      .select(df.columns.map(col) :+ col("_cum") :+ col("_tot"): _*)
  }

  /** Keep ~`rate` of rows, chosen by a salted md5 of `key` — deterministic,
    * stable under retries, and consistent ACROSS TABLES: sampling documents
    * and their embeddings with the same key/salt keeps them aligned.
    *
    * Uses the first 8 hex digits (32 bits) of md5: rate resolution 1/2^32.
    */
  def hashSample(df: DataFrame, key: Column, rate: Double, salt: String = ""): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    val threshold = f"${math.round(rate * 0xffffffffL)}%08x"
    df.filter(substring(md5(concat(key.cast("string"), lit(salt))), 1, 8) < lit(threshold))
  }

  /** Deterministic train/val/test split: label every row with the name of
    * the hash band its salted md5 falls into — the canonical split step.
    * `splits` maps labels to fractions summing to 1 (±1e-9); bands are
    * consecutive 32-bit ranges in the listed order, so the first band of a
    * (label, rate) split keeps exactly the rows `hashSample(rate)` keeps.
    *
    * Same discipline as [[hashSample]]: a pure narrow map (no shuffle),
    * retry-stable, and consistent ACROSS TABLES — documents and their
    * embeddings split identically under the same key/salt, so no example
    * ever straddles train and eval. Changing the fraction of one band never
    * reshuffles rows between the OTHER bands (band edges move, interiors
    * stay put).
    */
  def hashSplit(df: DataFrame, key: Column, splits: Seq[(String, Double)],
      salt: String = "", splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0), s"fractions must be >= 0: $splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${splits.map(_._2).sum}")
    val h = substring(md5(concat(key.cast("string"), lit(salt))), 1, 8)
    val cum = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    // upper hex threshold of each band but the last (which is a catch-all:
    // rounding must never leave a row unlabeled); clamped to 32 bits — an
    // intermediate cumulative fraction a hair above 1 (legal under the sum
    // tolerance) would otherwise format to 9 hex chars and break the
    // string comparison
    val label = splits.init.zip(cum.init).foldRight(lit(splits.last._1): Column) {
      case (((name, _), c), other) =>
        val t = math.min(math.round(c * 0xffffffffL), 0xffffffffL)
        when(h < lit(f"$t%08x"), lit(name)).otherwise(other)
    }
    df.withColumn(splitCol, label)
  }

  /** At most `cap` rows per group, keeping the first by `order` — the
    * "no domain may dominate the corpus" guard. One shuffle on `groupCols`.
    * Because `cap` is a LITERAL, Catalyst's InferWindowGroupLimit rewrites
    * the rank filter into a WindowGroupLimit: each map partition keeps at
    * most `cap` rows per group BEFORE the shuffle, so a hot group ships
    * ≤ cap × #partitions rows into its (single-task) final window — bounded
    * by the cap, not the group (PlanSpec pins the rewrite). For caps large
    * enough that cap × #partitions still hurts, pre-filter with hashSample.
    */
  def groupCap(df: DataFrame, groupCols: Seq[String], order: Seq[Column], cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= cap)
      .drop("_rn")
  }

  /** Exact stratified sample: ceil(rate × |stratum|) rows from every stratum,
    * deterministically ordered by the salted hash (so it is an unbiased
    * within-stratum choice, not "first rows win"). Unlike
    * `DataFrameStatFunctions.sampleBy`, counts are exact, small strata are
    * never emptied, and retries reproduce the same rows.
    */
  def stratifiedExact(df: DataFrame, strataCols: Seq[String], key: Column, rate: Double,
      salt: String = ""): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    val h = md5(concat(key.cast("string"), lit(salt)))
    rankedByHash(df, strataCols, h)
      .filter(col("_rn") <= ceil(col("_n") * rate))
      .drop("_rn", "_n")
  }

  /** Keep each row with probability `weight` (a per-row column in [0,1],
    * values outside clamped) — quality-weighted corpus downsampling: rows
    * scored by a quality model survive in proportion to their score, chosen
    * by the same salted md5 as [[hashSample]] so the choice is deterministic,
    * retry-stable, and consistent across tables sharing the key.
    *
    * Still a pure narrow map (no shuffle): the row's 32-bit hash fraction is
    * compared against a per-row 8-hex-digit threshold string derived from
    * the weight. Every arithmetic step (clamp, ×2^32, floor) is exact in
    * IEEE doubles, so a SQL oracle reproduces the sample bit-for-bit.
    */
  def weightedHashSample(df: DataFrame, key: Column, weight: Column, salt: String = ""): DataFrame = {
    val p = least(lit(1.0), greatest(lit(0.0), weight.cast("double")))
    val threshold =
      lpad(lower(hex(floor(p * lit(0xffffffffL.toDouble)).cast("long"))), 8, "0")
    df.filter(substring(md5(concat(key.cast("string"), lit(salt))), 1, 8) < threshold)
  }

  /** Mixture sampling toward a target source distribution: from each group
    * (e.g. each corpus source), keep exactly ceil(frac_g × |group|) rows,
    * with `fracs` giving per-group keep fractions and `default` applying to
    * unlisted groups. The standard "re-weight the data mix" step before
    * training (e.g. upweight curated sources, downsample web crawl).
    *
    * Same shape as [[stratifiedExact]] — the [[rankedByHash]] parallel rank —
    * with the per-group rate resolved from a literal map (groups are few;
    * the map travels with the plan, no join needed).
    */
  /** Per-row rate/weight from a literal (group value → number) map with a
    * default for unlisted groups — shared by [[mixtureExact]] and
    * [[graft.llm.Interleave.weightedInterleave]] so the lookup semantics
    * (string-cast key, sorted literal map, coalesce default) stay in one
    * place.
    */
  private[llm] def groupRate(groupCol: String, fracs: Map[String, Double],
      default: Double): Column =
    if (fracs.isEmpty) lit(default)
    else coalesce(
      element_at(
        map(fracs.toSeq.sortBy(_._1).flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*),
        col(groupCol).cast("string")),
      lit(default))

  def mixtureExact(df: DataFrame, groupCol: String, fracs: Map[String, Double],
      default: Double, key: Column, salt: String = ""): DataFrame = {
    require((fracs.values ++ Seq(default)).forall(f => f >= 0 && f <= 1),
      s"fractions must be in [0,1]")
    val rate = groupRate(groupCol, fracs, default)
    val h = md5(concat(key.cast("string"), lit(salt)))
    rankedByHash(df, Seq(groupCol), h)
      .filter(col("_rn") <= ceil(col("_n") * rate))
      .drop("_rn", "_n")
  }

  /** Temperature-scaled mixture sampling (α = 0.5): keep
    * ceil(scale·√|group|) rows per group, so kept counts are proportional
    * to |group|^α — the standard "flatten the source distribution" step in
    * published training-data mixes (dominant sources downweighted, small
    * sources kept nearly whole). Rows are chosen by the salted-md5 rank,
    * like every sampler here: deterministic, retry-stable.
    *
    * The target is defined as ceil(√n · scale): sqrt and multiply are both
    * correctly-rounded single IEEE ops (n is an exact integer < 2^53), so
    * any engine reproduces the exact kept set — deliberately NOT n^α pow
    * (last bit is libm-dependent) and NOT a normalizing Σ n_g^α (float
    * summation order is engine-dependent; callers wanting a fixed output
    * total pick `scale` ≈ total ⁄ Σ√n_g).
    *
    * Shape at scale: the [[rankedByHash]] parallel rank (which also yields
    * the per-group count — no separate aggregation pass).
    */
  def temperatureSample(df: DataFrame, groupCol: String, scale: Long, key: Column,
      salt: String = ""): DataFrame = {
    require(scale > 0, s"scale must be positive, got $scale")
    val h = md5(concat(key.cast("string"), lit(salt)))
    rankedByHash(df, Seq(groupCol), h)
      .filter(col("_rn") <= least(col("_n"),
        ceil(sqrt(col("_n").cast("double")) * lit(scale.toDouble)).cast("long")))
      .drop("_rn", "_n")
  }

  /** Token-budget mixture: from each group keep rows, in salted-hash order,
    * until the group's cumulative `weight` (a per-row token count — MUST be
    * integer-valued; integer prefix sums are engine-exact where float sums
    * are order-dependent) reaches its budget — the unit real training mixes
    * are specified in ("this source contributes N billion tokens"), where
    * [[mixtureExact]] speaks in row fractions. A row is kept iff the
    * cumulative weight INCLUDING it is ≤ the budget, so the kept total
    * never exceeds the budget (a first row larger than the whole budget is
    * dropped). Deterministic, retry-stable, consistent across tables via
    * (key, salt), and keeping a subset relationship: raising one group's
    * budget only APPENDS rows to that group's kept set.
    *
    * Shape at scale: [[slicedPrefix]] — the rankedByHash slicing
    * generalized to weighted prefix sums. A dominant source accumulates
    * across its range slices in parallel; no per-group window ever sees
    * the data.
    */
  def tokenBudgetSample(df: DataFrame, groupCol: String, weight: Column,
      budgets: Map[String, Long], default: Long, key: Column,
      salt: String = ""): DataFrame = {
    require((budgets.values ++ Seq(default)).forall(_ >= 0), "budgets must be >= 0")
    val h = md5(concat(key.cast("string"), lit(salt)))
    val budget =
      if (budgets.isEmpty) lit(default)
      else coalesce(
        element_at(
          map(budgets.toSeq.sortBy(_._1).flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*),
          col(groupCol).cast("string")),
        lit(default))
    slicedPrefix(df, Seq(groupCol), h, weight)
      .filter(col("_cum") <= budget)
      .drop("_cum", "_tot")
  }

  /** Deterministic negative sampling for contrastive pairs: for every query
    * row, the `k` corpus rows ranking lowest under a salted per-(query,
    * candidate) md5 — excluding candidates where `exclude(query, candidate)`
    * holds (the positive-pair / same-source guard). The standard
    * random-negatives step of contrastive training-data prep, made
    * retry-stable and reproducible: the same (queries, corpus, salt) always
    * yields the same negatives, and changing k only extends each query's
    * list (hash ranking is a fixed total order per query).
    *
    * Shape at scale: the corpus never joins the queries directly — a
    * deterministic [[hashSample]] pool of ~`poolSize` candidates is drawn
    * first (one narrow corpus scan), and each query ranks only that pool
    * (broadcast join, per-query work = pool size, bounded top-k via
    * [[graft.operators.TopK.perKeySalted]]). Negatives are sampled
    * UNIFORMLY from the corpus by construction of the pool hash; the pool
    * indirection trades a vanishing bias (a positive excluded from a
    * 10k-row pool) for never shipping the corpus into a per-query sort.
    * `poolSize` is an expectation — the realized pool varies by a few
    * percent (binomial), which is fine for negatives.
    *
    * `queryCols`/`candCols` name the columns to carry from each side
    * (prefixed `q_` / `neg_` in the output). Output: one row per kept
    * (query, negative): q_* cols, neg_* cols, `neg_rank` (1-based).
    */
  def negativeSample(
      queries: DataFrame, queryKey: Column, queryCols: Seq[String],
      corpus: DataFrame, candKey: Column, candCols: Seq[String],
      k: Int, poolSize: Int, salt: String = "",
      exclude: Column = lit(false),
      corpusCount: Option[Long] = None): DataFrame = {
    require(k > 0 && poolSize > 0, s"k/poolSize must be positive, got $k/$poolSize")
    // The corpus size only shapes the pool RATE (poolSize is an expectation
    // anyway) — pass `corpusCount` (a known cardinality, or
    // [[graft.extract.ParquetMeta.rowCount]]'s footer-exact count for a raw
    // table) to avoid the fallback count(), which is a full-table job per
    // invocation at 100 TB.
    val n = corpusCount.getOrElse(corpus.count())
    require(n >= 0, s"corpusCount must be non-negative, got $n")
    val rate = math.min(1.0, poolSize.toDouble / math.max(1L, n))
    val pool = hashSample(corpus, candKey, rate, salt + "-pool")
      .select(candKey.cast("string").as("_ck") +: candCols.map(c => col(c).as(s"neg_$c")): _*)
    val q = queries.select(
      queryKey.cast("string").as("_qk") +: queryCols.map(c => col(c).as(s"q_$c")): _*)
    // `exclude` is written over the prefixed names (col("q_…"), col("neg_…"))
    def pairs(qs: DataFrame) = qs.crossJoin(broadcast(pool))
      .filter(!exclude)
      .withColumn("_h", md5(concat(col("_qk"), lit(":"), col("_ck"), lit(salt))))
    // EXACT shuffle-shrinking pre-filter: a pair can be in its query's
    // hash-top-k only if its hash prefix is small, so pairs with
    // prefix ≥ t (t sized for ~8·k expected survivors per query) are
    // dropped MAP-SIDE before any shuffle — queries×pool rows are scored
    // but only ~8·k per query travel (measured 70.9 s → 25.7 s at 4k
    // queries × 10k pool — the residual cost is the map-side md5 of every
    // pair, kept deliberately: md5 is what the DuckDB oracle can replicate). Exactness: a query whose k-th smallest hash
    // lands above t has < k survivors; those (vanishingly rare) queries
    // are detected from the survivor counts and re-ranked against the
    // FULL pool, so the result is identical to the unfiltered top-k.
    val tHex = f"${math.min(0xffffffffL, math.round(8.0 * k / math.max(1, poolSize) * 0xffffffffL))}%08x"
    val all = pairs(q)
    val survivors = all.filter(substring(col("_h"), 1, 8) < lit(tHex))
    def rank(df: DataFrame) = {
      val top = graft.operators.TopK.perKeySalted(df, Seq("_qk"), "_h", k,
        descending = false, tiebreak = Seq("_ck"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("_qk")).orderBy(col("_h"), col("_ck"))
      top.withColumn("neg_rank", row_number().over(w).cast("long"))
    }
    // pinned: the ≤ k-per-query ranked frame feeds two jobs (the
    // full-keys count and the final union) — without the pin both would
    // redo the queries×pool scoring pass
    val ranked = graft.core.Lineage.pin(rank(survivors))
    // queries with a full k among survivors are exact; the rest re-rank
    // against every pool candidate (the q side is filtered FIRST, so the
    // fallback join only rebuilds the short queries' pairs)
    val fullKeys = ranked.groupBy("_qk").count().filter(col("count") >= k)
      .select("_qk")
    val shortQs = q.join(fullKeys, Seq("_qk"), "left_anti")
    val fallback = rank(pairs(shortQs))
    // no broadcast hint on fullKeys: it scales with the QUERY count (one
    // string per query) — at millions of queries a forced broadcast is its
    // own hazard; both sides here are already k-bounded per query, so the
    // join is cheap either way and AQE promotes small cases at runtime
    ranked.join(fullKeys, Seq("_qk"))
      .unionByName(fallback)
      .drop("_h", "_qk", "_ck", "rank")
  }
}
