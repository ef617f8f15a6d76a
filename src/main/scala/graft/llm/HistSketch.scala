package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-bin histogram segments for quantile monitoring: track the
  * distribution of a numeric column (doc length, quality score,
  * tokens-per-doc) across ingest batches without keeping raw data. The
  * third leg of the mergeable-segment family — [[SketchStats]] (HLL,
  * distincts), [[CmsSketch]] (frequencies), this (quantiles) — all linear
  * structures: per-batch segments sum cell-wise into the corpus view.
  *
  * Deterministic by construction, unlike `approx_percentile` (whose
  * KLL-sketch internals are implementation-specific): the bin of a value is
  * `clamp(floor((x − lo) ÷ (hi − lo) × bins))` — three correctly-rounded
  * IEEE ops, so any engine assigns the identical bin and the q142 DuckDB
  * oracle rebuilds the histogram and its quantiles exactly. Quantile
  * estimates are bin upper edges: error ≤ one bin width, chosen by the
  * caller via (lo, hi, bins).
  *
  * Scale shape: segment build is a narrow map into ONE map-side-combined
  * shuffle bounded by `bins` cells. Quantile extraction runs a cumulative
  * window over the ≤`bins`-row histogram — single-partition but bounded by
  * construction (like vocabulary's post-limit rank), never over data.
  */
object HistSketch {

  private def binOf(value: Column, lo: Double, hi: Double, bins: Int): Column =
    least(lit(bins - 1L), greatest(lit(0L),
      floor((value.cast("double") - lit(lo)) / lit(hi - lo) * lit(bins)).cast("long")))

  /** Histogram segment over `value`: (bin, cnt), at most `bins` rows.
    * Values outside [lo, hi) clamp into the edge bins (a monitoring
    * histogram must never drop rows — a drifting tail shows up as edge-bin
    * mass, which is the signal). The global form of [[segmentBy]].
    */
  def segment(df: DataFrame, value: Column, lo: Double, hi: Double, bins: Int): DataFrame =
    segmentBy(df, Nil, value, lo, hi, bins)

  /** Cell-wise sum of segments (same lo/hi/bins). */
  def merge(segments: DataFrame): DataFrame =
    mergeBy(segments, Nil)

  /** Per-group histogram segments: (groupCols…, bin, cnt), at most
    * #groups × bins rows — the per-source drift monitor (one length/score
    * distribution per corpus source, language, or shard), mergeable like
    * the global form and the same shape as [[SketchStats]]' per-group HLL
    * segments. One map-side-combined shuffle bounded by groups × bins.
    * Empty `groupCols` = the global histogram (ONE definition of the
    * binning arithmetic serves both — q142 and q144 pin the same ops).
    */
  def segmentBy(df: DataFrame, groupCols: Seq[String], value: Column, lo: Double,
      hi: Double, bins: Int): DataFrame = {
    require(bins > 0 && hi > lo, s"need bins > 0 and hi > lo, got $bins, [$lo, $hi)")
    df.select(groupCols.map(col) :+ binOf(value, lo, hi, bins).as("bin"): _*)
      .groupBy(groupCols.map(col) :+ col("bin"): _*).agg(count(lit(1)).as("cnt"))
  }

  /** Cell-wise sum of per-group segments (same groupCols/lo/hi/bins). */
  def mergeBy(segments: DataFrame, groupCols: Seq[String]): DataFrame =
    segments.groupBy(groupCols.map(col) :+ col("bin"): _*).agg(sum("cnt").as("cnt"))

  /** Per-group quantile estimates: for each group and p, the upper edge of
    * the first bin whose cumulative count reaches ceil(p·N_group). Output
    * (groupCols…, p, est). Both windows partition by group over the
    * ≤ #groups × bins histogram — bounded by construction, never over data,
    * and parallel across groups. Empty `groupCols` = the global quantiles
    * (one job, no driver collect: N is the running sum's maximum read off
    * the same window) — ONE definition of the oracle-pinned edge/reach
    * arithmetic for q142 and q144.
    */
  def quantilesBy(hist: DataFrame, groupCols: Seq[String], ps: Seq[Double], lo: Double,
      hi: Double, bins: Int): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1), s"quantiles must be in (0,1]: $ps")
    val gcols = groupCols.map(col)
    val w = Window.partitionBy(gcols: _*).orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("_cum", sum("cnt").over(w))
      .withColumn("_total", max("_cum").over(Window.partitionBy(gcols: _*)))
    val pDf = hist.sparkSession.createDataFrame(ps.map(p => Tuple1(p))).toDF("p")
    cum.crossJoin(pDf)
      .filter(col("_cum") >= ceil(col("p") * col("_total").cast("double")))
      .groupBy(gcols :+ col("p"): _*).agg(min("bin").as("_bin"))
      .select(gcols :+ col("p") :+
        (lit(lo) + (col("_bin") + 1L).cast("double") * lit((hi - lo)) / lit(bins)).as("est"): _*)
  }

  /** Quantile estimates from a histogram: for each p, the upper edge of the
    * first bin whose cumulative count reaches ceil(p·N). Output (p, est),
    * one row per requested quantile. The global form of [[quantilesBy]].
    */
  def quantiles(hist: DataFrame, ps: Seq[Double], lo: Double, hi: Double,
      bins: Int): DataFrame =
    quantilesBy(hist, Nil, ps, lo, hi, bins)

  /** Distribution drift between two histograms with the same binning — the
    * "has this week's corpus shifted from last week's" monitor, computed
    * from segments alone (no raw data). ONE row:
    *  - total_a / total_b — the two histograms' masses;
    *  - tv   — total-variation distance ∈ [0,1]:
    *           ½ Σ_bins |cA/totA − cB/totB|;
    *  - linf — the largest single-bin share shift, max_bins of the same
    *           |difference|;
    *  - ks   — the Kolmogorov–Smirnov statistic, max over bin edges of
    *           |cumA/totA − cumB/totB| (the standard two-sample drift
    *           test, up to binning resolution).
    *
    * Engine-exact by the same discipline as the binning: every per-bin
    * difference is computed over common denominators —
    * |cA·totB − cB·totA| (cumulative counts for ks) in DECIMAL(38,0)
    * exact integer arithmetic (KL divergence needs `ln`, which is not
    * bit-guaranteed across engines, so TV/L∞/KS are the oracle-checked
    * drift metrics) — then ONE correctly-rounded double division at the
    * end. NULL metrics when either histogram is empty. All frames here
    * are ≤ `bins` rows, so the cumulative window is bounded by
    * construction, never over data.
    */
  def drift(histA: DataFrame, histB: DataFrame): DataFrame =
    driftBy(histA, histB, Nil)

  /** Per-group [[drift]]: one (groupCols…, total_a, total_b, tv, linf, ks)
    * row per group appearing in either histogram — the per-source /
    * per-language drift monitor over [[segmentBy]] output. Group keys
    * travel struct-wrapped (the [[Sampling]] discipline) so a NULL group
    * value is its own group on BOTH sides rather than silently failing the
    * join. All frames are ≤ #groups × bins rows; every window partitions
    * by group. A group present on only one side reports NULL metrics
    * (nothing to compare against), like the empty-histogram case. Empty
    * `groupCols` = the global [[drift]].
    */
  def driftBy(histA: DataFrame, histB: DataFrame, groupCols: Seq[String]): DataFrame = {
    val zero = lit(0).cast("decimal(38,0)")
    val gks = groupCols.indices.map(i => s"_gk$i")
    val kcols = gks.map(col)
    def wrap(h: DataFrame, cnt: String) = h.select(
      groupCols.zip(gks).map { case (g, k) => struct(col(g)).as(k) }
        ++ Seq(col("bin"), col("cnt").cast("decimal(38,0)").as(cnt)): _*)
    val j = wrap(histA, "_ca")
      .join(wrap(histB, "_cb"), (gks :+ "bin").toSeq, "full_outer")
      .select(kcols ++ Seq(col("bin"),
        coalesce(col("_ca"), zero).as("_ca"),
        coalesce(col("_cb"), zero).as("_cb")): _*)
    val cw = Window.partitionBy(kcols: _*).orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = j
      .withColumn("_cuma", sum("_ca").over(cw))
      .withColumn("_cumb", sum("_cb").over(cw))
    val tw = Window.partitionBy(kcols: _*)
    val denom = col("_ta").cast("double") * col("_tb").cast("double")
    val out = cum
      .withColumn("_ta", sum("_ca").over(tw))
      .withColumn("_tb", sum("_cb").over(tw))
      .withColumn("_num", abs(col("_ca") * col("_tb") - col("_cb") * col("_ta")))
      .withColumn("_knum", abs(col("_cuma") * col("_tb") - col("_cumb") * col("_ta")))
      .groupBy(kcols: _*)
      .agg(
        first(col("_ta")).cast("long").as("total_a"),
        first(col("_tb")).cast("long").as("total_b"),
        when(min(denom) > 0d,
          sum(col("_num")).cast("double") / min(denom) / 2.0).as("tv"),
        when(min(denom) > 0d,
          max(col("_num")).cast("double") / min(denom)).as("linf"),
        when(min(denom) > 0d,
          max(col("_knum")).cast("double") / min(denom)).as("ks"))
    out.select(
      groupCols.zip(gks).map { case (g, k) => col(k).getField(g).as(g) }
        ++ Seq(col("total_a"), col("total_b"), col("tv"), col("linf"), col("ks")): _*)
  }
}
