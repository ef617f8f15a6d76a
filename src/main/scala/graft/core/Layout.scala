package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-time data layout for scan-time data skipping.
  *
  * Parquet/ORC readers skip whole row groups whose column min/max statistics
  * exclude the query predicate — but only if the writer physically clustered
  * the data so those ranges are NARROW. A 100 TB table written in arrival
  * order has every row group spanning the whole key domain (no skipping); the
  * same table range-clustered on its filter keys serves a selective query by
  * reading a handful of row groups. This is the single cheapest scan
  * optimization available at scale: it costs one extra shuffle at write time
  * and nothing at read time.
  *
  * Two layouts:
  *  - `cluster`: lexicographic range clustering — best when queries filter a
  *    prefix of the cluster keys (the leading key gets perfectly disjoint
  *    ranges; later keys only help within a leading-key slice).
  *  - `zorder`: multi-dimensional interleaved-bit clustering — each key's
  *    quantile-bin bits are interleaved so EVERY clustered column gets
  *    locality (narrower min/max per file), at the price of none being
  *    perfectly disjoint. Use when queries filter different columns
  *    independently.
  *
  * Both are pure DataFrame reshapes (repartitionByRange + partition-local
  * sort) — no UDFs; the z-value is built from codegen'd expressions over
  * boundaries obtained with a bounded-size approxQuantile (driver holds
  * `bins` doubles per column, never data).
  *
  * Reference arc-jupyter/Arc has no layout control beyond `partitionBy`
  * (SURVEY.md §2.2 Load); this is a scale-path extension in the spirit of
  * DeltaLake's OPTIMIZE ZORDER, built on public Spark APIs only.
  */
object Layout {

  /** Range-cluster `df` on `cols`: globally range-partitioned, sorted within
    * partitions — every output file covers a narrow, non-overlapping slice of
    * the leading key. `numPartitions` bounds output file count (defaults to
    * the session shuffle parallelism).
    */
  def cluster(df: DataFrame, cols: Seq[String], numPartitions: Option[Int] = None): DataFrame = {
    require(cols.nonEmpty, "cluster requires at least one column")
    val keys = cols.map(col)
    val ranged = numPartitions match {
      case Some(n) => df.repartitionByRange(n, keys: _*)
      case None    => df.repartitionByRange(keys: _*)
    }
    ranged.sortWithinPartitions(keys: _*)
  }

  /** Z-order value: interleaved quantile-bin bits of `cols`.
    *
    * Each column is mapped to a bin in [0, 2^bits) by its position among
    * `2^bits - 1` approximate quantile boundaries (equi-depth binning — skewed
    * distributions still fill all bins), then bit j of every column's bin is
    * interleaved round-robin into one long. Bin lookup is
    * `size(filter(boundaries, b -> b <= v))` over a literal array — a narrow
    * codegen'd map, no join, no shuffle.
    *
    * Nulls sort to bin 0. bits × cols must stay ≤ 62.
    */
  def zorderValue(
      df: DataFrame,
      cols: Seq[String],
      bits: Int = 8,
      sampleFraction: Double = 1.0
  ): Column = {
    require(cols.nonEmpty, "zorderValue requires at least one column")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits*cols must be in [1,62], got $bits*${cols.size}")
    require(sampleFraction > 0 && sampleFraction <= 1, s"bad sampleFraction $sampleFraction")
    val nBounds = (1 << bits) - 1
    val probs = (1 to nBounds).map(_.toDouble / (nBounds + 1)).toArray
    // One bounded driver-side pass computes all boundary sets (bins doubles
    // per column — never data). Equi-depth binning only needs approximate
    // boundaries, so at scale pass sampleFraction ≪ 1 (seeded — deterministic)
    // and the pass reads a fraction of the table. Columns are cast to double
    // up front so timestamp/date keys cluster too.
    val base = if (sampleFraction < 1.0) df.sample(sampleFraction, seed = 42L) else df
    val casted = base.select(cols.zipWithIndex.map { case (c, i) =>
      col(c).cast("double").as(s"_zq$i")
    }: _*)
    val allBounds = casted.stat.approxQuantile(
      cols.indices.map(i => s"_zq$i").toArray, probs, 1e-3)
    // Native binary search per value (graft.functions.QuantileBinExpr) — the
    // composable size(filter(...)) form would run 2^bits-1 interpreted lambda
    // evaluations per row per column. Nulls bin to 0 (coalesce).
    val bins: Seq[Column] = cols.zipWithIndex.map { case (c, i) =>
      coalesce(
        graft.functions.QuantileBinExpr.quantile_bin(col(c).cast("double"), allBounds(i)),
        lit(0)
      ).cast("long")
    }
    // interleave: result bit (j*width + i) = bit j of column i's bin
    val width = cols.size
    val parts = for {
      j <- 0 until bits
      i <- 0 until width
    } yield shiftleft(shiftrightunsigned(bins(i), j).bitwiseAND(lit(1L)), j * width + i)
    parts.reduce(_.bitwiseOR(_))
  }

  /** Z-order-cluster `df` on `cols`: range-partition + sort on the
    * interleaved-bit value, so every clustered column's min/max tightens in
    * every output file. The helper column is dropped before the caller
    * writes (the physical order is already fixed by then).
    */
  def zorder(
      df: DataFrame,
      cols: Seq[String],
      bits: Int = 8,
      numPartitions: Option[Int] = None,
      sampleFraction: Double = 1.0
  ): DataFrame = {
    val z = df.withColumn("_zorder", zorderValue(df, cols, bits, sampleFraction))
    val ranged = numPartitions match {
      case Some(n) => z.repartitionByRange(n, col("_zorder"))
      case None    => z.repartitionByRange(col("_zorder"))
    }
    ranged.sortWithinPartitions(col("_zorder")).drop("_zorder")
  }
}
