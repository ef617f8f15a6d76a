package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling to a fixed grid with linear interpolation.
  *
  * The reference exposes time-series work only as timestamp columns + window
  * functions inside `%sql` (SURVEY.md §1 "Graph / time-series"); this operator
  * packages the standard resample-and-interpolate recipe the same way a
  * warehouse `ASOF`/`GAPFILL` helper would, built entirely from declarative
  * pieces Catalyst can plan:
  *
  *   1. per-key grid generation — one partial+final aggregate for the bounds,
  *      then `sequence()` + `explode` (a narrow map, no shuffle beyond the
  *      aggregate's);
  *   2. grid ∪ observations, then two `IGNORE NULLS` window passes over
  *      `(key, ts)` to find the surrounding observations;
  *   3. one arithmetic projection for the interpolation.
  *
  * Scale: the only shuffles are the bounds aggregate and the window's
  * hash-partition by key — both keyed on `keyCol`, so AQE coalesces them and
  * no single-partition stage exists. Grid size is bounded by
  * `span / step` per key, independent of observation count, so a skewed key
  * with millions of observations still emits only its grid rows; the window
  * sort is the same `(key, ts)` sort any gap-fill needs.
  *
  * Interpolation arithmetic is done in epoch MICROSECONDS (exact BIGINT) with
  * one IEEE double divide+multiply — bit-reproducible across engines, which is
  * what lets the DuckDB oracle check it exactly (q101).
  */
object Resample {

  /** Resample `valCol` onto a fixed `step` grid per `keyCol`, linearly
    * interpolating between the nearest observations on each side. Grid points
    * outside the observation range take the nearest observed value (flat
    * extrapolation). Grid bounds are the first/last whole `truncUnit`
    * (a unit name valid in both `date_trunc` and `INTERVAL`, e.g. DAY/HOUR)
    * inside each key's observed span.
    *
    * Output: `keyCol, ts, interp_value`, one row per grid point.
    */
  def resampleLinear(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valCol: String,
      step: String = "6 hours",
      truncUnit: String = "DAY"): DataFrame = {
    val k = col(keyCol)

    val bounds = df
      .groupBy(k)
      .agg(
        (date_trunc(truncUnit, min(col(tsCol))) + expr(s"INTERVAL 1 $truncUnit")).as("_t0"),
        date_trunc(truncUnit, max(col(tsCol))).as("_t1"))
      .filter(col("_t0") <= col("_t1"))

    val grid = bounds.select(
      k,
      explode(sequence(col("_t0"), col("_t1"), expr(s"INTERVAL $step"))).as("ts"))

    val merged = grid
      .select(k, col("ts"), lit(null).cast("double").as("v"), lit(true).as("_grid"))
      .unionByName(
        df.select(k, col(tsCol).as("ts"), col(valCol).cast("double").as("v"),
          lit(false).as("_grid")))

    // Observations sort before the grid point at an identical timestamp
    // (false < true), so an exactly-aligned grid point takes the observed
    // value through the inclusive backward window.
    val back = Window.partitionBy(k).orderBy(col("ts"), col("_grid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(k).orderBy(col("ts"), col("_grid"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val obsVal = when(!col("_grid"), col("v"))
    val obsUs = when(!col("_grid"), unix_micros(col("ts")))

    val w = merged
      .withColumn("_pv", last(obsVal, ignoreNulls = true).over(back))
      .withColumn("_pt", last(obsUs, ignoreNulls = true).over(back))
      .withColumn("_nv", first(obsVal, ignoreNulls = true).over(fwd))
      .withColumn("_nt", first(obsUs, ignoreNulls = true).over(fwd))

    w.filter(col("_grid"))
      .select(
        k,
        col("ts"),
        when(col("_pt").isNull, col("_nv"))
          .when(col("_nt").isNull, col("_pv"))
          .when(col("_nt") === col("_pt"), col("_pv"))
          .otherwise(col("_pv") + (col("_nv") - col("_pv")) *
            ((unix_micros(col("ts")) - col("_pt")).cast("double") /
              (col("_nt") - col("_pt")).cast("double")))
          .as("interp_value"))
  }
}
