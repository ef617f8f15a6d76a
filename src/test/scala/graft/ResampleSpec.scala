package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Resample

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("resampleLinear interpolates linearly between surrounding observations") {
    // key 1: observations at 00:00 (v=0) and 12:00 (v=12) on Jan 2; grid
    // starts at Jan 2 00:00 (trunc(min)+1day = Jan 2) every 6h.
    val obs = Seq(
      (1L, ts("2024-01-01 00:00:00"), 100.0), // pins trunc(min) to Jan 1
      (1L, ts("2024-01-02 00:00:00"), 0.0),
      (1L, ts("2024-01-02 12:00:00"), 12.0),
      (1L, ts("2024-01-03 06:00:00"), 30.0)
    ).toDF("k", "ts", "v")
    val out = Resample.resampleLinear(obs, "k", "ts", "v", step = "6 hours")
      .orderBy("ts")
      .as[(Long, Timestamp, Double)]
      .collect()

    val byTs = out.map(r => r._2 -> r._3).toMap
    // grid Jan 2 00:00 .. Jan 3 00:00 (trunc(max)=Jan 3)
    assert(out.map(_._2).toSeq == Seq(
      ts("2024-01-02 00:00:00"), ts("2024-01-02 06:00:00"),
      ts("2024-01-02 12:00:00"), ts("2024-01-02 18:00:00"),
      ts("2024-01-03 00:00:00")))
    assert(byTs(ts("2024-01-02 00:00:00")) == 0.0)   // aligned with observation
    assert(byTs(ts("2024-01-02 06:00:00")) == 6.0)   // halfway 0 -> 12
    assert(byTs(ts("2024-01-02 12:00:00")) == 12.0)  // aligned
    // 12:00 v=12 -> next day 06:00 v=30: 18h span, +1/3 and +2/3 of 18
    assert(math.abs(byTs(ts("2024-01-02 18:00:00")) - 18.0) < 1e-12)
    assert(math.abs(byTs(ts("2024-01-03 00:00:00")) - 24.0) < 1e-12)
  }

  test("flat extrapolation outside the observed range; single-point keys survive") {
    // key spans 3 days but has only two interior observations — grid points
    // before the first observation take its value (pt IS NULL branch).
    val obs = Seq(
      (2L, ts("2024-01-01 23:00:00"), 5.0),
      (2L, ts("2024-01-03 01:00:00"), 7.0)
    ).toDF("k", "ts", "v")
    val out = Resample.resampleLinear(obs, "k", "ts", "v", step = "6 hours")
      .orderBy("ts").as[(Long, Timestamp, Double)].collect()
    assert(out.head._2 == ts("2024-01-02 00:00:00"))
    assert(out.last._2 == ts("2024-01-03 00:00:00"))
    // every grid point is strictly inside (23:00 .. 01:00+2d) so all interpolate
    assert(out.forall(r => r._3 > 5.0 - 1e-9 && r._3 < 7.0 + 1e-9))

    // a key whose span collapses (all obs in one day) produces no grid rows
    val tiny = Seq((3L, ts("2024-01-05 01:00:00"), 1.0),
      (3L, ts("2024-01-05 23:00:00"), 2.0)).toDF("k", "ts", "v")
    assert(Resample.resampleLinear(tiny, "k", "ts", "v").count() == 0)
  }

  test("truncUnit anchors the grid: HOUR bounds start one hour in, not one day") {
    val obs = Seq(
      (5L, ts("2024-01-01 10:30:00"), 0.0),
      (5L, ts("2024-01-01 14:30:00"), 4.0)
    ).toDF("k", "ts", "v")
    val out = Resample.resampleLinear(obs, "k", "ts", "v",
      step = "1 hour", truncUnit = "HOUR")
      .orderBy("ts").as[(Long, Timestamp, Double)].collect()
    // trunc(min,HOUR)+1h = 11:00 .. trunc(max,HOUR) = 14:00
    assert(out.map(_._2).toSeq == Seq(
      ts("2024-01-01 11:00:00"), ts("2024-01-01 12:00:00"),
      ts("2024-01-01 13:00:00"), ts("2024-01-01 14:00:00")))
    assert(math.abs(out.head._3 - 0.5) < 1e-12) // 30min into a 4h 0→4 ramp
  }

  test("keys do not bleed into each other") {
    val obs = Seq(
      (1L, ts("2024-01-01 00:00:00"), 0.0),
      (1L, ts("2024-01-04 00:00:00"), 100.0),
      (9L, ts("2024-01-01 00:00:00"), 1000.0),
      (9L, ts("2024-01-04 00:00:00"), 1000.0)
    ).toDF("k", "ts", "v")
    val out = Resample.resampleLinear(obs, "k", "ts", "v", step = "12 hours")
    val k9 = out.filter($"k" === 9L).select("interp_value")
      .as[Double].collect()
    assert(k9.nonEmpty && k9.forall(_ == 1000.0))
    val k1 = out.filter($"k" === 1L).select("interp_value").as[Double].collect()
    assert(k1.forall(v => v >= 0.0 && v <= 100.0))
  }
}
