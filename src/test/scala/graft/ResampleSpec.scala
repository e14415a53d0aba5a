package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Resample

class ResampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("LOCF grid: boundary start, carried values, staleness provenance") {
    import spark.implicits._
    val obs = Seq(
      ("a", ts("2024-01-01 10:05:00"), 1.0),
      ("a", ts("2024-01-01 11:30:00"), 2.0),
      ("a", ts("2024-01-01 13:45:00"), 3.0)
    ).toDF("k", "t", "v")
    val out = Resample.fillForward(obs, "k", "t", "v", 3600000000L)
      .orderBy("grid_ts")
      .collect().map(r => (r.getTimestamp(1).toString, r.getTimestamp(2).toString,
        r.getDouble(3)))
    // grid starts at 11:00 (first boundary >= 10:05), ends at 13:45's hour
    assert(out.toSeq === Seq(
      ("2024-01-01 11:00:00.0", "2024-01-01 10:05:00.0", 1.0),
      ("2024-01-01 12:00:00.0", "2024-01-01 11:30:00.0", 2.0),
      ("2024-01-01 13:00:00.0", "2024-01-01 11:30:00.0", 2.0)))
  }

  test("observation exactly on a boundary anchors the grid and fills itself") {
    import spark.implicits._
    val obs = Seq(
      ("a", ts("2024-01-01 10:00:00"), 5.0),
      ("a", ts("2024-01-01 12:10:00"), 7.0)
    ).toDF("k", "t", "v")
    val out = Resample.fillForward(obs, "k", "t", "v", 3600000000L)
      .orderBy("grid_ts")
      .collect().map(r => (r.getTimestamp(1).toString, r.getDouble(3)))
    assert(out.toSeq === Seq(
      ("2024-01-01 10:00:00.0", 5.0),
      ("2024-01-01 11:00:00.0", 5.0),
      ("2024-01-01 12:00:00.0", 5.0)))
  }

  test("a key never crossing a boundary yields no grid rows, not an error") {
    import spark.implicits._
    val obs = Seq(
      ("tiny", ts("2024-01-01 10:10:00"), 1.0),
      ("tiny", ts("2024-01-01 10:20:00"), 2.0),
      ("big", ts("2024-01-01 10:10:00"), 3.0),
      ("big", ts("2024-01-01 12:20:00"), 4.0)
    ).toDF("k", "t", "v")
    val out = Resample.fillForward(obs, "k", "t", "v", 3600000000L)
    assert(out.filter(col("k") === "tiny").count() === 0)
    assert(out.filter(col("k") === "big").count() === 2) // 11:00 and 12:00
  }

  test("duplicate (key, ts) observations reduce deterministically to max") {
    import spark.implicits._
    val obs = Seq(
      ("a", ts("2024-01-01 10:30:00"), 1.0),
      ("a", ts("2024-01-01 10:30:00"), 9.0),
      ("a", ts("2024-01-01 11:30:00"), 2.0)
    ).toDF("k", "t", "v")
    val out = Resample.fillForward(obs, "k", "t", "v", 3600000000L)
      .orderBy("grid_ts").collect()
    assert(out.head.getDouble(3) === 9.0)
  }

  test("interpolation brackets each grid point; exact hits take the observation") {
    import spark.implicits._
    val obs = Seq(
      ("a", ts("2024-01-01 10:00:00"), 10.0),  // on-boundary: exact hit
      ("a", ts("2024-01-01 11:30:00"), 40.0),
      ("a", ts("2024-01-01 13:00:00"), 10.0)   // on-boundary: exact hit
    ).toDF("k", "t", "v")
    val out = Resample.interpolate(obs, "k", "t", "v", 3600000000L)
      .orderBy("grid_ts")
      .collect().map(r => (r.getTimestamp(1).toString, r.getDouble(4)))
    // 10:00 exact 10.0; 11:00 = 10 + 30*(60/90) = 30; 12:00 = 40 + -30*(30/90) = 30;
    // 13:00 exact 10.0
    assert(out.toSeq === Seq(
      ("2024-01-01 10:00:00.0", 10.0),
      ("2024-01-01 11:00:00.0", 30.0),
      ("2024-01-01 12:00:00.0", 30.0),
      ("2024-01-01 13:00:00.0", 10.0)))
  }

  test("a key whose grid exceeds the cap fails loudly with the key name") {
    import spark.implicits._
    val obs = Seq(
      ("huge", ts("2024-01-01 00:00:00"), 1.0),
      ("huge", ts("2024-01-02 00:00:00"), 2.0)
    ).toDF("k", "t", "v")
    val ex = intercept[Exception](
      Resample.fillForward(obs, "k", "t", "v", 3600000000L, maxGridPerKey = 3)
        .collect())
    assert(ex.getMessage.contains("grid points") ||
      Option(ex.getCause).exists(_.getMessage.contains("grid points")),
      s"want the cap message, got: ${ex.getMessage}")
  }

  test("trailing agg: frame includes edge-exact rows, excludes the past, per key") {
    import spark.implicits._
    // 10-minute (600s) trailing window. Key 1: rows at :00, :05, :10,
    // :21 — the :10 row's frame includes :00 (exactly 600s back, RANGE
    // is inclusive) and :05; the :21 row sees only itself. Key 2 is
    // independent.
    val obs = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10.0),
      (1L, ts("2024-01-01 00:05:00"), 20.0),
      (1L, ts("2024-01-01 00:10:00"), 40.0),
      (1L, ts("2024-01-01 00:21:00"), 100.0),
      (2L, ts("2024-01-01 00:05:00"), 7.0)
    ).toDF("user_id", "ts", "value")
    val got = Resample.trailingAgg(obs, "user_id", "ts", "value", 600000000L)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2.getTime))
    assert(got === Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, 10.0),
      (1L, ts("2024-01-01 00:05:00"), 2L, 15.0),
      (1L, ts("2024-01-01 00:10:00"), 3L, 23.3333),   // (10+20+40)/3 @4dp
      (1L, ts("2024-01-01 00:21:00"), 1L, 100.0),
      (2L, ts("2024-01-01 00:05:00"), 1L, 7.0)))
    assert(intercept[IllegalArgumentException](
      Resample.trailingAgg(obs, "user_id", "ts", "value", -1L))
      .getMessage.contains("windowMicros"))
    // null observations: SQL AVG semantics — null values stay out of the
    // denominator; an all-null frame averages to null, not 0
    val sparse = Seq(
      (9L, ts("2024-01-01 00:00:00"), Some(10.0)),
      (9L, ts("2024-01-01 00:05:00"), None: Option[Double]),
      (8L, ts("2024-01-01 00:00:00"), None: Option[Double])
    ).toDF("user_id", "ts", "value")
    val g2 = Resample.trailingAgg(sparse, "user_id", "ts", "value", 600000000L)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
      .sortBy(t => (t._1, t._2.getTime))
    assert(g2 === Seq(
      (8L, ts("2024-01-01 00:00:00"), 1L, None),
      (9L, ts("2024-01-01 00:00:00"), 1L, Some(10.0)),
      (9L, ts("2024-01-01 00:05:00"), 2L, Some(10.0))))
  }

  test("step must be positive") {
    import spark.implicits._
    val obs = Seq(("a", ts("2024-01-01 10:00:00"), 1.0)).toDF("k", "t", "v")
    assert(intercept[IllegalArgumentException](
      Resample.fillForward(obs, "k", "t", "v", 0L)).getMessage.contains("step"))
  }
}
