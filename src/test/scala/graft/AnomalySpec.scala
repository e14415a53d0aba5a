package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Anomaly

class AnomalySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("an obvious outlier flags; its in-distribution peers do not") {
    import spark.implicits._
    val obs = (Seq.fill(20)(10.0) :+ 100.0).zipWithIndex
      .map { case (v, i) => (i.toLong, "a", v) }
      .toDF("id", "k", "v")
    val out = Anomaly.zscores(obs, "k", "v", 2.0)
    val flagged = out.filter(col("is_anomaly")).select("v")
      .collect().map(_.getDouble(0)).toSeq
    assert(flagged === Seq(100.0))
    assert(out.count() === 21)
  }

  test("constant and single-observation keys flag nothing, z stays null") {
    import spark.implicits._
    val obs = Seq(
      (1L, "const", 5.0), (2L, "const", 5.0), (3L, "const", 5.0),
      (4L, "solo", 42.0)
    ).toDF("id", "k", "v")
    val out = Anomaly.zscores(obs, "k", "v", 2.0).collect()
    assert(out.forall(!_.getAs[Boolean]("is_anomaly")))
    assert(out.forall(_.isNullAt(out.head.fieldIndex("z"))))
  }

  test("null keys come back as their own cohort — no row is dropped") {
    import spark.implicits._
    val obs = Seq(
      (1L, Option("a"), 1.0), (2L, Option("a"), 2.0),
      (3L, Option.empty[String], 10.0), (4L, Option.empty[String], 10.5),
      (5L, Option.empty[String], 99.0)
    ).toDF("id", "k", "v")
    val out = Anomaly.zscores(obs, "k", "v", 1.1)
    assert(out.count() === 5, "every input row must return")
    val nullFlagged = out.filter(col("k").isNull && col("is_anomaly"))
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(nullFlagged === Seq(5L), "the null cohort scores within itself")
  }

  test("tukey fences: robust flags survive the fat outlier that defeats z-scores") {
    import spark.implicits._
    // one enormous outlier inflates the stddev enough that z-scores
    // (threshold 2) miss it in a small cohort; quartile fences don't move
    val obs = ((1 to 11).map(i => (i.toLong, "a", 10.0 + (i % 3))) :+
      (99L, "a", 1e6)).toDF("id", "k", "v")
    val tukey = Anomaly.tukeyFences(obs, "k", "v")
      .filter(col("is_anomaly")).select("id").collect().map(_.getLong(0)).toSeq
    assert(tukey === Seq(99L), "fences flag exactly the outlier")
    // constant cohorts flag nothing; null values never flag
    val flat = Seq((1L, "c", Option(5.0)), (2L, "c", Option(5.0)),
      (3L, "c", Option.empty[Double])).toDF("id", "k", "v")
    assert(Anomaly.tukeyFences(flat, "k", "v")
      .filter(col("is_anomaly")).count() === 0)
    assert(intercept[IllegalArgumentException](
      Anomaly.tukeyFences(obs, "k", "v", k = 0.0))
      .getMessage.contains("positive"))
  }

  test("threshold must be positive") {
    import spark.implicits._
    val obs = Seq((1L, "a", 1.0)).toDF("id", "k", "v")
    assert(intercept[IllegalArgumentException](
      Anomaly.zscores(obs, "k", "v", 0.0)).getMessage.contains("threshold"))
  }

  test("robust z: hand MAD scores, an extreme outlier cannot mask " +
      "itself, zero-MAD cohorts flag off-median with a null score") {
    import spark.implicits._
    // k=a: values 1..9 plus a 1e6 outlier. median = 5.5, MAD = 2.5
    // (deviations 0.5..4.5 + the huge one; median of 10 devs = 2.5) —
    // the outlier cannot fatten MAD the way it fattens stddev
    val obs = ((1 to 9).map(i => (i.toLong, "a", i.toDouble)) :+
      ((10L, "a", 1000000.0)) :+
      // k=b: constant cohort + one deviant -> zero MAD
      ((11L, "b", 7.0)) :+ ((12L, "b", 7.0)) :+ ((13L, "b", 7.0)) :+
      ((14L, "b", 9.0))).toDF("id", "k", "v")
    val out = Anomaly.robustZ(obs, "k", "v", threshold = 3.5)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          r.getBoolean(4)))).toMap
    // value 1: rz = .6745*(1-5.5)/2.5 = -1.2141 -> not anomalous
    assert(out(1L)._1.get === -1.2141 && !out(1L)._2)
    // the outlier: rz huge -> flagged (stddev-based z on this fixture
    // would put the outlier at ~2.8 sigmas — below a 3.5 cut)
    assert(out(10L)._2 === true && out(10L)._1.get > 1000.0)
    // zero-MAD cohort: on-median passes, the deviant flags with null rz
    assert(out(11L) === ((None, false)))
    assert(out(14L) === ((None, true)),
      "off-median in a zero-MAD cohort must flag with an honest null rz")
  }

  test("robust z: the null-key cohort keeps its median/MAD stats") {
    import spark.implicits._
    // null keys form their own cohort: values 1..9 + outlier, same
    // shape as cohort a above — median 5.5, MAD 2.5. A null-unsafe
    // stats join would drop the cohort's row and score every null-key
    // observation rz=null / is_anomaly=false.
    val obs = ((1 to 9).map(i => (i.toLong, null: String, i.toDouble)) :+
      ((10L, null: String, 1000000.0)) :+
      ((11L, "a", 1.0)) :+ ((12L, "a", 2.0)) :+ ((13L, "a", 90.0)))
      .toDF("id", "k", "v")
    val out = Anomaly.robustZ(obs, "k", "v", threshold = 3.5)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          r.getBoolean(4)))).toMap
    assert(out(1L)._1 === Some(-1.2141),
      "null-key cohort must keep its median/MAD row through the stats join")
    assert(out(10L)._2 === true && out(10L)._1.get > 1000.0)
  }
}
