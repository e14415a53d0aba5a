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
}
