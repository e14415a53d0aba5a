package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Preferences

class PreferencesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("copeland: majority wins score 1, exact ties half, sparse pairs " +
      "count only the evidence; self/null judgments drop") {
    import spark.implicits._
    // rock-paper-scissors majorities: a>b (2-1), b>c (2-0), c>a (1-0);
    // d ties a (1-1) and is never compared to b/c
    val prefs = Seq(
      ("a", "b"), ("a", "b"), ("b", "a"),
      ("b", "c"), ("b", "c"),
      ("c", "a"),
      ("a", "d"), ("d", "a"),
      ("a", "a"), // self-judgment: error, dropped
      (null.asInstanceOf[String], "b") // null: dropped
    ).toDF("winner", "loser")
    val out = Preferences.copelandScores(prefs, "winner", "loser")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(out("a") === ((1L, 1L, 1L, 3L, 3L)), "a: beats b, ties d, loses c")
    assert(out("b") === ((1L, 0L, 1L, 2L, 2L)))
    assert(out("c") === ((1L, 0L, 1L, 2L, 2L)))
    assert(out("d") === ((0L, 1L, 0L, 1L, 1L)), "d saw one opponent only")
  }

  test("cycle audit: rock-paper-scissors is one 3-cycle, a transitive " +
      "tournament has zero, ties assert no direction, cap refuses") {
    import spark.implicits._
    val rps = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("winner", "loser")
    val r1 = Preferences.cycleAudit(rps, "winner", "loser").collect().head
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2)) === ((3L, 3L, 1L)))
    val transitive = Seq(("a", "b"), ("b", "c"), ("a", "c"))
      .toDF("winner", "loser")
    assert(Preferences.cycleAudit(transitive, "winner", "loser")
      .collect().head.getLong(2) === 0L)
    // a tied pair contributes no edge: the cycle breaks
    val tied = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"))
      .toDF("winner", "loser")
    val r2 = Preferences.cycleAudit(tied, "winner", "loser").collect().head
    assert(r2.getLong(1) === 2L && r2.getLong(2) === 0L)
    val ex = intercept[IllegalArgumentException](
      Preferences.cycleAudit(rps, "winner", "loser", maxCandidates = 2))
    assert(ex.getMessage.contains("candidates-cubed"))
  }
}
