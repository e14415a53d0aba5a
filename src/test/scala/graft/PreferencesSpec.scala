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

  test("dpo pairs: majority direction per prompt, ties excluded, margin " +
      "gate, planted cycle flagged or dropped by parameter, cap raises") {
    import spark.implicits._
    val prefs = (
      // p1: a>b 3-1 (margin 2), b>c 2-0 (margin 2), c-d tied (excluded),
      //     a>d 2-1 (margin 1 — gated at minMargin=2)
      Seq.fill(3)(("p1", "a", "b")) ++ Seq(("p1", "b", "a")) ++
      Seq.fill(2)(("p1", "b", "c")) ++
      Seq(("p1", "c", "d"), ("p1", "d", "c")) ++
      Seq.fill(2)(("p1", "a", "d")) ++ Seq(("p1", "d", "a")) ++
      // p2: x>y, y>z, z>x each 2-0 — a pure majority 3-cycle
      Seq.fill(2)(("p2", "x", "y")) ++ Seq.fill(2)(("p2", "y", "z")) ++
      Seq.fill(2)(("p2", "z", "x"))
    ).toDF("prompt", "winner", "loser")
    def rows(minMargin: Long, excl: Boolean) =
      Preferences.dpoPairs(prefs, "prompt", "winner", "loser",
          minMargin = minMargin, excludeCycles = excl)
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6))).toSet
    assert(rows(2L, excl = false) === Set(
      ("p1", "a", "b", 3L, 1L, 2L, false),
      ("p1", "b", "c", 2L, 0L, 2L, false),
      ("p2", "x", "y", 2L, 0L, 2L, true),
      ("p2", "y", "z", 2L, 0L, 2L, true),
      ("p2", "z", "x", 2L, 0L, 2L, true)),
      "flag mode: ties gone, low margins gated, the cycle flagged")
    assert(rows(2L, excl = true) === Set(
      ("p1", "a", "b", 3L, 1L, 2L, false),
      ("p1", "b", "c", 2L, 0L, 2L, false)),
      "exclusion mode drops exactly the intransitive triangle")
    assert(rows(1L, excl = true).contains(("p1", "a", "d", 2L, 1L, 1L, false)),
      "minMargin=1 admits the noisy pair back")
    // the per-prompt candidate cap raises in-plan (collect consumes the
    // guard branch — a bare count would prune it)
    val ex = intercept[Exception](
      Preferences.dpoPairs(prefs, "prompt", "winner", "loser",
        maxCandidatesPerPrompt = 3).collect())
    assert(ex.getMessage.contains("candidates-cubed"),
      "p1 has 4 distinct responses and must refuse a cap of 3")
    // composition: both sides render as two-turn ChatML THROUGH
    // renderChatTemplate
    val pairs = Preferences.dpoPairs(prefs, "prompt", "winner", "loser",
      minMargin = 2L, excludeCycles = true)
    val prompts = Seq(("p1", "Which answer is better?")).toDF("prompt", "pt")
    val resps = Seq(("a", "Ans A"), ("b", "Ans B"), ("c", "Ans C"),
      ("d", "Ans D")).toDF("rid", "rt")
    val strs = Preferences.dpoTrainingStrings(pairs, "prompt",
        prompts, "pt", resps, "rid", "rt")
      .collect().map(r => r.getAs[String]("chosen_id") ->
        ((r.getAs[String]("chosen"), r.getAs[String]("rejected")))).toMap
    assert(strs("a") === ((
      "<|im_start|>user\nWhich answer is better?<|im_end|>\n" +
        "<|im_start|>assistant\nAns A<|im_end|>",
      "<|im_start|>user\nWhich answer is better?<|im_end|>\n" +
        "<|im_start|>assistant\nAns B<|im_end|>")),
      "chosen and rejected render the same prompt with each side's text")
  }

  test("best-of-n: top-k per prompt by reward, ties to the lower id, " +
      "null rewards are unjudged, k past the candidate count keeps all") {
    import spark.implicits._
    val samples = Seq(
      ("p1", 10L, Option(100000L)), ("p1", 11L, Option(300000L)),
      ("p1", 12L, Option(200000L)),
      ("p2", 20L, Option(500000L)), ("p2", 21L, Option(500000L)), // tie
      ("p2", 22L, Option.empty[Long]) // unjudged
    ).toDF("prompt", "resp", "reward")
    val out = Preferences.bestOfN(samples, "prompt", "resp", "reward", 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(("p1", 1L)) === ((11L, 300000L, 3L)))
    assert(out(("p1", 2L)) === ((12L, 200000L, 3L)))
    assert(out(("p2", 1L)) === ((20L, 500000L, 2L)),
      "reward tie breaks to the lower response id; the null-reward " +
        "sample is excluded from n_samples")
    assert(out(("p2", 2L)) === ((21L, 500000L, 2L)))
    assert(!out.contains(("p1", 3L)), "k bounds the kept set")
    // k past the candidate count keeps everything, ranks stay dense
    assert(Preferences.bestOfN(samples, "prompt", "resp", "reward", 10)
      .collect().length === 5)
    // a reward past 2^53 micros would lose exactness in the buffer's
    // double score — the magnitude guard raises
    val huge = Seq(("p1", 10L, 9007199254740993L))
      .toDF("prompt", "resp", "reward")
    val ex = intercept[Exception](
      Preferences.bestOfN(huge, "prompt", "resp", "reward", 1).collect())
    assert(ex.getMessage.contains("2^53"))
  }

  test("bradley-terry: two candidates hit the exact MLE odds in one " +
      "step and stay fixed; strengths always renormalize to n x 1e6") {
    import spark.implicits._
    // a beats b 3-1: BT MLE odds s_a/s_b = 3, normalized (1.5e6, 0.5e6).
    // The MM update reaches it in ONE step from uniform and every later
    // iteration is a fixed point — iterations=1 and =7 must agree.
    val prefs = (Seq.fill(3)(("a", "b")) ++ Seq(("b", "a")))
      .toDF("winner", "loser")
    for (k <- Seq(1, 7)) {
      val out = Preferences.bradleyTerry(prefs, "winner", "loser", k)
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3)))).toMap
      assert(out("a") === ((3L, 4L, 1500000L)), s"iterations=$k")
      assert(out("b") === ((1L, 4L, 500000L)), s"iterations=$k")
    }
  }

  test("bradley-terry: fitted strengths recover a planted 3:2:1 model's " +
      "order, match a sequential replay of the integer recursion " +
      "exactly, and a zero-win candidate trips the Ford raise") {
    import spark.implicits._
    // counts generated FROM planted strengths (3,2,1): 60 games per
    // pair, wins split s_i/(s_i+s_j) exactly
    def games(w: String, l: String, n: Int) = Seq.fill(n)((w, l))
    val prefs = (games("a", "b", 36) ++ games("b", "a", 24) ++
      games("a", "c", 45) ++ games("c", "a", 15) ++
      games("b", "c", 40) ++ games("c", "b", 20)).toDF("winner", "loser")
    val out = Preferences.bradleyTerry(prefs, "winner", "loser")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // sequential replay of the SAME integer recursion (pins the
    // distributed aggregation to the defined arithmetic, not floats)
    def halfUp(a: BigInt, b: BigInt): BigInt = (2 * a + b) / (2 * b)
    val pairs = Map(("a", "b") -> 60L, ("a", "c") -> 60L, ("b", "c") -> 60L)
    val wins = Map("a" -> 81L, "b" -> 64L, "c" -> 35L)
    var s = Map("a" -> BigInt(1000000), "b" -> BigInt(1000000),
      "c" -> BigInt(1000000))
    for (_ <- 1 to 5) {
      val d = s.keys.map { c =>
        c -> pairs.collect { case ((x, y), n) if x == c || y == c =>
          halfUp(BigInt(n) * BigInt(1000000000L), s(x) + s(y))
        }.sum
      }.toMap
      val sn = s.keys.map(c =>
        c -> halfUp(BigInt(wins(c)) * BigInt(1000000000L), d(c))).toMap
      val tot = sn.values.sum
      s = sn.map { case (c, v) =>
        c -> halfUp(v * 3 * BigInt(1000000), tot).max(BigInt(1)) }
    }
    assert(out === s.map { case (c, v) => c -> v.toLong },
      "distributed fit must equal the sequential integer replay")
    assert(out("a") > out("b") && out("b") > out("c"),
      "planted 3:2:1 order recovered")
    assert(math.abs(out.values.sum - 3000000L) <= 2,
      "renormalization holds the sum at n x 1e6 (rounding ulps aside)")
    // planted ratios recovered to within the fixed-iteration tolerance
    assert(math.abs(out("a") - 1500000L) < 60000L &&
      math.abs(out("b") - 1000000L) < 60000L, s"got $out")
    // Ford guard: a zero-win candidate degenerates the MM update
    val withLoser = (games("a", "b", 3) ++ games("b", "a", 1) ++
      games("a", "z", 2)).toDF("winner", "loser")
    val ex = intercept[Exception](
      Preferences.bradleyTerry(withLoser, "winner", "loser").collect())
    assert(ex.getMessage.contains("zero wins"))
  }

  test("plackett-luce: 2-item lists recover the exact BT fixed point; " +
      "a 3-way ranking corpus recovers the planted order and matches a " +
      "sequential replay of the integer recursion") {
    import spark.implicits._
    // a beats b 3-1 rendered as 2-item rankings: PL's stages ARE the BT
    // games, so the 1.5e6/0.5e6 fixed point must reproduce exactly
    val pairLists = (Seq.tabulate(3)(i => Seq((s"g$i", "a", 1L),
        (s"g$i", "b", 2L))).flatten ++
      Seq(("g3", "b", 1L), ("g3", "a", 2L)))
      .toDF("list", "cand", "rank")
    for (k <- Seq(1, 7)) {
      val out = Preferences.plackettLuce(pairLists, "list", "cand",
          "rank", k)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(out("a") === ((3L, 4L, 1500000L)), s"iterations=$k")
      assert(out("b") === ((1L, 4L, 500000L)), s"iterations=$k")
    }
    // 3-way rankings: 4x (a,b,c), 2x (b,a,c), 1x (c,b,a) — a should
    // dominate, c trail. Replay the integer recursion sequentially.
    val tri = Seq(
      Seq("a", "b", "c"), Seq("a", "b", "c"), Seq("a", "b", "c"),
      Seq("a", "b", "c"), Seq("b", "a", "c"), Seq("b", "a", "c"),
      Seq("c", "b", "a"))
    val triDf = tri.zipWithIndex.flatMap { case (l, i) =>
      l.zipWithIndex.map { case (c, j) => (s"r$i", c, (j + 1).toLong) } }
      .toDF("list", "cand", "rank")
    val out = Preferences.plackettLuce(triDf, "list", "cand", "rank")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // wins: a = 4 firsts + 2 seconds(non-last) = 6; b = 2+5=7? No —
    // wins = lists where the candidate is NOT last: a: 6 (all but the
    // c,b,a list's last place... a IS last there) -> 6; b: 7 (never
    // last); c: 1 (first in one list, last in 6)
    assert(out("a")._1 === 6L && out("b")._1 === 7L && out("c")._1 === 1L)
    assert(out.values.forall(_._2 === 7L), "every list names all three")
    def halfUp(a: BigInt, b: BigInt): BigInt = (2 * a + b) / (2 * b)
    val cands = Seq("a", "b", "c")
    val wins = Map("a" -> 6L, "b" -> 7L, "c" -> 1L)
    var s = cands.map(_ -> BigInt(1000000)).toMap
    for (_ <- 1 to 5) {
      // per list, stage terms t_j = halfUp(1e9, suffix strength sum)
      // for j = 1..2; candidate at rank k accumulates stages 1..min(k,2)
      val d = scala.collection.mutable.Map(cands.map(_ -> BigInt(0)): _*)
      tri.foreach { l =>
        val suffix = (j: Int) => l.drop(j - 1).map(s(_)).sum
        val t = (1 to 2).map(j => j -> halfUp(BigInt(1000000000L),
          suffix(j))).toMap
        l.zipWithIndex.foreach { case (c, idx) =>
          val k = idx + 1
          (1 to math.min(k, 2)).foreach(j => d(c) += t(j))
        }
      }
      val sn = cands.map(c =>
        c -> halfUp(BigInt(wins(c)) * BigInt(1000000000L), d(c))).toMap
      val tot = sn.values.sum
      s = sn.map { case (c, v) =>
        c -> halfUp(v * 3 * BigInt(1000000), tot).max(BigInt(1)) }
    }
    assert(out.map { case (c, v) => c -> v._3 } ===
      s.map { case (c, v) => c -> v.toLong },
      "distributed fit must equal the sequential integer replay")
    assert(out("a")._3 > out("b")._3 && out("b")._3 > out("c")._3,
      "a's four first places outweigh b's never-last record; c trails")
  }

  test("group advantage: hand-checked GRPO normalization, sign-split " +
      "negative mean, degenerate groups go null, null rewards drop") {
    import spark.implicits._
    // p1: rewards (2e6, -1e6, -1e6) -> mean 0, var = 2e12, std =
    // sqrt(2)e6; adv = r/std -> (1414214, -707107, -707107) micros
    val samples = Seq(
      ("p1", 1L, Option(2000000L)), ("p1", 2L, Option(-1000000L)),
      ("p1", 3L, Option(-1000000L)),
      // p2: a single sample has no scale
      ("p2", 4L, Option(7L)),
      // p3: zero variance -> std 0 -> null advantage
      ("p3", 5L, Option(5L)), ("p3", 6L, Option(5L)),
      // p4: negative mean exercises the sign-split (-3 -> mean -2
      // when n=... use (-3, -4): sum -7, n 2 -> half-up away from
      // zero = -4 (not the toward-zero -3)
      ("p4", 7L, Option(-3L)), ("p4", 8L, Option(-4L)),
      ("p1", 9L, Option.empty[Long]))
      .toDF("prompt", "resp", "reward")
    val out = Preferences.groupAdvantage(samples, "prompt", "resp",
        "reward")
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getLong(5)),
          if (r.isNullAt(6)) None else Some(r.getLong(6))))).toMap
    assert(out.size === 8, "the null-reward sample is unjudged")
    assert(out(1L) === ((3L, 0L, Some(1414214L), Some(1414214L))))
    assert(out(2L) === ((3L, 0L, Some(1414214L), Some(-707107L))))
    assert(out(4L) === ((1L, 7L, None, None)), "n=1 has no scale")
    assert(out(5L)._4 === None && out(5L)._3 === Some(0L),
      "zero variance: std 0, advantage undefined")
    assert(out(7L)._2 === -4L,
      "half-up of -3.5 rounds away from zero (sign-split)")
  }

  test("kto signal: hand-checked baseline and centering, all-one-verdict " +
      "prompts read zero signal, imbalance weights balance the verdict " +
      "masses, null verdicts are unjudged") {
    import spark.implicits._
    val fb = Seq(
      // p1: 3 up, 1 down -> baseline 750000; signals +250000 / -750000;
      // weights: desirable 1e6, undesirable 3e6 (3 up / 1 down)
      ("p1", 1L, Option(true)), ("p1", 2L, Option(true)),
      ("p1", 3L, Option(true)), ("p1", 4L, Option(false)),
      // p2: ALL desirable -> baseline 1e6, zero signal, no weight
      ("p2", 5L, Option(true)), ("p2", 6L, Option(true)),
      // p3: ALL undesirable -> baseline 0, zero signal, no weight
      ("p3", 7L, Option(false)), ("p3", 8L, Option(false)),
      ("p1", 9L, Option.empty[Boolean]))
      .toDF("prompt", "resp", "up")
    val out = Preferences.ktoSignal(fb, "prompt", "resp", "up")
      .collect().map(r => r.getLong(1) ->
        ((r.getBoolean(2), r.getLong(3), r.getLong(6), r.getLong(7),
          if (r.isNullAt(8)) None else Some(r.getLong(8))))).toMap
    assert(out.size === 8, "the null-verdict example is unjudged")
    assert(out(1L) === ((true, 4L, 750000L, 250000L, Some(1000000L))))
    assert(out(4L) === ((false, 4L, 750000L, -750000L, Some(3000000L))),
      "lambda_U = n_D/n_U balances the verdict masses exactly")
    assert(out(5L) === ((true, 2L, 1000000L, 0L, None)),
      "all-one-verdict: no contrast, zero signal, nothing to balance")
    assert(out(7L) === ((false, 2L, 0L, 0L, None)))
    // derivation-half coverage guard: a counts relation missing a
    // prompt raises instead of silently dropping its examples
    val partial = Seq(("p1", 4L, 3L))
      .toDF("prompt", "n_examples", "n_desirable")
    val ex = intercept[Exception](Preferences.ktoSignalFromCounts(
      fb, partial, "prompt", "resp", "up").collect())
    assert(ex.getMessage.contains("no counter row"))
    // a DUPLICATED counter row raises instead of silently fanning the
    // prompt's output rows out once per duplicate
    val dup = Seq(("p1", 4L, 3L), ("p1", 4L, 3L), ("p2", 2L, 2L),
      ("p3", 2L, 0L)).toDF("prompt", "n_examples", "n_desirable")
    val ex2 = intercept[Exception](Preferences.ktoSignalFromCounts(
      fb, dup, "prompt", "resp", "up").collect())
    assert(ex2.getMessage.contains("counter rows"))
    // a present-but-BEHIND counter (n_examples below the batch's own
    // per-prompt count) raises instead of miscomputing baseline/weights
    val behind = Seq(("p1", 3L, 3L), ("p2", 2L, 2L), ("p3", 2L, 0L))
      .toDF("prompt", "n_examples", "n_desirable")
    val ex3 = intercept[Exception](Preferences.ktoSignalFromCounts(
      fb, behind, "prompt", "resp", "up").collect())
    assert(ex3.getMessage.contains("behind the batch"))
  }

  test("trajectoryReturns: hand-checked backward recursion, gamma=1 " +
      "degenerates to the suffix sum, single-step episodes read R=r, " +
      "floor division quantizes negatives toward -inf, null values " +
      "read 0, duplicate steps and the episode cap raise") {
    import spark.implicits._
    import graft.operators.Preferences
    // e1: r = [100, -50, 200] micros, v = [10, 20, 30], gamma = 0.5,
    // lambda = 0.5 (gl = 250000). Backward:
    //   step 2: R=200, d=200-30=170, A=170
    //   step 1: R=-50+floor(0.5*200)=50, d=-50+floor(0.5*30)-20=-55,
    //           A=-55+floor(0.25*170)=-55+42=-13
    //   step 0: R=100+floor(0.5*50)=125, d=100+floor(0.5*20)-10=100,
    //           A=100+floor(0.25*-13)=100+floor(-3.25)=100-4=96
    val e1 = Seq(("e1", 0L, 100L, Option(10L)),
      ("e1", 1L, -50L, Option(20L)), ("e1", 2L, 200L, Option(30L)),
      ("solo", 7L, 42L, Option(5L)),
      ("nullv", 0L, 9L, Option.empty[Long]))
      .toDF("ep", "st", "r", "v")
    val out = Preferences.trajectoryReturns(e1, "ep", "st", "r", "v",
        gammaPpm = 500000L, lambdaPpm = 500000L)
      .collect().map(r => (r.getString(0), r.getLong(2)) ->
        ((r.getLong(1), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(out(("e1", 2L)) === ((3L, 200L, 170L, 170L)))
    assert(out(("e1", 1L)) === ((3L, 50L, -55L, -13L)),
      "floor(0.25 * 170) = 42, not 43")
    assert(out(("e1", 0L)) === ((3L, 125L, 100L, 96L)),
      "floor(0.25 * -13) = -4 (toward -inf), not -3")
    assert(out(("solo", 7L)) === ((1L, 42L, 37L, 37L)),
      "single step: R = r, delta = r - v, A = delta")
    assert(out(("nullv", 0L)) === ((1L, 9L, 9L, 9L)),
      "null value reads 0: critic-free advantage equals return")
    // gamma = lambda = 1: suffix sums, advantage telescopes to R - V
    val g1 = Preferences.trajectoryReturns(e1.filter($"ep" === "e1"),
        "ep", "st", "r", "v", gammaPpm = 1000000L, lambdaPpm = 1000000L)
      .collect().map(r => r.getLong(2) -> ((r.getLong(5), r.getLong(7))))
      .toMap
    assert(g1(0L) === ((250L, 240L)) && g1(1L) === ((150L, 130L)) &&
      g1(2L) === ((200L, 170L)),
      "gamma=1: R = suffix sum, A = R - V (terminal V = 0)")
    // duplicate (episode, step) raises
    val dup = e1.unionByName(Seq(("e1", 1L, 1L, Option(1L)))
      .toDF("ep", "st", "r", "v"))
    val ex1 = intercept[Exception](Preferences.trajectoryReturns(dup,
      "ep", "st", "r", "v", 500000L, 500000L).collect())
    assert(ex1.getMessage.contains("duplicate steps alias"))
    // the episode step cap raises
    val ex2 = intercept[Exception](Preferences.trajectoryReturns(e1,
      "ep", "st", "r", "v", 500000L, 500000L, maxSteps = 2).collect())
    assert(ex2.getMessage.contains("cap 2"))
  }

  test("plackett-luce: guards — tied/gapped ranks raise, the list cap " +
      "raises, a candidate that only ever places last trips Ford") {
    import spark.implicits._
    // each bad fixture carries a second clean list where every candidate
    // wins once, so the SHAPE raise is the only live offender branch
    // (two union branches racing would make the message assertion flaky)
    val balance = Seq(("r2", "c", 1L), ("r2", "a", 2L),
      ("r3", "a", 1L), ("r3", "c", 2L), ("r4", "b", 1L), ("r4", "a", 2L))
    val tied = (Seq(("r1", "a", 1L), ("r1", "b", 1L), ("r1", "c", 2L)) ++
      balance).toDF("list", "cand", "rank")
    val ex1 = intercept[Exception](
      Preferences.plackettLuce(tied, "list", "cand", "rank").collect())
    assert(ex1.getMessage.contains("dense 1..m"))
    val gapped = (Seq(("r1", "a", 1L), ("r1", "b", 3L)) ++ balance)
      .toDF("list", "cand", "rank")
    val ex2 = intercept[Exception](
      Preferences.plackettLuce(gapped, "list", "cand", "rank").collect())
    assert(ex2.getMessage.contains("dense 1..m"))
    val long3 = (Seq(("r1", "a", 1L), ("r1", "b", 2L), ("r1", "c", 3L)) ++
      balance).toDF("list", "cand", "rank")
    val ex3 = intercept[Exception](Preferences.plackettLuce(long3, "list",
      "cand", "rank", maxListLen = 2).collect())
    assert(ex3.getMessage.contains("cap 2"))
    val alwaysLast = Seq(("r1", "a", 1L), ("r1", "z", 2L),
      ("r2", "b", 1L), ("r2", "z", 2L), ("r3", "a", 1L), ("r3", "b", 2L),
      ("r4", "b", 1L), ("r4", "a", 2L))
      .toDF("list", "cand", "rank")
    val ex4 = intercept[Exception](Preferences.plackettLuce(alwaysLast,
      "list", "cand", "rank").collect())
    assert(ex4.getMessage.contains("zero stages"))
    // a repeated CANDIDATE passes the rank-density check (ranks are
    // dense 1..2) but would double-count its strength in every suffix
    // pool — the distinct-candidate guard must trip
    val dupCand = (Seq(("r1", "a", 1L), ("r1", "a", 2L)) ++ balance)
      .toDF("list", "cand", "rank")
    val ex5 = intercept[Exception](Preferences.plackettLuce(dupCand,
      "list", "cand", "rank").collect())
    assert(ex5.getMessage.contains("double-counts"))
    // a candidate string carrying U+001F would corrupt the joined
    // pattern key undetected — raise instead
    val sep = (Seq(("r1", "a\u001fb", 1L), ("r1", "c", 2L)) ++ balance)
      .toDF("list", "cand", "rank")
    val ex6 = intercept[Exception](Preferences.plackettLuce(sep,
      "list", "cand", "rank").collect())
    assert(ex6.getMessage.contains("U+001F"))
  }
}
