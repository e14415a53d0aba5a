package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ranks(edges: Seq[(String, String)], iters: Int = 5)
      : Map[String, Double] = {
    import spark.implicits._
    Graph.pageRank(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  test("symmetric cycle: all nodes equal, ranks sum to 1") {
    val r = ranks(Seq("a" -> "b", "b" -> "c", "c" -> "a"))
    assert(r.size === 3)
    assert(r.values.toSet.size === 1)
    assert(math.abs(r.values.sum - 1.0) < 1e-4)
  }

  test("star graph: the hub outranks every leaf") {
    val leaves = Seq("l1", "l2", "l3", "l4")
    val edges = leaves.flatMap(l => Seq(l -> "hub", "hub" -> l))
    val r = ranks(edges)
    assert(leaves.forall(l => r("hub") > r(l)))
    assert(math.abs(r.values.sum - 1.0) < 1e-4)
  }

  test("dangling node: mass is redistributed, ranks still sum to 1") {
    // d has no out-edges; without redistribution total rank decays
    val r = ranks(Seq("a" -> "b", "b" -> "a", "a" -> "d"))
    assert(r.size === 3)
    assert(math.abs(r.values.sum - 1.0) < 1e-4)
    assert(r("d") > 0)
  }

  test("a node linked by the hub beats one linked by a leaf only") {
    // hub collects from 3 leaves, then links x; y is linked by one leaf
    val edges = Seq("l1" -> "hub", "l2" -> "hub", "l3" -> "hub",
      "hub" -> "x", "l1" -> "y", "x" -> "l1", "y" -> "l2")
    val r = ranks(edges)
    assert(r("x") > r("y"))
  }

  test("bad arguments fail fast") {
    import spark.implicits._
    val e = Seq("a" -> "b").toDF("src", "dst")
    intercept[IllegalArgumentException](Graph.pageRank(e, 0))
    intercept[IllegalArgumentException](Graph.pageRank(e, 51))
    intercept[IllegalArgumentException](Graph.pageRank(e, 5, damping = 1.0))
    intercept[IllegalArgumentException](Graph.labelPropagation(e, 0))
  }

  private def labels(edges: Seq[(String, String)], iters: Int)
      : Map[String, String] = {
    import spark.implicits._
    // undirected semantics: pass each edge both ways
    val sym = edges ++ edges.map(_.swap)
    Graph.labelPropagation(sym.toDF("src", "dst"), iters)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  test("personalized pagerank with ALL nodes as seeds equals plain pagerank") {
    import spark.implicits._
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c", "d" -> "a")
      .toDF("src", "dst")
    val allNodes = Seq("a", "b", "c", "d").toDF("node")
    val plain = Graph.pageRank(edges, 5)
    val ppr = Graph.personalizedPageRank(edges, allNodes, 5)
    assert(ppr.exceptAll(plain).isEmpty && plain.exceptAll(ppr).isEmpty)
  }

  test("personalized pagerank: restart and dangling mass flow only to the seeds") {
    import spark.implicits._
    // a <-> b, seed = {a}: hand-unrolled round 1 — a keeps only its
    // restart mass (150000 micro), b receives a's full damped rank
    val edges = Seq("a" -> "b", "b" -> "a").toDF("src", "dst")
    val r = Graph.personalizedPageRank(edges, Seq("a").toDF("node"), 1)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r === Map("a" -> 0.15, "b" -> 0.85))
    assert(math.abs(r.values.sum - 1.0) < 1e-4)
    // seeds outside the graph are ignored; none inside fails loudly
    assert(intercept[IllegalArgumentException](
      Graph.personalizedPageRank(edges, Seq("zz").toDF("node"), 1))
      .getMessage.contains("no seed"))
  }

  test("personalized pagerank: proximity to the seed beats global popularity") {
    import spark.implicits._
    // hub is globally popular (every leaf links it); 'near' is linked
    // FROM the seed only. Personalizing on the seed must rank 'near'
    // above a leaf that the seed never reaches directly.
    val edges = Seq("seed" -> "near", "near" -> "seed",
      "l1" -> "hub", "l2" -> "hub", "hub" -> "l1", "hub" -> "l2")
      .toDF("src", "dst")
    val r = Graph.personalizedPageRank(edges, Seq("seed").toDF("node"), 5)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("near") > r("hub") && r("near") > r("l1"))
  }

  test("weighted pagerank: unit weights reduce to plain pagerank bit-exactly") {
    import spark.implicits._
    val plainEdges = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c", "d" -> "a")
      .toDF("src", "dst")
    val unit = plainEdges.withColumn("w",
      org.apache.spark.sql.functions.lit(1L))
    val plain = Graph.pageRank(plainEdges, 5)
    val weighted = Graph.pageRankWeighted(unit, 5)
    assert(weighted.exceptAll(plain).isEmpty && plain.exceptAll(weighted).isEmpty)
  }

  test("weighted pagerank: rank follows the heavy edge") {
    import spark.implicits._
    // hub splits 9:1 between x and y; x must outrank y (symmetric
    // otherwise: both return all mass to hub)
    val edges = Seq(
      ("hub", "x", 9L), ("hub", "y", 1L),
      ("x", "hub", 1L), ("y", "hub", 1L)
    ).toDF("src", "dst", "w")
    val r = Graph.pageRankWeighted(edges, 5)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("x") > r("y"), s"weighted split must favor x: $r")
    assert(math.abs(r.values.sum - 1.0) < 1e-4)
  }

  test("hits: one hand-unrolled round — authorities from hubs, hubs from NEW authorities") {
    import spark.implicits._
    // l1..l3 -> a, a -> b. Round 1: auth raw a=3e6, b=1e6 (max 3e6) =>
    // auth a=1.0, b=0.333333; hub raw l*=auth(a)=1e6, a=auth(b)=333333
    // (max 1e6) => hub l*=1.0, a=0.333333; b has no out-edges => hub 0.
    val edges = Seq("l1" -> "a", "l2" -> "a", "l3" -> "a", "a" -> "b")
      .toDF("src", "dst")
    val r = Graph.hits(edges, 1).collect()
      .map(x => x.getString(0) -> (x.getDouble(1), x.getDouble(2))).toMap
    assert(r("a") === ((1.0, 0.333333)))
    assert(r("b") === ((0.333333, 0.0)))
    Seq("l1", "l2", "l3").foreach(l => assert(r(l) === ((0.0, 1.0))))
  }

  test("hits: deterministic across runs, maxima pinned at 1.0, empty graph fails fast") {
    import spark.implicits._
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c", "d" -> "a")
      .toDF("src", "dst")
    val one = Graph.hits(edges, 3)
    val two = Graph.hits(edges, 3)
    assert(one.exceptAll(two).isEmpty && two.exceptAll(one).isEmpty)
    val rows = one.collect().map(x => (x.getDouble(1), x.getDouble(2)))
    assert(rows.map(_._1).max === 1.0 && rows.map(_._2).max === 1.0,
      "max-normalization must pin both maxima at exactly 1.0")
    assert(rows.forall { case (a, h) => a >= 0.0 && a <= 1.0 && h >= 0.0 && h <= 1.0 })
    assert(intercept[IllegalArgumentException](
      Graph.hits(Seq.empty[(String, String)].toDF("src", "dst"), 3))
      .getMessage.contains("empty edge list"))
  }

  test("hits tol: a converged graph early-exits with the full-iters result") {
    import spark.implicits._
    // the l*->a star converges after round 1 (scores repeat exactly),
    // so tol=0 must stop early with output identical to 10 fixed rounds
    val edges = Seq("l1" -> "a", "l2" -> "a", "l3" -> "a").toDF("src", "dst")
    val fixed = Graph.hits(edges, 10)
    val early = Graph.hits(edges, 10, tol = Some(0.0))
    assert(early.exceptAll(fixed).isEmpty && fixed.exceptAll(early).isEmpty)
  }

  test("label propagation: two cliques joined by one bridge keep distinct communities") {
    def clique(ns: Seq[String]) =
      for { a <- ns; b <- ns if a < b } yield a -> b
    val edges = clique(Seq("a1", "a2", "a3", "a4")) ++
      clique(Seq("b1", "b2", "b3", "b4")) :+ ("a1" -> "b1")
    val l = labels(edges, 4)
    assert(Seq("a2", "a3", "a4").map(l).toSet.size === 1,
      s"a-clique fragmented: $l")
    assert(Seq("b2", "b3", "b4").map(l).toSet.size === 1,
      s"b-clique fragmented: $l")
    assert(l("a2") !== l("b2"), s"cliques merged across the bridge: $l")
  }

  test("pagerank tol: a converged graph early-exits with the full-iters result") {
    import spark.implicits._
    // a symmetric cycle's uniform ranks are an exact fixed point of the
    // integer-micro iteration, so round 1 moves nothing and tol=0 stops
    // there — and the output must equal running all 10 fixed rounds
    val e = Seq("a" -> "b", "b" -> "c", "c" -> "a").toDF("src", "dst")
    val early = Graph.pageRank(e, 10, tol = Some(0.0)).collect().toSet
    val full = Graph.pageRank(e, 10).collect().toSet
    assert(early === full)
  }

  test("pagerank tol: a tol above max possible movement stops after exactly one round") {
    import spark.implicits._
    // sum|delta rank| <= 2 always (each round's ranks sum to ~1), so
    // tol=2 accepts round 1's movement: output == the fixed-1-round run
    val leaves = Seq("l1", "l2", "l3", "l4")
    val edges = leaves.flatMap(l => Seq(l -> "hub", "hub" -> l)).toDF("src", "dst")
    val one = Graph.pageRank(edges, 1).collect().toSet
    val early = Graph.pageRank(edges, 10, tol = Some(2.0)).collect().toSet
    val full = Graph.pageRank(edges, 10).collect().toSet
    assert(early === one)
    assert(full !== one, "star graph must still be moving after round 1, " +
      "or this test pins nothing")
  }

  test("label propagation tolChanged: stability stop equals the fixed-iters result") {
    import spark.implicits._
    def clique(ns: Seq[String]) =
      for { a <- ns; b <- ns if a < b } yield a -> b
    val edges = clique(Seq("a1", "a2", "a3", "a4")) ++
      clique(Seq("b1", "b2", "b3", "b4")) :+ ("a1" -> "b1")
    val sym = (edges ++ edges.map(_.swap)).toDF("src", "dst")
    val early = Graph.labelPropagation(sym, 10, tolChanged = Some(0L))
      .collect().toSet
    val full = Graph.labelPropagation(sym, 10).collect().toSet
    assert(early === full)
    // a tolerance at the node count accepts any round: exactly one runs
    val one = Graph.labelPropagation(sym, 1).collect().toSet
    assert(Graph.labelPropagation(sym, 10, tolChanged = Some(8L))
      .collect().toSet === one)
  }

  test("triangles: clique saturates lcc at 1, stars stay at 0, direction and " +
      "duplicates are normalized away") {
    import spark.implicits._
    // K4 on a..d (each node: degree 3, 3 triangles, lcc 1.0) plus a star
    // center s with leaves l1..l3 (degree 3, no triangles) plus a pendant
    // p hanging off a — fed with mixed directions, a duplicate edge, and
    // a self-loop, all of which must normalize away
    val edges = Seq(
      "a" -> "b", "b" -> "a", "a" -> "c", "a" -> "d",
      "b" -> "c", "c" -> "d", "d" -> "b",
      "s" -> "l1", "l2" -> "s", "s" -> "l3",
      "a" -> "p", "p" -> "p"
    ).toDF("src", "dst")
    val out = Graph.triangles(edges).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out("a") === ((4L, 3L, 0.5)),     "a: K4 plus the pendant edge")
    assert(out("b") === ((3L, 3L, 1.0)))
    assert(out("c") === ((3L, 3L, 1.0)))
    assert(out("d") === ((3L, 3L, 1.0)))
    assert(out("s") === ((3L, 0L, 0.0)),     "star center: degree 3, no closure")
    assert(out("l1") === ((1L, 0L, 0.0)),    "degree-1 node: lcc pinned 0.0")
    assert(out("p") === ((1L, 0L, 0.0)),     "self-loop dropped, pendant stays")
    assert(out.size === 9)
    // global count: K4 has C(4,3) = 4 triangles, nothing else closes —
    // per-node credits sum to 3 × 4
    assert(out.values.map(_._2).sum === 12L)
  }

  test("k-core: peeling cascades down a chain into the triangle core; " +
      "ceiling-rounds output equals the early-exit output") {
    import spark.implicits._
    // chain a-b-c-d grafted onto triangle t1-t2-t3 at t1: the 2-core is
    // exactly the triangle, reached only by CASCADE (a drops, THEN b
    // becomes a leaf, ...) — a plain degree>=2 filter would keep b, c, d
    val edges = Seq(
      "a" -> "b", "b" -> "c", "c" -> "d", "d" -> "t1",
      "t1" -> "t2", "t2" -> "t3", "t3" -> "t1"
    ).toDF("src", "dst")
    val core = Graph.kCore(edges, k = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(core === Map("t1" -> 2L, "t2" -> 2L, "t3" -> 2L))
    // iters at the exact cascade depth == generous ceiling (the
    // output-invariance that lets a fixed-round oracle replay the
    // early exit)
    val tight = Graph.kCore(edges, k = 2, iters = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tight === core)
    // no 3-core anywhere: empty result is an answer, not an error
    assert(Graph.kCore(edges, k = 3).count() === 0L)
    assert(intercept[IllegalArgumentException](
      Graph.kCore(edges, k = 0)).getMessage.contains("k >= 1"))
  }

  test("label propagation: ties break to the smallest label, isolated nodes keep theirs") {
    import spark.implicits._
    // z hears exactly one vote each from a and b: tie → min label "a".
    // i -> i only gives i an in-neighbor vote from itself.
    val e = Seq("a" -> "z", "b" -> "z", "i" -> "i").toDF("src", "dst")
    val l = Graph.labelPropagation(e, 1)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(l("z") === "a")
    assert(l("i") === "i")
    // a and b have no in-edges: they keep their own labels
    assert(l("a") === "a" && l("b") === "b")
  }

  test("k-core status: converged path reports true; an iteration ceiling " +
      "mid-cascade reports false and a superset of the true core") {
    import spark.implicits._
    // chain c1..c6 grafted onto a triangle: each chain node peels one
    // round at a time (the slowest possible cascade), so the true
    // 2-core (the triangle) needs 6 peel rounds + 1 stable round
    val chain = (1 until 6).map(i => s"c$i" -> s"c${i + 1}")
    val edges = (chain ++ Seq("c6" -> "t1",
      "t1" -> "t2", "t2" -> "t3", "t3" -> "t1")).toDF("src", "dst")
    val (full, conv) = Graph.kCoreWithStatus(edges, k = 2, iters = 10)
    assert(conv, "a generous ceiling must report convergence")
    assert(full.collect().map(_.getString(0)).toSet === Set("t1", "t2", "t3"))
    // ceiling cuts the cascade after 2 rounds: NOT converged, and the
    // result is a strict superset of the true core (partial peel)
    val (part, conv2) = Graph.kCoreWithStatus(edges, k = 2, iters = 2)
    assert(!conv2, "a mid-cascade ceiling must report non-convergence")
    val nodes = part.collect().map(_.getString(0)).toSet
    assert(Set("t1", "t2", "t3").subsetOf(nodes) && nodes.size > 3,
      s"truncated peel must be a superset of the core, got $nodes")
    // the convenience wrapper returns the same frame either way
    assert(Graph.kCore(edges, k = 2, iters = 2)
      .collect().map(_.getString(0)).toSet === nodes)
  }

  test("co-occurrence edges: pairs within a container, src < dst, " +
      "deduped across containers; an oversized container fails LOUDLY " +
      "with its key named") {
    import spark.implicits._
    val df = Seq(
      ("o1", "p1"), ("o1", "p2"), ("o1", "p3"),
      ("o2", "p2"), ("o2", "p3"), // repeats the (p2,p3) pair
      ("o3", "p9"), (null, "p1"), ("o4", null)
    ).toDF("o", "p")
    val edges = Graph.coOccurrenceEdges(df, "o", "p")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(edges === Set(("p1", "p2"), ("p1", "p3"), ("p2", "p3")))
    // cap = 2: o1 holds 3 items → in-plan raise_error names the key
    val ex = intercept[Exception] {
      Graph.coOccurrenceEdges(df, "o", "p", maxItemsPerContainer = 2)
        .collect()
    }
    val msg = Option(ex.getMessage).getOrElse("") +
      Option(ex.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("coOccurrenceEdges") && msg.contains("o1"),
      s"refusal must name the operator and the offending key, got: $msg")
    // the guard must SURVIVE downstream null-filters (triangles pushes
    // IsNotNull into the union branch — a foldable null column there
    // would let Catalyst prune the guard without evaluating it)
    val ex2 = intercept[Exception] {
      Graph.triangles(
        Graph.coOccurrenceEdges(df, "o", "p", maxItemsPerContainer = 2))
        .collect()
    }
    val msg2 = Option(ex2.getMessage).getOrElse("") +
      Option(ex2.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg2.contains("coOccurrenceEdges"),
      s"guard must survive composition through triangles, got: $msg2")
    assert(intercept[IllegalArgumentException](
      Graph.coOccurrenceEdges(df, "o", "p", maxItemsPerContainer = 1))
      .getMessage.contains("maxItemsPerContainer"))
  }

  test("bfs depth: hop distances from the seed set; unreached nodes " +
      "absent; empty-frontier early exit equals the fixed-round run") {
    import spark.implicits._
    // two components: a->b->c->d reachable, x->y not; edge into the
    // seed (e->a) does not pull e in (direction matters)
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "d", "e" -> "a",
      "x" -> "y").toDF("src", "dst")
    val seeds = Seq("a").toDF("node")
    val d = Graph.bfsDepth(edges, seeds, iters = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d === Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 3L))
    // output-invariance: frontier empties after round 3, so the
    // generous ceiling equals the exact-depth run bit for bit
    val tight = Graph.bfsDepth(edges, seeds, iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tight === d)
    // a second seed merges by MIN distance; a seed off the edge
    // relation still reports itself at 0
    val d2 = Graph.bfsDepth(edges, Seq("a", "c", "lone").toDF("node"), 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d2 === Map("a" -> 0L, "b" -> 1L, "c" -> 0L, "d" -> 1L,
      "lone" -> 0L))
    // iters bounds reach: one round from 'a' reaches only b
    val d1 = Graph.bfsDepth(edges, seeds, iters = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d1 === Map("a" -> 0L, "b" -> 1L))
    intercept[IllegalArgumentException](
      Graph.bfsDepth(edges, Seq.empty[String].toDF("node"), 5))
  }

  test("adamic-adar: exact hand scores on a 4-cycle, existing edges " +
      "excluded, the degree cap drops signal-free hub centers") {
    import spark.implicits._
    // square 1-2-3-4-1: the only absent pairs are the diagonals, each
    // with two degree-2 common neighbors -> score 2 * round(1/ln 2, 6)
    val square = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L)
      .toDF("src", "dst")
    val aa = Graph.adamicAdar(square, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val w2 = BigDecimal(1.0 / math.log(2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(aa === Map((1L, 3L) -> 2 * w2, (3L, 1L) -> 2 * w2,
      (2L, 4L) -> 2 * w2, (4L, 2L) -> 2 * w2),
      s"only the diagonals predict, with exact hand scores: $aa")
    // graft hub 9 onto every node: as a CENTER it closes (1,3) too,
    // but over the cap it is dropped and only 2, 4 contribute
    val hub = (square.collect().map(r => (r.getLong(0), r.getLong(1)))
      ++ Seq(9L -> 1L, 9L -> 2L, 9L -> 3L, 9L -> 4L))
      .toSeq.toDF("src", "dst")
    def score(cap: Int): Double =
      Graph.adamicAdar(hub, k = 10, maxDegree = cap)
        .filter("node = 1 AND candidate = 3")
        .collect().head.getDouble(2)
    val w3 = BigDecimal(1.0 / math.log(3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val w4 = BigDecimal(1.0 / math.log(4))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(score(10) - (2 * w3 + w4)) < 1e-9,
      "uncapped: 2, 4 (deg 3) and hub 9 (deg 4) all close (1,3)")
    assert(math.abs(score(3) - 2 * w3) < 1e-9,
      "cap 3: the hub center is dropped, only 2 and 4 contribute")
    intercept[IllegalArgumentException](Graph.adamicAdar(square, 0))
    intercept[IllegalArgumentException](
      Graph.adamicAdar(square, 1, maxDegree = 1))
    // sizeShuffle = false: identical scores, plan construction runs no
    // sizing job (lazily composable on the session default partitioning)
    val lazyAa = Graph.adamicAdar(square, k = 5, sizeShuffle = false)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(lazyAa === aa, "sizeShuffle=false must not change scores")
  }

  test("weighted shortest paths: a cheap 2-hop beats the expensive " +
      "direct edge; early exit equals fixed rounds; negative weights " +
      "refused") {
    import spark.implicits._
    // a->b direct costs 10; a->c->b costs 1+2=3 (found in round 2,
    // IMPROVING b's round-1 dist of 10 — the relaxation update path)
    val edges = Seq(("a", "b", 10L), ("a", "c", 1L), ("c", "b", 2L),
      ("x", "y", 1L)).toDF("src", "dst", "w")
    val seeds = Seq("a").toDF("node")
    val d = Graph.shortestPaths(edges, seeds, iters = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d === Map("a" -> 0L, "b" -> 3L, "c" -> 1L),
      s"relaxation must improve b from 10 to 3: $d")
    // output-invariance: converged by round 2, so ceiling == exact
    val tight = Graph.shortestPaths(edges, seeds, iters = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tight === d)
    // one round sees only the direct relaxations
    val one = Graph.shortestPaths(edges, seeds, iters = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(one === Map("a" -> 0L, "b" -> 10L, "c" -> 1L))
    // zero-weight edges are legal (a tie the min-merge resolves)
    val z = Graph.shortestPaths(
      Seq(("a", "b", 0L)).toDF("src", "dst", "w"), seeds, 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(z === Map("a" -> 0L, "b" -> 0L))
    assert(intercept[IllegalArgumentException](
      Graph.shortestPaths(Seq(("a", "b", -1L)).toDF("src", "dst", "w"),
        seeds, 3)).getMessage.contains("negative"))
  }

  test("degree profile: histogram collapses duplicates/direction/self-loops; " +
      "a star is perfectly disassortative, a regular ring has no correlation") {
    import spark.implicits._
    // star (hub h, 3 leaves) + noise: reversed dup, self-loop, exact dup
    val star = Seq(("h", "x"), ("x", "h"), ("h", "y"), ("h", "z"),
      ("h", "h"), ("h", "y")).toDF("src", "dst")
    val hist = Graph.degreeHistogram(star)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist === Map(1L -> 3L, 3L -> 1L),
      "3 leaves at degree 1, the hub at 3 — noise rows collapse")
    val r = Graph.assortativity(star).head()
    assert(r.getLong(0) === 6L, "3 undirected edges -> 6 directed")
    assert(r.getDouble(1) === -1.0,
      "every edge joins the hub to a leaf: perfectly disassortative")
    // a 4-ring is 2-regular: zero degree variance -> undefined (null)
    val ring = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
      .toDF("src", "dst")
    assert(Graph.assortativity(ring).head().isNullAt(1),
      "no degree variance -> no defined correlation")
  }
}
