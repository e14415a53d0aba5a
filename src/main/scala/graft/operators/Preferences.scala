package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise-preference aggregation — the RLHF-data side of the engine:
  * a preference corpus is billions of `(winner, loser)` judgments over a
  * SMALL candidate set (models, policies, prompt variants), and the
  * questions a training pipeline asks are "what is the aggregate
  * ranking?" and "is the data even consistent enough to rank?".
  *
  * Everything here reduces the corpus to the candidates² pairwise-count
  * relation in ONE hash aggregation and stays exact-integer from there —
  * the corpus is never joined row-to-row, and every number replays in a
  * relational oracle (no Elo sequential state, no Bradley-Terry floats;
  * Copeland is the deterministic tournament rule, and the literature's
  * standard first-cut aggregate).
  */
object Preferences {

  /** The majority tournament relation underlying both operators: per
    * ordered candidate pair `(a, b)` with at least one judgment in
    * either direction, the win counts both ways. One corpus-sized hash
    * aggregation to the pairs relation; everything downstream is
    * candidates²-sized. Self-preferences (winner = loser) and null
    * candidates are judgment errors — excluded, count them upstream. */
  private[graft] def pairCounts(prefs: DataFrame, winnerCol: String,
      loserCol: String): DataFrame = {
    val p = prefs
      .filter(col(winnerCol).isNotNull && col(loserCol).isNotNull &&
        col(winnerCol) =!= col(loserCol))
      .select(least(col(winnerCol), col(loserCol)).as("a"),
        greatest(col(winnerCol), col(loserCol)).as("b"),
        when(col(winnerCol) <= col(loserCol), 1L).otherwise(0L).as("__aw"))
    p.groupBy(col("a"), col("b"))
      .agg(sum(col("__aw")).as("wins_ab"),
        (count(lit(1)) - sum(col("__aw"))).as("wins_ba"))
  }

  /** Copeland aggregation of pairwise preferences: each candidate scores
    * 1 per opponent it MAJORITY-beats, ½ per exact tie, 0 per loss —
    * the deterministic, oracle-replayable tournament ranking (Elo
    * depends on judgment order; Bradley-Terry needs float iterations).
    * Scores are emitted in HALVES (`copeland_x2`) so ties stay exact
    * integers. Only pairs with at least one judgment count — a sparse
    * tournament ranks on the evidence it has; `n_opponents` says how
    * much evidence each candidate got (observability over a silently
    * dense-looking score). Returns
    * `(candidate, n_wins, n_ties, n_losses, n_opponents, copeland_x2)`. */
  def copelandScores(prefs: DataFrame, winnerCol: String,
      loserCol: String): DataFrame = {
    val pc = pairCounts(prefs, winnerCol, loserCol)
    val perSide = pc.select(col("a").as("candidate"),
        when(col("wins_ab") > col("wins_ba"), 1L).otherwise(0L).as("w"),
        when(col("wins_ab") === col("wins_ba"), 1L).otherwise(0L).as("t"))
      .unionAll(pc.select(col("b").as("candidate"),
        when(col("wins_ba") > col("wins_ab"), 1L).otherwise(0L).as("w"),
        when(col("wins_ab") === col("wins_ba"), 1L).otherwise(0L).as("t")))
    perSide.groupBy(col("candidate"))
      .agg(sum(col("w")).as("n_wins"), sum(col("t")).as("n_ties"),
        (count(lit(1)) - sum(col("w")) - sum(col("t"))).as("n_losses"),
        count(lit(1)).as("n_opponents"))
      .withColumn("copeland_x2", col("n_wins") * 2 + col("n_ties"))
  }

  /** Intransitivity audit — "can this preference data support a ranking
    * at all?": count the directed 3-cycles (a majority-beats b, b
    * majority-beats c, c majority-beats a) in the majority tournament.
    * A transitive tournament has zero; every cycle is a triple no
    * ranking can order, and a rising cycle share is the canonical
    * noisy-rater / prompt-dependent-preference signal. Ties contribute
    * no edge (they assert no direction). Cost: the corpus reduces to
    * the candidates²-bounded edge relation first, so the triple join is
    * candidates-cubed at WORST — candidate sets are models/variants
    * (tens), not corpus rows, and the audit refuses more than
    * `maxCandidates` of them rather than quietly running a big cube.
    * Returns one row `(n_candidates, n_edges, n_cycles)`. */
  def cycleAudit(prefs: DataFrame, winnerCol: String, loserCol: String,
      maxCandidates: Int = 1000): DataFrame = {
    val pc = pairCounts(prefs, winnerCol, loserCol).localCheckpoint()
    val nCand = pc.select(col("a").as("c"))
      .unionAll(pc.select(col("b").as("c"))).distinct().count()
    require(nCand <= maxCandidates,
      s"cycleAudit: $nCand candidates exceeds maxCandidates=" +
        s"$maxCandidates — the triple join is candidates-cubed; raise " +
        "the cap deliberately if the candidate set is really this big")
    val edges = pc
      .filter(col("wins_ab") =!= col("wins_ba"))
      .select(when(col("wins_ab") > col("wins_ba"), col("a"))
          .otherwise(col("b")).as("src"),
        when(col("wins_ab") > col("wins_ba"), col("b"))
          .otherwise(col("a")).as("dst"))
    val cycles = edges.as("e1")
      .join(edges.as("e2"), col("e1.dst") === col("e2.src"))
      .join(edges.as("e3"), col("e2.dst") === col("e3.src") &&
        col("e3.dst") === col("e1.src"))
      .count() / 3
    val sp = prefs.sparkSession
    import sp.implicits._
    Seq((nCand, edges.count(), cycles))
      .toDF("n_candidates", "n_edges", "n_cycles")
  }
}
