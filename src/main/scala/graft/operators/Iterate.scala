package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage control for iterative loops (PageRank, label propagation,
  * connected components, funnel stages): every round must truncate its
  * growing plan, but HOW to truncate is a deployment decision, not an
  * algorithm decision.
  *
  *  - `localCheckpoint` materializes to executor-local block storage —
  *    fast (no distributed-FS write) and the right default on local[32],
  *    but it FORFEITS fault recovery: the checkpointed blocks live only
  *    on the executors that computed them, so on a real cluster a single
  *    executor loss mid-iteration kills the whole multi-hour job.
  *  - reliable `checkpoint()` writes the rows to the SparkContext's
  *    checkpoint directory (HDFS / object store on a cluster) — each
  *    round pays a distributed write, and in exchange any executor can
  *    rebuild any partition after a loss.
  *
  * [[checkpoint]] picks automatically: if the caller has set a checkpoint
  * directory (`spark.sparkContext.setCheckpointDir(...)` — the explicit
  * opt-in a 100 TB deployment makes anyway), rounds checkpoint reliably;
  * otherwise they fall back to `localCheckpoint`. Loops therefore need no
  * extra parameter, and the same operator code is fault-tolerant on a
  * cluster and fast in local mode (IterateSpec exercises both paths).
  *
  * Reliable-mode housekeeping: Spark does NOT delete reliable
  * checkpoint files on its own unless
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true`, so an
  * N-round loop leaves up to N materialized copies of its (keys-sized)
  * iteration frame under the checkpoint dir for the app's lifetime.
  * Deployments should enable that cleaner flag (older rounds' frames
  * are unreferenced as soon as the next round materializes) or point
  * the checkpoint dir at a TTL'd/job-scoped path — the frames are the
  * small rank/label relations, never the corpus, so this is a
  * housekeeping concern, not a data-volume one.
  */
object Iterate {

  /** Truncate `df`'s lineage at an iteration boundary: reliable
    * `checkpoint(eager)` when the SparkContext has a checkpoint dir set,
    * `localCheckpoint(eager)` otherwise. */
  def checkpoint(df: DataFrame, eager: Boolean = true): DataFrame = {
    val cp =
      if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
        df.checkpoint(eager)
      else df.localCheckpoint(eager)
    // the checkpoint SNAPSHOTS the child plan's estimated Statistics —
    // in an iterative loop those estimates compound round over round
    // (and square under a self-join) until the driver drowns in
    // BigInteger arithmetic; clamp them far above every broadcast
    // threshold (see GraftSqlBridge.capCheckpointStats)
    org.apache.spark.sql.graftbridge.GraftSqlBridge.capCheckpointStats(cp)
  }
}
