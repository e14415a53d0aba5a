package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism helpers shared by the CPU-heavy operators. */
private[graft] object Par {
  /** Spread a small CPU-heavy input across all cores: a tiny parquet file
    * arrives as ONE split, serializing downstream hashing/scoring work.
    * The explicit partition count is preserved by AQE (it only coalesces
    * un-numbered exchanges); at real scale inputs already arrive in many
    * splits and this is a cheap rebalance. */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}
