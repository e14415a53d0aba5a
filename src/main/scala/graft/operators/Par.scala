package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism helpers shared by the CPU-heavy operators. */
private[graft] object Par {
  /** Spread a small CPU-heavy input across all cores — but ONLY when the
    * input is actually under-parallel: a tiny parquet file arrives as ONE
    * split, serializing downstream hashing/scoring work, and that's the
    * case this fixes. An input that already has enough splits (the normal
    * state at real scale, where 100 TB arrives as hundreds of thousands of
    * them) passes through untouched — an unconditional repartition here
    * would insert a full shuffle of the corpus before map-only work that
    * AQE would never have needed. The explicit partition count on the
    * repartition that does fire is preserved by AQE (it only coalesces
    * un-numbered exchanges). Checking partition count plans the physical
    * scan but runs no job. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target)
  }
}
