package graft.operators

import org.apache.spark.network.util.JavaUtils
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Parallelism helpers shared by the CPU-heavy operators. */
private[graft] object Par {
  /** Spread a small CPU-heavy input across all cores — but ONLY when the
    * input is actually under-parallel: a tiny parquet file arrives as ONE
    * split, serializing downstream hashing/scoring work, and that's the
    * case this fixes. An input that already has enough splits (the normal
    * state at real scale, where 100 TB arrives as hundreds of thousands of
    * them) passes through untouched — an unconditional repartition here
    * would insert a full shuffle of the corpus before map-only work that
    * AQE would never have needed.
    *
    * The split count is estimated from the OPTIMIZED LOGICAL plan's file
    * scan leaves (replaying Spark's own `FilePartition.maxSplitBytes`
    * arithmetic), never from `df.rdd`: converting a frame to an RDD under
    * AQE can eagerly materialize query stages — running real shuffle
    * jobs — and compiles a second physical plan per call. Plan inspection
    * runs no job at all. Frames whose plan is anything richer than
    * project/filter/generate over scans (a join, an aggregate, an explicit
    * repartition…) pass through unchanged: their parallelism is set by
    * shuffle partitioning, which AQE already right-sizes, and second-
    * guessing it here would fight the optimizer. The explicit partition
    * count on the repartition that does fire is preserved by AQE (it only
    * coalesces un-numbered exchanges). */
  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val plan = df.queryExecution.optimizedPlan
    def allowed(n: LogicalPlan): Boolean = n match {
      case _: Project | _: Filter | _: Generate | _: SubqueryAlias => true
      case _: LogicalRelation | _: LocalRelation | _: OneRowRelation | _: Range => true
      // localCheckpoint materializes to a LogicalRDD leaf — without this
      // case a checkpointed input (e.g. Curation's exact-dedup survivors)
      // silently made spread() a no-op, leaving CPU-heavy downstream work
      // at whatever partitioning the checkpoint captured (possibly
      // AQE-coalesced to 1). Its partition count is a stored property of
      // the already-materialized RDD — reading it runs no job.
      case _: LogicalRDD => true
      case _ => false
    }
    if (plan.find(n => !allowed(n)).isDefined) return df
    def bytesOf(key: String, dflt: String): Long =
      JavaUtils.byteStringAsBytes(spark.conf.get(key, dflt))
    val maxPart = bytesOf("spark.sql.files.maxPartitionBytes", "128MB")
    val openCost = bytesOf("spark.sql.files.openCostInBytes", "4MB")
    var totalBytes = 0L
    var nFiles = 0L
    var rangeSplits = 0L
    plan.foreach {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          totalBytes += fs.location.sizeInBytes
          nFiles += math.max(1L, fs.location.inputFiles.length.toLong)
        case _ => nFiles += 1L
      }
      case r: Range => rangeSplits += r.numSlices.getOrElse(target).toLong
      case rdd: LogicalRDD => rangeSplits += rdd.rdd.getNumPartitions.toLong
      case _: LocalRelation | _: OneRowRelation => nFiles += 1L
      case _ => ()
    }
    // Spark's own split sizing: bin-packs files into partitions of
    // min(maxPartitionBytes, max(openCost, bytes/core)) — the estimate
    // errs LOW for many tiny files (they pack by openCost), which errs
    // toward spreading, the safe direction for a CPU-bound consumer
    val padded = totalBytes + nFiles * openCost
    val maxSplit = math.min(maxPart, math.max(openCost, padded / math.max(1, target)))
    val fileSplits = if (padded == 0) 0L else math.ceil(padded.toDouble / maxSplit).toLong
    if (fileSplits + rangeSplits >= target) df else df.repartition(target)
  }
}
