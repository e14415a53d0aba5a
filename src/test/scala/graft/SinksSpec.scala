package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sinks

class SinksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("date-partitioned sink: layout on disk + partition pruning on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("order_day", date_format(col("o_orderdate"), "yyyy-MM-dd"))
    Sinks.partitionedParquet(orders, s"$dir/orders", "order_day")

    val dirs = new java.io.File(s"$dir/orders").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("order_day=")))

    val day = dirs.head.stripPrefix("order_day=")
    val pruned = spark.read.parquet(s"$dir/orders")
      .filter(col("order_day") === day)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("order_day"), s"no partition pruning in plan:\n$plan")
    assert(pruned.count() ===
      orders.filter(col("order_day") === day).count())
  }
}
