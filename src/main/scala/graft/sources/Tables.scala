package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Loaders for the driver-generated TPC-H-ish parquet testdata
  * (TESTDATA.md). Parquet scans are Catalyst-native: column pruning and
  * predicate pushdown reach the scan for free, so downstream queries
  * should select/filter as early as possible and let the optimizer prune.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** Normalize an events frame's `ts` to session-zone TimestampType
    * regardless of how the parquet was generated. The driver has shipped
    * two physical encodings across rounds: TIMESTAMP(NANOS) — no native
    * Spark type, read as a long via the legacy flag and truncated to
    * micros — and plain TIMESTAMP(MICROS) (isAdjustedToUTC=false), which
    * Spark surfaces as TIMESTAMP_NTZ. The session zone is pinned to UTC
    * everywhere, so casting NTZ → TIMESTAMP yields the same instants the
    * nanos path produced, and both agree with DuckDB's reading. */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType      => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TimestampType => df
    case _             => df.withColumn("ts", col("ts").cast(TimestampType))
  }

  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(load(s, d, "events"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
