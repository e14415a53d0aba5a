package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query: a Spark implementation plus an optional
  * DuckDB-runnable ANSI-SQL oracle computing the same result over the same
  * parquet tables. Queries with no relational equivalent omit the oracle
  * (the driver then records a weaker rows-only check).
  *
  * Column names MUST match between `spark` and `oracle` — the driver's
  * compare sorts columns by name before hashing values.
  */
final case class Q(
    name: String,
    spark: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** A group of related operator queries (one per SURVEY.md §2 row). */
trait QueryPack {
  def queries: Seq[Q]
}
