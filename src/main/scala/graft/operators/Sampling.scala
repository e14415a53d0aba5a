package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-stable dataset splitting and downsampling for
  * training-data curation. Both derive a per-row bucket from
  * md5(salt|id), so
  *
  *  - a row's assignment depends only on its own id (stable under data
  *    growth, repartitioning, and re-runs — no RNG, no row order);
  *  - changing the salt re-rolls every assignment (new experiment);
  *  - md5 hex keeps the bucket reproducible across engines, so splits
  *    taken by this library agree with splits taken by any other md5
  *    implementation — including the DuckDB oracle.
  *
  * Map-only expressions: at 100 TB these run inside the scan's codegen
  * stage with zero shuffle.
  */
object Sampling {

  /** Bucket in [0, buckets) from the first 8 md5 hex chars of salt|id. */
  def hashBucket(id: Column, salt: String, buckets: Int = 100): Column =
    conv(substring(md5(concat(lit(s"$salt|"), id.cast("string"))), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Split label: buckets [0, trainPct) → train, [trainPct,
    * trainPct+valPct) → val, rest → test. */
  def splitLabel(id: Column, salt: String, trainPct: Int, valPct: Int): Column = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      "percentages must be within [0, 100]")
    val b = hashBucket(id, salt)
    when(b < trainPct, lit("train"))
      .when(b < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
  }

  /** Keep ~`pct`% of rows, deterministically by id. */
  def downsample(df: DataFrame, idCol: String, salt: String, pct: Int): DataFrame =
    df.filter(hashBucket(col(idCol), salt) < pct)
}
