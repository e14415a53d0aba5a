package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators. AQE's skew-join handling covers joins at
  * runtime; for aggregations over pathologically hot keys (a handful of
  * grouping values receiving most rows — exactly the lineitem
  * returnflag/linestatus shape at 100 TB) the classic fix is two-phase
  * salted aggregation: spray each hot key across `saltBuckets` partial
  * groups, aggregate, then aggregate the partials. Works for any
  * algebraic aggregate (sum/count/min/max); results are identical to the
  * direct groupBy because the combine is associative.
  */
object Skew {

  /** Two-phase aggregation. `aggs` is (column, phase1 aggregate, phase2
    * combiner of the partials); each entry reads and writes the same
    * column name (pre-select/rename inputs accordingly).
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltBuckets: Int,
      aggs: Seq[(String, Column => Column, Column => Column)]): DataFrame = {
    val salted = df.withColumn("graft_salt", contentSalt(df, saltBuckets))
    val p1 = aggs.map { case (c, f, _) => f(col(c)).as(c) }
    val p2 = aggs.map { case (c, _, g) => g(col(c)).as(c) }
    salted
      .groupBy((keys.map(col) :+ col("graft_salt")): _*)
      .agg(p1.head, p1.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(p2.head, p2.tail: _*)
  }

  /** Salted shuffle join for a hot-keyed fact table when the other side is
    * too big to broadcast: the fact side picks a salt in [0, saltBuckets)
    * (from its partition/offset — any distribution works, the salt never
    * reaches the output), the dim side replicates once per salt, and the
    * join key becomes (key, salt) — a single hot key now lands on
    * `saltBuckets` reducers instead of one. Results are exactly the plain
    * join's: every fact row still meets every dim row of its key. This is
    * the manual fallback when AQE's skew-join splitting can't apply (e.g.
    * the skewed side is the output of an aggregation AQE won't re-split).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltBuckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("graft_salt", contentSalt(fact, saltBuckets))
    val replicatedDim = dim.withColumn("graft_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFact.join(replicatedDim, Seq(key, "graft_salt")).drop("graft_salt")
  }

  /** Salt derived from row CONTENT, never from physical placement:
    * `spark_partition_id()`/`monotonically_increasing_id()` change when a
    * lost map task recomputes with a different row order — exactly the
    * SPARK-23207 class of duplicated/lost rows on stage retry, and the
    * salted inputs here are typically aggregation outputs where retry
    * reordering is real. Content hashing is retry-stable; the one caveat
    * (fully identical rows share a salt) only matters when a hot key's
    * rows are literal duplicates across every column, in which case a
    * prior dedup/aggregate is the actual fix.
    *
    * Only hash()-eligible columns feed the salt: `hash` rejects MapType
    * (anywhere in a nested type) at analysis, so a frame carrying a map
    * column would fail before the job starts even though the other
    * columns distribute rows perfectly well. A frame with NO hashable
    * column fails fast with a real message instead of an analysis error. */
  private def contentSalt(df: DataFrame, saltBuckets: Int): Column = {
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    val cols = df.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name))
    require(cols.nonEmpty,
      s"contentSalt: no hash()-eligible column in [${df.schema.fields.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ")}] — " +
        "pass a frame with at least one non-map column (or pre-derive a salt source)")
    pmod(hash(cols.toSeq: _*), lit(saltBuckets)).cast("int")
  }
}
