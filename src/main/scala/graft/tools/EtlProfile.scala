package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.etl.{CustomerXml, MigrationFixture, MigrationPipeline}

/** Dev tool: phase-by-phase timing of the migration ETL at bench scale. */
object EtlProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("ETL_PROFILE_LOG", "ERROR"))

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[etl-profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val fx = t("fixture gen")(MigrationFixture.ensure(s"target/bench-etl/prof$n", n, files = 8))
    val raw = CustomerXml.read(spark, fx.xmlDir)
    t("xml parse + count")(raw.count())
    t("xml parse again")(raw.count())
    val prepared = t("csv prepare")(MigrationPipeline.prepareCsv(
      MigrationPipeline.readCsv(spark, fx.csvPath)).cache())
    t("csv count")(prepared.count())
    val customers = MigrationPipeline.prepareCustomers(raw, strict = false)
    val matched = MigrationPipeline.coreJoin(customers, prepared)
    t("join + count")(matched.count())
    val transformed = t("transform plan")(MigrationPipeline.transformMatched(matched, "2026-01-01T00:00:00+00:00"))
    t("transform + noop")(transformed.write.format("noop").mode("overwrite").save())
    t("transform + noop again")(transformed.write.format("noop").mode("overwrite").save())

    val noN5 = MigrationPipeline.transformMatched(matched, "2026-01-01T00:00:00+00:00", withN5 = false)
    t("transform WITHOUT N5 + noop")(noN5.write.format("noop").mode("overwrite").save())
    import org.apache.spark.sql.{Encoders, Row}
    val idMap = matched.map((r: Row) => r)(Encoders.row(matched.schema))
    t("identity row-encoder map")(idMap.write.format("noop").mode("overwrite").save())
    val n5only = graft.operators.NestedOps.replaceNestedText(
      matched.withColumn("graft_old_id", trim(col("_id")))
        .withColumn("graft_new_id", col("new_customer_id")),
      "user", "graft_old_id", "graft_new_id",
      skipStructField = f => f.startsWith("_") && f != "_VALUE")
    t("N5 alone + noop")(n5only.write.format("noop").mode("overwrite").save())
    val outCols = CustomerXml.customerSchema.fields.map(f => col(s"`${f.name}`"))
    t("xml write")(CustomerXml.write(
      transformed.select(outCols.toIndexedSeq: _*),
      s"target/bench-etl/prof$n-out", "enfinity xmlns:dt=\"x\""))
    spark.stop()
  }
}
