package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: empirical scaling probe (the SCALE.md "Measured scaling"
  * harness, committed this round so the numbers are reproducible).
  *
  * Corpus mode — `runMain graft.tools.ScaleProbe q_d14_span_dedup,q_x17_pii_redact`:
  * amplifies the sf0.1 documents corpus ×1/×4/×16 with TOKEN-SALTED
  * copies (copy k prefixes every token with `c<k>`, so cross-copy
  * shingles/spans never collide and the dup structure stays constant —
  * plain duplication would grow candidate pairs quadratically in the
  * copy count, an artifact of duplication, not scale), then runs each
  * named registered query with a full warmup pass + min-of-2, same
  * protocol as Bench.
  *
  * ETL mode — `runMain graft.tools.ScaleProbe etl`: end-to-end
  * MigrationPipeline.run over generated fixtures at 12.5k/25k/100k
  * customers (distributed mode, unique-id fast path).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    if (args.headOption.contains("etl")) {
      import graft.etl.{MigrationFixture, MigrationPipeline}
      Seq(12500, 25000, 100000).foreach { n =>
        val fx = MigrationFixture.ensure(s"target/scaleprobe/etl$n", n, files = 8)
        def run(): Double = time {
          MigrationPipeline.run(spark, MigrationPipeline.MigrationConfig(
            csvPath = fx.csvPath, xmlPath = fx.xmlDir,
            outDir = s"target/scaleprobe/etl$n-out", runId = "probe",
            runDate = "2026-01-01", todayIso = "2026-01-01T00:00:00+00:00",
            strictDuplicateSemantics = false, singleFile = false))
        }
        run() // warmup
        println(f"[scaleprobe] etl n=$n%-7d ${math.min(run(), run())}%.2f s")
      }
      spark.stop(); return
    }

    val qnames = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("q_d14_span_dedup"))
    Seq(1, 4, 16).foreach { f =>
      val dir = s"target/scaleprobe/x$f"
      val marker = new java.io.File(s"$dir/.done")
      if (!marker.exists) {
        amplify(spark, "/root/testdata/sf0.1", dir, f)
        marker.createNewFile()
      }
      qnames.foreach { q =>
        def run(): Double = time {
          graft.SparkEntry.queries(q)(spark, dir)
            .write.format("noop").mode("overwrite").save()
        }
        run() // warmup
        println(f"[scaleprobe] x$f%-3d $q%-28s ${math.min(run(), run())}%.2f s")
      }
    }
    spark.stop()
  }

  /** Token-salted ×`f` amplification of `src/documents.parquet`. */
  private def amplify(spark: SparkSession, src: String, dst: String, f: Int): Unit = {
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val n = docs.agg(max(col("doc_id"))).head.getLong(0) + 1
    (0 until f).map { k =>
      docs.select(
        (col("doc_id") + lit(k * n)).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), "\\s+"),
          t => concat(lit(s"c$k"), t))).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
  }
}
