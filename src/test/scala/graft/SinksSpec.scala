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

  test("JSON lines round-trip: explicit-schema read returns the written rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-json").toString
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    Sinks.writeJsonl(orders, dir)
    // schema is explicit — JSON inference can flip types on sparse data
    val back = Sinks.readJsonl(spark, dir, orders.schema)
    assert(back.count() === orders.count())
    assert(back.exceptAll(orders).isEmpty && orders.exceptAll(back).isEmpty)
  }

  test("JSONL corpus round-trip: text survives gzip + escaping byte-exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Sinks.writeJsonl(docs, dir, compress = true)
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".json.gz")), files.mkString(","))
    val back = Sinks.readJsonl(spark, dir, docs.schema)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("ORC round-trip: rows survive and filters push to the ORC scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    Sinks.writeOrc(nation, s"$dir/nation")
    val back = Sinks.readOrc(spark, s"$dir/nation", nation.schema)
    assert(back.count() === nation.count())
    assert(back.exceptAll(nation).isEmpty && nation.exceptAll(back).isEmpty)
    val plan = back.filter(col("n_regionkey") === 1)
      .select("n_name").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("n_regionkey"),
      s"no pushdown into ORC scan:\n$plan")
  }

  test("sorted layout: disjoint key ranges per file (zone-map-prunable)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sorted").toString
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    graft.sources.Sinks.sortedParquet(orders, s"$dir/o", 4, "o_orderkey")
    // per-file key ranges must not overlap — that disjointness is what
    // lets parquet min/max stats skip whole files on a key filter
    val files = new java.io.File(s"$dir/o").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length >= 2, s"expected multiple range files, got ${files.length}")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("o_orderkey")), max(col("o_orderkey"))).head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2, s"overlap: $hi >= $lo2")
      case _ =>
    }
    // and the full table still round-trips
    assert(spark.read.parquet(s"$dir/o").count() === orders.count())
  }

  test("z-ordered layout: per-file ranges tighten on BOTH dimensions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity")
    graft.operators.ZOrder.zorderedParquet(li, s"$dir/li", 8, "l_orderkey", "l_partkey")

    val back = spark.read.parquet(s"$dir/li")
    assert(back.count() === li.count())
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty)

    val files = new java.io.File(s"$dir/li").listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(_.getPath)
    assert(files.length >= 4, s"expected several z-ordered files, got ${files.length}")
    def span(path: String, c: String): Double = {
      val r = spark.read.parquet(path).agg(min(col(c)), max(col(c))).head()
      (r.getLong(1) - r.getLong(0)).toDouble
    }
    def globalSpan(c: String): Double = {
      val r = li.agg(min(col(c)), max(col(c))).head()
      (r.getLong(1) - r.getLong(0)).toDouble
    }
    // a single-key sort gives per-file width ~= global/numFiles on ITS key
    // but ~= global on the other; z-order must tighten BOTH dimensions,
    // which is exactly what makes parquet min/max stats prune either
    // filter. Thresholds follow the Morton bit geometry at 8 files: the
    // top three key bits are (b15, a15, b14), so b (partkey) splits into
    // ~4 groups (ideal avg span ~0.3) while a (orderkey) only halves
    // (~0.58 ideal, plus octant-straddling files that span a fully) —
    // 0.5/0.85 leave real margin over the ideal, while still strictly
    // beating the ~1.0 the other-key-sorted layout gives each dimension
    val avgOrder = files.map(span(_, "l_orderkey")).sum / files.length
    val avgPart = files.map(span(_, "l_partkey")).sum / files.length
    assert(avgOrder < 0.85 * globalSpan("l_orderkey"),
      s"orderkey locality too loose: $avgOrder vs ${globalSpan("l_orderkey")}")
    assert(avgPart < 0.5 * globalSpan("l_partkey"),
      s"partkey locality too loose: $avgPart vs ${globalSpan("l_partkey")}")
  }

  test("bucketed tables join with zero exchanges (co-located join)") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    // metadata is session-scoped but the warehouse dir persists — clear both
    Seq("b_orders", "b_customer").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    graft.sources.Sinks.bucketedTable(orders, "b_orders", 8, "o_custkey")
    graft.sources.Sinks.bucketedTable(cust, "b_customer", 8, "c_custkey")
    // disable broadcast so the join strategy itself must avoid the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders").join(spark.table("b_customer"),
        col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() === orders.join(cust,
        orders("o_custkey") === cust("c_custkey")).count())
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("compaction: small files merge to the size target, data identical, partition dirs refused") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact").resolve("t")
    // 16 tiny files — the streaming-sink shape
    (1 to 1600).map(i => (i.toLong, s"row$i")).toDF("id", "s")
      .repartition(16).write.parquet(dir.toString)
    val before = spark.read.parquet(dir.toString)
      .collect().map(_.getLong(0)).toSet
    val (nBefore, nAfter) = graft.sources.Sinks.compactParquet(
      spark, dir.toString, targetBytes = 1L * 1024 * 1024)
    assert(nBefore === 16 && nAfter === 1,
      s"expected 16 -> 1 files, got $nBefore -> $nAfter")
    val after = spark.read.parquet(dir.toString)
      .collect().map(_.getLong(0)).toSet
    assert(after === before, "compaction must not change the data")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir.toString + ".retired")),
      "the retired originals must be cleaned up")
    // partitioned layouts are refused — compact each partition dir
    val pdir = java.nio.file.Files.createTempDirectory("compact-p").resolve("t")
    Seq((1L, "a"), (2L, "b")).toDF("id", "p")
      .write.partitionBy("p").parquet(pdir.toString)
    assert(intercept[IllegalArgumentException](
      graft.sources.Sinks.compactParquet(spark, pdir.toString))
      .getMessage.contains("partition subdirectories"))
  }

  test("swap recovery: an interrupted maintenance op heals on the next invocation") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("swap-recover")
    val dir = base.resolve("t").toString
    Seq((1L, "a"), (2L, "b")).toDF("k", "s").write.parquet(dir)
    // simulate a crash BETWEEN the two renames: data sits in .retired,
    // the live dir is gone, and a stale staged dir is half-written
    java.nio.file.Files.move(java.nio.file.Paths.get(dir),
      java.nio.file.Paths.get(dir + ".retired"))
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(dir + ".upserting"))
    // the next upsert recovers the original, then applies normally
    graft.sources.Sinks.upsertParquet(spark, dir,
      Seq((2L, "B"), (3L, "c")).toDF("k", "s"), Seq("k"))
    val got = spark.read.parquet(dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "a"), (2L, "B"), (3L, "c")),
      "recovery must restore the retired original before merging")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir + ".retired")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir + ".upserting")))
    // same crash simulated with the CURRENT dot-prefixed staging names
    java.nio.file.Files.move(java.nio.file.Paths.get(dir),
      base.resolve(".t.retired"))
    java.nio.file.Files.createDirectory(base.resolve(".t.upserting"))
    graft.sources.Sinks.upsertParquet(spark, dir,
      Seq((3L, "C")).toDF("k", "s"), Seq("k"))
    val got2 = spark.read.parquet(dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got2 === Set((1L, "a"), (2L, "B"), (3L, "C")),
      "hidden-name recovery must restore the retired original too")
    assert(!java.nio.file.Files.exists(base.resolve(".t.retired")))
    assert(!java.nio.file.Files.exists(base.resolve(".t.upserting")))
  }

  test("upsert: updated keys replace, new keys append, untouched rows carry over") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("upsert").resolve("t").toString
    // first write onto the missing directory
    graft.sources.Sinks.upsertParquet(spark, dir,
      Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("k", "s", "v"),
      Seq("k"))
    // merge: change k=2, add k=4
    graft.sources.Sinks.upsertParquet(spark, dir,
      Seq((2L, "B", 22), (4L, "d", 40)).toDF("k", "s", "v"), Seq("k"))
    val got = spark.read.parquet(dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(got === Set((1L, "a", 10), (2L, "B", 22), (3L, "c", 30), (4L, "d", 40)))
    // idempotent re-apply of the same batch
    graft.sources.Sinks.upsertParquet(spark, dir,
      Seq((2L, "B", 22), (4L, "d", 40)).toDF("k", "s", "v"), Seq("k"))
    assert(spark.read.parquet(dir).count() === 4)
    // duplicate keys in one batch and schema drift both fail fast
    assert(intercept[IllegalArgumentException](
      graft.sources.Sinks.upsertParquet(spark, dir,
        Seq((5L, "x", 1), (5L, "y", 2)).toDF("k", "s", "v"), Seq("k")))
      .getMessage.contains("duplicate keys"))
    assert(intercept[IllegalArgumentException](
      graft.sources.Sinks.upsertParquet(spark, dir,
        Seq((5L, "x")).toDF("k", "s"), Seq("k")))
      .getMessage.contains("schema mismatch"))
  }

  test("schema evolution: appended batches with new columns read under mergeSchema") {
    import spark.implicits._
    // the nightly-append reality: tonight's batch carries a column
    // yesterday's files don't have. A default read takes ONE footer's
    // schema (old rows may silently lose the new column); mergeSchema
    // unions the schemas and back-fills nulls — pin both behaviors so
    // the append pipelines rely on the right one.
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve").toString
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$dir/t")
    Seq((2L, "b", 9L)).toDF("id", "v", "extra")
      .write.mode("append").parquet(s"$dir/t")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$dir/t")
    assert(merged.columns.sorted.toSeq === Seq("extra", "id", "v"))
    val byId = merged.collect()
      .map(r => r.getLong(0) -> Option(r.getAs[Any]("extra"))).toMap
    assert(byId === Map(1L -> None, 2L -> Some(9L)),
      "old rows must surface the evolved column as null, new rows keep it")
    // the default read resolves ONE schema — it may or may not carry
    // the new column depending on footer order, which is exactly why
    // evolving append pipelines must opt into mergeSchema explicitly
    val plain = spark.read.parquet(s"$dir/t")
    assert(plain.select(col("id")).collect().map(_.getLong(0)).sorted
      === Array(1L, 2L))
  }

  test("csv audit channel: good rows parse, malformed rows land in the audit frame") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("csv-audit")
    java.nio.file.Files.writeString(dir.resolve("feed.csv"),
      """id,name,amount
        |1,alice,10.5
        |2,bob,not_a_number
        |3,carol,7.25
        |just-garbage-no-commas
        |5,dave,1.0
        |""".stripMargin)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("amount", DoubleType)))
    val (good, bad) = graft.sources.Sinks.readCsvAudited(
      spark, dir.toString, schema)
    val ids = good.select("id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 3L, 5L), s"good side wrong: $ids")
    val raws = bad.collect().map(_.getString(0)).toSet
    assert(raws === Set("2,bob,not_a_number", "just-garbage-no-commas"),
      s"audit side wrong: $raws")
    // a schema already carrying the audit column is a caller bug
    assert(intercept[IllegalArgumentException](
      graft.sources.Sinks.readCsvAudited(spark, dir.toString,
        schema.add("_corrupt_record", StringType)))
      .getMessage.contains("_corrupt_record"))
  }
}
