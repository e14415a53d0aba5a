package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Profile, Scd}

class ScdProfileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def ts(s: String) = Timestamp.valueOf(s)

  test("scd2: consecutive equal states compress; intervals chain gaplessly") {
    import spark.implicits._
    val changes = Seq(
      ("u1", ts("2024-01-01 10:00:00"), "bronze"),
      ("u1", ts("2024-01-01 11:00:00"), "bronze"),   // no change -> drops
      ("u1", ts("2024-01-01 12:00:00"), "silver"),
      ("u1", ts("2024-01-01 13:00:00"), "gold"),
      ("u2", ts("2024-01-01 09:00:00"), "silver")
    ).toDF("k", "t", "v")
    val out = Scd.type2(changes, "k", "t", "v")
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getTimestamp(2).toString, Option(r.getTimestamp(3)).map(_.toString),
        r.getBoolean(4)))
    assert(out.toSeq === Seq(
      ("u1", "bronze", "2024-01-01 10:00:00.0", Some("2024-01-01 12:00:00.0"), false),
      ("u1", "silver", "2024-01-01 12:00:00.0", Some("2024-01-01 13:00:00.0"), false),
      ("u1", "gold", "2024-01-01 13:00:00.0", None, true),
      ("u2", "silver", "2024-01-01 09:00:00.0", None, true)))
  }

  test("scd2: a null state is a real state; the first row always survives") {
    import spark.implicits._
    val changes = Seq(
      ("u1", ts("2024-01-01 10:00:00"), Option.empty[String]),
      ("u1", ts("2024-01-01 11:00:00"), Option.empty[String]),  // still null -> drops
      ("u1", ts("2024-01-01 12:00:00"), Option("active"))
    ).toDF("k", "t", "v")
    val out = Scd.type2(changes, "k", "t", "v").orderBy("valid_from").collect()
    assert(out.length === 2)
    assert(out(0).isNullAt(1) && !out(0).getBoolean(4))
    assert(out(1).getString(1) === "active" && out(1).getBoolean(4))
  }

  test("scd2 incremental merge equals the full rebuild, closed rows untouched") {
    import spark.implicits._
    val day1 = Seq(
      ("u1", ts("2024-01-01 10:00:00"), "bronze"),
      ("u1", ts("2024-01-01 12:00:00"), "silver"),
      ("u2", ts("2024-01-01 09:00:00"), "gold"))
    val day2 = Seq(
      ("u1", ts("2024-01-02 08:00:00"), "silver"),  // == current -> compresses
      ("u1", ts("2024-01-02 09:00:00"), "gold"),
      ("u2", ts("2024-01-02 10:00:00"), "gold"),    // == current -> compresses
      ("u3", ts("2024-01-02 11:00:00"), "bronze"))  // brand-new key
    val dim1 = Scd.type2(day1.toDF("k", "t", "v"), "k", "t", "v")
    val merged = Scd.mergeType2(dim1, day2.toDF("k", "t", "v"), "k", "t", "v")
    val full = Scd.type2((day1 ++ day2).toDF("k", "t", "v"), "k", "t", "v")
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty,
      "incremental merge must equal the full-history rebuild")
    // the u1 bronze interval (closed on day 1) survives byte-identically
    val bronze = merged.filter(col("k") === "u1" && col("v") === "bronze").collect()
    assert(bronze.length === 1 && !bronze.head.getBoolean(4))
  }

  test("scd2 strict merge rejects late-arriving history, accepts in-contract batches") {
    import spark.implicits._
    val day1 = Seq(
      ("u1", ts("2024-01-01 10:00:00"), "bronze"),
      ("u1", ts("2024-01-01 12:00:00"), "silver"))
    val dim1 = Scd.type2(day1.toDF("k", "t", "v"), "k", "t", "v")
    // u1's open row starts at 12:00; an 11:00 change is late history
    val late = Seq(("u1", ts("2024-01-01 11:00:00"), "gold")).toDF("k", "t", "v")
    val ex = intercept[IllegalArgumentException](
      Scd.mergeType2(dim1, late, "k", "t", "v", strict = true).collect())
    assert(ex.getMessage.contains("late-arriving"))
    // an in-contract batch passes strict validation and matches non-strict
    val ok = Seq(("u1", ts("2024-01-02 09:00:00"), "gold")).toDF("k", "t", "v")
    val strictOut = Scd.mergeType2(dim1, ok, "k", "t", "v", strict = true)
    val looseOut = Scd.mergeType2(dim1, ok, "k", "t", "v")
    assert(strictOut.exceptAll(looseOut).isEmpty &&
      looseOut.exceptAll(strictOut).isEmpty)
  }

  test("snapshot diff classifies added/removed/changed/unchanged; nulls compare safely") {
    import spark.implicits._
    val oldSnap = Seq(
      (1L, Some("a"), Some(10)), (2L, Some("b"), Some(20)),
      (3L, None: Option[String], Some(30)), (4L, Some("d"), Some(40))
    ).toDF("id", "s", "v")
    val newSnap = Seq(
      (1L, Some("a"), Some(10)),            // unchanged
      (2L, Some("B"), Some(20)),            // changed (s)
      (3L, Some(""), Some(30)),             // changed: null -> "" must NOT collide
      (5L, Some("e"), Some(50))             // added; 4 removed
    ).toDF("id", "s", "v")
    val got = graft.operators.Diff.snapshotDiff(oldSnap, newSnap, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "added"))
    // shifted splits can't collide: ("a?","b") vs ("a","?b") is CHANGED
    // for any separator-ish character ? because each column hashes alone
    val shiftOld = Seq((1L, "a\u001f", "b")).toDF("id", "s1", "s2")
    val shiftNew = Seq((1L, "a", "\u001fb")).toDF("id", "s1", "s2")
    assert(graft.operators.Diff.snapshotDiff(shiftOld, shiftNew, Seq("id"))
      .head().getString(1) === "changed")
    // schema drift and key-only snapshots fail fast
    assert(intercept[IllegalArgumentException](
      graft.operators.Diff.snapshotDiff(oldSnap,
        newSnap.withColumnRenamed("v", "w"), Seq("id")))
      .getMessage.contains("schema"))
    assert(intercept[IllegalArgumentException](
      graft.operators.Diff.snapshotDiff(oldSnap.select("id"),
        newSnap.select("id"), Seq("id")))
      .getMessage.contains("non-key"))
  }

  test("feature scaling: min-max per group, constant groups null, winsorize clips") {
    import spark.implicits._
    import graft.operators.Features
    val df = Seq(("a", 10.0), ("a", 20.0), ("a", 15.0), ("b", 7.0), ("b", 7.0))
      .toDF("k", "v")
    val sc = Features.minMaxScale(df, "k", "v")
      .collect().map(r => (r.getString(0), r.getDouble(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
    assert(sc === Set(("a", 10.0, Some(0.0)), ("a", 20.0, Some(1.0)),
      ("a", 15.0, Some(0.5)),
      ("b", 7.0, None)))   // constant group → null, not 0/0
    // winsorize: exact percentiles of 1..10 at [0.1, 0.9] are 1.9 / 9.1
    val w = Features.winsorize((1 to 10).map(_.toDouble).toDF("x"), "x",
        pLo = 0.1, pHi = 0.9)
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toMap
    assert(w(1.0) === 1.9 && w(10.0) === 9.1 && w(5.0) === 5.0)
    assert(intercept[IllegalArgumentException](
      Features.winsorize(df, "v", 0.9, 0.1)).getMessage.contains("pLo"))
  }

  test("point-in-time join: as-of state, pre-history nulls, gapped intervals guarded") {
    import spark.implicits._
    val dim = Seq(
      // u1: bronze [10:00, 12:00) then GAP, then gold [14:00, null)
      ("u1", "bronze", ts("2024-01-01 10:00:00"), Some(ts("2024-01-01 12:00:00"))),
      ("u1", "gold", ts("2024-01-01 14:00:00"), None)
    ).toDF("k", "status", "valid_from", "valid_to")
      .select(col("k"), col("status"), col("valid_from"),
        col("valid_to").cast("timestamp"))
    val facts = Seq(
      (1L, "u1", ts("2024-01-01 09:00:00")),  // before history → null
      (2L, "u1", ts("2024-01-01 10:00:00")),  // exactly at valid_from → bronze
      (3L, "u1", ts("2024-01-01 11:59:59")),  // inside → bronze
      (4L, "u1", ts("2024-01-01 13:00:00")),  // in the GAP → null (closed guard)
      (5L, "u1", ts("2024-01-01 15:00:00")),  // open interval → gold
      (6L, "u2", ts("2024-01-01 10:00:00"))   // no dim rows at all → null
    ).toDF("fid", "fk", "fts")
    val out = graft.operators.Scd.pointInTime(facts, dim, "fk", "k", "fts", "status")
      .collect().map(r => r.getLong(0) -> Option(r.getAs[String]("status"))).toMap
    assert(out === Map(1L -> None, 2L -> Some("bronze"), 3L -> Some("bronze"),
      4L -> None, 5L -> Some("gold"), 6L -> None))
  }

  test("key skew: one row of per-key multiplicity stats, null keys are real keys") {
    import spark.implicits._
    // key a: 6 rows, b: 2, c: 1, null: 1 → max 6, median 1.5, ratio 4
    val df = (Seq.fill(6)(Option("a")) ++ Seq.fill(2)(Option("b")) ++
      Seq(Option("c"), Option.empty[String])).toDF("k")
    val r = Profile.keySkew(df, Seq("k")).head
    assert(r.getLong(0) === 10L && r.getLong(1) === 4L && r.getLong(2) === 6L)
    assert(r.getDouble(3) === 1.5 && r.getDouble(5) === 4.0)
  }

  test("category index: frequency-then-label ranking, stored round-trip, unk sentinel") {
    import spark.implicits._
    val df = (Seq.fill(3)("de") ++ Seq.fill(3)("en") ++ Seq("fr") ++
      Seq(null.asInstanceOf[String])).toDF("lang")
    val idx = graft.operators.Features.buildCategoryIndex(df, "lang")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    // de/en tie on count 3 → label asc breaks it; null excluded
    assert(idx === Map("de" -> 0, "en" -> 1, "fr" -> 2))
    val store = java.nio.file.Files.createTempDirectory("cat-idx").toString
    graft.operators.Features.writeCategoryIndex(df, "lang", store)
    val fresh = Seq("en", "zz", null.asInstanceOf[String]).toDF("lang")
    val enc = graft.operators.Features.encodeCategories(fresh, "lang",
        spark.read.parquet(store))
      .collect().map(r => Option(r.getString(0)) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(enc === Map(Some("en") -> Some(1), Some("zz") -> Some(-1),
      None -> None), "unseen -> -1, null -> null")
  }

  test("property: kAnonymize always picks the first ladder rung meeting k") {
    import spark.implicits._
    // random value multisets with ties; for each k, the chosen rung must
    // equal the exhaustive first-satisfying level, and its audit must
    // actually meet k (or be the honest bins_used=1 failure)
    for (seed <- 0 until 4) {
      val rnd = new scala.util.Random(seed)
      val df = (1 to 64).map(_ => ("s", (rnd.nextInt(40) + 1).toDouble))
        .toDF("seg", "v")
      def minClass(bins: Int): Long = {
        val gen = if (bins >= 2) graft.operators.Features.equiDepthBins(df, "v", bins)
          else df.withColumn("v_bin", lit(0))
        Profile.kAnonymity(gen, Seq("seg", "v_bin"), 2)
          .agg(min(col("n"))).head().getLong(0)
      }
      for (k <- Seq(4, 10, 20, 70)) {
        val expected = Seq(8, 4, 2, 1)
          .find(b => minClass(b) >= k).getOrElse(1)
        val out = Profile.kAnonymize(df, Seq("seg"), Seq("v"), k,
          startBins = 8).collect()
        assert(out.forall(_.getAs[Int]("bins_used") === expected),
          s"seed $seed k=$k: expected rung $expected")
        if (minClass(expected) >= k)
          assert(out.forall(_.getAs[Boolean]("anonymous")),
            s"seed $seed k=$k: chosen rung must satisfy k")
      }
    }
  }

  test("robust scale: median/IQR standardization, zero-IQR columns go null") {
    import spark.implicits._
    // values 1..5: q1=2, med=3, q3=4, IQR=2 → scaled = (x-3)/2
    val df = (1 to 5).map(_.toDouble).toDF("v")
    val out = graft.operators.Features.robustScale(df, "v")
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(out === Map(1.0 -> -1.0, 2.0 -> -0.5, 3.0 -> 0.0,
      4.0 -> 0.5, 5.0 -> 1.0))
    // over half the mass on one value → IQR 0 → null, not divide-by-zero
    val flat = Seq(7.0, 7.0, 7.0, 7.0, 9.0).toDF("v")
    val fr = graft.operators.Features.robustScale(flat, "v").collect()
    assert(fr.forall(_.isNullAt(1)))
  }

  test("equi-depth bins: boundary ties fall to the lower bucket, nulls stay null") {
    import spark.implicits._
    import graft.operators.Features
    // 1..8: exact quartile boundaries 2.75 / 4.5 / 6.25
    val df = (1 to 8).map(i => Some(i.toDouble)).toDF("x")
    val bins = Features.equiDepthBins(df, "x", 4)
      .collect().map(r => (r.getDouble(0), r.getInt(1))).toMap
    assert(bins === Map(1.0 -> 0, 2.0 -> 0, 3.0 -> 1, 4.0 -> 1,
      5.0 -> 2, 6.0 -> 2, 7.0 -> 3, 8.0 -> 3))
    // a value exactly ON a boundary lands in the LOWER bucket
    val tied = Features.equiDepthBins(
      Seq(1.0, 2.0, 2.0, 2.0, 2.0, 3.0).toDF("x"), "x", 2)
      .collect().map(r => (r.getDouble(0), r.getInt(1)))
    assert(tied.filter(_._1 == 2.0).forall(_._2 == 0),
      "median-valued rows must all land in bin 0")
    val withNull = Features.equiDepthBins(
      Seq(Some(1.0), Some(2.0), Some(3.0), None).toDF("x"), "x", 2)
      .collect().map(r => (Option(r.get(0)), Option(r.get(1))))
    assert(withNull.contains((None, None)), "null value must get a null bin")
    assert(intercept[IllegalArgumentException](
      Features.equiDepthBins(df, "x", 1)).getMessage.contains("nBins"))
  }

  test("k-anonymity: classes below k flagged, null quasi values form a class") {
    import spark.implicits._
    val df = Seq(
      (Option("US"), "a"), (Option("US"), "a"), (Option("US"), "a"),
      (Option("DE"), "a"),
      (None, "b"), (None, "b")
    ).toDF("country", "seg")
    val out = Profile.kAnonymity(df, Seq("country", "seg"), 2)
      .collect().map(r => (Option(r.getString(0)), r.getString(1),
        r.getLong(2), r.getBoolean(3))).toSet
    assert(out === Set(
      (Some("US"), "a", 3L, true),
      (Some("DE"), "a", 1L, false),
      (None, "b", 2L, true)))
    assert(intercept[IllegalArgumentException](
      Profile.kAnonymity(df, Seq("country"), 1)).getMessage.contains("k >= 2"))
  }

  test("l-diversity: homogeneous classes flagged, null sensitive counts as a value") {
    import spark.implicits._
    val df = Seq(
      // k-anonymous (n=3) but every member shares one diagnosis → not diverse
      ("US", Option("flu")), ("US", Option("flu")), ("US", Option("flu")),
      // two distinct values, l=2 met
      ("DE", Option("flu")), ("DE", Option("cold")),
      // one real value + a null: the null is a distinct disclosure → l=2 met
      ("FR", Option("flu")), ("FR", None)
    ).toDF("country", "diagnosis")
    val out = Profile.lDiversity(df, Seq("country"), "diagnosis", 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSet
    assert(out === Set(
      ("US", 3L, 1L, false),
      ("DE", 2L, 2L, true),
      ("FR", 2L, 2L, true)))
    assert(intercept[IllegalArgumentException](
      Profile.lDiversity(df, Seq("country"), "diagnosis", 1))
      .getMessage.contains("l >= 2"))
    assert(intercept[IllegalArgumentException](
      Profile.lDiversity(df, Seq("country"), "nope", 2))
      .getMessage.contains("not in"))
  }

  test("t-closeness: skewed classes flagged, balanced class passes, exact TVD") {
    import spark.implicits._
    // global: x:3, y:3 (N=6). A={x,x}: tvd = ½(|2/2−3/6| + |0−3/6|) = 0.5
    // B={y,y}: symmetric 0.5. C={x,y}: matches the global mix, tvd = 0.
    val df = Seq(
      ("A", "x"), ("A", "x"),
      ("B", "y"), ("B", "y"),
      ("C", "x"), ("C", "y")
    ).toDF("grp", "diag")
    val out = Profile.tCloseness(df, Seq("grp"), "diag", 0.2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3))).toSet
    assert(out === Set(
      ("A", 2L, 0.5, false),
      ("B", 2L, 0.5, false),
      ("C", 2L, 0.0, true)))
    assert(intercept[IllegalArgumentException](
      Profile.tCloseness(df, Seq("grp"), "diag", 1.5))
      .getMessage.contains("0 < t < 1"))
  }

  test("t-closeness: a null sensitive value is a category of its own") {
    import spark.implicits._
    // global: null:1, x:1 (N=2). E={null}: tvd = ½(|1/1−1/2| + |0−1/2|)
    // = 0.5 — if nulls were dropped E's distribution would look empty
    // and the distance would be wrong
    val df = Seq(("E", Option.empty[String]), ("F", Option("x")))
      .toDF("grp", "diag")
    val out = Profile.tCloseness(df, Seq("grp"), "diag", 0.6)
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getBoolean(3)))
      .toSet
    assert(out === Set(("E", 0.5, true), ("F", 0.5, true)))
  }

  test("privacy gate: release only when all three rungs hold, null quasi joins") {
    import spark.implicits._
    // A (n=3, homogeneous): k ok, l fails. B (n=3, 3 values, matches
    // the global thirds): all rungs ok. null-group (n=3, 2 values,
    // skewed): k and l hold, closeness fails — and the class itself
    // proves null quasi values flow through the null-safe join.
    val df = Seq(
      (Option("A"), "x"), (Option("A"), "x"), (Option("A"), "x"),
      (Option("B"), "x"), (Option("B"), "y"), (Option("B"), "z"),
      (Option.empty[String], "y"), (Option.empty[String], "z"),
      (Option.empty[String], "y")
    ).toDF("grp", "diag")
    val out = Profile.privacyReport(df, Seq("grp"), "diag", k = 2, l = 2, t = 0.4)
      .collect().map(r => (Option(r.getString(0)),
        (r.getBoolean(2), r.getBoolean(4), r.getBoolean(6), r.getBoolean(7))))
      .toMap
    // global: x 4/9, y 3/9, z 2/9
    // A={x,x,x}: tvd = ½(|1-4/9| + 3/9 + 2/9) = ½·10/9 = 5/9 > 0.4
    assert(out(Some("A")) === ((true, false, false, false)))
    // B={x,y,z}: tvd = ½(|3/9-4/9|·3... ) = ½(1/9+0+1/9) = 1/9 <= 0.4
    assert(out(Some("B")) === ((true, true, true, true)))
    // null group {y,y,z}: n=3>=2 ok; 2 values ok; tvd = ½(4/9+|2/3-1/3|+|1/3-2/9|)
    // = ½(4/9+3/9+1/9) = 4/9 > 0.4 -> close false, release false
    assert(out(None) === ((true, true, false, false)),
      "the null quasi class must flow through the null-safe join")
  }

  test("k-anonymize: the ladder descends exactly until every class reaches k") {
    import spark.implicits._
    // 32 rows, one segment, values 1..32: 4 bins give classes of 8, so
    // k=8 stops at the 4-bin rung (8 bins would give classes of 4)
    val df = (1 to 32).map(i => ("s", i.toDouble)).toDF("seg", "v")
    val out = Profile.kAnonymize(df, Seq("seg"), Seq("v"), k = 8,
      startBins = 8).collect()
    assert(out.forall(_.getAs[Int]("bins_used") === 4))
    assert(out.forall(_.getAs[Boolean]("anonymous")))
    assert(out.map(_.getAs[Long]("n")).sorted.toSeq === Seq(8L, 8L, 8L, 8L))
    // k=4 is satisfied by the first rung — no descent
    val first = Profile.kAnonymize(df, Seq("seg"), Seq("v"), k = 4,
      startBins = 8).collect()
    assert(first.forall(_.getAs[Int]("bins_used") === 8))
    assert(first.length === 8)
    // an unreachable k runs the ladder out: full suppression, honest
    // anonymous=false audit rather than an exception
    val failed = Profile.kAnonymize(df, Seq("seg"), Seq("v"), k = 33,
      startBins = 8).collect()
    assert(failed.length === 1 && failed.head.getAs[Int]("bins_used") === 1)
    assert(!failed.head.getAs[Boolean]("anonymous") &&
      failed.head.getAs[Long]("n") === 32L)
    assert(intercept[IllegalArgumentException](
      Profile.kAnonymize(df, Seq("seg"), Seq("v"), 8, startBins = 6))
      .getMessage.contains("power of two"))
  }

  test("correlation matrix: exact pairs, constant column nulls, one scan") {
    import spark.implicits._
    val df = Seq((1.0, 2.0, 5.0), (2.0, 4.0, 5.0), (3.0, 6.0, 5.0))
      .toDF("a", "b", "c")
    val m = Profile.corrMatrix(df, Seq("a", "b", "c"))
    val rows = m.collect()
      .map(r => ((r.getString(0), r.getString(1)), Option(r.get(2)))).toMap
    assert(rows(("a", "b")) === Some(1.0))     // perfectly linear
    assert(rows(("a", "c")) === None)          // constant column → null
    assert(rows(("b", "c")) === None)
    // one aggregation job over one scan — no join, no repeated read
    val p = m.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"corr matrix must not self-join:\n$p")
  }

  test("sketch store: merged batches estimate within HLL bounds, == single-pass") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val store = java.nio.file.Files.createTempDirectory("hll-spec").toString
    Profile.appendDistinctSketches(
      docs.filter(col("doc_id") % 2 === 0), Seq("source"), "text", store)
    Profile.appendDistinctSketches(
      docs.filter(col("doc_id") % 2 === 1), Seq("source"), "text", store)
    val merged = Profile.distinctFromSketches(spark, store, Seq("source"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // single-pass sketch over the full corpus (no store, no split)
    val single = java.nio.file.Files.createTempDirectory("hll-spec-one").toString
    Profile.appendDistinctSketches(docs, Seq("source"), "text", single)
    val onePass = Profile.distinctFromSketches(spark, single, Seq("source"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = docs.groupBy("source").agg(countDistinct("text").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged.keySet === exact.keySet)
    exact.foreach { case (src, n) =>
      val est = merged(src)
      // lgK=12 → rsd ~1.04/sqrt(4096) ≈ 1.6%; allow 3 sigma + integer slop
      assert(math.abs(est - n) <= math.max(2, 0.05 * n),
        s"source $src: estimate $est vs exact $n out of bounds")
      // union of per-batch sketches is register-wise max: must agree with
      // the single-pass sketch (order-independence of the store)
      assert(est === onePass(src),
        s"source $src: merged $est != single-pass ${onePass(src)}")
    }
  }

  test("theta set store: batched sketches answer overlap without joining the corpora") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("theta-store").toString
    // corpus A = {0..599}, corpus B = {400..899}: |A∩B| = 200, |A∪B| = 900
    // — each appended in two nightly batches to exercise theta_union_agg
    val a = (0L until 600L).toDF("k")
    val b = (400L until 900L).toDF("k")
    Profile.appendSetSketch(a.filter(col("k") % 2 === 0), "train", "k", store)
    Profile.appendSetSketch(a.filter(col("k") % 2 === 1), "train", "k", store)
    Profile.appendSetSketch(b.filter(col("k") < 700), "crawl", "k", store)
    Profile.appendSetSketch(b.filter(col("k") >= 700), "crawl", "k", store)
    val r = Profile.overlapFromSketches(spark, store, "train", "crawl").head
    // below the 4096-entry nominal a theta sketch is EXACT (estimates
    // surface as rounded longs)
    assert(r.getLong(0) === 600L && r.getLong(1) === 500L)
    assert(r.getLong(2) === 200L, "intersection estimate")
    assert(r.getLong(3) === 900L, "union estimate")
    assert(r.getLong(4) === 400L, "difference estimate")
  }

  test("kll quantile store: merged batches estimate quantiles within the rank bound") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("kll-store").toString
    val df = (1 to 10000).map(i => ("g", i.toDouble)).toDF("key", "v")
    Profile.appendQuantileSketches(df.filter(col("v") <= 5000), Seq("key"), "v", store)
    Profile.appendQuantileSketches(df.filter(col("v") > 5000), Seq("key"), "v", store)
    val q = Profile.quantilesFromSketches(spark, store, Seq("key"),
      Seq(0.5, 0.9)).head
    // k=800 → normalized rank error ~0.4%; assert a loose 2% band on the
    // VALUE (uniform 1..10000, so value band == rank band)
    assert(math.abs(q.getDouble(1) - 5000.0) <= 200.0, s"median came back ${q.getDouble(1)}")
    assert(math.abs(q.getDouble(2) - 9000.0) <= 200.0, s"p90 came back ${q.getDouble(2)}")
    assert(intercept[IllegalArgumentException](
      Profile.quantilesFromSketches(spark, store, Seq("key"), Seq(1.5)))
      .getMessage.contains("percentiles"))
  }

  test("count-min store: batched appends merge to the single-pass sketch; " +
      "estimates never undercount; absent keys read 0") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("cms-store").toString
    val single = java.nio.file.Files.createTempDirectory("cms-single").toString
    // skewed stream: "hot" ×500, "warm" ×50, tail of 200 singletons
    val rows = (Seq.fill(500)("hot") ++ Seq.fill(50)("warm") ++
      (0 until 200).map(i => s"tail$i")).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("i", "v")
    Profile.appendCountMinSketch(rows.filter(col("i") % 2 === 0), "v", store)
    Profile.appendCountMinSketch(rows.filter(col("i") % 2 === 1), "v", store)
    Profile.appendCountMinSketch(rows, "v", single)
    // merged two-batch sketch == one-pass sketch, cell for cell (SUM over
    // exact integer counters is associative — the mergeability claim)
    val m = spark.read.parquet(store).groupBy("d", "idx")
      .agg(sum("cnt").as("cnt"))
    val s1 = spark.read.parquet(single)
    assert(m.except(s1).isEmpty && s1.except(m).isEmpty,
      "two-batch merge must equal the single-pass sketch")
    val probes = Seq("hot", "warm", "tail7", "never-seen").toDF("v")
    val est = Profile.countsFromCmsSketch(spark, store, probes, "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("hot") >= 500L && est("warm") >= 50L && est("tail7") >= 1L,
      s"CMS must never undercount: $est")
    // 750 values in 256-wide rows: overcount bounded by e/256·N ≈ 8
    assert(est("hot") <= 508L && est("warm") <= 58L, s"overcount blew the bound: $est")
    assert(est("never-seen") >= 0L && est("never-seen") <= 8L)
    assert(intercept[IllegalArgumentException](
      Profile.appendCountMinSketch(rows, "v", store, depth = 0))
      .getMessage.contains("depth"))
  }

  test("profile counts rows, nulls, and distincts per column in one pass") {
    import spark.implicits._
    val df = Seq(
      (Option("a"), Option(1)), (Option("a"), Option(2)),
      (Option("b"), None), (None, Option(2))
    ).toDF("s", "i")
    val out = Profile.describe(df, Seq("s", "i"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(out === Set(("s", 4L, 1L, 2L), ("i", 4L, 1L, 2L)))
  }

  test("profile: approx mode returns plausible counts; inputs validated") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ex = Profile.describe(docs, Seq("lang")).collect().head
    val ap = Profile.describe(docs, Seq("lang"), exact = false).collect().head
    assert(ex.getLong(3) === 5)
    assert(math.abs(ap.getLong(3) - 5) <= 1, s"approx distinct off: $ap")
    assert(intercept[IllegalArgumentException](
      Profile.describe(docs, Seq.empty)).getMessage.contains("column"))
    assert(intercept[IllegalArgumentException](
      Profile.describe(docs, Seq("nope"))).getMessage.contains("nope"))
    assert(intercept[IllegalArgumentException](
      Profile.describe(docs, Seq("lang", "lang"))).getMessage.contains("duplicate"))
  }

  test("expectations: every rule counts its violations exactly in one " +
      "pass; null handling per rule; unknown columns refused") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some(5.0), Some("1-URGENT"), Some("F")),
      (Some(2L), Some(15.0), Some("9-BAD"), Some("O")),   // range+regex+ok
      (Some(2L), None, None, Some("X")),                  // dup id, nulls, bad value
      (None, Some(-1.0), Some("2-HIGH"), None)            // null id, below range
    ).toDF("id", "price", "prio", "status")
    val out = Profile.expectations(df, Seq(
        Profile.NotNull("id"), Profile.Unique("id"),
        Profile.InRange("price", 0.0, 10.0),
        Profile.MatchesRegex("prio", "^[1-5]-"),
        Profile.AcceptedValues("status", Seq("F", "O"))))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getBoolean(4)))
    assert(out.toSeq.sortBy(_._1) === Seq(
      (1, "id", "not_null", 1L, false),
      (2, "id", "unique", 1L, false),       // one non-null duplicate
      (3, "price", "in_range(0.0,10.0)", 2L, false), // 15.0 and -1.0; null passes
      (4, "prio", "matches(^[1-5]-)", 1L, false),    // 9-BAD; null passes
      (5, "status", "accepted_values(F|O)", 1L, false))) // X; null passes
    // an all-green suite
    val ok = Profile.expectations(df, Seq(Profile.NotNull("status"))
      .map(_ => Profile.InRange("price", -10.0, 100.0)))
      .collect()
    assert(ok.length === 1 && ok.head.getLong(3) === 0L &&
      ok.head.getBoolean(4))
    assert(intercept[IllegalArgumentException](
      Profile.expectations(df, Seq(Profile.NotNull("nope"))))
      .getMessage.contains("unknown column"))
    assert(intercept[IllegalArgumentException](
      Profile.expectations(df, Seq.empty)).getMessage.contains("at least"))
  }

  test("dp counts: reproducible Laplace release, clamped, salt-sensitive") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, s"g${i % 5}")).toDF("id", "grp")
    def run(salt: String) = Profile.dpCounts(df, Seq("grp"),
        epsilonMicros = 1000000L, salt = salt)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    val a = run("dp1")
    assert(a.size === 5 && a.values.forall(_._1 === 20L))
    // deterministic: same salt, same release
    assert(run("dp1") === a)
    // fresh salt redraws the noise (group counts unchanged)
    val b = run("dp2")
    assert(b.values.map(_._1).toSeq === a.values.map(_._1).toSeq)
    assert(a.exists { case (g, (_, nz, _)) => b(g)._2 != nz })
    // released counts are non-negative integers near the true count
    assert(a.values.forall { case (n, nz, rel) =>
      rel >= 0L && rel === math.max(0L, math.round(n + nz)) })
    // epsilon must be positive
    assert(intercept[IllegalArgumentException](
      Profile.dpCounts(df, Seq("grp"), 0L, "s")).getMessage
      .contains("epsilon"))
    // the noise really is the inverse-CDF value of the md5 uniform
    val u16 = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex("dp1|g0")
        .substring(0, 4), 16)
    val u = (u16 + 0.5) / 65536.0
    val expect = BigDecimal(-math.signum(u - 0.5) *
      math.log(1 - 2 * math.abs(u - 0.5)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(a("g0")._2 === expect)
  }

  test("psi drift: identical snapshots score zero, a shifted batch " +
      "scores positive, empty bins take the 1e-6 floor") {
    import spark.implicits._
    val base = (1 to 1000).map(_.toDouble).toDF("v")
    // identical distribution -> every contribution exactly 0
    val same = Profile.psiDrift(base, base, "v", 4)
      .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    assert(same.size === 4 && same.values.forall(_ === 0.0))
    // shifted distribution -> strictly positive total, every bin surfaces
    val shifted = (501 to 1500).map(_.toDouble).toDF("v")
    val dr = Profile.psiDrift(base, shifted, "v", 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(dr.length === 4)
    assert(dr.map(_._4).sum > 0.25, "a half-range shift is 'action' drift")
    // the upper bins drained on the base side? no — CURRENT drains the
    // LOW bins: bin 0 (v <= 250) holds zero current rows -> the q share
    // takes the 1e-6 floor and the contribution is large positive
    val bin0 = dr.find(_._1 == 0).get
    assert(bin0._2 > 0 && bin0._3 === 0L && bin0._4 > 0)
    // nulls are excluded, not binned
    val withNulls = base.union(Seq.fill(5)(
      null.asInstanceOf[java.lang.Double]).map(Option(_).map(_.toDouble))
      .toDF("v"))
    assert(Profile.psiDrift(withNulls, base, "v", 4)
      .agg(org.apache.spark.sql.functions.sum("base_n")).first().getLong(0)
      === 1000L)
  }

  test("calibration bins: a perfect oracle gate gaps at the bin-mean " +
      "level, empty bins surface null, out-of-range scores refuse") {
    import spark.implicits._
    // 200 items at score 250000 with exactly 25% positives, 100 items at
    // 900000 with exactly 90% positives: gaps = 0 in both bins
    val rows = (1 to 200).map(i => (250000L, i % 4 == 0)) ++
      (1 to 100).map(i => (900000L, i % 10 != 0))
    val out = Profile.calibrationBins(rows.toDF("s", "y"), "s", "y", 10)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    assert(out.size === 10)
    assert(out(2) === ((200L, 250000L, 0L)), "bin 2: perfectly calibrated")
    assert(out(9) === ((100L, 900000L, 0L)), "bin 9: perfectly calibrated")
    assert(out(0) === ((0L, -1L, -1L)), "empty bins surface with nulls")
    // the 1.0 edge closes into the last bin
    val edge = Profile.calibrationBins(
      Seq((1000000L, true)).toDF("s", "y"), "s", "y", 10)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(edge(9) === 1L)
    // a non-probability score refuses in-plan
    val ex = intercept[Exception](Profile.calibrationBins(
      Seq((2000000L, true)).toDF("s", "y"), "s", "y", 10).collect())
    assert(ex.getMessage.contains("not a probability"))
  }

  test("expected calibration error: hand-weighted roll-up over the " +
      "bins, empty bins carry no weight, perfect calibration reads 0") {
    import spark.implicits._
    // bin 2: 200 rows, gap 0; bin 9: 100 rows, all at 900000 conf but
    // only 50% positives -> acc 500000, gap 400000. ECE = (200*0 +
    // 100*400000)/300 = 133333.33 -> half-up 133333; MCE = 400000.
    val rows = (1 to 200).map(i => (250000L, i % 4 == 0)) ++
      (1 to 100).map(i => (900000L, i % 2 == 0))
    val r = Profile.expectedCalibrationError(
      rows.toDF("s", "y"), "s", "y", 10).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((300L, 2L, 133333L, 400000L)))
    // perfectly calibrated corpus -> ECE = MCE = 0
    val perfect = (1 to 200).map(i => (250000L, i % 4 == 0))
    val rp = Profile.expectedCalibrationError(
      perfect.toDF("s", "y"), "s", "y", 10).collect().head
    assert(rp.getLong(2) === 0L && rp.getLong(3) === 0L)
  }

  test("brier score: hand case, certainty extremes, out-of-range raise") {
    import spark.implicits._
    // (0.8, 1): 0.04; (0.8, 0): 0.64; mean 0.34 -> 340000 micros
    val r = Profile.brierScore(
      Seq((800000L, true), (800000L, false)).toDF("s", "y"), "s", "y")
      .collect().head
    assert((r.getLong(0), r.getLong(1)) === ((2L, 340000L)))
    // always-certain-always-right = 0; always-certain-always-wrong = 1e6
    assert(Profile.brierScore(Seq((1000000L, true)).toDF("s", "y"),
      "s", "y").collect().head.getLong(1) === 0L)
    assert(Profile.brierScore(Seq((1000000L, false)).toDF("s", "y"),
      "s", "y").collect().head.getLong(1) === 1000000L)
    val ex = intercept[Exception](Profile.brierScore(
      Seq((-5L, true)).toDF("s", "y"), "s", "y").collect())
    assert(ex.getMessage.contains("not a probability"))
  }

  test("confusion stats: hand-checked cells, a never-predicted class " +
      "gets null precision but drags the macro (zero_division), the " +
      "<all> row is accuracy") {
    import spark.implicits._
    // golds: a x3, b x2, c x1. preds: a->a, a->a, a->b, b->b, b->b,
    // c->a. Class a: tp=2 fp=1 fn=1 (P=2/3 R=2/3 F1=2/3); b: tp=2 fp=1
    // fn=0 (P=2/3 R=1 F1=4/5); c: tp=0 fp=0 fn=1 (P null, R=0, F1=0).
    val rows = Seq(("a", "a"), ("a", "a"), ("b", "a"), ("b", "b"),
      ("b", "b"), ("a", "c")).toDF("pred", "gold")
    val out = Profile.confusionStats(rows, "pred", "gold")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4),
          if (r.isNullAt(5)) -1L else r.getLong(5),
          if (r.isNullAt(6)) -1L else r.getLong(6)))).toMap
    assert(out.size === 5)
    assert(out("a") === ((2L, 1L, 1L, 666667L, 666667L, 666667L)))
    assert(out("b") === ((2L, 1L, 0L, 666667L, 1000000L, 800000L)))
    assert(out("c") === ((0L, 0L, 1L, -1L, 0L, 0L)),
      "never-predicted class: precision undefined, recall/F1 zero")
    // accuracy = 4/6
    assert(out("<all>") === ((4L, 2L, 2L, 666667L, 666667L, 666667L)))
    // macro = means of the per-class ROUNDED ppms (null-as-0):
    // P (666667+666667+0)/3 -> 444445; R (666667+1000000+0)/3 ->
    // 555556; F1 (666667+800000+0)/3 -> 488889
    assert(out("<macro>") === ((4L, 2L, 2L, 444445L, 555556L, 488889L)))
  }

  test("paired bootstrap: a uniformly-better A never loses a replicate, " +
      "identical scores are all ties, the draw is salt-deterministic") {
    import spark.implicits._
    val scores = (1L to 40L).map(i => (i, 100L + i, 90L + i))
      .toDF("item", "a", "b") // a - b = 10 on every item
    val r = Profile.pairedBootstrap(scores, "item", "a", "b", b = 100)
      .collect().head
    assert(r.getLong(0) === 40L && r.getLong(1) === 0L)
    assert(r.getLong(5) === 0L, "a uniformly-better A cannot lose")
    // a replicate ties only if every one of 40 Poisson weights is 0
    // (P ~ e^-40): all 100 replicates should be wins
    assert(r.getLong(3) === 100L && r.getLong(6) === 0L,
      "p-value must be 0 ppm for a uniform winner")
    assert(r.getLong(7) === 10000000L, "mean delta 10 in micros")
    // identical scores: every replicate statistic is exactly 0
    val same = Profile.pairedBootstrap(
      (1L to 40L).map(i => (i, 5L, 5L)).toDF("item", "a", "b"),
      "item", "a", "b", b = 100).collect().head
    assert(same.getLong(4) === 100L && same.getLong(6) === 1000000L,
      "identical pipelines: all ties, p = 1")
    // unpaired items surface; salt determinism; fresh salt redraws
    val withNull = scores.union(
      Seq((99L, Option.empty[Long], Option(5L))).toDF("item", "a", "b"))
    assert(Profile.pairedBootstrap(withNull, "item", "a", "b", b = 50)
      .collect().head.getLong(1) === 1L)
    // a null ID is unpaired too (its md5 seed would be null and the
    // weight would silently resolve to the CASE default, not Poisson(1))
    val withNullId = scores.union(
      Seq((Option.empty[Long], Option(7L), Option(5L)))
        .toDF("item", "a", "b"))
    val ni = Profile.pairedBootstrap(withNullId, "item", "a", "b", b = 50)
      .collect().head
    assert(ni.getLong(0) === 40L && ni.getLong(1) === 1L,
      "null-id rows are excluded from the paired relation and counted")
    // noisy case: per-item delta alternates +1/-9 (B better on average)
    val noisy = (1L to 40L).map(i =>
      (i, 100L, if (i % 10 == 0) 109L else 99L)).toDF("item", "a", "b")
    val n1 = Profile.pairedBootstrap(noisy, "item", "a", "b", b = 200)
      .collect().head
    val n2 = Profile.pairedBootstrap(noisy, "item", "a", "b", b = 200)
      .collect().head
    assert(n1.toSeq === n2.toSeq, "same salt must replay bit-for-bit")
    val n3 = Profile.pairedBootstrap(noisy, "item", "a", "b", b = 200,
      salt = "other").collect().head
    assert(n1.getLong(3) + n1.getLong(4) + n1.getLong(5) === 200L)
    assert(n3.getLong(3) !== n1.getLong(3),
      "a fresh salt must actually redraw")
  }

  test("gate parity: the four-fifths rule flags a skewed gate, null " +
      "verdicts count as rejects but surface, null groups segment") {
    import spark.implicits._
    val rows =
      Seq.fill(8)(("en", Option(true))) ++ Seq.fill(2)(("en", Option(false))) ++
      Seq.fill(3)(("de", Option(true))) ++ Seq.fill(7)(("de", Option(false))) ++
      Seq.fill(4)(("fr", Option(true))) ++
        Seq.fill(1)(("fr", Option.empty[Boolean])) ++
      Seq((null.asInstanceOf[String], Option(true)))
    val out = Profile.gateParity(rows.toDF("lang", "accept"),
        "lang", "accept")
      .collect().map(r => Option(r.getString(0)).getOrElse("<null>") ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getBoolean(6)))).toMap
    // en: 8/10 = 800000 ppm; null-group: 1/1 = 1e6 = best
    assert(out("en") === ((10L, 8L, 0L, 800000L, 800000L, false)))
    // de: 3/10 = 300000 -> parity 300000 < 800000 -> flagged
    assert(out("de")._6 === true && out("de")._5 === 300000L)
    // fr: null verdict counts as reject AND surfaces: 4/5 accepted
    assert(out("fr") === ((5L, 4L, 1L, 800000L, 800000L, false)))
    assert(out("<null>")._4 === 1000000L, "null group is its own segment")
  }

  test("cohen kappa: hand-scored agreement, chance-only raters score ~0, " +
      "constant identical raters are undefined, nulls drop") {
    import spark.implicits._
    // classic 2x2 example: 20 a/a, 5 a/b, 10 b/a, 15 b/b
    val rows = Seq.fill(20)(("a", "a")) ++ Seq.fill(5)(("a", "b")) ++
      Seq.fill(10)(("b", "a")) ++ Seq.fill(15)(("b", "b"))
    val out = Profile.cohenKappa(rows.toDF("r1", "r2"), "r1", "r2")
      .collect().head
    // n=50, A=35; E = 25*30 + 25*20 = 1250; kappa = (50*35-1250) /
    // (2500-1250) = 500/1250 = 0.4
    assert(out.getLong(0) === 50L && out.getLong(1) === 35L)
    assert(out.getLong(2) === 700000L, "po = 35/50")
    assert(out.getLong(3) === 500000L, "pe = 1250/2500")
    assert(out.getLong(4) === 400000L, "kappa = 0.4 exactly")
    // both raters constant and identical: chance agreement is total ->
    // kappa undefined (null), counts intact
    val const = Profile.cohenKappa(
      Seq.fill(10)(("x", "x")).toDF("r1", "r2"), "r1", "r2")
      .collect().head
    assert(const.getLong(0) === 10L && const.isNullAt(4))
    // null labels are unjudged rows — excluded
    val withNull = Profile.cohenKappa(
      (rows.map { case (a, b) => (Option(a), Option(b)) } :+
        ((Option.empty[String], Option("a")))).toDF("r1", "r2"), "r1", "r2")
      .collect().head
    assert(withNull.getLong(0) === 50L)
  }

  test("kendall tau-a: perfect order 1, reversal -1, hand mixed case, " +
      "ties count as neither, singleton groups undefined, the group " +
      "cap raises") {
    import spark.implicits._
    def run(rows: Seq[(String, Long, Long, Long)], cap: Int = 4096) =
      Profile.kendallTau(rows.toDF("g", "id", "x", "y"),
        "g", "id", "x", "y", cap)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(5),
            if (r.isNullAt(6)) None else Some(r.getLong(6))))).toMap
    val perfect = run((1L to 4L).map(i => ("g", i, i, i * 10)))
    assert(perfect("g") === ((4L, 6L, 6L, 0L, 0L, Some(1000000L))))
    val reversed = run((1L to 4L).map(i => ("g", i, i, -i)))
    assert(reversed("g")._6 === Some(-1000000L), "the negative path")
    // mixed: x=(1,2,3), y=(2,1,3) -> C=2, D=1, tau = 1/3
    val mixed = run(Seq(("g", 1L, 1L, 2L), ("g", 2L, 2L, 1L),
      ("g", 3L, 3L, 3L)))
    assert(mixed("g") === ((3L, 3L, 2L, 1L, 0L, Some(333333L))))
    // a tie in either variable is neither concordant nor discordant
    val tied = run(Seq(("g", 1L, 1L, 1L), ("g", 2L, 1L, 2L)))
    assert(tied("g") === ((2L, 1L, 0L, 0L, 1L, Some(0L))))
    // one row: no pairs, no defined tau
    assert(run(Seq(("g", 1L, 5L, 5L)))("g")._6 === None)
    val ex = intercept[Exception](
      run((1L to 5L).map(i => ("g", i, i, i)), cap = 4))
    assert(ex.getMessage.contains("quadratic"))
  }

  test("concentration: single source saturates at 1e6, equal sources " +
      "read 1e6/k with the effective count exactly k, skew reads " +
      "between, null groups are a real segment") {
    import spark.implicits._
    def run(rows: Seq[String]) =
      Profile.concentration(rows.map(Tuple1(_)).toDF("source"), "source")
        .collect().head
    val one = run(Seq.fill(5)("a"))
    assert((one.getLong(0), one.getLong(1), one.getLong(2),
      one.getLong(3)) === ((5L, 1L, 1000000L, 1000000L)))
    val four = run(Seq("a", "a", "b", "b", "c", "c", "d", "d"))
    assert((four.getLong(2), four.getLong(3)) === ((250000L, 4000000L)),
      "four equal sources: hhi 1e6/4, effective count exactly 4")
    val skew = run(Seq("a", "a", "a", "b"))
    assert((skew.getLong(2), skew.getLong(3)) === ((625000L, 1600000L)))
    val withNull = run(Seq("a", null, null))
    assert(withNull.getLong(1) === 2L,
      "unattributed rows form their own segment")
  }

  test("krippendorff alpha: hand coincidence arithmetic, singleton units " +
      "excluded, perfect agreement 1, systematic disagreement negative " +
      "by subtraction, one-category data undefined") {
    import spark.implicits._
    def run(rows: Seq[(Long, String)]) =
      Profile.krippendorffAlpha(rows.toDF("unit", "cat"), "unit", "cat")
        .collect().head
    // u1:(a,a) agrees, u2:(a,b) disagrees, u3:(b,b) agrees, u4:(b)
    // excluded -> D_o = 2, n=6, n_a=n_b=3, D_e = (36-18)/5 = 3.6,
    // alpha = 1 - 2/3.6 = 0.4444.. -> 1e6 - 555556 = 444444
    val r = run(Seq(1L -> "a", 1L -> "a", 2L -> "a", 2L -> "b",
      3L -> "b", 3L -> "b", 4L -> "b"))
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((3L, 6L, 2L)),
      "the singleton unit contributes no pairable values")
    // do_ppm = 2e6/6 = 333333; de_ppm = 18e6/30 = 600000
    assert((r.getLong(3), r.getLong(4), r.getLong(5)) ===
      ((333333L, 600000L, 444444L)))
    // perfect agreement across two categories: alpha exactly 1
    val p = run(Seq(1L -> "x", 1L -> "x", 2L -> "y", 2L -> "y"))
    assert(p.getLong(5) === 1000000L)
    // systematic disagreement: two (a,b) units -> D_o=4, D_e=8/3,
    // alpha = 1 - 4*3/8 = -0.5 (negative via subtraction, no
    // negative division anywhere)
    val neg = run(Seq(1L -> "a", 1L -> "b", 2L -> "a", 2L -> "b"))
    assert(neg.getLong(5) === -500000L)
    // all pairable ratings one category: D_e = 0 -> undefined
    val const = run(Seq(1L -> "x", 1L -> "x", 2L -> "x", 2L -> "x"))
    assert(const.isNullAt(5) && const.getLong(3) === 0L)
  }

  test("fleiss kappa: perfect panels score 1, exactly-chance panels 0, " +
      "systematic disagreement goes NEGATIVE, one-category panels are " +
      "undefined, unequal rater counts raise") {
    import spark.implicits._
    def run(rows: Seq[(Long, String)]) =
      Profile.fleissKappa(rows.toDF("item", "cat"), "item", "cat")
        .collect().head
    // perfect agreement, two categories evenly: kappa exactly 1
    val perfect = run(Seq(1L -> "x", 1L -> "x", 1L -> "x",
      2L -> "x", 2L -> "x", 2L -> "x",
      3L -> "y", 3L -> "y", 3L -> "y", 4L -> "y", 4L -> "y", 4L -> "y"))
    assert((perfect.getLong(0), perfect.getLong(1), perfect.getLong(2)) ===
      ((4L, 3L, 2L)))
    assert((perfect.getLong(3), perfect.getLong(4), perfect.getLong(5)) ===
      ((1000000L, 500000L, 1000000L)))
    // hand case landing EXACTLY at chance: P_o = P_e = 10/18 -> kappa 0
    val chance = run(Seq(1L -> "x", 1L -> "x", 1L -> "y",
      2L -> "x", 2L -> "x", 2L -> "x", 3L -> "y", 3L -> "y", 3L -> "x"))
    assert((chance.getLong(3), chance.getLong(4), chance.getLong(5)) ===
      ((555556L, 555556L, 0L)))
    // systematic disagreement: every pair split -> kappa = -1 (the
    // negative branch must round away from the truncate-vs-floor trap)
    val neg = run(Seq(1L -> "x", 1L -> "y", 2L -> "y", 2L -> "x"))
    assert(neg.getLong(5) === -1000000L)
    // all ratings one category: chance agreement total -> undefined
    val const = run(Seq(1L -> "x", 1L -> "x", 2L -> "x", 2L -> "x"))
    assert(const.getLong(3) === 1000000L && const.isNullAt(5))
    // unequal panels are a design violation, not data
    val ex = intercept[Exception](
      run(Seq(1L -> "x", 1L -> "y", 2L -> "x")))
    assert(ex.getMessage.contains("same rater count"))
  }

  test("pass@k: hand combinatorics, the n-c<k certainty branch, " +
      "undefined when n<k, unjudged excluded, the overflow cap raises") {
    import spark.implicits._
    // problem A: n=10, c=3 -> pass@1 = 3/10; pass@5 = 1 - C(7,5)/C(10,5)
    // = 11/12 -> half-up 916667
    val a = (1 to 10).map(i => ("A", i <= 3))
    // problem B: n=5, c=2 -> at k=4, n-c = 3 < 4: EVERY size-4 subset
    // contains a pass -> exactly 1e6; at k=10, n < k -> undefined
    val b = (1 to 5).map(i => ("B", i <= 2))
    val out = Profile.passAtK((a ++ b).toDF("p", "pass"), "p", "pass",
        ks = Seq(1, 4, 5, 10))
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(out(("A", 1)) === Some(300000L), "pass@1 is exactly c/n")
    assert(out(("A", 5)) === Some(916667L), "1 - C(7,5)/C(10,5) = 11/12")
    assert(out(("B", 4)) === Some(1000000L),
      "n - c < k: a size-k subset cannot avoid every pass")
    assert(out(("B", 10)) === None,
      "fewer samples than k has no defined estimate")
    // null verdicts are unjudged — excluded from n
    val withNull = Profile.passAtK(
      (a.map { case (p, v) => (p, Option(v)) } :+
        (("A", Option.empty[Boolean]))).toDF("p", "pass"),
      "p", "pass", ks = Seq(1)).collect().head
    assert(withNull.getLong(2) === 10L)
    // the DECIMAL(38,0) head-room cap: plan-time on (maxN, max k), and
    // in-plan when a problem actually exceeds maxN
    intercept[IllegalArgumentException](
      Profile.passAtK(a.toDF("p", "pass"), "p", "pass",
        ks = Seq(16), maxN = 1000))
    val ex = intercept[Exception](Profile.passAtK(
      a.toDF("p", "pass"), "p", "pass", ks = Seq(1), maxN = 5).collect())
    assert(ex.getMessage.contains("more than 5 samples"))
  }

  test("self-consistency: mode with lexicographic tiebreak, abstentions " +
      "counted not voted, all-null questions surface, gold conflicts raise") {
    import spark.implicits._
    val rows = Seq(
      // q1: a beats b 3-2, gold a -> correct, vote 600000
      ("q1", Option("a"), "a"), ("q1", Option("a"), "a"),
      ("q1", Option("a"), "a"), ("q1", Option("b"), "a"),
      ("q1", Option("b"), "a"),
      // q2: x and y tie 2-2 -> lexicographically smaller x wins; gold y
      ("q2", Option("x"), "y"), ("q2", Option("x"), "y"),
      ("q2", Option("y"), "y"), ("q2", Option("y"), "y"),
      // q3: two abstentions + one z, gold z -> correct off one vote
      ("q3", Option.empty[String], "z"), ("q3", Option.empty[String], "z"),
      ("q3", Option("z"), "z"),
      // q4: every answer null -> no vote is not a right answer
      ("q4", Option.empty[String], "w"), ("q4", Option.empty[String], "w")
    ).toDF("q", "ans", "gold")
    val out = Profile.selfConsistency(rows, "q", "ans", "gold")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
          if (r.isNullAt(5)) None else Some(r.getLong(5)),
          r.getBoolean(6)))).toMap
    assert(out("q1") === ((5L, 0L, 2L, "a", Some(600000L), true)))
    assert(out("q2") === ((4L, 0L, 2L, "x", Some(500000L), false)),
      "ties break to the lexicographically smallest answer")
    assert(out("q3") === ((1L, 2L, 1L, "z", Some(1000000L), true)),
      "abstentions count in n_null, not in the vote")
    assert(out("q4") === ((0L, 2L, 0L, null, None, false)),
      "an all-abstention question surfaces as incorrect, not absent")
    // two golds for one question is a data bug, not a tie to break
    val ex = intercept[Exception](Profile.selfConsistency(
      Seq(("q", Option("a"), "g1"), ("q", Option("a"), "g2"))
        .toDF("q", "ans", "gold"), "q", "ans", "gold").collect())
    assert(ex.getMessage.contains("conflicting golds"))
  }

  test("binaryEval: the sklearn textbook case hits AUC 0.75 / AP 5/6, " +
      "a separable split reads 1e6/1e6, an all-tied split reads the " +
      "coin-flip 0.5 AUC with base-rate AP") {
    import spark.implicits._
    // scores [.1, .4, .35, .8] labels [0, 0, 1, 1] in micros — the
    // sklearn doc example: AUC = 3/4, AP = 1/2 + 1/3 = 5/6
    val skl = Seq(("g", 100000L, false), ("g", 400000L, false),
      ("g", 350000L, true), ("g", 800000L, true))
      .toDF("grp", "score", "label")
    val r = Profile.binaryEval(skl, "grp", "score", "label").collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((4L, 2L, 2L)))
    assert(r.getLong(4) === 6L, "2U = 2*3 concordant pairs, no ties")
    assert(r.getLong(5) === 750000L && r.getLong(6) === 833333L)
    // perfectly separable: every positive above every negative
    val sep = Seq(("g", 900000L, true), ("g", 800000L, true),
      ("g", 200000L, false), ("g", 100000L, false))
      .toDF("grp", "score", "label")
    val rs = Profile.binaryEval(sep, "grp", "score", "label").collect().head
    assert(rs.getLong(5) === 1000000L && rs.getLong(6) === 1000000L)
    // inseparable: one score for everything -> all pairs tie, AUC = 1/2;
    // AP = the single threshold's precision = the base rate 1/3
    val tie = Seq(("g", 5L, true), ("g", 5L, false), ("g", 5L, false))
      .toDF("grp", "score", "label")
    val rt = Profile.binaryEval(tie, "grp", "score", "label").collect().head
    assert(rt.getLong(4) === 2L, "2U = p*n ties = 1*2")
    assert(rt.getLong(5) === 500000L && rt.getLong(6) === 333333L)
  }

  test("binaryEval: cross-bucket prefixes and negative scores agree " +
      "with the single-bucket plan; degenerate groups go null; the " +
      "bucket cap raises") {
    import spark.implicits._
    // scores straddle bucket boundaries AND zero (floor-div path):
    // same relation evaluated at width 2 (many buckets, cross-bucket
    // join does the work) and width 1<<20 (one bucket, pure window)
    // must agree exactly
    val df = Seq(("g", -5L, false), ("g", -2L, true), ("g", -2L, false),
      ("g", 0L, false), ("g", 3L, true), ("g", 7L, true), ("g", 9L, false))
      .toDF("grp", "score", "label")
    val narrow = Profile.binaryEval(df, "grp", "score", "label",
      bucketWidth = 2L).collect().head
    val wide = Profile.binaryEval(df, "grp", "score", "label",
      bucketWidth = 1L << 20).collect().head
    assert(narrow.toSeq === wide.toSeq,
      "bucketWidth is a plan knob, never a semantics knob")
    // hand check: pos {-2, 3, 7}, neg {-5, -2, 0, 9}; W = (-2>-5) +
    // (3 > -5,-2,0) + (7 > -5,-2,0) = 7, T = 1 -> 2U = 15
    assert(narrow.getLong(4) === 15L)
    // a group with no negatives has undefined discrimination
    val deg = Seq(("g", 1L, true), ("g", 2L, true))
      .toDF("grp", "score", "label")
    val rd = Profile.binaryEval(deg, "grp", "score", "label").collect().head
    assert(rd.isNullAt(5) && rd.isNullAt(6) && rd.getLong(3) === 0L)
    // two groups evaluate independently
    val two = Profile.binaryEval(
      Seq(("a", 2L, true), ("a", 1L, false), ("b", 1L, true),
        ("b", 2L, false)).toDF("grp", "score", "label"),
      "grp", "score", "label")
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(two === Map("a" -> 1000000L, "b" -> 0L))
    // the cross-bucket self-join is buckets-squared: cap-guarded
    val ex = intercept[Exception](Profile.binaryEval(df, "grp", "score",
      "label", bucketWidth = 1L, maxBuckets = 2).collect())
    assert(ex.getMessage.contains("buckets-squared"))
  }

  test("riskCoverage: hand-checked curve, higher thresholds trade " +
      "coverage for risk, bucketWidth is a plan knob, the cap raises") {
    import spark.implicits._
    val df = Seq(("g", 10L, true), ("g", 20L, false), ("g", 30L, true),
      ("g", 30L, true), ("g", 40L, false))
      .toDF("grp", "score", "correct")
    val out = Profile.riskCoverage(df, "grp", "score", "correct")
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(out.size === 4, "one row per distinct score")
    assert(out(10L) === ((5L, 2L, 1000000L, 400000L)),
      "threshold at the minimum accepts everything: full coverage, " +
        "base error rate")
    assert(out(20L) === ((4L, 2L, 800000L, 500000L)))
    assert(out(30L) === ((3L, 1L, 600000L, 333333L)))
    assert(out(40L) === ((1L, 1L, 200000L, 1000000L)),
      "the top threshold here accepts exactly the one wrong example")
    // bucketWidth is a plan knob, never a semantics knob
    val narrow = Profile.riskCoverage(df, "grp", "score", "correct",
      bucketWidth = 2L).collect().map(_.toSeq).toSet
    assert(narrow === Profile.riskCoverage(df, "grp", "score", "correct")
      .collect().map(_.toSeq).toSet)
    val ex = intercept[Exception](Profile.riskCoverage(df, "grp",
      "score", "correct", bucketWidth = 1L, maxBuckets = 2).collect())
    assert(ex.getMessage.contains("buckets-squared"))
  }

  test("calibratedAbstain: an ANTI-calibrated class accepts LOW scores " +
      "(wrong high-score predictions abstain), a calibrated class " +
      "accepts high, no-contrast and no-scale classes abstain " +
      "entirely, unlabeled rows shape the population but not the " +
      "direction") {
    import spark.implicits._
    val rows = Seq(
      // class A: wrong predictions score HIGHER (the q_v30 shape) —
      // direction must read -1 and the verdict must flip
      (1L, "A", 10L, Option(true)), (2L, "A", 20L, Option(true)),
      (3L, "A", 90L, Option(false)), (4L, "A", 80L, Option(false)),
      (5L, "A", 15L, Option.empty[Boolean]),
      (6L, "A", 95L, Option.empty[Boolean]),
      // class B: the textbook calibrated margin
      (7L, "B", 90L, Option(true)), (8L, "B", 80L, Option(true)),
      (9L, "B", 10L, Option(false)), (10L, "B", 20L, Option(false)),
      // class C: all labeled evidence is one verdict — no contrast
      (11L, "C", 5L, Option(true)), (12L, "C", 7L, Option(true)),
      // class D: a single row has no scale
      (13L, "D", 1L, Option(true)))
      .toDF("id", "cls", "score", "lab")
    val out = Profile.calibratedAbstain(rows, "id", "cls", "score", "lab")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(4), r.getLong(5), r.getLong(6), r.getInt(7),
          if (r.isNullAt(8)) None else Some(r.getLong(8)),
          r.getBoolean(9)))).toMap
    assert(out.size === 13)
    // A: population n=6 (unlabeled rows count), labeled slice 4/2
    assert(out(1L)._1 === 6L && out(1L)._2 === 4L && out(1L)._3 === 2L)
    assert(out(1L)._4 === -1, "wrong scores higher -> direction -1")
    assert(out(1L)._6 && out(2L)._6 && out(5L)._6,
      "below-mean scores accept under the learned inversion")
    assert(!out(3L)._6 && !out(4L)._6 && !out(6L)._6,
      "the wrong high-score predictions (and their unlabeled " +
        "lookalike) abstain")
    // B: mean 50, std 35.355339 -> z(90) = round(1.131371)e6
    assert(out(7L)._4 === 1 && out(7L)._5 === Some(1131371L))
    assert(out(7L)._6 && out(8L)._6 && !out(9L)._6 && !out(10L)._6)
    // C: no contrast -> direction 0 -> every row abstains
    assert(out(11L)._4 === 0 && !out(11L)._6 && !out(12L)._6)
    // D: n=1 -> no scale -> null z -> abstains
    assert(out(13L)._5 === None && !out(13L)._6)
  }
}
