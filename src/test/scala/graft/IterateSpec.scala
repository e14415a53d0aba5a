package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Graph, Iterate}

/** The checkpoint-mode switch behind every iterative loop: local blocks
  * by default (the local[32] posture), RELIABLE checkpoint files the
  * moment the deployment sets a SparkContext checkpoint dir — the 100 TB
  * posture, where an executor loss mid-iteration must recover from the
  * checkpoint store instead of killing the job. */
class IterateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withCheckpointDir[A](body: String => A): A = {
    val dir = Files.createTempDirectory("graft-ckpt-").toString
    spark.sparkContext.setCheckpointDir(dir)
    try body(dir)
    finally spark.sparkContext.setCheckpointDir(null)
  }

  test("no checkpoint dir: falls back to localCheckpoint (no files written)") {
    import spark.implicits._
    assert(spark.sparkContext.getCheckpointDir.isEmpty,
      "precondition: suite must start without a checkpoint dir")
    val out = Iterate.checkpoint(Seq(1, 2, 3).toDF("x"))
    assert(out.collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 2, 3))
  }

  test("checkpoint dir set: rounds write reliable checkpoint files") {
    import spark.implicits._
    withCheckpointDir { dir =>
      val out = Iterate.checkpoint(Seq(1, 2, 3).toDF("x"))
      assert(out.collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 2, 3))
      val written = Files.walk(Paths.get(dir)).filter(Files.isRegularFile(_))
        .count()
      assert(written > 0, s"reliable checkpoint wrote nothing under $dir")
    }
  }

  test("graph + CC loops produce identical results under the reliable path") {
    import spark.implicits._
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "d")
      .toDF("src", "dst")
    val pairs = Seq(("d1", "d2"), ("d2", "d3"), ("d4", "d5"))
      .toDF("a_id", "b_id")
    val (prLocal, ccLocal) = (
      Graph.pageRank(edges, 5).collect().toSet,
      Dedup.connectedComponents(pairs).collect().toSet)
    val (prReliable, ccReliable) = withCheckpointDir { _ =>
      (Graph.pageRank(edges, 5).collect().toSet,
        Dedup.connectedComponents(pairs).collect().toSet)
    }
    assert(prReliable === prLocal, "pageRank diverged under reliable checkpointing")
    assert(ccReliable === ccLocal, "connectedComponents diverged under reliable checkpointing")
  }
}
