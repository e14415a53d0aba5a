package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev tool: scan every registered query's physical plan for red flags. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, d).queryExecution.executedPlan.toString
        // NOTE: under AQE the pre-execution plan string hides
        // WholeStageCodegen spans — do not try to detect codegen here.
        val flags = Seq(
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "BNLJ" -> plan.contains("BroadcastNestedLoopJoin"),
          "SMJ" -> plan.contains("SortMergeJoin")
        ).collect { case (f, true) => f }
        val nEx = "Exchange".r.findAllIn(plan).size
        println(f"$name%-28s exchanges=$nEx%-3d ${flags.mkString(",")}")
      } catch { case e: Throwable => println(s"$name ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
