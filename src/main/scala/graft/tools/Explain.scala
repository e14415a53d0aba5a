package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev tool: print formatted physical plans / time selected queries. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach {
      case s"time:$q" =>
        val df = graft.SparkEntry.queries(q)(spark, d)
        for (i <- 1 to 3) {
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          println(s"$q run$i: ${(System.nanoTime() - t0) / 1e9}")
        }
      case q =>
        println(s"########## $q ##########")
        graft.SparkEntry.queries(q)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
