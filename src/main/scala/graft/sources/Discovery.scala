package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** S3/S4 — source-file discovery (migrate.py:39-42): list a directory,
  * filter by extension, newest-first by modification time, take n.
  * Driver-side Hadoop FS metadata ops — works against any FS the cluster
  * can see (local, HDFS, object stores). Selection itself is an injected
  * parameter in [[graft.etl.MigrationPipeline]] (no interactive prompt).
  */
object Discovery {
  def latestFiles(spark: SparkSession, dir: String, ext: String,
      n: Int = 5): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    fs.listStatus(p).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(ext))
      .sortBy(-_.getModificationTime)
      .take(n)
      .map(_.getPath.toString)
  }
}
