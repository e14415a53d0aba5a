package graft.queries

/** Temp scratch dirs for write-then-read registered queries (q_d13's
  * signature store, q_x31's BM25 index): registered for recursive
  * deletion at JVM exit, so repeated verify/bench/probe runs don't
  * accumulate corpus-sized parquet under /tmp. (Deletion can't happen
  * earlier — the returned DataFrames read the files lazily when the
  * consumer executes the plan.) */
private[queries] object TempDirs {
  def scratch(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(dir.toFile)
    }))
    dir.toString
  }
}
