package graft.tools

/** Dev tool: print one oracle SQL statement to a file (for DuckDB
  * profiling outside the Verify harness).
  * Usage: runMain graft.tools.OracleDump <queryName> <outFile>
  */
object OracleDump {
  def main(args: Array[String]): Unit = {
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(args(1)),
      graft.SparkEntry.oracleSql(args(0)))
  }
}
