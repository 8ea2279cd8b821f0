package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Plan-audit main: dumps `explain("formatted")` for every registered
  * query so scan pruning (ReadSchema/PushedFilters), join strategies
  * (broadcast vs sort-merge), top-k (TakeOrderedAndProject), and the
  * absence of cartesian products can be reviewed as text.
  *
  * Usage: runMain graft.Plans <sfDir> <outFile>
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1) else "/tmp/plans.txt"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    Registry.all.filterNot(_.name.startsWith("q6")).foreach { q =>
      sb.append(s"==================== ${q.name} ====================\n")
      try sb.append(q.fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => sb.append(s"EXPLAIN FAILED: ${e.getMessage}") }
      sb.append("\n\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
