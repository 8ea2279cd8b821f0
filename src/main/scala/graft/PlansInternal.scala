package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Plan-audit main for INTERNAL operator paths (round-17 optimization
  * evidence): registers a QueryExecutionListener and dumps the
  * formatted physical plan of EVERY action executed while (a) one
  * SnapshotLog append commits and (b) one ANN probe-grid calibration
  * sweep runs — so the number of data passes per operation (and the
  * CollectMetrics stat fold riding the write) is checkable as text,
  * not taken from prose. Usage:
  *   runMain graft.PlansInternal <sfDir> <outFile>
  */
object PlansInternal {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1) else "/tmp/plans_internal.txt"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.requiredConf._1, Tables.requiredConf._2)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(fn: String, qe: QueryExecution,
          ns: Long): Unit =
        sink.add(s"-------- action: $fn --------\n" + qe.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      override def onFailure(fn: String, qe: QueryExecution,
          e: Exception): Unit = ()
    }
    def section(title: String)(body: => Unit): Unit = {
      sink.clear()
      body
      // listener delivery is async; settle before snapshotting
      Thread.sleep(2000)
      sb.append(s"==================== $title ====================\n")
      sink.forEach(p => { sb.append(p).append("\n"); () })
      sb.append("\n")
    }
    spark.listenerManager.register(listener)

    section("SnapshotLog.append (one commit: every executed action)") {
      import graft.ext.SnapshotLog
      val dir = Files.createTempDirectory("graft-plansint").toString
      SnapshotLog.reset(dir, statsCols = Seq("ok" -> "o_orderkey"))
      val o = Tables.load(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      SnapshotLog.append(o, dir, col("o_custkey"))
      ()
    }

    section("ANN probe-grid calibration sweep (every executed action)") {
      import graft.ext.IvfPq
      val emb = Tables.load(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val index = IvfPq.build(spark, emb, dim = 64, kCells = 8)
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      sink.clear() // drop the index-build actions; audit the sweep only
      graft.queries.VectorOps.calibrationSweepForPlanAudit(index, emb, q)
      index.close()
    }

    spark.listenerManager.unregister(listener)
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
