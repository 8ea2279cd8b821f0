package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM, forked by sbt). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val sfDir = "/root/testdata/sf0.001"

  /** Plan-shape assertions need AQE off: `AdaptiveSparkPlanExec` is a
    * leaf pre-execution, so `executedPlan.collect` finds nothing inside
    * it and assertions pass vacuously. Restores the conf and releases
    * any query-pinned caches afterwards.
    */
  protected def staticPlan[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally {
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      graft.queries.TextOps.releaseCaches()
      graft.queries.VectorOps.releaseCaches()
    }
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.requiredConf._1, Tables.requiredConf._2)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // Deep-iteration ALS (reference config: maxIter 40) checkpoints its
    // factor RDDs every 10 iters to truncate lineage — without a
    // checkpoint dir the lineage grows unbounded and task
    // deserialization overflows the stack.
    s.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
    s
  }
}
