package graft

import org.apache.spark.sql.SparkSession

/** Single-query timing harness for plan iteration: times the named
  * registered queries (args) with the same noop-forcing protocol as
  * `Bench`, without paying for the other ~110. Usage:
  * `runMain graft.BenchOne q109_pq_topk [q61_als_recommend ...]`.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.requiredConf._1, Tables.requiredConf._2)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("id % 7 as k").groupBy("k").count()
      .write.format("noop").mode("overwrite").save()
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[benchone] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    graft.queries.TextOps.releaseCaches()
    graft.queries.VectorOps.releaseCaches()
    graft.queries.EventOps.releaseCaches()
    graft.queries.RecoOps.releaseCaches()
    spark.stop()
  }
}
