package graft

import org.apache.spark.sql.SparkSession

/** Single-query timing harness for plan iteration: times the named
  * registered queries (args) with the same noop-forcing protocol as
  * `Bench`, without paying for the other ~110. `build:<name>` args
  * time a Bench build step instead (caches released between runs so
  * run 2+ re-measures real work, not a memo hit). N runs per name via
  * SPARK_GRAFT_RUNS (default 2). Usage:
  * `runMain graft.BenchOne q109_pq_topk [build:containment_screen ...]`.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
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
    def releaseAll(): Unit = {
      graft.queries.TextOps.releaseCaches()
      graft.queries.VectorOps.releaseCaches()
      graft.queries.EventOps.releaseCaches()
      graft.queries.RecoOps.releaseCaches()
    }
    args.foreach { name =>
      // (pre, work): pre runs OUTSIDE the timer — for build steps the
      // cache release must not be billed to the build being measured
      // (round-15 advice), it only exists so run 2+ re-measures real
      // work instead of a memo hit
      val (pre, run): (() => Unit, () => Unit) =
        if (name.startsWith("build:")) {
          val step = name.stripPrefix("build:")
          val fn = Bench.buildSteps.toMap.getOrElse(step,
            throw new NoSuchElementException(s"unknown build step: $step"))
          (() => releaseAll(), () => fn(spark, sfDir))
        } else {
          val fn = SparkEntry.queries(name)
          (() => (),
            () => fn(spark, sfDir).write.format("noop").mode("overwrite").save())
        }
      (1 to runs).foreach { i =>
        pre()
        val t0 = System.nanoTime()
        run()
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
