package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._
import graft.ext.SkewJoin

/** Scale-pattern proofs: bucketed co-located joins eliminate the join
  * shuffle; salted joins equal their plain equivalents; and the plan
  * audits that guard those wins against regression (a reverted
  * `Window.orderBy` or an accidental cartesian product fails here, not
  * at 100 TB).
  */
class ScaleSpec extends SparkSpec {

  // Model-fitting / iterative-trainer queries execute Spark jobs just
  // to CONSTRUCT their result frame (KMeans/ALS fits, q134's per-round
  // localCheckpoints) — no stable static plan to audit. q133/q134 get
  // their plan/shape guards in IvfPqSpec and Round9OpsSpec instead.
  private val fitQueries = Set("q61_als_recommend", "q79_ivf_topk",
    "q109_pq_topk", "q133_ivfpq_topk", "q134_bpe_train", "q136_bpe_encode")

  test("no registered query plans a cartesian product") {
    staticPlan {
      Registry.all.filterNot(q => fitQueries(q.name)).foreach { q =>
        val plan = q.fn(spark, sfDir).queryExecution.executedPlan
        val cart = plan.collect { case c: CartesianProductExec => c }
        assert(cart.isEmpty, s"${q.name} plans a CartesianProduct")
      }
    }
  }

  test("selective scans reach the parquet reader as pushed filters") {
    staticPlan {
      Seq("q01_popular", "q03_range_filter", "q25_star_join").foreach { n =>
        val txt = Registry.byName(n).fn(spark, sfDir).queryExecution
          .explainString(FormattedMode)
        val pushed = txt.linesIterator
          .filter(_.trim.startsWith("PushedFilters:")).toSeq
        assert(pushed.exists(l => !l.trim.endsWith("[]")),
          s"$n pushes no filters into any scan:\n${pushed.mkString("\n")}")
      }
    }
  }

  test("global rankings never single-partition the data (RangeRank guard)") {
    // q62/q70 (and q60's popularity quartiling) rank via ext.RangeRank:
    // the ONLY single-partition exchange allowed in their plans is the
    // one over the per-bucket count table (O(buckets) rows, recognizable
    // by its __bucket column). A revert to Window.orderBy over the data
    // plans a SinglePartition exchange of the raw input and fails here.
    staticPlan {
      Seq("q62_ntile_quartiles", "q70_percent_rank", "q60_synth_ratings")
        .foreach { n =>
          val plan = Registry.byName(n).fn(spark, sfDir)
            .queryExecution.executedPlan
          val bad = plan.collect {
            case e: ShuffleExchangeExec
                if e.outputPartitioning.numPartitions == 1 &&
                  !e.child.toString.contains("__bucket") => e
          }
          assert(bad.isEmpty,
            s"$n single-partitions non-bucket-count data:\n${bad.mkString("\n")}")
        }
    }
  }

  test("sequence packing single-partitions only the per-source offset table") {
    // q89's global prefix sum must stay the two-pass shape: per-source
    // window cumsums over the data, one tiny ordered window over the
    // per-source totals (recognizable by its `stot` aggregate). A
    // revert to a global Window.orderBy cumsum would single-partition
    // the raw documents scan and fail here.
    staticPlan {
      val plan = Registry.byName("q89_pack_chunks").fn(spark, sfDir)
        .queryExecution.executedPlan
      val bad = plan.collect {
        case e: ShuffleExchangeExec
            if e.outputPartitioning.numPartitions == 1 &&
              !e.child.toString.contains("stot") => e
      }
      assert(bad.isEmpty,
        s"q89 single-partitions non-offset data:\n${bad.mkString("\n")}")
    }
  }

  test("q128's smoothing grid broadcasts its tiny sides (never a data cartesian)") {
    // q128 builds the vocab × sources summation grid by crossing the
    // vocab-keyed count table with the per-source totals (|sources|
    // rows) and the 1-row corpus totals. Both tiny sides carry an
    // explicit broadcast hint; if someone drops a hint the planner
    // falls back to CartesianProductExec, which the registry-wide audit
    // above rejects — this test pins the positive shape too.
    staticPlan {
      val plan = Registry.byName("q128_source_kl").fn(spark, sfDir)
        .queryExecution.executedPlan
      val bnl = plan.collect { case b: BroadcastNestedLoopJoinExec => b }
      assert(bnl.size >= 2,
        s"q128 expected >=2 broadcast nested-loop joins (per-source " +
          s"totals, corpus totals), got ${bnl.size}")
    }
  }

  test("q131's vocab is a top-k merge and a broadcast probe, never a global sort") {
    // the top-1024 vocab must plan TakeOrderedAndProject (per-partition
    // heap + k-row merge) feeding a broadcast hash probe of the token
    // scan; a revert to sort().limit() materialized eagerly, or a
    // dropped broadcast, would single-partition or shuffle the corpus
    staticPlan {
      val plan = Registry.byName("q131_vocab_oov").fn(spark, sfDir)
        .queryExecution.executedPlan
      val topk = plan.collect {
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
      }
      assert(topk.nonEmpty, "q131 lost its TakeOrderedAndProject vocab")
      val bhj = plan.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
      }
      assert(bhj.nonEmpty, "q131's vocab probe is not a broadcast hash join")
    }
  }

  test("q130's per-language rank never windows the corpus by lang alone") {
    // the CCNet bucketing must keep the grouped-RangeRank shape: every
    // WindowExec either ranks within (lang, __bucket) cells or cumsums
    // the tiny (lang, bucket) count table (recognizable by __obucket).
    // A revert to Window.partitionBy(lang).orderBy(score) — one task
    // sorting a whole language at 100 TB — plans a window with neither
    // helper column and fails here.
    staticPlan {
      val plan = Registry.byName("q130_ccnet_buckets").fn(spark, sfDir)
        .queryExecution.executedPlan
      val wins = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(wins.nonEmpty, "q130 lost its ranking windows entirely")
      wins.foreach { w =>
        val s = w.toString
        assert(s.contains("__bucket") || s.contains("__obucket"),
          s"q130 plans a data-level window without a range bucket:\n$s")
      }
    }
  }

  test("shuffle-partition config governs exchange width (X2)") {
    // the session builders pin spark.sql.shuffle.partitions (32 in
    // Bench/Verify, 4 here); the static plan must inherit it
    staticPlan {
      val q = Tables.load(spark, sfDir, "lineitem")
        .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("s"))
      val widths = q.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e.outputPartitioning.numPartitions
      }
      assert(widths.nonEmpty && widths.forall(_ ==
        spark.conf.get("spark.sql.shuffle.partitions").toInt))
    }
  }

  test("AQE coalesces tiny shuffle partitions at runtime (X3)") {
    // with AQE on (session default), a 6-group aggregate must NOT run
    // 4 reduce partitions configured statically — runtime stats shrink
    // the exchange to fewer, fuller partitions
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
    val q = Tables.load(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("s"))
    val n = q.rdd.getNumPartitions
    assert(n < spark.conf.get("spark.sql.shuffle.partitions").toInt,
      s"AQE did not coalesce: $n partitions")
  }

  test("bucketed tables join without a shuffle exchange") {
    // warehouse dir is a static conf, set in SparkSpec's builder
    val o = Tables.load(spark, sfDir, "orders")
    val l = Tables.load(spark, sfDir, "lineitem")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    l.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      joined.collect() // force
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      // only the final 3-group aggregation may shuffle; the join itself
      // reads co-located buckets
      assert(shuffles.size <= 1,
        s"expected bucket-co-located join, got ${shuffles.size} shuffles")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("partitioned writes prune partitions at scan time") {
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString + "/events"
    val ev = Tables.load(spark, sfDir, "events")
      .withColumn("day", to_date(col("ts")))
    ev.write.mode("overwrite").partitionBy("day").parquet(out)

    val q = spark.read.parquet(out)
      .filter(col("day") === "2024-01-05")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    // the day predicate must be a partition filter (directory pruning),
    // not a row-level data filter over the full table
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val pf = plan.linesIterator.find(_.trim.startsWith("PartitionFilters:"))
    assert(pf.exists(_.contains("day")), s"no partition filter on day:\n$pf")
    val expected = ev.filter(col("day") === "2024-01-05").count()
    assert(q.agg(sum("n")).collect().head.getLong(0) === expected)
  }

  test("q140's candidate join blocks on (cell, bucket), never cell alone") {
    // the SemDeDup shape is only linear because candidates pair within
    // (cell, adaptive-LSH-bucket) blocks; a revert to cell-only pairing
    // makes the self-join n²/k — at 10 labels that's quadratic. Every
    // self-join of the bucketed corpus must key on BOTH columns.
    staticPlan {
      val plan = Registry.byName("q140_semdedup").fn(spark, sfDir)
        .queryExecution.executedPlan
      val keyJoins = plan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
          j.leftKeys.map(_.toString)
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
          j.leftKeys.map(_.toString)
      }
      val onCell = keyJoins.filter(_.exists(_.contains("cell")))
      assert(onCell.nonEmpty, "q140 lost its cell-blocked candidate join")
      onCell.foreach { ks =>
        assert(ks.exists(_.contains("bucket")),
          s"q140 pairs candidates on cell WITHOUT the bucket block: $ks")
      }
    }
  }

  test("q141's scoring sides broadcast and the top-k is a bounded heap") {
    // query terms (3 rows) and corpus stats (1 row) must reach the tf
    // scan as broadcasts — a shuffled join would re-exchange the token
    // table per side — and the final top-20 must plan
    // TakeOrderedAndProject, never a global sort of all scored docs
    staticPlan {
      val plan = Registry.byName("q141_bm25_topk").fn(spark, sfDir)
        .queryExecution.executedPlan
      val bhj = plan.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
      }
      assert(bhj.nonEmpty, "q141's query-term join is not broadcast")
      val topk = plan.collect {
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
      }
      assert(topk.nonEmpty, "q141's top-20 is not a bounded TakeOrdered")
    }
  }

  test("salted skew join equals the plain join") {
    val l = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_partkey").as("k"), col("l_quantity"))
    val p = Tables.load(spark, sfDir, "part")
      .select(col("p_partkey").as("k"), col("p_name"))
    val plain = l.join(p, Seq("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
    val salted = SkewJoin.saltedEquiJoin(l, p, "k", salt = 4)
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
    assert(plain.exceptAll(salted).count() === 0)
    assert(salted.exceptAll(plain).count() === 0)
  }
}
