package graft

import org.apache.spark.sql.functions._

/** Round-9 additions: snapshot diff (q162), PSI drift (q163),
  * prefix-filter set-similarity join (q164), blocked fuzzy tail
  * verify (q165), quantile sketch calibration (q166), bucketed
  * interval join (q167). The oracle gate pins values for all but
  * q166; these tests carry the ALGORITHMIC invariants — losslessness
  * of the prefix filter and the bucket decomposition, the sketch's
  * published error bound, and the diff's construction arithmetic.
  */
class Round12OpsSpec extends SparkSpec {

  test("q164 prefix-filter join returns EXACTLY q41's all-pairs answer, from fewer candidates") {
    val exact = Registry.byName("q41_jaccard_pairs").fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pref = Registry.byName("q164_setsim_prefix").fn(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pref === exact, "prefix filtering must be lossless at tau=0.5")
    assert(exact.nonEmpty, "fixture should contain near-dup pairs")
    graft.queries.TextOps.releaseCaches()
  }

  test("q164's prefix prunes the candidate space vs the full inverted index") {
    // candidate volume is the whole point of the algorithm: pairs
    // sharing ANY shingle (q41's join load) vs pairs sharing a PREFIX
    // shingle. Recomputed here standalone (same shingle definition).
    val docs = Tables.load(spark, sfDir, "documents")
    val sh = docs.select(col("doc_id"), graft.Fns.toks(col("text")).as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"), explode(array_distinct(
        graft.Fns.shingles(col("tk"), 3))).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("sk"))
      .persist()
    def pairCount(keys: org.apache.spark.sql.DataFrame): Long =
      keys.select(col("doc_id").as("da"), col("sk"))
        .join(keys.select(col("doc_id").as("db"), col("sk")), Seq("sk"))
        .filter(col("da") < col("db"))
        .select(col("da"), col("db")).distinct().count()
    val all = pairCount(sh)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val dfreq = sh.groupBy(col("sk")).agg(count(lit(1)).as("df"))
    val pref = sh.join(dfreq, Seq("sk"))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("df"), col("sk"))))
      .join(sizes, Seq("doc_id"))
      .filter(col("pos") <= expr("n div 2 + 1"))
      .select(col("doc_id"), col("sk"))
    val pruned = pairCount(pref)
    sh.unpersist()
    assert(pruned < all,
      s"prefix candidates ($pruned) should undercut inverted-index pairs ($all)")
  }

  test("q162 snapshot diff counts match the modular construction") {
    val docs = Tables.load(spark, sfDir, "documents")
    val byMod = docs.select(pmod(col("doc_id"), lit(7L)).as("m"))
      .groupBy(col("m")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val diff = Registry.byName("q162_snapshot_diff").fn(spark, sfDir)
      .groupBy(col("status")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(diff("removed") === byMod(3L))
    assert(diff("changed") === byMod(5L))
    assert(diff("added") === byMod(1L))
    assert(!diff.contains("unchanged"))
  }

  test("q163 PSI is non-negative and the verdict matches its thresholds") {
    val rows = Registry.byName("q163_psi_drift").fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val psi = r.getDouble(r.fieldIndex("psi"))
      val verdict = r.getString(r.fieldIndex("verdict"))
      // every PSI term (pa-pb)*ln(pa/pb) is >= 0 (same sign factors)
      assert(psi >= 0.0, s"${r.getString(0)}: psi $psi")
      val expected =
        if (psi > 0.25) "act" else if (psi > 0.1) "watch" else "stable"
      assert(verdict === expected, s"${r.getString(0)}")
    }
  }

  test("q167's bucket decomposition equals the naive range join") {
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), floor(col("ts").cast("double")).cast("long").as("sec"))
    val inc = ev.orderBy(col("value").desc, col("event_id")).limit(20)
      .select(col("event_id").as("incident_id"), col("event_type").as("itype"),
        (col("sec") - 1800L).as("lo"), (col("sec") + 1800L).as("hi"))
    // naive containment join (BroadcastNestedLoop at this size) — the
    // semantics the bucketed plan must reproduce exactly
    val naive = ev.join(inc,
        col("event_type") === col("itype") &&
          col("sec").between(col("lo"), col("hi")))
      .groupBy(col("incident_id"))
      .agg(count(lit(1)).as("n"), sum(graft.Fns.cents(col("value"))).as("v"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val bucketed = Registry.byName("q167_incident_join").fn(spark, sfDir)
      .collect().map(r => r.getLong(r.fieldIndex("incident_id")) ->
        (r.getLong(r.fieldIndex("n_events")),
          r.getLong(r.fieldIndex("value_cents")))).toMap
    assert(bucketed === naive)
    // every incident window contains at least its own event
    assert(bucketed.values.forall(_._1 >= 1L))
  }

  test("q166 approx quantiles sit inside the GK rank-error bound") {
    val orders = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderpriority"), col("o_totalprice")).persist()
    val rows = Registry.byName("q166_quantile_sketch").fn(spark, sfDir).collect()
    assert(rows.length > 0)
    val qOf = Map("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)
    rows.foreach { r =>
      val prio = r.getString(r.fieldIndex("o_orderpriority"))
      val n = r.getLong(r.fieldIndex("n"))
      val qv = qOf(r.getString(r.fieldIndex("quantile")))
      val approx = r.getDouble(r.fieldIndex("approx"))
      // measured rank of the sketch's answer within its group
      val below = orders
        .filter(col("o_orderpriority") === prio &&
          col("o_totalprice") <= approx).count()
      // GK guarantee: rank error <= n/accuracy; rounding the reported
      // value to 4dp can shift the measured rank by the tie mass at
      // the boundary — allow one extra rank of slack
      val bound = n.toDouble / 10000.0 + 1.0
      val err = math.abs(below - qv * n)
      assert(err <= bound + 1.0,
        s"$prio $qv: rank $below of $n vs target ${qv * n} (bound $bound)")
    }
    orders.unpersist()
  }

  test("q168 SCD2 versions reconstruct every event's tier point-in-time") {
    // the leakage-free property the op exists for: joining any event
    // back to the version row whose [valid_from, valid_to] contains it
    // must recover exactly the tier the event itself implies
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("user_id"),
        floor(col("ts").cast("double")).cast("long").as("sec"),
        when(col("value") < 50, "low").when(col("value") < 200, "mid")
          .otherwise("high").as("etier"))
    val scd = Registry.byName("q168_scd2_tiers").fn(spark, sfDir)
    val joined = ev.join(scd,
      ev("user_id") === scd("user_id") &&
        col("sec") >= col("valid_from") &&
        (col("valid_to").isNull || col("sec") <= col("valid_to")))
    // exactly one version matches each event (intervals tile, no overlap)
    assert(joined.count() === ev.count())
    assert(joined.filter(col("etier") =!= col("tier")).count() === 0)
    // open-ended current version: exactly one NULL valid_to per user
    val opens = scd.filter(col("valid_to").isNull)
      .groupBy(col("user_id")).count()
    assert(opens.filter(col("count") =!= 1).count() === 0)
  }

  test("q169 containment pairs are asymmetric sub-documents invisible to Jaccard at the same bar") {
    val rows = Registry.byName("q169_containment_dedup").fn(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      val na = r.getLong(r.fieldIndex("na"))
      val nb = r.getLong(r.fieldIndex("nb"))
      val cont = r.getDouble(r.fieldIndex("containment"))
      assert(na < nb, "contained side must be strictly smaller")
      assert(cont >= 0.8)
      // containment strictly exceeds Jaccard when the container is
      // bigger: union > |A| forces c/union < c/|A|
      assert(!pairs.contains((r.getLong(1), r.getLong(0))),
        "containment output must be directional")
    }
    graft.queries.TextOps.releaseCaches()
  }

  test("q170 purge accounting conserves rows and the lineitem cascade matches a recount") {
    val rows = Registry.byName("q170_purge_cascade").fn(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet === Set("events", "customer", "orders", "lineitem"))
    rows.values.foreach { case (tot, purged, kept) =>
      assert(purged + kept === tot)
    }
    // independent recount of the referential cascade
    val ords = Tables.load(spark, sfDir, "orders")
    val purgedKeys = ords.filter(pmod(col("o_custkey"), lit(97L)) === 13)
      .select(col("o_orderkey"))
    val liPurged = Tables.load(spark, sfDir, "lineitem")
      .join(purgedKeys, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .count()
    assert(rows("lineitem")._2 === liPurged)
  }
}
