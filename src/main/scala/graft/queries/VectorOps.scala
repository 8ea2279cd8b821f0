package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.Fns._
import graft.functions.CosineSimilarity

/** Similarity search over the embeddings fixture (Array[Float], 64-d).
  *
  * Scale design: the brute-force top-k (q50) broadcasts the small
  * *query* side, so the big corpus side streams through one codegen'd
  * stage — correct baseline at any corpus size as long as the query
  * set is small. The scale path for all-pairs-style workloads is
  * bucketed LSH (q51): sign-signature buckets → groupBy-sized joins,
  * never a cartesian product. IVF assignment (q52) is the other
  * standard ANN building block: route each vector to its nearest
  * centroid (centroid table broadcasts).
  *
  * All arithmetic is promoted to double before any multiply/sum so the
  * DuckDB oracle (which computes in DOUBLE[]) matches bit-for-bit;
  * ranking always happens on the 6-decimal-rounded similarity with a
  * vec_id tiebreak, so FP noise below 1e-6 cannot flip row order.
  */
object VectorOps {
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** 8-bit sign-signature LSH bucket from the first 8 dims. */
  private def signBucket(emb: org.apache.spark.sql.Column) =
    (0 until 8).map { j =>
      when(element_at(emb, j + 1) > 0f, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  private val signBucketSql: String =
    (0 until 8).map { j =>
      s"(CASE WHEN embedding[${j + 1}] > 0 THEN ${1 << j} ELSE 0 END)"
    }.mkString(" + ")

  val queries: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q50_cosine_topk",
      "Brute-force cosine top-5 for a small query set (vec_id < 10) against the full corpus: broadcast the queries, one pass over the corpus, per-query top-k via row_number window. The exact-ANN baseline.",
      (s, d) => {
        CosineSimilarity.ensureRegistered(s)
        val e = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val q = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val pairs = e.join(broadcast(q), col("q_id") =!= col("vec_id"))
          .withColumn("cos_r", round(expr("cosine_sim(q_emb, embedding)"), 6))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("cos_r").desc, col("vec_id"))
        pairs.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("q_id"), col("vec_id"), col("cos_r"), col("rn"))
          .orderBy(col("q_id"), col("rn"))
      },
      Some("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings), " +
        "q AS (SELECT vec_id AS q_id, emb AS q_emb FROM e WHERE vec_id < 10), " +
        "p AS (SELECT q_id, e.vec_id, round(list_inner_product(q_emb, emb)/" +
        "(sqrt(list_inner_product(q_emb, q_emb))*sqrt(list_inner_product(emb, emb))), 6) AS cos_r " +
        "FROM q JOIN e ON e.vec_id <> q.q_id), " +
        "r AS (SELECT q_id, vec_id, cos_r, " +
        "CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos_r DESC, vec_id) AS INTEGER) AS rn FROM p) " +
        "SELECT q_id, vec_id, cos_r, rn FROM r WHERE rn <= 5 ORDER BY q_id, rn")),

    GraftQuery(
      "q51_ann_lsh_topk",
      "Bucketed ANN: 8-bit sign-signature LSH over the first 8 dims, then per-vector top-3 neighbors *within the bucket*. Join key = bucket, so cost is sum of squared bucket sizes (~n²/256 uniformly), not n² — and at 100 TB buckets shard naturally across executors.",
      (s, d) => {
        CosineSimilarity.ensureRegistered(s)
        val e = t(s, d, "embeddings")
          .select(col("vec_id"), col("embedding"), signBucket(col("embedding")).as("bucket"))
        val l = e.select(col("bucket"), col("vec_id").as("a_id"), col("embedding").as("a_emb"))
        val r = e.select(col("bucket"), col("vec_id").as("b_id"), col("embedding").as("b_emb"))
        val pairs = l.join(r, Seq("bucket")).filter(col("a_id") =!= col("b_id"))
          .withColumn("cos_r", round(expr("cosine_sim(a_emb, b_emb)"), 6))
        val w = Window.partitionBy(col("a_id"))
          .orderBy(col("cos_r").desc, col("b_id"))
        pairs.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("a_id"), col("b_id"), col("cos_r"), col("rn"))
          .orderBy(col("a_id"), col("rn"))
      },
      Some("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, " +
        s"($signBucketSql) AS bucket FROM embeddings), " +
        "p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id, " +
        "round(list_inner_product(a.emb, b.emb)/" +
        "(sqrt(list_inner_product(a.emb, a.emb))*sqrt(list_inner_product(b.emb, b.emb))), 6) AS cos_r " +
        "FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id), " +
        "r AS (SELECT a_id, b_id, cos_r, " +
        "CAST(row_number() OVER (PARTITION BY a_id ORDER BY cos_r DESC, b_id) AS INTEGER) AS rn FROM p) " +
        "SELECT a_id, b_id, cos_r, rn FROM r WHERE rn <= 3 ORDER BY a_id, rn")),

    GraftQuery(
      "q54_embedding_neardup",
      "Embedding-cosine near-duplicate pairs: sign-bucket LSH candidates (same blocking as q51), keep unordered pairs above a similarity floor — the semantic-dedup step of an embedding-indexed corpus. No all-pairs join at any scale.",
      (s, d) => {
        CosineSimilarity.ensureRegistered(s)
        val e = t(s, d, "embeddings")
          .select(col("vec_id"), col("embedding"), signBucket(col("embedding")).as("bucket"))
        val l = e.select(col("bucket"), col("vec_id").as("da"), col("embedding").as("a_emb"))
        val r = e.select(col("bucket"), col("vec_id").as("db"), col("embedding").as("b_emb"))
        l.join(r, Seq("bucket")).filter(col("da") < col("db"))
          .withColumn("cos_r", round(expr("cosine_sim(a_emb, b_emb)"), 6))
          .filter(col("cos_r") >= 0.3)
          .select(col("da"), col("db"), col("cos_r"))
          .orderBy(col("da"), col("db"))
      },
      Some("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, " +
        s"($signBucketSql) AS bucket FROM embeddings) " +
        "SELECT a.vec_id AS da, b.vec_id AS db, " +
        "round(list_inner_product(a.emb, b.emb)/" +
        "(sqrt(list_inner_product(a.emb, a.emb))*sqrt(list_inner_product(b.emb, b.emb))), 6) AS cos_r " +
        "FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id " +
        "WHERE round(list_inner_product(a.emb, b.emb)/" +
        "(sqrt(list_inner_product(a.emb, a.emb))*sqrt(list_inner_product(b.emb, b.emb))), 6) >= 0.3 " +
        "ORDER BY da, db")),

    GraftQuery(
      "q52_ivf_assign",
      "IVF building block: per-label centroids (rounded to 6dp to pin FP), then nearest-centroid assignment by squared L2 — the routing step of an IVF index. Centroid table is tiny and broadcasts.",
      (s, d) => {
        val e = t(s, d, "embeddings")
        val dims = e.select(col("vec_id"), col("label"),
          posexplode(asDouble(col("embedding"))).as(Seq("i", "v")))
        val cent = dims.groupBy(col("label").as("c_label"), col("i"))
          .agg(round(avg(col("v")), 6).as("c"))
        val dist = dims.join(cent, Seq("i"))
          .groupBy(col("vec_id"), col("label"), col("c_label"))
          .agg(round(sum((col("v") - col("c")) * (col("v") - col("c"))), 6).as("d2"))
        val w = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("c_label"))
        dist.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("vec_id"), col("label"), col("c_label").as("assigned"),
            (col("label") === col("c_label")).as("hit"))
          .orderBy(col("vec_id"))
      },
      Some("WITH dims AS (SELECT vec_id, label, i - 1 AS i, CAST(embedding[i] AS DOUBLE) AS v " +
        "FROM embeddings, UNNEST(range(1, 65)) t(i)), " +
        "cent AS (SELECT label AS c_label, i, round(avg(v), 6) AS c FROM dims GROUP BY c_label, i), " +
        "dist AS (SELECT vec_id, label, c_label, round(sum((v - c)*(v - c)), 6) AS d2 " +
        "FROM dims JOIN cent USING (i) GROUP BY vec_id, label, c_label), " +
        "r AS (SELECT vec_id, label, c_label, " +
        "row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_label) AS rn FROM dist) " +
        "SELECT vec_id, label, c_label AS assigned, label = c_label AS hit " +
        "FROM r WHERE rn = 1 ORDER BY vec_id")),

    GraftQuery(
      "q53_multimodal_meta",
      "Multimodal plumbing: treat content as an opaque binary column with typed metadata. 'Decode' is a deterministic stand-in (real image/audio codecs aren't in this container — SURVEY north star); the Spark-side schema, byte handling, and derived-metadata path are real.",
      (s, d) => {
        val blob = encode(col("text"), "UTF-8")
        t(s, d, "documents")
          .withColumn("hv", conv(substring(md5(col("text")), 1, 6), 16, 10).cast("long"))
          .select(col("doc_id"),
            length(blob).as("n_bytes"),
            (col("hv") % 1280).cast("int").as("fake_width"),
            expr("cast((hv div 1280) % 720 as int)").as("fake_height"))
          .orderBy(col("doc_id"))
      },
      Some("WITH h AS (SELECT doc_id, octet_length(encode(text)) AS n_bytes, " +
        "((instr('0123456789abcdef', substr(md5(text),1,1))-1)*1048576 + " +
        "(instr('0123456789abcdef', substr(md5(text),2,1))-1)*65536 + " +
        "(instr('0123456789abcdef', substr(md5(text),3,1))-1)*4096 + " +
        "(instr('0123456789abcdef', substr(md5(text),4,1))-1)*256 + " +
        "(instr('0123456789abcdef', substr(md5(text),5,1))-1)*16 + " +
        "(instr('0123456789abcdef', substr(md5(text),6,1))-1)) AS hv FROM documents) " +
        "SELECT doc_id, CAST(n_bytes AS INTEGER) AS n_bytes, " +
        "CAST(hv % 1280 AS INTEGER) AS fake_width, " +
        "CAST((hv // 1280) % 720 AS INTEGER) AS fake_height FROM h ORDER BY doc_id"))
  )
}
