package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The 100 TB substitute for the in-session shingle cache
  * (`TextOps.cachedShingles`, whose scaladoc promises this swap):
  * materialize the (doc_id, sk) shingle table ONCE as parquet bucketed
  * by doc_id. Every downstream pass — near-dup candidate generation,
  * exact-Jaccard verification, contamination checks — then reads
  * pre-tokenized 8-byte shingle keys instead of re-running the
  * tokenize+shingle+hash CPU over the raw corpus, and any doc_id-keyed
  * aggregation or join against the store is shuffle-free on that side
  * (bucketing pre-satisfies the hash-partitioning requirement —
  * ShingleStoreSpec asserts the plan).
  */
object ShingleStore {

  /** One-time build: tokenize/shingle/hash the corpus and persist
    * bucketed. At production scale this runs once per corpus snapshot;
    * the bucket count should be sized so a bucket's shingle rows fit an
    * executor's task comfortably (corpus shingle rows / buckets).
    */
  def materialize(docs: DataFrame, table: String, buckets: Int = 16): Unit =
    graft.queries.TextOps.shingleSet(docs)
      .write.mode("overwrite")
      .bucketBy(buckets, "doc_id").sortBy("doc_id")
      .saveAsTable(table)

  def load(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
