package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join: salt the skewed (large) side's key space and
  * replicate the small side across the salt domain, so one hot key
  * spreads over `salt` reducers instead of melting a single executor.
  *
  * This is the manual fallback for when AQE's skew-join splitting
  * (spark.sql.adaptive.skewJoin) can't help — e.g. a skewed *aggregate*
  * upstream, or a build side just over the broadcast threshold. For
  * genuinely small dims prefer broadcast(); for balanced keys prefer a
  * plain shuffle join — salting replicates the right side `salt`×.
  */
object SkewJoin {

  /** Inner equi-join `large.key = small.key` with `salt`-way spreading
    * of the large side. Result equals `large.join(small, key)` exactly.
    */
  def saltedEquiJoin(large: DataFrame, small: DataFrame, key: String,
      salt: Int = 8): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)).cast("int"))
    val saltedSmall = small.crossJoin(
      small.sparkSession.range(salt).select(col("id").cast("int").as("__salt")))
    saltedLarge.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
