package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew-mitigation utilities (SURVEY §4 skew row). AQE's runtime
  * skew-join splitting is the default safety net (on in GraftSession);
  * these are the static techniques for cases AQE can't rewrite — e.g. a
  * skewed groupBy where one key holds most rows, or a pre-planned join
  * against a known-hot dimension key.
  */
object Skew {

  /** Two-phase salted aggregation: spread one logical key over `salts`
    * partial groups, aggregate, then merge. Turns a single hot reducer
    * into `salts` parallel ones at the cost of a second (tiny) shuffle.
    * Works for any associative aggregate; exposed for sum/count.
    */
  def saltedSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
      salts: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val partial = salted
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(sum(col(valueCol)).as("_partial_sum"), count(lit(1)).as("_partial_cnt"))
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("_partial_sum")).as(s"sum_$valueCol"),
        sum(col("_partial_cnt")).as("cnt"))
  }

  /** Salted broadcast-replicated join for a skewed fact side joining a
    * small dimension: fact rows get a random salt in [0, salts); the dim
    * is exploded `salts`× with every salt value; the join key becomes
    * (key, salt) so one hot key spreads over `salts` tasks. The dim must
    * be broadcastable (it grows `salts`×).
    */
  def saltedDimJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(salts)))
    val explodedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(broadcast(explodedDim), Seq(key, "_salt")).drop("_salt")
  }
}
