package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Bucketing = the co-located-join strategy for repeated large joins at
  * scale (SURVEY §4 join row): both sides pre-hashed into the same bucket
  * layout on the join key ⇒ the sort-merge join needs NO shuffle exchange.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans without shuffle exchanges") {
    // warehouse dir is a static conf; tables land in ./spark-warehouse
    // (gitignored) and are dropped below
    val li = Tables.lineitem(spark, sf0001)

    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed_a")
    li.groupBy("l_orderkey").agg(sum("l_quantity").as("qty"))
      .write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed_b")

    val joined = spark.table("li_bucketed_a")
      .join(spark.table("li_bucketed_b").hint("merge"), "l_orderkey")
    val plan = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.isEmpty,
      s"bucketed join should not shuffle, found ${shuffles.size} exchanges")
    assert(joined.count() > 0)
    spark.sql("DROP TABLE IF EXISTS li_bucketed_a")
    spark.sql("DROP TABLE IF EXISTS li_bucketed_b")
  }
}
