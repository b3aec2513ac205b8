package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins: pre-bucketing both sides of a hot join
  * key removes the shuffle entirely — the big-big join strategy for
  * the 100 TB chunks⋈documents / fact⋈fact paths (README "Scale
  * design"). */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    val db = "graft_bucket_test"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    // force the sort-merge path: at test scale Spark would broadcast
    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      val lineitem = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(s"$db.orders_b")
      lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(s"$db.lineitem_b")

      val joined = spark.table(s"$db.lineitem_b")
        .join(spark.table(s"$db.orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString

      // co-located: the join itself needs no Exchange on either side
      val joinSection = plan.linesIterator
        .dropWhile(l => !l.contains("SortMergeJoin")).toSeq
      assert(joinSection.nonEmpty, s"expected SortMergeJoin:\n$plan")
      assert(!joinSection.exists(_.contains("Exchange hashpartitioning")),
        s"bucketed join still shuffles:\n$plan")

      // and the result matches the unbucketed join
      val expected = lineitem.join(orders,
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}
