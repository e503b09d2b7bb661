package graft.relational

import java.nio.file.Files

import graft.SparkSuite

/** Plan-level proof of the bucketed co-located join strategy SCALE.md
  * prescribes for repeated fact-fact joins at 100 TB: writing both
  * sides bucketed by the join key lets the join reuse the storage
  * partitioning — NO shuffle exchange in the plan — where the same join
  * over plain parquet must exchange both sides every run. Bucketing
  * pays one write-time shuffle once, then every subsequent join of any
  * two tables bucketed on the same key is exchange-free.
  */
class BucketedJoinSpec extends SparkSuite {
  import spark.implicits._

  test("bucketed-by-key tables join without a shuffle exchange; plain parquet shuffles") {
    val tmp = Files.createTempDirectory("graft-bucketed").toString
    val orders = (1L to 1000L).map(i => (i, s"o$i")).toDF("k", "ov")
    val lines  = (1L to 5000L).map(i => (i % 1000 + 1, s"l$i")).toDF("k", "lv")
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // disable broadcast so the join-strategy contrast is observable
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      orders.write.mode("overwrite").option("path", s"$tmp/a")
        .bucketBy(8, "k").sortBy("k").saveAsTable("graft_bucketed_a")
      lines.write.mode("overwrite").option("path", s"$tmp/b")
        .bucketBy(8, "k").sortBy("k").saveAsTable("graft_bucketed_b")

      val joined = spark.table("graft_bucketed_a")
        .join(spark.table("graft_bucketed_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 5000)

      // contrast: identical join over plain parquet exchanges both sides
      orders.write.mode("overwrite").parquet(s"$tmp/pa")
      lines.write.mode("overwrite").parquet(s"$tmp/pb")
      val plain = spark.read.parquet(s"$tmp/pa")
        .join(spark.read.parquet(s"$tmp/pb"), "k")
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))
      assert(plain.count() == 5000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_b")
    }
  }
}
