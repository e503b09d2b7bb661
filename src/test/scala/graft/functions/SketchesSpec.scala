package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSuite {
  import spark.implicits._

  private def kmv(k: Int) = udaf(new Sketches.KmvDistinctAggregator(k))

  test("below k the count is exact; duplicates never inflate it") {
    val df = (1L to 50L).flatMap(i => Seq(i, i, i)).toDF("id")
    val est = df.agg(kmv(128)(col("id"))).head.getDouble(0)
    assert(est == 50.0)
  }

  test("estimate is invariant to partitioning (merge correctness)") {
    val ids = (1L to 5000L).toDF("id")
    val est1 = ids.repartition(1).agg(kmv(128)(col("id"))).head.getDouble(0)
    val est13 = ids.repartition(13).agg(kmv(128)(col("id"))).head.getDouble(0)
    val est64 = ids.repartition(64).agg(kmv(128)(col("id"))).head.getDouble(0)
    assert(est1 == est13 && est13 == est64)
  }

  test("estimate is within the KMV error envelope for k=128") {
    // standard error of KMV is ~1/sqrt(k-2) ≈ 8.9%; assert a loose 3-sigma
    val n = 20000L
    val est = (1L to n).toDF("id").agg(kmv(128)(col("id"))).head.getDouble(0)
    assert(math.abs(est - n) / n < 0.27, s"estimate $est too far from $n")
  }

  test("kmvPoint is the splitmix64 finalizer scaled exactly") {
    // h >>> 11 has 53 bits; dividing by 2^53 is exact binary scaling, so
    // multiplying back must reconstruct the integer exactly
    Seq(0L, 1L, -1L, Long.MaxValue, 123456789L).foreach { id =>
      val u = Sketches.kmvPoint(id)
      assert(u >= 0.0 && u < 1.0)
      val back = (u * 9007199254740992.0).toLong
      assert(back == (graft.pipeline.Dedup.mix64(id) >>> 11))
    }
  }

  test("grouped sketches are independent per group") {
    val df = (1L to 1000L).map(i => (if (i % 2 == 0) "a" else "b", i)).toDF("g", "id")
    val rows = df.groupBy("g").agg(kmv(64)(col("id")).as("est")).collect()
    assert(rows.length == 2)
    // 500 distinct per group, k=64 → estimate path; both far from zero
    rows.foreach(r => assert(math.abs(r.getDouble(1) - 500.0) / 500.0 < 0.5))
  }
}
