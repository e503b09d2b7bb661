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

  private def cms(d: Int, w: Int) = udaf(new Sketches.CmsAggregator(d, w))

  test("CMS estimate is one-sided (est >= exact for EVERY key) and exact when collision-free") {
    // zipfian-ish multiplicities over 200 keys
    val rows = (1L to 200L).flatMap(k => Seq.fill((200 / k).toInt)(k))
    val sk = rows.toDF("id").agg(cms(4, 512)(col("id"))).head.getSeq[Long](0)
    val exact = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    exact.foreach { case (k, n) =>
      val est = Sketches.cmsEstimate(sk, k, 4, 512)
      assert(est >= n, s"CMS underestimated key $k: est=$est exact=$n")
    }
    // 200 keys into 512 buckets collide per-row at birthday rates
    // (~32% of keys share a bucket in any one row), but a key is only
    // OVERestimated when it collides in ALL 4 independent rows (~1%):
    // most keys must come back exact, and every overestimate obeys the
    // CMS bound est - exact <= (e/w)·N up to small-N slack (use 4x).
    val n = rows.size.toLong
    val exactKeys = exact.count { case (k, c) => Sketches.cmsEstimate(sk, k, 4, 512) == c }
    assert(exactKeys >= (exact.size * 9) / 10,
      s"only $exactKeys/${exact.size} keys exact")
    exact.foreach { case (k, c) =>
      val over = Sketches.cmsEstimate(sk, k, 4, 512) - c
      assert(over <= 4 * (math.E / 512 * n).ceil.toLong,
        s"key $k overestimate $over beyond the CMS envelope")
    }
  }

  test("CMS sketch is invariant to partitioning (merge = counter addition)") {
    val rows = (1L to 3000L).map(i => i % 97).toDF("id")
    val s1 = rows.repartition(1).agg(cms(4, 256)(col("id"))).head.getSeq[Long](0)
    val s17 = rows.repartition(17).agg(cms(4, 256)(col("id"))).head.getSeq[Long](0)
    val s64 = rows.repartition(64).agg(cms(4, 256)(col("id"))).head.getSeq[Long](0)
    assert(s1 == s17 && s17 == s64)
    // total mass per row equals the input row count — counters only add
    (0 until 4).foreach(j => assert(s1.slice(j * 256, (j + 1) * 256).sum == 3000L))
  }

  private def bkq(k: Int) = udaf(new Sketches.BottomKQuantiles(k),
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Double)]())

  test("bottom-k quantiles: exact when n <= k, matching the integer rank rule") {
    // values 1..100 with distinct keys; k=128 keeps every row, so the
    // output IS the rank-defined quantile: value at rank ceil(p·m/100)
    val df = (1L to 100L).map(i => (i, i.toDouble)).toDF("key", "v")
    val r = df.agg(bkq(128)(col("key"), col("v")).as("sk"))
      .select("sk.n_sample", "sk.p50", "sk.p90", "sk.p99").head
    assert(r.getLong(0) == 100L)
    assert((r.getDouble(1), r.getDouble(2), r.getDouble(3)) == ((50.0, 90.0, 99.0)))
  }

  test("bottom-k quantiles: sample is invariant to partitioning and input order") {
    val rows = (1L to 20000L).map(i => (i, (graft.pipeline.Dedup.mix64(i) % 1000).toDouble))
    def run(df: org.apache.spark.sql.DataFrame) =
      df.agg(bkq(512)(col("key"), col("v")).as("sk"))
        .select("sk.n_sample", "sk.p50", "sk.p90", "sk.p99")
        .head.toSeq
    val base = run(rows.toDF("key", "v").repartition(1))
    assert(run(rows.toDF("key", "v").repartition(29)) == base)
    assert(run(new scala.util.Random(3).shuffle(rows).toDF("key", "v").repartition(64)) == base)
    assert(base.head == 512L) // capped at k
  }

  test("bottom-k quantiles: estimates land within the sampling envelope of the true quantiles") {
    // uniform values 0..9999 under distinct keys: true p50/p90/p99 are
    // ~5000/9000/9900; a k=512 uniform sample's quantile error is
    // ~sqrt(p(1-p)/k)·n — assert a loose 5-sigma band (±0.11·n)
    val n = 50000L
    val rows = (1L to n).map(i => (i, (i % 10000).toDouble)).toDF("key", "v")
    val r = rows.agg(bkq(512)(col("key"), col("v")).as("sk"))
      .select("sk.p50", "sk.p90", "sk.p99").head
    assert(math.abs(r.getDouble(0) - 5000.0) < 1100, s"p50 ${r.getDouble(0)}")
    assert(math.abs(r.getDouble(1) - 9000.0) < 1100, s"p90 ${r.getDouble(1)}")
    assert(math.abs(r.getDouble(2) - 9900.0) < 1100, s"p99 ${r.getDouble(2)}")
  }

  test("bottom-k quantiles: grouped sketches sample independently per group") {
    // two groups with disjoint value ranges; each group's quantiles must
    // come from its own values only
    val rows = (1L to 4000L).map(i =>
      (if (i % 2 == 0) "lo" else "hi", i, if (i % 2 == 0) 1.0 else 1000.0))
      .toDF("g", "key", "v")
    val out = rows.groupBy("g").agg(bkq(64)(col("key"), col("v")).as("sk"))
      .select(col("g"), col("sk.p50"), col("sk.p99")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out("lo") == ((1.0, 1.0)) && out("hi") == ((1000.0, 1000.0)))
  }

  test("CMS under-capacity forces collisions but min-of-rows still bounds them") {
    // 500 distinct keys into w=64: every row collides heavily; est must
    // stay >= exact everywhere yet beat any single row's counter
    val rows = (1L to 500L).toDF("id")
    val sk = rows.agg(cms(4, 64)(col("id"))).head.getSeq[Long](0)
    (1L to 500L).foreach { k =>
      val est = Sketches.cmsEstimate(sk, k, 4, 64)
      val worst = (0 until 4).map(j => sk(j * 64 + Sketches.cmsBucket(k, j, 64))).max
      assert(est >= 1L && est <= worst)
    }
  }
}
