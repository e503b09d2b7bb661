package graft.search

import graft.SparkSuite
import org.apache.spark.sql.functions._

class HybridSearchSpec extends SparkSuite {
  import spark.implicits._

  private def ranking(rows: (Long, Long)*) =
    rows.toSeq.toDF("id", "rank")

  test("RRF fuses two lists: shared ids sum both contributions") {
    // id 1 is rank 1 in both lists; id 2 only in A; id 3 only in B
    val a = ranking(1L -> 1L, 2L -> 2L)
    val b = ranking(1L -> 1L, 3L -> 2L)
    val out = HybridSearch.rrfFuse(Seq(a, b), kRrf = 60, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.head._2 == 1L) // double contribution wins
    val expTop = BigDecimal(1.0 / 61 + 1.0 / 61).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.head._3 == expTop)
    // ids 2 and 3 have identical single contributions 1/62 — tie broken by id
    assert(out.map(_._2).toSeq == Seq(1L, 2L, 3L))
    assert(out(1)._3 == out(2)._3)
  }

  test("k caps the fused list; single-list fusion preserves order") {
    val a = ranking((1L to 30L).map(i => i -> i): _*)
    val out = HybridSearch.rrfFuse(Seq(a), kRrf = 60, k = 5).collect()
    assert(out.length == 5)
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("three-list fusion: contribution chain is left-to-right and complete") {
    val lists = Seq(
      ranking(7L -> 1L),
      ranking(7L -> 3L),
      ranking(7L -> 5L))
    val out = HybridSearch.rrfFuse(lists, kRrf = 60, k = 1).collect().head
    val exp = BigDecimal(1.0 / 61 + 1.0 / 63 + 1.0 / 65)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.getLong(1) == 7L)
    assert(out.getDouble(2) == exp)
  }

  test("ids absent from a list contribute zero, not null") {
    val a = ranking(1L -> 1L)
    val b = ranking(2L -> 1L)
    val out = HybridSearch.rrfFuse(Seq(a, b), kRrf = 60, k = 10)
    assert(out.filter(col("score").isNull).count() == 0)
    assert(out.count() == 2)
  }
}
