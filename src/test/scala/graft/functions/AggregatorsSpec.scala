package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's combiner unit tests
  * (`ingest/src/test/java/.../iterator/GlobalIndexUidTest.java`,
  * `TextIndexTest.java`; vectors in FIXTURES.md §4).
  */
class AggregatorsSpec extends AnyFunSuite {
  import UidListAggregator.combine

  private def ul(count: Long, uids: Seq[String], ignore: Boolean = false) =
    UidList(count, uids, ignore)

  test("two singles merge to count 2, both uids") {
    val r = combine(ul(1, Seq("a")), ul(1, Seq("b")))
    assert(r == UidList(2, Seq("a", "b"), ignore = false))
  }

  test("duplicate uid is deduplicated but count still sums") {
    val r = combine(ul(1, Seq("a")), ul(1, Seq("a")))
    assert(r.count == 2 && r.uids == Seq("a") && !r.ignore)
  }

  test("exactly MAX uids stays exact") {
    val twenty = (1 to 20).map(_.toString)
    val r = combine(ul(19, twenty.take(19)), ul(1, Seq("20")))
    assert(r.count == 20 && r.uids.toSet == twenty.toSet && !r.ignore)
  }

  test("over MAX flips to ignore and drops uids") {
    val r = combine(ul(20, (1 to 20).map(_.toString)), ul(1, Seq("21")))
    assert(r == UidList(21, Nil, ignore = true))
  }

  test("seen-ignore poisons the merge but counts keep summing") {
    val r = combine(ul(30, Nil, ignore = true), ul(1, Seq("x")))
    assert(r == UidList(31, Nil, ignore = true))
    val r2 = combine(ul(1, Seq("x")), ul(30, Nil, ignore = true))
    assert(r2 == UidList(31, Nil, ignore = true))
  }

  test("merge is associative and commutative over partials") {
    val parts = Seq(ul(1, Seq("a")), ul(1, Seq("b")), ul(25, Nil, ignore = true), ul(1, Seq("c")))
    val l = parts.reduceLeft(combine)
    val r = parts.reduceRight(combine)
    assert(l == r && l.count == 28 && l.ignore)
  }

  test("aggregator reduce path counts occurrences") {
    val agg = new UidListAggregator
    val out = Seq("a", "b", "a").foldLeft(agg.zero)(agg.reduce)
    assert(out.count == 3 && out.uids.toSet == Set("a", "b"))
  }

  test("UidList merge is model-exact under ANY grouping and order (seeded property)") {
    // The contract the whole delta architecture rests on (A1; the
    // delta-based maintainers, mergeAll's merge-on-read, Compaction,
    // the salted two-phase index build all fold through `combine` at
    // arbitrary granularity): for ANY multiset of per-doc singletons,
    // ANY binary combine tree over ANY permutation yields the one
    // canonical result — (n, distinct uids, false) while distinct ≤
    // MAX, else (n, ∅, true). Grouping-invariance is non-obvious
    // because overflow is sticky (ignore poisons every later merge):
    // it holds because a subset's distinct count never exceeds the
    // whole's, so no grouping can flip ignore unless the total does.
    // 300 seeded random tree shapes; failures reproduce.
    val rnd = new scala.util.Random(0xA11CE)
    def randomTree(parts: Vector[UidList]): UidList =
      if (parts.size == 1) parts.head
      else {
        val cut = 1 + rnd.nextInt(parts.size - 1)
        combine(randomTree(parts.take(cut)), randomTree(parts.drop(cut)))
      }
    def canon(u: UidList) = (u.count, u.uids.sorted, u.ignore)
    (1 to 300).foreach { i =>
      val n    = 1 + rnd.nextInt(60)
      val pool = 1 + rnd.nextInt(40) // duplicates and >MAX distinct both reachable
      val ids  = Vector.fill(n)(s"u${rnd.nextInt(pool)}")
      val parts = rnd.shuffle(ids).map(id => ul(1, Seq(id)))
      val distinct = ids.distinct.sorted
      val want =
        if (distinct.size <= 20) (n.toLong, distinct, false)
        else (n.toLong, Nil, true)
      assert(canon(randomTree(parts)) == want, s"iter $i: random tree diverged")
      assert(canon(parts.reduceLeft(combine)) == want, s"iter $i: left fold diverged")
    }
  }

  test("TermWeight merge sums tf and sorts offsets") {
    val agg = new TermWeightAggregator
    val merged = agg.merge(TermWeight(0.1f, Seq(1, 5)), TermWeight(0.2f, Seq(3)))
    val fin = agg.finish(merged)
    assert(fin.offsets == Seq(1, 3, 5))
    assert(math.abs(fin.tf - 0.3f) < 1e-6)
  }
}
