package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable distinct-count sketches.
  *
  * KMV (k-minimum-values, Bar-Yossef et al. 2002): keep the k smallest
  * distinct hash values of the input; if fewer than k values were ever
  * seen the count is EXACT, otherwise estimate n ≈ (k−1) / u_k where u_k
  * is the k-th smallest hash normalized to [0, 1).
  *
  * This is the bounded-state scale posture the reference applies to
  * posting lists (`UidListAggregator`'s MAX=20 exact-then-degrade
  * contract, after `GlobalIndexUidCombiner.java:65-76`) applied to
  * cardinality: partial-aggregate state is ≤ k doubles per group no
  * matter how many rows a partition holds, the merge is associative and
  * commutative (set-union of k-smallest sets), and map-side combine
  * applies — where `countDistinct` must shuffle every distinct value,
  * the sketch shuffles ≤ k per partition per group.
  *
  * Determinism contract (for the DuckDB oracle): the hash is the
  * project-standard splitmix64 finalizer (`Dedup.mix64` — pure integer
  * math the oracle re-derives in HUGEINT arithmetic), normalized by the
  * EXACT double (h >>> 11) / 2^53; the k-smallest-distinct set is
  * independent of input order and grouping, so the estimate is
  * bit-identical under any parallelism.
  */
object Sketches {

  // Encoders derived ONCE per JVM: `Encoders.product` runs the full
  // scala-reflect derivation under the runtime universe's global lock,
  // and ScalaAggregator re-calls bufferEncoder/outputEncoder on every
  // deserialized plan instance (per task). See
  // UidListAggregator.uidListEnc for the measured pathology.
  private lazy val kmvBufEnc: Encoder[KmvBuf]   = Encoders.product[KmvBuf]
  private lazy val cmsBufEnc: Encoder[CmsBuf]   = Encoders.product[CmsBuf]
  private lazy val seqLongEnc: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  private lazy val qsBufEnc: Encoder[QsBuf]     = Encoders.product[QsBuf]
  private lazy val qsOutEnc: Encoder[QsOut]     = Encoders.product[QsOut]

  /** Shared input encoder for the bottom-k aggregators' `udaf(...)` call
    * sites (q37, LiveSketches) — same once-per-JVM rationale.
    */
  lazy val longDoubleEnc: Encoder[(Long, Double)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Double)]()

  /** Normalized hash in [0, 1): top 53 bits of splitmix64, exact in a
    * double (2^53 = 9007199254740992 is a power of two, so the division
    * is exact scaling).
    */
  def kmvPoint(id: Long): Double =
    (graft.pipeline.Dedup.mix64(id) >>> 11).toDouble / 9007199254740992.0

  /** Sorted-ascending distinct k-smallest normalized hashes. */
  case class KmvBuf(us: Seq[Double])

  class KmvDistinctAggregator(k: Int) extends Aggregator[Long, KmvBuf, Double] {
    require(k >= 2, s"KMV needs k >= 2: $k")

    def zero: KmvBuf = KmvBuf(Vector.empty)

    def reduce(b: KmvBuf, id: Long): KmvBuf = {
      val u = kmvPoint(id)
      // skip without search when u can't enter a full sketch
      if (b.us.size == k && u >= b.us.last) b else insert(b.us, u)
    }

    def merge(b1: KmvBuf, b2: KmvBuf): KmvBuf =
      KmvBuf((b1.us ++ b2.us).distinct.sorted.take(k))

    def finish(b: KmvBuf): Double =
      if (b.us.size < k) b.us.size.toDouble
      else (k - 1).toDouble / b.us.last

    def bufferEncoder: Encoder[KmvBuf] = kmvBufEnc
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble

    private def insert(us: Seq[Double], u: Double): KmvBuf =
      us.search(u)(Ordering.Double.TotalOrdering) match {
        case scala.collection.Searching.Found(_) => KmvBuf(us) // already present
        case scala.collection.Searching.InsertionPoint(p) =>
          KmvBuf(((us.take(p) :+ u) ++ us.drop(p)).take(k))
      }
  }

  /** Count-min sketch (Cormode & Muthukrishnan 2005): d rows of w
    * counters; each key increments one counter per row (row j's bucket
    * = salted splitmix64 of the key mod w), and the frequency estimate
    * for a key is the MIN over its d counters — always ≥ the true
    * count (one-sided error), within εN with high probability.
    *
    * Same bounded-state posture as KMV applied to FREQUENCY: the
    * partial-aggregate buffer is d·w longs no matter how many rows or
    * distinct keys a partition holds (where an exact per-key count
    * shuffles every distinct key), the merge is element-wise counter
    * addition (associative, commutative), and map-side combine applies
    * — each partition ships one d·w vector, not its key set. This is
    * the heavy-hitter primitive for unbounded key domains (users,
    * URLs, n-grams) at stream scale.
    *
    * Determinism contract (for the DuckDB oracle): bucket j of key x is
    * `mix64(x XOR (golden · (j+1))) mod w` — pure integer math the
    * oracle re-derives in HUGEINT arithmetic (same splitmix64 chain as
    * the curation hashes), so counter values and estimates are
    * bit-identical under any parallelism or input order.
    */
  def cmsBucket(x: Long, j: Int, w: Int): Int = {
    val salt = 0x9e3779b97f4a7c15L * (j + 1) // mod-2^64 Long wrap, by design
    java.lang.Long.remainderUnsigned(
      graft.pipeline.Dedup.mix64(x ^ salt), w.toLong).toInt
  }

  /** Flattened row-major d·w counter matrix. */
  case class CmsBuf(counts: Array[Long])

  class CmsAggregator(d: Int, w: Int) extends Aggregator[Long, CmsBuf, Seq[Long]] {
    require(d >= 1 && w >= 2, s"CMS needs d >= 1, w >= 2: d=$d w=$w")

    def zero: CmsBuf = CmsBuf(new Array[Long](d * w))

    // in-place increment: the ObjectHashAggregate buffer object lives in
    // memory between reduce calls, so mutation avoids a d·w copy per row
    def reduce(b: CmsBuf, x: Long): CmsBuf = {
      var j = 0
      while (j < d) { b.counts(j * w + cmsBucket(x, j, w)) += 1; j += 1 }
      b
    }

    def merge(b1: CmsBuf, b2: CmsBuf): CmsBuf = {
      var i = 0
      while (i < d * w) { b1.counts(i) += b2.counts(i); i += 1 }
      b1
    }

    def finish(b: CmsBuf): Seq[Long] = b.counts.toSeq

    def bufferEncoder: Encoder[CmsBuf] = cmsBufEnc
    def outputEncoder: Encoder[Seq[Long]] = seqLongEnc
  }

  /** The estimate read side: min over the d counters the key hashes to.
    * Runs over candidate keys only (bounded rows) — the corpus-scale
    * pass is the aggregator above.
    */
  def cmsEstimate(sketch: Seq[Long], x: Long, d: Int, w: Int): Long = {
    var best = Long.MaxValue
    var j = 0
    while (j < d) {
      val c = sketch(j * w + cmsBucket(x, j, w))
      if (c < best) best = c
      j += 1
    }
    best
  }

  /** Bottom-k uniform sample with a value payload, finished as quantile
    * estimates — the DISTRIBUTION member of the sketch family (KMV =
    * cardinality, CMS = frequency). Keeping the rows whose key hashes
    * to the k smallest normalized points is a uniform-without-
    * replacement sample of k rows determined solely by the row-key
    * MULTISET — independent of input order, partitioning, and merge
    * tree — so unlike a compactor/GK sketch (whose state depends on
    * arrival order) the estimate is bit-identical under any parallelism
    * and a SQL oracle re-derives the exact same sample. Quantiles of
    * the k-sample estimate population quantiles with standard sampling
    * error O(sqrt(p(1-p)/k)); the state is ≤ k (double, double) pairs
    * per group at ANY row count, the merge is merge-take-k, and
    * map-side combine applies.
    *
    * Contract: `key` must be unique per row (it IS the sample frame —
    * duplicate keys would collapse to one sample slot). `kmvPoint`'s
    * splitmix64 is a 64-bit bijection, so distinct keys give distinct
    * points; ties in the (point, value) insertion order are therefore
    * impossible in-contract, and the value tiebreak below only pins
    * behavior if the contract is broken.
    */
  case class QsBuf(us: Seq[Double], vs: Seq[Double])

  /** n_sample plus the rank-defined p50/p90/p99 of the sample: value at
    * ascending 1-based rank ceil(p·m/100), stated in integers as the
    * least rank rn with 100·rn ≥ p·m (the cu_quality_gate rank rule).
    */
  case class QsOut(n_sample: Long, p50: Double, p90: Double, p99: Double)

  // the buffer operations, ONE definition shared by the finishing
  // aggregator (q37), the partial-emitting aggregator (live deltas),
  // and the live store's driver-side merge — so the three paths cannot
  // drift

  def qsReduce(b: QsBuf, key: Long, v: Double, k: Int): QsBuf = {
    val u = kmvPoint(key)
    // skip without search when u can't enter a full sample
    if (b.us.size == k && u >= b.us.last) b else qsInsert(b, u, v, k)
  }

  def qsMerge(b1: QsBuf, b2: QsBuf, k: Int): QsBuf = {
    val all = (b1.us.zip(b1.vs) ++ b2.us.zip(b2.vs)).sorted.take(k)
    QsBuf(all.map(_._1), all.map(_._2))
  }

  /** n_sample + the rank-rule quantiles of the sample (least rank rn
    * with 100·rn ≥ p·m).
    */
  def qsFinish(b: QsBuf): QsOut = {
    val m = b.vs.size
    if (m == 0) QsOut(0L, 0.0, 0.0, 0.0)
    else {
      val sorted = b.vs.sorted
      def at(p: Int): Double = sorted((p * m + 99) / 100 - 1)
      QsOut(m.toLong, at(50), at(90), at(99))
    }
  }

  private def qsInsert(b: QsBuf, u: Double, v: Double, k: Int): QsBuf = {
    // lexicographic (u, v) insertion point over the parallel arrays
    var lo = 0; var hi = b.us.size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val c = java.lang.Double.compare(b.us(mid), u) match {
        case 0 => java.lang.Double.compare(b.vs(mid), v)
        case x => x
      }
      if (c < 0) lo = mid + 1 else hi = mid
    }
    QsBuf(((b.us.take(lo) :+ u) ++ b.us.drop(lo)).take(k),
      ((b.vs.take(lo) :+ v) ++ b.vs.drop(lo)).take(k))
  }

  class BottomKQuantiles(k: Int) extends Aggregator[(Long, Double), QsBuf, QsOut] {
    require(k >= 2, s"bottom-k sample needs k >= 2: $k")
    def zero: QsBuf = QsBuf(Vector.empty, Vector.empty)
    def reduce(b: QsBuf, row: (Long, Double)): QsBuf = qsReduce(b, row._1, row._2, k)
    def merge(b1: QsBuf, b2: QsBuf): QsBuf = qsMerge(b1, b2, k)
    def finish(b: QsBuf): QsOut = qsFinish(b)
    def bufferEncoder: Encoder[QsBuf] = qsBufEnc
    def outputEncoder: Encoder[QsOut] = qsOutEnc
  }

  /** The PARTIAL-emitting twin: same fold, but `finish` returns the
    * buffer itself — what a live maintainer persists per batch so a
    * later read can keep merging (`qsMerge` is associative and
    * commutative: the k-smallest-by-hash set of a union is the
    * k-smallest of the k-smallest).
    */
  class BottomKSample(k: Int) extends Aggregator[(Long, Double), QsBuf, QsBuf] {
    require(k >= 2, s"bottom-k sample needs k >= 2: $k")
    def zero: QsBuf = QsBuf(Vector.empty, Vector.empty)
    def reduce(b: QsBuf, row: (Long, Double)): QsBuf = qsReduce(b, row._1, row._2, k)
    def merge(b1: QsBuf, b2: QsBuf): QsBuf = qsMerge(b1, b2, k)
    def finish(b: QsBuf): QsBuf = b
    def bufferEncoder: Encoder[QsBuf] = qsBufEnc
    def outputEncoder: Encoder[QsBuf] = qsBufEnc
  }
}
