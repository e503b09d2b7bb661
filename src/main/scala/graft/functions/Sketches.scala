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

    def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble

    private def insert(us: Seq[Double], u: Double): KmvBuf =
      us.search(u)(Ordering.Double.TotalOrdering) match {
        case scala.collection.Searching.Found(_) => KmvBuf(us) // already present
        case scala.collection.Searching.InsertionPoint(p) =>
          KmvBuf(((us.take(p) :+ u) ++ us.drop(p)).take(k))
      }
  }
}
