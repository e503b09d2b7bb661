package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Lossy posting-list value: exact doc-ids while ≤ MAX distinct, else only
  * the count survives (`ignore=true`). Mirrors the reference's protobuf
  * `Uid.List` (`ingest/src/main/protobuf/Uid.proto:25-29`) and the merge
  * semantics of `ingest/.../iterator/GlobalIndexUidCombiner.java:40,65-76`.
  *
  * This lossiness is the reference's 100 TB-scale design: a hot term's
  * posting list degrades to a cardinality + whole-partition scan rather
  * than an unbounded array — we keep it for exactly that reason.
  */
case class UidList(count: Long, uids: Seq[String], ignore: Boolean)

object UidListAggregator {
  val MAX = 20

  /** Derived ONCE per JVM: `Encoders.product` runs the full
    * scala-reflect encoder derivation under the runtime universe's
    * global lock, and `ScalaAggregator` calls `bufferEncoder`/
    * `outputEncoder` lazily on EVERY deserialized plan instance — i.e.
    * per task. A thread dump of a verify run showed task workers
    * serialized inside `missingHook` → `ExecutorClassLoader` RPC
    * class-miss fetches re-deriving this encoder. The encoder object
    * itself is immutable, so one shared instance is safe.
    */
  private[functions] val uidListEnc: Encoder[UidList] = Encoders.product[UidList]

  private[graft] def combine(a: UidList, b: UidList): UidList = {
    val count = a.count + b.count
    if (a.ignore || b.ignore) UidList(count, Nil, ignore = true)
    else {
      val uids = (a.uids ++ b.uids).distinct
      if (uids.size > MAX) UidList(count, Nil, ignore = true)
      else UidList(count, uids, ignore = false)
    }
  }
}

/** Aggregator over raw uid strings (ingest path: one input row per
  * (term, doc) occurrence). Associative + commutative under `merge`, so it
  * is correct at every Spark partial-aggregation scope — the same contract
  * Accumulo demands of combiners attached at all iterator scopes
  * (`WikipediaIngester.java:98-135`).
  */
class UidListAggregator extends Aggregator[String, UidList, UidList] {
  import UidListAggregator._
  def zero: UidList = UidList(0L, Nil, ignore = false)
  def reduce(b: UidList, uid: String): UidList = combine(b, UidList(1L, Seq(uid), ignore = false))
  def merge(b1: UidList, b2: UidList): UidList = combine(b1, b2)
  def finish(b: UidList): UidList = b
  def bufferEncoder: Encoder[UidList] = uidListEnc
  def outputEncoder: Encoder[UidList] = uidListEnc
}

/** Re-aggregation of already-built UidList partials (e.g. merging a delta
  * index into a base index — the compaction-scope combiner).
  */
class UidListMergeAggregator extends Aggregator[UidList, UidList, UidList] {
  import UidListAggregator._
  def zero: UidList = UidList(0L, Nil, ignore = false)
  def reduce(b: UidList, in: UidList): UidList = combine(b, in)
  def merge(b1: UidList, b2: UidList): UidList = combine(b1, b2)
  def finish(b: UidList): UidList = b
  def bufferEncoder: Encoder[UidList] = uidListEnc
  def outputEncoder: Encoder[UidList] = uidListEnc
}

/** Per-(token, doc) term weight: summed normalized TF + sorted word
  * offsets. Mirrors `TermWeight.Info` (`TermWeight.proto:54-57`) merged by
  * `ingest/.../iterator/TextIndexCombiner.java:45-79` (binary-search
  * insert ≡ merge + sort at finish).
  */
case class TermWeight(tf: Float, offsets: Seq[Int])

object TermWeightAggregator {
  /** Once-per-JVM derivation — see UidListAggregator.uidListEnc. */
  private[functions] val termWeightEnc: Encoder[TermWeight] =
    Encoders.product[TermWeight]
}

class TermWeightAggregator extends Aggregator[TermWeight, TermWeight, TermWeight] {
  import TermWeightAggregator.termWeightEnc
  def zero: TermWeight = TermWeight(0f, Nil)
  def reduce(b: TermWeight, in: TermWeight): TermWeight =
    TermWeight(b.tf + in.tf, b.offsets ++ in.offsets)
  def merge(b1: TermWeight, b2: TermWeight): TermWeight =
    TermWeight(b1.tf + b2.tf, b1.offsets ++ b2.offsets)
  def finish(b: TermWeight): TermWeight = TermWeight(b.tf, b.offsets.sorted)
  def bufferEncoder: Encoder[TermWeight] = termWeightEnc
  def outputEncoder: Encoder[TermWeight] = termWeightEnc
}

/** Wrap-around (mod 2⁶⁴) Long sum. JVM `+` wraps by definition — ANSI
  * mode governs Catalyst expression evaluation, not Scala code inside
  * an Aggregator — so this is the overflow-proof way to fold a modular
  * signature (Curation.manifest) at any group size: associative,
  * commutative, partial-aggregable, and bit-identical to the oracle's
  * HUGEINT `sum % 2⁶⁴`.
  */
class WrapSumAggregator extends Aggregator[Long, Long, Long] {
  def zero: Long = 0L
  def reduce(b: Long, in: Long): Long = b + in
  def merge(b1: Long, b2: Long): Long = b1 + b2
  def finish(b: Long): Long = b
  def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
