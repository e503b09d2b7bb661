package graft.streaming

import graft.functions.{UidListAggregator, UidListMergeAggregator}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental global-index maintenance — the Spark shape of the
  * reference's combiner-at-flush/compact/scan design
  * (`GlobalIndexUidCombiner` attached at all scopes,
  * `WikipediaIngester.java:90-136`, SURVEY.md §2.10): new postings merge
  * lazily into existing ones, and the merge is associative/commutative so
  * it can run at any granularity.
  *
  * Batch usage: `merge(base, delta)` after building `delta` from newly
  * ingested docs. Streaming usage: `foreachBatch { (b, _) => base =
  * merge(base, buildDelta(b)) }` with the result checkpointed as parquet.
  */
object IncrementalIndex {

  private val uidMergeAgg = udaf(new UidListMergeAggregator())

  /** Re-aggregate any union of global_index fragments (same schema:
    * fieldValue/fieldName/partition/language/count/uids/ignore) with the
    * reference's lossy UidList semantics — exactly correct under
    * re-aggregation at ANY granularity because the merge is associative
    * and commutative (the naive `sum + collect_set` is not: a set that
    * already overflowed cannot be recovered; see SURVEY.md §2.4 A1).
    * This is the merge-on-read half of the delta-based maintainer: a
    * reader unions committed delta dirs and folds them through this one
    * co-keyed aggregation, the same contract Accumulo exploits by
    * attaching `GlobalIndexUidCombiner` at scan scope
    * (`WikipediaIngester.java:98,116,126,135`).
    */
  def mergeAll(fragments: DataFrame): DataFrame =
    fragments
      .groupBy("fieldValue", "fieldName", "partition", "language")
      .agg(uidMergeAgg(col("count"), col("uids"), col("ignore")).as("u"))
      .select(
        col("fieldValue"), col("fieldName"), col("partition"), col("language"),
        col("u.count").as("count"), col("u.uids").as("uids"), col("u.ignore").as("ignore"))

  /** Two-fragment convenience form of `mergeAll`. */
  def merge(base: DataFrame, delta: DataFrame): DataFrame =
    mergeAll(base.unionByName(delta))
}
