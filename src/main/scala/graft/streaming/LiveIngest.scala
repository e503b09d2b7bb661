package graft.streaming

import graft.ingest.IndexBuilder

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Live index maintenance from a document stream — the Spark-native
  * shape of the reference's LIVE ingest mode (streamed Mutations into
  * Accumulo with combiners merging at flush/compact,
  * `WikipediaIngester.java:90-136` + SURVEY.md §2.10), as a Structured
  * Streaming `foreachBatch` loop:
  *
  *   docs stream → per-batch delta (SAME extraction as batch ingest,
  *   `IndexBuilder.documentIndexRows`) → lossy UidList merge with the
  *   previous snapshot → versioned parquet snapshot.
  *
  * The merge is associative/commutative (A1's contract), so the
  * streamed index is EXACTLY the batch-built index of the union of all
  * batches — not an approximation; StreamingSpec pins this.
  *
  * Scale posture: each micro-batch shuffles only its delta keyed by
  * term; the snapshot merge is one co-keyed aggregation. Snapshots are
  * immutable versioned dirs (readers never see a partial write — the
  * version pointer advances only after the write commits), the same
  * reader/writer isolation the reference gets from Accumulo compactions.
  */
class LiveIndexMaintainer(
    spark: SparkSession,
    dir: String,
    numPartitions: Int) {

  @volatile private var version: Long = -1L

  /** Latest committed snapshot of the global index, if any batch has
    * been processed yet.
    */
  def latest: Option[DataFrame] =
    if (version < 0) None else Some(spark.read.parquet(s"$dir/v$version"))

  def latestVersion: Long = version

  /** Attach to a streaming Dataset with the `documents` schema
    * (doc_id, text, lang, source, n_chars) and start maintaining the
    * index. Caller owns the returned query's lifecycle.
    */
  def attach(docsStream: Dataset[Row], checkpoint: String): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val delta = IndexBuilder.buildGlobalIndex(
          IndexBuilder.documentIndexRows(batch, numPartitions))
        val merged = latest match {
          case Some(base) => IncrementalIndex.merge(base, delta)
          case None       => delta
        }
        merged.write.mode("overwrite").parquet(s"$dir/v$batchId")
        version = batchId // committed — advance the pointer last
      }
      .start()
}
