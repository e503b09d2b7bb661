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

  // Recover the committed snapshot pointer on (re)construction: a
  // restarted maintainer must merge into the last snapshot, not start
  // from scratch — Structured Streaming's checkpoint resumes at the
  // next batch id and the pre-crash batches exist only in snapshots.
  // A snapshot counts only once its _SUCCESS marker exists (written by
  // the committer after all part files) — a crash mid-write leaves a
  // partial dir that recovery and readers must ignore.
  private def committedVersions: Seq[Long] = {
    val d = new java.io.File(dir)
    Option(d.listFiles())
      .map(_.toSeq.filter(f => f.isDirectory && f.getName.matches("v\\d+") &&
        new java.io.File(f, "_SUCCESS").exists())
        .map(_.getName.drop(1).toLong))
      .getOrElse(Nil)
  }

  @volatile private var version: Long =
    committedVersions.foldLeft(-1L)(math.max)

  /** Latest committed snapshot of the global index, if any batch has
    * been processed yet.
    */
  def latest: Option[DataFrame] =
    if (version < 0) None else Some(spark.read.parquet(s"$dir/v$version"))

  def latestVersion: Long = version

  /** Largest committed snapshot version strictly below `batchId` — the
    * correct merge base even when Structured Streaming REPLAYS a batch
    * after a crash (merging a replayed delta into its own output would
    * double-count; basing on the predecessor makes the write idempotent).
    */
  private def baseVersionFor(batchId: Long): Long =
    committedVersions.filter(_ < batchId).foldLeft(-1L)(math.max)

  /** Attach to a streaming Dataset with the `documents` schema
    * (doc_id, text, lang, source, n_chars) and start maintaining the
    * index. Caller owns the returned query's lifecycle.
    *
    * Restart contract: reuse the SAME `checkpoint` across restarts (the
    * standard Structured Streaming rule) — batch ids then continue past
    * the recovered snapshots and replayed batches merge idempotently
    * against their predecessor. A fresh checkpoint restarts batch ids at
    * 0 and would overwrite the v0 snapshot.
    */
  def attach(docsStream: Dataset[Row], checkpoint: String): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // Post-crash replay of an already-committed batch: the existing
        // snapshot is already correct (the merge is idempotent — it was
        // built from the same delta and predecessor), and rewriting it
        // in place would race a concurrent reader of `latest`. Skip.
        if (new java.io.File(s"$dir/v$batchId/_SUCCESS").exists())
          version = math.max(version, batchId)
        else {
          val delta = IndexBuilder.buildGlobalIndex(
            IndexBuilder.documentIndexRows(batch, numPartitions))
          val baseV = baseVersionFor(batchId)
          val merged =
            if (baseV < 0) delta
            else IncrementalIndex.merge(spark.read.parquet(s"$dir/v$baseV"), delta)
          // overwrite is safe here: the target is absent or a partial
          // crash leftover, which committedVersions hides from readers.
          // The _SUCCESS marker is this class's commit protocol, so
          // force it per-write (write options override the session
          // hadoopConf): deployments commonly disable the marker
          // globally for object stores, and without it every committed
          // snapshot would be invisible to recovery — `latest` never
          // advances and each batch recomputes from scratch.
          merged.write.mode("overwrite")
            .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "true")
            .parquet(s"$dir/v$batchId")
          version = math.max(version, batchId) // committed — advance last
        }
      }
      .start()
}
