package graft.streaming

import graft.ingest.{IndexBuilder, WikiIndex}

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Live maintenance of the FULL queryable store — every table the
  * search engine serves from, not just the global index
  * (`LiveIndexMaintainer`'s scope). This is the complete Spark shape of
  * the reference's LIVE mode: streamed ingest keeps ALL of `wiki` /
  * `wikiIndex` / `wikiMetadata` queryable while Mutations flow
  * (`WikipediaIngester.java:90-136`), so here a `WikiSearchEngine`
  * constructed over `latestIndex` serves the full query language over
  * everything ingested so far — StreamingSpec pins engine-result
  * equality against a from-scratch batch build.
  *
  * Same `VersionedState` LSM layout and commit protocol as the other
  * maintainers; per batch this writes the batch's delta of each part:
  *
  *   - `docs_fields`, `documents`, `postings`, `events` — per-document
  *     rows, purely additive → readers union (the batch's event pivot
  *     equals the union pivot restricted to the batch's docs, because
  *     the pivot groups by document key).
  *   - `global` — lossy UidList postings → readers fold the union
  *     through `IncrementalIndex.mergeAll` (merge-on-read, exact by
  *     A1's contract).
  *   - `metadata` — (field, kind, language, normalizer) catalog rows →
  *     readers union + distinct (a language seen twice is one row).
  *
  * The reverse index is `WikiIndex`'s derived projection over the
  * merged global index (the persisted-sorted form is `save`'s batch
  * optimization; a live store trades that scan-pruning for freshness —
  * run `Compaction.compactEngine` + `WikiIndex.save` to graduate a
  * live store to the bulk layout).
  *
  * Write amplification per micro-batch is O(|batch|) for every part at
  * any accumulated size; read amplification is bounded by compaction
  * cadence (`Compaction.compactEngine`).
  */
class LiveEngineMaintainer(
    spark: SparkSession,
    dir: String,
    numPartitions: Int) {

  private val parts = LiveEngineMaintainer.Parts

  @volatile private var version: Long = VersionedState.maxVersion(dir, parts)

  def latestVersion: Long = version

  private def readUnion(part: String): Option[DataFrame] = {
    val ps = VersionedState.readPaths(dir, parts, Some(part), version)
    if (ps.isEmpty) None else Some(spark.read.parquet(ps: _*))
  }

  /** The full queryable store at the latest committed version — feed it
    * straight to `new WikiSearchEngine(spark, m.latestIndex.get)`.
    */
  def latestIndex: Option[WikiIndex] =
    readUnion("docs_fields").map { df =>
      WikiIndex(
        docsFields = df,
        documents = readUnion("documents").get,
        globalIndex = IncrementalIndex.mergeAll(readUnion("global").get),
        metadata = readUnion("metadata").get.distinct(),
        termPostings = readUnion("postings").get,
        storedEvents = readUnion("events"))
    }

  private def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "true")
      .parquet(path)

  /** One micro-batch: build the batch's index tables with the SAME
    * extraction as batch ingest and write each as this version's delta.
    * Replay is idempotent (deltas depend only on the batch's rows).
    */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    if (batchId <= version ||
        parts.forall(p => new java.io.File(s"$dir/v$batchId/$p/_SUCCESS").exists()))
      version = math.max(version, batchId)
    else {
      val ix = IndexBuilder.fromDocumentsTable(batch.sparkSession, batch, numPartitions)
      write(ix.docsFields, s"$dir/v$batchId/docs_fields")
      write(ix.documents, s"$dir/v$batchId/documents")
      write(ix.globalIndex, s"$dir/v$batchId/global")
      write(ix.termPostings, s"$dir/v$batchId/postings")
      write(ix.events, s"$dir/v$batchId/events")
      write(ix.metadata, s"$dir/v$batchId/metadata")
      version = math.max(version, batchId)
    }
  }

  /** Attach to a streaming Dataset with the `documents` schema; same
    * restart contract as the other maintainers (reuse the checkpoint).
    */
  def attach(docsStream: Dataset[Row], checkpoint: String): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch.toDF, batchId)
      }
      .start()
}

object LiveEngineMaintainer {
  /** One subdir per engine table; a version commits only when every
    * part's `_SUCCESS` exists. Shared with `Compaction.compactEngine`.
    */
  val Parts: Seq[String] =
    Seq("docs_fields", "documents", "global", "postings", "events", "metadata")
}
