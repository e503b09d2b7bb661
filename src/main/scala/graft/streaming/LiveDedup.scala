package graft.streaming

import graft.pipeline.Dedup

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming near-duplicate dedup at ingest — the Structured Streaming
  * face of `Dedup.minhashPairsIncremental`, completing §2.10's dedup
  * story: `EventStreams.dedupStream` drops EXACT duplicates inside the
  * watermark with bounded built-in state; this maintainer drops
  * NEAR-duplicates against the whole accumulated corpus, holding its
  * state not in the stream (unbounded keyed state is the shape a
  * 100 TB pipeline must not hold) but as the persisted LSH artifacts
  * the incremental batch operator already defines — the kept docs,
  * their shingle-hash sets (verify side), and their minhash band table
  * (candidate side), as immutable versioned snapshots.
  *
  * Per micro-batch: fresh-side sets/bands are computed ONCE (the only
  * signature work — the corpus tables are read back, never recomputed),
  * `Dedup.minhashPairsFromParts` yields the fresh×fresh + corpus×fresh
  * pair list (corpus×corpus never formed), and verdicts follow the same
  * component rule as batch `dedupClusters`: a fresh doc DROPS iff its
  * LSH-τ connected component (over pairs touching this batch) contains
  * a kept-corpus doc or a lower-id batch doc; otherwise it KEEPS and
  * its artifacts merge into the next snapshot. Chains inside a batch
  * collapse to one keeper (cluster keep-first, exactly `dd_cluster`'s
  * rule); docs kept by an earlier batch are never revoked — the online
  * contract batch ingestion needs.
  *
  * Commit protocol and layout are `LiveIndexMaintainer`'s
  * (`VersionedState`: `_SUCCESS` markers forced per write, recovery
  * scans committed versions, a replayed batch skips against its own
  * committed output). Dedup artifacts are purely ADDITIVE — kept docs
  * are only ever appended — so each version dir holds ONLY its batch's
  * kept delta, reads just union base + deltas (no fold needed, unlike
  * the index's lossy-UidList merge-on-read), and a micro-batch writes
  * O(|batch|) — never O(corpus) — at any accumulated size.
  * `Compaction.compactDedup` periodically folds version ranges into
  * one base dir, the standard LSM posture.
  */
class LiveNearDupMaintainer(
    spark: SparkSession,
    dir: String,
    tau: Double = 0.6,
    bands: Int = 32,
    shingleN: Int = 3,
    autoCompactEvery: Int = 0) {

  private val parts = LiveNearDupMaintainer.Parts

  // A version counts only when EVERY part committed (docs is written
  // last, so a crash between part writes leaves no readable version).
  // Read sets come from the shared LSM layout (`VersionedState`): the
  // newest compacted base plus later deltas — dedup state is purely
  // additive, so readers just union, no fold needed.
  @volatile private var version: Long = VersionedState.maxVersion(dir, parts)

  private def readUnion(part: String, upTo: Long): Option[DataFrame] = {
    val ps = VersionedState.readPaths(dir, parts, Some(part), upTo)
    if (ps.isEmpty) None else Some(spark.read.parquet(ps: _*))
  }

  /** Tombstone-masked read of a doc-keyed part (docs/sets/bands): the
    * same version-ordered LSM masking as the engine/ANN stores, keyed
    * on doc_id — a deleted corpus doc stops matching future batches,
    * and a re-ingest after its tombstone re-enters dedup as fresh.
    */
  private def readMasked(part: String, upTo: Long): Option[DataFrame] = {
    val tombs = VersionedState.tombstoneSet(readUnion("tombstones", upTo), "doc_id")
    readUnion(part, upTo).map(df =>
      VersionedState.maskDeleted(VersionedState.withVer(df), tombs, "doc_id"))
  }

  /** The KEPT corpus (deduped documents): union of committed deltas,
    * minus tombstoned docs.
    */
  def latest: Option[DataFrame] = readMasked("docs", version)

  def latestVersion: Long = version

  /** Keep/drop verdicts for one committed batch (doc_id, verdict). */
  def verdictsFor(batchId: Long): DataFrame =
    spark.read.parquet(s"$dir/verdicts/v$batchId")

  // Corpus state visible to a (re)played batch: everything committed
  // strictly below its id (merging a replayed delta against its own
  // output would double-count; basing on the predecessor makes the
  // write idempotent).
  private def baseVersionFor(batchId: Long): Long =
    (VersionedState.committed(dir, 'v', parts) ++
      VersionedState.committed(dir, 'c', parts))
      .filter(_ < batchId).foldLeft(-1L)(math.max)

  private def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "true")
      .parquet(path)

  /** Attach to a streaming Dataset with the `documents` schema and
    * start filtering. Caller owns the returned query's lifecycle; reuse
    * the SAME `checkpoint` across restarts (LiveIndexMaintainer's
    * restart contract).
    */
  def attach(docsStream: Dataset[Row], checkpoint: String): StreamingQuery =
    WriterLease.register(dir, docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch.toDF, batchId)
      }
      .start())

  /** One micro-batch of the filtering loop (the `foreachBatch` body,
    * callable directly for tests and backfills).
    */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    if (batchId <= version ||
        parts.forall(p => VersionedState.exists(s"$dir/v$batchId/$p/_SUCCESS")))
      version = math.max(version, batchId) // committed replay: skip
    else {
      val b = batch.cache()
      val baseV = baseVersionFor(batchId)
      val setsNew = Dedup.shingleSets(b, shingleN).cache()
      val bandsNew = Dedup.minhashBands(setsNew, bands).cache()
      val setsOld = readMasked("sets", baseV).getOrElse(setsNew.limit(0))
      val bandsOld = readMasked("bands", baseV).getOrElse(bandsNew.limit(0))
      val pairs = Dedup.minhashPairsFromParts(
        setsOld, bandsOld, setsNew, bandsNew, tau)

      val freshIds = b.select(col("doc_id"))
      val comp = Dedup.connectedComponents(pairs.select("a", "b"))
      // components with a member OUTSIDE this batch touch the kept
      // corpus (pairs only ever reference corpus ∪ batch docs)
      val corpusComps = comp.join(freshIds, Seq("doc_id"), "left_anti")
        .select("component").distinct()
      val freshComp = comp.join(freshIds, Seq("doc_id"))
      val keepers = freshComp.join(corpusComps, Seq("component"), "left_anti")
        .groupBy("component").agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      val dropIds = freshComp.join(keepers, Seq("doc_id"), "left_anti")
        .select("doc_id").distinct().cache()

      val verdicts = freshIds
        .join(dropIds.withColumn("dropped", lit(true)), Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("dropped"), lit("drop")).otherwise(lit("keep")).as("verdict"))
      write(verdicts, s"$dir/verdicts/v$batchId")

      // delta-only writes: this batch's keepers, O(|batch|) bytes
      val keptIds = freshIds.join(dropIds, Seq("doc_id"), "left_anti")
      write(setsNew.join(keptIds, Seq("doc_id"), "left_semi"),
        s"$dir/v$batchId/sets")
      write(bandsNew.join(keptIds, Seq("doc_id"), "left_semi"),
        s"$dir/v$batchId/bands")
      write(b.join(dropIds, Seq("doc_id"), "left_anti"),
        s"$dir/v$batchId/docs")
      write(LiveNearDupMaintainer.emptyTombstones(spark), s"$dir/v$batchId/tombstones")
      Seq(b, setsNew, bandsNew, dropIds).foreach(_.unpersist())
      version = math.max(version, batchId)
    }
    maybeCompact()
  }

  // Policy-driven major compaction (`Compaction.maybeCompact` dial,
  // with its one-cycle reader grace window); per-batch `verdicts/`
  // history is untouched — only corpus state folds. Also the tombstone
  // eraser: the base is clean at the first major after the delete, and
  // the deltas holding the deleted bytes are swept one cycle later.
  private def maybeCompact(): Unit = {
    Compaction.maybeCompact(autoCompactEvery, dir, parts)(
      Compaction.compactDedup(spark, dir, _))
    ()
  }

  /** One DELETE micro-batch: `deletes` carries a `doc_id` column. The
    * corpus-state contract of the other stores — O(|deletes|) tombstone
    * bytes; the doc's text AND its LSH artifacts (sets/bands) stop
    * matching at read scope; physical removal at
    * `Compaction.compactDedup`. Already-written verdicts are history
    * (per-batch output), untouched.
    */
  def processDeletes(deletes: DataFrame, batchId: Long): Unit = {
    if (batchId <= version ||
        parts.forall(p => VersionedState.exists(s"$dir/v$batchId/$p/_SUCCESS")))
      version = math.max(version, batchId)
    else {
      val emptyDocs = spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], LiveEngineMaintainer.DocumentsSchema)
      write(emptyDocs, s"$dir/v$batchId/docs")
      write(Dedup.shingleSets(emptyDocs, shingleN), s"$dir/v$batchId/sets")
      write(Dedup.minhashBands(Dedup.shingleSets(emptyDocs, shingleN), bands),
        s"$dir/v$batchId/bands")
      write(deletes.select("doc_id").distinct(), s"$dir/v$batchId/tombstones")
      version = math.max(version, batchId)
    }
    maybeCompact()
  }
}

object LiveNearDupMaintainer {
  /** The additive state parts of a committed version: kept docs, their
    * shingle-hash sets (verify side), their minhash band table
    * (candidate side), plus delete markers. Shared with `Compaction`.
    */
  val Parts: Seq[String] = Seq("docs", "sets", "bands", "tombstones")

  private[streaming] def emptyTombstones(s: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    s.createDataFrame(s.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("doc_id", LongType))))
  }
}
