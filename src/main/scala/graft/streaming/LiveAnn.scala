package graft.streaming

import graft.pipeline.Similarity
import graft.pipeline.Similarity.IvfIndex

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Live IVF ANN maintenance — the embedding-store face of the
  * delta-based streaming posture: a growing vector corpus is assigned
  * to a FROZEN trained codebook shard-by-shard, and each micro-batch
  * writes only its own assignments (O(|batch|) at any accumulated
  * size). This is the standard production ANN shape: train centroids
  * once (or offline on a sample), assign incrementally forever,
  * retrain out-of-band when drift warrants a new store.
  *
  * Exactness: nearest-centroid assignment is deterministic PER VECTOR
  * given the centroids (`Similarity.assignIvf`), so incremental
  * assignment is row-identical to assigning the union corpus in one
  * batch — not an approximation of it; StreamingSpec pins
  * `ivfTopKWith` result equality. (Contrast the dedup maintainer,
  * whose per-batch verdicts are order-dependent by design.)
  *
  * Layout (`VersionedState`): centroids live ONCE at `<dir>/centroids`
  * (k×dim — driver/broadcast sized; written with the same forced
  * `_SUCCESS` commit), trained on the first batch if absent; each
  * version's `assigned` part is that batch's delta; readers union
  * base+deltas (purely additive — no fold), `Compaction.compactAnn`
  * concatenates version ranges.
  */
class LiveAnnMaintainer(
    spark: SparkSession,
    dir: String,
    cells: Int = 16,
    iters: Int = 2,
    autoCompactEvery: Int = 0) {

  private val parts = LiveAnnMaintainer.Parts

  @volatile private var version: Long = VersionedState.maxVersion(dir, parts)

  def latestVersion: Long = version

  /** The frozen codebook, if trained yet. */
  def centroids: Option[Array[Array[Double]]] = {
    if (!new java.io.File(s"$dir/centroids/_SUCCESS").exists()) return None
    Some(spark.read.parquet(s"$dir/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).map(_._2))
  }

  /** The queryable IVF index at the latest committed version — feed it
    * to `Similarity.ivfTopKWith`. Tombstoned vectors are masked
    * version-ordered (the engine store's delete posture, keyed on
    * vec_id): a vector re-embedded AFTER its tombstone serves again.
    */
  def latestIndex: Option[IvfIndex] =
    centroids.flatMap { cents =>
      val ps = VersionedState.readPaths(dir, parts, Some("assigned"), version)
      if (ps.isEmpty) None
      else {
        val tombPs = VersionedState.readPaths(dir, parts, Some("tombstones"), version)
        val tombs = VersionedState.tombstoneSet(
          if (tombPs.isEmpty) None else Some(spark.read.parquet(tombPs: _*)), "vec_id")
        Some(IvfIndex(cents,
          VersionedState.maskDeleted(
            VersionedState.withVer(spark.read.parquet(ps: _*)), tombs, "vec_id")))
      }
    }

  /** One micro-batch of embeddings (vec_id, embedding). The first
    * committed batch trains the codebook; every batch (including the
    * first) writes only its own assignment delta. Replay is idempotent
    * (assignment depends only on the batch's rows + the frozen
    * centroids).
    */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    if (batchId <= version ||
        parts.forall(p => new java.io.File(s"$dir/v$batchId/$p/_SUCCESS").exists()))
      version = math.max(version, batchId)
    else {
      val cents = centroids.getOrElse {
        val trained = Similarity.trainIvf(batch, cells, iters)
        import spark.implicits._
        trained.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
          .toSeq.toDF("cell", "centroid")
          .coalesce(1).write.mode("overwrite")
          .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "true")
          .parquet(s"$dir/centroids")
        trained
      }
      Similarity.assignIvf(cents, batch)
        .write.mode("overwrite")
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "true")
        .parquet(s"$dir/v$batchId/assigned")
      write(LiveAnnMaintainer.emptyTombstones(spark), s"$dir/v$batchId/tombstones")
      version = math.max(version, batchId)
    }
    maybeCompact()
  }

  // Policy-driven major compaction (`Compaction.maybeCompact` dial);
  // the frozen codebook is store-level state and never folds. Also the
  // tombstone eraser for deleted vectors.
  private def maybeCompact(): Unit = {
    Compaction.maybeCompact(autoCompactEvery, dir, parts)(
      Compaction.compactAnn(spark, dir, _))
    ()
  }

  private def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "true")
      .parquet(path)

  /** One DELETE micro-batch: `deletes` carries a `vec_id` column. Same
    * LSM contract as the engine store — O(|deletes|) tombstone bytes,
    * masking at read scope, physical removal at `Compaction.compactAnn`,
    * re-embedding after the tombstone resurrects the vector.
    */
  def processDeletes(deletes: DataFrame, batchId: Long): Unit = {
    if (batchId <= version ||
        parts.forall(p => new java.io.File(s"$dir/v$batchId/$p/_SUCCESS").exists()))
      version = math.max(version, batchId)
    else {
      write(LiveAnnMaintainer.emptyAssigned(spark), s"$dir/v$batchId/assigned")
      write(deletes.select("vec_id").distinct(), s"$dir/v$batchId/tombstones")
      version = math.max(version, batchId)
    }
    maybeCompact()
  }

  /** Attach to a streaming Dataset with (vec_id, embedding) columns;
    * same restart contract as the other maintainers.
    */
  def attach(embStream: Dataset[Row], checkpoint: String): StreamingQuery =
    embStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch.toDF, batchId)
      }
      .start()
}

object LiveAnnMaintainer {
  /** Assignment deltas + delete markers per version; the codebook is
    * store-level state, not versioned (frozen by design).
    */
  val Parts: Seq[String] = Seq("assigned", "tombstones")

  private[streaming] def emptyTombstones(s: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    s.createDataFrame(s.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("vec_id", LongType))))
  }

  /** Schema-preserved empty `assigned` delta (the delete path writes
    * one so the commit protocol stays uniform across version kinds).
    */
  private[streaming] def emptyAssigned(s: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    s.createDataFrame(s.sparkContext.emptyRDD[Row],
      StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)),
        StructField("cell", IntegerType),
        StructField("nrm", DoubleType))))
  }
}
