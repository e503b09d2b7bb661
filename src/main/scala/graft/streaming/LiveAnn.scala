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
    iters: Int = 2) {

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
    * to `Similarity.ivfTopKWith`.
    */
  def latestIndex: Option[IvfIndex] =
    centroids.flatMap { cents =>
      val ps = VersionedState.readPaths(dir, parts, Some("assigned"), version)
      if (ps.isEmpty) None
      else Some(IvfIndex(cents, spark.read.parquet(ps: _*)))
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
      version = math.max(version, batchId)
    }
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
  /** One additive part per version; the codebook is store-level state,
    * not versioned (frozen by design).
    */
  val Parts: Seq[String] = Seq("assigned")
}
