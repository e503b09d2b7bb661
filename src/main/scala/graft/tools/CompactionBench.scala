package graft.tools

import graft.{Sessions, Tables}
import graft.streaming.{Compaction, LiveEngineMaintainer, LiveIndexMaintainer, LiveNearDupMaintainer}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Diagnostic: measures what `Compaction` buys (and costs) for both
  * streaming maintainers — read-set size, merged-read wall, compaction
  * wall, and on-disk bytes — and proves read-equivalence pre/post on
  * real corpus data. Feeds the SCALE.md compaction appendix.
  *
  * Usage: `runMain graft.tools.CompactionBench [sfDir] [nBatches]`
  */
object CompactionBench {
  private def du(dir: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
    walk(new java.io.File(dir))
  }

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
  }

  private def canon(df: DataFrame): Seq[String] = df
    .select(col("fieldValue"), col("fieldName"), col("partition"), col("language"),
      col("count"), array_sort(col("uids")).as("uids"), col("ignore"))
    .collect().map(_.toString).sorted.toSeq

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val n     = args.lift(1).map(_.toInt).getOrElse(12)
    val spark = Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents").cache()
    docs.count()

    // ---- index maintainer: n delta batches → compact -------------------
    val ixDir = java.nio.file.Files.createTempDirectory("graft-cbench-ix").toString
    val ix = new LiveIndexMaintainer(spark, ixDir, numPartitions = 8)
    val (_, ingestWall) = timed {
      (0 until n).foreach(b =>
        ix.processBatch(docs.filter(pmod(col("doc_id"), lit(n)) === b), b.toLong))
    }
    val deltaBytes = du(ixDir)
    val (preRows, preWall) = timed(ix.latest.get.count())
    val preCanon = canon(ix.latest.get)
    val (_, compactWall) = timed(Compaction.compactIndex(spark, ixDir))
    val baseBytes = du(ixDir)
    val ix2 = new LiveIndexMaintainer(spark, ixDir, numPartitions = 8)
    val (postRows, postWall) = timed(ix2.latest.get.count())
    require(preRows == postRows && preCanon == canon(ix2.latest.get),
      "index compaction must be read-equivalent")
    println(f"index: n=$n ingest=$ingestWall%.2fs deltas=${deltaBytes / 1024}%dKiB " +
      f"read_pre=$preWall%.2fs compact=$compactWall%.2fs base=${baseBytes / 1024}%dKiB " +
      f"read_post=$postWall%.2fs rows=$preRows")

    // ---- auto-compaction policy: same ingest, dial = 4 -----------------
    // Sustained ingest with autoCompactEvery: majors fire inside the
    // batch turn every 4 deltas, so the final read never folds more
    // than 3 deltas over the base — the amortized cost shows up in
    // ingest wall, the payoff in read wall and a bounded dir count.
    val acDir = java.nio.file.Files.createTempDirectory("graft-cbench-ac").toString
    val ac = new LiveIndexMaintainer(spark, acDir, numPartitions = 8, autoCompactEvery = 4)
    val (_, acIngestWall) = timed {
      (0 until n).foreach(b =>
        ac.processBatch(docs.filter(pmod(col("doc_id"), lit(n)) === b), b.toLong))
    }
    val acBytes = du(acDir)
    val acDirs = Option(new java.io.File(acDir).listFiles()).map(_.length).getOrElse(0)
    val (acRows, acReadWall) = timed(ac.latest.get.count())
    require(acRows == preRows && canon(ac.latest.get) == preCanon,
      "auto-compacted read must equal the manual maintainer's")
    println(f"index-auto4: n=$n ingest=$acIngestWall%.2fs dirs=$acDirs%d " +
      f"bytes=${acBytes / 1024}%dKiB read=$acReadWall%.2fs rows=$acRows")

    // ---- dedup maintainer: n batches → compact -------------------------
    val ddDir = java.nio.file.Files.createTempDirectory("graft-cbench-dd").toString
    val dd = new LiveNearDupMaintainer(spark, ddDir, tau = 0.6)
    val (_, ddIngestWall) = timed {
      (0 until n).foreach(b =>
        dd.processBatch(docs.filter(pmod(col("doc_id"), lit(n)) === b), b.toLong))
    }
    val ddDeltaBytes = du(ddDir)
    val (ddPreRows, ddPreWall) = timed(dd.latest.get.count())
    val ddPreIds = dd.latest.get.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val (_, ddCompactWall) = timed(Compaction.compactDedup(spark, ddDir))
    val ddBaseBytes = du(ddDir)
    val dd2 = new LiveNearDupMaintainer(spark, ddDir, tau = 0.6)
    val (ddPostRows, ddPostWall) = timed(dd2.latest.get.count())
    require(ddPreRows == ddPostRows &&
      ddPreIds == dd2.latest.get.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq,
      "dedup compaction must be read-equivalent")
    println(f"dedup: n=$n ingest=$ddIngestWall%.2fs deltas=${ddDeltaBytes / 1024}%dKiB " +
      f"read_pre=$ddPreWall%.2fs compact=$ddCompactWall%.2fs base=${ddBaseBytes / 1024}%dKiB " +
      f"read_post=$ddPostWall%.2fs kept=$ddPreRows")

    // ---- full-engine maintainer: n batches → serve → compact → serve --
    val enDir = java.nio.file.Files.createTempDirectory("graft-cbench-en").toString
    val en = new LiveEngineMaintainer(spark, enDir, numPartitions = 8)
    val (_, enIngestWall) = timed {
      (0 until n).foreach(b =>
        en.processBatch(docs.filter(pmod(col("doc_id"), lit(n)) === b), b.toLong))
    }
    val enDeltaBytes = du(enDir)
    def serve(m: LiveEngineMaintainer): Long = {
      val eng = new graft.query.WikiSearchEngine(spark, m.latestIndex.get)
      eng.run("TEXT == 'spark' and TEXT == 'join'").count()
    }
    val (preHits, enPreWall) = timed(serve(en))
    val (_, enCompactWall) = timed(Compaction.compactEngine(spark, enDir))
    val enBaseBytes = du(enDir)
    val en2 = new LiveEngineMaintainer(spark, enDir, numPartitions = 8)
    val (postHits, enPostWall) = timed(serve(en2))
    require(preHits == postHits, "engine compaction must serve identically")
    println(f"engine: n=$n ingest=$enIngestWall%.2fs deltas=${enDeltaBytes / 1024}%dKiB " +
      f"serve_pre=$enPreWall%.2fs compact=$enCompactWall%.2fs base=${enBaseBytes / 1024}%dKiB " +
      f"serve_post=$enPostWall%.2fs hits=$preHits")
    spark.stop()
  }
}
