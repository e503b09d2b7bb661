package graft.tools

/** Diagnostic for the r6->r7 relational bench drift: times the drifted
  * relational entries warm BEFORE and AFTER the dedup/similarity family
  * populates its session caches, and reports the cache-manager and
  * storage-memory state at both points — isolating "per-query planning
  * overhead from accumulated cached plans" from "executor storage
  * pressure". Usage: `DriftProbe <sfDir>`.
  */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rel = Seq("q29_distinct_window", "q12_events_hourly", "q9_intersect",
      "q19_rollup", "q20_user_span", "q4_semi_join")
    val dedup = Seq("dd_exact", "dd_ngram_jaccard", "dd_cluster", "dd_keep_best",
      "dd_minhash_lsh", "dd_incr", "dd_simhash", "dd_dup_spans", "dd_scrub",
      "dd_embedding_neardup", "dd_semdedup", "sim_pairs_brute", "sim_topk",
      "sim_lsh_pairs", "sim_lsh_multi", "sim_ivf_topk", "sim_pq_topk",
      "sim_ivfpq_topk", "sim_recall", "cu_bloom", "cu_contam", "cu_overlap")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    def state(tag: String): Unit = {
      val cm = spark.sharedState.cacheManager
      // cachedData is private; count via the public isEmpty + RDD storage view
      val rddInfos = spark.sparkContext.getRDDStorageInfo
      val memUsed = rddInfos.map(_.memSize).sum / 1024 / 1024
      println(f"[$tag] cached RDDs=${rddInfos.length} storageMem=${memUsed}MiB cacheManagerEmpty=${cm.isEmpty}")
    }
    // warm both phases identically: run each rel query once cold, then
    // report the median of three warm runs
    def medianWarm(tag: String): Unit = {
      rel.foreach(run)
      val times = (1 to 3).map(_ => rel.map(n => n -> run(n)).toMap)
      rel.foreach { n =>
        val s = times.map(_(n)).sorted
        println(f"[$tag] $n ${s(1)}%.3f s")
      }
    }
    medianWarm("pre ")
    state("pre ")
    dedup.foreach(run)
    state("post")
    medianWarm("post")
    spark.stop()
  }
}
