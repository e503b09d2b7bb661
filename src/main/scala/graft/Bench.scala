package graft
object Bench {

  /** The seeded reference-shape concurrent workload (ANDs of 3-5 random
    * common TEXT words, README.md:192-204 shape) — one definition shared
    * by Bench and ProfileServe so the profiler always replays exactly
    * the benchmarked workload. Plain-token vocab only: a quote or
    * backslash in a sampled token would make the interpolated JEXL
    * unparseable and crash the whole run.
    */
  def concurrentWorkload(ix: ingest.WikiIndex, n: Int): Seq[String] = {
    val vocab = ix.globalIndex
      .filter(org.apache.spark.sql.functions.col("fieldName") === "TEXT")
      .select("fieldValue").distinct().collect().map(_.getString(0))
      .filter(_.matches("[A-Za-z0-9]+")).sorted
    val rnd = new scala.util.Random(42)
    Seq.fill(n) {
      val k = 3 + rnd.nextInt(3)
      Seq.fill(k)(vocab(rnd.nextInt(vocab.length)))
        .map(w => s"TEXT == '$w'").mkString(" and ")
    }
  }

  /** BENCH-ONLY key abbreviation: the numbered relational and wikisearch
    * queries drop their descriptive suffix ("q17_small_quantity_revenue"
    * -> "q17", "ws_q15_ne_numeric_on_text" -> "ws_q15") — the number
    * already identifies the query and the suffixes alone cost ~420 chars
    * of the ~1800-char tail-capture budget (round 5 printed 1806 chars +
    * its own truncation warning). Registry/CORRECTNESS names are
    * UNCHANGED; the mapping is documented in README.md's bench section.
    */
  /** Explicit line-budget abbreviations (README bench section): family
    * prefix keeps 1-2 chars, tag keeps 2-4. Registry/CORRECTNESS names
    * are UNCHANGED; the collision `require` below guards edits here.
    */
  private val shortMap = Map(
    "ws_near_q"            -> "ws_nq",
    "ws_fuzzy_q"           -> "ws_fq",
    "ws_fuzzy2_q"          -> "ws_f2",
    "ws_phrase_q"          -> "ws_pq",
    "ws_knear_q"           -> "ws_kq",
    "ws_onear_q"           -> "ws_oq",
    "ws_live_q"            -> "ws_lq",
    "ws_del_q"             -> "ws_dq",
    "ws_count_q"           -> "ws_ct",
    "ws_page_q"            -> "ws_pg",
    "ws_infix_q"           -> "ws_ix",
    "ws_syn_q"             -> "ws_sy",
    "ws_syn_persist_q"     -> "ws_sp",
    "ws_live_syn_q"        -> "ws_ls",
    "ws_fld_q"             -> "ws_fd",
    "ws_live_fld_q"        -> "ws_lf",
    "ws_asof_q"            -> "ws_ao",
    "ws_index_incremental" -> "ws_inc",
    "ws_index_termfreq"    -> "ws_itf",
    "ws_content_fetch"     -> "ws_cf",
    "ws_postings"          -> "ws_po",
    "ws_facets"            -> "ws_fa",
    "ws_hybrid"            -> "ws_hy",
    "ws_collapse_q"        -> "ws_cp",
    "ws_stats_q"           -> "ws_st",
    "ws_complete_q"        -> "ws_ac",
    "ws_hist_q"            -> "ws_hg",
    "ws_bm25"              -> "ws_bm",
    "ws_mlt_q"             -> "ws_ml",
    "ws_msnip"             -> "ws_ms",
    "ws_psnip"             -> "ws_ps",
    "ws_snip"              -> "ws_sn",
    "ws_near"              -> "ws_nr",
    "ws_fuzzy"             -> "ws_fz",
    "ws_phrase"            -> "ws_ph",
    "dd_embedding_neardup" -> "dd_emb",
    "dd_ngram_jaccard"     -> "dd_nj",
    "dd_minhash_lsh"       -> "dd_mh",
    "dd_keep_best"         -> "dd_kb",
    "dd_dup_spans"         -> "dd_ds",
    "dd_semdedup"          -> "dd_sd",
    "dd_simhash"           -> "dd_sh",
    "dd_cluster"           -> "dd_cl",
    "dd_exact"             -> "dd_ex",
    "dd_scrub"             -> "dd_sc",
    "sim_pairs_brute"      -> "s_pb",
    "sim_topk"             -> "s_tk",
    "sim_knn"              -> "s_kn",
    "sim_lsh_pairs"        -> "s_lp",
    "sim_lsh_multi"        -> "s_lm",
    "sim_ivf_topk"         -> "s_ivf",
    "sim_ivf_full_probe"   -> "s_ivff",
    "sim_ivf_filtered"     -> "s_ivfl",
    "sim_pq_topk"          -> "s_pq",
    "sim_ivfpq_topk"       -> "s_ivfpq",
    "sim_recall"           -> "s_rec",
    "sim_range"            -> "s_rg",
    "sim_rp"               -> "s_rp",
    "sim_mmr"              -> "s_mm",
    "sim_mmr_ivf"          -> "s_mi",
    "ta_stats"             -> "t_st",
    "ta_quality"           -> "t_q",
    "ta_langid"            -> "t_l",
    "ta_token_counts"      -> "t_tc",
    "ta_fingerprint"       -> "t_fp",
    "ta_repetition"        -> "t_rep",
    "ta_top_ngrams"        -> "t_ng",
    "ta_lm_score"          -> "t_lm",
    "ta_entropy"           -> "t_en",
    "ta_nb_langid"         -> "t_nb",
    "cu_split"             -> "c_sp",
    "cu_sample"            -> "c_sa",
    "cu_contam"            -> "c_ct",
    "cu_fuzzy_contam"      -> "c_fc",
    "cu_source_cap"        -> "c_cap",
    "cu_overlap"           -> "c_ov",
    "cu_mix"               -> "c_mx",
    "cu_redact"            -> "c_rd",
    "cu_pack"              -> "c_pk",
    "cu_quality_gate"      -> "c_qg",
    "cu_bloom"             -> "c_bl",
    "cu_shuffle"           -> "c_sh",
    "cu_temp"              -> "c_tp",
    "cu_budget"            -> "c_bu",
    "cu_manifest"          -> "c_mf",
    "cu_chunk"             -> "c_ck",
    "cu_dsir"              -> "c_dr",
    "cu_dsir_oov"          -> "c_do",
    "cu_wsample"           -> "c_ws",
    "cu_live_dsir"         -> "c_ld",
    "mm_binary_meta"       -> "m_bm",
    "mm_feature_stub"      -> "m_fs",
    "mm_frame_sample"      -> "m_fr")

  def shortName(name: String): String = {
    val s = name match {
      case s0 if shortMap.contains(s0)     => shortMap(s0)
      case s0 if s0.matches("q\\d+_.*")    => s0.takeWhile(_ != '_')
      case s0 if s0.matches("ws_q\\d+_.*") => "ws_" + s0.drop(3).takeWhile(_ != '_')
      case s0 => s0
    }
    // Final line-budget compression (round 10: 136 entries pushed the
    // line to 1768 chars, past the 1650 alarm): the family prefix keeps
    // ONE char and the separator drops — "ws_q1" -> "wq1", "ws_inc" ->
    // "winc", "dd_mh" -> "dmh", "s_rg" -> "srg", "t_nb" -> "tnb".
    // Registry/CORRECTNESS names are UNCHANGED; the startup collision
    // `require` still guards the whole composed mapping.
    if (s.startsWith("ws_")) "w" + s.drop(3)
    else if (s.startsWith("dd_")) "d" + s.drop(3)
    else s.replaceFirst("_", "")
  }

  def main(args: Array[String]): Unit = {
    // Short-name uniqueness is knowable before ANY work — registry-only,
    // so check it before the SparkSession even exists: a future name
    // collision must fail fast, not after the index build, warm-up, and
    // concurrent section have burned minutes of discarded measurement
    // (the evidence-loss mode the line budget machinery prevents). "ib"
    // is appended to the JSON after abbreviation, so it participates.
    {
      val shorts = SparkEntry.registry.map(q => shortName(q.name)) :+ "ib"
      require(shorts.distinct.size == shorts.size,
        "bench short-name collision: " +
          shorts.diff(shorts.distinct).distinct.mkString(","))
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Deterministic order; a warm-up pass on the search-engine index so
    // per-query times measure query execution, not one-time index build
    // (the reference's baseline likewise measures queries against an
    // already-built index). Caches are lazy — force materialization.
    val ix = search.SearchQueries.index(spark, sfDir)
    val indexBuild = {
      val t0 = System.nanoTime()
      ix.globalIndex.count(); ix.events.count(); ix.termPostings.count()
      ix.docsFields.count(); ix.documents.count()
      (System.nanoTime() - t0) / 1e9
    }
    // Warm the engine serving path too (codegen compile + parquet footer
    // reads are one-time costs, not query execution — the reference
    // baseline likewise reports warm query times, README.md:199-204).
    // Terms must EXIST in the corpus: a no-hit term plans to an empty
    // LocalRelation and the whole join/filter path constant-folds away,
    // warming nothing.
    search.SearchQueries.engine(spark, sfDir)
      .run("TEXT == 'spark' and TEXT == 'join'").count()

    // Concurrent random-query throughput — measured FIRST, right after
    // the engine warm-up: it gauges the steady SERVING state, and
    // running it after the 65-query batch section made it measure that
    // section's accumulated heap/cache state instead (observed 3-7 qps
    // there vs ~24 in a fresh process on identical code).
    // The shape of the reference's baseline (~24-26 q/s aggregate on 10
    // nodes). Seeded, so the workload is identical across rounds.
    val nQueries = 40
    val workload = concurrentWorkload(ix, nQueries)
    val eng  = search.SearchQueries.engine(spark, sfDir)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec = scala.concurrent.ExecutionContext.fromExecutor(pool)
    // One untimed pass first: the reference's baseline reports WARM
    // throughput (README.md:199-204 measures repeated clients against a
    // live cluster), so we measure the steady serving state — term cache
    // populated, codegen JIT'd — not first-touch costs.
    def runAll(): Seq[Long] = {
      val fs = workload.map(q => scala.concurrent.Future(eng.run(q).count()))
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(fs), scala.concurrent.duration.Duration.Inf)
    }
    runAll()
    // FIVE timed passes; report the median AND the best. Identical code
    // has measured 1.4 s and 20 s for the same pass on this host (noisy
    // neighbors), so the median of too few passes still misreports by
    // 3×+ when contention clusters; the best pass is the least-
    // contaminated estimate of what the engine itself can serve.
    val (walls, resultsCnt) = (1 to 5).map { _ =>
      val t0 = System.nanoTime()
      val counts = runAll()
      ((System.nanoTime() - t0) / 1e9, counts)
    }.unzip
    val sortedWalls = walls.sorted
    val concWall     = sortedWalls(sortedWalls.size / 2)
    val concWallBest = sortedWalls.head
    pool.shutdown()

    val names = SparkEntry.registry.map(_.name)
    // Median of three runs per query, but INTERLEAVED: three full passes
    // over the registry, median taken ACROSS passes. Back-to-back runs
    // share any sustained host-contention window (seconds long on this
    // host), which is how three consecutive registry entries once
    // recorded 10-30× their history despite per-query medians — all
    // three runs of each unlucky query sat inside the same window.
    // Interleaving puts ~20 s of other work between a query's runs, so
    // a window taints at most one pass per query and the cross-pass
    // median votes it out. Same total work as the back-to-back scheme;
    // first-touch costs (codegen compile, parquet footers) land in pass
    // 1 and are voted out the same way, matching the reference's
    // warm-time baseline.
    // Each run is guarded separately: a transient failure must not
    // discard the other valid measurements. -1 marks a fully-failed
    // query — never reported as a result.
    def guarded(name: String): Option[Double] = {
      val fn = SparkEntry.queries(name)
      try {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); None
      }
    }
    val passes = Seq.fill(3)(names.map(n => n -> guarded(n)).toMap)
    val results = names.map { name =>
      val runs = passes.flatMap(_(name)).sorted
      // UPPER median (size/2): with one failed run the lower median
      // would degenerate to the min of the two survivors — exactly the
      // optimistic bias the median exists to avoid
      name -> (if (runs.isEmpty) -1.0 else runs(runs.size / 2))
    }

    // The harness that invokes this main captures only the LAST ~2000
    // characters of the build output, and an sbt success trailer (~90
    // chars) follows us. The JSON line must therefore stay well under
    // that budget or its head gets truncated and the whole report is
    // unparseable (this happened when values carried full double
    // precision, and again at 10 ms fixed resolution once the registry
    // hit 76 entries; 131 queries + index_build as of round 9). Totals
    // keep 3 decimals. Printing after
    // spark.stop() guarantees no shutdown logging lands between the
    // JSON and end-of-output.
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def f2(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    // The budget is tight at ~80 entries, so per-query values print with
    // ~2 significant figures: sub-second at 10 ms resolution, >=1 s at
    // 100 ms (a 4% grid — finer than host noise), trailing zeros
    // stripped ("0.20" -> "0.2", "1.00" -> "1"). This also BOUNDS a
    // slow run's line growth: a contention window that pushes several
    // queries past 10 s once added 2 chars per query at fixed %.2f.
    // (Counts here track the registry; see README for the current one.)
    def fq(v: Double): String = {
      val s = if (v >= 1) "%.1f".formatLocal(java.util.Locale.ROOT, v) else f2(v)
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').stripPrefix(".").reverse else s
    }
    // "ib" = one-time search-index materialization (named "index_build"
    // through round 5's BENCH_r json; shortened for line budget),
    // excluded from total. Keys print abbreviated — see shortName above.
    val qs = (results.map { case (k, v) => (shortName(k), v) } :+ ("ib" -> indexBuild))
      .map { case (k, v) => "\"" + k + "\":" + fq(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // resultsCnt is still computed (the workload must produce hits to
    // measure anything) but not reported: every concurrent key competes
    // with per-query resolution for line budget.
    require(resultsCnt.head.sum > 0, "concurrent workload returned zero hits")
    // sf as basename, concurrent numbers at 2 decimals, and no static /
    // derivable concurrent keys (8 clients is documented above and in
    // README; wall = n/qps): same information, ~50 chars back for the
    // per-query map.
    val sfName = new java.io.File(sfDir).getName
    // "best" = best-of-five-passes qps (named "qps_best" through round
    // 9's BENCH_r json; shortened for line budget).
    val line = s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"sf":"$sfName","concurrent":{"n":$nQueries,"qps":${f2(nQueries / concWall)},"best":${f2(nQueries / concWallBest)}}}"""
    spark.sparkContext.setLogLevel("ERROR")
    spark.stop()
    println(line)
    // Alarm threshold is 1650 (not the ~1800 hard budget): the warning
    // must fire while there is still headroom to fix the registry, not
    // when truncation is already imminent.
    if (line.length > 1650)
      System.err.println(s"[bench] WARNING: JSON line is ${line.length} chars (budget ~1800); shorten keys before adding queries")
  }
}
