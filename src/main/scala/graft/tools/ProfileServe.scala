package graft.tools

import graft.Sessions

/** Serving-path profiler (not part of the driver surface): replays the
  * Bench concurrent workload under config variations to attribute warm
  * per-query latency (driver planning/codegen vs executor work) before
  * touching the engine. Uses `SearchQueries.engineOn` so the knobs
  * actually reach the engine's session — the production `engine` path
  * pins its own serving conf (AQE off) and would ignore them. Defaults
  * mirror the production serving conf. Usage:
  *   graft.tools.ProfileServe <sfDir> [aqe=false] [fair=false] [shuf=32]
  */
object ProfileServe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val opts  = args.drop(1).map(_.split("=")).collect { case Array(k, v) => k -> v }.toMap
    val aqe   = opts.getOrElse("aqe", "false")
    val fair  = opts.getOrElse("fair", "false") == "true"
    val shuf  = opts.getOrElse("shuf", "32")
    val b = Sessions.builder()
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.shuffle.partitions", shuf)
    val spark = (if (fair) b.config("spark.scheduler.mode", "FAIR") else b).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ix  = graft.search.SearchQueries.index(spark, sfDir)
    val eng = graft.search.SearchQueries.engineOn(spark, sfDir)
    val n   = 40
    val workload = graft.Bench.concurrentWorkload(ix, n) // the benchmarked workload, verbatim

    // warm once
    workload.foreach(q => eng.run(q).count())

    // sequential warm latency distribution + job counts
    val sc = spark.sparkContext
    if (opts.getOrElse("jobs", "false") == "true") {
      // attribute the warm per-query jobs: run ONE query, print each
      // job's description + stage names as the scheduler sees them
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val desc = Option(j.properties)
            .map(_.getProperty("spark.job.description", "")).getOrElse("")
          seen.add(s"job ${j.jobId}: stages=${j.stageInfos.map(_.name).mkString(" | ")} desc=$desc")
        }
      }
      sc.addSparkListener(l)
      eng.run(workload.head).count()
      Thread.sleep(500)
      sc.removeSparkListener(l)
      seen.forEach(s => println(s"  $s"))
    }
    val jobs0 = sc.statusTracker.getJobIdsForGroup(null).length
    val lat = workload.map { q =>
      val t0 = System.nanoTime(); eng.run(q).count(); (System.nanoTime() - t0) / 1e6
    }.sorted
    val jobs1 = sc.statusTracker.getJobIdsForGroup(null).length
    println(f"seq warm: p50=${lat(lat.size / 2)}%.1f ms p90=${lat(lat.size * 9 / 10)}%.1f ms " +
      f"mean=${lat.sum / lat.size}%.1f ms jobs/query=${(jobs1 - jobs0).toDouble / n}%.2f")

    // concurrent warm (3 passes, median)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec = scala.concurrent.ExecutionContext.fromExecutor(pool)
    def runAll(): Double = {
      val t0 = System.nanoTime()
      val fs = workload.map(q => scala.concurrent.Future(eng.run(q).count()))
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(fs), scala.concurrent.duration.Duration.Inf)
      (System.nanoTime() - t0) / 1e9
    }
    val walls = (1 to 3).map(_ => runAll()).sorted
    println(f"concurrent: walls=${walls.map(w => f"$w%.2f").mkString(",")} " +
      f"median qps=${n / walls(1)}%.1f")
    pool.shutdown()
    spark.stop()
  }
}
