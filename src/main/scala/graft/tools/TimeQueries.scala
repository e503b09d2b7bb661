package graft.tools

import graft.Sessions

/** Targeted per-query timing (not part of the driver surface): runs the
  * named registry queries `reps` times each, interleaved across full
  * passes like graft.Bench, and prints per-query min/median — for
  * profiling one operator without paying a full bench invocation.
  * Usage:
  *   graft.tools.TimeQueries <sfDir> <query>[,<query>...] [reps=3]
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("dd_ngram_jaccard", "dd_cluster"))
    val reps = args.lift(2).map(_.stripPrefix("reps=").toInt).getOrElse(3)
    // session defaults only (shuffle partitions track SPARK_GRAFT_CPUS),
    // so timings here are comparable to graft.Bench on the same host
    val spark = Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fns = names.map(n => n -> graft.SparkEntry.queries(n)).toMap
    // one untimed warm pass (codegen + parquet footers), then interleaved reps
    names.foreach(n => fns(n)(spark, sfDir).count())
    val times = (1 to reps).map { _ =>
      names.map { n =>
        val t0 = System.nanoTime()
        fns(n)(spark, sfDir).count()
        n -> (System.nanoTime() - t0) / 1e9
      }.toMap
    }
    names.foreach { n =>
      val runs = times.map(_(n)).sorted
      println(f"$n%-28s min=${runs.head}%.3f median=${runs(runs.size / 2)}%.3f")
    }
    spark.stop()
  }
}
