package graft.tools

import java.nio.file.{Files, Paths}

/** Round-12 optimization evidence: dump `.explain("formatted")` for the
  * named registry queries to `<outDir>/<query>_<suffix>.txt` — the
  * before/after plan files the optimization report cites. Usage:
  *   graft.tools.DumpPlans <sfDir> <outDir> <suffix> <query>[,<query>...]
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val sfDir  = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names  = args(3).split(",").toSeq
    val spark  = graft.Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${n}_$suffix.txt"), plan)
      println(s"wrote $outDir/${n}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
