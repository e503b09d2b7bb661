package graft.tools

/** Diagnostic: three interleaved passes over the named registry queries
  * (the bench's pass structure, minus the rest of the registry) —
  * separates cold/build cost (pass 1) from warm serving cost (passes
  * 2-3), which ProfileQuery's single warm run conflates with session
  * state. Usage: `TripleRun <sfDir> <query...>`.
  */
object TripleRun {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val spark = graft.Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (pass <- 1 to 3; name <- names) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"pass$pass $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
