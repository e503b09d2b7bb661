package graft.tools
import graft._
object DebugRun {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = Sessions.builder("local[8]").config("spark.sql.shuffle.partitions", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { name =>
      try {
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        println(s"OK $name rows=$n")
      } catch { case e: Throwable =>
        // String.valueOf: NPE and friends often carry a null message, and
        // a null-deref here would mask the original failure in this tool
        println(s"FAIL $name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}")
      }
    }
    spark.stop()
  }
}
