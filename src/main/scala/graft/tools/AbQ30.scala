package graft.tools

import org.apache.spark.sql.functions._

/** Round-13 A/B evidence for the q30 bucketing change (not part of the
  * driver surface): interleaves the OLD three-pass shape (eager min/max
  * pre-pass deriving an even bucket width W, then the histogram, then
  * the bracket rank) against the NEW two-pass registry shape (data-
  * independent sortable-bits bucketing — no pre-pass) inside one warm
  * session, so host-load drift taints both sides equally. Also asserts
  * the two produce identical rows each pass — the exactness claim is
  * re-proved at whatever scale the A/B runs, not just at the oracle SF.
  * Usage: graft.tools.AbQ30 <sfDir> [passes]
  */
object AbQ30 {
  def main(args: Array[String]): Unit = {
    val sfDir  = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).map(_.toInt).getOrElse(5)
    val spark  = graft.Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window

    // OLD: verbatim pre-r13 q30 body (min/max pre-pass + floor(v/W)).
    def q30Old() = {
      val base = graft.Tables.load(spark, sfDir, "lineitem")
        .select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"))
      val bounds = base.agg(min(col("v")), max(col("v"))).collect().head
      val width =
        if (bounds.isNullAt(0)) 1.0
        else math.max((bounds.getDouble(1) - bounds.getDouble(0)) / 4096.0,
          1e-6)
      val bucketed = base.withColumn("b", floor(col("v") / lit(width)).cast("long"))
      val hist = bucketed.groupBy("g", "b").agg(count(lit(1)).as("cnt"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val tbs = hist.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
        val sorted = rows.sortBy(_._2)
        val cumEnd = sorted.scanLeft(0L)(_ + _._3).tail
        val n = cumEnd.last
        Seq(250L, 500L, 750L).flatMap { p =>
          val lo   = (p * (n - 1)) / 1000 + 1
          val frac = (p * (n - 1)) % 1000
          Seq(lo, lo + 1).filter(rn => rn >= 1 && rn <= n).map { rn =>
            val i = cumEnd.indexWhere(_ >= rn)
            (g, p, lo, frac, rn, sorted(i)._2, if (i == 0) 0L else cumEnd(i - 1))
          }
        }
      }
      val tbDf = spark.createDataFrame(tbs.map(t => (t._1, t._2, t._3, t._4, t._5)))
        .toDF("g", "p", "lo", "frac", "rn")
      val needed = spark.createDataFrame(tbs.map(t => (t._1, t._6, t._7)).distinct)
        .toDF("g", "b", "cumBefore")
      val ranked = bucketed.join(broadcast(needed), Seq("g", "b"))
        .withColumn("rn", col("cumBefore") +
          row_number().over(Window.partitionBy("g", "b").orderBy("v")))
      ranked.join(broadcast(tbDf), Seq("g", "rn"))
        .groupBy("g", "p")
        .agg(
          min(when(col("rn") === col("lo"), col("v"))).as("v_lo"),
          min(when(col("rn") === col("lo") + 1, col("v"))).as("v_hi"),
          min(col("frac")).as("frac"))
        .select(col("g").as("returnflag"), col("p"),
          round(col("v_lo") +
            (coalesce(col("v_hi"), col("v_lo")) - col("v_lo")) * col("frac") / lit(1000.0), 4)
            .as("qc"))
        .orderBy("returnflag", "p")
    }
    def q30New() = graft.SparkEntry.queries("q30_quantile_cont")(spark, sfDir)

    val variants = Seq[(String, () => org.apache.spark.sql.DataFrame)](
      "q30_old" -> (() => q30Old()), "q30_new" -> (() => q30New()))
    // equal-rows gate first (also warms both sides)
    val oldRows = q30Old().collect().toSeq
    val newRows = q30New().collect().toSeq
    require(oldRows == newRows,
      s"q30 old/new rows differ:\nold=$oldRows\nnew=$newRows")
    println(s"rows identical (${newRows.size})")
    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    for (p <- 1 to passes; (n, f) <- variants) {
      val t0 = System.nanoTime()
      f().count()
      val s = (System.nanoTime() - t0) / 1e9
      acc(n) = s :: acc(n)
      println(f"pass$p $n $s%.2f s")
    }
    for ((n, _) <- variants) {
      val xs = acc(n).sorted
      println(f"MEDIAN $n ${xs(xs.size / 2)}%.3f s  (min ${xs.head}%.3f)")
    }
    spark.stop()
  }
}
