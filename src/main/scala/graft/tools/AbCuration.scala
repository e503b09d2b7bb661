package graft.tools

import org.apache.spark.sql.functions._

/** Round-13 A/B evidence for the Curation experiments (not part of the
  * driver surface): interleaves OLD and NEW compositions inside one
  * warm session so host-load drift taints both sides equally.
  *
  * The dsir/oov "new" variants are the one-pass rewrites that were
  * tried and REVERTED this round (single corpus explode into a
  * (doc, flags, token, occ) table feeding both the count-table
  * re-aggregation and the scoring join; OOV floor derived in-plan) —
  * kept runnable here so the negative result stays reproducible.
  * The bloom pair A/Bs the contaminationBloom persist fix.
  * Usage: graft.tools.AbCuration <sfDir> [passes]
  */
object AbCuration {
  def main(args: Array[String]): Unit = {
    val sfDir  = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).map(_.toInt).getOrElse(5)
    val spark  = graft.Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val en   = col("lang") === "en"
    val half = pmod(col("doc_id"), lit(2)) === 0

    import graft.pipeline.{Curation, Dedup, TextAnalysis}
    def dsirOld() = Curation.dsirScoreWith(docs,
      Curation.dsirModel(Curation.dsirCounts(docs, en)))
    def dsirNew() = {
      val occT = docs.select(col("doc_id"), en.as("tgt"),
          explode(TextAnalysis.toks(col("text"))).as("token"))
        .groupBy("doc_id", "tgt", "token").agg(count(lit(1)).as("occ"))
      val cnt = occT.groupBy("token").agg(
        sum(col("occ")).as("cr"),
        sum(when(col("tgt"), col("occ")).otherwise(0L)).as("ct"))
      occT.join(broadcast(Curation.dsirModel(cnt)), "token")
        .groupBy("doc_id")
        .agg(sum(col("occ")).as("n_tokens"),
          sum(col("occ") * col("lr")).as("dsir_score"))
    }
    def oovOld() = {
      val cnt = Curation.dsirCounts(docs.filter(half), en)
      Curation.dsirScoreWith(docs, Curation.dsirModel(cnt),
        oovLr = Some(Curation.dsirOovFloor(cnt)))
    }
    def oovNew() = {
      val occT = docs.select(col("doc_id"), half.as("inm"), en.as("tgt"),
          explode(TextAnalysis.toks(col("text"))).as("token"))
        .groupBy("doc_id", "inm", "tgt", "token").agg(count(lit(1)).as("occ"))
      val cnt = occT.filter(col("inm")).groupBy("token").agg(
        sum(col("occ")).as("cr"),
        sum(when(col("tgt"), col("occ")).otherwise(0L)).as("ct"))
      val scale = lit(1000000.0)
      val floor = cnt
        .agg(sum(col("cr")).as("tr"), sum(col("ct")).as("tt"),
          count(lit(1)).as("v"))
        .select((round(log(lit(1.0) / (col("tt") + col("v")).cast("double")) * scale)
            .cast("bigint") -
          round(log(lit(1.0) / (col("tr") + col("v")).cast("double")) * scale)
            .cast("bigint")).as("oov_lr"))
      occT.join(broadcast(Curation.dsirModel(cnt)), Seq("token"), "left")
        .crossJoin(broadcast(floor))
        .groupBy("doc_id")
        .agg(sum(col("occ")).as("n_tokens"),
          sum(col("occ") * coalesce(col("lr"), col("oov_lr"))).as("dsir_score"))
    }
    // oovMid: keeps the old two-explode composition (the part the A/B
    // showed is fine) but derives the OOV floor IN-PLAN from the count
    // table instead of dsirOovFloor's eager driver action — which
    // executes the corpus-scale cnt subtree a THIRD time per invocation.
    def oovMid() = {
      val cnt = Curation.dsirCounts(docs.filter(half), en)
      val scale = lit(1000000.0)
      val floor = cnt
        .agg(sum(col("cr")).as("tr"), sum(col("ct")).as("tt"),
          count(lit(1)).as("v"))
        .select((round(log(lit(1.0) / (col("tt") + col("v")).cast("double")) * scale)
            .cast("bigint") -
          round(log(lit(1.0) / (col("tr") + col("v")).cast("double")) * scale)
            .cast("bigint")).as("oov_lr"))
      val occ = docs.select(col("doc_id"),
          explode(TextAnalysis.toks(col("text"))).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("occ"))
      occ.join(broadcast(Curation.dsirModel(cnt)), Seq("token"), "left")
        .crossJoin(broadcast(floor))
        .groupBy("doc_id")
        .agg(sum(col("occ")).as("n_tokens"),
          sum(col("occ") * coalesce(col("lr"), col("oov_lr"))).as("dsir_score"))
    }

    val corpus = docs.filter(col("doc_id") % 89 =!= 0)
    val evalD  = docs.filter(col("doc_id") % 89 === 0)
    // bloomOld = contaminationBloom WITHOUT the r13 persist of the
    // distinct eval-hash set across the sizing count + filter build.
    def bloomOld() = {
      val evalSh = Dedup.shingleHashes(evalD, 3).select("sh").distinct()
      val bf = evalSh.stat.bloomFilter("sh", math.max(evalSh.count(), 1L), 0.01)
      val bfB   = corpus.sparkSession.sparkContext.broadcast(bf)
      val might = udf((sh: Long) => bfB.value.mightContainLong(sh))
      val hits = Dedup.shingleHashes(corpus, 3)
        .filter(might(col("sh")))
        .join(evalSh, Seq("sh"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_contaminated"))
      corpus.select(col("doc_id"))
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
        .withColumn("verdict",
          when(col("n_contaminated") > 0, lit("contaminated")).otherwise(lit("clean")))
    }
    def bloomNew() = Curation.contaminationBloom(corpus, evalD)

    // mixOld = mixtureWeights with the pre-r13 eager total: the
    // corpus-scale per-source aggregation runs once for the collect and
    // again in the returned plan (separate executions, no reuse).
    def mixOld() = {
      val per = docs
        .groupBy(col("source").as("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(Dedup.toks(col("text"))).cast("long")).as("n_tokens"))
      val totalRow = per.agg(sum("n_tokens")).collect()(0)
      val total = if (totalRow.isNullAt(0)) 0L else totalRow.getLong(0)
      val weight =
        if (total == 0L) lit(0L) else expr(s"n_tokens * 1000L div ${total}L")
      per.withColumn("weight_permille", weight)
        .select(col("source"), col("n_docs"), col("n_tokens"), col("weight_permille"))
    }
    def mixNew() = Curation.mixtureWeights(docs, col("source"))
    // mixWin: ONE corpus aggregation; the total as an unpartitioned
    // window over the aggregated per-source rows (bounded by source
    // cardinality, the documented ≤small-row single-partition pattern).
    def mixWin() = {
      val per = docs
        .groupBy(col("source").as("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(Dedup.toks(col("text"))).cast("long")).as("n_tokens"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
      per.withColumn("tot", sum("n_tokens").over(w))
        .withColumn("weight_permille",
          when(col("tot").isNull || col("tot") === 0L, lit(0L))
            .otherwise(expr("n_tokens * 1000L div tot")))
        .select(col("source"), col("n_docs"), col("n_tokens"), col("weight_permille"))
    }

    val variants = Seq[(String, () => org.apache.spark.sql.DataFrame)](
      "dsir_old" -> (() => dsirOld()), "dsir_new" -> (() => dsirNew()),
      "oov_old" -> (() => oovOld()), "oov_new" -> (() => oovNew()),
      "oov_mid" -> (() => oovMid()),
      "bloom_old" -> (() => bloomOld()), "bloom_new" -> (() => bloomNew()),
      "mix_old" -> (() => mixOld()), "mix_new" -> (() => mixNew()),
      "mix_win" -> (() => mixWin()))
    // warm both sides once
    variants.foreach { case (_, f) => f().count() }
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
