package graft

/** Library-surface demo/smoke: runs the flagship engine path on sf0.001,
  * prints results + the physical plan, and exercises the error surfaces
  * (parse failure, all-negation rejection). `sbt "runMain graft.Demo"`.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val eng = search.SearchQueries.engine(spark, dir)

    println("== flagship: TEXT == 'spark' and (TEXT == 'join' or TEXT == 'vector')")
    val df = eng.run("TEXT == 'spark' and (TEXT == 'join' or TEXT == 'vector')")
    println(s"rows: ${df.count()}")
    df.select("docId", "language", "DOCUMENT").show(5, truncate = false)

    println("== access path (engine-level explain)")
    println(eng.explainAccess("TEXT == 'spark' and (TEXT == 'join' or TEXT == 'vector')"))

    println("== physical plan (formatted)")
    df.explain("formatted")

    println("== content fetch: DOCUMENT:0/es/0 (doc 0, partition 0%8, lang es)")
    eng.content("DOCUMENT:0/es/0").show(1, truncate = 60)

    println("== probe: malformed query")
    try eng.run("TEXT == == 'x'")
    catch { case e: Exception => println(s"rejected: ${e.getClass.getSimpleName}: ${e.getMessage}") }

    println("== probe: all-negation query")
    try eng.run("TEXT != 'spark'")
    catch { case e: Exception => println(s"rejected: ${e.getClass.getSimpleName}: ${e.getMessage}") }

    println("== probe: unknown field")
    val unknown = eng.run("NOSUCHFIELD == 'x'")
    println(s"unknown-field rows: ${unknown.count()} (full scan, residual false)")

    println("== wikipedia path: fixture XML → index → query (native normalizer)")
    val fixture = Option(getClass.getResource("/enwiki-test.xml")).map(_.getPath)
      .orElse(Some("src/test/resources/enwiki-test.xml")
        .filter(p => new java.io.File(p).exists()))
    if (fixture.isDefined) {
      val arts = ingest.XmlIngest.readArticles(spark, fixture.get)
      val wIx  = ingest.IndexBuilder.fromArticles(spark, arts, numPartitions = 1)
      val wEng = new query.WikiSearchEngine(spark, wIx)
      val svc  = new api.QueryService(wEng)
      val res  = svc.query("TITLE == 'Ábacus' or TEXT == 'abacus'", Seq("enwiki"))
      println(s"wiki results: ${res.documents.size} doc(s)")
      println(res.toXml.take(200))
      println(res.toYaml.linesIterator.take(6).mkString("\n"))
      println(res.toHtml.take(160))
    } else println("fixture not found (run from the repo root)")

    // LLM-pipeline surface, one line each: near-dup canonical selection,
    // graded decontamination, and the ANN quality dial.
    println("== pipeline: keep-best dedup / graded decontamination / ANN recall")
    import org.apache.spark.sql.functions.col
    val docs = Tables.load(spark, dir, "documents")
    val kb = pipeline.Dedup.dedupClustersKeepBest(docs,
      pipeline.Dedup.jaccardPairs(docs, n = 3, tau = 0.1, dfCap = 200), "n_chars")
    println(s"keep-best verdicts: ${kb.filter(col("verdict") === "drop").count()} " +
      s"near-dup doc(s) dropped of ${docs.count()}")
    val ov = pipeline.Curation.overlapFraction(
      docs.filter(col("doc_id") % 97 =!= 0), docs.filter(col("doc_id") % 97 === 0))
    ov.orderBy(col("overlap_permille").desc, col("doc_id")).show(3, truncate = false)
    val emb = Tables.load(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val ivf = pipeline.Similarity.buildIvf(emb, persist = false)
    val rec = pipeline.Similarity.recallAtK(
      pipeline.Similarity.ivfTopKWith(ivf, queries, k = 5),
      pipeline.Similarity.topK(emb, queries, k = 5), k = 5)
    println("IVF nprobe=4 recall@5 per query (permille):")
    rec.orderBy("query_id").show(5, truncate = false)

    // Serving edge: live analytics stores behind the HTTP shim — a CMS
    // store over events and an ANN store over the embeddings, served on
    // an ephemeral port with store-level auth; eyeball 200s, the 403,
    // and the liveOnly 400.
    println("== serving edge: /sketch/cms + /ann over live stores (auth-gated)")
    val tmp = java.nio.file.Files.createTempDirectory("graft-demo-stores").toString
    val cm = new streaming.LiveSketchMaintainer(spark, s"$tmp/cms")
    cm.processBatch(Tables.load(spark, dir, "events").select("user_id"), 0L)
    val am = new streaming.LiveAnnMaintainer(spark, s"$tmp/ann")
    am.processBatch(emb.select("vec_id", "embedding"), 0L)
    val shim = new api.HttpShim(
      new api.QueryService(eng),
      analytics = new api.AnalyticsService(cms = Some(cm), ann = Some(am),
        requiredAuth = Some("metrics"))).start()
    def get(path: String): (Int, String) = {
      val c = java.net.URI.create(s"http://127.0.0.1:${shim.boundPort}$path")
        .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
      val st = c.getResponseCode
      val in = if (st < 400) c.getInputStream else c.getErrorStream
      (st, new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
    }
    val (cs, cb) = get("/sketch/cms?key=7&auths=metrics")
    println(s"GET /sketch/cms?key=7 -> $cs $cb")
    val (as_, ab) = get("/ann?id=0&k=3&auths=metrics")
    println(s"GET /ann?id=0&k=3 -> $as_ ${ab.take(120)}")
    val (fs, fb) = get("/sketch/cms?key=7") // no auth → 403
    println(s"GET /sketch/cms (no auth) -> $fs ${fb.take(60)}")
    val (ls, lb) = get("/ann?id=0&asOf=0&auths=metrics") // latest-only → 400
    println(s"GET /ann?asOf=0 -> $ls ${lb.take(80)}")
    shim.stop()

    spark.stop()
  }
}
