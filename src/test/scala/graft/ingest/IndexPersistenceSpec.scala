package graft.ingest

import java.nio.file.Files

import graft.SparkSuite
import graft.api.QueryService
import graft.query.WikiSearchEngine

/** S7/S8 sink parity: the index persists as partitioned, sorted parquet
  * and answers queries identically after reload — the analogue of the
  * reference's bulk sorted-RFile load path
  * (`BufferingRFileRecordWriter.java:371-468`).
  */
class IndexPersistenceSpec extends SparkSuite {

  test("save → load → query round-trip") {
    val fixture = getClass.getResource("/enwiki-test.xml").getPath
    val dir     = Files.createTempDirectory("graft-index").toString
    val built   = IndexBuilder.fromArticles(spark, XmlIngest.readArticles(spark, fixture), 1)
    built.save(dir)

    val loaded = WikiIndex.load(spark, dir)
    val eng    = new WikiSearchEngine(spark, loaded)
    val ids = eng.run("TEXT == 'abacus'", Seq("enwiki"))
      .select("docId").collect().map(_.getString(0)).toSet
    assert(ids == Set("655"))

    // partition pruning survives: docs_fields written partitionBy(partition)
    assert(new java.io.File(s"$dir/docs_fields/partition=0").exists())

    // the reverse index persists sorted-by-reversed-value (suffix probes
    // push to the scan) and answers leading-wildcard queries after reload
    assert(new java.io.File(s"$dir/reverse_index").exists())
    val suffix = eng.run("TITLE =~ '.*alt'", Seq("enwiki"))
      .select("docId").collect().map(_.getString(0)).toSet
    assert(suffix == Set("657"))
  }

  test("metadata carries per-field frequency rows (reference 'f' colfam)") {
    import org.apache.spark.sql.functions._
    val fixture = getClass.getResource("/enwiki-test.xml").getPath
    val ix = IndexBuilder.fromArticles(spark, XmlIngest.readArticles(spark, fixture), 1)
    val freq = ix.metadata.filter(col("kind") === "f")
      .groupBy("fieldName").agg(sum("frequency").as("f"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(freq("TITLE") == 4L) // one title per article
    assert(freq("ID") == 4L)
    assert(freq("TEXT") > 10L) // distinct-token occurrences across the 4 docs
    // i/e rows are untouched (engine reads them with kind filters)
    assert(ix.metadata.filter(col("kind") === "i" && col("frequency").isNotNull).count() == 0)
  }

  test("synonyms persist as index state: save → fresh load rehydrates, explicit config wins, plain stores unaffected") {
    import spark.implicits._
    import graft.query.{EngineConfig, WikiSearchEngine}
    val docs = Seq(
      (1L, "the car is fast", "en", "s", 15L),
      (2L, "an auto appeared", "en", "s", 16L),
      (3L, "one automobile here", "en", "s", 19L),
      (4L, "a bicycle instead", "en", "s", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val ix = IndexBuilder.fromDocumentsTable(spark, docs, numPartitions = 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-syn-persist").toString
    ix.withSynonyms(Map("car" -> Seq("auto", "automobile"))).save(dir)

    // a fresh load with the DEFAULT config serves the expanded
    // semantics — the table came from the store, not the session
    val loaded = WikiIndex.load(spark, dir)
    assert(loaded.storedSynonyms.isDefined)
    val eng = new WikiSearchEngine(spark, loaded)
    def ids(e: WikiSearchEngine, q: String) =
      e.run(q).select("docId").collect().map(_.getString(0)).toSet
    assert(ids(eng, "TEXT == 'car'") == Set("1", "2", "3"))
    assert(ids(eng, "TEXT == 'auto'") == Set("2"))

    // an EXPLICIT session table overrides the stored one
    val overridden = new WikiSearchEngine(spark, loaded,
      EngineConfig(synonyms = Map("car" -> Seq("bicycle"))))
    assert(ids(overridden, "TEXT == 'car'") == Set("1", "4"))

    // a store saved WITHOUT synonyms keeps unexpanded semantics
    val plainDir = java.nio.file.Files.createTempDirectory("graft-syn-plain").toString
    ix.save(plainDir)
    val plain = WikiIndex.load(spark, plainDir)
    assert(plain.storedSynonyms.isEmpty)
    assert(ids(new WikiSearchEngine(spark, plain), "TEXT == 'car'") == Set("1"))
  }

  test("QueryService shapes Results with XML/JSON rendering") {
    val fixture = getClass.getResource("/enwiki-test.xml").getPath
    val ix  = IndexBuilder.fromArticles(spark, XmlIngest.readArticles(spark, fixture), 1)
    val svc = new QueryService(new WikiSearchEngine(spark, ix))

    val res = svc.query("TITLE == 'abacus'", Seq("enwiki"))
    assert(res.documents.size == 1)
    val doc = res.documents.head
    assert(doc.id == "655")
    assert(doc.pointer == "DOCUMENT:0/enwiki/655")
    assert(doc.fields.exists(f => f.name == "TITLE" && f.value == "Abacus"))

    val xml = res.toXml
    assert(xml.startsWith("<results><document id=\"655\">"))
    assert(xml.contains("<field name=\"TITLE\">Abacus</field>"))
    val json = res.toJson
    assert(json.contains("\"id\":\"655\""))
    val yaml = res.toYaml
    assert(yaml.contains("- id: '655'") && yaml.contains("value: 'Abacus'"))
    val html = res.toHtml
    assert(html.contains("<th>TITLE</th>") && html.contains("<td>Abacus</td>"))

    assert(svc.content("DOCUMENT:0/enwiki/655").exists(_.contains("calculating tool")))
    assert(svc.content("DOCUMENT:0/enwiki/999").isEmpty)
  }
}
