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
