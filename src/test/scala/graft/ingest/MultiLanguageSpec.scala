package graft.ingest

import graft.SparkSuite
import graft.query.WikiSearchEngine

import org.apache.spark.sql.functions._

/** Multi-language corpus: languages come from file names (S6), auths
  * select languages at query time (P7/P11 — the reference's cell-level
  * visibility), and diacritic titles normalize per language uniformly.
  */
class MultiLanguageSpec extends SparkSuite {

  private lazy val engine: WikiSearchEngine = {
    val en = getClass.getResource("/enwiki-test.xml").getPath
    val es = getClass.getResource("/eswiki-test.xml").getPath
    val articles = XmlIngest.readArticles(spark, en)
      .unionByName(XmlIngest.readArticles(spark, es))
    new WikiSearchEngine(spark, IndexBuilder.fromArticles(spark, articles, 2).cacheAll())
  }

  private def ids(q: String, auths: Seq[String]): Set[String] =
    engine.run(q, auths).select("docId").collect().map(_.getString(0)).toSet

  test("languages are derived from file names") {
    val langs = engine.run("ID >= 0 and ID <= 10000")
      .select("language").distinct().collect().map(_.getString(0)).toSet
    assert(langs == Set("enwiki", "eswiki"))
  }

  test("auths partition the corpus by language") {
    assert(ids("TEXT == 'abaco'", Seq("eswiki")) == Set("900"))
    assert(ids("TEXT == 'abaco'", Seq("enwiki")).isEmpty)
    assert(ids("TEXT == 'abacus'", Seq("enwiki")) == Set("655"))
    // both auths: each language's own term matches only its docs
    assert(ids("TEXT == 'abacus' or TEXT == 'abaco'", Seq("enwiki", "eswiki")) ==
      Set("655", "900"))
  }

  test("diacritic title normalizes for the index in all languages") {
    assert(ids("TITLE == 'Ábaco'", Seq("eswiki")) == Set("900"))
    assert(ids("TITLE == 'acido'", Seq("eswiki")) == Set("901"))
  }

  test("accented body words tokenize whole and match under either form") {
    // 'cálculo' must not be shredded by the tokenizer; both the accented
    // and the stripped query literal find it
    assert(ids("TEXT == 'cálculo'", Seq("eswiki")) == Set("900"))
    assert(ids("TEXT == 'calculo'", Seq("eswiki")) == Set("900"))
  }

  test("unfielded bare term with diacritics resolves via normalized forms") {
    assert(ids("'Ábaco'", Seq("eswiki")) == Set("900"))
  }

  test("salted index build is exactly equivalent to the single-phase build") {
    val rows = engine
      .run("ID >= 0 and ID <= 10000", Seq("enwiki", "eswiki")) // warm path; reuse articles
    // build both index variants from the same posting rows
    val en = getClass.getResource("/enwiki-test.xml").getPath
    val arts = XmlIngest.readArticles(spark, en)
    val base = arts.toDF
      .withColumn("partition", pmod(col("id"), lit(2)).cast("int"))
      .select(col("partition"), col("language"), col("id").cast("string").as("docId"),
        explode(graft.functions.TextFunctions.tokenize(col("text"))).as("fieldValue"))
      .withColumn("fieldName", lit("TEXT"))
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("fieldValue"), col("fieldName"), col("partition"), col("language"),
        col("count"), array_sort(col("uids")).as("uids"), col("ignore"))
      .collect().map(_.toString).sorted.toSeq
    val plain  = canon(IndexBuilder.buildGlobalIndex(base))
    val salted = canon(IndexBuilder.buildGlobalIndexSalted(base, salts = 7))
    assert(plain == salted)
    assert(rows.count() >= 6)
  }
}
