package graft.query

import graft.SparkSuite
import graft.functions.TextFunctions
import graft.ingest.{IndexBuilder, XmlIngest}

import org.apache.spark.sql.functions._

/** The trigram-accelerated opaque-regex access path: conservative
  * required-gram extraction, probe/verify soundness (index path ≡ scan
  * path), empty-expansion emptiness proof, plan-time caching, and
  * exactness under unevaluated fields.
  */
class TrigramRegexSpec extends SparkSuite {

  private lazy val fixture =
    getClass.getResource("/enwiki-test.xml").getPath

  private lazy val engine: WikiSearchEngine = {
    val articles = XmlIngest.readArticles(spark, fixture)
    val ix = IndexBuilder.fromArticles(spark, articles, numPartitions = 1).cacheAll()
    new WikiSearchEngine(spark, ix)
  }

  private def docIds(e: WikiSearchEngine, q: String): Set[String] =
    e.run(q, Seq("enwiki")).select("docId").collect().map(_.getString(0)).toSet

  // ---- requiredGrams ------------------------------------------------------

  test("requiredGrams extracts trigrams of mandatory literal runs") {
    assert(WikiSearchEngine.requiredGrams(".*bacu.*") == Some(Seq("bac", "acu")))
    assert(WikiSearchEngine.requiredGrams("abc.*defg") ==
      Some(Seq("abc", "def", "efg")))
    assert(WikiSearchEngine.requiredGrams("abc.?xyz") == Some(Seq("abc", "xyz")))
    // escaped metachar is a mandatory literal char
    assert(WikiSearchEngine.requiredGrams("a\\.bcd") ==
      Some(Seq("a.b", ".bc", "bcd")))
  }

  test("requiredGrams bails on runs shorter than 3 and unmodeled constructs") {
    assert(WikiSearchEngine.requiredGrams("c.l.mn").isEmpty)        // runs of 1-2
    assert(WikiSearchEngine.requiredGrams("ab[cd]ef").isEmpty)      // class
    assert(WikiSearchEngine.requiredGrams(".*(?:olu).*").isEmpty)   // group
    assert(WikiSearchEngine.requiredGrams("abc|def").isEmpty)       // alternation
    assert(WikiSearchEngine.requiredGrams("abc+def").isEmpty)       // quantified literal
    assert(WikiSearchEngine.requiredGrams("abc{2}d").isEmpty)       // counted quantifier
    assert(WikiSearchEngine.requiredGrams("\\d+abc").isEmpty)       // class shorthand
    assert(WikiSearchEngine.requiredGrams("abcd\\").isEmpty)        // dangling escape
  }

  test("charTrigrams column fn: distinct sliding trigrams, empty under len 3") {
    import spark.implicits._
    val out = Seq("column", "ab", "aaaa", "abc").toDF("s")
      .select(TextFunctions.charTrigrams(col("s")).as("g"))
      .collect().map(_.getSeq[String](0).toList)
    assert(out(0) == List("col", "olu", "lum", "umn"))
    assert(out(1) == Nil)
    assert(out(2) == List("aaa")) // distinct
    assert(out(3) == List("abc"))
  }

  // ---- access path --------------------------------------------------------

  test("infix regex with extractable grams becomes index-answerable") {
    assert(engine.indexAnswerable("TEXT =~ '.*bacu.*'"))
    assert(!engine.indexAnswerable("TEXT =~ 'c.l.mn'")) // short runs: scan path
    val ex = engine.explainAccess("TEXT =~ '.*bacu.*'")
    assert(ex.contains("INDEX PATH"), ex)
    assert(ex.contains("EQ TEXT"), ex) // planned as a multi-form EQ leaf
  }

  test("index path matches the full-scan residual on the same semantics") {
    // the grouped form defeats gram extraction but matches identically,
    // so it exercises the scan path as the oracle
    val viaIndex = docIds(engine, "TEXT =~ '.*bacu.*'")
    val viaScan  = docIds(engine, "TEXT =~ '.*(?:bacu).*'")
    assert(viaIndex.nonEmpty)
    assert(viaIndex == viaScan)
  }

  test("composes under AND with other leaves") {
    val both = docIds(engine, "TITLE == 'abacus' and TEXT =~ '.*bacu.*'")
    assert(both == Set("655"))
    val none = docIds(engine, "TITLE == 'acid' and TEXT =~ '.*bacu.*'")
    assert(none.isEmpty)
  }

  test("empty expansion is proof of emptiness (EmptyLeaf, zero rows)") {
    assert(docIds(engine, "TEXT =~ '.*zzzqqqxyz.*'").isEmpty)
    // still index-answerable: the EMPTY leaf is part of the plan tree
    assert(engine.indexAnswerable("TEXT =~ '.*zzzqqqxyz.*'"))
  }

  test("hot opaque regexes plan from the trigram cache with no new probe job") {
    val q = "TEXT =~ '.*rithmeti.*'"
    val r1 = docIds(engine, q)
    val runsAfterCold = engine.trigramProbeRuns.get()
    val r2 = docIds(engine, q)
    assert(r1 == r2)
    assert(engine.trigramProbeRuns.get() == runsAfterCold)
  }

  test("over-cap expansion falls back to the scan path") {
    val articles = XmlIngest.readArticles(spark, fixture)
    val ix = IndexBuilder.fromArticles(spark, articles, numPartitions = 1)
    // cap 0: ANY non-empty expansion exceeds the cap → scan fallback
    val capped = new WikiSearchEngine(spark, ix, EngineConfig(regexExpandMax = 0))
    assert(!capped.indexAnswerable("TEXT =~ '.*bacu.*'"))
    // semantics unchanged: scan fallback equals the uncapped index path
    assert(docIds(capped, "TEXT =~ '.*bacu.*'")
      == docIds(engine, "TEXT =~ '.*bacu.*'"))
  }

  test("unevaluated TEXT: gram-extractable infix regex stays exact") {
    val articles = XmlIngest.readArticles(spark, fixture)
    val ix = IndexBuilder.fromArticles(spark, articles, numPartitions = 1)
    val uneval =
      new WikiSearchEngine(spark, ix, EngineConfig(unevaluatedFields = Set("TEXT")))
    // index-enforced: same docs as the evaluated engine
    assert(docIds(uneval, "TEXT =~ '.*bacu.*'") == docIds(engine, "TEXT =~ '.*bacu.*'"))
    assert(docIds(uneval, "TITLE == 'acid' and TEXT =~ '.*bacu.*'").isEmpty)
  }
}
