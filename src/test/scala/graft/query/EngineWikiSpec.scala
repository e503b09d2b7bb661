package graft.query

import graft.SparkSuite
import graft.ingest.{Article, IndexBuilder, XmlIngest}

/** End-to-end: MediaWiki XML fixture → index build → queries. Mirrors the
  * reference's own E2E expectations
  * (`query/src/test/hadoop2/.../logic/TestQueryLogic.java:456-475`,
  * FIXTURES.md §2): the 4-title OR returns 4 documents, `TEXT ==
  * 'abacus'` returns exactly doc 655 — plus coverage for every §4.1
  * planner rule (wildcards, ranges, negation, functions, bare terms,
  * auths).
  */
class EngineWikiSpec extends SparkSuite {

  private lazy val fixture =
    getClass.getResource("/enwiki-test.xml").getPath

  private lazy val engine: WikiSearchEngine = {
    val articles = XmlIngest.readArticles(spark, fixture)
    val ix = IndexBuilder.fromArticles(spark, articles, numPartitions = 1).cacheAll()
    new WikiSearchEngine(spark, ix)
  }

  private def docIds(q: String, auths: Seq[String] = Seq("enwiki")): Set[String] =
    engine.run(q, auths).select("docId").collect().map(_.getString(0)).toSet

  test("ingest extracts 4 articles with language from filename") {
    val arts = XmlIngest.readArticles(spark, fixture).collect()
    assert(arts.length == 4)
    assert(arts.map(_.language).toSet == Set("enwiki"))
    assert(arts.map(_.id).sorted.toSeq == Seq(655, 656, 657, 658))
    assert(arts.forall(_.timestamp == 1014651791000L)) // 2002-02-25T15:43:11Z
  }

  test("explainAccess renders the access path without executing the query") {
    val ex = engine.explainAccess("TITLE == 'abacus' and TEXT == 'abacus' and TEXT != 'assessment'")
    assert(ex.contains("INDEX PATH") && ex.contains("AND"))
    assert(ex.contains("EQ TITLE") && ex.contains("EQ TEXT"))
    assert(ex.contains("NOT TEXT"))
    assert(ex.contains("DRIVER-LOCAL")) // exact postings → broadcast candidates
    val full = engine.explainAccess("COMMENTS =~ '.*mid.*wildcard.*'")
    assert(full.startsWith("FULL SCAN"))
    val rej = engine.explainAccess("TEXT != 'abacus'")
    assert(rej.startsWith("REJECTED"))
    // scan-leaf cardinalities are collected even when no AND decision
    // needs them (regression: lone wildcard queries reported card=0)
    val pre = engine.explainAccess("TITLE =~ 'a.*'")
    val cardRe = """RANGE/WILDCARD index scan card=(\d+)""".r
    val card = cardRe.findFirstMatchIn(pre).map(_.group(1).toLong)
    assert(card.exists(_ > 0), s"expected positive scan card in: $pre")
  }

  test("reference E2E #1: OR of four titles returns 4 documents") {
    val q = "TITLE == 'asphalt' or TITLE == 'abacus' or TITLE == 'acid' or TITLE == 'acronym'"
    assert(docIds(q) == Set("655", "656", "657", "658"))
  }

  test("reference E2E #2: TEXT == 'abacus' returns exactly doc 655") {
    assert(docIds("TEXT == 'abacus'") == Set("655"))
  }

  test("title normalization: query literal is lowercased against the index") {
    assert(docIds("TITLE == 'Abacus'") == Set("655"))
  }

  test("auths restrict by language") {
    assert(docIds("TEXT == 'abacus'", Seq("eswiki")).isEmpty)
  }

  test("AND intersection across fields") {
    assert(docIds("TITLE == 'acid' and TEXT == 'proton'") == Set("656"))
    assert(docIds("TITLE == 'acid' and TEXT == 'petroleum'").isEmpty)
  }

  test("negation: AND with absence term") {
    // all docs whose TEXT has 'a' minus those containing 'abacus'
    val q = "TEXT == 'is' and TEXT != 'abacus'"
    assert(docIds(q) == Set("656", "657", "658"))
  }

  test("all-negation query rejected") {
    intercept[IllegalArgumentException](engine.run("TEXT != 'abacus'"))
  }

  test("trailing wildcard uses forward index prefix") {
    assert(docIds("TITLE =~ 'ac.*'") == Set("656", "658"))
  }

  test("leading wildcard uses reverse index") {
    assert(docIds("TITLE =~ '.*alt'") == Set("657"))
  }

  test("opaque regex falls back to scan and still answers") {
    assert(docIds("TITLE =~ 'a.id'") == Set("656"))
  }

  test("bounded numeric range fused onto the index") {
    assert(docIds("ID >= 656 and ID <= 657") == Set("656", "657"))
  }

  test("f:between function term") {
    assert(docIds("f:between(ID, 655, 656)") == Set("655", "656"))
  }

  test("unfielded bare term resolves fields via the index") {
    assert(docIds("'abacus'") == Set("655"))
    assert(docIds("'nonexistentterm'").isEmpty)
  }

  test("document content fetch round-trips") {
    val row = engine.content("DOCUMENT:0/enwiki/655").collect()
    assert(row.length == 1)
    assert(row.head.getAs[String]("DOCUMENT").contains("calculating tool"))
  }

  test("results carry the DOCUMENT pointer field") {
    val rows = engine.run("TEXT == 'abacus'", Seq("enwiki")).collect()
    assert(rows.head.getAs[String]("DOCUMENT") == "DOCUMENT:0/enwiki/655")
  }

  test("multi-normalizer OR-expansion: diacritic query literal hits via the Lc form") {
    // TITLE carries both NoOp and Lc normalizers; the literal 'Ábacus'
    // expands to {'Ábacus' (NoOp), 'abacus' (Lc)} — the Lc form matches
    // the indexed title (FieldIndexQueryReWriter.orNormalizedTerms:460+)
    assert(docIds("TITLE == 'Ábacus'") == Set("655"))
    // exact raw-cased form also hits (NoOp rows are indexed where the
    // raw title differs from its normalization)
    assert(docIds("TITLE == 'Abacus'") == Set("655"))
  }

  test("range scan ignores raw-form index rows (canonical-row restriction)") {
    import spark.implicits._
    // Raw title 'Ábacus' (Á = U+00C1 > 'z') sits lexicographically
    // inside ['z','þ'] while its normalized form 'abacus' is below the
    // low bound. Exact index rows bypass fi verification, so under
    // unevaluatedFields (residual compiles TITLE terms to TRUE) the raw
    // NoOp row would leak the doc without the canonical-row restriction.
    val arts = Seq(
      Article(2001, "Ábacus", 1L, "c", "alpha words", "enwiki"),
      Article(2002, "zebra crossing", 1L, "c", "beta words", "enwiki")).toDS()
    val ix  = IndexBuilder.fromArticles(spark, arts, numPartitions = 1).cacheAll()
    val eng = new WikiSearchEngine(spark, ix,
      EngineConfig(unevaluatedFields = Set("TITLE")))
    def ids(q: String): Set[String] =
      eng.run(q, Seq("enwiki")).select("docId").collect().map(_.getString(0)).toSet
    // normalized titles: 'abacus', 'zebra crossing' — only the zebra doc
    // is in ['z','þ']; the raw 'Ábacus' row must not leak doc 2001
    assert(ids("TITLE >= 'z' and TITLE <= 'þ'") == Set("2002"))
    // normalized-range hit still works through the canonical rows
    assert(ids("TITLE >= 'a' and TITLE <= 'b'") == Set("2001"))
  }

  test("wiki markup is suppressed by the tokenizer: file/template/url junk doesn't index") {
    import spark.implicits._
    val arts = Seq(
      Article(1001, "Markup", 1L, "c",
        "calculus content [[File:Diagram.png|thumb|a picture]] " +
          "{{infobox|name=Junkbox}} see https://junk.example/page here " +
          "[[linked words]] end", "enwiki"),
      Article(1002, "Plain", 1L, "c", "calculus without markup", "enwiki")
    ).toDS()
    val eng = new WikiSearchEngine(spark,
      IndexBuilder.fromArticles(spark, arts, numPartitions = 1))
    def ids(q: String) =
      eng.run(q, Seq("enwiki")).select("docId").collect().map(_.getString(0)).toSet
    assert(ids("TEXT == 'calculus'") == Set("1001", "1002"))
    // ordinary [[link]] inner words DO index
    assert(ids("TEXT == 'linked'") == Set("1001"))
    // file/template/url contents do NOT
    for (junk <- Seq("file", "diagram", "thumb", "infobox", "junkbox", "https", "junk"))
      assert(ids(s"TEXT == '$junk'").isEmpty, s"junk token '$junk' leaked into the index")
  }

  test("ALL range bounds are enforced on the index path (sound under unevaluated fields)") {
    // Two lower bounds whose lexicographic order disagrees with numeric
    // order: '67' > '656' lexicographically but 67 < 656 numerically.
    // Round 1 fused only one (lexicographically-chosen) bound per side;
    // with ID unevaluated the residual compiles to TRUE, so doc 655
    // (≥ 67 but < 656) leaked through. All bounds must conjoin.
    val ix  = IndexBuilder.fromArticles(spark, XmlIngest.readArticles(spark, fixture), 1)
    val eng = new WikiSearchEngine(spark, ix, EngineConfig(unevaluatedFields = Set("ID")))
    val ids = eng.run("ID >= 67 and ID >= 656 and ID <= 658", Seq("enwiki"))
      .select("docId").collect().map(_.getString(0)).toSet
    assert(ids == Set("656", "657", "658"))
  }

  test("unevaluated TEXT config trusts the index (reference parity mode)") {
    val ix  = IndexBuilder.fromArticles(spark, XmlIngest.readArticles(spark, fixture), 1)
    val eng = new WikiSearchEngine(spark, ix, EngineConfig(unevaluatedFields = Set("TEXT")))
    val ids = eng.run("TEXT == 'abacus'", Seq("enwiki"))
      .select("docId").collect().map(_.getString(0)).toSet
    assert(ids == Set("655"))
  }

  test("highlights: the stored offsets locate the term in a re-tokenized snippet") {
    // wiki path: offsets were produced by TextFunctions.tokenize (the
    // markup-aware default) — the snippet window must CONTAIN the term,
    // proving stored offset and re-derived token stream line up
    val rows = engine.highlights("abacus", window = 2)
      .collect().map(r => (r.getString(0), r.getString(2))).toMap
    assert(rows.keySet == Set("655"))
    val snippet = rows("655").split(" ")
    assert(snippet.contains("abacus") && snippet.length <= 5)

    // documents path: tokenizeWs offsets on a crafted doc — the window
    // is exact and position-checked, including the left-edge clamp
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f g", "en", "s", 13L), (2L, "d x y", "en", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val ix2 = IndexBuilder.fromDocumentsTable(spark, docs, numPartitions = 1)
    val eng2 = new WikiSearchEngine(spark, ix2)
    val got = eng2.highlights("d", window = 2,
        tokenizer = graft.functions.TextFunctions.tokenizeWs)
      .collect().map(r => (r.getString(0), r.getString(2))).toMap
    assert(got == Map("1" -> "b c d e f", "2" -> "d x y"))
  }

  test("moreLikeThis: rarity-weighted overlap ranking, source excluded, auths respected") {
    import spark.implicits._
    // vocab df: a→3 docs, b→2, c→1, z→1; N=4
    val docs = Seq(
      (1L, "a b c", "en", "s", 5L),   // source
      (2L, "a b", "en", "s", 3L),     // shares a,b → (4-3)+(4-2)=3
      (3L, "a", "en", "s", 1L),       // shares a   → 1
      (4L, "z", "en", "s", 1L))       // shares none → absent
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val eng = new WikiSearchEngine(spark,
      IndexBuilder.fromDocumentsTable(spark, docs, numPartitions = 1))
    val got = eng.moreLikeThis("1", 10)
      .collect().map(r => (r.getString(0), r.getLong(2)))
    assert(got.toSeq == Seq(("2", 3L), ("3", 1L)))
    // k bounds the result (TakeOrderedAndProject semantics)
    assert(eng.moreLikeThis("1", 1).collect().map(_.getString(0)).toSeq == Seq("2"))
    // visibility: wrong auths see nothing
    assert(eng.moreLikeThis("1", 10, auths = Seq("de")).collect().isEmpty)
  }

  test("snippets: one window per (doc, matched term), one tokenize per doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g", "en", "s", 13L), // contains b AND f
      (2L, "f x y", "en", "s", 5L),          // contains f only
      (3L, "z z z", "en", "s", 5L))          // contains neither
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val eng = new WikiSearchEngine(spark,
      IndexBuilder.fromDocumentsTable(spark, docs, numPartitions = 1))
    val got = eng.snippets(Seq("b", "f"), window = 1,
        tokenizer = graft.functions.TextFunctions.tokenizeWs)
      .collect().map(r => (r.getString(0), r.getString(2)) -> r.getString(3)).toMap
    assert(got == Map(
      ("1", "b") -> "a b c",
      ("1", "f") -> "e f g",
      ("2", "f") -> "f x y")) // left-edge clamp keeps 3 tokens
  }

  test("phraseSnippets: adjacency from shifted stored offsets, first occurrence") {
    import spark.implicits._
    val docs = Seq(
      (1L, "u v spark join w x", "en", "s", 18L),  // phrase at pos 2
      (2L, "join spark a b", "en", "s", 14L),      // both terms, NOT adjacent in order
      (3L, "spark join spark join y", "en", "s", 23L)) // twice: first wins
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val eng = new WikiSearchEngine(spark,
      IndexBuilder.fromDocumentsTable(spark, docs, numPartitions = 1))
    val got = eng.phraseSnippets(Seq("spark", "join"), window = 1,
        tokenizer = graft.functions.TextFunctions.tokenizeWs)
      .collect().map(r => (r.getString(0), r.getString(2))).toMap
    // window=1 + 2 phrase tokens = 4-token slices around the phrase start
    assert(got == Map(
      "1" -> "v spark join w",
      "3" -> "spark join spark join")) // left clamp at doc start
  }

  test("near: proximity boundary at exactly k tokens, either order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark x y join", "en", "s", 14L),   // distance 3
      (2L, "join z spark", "en", "s", 12L),     // distance 2, reversed order
      (3L, "spark a b c join", "en", "s", 16L), // distance 4 — out at k=3
      (4L, "spark only", "en", "s", 10L)        // one term absent
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val eng = new WikiSearchEngine(spark,
      IndexBuilder.fromDocumentsTable(spark, docs, numPartitions = 1))
    def ids(k: Int) = eng.near("spark", "join", k).collect().map(_.getString(0)).toSet
    assert(ids(3) == Set("1", "2")) // boundary IN at k=3; order-free
    assert(ids(2) == Set("2"))
    assert(ids(4) == Set("1", "2", "3"))
  }

  test("fuzzyTerms: SymSpell candidates verified to exact levenshtein <= 1") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark sport sort short snark", "en", "s", 28L),
      (2L, "sort spark", "en", "s", 10L),
      (3L, "sparkle srot", "en", "s", 12L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val eng = new WikiSearchEngine(spark,
      IndexBuilder.fromDocumentsTable(spark, docs, numPartitions = 1))
    // 'sprk' (deletion typo): spark (insertion, df=2) and no others —
    // snark is distance 2, sparkle 3. 'sort': itself (df=2), short
    // (insertion), sport (substitution). The TRANSPOSED 'srot' shares
    // the deletions 'srt' and 'sot' with 'sort', so the neighborhood
    // join DOES generate it as a candidate — only the exact levenshtein
    // verify (distance 2) keeps it out; delete that filter and this
    // assertion fails.
    val m1 = eng.fuzzyTerms("sprk").as[(String, Long)].collect().toMap
    assert(m1 == Map("spark" -> 2L))
    val m2 = eng.fuzzyTerms("sort").as[(String, Long)].collect().toMap
    assert(m2 == Map("sort" -> 2L, "short" -> 1L, "sport" -> 1L))
  }

  test("f:fuzzy composes into the query language with exact residual verification") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark sport sort short snark", "en", "s", 28L),
      (2L, "sort spark", "en", "s", 10L),
      (3L, "sparkle srot", "en", "t", 12L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val index = IndexBuilder.fromDocumentsTable(spark, docs, numPartitions = 1)
    val eng = new WikiSearchEngine(spark, index)
    def ids(e: WikiSearchEngine, q: String) =
      e.run(q).select("docId").collect().map(_.getString(0)).toSet
    // standalone: a token within Lev<=1 of 'sprk' — 'spark' only ('snark'
    // is distance 2, 'sparkle' 3, and transposed 'srot' vs 'sort' is 2)
    assert(ids(eng, "f:fuzzy(TEXT, 'sprk')") == Set("1", "2"))
    assert(ids(eng, "f:fuzzy(TEXT, 'sort')") == Set("1", "2"))
    // no placement restrictions (unlike f:near): AND, OR, NOT all compose
    // because the residual re-verifies with the exact levenshtein predicate
    assert(ids(eng, "SOURCE == 's' and f:fuzzy(TEXT, 'sprk')") == Set("1", "2"))
    assert(ids(eng, "TEXT == 'sparkle' or f:fuzzy(TEXT, 'sprk')") == Set("1", "2", "3"))
    assert(ids(eng, "TEXT == 'sparkle' and not f:fuzzy(TEXT, 'sprk')") == Set("3"))
    // the plan is the expansion as a multi-form EQ leaf
    val report = eng.explainAccess("f:fuzzy(TEXT, 'sort')")
    assert(report.contains("INDEX PATH") && report.contains("EQ TEXT IN {"), report)
    assert(Seq("sort", "sport", "short").forall(report.contains), report)
    // empty expansion is proof of emptiness (vocabulary completeness)
    assert(ids(eng, "f:fuzzy(TEXT, 'zzzzzz')").isEmpty)
    assert(eng.explainAccess("f:fuzzy(TEXT, 'zzzzzz')").contains("EMPTY"))
    // over-generic terms (expansion cap) fall back to scan + residual
    // with IDENTICAL results — the leaf is an optimization, not an
    // obligation
    val scanEng = new WikiSearchEngine(spark, index, EngineConfig(fuzzyExpandMax = 0))
    assert(scanEng.explainAccess("f:fuzzy(TEXT, 'sprk')").startsWith("FULL SCAN"))
    for (q <- Seq("f:fuzzy(TEXT, 'sprk')", "f:fuzzy(TEXT, 'sort')",
        "TEXT == 'sparkle' or f:fuzzy(TEXT, 'sprk')"))
      assert(ids(scanEng, q) == ids(eng, q), q)
    // malformed arg shapes are client errors
    assert(intercept[IllegalArgumentException](
      eng.run("f:fuzzy(TEXT)")).getMessage.contains("f:fuzzy takes"))
    assert(intercept[IllegalArgumentException](
      eng.run("f:fuzzy(TEXT, '')")).getMessage.contains("non-empty"))
  }

  test("f:fuzzy maxDist=2: SymSpell 2-deletion expansion with exact distance-2 verify") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark sport sort short snark", "en", "s", 28L),
      (2L, "sort spark", "en", "s", 10L),
      (3L, "sparkle srot", "en", "t", 12L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val index = IndexBuilder.fromDocumentsTable(spark, docs, numPartitions = 1)
    val eng = new WikiSearchEngine(spark, index)
    def ids(e: WikiSearchEngine, q: String) =
      e.run(q).select("docId").collect().map(_.getString(0)).toSet
    // the transposition 'srot' (lev 2 from 'sort') is OUT at the default
    // distance and IN at 2 — the exact boundary the d=1 test pins from
    // the other side
    assert(ids(eng, "f:fuzzy(TEXT, 'sort')") == Set("1", "2"))
    assert(ids(eng, "f:fuzzy(TEXT, 'sort', 2)") == Set("1", "2", "3"))
    // 'sprk' at d=2 reaches sport/sort/snark but not sparkle (lev 3)
    assert(ids(eng, "f:fuzzy(TEXT, 'sprk', 2)") == Set("1", "2"))
    // the library surface agrees, with dfs
    assert(eng.fuzzyTerms("sort", maxDist = 2).as[(String, Long)].collect().toMap ==
      Map("sort" -> 2L, "short" -> 1L, "sport" -> 1L, "srot" -> 1L))
    // full composition (fuzzy is residual-verified, no placement rules)
    assert(ids(eng, "SOURCE == 't' and f:fuzzy(TEXT, 'sort', 2)") == Set("3"))
    assert(ids(eng, "TEXT == 'snark' or f:fuzzy(TEXT, 'sort', 2)") == Set("1", "2", "3"))
    // expansion-capped fallback (scan + residual) is identical at d=2
    val scanEng = new WikiSearchEngine(spark, index, EngineConfig(fuzzyExpandMax = 0))
    assert(scanEng.explainAccess("f:fuzzy(TEXT, 'sort', 2)").startsWith("FULL SCAN"))
    assert(ids(scanEng, "f:fuzzy(TEXT, 'sort', 2)") == Set("1", "2", "3"))
    // the plan cache keys on distance: (sort,1), (sort,2), (sprk,2)
    // were three distinct expansions; repeats at either distance hit
    assert(eng.fuzzyVocabRuns.get() == 3)
    ids(eng, "f:fuzzy(TEXT, 'sort', 2)"); ids(eng, "f:fuzzy(TEXT, 'sort')")
    assert(eng.fuzzyVocabRuns.get() == 3)
    // distance bounds and malformed args are client errors
    assert(intercept[IllegalArgumentException](
      eng.run("f:fuzzy(TEXT, 'sort', 3)")).getMessage.contains("1 or 2"))
    assert(intercept[IllegalArgumentException](
      eng.run("f:fuzzy(TEXT, 'sort', 'x')")).getMessage.contains("integer"))
  }

  test("hot f:fuzzy queries plan from the expansion cache, not a fresh vocabulary job") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark sport sort short snark", "en", "s", 28L),
      (2L, "sort spark", "en", "s", 10L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val eng = new WikiSearchEngine(spark,
      IndexBuilder.fromDocumentsTable(spark, docs, numPartitions = 1))
    def ids(q: String) = eng.run(q).select("docId").collect().map(_.getString(0)).toSet
    val first = ids("f:fuzzy(TEXT, 'sprk')")
    assert(eng.fuzzyVocabRuns.get() == 1)
    // same term, same plan — zero additional vocabulary jobs, same rows
    assert(ids("f:fuzzy(TEXT, 'sprk')") == first)
    assert(ids("SOURCE == 's' and f:fuzzy(TEXT, 'sprk')") == first)
    assert(eng.fuzzyVocabRuns.get() == 1)
    // a different term is a genuine miss
    ids("f:fuzzy(TEXT, 'sort')")
    assert(eng.fuzzyVocabRuns.get() == 2)
  }

  test("f:near composes into the query language, enforced from stored offsets") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark x y join", "en", "s", 14L),    // distance 3 — in at k=3
      (2L, "join z spark", "en", "s", 12L),      // distance 2, reversed order
      (3L, "spark a b c join", "en", "t", 16L),  // distance 4 — out at k=3
      (4L, "spark join", "en", "t", 10L)         // adjacent
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val eng = new WikiSearchEngine(spark,
      IndexBuilder.fromDocumentsTable(spark, docs, numPartitions = 1))
    def ids(q: String) = eng.run(q).select("docId").collect().map(_.getString(0)).toSet
    // standalone: equals the library near() surface
    assert(ids("f:near(TEXT, 'spark', 'join', 3)") == Set("1", "2", "4"))
    // conjunctive composition — the VERDICT's target shape: another
    // branch drives candidates, near intersects exactly (never dropped
    // by the min-card superset rule)
    assert(ids("SOURCE == 't' and f:near(TEXT, 'spark', 'join', 3)") == Set("4"))
    assert(ids("SOURCE == 't' and f:near(TEXT, 'spark', 'join', 4)") == Set("3", "4"))
    // explain shows the stored-offset leaf, no execution
    val report = eng.explainAccess("SOURCE == 't' and f:near(TEXT, 'spark', 'join', 3)")
    assert(report.contains("NEAR(TEXT: spark join, k=3)"), report)
    // unsound placements are rejected loudly, run AND explain
    for (bad <- Seq(
        "TEXT == 'spark' or f:near(TEXT, 'spark', 'join', 3)",
        "TEXT == 'spark' and not f:near(TEXT, 'spark', 'join', 3)"))
      assert(intercept[IllegalArgumentException](eng.run(bad)).getMessage
        .contains("conjunctively"), bad)
    // a BARE negated near is caught even earlier, by the all-negation rule
    assert(intercept[IllegalArgumentException](
      eng.run("not f:near(TEXT, 'a', 'b', 1)")).getMessage.contains("all-negation"))
    assert(eng.explainAccess("TEXT == 'spark' or f:near(TEXT, 'a', 'b', 1)")
      .startsWith("REJECTED"))
    // non-TEXT fields carry no offsets; malformed k is a client error
    assert(intercept[IllegalArgumentException](
      eng.run("f:near(SOURCE, 'a', 'b', 1)")).getMessage.contains("offsets"))
    assert(intercept[IllegalArgumentException](
      eng.run("f:near(TEXT, 'a', 'b', 'x')")).getMessage.contains("integer"))
  }

  test("f:onear: strictly increasing positions in term order within the window") {
    import spark.implicits._
    val docs = Seq(
      (1L, "sort merge join x", "en", "s", 17L),  // in order, span 2
      (2L, "join merge sort", "en", "s", 15L),    // reverse order: near-in, onear-OUT
      (3L, "sort x join merge", "en", "s", 17L),  // join precedes merge: onear-OUT
      (4L, "sort merge sort join", "en", "t", 20L), // in order via sort@0, span 3
      // best-occurrence choice: the chain must pick merge@2, not merge@0
      (5L, "merge sort merge join", "en", "t", 21L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val eng = new WikiSearchEngine(spark,
      IndexBuilder.fromDocumentsTable(spark, docs, numPartitions = 1))
    def ids(q: String) = eng.run(q).select("docId").collect().map(_.getString(0)).toSet
    assert(ids("f:onear(TEXT, 3, 'sort', 'merge', 'join')") == Set("1", "4", "5"))
    assert(ids("f:onear(TEXT, 2, 'sort', 'merge', 'join')") == Set("1", "5"))
    // unordered near accepts what onear rejects — the algebra's point
    assert(ids("f:near(TEXT, 3, 'sort', 'merge', 'join')") ==
      Set("1", "2", "3", "4", "5"))
    // composition + placement rules are NearLeaf's
    assert(ids("SOURCE == 't' and f:onear(TEXT, 3, 'sort', 'merge', 'join')") ==
      Set("4", "5"))
    assert(intercept[IllegalArgumentException](
      eng.run("TEXT == 'x' or f:onear(TEXT, 3, 'sort', 'merge', 'join')"))
      .getMessage.contains("conjunctively"))
    assert(eng.explainAccess("f:onear(TEXT, 3, 'sort', 'merge', 'join')")
      .contains("ONEAR(TEXT: sort merge join, k=3)"))
    // onear has no legacy pair form — k must come second
    assert(intercept[IllegalArgumentException](
      eng.run("f:onear(TEXT, 'sort', 'merge', 3)")).getMessage
      .contains("takes (field, k, term...)"))
  }

  test("f:near k-term form: all terms within a window of span k") {
    import spark.implicits._
    val docs = Seq(
      (1L, "sort merge join x", "en", "s", 17L),   // span 2 (positions 0-2)
      (2L, "sort a merge b join", "en", "s", 19L), // span 4
      (3L, "sort merge x", "en", "s", 12L),        // 'join' absent
      (4L, "join sort q merge", "en", "t", 17L),   // span 3, order-free
      // far-apart singles plus ONE tight window later in the doc: the
      // window is positional, not per-doc min/max distance
      (5L, "sort u u u u u u u merge u u u u u u join u sort merge join", "en", "t", 59L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val eng = new WikiSearchEngine(spark,
      IndexBuilder.fromDocumentsTable(spark, docs, numPartitions = 1))
    def ids(q: String) = eng.run(q).select("docId").collect().map(_.getString(0)).toSet
    assert(ids("f:near(TEXT, 2, 'sort', 'merge', 'join')") == Set("1", "5"))
    assert(ids("f:near(TEXT, 3, 'sort', 'merge', 'join')") == Set("1", "4", "5"))
    assert(ids("f:near(TEXT, 4, 'sort', 'merge', 'join')") == Set("1", "2", "4", "5"))
    // the k-first PAIR form is the same leaf as the legacy pair form
    assert(ids("f:near(TEXT, 3, 'sort', 'join')") ==
      ids("f:near(TEXT, 'sort', 'join', 3)"))
    // conjunctive composition + placement rules apply unchanged
    assert(ids("SOURCE == 't' and f:near(TEXT, 3, 'sort', 'merge', 'join')") ==
      Set("4", "5"))
    assert(intercept[IllegalArgumentException](
      eng.run("TEXT == 'x' or f:near(TEXT, 3, 'sort', 'merge', 'join')"))
      .getMessage.contains("conjunctively"))
    // explain renders the n-way leaf
    assert(eng.explainAccess("f:near(TEXT, 3, 'sort', 'merge', 'join')")
      .contains("NEAR(TEXT: sort merge join, k=3)"))
    // fewer than two terms is a client error
    assert(intercept[IllegalArgumentException](
      eng.run("f:near(TEXT, 3, 'sort')")).getMessage.contains("two terms"))
  }

  test("f:phrase composes into the query language, enforced from stored offsets") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark join now", "en", "s", 14L),    // adjacent, in order
      (2L, "join spark", "en", "s", 10L),        // reversed — NOT a phrase hit
      (3L, "spark x join", "en", "t", 12L),      // gap — NOT a phrase hit
      (4L, "a spark join b", "en", "t", 14L),    // adjacent mid-document
      (5L, "c spark join", "en", "t", 12L)       // adjacent at document end
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val eng = new WikiSearchEngine(spark,
      IndexBuilder.fromDocumentsTable(spark, docs, numPartitions = 1))
    def ids(q: String) = eng.run(q).select("docId").collect().map(_.getString(0)).toSet
    // standalone: ordered adjacency only (near would also take 2 and 3)
    assert(ids("f:phrase(TEXT, 'spark join')") == Set("1", "4", "5"))
    // equals the phraseSnippets doc set (shared phraseStarts machinery)
    assert(eng.phraseSnippets(Seq("spark", "join"),
        tokenizer = graft.functions.TextFunctions.tokenizeWs)
      .select("docId").collect().map(_.getString(0)).toSet == Set("1", "4", "5"))
    // conjunctive composition: a sibling drives candidates, the phrase
    // leaf intersects exactly (never dropped by the min-card rule)
    assert(ids("SOURCE == 't' and f:phrase(TEXT, 'spark join')") == Set("4", "5"))
    // explain shows the stored-offset adjacency leaf, no execution
    val report = eng.explainAccess("SOURCE == 't' and f:phrase(TEXT, 'spark join')")
    assert(report.contains("PHRASE(TEXT: spark join)"), report)
    // unsound placements are rejected loudly
    for (bad <- Seq(
        "TEXT == 'spark' or f:phrase(TEXT, 'spark join')",
        "TEXT == 'spark' and not f:phrase(TEXT, 'spark join')"))
      assert(intercept[IllegalArgumentException](eng.run(bad)).getMessage
        .contains("conjunctively"), bad)
    assert(eng.explainAccess("TEXT == 'spark' or f:phrase(TEXT, 'a b')")
      .startsWith("REJECTED"))
    // non-TEXT fields carry no offsets; one-token phrases are client errors
    assert(intercept[IllegalArgumentException](
      eng.run("f:phrase(SOURCE, 'a b')")).getMessage.contains("offsets"))
    assert(intercept[IllegalArgumentException](
      eng.run("f:phrase(TEXT, 'spark')")).getMessage.contains("two tokens"))
    // a term absent from the corpus yields an empty result, not an error
    assert(ids("f:phrase(TEXT, 'spark zzzz')").isEmpty)
  }

  test("rankTopK: equals the full ranking's prefix; plans as bounded top-k, no window") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark join spark", "en", "s", 16L),
      (2L, "spark a b c d e f g h", "en", "s", 21L),
      (3L, "join x", "en", "s", 6L),
      (4L, "spark join", "en", "s", 10L),
      (5L, "nothing here", "en", "s", 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val eng = new WikiSearchEngine(spark,
      IndexBuilder.fromDocumentsTable(spark, docs, numPartitions = 1))
    val tok = graft.functions.TextFunctions.tokenizeWs _
    val full = eng.rank(Seq("spark", "join"))
      .select("docId", "language", "score").collect().map(_.toSeq).toSeq
    val top2 = eng.rankTopK(Seq("spark", "join"), 2)
    assert(top2.collect().map(_.toSeq).toSeq == full.take(2))
    // the serving plan must be the bounded sort+limit, not a global window
    val plan = top2.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k plan, got:\n$plan")
    assert(!plan.contains("Window"), s"serving top-k must not plan a window:\n$plan")
  }

  test("rankPage: keyset pages tile the ranking exactly and never re-sort skipped rows") {
    import spark.implicits._
    // scores engineered to TIE across docs (identical text ⇒ identical
    // score) so the boundary predicate's tie handling is exercised
    val docs = (1L to 9L).map { i =>
      val text = if (i <= 3) "spark join spark" else if (i <= 6) "spark x y" else "join q"
      (i, text, "en", "s", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val eng = new WikiSearchEngine(spark,
      IndexBuilder.fromDocumentsTable(spark, docs, numPartitions = 1))
    val tok = graft.functions.TextFunctions.tokenizeWs _
    val tie = org.apache.spark.sql.functions.col("docId").cast("bigint")
    val terms = Seq("spark", "join")
    val all = eng.rankTopK(terms, 9, tieBreak = tie)
      .collect().map(_.toSeq).toSeq
    // page after row k must equal rows k+1..k+3 of the full ranking, for
    // EVERY boundary — including boundaries inside a tie run
    for (k <- 0 until 8) {
      val last = all(k)
      val page = eng.rankPage(terms, 3,
          afterScore = last(2).asInstanceOf[Double],
          afterTie = last(0).asInstanceOf[String].toLong,
          tieBreak = tie)
        .collect().map(_.toSeq).toSeq
      assert(page == all.slice(k + 1, k + 4), s"page after rank ${k + 1}")
    }
    // page plan is still the bounded top-k — no window, no offset-style sort
    val plan = eng.rankPage(terms, 3, afterScore = all(2)(2).asInstanceOf[Double],
        afterTie = all(2)(0).asInstanceOf[String].toLong, tieBreak = tie)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k page plan:\n$plan")
    assert(!plan.contains("Window"), s"page must not plan a window:\n$plan")
    // past the end → empty page, not an error
    val lastRow = all.last
    assert(eng.rankPage(terms, 3, afterScore = lastRow(2).asInstanceOf[Double],
      afterTie = lastRow(0).asInstanceOf[String].toLong,
      tieBreak = tie).collect().isEmpty)
  }

  test("auths restrict rank, fuzzyTerms, snippets, and near to authorized languages") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark join secret", "en", "s", 17L),
      (2L, "spark join classified", "fr", "s", 21L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val eng = new WikiSearchEngine(spark,
      IndexBuilder.fromDocumentsTable(spark, docs, numPartitions = 1))
    val tok = graft.functions.TextFunctions.tokenizeWs _
    // rank: the fr document must not appear, and must not influence stats
    val ranked = eng.rankTopK(Seq("spark"), 10, auths = Seq("en"))
      .collect().map(_.getString(1)).toSet
    assert(ranked == Set("en"))
    // fuzzy vocabulary: 'classified' exists only in the fr doc
    assert(eng.fuzzyTerms("classified", Seq("en")).collect().isEmpty)
    assert(eng.fuzzyTerms("classified", Seq("fr")).collect().nonEmpty)
    // snippets: no fr content slice for an en-only client
    val sn = eng.snippets(Seq("classified"), 1, tok, Seq("en")).collect()
    assert(sn.isEmpty)
    // near: fr-only cooccurrence invisible under en auths
    assert(eng.near("spark", "classified", 5, Seq("en")).collect().isEmpty)
    assert(eng.near("spark", "classified", 5, Seq("fr")).collect().nonEmpty)
  }

  test("completeTerms: prefix match on the indexed vocabulary, df-ranked, k-capped") {
    val rows = engine.completeTerms("ab", 10, Seq("enwiki")).collect()
    val terms = rows.map(_.getString(0)).toSeq
    assert(terms.contains("abacus"))
    assert(terms.forall(_.startsWith("ab")))
    // df-descending, term-ascending on ties
    val dfs = rows.map(_.getLong(1)).toSeq
    assert(dfs == dfs.sortBy(-_))
    // prefix is normalized like query literals (fields store lowercase)
    assert(engine.completeTerms("AB", 10, Seq("enwiki")).collect()
      .map(_.getString(0)).toSeq == terms)
    // k caps the page
    assert(engine.completeTerms("a", 2, Seq("enwiki")).collect().length == 2)
    intercept[IllegalArgumentException](engine.completeTerms("", 5))
    intercept[IllegalArgumentException](engine.completeTerms("a", 0))
  }

  test("collapse: representative per field value with group size over the hit set") {
    val rows = engine.collapse("TEXT == 'the'", "TITLE", Seq("enwiki")).collect()
    assert(rows.nonEmpty)
    // each group of this fixture is a single doc: n == 1, top_doc == the doc
    assert(rows.forall(_.getAs[Long]("n") == 1L))
    // n-descending then value ordering
    val ns = rows.map(_.getAs[Long]("n")).toSeq
    assert(ns == ns.sortBy(-_))
  }

  test("offsetsFields: f:near/f:onear/f:phrase serve a declared non-TEXT field from its stored offsets") {
    import spark.implicits._
    val arts = Seq(
      Article(1, "One", 1L, "fast red fox jumps high", "alpha beta gamma", "enwiki"),
      Article(2, "Two", 1L, "red something fox", "alpha delta", "enwiki"),
      Article(3, "Three", 1L, "fox red", "beta gamma", "enwiki"),
      Article(4, "Four", 1L, "red only here", "gamma delta", "enwiki")).toDS()
    val eng = new WikiSearchEngine(spark,
      IndexBuilder.fromArticles(spark, arts, numPartitions = 1,
        offsetsFields = Set("COMMENTS")).cacheAll())
    def ids(q: String) =
      eng.run(q).select("docId").collect().map(_.getString(0)).toSet
    // adjacency: 'red fox' adjacent only in doc 1 ('red something fox'
    // is 2 apart in doc 2, reversed in doc 3)
    assert(ids("f:phrase(COMMENTS, 'red fox')") == Set("1"))
    // window 2 either order: docs 1 (adjacent), 2 (distance 2), 3 (reversed)
    assert(ids("f:near(COMMENTS, 2, 'red', 'fox')") == Set("1", "2", "3"))
    // ordered: red BEFORE fox within 2 → docs 1, 2 only
    assert(ids("f:onear(COMMENTS, 2, 'red', 'fox')") == Set("1", "2"))
    // composes conjunctively with the TEXT index like any near leaf
    assert(ids("TEXT == 'alpha' and f:near(COMMENTS, 2, 'red', 'fox')") == Set("1", "2"))
    // TEXT offsets still serve TEXT; an undeclared field still fails loudly
    assert(ids("f:phrase(TEXT, 'alpha beta')") == Set("1"))
    val err = intercept[IllegalArgumentException](eng.run("f:near(TITLE, 2, 'a', 'b')"))
    assert(err.getMessage.contains("positional offsets"))
    // the explain surface names the field
    assert(eng.explainAccess("f:near(COMMENTS, 2, 'red', 'fox')")
      .contains("NEAR(COMMENTS: red fox, k=2)"))
    // persistence: the field_postings table round-trips through save/load
    val dir = java.nio.file.Files.createTempDirectory("graft-fieldpost").toString
    IndexBuilder.fromArticles(spark, arts, 1, offsetsFields = Set("COMMENTS")).save(dir)
    val loaded = new WikiSearchEngine(spark, graft.ingest.WikiIndex.load(spark, dir))
    assert(loaded.run("f:onear(COMMENTS, 2, 'red', 'fox')")
      .select("docId").collect().map(_.getString(0)).toSet == Set("1", "2"))
    // declaration casing is normalized (field names store uppercase),
    // and positional literals normalize like TEXT literals — the tokens
    // are the TEXT tokenizer's (lowercasing) output regardless of the
    // field's own index normalizer, so a cased query literal must match
    val eng2 = new WikiSearchEngine(spark,
      IndexBuilder.fromArticles(spark, arts, 1, offsetsFields = Set("comments")))
    assert(eng2.run("f:phrase(COMMENTS, 'Red FOX')")
      .select("docId").collect().map(_.getString(0)).toSet == Set("1"))
    // a declared field whose every value is null saves an EMPTY postings
    // dataset; after load it must serve empty results, not throw
    val nullArts = Seq(
      Article(1, "One", 1L, null, "alpha beta", "enwiki"),
      Article(2, "Two", 1L, null, "beta gamma", "enwiki")).toDS()
    val dir2 = java.nio.file.Files.createTempDirectory("graft-fieldpost-null").toString
    IndexBuilder.fromArticles(spark, nullArts, 1, offsetsFields = Set("COMMENTS")).save(dir2)
    val loaded2 = new WikiSearchEngine(spark, graft.ingest.WikiIndex.load(spark, dir2))
    assert(loaded2.run("f:near(COMMENTS, 2, 'red', 'fox')").collect().isEmpty)
  }

  test("fromDocumentsTable extraFields/offsetsFields: derived field proximity, validation fails loudly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, concat_ws, slice}
    val docs = Seq(
      (1L, "red fox runs far away today", "en", "s", 26L),
      (2L, "red something fox here now go", "en", "s", 29L),
      (3L, "slow fox red is last today here", "en", "s", 31L),
      (4L, "other words only here today now", "en", "s", 31L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // HEAD = first three whitespace tokens, declared positional
    val head = concat_ws(" ",
      slice(graft.functions.TextFunctions.tokenizeWs(col("text")), 1, 3))
    val eng = new WikiSearchEngine(spark, IndexBuilder.fromDocumentsTable(
      spark, docs, numPartitions = 1,
      extraFields = Map("HEAD" -> head), offsetsFields = Set("head")))
    def ids(q: String) =
      eng.run(q).select("docId").collect().map(_.getString(0)).toSet
    // ordered within the 3-token head: doc 1 (adjacent), doc 2 (distance
    // 2); doc 3 has red AFTER fox in its head; doc 4 lacks both
    assert(ids("f:onear(HEAD, 2, 'red', 'fox')") == Set("1", "2"))
    // the derived field is an event field too — residual equality
    // compares the FULL stored value (the positional tokens live only
    // in field_postings)
    assert(ids("HEAD == 'red fox runs'") == Set("1"))
    assert(ids("HEAD == 'red'").isEmpty) // a token is not the value
    // declarations are validated at build, not discovered as silent
    // empties or far-away duplicate-key errors
    val orphan = intercept[IllegalArgumentException](
      IndexBuilder.fromDocumentsTable(spark, docs, 1, offsetsFields = Set("HEAD2")))
    assert(orphan.getMessage.contains("offsetsFields name no declared field"))
    val clash = intercept[IllegalArgumentException](
      IndexBuilder.fromDocumentsTable(spark, docs, 1,
        extraFields = Map("source" -> col("source"))))
    assert(clash.getMessage.contains("collide"))
  }

  test("BM25 on a pre-round-9 store (postings without dl) falls back to the doc_lengths join with identical scores") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark join spark", "en", "s", 16L),
      (2L, "spark a b c d e f g h", "en", "s", 21L),
      (3L, "join x", "en", "s", 6L),
      (4L, "spark join", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val ix = IndexBuilder.fromDocumentsTable(spark, docs, numPartitions = 1)
    // simulate a store written before dl joined the postings schema
    val legacy = ix.copy(termPostings = ix.termPostings.drop("dl"))
    val tie = org.apache.spark.sql.functions.col("docId").cast("bigint")
    val want = new WikiSearchEngine(spark, ix)
      .rank(Seq("spark", "join"), tieBreak = tie).collect().map(_.toSeq).toSeq
    val got = new WikiSearchEngine(spark, legacy)
      .rank(Seq("spark", "join"), tieBreak = tie).collect().map(_.toSeq).toSeq
    assert(got == want && want.nonEmpty,
      "the doc_lengths-join fallback must score identically to the denormalized path")
  }

  test("synonym expansion: EQ widens to the equivalence set, NE/not stay consistent, fast count still engages") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the car is fast", "en", "s", 15L),
      (2L, "an auto appeared", "en", "s", 16L),
      (3L, "one automobile here", "en", "s", 19L),
      (4L, "a bicycle instead", "en", "s", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val ix = IndexBuilder.fromDocumentsTable(spark, docs, numPartitions = 1).cacheAll()
    val eng = new WikiSearchEngine(spark, ix,
      graft.query.EngineConfig(synonyms = Map("car" -> Seq("auto", "automobile"))))
    def ids(q: String) =
      eng.run(q).select("docId").collect().map(_.getString(0)).toSet
    // EQ widens over the set; non-synonym terms and other directions
    // are untouched ('auto' itself has no entry)
    assert(ids("TEXT == 'car'") == Set("1", "2", "3"))
    assert(ids("TEXT == 'auto'") == Set("2"))
    assert(ids("TEXT == 'bicycle'") == Set("4"))
    // != and not(==) agree: both exclude the WHOLE equivalence set
    assert(ids("TEXT == 'fast' or TEXT == 'bicycle' or TEXT == 'appeared'") == Set("1", "2", "4"))
    assert(ids("(TEXT == 'fast' or TEXT == 'bicycle' or TEXT == 'appeared') and TEXT != 'car'") == Set("4"))
    assert(ids("(TEXT == 'fast' or TEXT == 'bicycle' or TEXT == 'appeared') and not(TEXT == 'car')") == Set("4"))
    // the expansion is an all-EQ OR — the zero-job count fast path still
    // engages and agrees with the residual-verified run
    val fast = eng.fastCount("TEXT == 'car'")
    assert(fast.contains(3L), s"fast count over expanded OR: $fast")
    // an expanded NE splices its exclusions into the enclosing AND
    // (direct anti-join children, not a nested all-negative wrapper) —
    // the fast count stays EXACT: doc 1 ('the car is fast') is excluded
    val fastNe = eng.fastCount("TEXT == 'fast' and TEXT != 'car'")
    assert(fastNe.contains(0L), s"fast count with expanded NE: $fastNe")
    assert(eng.run("TEXT == 'fast' and TEXT != 'car'").count() == 0L)
    // an expanded NE under OR becomes an all-negative And branch the
    // plan cannot anti-join — the fast path must DECLINE (a dropped
    // branch would overcount), and the fallback count stays exact
    val q = "(TEXT == 'bicycle' or TEXT != 'car') and TEXT == 'fast'"
    assert(eng.fastCount(q).isEmpty, "all-negative OR branch must decline the fast path")
    assert(eng.countDocs(q).collect().head.getLong(0) == eng.run(q).count())
    // the plan surface shows the expansion (access-path transparency)
    val report = eng.explainAccess("TEXT == 'car'")
    assert(report.contains("OR"), report)
    // an engine WITHOUT the table behaves as before
    val plain = new WikiSearchEngine(spark, ix)
    assert(plain.run("TEXT == 'car'").select("docId")
      .collect().map(_.getString(0)).toSet == Set("1"))
  }

  test("indexStats: counts agree with the fixture corpus") {
    val r = engine.indexStats(Seq("enwiki")).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[String]("language") == "enwiki")
    assert(row.getAs[Long]("n_docs") == 4L)
    assert(row.getAs[Long]("n_terms") > 0L &&
      row.getAs[Long]("n_postings") >= row.getAs[Long]("n_terms"))
    assert(row.getAs[Long]("n_tokens") >= row.getAs[Long]("n_postings"))
    assert(engine.indexStats(Seq("frwiki")).collect().isEmpty)
  }
}
