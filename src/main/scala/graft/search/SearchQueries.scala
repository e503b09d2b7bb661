package graft.search

import graft.{NamedQuery, Tables}
import graft.ingest.{IndexBuilder, WikiIndex}
import graft.query.WikiSearchEngine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.concurrent.TrieMap

/** The wikisearch query surface, run end-to-end (index build → JEXL-subset
  * parse → plan → index joins → residual filter) against the driver's
  * `documents` table. Each query's DuckDB oracle evaluates the same
  * predicate directly on the raw text — so the whole engine stack
  * (parser, planner, lossy index, semi/anti joins, residual compiler) is
  * what's being verified, not a re-statement of it.
  */
object SearchQueries {

  val NumPartitions = 8

  // One index build per (session, dir) — built once, persisted as
  // partitioned sorted parquet, then queried THROUGH the storage layer
  // (like the reference's long-lived Accumulo tables). Running against
  // parquet rather than in-memory caches keeps predicate pushdown,
  // column pruning, and partition pruning in play — the plan you'd get
  // at 100 TB, not a cache artifact.
  private val cache = TrieMap.empty[String, (WikiIndex, WikiSearchEngine)]

  private def saveDirFor(dir: String): String = {
    val sfName = dir.replaceAll("[^A-Za-z0-9.]", "_")
    s"${sys.props("java.io.tmpdir")}/graft_index/$sfName"
  }

  def engine(s: SparkSession, dir: String): WikiSearchEngine =
    cache.getOrElseUpdate(dir, {
      val saveDir = saveDirFor(dir)
      IndexBuilder
        .fromDocumentsTable(s, Tables.load(s, dir, "documents"), NumPartitions)
        .save(saveDir)
      // Serving runs on its OWN session (same SparkContext, storage and
      // function registry mechanics; separate SQL conf) with AQE off:
      // every engine plan is a fixed small broadcast-semi-join DAG whose
      // shape AQE cannot improve at any corpus size (the broadcast side
      // is the candidate set, bounded by the UidList contract), while
      // AQE's query-stage materialization costs one scheduler
      // round-trip per stage on the latency path (measured warm: 4 → 3
      // jobs/query; 8-client concurrent medians 16-22 → 27-42 qps on
      // the bench workload). The index BUILD above and all batch
      // analytics stay on the caller's session, where AQE's skew-join
      // and partition coalescing do matter.
      val serving = s.newSession()
      serving.conf.set("spark.sql.adaptive.enabled", "false")
      val ix = WikiIndex.load(serving, saveDir)
      ix.metadata.cache() // broadcast-size catalog only
      (ix, new WikiSearchEngine(serving, ix))
    })._2

  /** An engine bound to the CALLER's session and ITS conf — no AQE
    * override, no session clone. For profiling tools that A/B serving
    * configs (`ProfileServe`): `engine` above pins the production
    * serving conf, which would silently defeat the tool's knobs. Reuses
    * the persisted index build; the returned engine is NOT cached.
    */
  def engineOn(s: SparkSession, dir: String): WikiSearchEngine = {
    engine(s, dir) // ensure the index is built and persisted
    new WikiSearchEngine(s, WikiIndex.load(s, saveDirFor(dir)))
  }

  def index(s: SparkSession, dir: String): WikiIndex = {
    engine(s, dir); cache(dir)._1
  }

  /** Memoized `engineOn`: a caller-session engine for callers that must
    * JOIN engine output with caller-session tables. Cached per dir like
    * `engine` — the index load (parquet footers + metadata collect) is
    * not free per invocation; unlike `engineOn` the conf is whatever the
    * caller's session has, so profiling tools keep using the uncached
    * variant. (ws_hybrid used this through round 11; r12 moved it onto
    * the engine's own AQE-off serving session — kept for library
    * callers that genuinely hold caller-session state.)
    */
  private val callerCache = TrieMap.empty[String, WikiSearchEngine]
  def callerEngine(s: SparkSession, dir: String): WikiSearchEngine =
    callerCache.getOrElseUpdate(dir, engineOn(s, dir))

  /** An engine with a QUERY-TIME SYNONYM table over the standard saved
    * index (`EngineConfig.synonyms` — the `ws_syn_q` surface): 'spark'
    * widens to {spark, vector} and a '!= hash' exclusion widens to
    * {hash, merge}, so one entry exercises BOTH expansion directions
    * (EQ→OR splice, NE→AND splice) through the whole planner + residual
    * stack against a declarative oracle. Memoized per dir like the
    * other engine variants; bound to the cached index's serving session.
    */
  private val synCache = TrieMap.empty[String, WikiSearchEngine]
  def synonymEngine(s: SparkSession, dir: String): WikiSearchEngine =
    synCache.getOrElseUpdate(dir, {
      engine(s, dir) // ensure the index is built and cached
      val ix = cache(dir)._1
      new WikiSearchEngine(ix.metadata.sparkSession, ix,
        graft.query.EngineConfig(synonyms = SynTable))
    })

  /** The same synonym semantics REHYDRATED from index state: the cached
    * index plus a `synonyms` part is saved to a fresh store, loaded
    * fresh, and served by an engine with the DEFAULT config — the
    * `ws_syn_persist_q` surface (two sessions sharing a saved store
    * must agree on expanded results without any session wiring).
    */
  private val synPersistCache = TrieMap.empty[String, WikiSearchEngine]
  def synonymPersistEngine(s: SparkSession, dir: String): WikiSearchEngine =
    synPersistCache.getOrElseUpdate(dir, {
      engine(s, dir) // ensure the index is built and cached
      val ix = cache(dir)._1
      val serving = ix.metadata.sparkSession
      val tmp = java.nio.file.Files.createTempDirectory("graft-syn-store").toString
      ix.withSynonyms(SynTable).save(tmp)
      new WikiSearchEngine(serving, WikiIndex.load(serving, tmp))
    })

  /** Synonyms as LIVE-store state: a maintainer that DECLARES the
    * equivalence sets writes them once at store level (beside the
    * versioned parts; sweeps never touch them), then a SECOND
    * maintainer opened on the same dir with NO synonym wiring serves
    * the rehydrated semantics — the live twin of `ws_syn_persist_q`'s
    * two-sessions-one-store agreement proof.
    */
  private val liveSynCache = TrieMap.empty[String, WikiSearchEngine]
  def liveSynonymEngine(s: SparkSession, dir: String): WikiSearchEngine =
    liveSynCache.getOrElseUpdate(dir, {
      val docs = Tables.load(s, dir, "documents")
      val tmp = java.nio.file.Files.createTempDirectory("graft-live-syn").toString
      val writer = new graft.streaming.LiveEngineMaintainer(s, tmp, NumPartitions,
        synonyms = SynTable)
      (0 until 3).foreach(b =>
        writer.processBatch(docs.filter(col("doc_id") % 3 === b), b.toLong))
      val reader = new graft.streaming.LiveEngineMaintainer(s, tmp, NumPartitions)
      new WikiSearchEngine(s, reader.latestIndex.get)
    })

  /** An engine whose index declares a SECOND positional field — HEAD =
    * the document's first five whitespace tokens (derived; the harness
    * documents table has one text column) — via `fromDocumentsTable`'s
    * `extraFields`/`offsetsFields`: the `ws_fld_q` surface exercising
    * field-generic proximity (metadata kind-p discovery, per-field
    * postings joins) end-to-end against a declarative oracle.
    */
  private val fldCache = TrieMap.empty[String, WikiSearchEngine]
  def fieldOffsetsEngine(s: SparkSession, dir: String): WikiSearchEngine =
    fldCache.getOrElseUpdate(dir, {
      val head = concat_ws(" ",
        slice(graft.functions.TextFunctions.tokenizeWs(col("text")), 1, 5))
      // in-memory index (one extra per-dir build) — cacheAll so the
      // derived tables materialize once, not per bench pass
      new WikiSearchEngine(s, IndexBuilder.fromDocumentsTable(
        s, Tables.load(s, dir, "documents"), NumPartitions,
        extraFields = Map("HEAD" -> head), offsetsFields = Set("HEAD")).cacheAll())
    })

  /** An engine served from a live store whose build DECLARES the same
    * positional second field as `fieldOffsetsEngine` (HEAD, first five
    * whitespace tokens): three micro-batches write `field_postings`
    * deltas, and field-generic proximity serves from the merge-on-read
    * union — the `ws_live_fld_q` surface (round-9 gap: declared-field
    * proximity worked only against batch-built indexes). Deltas
    * deliberately left UNcompacted, like `liveEngine`.
    */
  private val liveFldCache = TrieMap.empty[String, WikiSearchEngine]
  def liveFieldEngine(s: SparkSession, dir: String): WikiSearchEngine =
    liveFldCache.getOrElseUpdate(dir, {
      val head = concat_ws(" ",
        slice(graft.functions.TextFunctions.tokenizeWs(col("text")), 1, 5))
      val docs = Tables.load(s, dir, "documents")
      val tmp = java.nio.file.Files.createTempDirectory("graft-live-fld").toString
      val m = new graft.streaming.LiveEngineMaintainer(s, tmp, NumPartitions,
        extraFields = Map("HEAD" -> head), offsetsFields = Set("HEAD"))
      (0 until 3).foreach(b =>
        m.processBatch(docs.filter(col("doc_id") % 3 === b), b.toLong))
      new WikiSearchEngine(s, m.latestIndex.get)
    })

  /** An engine served from a LIVE store: the documents table streamed
    * through `LiveEngineMaintainer` in three micro-batches, queried via
    * the maintainer's merge-on-read view (deltas deliberately left
    * UNcompacted — this is the read path `Compaction` exists to bound,
    * and the one the `ws_live_q` oracle gates). Built once per dir
    * (the store is immutable corpus state — same memoization
    * discipline as `engine`'s saved index).
    */
  private val liveStoreCache =
    TrieMap.empty[String, graft.streaming.LiveEngineMaintainer]
  private def liveStore(s: SparkSession, dir: String)
      : graft.streaming.LiveEngineMaintainer =
    liveStoreCache.getOrElseUpdate(dir, {
      val docs = Tables.load(s, dir, "documents")
      val tmp = java.nio.file.Files.createTempDirectory("graft-live-store").toString
      val m = new graft.streaming.LiveEngineMaintainer(s, tmp, NumPartitions)
      (0 until 3).foreach(b =>
        m.processBatch(docs.filter(col("doc_id") % 3 === b), b.toLong))
      m
    })

  private val liveCache = TrieMap.empty[String, WikiSearchEngine]
  def liveEngine(s: SparkSession, dir: String): WikiSearchEngine =
    liveCache.getOrElseUpdate(dir, new WikiSearchEngine(s, liveStore(s, dir).latestIndex.get))

  /** LSM TIME TRAVEL over the same live store: the snapshot at version
    * 1 of 2 — batch 2's documents (doc_id % 3 == 2) must be invisible,
    * which is exactly what the `ws_asof_q` oracle states. Same
    * memoization discipline; shares `liveStore`'s three-batch build
    * with `liveEngine` (two engines, one store).
    */
  private val asOfCache = TrieMap.empty[String, WikiSearchEngine]
  def asOfEngine(s: SparkSession, dir: String): WikiSearchEngine =
    asOfCache.getOrElseUpdate(dir, new WikiSearchEngine(s, liveStore(s, dir).indexAt(1L).get))

  /** An engine served from a live store WITH tombstone deletes: two
    * ingest batches (doc_id%3 ∈ {0,1}), a delete batch tombstoning
    * doc_id%7==2, then a LATE ingest batch (doc_id%3==2). The docs that
    * stay deleted are exactly %7==2 ∧ %3≠2 — the %7==2 ∧ %3==2 ones
    * arrive AFTER their tombstone and must be alive, so the oracle
    * encodes the LSM version-ordering rule, not just set subtraction.
    * Deltas deliberately UNcompacted (the masking read path is what
    * `ws_del_q` gates; physical erasure is StreamingSpec's half).
    */
  private val liveDelCache = TrieMap.empty[String, WikiSearchEngine]
  def liveDeleteEngine(s: SparkSession, dir: String): WikiSearchEngine =
    liveDelCache.getOrElseUpdate(dir, {
      val docs = Tables.load(s, dir, "documents")
      val tmp = java.nio.file.Files.createTempDirectory("graft-live-del").toString
      val m = new graft.streaming.LiveEngineMaintainer(s, tmp, NumPartitions)
      m.processBatch(docs.filter(col("doc_id") % 3 === 0), 0L)
      m.processBatch(docs.filter(col("doc_id") % 3 === 1), 1L)
      m.processDeletes(docs.filter(col("doc_id") % 7 === 2).select("doc_id"), 2L)
      m.processBatch(docs.filter(col("doc_id") % 3 === 2), 3L)
      new WikiSearchEngine(s, m.latestIndex.get)
    })

  /** Engine results → (doc_id, language) for the driver compare. */
  private def ids(df: DataFrame): DataFrame =
    df.select(col("docId").cast("bigint").as("doc_id"), col("language"))
      .orderBy("doc_id")

  private def q(name: String, jexl: String, duckdbWhere: String): NamedQuery =
    NamedQuery(
      name,
      s"""SELECT doc_id, lang AS language FROM documents
         |WHERE $duckdbWhere ORDER BY doc_id""".stripMargin) { (s, dir) =>
      ids(engine(s, dir).run(jexl))
    }

  private def toks = "list_filter(string_split(text, ' '), x -> x <> '')"

  /** The synonym-expansion query + its oracle, shared by the
    * session-configured (`ws_syn_q`) and store-rehydrated
    * (`ws_syn_persist_q`) entries; `SynTable` is the equivalence map
    * both engines carry (one via EngineConfig, one via the saved
    * `synonyms` part).
    */
  private val SynTable = Map("spark" -> Seq("vector"), "hash" -> Seq("merge"))
  private val synQuery = "TEXT == 'spark' and TEXT == 'join' and TEXT != 'hash'"
  private def synOracle: String =
    s"""SELECT doc_id, lang AS language FROM documents
       |WHERE (list_contains($toks, 'spark') OR list_contains($toks, 'vector'))
       |  AND list_contains($toks, 'join')
       |  AND NOT list_contains($toks, 'hash')
       |  AND NOT list_contains($toks, 'merge')
       |ORDER BY doc_id""".stripMargin

  /** The field-generic ordered-proximity query + its oracle, shared by
    * the batch-built (`ws_fld_q`) and live-store (`ws_live_fld_q`)
    * entries — same corpus, same semantics, two serving paths.
    */
  private val fldQuery = "TEXT == 'filter' and f:onear(HEAD, 2, 'spark', 'join')"
  private def fldOracle: String =
    s"""WITH t AS (SELECT doc_id, lang, $toks AS tk FROM documents),
       |h AS (SELECT doc_id, lang, tk, list_slice(tk, 1, 5) AS hd FROM t),
       |p AS (SELECT doc_id, lang, tk,
       |  list_filter(list_transform(hd, (x,i) -> CASE WHEN x = 'spark' THEN i END),
       |    v -> v IS NOT NULL) AS pa,
       |  list_filter(list_transform(hd, (x,i) -> CASE WHEN x = 'join' THEN i END),
       |    v -> v IS NOT NULL) AS pb
       | FROM h)
       |SELECT doc_id, lang AS language FROM p
       |WHERE list_contains(tk, 'filter')
       |  AND len(list_filter(pa, s ->
       |        len(list_filter(pb, q -> q > s AND q <= s + 2)) > 0)) > 0
       |ORDER BY doc_id""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    // J1 — multi-term AND intersection via the global index
    q("ws_q1_and",
      "TEXT == 'spark' and TEXT == 'join' and TEXT == 'window'",
      s"list_contains($toks, 'spark') AND list_contains($toks, 'join') AND list_contains($toks, 'window')"),

    // J2 — OR union + dedup
    q("ws_q2_or",
      "TEXT == 'vector' or TEXT == 'stream'",
      s"(list_contains($toks, 'vector') OR list_contains($toks, 'stream'))"),

    // AND-of-OR (the reference's "fast and (furious or furriest)" shape)
    q("ws_q3_and_or",
      "TEXT == 'spark' and (TEXT == 'vector' or TEXT == 'stream')",
      s"list_contains($toks, 'spark') AND (list_contains($toks, 'vector') OR list_contains($toks, 'stream'))"),

    // J4 — negation anti-probe (absence semantics)
    q("ws_q4_not",
      "TEXT == 'spark' and TEXT != 'hash'",
      s"list_contains($toks, 'spark') AND NOT list_contains($toks, 'hash')"),

    // forward-index prefix wildcard (RangeCalculator trailing-wildcard rule)
    q("ws_q5_prefix",
      "TEXT =~ 'str.*'",
      s"len(list_filter($toks, x -> x LIKE 'str%')) > 0"),

    // reverse-index leading wildcard
    q("ws_q6_suffix",
      "TEXT =~ '.*dow'",
      s"len(list_filter($toks, x -> x LIKE '%dow')) > 0"),

    // f:between function term + indexed field equality
    q("ws_q7_between",
      "SOURCE == 'src3' and f:between(NCHARS, 200, 400)",
      "source = 'src3' AND n_chars BETWEEN 200 AND 400"),

    // J7 — bounded range fused onto the index
    q("ws_q8_range",
      "NCHARS >= 100 and NCHARS < 300 and TEXT == 'table'",
      s"n_chars >= 100 AND n_chars < 300 AND list_contains($toks, 'table')"),

    // mixed fielded + boolean nesting
    q("ws_q9_mixed",
      "(SOURCE == 'src1' or SOURCE == 'src2') and TEXT == 'query'",
      s"(source = 'src1' OR source = 'src2') AND list_contains($toks, 'query')"),

    // field-generic positional offsets composed in the query language:
    // ordered proximity on a DECLARED second field (HEAD = first five
    // tokens) intersected with a TEXT EQ — the oracle re-derives the
    // head slice and the ordered-window predicate from raw text
    NamedQuery("ws_fld_q", fldOracle) { (s, dir) =>
      ids(fieldOffsetsEngine(s, dir).run(fldQuery))
    },

    // the same field-generic proximity served from a LIVE store: the
    // build declares HEAD positional, each micro-batch writes a
    // field_postings delta, and the query runs over the merge-on-read
    // union — identical oracle (the store holds the same corpus), so a
    // pass proves the live path equals the batch-built one
    NamedQuery("ws_live_fld_q", fldOracle) { (s, dir) =>
      ids(liveFieldEngine(s, dir).run(fldQuery))
    },

    // beyond-reference: query-time synonym expansion — EQ widens to the
    // equivalence set (OR splice), NE widens to the AND of exclusions;
    // the oracle states the expanded semantics declaratively
    NamedQuery("ws_syn_q", synOracle) { (s, dir) =>
      ids(synonymEngine(s, dir).run(synQuery))
    },

    // the same expansion REHYDRATED from a saved store: the synonym
    // table rides the index (a `synonyms` part beside metadata), the
    // serving engine is constructed with the DEFAULT config over a
    // fresh load — identical oracle, so a pass proves two sessions
    // sharing the store cannot disagree on expanded semantics
    NamedQuery("ws_syn_persist_q", synOracle) { (s, dir) =>
      ids(synonymPersistEngine(s, dir).run(synQuery))
    },

    // the same agreement proof for a LIVE store: the writing maintainer
    // declares the table (persisted once at store level), the SERVING
    // maintainer is a fresh one with no synonym wiring — identical
    // oracle, so a pass proves live stores carry query semantics the
    // way batch stores do
    NamedQuery("ws_live_syn_q", synOracle) { (s, dir) =>
      ids(liveSynonymEngine(s, dir).run(synQuery))
    },

    // unfielded bare term → index-driven field discovery
    q("ws_q10_unfielded",
      "'spark'",
      s"list_contains($toks, 'spark')"),

    // opaque mid-string wildcard → full-scan residual path
    q("ws_q11_regex_scan",
      "TEXT =~ 'c.l.mn'",
      s"len(list_filter($toks, x -> regexp_matches(x, '^c.l.mn$$'))) > 0"),

    // trigram-accelerated opaque regexes (beyond-reference): both terms
    // carry ≥3-char mandatory literal runs, so each plans as an exact
    // vocabulary-verified EQ leaf instead of a full scan — composed
    // under AND to exercise the leaves inside the boolean DAG
    q("ws_infix_q",
      "TEXT =~ 'cust.mer' and TEXT =~ '.*erge.*'",
      s"len(list_filter($toks, x -> regexp_matches(x, '^cust.mer$$'))) > 0" +
        s" AND len(list_filter($toks, x -> x LIKE '%erge%')) > 0"),

    // S11/A5 — the global index itself: per-term document frequency
    NamedQuery(
      "ws_index_termfreq",
      s"""SELECT term, CAST(count(*) AS BIGINT) AS doc_freq FROM (
         |  SELECT DISTINCT doc_id, unnest($toks) AS term FROM documents) q
         |GROUP BY term ORDER BY term""".stripMargin) { (s, dir) =>
      index(s, dir).globalIndex
        .filter(col("fieldName") === "TEXT")
        .groupBy(col("fieldValue").as("term"))
        .agg(sum(col("count")).as("doc_freq"))
        .orderBy("term")
    },

    // A2 — term postings with positions (TermWeight.Info analogue)
    NamedQuery(
      "ws_postings",
      s"""SELECT doc_id, term,
         |  CAST(len(list_filter(toks, x -> x = term)) AS INT) AS occurrences,
         |  CAST(list_position(toks, term) - 1 AS INT) AS first_pos
         |FROM (SELECT doc_id, $toks AS toks,
         |        unnest(list_distinct($toks)) AS term FROM documents) q
         |ORDER BY doc_id, term""".stripMargin) { (s, dir) =>
      index(s, dir).termPostings
        .select(col("docId").cast("bigint").as("doc_id"), col("term"),
          size(col("offsets")).as("occurrences"),
          col("offsets").getItem(0).as("first_pos"))
        .orderBy("doc_id", "term")
    },

    // P7/P11 — language auths restrict the scan
    NamedQuery(
      "ws_q12_auths",
      s"""SELECT doc_id, lang AS language FROM documents
         |WHERE list_contains($toks, 'spark') AND lang IN ('en', 'de')
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      ids(engine(s, dir).run("TEXT == 'spark'", auths = Seq("en", "de")))
    },

    // f:abs(field) compared to a literal (QueryFunctions.java:48-66)
    NamedQuery(
      "ws_q13_fnabs",
      s"""SELECT doc_id, lang AS language FROM documents
         |WHERE abs(n_chars) >= 300 AND list_contains($toks, 'data')
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      ids(engine(s, dir).run("f:abs(NCHARS) >= 300 and TEXT == 'data'"))
    },

    // numeric equality on an identity-normalized indexed field
    NamedQuery(
      "ws_q14_id_eq",
      """SELECT doc_id, lang AS language FROM documents
        |WHERE doc_id = 42 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      ids(engine(s, dir).run("ID == 42"))
    },

    // §2.10 — incremental index maintenance: build on half the corpus,
    // merge a delta for the rest, verify the merged index equals a
    // from-scratch build (oracle re-derives doc frequency from raw text)
    NamedQuery(
      "ws_index_incremental",
      s"""SELECT term, CAST(count(*) AS BIGINT) AS doc_freq FROM (
         |  SELECT DISTINCT doc_id, unnest($toks) AS term FROM documents) q
         |GROUP BY term ORDER BY term""".stripMargin) { (s, dir) =>
      val docs  = Tables.load(s, dir, "documents")
      val base  = IndexBuilder
        .fromDocumentsTable(s, docs.filter(col("doc_id") % 2 === 0), NumPartitions).globalIndex
      val delta = IndexBuilder
        .fromDocumentsTable(s, docs.filter(col("doc_id") % 2 === 1), NumPartitions).globalIndex
      graft.streaming.IncrementalIndex.merge(base, delta)
        .filter(col("fieldName") === "TEXT")
        .groupBy(col("fieldValue").as("term"))
        .agg(sum(col("count")).as("doc_freq"))
        .orderBy("term")
    },

    // Phrase adjacency via term-posting offsets (beyond-reference: the
    // reference stores TermWeight word offsets but never queries them) —
    // postings of both terms join on the doc key, adjacency = any offset
    // of t1 whose successor position is an offset of t2. Co-partitioned
    // join on (partition, docId); no corpus scan.
    NamedQuery(
      "ws_phrase",
      s"""SELECT doc_id, lang AS language FROM (
         |  SELECT doc_id, lang, $toks AS tk FROM documents) q
         |WHERE len(list_filter(generate_series(1, len(tk) - 1),
         |      i -> tk[i] = 'spark' AND tk[i+1] = 'join')) > 0
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val tp = index(s, dir).termPostings
      val p1 = tp.filter(col("term") === "spark")
        .select(col("partition"), col("language"), col("docId"), col("offsets").as("o1"))
      val p2 = tp.filter(col("term") === "join")
        .select(col("partition"), col("language"), col("docId"), col("offsets").as("o2"))
      p1.join(p2, Seq("partition", "language", "docId"))
        .filter(arrays_overlap(transform(col("o1"), x => x + 1), col("o2")))
        .select(col("docId").cast("bigint").as("doc_id"), col("language"))
        .orderBy("doc_id")
    },

    // negated NUMERIC comparison over a non-numeric multi-value field:
    // pins the three-valued-logic fix (Compiler.anyMatch) — every token
    // try_casts to null, exists must coalesce to false, so !exists is
    // TRUE (absence semantics), not NULL-dropped
    q("ws_q15_ne_numeric_on_text",
      "TEXT == 'data' and TEXT != '300'",
      s"list_contains($toks, 'data') AND len(list_filter($toks, x -> TRY_CAST(x AS DOUBLE) = 300)) = 0"),

    // negated NUMERIC range over word tokens (kept as a Not wrapper by
    // QExpr.normalize → compiles to !exists) — same NULL hazard via
    // Compiler.cmp: every non-numeric token's try_cast is null, so the
    // un-coalesced exists would be NULL and the doc silently dropped
    q("ws_q16_not_range",
      "not (TEXT < '42') and TEXT == 'data'",
      s"len(list_filter($toks, x -> TRY_CAST(x AS DOUBLE) < 42)) = 0 AND list_contains($toks, 'data')"),

    // Beyond-reference: BM25 ranked retrieval over the term index. The
    // reference returns unranked result sets; its index already stores
    // everything BM25 needs (tf via TermWeight offsets, df via the
    // global index) but never scores. Inputs are exact integers (tf, dl,
    // df, N) and one exactly-derived double (avgdl = integer-sum / count),
    // so Spark and DuckDB compute the same formula on identical inputs;
    // the per-term contributions are summed in EXPLICIT term order
    // (c1+c2+c3, not an unordered SUM) so float association cannot
    // diverge between engines, then rounded to 4dp. Plan shape: postings
    // filtered to the query terms (tiny) join broadcast df + corpus
    // stats, one doc-keyed join for document length, one global
    // row_number for the rank — the last is a single-partition sort over
    // the RESULT SET only (bounded, like any ranked results page). At
    // production scale dl would be a stored index column; here it derives
    // from the raw table to keep the index schema stable.
    NamedQuery(
      "ws_bm25",
      s"""WITH dl AS (SELECT doc_id, CAST(len($toks) AS DOUBLE) AS dl FROM documents),
         |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
         |tf AS (SELECT doc_id, term, CAST(len(list_filter(toks, x -> x = term)) AS DOUBLE) AS tf
         |       FROM (SELECT doc_id, $toks AS toks,
         |               unnest(list_distinct($toks)) AS term FROM documents) q
         |       WHERE term IN ('spark', 'join', 'vector')),
         |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
         |contrib AS (
         |  SELECT tf.doc_id, tf.term,
         |    ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
         |      * (tf.tf * 2.2) / (tf.tf + 1.2 * (1 - 0.75 + (0.75 * dl.dl) / stats.avgdl)) AS c
         |  FROM tf, df, dl, stats WHERE tf.term = df.term AND tf.doc_id = dl.doc_id),
         |scored AS (
         |  SELECT doc_id,
         |    ROUND(coalesce(max(CASE WHEN term = 'spark'  THEN c END), 0)
         |        + coalesce(max(CASE WHEN term = 'join'   THEN c END), 0)
         |        + coalesce(max(CASE WHEN term = 'vector' THEN c END), 0), 4) AS score
         |  FROM contrib GROUP BY doc_id)
         |SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
         |  doc_id, score
         |FROM scored ORDER BY rank""".stripMargin) { (s, dir) =>
      // Single implementation: the ENGINE's BM25 (WikiSearchEngine.rank
      // — dl and corpus stats from the index's materialized doc_lengths
      // / corpus_stats tables). Numeric tie-break so equal-score ties
      // match the oracle's numeric doc_id ordering.
      engine(s, dir).rank(Seq("spark", "join", "vector"),
        tieBreak = col("docId").cast("bigint"))
        .select(col("rank"), col("docId").cast("bigint").as("doc_id"), col("score"))
        .orderBy("rank")
    },

    // Beyond-reference: more-like-this — top-k documents sharing
    // vocabulary with a source doc, scored by rarity-weighted
    // coordination (each shared distinct term contributes N − df, an
    // integer idf surrogate — exact integer arithmetic, so the oracle
    // is bit-portable where a float tf-idf sum would hinge on
    // association order). Bench: ws_ml.
    NamedQuery(
      "ws_mlt_q",
      s"""WITH tf AS (SELECT doc_id, unnest(list_distinct($toks)) AS term FROM documents),
         |src AS (SELECT DISTINCT term FROM tf WHERE doc_id = 101),
         |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
         |scored AS (
         |  SELECT tf.doc_id, SUM(n.n - df.df) AS score
         |  FROM tf JOIN src USING (term) JOIN df USING (term) CROSS JOIN n
         |  WHERE tf.doc_id <> 101 GROUP BY tf.doc_id)
         |SELECT doc_id, CAST(score AS BIGINT) AS score FROM scored
         |ORDER BY score DESC, doc_id LIMIT 25""".stripMargin) { (s, dir) =>
      engine(s, dir)
        .moreLikeThis("101", 25, tieBreak = col("docId").cast("bigint"))
        .select(col("docId").cast("bigint").as("doc_id"), col("score"))
    },

    // Beyond-reference: HYBRID retrieval — the BM25 lexical ranking fused
    // with a semantic cosine top-k over the embeddings table by
    // Reciprocal Rank Fusion (HybridSearch.rrfFuse; kRrf=60 per the
    // original paper). vec_id is doc_id-aligned by the generator, so the
    // two lists rank the same id space. Only RANKS enter the fusion, so
    // the score-scale mismatch between BM25 and cosine never needs
    // calibration; the oracle re-derives both rankings (the ws_bm25 CTE
    // verbatim + an exact-cosine row_number) and the same explicit
    // c1+c2 contribution chain. Bench: ws_hy.
    NamedQuery(
      "ws_hybrid",
      s"""WITH dl AS (SELECT doc_id, CAST(len($toks) AS DOUBLE) AS dl FROM documents),
         |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
         |tf AS (SELECT doc_id, term, CAST(len(list_filter(toks, x -> x = term)) AS DOUBLE) AS tf
         |       FROM (SELECT doc_id, $toks AS toks,
         |               unnest(list_distinct($toks)) AS term FROM documents) q
         |       WHERE term IN ('spark', 'join', 'vector')),
         |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
         |contrib AS (
         |  SELECT tf.doc_id, tf.term,
         |    ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
         |      * (tf.tf * 2.2) / (tf.tf + 1.2 * (1 - 0.75 + (0.75 * dl.dl) / stats.avgdl)) AS c
         |  FROM tf, df, dl, stats WHERE tf.term = df.term AND tf.doc_id = dl.doc_id),
         |scored AS (
         |  SELECT doc_id,
         |    ROUND(coalesce(max(CASE WHEN term = 'spark'  THEN c END), 0)
         |        + coalesce(max(CASE WHEN term = 'join'   THEN c END), 0)
         |        + coalesce(max(CASE WHEN term = 'vector' THEN c END), 0), 4) AS score
         |  FROM contrib GROUP BY doc_id),
         |bmr AS (SELECT r, doc_id FROM (
         |  SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS r,
         |         doc_id FROM scored) b WHERE r <= 50),
         |cosr AS (SELECT doc_id, r FROM (
         |  SELECT c.vec_id AS doc_id,
         |    CAST(row_number() OVER (ORDER BY
         |      (list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[]))
         |        / (sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))
         |         * sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))))
         |      DESC, c.vec_id) AS BIGINT) AS r
         |  FROM embeddings c JOIN embeddings q ON q.vec_id = 101 AND c.vec_id <> 101) t
         |  WHERE r <= 50),
         |fused AS (SELECT coalesce(b.doc_id, c.doc_id) AS doc_id,
         |  ROUND(coalesce(CAST(1 AS DOUBLE) / CAST(60 + b.r AS DOUBLE), 0)
         |      + coalesce(CAST(1 AS DOUBLE) / CAST(60 + c.r AS DOUBLE), 0), 6) AS score
         |  FROM bmr b FULL OUTER JOIN cosr c ON b.doc_id = c.doc_id)
         |SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
         |  doc_id, score
         |FROM fused ORDER BY rank LIMIT 20""".stripMargin) { (s, dir) =>
      // r12 optimization: the whole hybrid plan now lives on the
      // engine's AQE-OFF serving session (the BM25 page's own session)
      // — and so does the RETURNED frame: like the other engine-backed
      // entries (ws_facets, ws_complete_q), collect/show is fine from
      // anywhere, but registering it as a temp view or joining it with
      // caller-session frames is a cross-session analysis error; use
      // callerEngine for callers that must hold caller-session state.
      // The embeddings table is loaded on the serving session too —
      // previously the whole query ran
      // on the caller's AQE-on session (callerEngine) and a warm
      // ProfileQuery measured 9 sequential AQE stage-materialization
      // jobs summing 1.0 s inside a 2.1 s wall. The serving-path
      // argument is the engine's own (documented at `engine()`): both
      // pages are FIXED bounded-result DAGs (TakeOrderedAndProject +
      // broadcast query set) whose shape AQE cannot improve at any
      // corpus size, while each query-stage round trip sits on the
      // latency path. Same plan, same rows — the gate re-proves the
      // hash. Each side contributes its top-50 PAGE (rankTopK plans as
      // TakeOrderedAndProject — no corpus-wide window), the production
      // hybrid-serving shape; ranks are then numbered over the 50-row
      // page (bounded window).
      val bmPage = engine(s, dir)
        .rankTopK(Seq("spark", "join", "vector"), k = 50,
          tieBreak = col("docId").cast("bigint"))
      val serving = bmPage.sparkSession
      val bm = bmPage.select(
        col("docId").cast("bigint").as("id"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("docId").cast("bigint"))).as("rank"))
      val emb = Tables.load(serving, dir, "embeddings")
      val cos = graft.pipeline.Similarity
        .topK(emb, emb.filter(col("vec_id") === 101), k = 50)
        .select(col("neighbor_id").as("id"), col("rank"))
      HybridSearch.rrfFuse(Seq(bm, cos), kRrf = 60, k = 20)
        .select(col("rank"), col("id").as("doc_id"), col("score"))
    },

    // Beyond-reference: facet counts over a query's result set — the
    // standard search-results sidebar (result count per metadata value).
    // Engine hits (a bounded candidate set) broadcast-join back to the
    // metadata columns; the aggregation is over the result set, not the
    // corpus.
    NamedQuery(
      "ws_facets",
      s"""SELECT lang AS language, source, count(*) AS n FROM documents
         |WHERE list_contains($toks, 'spark')
         |GROUP BY lang, source ORDER BY language, source""".stripMargin) { (s, dir) =>
      // Single implementation: WikiSearchEngine.facets over the hit
      // set's own fields map (every doc carries exactly one SOURCE).
      engine(s, dir).facets("TEXT == 'spark'", "SOURCE")
        .select(col("language"), col("value").as("source"), col("n"))
        .orderBy("language", "source")
    },

    // Prefix autocomplete from the value-sorted global index (the
    // query-box surface): StartsWith pushes to the parquet scan — the
    // forward twin of the reverse-index suffix probe — and df ranking
    // reuses the ws_index_termfreq-verified count surface. Bench: ws_ac.
    NamedQuery(
      "ws_complete_q",
      s"""SELECT term, df FROM (
         |  SELECT token AS term, CAST(count(*) AS BIGINT) AS df
         |  FROM (SELECT DISTINCT doc_id, unnest($toks) AS token FROM documents) q
         |  WHERE token LIKE 's%' GROUP BY token) t
         |ORDER BY df DESC, term LIMIT 5""".stripMargin) { (s, dir) =>
      engine(s, dir).completeTerms("s", k = 5)
    },

    // Index catalog statistics (Engine.indexStats — the ANALYZE
    // surface): per-language doc/vocabulary/posting/token counts read
    // from the STORED index tables; the oracle re-derives all four from
    // the raw text, so a green hash proves the stored postings and
    // offset arrays are complete. Bench: ws_st.
    NamedQuery(
      "ws_stats_q",
      s"""WITH tok AS (SELECT doc_id, lang, unnest($toks) AS term FROM documents),
         |base AS (SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |                CAST(count(DISTINCT term) AS BIGINT) AS n_terms,
         |                CAST(count(*) AS BIGINT) AS n_tokens
         |         FROM tok GROUP BY lang),
         |post AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_postings
         |         FROM (SELECT DISTINCT lang, doc_id, term FROM tok) p GROUP BY lang)
         |SELECT base.lang AS language, n_docs, n_terms, n_postings, n_tokens
         |FROM base JOIN post ON base.lang = post.lang
         |ORDER BY language""".stripMargin) { (s, dir) =>
      engine(s, dir).indexStats()
    },

    // Field collapsing: one representative hit per SOURCE over the
    // query's result set plus the collapsed group size — `facets` with a
    // witness document (Engine.collapse; argmin groupBy, no window).
    // Bench: ws_cp.
    NamedQuery(
      "ws_collapse_q",
      s"""SELECT source AS value, count(*) AS n, min(doc_id) AS top_doc
         |FROM documents WHERE list_contains($toks, 'spark')
         |GROUP BY source ORDER BY n DESC, value""".stripMargin) { (s, dir) =>
      engine(s, dir).collapse("TEXT == 'spark'", "SOURCE")
    },

    // Numeric range-facet: histogram of a query's hit set over an
    // integer field — `facets`' numeric companion (route /histogram).
    // Integer lo/width make floor((v−lo)/width) exact in doubles, so
    // the oracle re-derives buckets bit-identically. Bench: ws_hg.
    NamedQuery(
      "ws_hist_q",
      s"""SELECT CAST(floor(n_chars / 100) AS BIGINT) AS bucket, count(*) AS n
         |FROM documents
         |WHERE (source = 'src1' OR source = 'src2')
         |  AND n_chars >= 0 AND n_chars < 1000
         |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      engine(s, dir).histogram(
        "SOURCE == 'src1' or SOURCE == 'src2'", "NCHARS",
        lo = 0L, width = 100L, buckets = 10)
    },

    // Beyond-reference: typo-tolerant term lookup ("did you mean") —
    // SymSpell 1-deletion-neighborhood join over the vocabulary-sized
    // term dictionary + exact levenshtein verify. The typo 'sow' matches
    // 'row' (substitution) and 'slow' (insertion); the oracle states the
    // semantics directly as a levenshtein filter over per-doc-distinct
    // tokens — agreement proves the neighborhood join is a complete
    // candidate generator on this corpus.
    NamedQuery(
      "ws_fuzzy",
      s"""SELECT term, CAST(count(*) AS BIGINT) AS df FROM (
         |  SELECT doc_id, unnest(list_distinct($toks)) AS term FROM documents) d
         |WHERE levenshtein(term, 'sow') <= 1
         |GROUP BY term ORDER BY term""".stripMargin) { (s, dir) =>
      engine(s, dir).fuzzyTerms("sow").orderBy("term")
    },

    // Beyond-reference: NEAR/3 proximity — 'spark' and 'join' within 3
    // tokens, either order, answered entirely from stored offsets (no
    // content fetch). The oracle re-derives token positions from raw
    // text; the predicate uses only position differences, so the two
    // sides' offset bases (0- vs 1-based) cancel.
    NamedQuery(
      "ws_near",
      s"""WITH p AS (SELECT doc_id,
         |  list_filter(list_transform(tk, (x,i) -> CASE WHEN x = 'spark' THEN i END),
         |    v -> v IS NOT NULL) AS pa,
         |  list_filter(list_transform(tk, (x,i) -> CASE WHEN x = 'join' THEN i END),
         |    v -> v IS NOT NULL) AS pb
         | FROM (SELECT doc_id, $toks AS tk FROM documents) t)
         |SELECT doc_id FROM p
         |WHERE len(list_filter(pa, i ->
         |        len(list_filter(pb, j -> abs(i - j) <= 3)) > 0)) > 0
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      engine(s, dir).near("spark", "join", k = 3)
        .select(col("docId").cast("bigint").as("doc_id")).orderBy("doc_id")
    },

    // The same proximity operator composed INSIDE the query language —
    // round 7's `f:near` (the reference's f: function namespace shape,
    // QueryParser.java:763-800): an OR-of-EQ sibling drives index
    // candidates, the NearLeaf intersects exactly from stored offsets,
    // and the residual re-verifies the EQ branches. Bench key: ws_nq.
    NamedQuery(
      "ws_near_q",
      s"""WITH p AS (SELECT doc_id, source,
         |  list_filter(list_transform(tk, (x,i) -> CASE WHEN x = 'spark' THEN i END),
         |    v -> v IS NOT NULL) AS pa,
         |  list_filter(list_transform(tk, (x,i) -> CASE WHEN x = 'join' THEN i END),
         |    v -> v IS NOT NULL) AS pb
         | FROM (SELECT doc_id, source, $toks AS tk FROM documents) t)
         |SELECT doc_id FROM p
         |WHERE source IN ('src3', 'src7')
         |  AND len(list_filter(pa, i ->
         |        len(list_filter(pb, j -> abs(i - j) <= 3)) > 0)) > 0
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      engine(s, dir)
        .run("(SOURCE == 'src3' or SOURCE == 'src7') and f:near(TEXT, 'spark', 'join', 3)")
        .select(col("docId").cast("bigint").as("doc_id")).orderBy("doc_id")
    },

    // LIVE-store serving on the correctness gate: the same documents
    // table streamed through LiveEngineMaintainer in 3 micro-batches,
    // served through merge-on-read over the UNcompacted deltas — the
    // oracle states the declarative semantics, so a green hash proves
    // per-batch extraction + delta union + lossy-index fold + the
    // whole query path compose to the batch-equivalent answer.
    NamedQuery(
      "ws_live_q",
      s"""WITH t AS (SELECT doc_id, lang, $toks AS tk FROM documents),
         |p AS (SELECT doc_id, lang, tk,
         |  list_filter(list_transform(tk, (x,i) -> CASE WHEN x = 'hash' THEN i END),
         |    v -> v IS NOT NULL) AS pa,
         |  list_filter(list_transform(tk, (x,i) -> CASE WHEN x = 'join' THEN i END),
         |    v -> v IS NOT NULL) AS pb
         | FROM t)
         |SELECT doc_id, lang AS language FROM p
         |WHERE list_contains(tk, 'spark')
         |  AND (len(list_filter(pa, s ->
         |         len(list_filter(pb, q -> q >= s AND q <= s + 4)) > 0)) > 0
         |    OR len(list_filter(pb, s ->
         |         len(list_filter(pa, q -> q >= s AND q <= s + 4)) > 0)) > 0)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      ids(liveEngine(s, dir).run("TEXT == 'spark' and f:near(TEXT, 4, 'hash', 'join')"))
    },

    // LSM TIME TRAVEL on the correctness gate: the SAME live store as
    // ws_live_q, served at committed version 1 of 2 — batch 2's docs
    // (doc_id % 3 == 2) must be invisible to the snapshot while the
    // store itself serves them at latest (ws_live_q proves that half).
    // The oracle is fully declarative: the visibility cut is the batch
    // schedule itself.
    NamedQuery(
      "ws_asof_q",
      s"""SELECT doc_id, lang AS language FROM documents
         |WHERE doc_id % 3 <> 2
         |  AND list_contains($toks, 'spark')
         |  AND (list_contains($toks, 'vector') OR list_contains($toks, 'stream'))
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      ids(asOfEngine(s, dir).run(
        "TEXT == 'spark' and (TEXT == 'vector' or TEXT == 'stream')"))
    },

    // LIVE-store DELETES on the correctness gate: tombstoned docs must
    // vanish from serving, EXCEPT those re-ingested after their
    // tombstone (version-ordered masking — see liveDeleteEngine). The
    // oracle is fully declarative: the stayed-deleted set is
    // %7==2 ∧ %3≠2 by construction of the batch/delete schedule.
    NamedQuery(
      "ws_del_q",
      s"""SELECT doc_id, lang AS language FROM documents
         |WHERE list_contains($toks, 'vector') AND list_contains($toks, 'stream')
         |  AND NOT (doc_id % 7 = 2 AND doc_id % 3 <> 2)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      ids(liveDeleteEngine(s, dir).run("TEXT == 'vector' and TEXT == 'stream'"))
    },

    // k-term windowed proximity composed INSIDE the query language —
    // round 8's generalization of f:near from a pair to n terms
    // (`f:near(TEXT, k, t1..tn)`): all terms inside some window of span
    // ≤ k. The oracle states the same window predicate the engine's
    // n-way offsets join enforces (∃ start s in SOME term's positions
    // with every term present in [s, s+k] — exact because a qualifying
    // window's minimum is one of the terms' positions). Bench: ws_kq.
    NamedQuery(
      "ws_knear_q",
      s"""WITH t AS (SELECT doc_id, source, $toks AS tk FROM documents),
         |p AS (SELECT doc_id, source,
         |  list_filter(list_transform(tk, (x,i) -> CASE WHEN x = 'sort' THEN i END),
         |    v -> v IS NOT NULL) AS pa,
         |  list_filter(list_transform(tk, (x,i) -> CASE WHEN x = 'merge' THEN i END),
         |    v -> v IS NOT NULL) AS pb,
         |  list_filter(list_transform(tk, (x,i) -> CASE WHEN x = 'join' THEN i END),
         |    v -> v IS NOT NULL) AS pc
         | FROM t)
         |SELECT doc_id FROM p
         |WHERE source IN ('src3', 'src7')
         |  AND (len(list_filter(pa, s ->
         |         len(list_filter(pa, q -> q >= s AND q <= s + 8)) > 0 AND
         |         len(list_filter(pb, q -> q >= s AND q <= s + 8)) > 0 AND
         |         len(list_filter(pc, q -> q >= s AND q <= s + 8)) > 0)) > 0
         |    OR len(list_filter(pb, s ->
         |         len(list_filter(pa, q -> q >= s AND q <= s + 8)) > 0 AND
         |         len(list_filter(pb, q -> q >= s AND q <= s + 8)) > 0 AND
         |         len(list_filter(pc, q -> q >= s AND q <= s + 8)) > 0)) > 0
         |    OR len(list_filter(pc, s ->
         |         len(list_filter(pa, q -> q >= s AND q <= s + 8)) > 0 AND
         |         len(list_filter(pb, q -> q >= s AND q <= s + 8)) > 0 AND
         |         len(list_filter(pc, q -> q >= s AND q <= s + 8)) > 0)) > 0)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      engine(s, dir)
        .run("(SOURCE == 'src3' or SOURCE == 'src7') and f:near(TEXT, 8, 'sort', 'merge', 'join')")
        .select(col("docId").cast("bigint").as("doc_id")).orderBy("doc_id")
    },

    // Typo tolerance composed INSIDE the query language — round 7's
    // f:fuzzy, completing the f: namespace trio (near above, fuzzy
    // here; VERDICT r6 "what's missing" #1). Plan side: SymSpell Lev≤1
    // expansion of 'sow' over the TEXT vocabulary becomes a multi-form
    // EQ leaf driving index candidates; the residual re-verifies with
    // the exact levenshtein predicate, which is ALSO what the oracle
    // states — so a green hash proves expansion+residual together
    // equal the declarative semantics.
    NamedQuery(
      "ws_fuzzy_q",
      s"""WITH t AS (SELECT doc_id, source, $toks AS tk FROM documents)
         |SELECT doc_id FROM t
         |WHERE source IN ('src3', 'src7')
         |  AND len(list_filter(tk, x -> levenshtein(x, 'sow') <= 1)) > 0
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      engine(s, dir)
        .run("(SOURCE == 'src3' or SOURCE == 'src7') and f:fuzzy(TEXT, 'sow')")
        .select(col("docId").cast("bigint").as("doc_id")).orderBy("doc_id")
    },

    // Ordered windowed proximity (round 8): f:onear(TEXT, k, t1..tn)
    // completes the proximity algebra — near = any order within a
    // window, onear = strictly increasing positions in argument order
    // within the window (Lucene SpanNear-in-order), phrase = adjacent.
    // The oracle chains the same strictly-increasing window predicate
    // declaratively. Bench: ws_oq.
    NamedQuery(
      "ws_onear_q",
      s"""WITH t AS (SELECT doc_id, source, $toks AS tk FROM documents),
         |p AS (SELECT doc_id, source,
         |  list_filter(list_transform(tk, (x,i) -> CASE WHEN x = 'sort' THEN i END),
         |    v -> v IS NOT NULL) AS pa,
         |  list_filter(list_transform(tk, (x,i) -> CASE WHEN x = 'merge' THEN i END),
         |    v -> v IS NOT NULL) AS pb,
         |  list_filter(list_transform(tk, (x,i) -> CASE WHEN x = 'join' THEN i END),
         |    v -> v IS NOT NULL) AS pc
         | FROM t)
         |SELECT doc_id FROM p
         |WHERE source IN ('src4', 'src5')
         |  AND len(list_filter(pa, s ->
         |        len(list_filter(pb, q -> q > s AND q <= s + 8 AND
         |          len(list_filter(pc, r -> r > q AND r <= s + 8)) > 0)) > 0)) > 0
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      engine(s, dir)
        .run("(SOURCE == 'src4' or SOURCE == 'src5') and f:onear(TEXT, 8, 'sort', 'merge', 'join')")
        .select(col("docId").cast("bigint").as("doc_id")).orderBy("doc_id")
    },

    // Distance-2 option of f:fuzzy (round 8 stretch): SymSpell
    // 2-deletion neighborhoods on both sides, exact levenshtein<=2
    // verify on plan candidates AND in the residual — the oracle states
    // the same declarative predicate, same term as ws_fuzzy_q so the
    // d=1 vs d=2 boundary is pinned on identical data. Bench: ws_f2.
    NamedQuery(
      "ws_fuzzy2_q",
      s"""WITH t AS (SELECT doc_id, source, $toks AS tk FROM documents)
         |SELECT doc_id FROM t
         |WHERE source IN ('src3', 'src7')
         |  AND len(list_filter(tk, x -> levenshtein(x, 'sow') <= 2)) > 0
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      engine(s, dir)
        .run("(SOURCE == 'src3' or SOURCE == 'src7') and f:fuzzy(TEXT, 'sow', 2)")
        .select(col("docId").cast("bigint").as("doc_id")).orderBy("doc_id")
    },

    // Ordered adjacency composed INSIDE the query language — f:phrase,
    // the third stored-offset leaf (near = either order within k,
    // phrase = adjacent in order). The plan shares `phraseStarts` with
    // ws_psnip's display surface; like f:near the leaf is
    // index-enforced (positions aren't in the event view), so it
    // composes conjunctively and always intersects exactly. The oracle
    // re-finds adjacency in the raw text. Bench key: ws_pq.
    NamedQuery(
      "ws_phrase_q",
      s"""WITH t AS (SELECT doc_id, source, $toks AS tk FROM documents)
         |SELECT doc_id FROM t
         |WHERE source IN ('src3', 'src7')
         |  AND len(list_filter(generate_series(1, len(tk) - 1),
         |        i -> tk[i] = 'spark' AND tk[i+1] = 'join')) > 0
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      engine(s, dir)
        .run("(SOURCE == 'src3' or SOURCE == 'src7') and f:phrase(TEXT, 'spark join')")
        .select(col("docId").cast("bigint").as("doc_id")).orderBy("doc_id")
    },

    // S12 — document content store round-trip (base64 in, decoded out)
    NamedQuery(
      "ws_content_fetch",
      """SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      index(s, dir).documents
        .filter(col("docId").cast("bigint") % 97 === 0)
        .select(col("docId").cast("bigint").as("doc_id"),
          unbase64(col("textB64")).cast("string").as("text"))
        .orderBy("doc_id")
    },

    // Beyond-reference display path: term-in-context snippets from the
    // STORED TermWeight offsets (`TermWeight.proto:54-57` is where the
    // reference keeps them; `ws_phrase` proves adjacency, this proves
    // display). The engine slices ±3 tokens around the first stored
    // offset — no re-search of the text — while the oracle re-derives
    // the first occurrence position from the raw text; they can only
    // agree if the index's stored offsets are exact. Engine slice is
    // 1-based start max(p1-3, 1), fixed 7-token length; DuckDB
    // list_slice end-index start+6 is the same 7 tokens, and both
    // truncate at the array end.
    NamedQuery(
      "ws_snip",
      s"""WITH t AS (SELECT doc_id, lang, $toks AS tk FROM documents),
         |p AS (SELECT doc_id, lang, tk, list_position(tk, 'spark') AS p1
         |      FROM t WHERE list_contains(tk, 'spark'))
         |SELECT doc_id, lang AS language,
         |  array_to_string(list_slice(tk, greatest(p1 - 3, 1), greatest(p1 - 3, 1) + 6), ' ')
         |    AS snippet
         |FROM p ORDER BY doc_id""".stripMargin) { (s, dir) =>
      engine(s, dir).highlights("spark", window = 3,
          tokenizer = graft.functions.TextFunctions.tokenizeWs)
        .select(col("docId").cast("bigint").as("doc_id"),
          col("language"), col("snippet"))
        .orderBy("doc_id")
    },

    // Multi-term snippets: one row per (doc, matched term) — the /snippets
    // serving surface. Same stored-offset discipline as ws_snip, across a
    // term set with one tokenize per document.
    NamedQuery(
      "ws_msnip",
      s"""WITH t AS (SELECT doc_id, lang, $toks AS tk FROM documents),
         |p AS (SELECT doc_id, lang, tk, term, list_position(tk, term) AS p1
         |      FROM t CROSS JOIN (SELECT unnest(['spark','vector']) AS term)
         |      WHERE list_contains(tk, term))
         |SELECT doc_id, lang AS language, term,
         |  array_to_string(list_slice(tk, greatest(p1 - 3, 1), greatest(p1 - 3, 1) + 6), ' ')
         |    AS snippet
         |FROM p ORDER BY doc_id, term""".stripMargin) { (s, dir) =>
      engine(s, dir).snippets(Seq("spark", "vector"), window = 3,
          tokenizer = graft.functions.TextFunctions.tokenizeWs)
        .select(col("docId").cast("bigint").as("doc_id"),
          col("language"), col("term"), col("snippet"))
        .orderBy("doc_id", "term")
    },

    // Phrase snippets: context around the FIRST adjacent occurrence of a
    // 2-token phrase, derived entirely from stored offsets (intersection
    // of shifted offset arrays); the oracle re-finds the phrase in the
    // raw text — agreement proves the stored offsets are positionally
    // exact, not just present
    NamedQuery(
      "ws_psnip",
      s"""WITH t AS (SELECT doc_id, lang, $toks AS tk FROM documents),
         |s AS (SELECT doc_id, lang, tk,
         |        list_filter(generate_series(1, len(tk) - 1),
         |          i -> tk[i] = 'spark' AND tk[i+1] = 'join') AS starts
         |      FROM t)
         |SELECT doc_id, lang AS language,
         |  array_to_string(list_slice(tk, greatest(p1 - 3, 1), greatest(p1 - 3, 1) + 7), ' ')
         |    AS snippet
         |FROM (SELECT doc_id, lang, tk, starts[1] AS p1 FROM s WHERE len(starts) > 0) q
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      engine(s, dir).phraseSnippets(Seq("spark", "join"), window = 3,
          tokenizer = graft.functions.TextFunctions.tokenizeWs)
        .select(col("docId").cast("bigint").as("doc_id"),
          col("language"), col("snippet"))
        .orderBy("doc_id")
    },

    // Count-only serving through the query language. 'dup' is the one
    // corpus term whose per-shard document frequency stays under the
    // UidList MAX at every SF, and ID postings are single-uid by
    // construction — so this boolean (OR + AND NOT over exact postings)
    // takes the index-only fast path: the count comes from plan-time
    // postings with no event-store access (CountServingSpec pins the
    // path; the oracle pins the value).
    NamedQuery(
      "ws_count_q",
      s"""SELECT CAST(count(*) AS BIGINT) AS cnt FROM documents
         |WHERE (list_contains($toks, 'dup') OR doc_id = 42)
         |  AND doc_id <> 17""".stripMargin) { (s, dir) =>
      engine(s, dir).countDocs("(TEXT == 'dup' or ID == 42) and ID != 17")
    },

    // Keyset pagination of the BM25 ranking: page 2 (ranks 11-20) via
    // the "strictly after page 1's last row" boundary predicate — never
    // OFFSET. The oracle derives the same page from the full ranking's
    // row numbers; agreement proves the keyset predicate reconstructs
    // the global order's suffix exactly (rounded scores make the
    // boundary equality portable).
    NamedQuery(
      "ws_page_q",
      s"""WITH dl AS (SELECT doc_id, CAST(len($toks) AS DOUBLE) AS dl FROM documents),
         |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
         |tf AS (SELECT doc_id, term, CAST(len(list_filter(toks, x -> x = term)) AS DOUBLE) AS tf
         |       FROM (SELECT doc_id, $toks AS toks,
         |               unnest(list_distinct($toks)) AS term FROM documents) q
         |       WHERE term IN ('spark', 'join', 'vector')),
         |df AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
         |contrib AS (
         |  SELECT tf.doc_id, tf.term,
         |    ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
         |      * (tf.tf * 2.2) / (tf.tf + 1.2 * (1 - 0.75 + (0.75 * dl.dl) / stats.avgdl)) AS c
         |  FROM tf, df, dl, stats WHERE tf.term = df.term AND tf.doc_id = dl.doc_id),
         |scored AS (
         |  SELECT doc_id,
         |    ROUND(coalesce(max(CASE WHEN term = 'spark'  THEN c END), 0)
         |        + coalesce(max(CASE WHEN term = 'join'   THEN c END), 0)
         |        + coalesce(max(CASE WHEN term = 'vector' THEN c END), 0), 4) AS score
         |  FROM contrib GROUP BY doc_id)
         |SELECT doc_id, score FROM (
         |  SELECT doc_id, score, row_number() OVER (ORDER BY score DESC, doc_id) AS rk
         |  FROM scored) q
         |WHERE rk BETWEEN 11 AND 20 ORDER BY score DESC, doc_id""".stripMargin) { (s, dir) =>
      val eng   = engine(s, dir)
      val terms = Seq("spark", "join", "vector")
      val tie   = col("docId").cast("bigint")
      // page 1's last row is the keyset boundary (what a serving edge
      // hands back to the client as the cursor); docId is a unique
      // numeric key here, so the two-key boundary is already total
      val last = eng.rankTopK(terms, 10, tieBreak = tie)
        .collect().last
      eng.rankPage(terms, 10,
          afterScore = last.getDouble(2), afterTie = last.getString(0).toLong,
          tieBreak = tie)
        .select(col("docId").cast("bigint").as("doc_id"), col("score"))
    }
  )
}
