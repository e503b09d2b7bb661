package graft.ingest

import graft.functions.{TextFunctions, UidListAggregator, UidListMergeAggregator}

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The engine's four logical tables (SURVEY.md §1.4), the Spark-native
  * re-expression of the reference's `wiki` / `wikiIndex` /
  * `wikiReverseIndex` / `wikiMetadata` Accumulo tables
  * (`WikipediaMapper.java:86-89`).
  *
  * All are plain DataFrames: at scale each is a partitioned parquet
  * dataset; here they may also live in memory for tests.
  */
case class WikiIndex(
    docsFields: DataFrame,   // (partition, language, docId, fieldName, fieldValue)
    documents: DataFrame,    // (partition, language, docId, textB64)
    globalIndex: DataFrame,  // (fieldValue, fieldName, partition, language, count, uids, ignore)
    metadata: DataFrame,     // (fieldName, kind, language, normalizer)
    termPostings: DataFrame, // (term, language, partition, docId, tf, offsets[, dl — round 9+])
    storedEvents: Option[DataFrame] = None, // loaded event view, if persisted
    storedReverse: Option[DataFrame] = None, // loaded reverse index, if persisted
    storedTrigram: Option[DataFrame] = None, // loaded trigram index, if persisted
    storedDocLengths: Option[DataFrame] = None, // loaded per-doc lengths, if persisted
    storedCorpusStats: Option[DataFrame] = None, // loaded per-language stats, if persisted
    /** Positional postings for NON-TEXT tokenized fields, when the build
      * declared any (`IndexBuilder` `offsetsFields`): (fieldName, term,
      * language, partition, docId, tf, offsets). TEXT's postings remain
      * the dedicated `termPostings` table (the overwhelmingly hot field
      * keeps its lean schema and partitioned-sorted layout); this table
      * serves `f:near`/`f:phrase`/`f:onear` on the declared extra
      * fields — the offsets machinery was always field-generic, only
      * the ingest wiring was TEXT-only (reference parity:
      * `WikipediaMapper.java:155-168` stores TermWeight for article
      * text only).
      */
    fieldPostings: Option[DataFrame] = None,
    /** Query-time synonym equivalence sets persisted as INDEX state
      * (kind, name, value): ("syn", term, synonym) rows plus
      * ("fld", fieldName, null) rows naming the fields the table
      * applies to. The reference persists per-field query-semantics
      * state (normalizer class names) in its metadata table
      * (`WikipediaMapper.java:199-208`); a synonym table that lived
      * only on the session would let two sessions serving the same
      * saved index silently disagree on expanded results —
      * `WikiSearchEngine` rehydrates `EngineConfig.synonyms` from this
      * when the caller passes none. Catalog-sized.
      */
    storedSynonyms: Option[DataFrame] = None
) {

  /** The pivoted per-document event view — one row per doc with
    * `fields: map<fieldName, array<values>>` (TEXT tokens included).
    * This IS the reference's `wiki` event table (P1/A8 pivot,
    * `EvaluatingIterator.fillMap`): materialized once at build time and
    * persisted by `save` (loaded form short-circuits the derivation). At
    * 100 TB it is partitioned parquet; queries semi-join candidates
    * against it with partition pruning.
    */
  lazy val events: DataFrame = storedEvents.getOrElse(derivedEvents)

  private lazy val derivedEvents: DataFrame = {
    val fieldArrays = docsFields
      .groupBy("partition", "language", "docId", "fieldName")
      .agg(collect_list(col("fieldValue")).as("vals"))
    val textArrays = termPostings
      .groupBy(col("partition"), col("language"), col("docId"))
      .agg(collect_list(col("term")).as("vals"))
      .withColumn("fieldName", lit("TEXT"))
      .select("partition", "language", "docId", "fieldName", "vals")
    fieldArrays.unionByName(textArrays)
      .groupBy("partition", "language", "docId")
      .agg(map_from_entries(collect_list(struct(col("fieldName"), col("vals")))).as("fields"))
  }

  /** Reverse index: same rows keyed by reversed value, for
    * leading-wildcard lookups (`WikipediaMapper.java:193-197`). Derived
    * as a projection at build time (SURVEY.md §1.4 — not a second
    * pipeline), but PERSISTED by `save` sorted on the reversed value:
    * a `startsWith` prefix probe against the stored form pushes to the
    * parquet scan, whereas a filter over `reverse(fieldValue)` computed
    * on the fly cannot — at 100 TB that is the difference between a
    * pruned range read and a full index scan per suffix query.
    */
  def reverseIndex: DataFrame =
    storedReverse.getOrElse(
      globalIndex.withColumn("fieldValue", reverse(col("fieldValue"))))

  /** Trigram index over the VOCABULARY (pg_trgm posture): one row per
    * distinct (fieldName, gram, fieldValue), derived as a projection of
    * the global index — vocabulary-sized × (len−2), NOT corpus-sized,
    * because an infix probe only needs to find which indexed VALUES can
    * match; the values then probe the global index like any EQ leaf.
    * PERSISTED by `save` sorted on gram so a gram IN-list probe pushes
    * to the parquet scan; the derived fallback keeps unpersisted (live /
    * in-memory) indexes queryable.
    */
  def trigramIndex: DataFrame =
    storedTrigram.getOrElse(WikiIndex.deriveTrigrams(globalIndex))

  /** Per-document token length `(partition, language, docId, dl)` — the
    * BM25 `dl` statistic, materialized at index build rather than
    * re-derived from raw content per query (the reference's own posture:
    * `TermWeight.Info.normalizedTermFrequency` is precomputed at ingest,
    * `ingest/src/main/protobuf/TermWeight.proto:54-57`, merged by
    * `TextIndexCombiner.java:45-79`). The derived fallback is EXACT
    * without touching raw text: every token position appears in exactly
    * one term's offsets array, so dl = Σ_term |offsets| per doc; docs
    * with no tokens get dl = 0 via the left join on the document keys.
    * `save` persists this (and `load` reads it back) so a ranked query
    * reads one narrow column instead of folding offsets arrays.
    */
  def docLengths: DataFrame =
    storedDocLengths.getOrElse(
      documents.select("partition", "language", "docId")
        .join(
          termPostings.groupBy("partition", "language", "docId")
            .agg(sum(size(col("offsets"))).cast("double").as("dl")),
          Seq("partition", "language", "docId"), "left")
        .na.fill(0.0, Seq("dl")))

  /** Per-language corpus statistics `(language, n, sum_dl)` for BM25's
    * N and avgdl. Kept per LANGUAGE (not one global row) because
    * language is this engine's visibility label: an auth-restricted
    * query must exclude unauthorized documents from N/avgdl too, so the
    * serving aggregation is a sum over the authorized rows of this
    * catalog-sized table. Values are integer-valued doubles (token
    * counts), so any summation order yields bit-identical results
    * (exact integer sums below 2^53).
    */
  def corpusStats: DataFrame =
    storedCorpusStats.getOrElse(
      docLengths.groupBy("language")
        .agg(count(lit(1)).cast("long").as("n"), sum(col("dl")).as("sum_dl")))

  /** Attach a synonym table as persistent index state (see
    * `storedSynonyms`): `save` writes it beside `metadata`, `load`
    * rehydrates it, and an engine constructed with the default config
    * serves the expanded semantics. Rows are sorted for a deterministic
    * store; semantics are order-free (EQ expands to an OR over the set).
    */
  def withSynonyms(synonyms: Map[String, Seq[String]],
      fields: Set[String] = Set("TEXT")): WikiIndex =
    copy(storedSynonyms =
      Some(WikiIndex.synonymRows(metadata.sparkSession, synonyms, fields)))

  def cacheAll(): WikiIndex = {
    docsFields.cache(); documents.cache(); globalIndex.cache(); metadata.cache()
    termPostings.cache(); events.cache(); fieldPostings.foreach(_.cache())
    this
  }

  /** Persist as partitioned, sorted parquet — the analogue of the
    * reference's bulk sorted-RFile load
    * (`BufferingRFileRecordWriter.java:371-468`): data co-located by
    * `partition`, sorted within partitions so term scans are contiguous.
    */
  def save(dir: String): Unit = {
    docsFields
      .repartition(col("partition"))
      .sortWithinPartitions("language", "docId", "fieldName")
      .write.mode("overwrite").partitionBy("partition").parquet(s"$dir/docs_fields")
    documents
      .repartition(col("partition"))
      .sortWithinPartitions("language", "docId")
      .write.mode("overwrite").partitionBy("partition").parquet(s"$dir/documents")
    globalIndex
      .repartition(col("fieldName"))
      .sortWithinPartitions("fieldValue")
      .write.mode("overwrite").parquet(s"$dir/global_index")
    globalIndex
      .withColumn("fieldValue", reverse(col("fieldValue")))
      .repartition(col("fieldName"))
      .sortWithinPartitions("fieldValue") // sorted by REVERSED value → suffix probes prune
      .write.mode("overwrite").parquet(s"$dir/reverse_index")
    WikiIndex.deriveTrigrams(globalIndex)
      .repartition(col("fieldName"))
      .sortWithinPartitions("gram") // sorted by gram → infix probes prune
      .write.mode("overwrite").parquet(s"$dir/trigram_index")
    metadata.coalesce(1).write.mode("overwrite").parquet(s"$dir/metadata")
    termPostings
      .repartition(col("partition"))
      .sortWithinPartitions("term", "docId")
      .write.mode("overwrite").partitionBy("partition").parquet(s"$dir/term_postings")
    events
      .repartition(col("partition"))
      .sortWithinPartitions("language", "docId")
      .write.mode("overwrite").partitionBy("partition").parquet(s"$dir/events")
    docLengths
      .repartition(col("partition"))
      .sortWithinPartitions("language", "docId")
      .write.mode("overwrite").partitionBy("partition").parquet(s"$dir/doc_lengths")
    corpusStats.coalesce(1).write.mode("overwrite").parquet(s"$dir/corpus_stats")
    storedSynonyms.foreach(
      _.coalesce(1).write.mode("overwrite").parquet(s"$dir/synonyms"))
    fieldPostings.foreach { fp0 =>
      // a row-empty dataset written with partitionBy carries NO
      // schema-bearing file, so load would drop the table while the
      // metadata catalog still declares kind-p fields — write a single
      // schema-carrying empty file instead (legal corpus: every
      // declared value was null), keeping the loud missing-table error
      // reserved for genuine loss/corruption. The frame is persisted
      // around the probe so the postings derivation runs ONCE, not once
      // for the emptiness check and again for the write.
      val fp = fp0.persist()
      try {
        if (fp.isEmpty)
          fp.coalesce(1).write.mode("overwrite").parquet(s"$dir/field_postings")
        else fp
          .repartition(col("partition"))
          .sortWithinPartitions("fieldName", "term", "docId")
          .write.mode("overwrite").partitionBy("partition").parquet(s"$dir/field_postings")
      } finally { fp.unpersist(); () }
    }
  }
}

object WikiIndex {
  def load(spark: SparkSession, dir: String): WikiIndex = WikiIndex(
    docsFields = spark.read.parquet(s"$dir/docs_fields"),
    documents = spark.read.parquet(s"$dir/documents"),
    globalIndex = spark.read.parquet(s"$dir/global_index"),
    metadata = spark.read.parquet(s"$dir/metadata"),
    termPostings = spark.read.parquet(s"$dir/term_postings"),
    storedEvents = Some(spark.read.parquet(s"$dir/events")),
    // older saved dirs may predate the persisted reverse/trigram indexes
    // — fall back to the derived projections
    storedReverse =
      try Some(spark.read.parquet(s"$dir/reverse_index"))
      catch { case _: org.apache.spark.sql.AnalysisException => None },
    storedTrigram =
      try Some(spark.read.parquet(s"$dir/trigram_index"))
      catch { case _: org.apache.spark.sql.AnalysisException => None },
    storedDocLengths =
      try Some(spark.read.parquet(s"$dir/doc_lengths"))
      catch { case _: org.apache.spark.sql.AnalysisException => None },
    storedCorpusStats =
      try Some(spark.read.parquet(s"$dir/corpus_stats"))
      catch { case _: org.apache.spark.sql.AnalysisException => None },
    fieldPostings =
      try Some(spark.read.parquet(s"$dir/field_postings"))
      catch { case _: org.apache.spark.sql.AnalysisException => None },
    storedSynonyms =
      try Some(spark.read.parquet(s"$dir/synonyms"))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
  )

  /** The persisted (kind, name, value) synonym table — the ONE
    * serialization shared by batch stores (`withSynonyms` → `save`) and
    * live stores (`LiveEngineMaintainer` writes it once at store level),
    * so the two cannot drift. Rows are sorted for a deterministic
    * store; semantics are order-free (EQ expands to an OR over the set).
    */
  def synonymRows(spark: SparkSession, synonyms: Map[String, Seq[String]],
      fields: Set[String]): DataFrame = {
    val rows =
      synonyms.toSeq.sortBy(_._1).flatMap { case (t, alts) =>
        alts.sorted.map(a => ("syn", t, a)) } ++
      fields.toSeq.sorted.map(f => ("fld", f, null: String))
    import spark.implicits._
    rows.toDF("kind", "name", "value")
  }

  /** (fieldName, gram, fieldValue) for every distinct vocabulary value —
    * the derivation shared by `save` (persisted, gram-sorted) and the
    * on-the-fly `trigramIndex` fallback.
    */
  def deriveTrigrams(globalIndex: DataFrame): DataFrame =
    globalIndex.select("fieldName", "fieldValue").distinct()
      .withColumn("gram",
        explode(graft.functions.TextFunctions.charTrigrams(col("fieldValue"))))
      .select("fieldName", "gram", "fieldValue")
}

/** Batch index construction — the Spark shape of the reference's ingest
  * MR jobs (`WikipediaIngester.java:139-185`, SURVEY.md §3.3): one
  * DataFrame program; the MR two-phase + LRU combiner + bulk-RFile
  * machinery is subsumed by shuffle + partial aggregation + sorted writes.
  */
object IndexBuilder {

  val LcNormalizer = "graft.functions.TextFunctions.lcNoDiacritics"
  val NoOpNormalizer = "identity"

  /** Build from MediaWiki articles. `numPartitions` mirrors the
    * reference's `id % numPartitions` document partitioner
    * (`WikipediaMapper.java:114-117`) — kept as an explicit column so
    * joins between index and docs co-partition.
    *
    * `offsetsFields` declares EVENT fields (e.g. COMMENTS) that should
    * additionally store positional postings, making them `f:near` /
    * `f:onear` / `f:phrase`-capable like TEXT (beyond the reference,
    * which stores TermWeight offsets for article text only —
    * `WikipediaMapper.java:155-168`). Each declared field is tokenized
    * with the SAME tokenizer as TEXT (so query literals normalize
    * identically) and recorded in metadata as a `kind = "p"` row — the
    * engine discovers positional capability from the catalog, never by
    * probing the table.
    */
  def fromArticles(spark: SparkSession, articles: Dataset[Article], numPartitions: Int,
      offsetsFields: Set[String] = Set.empty): WikiIndex = {
    // field names are stored uppercase; accept any casing in the declaration
    val offsetsUp = offsetsFields.map(_.toUpperCase)
    validateFieldDecls(Set("ID", "TITLE", "TIMESTAMP", "COMMENTS"), Set.empty, offsetsUp)
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val base = articles.toDF
      .withColumn("partition", pmod(col("id"), lit(numPartitions)).cast("int"))
      .withColumn("docId", col("id").cast("string"))
    base.cache()

    // Event fields {ID, TITLE, TIMESTAMP, COMMENTS} (ArticleExtractor.java:81-88)
    val fieldCols = map(
      lit("ID"), col("id").cast("string"),
      lit("TITLE"), col("title"),
      lit("TIMESTAMP"), col("timestamp").cast("string"),
      lit("COMMENTS"), col("comments"))
    val docsFields = base
      .select(col("partition"), col("language"), col("docId"), explode(fieldCols).as(Seq("fieldName", "fieldValue")))
      .where(col("fieldValue").isNotNull)

    val documents = base.select(
      col("partition"), col("language"), col("docId"),
      base64(col("text").cast("binary")).as("textB64"))

    // Index rows: normalized field values + distinct TEXT tokens
    // (WikipediaMapper.java:155-191).
    val normalizedFields = docsFields.select(
      when(col("fieldName") === "TITLE",
        call_function("graft_normalize", col("fieldValue"))) // native codegen'd expr
        .otherwise(col("fieldValue")).as("fieldValue"),
      col("fieldName"), col("partition"), col("language"), col("docId"))
    val tokenRows = base.select(
      col("partition"), col("language"), col("docId"),
      explode(array_distinct(TextFunctions.tokenize(col("text")))).as("fieldValue"))
      .withColumn("fieldName", lit("TEXT"))
      .select("fieldValue", "fieldName", "partition", "language", "docId")

    // TITLE carries TWO normalizers (reference parity: one metadata row
    // per normalizer class, `WikipediaIngester.java:129-136` +
    // `FieldIndexQueryReWriter.orNormalizedTerms`): the Lc-normalized
    // form plus the raw form where they differ, so both an exact-cased
    // and a folded query literal hit the index.
    val rawTitleRows = docsFields
      .filter(col("fieldName") === "TITLE" &&
        col("fieldValue") =!= call_function("graft_normalize", col("fieldValue")))
      .select(col("fieldValue"), col("fieldName"), col("partition"), col("language"), col("docId"))
    val globalIndex =
      buildGlobalIndex(normalizedFields.unionByName(tokenRows).unionByName(rawTitleRows))

    val metadata = {
      val e = Seq("ID", "TITLE", "TIMESTAMP", "COMMENTS").map(f => (f, "e", null: String))
      val i = Seq(
        ("ID", "i", NoOpNormalizer), ("TITLE", "i", LcNormalizer),
        ("TITLE", "i", NoOpNormalizer),
        ("TIMESTAMP", "i", NoOpNormalizer), ("TEXT", "i", LcNormalizer))
      val p = offsetsUp.toSeq.sorted.map(f => (f, "p", null: String))
      // LAZY static rows: the per-language fan-out is a crossJoin of the
      // distinct-language frame with a literal local relation instead of
      // an eager `.distinct().collect()` — a builder whose caller never
      // evaluates `metadata` (e.g. the incremental-merge path consuming
      // only `globalIndex`) no longer pays a full corpus pass at
      // construction time. Same rows, same schema; row order is
      // irrelevant (metadata is a catalog, collected to a map).
      // EVALUATE-ONCE expectation: the distinct-language scan is now
      // part of this plan, so every evaluation of an uncached metadata
      // frame re-runs it (and needs `base`'s session alive). save()
      // writes it once; the serving path caches it (engine() does
      // ix.metadata.cache()) — a caller evaluating metadata repeatedly
      // should do the same.
      val fieldsDf = (e ++ i ++ p).toDF("fieldName", "kind", "normalizer")
      val static = base.select(col("language")).distinct()
        .crossJoin(fieldsDf)
        .select(col("fieldName"), col("kind"), col("language"), col("normalizer"))
        .withColumn("frequency", lit(null).cast("bigint"))
      static.unionByName(
        frequencyRows(docsFields.unionByName(
          tokenRows.select("partition", "language", "docId", "fieldName", "fieldValue"))))
    }

    val termPostings = buildTermPostings(
      base.select(col("partition"), col("language"), col("docId"),
        TextFunctions.tokenize(col("text")).as("tokens")))

    val fieldPostings =
      fieldPostingsFor(docsFields, offsetsUp, TextFunctions.tokenize(_))

    WikiIndex(docsFields, documents, globalIndex, metadata, termPostings,
      fieldPostings = fieldPostings)
  }

  /** Build from the driver's synthetic `documents` table
    * (doc_id, text, lang, source, n_chars) — same engine surface over the
    * harness corpus. Whitespace tokenizer for oracle parity.
    */
  /** `extraFields` declares ADDITIONAL event fields as named Column
    * expressions over the documents schema (e.g. a derived headline or
    * section column) — they join the pivoted event view and the
    * residual's reach, but NOT the shared `documentIndexRows`
    * extraction (the global index and the live-ingest deltas stay
    * byte-identical with or without extras). `offsetsFields` (names
    * from `extraFields` or the stock event fields) additionally store
    * positional postings tokenized with the SAME whitespace tokenizer
    * as TEXT, making them `f:near`/`f:onear`/`f:phrase`-capable —
    * the documents-table twin of `fromArticles`' declaration.
    */
  def fromDocumentsTable(spark: SparkSession, docs: DataFrame, numPartitions: Int,
      extraFields: Map[String, org.apache.spark.sql.Column] = Map.empty,
      offsetsFields: Set[String] = Set.empty): WikiIndex = {
    import spark.implicits._
    val offsetsUp = offsetsFields.map(_.toUpperCase)
    val extrasUp = extraFields.keys.map(_.toUpperCase).toSet
    validateFieldDecls(Set("ID", "SOURCE", "NCHARS"), extrasUp, offsetsUp)
    val base = docs
      .withColumn("partition", pmod(col("doc_id"), lit(numPartitions)).cast("int"))
      .withColumn("docId", col("doc_id").cast("string"))
      .withColumnRenamed("lang", "language")

    val fieldCols = map(Seq(
      Seq(lit("ID"), col("doc_id").cast("string")),
      Seq(lit("SOURCE"), col("source")),
      Seq(lit("NCHARS"), col("n_chars").cast("string"))).flatten ++
      extraFields.toSeq.sortBy(_._1).flatMap { case (n, c) =>
        Seq(lit(n.toUpperCase), c.cast("string"))
      }: _*)
    val docsFields = base
      .select(col("partition"), col("language"), col("docId"),
        explode(fieldCols).as(Seq("fieldName", "fieldValue")))
      .where(col("fieldValue").isNotNull)

    val documents = base.select(
      col("partition"), col("language"), col("docId"),
      base64(col("text").cast("binary")).as("textB64"))

    val tokenRows = base.select(
      col("partition"), col("language"), col("docId"),
      explode(array_distinct(TextFunctions.tokenizeWs(col("text")))).as("fieldValue"))
      .withColumn("fieldName", lit("TEXT"))
      .select("fieldValue", "fieldName", "partition", "language", "docId")

    val globalIndex = buildGlobalIndex(documentIndexRows(docs, numPartitions))

    val metadata = {
      val fields = Seq(
        ("ID", "e", null: String), ("SOURCE", "e", null: String), ("NCHARS", "e", null: String),
        ("ID", "i", NoOpNormalizer), ("SOURCE", "i", NoOpNormalizer),
        ("NCHARS", "i", NoOpNormalizer), ("TEXT", "i", NoOpNormalizer)) ++
        extraFields.keys.toSeq.sorted.map(n => (n.toUpperCase, "e", null: String)) ++
        offsetsUp.toSeq.sorted.map(f => (f, "p", null: String))
      // LAZY static rows (see fromArticles): no eager distinct+collect —
      // ws_index_incremental builds two indexes per run and consumes only
      // their globalIndex, so the eager language collect was two wasted
      // corpus passes per invocation.
      val fieldsDf = fields.toDF("fieldName", "kind", "normalizer")
      val static = base.select(col("language")).distinct()
        .crossJoin(fieldsDf)
        .select(col("fieldName"), col("kind"), col("language"), col("normalizer"))
        .withColumn("frequency", lit(null).cast("bigint"))
      static.unionByName(
        frequencyRows(docsFields.unionByName(
          tokenRows.select("partition", "language", "docId", "fieldName", "fieldValue"))))
    }

    val termPostings = buildTermPostings(
      base.select(col("partition"), col("language"), col("docId"),
        TextFunctions.tokenizeWs(col("text")).as("tokens")))

    val fieldPostings =
      fieldPostingsFor(docsFields, offsetsUp, TextFunctions.tokenizeWs(_))

    WikiIndex(docsFields, documents, globalIndex, metadata, termPostings,
      fieldPostings = fieldPostings)
  }

  /** The (fieldValue, fieldName, partition, language, docId) index input
    * rows for a `documents`-table batch — the shared extraction behind
    * `fromDocumentsTable`'s global index AND the streaming live-ingest
    * deltas (`streaming/LiveIngest`): both paths index identically by
    * construction, so an incrementally-merged index equals a from-scratch
    * build exactly (A1 merge associativity).
    */
  def documentIndexRows(docs: DataFrame, numPartitions: Int): DataFrame = {
    val base = docs
      .withColumn("partition", pmod(col("doc_id"), lit(numPartitions)).cast("int"))
      .withColumn("docId", col("doc_id").cast("string"))
      .withColumnRenamed("lang", "language")
    val fieldCols = map(
      lit("ID"), col("doc_id").cast("string"),
      lit("SOURCE"), col("source"),
      lit("NCHARS"), col("n_chars").cast("string"))
    val fieldRows = base
      .select(col("partition"), col("language"), col("docId"),
        explode(fieldCols).as(Seq("fieldName", "fieldValue")))
      .select("fieldValue", "fieldName", "partition", "language", "docId")
    val tokenRows = base.select(
      col("partition"), col("language"), col("docId"),
      explode(array_distinct(TextFunctions.tokenizeWs(col("text")))).as("fieldValue"))
      .withColumn("fieldName", lit("TEXT"))
      .select("fieldValue", "fieldName", "partition", "language", "docId")
    fieldRows.unionByName(tokenRows)
  }

  /** Per-(field, language) ingested-occurrence counts — the reference's
    * metadata `f` column family (SummingCombiner totals,
    * `WikipediaIngester.java:129-136`): one row (fieldName, "f",
    * language, null, frequency) per pair. Map-side-combined count, tiny
    * output.
    */
  private def frequencyRows(rows: DataFrame): DataFrame =
    rows.groupBy("fieldName", "language")
      .agg(count(lit(1)).as("frequency"))
      .select(col("fieldName"), lit("f").as("kind"), col("language"),
        lit(null).cast("string").as("normalizer"), col("frequency"))

  /** (fieldValue, fieldName, partition, language, docId) rows → lossy
    * global index via the UidList aggregator (A1). GroupBy keys match the
    * reference's index key layout (`WikipediaMapper.java:186-191`); the
    * shuffle is the only wide dependency and is keyed by term, so at
    * 100 TB hot terms degrade to counts (ignore=true) instead of
    * unbounded arrays.
    */
  def buildGlobalIndex(rows: DataFrame): DataFrame = {
    val uidAgg = udaf(new UidListAggregator())
    rows
      .groupBy("fieldValue", "fieldName", "partition", "language")
      .agg(uidAgg(col("docId")).as("u"))
      .select(
        col("fieldValue"), col("fieldName"), col("partition"), col("language"),
        col("u.count").as("count"), col("u.uids").as("uids"), col("u.ignore").as("ignore"))
  }

  /** Skew-hardened index build: two-phase aggregation with a salt on the
    * first shuffle. A pathological term (stopword across a 100 TB corpus)
    * sends all its rows to one reducer in the single-phase build; salting
    * splits it over `salts` reducers, and the second phase merges the
    * partials. This is EXACTLY correct — not approximately — because the
    * UidList combiner is associative/commutative under merge (A1's
    * contract, proven by `ws_index_incremental` and AggregatorsSpec).
    */
  def buildGlobalIndexSalted(rows: DataFrame, salts: Int = 16): DataFrame = {
    val uidAgg   = udaf(new UidListAggregator())
    val mergeAgg = udaf(new UidListMergeAggregator())
    rows
      .withColumn("salt", pmod(hash(col("docId")), lit(salts)))
      .groupBy("fieldValue", "fieldName", "partition", "language", "salt")
      .agg(uidAgg(col("docId")).as("u"))
      .groupBy("fieldValue", "fieldName", "partition", "language")
      .agg(mergeAgg(col("u.count"), col("u.uids"), col("u.ignore")).as("u"))
      .select(
        col("fieldValue"), col("fieldName"), col("partition"), col("language"),
        col("u.count").as("count"), col("u.uids").as("uids"), col("u.ignore").as("ignore"))
  }

  /** `field_postings` rebuilt from CORE data: positional postings over
    * the fields the METADATA catalog declares positional (kind = "p"
    * rows), tokenized with the documents-table tokenizer (whitespace —
    * the builder that owns live stores; the wiki-XML path declares its
    * fields at build time and persists the table directly). Shared by
    * the live read-path fallback (`LiveEngineMaintainer.indexAt` when
    * the read set does not carry the part) and
    * `Compaction.compactEngine`'s base rebuild — both agree with
    * `fromDocumentsTable`'s own construction because all three go
    * through `buildFieldPostings`. The catalog probe is a broadcast
    * semi-join, not a driver collect, so the derivation stays fully
    * lazy: a store with no declared fields yields an empty frame no
    * query ever scans (the engine consults the table only for
    * catalog-declared fields).
    */
  def deriveFieldPostings(docsFields: DataFrame, metadata: DataFrame): DataFrame = {
    val declared = metadata.filter(col("kind") === "p")
      .select("fieldName").distinct()
    buildFieldPostings(
      docsFields.join(broadcast(declared), Seq("fieldName"), "leftsemi")
        .select(col("fieldName"), col("partition"), col("language"), col("docId"),
          TextFunctions.tokenizeWs(col("fieldValue")).as("tokens")))
  }

  /** The shared fieldPostings construction for both builders: postings
    * over the declared fields' values, tokenized with the builder's own
    * tokenizer (the one that builds TEXT — positional literals
    * normalize like TEXT literals on the query side).
    */
  private def fieldPostingsFor(docsFields: DataFrame, offsetsUp: Set[String],
      tokenizer: Column => Column): Option[DataFrame] =
    if (offsetsUp.isEmpty) None
    else Some(buildFieldPostings(
      docsFields.filter(col("fieldName").isin(offsetsUp.toSeq: _*))
        .select(col("fieldName"), col("partition"), col("language"), col("docId"),
          tokenizer(col("fieldValue")).as("tokens"))))

  /** Build-time validation of the field declarations: an offsets name
    * with no backing field would otherwise build a silently-empty
    * positional index (every proximity query empty, no error), and an
    * extra field colliding with a stock name or TEXT fails later with a
    * far-away duplicate-map-key error. Fail HERE, loudly.
    */
  private def validateFieldDecls(
      stock: Set[String], extras: Set[String], offsetsUp: Set[String]): Unit = {
    val clash = extras.intersect(stock + "TEXT")
    require(clash.isEmpty,
      s"extraFields collide with stock fields: ${clash.toSeq.sorted.mkString(", ")}")
    val orphans = offsetsUp.diff(stock ++ extras)
    require(orphans.isEmpty,
      s"offsetsFields name no declared field: ${orphans.toSeq.sorted.mkString(", ")} " +
        s"(available: ${(stock ++ extras).toSeq.sorted.mkString(", ")})")
  }

  /** (…, tokens: array<string>) → per-(term, doc) postings with positions,
    * normalized TF, and the document's token length (`TermWeight.proto:
    * 54-57` — the reference likewise denormalizes the length into the
    * posting via normalizedTermFrequency). Carrying `dl` on every
    * posting row costs 8 bytes/row and buys ranked serving a zero-join
    * plan: BM25 reads ONLY the query terms' postings — no corpus-sized
    * doc-length join per query. Pure built-ins: posexplode +
    * collect_list + sort, no UDAF needed on this path.
    */
  def buildTermPostings(docsTokens: DataFrame): DataFrame =
    docsTokens
      .withColumn("nTokens", size(col("tokens")))
      .select(col("partition"), col("language"), col("docId"), col("nTokens"),
        posexplode(col("tokens")).as(Seq("pos", "term")))
      .groupBy("term", "language", "partition", "docId")
      .agg(
        (count(lit(1)) / first(col("nTokens"))).cast("float").as("tf"),
        array_sort(collect_list(col("pos"))).as("offsets"),
        first(col("nTokens")).cast("double").as("dl"))

  /** `buildTermPostings` with `fieldName` carried through the grouping —
    * the positional postings for declared non-TEXT tokenized fields
    * (`WikiIndex.fieldPostings`). Same shuffle shape, keyed by
    * (field, term): a hot term in one field never skews another's.
    */
  def buildFieldPostings(fieldTokens: DataFrame): DataFrame =
    fieldTokens
      .withColumn("nTokens", size(col("tokens")))
      .select(col("fieldName"), col("partition"), col("language"), col("docId"),
        col("nTokens"), posexplode(col("tokens")).as(Seq("pos", "term")))
      .groupBy("fieldName", "term", "language", "partition", "docId")
      .agg(
        (count(lit(1)) / first(col("nTokens"))).cast("float").as("tf"),
        array_sort(collect_list(col("pos"))).as("offsets"))
}
