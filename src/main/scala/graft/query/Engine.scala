package graft.query

import graft.functions.TextFunctions
import graft.ingest.WikiIndex

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Engine configuration, mirroring the reference's query-logic options
  * (`AbstractQueryLogic.java:536-539`, `Query.java:245`).
  *
  * @param unevaluatedFields fields whose index hits are trusted without
  *        residual re-evaluation (reference default: TEXT). Our event view
  *        CAN evaluate TEXT (tokens come from term_postings), so the exact
  *        default is empty — set to Set("TEXT") for reference-parity
  *        behavior. Reference-parity caveat (as in the reference, which
  *        substitutes `field == null` unconditionally,
  *        AbstractEvaluatingIterator.java:292-301): a term on an
  *        unevaluated field that the index could NOT answer (e.g. an
  *        opaque mid-string regex) is never checked anywhere — that is
  *        the cost of declaring a field unevaluated.
  */
case class EngineConfig(unevaluatedFields: Set[String] = Set.empty)

/** The query engine: parse → plan (access path, SURVEY.md §4.1) →
  * execute (index semi/anti-join DAG or full scan) → pivot + residual
  * filter → results. The Spark-native replacement for the whole
  * `AbstractQueryLogic` / `RangeCalculator` / `BooleanLogicIterator`
  * stack (SURVEY.md §3.1): steps 5–7 of the reference lifecycle collapse
  * into one Catalyst-optimized DataFrame program.
  *
  * Scale posture (100 TB): candidate generation only touches
  * `global_index` rows pruned by (fieldName, fieldValue) — a sorted
  * parquet scan with pushed filters; posting lists are lossy-bounded
  * (UidList MAX=20) so no candidate explosion; the index is never treated
  * as exact — the residual filter decides truth (`QueryLogic.java:173-186`).
  * No driver-side collect sits on any data path except the tiny metadata
  * table (broadcast-size by construction).
  */
class WikiSearchEngine(
    spark: SparkSession,
    index: WikiIndex,
    config: EngineConfig = EngineConfig()) {

  import WikiSearchEngine._

  graft.plans.GraftFunctions.register(spark)

  /** field → normalizer fn, from the metadata catalog (tiny; collected
    * once — the analogue of `findIndexedTerms`, `AbstractQueryLogic.java:230-283`).
    */
  private lazy val indexedFields: Map[String, String => String] = {
    val rows = index.metadata.filter(col("kind") === "i")
      .select("fieldName", "normalizer").distinct().collect()
    rows.map { r =>
      val f = r.getString(0)
      val norm: String => String =
        if (r.getString(1) == graft.ingest.IndexBuilder.LcNormalizer)
          TextFunctions.lcNoDiacritics _
        else identity[String] _
      f -> norm
    }.toMap
  }

  /** Residual-filter normalizers per field: lc-no-diacritics fields
    * compare through the native `graft_normalize` expression so the
    * residual accepts exactly what the index matched.
    */
  private lazy val residualNorms: Map[String, Compiler.FieldNorm] = {
    val rows = index.metadata.filter(col("kind") === "i")
      .select("fieldName", "normalizer").distinct().collect()
    rows.collect {
      case r if r.getString(1) == graft.ingest.IndexBuilder.LcNormalizer =>
        r.getString(0) -> Compiler.FieldNorm(
          v => call_function("graft_normalize", v),
          TextFunctions.lcNoDiacritics)
    }.toMap
  }

  private def normalizeLit(field: String, v: String): String =
    indexedFields.get(field).map(_(v)).getOrElse(v.toLowerCase)

  /** All doc ids (for ignore-shard fallback), partition-pruned at use. */
  private lazy val allDocs: DataFrame =
    index.documents.select("partition", "language", "docId")

  // ---- public API ---------------------------------------------------------

  /** Run a query; returns (partition, language, docId, fields, DOCUMENT). */
  def run(query: String, auths: Seq[String] = Nil): DataFrame = {
    val ast0 = QueryParser.parse(query)
    if (QExpr.allNegated(ast0))
      throw new IllegalArgumentException(
        s"all-negation queries are invalid (FieldIndexQueryReWriter.removeNegationViolations): $query")
    val ast = rewriteBareTerms(ast0)

    val authFilter: DataFrame => DataFrame =
      df => if (auths.isEmpty) df else df.filter(col("language").isin(auths: _*))

    plan(ast, authFilter) match {
      case Some(candidates) =>
        // Candidates restrict the stored event view by semi-join (index
        // nested-loop doc fetch J3, as a distributed semi-join).
        val events = eventView(authFilter, Some(candidates.df))
        finish(events.filter(
          Compiler.compile(ast, config.unevaluatedFields, residualNorms)))
      case None => // full scan (AbstractQueryLogic.java:838-884)
        finish(eventView(authFilter, None)
          .filter(Compiler.compile(ast, norms = residualNorms)))
    }
  }

  /** Document point-fetch — `ContentLogic.runQuery`
    * (`query/.../logic/ContentLogic.java:56-107`): `DOCUMENT:partition/lang/id`
    * → Base64-decoded content. A partition-pruned single-key scan.
    */
  def content(pointer: String): DataFrame = {
    val m = "^DOCUMENT:(.*)/(.*)/(.*)$".r
      .findFirstMatchIn(pointer)
      .getOrElse(throw new IllegalArgumentException(s"bad document pointer: $pointer"))
    index.documents
      .filter(col("partition") === m.group(1).toInt &&
        col("language") === m.group(2) && col("docId") === m.group(3))
      .select(col("partition"), col("language"), col("docId"),
        unbase64(col("textB64")).cast("string").as("DOCUMENT"))
  }

  // ---- planning -----------------------------------------------------------

  /** Unfielded bare terms → OR over the fields where the global index
    * knows the value (`AbstractQueryLogic.java:601-633`,
    * `QueryLogic.getTermIndexInformation:111-193`). The lookup is a
    * pruned index scan collecting only distinct field names (bounded by
    * schema size, not data size).
    */
  private def rewriteBareTerms(e: QExpr): QExpr = e match {
    case BareTerm(v) =>
      // The term's field is unknown, so probe every normalized form a
      // field might have stored ('Ábaco' → both 'ábaco' and 'abaco').
      val forms = Seq(v.toLowerCase, TextFunctions.lcNoDiacritics(v)).distinct
      val fields = index.globalIndex
        .filter(col("fieldValue").isin(forms: _*))
        .select("fieldName").distinct().collect().map(_.getString(0))
      fields.toSeq match {
        case Seq()  => Term(NoField, Op.EQ, v)
        case Seq(f) => Term(f, Op.EQ, v)
        case fs     => Or(fs.map(f => Term(f, Op.EQ, v)))
      }
    case And(cs) => And(cs.map(rewriteBareTerms))
    case Or(cs)  => Or(cs.map(rewriteBareTerms))
    case Not(c)  => Not(rewriteBareTerms(c))
    case other   => other
  }

  /** A planned candidate set plus its index cardinality (Σ Uid COUNT —
    * collected at plan time exactly like the reference's
    * `RangeCalculator.queryGlobalIndex` cardinality accumulation, A5).
    */
  private case class Cand(df: DataFrame, cardThunk: () => Long) {
    lazy val card: Long = cardThunk()
  }

  /** Candidate (partition, language, docId) set for the expression, or
    * None when the expression is not index-answerable and the caller must
    * fall back to a scan (access-path rule, SURVEY.md §4.1 row 1).
    */
  private def plan(e: QExpr, auth: DataFrame => DataFrame): Option[Cand] = e match {
    case t: Term if !Op.isNegative(t.op) => termCandidates(t, auth)
    case _: Term                         => None // negations never drive the index
    case _: FnTerm                       => None
    case _: FnCmp                        => None // function results aren't indexed
    case _: BareTerm                     => None // rewritten earlier; unknown value
    case Not(_)                          => None
    case Or(cs) =>
      // OR is index-answerable only if EVERY branch is (else a matching
      // doc could be missed) — union + dedup (OrIterator, J2).
      val plans = cs.map(plan(_, auth))
      if (plans.forall(_.isDefined)) {
        val cands = plans.flatten
        Some(Cand(
          cands.map(_.df).reduce(_ unionByName _)
            .dropDuplicates("partition", "language", "docId"),
          () => cands.map(_.card).sum))
      } else None
    case And(cs) =>
      // AND: the reference keeps only the smaller-cardinality branch's
      // ranges (a superset of the intersection) and lets downstream
      // verification restore exactness (`RangeCalculator.java:825-834`).
      // We do the same when the residual filter re-evaluates everything
      // (our default); with unevaluated fields configured the residual
      // can't be trusted for them, so we intersect all branches
      // (AndIterator leapfrog ≡ chained semi-joins, J1). Exact negated
      // postings prune via anti-join either way (J4).
      val (rangeTerms, rest) = partitionRangeTerms(cs)
      val fusedRanges        = rangeTerms.flatMap { case (f, lohi) => rangeCandidates(f, lohi, auth) }
      val positives          = rest.collect {
        case t: Term if !Op.isNegative(t.op) => plan(t, auth)
        case o: Or                           => plan(o, auth)
        case a: And                          => plan(a, auth)
      }.flatten
      val negatives = rest.collect {
        case t: Term if t.op == Op.NE => exactPostings(t.copy(op = Op.EQ), auth)
      }.flatten
      val all = fusedRanges ++ positives
      if (all.isEmpty) None
      else {
        val base =
          if (all.size == 1) all.head // no cardinality lookups needed
          else if (config.unevaluatedFields.isEmpty) all.minBy(_.card)
          else Cand(
            all.map(_.df).reduce(_.join(_, Seq("partition", "language", "docId"), "left_semi")),
            () => all.map(_.card).min)
        Some(Cand(
          negatives.foldLeft(base.df) { (acc, negDf) =>
            acc.join(negDf, Seq("partition", "language", "docId"), "left_anti")
          },
          base.cardThunk))
      }
  }

  /** Fuse GE/GT+LE/LT pairs on the same field under an AND into bounded
    * index ranges (J7, `RangeCalculator.java:449-499`); unbounded single
    * ranges are not indexable (`RangeCalculator.java:495-498`).
    * Returns (field → (lo, loStrict, hi, hiStrict)) plus remaining children.
    */
  private def partitionRangeTerms(cs: Seq[QExpr])
      : (Seq[(String, (String, Boolean, String, Boolean))], Seq[QExpr]) = {
    val (ranges, rest) = cs.partition {
      case Term(_, op, _) => Op.isRange(op)
      case _              => false
    }
    val byField = ranges.collect { case t: Term => t }.groupBy(_.field)
    val fused = byField.toSeq.flatMap { case (f, ts) =>
      val lo = ts.filter(t => t.op == Op.GT || t.op == Op.GE)
        .sortBy(_.literal).lastOption
      val hi = ts.filter(t => t.op == Op.LT || t.op == Op.LE)
        .sortBy(_.literal).headOption
      (lo, hi) match {
        case (Some(l), Some(h)) =>
          Some(f -> (l.literal, l.op == Op.GT, h.literal, h.op == Op.LT))
        case _ => None // unbounded — residual filter only
      }
    }
    // Fused fields' terms are consumed; unbounded ones stay for residual
    val fusedFields = fused.map(_._1).toSet
    val leftover    = ranges.collect { case t: Term if !fusedFields.contains(t.field) => t }
    (fused, rest ++ leftover)
  }

  /** Σ count over matching index rows — a tiny plan-time action against
    * the (fieldName, fieldValue)-pruned index scan, mirroring the
    * reference's plan-time cardinality reads (A5,
    * `RangeCalculator.java:664-672`).
    */
  private def cardOf(ix: DataFrame): Long =
    ix.agg(coalesce(sum("count"), lit(0L))).collect()(0).getLong(0)

  private def rangeCandidates(
      field: String,
      lohi: (String, Boolean, String, Boolean),
      auth: DataFrame => DataFrame): Option[Cand] = {
    if (!indexedFields.contains(field)) return None
    val (lo, loStrict, hi, hiStrict) = lohi
    val loN = normalizeLit(field, lo)
    val hiN = normalizeLit(field, hi)
    val v   = col("fieldValue")
    val (loC, hiC) =
      if (Compiler.isNumeric(lo) && Compiler.isNumeric(hi))
        (v.try_cast("double"), lit(loN.toDouble), lit(hiN.toDouble)) match {
          case (c, l, h) => (if (loStrict) c > l else c >= l, if (hiStrict) c < h else c <= h)
        }
      else
        (if (loStrict) v > lit(loN) else v >= lit(loN),
          if (hiStrict) v < lit(hiN) else v <= lit(hiN))
    val ix = index.globalIndex.filter(col("fieldName") === field && loC && hiC)
    Some(Cand(toCandidates(ix, auth), () => cardOf(ix)))
  }

  /** Per-term candidate postings (S11 index scan + predicate
    * classification, `RangeCalculator.java:300-499`).
    */
  private def termCandidates(t: Term, auth: DataFrame => DataFrame): Option[Cand] = {
    if (t.field == NoField) {
      // bare term not found anywhere in the index: provably empty
      return Some(Cand(allDocs.limit(0), () => 0L))
    }
    if (!indexedFields.contains(t.field)) return None
    val norm = normalizeLit(t.field, t.literal)
    t.op match {
      case Op.EQ =>
        val ix = index.globalIndex
          .filter(col("fieldName") === t.field && col("fieldValue").isin(eqForms(norm): _*))
        Some(Cand(toCandidates(ix, auth), () => cardOf(ix)))
      case Op.RE =>
        classifyRegex(norm) match {
          case Prefix(p) => // trailing wildcard → forward index prefix range
            val ix = index.globalIndex
              .filter(col("fieldName") === t.field && col("fieldValue").startsWith(p))
            Some(Cand(toCandidates(ix, auth), () => cardOf(ix)))
          case Suffix(s) => // leading wildcard → reverse index prefix range
            val ix = index.reverseIndex
              .filter(col("fieldName") === t.field &&
                col("fieldValue").startsWith(s.reverse))
            Some(Cand(toCandidates(ix, auth), () => cardOf(ix)))
          case Opaque => None // mid-string wildcard: filter-only (RangeCalculator.java:357-420)
        }
      case _ => None // single-sided ranges handled (fused) at the AND level
    }
  }

  /** Canonical stored forms a numeric equality literal can match:
    * the normalized literal itself plus the canonical double/long
    * renderings ('300.0' query matches stored '300' and vice versa).
    * A finite IN-list, so the filter still pushes to parquet — a
    * try_cast disjunct would not — and it is symmetric between the EQ
    * candidate path and the NE anti-join prune. The residual filter
    * still coerces fully for evaluable fields; exotic renderings
    * ('4.2e1') match only there.
    */
  private def eqForms(norm: String): Seq[String] =
    if (!Compiler.isNumeric(norm)) Seq(norm)
    else {
      val d = norm.toDouble
      val longForm = if (d == d.toLong.toDouble) Seq(d.toLong.toString) else Nil
      (Seq(norm, d.toString) ++ longForm).distinct
    }

  /** Exact postings only (ignore=false) — safe for anti-join pruning.
    * Uses the same eqForms matching as the EQ candidate path so EQ and
    * NE stay complementary on numerically-equal stored forms.
    */
  private def exactPostings(t: Term, auth: DataFrame => DataFrame): Option[DataFrame] = {
    if (!indexedFields.contains(t.field)) return None
    val norm = normalizeLit(t.field, t.literal)
    val ix = index.globalIndex
      .filter(col("fieldName") === t.field &&
        col("fieldValue").isin(eqForms(norm): _*) && !col("ignore"))
    Some(auth(ix.select(col("partition"), col("language"), explode(col("uids")).as("docId"))))
  }

  /** Index rows → candidate docs: exact uids exploded; lossy (ignore)
    * rows degrade to whole-(partition, language) candidate sets — the
    * reference's shard-range fallback (`RangeCalculator.java:683-705`).
    */
  private def toCandidates(ix: DataFrame, auth: DataFrame => DataFrame): DataFrame = {
    val exact = ix.filter(!col("ignore"))
      .select(col("partition"), col("language"), explode(col("uids")).as("docId"))
    val shards = ix.filter(col("ignore")).select("partition", "language").distinct()
    val shardDocs = allDocs.join(broadcast(shards), Seq("partition", "language"), "left_semi")
    auth(exact.unionByName(shardDocs).dropDuplicates("partition", "language", "docId"))
  }

  // ---- event materialization ---------------------------------------------

  /** The per-document event view (P1/A8 pivot) — materialized once at
    * index build (`WikiIndex.events`, the reference's `wiki` event
    * table), filtered here by auths and candidate semi-join. The
    * semi-join keys lead with `partition`, so a partitioned event store
    * prunes at 100 TB; candidate sets are index-bounded.
    */
  private def eventView(auth: DataFrame => DataFrame, candidates: Option[DataFrame]): DataFrame = {
    val keys = Seq("partition", "language", "docId")
    val ev   = auth(index.events)
    candidates.fold(ev)(c => ev.join(c, keys, "left_semi"))
  }

  private def finish(df: DataFrame): DataFrame =
    df.withColumn("DOCUMENT",
      concat(lit("DOCUMENT:"), col("partition"), lit("/"), col("language"), lit("/"), col("docId")))
}

object WikiSearchEngine {
  val NoField = "__NONE__"

  sealed trait RegexShape
  case class Prefix(p: String) extends RegexShape
  case class Suffix(s: String) extends RegexShape
  case object Opaque           extends RegexShape

  private val meta = ".+*?[](){}|\\^$".toSet

  /** Classify a (normalized) regex literal the way the reference's range
    * calculator does (`RangeCalculator.java:357-420`): `lit.*` → forward
    * prefix, `.*lit` → reverse-index suffix, anything else → opaque.
    */
  def classifyRegex(re: String): RegexShape = {
    def plain(s: String): Boolean = s.nonEmpty && !s.exists(meta.contains)
    if (re.endsWith(".*") && plain(re.dropRight(2))) Prefix(re.dropRight(2))
    else if (re.startsWith(".*") && plain(re.drop(2))) Suffix(re.drop(2))
    else Opaque
  }
}
