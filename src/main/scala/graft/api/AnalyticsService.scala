package graft.api

import graft.functions.Sketches
import graft.streaming.{LiveAnnMaintainer, LiveDsirModelMaintainer, LiveQuantileMaintainer, LiveSketchMaintainer}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Serving facade over the live ANALYTICS stores — the sketch/model
  * counterpart of [[QueryService]] for [[HttpShim]]'s `/sketch/…`,
  * `/model/…` and `/ann` routes. The engine stores got their serving
  * edge in round 9/10 (`/query` + `asOf`, `/count`, `/hybrid`); this
  * closes the same library-only asymmetry for the analytics state
  * classes (CMS counters, per-group bottom-k quantiles, DSIR importance
  * model, the live ANN index).
  *
  * Serving cost mirrors the maintainers' read paths, MEMOIZED per
  * snapshot (the `QueryService.versioned` discipline — every cache is
  * keyed by the store's directory read-set via `stateKey`, so a commit,
  * delete, or compaction evicts and the next request re-resolves; a
  * probe of the key is one driver-side listing, no Spark job):
  *  - CMS / quantiles: the merged state (d·w longs / |groups|·k pairs —
  *    a sketch constant) is merged ONCE per snapshot and every request
  *    after that is a driver-side lookup — no job at all on the wire.
  *  - DSIR: the derived model DataFrame is Spark-cached per snapshot
  *    (vocabulary-sized — deliberately NOT driver state); a token
  *    lookup is one filter job over the in-memory table.
  *  - ANN: the tombstone-masked assignment is Spark-cached per
  *    snapshot (the standard in-memory ANN serving posture — corpus
  *    embeddings resident across the executor pool, the size dial is
  *    the executor count); a query is one probe-join-score job.
  * Nothing here scans documents.
  *
  * Snapshot semantics are the `/query?asOf=` contract verbatim: a
  * version is a RESOURCE — it serves only while its delta (or its own
  * compacted base) is still on disk (`committedVersions`), and a swept
  * or never-committed version is a 404, never a silent answer built
  * from different state. No `asOf` serves the latest committed version.
  *
  * Auth model: these stores aggregate the WHOLE corpus (a CMS counter
  * cannot be filtered per-language after the fold), so visibility is
  * store-level, the Accumulo table-permission analogue of the engine's
  * per-language row filter: `requiredAuth = Some(label)` makes every
  * read demand that label among the caller's `auths` — refused as 403
  * (SecurityException), BEFORE the store's existence is revealed.
  */
class AnalyticsService(
    cms: Option[LiveSketchMaintainer] = None,
    quantiles: Option[LiveQuantileMaintainer] = None,
    dsir: Option[LiveDsirModelMaintainer] = None,
    requiredAuth: Option[String] = None,
    ann: Option[LiveAnnMaintainer] = None) {

  // ---- per-snapshot memoization --------------------------------------
  // Keyed by (read-set identity, resolved version). Entries whose
  // read-set no longer matches the store's current one are dropped on
  // the next access (bounded: one live read-set at a time, plus at most
  // the asOf versions inside it — itself bounded by compaction cadence).
  private type Key = ((Option[Long], Seq[Long]), Long)
  private val cmsCache = scala.collection.concurrent.TrieMap.empty[Key, Seq[Long]]
  private val qsCache  = scala.collection.concurrent.TrieMap.empty[Key, Map[String, Sketches.QsOut]]
  private val modelCache = scala.collection.concurrent.TrieMap.empty[Key, DataFrame]
  // Driver-side LRU of (snapshot, token) → lr, None = known-absent (the
  // engine's term-cache discipline): point lookups repeat on a hot
  // vocabulary, and without this every repeat pays a filter job over
  // the cached model. Bounded at 4096 entries — driver state stays
  // fixed no matter the vocabulary.
  private val tokenLru = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(Key, String), Option[Long]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(Key, String), Option[Long]]): Boolean =
        size() > 4096
    })
  private val annCache = new java.util.concurrent.atomic.AtomicReference[
    ((Option[Long], Seq[Long]), graft.pipeline.Similarity.IvfIndex)]()

  private def evictStale[V](cache: scala.collection.concurrent.TrieMap[Key, V],
      current: (Option[Long], Seq[Long]))(onEvict: V => Unit = (_: V) => ()): Unit =
    cache.keys.filter(_._1 != current).foreach(k => cache.remove(k).foreach(onEvict))

  /** Point estimate for one key from the merged CMS at the resolved
    * version, as JSON — the heavy-hitter badge endpoint. After the
    * snapshot's first request the merge is memoized: the wire cost is
    * a driver-side d-row hash probe, no job.
    */
  def cmsEstimate(key: Long, asOf: Option[Long] = None,
      auths: Seq[String] = Nil): String = {
    gate(auths)
    val m = configured(cms, "cms")
    val at = resolve(asOf, m.committedVersions)
    val sk = {
      val ck = m.stateKey(at)
      evictStale(cmsCache, m.stateKey())()
      cmsCache.getOrElseUpdate((ck, at), m.cmsAt(at))
    }
    val est = Sketches.cmsEstimate(sk, key, m.d, m.w)
    s"""{"version":$at,"key":$key,"estimate":$est}"""
  }

  /** Rank-rule quantiles at the resolved version — one group as a JSON
    * object (404 for a group the store never saw), or every group as a
    * sorted JSON array (bounded by the maintainer's group-domain
    * contract: a GROUP BY dimension, not a key domain). Memoized like
    * the CMS route: post-first-request cost is a map lookup.
    */
  def groupQuantiles(group: Option[String], asOf: Option[Long] = None,
      auths: Seq[String] = Nil): String = {
    gate(auths)
    val m = configured(quantiles, "quantiles")
    val at = resolve(asOf, m.committedVersions)
    val qs = {
      val ck = m.stateKey(at)
      evictStale(qsCache, m.stateKey())()
      qsCache.getOrElseUpdate((ck, at), m.quantilesAt(at))
    }
    def one(g: String, o: Sketches.QsOut) =
      s"""{"group":${QueryService.jstr(g)},"version":$at,"n_sample":${o.n_sample},"p50":${o.p50},"p90":${o.p90},"p99":${o.p99}}"""
    group match {
      case Some(g) => one(g, qs.getOrElse(g,
        throw new NoSuchElementException(s"no such group: $g")))
      case None =>
        qs.toSeq.sortBy(_._1).map { case (g, o) => one(g, o) }
          .mkString("[", ",", "]")
    }
  }

  /** One token's quantized importance log-ratio from the merged model
    * at the resolved version, as JSON; an out-of-model token is a 404
    * (the DSIR OOV contract: the default scorer DROPS it — a lookup
    * must say "absent", not invent a likelihood). The derived model is
    * Spark-cached per snapshot (vocabulary-sized, so the memo is a
    * cached DataFrame, not driver state); the lookup is one filter job
    * over the in-memory table, evicted (unpersisted) when the read set
    * changes.
    */
  def dsirToken(token: String, asOf: Option[Long] = None,
      auths: Seq[String] = Nil): String = {
    gate(auths)
    val m = configured(dsir, "dsir")
    val at = resolve(asOf, m.committedVersions)
    val model = {
      val ck = m.stateKey(at)
      evictStale(modelCache, m.stateKey())(_.unpersist())
      modelCache.getOrElseUpdate((ck, at),
        m.modelAt(at)
          .getOrElse(throw new NoSuchElementException("empty model store"))
          .cache())
    }
    val lruKey = ((m.stateKey(at), at), token)
    val lr = Option(tokenLru.get(lruKey)).getOrElse {
      val got = model.filter(col("token") === token).limit(1).collect()
        .headOption.map(_.getAs[Long]("lr"))
      tokenLru.put(lruKey, got) // negative entries cache "absent" too
      got
    }.getOrElse(throw new NoSuchElementException(s"token not in model: $token"))
    s"""{"version":$at,"token":${QueryService.jstr(token)},"lr":$lr}"""
  }

  /** Live ANN top-k over the tombstone-masked IVF store at its LATEST
    * committed version, as JSON [{rank,id,cosine}] — the serving edge
    * of `LiveAnnMaintainer`, probing nprobe cells through the same
    * `Similarity.ivfTopKWith` every sim_* entry is oracled on. Query by
    * stored id (`Left` — the vector's own live embedding is the query;
    * unknown/tombstoned id = 404) or by a raw vector (`Right`). Latest
    * only: the ANN store keeps no historical index resolution (frozen
    * codebook + masked assignment is one state), so the route is
    * live-only and `asOf` is the shim's documented 400. The masked
    * assignment is Spark-cached per snapshot — the in-memory ANN
    * serving posture — so a request is one probe-join-score job over
    * resident state, and a commit/delete/compaction evicts.
    */
  def annTopK(query: Either[Long, Array[Float]], k: Int, nprobe: Int,
      auths: Seq[String] = Nil): String = {
    gate(auths)
    val m = configured(ann, "ann")
    val ck = m.stateKey
    val ivf = annCache.get() match {
      case (`ck`, cached) => cached
      case stale =>
        val fresh = m.latestIndex.getOrElse(
          throw new NoSuchElementException("empty ann store"))
        val resident = fresh.copy(assigned = fresh.assigned.cache())
        if (annCache.compareAndSet(stale, (ck, resident))) {
          if (stale != null) stale._2.assigned.unpersist()
          resident
        } else { resident.assigned.unpersist(); annCache.get()._2 }
    }
    val spark = ivf.assigned.sparkSession
    import spark.implicits._
    val queries = query match {
      case Left(id) =>
        // one in-memory filter job; materialized so the probe join's
        // corpus side (the same assigned view) keeps clean lineage
        val r = ivf.assigned.filter(col("vec_id") === id)
          .select("vec_id", "embedding").limit(1).collect().headOption
          .getOrElse(throw new NoSuchElementException(s"vector not found: $id"))
        Seq((r.getLong(0), r.getSeq[Float](1))).toDF("vec_id", "embedding")
      case Right(v) => Seq((-1L, v.toSeq)).toDF("vec_id", "embedding")
    }
    val rows = graft.pipeline.Similarity.ivfTopKWith(ivf, queries, k, nprobe)
      .collect().sortBy(_.getAs[Int]("rank"))
    rows.map { r =>
      s"""{"rank":${r.getAs[Int]("rank")},"id":${r.getAs[Long]("neighbor_id")},"cosine":${r.getAs[Double]("cosine")}}"""
    }.mkString("[", ",", "]")
  }

  /** Store-level visibility check — FIRST, so an unauthorized caller
    * learns nothing (not even which stores this server carries).
    */
  private def gate(auths: Seq[String]): Unit =
    requiredAuth.foreach { a =>
      if (!auths.contains(a))
        throw new SecurityException(s"store requires authorization '$a'")
    }

  private def configured[T](o: Option[T], name: String): T =
    o.getOrElse(throw new IllegalArgumentException(
      s"no $name store configured on this server"))

  /** `asOf` → the exact committed version, or latest when absent; an
    * empty store and an unknown/swept version are both missing
    * RESOURCES (404), the `/query?asOf=` discipline.
    */
  private def resolve(asOf: Option[Long], committed: Seq[Long]): Long =
    asOf match {
      case Some(v) =>
        if (committed.contains(v)) v
        else throw new NoSuchElementException(
          s"no committed snapshot at version $v")
      case None => committed.lastOption.getOrElse(
        throw new NoSuchElementException("empty analytics store"))
    }
}
