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
  * Every request resolves its snapshot through the maintainer's
  * `serveSnapshot` — ONE directory listing that resolves `asOf` against
  * the exact on-disk committed versions (so a reader beside a
  * concurrent writer serves the resolved version's data, never a stale
  * in-memory pointer, and never a silent answer from different state)
  * and yields the cache keys below.
  *
  * Serving cost mirrors the maintainers' read paths, MEMOIZED per
  * snapshot in generation-keyed caches ([[StoreCache]]): within one
  * GENERATION (a fixed latest read-set) every resolved version's merged
  * state is computed once; when the generation changes (a commit,
  * delete, or compaction), the memo turns over. Evicted Spark-cached
  * DataFrames are NOT unpersisted immediately — an in-flight request
  * may still be executing against them, and a compaction may have swept
  * the files a forced recompute would need — they are parked for one
  * full generation (the `Compaction` reader-grace discipline) and
  * unpersisted at the NEXT turnover.
  *  - CMS / quantiles: merged state is d·w longs / |groups|·k pairs — a
  *    sketch constant; post-first-request cost is a driver map probe,
  *    no job on the wire.
  *  - DSIR: the derived model DataFrame is Spark-cached per snapshot
  *    (vocabulary-sized — deliberately NOT driver state); a token
  *    lookup is one filter job over the in-memory table, fronted by a
  *    bounded driver LRU (the engine's term-cache discipline, negative
  *    entries included).
  *  - ANN: the tombstone-masked assignment is Spark-cached per
  *    generation (the standard in-memory ANN serving posture — corpus
  *    embeddings resident across the executor pool); a query is one
  *    probe-join-score job.
  * Nothing here scans documents.
  *
  * Snapshot semantics are the `/query?asOf=` contract verbatim: a
  * version is a RESOURCE — it serves only while its delta (or its own
  * compacted base) is still on disk, and a swept or never-committed
  * version is a 404. No `asOf` serves the latest committed version.
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

  /** Generation-keyed per-snapshot memo. ONE lock per store: lookups,
    * turnover, and cold computes are atomic with respect to each other
    * (a cold merge under the lock runs at most once per version per
    * generation — the acceptable serialization). `retire` runs on
    * values parked one full generation earlier, never on the values a
    * concurrent in-flight request may still hold.
    */
  private class StoreCache[V](retire: V => Unit = (_: V) => ()) {
    private var generation: (Option[Long], Seq[Long]) = null
    private val memo = scala.collection.mutable.Map.empty[Long, V]
    private var retiring: Seq[V] = Nil
    def get(gen: (Option[Long], Seq[Long]), at: Long)(compute: => V): V =
      synchronized {
        if (generation != gen) {
          retiring.foreach(retire)
          retiring = memo.values.toSeq
          memo.clear()
          generation = gen
        }
        memo.getOrElseUpdate(at, compute)
      }
  }
  private val cmsCache   = new StoreCache[Seq[Long]]
  private val qsCache    = new StoreCache[Map[String, Sketches.QsOut]]
  private val modelCache = new StoreCache[DataFrame](_.unpersist())
  private val annCache =
    new StoreCache[graft.pipeline.Similarity.IvfIndex](_.assigned.unpersist())
  // Driver-side LRU of ((read-set, version), token) → lr, None =
  // known-absent (the engine's term-cache discipline): point lookups
  // repeat on a hot vocabulary, and without this every repeat pays a
  // filter job over the cached model. Bounded at 4096 entries — driver
  // state stays fixed no matter the vocabulary; stale-snapshot keys
  // age out by LRU order.
  private val tokenLru = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(((Option[Long], Seq[Long]), Long), String), Option[Long]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(((Option[Long], Seq[Long]), Long), String), Option[Long]]): Boolean =
        size() > 4096
    })

  /** Point estimate for one key from the merged CMS at the resolved
    * version, as JSON — the heavy-hitter badge endpoint. After the
    * snapshot's first request the merge is memoized: the wire cost is
    * a driver-side d-row hash probe, no job.
    */
  def cmsEstimate(key: Long, asOf: Option[Long] = None,
      auths: Seq[String] = Nil): String = {
    gate(auths)
    val m = configured(cms, "cms")
    val snap = m.serveSnapshot(asOf).getOrElse(missing(asOf))
    val sk = cmsCache.get(snap.keyLatest, snap.at)(m.cmsAt(snap.at))
    val est = Sketches.cmsEstimate(sk, key, m.d, m.w)
    s"""{"version":${snap.at},"key":$key,"estimate":$est}"""
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
    val snap = m.serveSnapshot(asOf).getOrElse(missing(asOf))
    val qs = qsCache.get(snap.keyLatest, snap.at)(m.quantilesAt(snap.at))
    def one(g: String, o: Sketches.QsOut) =
      s"""{"group":${QueryService.jstr(g)},"version":${snap.at},"n_sample":${o.n_sample},"p50":${o.p50},"p90":${o.p90},"p99":${o.p99}}"""
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
    * must say "absent", not invent a likelihood).
    */
  def dsirToken(token: String, asOf: Option[Long] = None,
      auths: Seq[String] = Nil): String = {
    gate(auths)
    val m = configured(dsir, "dsir")
    val snap = m.serveSnapshot(asOf).getOrElse(missing(asOf))
    val model = modelCache.get(snap.keyLatest, snap.at)(
      m.modelAt(snap.at)
        .getOrElse(throw new NoSuchElementException("empty model store"))
        .cache())
    val lruKey = ((snap.keyAt, snap.at), token)
    val lr = Option(tokenLru.get(lruKey)).getOrElse {
      val got = model.filter(col("token") === token).limit(1).collect()
        .headOption.map(_.getAs[Long]("lr"))
      tokenLru.put(lruKey, got) // negative entries cache "absent" too
      got
    }.getOrElse(throw new NoSuchElementException(s"token not in model: $token"))
    s"""{"version":${snap.at},"token":${QueryService.jstr(token)},"lr":$lr}"""
  }

  /** Live ANN top-k over the tombstone-masked IVF store at its LATEST
    * committed version, as JSON [{rank,id,cosine}] — the serving edge
    * of `LiveAnnMaintainer`, probing nprobe cells through the same
    * `Similarity.ivfTopKWith` every sim_* entry is oracled on. Query by
    * stored id (`Left` — the vector's own live embedding is the query;
    * unknown/tombstoned id = 404) or by a raw vector (`Right` — scored
    * with self-exclusion OFF, so a stored vector at any id, including
    * negative ids, can rank). Latest only: the ANN store keeps no
    * historical index resolution (frozen codebook + masked assignment
    * is one state), so the route is live-only and `asOf` is the shim's
    * documented 400.
    */
  def annTopK(query: Either[Long, Array[Float]], k: Int, nprobe: Int,
      auths: Seq[String] = Nil): String = {
    gate(auths)
    val m = configured(ann, "ann")
    val snap = m.serveSnapshot.getOrElse(
      throw new NoSuchElementException("empty ann store"))
    val ivf = annCache.get(snap.keyLatest, snap.latest) {
      val fresh = m.latestIndex.getOrElse(
        throw new NoSuchElementException("empty ann store"))
      fresh.copy(assigned = fresh.assigned.cache())
    }
    val spark = ivf.assigned.sparkSession
    import spark.implicits._
    val (queries, excludeSelf) = query match {
      case Left(id) =>
        // one in-memory filter job; materialized so the probe join's
        // corpus side (the same assigned view) keeps clean lineage
        val r = ivf.assigned.filter(col("vec_id") === id)
          .select("vec_id", "embedding").limit(1).collect().headOption
          .getOrElse(throw new NoSuchElementException(s"vector not found: $id"))
        (Seq((r.getLong(0), r.getSeq[Float](1))).toDF("vec_id", "embedding"), true)
      case Right(v) =>
        // no sentinel id: self-exclusion is OFF for raw vectors, so no
        // stored id can collide with the query row's placeholder
        (Seq((0L, v.toSeq)).toDF("vec_id", "embedding"), false)
    }
    val rows = graft.pipeline.Similarity
      .ivfTopKWith(ivf, queries, k, nprobe, excludeSelf = excludeSelf)
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

  /** An empty store and an unknown/swept version are both missing
    * RESOURCES (404), the `/query?asOf=` discipline.
    */
  private def missing(asOf: Option[Long]): Nothing = asOf match {
    case Some(v) => throw new NoSuchElementException(
      s"no committed snapshot at version $v")
    case None => throw new NoSuchElementException("empty analytics store")
  }
}
