package graft.api

import graft.functions.Sketches
import graft.streaming.{LiveAnnMaintainer, LiveDsirModelMaintainer, LiveQuantileMaintainer, LiveSketchMaintainer}

import org.apache.spark.sql.functions.col

/** Serving facade over the live ANALYTICS stores — the sketch/model
  * counterpart of [[QueryService]] for [[HttpShim]]'s `/sketch/…` and
  * `/model/…` routes. The engine stores got their serving edge in
  * round 9/10 (`/query` + `asOf`, `/count`, `/hybrid`); this closes the
  * same library-only asymmetry for the three analytics state classes
  * (CMS counters, per-group bottom-k quantiles, DSIR importance model).
  *
  * Serving cost mirrors the maintainers' read paths: CMS and quantile
  * answers merge BOUNDED driver-side state (d·w longs / |groups|·k
  * pairs — a sketch constant, never the corpus); the DSIR token lookup
  * is one filter over the vocabulary-sized model table (a Spark job,
  * pruned to the token). Nothing here scans documents.
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

  /** Point estimate for one key from the merged CMS at the resolved
    * version, as JSON — the heavy-hitter badge endpoint.
    */
  def cmsEstimate(key: Long, asOf: Option[Long] = None,
      auths: Seq[String] = Nil): String = {
    gate(auths)
    val m = configured(cms, "cms")
    val at = resolve(asOf, m.committedVersions)
    val est = Sketches.cmsEstimate(m.cmsAt(at), key, m.d, m.w)
    s"""{"version":$at,"key":$key,"estimate":$est}"""
  }

  /** Rank-rule quantiles at the resolved version — one group as a JSON
    * object (404 for a group the store never saw), or every group as a
    * sorted JSON array (bounded by the maintainer's group-domain
    * contract: a GROUP BY dimension, not a key domain).
    */
  def groupQuantiles(group: Option[String], asOf: Option[Long] = None,
      auths: Seq[String] = Nil): String = {
    gate(auths)
    val m = configured(quantiles, "quantiles")
    val at = resolve(asOf, m.committedVersions)
    val qs = m.quantilesAt(at)
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
    * must say "absent", not invent a likelihood).
    */
  def dsirToken(token: String, asOf: Option[Long] = None,
      auths: Seq[String] = Nil): String = {
    gate(auths)
    val m = configured(dsir, "dsir")
    val at = resolve(asOf, m.committedVersions)
    val row = m.modelAt(at)
      .getOrElse(throw new NoSuchElementException("empty model store"))
      .filter(col("token") === token).limit(1).collect().headOption
      .getOrElse(throw new NoSuchElementException(s"token not in model: $token"))
    s"""{"version":$at,"token":${QueryService.jstr(token)},"lr":${row.getAs[Long]("lr")}}"""
  }

  /** Live ANN top-k over the tombstone-masked IVF store at its LATEST
    * committed version, as JSON [{rank,id,cosine}] — the serving edge
    * of `LiveAnnMaintainer`, probing nprobe cells through the same
    * `Similarity.ivfTopKWith` every sim_* entry is oracled on. Query by
    * stored id (`Left` — the vector's own live embedding is the query;
    * unknown/tombstoned id = 404) or by a raw vector (`Right`). Latest
    * only: the ANN store keeps no historical index resolution (frozen
    * codebook + masked assignment is one state), so the route is
    * live-only and `asOf` is the shim's documented 400.
    */
  def annTopK(query: Either[Long, Array[Float]], k: Int, nprobe: Int,
      auths: Seq[String] = Nil): String = {
    gate(auths)
    val m = configured(ann, "ann")
    val ivf = m.latestIndex.getOrElse(
      throw new NoSuchElementException("empty ann store"))
    val spark = ivf.assigned.sparkSession
    import spark.implicits._
    val queries = query match {
      case Left(id) =>
        val q = ivf.assigned.filter(col("vec_id") === id)
          .select("vec_id", "embedding").limit(1).cache()
        try {
          if (q.isEmpty) throw new NoSuchElementException(s"vector not found: $id")
          // one-row frame: materialize to sever the self-referential
          // lineage (the corpus side of the probe join is the same
          // assigned view)
          val r = q.head
          Seq((r.getLong(0), r.getSeq[Float](1))).toDF("vec_id", "embedding")
        } finally { q.unpersist(); () }
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
