package graft.api

import graft.functions.Sketches
import graft.streaming.{LiveDsirModelMaintainer, LiveQuantileMaintainer, LiveSketchMaintainer}

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
    requiredAuth: Option[String] = None) {

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
