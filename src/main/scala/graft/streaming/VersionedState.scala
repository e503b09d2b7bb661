package graft.streaming

/** The shared LSM-style versioned-parquet state layout behind the
  * streaming maintainers (`LiveIndexMaintainer`, `LiveNearDupMaintainer`,
  * `LiveEngineMaintainer`, `LiveAnnMaintainer`):
  *
  *   - `v<batchId>/` — a DELTA holding only that micro-batch's output
  *     (O(|batch|) bytes at any accumulated corpus size);
  *   - `c<k>/`       — a COMPACTED BASE subsuming every version ≤ k
  *     (written by `Compaction`, never by a maintainer).
  *
  * The read set at version `upTo` is the newest committed base `c_k`
  * (k ≤ upTo) plus the committed deltas k < v ≤ upTo — readers union
  * them and (for folded state like the lossy UidList index) re-aggregate.
  * This is the Spark shape of the reference's lazy-merge design: Accumulo
  * never rewrites a table per flush either — `GlobalIndexUidCombiner` is
  * attached at scan scope too (`WikipediaIngester.java:98,116,126,135`)
  * and minor/major compactions bound read amplification, exactly the
  * base/delta split here.
  *
  * Commit protocol: a version counts only once its `_SUCCESS` marker(s)
  * exist — for multi-part state (`parts` non-empty) EVERY part must have
  * committed. Maintainers force the marker per write (object-store
  * deployments commonly disable it globally).
  *
  * SINGLE-WRITER CONTRACT: the protocol is safe for ONE writer beside
  * any number of readers — a reader either sees a version's full marker
  * set or ignores it, and the writer never rewrites a committed dir.
  * It is NOT safe for two concurrent writers to one store dir: version
  * numbering comes from each writer's own stream checkpoint, so two
  * independent streams would both claim `v<k>` and the overwrite-mode
  * replay path (which exists for crash recovery of an UNCOMMITTED
  * partial write) would silently clobber the other writer's committed
  * delta. One maintainer per store dir is the deployment invariant;
  * [[WriterLease]] enforces it within a JVM (double `attach` to one dir
  * throws), and across processes it must be held by the orchestration
  * layer — exactly the "one tablet server owns a tablet" invariant the
  * reference's Accumulo substrate provides for its tables.
  */

/** One resolved serving snapshot (`VersionedState.serveSnapshot`):
  * the version a request resolved to, the read-set identity backing it
  * (the memoization key), and the latest committed version + its
  * read-set (the cache GENERATION key — when it changes, a commit or
  * compaction happened and per-snapshot caches must turn over).
  */
case class ServeSnapshot(
    at: Long,
    keyAt: (Option[Long], Seq[Long]),
    latest: Long,
    keyLatest: (Option[Long], Seq[Long]))

private[streaming] object VersionedState {

  /** ONE FileSystem resolution point for the whole state layer: the
    * store dir's scheme picks the implementation through the active
    * session's Hadoop configuration — plain POSIX paths and `file:`
    * URIs behave identically to the old `java.io.File` probes, and an
    * object-store deployment (the realistic 100 TB home: `hdfs:`,
    * `s3a:`, …) lists versions and sees `_SUCCESS` markers through the
    * same connector Spark writes them with. `FileSystem.get` caches per
    * (scheme, authority), so per-probe resolution is a map lookup.
    */
  private def fs(p: String): org.apache.hadoop.fs.FileSystem = {
    // active (thread-local) first, then the default session: a probe
    // from a thread that never inherited the active-session thread-local
    // (pool threads, cleanup threads) must still see spark.hadoop.*
    // (s3a credentials, endpoints) — a bare Configuration would resolve
    // the very object stores this layer targets without them
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    new org.apache.hadoop.fs.Path(p).getFileSystem(conf)
  }

  /** Fully-qualified form of a store path (scheme + authority resolved
    * through the active Hadoop conf) — one canonical spelling for
    * "/x/y" vs "file:/x/y" vs "file:///x/y", used as the WriterLease
    * key so spelling variants of one dir cannot dodge the guard.
    */
  def qualified(p: String): String = {
    val path = new org.apache.hadoop.fs.Path(p)
    fs(p).makeQualified(path).toString
  }

  /** Path-exists probe — THE `_SUCCESS`-marker test; every maintainer's
    * replay-skip and carried-part probe routes through here so the
    * commit protocol cannot drift from the version listing's notion of
    * "committed".
    */
  def exists(path: String): Boolean =
    fs(path).exists(new org.apache.hadoop.fs.Path(path))

  /** All `_SUCCESS` markers of version dir `dir/<name>` present —
    * `parts` empty ⇒ the version dir itself is the parquet dataset;
    * non-empty ⇒ each named subdir is, and EVERY part must have
    * committed (the multi-part commit protocol).
    */
  def markerCommitted(dir: String, name: String, parts: Seq[String]): Boolean =
    if (parts.isEmpty) exists(s"$dir/$name/_SUCCESS")
    else parts.forall(p => exists(s"$dir/$name/$p/_SUCCESS"))

  /** Committed versions under `dir` with the given name prefix
    * ('v' = delta, 'c' = compacted base).
    */
  def committed(dir: String, prefix: Char, parts: Seq[String]): Seq[Long] = {
    val d = new org.apache.hadoop.fs.Path(dir)
    val f = fs(dir)
    if (!f.exists(d)) Nil
    else f.listStatus(d).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.matches(prefix + "\\d+"))
      .map(_.getPath.getName)
      .filter(n => markerCommitted(dir, n, parts))
      .map(_.drop(1).toLong)
  }

  /** Both kinds in ONE directory listing: (committed bases, committed
    * deltas), each sorted — the serving path's listing primitive (an
    * object-store listStatus is an RPC; one per request, not four).
    */
  def committedSets(dir: String, parts: Seq[String]): (Seq[Long], Seq[Long]) = {
    val d = new org.apache.hadoop.fs.Path(dir)
    val f = fs(dir)
    if (!f.exists(d)) (Nil, Nil)
    else {
      val names = f.listStatus(d).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.matches("[vc]\\d+"))
        .map(_.getPath.getName)
        .filter(n => markerCommitted(dir, n, parts))
      (names.collect { case n if n.head == 'c' => n.drop(1).toLong }.sorted,
        names.collect { case n if n.head == 'v' => n.drop(1).toLong }.sorted)
    }
  }

  /** Pure read-set arithmetic over a listing — `readSet` without the
    * second directory walk.
    */
  def readSetFrom(bases: Seq[Long], deltas: Seq[Long], upTo: Long)
      : (Option[Long], Seq[Long]) = {
    val base  = bases.filter(_ <= upTo).sorted.lastOption
    val floor = base.getOrElse(-1L)
    (base, deltas.filter(v => v > floor && v <= upTo).sorted)
  }

  /** Serving-path snapshot resolution in ONE listing: resolve `asOf`
    * (None = latest) against the EXACT committed versions on disk —
    * not an in-memory recovery pointer that can lag a concurrent
    * writer — and return the resolved version, its read-set key, the
    * latest committed version, and the latest read-set key (the
    * cache-generation key). None = empty store or unknown/swept
    * version (the serving edge's 404).
    */
  def serveSnapshot(dir: String, parts: Seq[String], asOf: Option[Long])
      : Option[ServeSnapshot] = {
    val (bases, deltas) = committedSets(dir, parts)
    val servable = (bases ++ deltas).distinct.sorted
    val latest = servable.lastOption.getOrElse(return None)
    val at = asOf match {
      case Some(v) => if (servable.contains(v)) v else return None
      case None    => latest
    }
    Some(ServeSnapshot(at,
      readSetFrom(bases, deltas, at),
      latest,
      readSetFrom(bases, deltas, latest)))
  }

  /** Largest committed version of any kind — the recovery pointer. */
  def maxVersion(dir: String, parts: Seq[String]): Long =
    (committed(dir, 'v', parts) ++ committed(dir, 'c', parts))
      .foldLeft(-1L)(math.max)

  /** Every version an `asOf=` snapshot read can resolve EXACTLY: deltas
    * still on disk plus compacted bases (a `c<k>` base answers for its
    * own version k; versions folded beneath it and swept are gone as
    * resources — the serving edge must 404 them, not silently answer
    * from the base). Sorted ascending; the last element is "latest".
    */
  def servableVersions(dir: String, parts: Seq[String]): Seq[Long] =
    (committed(dir, 'v', parts) ++ committed(dir, 'c', parts)).distinct.sorted

  /** (newest base ≤ upTo, deltas above it and ≤ upTo, sorted). */
  def readSet(dir: String, parts: Seq[String], upTo: Long): (Option[Long], Seq[Long]) = {
    val bases = committed(dir, 'c', parts).filter(_ <= upTo)
    val base  = bases.sorted.lastOption
    val floor = base.getOrElse(-1L)
    (base, committed(dir, 'v', parts).filter(v => v > floor && v <= upTo).sorted)
  }

  /** Parquet paths for one part of an ALREADY-RESOLVED read set — pure
    * arithmetic over the key, NO directory listing. This is the serving
    * path's read primitive: a request resolves its snapshot ONCE
    * (`serveSnapshot`) and then reads exactly that set, so a compaction
    * sweep landing between resolution and read can only surface as a
    * missing path (the caller's 404), never as a second listing that
    * silently yields a smaller — or empty — merge for the same version.
    */
  def pathsOf(dir: String, key: (Option[Long], Seq[Long]), part: Option[String]): Seq[String] = {
    val sub = part.map("/" + _).getOrElse("")
    key._1.map(k => s"$dir/c$k$sub").toSeq ++ key._2.map(v => s"$dir/v$v$sub")
  }

  /** Parquet paths for one part of the read set at `upTo` (one fresh
    * listing — maintenance-path convenience; serving should resolve a
    * snapshot once and use `pathsOf`).
    */
  def readPaths(dir: String, parts: Seq[String], part: Option[String], upTo: Long): Seq[String] =
    pathsOf(dir, readSet(dir, parts, upTo), part)

  /** Recursive delete through the same FileSystem resolution as the
    * listing — sweeps work on any scheme the store dir lives on.
    */
  def deleteRecursively(path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val f = fs(path)
    if (f.exists(p)) { f.delete(p, true); () }
  }

  def deleteRecursively(f: java.io.File): Unit =
    deleteRecursively(f.getAbsolutePath)

  // ---- LSM delete masking (shared by the engine and ANN maintainers) ----

  /** Row provenance: a row's version is the `v<k>`/`c<k>` directory it
    * was read from (`input_file_name`) — no version column on disk, so
    * deltas stay schema-identical to batch-built tables.
    */
  def withVer(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    df.withColumn("ver",
      regexp_extract(input_file_name(), "/[vc](\\d+)/", 1).cast("long"))
  }

  /** (key, tver) tombstone pairs, or None when no tombstone exists (the
    * common case skips the joins entirely).
    */
  def tombstoneSet(tombs: Option[org.apache.spark.sql.DataFrame], key: String)
      : Option[org.apache.spark.sql.DataFrame] = {
    import org.apache.spark.sql.functions.col
    tombs
      .map(t => withVer(t).select(col(key), col("ver").as("tver")).distinct())
      .filter(!_.isEmpty)
  }

  /** Version-ordered delete mask: a row is dead iff some tombstone for
    * its key is at the row's version or later (so re-ingest after a
    * tombstone resurrects). One hash anti-join; `ver` is
    * provenance-only and dropped.
    */
  def maskDeleted(rows: org.apache.spark.sql.DataFrame,
      tombs: Option[org.apache.spark.sql.DataFrame], key: String)
      : org.apache.spark.sql.DataFrame =
    tombs match {
      case None => rows.drop("ver")
      case Some(t) =>
        rows.join(t, rows(key) === t(key) && rows("ver") <= t("tver"), "left_anti")
          .drop("ver")
    }
}

/** In-JVM guard for the single-writer contract (see the file header):
  * every maintainer's `attach` registers its streaming query here, and
  * a second ACTIVE writer on the same store dir is refused before it
  * can commit anything. A finished/stopped query releases the dir
  * implicitly (`isActive` goes false), so the restart-recovery pattern —
  * stop, construct a fresh maintainer, attach again — keeps working.
  * Cross-process double-writers are out of a JVM registry's reach; that
  * case is the documented deployment invariant.
  */
private[streaming] object WriterLease {
  private val active = scala.collection.mutable.Map
    .empty[String, org.apache.spark.sql.streaming.StreamingQuery]

  /** Register `q` as the writer for `dir`; when another live query
    * holds the dir, stops `q` and throws. The refusal is a standing-
    * writer guard, not a commit-atomic lock: `q`'s very first
    * micro-batch can race the registration (start() is asynchronous),
    * so a pathological double-attach might land one batch before being
    * stopped — the guard's job is that a MISCONFIGURED second writer
    * cannot keep running, which is where the silent version-numbering
    * corruption lives.
    */
  def register(dir: String,
      q: org.apache.spark.sql.streaming.StreamingQuery)
      : org.apache.spark.sql.streaming.StreamingQuery = synchronized {
    // FileSystem-qualified key: "/x/y" and "file:/x/y" are the SAME
    // store dir and must hold the same lease
    val key = VersionedState.qualified(dir)
    active.get(key).filter(old => old.isActive && old.id != q.id) match {
      case Some(_) =>
        q.stop()
        throw new IllegalStateException(
          s"store dir already has an active streaming writer: $dir " +
            "(single-writer contract — stop the existing query first)")
      case None =>
        active(key) = q
        q
    }
  }
}
