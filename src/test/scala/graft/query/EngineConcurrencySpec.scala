package graft.query

import graft.SparkSuite
import graft.ingest.IndexBuilder

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Concurrent-serving regression: many threads running overlapping
  * queries against one engine must produce exactly the sequential
  * answers. Pins the shared-state hazards of the serving path — the
  * LRU term-postings cache (an eviction racing a lookup once NPE'd),
  * Catalyst plan construction from multiple threads, and the
  * cache-disabled configuration.
  */
class EngineConcurrencySpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = (0 until 120).map { i =>
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
      .filter(w => (i + w.length) % 3 != 0) :+ s"w$i"
    (i.toLong, words.mkString(" "), "en", s"src${i % 3}", 50L + i)
  }.toDF("doc_id", "text", "lang", "source", "n_chars")

  private lazy val ix = IndexBuilder.fromDocumentsTable(spark, docs, numPartitions = 4).cacheAll()

  private val workload = Seq(
    "TEXT == 'alpha' and TEXT == 'beta'",
    "TEXT == 'gamma' or TEXT == 'delta'",
    "TEXT == 'epsilon' and TEXT != 'zeta'",
    "SOURCE == 'src1' and TEXT == 'alpha'",
    "NCHARS >= 60 and NCHARS < 120 and TEXT == 'beta'",
    "TEXT =~ 'gam.*'",
    "TEXT =~ '.*mma.*'") // trigram path: exercises trigramCache under load

  private def runAll(eng: WikiSearchEngine): Seq[Set[String]] =
    workload.map(q => eng.run(q).select("docId").collect().map(_.getString(0)).toSet)

  private def concurrent(eng: WikiSearchEngine, rounds: Int): Seq[Set[String]] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      // every query fires `rounds` times from 8 threads; all copies of a
      // query must agree with each other (and with sequential truth)
      val futures = (0 until rounds).flatMap(_ =>
        workload.map(q => Future(q -> eng.run(q).select("docId")
          .collect().map(_.getString(0)).toSet)))
      val results = Await.result(Future.sequence(futures), Duration.Inf)
      workload.map { q =>
        val answers = results.collect { case (`q`, ids) => ids }.distinct
        assert(answers.size == 1, s"non-deterministic answers for: $q")
        answers.head
      }
    } finally pool.shutdown()
  }

  test("8-thread workload matches sequential answers (term cache enabled, small to force eviction)") {
    // cache capacity below the distinct-term count forces constant LRU
    // eviction under concurrency — the containsKey/get race's habitat
    val eng = new WikiSearchEngine(spark, ix, EngineConfig(termCacheSize = 3))
    val expected = runAll(eng)
    assert(concurrent(eng, rounds = 5) == expected)
  }

  test("8-thread workload matches sequential answers with the cache disabled") {
    val eng = new WikiSearchEngine(spark, ix, EngineConfig(termCacheSize = 0))
    val expected = runAll(eng)
    assert(concurrent(eng, rounds = 3) == expected)
  }

  test("concurrent ranked serving agrees with sequential (statsCache under mixed auths)") {
    // bm25's driver-folded (N, avgdl) literals memoize per auths set —
    // concurrent first-touch from 8 threads across THREE auth keys races
    // the cache population; every copy must agree with sequential truth.
    // `expected` comes from a SEPARATE engine so the shared engine's
    // caches (stats/term/trigram) are COLD when the 8 threads start —
    // warming them sequentially would reduce the race to cache hits.
    val eng = new WikiSearchEngine(spark, ix)
    def calls(e: WikiSearchEngine): Seq[() => Seq[Any]] = Seq(
      () => e.rankTopK(Seq("alpha", "beta"), 5).collect().map(_.toSeq).toSeq,
      () => e.rankTopK(Seq("gamma"), 5, auths = Seq("en")).collect().map(_.toSeq).toSeq,
      () => e.rankTopK(Seq("delta"), 5, auths = Seq("en", "de")).collect().map(_.toSeq).toSeq,
      () => e.moreLikeThis("3", 5).collect().map(_.toSeq).toSeq)
    val expected = calls(new WikiSearchEngine(spark, ix)).map(_())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = (0 until 4).flatMap(_ => calls(eng).zipWithIndex.map {
        case (c, i) => Future(i -> c())
      })
      val results = Await.result(Future.sequence(futures), Duration.Inf)
      for ((i, got) <- results)
        assert(got == expected(i), s"ranked call $i diverged under concurrency")
    } finally pool.shutdown()
  }
}
