package graft.query

import graft.SparkSuite
import graft.ingest.IndexBuilder

import org.apache.spark.sql.functions._

/** SURVEY.md §7.5 hard part #1: lossy-index fidelity. When a term's
  * posting list overflows (> 20 distinct uids ⇒ ignore=true, uids
  * dropped — `GlobalIndexUidCombiner.java:40,65-76`), the index can only
  * provide whole-partition candidates; the residual filter must restore
  * exact answers ("index gives candidates, final filter decides truth",
  * `QueryLogic.java:173-186`).
  */
class LossyIndexSpec extends SparkSuite {
  import spark.implicits._

  // 30 docs contain 'hot' (overflows MAX=20); 5 also contain 'rare'.
  private lazy val docs = (0 until 40).map { i =>
    val words = Seq.newBuilder[String]
    words += s"w$i"
    if (i < 30) words += "hot"
    if (i % 8 == 0 && i < 40) words += "rare"
    (i.toLong, words.result().mkString(" "), "en", s"src${i % 3}", 100L + i)
  }.toDF("doc_id", "text", "lang", "source", "n_chars")

  private lazy val ix  = IndexBuilder.fromDocumentsTable(spark, docs, numPartitions = 1).cacheAll()
  private lazy val eng = new WikiSearchEngine(spark, ix)

  private def ids(q: String): Set[Long] =
    eng.run(q).select("docId").collect().map(_.getString(0).toLong).toSet

  test("the hot term's posting list is lossy in the index") {
    val row = ix.globalIndex
      .filter(col("fieldName") === "TEXT" && col("fieldValue") === "hot")
      .select("count", "ignore", "uids").collect().head
    assert(row.getAs[Long]("count") == 30)
    assert(row.getAs[Boolean]("ignore"))
    assert(row.getAs[scala.collection.Seq[String]]("uids").isEmpty)
  }

  test("query on the lossy term is still exact (whole-shard fallback + residual)") {
    assert(ids("TEXT == 'hot'") == (0L until 30L).toSet)
  }

  test("AND of lossy and exact term is exact") {
    // 'rare' docs: 0, 8, 16, 24, 32; of those, 'hot' docs are < 30
    assert(ids("TEXT == 'hot' and TEXT == 'rare'") == Set(0L, 8L, 16L, 24L))
  }

  test("negating the lossy term stays exact (no anti-join on lossy postings)") {
    assert(ids("TEXT == 'rare' and TEXT != 'hot'") == Set(32L))
  }

  test("unevaluated field stays exact under lossy shard fallback (fi-style verification)") {
    // With TEXT unevaluated the residual compiles TEXT terms to TRUE, so
    // a whole-shard fallback would leak all 40 docs; the engine must
    // verify the overflowed shard against the exact termPostings (the
    // reference walks the exact per-partition fi index the same way).
    val engU = new WikiSearchEngine(spark, ix, EngineConfig(unevaluatedFields = Set("TEXT")))
    def idsU(q: String): Set[Long] =
      engU.run(q).select("docId").collect().map(_.getString(0).toLong).toSet
    assert(idsU("TEXT == 'hot'") == (0L until 30L).toSet)
    // negated lossy term: exact postings are empty (overflow), so the
    // hidden docs must be pruned via the fi analogue too
    assert(idsU("TEXT == 'rare' and TEXT != 'hot'") == Set(32L))
  }

  test("exact term keeps exact uids in the index") {
    val row = ix.globalIndex
      .filter(col("fieldName") === "TEXT" && col("fieldValue") === "rare")
      .select("count", "ignore", "uids").collect().head
    assert(!row.getAs[Boolean]("ignore"))
    assert(row.getAs[scala.collection.Seq[String]]("uids").toSet == Set("0", "8", "16", "24", "32"))
  }
}
