package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal Rank Fusion (Cormack/Clarke/Büttcher, SIGIR 2009): combine
  * N independently-produced ranked result lists into one ranking by
  *
  *   score(id) = Σ_i 1 / (kRrf + rank_i(id))
  *
  * summing only over the lists that actually contain `id`. RRF is the
  * standard way to serve HYBRID retrieval — a lexical ranking (BM25 over
  * the term index) fused with a semantic one (cosine top-k over an
  * embedding column) — without having to calibrate the two score scales
  * against each other: only ranks enter the formula.
  *
  * The reference engine returns unranked result sets
  * (reference: query/src/main/java/org/apache/accumulo/examples/wikisearch/logic/AbstractQueryLogic.java
  * assembles results with no scoring); ranking and fusion are
  * beyond-reference serving surfaces layered on the same index.
  *
  * Scale posture: each input list is a RESULT-SET-sized ranking (a top-k
  * page, bounded by its producer — `rankTopK`, `Similarity.topK` — never
  * corpus-sized), so the outer-join chain and the single unpartitioned
  * row_number below run over ≤ Σ_i |list_i| rows. That is the same
  * bounded-result-page justification as the engine's ranked serving
  * path; nothing here scales with the corpus.
  *
  * Determinism contract (oracle bit-portability): the fused score is an
  * EXPLICIT left-to-right chain c_1 + c_2 + … + c_n, not an unordered
  * SUM, so float association cannot diverge between engines; each
  * contribution divides double 1.0 by the EXACT double of the integer
  * kRrf + rank; ties on the 6-dp-rounded score break by id.
  */
object HybridSearch {

  /** Fuse ranked lists into a top-`k` ranking.
    *
    * @param rankings each with columns (`id`, `rank`); ranks are
    *                 1-based within their list
    * @param kRrf     the RRF damping constant (60 in the original paper)
    * @return (rank, id, score) — score rounded to 6 dp, rank 1-based
    */
  def rrfFuse(rankings: Seq[DataFrame], kRrf: Int = 60, k: Int = 20): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val tagged = rankings.zipWithIndex.map { case (df, i) =>
      df.select(col("id").cast("bigint").as("id"),
        col("rank").cast("bigint").as(s"r$i"))
    }
    val joined = tagged.reduce((a, b) => a.join(b, Seq("id"), "full_outer"))
    val contribs = rankings.indices.map { i =>
      // integer kRrf + rank first, then one exact int→double conversion,
      // then the division — the oracle states the identical composition
      coalesce(lit(1.0) / (lit(kRrf.toLong) + col(s"r$i")).cast("double"), lit(0.0))
    }
    val score = round(contribs.reduce(_ + _), 6)
    joined
      .select(col("id"), score.as("score"))
      // bounded by Σ list sizes (result pages), per the scaladoc above
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("id"))).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("rank"), col("id"), col("score"))
      .orderBy("rank")
  }
}
