package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Self-audit data generator: scales the sf0.1 fixture ~Nx (default 10x
  * => "sf1.0") by unioning key-shifted copies, so the SCALE.md claims
  * ("amortizes at scale", "O(|batch|)", "no all-pairs") can be measured
  * rather than argued (VERDICT r9 next-round #1). Each copy is a
  * self-contained TPC-H universe: every foreign key shifts by the same
  * per-copy stride, so join selectivities and per-key fan-outs match
  * the base corpus and row counts scale exactly Nx.
  *
  * Two tables need more than a key shift to scale HONESTLY:
  *  - `documents`: verbatim copies would make every doc a 10-way exact
  *    near-dup, so LSH/MinHash pair output would scale ~N^2 by data
  *    construction and any dedup curve would be meaningless. Instead
  *    ~60% of tokens (hash-selected, deterministic) get a per-copy
  *    suffix, which pushes cross-copy SHINGLE Jaccard to ~0.4³ ≈ 0.06
  *    — realistic independence for unrelated docs. (The first cut
  *    renamed 30%, leaving cross-copy shingle Jaccard ≈ 0.34/(2−0.34)
  *    ≈ 0.2: inside the 32×2 minhash banding's candidate zone, so
  *    EVERY doc had N−1 candidate partners that failed exact verify —
  *    a pathologically dense near-miss band no real corpus has, which
  *    made dd_minhash_lsh's exact-verify join look quadratic. That IS
  *    a true LSH property worth knowing — candidate density, not
  *    corpus size, drives its cost — but a scaling fixture should
  *    model independent copies.) Within-copy structure is exact, so
  *    true pair counts scale Nx like a real corpus. The serving-query
  *    vocabulary (ws_q1/q8/bm25/hybrid terms) is exempted so those
  *    terms' document frequency — and the postings the queries touch —
  *    scales Nx too. n_chars is recomputed from the rewritten text
  *    (NCHARS range queries must see the real value).
  *  - `embeddings`: verbatim vectors would collapse ANN to exact-dup
  *    retrieval and IVF training to 10x-weighted duplicate points; a
  *    deterministic per-(copy, vec, dim) jitter of ~±0.01 keeps copies
  *    distinct without moving the space's shape.
  *
  * Usage: `ScaleUp [srcDir] [destDir] [copies]`. Output layout matches
  * the fixture (`<dest>/<table>.parquet`), so every `Tables.load` /
  * `SPARK_GRAFT_SF_DIR` consumer runs against it unchanged. Writes
  * outside the repo (default /tmp) — this is measurement scaffolding,
  * not fixture regeneration.
  */
object ScaleUp {

  /** Serving-query vocabulary kept verbatim in every copy (see above). */
  private val keepTerms = Seq(
    "data", "de", "dup", "filter", "hash", "join", "merge", "query",
    "sort", "sow", "spark", "stream", "table", "vector", "window")

  def main(args: Array[String]): Unit = {
    val src    = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dest   = args.lift(1).getOrElse("/tmp/graft-sf1.0")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val stride = 10000000L
    val spark  = graft.Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(name: String): DataFrame =
      if (name == "events") graft.Tables.load(spark, src, "events")
      else spark.read.parquet(s"$src/$name.parquet")

    def write(df: DataFrame, name: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$dest/$name.parquet")

    /** Union of `copies` key-shifted copies; `shift` lists the int64
      * key columns that move by copy * stride.
      */
    def scaled(name: String, shift: Seq[String],
        perCopy: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame = {
      val base = read(name)
      (0 until copies).map { i =>
        val shifted = shift.foldLeft(perCopy(base, i)) { (d, k) =>
          d.withColumn(k, col(k) + lit(i * stride))
        }
        shifted
      }.reduce(_ unionByName _)
    }

    // dims: tiny, copied verbatim (shared across all copies, like a
    // real warehouse's reference data)
    write(read("region"), "region", 1)
    write(read("nation"), "nation", 1)

    write(scaled("customer", Seq("c_custkey")), "customer", 2)
    write(scaled("supplier", Seq("s_suppkey")), "supplier", 1)
    write(scaled("part",     Seq("p_partkey")), "part", 2)
    write(scaled("orders",   Seq("o_orderkey", "o_custkey")), "orders", 8)
    write(scaled("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey")),
      "lineitem", 16)
    write(scaled("events",   Seq("event_id", "user_id")), "events", 8)

    val keepArr = array(keepTerms.map(lit): _*)
    write(scaled("documents", Seq("doc_id"), (d, i) =>
      if (i == 0) d
      else {
        val renamed = transform(split(col("text"), " "),
          t => when(pmod(hash(t), lit(10)) < 6 && !array_contains(keepArr, t),
            concat(t, lit("_" + i))).otherwise(t))
        d.withColumn("text", array_join(renamed, " "))
          .withColumn("n_chars", length(col("text")))
      }), "documents", 8)

    write(scaled("embeddings", Seq("vec_id"), (d, i) =>
      if (i == 0) d
      else d.withColumn("embedding",
        transform(col("embedding"), (x, j) =>
          (x + (pmod(hash(col("vec_id"), j, lit(i)), lit(1001)) - 500)
            .cast("float") / lit(50000.0f)).cast("float")))),
      "embeddings", 2)

    println(s"wrote ${copies}x $src -> $dest")
    spark.stop()
  }
}
