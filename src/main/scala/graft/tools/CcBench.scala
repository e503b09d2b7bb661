package graft.tools

import graft.Sessions
import graft.pipeline.Dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Boundary validation of `Dedup.connectedComponents`' size-adaptive
  * driver gate (not part of the driver surface): engineers an edge list
  * of EXACTLY the default 200k-edge threshold, checks that
  *  1. the driver union-find and the forced-distributed star loop
  *     produce IDENTICAL (doc_id, component) maps on that corpus,
  *  2. the gate actually flips at threshold+1 (plan-shape check:
  *     the driver path returns a LocalRelation, the distributed path a
  *     computed plan),
  *  3. and records both wall times — the numbers behind SCALE.md's
  *     "Appendix: CC driver-gate boundary" claims.
  *
  * The corpus mixes the two adversarial shapes: two 10,000-edge CHAINS
  * (diameter stresses the star loop's O(log²) rounds; a naive
  * propagation loop would need 10,000 rounds) and 20,000 components of
  * 10 nodes (width stresses per-round shuffle volume and the driver
  * map's entry count — 220,002 nodes total).
  * Usage: graft.tools.CcBench
  */
object CcBench {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // two chains of 10,001 nodes (10,000 edges each), node ids c*100000+j
    val chainEdges = spark.range(2L * 10000).select(
        (col("id") / 10000).cast("long").as("c"), pmod(col("id"), lit(10000L)).as("j"))
      .select((col("c") * 100000 + col("j")).as("a"),
        (col("c") * 100000 + col("j") + 1).as("b"))
    // 20,000 size-10 path components (9 edges each), ids from 1,000,000
    val smallEdges = spark.range(20000L * 9).select(
        (col("id") / 9).cast("long").as("c"), pmod(col("id"), lit(9L)).as("j"))
      .select((lit(1000000L) + col("c") * 10 + col("j")).as("a"),
        (lit(1000000L) + col("c") * 10 + col("j") + 1).as("b"))
    val edges = chainEdges.unionByName(smallEdges).cache()
    val nEdges = edges.count()
    require(nEdges == 200000L, s"edge construction drifted: $nEdges")

    def timed(label: String)(body: => DataFrame): DataFrame = {
      val t0  = System.nanoTime()
      val out = body
      val n   = out.count()
      println(f"$label%-34s rows=$n%8d wall=${(System.nanoTime() - t0) / 1e9}%6.2f s")
      out
    }

    // AT the threshold: the driver union-find engages (<= 200000)
    val driver = timed("driver union-find (200k edges)")(
      Dedup.connectedComponents(edges)).cache()
    // same corpus, gate disabled: the distributed star loop
    val dist = timed("distributed star loop (forced)")(
      Dedup.connectedComponents(edges, driverThreshold = 0L)).cache()

    // identical min-label components, both directions
    val diff = driver.exceptAll(dist).count() + dist.exceptAll(driver).count()
    val comps = driver.select("component").distinct().count()
    println(s"driver vs distributed row diff: $diff (expect 0); " +
      s"components=$comps (expect 20002); nodes=${driver.count()} (expect 220002)")
    require(diff == 0 && comps == 20002L)

    // plan-shape proof of WHICH path ran: the driver path materializes a
    // LocalRelation; the distributed path plans over checkpointed edges
    def isLocal(df: DataFrame): Boolean =
      df.queryExecution.analyzed.collectLeaves().forall(
        _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
    require(isLocal(driver), "200k edges should take the driver path")
    require(!isLocal(dist), "forced path should be distributed")

    // ONE edge past the threshold: the gate must flip to distributed
    val over = edges.unionByName(
      spark.range(1).select(lit(3000000L).as("a"), lit(3000001L).as("b")))
    val overCc = timed("default gate at 200k+1 edges")(
      Dedup.connectedComponents(over))
    require(!isLocal(overCc), "200k+1 edges must take the distributed path")
    println("gate flip at threshold+1: OK (distributed plan)")
    spark.stop()
  }
}
