package graft.query

import graft.SparkSuite
import graft.ingest.IndexBuilder

import org.apache.spark.sql.functions._

/** Metamorphic soundness harness: for randomly generated boolean /
  * range / regex / function queries, the ENGINE's index-assisted path
  * (plan → batched leaf stats → local/distributed candidates →
  * semi/anti-joins → residual) must return exactly the docs the pure
  * full-scan residual returns. The residual compiler is the semantic
  * oracle (it is itself oracled cell-exact against DuckDB by the ws_*
  * queries), so any divergence is a planner bug: a dropped candidate,
  * an unsound range fusion, a bad negation prune, a normalizer
  * mismatch. Seeded — failures reproduce.
  */
class EngineEquivalenceSpec extends SparkSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)

  private val vocab = Seq(
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lambda", "mucron", "nuplex", "xiform", "omicron",
    "pivotal", "rhombus", "sigmoid", "tautology", "upsilon")

  private lazy val docsDf = {
    val langs   = Seq("en", "de", "fr")
    val sources = Seq("src1", "src2", "src3")
    val rows = (0 until 150).map { i =>
      val n    = 4 + rnd.nextInt(9)
      val text = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (i.toLong, text, langs(i % langs.size), sources(rnd.nextInt(3)), text.length)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private lazy val ix  = IndexBuilder.fromDocumentsTable(spark, docsDf, numPartitions = 4).cacheAll()
  private lazy val eng = new WikiSearchEngine(spark, ix)

  private def word() = vocab(rnd.nextInt(vocab.size))

  private def leaf(): String = rnd.nextInt(9) match {
    case 0 => s"TEXT == '${word()}'"
    case 1 => s"TEXT != '${word()}'"
    case 2 => s"SOURCE == 'src${1 + rnd.nextInt(3)}'"
    case 3 => s"NCHARS >= ${20 + rnd.nextInt(40)}"
    case 4 => s"NCHARS < ${30 + rnd.nextInt(60)}"
    case 5 => s"TEXT =~ '${word().take(3)}.*'"
    case 6 => s"TEXT =~ '.*${word().takeRight(3)}'"
    case 7 => s"f:between(NCHARS, ${10 + rnd.nextInt(30)}, ${50 + rnd.nextInt(60)})"
    case 8 => s"TEXT != '${300 + rnd.nextInt(100)}'" // numeric NE over words (3VL regression)
  }

  private def expr(depth: Int): String =
    if (depth == 0) leaf()
    else rnd.nextInt(5) match {
      case 0 => s"(${expr(depth - 1)} and ${expr(depth - 1)})"
      case 1 => s"(${expr(depth - 1)} or ${expr(depth - 1)})"
      case 2 => s"not ${expr(depth - 1)}"
      case 3 => s"(${expr(depth - 1)} and ${expr(depth - 1)} and ${expr(depth - 1)})"
      case _ => leaf()
    }

  /** The oracle: pure residual evaluation over the full event view — no
    * index, no planning (the engine's own full-scan branch, applied
    * unconditionally).
    */
  private def scanIds(q: String, auths: Seq[String]): Set[String] = {
    val ast = QueryParser.parse(q)
    val ev  = if (auths.isEmpty) ix.events else ix.events.filter(col("language").isin(auths: _*))
    ev.filter(Compiler.compile(ast)).select("docId").collect().map(_.getString(0)).toSet
  }

  private def engineIds(q: String, auths: Seq[String]): Set[String] =
    eng.run(q, auths).select("docId").collect().map(_.getString(0)).toSet

  test("60 random queries: index-assisted path ≡ full-scan residual (incl. auths)") {
    var checked = 0
    (1 to 60).foreach { i =>
      val q     = expr(1 + rnd.nextInt(2))
      val auths = if (rnd.nextInt(4) == 0) Seq("en", "de") else Nil
      try {
        val got  = engineIds(q, auths)
        val want = scanIds(q, auths)
        assert(got == want,
          s"divergence on query #$i: $q (auths=$auths)\n engine=${got.toSeq.sorted}\n scan=${want.toSeq.sorted}")
        checked += 1
      } catch {
        case _: IllegalArgumentException => () // all-negation rejected by design
      }
    }
    assert(checked >= 40, s"only $checked queries actually checked")
  }
}
