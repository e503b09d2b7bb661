package graft

import org.apache.spark.sql.functions._

/** One-off metamorphic soak (not part of the driver contract): random
  * queries over the real corpus, engine vs full-scan residual.
  */
object Soak {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[16]")
      .config("spark.sql.shuffle.partitions", "16").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val n   = args.lift(1).map(_.toInt).getOrElse(300)
    val eng = search.SearchQueries.engine(spark, dir)
    val ix  = search.SearchQueries.index(spark, dir)
    val vocab = ix.globalIndex
      .filter(col("fieldName") === "TEXT")
      .select("fieldValue").distinct().collect().map(_.getString(0))
      .filter(_.matches("[a-z0-9]+")).sorted
    val rnd = new scala.util.Random(99)
    def word() = vocab(rnd.nextInt(vocab.length))
    def leaf(): String = rnd.nextInt(11) match {
      case 0 | 1 => s"TEXT == '${word()}'"
      case 2     => s"TEXT != '${word()}'"
      case 3     => s"SOURCE == 'src${1 + rnd.nextInt(4)}'"
      case 4     => s"NCHARS >= ${50 + rnd.nextInt(300)}"
      case 5     => s"NCHARS < ${100 + rnd.nextInt(400)}"
      case 6     => s"TEXT =~ '${word().take(3)}.*'"
      case 7     => s"TEXT =~ '.*${word().takeRight(3)}'"
      case 8     => s"f:between(NCHARS, ${rnd.nextInt(200)}, ${200 + rnd.nextInt(400)})"
      case 9 => // opaque INFIX regex through the trigram access path,
        // verified against the scan residual's jexlMatches semantics
        val w = word()
        if (w.length >= 4) {
          val start = rnd.nextInt(w.length - 3)
          s"TEXT =~ '.*${w.substring(start, start + 3 + rnd.nextInt(w.length - start - 2))}.*'"
        } else s"TEXT == '$w'"
      case 10 => rnd.nextInt(2) match {
        case 0 => s"TEXT != '${100 + rnd.nextInt(900)}'"
        case _ => // random 1-edit typo through the f:fuzzy plan expansion
          val w = word()
          val t = rnd.nextInt(3) match {
            case 0 => w.drop(1)
            case 1 => w.updated(rnd.nextInt(w.length), 'q')
            case _ => w + "x"
          }
          s"f:fuzzy(TEXT, '$t')"
      }
    }
    def expr(d: Int): String =
      if (d == 0) leaf()
      else rnd.nextInt(6) match {
        case 0 => s"(${expr(d - 1)} and ${expr(d - 1)})"
        case 1 => s"(${expr(d - 1)} or ${expr(d - 1)})"
        case 2 => s"not ${expr(d - 1)}"
        case 3 => s"(${expr(d - 1)} and ${expr(d - 1)} and ${expr(d - 1)})"
        case _ => leaf()
      }
    var checked = 0; var failed = 0
    (1 to n).foreach { i =>
      val q = expr(1 + rnd.nextInt(2))
      try {
        val got = eng.run(q).select("docId").collect().map(_.getString(0)).toSet
        val want = ix.events
          .filter(graft.query.Compiler.compile(graft.query.QueryParser.parse(q)))
          .select("docId").collect().map(_.getString(0)).toSet
        if (got != want) {
          failed += 1
          println(s"DIVERGENCE #$i: $q")
          println(s"  engine-only: ${(got -- want).toSeq.sorted.take(10)}")
          println(s"  scan-only:   ${(want -- got).toSeq.sorted.take(10)}")
        }
        checked += 1
      } catch { case _: IllegalArgumentException => () }
    }
    println(s"SOAK: checked=$checked failed=$failed")
    spark.stop()
  }
}
