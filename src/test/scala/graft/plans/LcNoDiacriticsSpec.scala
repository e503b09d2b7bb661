package graft.plans

import graft.SparkSuite
import graft.functions.TextFunctions

import org.apache.spark.sql.functions._

class LcNoDiacriticsSpec extends SparkSuite {
  import spark.implicits._

  private val inputs = Seq("Ábacus", "CAFÉ", "Ñandú", "plain", "ÅÄÖ über Straße", "")

  test("native expression matches the reference normalizer on eval and codegen paths") {
    GraftFunctions.register(spark)
    val df = inputs.toDF("s")
      .select(col("s"), call_function("graft_normalize", col("s")).as("n"))
    val got = df.as[(String, String)].collect().toMap
    inputs.foreach(s => assert(got(s) == TextFunctions.lcNoDiacritics(s), s"for '$s'"))
  }

  test("null flows through (nullIntolerant)") {
    GraftFunctions.register(spark)
    val r = Seq[Option[String]](None, Some("X"))
      .toDF("s").select(call_function("graft_normalize", col("s")))
      .collect().map(r => Option(r.getString(0)))
    assert(r.toSet == Set(None, Some("x")))
  }

  test("expression participates in whole-stage codegen") {
    GraftFunctions.register(spark)
    // a LocalRelation folds away at plan time — use range() for a real scan
    val df = spark.range(100)
      .select(concat(lit("Áb"), col("id")).as("s"))
      .select(call_function("graft_normalize", col("s")).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    // '*(n)' prefixes mark operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [graft_normalize"), plan)
    assert(df.collect().forall(_.getString(0).startsWith("ab")))
  }
}
