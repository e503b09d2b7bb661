package graft.plans

import graft.SparkSuite

import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSuite {
  import spark.implicits._

  private def rawDot(x: Array[Float], y: Array[Float]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) { s += x(i).toDouble * y(i).toDouble; i += 1 }
    s
  }

  test("graft_dot matches sequential double accumulation on eval and codegen paths") {
    GraftFunctions.register(spark)
    val vs = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.1f, -0.2f), Array(0.3f, 0.4f)),
      (Array.empty[Float], Array(1.0f)),        // length mismatch → min
      (Array.fill(64)(0.25f), Array.fill(64)(-0.5f)))
    val got = vs.toDF("a", "b")
      .select(call_function("graft_dot", col("a"), col("b")).as("d"))
      .as[Double].collect()
    vs.zip(got).foreach { case ((a, b), d) => assert(d == rawDot(a, b)) }
  }

  test("null flows through (nullIntolerant)") {
    GraftFunctions.register(spark)
    val r = Seq((Some(Array(1.0f)), Some(Array(2.0f))), (None, Some(Array(2.0f))))
      .toDF("a", "b")
      .select(call_function("graft_dot", col("a"), col("b")))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(r.toSet == Set(Some(2.0), None))
  }

  test("expression participates in whole-stage codegen") {
    GraftFunctions.register(spark)
    val df = spark.range(100)
      .select(array(col("id").cast("float"), lit(2.0f)).as("a"),
        array(lit(3.0f), col("id").cast("float")).as("b"))
      .select(call_function("graft_dot", col("a"), col("b")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_dot"), plan)
    assert(df.as[Double].collect().zipWithIndex.forall { case (d, i) => d == 3.0 * i + 2.0 * i })
  }

  test("spark.sql.extensions entry point registers functions at session build") {
    import org.apache.spark.sql.SparkSession
    try {
      // withExtensions drives the same class the spark.sql.extensions
      // conf loads (that conf is read from the SparkContext at context
      // creation, which the shared test context predates).
      // create() (not getOrCreate) builds a session with fresh session
      // state on the shared test SparkContext WITHOUT requiring the JVM
      // default session to be cleared first — clearing it opened a global
      // window in which concurrently-planning suites observed a null
      // default session (NPE in InsertIntoHadoopFsRelationCommand.run).
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions().apply(_))
        .create()
      val r = s2.sql(
        """SELECT graft_normalize('Ábacus') AS n,
          |  graft_dot(array(cast(1.0 as float), cast(2.0 as float)),
          |            array(cast(3.0 as float), cast(4.0 as float))) AS d""".stripMargin)
        .collect().head
      assert(r.getString(0) == "abacus")
      assert(r.getDouble(1) == 11.0)
    } finally {
      // create() sets the thread-local active session to s2; restore it for
      // the rest of this suite. The JVM-global default session was never
      // touched, so no other suite can observe a null session.
      SparkSession.setActiveSession(spark)
    }
  }

  test("double arrays fold like float arrays; mixed and non-numeric pairs are rejected") {
    GraftFunctions.register(spark)
    // array<double> pairs are first-class (the random-projection path)
    val d = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
      .select(call_function("graft_dot", col("a"), col("b"))).head.getDouble(0)
    assert(d == 11.0)
    // a float/double MIX would silently reinterpret Tungsten bytes —
    // rejected at analysis, not coerced
    val mixed = intercept[Exception] {
      Seq((Seq(1.0f, 2.0f), Seq(3.0, 4.0))).toDF("a", "b")
        .select(call_function("graft_dot", col("a"), col("b"))).collect()
    }
    assert(mixed.getMessage.toLowerCase.contains("graft_dot") ||
      mixed.getMessage.toLowerCase.contains("data type mismatch"))
    val strings = intercept[Exception] {
      Seq((Seq("x"), Seq("y"))).toDF("a", "b")
        .select(call_function("graft_dot", col("a"), col("b"))).collect()
    }
    assert(strings.getMessage.toLowerCase.contains("graft_dot") ||
      strings.getMessage.toLowerCase.contains("data type mismatch"))
  }
}
