package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `spark.sql.extensions` entry point registering the native graft
  * expressions at session-build time — the deployment-grade alternative
  * to the runtime `GraftFunctions.register` call (which remains for
  * caller-provided sessions like the driver harness's):
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  * }}}
  *
  * Functions are then available to plain `spark.sql("SELECT
  * graft_normalize(...)")` on every session of the context, including
  * the Thrift/Connect fronts where no driver-side Scala runs.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_normalize"),
      new ExpressionInfo(classOf[LcNoDiacritics].getName, "graft_normalize"),
      (exprs: Seq[Expression]) => LcNoDiacritics(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
  }
}
