package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named engine query with its DuckDB oracle (None ⇒ the driver records
  * a weaker rows-only check — used for ops whose semantics aren't
  * SQL-expressible, e.g. MinHash banding).
  *
  * Determinism contract with the driver harness: every query ends with a
  * total ORDER BY; money sums go through decimal casts (exact,
  * order-independent) and floating ratios through ROUND — so Spark and
  * DuckDB produce bit-identical values regardless of execution order.
  */
case class NamedQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object NamedQuery {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): NamedQuery =
    NamedQuery(name, fn, Some(oracle))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): NamedQuery =
    NamedQuery(name, fn, None)
}
