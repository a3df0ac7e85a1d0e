package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registrable operator query: a Spark plan over the testdata tables and
  * (when SQL-expressible) an equivalent DuckDB oracle. Column names/types are
  * aligned between the two — the driver sorts columns by name and hashes
  * values, so every computed column is aliased identically on both sides.
  */
final case class Op(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Op {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Op =
    Op(name, fn, Some(oracle))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): Op =
    Op(name, fn, None)
}
