package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark implementation plus (when
  * SQL-expressible) a DuckDB oracle over the same parquet tables.
  *
  * Contract (driver/BASELINE.md): deterministic output — explicit ORDER BY
  * on a unique key, floats ROUNDed, UTC session — and identical column
  * names on both sides (the driver sorts columns by name before hashing).
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object GraftQuery {
  def checked(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, run, Some(oracle))
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, run, None)
}
