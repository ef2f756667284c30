package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{round => sparkRound}

/** Shared column helpers. */
package object functions {

  /** Oracle-stable decimal rounding of a double column.
    *
    * Spark's `round(x, n)` rounds the SHORTEST DECIMAL REPR of the double
    * (BigDecimal.valueOf → HALF_UP) while DuckDB's `ROUND(x, n)` rounds
    * the BINARY value (`std::round(x·10ⁿ)/10ⁿ`); they disagree whenever a
    * value like 4.475 is stored as 4.47499999…. Computing
    * `round(x·10ⁿ, 0)/10ⁿ` on the Spark side performs the identical
    * scaled-binary rounding (scale-0 HALF_UP == std::round for every
    * double), so results hash-match DuckDB bit-for-bit.
    */
  def dround(c: Column, n: Int): Column = {
    val m = math.pow(10, n)
    sparkRound(c * m, 0) / m
  }
}
