package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared exact-integer quantizers (the repo's oracle-exactness
  * pattern): every transcendental chain is quantized to integer micro
  * units in ONE closed-form expression that both engines evaluate with
  * the identical association, so downstream sums/products are pure
  * BIGINT arithmetic — immune to accumulation order and to any
  * further float boundary.
  *
  * The residual cross-libm surface is the single FLOOR(1e6·lnChain)
  * per term (Spark's `java.lang.Math.log` vs DuckDB's libm `ln` must
  * agree to the last ulp INSIDE one floor) — the narrowest surface an
  * ln-based score can have; nothing may multiply a float into the
  * chain before the floor (r8 advice on `ns_text_source_drift`). */
object ExactMath {

  /** `FLOOR((ln a − ln b − ln c + ln d) · 10⁶)` as BIGINT — the shared
    * four-ln quantizer (NB weights, OOV weight, KL terms). Oracle
    * mirror: `CAST(FLOOR(1000000.0 * (ln(a) - ln(b) - ln(c) + ln(d)))
    * AS BIGINT)` with the same operand order. */
  def microLnRatio(a: Column, b: Column, c: Column, d: Column): Column =
    floor((log(a.cast("double")) - log(b.cast("double"))
      - log(c.cast("double")) + log(d.cast("double"))) * 1000000.0).cast("long")
}
