package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Exact integer-grid sums — the engine's deterministic-double-sum
  * convention (see the note atop [[graft.queries.CoreQueries]]): round each
  * value onto its decimal grid (`floor(x·10^s + 0.5)` — data sits within
  * 1e-9 of the grid, never at a half), sum the LONGs (associative/exact →
  * partial-aggregation-order independent, so a 1000-executor run and the
  * single-threaded oracle agree bit-for-bit), then one long→double
  * conversion and one IEEE division. ~3× faster than `sum(DECIMAL(18,s))`
  * (primitive codegen'd adds vs non-compact BigDecimal adds). Overflow
  * budget: grid units ≤ 1e9/row at scale 4 → ~9e9 rows per sum; beyond
  * that (or for scale-6 money) escalate to the DECIMAL path, as q1's
  * sum_charge documents. */
object Grid {

  /** The value projected onto its scale-2 grid as a LONG — compose with
    * `sum(...).over(window)` for windowed grid sums (divide by 100.0 and
    * cast after the window sum). */
  def units2(c: Column): Column = floor(c * 100 + lit(0.5))

  /** Exact grid sum at decimal scale `s`, emitted as DOUBLE. */
  def gsum(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale) // exact small power of ten
    (sum(floor(c * f + lit(0.5))) / f).cast(DoubleType)
  }

  def sum2(c: Column): Column = gsum(c, 2)
  def sum4(c: Column): Column = gsum(c, 4)
}
