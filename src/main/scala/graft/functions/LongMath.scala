package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.graft.ColumnBridge

/** Exact LONG arithmetic helpers shared by the time-bin operators
  * ([[graft.operators.TemporalJoin]]) and the histogram sketches
  * ([[graft.operators.Quantiles]]).
  */
object LongMath {

  /** Floor division in pure LONG arithmetic:
    * floorDiv(a, w) = (a − pmod(a, w)) DIV w. The dividend is an exact
    * multiple of w, so truncating integral division equals floor — and
    * staying integral (no Column `/`, which is a double divide) keeps the
    * quotient exact past 2^53 (ns-epoch magnitudes), where a double divide
    * silently rounds. Matches DuckDB's integer `//` on the same inputs.
    */
  def floorDiv(a: Column, w: Column): Column = {
    val pmod = (a % w + w) % w
    ColumnBridge.column(IntegralDivide(
      ColumnBridge.expression(a - pmod), ColumnBridge.expression(w)))
  }
}
