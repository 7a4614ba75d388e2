package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data-skipping
  * layouts. One dimension of range-sorting ([[graft.sources.Sources
  * .writeRangeSorted]]) gives perfect skipping on ONE key and none on the
  * other; sorting by the bit-interleaved key gives useful skipping on
  * BOTH — each file's Z-interval covers a bounded rectangle of the
  * (x, y) space, so a 2-D box predicate prunes most files (the
  * Delta/Iceberg OPTIMIZE ZORDER layout, built here from plain bitwise
  * column arithmetic so the whole expression stays inside whole-stage
  * codegen — no custom Expression, no UDF).
  *
  * Inputs must already be NON-NEGATIVE bucket ordinals below 2^bits
  * (clamp/bucket upstream: `pmod(hash(col), 1 << bits)` or a date
  * ordinal). Only `2*bits` result bits are produced, so with the default
  * 16 the result fits comfortably in a long.
  */
object ZOrder {

  /** Interleave the low `bits` bits of `x` (even positions) and `y` (odd
    * positions): z = Σ ((x>>i & 1) << 2i | (y>>i & 1) << 2i+1). Unrolled
    * at plan time into 2*bits codegen'd bitwise terms.
    */
  def interleave(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xs = x.cast("long")
    val ys = y.cast("long")
    (0 until bits).map { i =>
      val xe = shiftleft(shiftright(xs, i).bitwiseAND(lit(1L)), 2 * i)
      val ye = shiftleft(shiftright(ys, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xe.bitwiseOR(ye)
    }.reduce(_.bitwiseOR(_))
  }

  /** The same interleave as ANSI SQL text (for oracles / SQL users):
    * mirrors [[interleave]] term by term.
    */
  def interleaveSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"(((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1}))"
    }.mkString(" | ")
}
