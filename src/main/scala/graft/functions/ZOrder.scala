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
  def interleave(x: Column, y: Column, bits: Int = 16): Column =
    interleaveN(Seq(x, y), bits)

  /** The d-dimensional Morton key (d in [2,4]): bit `i` of dimension `j`
    * lands at position `i*d + j` — the strict generalization of the 2-D
    * interleave (d=2 reproduces it bit for bit). Bits per dimension are
    * capped so the whole key stays inside a long's 62 usable bits:
    * 16/16 at d=2, 16 at d=3 (48 bits), 15 at d=4 (60 bits). Fewer bits
    * per dimension = coarser cells = slightly looser per-file rectangles,
    * the measured Morton trade-off — beyond 4 dimensions each dimension
    * keeps so few bits that skipping degrades toward noise, which is why
    * 4 is the ceiling (document, not silently degrade).
    */
  def interleaveN(dims: Seq[Column], bits: Int = 16): Column = {
    val d = dims.length
    require(d >= 2 && d <= 4,
      s"z-order interleaves 2 to 4 dimensions, got $d")
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val b = math.min(bits, 62 / d)
    val longs = dims.map(_.cast("long"))
    (for {
      i <- 0 until b
      (v, j) <- longs.zipWithIndex
    } yield shiftleft(shiftright(v, i).bitwiseAND(lit(1L)), i * d + j))
      .reduce(_.bitwiseOR(_))
  }

  /** Bits each dimension keeps under [[interleaveN]]'s long-width cap. */
  def bitsPerDim(d: Int, bits: Int = 16): Int = math.min(bits, 62 / d)

  /** The same interleave as ANSI SQL text (for oracles / SQL users):
    * mirrors [[interleave]] term by term.
    */
  def interleaveSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"(((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1}))"
    }.mkString(" | ")
}
