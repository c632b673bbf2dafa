package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) addresses at NIBBLE granularity, as a pure column
  * expression.
  *
  * `zhex(bits, a, b, ...)` renders each non-negative integer column as a
  * fixed-width lowercase hex string and interleaves their digits —
  * a space-filling curve at 4-bit resolution. Sorting by the result
  * clusters rows that are close in EVERY dimension, so a table keyed by
  * it gets tight per-chunk [min,max] envelopes on each participating
  * column simultaneously — zone maps then prune rectangle queries on
  * all dimensions, not just the leading key prefix (the Delta
  * `OPTIMIZE ZORDER BY` layout, expressed as an ordinary key).
  *
  * Nibble interleaving trades the bottom 4 bits of locality against a
  * dramatically simpler expression: it stays a plain `concat`/`substring`
  * pipeline (codegen-friendly, reproducible bit-for-bit in any SQL
  * engine) instead of 64 bit-twiddling terms. Chunks span thousands of
  * rows, so sub-nibble ordering is invisible at pruning granularity.
  *
  * Values must fit in `bits` unsigned bits (enforce upstream with a
  * bucket/modulo); `bits` must be a multiple of 4.
  */
object Zorder {

  def zhex(bits: Int, cols: Column*): Column = {
    require(bits % 4 == 0 && bits > 0, s"bits must be a positive multiple of 4: $bits")
    require(cols.nonEmpty, "zhex needs at least one column")
    val width = bits / 4
    val hexes = cols.map(c => lpad(lower(hex(c)), width, "0"))
    concat((0 until width).flatMap(i => hexes.map(h => substring(h, i + 1, 1))): _*)
  }
}
