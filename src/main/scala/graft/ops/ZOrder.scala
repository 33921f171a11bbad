package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering key — the multi-dimensional data-layout
  * primitive behind "OPTIMIZE ZORDER BY" in lakehouse table formats: range
  * -partitioning + sorting files by the bit-interleaved key keeps rows
  * close in EVERY keyed dimension, so parquet row-group min/max statistics
  * prune a 2-D box predicate on BOTH columns — a plain 1-D sort gives
  * locality on its sort column only, and a box query on the second column
  * reads every file. At 100 TB the difference is "open 2% of files" vs
  * "open all of them" for the dashboard-style `x BETWEEN … AND y
  * BETWEEN …` scan (ScaleOpsSpec quantifies it on the span metric).
  *
  * The key is plain integer arithmetic — shifts, masks, adds — so it stays
  * inside whole-stage codegen and is bit-replayable by any engine
  * (`a10_zorder`'s DuckDB oracle recomputes it per row); no UDF, no native
  * expression needed.
  *
  * Width-matching caveat (standard for z-order): interleaving only buys
  * multi-dimensional locality when the dimensions occupy comparable bit
  * widths. A column whose values sit far below the other's scale
  * contributes only zero high bits and the curve degenerates toward a 1-D
  * sort on the wider column — rank- or scale-normalize such columns onto
  * the shared `bits` budget first (the spec's uniform-width case shows the
  * clean behavior; `a10_zorder` keys raw TPC-H ids and documents the
  * skew).
  */
object ZOrder {

  /** Morton key of two non-negative int columns: x's low `bits` bits on
    * even positions, y's on odd. bits ≤ 31 keeps the result in a LONG. */
  def zkey(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val terms = (0 until bits).flatMap { b =>
      Seq(
        shiftleft(shiftright(x.cast("long"), b).bitwiseAND(lit(1L)), 2 * b),
        shiftleft(shiftright(y.cast("long"), b).bitwiseAND(lit(1L)), 2 * b + 1))
    }
    terms.reduce(_ + _)
  }

  /** The same key as DuckDB SQL over column expressions, for oracles.
    * BIGINT casts up front: a 32-bit `1 << 31` would overflow DuckDB's
    * INTEGER arithmetic before promotion. */
  def zkeySql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).flatMap { b =>
      Seq(
        s"(((CAST($x AS BIGINT) >> $b) & 1) << ${2 * b})",
        s"(((CAST($y AS BIGINT) >> $b) & 1) << ${2 * b + 1})")
    }.mkString("(", " + ", ")")
}
