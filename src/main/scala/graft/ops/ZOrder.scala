package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout — multi-dimensional data clustering for
  * scan pruning. Writing a table range-partitioned by the interleaved
  * code gives every output file a narrow min/max envelope on BOTH
  * dimensions at once, so a predicate on either column prunes files
  * (the technique behind Delta/Iceberg's OPTIMIZE ZORDER). The code
  * itself is pure integer bit arithmetic — shift/and/or, codegen'd,
  * engine-portable — and the repartition is one range exchange, the
  * same cost as any sorted write. */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative integer
    * columns: bit i of `a` lands at position 2i, bit i of `b` at
    * 2i+1. `bits` ≤ 31 keeps the code in a long. Callers bucket or
    * clamp raw values into [0, 2^bits) first — rank-based bucketing
    * (e.g. value mod/div) preserves the locality that makes the
    * envelope narrow. */
  def mortonCode(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be 1..31, got $bits")
    (0 until bits).map { i =>
      val abit = shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)),
        2 * i)
      val bbit = shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)),
        2 * i + 1)
      abit.bitwiseOR(bbit)
    }.reduce(_ bitwiseOR _)
  }

  /** Inverse of [[mortonCode]]: (a, b) back out of the interleave —
    * the bijectivity witness the spec exercises. */
  def mortonDecode(z: Column, bits: Int): (Column, Column) = {
    require(bits >= 1 && bits <= 31)
    def half(offset: Int) = (0 until bits).map { i =>
      shiftleft(shiftright(z.cast("long"), 2 * i + offset)
        .bitwiseAND(lit(1L)), i)
    }.reduce(_ bitwiseOR _)
    (half(0), half(1))
  }

  /** Range-repartition by the Morton code of two bucketed dimensions —
    * the write-side layout operator. Each output partition (→ file)
    * covers one contiguous Z-curve segment, hence a bounded envelope
    * in both dimensions. */
  def zorderRepartition(df: DataFrame, aCol: String, bCol: String,
      bits: Int, partitions: Int): DataFrame =
    df.repartitionByRange(partitions,
      mortonCode(col(aCol), col(bCol), bits))
}
