package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-replica data reconciliation — the operators that answer "are
  * these two 100 TB tables the same, and if not, which rows differ?"
  * without ever moving the data: an order-independent content
  * fingerprint (one aggregate per replica, compare 64 bits), and a
  * keyed row-level diff (one full-outer hash join on the key, row
  * content compared as hashes) for when the fingerprints disagree. */
object Reconcile {

  /** 60-bit md5 hash of a row's canonical string form (the repo-wide
    * portable-hash idiom) — callers pass the columns pre-cast to
    * engine-portable strings. */
  def rowHash60(cols: Seq[Column]): Column =
    conv(substring(md5(concat_ws("|", cols.map(_.cast("string")): _*)),
      1, 15), 16, 10).cast("long")

  /** Order-independent table fingerprint: (tbl, n_rows, xor60,
    * sum60) — the bitwise XOR and the sum mod 2^60 of every row's
    * 60-bit hash. Both lanes are commutative/associative (identical
    * under ANY partitioning or row order), and they fail
    * independently: XOR alone is blind to EVEN multiplicities ({A,A}
    * vs {B,B} both XOR to 0), the modular sum alone to crafted
    * cancellations — together with n_rows a multiset difference must
    * fool all three. One map-side-combined aggregate, ~24 bytes of
    * state per partition; the sum rides DECIMAL(38,0)/HUGEINT so it
    * never overflows en route. DuckDB mirror:
    * `bit_xor(h)`, `CAST(SUM(CAST(h AS HUGEINT)) %
    * 1152921504606846976 AS BIGINT)`. */
  def fingerprint(df: DataFrame, table: String,
      cols: Seq[Column]): DataFrame =
    df.withColumn("__h", rowHash60(cols))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(__h)").as("xor60"),
        expr("""CAST(sum(CAST(__h AS DECIMAL(38,0)))
                % 1152921504606846976 AS BIGINT)""").as("sum60"))
      .withColumn("tbl", lit(table))
      .select(col("tbl"), col("n_rows"), col("xor60"), col("sum60"))

  /** Keyed row diff of two snapshots: one full-outer join on the key
    * comparing 60-bit content hashes of the non-key columns. Output:
    * (key..., label ∈ added|removed|changed); unchanged rows never
    * leave the join. Scale: the join shuffles on the key (or reuses
    * bucketed layout); content travels as 8-byte hashes, not rows. */
  def tableDiff(base: DataFrame, revised: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    val bh = base.select(keyCols.map(col) :+
      rowHash60(compareCols.map(col)).as("__bh"): _*)
    val rh = revised.select(keyCols.map(col) :+
      rowHash60(compareCols.map(col)).as("__rh"): _*)
    bh.join(rh, keyCols, "full_outer")
      .withColumn("label",
        when(col("__rh").isNull, "removed")
          .when(col("__bh").isNull, "added")
          .when(col("__bh") =!= col("__rh"), "changed"))
      .filter(col("label").isNotNull)
      .select(keyCols.map(col) :+ col("label"): _*)
  }
}
