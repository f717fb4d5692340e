package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout clustering (Z-order / Morton curves) —
  * the write-side optimization that makes BOTH of two filter columns
  * prunable from one physical sort order. Sorting by a single column
  * gives parquet min/max pruning on that column only; sorting by the
  * bit-interleaved key keeps each file's min/max box TIGHT in both
  * dimensions, so a range predicate on either (or both) skips most
  * row groups — the standard OPTIMIZE ZORDER layout step a 100 TB table
  * runs off-peak on its hottest filter pair.
  *
  * No counterpart in the reference (its only layout trick is the
  * timestamp-encoded _id scan, our (granularity, ymd) partitioning);
  * this generalizes that idea to a second dimension.
  */
object Layout {

  /** Morton key of two non-negative ints: interleaves the low `bits` of
    * `a` (odd positions) and `b` (even positions). Expands at plan-build
    * time into a balanced OR tree of shift/mask builtins — every node is
    * whole-stage-codegen'd, no UDF, no native expression needed. Values
    * are masked into range first so out-of-range inputs degrade to
    * prefix-truncation instead of ANSI overflow errors (bits <= 31 keeps
    * every term, and their OR, inside a positive long).
    */
  def zorderKey(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    val mask = (1L << bits) - 1L
    val am = a.cast("long").bitwiseAND(lit(mask))
    val bm = b.cast("long").bitwiseAND(lit(mask))
    (0 until bits).map { i =>
      val aBit = shiftleft(shiftright(am, i).bitwiseAND(lit(1L)), 2 * i + 1)
      val bBit = shiftleft(shiftright(bm, i).bitwiseAND(lit(1L)), 2 * i)
      aBit.bitwiseOR(bBit)
    }.reduce(_ bitwiseOR _)
  }

  /** Rewrite `df` into `numFiles` files range-partitioned and sorted by
    * the Z-key of (`colA`, `colB`) — one range shuffle, then parquet
    * min/max stats on the DATA columns (not the key) do the pruning; the
    * key never needs to be stored. Dictionary-encode low-cardinality
    * columns as ints upstream if they are to be a Z dimension.
    */
  def zorderWrite(df: DataFrame, path: String, colA: String, colB: String,
      numFiles: Int, bits: Int = 16): Unit = {
    val keyed = df.withColumn("_zkey", zorderKey(col(colA), col(colB), bits))
    keyed.repartitionByRange(numFiles, col("_zkey"))
      .sortWithinPartitions("_zkey")
      .drop("_zkey")
      .write.mode("overwrite").parquet(path)
  }
}
