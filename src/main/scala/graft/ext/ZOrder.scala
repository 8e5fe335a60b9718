package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout clustering — the data-skipping
  * organization trick: interleaving the bits of two columns makes
  * rows that are close in BOTH dimensions land close on the curve, so
  * range-partitioning + sorting by the Z key gives every file a tight
  * min/max envelope in each dimension, and scans filtered on either
  * column skip most files. This is what table formats call
  * `OPTIMIZE ... ZORDER BY`; here it is plain Spark: a pure bit-math
  * key column + `repartitionByRange` + `sortWithinPartitions`.
  *
  * The interleave is the classic magic-number bit spread; the step
  * constants are shared with the DuckDB oracle twin
  * (OraclesExt.zorder generates the same shift/mask chain), so the
  * key is verified bit-for-bit cross-engine.
  */
object ZOrder {

  /** (shift, mask) chain spreading a 16-bit value to even bit
    * positions of a 32-bit word.
    */
  val SpreadSteps: Seq[(Int, Long)] = Seq(
    8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL, 2 -> 0x33333333L, 1 -> 0x55555555L)

  /** Spread the low 16 bits of `c` to even bit positions (values are
    * masked to 16 bits first — callers bucket/modulo wider domains).
    */
  def spread16(c: Column): Column =
    SpreadSteps.foldLeft(c.bitwiseAND(lit(0xFFFFL))) {
      case (acc, (s, m)) => acc.bitwiseOR(shiftleft(acc, s)).bitwiseAND(lit(m))
    }

  /** 32-bit Morton key of two 16-bit dimensions (`a` on even bits). */
  def morton2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Cluster a DataFrame for 2-D data skipping: range-partition and
    * sort by the Morton key. The range exchange samples key bounds
    * (one pass), then each output file covers a contiguous Z range —
    * tight per-file min/max on both dimensions.
    */
  def clusterBy(df: DataFrame, aCol: String, bCol: String,
      partitions: Int): DataFrame =
    df.withColumn("zkey", morton2(col(aCol), col(bCol)))
      .repartitionByRange(partitions, col("zkey"))
      .sortWithinPartitions("zkey")
}
