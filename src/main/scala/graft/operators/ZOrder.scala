package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping —
  * the lakehouse layout optimization (Delta `OPTIMIZE ZORDER BY`,
  * Iceberg sort orders): interleaving the bits of two key columns
  * makes RANGE partitions of the combined value into square-ish tiles
  * of the (x, y) plane, so per-file min/max statistics prune scans for
  * predicates on EITHER dimension — where a linear sort prunes only
  * its leading column. At 100 TB the difference is reading ~√F of F
  * files instead of all of them for a secondary-column predicate.
  *
  * Pure integer column arithmetic (shift/mask spread — the classic
  * magic-number bit spread, five operations per dimension, no HOF
  * lambda per bit, fully codegen'd) so layouts and skipping verdicts
  * are engine-exact.
  */
object ZOrder {

  /** Spread the low 16 bits of `v` to the even bit positions of a
    * 32-bit value (…b2 b1 b0 → …b2 0 b1 0 b0): each step doubles the
    * gap with a shift-or and re-masks.
    */
  def spreadBits16(v: Column): Column =
    Seq((8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L),
        (1, 0x55555555L))
      .foldLeft(v.cast("long").bitwiseAND(lit(0xFFFFL))) {
        case (acc, (sh, mask)) =>
          acc.bitwiseOR(shiftleft(acc, sh)).bitwiseAND(lit(mask))
      }

  /** The Morton code of (x, y), each taken mod 2^16: x occupies the
    * even bit positions, y the odd — so the top 2k bits of the z-value
    * name a 2^(16−k) × 2^(16−k) tile of the plane, which is exactly
    * what makes z-RANGE file groups square-ish.
    */
  def zValue16(x: Column, y: Column): Column =
    spreadBits16(x).bitwiseOR(shiftleft(spreadBits16(y), 1))
}
