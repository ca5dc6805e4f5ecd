package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) clustering key: interleave the bits of two bucket ids so
 * that rows close in EITHER dimension land in nearby cells. Partitioning
 * (or sorting) a lake table by the z-cell makes range predicates on BOTH
 * dimensions prune storage simultaneously — the multi-dimensional
 * generalization of single-key partition pruning (x32), and the layout
 * trick behind "OPTIMIZE ZORDER BY" in lakehouse engines: at 100 TB a
 * two-dim filter touches O(selectivity²) of the cells instead of scanning
 * one full partition axis.
 *
 * Kept to bucket ids (small ints) rather than raw values: the z-curve only
 * needs coarse locality, and a bounded cell count keeps the partition
 * directory listing (and the pruned-cell enumeration) metadata-sized.
 */
object ZOrder {

  /** Morton-interleave two `bits`-wide bucket ids (a gets the odd bit
    * positions, b the even): pure integer bit ops, codegen'd end-to-end. */
  def zcell(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1)), 2 * i))
    }.reduce(_ bitwiseOR _)

  /** Same interleave on plain ints (driver-side cell enumeration). */
  def zcellOf(a: Int, b: Int, bits: Int): Int =
    (0 until bits).map(i => (((a >> i) & 1) << (2 * i + 1)) | (((b >> i) & 1) << (2 * i)))
      .reduce(_ | _)

  /** Every z-cell overlapping the bucket ranges [aLo,aHi] × [bLo,bHi] —
    * the pruning list for a two-dimensional range predicate. Metadata-sized
    * (≤ 2^(2*bits) cells), computed without touching data. */
  def cellsForRanges(aLo: Int, aHi: Int, bLo: Int, bHi: Int, bits: Int): Seq[Int] =
    for (a <- aLo to aHi; b <- bLo to bHi) yield zcellOf(a, b, bits)
}
