package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/**
 * Deterministic ±1 random-hyperplane sign masks for cosine LSH (Charikar '02
 * SimHash for vectors, public technique). Bit `i` of `masks(p)` is the sign
 * of dimension `i` in hyperplane `p` (1 → +1, 0 → −1); the stream is
 * splitmix64 (public-domain PRNG) from a fixed seed, so the same plane set
 * is reproducible anywhere — including as 64-bit literals inside a SQL
 * oracle, which is what makes the banded candidate generation
 * cross-engine-checkable.
 */
object Hyperplanes {
  val DefaultSeed: Long = 0x5eedc0dedeadbeefL

  def masks(numPlanes: Int, seed: Long = DefaultSeed): Array[Long] = {
    var s = seed
    Array.fill(numPlanes) {
      s += 0x9e3779b97f4a7c15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
  }
}

/**
 * Native Catalyst expression: banded random-hyperplane LSH keys for an
 * `array<float>` vector. For plane `p`, the sign bit is
 * `Σᵢ (±xᵢ) > 0` with the ± taken from bit `i & 63` of `masks(p)`
 * (accumulated in ascending index order, in double — so a SQL oracle folding
 * the same list order reproduces the bit exactly). Bits are packed `r` per
 * band: output element `j` is the key of band `j` (`bands = masks.length/r`).
 *
 * Why custom: the composable form needs `numPlanes × dim` per-element
 * expression nodes (blows codegen limits, like the 192-`min()` MinHash case)
 * or a higher-order-function fold (CodegenFallback, interpreted per
 * element). This is one fused compiled loop participating in whole-stage
 * codegen.
 *
 * Scale: banding with `r` bits/band gives 2^r buckets per band — bucket
 * occupancy (and the within-bucket candidate count) is tuned by `r`, recall
 * at a target cosine by the band count `b`: P(candidate) = 1−(1−pʳ)ᵇ with
 * p = 1 − θ/π. The OR-construction replaces the old single fixed 256-bucket
 * quantizer whose within-bucket pair count stayed quadratic.
 */
case class HyperplaneBandKeys(child: Expression, masks: Seq[Long], rowsPerBand: Int)
  extends UnaryExpression {

  require(rowsPerBand > 0 && rowsPerBand <= 63, "rowsPerBand must be in [1, 63]")
  require(masks.nonEmpty && masks.length % rowsPerBand == 0,
    "masks.length must be a positive multiple of rowsPerBand")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_band_keys"

  @transient private lazy val maskArr: Array[Long] = masks.toArray

  private def compute(v: ArrayData): Array[Long] = {
    val d = v.numElements()
    // One 64-bit mask word per plane: beyond 64 dims the `i & 63` lookup
    // would silently correlate dimension i with i−64 in every plane (and
    // diverge from any oracle folding 64 dims) — fail fast instead.
    require(d <= 64, s"$prettyName supports vectors of at most 64 dimensions, got $d")
    val keys = new Array[Long](maskArr.length / rowsPerBand)
    var p = 0
    while (p < maskArr.length) {
      val m = maskArr(p)
      var s = 0.0
      var i = 0
      while (i < d) {
        val x = v.getFloat(i).toDouble
        s += (if (((m >>> (i & 63)) & 1L) == 1L) x else -x)
        i += 1
      }
      if (s > 0) keys(p / rowsPerBand) |= 1L << (p % rowsPerBand)
      p += 1
    }
    keys
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val masksRef = ctx.addReferenceObj("hyperplaneMasks", maskArr, "long[]")
      val keys = ctx.freshName("keys")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      s"""
         |int $d = $a.numElements();
         |if ($d > 64) throw new IllegalArgumentException(
         |  "hyperplane_band_keys supports vectors of at most 64 dimensions, got " + $d);
         |long[] $keys = new long[$masksRef.length / $rowsPerBand];
         |for (int $p = 0; $p < $masksRef.length; $p++) {
         |  long $m = $masksRef[$p];
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $d; $i++) {
         |    double $x = (double) $a.getFloat($i);
         |    $s += ((($m >>> ($i & 63)) & 1L) == 1L) ? $x : -$x;
         |  }
         |  if ($s > 0) $keys[$p / $rowsPerBand] |= 1L << ($p % $rowsPerBand);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBandKeys =
    copy(child = newChild)
}

object HyperplaneBandKeys {
  def apply(v: Column, masks: Seq[Long], rowsPerBand: Int): Column =
    ColumnBridge.column(new HyperplaneBandKeys(ColumnBridge.expression(v), masks, rowsPerBand))
}
