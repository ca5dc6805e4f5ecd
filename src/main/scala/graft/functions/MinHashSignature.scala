package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import java.nio.ByteBuffer

/**
 * Native Catalyst aggregate computing a full MinHash signature (element-wise
 * minimum of `numHashes` affine permutations g_i(h) = (a_i·h + b_i) mod M)
 * over a column of 64-bit shingle hashes, in ONE aggregate with a
 * `Array[Long]` buffer and a tight JVM loop.
 *
 * Why custom: expressing this as `numHashes` separate `min(...)` aggregate
 * expressions blows past whole-stage-codegen's generated-code limits, so the
 * whole aggregation falls back to interpreted evaluation (~10× slower);
 * higher-order-function folds are CodegenFallback too. A
 * `TypedImperativeAggregate` keeps the per-row cost at `numHashes` multiplies
 * in compiled code, supports partial aggregation (merge = element-wise min,
 * so the shuffle carries one buffer per group), and ships a compact binary
 * buffer between stages.
 *
 * M = 2^31−1 (prime) keeps a_i·h below 2^62 — no 64-bit overflow (ANSI mode
 * would throw on wrap).
 */
case class MinHashSignature(
    child: Expression,
    numHashes: Int,
    seedA: Long,
    seedB: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val M = 2147483647L

  private def coeffs(seed: Long): Array[Long] = {
    var s = seed
    Array.fill(numHashes) {
      s = s * 6364136223846793005L + 1442695040888963407L
      java.lang.Math.floorMod(s >>> 17, M - 1) + 1
    }
  }
  @transient private lazy val as: Array[Long] = coeffs(seedA)
  @transient private lazy val bs: Array[Long] = coeffs(seedB)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT hash column, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val hm = java.lang.Math.floorMod(v.asInstanceOf[Long], M)
      var i = 0
      while (i < numHashes) {
        val g = java.lang.Math.floorMod(as(i) * hm + bs(i), M)
        if (g < buffer(i)) buffer(i) = g
        i += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(numHashes * 8)
    var i = 0
    while (i < numHashes) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_signature"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSignature =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSignature =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  /** Column-API entry: `minhash_signature(xxhash64(shingle))`. */
  def apply(hash: Column, numHashes: Int, seedA: Long, seedB: Long): Column =
    ColumnBridge.column(
      new MinHashSignature(ColumnBridge.expression(hash), numHashes, seedA, seedB)
        .toAggregateExpression())
}
