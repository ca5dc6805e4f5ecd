package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import java.nio.ByteBuffer

/**
 * Native Catalyst aggregate computing a 64-bit SimHash fingerprint from a
 * column of word hashes: buffer = 64 signed counters, each word adds ±1 per
 * bit of its hash, eval folds counter signs into the fingerprint.
 *
 * Same rationale as [[MinHashSignature]]: 64 separate `sum()` aggregate
 * expressions push the aggregation past codegen limits into interpreted
 * evaluation; one imperative buffer keeps the update a tight compiled loop
 * and partial aggregation ships 64 ints per group.
 */
case class SimHashSignature(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT hash column, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < 64) {
        buffer(i) += (((h >>> i) & 1L).toInt * 2) - 1
        i += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Int]): Any = {
    var fp = 0L
    var i = 0
    while (i < 64) { if (buffer(i) > 0) fp |= (1L << i); i += 1 }
    fp
  }

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 4)
    var i = 0
    while (i < 64) { bb.putInt(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt())
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash_signature"

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashSignature =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashSignature =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimHashSignature =
    copy(child = newChild)
}

object SimHashSignature {
  def apply(hash: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      new SimHashSignature(org.apache.spark.sql.graft.ColumnBridge.expression(hash))
        .toAggregateExpression())
}
