package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression: the xxhash64 of every word n-gram of a text
 * column, in document order (multiplicities kept), as one `array<long>`.
 *
 * Bit-identical by construction to the composable pipeline
 * `posexplode(split(text,' ')) → xxhash64(word) → lead() window →
 * xxhash64(h₀…hₙ₋₁)`: it calls the SAME hash entry points the builtin
 * `XxHash64` expression uses (seed 42, word bytes, then a left fold of
 * `hashLong` over the n word hashes) and the same `" "`-pattern split.
 *
 * Why custom: the window form forces a hash-partition exchange + per-doc
 * sort over the EXPLODED word rows — at 100 TB that shuffle is ~tokens×8
 * bytes and is the single largest stage of the dedup pipelines. Shingling
 * is row-local work; this expression keeps it entirely map-side, so the
 * first exchange in minhash/jaccard pipelines is the (much smaller)
 * signature or shingle aggregation itself.
 */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val helper = ctx.addReferenceObj("shingleHelper", ShingleHashes, ShingleHashes.getClass.getName)
      s"${ev.value} = $helper.compute($a, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  private val Space = UTF8String.fromString(" ")

  /** Shared by interpreted eval and generated code (called via a reference
    * object) — one tight loop, no per-row allocation beyond the outputs. */
  def compute(text: UTF8String, n: Int): GenericArrayData = {
    // Same split the builtin `split(text, " ")` performs (regex " ", limit -1)
    val words = text.split(Space, -1)
    val m = words.length
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val wh = new Array[Long](m)
    var i = 0
    while (i < m) {
      // == xxhash64(word): StringType path of the builtin, seed 42
      wh(i) = XXH64.hashUTF8String(words(i), 42L)
      i += 1
    }
    val out = new Array[Long](m - n + 1)
    i = 0
    while (i <= m - n) {
      // == xxhash64(h0, …, h_{n-1}): left fold of hashLong from seed 42
      var h = 42L
      var k = 0
      while (k < n) { h = XXH64.hashLong(wh(i + k), h); k += 1 }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(new ShingleHashes(ColumnBridge.expression(text), n))
}
