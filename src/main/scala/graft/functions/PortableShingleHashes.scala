package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression: the PORTABLE 60-bit md5 hash
 * ([[graft.operators.PortableHash.hash60]]) of every DISTINCT word n-gram
 * of a text column, in first-occurrence order, as one `array<long>`.
 *
 * Bit-identical by construction to the composable pipeline
 * `explode(Dedup.shingles(text, n)) → PortableHash.hash60(s)` up to
 * within-document 60-bit collisions (two distinct shingle strings of ONE
 * document hashing to the same value emit one element here, two equal
 * elements there — indistinguishable to every consumer, which either
 * `groupBy`s the hash or `distinct`s the (doc, hash) rows): it performs
 * the SAME `" "` split the builtin `split(text, " ")` does, concatenates
 * the n words with single spaces (= `concat_ws(" ", …)`), md5s the UTF-8
 * bytes (= Spark's and DuckDB's `md5(s)`), and reads the first 15 hex
 * chars base-16 (7 full bytes + the high nibble of byte 8, unsigned) —
 * so any DuckDB oracle reproduces every value verbatim via
 * `CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)`.
 *
 * Why custom: [[graft.operators.Dedup.shingles]] is a higher-order
 * `transform`/`concat_ws` expression — CodegenFallback, interpreted per
 * element — followed by a per-occurrence md5 EXPRESSION on the built
 * strings. That stack dominated the portable-hash dedup audits (x526/
 * x529/x537/x538) even at test SF. This expression is one tight loop per
 * row (word byte images computed once, one reused thread-local digest),
 * stays inside whole-stage codegen via the same reference-object pattern
 * as [[ShingleHashes]], and emits 8-byte longs so no shingle STRING ever
 * reaches an exchange.
 */
case class PortableShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "portable_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    PortableShingleHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val helper = ctx.addReferenceObj("portableShingleHelper",
        PortableShingleHashes, PortableShingleHashes.getClass.getName)
      s"${ev.value} = $helper.compute($a, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): PortableShingleHashes =
    copy(child = newChild)
}

object PortableShingleHashes {
  private val Space = UTF8String.fromString(" ")
  private val SpaceByte = ' '.toByte
  private val digestTL: ThreadLocal[MessageDigest] = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Shared by interpreted eval and generated code (called via a reference
    * object) — one tight loop, the md5 instance reused across rows. */
  def compute(text: UTF8String, n: Int): GenericArrayData = {
    // Same split the builtin `split(text, " ")` performs (regex " ", limit -1)
    val words = text.split(Space, -1)
    val m = words.length
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val bytes = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) { bytes(i) = words(i).getBytes; i += 1 }
    val md = digestTL.get()
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new Array[Long](m - n + 1)
    var cnt = 0
    i = 0
    while (i <= m - n) {
      md.reset()
      var k = 0
      while (k < n) {
        if (k > 0) md.update(SpaceByte) // concat_ws(" ", …) separator
        md.update(bytes(i + k))
        k += 1
      }
      val d = md.digest()
      // first 15 hex chars of md5 read base-16: bytes 0-6 whole, then the
      // high nibble of byte 7 — unsigned, < 2^60, so the long stays positive
      // (identical to PortableHash.hash60's conv(substring(md5, 1, 15), 16, 10))
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      v = (v << 4) | ((d(7) >> 4) & 0xfL)
      if (seen.add(v)) { out(cnt) = v; cnt += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, cnt))
  }

  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(new PortableShingleHashes(ColumnBridge.expression(text), n))
}
