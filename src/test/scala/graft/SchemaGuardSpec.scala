package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/**
 * Driver-hasher contract guard: the correctness driver canonicalizes each
 * declared query's output with a pandas full-frame sort, which crashes on
 * array/map/struct-typed cells (round-4 lesson: x52/x89 shipped `err` rows
 * because `postings` was `array<long>`). Every declared query must emit
 * only atomic-typed columns — serialize nested values (concat_ws etc.)
 * before returning. Operators may keep typed-array APIs; only the declared
 * `SparkEntry.queries` outputs are constrained.
 */
class SchemaGuardSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("no declared query emits array/map/struct-typed output columns") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      val schema = q(spark, sf).schema
      schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(offenders.isEmpty,
      s"driver-incomparable output columns:\n  ${offenders.mkString("\n  ")}")
  }
}
