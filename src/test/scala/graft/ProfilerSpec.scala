package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Golden cases derived by executing the reference profiler
  * (`/root/reference/app/utils/csv_profiler.py`) on crafted frames — see the
  * version note in [[Profiler]] (pinned pandas==2.1.4 semantics). */
class ProfilerSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private def profileOf(schema: StructType, rows: Seq[Row]): Map[String, (String, String)] = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    Profiler.profile(df).map(c => c.name -> (c.tpe, c.semanticType)).toMap
  }

  test("keyword precedence: city > service > date; content sniff fallback") {
    assert(Profiler.detectColumnType("city_name", Seq("a"), isNumeric = false) == "city")
    // 'n_regionkey' contains 'region' → city (reference substring matching)
    assert(Profiler.detectColumnType("n_regionkey", Seq(1), isNumeric = true) == "city")
    assert(Profiler.detectColumnType("product_type", Seq("a"), isNumeric = false) == "service")
    assert(Profiler.detectColumnType("created_at", Seq("x"), isNumeric = false) == "date")
    // numeric columns sniff as date (pandas epoch-parse quirk)
    assert(Profiler.detectColumnType("incident_count", Seq(1, 2), isNumeric = true) == "date")
    // unparseable strings → other
    assert(Profiler.detectColumnType("foo", Seq("hello"), isNumeric = false) == "other")
    // all-null head → other (notna().any() is False)
    assert(Profiler.detectColumnType("foo", Seq(null, null), isNumeric = false) == "other")
    // parseable date strings → date
    assert(Profiler.detectColumnType("foo", Seq("2021-05-01"), isNumeric = false) == "date")
  }

  test("profile: dtype branch overwrites semantic for datetime and date-parsable strings") {
    val schema = StructType(Seq(
      StructField("city_name", StringType),
      StructField("amount", DoubleType),
      StructField("datestr", StringType),
      StructField("when_ts", TimestampType),
      StructField("plain", StringType)))
    val rows = Seq(Row("Mumbai", 1.5, "2021-05-01", java.sql.Timestamp.valueOf("2021-05-01 00:00:00"), "hello"))
    val p = profileOf(schema, rows)
    assert(p("city_name") == ("string", "city")) // keyword survives: not date-parsable
    assert(p("amount") == ("numeric", "date")) // numeric quirk
    assert(p("datestr") == ("date", "date")) // object→date overwrite
    assert(p("when_ts") == ("date", "date")) // datetime dtype overwrite
    assert(p("plain") == ("string", "other"))
  }

  test("every column gets exactly one type and one semantic tag (totality)") {
    val p = Profiler.profile(sources.Tables(spark, "/root/testdata/sf0.001", "orders"))
    assert(p.size == 6)
    assert(p.forall(c => Set("numeric", "date", "string").contains(c.tpe)))
    assert(p.forall(c => Set("city", "service", "date", "other").contains(c.semanticType)))
  }
}
