package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class SqlValidatorSpec extends AnyFunSuite {

  private def v(sql: String) = SqlValidator.validate(sql, Nil)

  test("every blocklist keyword rejects (substring semantics)") {
    SqlValidator.Forbidden.foreach { kw =>
      intercept[SqlValidator.UnsafeSqlException](v(s"SELECT * FROM df WHERE x = '$kw'"))
    }
  }

  test("substring false positives are preserved reference behavior") {
    // CREATED_AT contains CREATE; UPDATED_ON contains UPDATE
    intercept[SqlValidator.UnsafeSqlException](v("SELECT created_at FROM df LIMIT 5"))
    intercept[SqlValidator.UnsafeSqlException](v("SELECT updated_on FROM df LIMIT 5"))
  }

  test("trailing semicolon stripped; interior semicolons rejected") {
    assert(v("SELECT 1 LIMIT 5;") == "SELECT 1 LIMIT 5")
    intercept[SqlValidator.UnsafeSqlException](v("SELECT 1; SELECT 2"))
  }

  test("LIMIT injected when absent; any 'limit' substring suppresses injection") {
    assert(v("SELECT x FROM df") == "SELECT x FROM df LIMIT 200")
    assert(v("SELECT x FROM df LIMIT 5") == "SELECT x FROM df LIMIT 5")
    // substring quirk: an alias containing 'limit' suppresses injection
    assert(v("SELECT x AS rate_limit FROM df") == "SELECT x AS rate_limit FROM df")
  }

  test("custom maxRows honored (MAX_ROWS_LIMIT env parity)") {
    assert(SqlValidator.validate("SELECT x FROM df", Nil, maxRows = 7).endsWith("LIMIT 7"))
  }

  test("MAX_ROWS_LIMIT resolved from the environment (config.py:9 parity)") {
    assert(SqlValidator.maxRowsFromEnv(Map.empty) == 200)
    assert(SqlValidator.maxRowsFromEnv(Map("MAX_ROWS_LIMIT" -> "55")) == 55)
    // int(os.getenv(...)) raises on garbage in the reference — so do we,
    // but with the env var and offending value named in the message (a bare
    // NumberFormatException in the object initializer surfaces as an opaque
    // ExceptionInInitializerError)
    val e = intercept[IllegalArgumentException](
      SqlValidator.maxRowsFromEnv(Map("MAX_ROWS_LIMIT" -> "lots")))
    assert(e.getMessage.contains("MAX_ROWS_LIMIT") && e.getMessage.contains("lots"))
    assert(e.getCause.isInstanceOf[NumberFormatException])
    assert(SqlValidator.validate("SELECT x FROM df", Nil,
      maxRows = SqlValidator.maxRowsFromEnv(Map("MAX_ROWS_LIMIT" -> "9"))).endsWith("LIMIT 9"))
  }

  test("idempotence: validate(validate(s)) == validate(s)") {
    val safeSql = for {
      col <- Gen.oneOf("a", "b", "some_col")
      n <- Gen.choose(1, 999)
      withLimit <- Gen.oneOf(true, false)
    } yield s"SELECT $col FROM df WHERE $col > $n" + (if (withLimit) s" LIMIT $n" else "")
    (0 until 200).foreach { i =>
      val sql = safeSql(Gen.Parameters.default, Seed(i.toLong)).get
      val once = v(sql)
      assert(v(once) == once, s"not idempotent for: $sql")
    }
  }
}
