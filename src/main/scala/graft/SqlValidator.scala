package graft

/**
 * SQL safety gate + row-limit guard — port of `validate_sql`
 * (`/root/reference/app/utils/sql_generator.py:105-127`) and
 * `MAX_ROWS_LIMIT` (`/root/reference/app/config.py:9`).
 *
 * Reference quirks preserved deliberately (they are observable behavior):
 *  - the blocklist is a SUBSTRING match on the uppercased SQL, so a query
 *    mentioning `created_at`-like text containing "CREATE"/"UPDATE" etc. is
 *    rejected (`sql_generator.py:111-113`);
 *  - the LIMIT guard is also a substring check — any occurrence of "limit"
 *    (case-insensitive), even in an alias, suppresses injection (`:124-125`);
 *  - the per-column check is a documented no-op (`:119-122`).
 */
object SqlValidator {

  /** Raised for the reference's HTTP-400 rejections (`sql_generator.py:113,116`). */
  final class UnsafeSqlException(msg: String) extends IllegalArgumentException(msg)

  /** Verbatim blocklist from `sql_generator.py:111`. */
  val Forbidden: Seq[String] =
    Seq("INSERT", "UPDATE", "DELETE", "DROP", "ALTER", "CREATE", "ATTACH", "COPY", "PRAGMA")

  /** `MAX_ROWS_LIMIT` resolution, injectable for tests: the reference reads
    * it from the environment with a 200 fallback
    * (`config.py:9`: `int(os.getenv("MAX_ROWS_LIMIT", 200))`). Like the
    * reference's `int(...)` at import time, a non-numeric override fails
    * loudly rather than being silently ignored. */
  def maxRowsFromEnv(env: Map[String, String]): Int =
    env.get("MAX_ROWS_LIMIT") match {
      case Some(raw) =>
        try raw.trim.toInt
        catch {
          case e: NumberFormatException =>
            // Still fail-loud like the reference's import-time int(), but
            // name the env var and value: a bare NumberFormatException inside
            // the object initializer would otherwise surface as an opaque
            // ExceptionInInitializerError / NoClassDefFoundError.
            throw new IllegalArgumentException(
              s"MAX_ROWS_LIMIT must be an integer, got '$raw'", e)
        }
      case None => 200
    }

  /** `MAX_ROWS_LIMIT` (`config.py:9`), resolved from the real environment. */
  val MaxRowsLimit: Int = maxRowsFromEnv(sys.env)

  def validate(sql: String, columns: Seq[String], maxRows: Int = MaxRowsLimit): String = {
    var cleaned = sql.trim
    if (cleaned.endsWith(";")) cleaned = cleaned.dropRight(1).trim

    val sqlUpper = cleaned.toUpperCase
    if (Forbidden.exists(sqlUpper.contains))
      throw new UnsafeSqlException("Unsafe SQL query")
    if (cleaned.count(_ == ';') > 0)
      throw new UnsafeSqlException("Multiple statements not allowed")

    // Column existence check: intentionally a no-op, like the reference's
    // `continue`-only loop (`sql_generator.py:119-122`).
    val _ = columns

    if (!sqlUpper.contains("LIMIT")) cleaned += s" LIMIT $maxRows"
    cleaned
  }
}
