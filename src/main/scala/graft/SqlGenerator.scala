package graft

import java.time.LocalDateTime

/**
 * Pluggable NL→SQL generation — the interface shape of the reference's two
 * generation paths (`/root/reference/app/routes/query.py:33-37`): rule-based
 * (`generate_sql_rule_based`) and AI (`generate_sql_ai`,
 * `sql_generator.py:80-103`). The AI path is a network LLM call and therefore
 * out of engine scope; the engine's contract is "execute any validated
 * SELECT" ([[Engine.executeSql]]), and this trait is the seam where an
 * external generator plugs in. The rule-based implementation is the only
 * built-in.
 */
trait SqlGenerator {
  def generate(question: String, columns: Seq[Profiler.ColumnInfo]): String
}

/** The reference's rule-based path with an injected clock (its
  * `datetime.now()` dependence made results irreproducible). */
class RuleBasedGenerator(now: LocalDateTime) extends SqlGenerator {
  override def generate(question: String, columns: Seq[Profiler.ColumnInfo]): String =
    RuleSqlGenerator.generate(question, columns, now)
}
