package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * MULTI-TURN CONVERSATION assembly operators — the SFT-data prep shapes
 * that flat-document packing ([[TextAnalysis.packTokenShards]] /
 * [[TextAnalysis.packContextWindows]]) structurally cannot model: a
 * conversation is an ORDERED sequence of role-tagged turns, its integrity
 * is a property of the sequence (who speaks first, strict alternation, who
 * closes), and a training context may only ever contain WHOLE turns. The
 * reference engine has no counterpart (its scope ends at SQL over uploaded
 * CSVs); these extend the LLM-pipeline brief the same way the preference
 * family does.
 *
 * Shared design rules: integer-exact arithmetic end-to-end (ppm via
 * floor-DIV, so the DuckDB oracles match bit-for-bit), one corpus scan per
 * operator, and per-conversation work bounded by the conversation length —
 * a session-scale constant by contract (tens of turns), never corpus
 * scale.
 */
object Conversation {

  /**
   * CONVERSATION-STRUCTURE validation — the integrity report an SFT
   * pipeline gates dialog data on before assembly (the [[Integrity]]
   * report shape, applied to turn sequences). A conversation is VALID
   * when it opens with a `user` turn, roles strictly alternate, it closes
   * with an `assistant` turn, and it has at least two turns; the report
   * counts each defect class separately (a conversation can carry
   * several). One row out:
   * `n_conversations, n_valid, n_not_user_first, n_role_repeat,
   * n_not_assistant_last, n_single_turn` — all zero-coalesced so an empty
   * corpus reports zeros rather than NULLs.
   *
   * Scale shape: ONE corpus scan; the alternation check is a lag window
   * partitioned by conversation, and the per-conversation collapse reuses
   * the same hash partitioning (one exchange total). First/last roles come
   * from `min_by`/`max_by` aggregates, not extra windows. The final report
   * aggregates the |conversations|-bounded frame to one row.
   */
  def structureReport(turns: DataFrame, conv: Column, order: Column,
      role: Column): DataFrame = {
    val w = Window.partitionBy("__c").orderBy("__o")
    val t = turns
      .select(conv.as("__c"), order.as("__o"), role.as("__r"))
      .filter(col("__c").isNotNull && col("__o").isNotNull
        && col("__r").isNotNull)
      .withColumn("__prev", lag(col("__r"), 1).over(w))
    val per = t.groupBy("__c").agg(
      count(lit(1)).as("__n"),
      min_by(col("__r"), col("__o")).as("__first"),
      max_by(col("__r"), col("__o")).as("__last"),
      // NULL __prev (turn 1) compares to nothing — when() falls through
      sum(when(col("__prev") === col("__r"), 1L).otherwise(0L)).as("__rep"))
    per.agg(
      count(lit(1)).as("n_conversations"),
      coalesce(sum(when(col("__first") === "user" && col("__rep") === 0L
          && col("__last") === "assistant" && col("__n") >= 2L, 1L)
        .otherwise(0L)), lit(0L)).as("n_valid"),
      coalesce(sum(when(col("__first") =!= "user", 1L).otherwise(0L)),
        lit(0L)).as("n_not_user_first"),
      coalesce(sum(when(col("__rep") > 0L, 1L).otherwise(0L)), lit(0L))
        .as("n_role_repeat"),
      coalesce(sum(when(col("__last") =!= "assistant", 1L).otherwise(0L)),
        lit(0L)).as("n_not_assistant_last"),
      coalesce(sum(when(col("__n") === 1L, 1L).otherwise(0L)), lit(0L))
        .as("n_single_turn"))
  }

  /**
   * TURN-BOUNDARY-AWARE context packing — greedy first-fit of WHOLE turns
   * into fixed `budget`-token training contexts, per conversation and in
   * turn order: a context closes when the next turn would overflow it; a
   * turn NEVER splits (a single turn larger than the budget gets a
   * context of its own). This is the SFT layout rule the flat
   * cumulative-cut packers ([[TextAnalysis.packTokenShards]]) cannot
   * express — their shard function is oblivious to turn boundaries and
   * budget overflow. Greedy packing is inherently sequential WITHIN a
   * conversation, so it runs as a fold over the conversation's sorted
   * turn list (`aggregate` over `array_sort(collect_list(...))`) — exact
   * integer state (context count, fill), map-side after the one group
   * exchange; conversations pack in parallel. Per-group lists are bounded
   * by the conversation length (session-scale by contract — the
   * precondition callers must honor; this is per-GROUP state, the
   * [[Dedup]] posting-list discipline, never a corpus collect).
   *
   * Emits the packing CENSUS (one row per distinct context count):
   * `n_contexts, n_conversations, total_turns, sum_tokens,
   * padding_waste_ppm` — the waste a packed-sequence writer pads, with
   * the capacity product staged through DECIMAL(38,0) (BIGINT overflows
   * at corpus scale × 10⁶ ppm).
   */
  def packTurns(turns: DataFrame, conv: Column, order: Column, tok: Column,
      budget: Long): DataFrame = {
    require(budget >= 1, s"budget $budget must be positive")
    val per = turns
      .select(conv.as("__c"), order.cast("long").as("__o"),
        tok.cast("long").as("__t"))
      .filter(col("__c").isNotNull && col("__o").isNotNull
        && col("__t").isNotNull && col("__t") > 0L)
      .groupBy("__c")
      .agg(count(lit(1)).as("n_turns"), sum(col("__t")).as("tok_sum"),
        expr(s"""aggregate(
            array_sort(collect_list(struct(__o, __t))),
            named_struct('ctx', CAST(0 AS BIGINT), 'fill', CAST(0 AS BIGINT)),
            (acc, x) -> IF(acc.ctx = 0 OR acc.fill + x.__t > $budget,
              named_struct('ctx', acc.ctx + CAST(1 AS BIGINT), 'fill', x.__t),
              named_struct('ctx', acc.ctx, 'fill', acc.fill + x.__t)),
            acc -> acc.ctx)""").as("n_contexts"))
    per.groupBy("n_contexts")
      .agg(count(lit(1)).as("n_conversations"),
        sum(col("n_turns")).as("total_turns"),
        sum(col("tok_sum")).as("sum_tokens"))
      .select(col("n_contexts"), col("n_conversations"), col("total_turns"),
        col("sum_tokens"),
        expr(s"""CAST((CAST(n_contexts AS DECIMAL(38,0)) * n_conversations
              * $budget - sum_tokens) * 1000000
            DIV (CAST(n_contexts AS DECIMAL(38,0)) * n_conversations
              * $budget) AS BIGINT)""").as("padding_waste_ppm"))
      .orderBy("n_contexts")
  }
}
