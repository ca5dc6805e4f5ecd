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
  /**
   * DIALOG-LEVEL exact dedup + REGENERATION-SIBLING census — dedup at the
   * granularity dialog datasets actually duplicate at: whole conversations.
   * Document-level dedup ([[Dedup.exactDedup]]) treats each turn as an
   * independent row and cannot see that two conversations are the same
   * dialog, nor the shape RLHF/SFT branching produces constantly: the SAME
   * user prefix re-answered by different assistant completions
   * (regeneration siblings — candidate preference pairs, not duplicates,
   * and a dedup pass that drops them destroys signal). Two fingerprints
   * per conversation, both rendered as explicit strings (not hashes) with
   * every field LENGTH-PREFIXED netstring-style (`len:value`) — so
   * collisions are impossible even for text containing the join
   * delimiters (no escaping pass on either engine, and oracles reproduce
   * the rendering verbatim): the FULL fingerprint over ordered
   * (role, text) turns and the PREFIX fingerprint over the `prefixRole`
   * turns' text only. One row out:
   * `n_conversations, n_prefix_groups, n_unique_dialogs,
   * n_exact_dup_copies` (rows an exact dialog dedup would drop),
   * `n_sibling_groups, n_sibling_conversations` (prefix groups holding
   * ≥ 2 DISTINCT full dialogs, and the conversations in them).
   *
   * Scale shape: one corpus scan → per-conversation collapse (the only
   * corpus-sized exchange; fingerprints are an `array_sort` fold over the
   * ≤ session-length collected turn list — per-GROUP state, the
   * [[packTurns]] contract) → prefix-group collapse of the
   * |conversations|-bounded frame → one-row census. The full fingerprint
   * determines the prefix fingerprint, so distinct-full counts within
   * prefix groups sum to the global distinct-dialog count — no second
   * global distinct pass.
   */
  def dialogDedup(turns: DataFrame, conv: Column, order: Column,
      role: Column, text: Column, prefixRole: String = "user"): DataFrame = {
    // interpolated into a SQL CASE literal below — keep it literal-safe
    require(prefixRole.matches("[A-Za-z0-9_-]+"),
      s"prefixRole '$prefixRole' must be a plain role token")
    val per = turns
      .select(conv.as("__c"), order.as("__o"), role.as("__r"),
        text.cast("string").as("__t"))
      .filter(col("__c").isNotNull && col("__o").isNotNull
        && col("__r").isNotNull && col("__t").isNotNull)
      .groupBy("__c")
      .agg(
        expr("""concat('f|', array_join(
            transform(array_sort(collect_list(struct(__o, __r, __t))),
              x -> concat(length(x.__r), ':', x.__r, '#',
                          length(x.__t), ':', x.__t)), '|'))""").as("__full"),
        // collect_list skips the NULL the CASE leaves on non-prefix turns;
        // an all-assistant conversation renders 'u|' on both engines
        expr(s"""concat('u|', array_join(
            transform(array_sort(collect_list(
              CASE WHEN __r = '$prefixRole' THEN struct(__o, __t) END)),
              x -> concat(length(x.__t), ':', x.__t)), '|'))""").as("__prefix"))
    val grp = per.groupBy("__prefix").agg(
      count(lit(1)).as("__nc"),
      countDistinct(col("__full")).as("__nf"))
    grp.agg(
      coalesce(sum(col("__nc")), lit(0L)).as("n_conversations"),
      count(lit(1)).as("n_prefix_groups"),
      coalesce(sum(col("__nf")), lit(0L)).as("n_unique_dialogs"),
      coalesce(sum(col("__nc") - col("__nf")), lit(0L))
        .as("n_exact_dup_copies"),
      coalesce(sum(when(col("__nf") >= 2L, 1L).otherwise(0L)), lit(0L))
        .as("n_sibling_groups"),
      coalesce(sum(when(col("__nf") >= 2L, col("__nc")).otherwise(0L)),
        lit(0L)).as("n_sibling_conversations"))
  }

  /**
   * CONTEXT-BUDGET suffix-truncation audit — the keep-the-most-recent-turns
   * rule every chat-serving and SFT-assembly layer applies when a dialog
   * outgrows the context window: a turn is KEPT iff the token sum from it
   * through the final turn fits `budget`; whole turns only (the
   * [[packTurns]] never-split rule), and dropping is always from the FRONT
   * (the stalest turns). A turn whose own suffix already overflows —
   * including an oversized final turn — is dropped; in-turn trimming is a
   * tokenizer-stage concern outside this operator. One row out:
   * `n_conversations, n_fit` (nothing dropped), `n_truncated,
   * dropped_turns, dropped_tokens, dropped_ppm` (DECIMAL(38,0)-staged —
   * corpus token counts × 10⁶ overflow BIGINT), and
   * `n_truncated_opening_assistant` — truncated conversations whose kept
   * suffix OPENS with an assistant turn, the coherence break (a reply with
   * no visible question) a turn-count-only audit cannot see.
   *
   * Scale shape: one corpus scan; the suffix sum is a descending-order
   * running window partitioned by conversation, and the per-conversation
   * collapse reuses that exchange (one corpus-sized exchange total, the
   * [[structureReport]] shape); the census aggregates the
   * |conversations|-bounded frame to one row. Zero/negative-token turns
   * are excluded up front (the [[packTurns]] filter). `order` must be
   * unique within a conversation — the caller contract shared by the whole
   * family.
   */
  def truncationAudit(turns: DataFrame, conv: Column, order: Column,
      role: Column, tok: Column, budget: Long): DataFrame = {
    require(budget >= 1, s"budget $budget must be positive")
    val w = Window.partitionBy("__c").orderBy(col("__o").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val per = turns
      .select(conv.as("__c"), order.as("__o"), role.as("__r"),
        tok.cast("long").as("__t"))
      .filter(col("__c").isNotNull && col("__o").isNotNull
        && col("__r").isNotNull && col("__t").isNotNull && col("__t") > 0L)
      .withColumn("__keep", sum(col("__t")).over(w) <= budget)
      .groupBy("__c")
      .agg(
        count(lit(1)).as("__n"),
        sum(col("__t")).as("__tok"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("__kept"),
        sum(when(col("__keep"), col("__t")).otherwise(0L)).as("__ktok"),
        expr("min_by(__r, __o) FILTER (WHERE __keep)").as("__opener"))
    per.agg(
      count(lit(1)).as("n_conversations"),
      coalesce(sum(when(col("__kept") === col("__n"), 1L).otherwise(0L)),
        lit(0L)).as("n_fit"),
      coalesce(sum(when(col("__kept") < col("__n"), 1L).otherwise(0L)),
        lit(0L)).as("n_truncated"),
      coalesce(sum(col("__n") - col("__kept")), lit(0L)).as("dropped_turns"),
      coalesce(sum(col("__tok") - col("__ktok")), lit(0L))
        .as("dropped_tokens"),
      expr("""CAST(CASE WHEN COALESCE(SUM(__tok), 0) = 0 THEN 0
          ELSE CAST(COALESCE(SUM(__tok - __ktok), 0) AS DECIMAL(38,0))
            * 1000000 DIV CAST(SUM(__tok) AS DECIMAL(38,0))
          END AS BIGINT)""").as("dropped_ppm"),
      coalesce(sum(when(col("__kept") < col("__n")
          && col("__opener") === "assistant", 1L).otherwise(0L)), lit(0L))
        .as("n_truncated_opening_assistant"))
  }

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
