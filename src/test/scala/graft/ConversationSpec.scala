package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Conversation

/** Hand-computed fixtures for the multi-turn conversation family
  * (x622/x623). Every expected value is worked by hand in the comments —
  * no test re-runs the production arithmetic. */
class ConversationSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- structure validation ------------------------------------------------

  test("structureReport: every defect class counted, by hand") {
    // conv 1: user, assistant            → VALID
    // conv 2: assistant, user            → not_user_first + not_assistant_last
    // conv 3: user, user, assistant      → role_repeat (one adjacent pair)
    // conv 4: user                       → single_turn + not_assistant_last
    //                                      (covers the class the 16-turn
    //                                       corpus staging cannot produce)
    val turns = Seq(
      (1L, 1L, "user"), (1L, 2L, "assistant"),
      (2L, 1L, "assistant"), (2L, 2L, "user"),
      (3L, 1L, "user"), (3L, 2L, "user"), (3L, 3L, "assistant"),
      (4L, 1L, "user")).toDF("conv", "o", "role")
    val r = Conversation.structureReport(turns, col("conv"), col("o"),
      col("role")).collect()(0)
    assert((0 to 5).map(r.getLong) ==
      Seq(4L, 1L, 1L, 1L, 2L, 1L),
      "(n_conversations, n_valid, n_not_user_first, n_role_repeat, " +
        "n_not_assistant_last, n_single_turn)")
  }

  test("structureReport: empty corpus reports one row of zeros, never NULLs") {
    val empty = Seq.empty[(Long, Long, String)].toDF("conv", "o", "role")
    val r = Conversation.structureReport(empty, col("conv"), col("o"),
      col("role")).collect()(0)
    assert((0 to 5).map(r.getLong) == Seq(0L, 0L, 0L, 0L, 0L, 0L))
  }

  // ---- turn packing ----------------------------------------------------------

  test("packTurns: greedy first-fit census at budget 10, by hand") {
    // conv A [4,5,2,9,10]: 4+5=9 | 2 (2+9>10) | 9 (9+10>10) | 10 → 4 contexts
    // conv B [10,1]:       10 | 1                             → 2 contexts
    // conv C [11]:         one oversized turn, own context    → 1 context
    // census: 1 ctx → C (1 turn, 11 tok, capacity 10 → waste −100000 ppm)
    //         2 ctx → B (2 turns, 11 tok, capacity 20 → 9e6/20 = 450000)
    //         4 ctx → A (5 turns, 30 tok, capacity 40 → 10e6/40 = 250000)
    val turns = Seq(
      ("A", 1L, 4L), ("A", 2L, 5L), ("A", 3L, 2L), ("A", 4L, 9L),
      ("A", 5L, 10L),
      ("B", 1L, 10L), ("B", 2L, 1L),
      ("C", 1L, 11L)).toDF("conv", "o", "tok")
    val r = Conversation.packTurns(turns, col("conv"), col("o"), col("tok"),
        budget = 10L)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4)))
    assert(r.toSeq == Seq(
      (1L, 1L, 1L, 11L, -100000L),
      (2L, 1L, 2L, 11L, 450000L),
      (4L, 1L, 5L, 30L, 250000L)))
  }

  test("packTurns: result invariant to input row order (the fold sorts by turn order)") {
    val base = Seq(("A", 1L, 4L), ("A", 2L, 5L), ("A", 3L, 2L),
      ("A", 4L, 9L), ("A", 5L, 10L), ("B", 1L, 10L), ("B", 2L, 1L))
    val fwd = Conversation.packTurns(base.toDF("conv", "o", "tok"),
      col("conv"), col("o"), col("tok"), 10L).collect().toSeq
    val rev = Conversation.packTurns(
      base.reverse.toDF("conv", "o", "tok").repartition(7),
      col("conv"), col("o"), col("tok"), 10L).collect().toSeq
    assert(fwd == rev)
  }

  // ---- dialog dedup / regeneration siblings ---------------------------------

  test("dialogDedup: exact copies, a regeneration sibling, and an all-assistant dialog, by hand") {
    // conv 1: user:5, assistant:7    full = f|user:5|assistant:7, prefix = u|5
    // conv 2: user:5, assistant:7    exact copy of conv 1
    // conv 3: user:5, assistant:9    sibling (same user prefix, new answer)
    // conv 4: user:6, assistant:7    unique
    // conv 5: assistant:7            no user turn → prefix renders 'u|'
    // prefix groups: u|5 → (nc=3, nf=2)  u|6 → (1,1)  u| → (1,1)
    // census: 5 convs, 3 prefix groups, 4 unique dialogs, 1 dup copy,
    //         1 sibling group holding 3 conversations
    val turns = Seq(
      (1L, 1L, "user", "5"), (1L, 2L, "assistant", "7"),
      (2L, 1L, "user", "5"), (2L, 2L, "assistant", "7"),
      (3L, 1L, "user", "5"), (3L, 2L, "assistant", "9"),
      (4L, 1L, "user", "6"), (4L, 2L, "assistant", "7"),
      (5L, 1L, "assistant", "7")).toDF("conv", "o", "role", "txt")
    val r = Conversation.dialogDedup(turns, col("conv"), col("o"),
      col("role"), col("txt")).collect()(0)
    assert((0 to 5).map(r.getLong) == Seq(5L, 3L, 4L, 1L, 1L, 3L),
      "(n_conversations, n_prefix_groups, n_unique_dialogs, " +
        "n_exact_dup_copies, n_sibling_groups, n_sibling_conversations)")
  }

  test("dialogDedup: turn ORDER distinguishes dialogs — same multiset, different sequence") {
    // conv 1: user:a, user:b   conv 2: user:b, user:a — same turns, not dups
    val turns = Seq(
      (1L, 1L, "user", "a"), (1L, 2L, "user", "b"),
      (2L, 1L, "user", "b"), (2L, 2L, "user", "a"))
      .toDF("conv", "o", "role", "txt")
    val r = Conversation.dialogDedup(turns, col("conv"), col("o"),
      col("role"), col("txt")).collect()(0)
    assert(r.getLong(2) == 2L, "both dialogs unique")
    assert(r.getLong(3) == 0L, "no exact-dup copies")
    assert(r.getLong(1) == 2L, "two prefix groups — prefix is ordered too")
  }

  test("dialogDedup: length-prefixed fingerprints — delimiter-bearing text cannot collide") {
    // conv 1: one user turn "a|b"; conv 2: two user turns "a","b" — a
    // naive '|'-joined rendering would merge them; netstring framing
    // (len:value) keeps them distinct: u|3:a|b vs u|1:a|1:b
    val turns = Seq(
      (1L, 1L, "user", "a|b"),
      (2L, 1L, "user", "a"), (2L, 2L, "user", "b"))
      .toDF("conv", "o", "role", "txt")
    val r = Conversation.dialogDedup(turns, col("conv"), col("o"),
      col("role"), col("txt")).collect()(0)
    assert(r.getLong(2) == 2L, "both dialogs must stay unique")
    assert(r.getLong(1) == 2L, "two distinct prefix groups")
    assert(r.getLong(3) == 0L && r.getLong(4) == 0L,
      "no dup copies, no sibling groups")
  }

  test("dialogDedup: a non-token prefixRole is refused (it is spliced into SQL)") {
    val turns = Seq((1L, 1L, "user", "x")).toDF("conv", "o", "role", "txt")
    intercept[IllegalArgumentException] {
      Conversation.dialogDedup(turns, col("conv"), col("o"), col("role"),
        col("txt"), prefixRole = "user' THEN struct(__o, __t) END --")
    }
  }

  test("dialogDedup: invariant to input row order and partitioning") {
    val base = Seq(
      (1L, 1L, "user", "5"), (1L, 2L, "assistant", "7"),
      (2L, 1L, "user", "5"), (2L, 2L, "assistant", "7"),
      (3L, 1L, "user", "5"), (3L, 2L, "assistant", "9"))
    val fwd = Conversation.dialogDedup(base.toDF("conv", "o", "role", "txt"),
      col("conv"), col("o"), col("role"), col("txt")).collect().toSeq
    val rev = Conversation.dialogDedup(
      base.reverse.toDF("conv", "o", "role", "txt").repartition(5),
      col("conv"), col("o"), col("role"), col("txt")).collect().toSeq
    assert(fwd == rev)
  }

  test("dialogDedup: empty corpus reports one row of zeros, never NULLs") {
    val empty = Seq.empty[(Long, Long, String, String)]
      .toDF("conv", "o", "role", "txt")
    val r = Conversation.dialogDedup(empty, col("conv"), col("o"),
      col("role"), col("txt")).collect()(0)
    assert((0 to 5).map(r.getLong) == Seq(0L, 0L, 0L, 0L, 0L, 0L))
  }

  // ---- suffix truncation ------------------------------------------------------

  test("truncationAudit: keep-last-whole-turns at budget 10, by hand") {
    // conv A [u:3, a:4, u:2, a:5] suffix sums 14,11,7,5 → keep turns 3,4
    //        (opener = user), dropped 2 turns / 7 tok
    // conv B [u:4, a:5]  suffix 9,5 → fits whole
    // conv C [u:8, a:6]  suffix 14,6 → keep turn 2 only (opener assistant)
    // conv D [u:12]      suffix 12 > 10 → nothing kept, opener NULL
    // census: 4 convs, 1 fit, 3 truncated, dropped 4 turns / 27 tok of 49
    //         → ppm = 27e6 DIV 49 = 551020; opener-assistant count = 1 (C)
    val turns = Seq(
      ("A", 1L, "user", 3L), ("A", 2L, "assistant", 4L),
      ("A", 3L, "user", 2L), ("A", 4L, "assistant", 5L),
      ("B", 1L, "user", 4L), ("B", 2L, "assistant", 5L),
      ("C", 1L, "user", 8L), ("C", 2L, "assistant", 6L),
      ("D", 1L, "user", 12L)).toDF("conv", "o", "role", "tok")
    val r = Conversation.truncationAudit(turns, col("conv"), col("o"),
      col("role"), col("tok"), budget = 10L).collect()(0)
    assert((0 to 6).map(r.getLong) ==
      Seq(4L, 1L, 3L, 4L, 27L, 551020L, 1L),
      "(n_conversations, n_fit, n_truncated, dropped_turns, " +
        "dropped_tokens, dropped_ppm, n_truncated_opening_assistant)")
  }

  test("truncationAudit: empty corpus reports one row of zeros, never NULLs") {
    val empty = Seq.empty[(String, Long, String, Long)]
      .toDF("conv", "o", "role", "tok")
    val r = Conversation.truncationAudit(empty, col("conv"), col("o"),
      col("role"), col("tok"), budget = 10L).collect()(0)
    assert((0 to 6).map(r.getLong) == Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L))
  }

  test("truncationAudit: invariant to input row order and partitioning") {
    val base = Seq(("A", 1L, "user", 3L), ("A", 2L, "assistant", 4L),
      ("A", 3L, "user", 2L), ("A", 4L, "assistant", 5L),
      ("B", 1L, "user", 4L), ("B", 2L, "assistant", 5L))
    val fwd = Conversation.truncationAudit(base.toDF("conv", "o", "role",
        "tok"), col("conv"), col("o"), col("role"), col("tok"), 10L)
      .collect().toSeq
    val rev = Conversation.truncationAudit(
      base.reverse.toDF("conv", "o", "role", "tok").repartition(7),
      col("conv"), col("o"), col("role"), col("tok"), 10L).collect().toSeq
    assert(fwd == rev)
  }

  test("packTurns: a budget larger than every conversation packs each into one context") {
    val turns = Seq(("A", 1L, 4L), ("A", 2L, 5L), ("B", 1L, 7L))
      .toDF("conv", "o", "tok")
    val r = Conversation.packTurns(turns, col("conv"), col("o"), col("tok"),
        budget = 100L)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(3)))
    // 2 conversations, 1 context each, 16 tokens total;
    // waste = (1·2·100 − 16)·1e6 DIV 200 = 920000
    assert(r.toSeq == Seq((1L, 2L, 16L)))
  }
}
