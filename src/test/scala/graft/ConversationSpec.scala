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
