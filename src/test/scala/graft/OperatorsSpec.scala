package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}

class DedupSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again today"
  private val docs = Seq(
    (0L, base),
    (1L, base), // exact dup of 0
    (2L, base.replace("today", "tomorrow")), // near dup of 0/1
    (3L, "completely different words in this one with nothing shared at all"),
    (4L, "short text"), // < 3 words after split? (2 words → no shingles)
    (5L, "completely different words in this one with nothing shared at all"))
    .toDF("doc_id", "text")

  test("shingles: distinct n-grams; short texts yield empty array") {
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sh(4L).isEmpty)
    assert(sh(0L).contains("the quick brown"))
    assert(sh(0L).distinct.length == sh(0L).length)
  }

  test("exact dedup keeps min id per text") {
    val out = Dedup.exact(docs, "text", "doc_id").select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(0L, 2L, 3L, 4L))
  }

  test("shingleHashRows duplicate-id rows: per-row dedup double-counts (documented precondition)") {
    // the distinct=true fast path dedups PER ROW (array_distinct before the
    // explode, zero exchanges) — equivalent to a global (doc, sh) DISTINCT
    // only when the input has one row per id. This pins the divergence the
    // scaladoc documents: a duplicate-id frame emits each duplicate row's
    // shingles again, and collapsing ids first restores the global form.
    val dup = Seq((1L, base), (1L, base), (2L, base.replace("today", "tomorrow")))
      .toDF("doc_id", "text")
    val perRow = Dedup.shingleHashRows(dup, "doc_id", "text", 3)
    val global = Dedup.shingleHashRows(dup, "doc_id", "text", 3,
      distinct = false).distinct()
    val doc1PerRow = perRow.filter(col("doc_id") === 1L).count()
    val doc1Global = global.filter(col("doc_id") === 1L).count()
    assert(doc1PerRow == 2 * doc1Global,
      s"duplicate id must double-count per-doc shingles ($doc1PerRow vs $doc1Global)")
    // one-row-per-id input (the precondition) ⇒ exact equality with the
    // global distinct, row for row
    val collapsed = dup.groupBy("doc_id").agg(first(col("text")).as("text"))
    val fixedRows = Dedup.shingleHashRows(collapsed, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val globalRows = global
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(fixedRows == globalRows)
  }

  test("minhash LSH finds exact and near dups, not unrelated docs") {
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text", threshold = 0.5)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L))) // identical
    assert(pairs.contains((3L, 5L))) // identical
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L))) // near dup
    assert(!pairs.exists(p => Set(p._1, p._2).contains(4L))) // no shingles
    assert(!pairs.contains((0L, 3L)))
  }

  test("ngram jaccard computes exact similarity values") {
    val j = Dedup.ngramJaccard(docs, "doc_id", "text", minJaccard = 0.1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(j((0L, 1L)) == 1.0)
    // base has 11 distinct 3-shingles; changing the last word alters the last
    // 3 shingles wait — compute expected from first principles instead:
    val sh = (s: String) => s.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val expected = sh(base).intersect(sh(base.replace("today", "tomorrow"))).size.toDouble /
      sh(base).union(sh(base.replace("today", "tomorrow"))).size
    assert(math.abs(j((0L, 2L)) - expected) < 1e-12)
  }

  test("ShingleHashes is bit-identical to the builtin xxhash64 composition") {
    val real = sources.Tables(spark, "/root/testdata/sf0.001", "documents").limit(100)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val words = real
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .select(col("doc_id"), col("pos"), xxhash64(col("w")).as("h0"))
    val reference = words
      .withColumn("h1", lead(col("h0"), 1).over(w))
      .withColumn("h2", lead(col("h0"), 2).over(w))
      .filter(col("h2").isNotNull)
      .select(col("doc_id"), xxhash64(col("h0"), col("h1"), col("h2")).as("sh"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val fused = Dedup.shingleHashRows(real, "doc_id", "text", 3, distinct = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(fused == reference)
  }

  test("PortableShingleHashes is bit-identical to hash60 over Dedup.shingles") {
    val real = sources.Tables(spark, "/root/testdata/sf0.001", "documents").limit(100)
    val reference = real.filter(col("text").isNotNull)
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("s"))
      .select(col("doc_id"), operators.PortableHash.hash60(col("s")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val fused = real.filter(col("text").isNotNull)
      .select(col("doc_id"),
        explode(functions.PortableShingleHashes(col("text"), 3)).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(fused == reference)
    // hand-checked edge cases: duplicate shingles collapse (first-occurrence
    // order), sub-n texts yield no rows, null text yields no rows
    val edge = Seq((1L, "a b c a b c a b c"), (2L, "x y"), (3L, null))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        functions.PortableShingleHashes(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[Long](1))).toMap
    assert(edge(1L).get.length == 3) // {abc, bca, cab}: 7 grams, 3 distinct
    assert(edge(1L).get.distinct.length == 3)
    assert(edge(2L).get.isEmpty)
    assert(edge(3L).isEmpty)
  }

  test("prefixNovelty: first occurrence owns the shingle; short docs report zeros") {
    val d = Seq(
      (1L, "a b c d"),   // shingles {abc, bcd} — both novel
      (2L, "b c d e"),   // {bcd, cde} — bcd seen in doc 1, cde novel
      (3L, "x"),         // too short: 0 shingles
      (4L, "a b c d")    // exact dup of doc 1: nothing novel
    ).toDF("doc_id", "text")
    val r = Dedup.prefixNovelty(d, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r == Map(1L -> (2L, 2L), 2L -> (2L, 1L), 3L -> (0L, 0L), 4L -> (2L, 0L)))
  }

  test("repetitionStats: counts total vs distinct n-grams") {
    val df = Seq((1L, "a b c a b c a b c"), (2L, "all unique words right here"), (3L, "x y"))
      .toDF("doc_id", "text")
    val out = Dedup.repetitionStats(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // 9 words → 7 trigram occurrences, 3 distinct (a b c / b c a / c a b)
    assert(out(1L) == ((7L, 3L, 1.0 - 3.0 / 7.0)))
    assert(out(2L) == ((3L, 3L, 0.0)))
    assert(!out.contains(3L)) // shorter than n words → no row
  }

  test("retainBest: keeps the top-scoring doc per cluster, singletons survive, ties → min id") {
    val docs = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (4L, 0.1), (10L, 0.2))
      .toDF("doc_id", "s")
    // cluster {1,2,3} (2 and 3 tie on score → keep 2); {4} labeled; 10 unlabeled
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L)).toDF("doc_id", "cluster")
    val kept = Dedup.retainBest(docs, "doc_id", col("s"), clusters)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L, 10L))
  }

  test("simhash: identical texts collide at hamming 0; near dups within 3") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs((0L, 1L)) == 0)
    assert(pairs((3L, 5L)) == 0)
    assert(pairs.get((0L, 2L)).forall(_ <= 3)) // one-word change stays close
  }

  test("simhash: 64-bit single band is rejected (mask would overflow to one bucket)") {
    val e = intercept[IllegalArgumentException](
      Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 0, numBands = 1))
    assert(e.getMessage.contains("63"))
  }

  test("decontaminate: flags only train docs sharing an n-gram with the eval set") {
    // doc 0 is eval; docs 1 and 2 share its 4-grams ("the quick brown fox",
    // ...), doc 3 shares nothing, doc 5 duplicates 3 (still nothing shared)
    val out = Dedup.decontaminate(docs, "doc_id", "text",
        isEval = col("doc_id") === 0, n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.contains(1L) && out.contains(2L))
    assert(!out.contains(3L) && !out.contains(5L) && !out.contains(0L))
    // doc 1 is an exact dup of the eval doc: every one of its 4-grams is shared
    val nGrams1 = base.split(" ").length - 3
    assert(out(1L) == nGrams1)
    assert(out(2L) < out(1L)) // the near dup shares strictly fewer
  }

  test("spliceOverlapPairs: tail-head token overlap is directional; short docs skipped") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    val d = Seq(
      (1L, "a b c d e f"),   // tail "d e f"
      (2L, "d e f g h i"),   // head "d e f" → (1,2)
      (3L, "x y z d e f"),   // tail "d e f" → (3,2); head "x y z" matches nobody
      (4L, "q r")            // < 3 tokens, excluded
    ).toDF("doc_id", "text")
    val out = Dedup.spliceOverlapPairs(d, "doc_id", "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L), (3L, 2L)))
  }

  test("editDistancePairs: verifies LSH candidates at character level") {
    // docs fixture: 0≡1 exact (dist 0), 2 is a near dup differing only in
    // the final word — beyond the 60-char prefix, so dist 0 there too;
    // 3≡5 exact. All are jaccard-0.7 candidates.
    val out = Dedup.editDistancePairs(docs, "doc_id", "text",
        maxDist = 5, prefixLen = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out == Set((0L, 1L, 0), (0L, 2L, 0), (1L, 2L, 0), (3L, 5L, 0)))
  }

  test("editDistancePairs: maxDist filters candidate pairs whose heads diverge") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // same token SET (jaccard 1.0) but rotated word order → large prefix edit
    val rotated = "kappa alpha beta gamma delta epsilon zeta eta theta iota"
    val d = Seq((1L, a), (2L, rotated)).toDF("doc_id", "text")
    val all = Dedup.editDistancePairs(d, "doc_id", "text",
      maxDist = 60, prefixLen = 60).collect()
    assert(all.length == 1 && all.head.getInt(2) > 0) // candidate, nonzero dist
    val strict = Dedup.editDistancePairs(d, "doc_id", "text",
      maxDist = 2, prefixLen = 60).collect()
    assert(strict.isEmpty) // character-level filter rejects
  }

  test("containment flags a fully-embedded short doc that jaccard misses") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    val long = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val short = "alpha beta gamma delta epsilon zeta" // strict prefix of long
    val d = Seq((1L, long), (2L, short), (3L, "unrelated words only here now"))
      .toDF("doc_id", "text")
    val cont = Dedup.ngramContainment(d, "doc_id", "text", minContainment = 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(cont((1L, 2L)) == 1.0, "short doc's shingles all inside the long doc")
    assert(cont.size == 1)
    // the same pair is INVISIBLE to jaccard at any useful threshold
    val j = Dedup.ngramJaccard(d, "doc_id", "text", minJaccard = 0.5).collect()
    assert(!j.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
  }

  test("damerau-levenshtein: UNRESTRICTED metric (transposed pair may be edited again)") {
    import graft.functions.DamerauLevenshtein.{compute => dl}
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    assert(dl(u("ca"), u("abc")) == 2)      // transpose + insert; OSA says 3
    assert(dl(u("ab"), u("ba")) == 1)       // plain adjacent transposition
    assert(dl(u("kitten"), u("sitting")) == 3) // reduces to levenshtein
    assert(dl(u(""), u("abc")) == 3 && dl(u("abc"), u("")) == 3)
    assert(dl(u("same"), u("same")) == 0)
  }

  test("blockedNameMatch: vocabulary-collapsed, blocked on head noun, multiplicity restored") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    val df = Seq("cold ring", "cold ring", "old ring", "old ring", "old ring",
      "red gear", "old gear", "blue widget")
      .toDF("name")
    val out = Dedup.blockedNameMatch(df, "name", maxDist = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(5))).toSet
    assert(out == Set(
      ("cold ring", "old ring", 1, 6L),   // 2 x 3 record pairs
      ("old gear", "red gear", 2, 1L)))
    // "blue widget" is alone in its block → never compared
  }

  test("captureRecapture: Chapman estimate and coverages from two pair catches") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    val c1 = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("d1", "d2")
    val c2 = Seq((1L, 2L), (7L, 8L)).toDF("d1", "d2")
    val r = Dedup.captureRecapture(c1, c2).collect().head
    // n1=3 n2=2 m=1 -> Chapman (4*3)/2 - 1 = 5
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 2L, 1L)))
    assert(r.getLong(3) == 5L)
    assert((r.getLong(4), r.getLong(5)) == ((600000L, 400000L)))
  }

  test("intraDocRepeatCensus: repeated 3-token window counted, clean doc not") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    // d1: windows [abc, bca, cab, abc, bcd] -> "a b c" twice -> rw = 2 of 5
    val df = Seq((1L, "a b c a b c d", "s"), (2L, "x y z w", "s"))
      .toDF("doc_id", "text", "source")
    val r = Dedup.intraDocRepeatCensus(df, "doc_id", "text", "source", k = 3)
      .collect().head
    assert(r.getString(0) == "s")
    assert((r.getLong(1), r.getLong(2)) == ((2L, 1L)))
    assert((r.getLong(3), r.getLong(4)) == ((7L, 2L)))
    assert(r.getLong(5) == 2L * 1000000L / 7L)
  }
}

class SimilaritySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("cosine of hand-computed vectors") {
    val df = Seq((Array(1f, 0f, 0f), Array(0.6f, 0.8f, 0f))).toDF("a", "b")
    val c = df.select(Similarity.cosine(col("a"), col("b"))).head.getDouble(0)
    assert(math.abs(c - 0.6) < 1e-7) // dot=0.6, norms 1 and 1
    val self = df.select(Similarity.cosine(col("a"), col("a"))).head.getDouble(0)
    assert(math.abs(self - 1.0) < 1e-12)
  }

  test("classSeparability: perfect dimension 1e6, constant 0, label-independent 0") {
    // dim 1 IS the label (perfect separation → η² = 1), dim 2 is constant
    // (no variance → guarded 0), dim 3 varies within but not between
    // classes (SSB = 0 → η² = 0)
    val emb = Seq(
      (1L, Array(0f, 0.5f, 0f), 0),
      (2L, Array(0f, 0.5f, 1f), 0),
      (3L, Array(1f, 0.5f, 0f), 1),
      (4L, Array(1f, 0.5f, 1f), 1))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.classSeparability(emb, "label")
      .collect().map(x => x.getInt(0) -> (x.getLong(1), x.getLong(2),
        x.getLong(3))).toMap
    assert(r(1) == ((2L, 4L, 1000000L)), "label dimension explains everything")
    assert(r(2) == ((2L, 4L, 0L)), "constant dimension has nothing to explain")
    assert(r(3) == ((2L, 4L, 0L)), "within-class-only variation explains nothing")
  }

  test("labelNoiseAudit: a mislabeled vector inside a cluster is flagged") {
    // three near-identical "A" vectors + one vector labeled "B" sitting in
    // the same cluster + two far-away genuine "B"s. With k=3 the planted
    // B's neighbors are the three As → 3 disagreements → flagged; the
    // genuine As see 2 As + the fake B → majority agree → not flagged.
    val emb = Seq(
      (1L, "A", Array(1f, 0f, 0.00f)),
      (2L, "A", Array(1f, 0f, 0.01f)),
      (3L, "A", Array(1f, 0f, 0.02f)),
      (4L, "B", Array(1f, 0f, 0.03f)), // mislabeled
      (5L, "B", Array(0f, 1f, 0f)),
      (6L, "B", Array(0f, 1f, 0.01f))
    ).toDF("vec_id", "label", "embedding")
    val flagged = Similarity.labelNoiseAudit(emb, k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(flagged.contains(4L))
    assert(flagged(4L) == ((0L, 3L)))
    assert(!flagged.contains(1L) && !flagged.contains(2L) && !flagged.contains(3L))
  }

  test("brute-force top-k returns k best, self first") {
    val emb = sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val top = Similarity.bruteForceTopK(emb, q, 5).collect()
    assert(top.length == 5)
    assert(top.head.getLong(0) == 0L) // the query vector itself, sim 1.0
    val sims = top.map(_.getDouble(1))
    assert(sims.sameElements(sims.sorted.reverse))
  }

  test("ivf: probing every cell recovers the exact brute-force top-k") {
    val emb = sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val ivf = Similarity.ivfTopK(emb, q, 10, nCells = 4, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val brute = Similarity.bruteForceTopK(emb, q, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(ivf.toSeq == brute.toSeq)
  }

  test("ivf: fewer probes return a subset of the probed cells, query found via its own cell") {
    val emb = sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val top = Similarity.ivfTopK(emb, q, 5, nCells = 16, nProbe = 4).collect()
    assert(top.nonEmpty && top.length <= 5)
    // the query vector's own cell is always its best-probed cell → vec 0 leads
    assert(top.head.getLong(0) == 0L && top.head.getDouble(1) == 1.0)
    val sims = top.map(_.getDouble(1))
    assert(sims.sameElements(sims.sorted.reverse))
  }

  test("hyperplane masks are deterministic; band keys agree between eval and codegen paths") {
    val m1 = graft.functions.Hyperplanes.masks(192)
    val m2 = graft.functions.Hyperplanes.masks(192)
    assert(m1.sameElements(m2) && m1.distinct.length == 192)
    val emb = sources.Tables(spark, "/root/testdata/sf0.001", "embeddings").limit(50)
    val keysCol = graft.functions.HyperplaneBandKeys(col("embedding"), m1.toSeq, 12)
    // codegen'd projection vs forced interpreted eval must agree exactly
    val compiled = emb.select(col("vec_id"), keysCol.as("k")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val rows = emb.select(col("vec_id"), col("embedding")).collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1).toArray
      val expr = new graft.functions.HyperplaneBandKeys(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          v, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
        m1.toSeq, 12)
      val interp = expr.eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
      assert(interp.toSeq == compiled(r.getLong(0)), s"vec ${r.getLong(0)} mismatch")
    }
  }

  test("hyperplane band keys reject >64-dim vectors instead of silently correlating planes") {
    val df = Seq((1L, Array.fill(65)(0.1f))).toDF("vec_id", "embedding")
    val masks = graft.functions.Hyperplanes.masks(24)
    val e = intercept[Exception] {
      df.select(graft.functions.HyperplaneBandKeys(col("embedding"), masks.toSeq, 12)).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).flatMap(c => Option(c.getMessage)).exists(_.contains("64 dimensions")))
  }

  test("banded hyperplane LSH finds planted near-duplicates (recall on high-cosine pairs)") {
    // 40 seeded random 64-dim vectors; vectors 100..104 are tiny perturbations
    // of 0..4 (cosine > 0.99). LSH at τ=0.95 must recover all 5 planted pairs
    // and verify-filter everything else.
    val rnd = new scala.util.Random(42)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    val base = (0 until 40).map(i => (i.toLong, vec()))
    val planted = (0 until 5).map { i =>
      val src = base(i)._2
      (100L + i, src.zipWithIndex.map { case (x, j) => x + (if (j % 7 == 0) 0.01f else 0f) })
    }
    val df = (base ++ planted).toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDupPairs(df, 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == (0 until 5).map(i => (i.toLong, 100L + i)).toSet, s"got $pairs")
    // ANN: the planted near-dup of vector 0 must surface in its banded top-k
    val q = df.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val ann = Similarity.annBandedTopK(df, q, 3).collect().map(_.getLong(0))
    assert(ann.take(2).toSet == Set(0L, 100L), s"got ${ann.toSeq}")
  }

  test("ann bucket results are a subset of brute-force ranking within the bucket") {
    val emb = sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val ann = Similarity.annTopK(emb, q, 10).collect()
    assert(ann.nonEmpty && ann.head.getLong(0) == 0L)
    // every returned vec shares the query's sign bucket
    val qb = emb.filter(col("vec_id") === 0)
      .select(Similarity.signBucket(col("embedding"))).head.getInt(0)
    val ids = ann.map(_.getLong(0)).toSet
    val buckets = emb.filter(col("vec_id").isin(ids.toSeq.map(Long.box): _*))
      .select(Similarity.signBucket(col("embedding"))).collect().map(_.getInt(0)).toSet
    assert(buckets == Set(qb))
  }

  test("int8QuantizedTopK: quantized ranking matches exact on well-separated vectors") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)),   // query
      (1L, Seq(0.9f, 0.1f)),   // cos ≈ .994
      (2L, Seq(0.1f, 0.9f)),   // cos ≈ .110
      (3L, Seq(-1.0f, 0.0f))). // cos = -1
      toDF("vec_id", "embedding")
    val out = Similarity.int8QuantizedTopK(emb, k = 3).orderBy("rnk")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(4)))
    assert(out.toSeq == Seq((1, 1L, 1), (2, 2L, 1), (3, 3L, 1)),
      s"order preserved and every hit certified in the exact top-k: ${out.toSeq}")
  }

  test("int8QuantizedTopK: real embeddings keep high certified recall") {
    val emb = sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val out = Similarity.int8QuantizedTopK(emb, k = 10).collect()
    assert(out.length == 10)
    assert(out.map(_.getInt(4)).sum >= 8,
      s"int8 should lose at most 2 of 10: ${out.map(_.getInt(4)).toSeq}")
  }

  test("jlProjectionDistortion: identical vectors project identically (zero distortion)") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    val v = (0 until 64).map(i => (math.sin(i + 1) * 0.7).toFloat)
    val o = (0 until 64).map(i => (math.cos(i * 2 + 1) * 0.4).toFloat)
    val emb = Seq((0L, v), (1L, v), (2L, o)).toDF("vec_id", "embedding")
    val out = Similarity.jlProjectionDistortion(emb, projDims = 16, k = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(3)))
    assert(out.head == ((1L, 1.0, 0.0)),
      s"duplicate of the query: cos 1.0 both ways, abs_err 0: ${out.toSeq}")
    assert(out.last._1 == 2L && out.last._3 < 1.0,
      s"unrelated vector reported with measured distortion: ${out.toSeq}")
  }

  test("assembleContext: greedy rank-order prefix under the token budget") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    // q1: docs cost 25+25+25 tokens → rank 3 overflows a 60-token budget
    // AND truncates the tail (rank 4 would fit but must not appear);
    // q2: first doc alone overflows → empty context
    val retrieved = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), (1L, 13L, 4),
      (2L, 20L, 1), (2L, 21L, 2))
      .toDF("qid", "vec_id", "rn")
    val docs = Seq((10L, 100L), (11L, 100L), (12L, 100L), (13L, 4L),
      (20L, 999L), (21L, 4L))
      .toDF("doc_id", "n_chars")
    val out = Similarity.assembleContext(retrieved, docs, "doc_id", "n_chars",
      budgetTokens = 60L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(4)))
    assert(out.toSet == Set((1L, 1, 25L), (1L, 2, 50L)),
      s"rank 3 overflows and cuts the tail; q2 has no fitting prefix: ${out.toSeq}")
  }

  test("assembleContext: a retrieved id missing from docs fails loudly") {
    val spark2 = SparkTestSession.spark
    import spark2.implicits._
    val retrieved = Seq((1L, 10L, 1), (1L, 99L, 2)).toDF("qid", "vec_id", "rn")
    val docs = Seq((10L, 100L)).toDF("doc_id", "n_chars")
    val e = intercept[Exception] {
      Similarity.assembleContext(retrieved, docs, "doc_id", "n_chars", 60L).collect()
    }
    assert(e.getMessage.contains("missing from docs") ||
      Option(e.getCause).exists(_.getMessage.contains("missing from docs")),
      s"expected the raise_error message, got: ${e.getMessage}")
  }

  test("pqRecallAudit: vectors sitting exactly on codewords give perfect recall") {
    // codebook seeds are vec_id 1..2; vec 3 copies vec 1, so its PQ codes
    // equal vec 1's and ADC ranks {1, 3} on top — exactly the brute truth
    val emb = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(1f, 0f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val q = Seq(Tuple1(Array(1f, 0f, 0f, 0f))).toDF("qe")
    val r = Similarity.pqRecallAudit(emb, q, k = 2, dim = 4, nSub = 2,
      nCodes = 2).collect().head
    assert((r.getInt(0), r.getLong(1), r.getLong(2)) == ((2, 2L, 1000000L)))
    assert((r.getLong(3), r.getLong(4)) == ((16L, 2L))) // 8x compression
  }

  test("ivfPqRecallAudit: probing every cell with on-codeword vectors gives perfect recall") {
    val emb = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(1f, 0f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val q = Seq(Tuple1(Array(1f, 0f, 0f, 0f))).toDF("qe")
    val r = Similarity.ivfPqRecallAudit(emb, q, k = 2, nCells = 2, nProbe = 2,
      dim = 4, nSub = 2, nCodes = 2).collect().head
    assert((r.getInt(0), r.getLong(1), r.getLong(2)) == ((2, 2L, 1000000L)))
    assert((r.getLong(3), r.getLong(4)) == ((3L, 1000000L))) // all cells probed
  }

  test("diverseTopK: the label quota forces a weaker cross-label result in") {
    // three near-perfect label-0 vectors, one mediocre label-1: with
    // perGroup=2 the third label-0 vector is displaced by the label-1 one
    val emb = Seq(
      (1L, 0L, Array(1f, 0f, 0f)),
      (2L, 0L, Array(1f, 0.01f, 0f)),
      (3L, 0L, Array(1f, 0.02f, 0f)),
      (4L, 1L, Array(0.5f, 0.5f, 0f))
    ).toDF("vec_id", "label", "embedding")
    val q = Seq(Tuple1(Array(1f, 0f, 0f))).toDF("qe")
    val ids = Similarity.diverseTopK(emb, q, "label", k = 3, perGroup = 2)
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 4L)) // 3 capped out by the label-0 quota
  }

  test("ivfPqRerankAudit: exact re-rank over a full probe recovers brute-force truth") {
    val emb = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0.9f, 0.1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val q = Seq(Tuple1(Array(1f, 0f, 0f, 0f))).toDF("qe")
    val r = Similarity.ivfPqRerankAudit(emb, q, k = 2, rerankPool = 3,
      nCells = 2, nProbe = 2, dim = 4, nSub = 2, nCodes = 2).collect().head
    // pool covers everything and the re-rank is exact -> perfect recall
    assert((r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))
      == ((2, 3, 2L, 1000000L)))
  }

  test("sourceCentroidSimilarity: aligned sources score 1, orthogonal ones 0") {
    val emb = Seq(
      (1L, Array(1f, 0f)), (2L, Array(2f, 0f)),  // source A: direction (1,0)
      (3L, Array(3f, 0f)),                        // source B: same direction
      (4L, Array(0f, 1f))                         // source C: orthogonal
    ).toDF("vec_id", "embedding")
    val docs = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "C"))
      .toDF("doc_id", "source")
    val r = Similarity.sourceCentroidSimilarity(emb, docs, "doc_id", "source")
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getDouble(2))
      .toMap
    assert(r(("A", "B")) == 1.0)
    assert(r(("A", "C")) == 0.0)
    assert(r(("B", "C")) == 0.0)
  }

  test("embeddingOutlierAudit: only the planted far-out vector is flagged") {
    // dim 1: 100 zeros and one 100 — the outlier's z is ~10, well past 3
    // sigma (n must be large: among n points the max z is at most sqrt(n-1),
    // so tiny fixtures can never flag); dim 2 constant so it never flags
    val emb = (1L to 100L).map(i => (i, 0L, Array(0f, 5f))) :+
      ((101L, 1L, Array(100f, 5f)))
    val r = Similarity.embeddingOutlierAudit(emb.toDF("vec_id", "label", "embedding"),
      "label").collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2))))
    assert(r.toSeq == Seq(101L -> ((1L, 1L))))
  }

  test("embeddingNormAudit: zero vectors counted; norm range and exact mean per label") {
    val emb = Seq(
      (1L, 0L, Array(3f, 4f)),   // sq norm 25
      (2L, 0L, Array(0f, 0f)),   // zero vector
      (3L, 1L, Array(1f, 0f))    // sq norm 1
    ).toDF("vec_id", "label", "embedding")
    val r = Similarity.embeddingNormAudit(emb, "label").collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3), x.getDouble(4), x.getDouble(5))))
      .toMap
    assert(r(0L) == ((2L, 1L, 0.0, 25.0, 12.5)))
    assert(r(1L) == ((1L, 0L, 1.0, 1.0, 1.0)))
  }

  test("dimensionDriftAudit: a label-separating dimension shows the deviation; a constant one shows zero") {
    val emb = Seq(
      (1L, 0L, Array(1f, 5f)), (2L, 0L, Array(1f, 5f)),
      (3L, 1L, Array(-1f, 5f)), (4L, 1L, Array(-1f, 5f))
    ).toDF("vec_id", "label", "embedding")
    val r = Similarity.dimensionDriftAudit(emb, "label").collect()
      .map(x => x.getInt(0) -> ((x.getLong(1), x.getDouble(2), x.getDouble(3))))
      .toMap
    // dim 1: label means ±1e6 around a 0 global mean; dim 2 constant 5e6
    assert(r(1) == ((2L, 0.0, 1000000.0)))
    assert(r(2) == ((2L, 5000000.0, 0.0)))
  }

  test("labelMarginCensus: orthogonal label clusters land in the full-margin band") {
    // label 0 on e1, label 1 on e2: own-centroid cos = 1, other = 0 →
    // margin 1.0 → floor(1.0·10) = band 10, two vectors per label
    val emb = Seq(
      (1L, 0, Array(1f, 0f)), (2L, 0, Array(1f, 0f)),
      (3L, 1, Array(0f, 1f)), (4L, 1, Array(0f, 1f))
    ).toDF("vec_id", "label", "embedding")
    val r = Similarity.labelMarginCensus(emb).collect()
      .map(x => (x.getInt(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(r == Map((0, 10L) -> 2L, (1, 10L) -> 2L))
  }

  test("labelMarginCensus: a vector nearer the foreign centroid gets a negative band") {
    val emb = Seq(
      (1L, 0, Array(1f, 0f)), (2L, 0, Array(1f, 0f)),
      (3L, 1, Array(0f, 1f)), (4L, 1, Array(0f, 1f)),
      (5L, 0, Array(0f, 1f)) // labeled 0, sits on label 1's axis
    ).toDF("vec_id", "label", "embedding")
    val bands = Similarity.labelMarginCensus(emb).collect()
      .filter(_.getInt(0) == 0).map(x => x.getLong(1) -> x.getLong(2)).toMap
    assert(bands.keys.exists(_ < 0L), s"expected a negative band, got $bands")
  }

  test("dimensionEnergySpectrum: one live axis carries all the energy (k50=k90=k99=1)") {
    // dim0: m=±1e6 → vs = 2·2e12 = 4e12; dim1: constant → vs = 0; dim2: 0
    val emb = Seq(
      (1L, 0, Array(1f, 0.5f, 0f)),
      (2L, 0, Array(-1f, 0.5f, 0f))
    ).toDF("vec_id", "label", "embedding")
    val r = Similarity.dimensionEnergySpectrum(emb).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ((3L, 0L, 1000000L, 1L, 1L, 1L)))
  }

  test("centroidStabilityAudit: identical halves score exactly 1.0") {
    val emb = Seq(
      (0L, 7, Array(1f, 2f)), (1L, 7, Array(1f, 2f)),
      (2L, 7, Array(1f, 2f)), (3L, 7, Array(1f, 2f))
    ).toDF("vec_id", "label", "embedding")
    val r = Similarity.centroidStabilityAudit(emb).collect()
    assert(r.length == 1)
    assert((r.head.getInt(0), r.head.getLong(1), r.head.getLong(2),
      r.head.getDouble(3)) == ((7, 2L, 2L, 1.0)))
  }

  test("centroidStabilityAudit: a label missing one half is dropped, not NULLed") {
    val emb = Seq(
      (0L, 1, Array(1f, 0f)), (1L, 1, Array(1f, 0f)),
      (2L, 2, Array(0f, 1f)) // label 2 only has an even-half vector
    ).toDF("vec_id", "label", "embedding")
    val labels = Similarity.centroidStabilityAudit(emb).collect()
      .map(_.getInt(0)).toSet
    assert(labels == Set(1))
  }

  test("matryoshkaRecall: a sign flip past the prefix misleads the truncated rank") {
    // b agrees with q on dims 1-2 but opposes on dim 3: prefix-2 cosine 1.0,
    // full cosine 0 — it steals a top-2 slot from c at width 2
    val emb = Seq(
      (1L, Array(1f, 0f, 1f, 0f)),
      (2L, Array(1f, 0f, -1f, 0f)),
      (3L, Array(0.5f, 0f, 0.5f, 0f))
    ).toDF("vec_id", "embedding")
    val q = Seq(Tuple1(Array(1f, 0f, 1f, 0f))).toDF("qe")
    val r = Similarity.matryoshkaRecall(emb, q, k = 2, dims = Seq(2, 4))
      .collect().map(x => (x.getInt(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq((2, 1L, 500000L), (4, 2L, 1000000L)))
  }

  test("rankingMetricsEval: perfect retrieval scores 1e6 on all three metrics") {
    // all vectors share the sign bucket (positive first 8 dims), so the
    // system list equals brute-force truth rank-for-rank
    val emb = (0L to 5L).map { i =>
      (i, Array.tabulate(8)(d => 1f + 0.1f * ((i + d) % 5)))
    }.toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val r = Similarity.rankingMetricsEval(emb, q, k = 5).collect().head
    assert(r.getLong(0) == 1L && r.getInt(1) == 5)
    assert(r.getLong(2) == 1000000L, "MRR: true NN at system rank 1")
    assert(r.getLong(3) == 1000000L, "NDCG: system ranks == truth ranks")
    assert(r.getLong(4) == 1000000L, "recall: all 5 truth items retrieved")
  }

  test("rankingMetricsEval: a bucket miss costs recall and NDCG but not MRR") {
    // b is the 2nd-nearest by cosine but sits in another sign bucket
    // (negative first dim), so the system never sees it
    val emb = Seq(
      (0L, Array.fill(8)(1f)),                         // the query itself
      (1L, Array.fill(8)(1f)),                         // cos 1.0, same bucket
      (2L, Array(-0.1f, 1f, 1f, 1f, 1f, 1f, 1f, 1f)),  // cos .92, other bucket
      (3L, Array(1f, 1f, 1f, 1f, 0f, 0f, 0f, 0f))      // cos .70, same bucket
    ).toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val r = Similarity.rankingMetricsEval(emb, q, k = 2).collect().head
    val disc = Similarity.ndcgDiscountsMicro(2)
    val idcg = 2L * disc.head + 1L * disc(1)
    // system = [1 (srank 1), 3 (srank 2)]; truth = [1 (trank 1), 2 (trank 2)]
    // only vec 1 joins: gain = 2*disc(1), rr = 1e6
    assert(r.getLong(2) == 1000000L)
    assert(r.getLong(3) == 2L * disc.head * 1000000L / idcg)
    assert(r.getLong(4) == 500000L, "1 of 2 truth items retrieved")
  }
}


class FrameSamplingSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("shardRebalanceAudit: ring matches an independent md5 successor computation") {
    import graft.operators.Sampling
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(0, 15)
      java.lang.Long.parseLong(hex, 16)
    }
    val nodes = (0 until 9).map(j => h60(s"shard:$j"))
    def succ(h: Long, k: Int): Long = {
      val ps = nodes.take(k).sorted
      ps.find(_ >= h).getOrElse(ps.head)
    }
    val ids = (1L to 1000L)
    val expectedRing = ids.count(i =>
      succ(h60(i.toString), 8) != succ(h60(i.toString), 9))
    val expectedMod = ids.count(i =>
      h60(i.toString) % 8 != h60(i.toString) % 9)
    val df = ids.toDF("doc_id")
    val r = Sampling.shardRebalanceAudit(df, "doc_id", k = 8)
      .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2))))
      .toMap
    assert(r("ring") == ((1000L, expectedRing.toLong)))
    assert(r("mod") == ((1000L, expectedMod.toLong)))
    // the consistent-hashing hierarchy on real draws
    assert(r("ring")._2 < r("range")._2 && r("range")._2 < r("mod")._2)
  }

  test("audioEnergyWindows: frames match the PCM formula; trailing partial frame true-sized") {
    // doc 10 → 74 samples → 4 full 16-sample windows + a 10-sample tail
    val media = Seq((10L, Multimodal.renderWav(10L), "wav"))
      .toDF("doc_id", "payload", "format")
    val out = Multimodal.audioEnergyWindows(spark, media, windowSize = 16)
      .collect().sortBy(_.window_idx)
    assert(out.length == 5)
    assert(out.map(_.n_samples).toSeq == Seq(16L, 16L, 16L, 16L, 10L))
    val expect = (0 until 74).map(t => math.abs(((10L * 31 + 7L * t) % 65536 - 32768).toInt))
      .grouped(16).zipWithIndex.map { case (w, i) =>
        (i, w.length.toLong, w.map(_.toLong).sum,
          w.map(a => a.toLong * a).sum, w.max)
      }.toSeq
    assert(out.map(e => (e.window_idx, e.n_samples, e.sum_abs, e.sum_sq,
      e.peak)).toSeq == expect)
  }

  test("sampleFrames: stride demuxes every k-th frame and decodes it exactly") {
    // doc 10 → 5 frames (1 + 10%6), stride 2 keeps frames 0, 2, 4
    val media = Seq((10L,
      Multimodal.packFrames((0 until 5).map(Multimodal.renderPng(10L, _))), "vid"))
      .toDF("doc_id", "payload", "format")
    val out = Multimodal.sampleFrames(spark, media, stride = 2)
      .collect().map(f => (f.frame_idx, f.width, f.height, f.gray_sum)).toSet
    val (w, h) = (Multimodal.imgWidth(10L), Multimodal.imgHeight(10L))
    val expect = Set(0, 2, 4).map { fi =>
      val sum = (for (y <- 0 until h; x <- 0 until w)
        yield (10L * 31 + fi * 17 + 7 * x + 13 * y) % 256).sum
      (fi, w, h, sum)
    }
    assert(out == expect)
  }

  test("sampleFrames: empty payload emits no frames") {
    val media = Seq((1L, Array.empty[Byte], "vid")).toDF("doc_id", "payload", "format")
    assert(Multimodal.sampleFrames(spark, media).collect().isEmpty)
  }

  test("resizeNearest: floor index map, identity at source dims") {
    val id = 13L
    val (w, h) = (Multimodal.imgWidth(id), Multimodal.imgHeight(id))
    def p(x: Int, y: Int): Int = ((id * 31 + 7L * x + 13L * y) % 256).toInt
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.renderPng(id, 0)))
    // identity resize returns the raster verbatim
    val same = Multimodal.resizeNearest(img, w, h)
    assert(same.toSeq == (for (y <- 0 until h; x <- 0 until w) yield p(x, y)))
    // 4×4 downsample samples (⌊tx·w/4⌋, ⌊ty·h/4⌋) row-major
    val small = Multimodal.resizeNearest(img, 4, 4)
    val expect = for (ty <- 0 until 4; tx <- 0 until 4)
      yield p(tx * w / 4, ty * h / 4)
    assert(small.toSeq == expect)
  }

  test("extractDecimatedAudio: stride-2 keeps even samples in order through the real codec") {
    val media = Multimodal.renderAudioTable(spark,
      Seq((7L, "t", "en", "s", 1L)).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val f = Multimodal.extractDecimatedAudio(spark, media).collect().head
    val n = Multimodal.audioSamples(7L)
    val kept = (0 until n by 2).map(Multimodal.sampleVal(7L, _))
    assert(f.n_samples == n.toLong && f.n_kept == kept.length.toLong)
    assert(f.kept_abs_sum == kept.map(v => math.abs(v.toLong)).sum)
    assert(f.kept_checksum ==
      kept.zipWithIndex.map { case (v, j) => (j + 1L) * v }.sum)
  }

  test("extractSilenceRuns: run fold matches a hand-computed run structure") {
    val media = Multimodal.renderAudioTable(spark,
      Seq((11L, "t", "en", "s", 1L)).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val f = Multimodal.extractSilenceRuns(spark, media).collect().head
    val n = Multimodal.audioSamples(11L)
    val sil = (0 until n).map(t => math.abs(Multimodal.sampleVal(11L, t)) < 4096)
    val runs = sil.foldLeft(List.empty[Int]) {
      case (acc, true) if acc.nonEmpty && acc.head > 0 => (acc.head + 1) :: acc.tail
      case (acc, true) => 1 :: acc
      case (acc, false) => 0 :: acc
    }.filter(_ > 0)
    assert(f.n_samples == n.toLong)
    assert(f.n_runs == runs.length.toLong)
    assert(f.longest_run == (if (runs.isEmpty) 0L else runs.max.toLong))
    assert(f.silence_ppm == sil.count(identity).toLong * 1000000L / n)
  }

  test("extractResizedFeatures: checksum is position-sensitive (catches a transposed map)") {
    val media = Multimodal.renderImageTable(spark,
      Seq((13L, "t", "en", "s", 1L)).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val f = Multimodal.extractResizedFeatures(spark, media).collect().head
    val id = 13L
    val (w, h) = (Multimodal.imgWidth(id), Multimodal.imgHeight(id))
    def p(x: Int, y: Int): Long = (id * 31 + 7L * x + 13L * y) % 256
    val px = for (ty <- 0 until 4; tx <- 0 until 4) yield p(tx * w / 4, ty * h / 4)
    val txp = for (tx <- 0 until 4; ty <- 0 until 4) yield p(tx * w / 4, ty * h / 4)
    assert((f.src_width, f.src_height, f.tgt_width, f.tgt_height) == (w, h, 4, 4))
    assert(f.resized_sum == px.sum)
    assert(f.resized_checksum == px.zipWithIndex.map { case (v, i) => (i + 1) * v }.sum)
    // the transposed grid has the same sum but a different checksum — the
    // checksum is what certifies the index map, so it must tell them apart
    val txChk = txp.zipWithIndex.map { case (v, i) => (i + 1) * v }.sum
    assert(txp.sum == px.sum && txChk != f.resized_checksum)
  }
}

class TextAnalysisSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("vocabGrowthCurve: first occurrences only, saturation past corpus, interval ppm") {
    // doc order by id: doc 1 introduces {a,b}, doc 2 repeats a + adds c,
    // doc 3 adds nothing new, doc 4 adds d
    val d = Seq((1L, "a b"), (2L, "a c"), (3L, "b c"), (4L, "d a"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.vocabGrowthCurve(d, "doc_id", "text",
        checkpoints = Seq(1L, 2L, 4L, 8L))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3))).toSeq
    assert(r == Seq(
      (1L, 2L, 2L, 2000000L),  // {a,b}: 2 new over 1 doc
      (2L, 3L, 1L, 1000000L),  // +c over 1 doc
      (4L, 4L, 1L, 500000L),   // +d over docs 3..4
      (8L, 4L, 0L, 0L)))       // past the corpus: saturated
  }

  test("maskSchedule: draw matches an independent md5 computation; -1 when unmasked") {
    // cross-check the hash path against java.security MessageDigest directly
    def draw(docId: Long, pos: Int): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$docId:$pos".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16)
    }
    val d = Seq((1L, "a b c d e f g h"), (2L, "x")).toDF("doc_id", "text")
    val out = TextAnalysis.maskSchedule(d, "doc_id", "text", maskPct = 15)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    for (id <- Seq(1L, 2L)) {
      val n = if (id == 1L) 8 else 1
      val masked = (0 until n).filter(p => draw(id, p) % 100 < 15)
      assert(out(id)._1 == n.toLong)
      assert(out(id)._2 == masked.size.toLong)
      assert(out(id)._3 == (if (masked.isEmpty) -1L else masked.min.toLong))
    }
  }

  test("sourceContainment: hand-computed directional ppm; zero-overlap and shingle-less sources kept") {
    val d = Seq(
      (1L, "w1 w2 w3 w4", "a"), // shingles {w1w2w3, w2w3w4}
      (2L, "w1 w2 w3", "b"),    // shingles {w1w2w3}
      (3L, "x1 x2 x3", "c"),    // disjoint
      (4L, "too short", "d")    // < shingleN tokens: zero shingles
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.sourceContainment(d, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out(("a", "b")) == ((1L, 500000L)))  // 1 of a's 2 shingles in b
    assert(out(("b", "a")) == ((1L, 1000000L))) // b's only shingle is in a
    assert(out(("a", "c")) == ((0L, 0L)))       // spine keeps zero-overlap pairs
    assert(out(("d", "a")) == ((0L, 0L)))       // shingle-less source still reports
    assert(out(("a", "d")) == ((0L, 0L)))
    assert(out.size == 12)                      // full ordered S*(S-1) matrix
  }

  test("heavyHitters: hand-computed threshold — strict cnt·(k+1) > n cut") {
    // tokens: a×3 b×2 c×1, N=6, k=2 → keep cnt·3 > 6 ⇔ cnt > 2 ⇔ only a.
    // b (cnt·3 = 6, not > 6) sits exactly AT the threshold and must be cut.
    val d = Seq((1L, "a a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = TextAnalysis.heavyHitters(d, "text", k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", 3L, 6L)))
  }

  test("heavyHitters is partitioning-independent and equals the exact filter") {
    val docs = sources.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val k = 30
    val exact = docs.select(explode(split(col("text"), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    val n = exact.agg(sum(col("cnt"))).collect().head.getLong(0)
    val expect = exact.filter(col("cnt") * (k + 1) > lit(n))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(expect.nonEmpty, "test must be non-vacuous")
    for (parts <- Seq(1, 7)) {
      val got = TextAnalysis.heavyHitters(docs.repartition(parts), "text", k)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == expect, s"parts=$parts: MG candidate set missed a heavy hitter")
    }
  }

  test("mergeIndexDelta == full rebuild under append-only ids (cap exercised)") {
    val docs = sources.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val cap = 5 // small cap so base lists overflow and the re-cap path matters
    val base = TextAnalysis.invertedIndex(docs.filter(col("doc_id") < 250),
      "doc_id", "text", maxPostings = cap)
    val delta = TextAnalysis.invertedIndex(docs.filter(col("doc_id") >= 250),
      "doc_id", "text", maxPostings = cap)
    val merged = TextAnalysis.mergeIndexDelta(base, delta, maxPostings = cap)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[Long](2)))).toMap
    val rebuilt = TextAnalysis.invertedIndex(docs, "doc_id", "text", maxPostings = cap)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[Long](2)))).toMap
    assert(merged == rebuilt)
    assert(merged.exists(_._2._2.length == cap), "cap must actually bind")
  }

  test("token counts: whitespace and BPE-ish") {
    val df = Seq("Hello, world! 42 foo_bar").toDF("text")
    assert(df.select(TextAnalysis.tokenCount(col("text"))).head.getInt(0) == 4)
    // lowercase split on [^a-z0-9]+ → hello, world, 42, foo, bar
    assert(df.select(TextAnalysis.bpeishTokenCount(col("text"))).head.getInt(0) == 5)
  }

  test("topTermsPerLang: frequency ranking with alphabetical tie-break") {
    val df = Seq(
      ("en", "b b b a a c"), ("en", "a"),
      ("fr", "z z y")).toDF("lang", "text")
    val out = TextAnalysis.topTermsPerLang(df, 2)
      .orderBy("lang", "rank")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    // en: a=3, b=3 tie → a first; fr: z=2, y=1
    assert(out.toSeq == Seq(("en", "a", 3L, 1), ("en", "b", 3L, 2), ("fr", "z", 2L, 1), ("fr", "y", 1L, 2)))
  }

  test("quality score is deterministic and bounded") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog the end of it now ok",
      "x").toDF("text")
    val scores = df.select(TextAnalysis.qualityScore(col("text"))).collect().map(_.getDouble(0))
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores(0) > scores(1)) // real sentence beats one char
  }

  test("enScoreMilli: token-equality marker count, 150-milli steps, 950 cap") {
    val df = Seq(
      "no markers here",            // 0 hits -> 50
      "the table",                  // 1 -> 200
      "a the theme attack",         // 2 ('theme'/'attack' must NOT count) -> 350
      "the a the a the a the a")    // 8 hits -> capped 950
      .toDF("text")
    val out = df.select(graft.operators.TextAnalysis.enScoreMilli(col("text")))
      .collect().map(_.getLong(0))
    assert(out.toSeq == Seq(50L, 200L, 350L, 950L))
  }

  test("lang id marker precedence") {
    val df = Seq("das ist der hammer", "le chat et la table", "nothing special")
      .toDF("text")
    val out = df.select(TextAnalysis.langIdHeuristic(col("text"))).collect().map(_.getString(0))
    assert(out.toSeq == Seq("de", "fr", "en"))
  }

  test("redactPii: emails and phone shapes replaced, clean text untouched") {
    val df = Seq(
      "reach me at jane.doe+spam@sub.example.co.uk or 555-0123 thanks",
      "call 020-7946-0958 now",
      "no pii here at all").toDF("text")
    val out = df.select(TextAnalysis.redactPii(col("text"))).collect().map(_.getString(0))
    assert(out(0) == "reach me at [EMAIL] or [PHONE] thanks")
    assert(out(1) == "call [PHONE] now")
    assert(out(2) == "no pii here at all")
    val counts = df.select(
      TextAnalysis.piiCount(col("text"), TextAnalysis.EmailPattern),
      TextAnalysis.piiCount(col("text"), TextAnalysis.PhonePattern))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(counts.toSeq == Seq((1, 1), (0, 1), (0, 0)))
  }

  test("trigramSearch: exact verify kills trigram-candidate false positives") {
    val docs = Seq(
      (1L, "xx abcdef yy"),        // true match, 1 occurrence
      (2L, "abcd cdef"),           // ALL trigrams of 'abcdef' but not the string
      (3L, "abcdef and abcdef"),   // 2 occurrences
      (4L, "nothing here"),
      (5L, "ab")                   // shorter than a trigram
    ).toDF("doc_id", "text")
    val out = TextAnalysis.trigramSearch(docs, "doc_id", "text", "abcdef")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 3L -> 2L)) // doc 2 was a candidate, verify dropped it
  }

  test("trigramSearch: occurrence count is non-overlapping, regex-metachar safe") {
    // 'a.a' must match literally (the dot is quoted), and 'aaaa' holds TWO
    // non-overlapping 'aa' — the same left-to-right count replace() gives
    val docs = Seq((1L, "xa.ax"), (2L, "aaaa x a.a"))
      .toDF("doc_id", "text")
    val dot = TextAnalysis.trigramSearch(docs, "doc_id", "text", "a.a")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dot == Map(1L -> 1L, 2L -> 1L)) // 'aaaa' does NOT match literal a.a
  }

  test("termTrends: rate ratio vs corpus totals; support floor filters") {
    // snap 0: "a a a a a b"×1 → a=5, b=1, tot=6
    // snap 1: "a a b b b b"×1 → a=2, b=4, tot=6
    // a: 2·6·1e6/(5·6) = 400000 (fell); b below floor (n_prev=1 < 2)... use
    // minPrevCount=1: b: 4·6·1e6/(1·6) = 4000000 (rose 4x)
    val docs = Seq((0L, "a a a a a b"), (1L, "a a b b b b")).toDF("doc_id", "text")
    val out = TextAnalysis.termTrends(docs, "text", col("doc_id"),
        prevSnap = 0L, curSnap = 1L, minPrevCount = 1L, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out == Map("a" -> 400000L, "b" -> 4000000L))
    val floored = TextAnalysis.termTrends(docs, "text", col("doc_id"),
        0L, 1L, minPrevCount = 2L, k = 10)
      .collect().map(_.getString(0)).toSet
    assert(floored == Set("a")) // b lacks previous-snapshot support
  }

  test("sentenceLengthCensus: dot segmentation, token means, single-sentence share") {
    val docs = Seq(
      (1L, "a b. c d e. ", "en"),   // 2 sentences: 2 + 3 tokens
      (2L, "hello", "en"),          // 1 sentence, 1 token
      (3L, "uno dos.", "es")        // 1 sentence, 2 tokens
    ).toDF("doc_id", "text", "lang")
    val r = TextAnalysis.sentenceLengthCensus(docs, "doc_id", "text", "lang")
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5)))).toMap
    // en: 2 docs, 3 sentences, mean = 6000/3 = 2000 milli, max 3, 1 of 2 single
    assert(r("en") == ((2L, 3L, 2000L, 3L, 500000L)))
    assert(r("es") == ((1L, 1L, 2000L, 2L, 1000000L)))
  }

  test("countMinAudit: estimate is one-sided (>= exact) and exact counts are right") {
    val docs = Seq(
      (0L, "alpha beta alpha gamma"),
      (1L, "alpha beta beta delta"),
      (2L, "alpha epsilon")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.countMinAudit(docs, "text", depth = 4, width = 64,
      k = 5).collect()
    val byTerm = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byTerm("alpha")._1 == 4L && byTerm("beta")._1 == 3L)
    assert(rows.forall(r => r.getLong(3) >= 0L),
      "CM estimates are never below the exact count")
    assert(rows.forall(r => r.getLong(2) == r.getLong(1) + r.getLong(3)))
    // ranked by exact count desc, then term
    assert(rows.map(_.getString(0)).take(2).toSeq == Seq("alpha", "beta"))
  }

  test("countMinAudit: a single-term corpus has zero collision mass by construction") {
    val docs = Seq((0L, "solo solo solo")).toDF("doc_id", "text")
    val r = TextAnalysis.countMinAudit(docs, "text", depth = 2, width = 8,
      k = 1).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((3L, 3L, 0L)))
  }

  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("amsF2Audit: single-term corpus is exact; multi-term matches the sign replay") {
    val solo = TextAnalysis.amsF2Audit(
      Seq((0L, "x x x")).toDF("doc_id", "text"), "text", depth = 4)
      .collect().head
    // every row sums to ±3 -> sj² = 9 = exact F2
    assert((solo.getLong(2), solo.getLong(3), solo.getLong(4)) == ((9L, 9L, 0L)))
    val docs = Seq((0L, "a b c a"), (1L, "b b d")).toDF("doc_id", "text")
    val r = TextAnalysis.amsF2Audit(docs, "text", depth = 4).collect().head
    val terms = Seq("a", "b", "c", "a", "b", "b", "d")
    val ests = (0 until 4).map { j =>
      val sj = terms.map(t => if (((h60(t) >> j) & 1L) == 1L) 1L else -1L).sum
      sj * sj
    }.sorted
    val counts = terms.groupBy(identity).map(_._2.size.toLong)
    assert(r.getLong(0) == 7L && r.getLong(1) == 4L)
    assert(r.getLong(2) == counts.map(c => c * c).sum)
    assert(r.getLong(3) == ests((4 + 1) / 2 - 1), "lower median of the 4 rows")
  }

  test("unseenMassEstimate: Good-Turing and Chao1 with and without doubletons") {
    val docs = Seq(
      (0L, "a a b c", "s1"),   // N=4 D=3 N1=2 N2=1 -> GT 500000, chao1 3+4/2=5
      (1L, "a b", "s2")        // N=2 D=2 N1=2 N2=0 -> chao1 2 + 2*1/2 = 3
    ).toDF("doc_id", "text", "source")
    val r = TextAnalysis.unseenMassEstimate(docs, "text", "source")
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4),
          x.getLong(5), x.getLong(6)))).toMap
    assert(r("s1") == ((4L, 3L, 2L, 1L, 500000L, 5L)))
    assert(r("s2") == ((2L, 2L, 2L, 0L, 1000000L, 3L)))
  }

  test("ruleGateCensus: each rule fires alone where planted, pass-all is exact") {
    val docs = Seq(
      // all five rules pass: 5 distinct tokens, mwl 3800, top share 200,
      // stopwords {the, a}
      (0L, "maple acorn birch the a", "s1"),
      // only the stopword floor fails (one stopword)
      (1L, "maple acorn birch cedar the", "s2"),
      // word length (2333), top-word share (666) fail; distinct 333 passes
      (2L, "the the the the a a", "s3")
    ).toDF("doc_id", "text", "source")
    val r = TextAnalysis.ruleGateCensus(docs, "doc_id", "text", "source",
      minTokens = 3, maxTokens = 10)
      .collect().map(x => x.getString(0) -> x.toSeq.drop(1)).toMap
    assert(r("s1") == Seq(1L, 0L, 0L, 0L, 0L, 0L, 1L, 1000000L))
    assert(r("s2") == Seq(1L, 0L, 0L, 0L, 0L, 1L, 0L, 0L))
    assert(r("s3") == Seq(1L, 0L, 1L, 1L, 0L, 0L, 0L, 0L))
  }
}

class MultimodalSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("patchGrid: partitions every pixel exactly once; hand-computed corner and edge patches") {
    // doc 1: w = 8+1%9 = 9, h = 8+1%7 = 9 → 3×3 patch grid with 1-wide
    // edge cells; pixel = (31 + 7x + 13y) mod 256, all < 256 in patch (0,0)
    val media = operators.Multimodal.renderImageTable(spark,
      Seq(Tuple1(1L)).toDF("doc_id"))
    val r = operators.Multimodal.patchGrid(spark, media, p = 4).collect()
      .map(x => (x.patch_y, x.patch_x) -> ((x.n_pixels, x.sum_intensity)))
      .toMap
    assert(r.size == 9, "9×9 image under p=4 → 3×3 patches")
    // full interior patch: Σ_{x,y∈0..3}(31+7x+13y) = 496+168+312 = 976
    assert(r((0, 0)) == ((16L, 976L)))
    // bottom-right corner: single pixel (8,8) = 31+56+104 = 191
    assert(r((2, 2)) == ((1L, 191L)))
    // partition property: pixel counts sum to w·h and intensity sums to
    // the independently-decoded whole-image gray_sum
    assert(r.values.map(_._1).sum == 81L)
    val total = operators.Multimodal.extractFeatures(spark, media)
      .collect().head.gray_sum
    assert(r.values.map(_._2).sum == total)
  }

  test("bigramAssociation: integer PMI-order scores, hand-computed") {
    // docs: "a b a b" → (a,b),(b,a),(a,b); "a b c" → (a,b),(b,c)
    // n_ab: (a,b)=3 (b,a)=1 (b,c)=1; n_a: a=3 b=2; n_b: b=3 a=1 c=1; N2=5
    // score·1000: (a,b)=3·5·1000/(3·3)=1666, (b,a)=1·5·1000/(2·1)=2500,
    // (b,c)=2500 — tie broken by bigram string
    val d = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val r = TextAnalysis.bigramAssociation(d, "text", minCount = 1L, k = 10,
      scale = 1000L).collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq(("b a", 1L, 2500L), ("b c", 1L, 2500L), ("a b", 3L, 1666L)))
  }

  test("extractFeatures round-trips the real PNG codec (decode∘encode = identity)") {
    val docs = Seq((7L, "abc", "en", "src1", 3L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val f = Multimodal.extractFeatures(spark, Multimodal.renderImageTable(spark, docs))
      .collect().head
    val (w, h) = (Multimodal.imgWidth(7L), Multimodal.imgHeight(7L))
    val expect = (for (y <- 0 until h; x <- 0 until w)
      yield (7L * 31 + 7 * x + 13 * y) % 256).sum
    assert(f.doc_id == 7L)
    assert(f.format == "png")
    assert((f.width, f.height) == (w, h))
    assert(f.gray_sum == expect)
  }

  test("gradientEnergy: decoded PNG matches the pixel-formula total variation") {
    // recompute the expected TV directly from the synthetic pattern
    val id = 5L
    val (w, h) = (Multimodal.imgWidth(id), Multimodal.imgHeight(id))
    def p(x: Int, y: Int): Int = ((id * 31 + 7L * x + 13L * y) % 256).toInt
    var expected = 0L
    for (y <- 0 until h; x <- 0 until w) {
      if (x + 1 < w) expected += math.abs(p(x + 1, y) - p(x, y))
      if (y + 1 < h) expected += math.abs(p(x, y + 1) - p(x, y))
    }
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.renderPng(id, 0)))
    assert(Multimodal.gradientEnergy(img) == expected)
  }

  test("decodeImage fails loudly on a non-image payload") {
    val e = intercept[Exception](Multimodal.decodeImage("not a png".getBytes("UTF-8")))
    assert(e.getMessage.contains("decodable"))
  }

  test("extractAudioFeatures round-trips the real WAV codec (decode∘encode = identity)") {
    val docs = Seq((7L, "abc", "en", "src1", 3L), (40L, "d", "en", "src1", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Multimodal.extractAudioFeatures(
        spark, Multimodal.renderAudioTable(spark, docs))
      .collect().map(f => f.doc_id -> f).toMap
    for (id <- Seq(7L, 40L)) {
      val n = Multimodal.audioSamples(id)
      val vals = (0 until n).map(t => math.abs(Multimodal.sampleVal(id, t)))
      val f = out(id)
      assert(f.sample_rate == 8000)
      assert(f.n_samples == n.toLong)
      assert(f.sum_abs == vals.map(_.toLong).sum)
      assert(f.peak == vals.max)
    }
  }

  test("decodeWav fails loudly on a non-audio payload") {
    assertThrows[Exception](Multimodal.decodeWav("not a wav".getBytes("UTF-8")))
  }

  test("sampleVal covers the signed 16-bit range and matches the decoded bytes") {
    // doc 0: samples 7t mod 65536 − 32768 — includes the negative half;
    // the decode path must sign-extend correctly
    val (_, n, sumAbs, peak) = Multimodal.decodeWav(Multimodal.renderWav(0L))
    val vals = (0 until Multimodal.audioSamples(0L)).map(t => Multimodal.sampleVal(0L, t))
    assert(vals.exists(_ < 0))
    assert(n == vals.size.toLong)
    assert(sumAbs == vals.map(v => math.abs(v).toLong).sum)
    assert(peak == vals.map(math.abs).max)
  }

  test("binaryFile ingest equals the payload-column pipeline on the same docs") {
    val docs = Seq((3L, "x", "en", "s", 1L), (11L, "y", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_png_test").toString
    Multimodal.writeImageFiles(spark, docs, dir)
    val viaFiles = Multimodal.ingestImageDir(spark, dir).collect()
      .map(f => (f.doc_id, f.width, f.height, f.gray_sum)).sortBy(_._1).toSeq
    val viaTable = Multimodal.extractFeatures(
      spark, Multimodal.renderImageTable(spark, docs)).collect()
      .map(f => (f.doc_id, f.width, f.height, f.gray_sum)).sortBy(_._1).toSeq
    assert(viaFiles == viaTable && viaFiles.size == 2)
  }

  private def hamming(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)

  private def dHashOf(bytes: Array[Byte]): (Long, Long) =
    Multimodal.dHash64(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes)))

  test("dHash perturbation bound: one-pixel plant flips at most 3 bits, every doc") {
    for (id <- 0L until 120L) {
      val d = hamming(dHashOf(Multimodal.renderDHashPng(id)),
        dHashOf(Multimodal.renderPerturbedPng(id)))
      assert(d <= 3, s"doc $id: planted variant at Hamming $d > 3")
    }
  }

  test("perceptualNearDupPairs: banded join equals brute force (zero false negatives)") {
    val docs = (0L until 250L).map(i => (i, "t", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.renderImageTableWithVariants(spark, docs, plantMod = 50L)
    val hashes = Multimodal.perceptualHashes(spark, media)
    val got = Multimodal.perceptualNearDupPairs(hashes.toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val hs = hashes.collect().map(h => (h.img_id, (h.h1, h.h2)))
    val brute = (for {
      (ia, ha) <- hs; (ib, hb) <- hs if ia < ib
      d = hamming(ha, hb) if d <= 3
    } yield (ia, ib, d)).toSet
    assert(got == brute)
    // every planted pair surfaces (the ≤3-flip bound makes this certain)
    for (id <- 0L until 250L by 50L)
      assert(got.exists(p => p._1 == id && p._2 == id + 1000000000L),
        s"planted pair for doc $id missing")
  }

  test("extractClippingRuns: run fold matches the hand-computed loud structure") {
    val media = Multimodal.renderAudioTable(spark,
      Seq((11L, "t", "en", "s", 1L)).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val f = Multimodal.extractClippingRuns(spark, media).collect().head
    val n = Multimodal.audioSamples(11L)
    val loud = (0 until n).map(t => math.abs(Multimodal.sampleVal(11L, t)) >= 30000)
    val runs = loud.foldLeft(List.empty[Int]) {
      case (acc, true) if acc.nonEmpty && acc.head > 0 => (acc.head + 1) :: acc.tail
      case (acc, true) => 1 :: acc
      case (acc, false) => 0 :: acc
    }.filter(_ > 0)
    assert(f.n_samples == n.toLong)
    assert(f.n_clipped == loud.count(identity).toLong)
    assert(f.n_runs == runs.length.toLong)
    assert(f.longest_run == (if (runs.isEmpty) 0L else runs.max.toLong))
    assert(f.clipped_ppm == loud.count(identity).toLong * 1000000L / n)
  }

  test("extractBorderFeatures: detected bars equal the planted letterbox geometry") {
    val docs = Seq(1L, 5L, 7L).map(id => (id, "t", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.renderLetterboxTable(spark, docs)
    val got = Multimodal.extractBorderFeatures(spark, media).collect()
      .map(b => b.doc_id -> b).toMap
    for (id <- Seq(1L, 5L, 7L)) {
      val b = got(id)
      assert(b.width == Multimodal.imgWidth(id) && b.height == Multimodal.imgHeight(id))
      assert(b.top_border == Multimodal.letterboxTop(id),
        s"doc $id top: ${b.top_border}")
      assert(b.bottom_border == Multimodal.letterboxBottom(id),
        s"doc $id bottom: ${b.bottom_border}")
      // the interior gradient (7x step) keeps columns non-uniform
      assert(b.left_border == 0 && b.right_border == 0)
    }
  }

}
