package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  test("custom expressions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .createOrReplaceTempView("emb")
    val self = spark.sql(
      "SELECT vec_id, cosine_similarity(embedding, embedding) AS c FROM emb ORDER BY vec_id LIMIT 5")
      .collect().map(_.getDouble(1))
    assert(self.forall(c => math.abs(c - 1.0) < 1e-9))

    sources.Tables(spark, "/root/testdata/sf0.001", "documents")
      .createOrReplaceTempView("docs")
    val sig = spark.sql(
      """SELECT doc_id, minhash_signature(xxhash64(w), 8, 1, 2) AS sig
        |FROM (SELECT doc_id, explode(split(text, ' ')) AS w FROM docs)
        |GROUP BY doc_id ORDER BY doc_id LIMIT 3""".stripMargin)
      .collect().map(_.getSeq[Long](1))
    assert(sig.forall(_.length == 8))
    assert(sig.forall(_.forall(v => v >= 0 && v < 2147483647L)))
  }

  test("round-2 expressions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    sources.Tables(spark, "/root/testdata/sf0.001", "documents")
      .createOrReplaceTempView("docs")
    // shingle_hashes: n words → n-2 trigram hashes
    val sh = spark.sql(
      """SELECT size(split(text, ' ')) AS nw, size(shingle_hashes(text, 3)) AS ns
        |FROM docs ORDER BY doc_id LIMIT 5""".stripMargin)
      .collect()
    assert(sh.forall(r => r.getInt(1) == math.max(r.getInt(0) - 2, 0)))
    // simhash_signature aggregates to one 64-bit fingerprint per doc
    val fps = spark.sql(
      """SELECT doc_id, simhash_signature(xxhash64(w)) AS fp
        |FROM (SELECT doc_id, explode(array_distinct(split(text, ' '))) AS w FROM docs)
        |GROUP BY doc_id ORDER BY doc_id LIMIT 3""".stripMargin)
      .collect().map(_.getLong(1))
    assert(fps.distinct.length == 3)
    // hyperplane_band_keys: b band keys, each within r bits
    sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .createOrReplaceTempView("emb")
    val keys = spark.sql(
      "SELECT hyperplane_band_keys(embedding, 16, 12) AS k FROM emb ORDER BY vec_id LIMIT 5")
      .collect().map(_.getSeq[Long](0))
    assert(keys.forall(k => k.length == 16 && k.forall(v => v >= 0 && v < (1L << 12))))
  }

  test("damerau_levenshtein is callable from SQL and codegen matches interpreted eval") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT damerau_levenshtein('ca', 'abc') AS a,
        |       damerau_levenshtein('ab', 'ba') AS b,
        |       damerau_levenshtein(NULL, 'x') AS c""".stripMargin).collect().head
    assert(r.getInt(0) == 2 && r.getInt(1) == 1 && r.isNullAt(2))
    // a non-literal plan exercises the doGenCode path row by row
    sources.Tables(spark, "/root/testdata/sf0.001", "part")
      .createOrReplaceTempView("part_dl")
    val viaCol = spark.sql(
      "SELECT p_partkey, damerau_levenshtein(p_name, reverse(p_name)) AS d FROM part_dl ORDER BY p_partkey LIMIT 20")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expected = sources.Tables(spark, "/root/testdata/sf0.001", "part")
      .orderBy("p_partkey").limit(20)
      .collect().map(r => r.getLong(0) -> {
        val n = r.getString(1)
        graft.functions.DamerauLevenshtein.compute(
          org.apache.spark.unsafe.types.UTF8String.fromString(n),
          org.apache.spark.unsafe.types.UTF8String.fromString(n.reverse))
      }).toMap
    assert(viaCol == expected)
  }
}
