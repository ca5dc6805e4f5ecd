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
}
