package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling operators for training-data pipelines (extends the
 * key-modulo sample/shard of `Extensions` x20 with per-stratum control).
 */
object Sampling {

  /**
   * Exact stratified sampling: from every `stratumCol` group keep the same
   * fraction `num/den` of rows (ceiling), chosen by a deterministic
   * content-independent hash order (md5 of the id) — so the sample is
   * reproducible across runs AND engines, unbiased w.r.t. any data column,
   * and exactly proportional per stratum (unlike Bernoulli `sample()`,
   * whose per-stratum counts fluctuate).
   *
   * The fraction is a rational `num/den` and selection uses pure integer
   * arithmetic (`(rank-1) * den < n * num`  ⇔  rank ≤ ceil(n*num/den)) —
   * float `ceil(n * 0.1)` differs between engines when the product lands on
   * a representation boundary.
   *
   * Scale shape: one hash exchange on the stratum key, then two window
   * passes over each stratum partition (count + rank). No driver action,
   * no global sort; each stratum samples independently.
   */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      num: Int, den: Int): DataFrame = {
    require(num > 0 && den > 0 && num <= den, s"fraction $num/$den not in (0,1]")
    val byHash = Window.partitionBy(stratumCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val whole = Window.partitionBy(stratumCol)
    df.withColumn("rnk", row_number().over(byHash))
      .withColumn("n_stratum", count(lit(1)).over(whole))
      // rnk is IntegerType: widen before multiplying or (rnk-1)*den wraps
      // past ~Int.MaxValue/den rows per stratum and silently over-samples
      .filter((col("rnk").cast("long") - 1) * den < col("n_stratum") * num)
      .select(col(idCol), col(stratumCol))
  }
}
