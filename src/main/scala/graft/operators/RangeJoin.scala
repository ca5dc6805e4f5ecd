package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Interval (range) join — point-in-interval matching, an operator Spark has
 * no native physical strategy for: a raw `p BETWEEN s AND e` theta-join
 * plans as BroadcastNestedLoopJoin (quadratic, and the stream side cannot
 * shuffle-partition).
 *
 * Composed equi-bucketization instead: explode each interval into the
 * coarse time buckets it overlaps, equi-join facts to intervals on the
 * bucket, then apply the exact range predicate as a residual filter. The
 * join becomes a plain hash/sort-merge equi-join that partitions on the
 * bucket key — linear shuffle, AQE-eligible, skew-splittable. Bucket
 * granularity trades replication (intervals spanning many buckets) against
 * join selectivity; callers pick it to match typical interval width.
 */
object RangeJoin {

  /**
   * Join `facts` rows (timestamp `pointCol`) to `intervals` rows
   * ([`startCol`, `endCol`] inclusive) — output has all columns of both.
   * `bucket` is a `date_trunc` unit (month/week/day/hour).
   */
  def pointInInterval(facts: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucket: String = "month"): DataFrame = {
    val fb = facts.withColumn("__bucket", date_trunc(bucket, col(pointCol)))
    val ib = intervals.withColumn("__bucket",
      explode(sequence(
        date_trunc(bucket, col(startCol)),
        date_trunc(bucket, col(endCol)),
        expr(s"INTERVAL 1 $bucket"))))
    fb.join(ib, "__bucket")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }
}
