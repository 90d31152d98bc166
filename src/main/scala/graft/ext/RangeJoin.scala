package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed point-in-interval range join.
  *
  * Spark plans a bare `p.ts BETWEEN i.start AND i.end` join (even with an
  * equi-key) as the equi-join followed by a residual filter — fine — but
  * WITHOUT an equi-key it degrades to BroadcastNestedLoopJoin, and a
  * skewed key still funnels every (point, interval) pair of that key
  * through one task. Decomposing the time axis into fixed buckets turns
  * the range predicate itself into an equi-join: intervals explode into
  * the buckets they cover (bounded by interval_len/width + 1), points
  * map to exactly one bucket, and the join runs on (key, bucket) with
  * the exact BETWEEN as a residual. Matches can't duplicate — a point
  * lives in one bucket and an interval contributes each bucket once.
  */
object RangeJoin {

  /** @param bucketWidthSec bucket size; choose ≈ the typical interval
    *   length so intervals explode into ~2 buckets.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame, key: String,
                      ptTs: String, startTs: String, endTs: String,
                      bucketWidthSec: Long): DataFrame = {
    val w = bucketWidthSec * 1000000L // micros
    val p = points.withColumn("__bucket", floor(unix_micros(col(ptTs)) / w))
    val i = intervals.withColumn("__bucket",
      explode(sequence(floor(unix_micros(col(startTs)) / w),
        floor(unix_micros(col(endTs)) / w))))
    p.join(i, Seq(key, "__bucket"))
      .filter(col(ptTs) >= col(startTs) && col(ptTs) <= col(endTs))
      .drop("__bucket")
  }
}
