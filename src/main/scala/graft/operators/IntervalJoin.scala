package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Point-in-interval (range) join, BUCKETED — the scale-safe form of
 * `SELECT * FROM points p JOIN intervals i ON p.t BETWEEN i.s AND i.e`.
 * OSS Spark has no range-join optimization: that predicate plans as a
 * BroadcastNestedLoopJoin (every point × every interval — quadratic work,
 * and only viable at all when one side broadcasts). Here each interval is
 * exploded into the fixed-width buckets it overlaps, each point hashes to
 * its single bucket, and a plain shuffled EQUI-join on (key..., bucket) +
 * the exact BETWEEN filter yields each containment pair exactly once — a
 * point lives in exactly one bucket, so no dedup pass is needed.
 *
 * `bucketWidth` is the scale knob: pick ≈ the typical interval length.
 * Interval explode cost = len/width + 1 rows per interval; the
 * `maxBucketsPerInterval` guard fails the job (with the offending span in
 * the message) rather than letting one open-ended interval fan out into
 * millions of rows. At 100 TB both sides shuffle once on (key, bucket) —
 * same exchange count as any equi-join — and a hot bucket is AQE's
 * skew-join problem, not a nested loop.
 *
 * Column contract: the two frames' column names must be disjoint apart from
 * `keyCols` (rename first otherwise); output = points.* ++ intervals.*
 * (minus the interval side's key copies).
 */
object IntervalJoin {

  def pointInInterval(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long, keyCols: Seq[String] = Nil,
      maxBucketsPerInterval: Long = 10000L): DataFrame = {
    require(bucketWidth > 0L, s"bucketWidth must be positive, got $bucketWidth")
    require(maxBucketsPerInterval > 0L,
      s"maxBucketsPerInterval must be positive, got $maxBucketsPerInterval")
    val overlap = (points.columns.toSet intersect intervals.columns.toSet) -- keyCols
    require(overlap.isEmpty,
      s"non-key column names must be disjoint, both sides have: ${overlap.toSeq.sorted}")
    keyCols.foreach { k =>
      require(points.columns.contains(k) && intervals.columns.contains(k),
        s"key column '$k' must exist on both sides")
    }
    def bkt(c: org.apache.spark.sql.Column) =
      floor(c.cast("double") / lit(bucketWidth.toDouble)).cast("long")
    val ib = intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(startCol) <= col(endCol))
      .withColumn("__nb", bkt(col(endCol)) - bkt(col(startCol)) + 1)
      .withColumn("__bkt", explode(sequence(bkt(col(startCol)),
        when(col("__nb") <= maxBucketsPerInterval, bkt(col(endCol)))
          .otherwise(raise_error(concat(
            lit(s"interval spans more than $maxBucketsPerInterval buckets of width " +
              s"$bucketWidth: ["), col(startCol), lit(", "), col(endCol),
            lit("] — raise bucketWidth or cap the interval")))))))
      .drop("__nb")
    val pb = points.filter(col(pointCol).isNotNull)
      .withColumn("__bkt", bkt(col(pointCol)))
    pb.join(ib, (keyCols :+ "__bkt").toSeq)
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bkt")
  }
}
