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

  /**
   * INTERVAL-overlap join: pairs (a, b) with `a.s ≤ b.e AND b.s ≤ a.e`
   * (inclusive overlap), bucketed exactly like [[pointInInterval]]. Both
   * sides explode into their covered buckets; a pair overlapping several
   * shared buckets is emitted ONCE via the first-shared-bucket rule — the
   * pair is kept only in bucket `max(bkt(a.s), bkt(b.s))`, which both sides
   * provably cover — so no distinct/dedup exchange is needed. Same column
   * contract and fanout guard as [[pointInInterval]].
   */
  def intervalOverlap(
      left: DataFrame, leftStart: String, leftEnd: String,
      right: DataFrame, rightStart: String, rightEnd: String,
      bucketWidth: Long, keyCols: Seq[String] = Nil,
      maxBucketsPerInterval: Long = 10000L): DataFrame = {
    require(bucketWidth > 0L, s"bucketWidth must be positive, got $bucketWidth")
    val overlap = (left.columns.toSet intersect right.columns.toSet) -- keyCols
    require(overlap.isEmpty,
      s"non-key column names must be disjoint, both sides have: ${overlap.toSeq.sorted}")
    def bkt(c: org.apache.spark.sql.Column) =
      floor(c.cast("double") / lit(bucketWidth.toDouble)).cast("long")
    def explodeSide(df: DataFrame, sCol: String, eCol: String): DataFrame = df
      .filter(col(sCol).isNotNull && col(eCol).isNotNull && col(sCol) <= col(eCol))
      .withColumn("__nb", bkt(col(eCol)) - bkt(col(sCol)) + 1)
      .withColumn("__bkt", explode(sequence(bkt(col(sCol)),
        when(col("__nb") <= maxBucketsPerInterval, bkt(col(eCol)))
          .otherwise(raise_error(concat(
            lit(s"interval spans more than $maxBucketsPerInterval buckets of width " +
              s"$bucketWidth: ["), col(sCol), lit(", "), col(eCol),
            lit("] — raise bucketWidth or cap the interval")))))))
      .drop("__nb")
    val lb = explodeSide(left, leftStart, leftEnd)
    val rb = explodeSide(right, rightStart, rightEnd)
    lb.join(rb, (keyCols :+ "__bkt").toSeq)
      .filter(col(leftStart) <= col(rightEnd) && col(rightStart) <= col(leftEnd))
      .filter(col("__bkt") === greatest(bkt(col(leftStart)), bkt(col(rightStart))))
      .drop("__bkt")
  }
}
