package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/**
 * Global dense rank WITHOUT a partition-less window (which would funnel every
 * row through one task): `repartitionByRange` on the ordering establishes a
 * global sort across partitions, `sortWithinPartitions` orders inside each,
 * and `zipWithIndex` assigns contiguous positions with per-partition offsets
 * (one extra slim count job). With a TOTAL order (unique sort key) the rank
 * is deterministic regardless of range-boundary sampling. Shared by
 * [[SimJoin.withDenseIndex]] (positional row ids) and
 * [[CorpusStats.vocabulary]] (frequency rank).
 */
private[graft] object DenseRank {

  /**
   * Append `name` = `startAt`-based position in `order` to `df`.
   * @param failOnNullCol when set, reject rows whose value in that column is
   *        null (deterministic failure instead of a silent nulls-first rank)
   */
  def appendIndex(
      df: DataFrame, order: Seq[Column], name: String,
      startAt: Long = 0L, failOnNullCol: Option[String] = None): DataFrame = {
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val schema = sorted.schema.add(name, LongType, nullable = false)
    val checkIdx = failOnNullCol.map(c => sorted.schema.fieldIndex(c))
    val checkName = failOnNullCol.getOrElse("")
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      checkIdx.foreach { ci =>
        if (r.isNullAt(ci))
          throw new IllegalArgumentException(
            s"rank column '$checkName' contains null — every row must carry a unique non-null key")
      }
      Row.fromSeq(r.toSeq :+ (i + startAt))
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
