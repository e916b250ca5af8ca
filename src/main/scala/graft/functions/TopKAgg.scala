package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * Bounded per-key top-k as a typed [[Aggregator]] — SURVEY §7.4's named
 * alternative to the `row_number` window (`WindowGroupLimit`) for per-row
 * top-n selection: the aggregation path computes PARTIAL top-k map-side
 * (each partition's candidates collapse to ≤ k before the shuffle — Spark's
 * partial+final aggregation, ≙ the reference's `topn_from_csr_batches`
 * merge, /root/reference/src/csr.rs:213-269), so the exchange carries
 * k·keys·partitions rows instead of every candidate. Use when candidates per
 * key ≫ k and the window's sort-the-world shuffle dominates; results are
 * IDENTICAL to the window path (same `(score desc, id asc)` order and
 * tie-break — spec-pinned).
 *
 * The buffer is a plain sorted Seq (insertion into ≤ k elements): for the
 * small k of top-n joins (10-100) this beats a heap's constant factor, and
 * the merge is a bounded sorted-merge of two ≤ k lists.
 */
object TopKAgg {

  /** Aggregator: (id, score) rows → the ≤ k (id, score) pairs with the
    * highest score, ordered (score desc, id asc). */
  class TopK(k: Int) extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {
    require(k > 0, s"k must be positive, got $k")
    // ordering: better = (higher score, then smaller id)
    private def lt(a: (Long, Double), b: (Long, Double)): Boolean =
      a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)
    override def zero: Seq[(Long, Double)] = Vector.empty
    override def reduce(buf: Seq[(Long, Double)], x: (Long, Double)): Seq[(Long, Double)] =
      insert(buf, x)
    override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] =
      b.foldLeft(a)(insert)
    override def finish(buf: Seq[(Long, Double)]): Seq[(Long, Double)] = buf
    private def insert(buf: Seq[(Long, Double)], x: (Long, Double)): Seq[(Long, Double)] = {
      if (buf.length == k && !lt(x, buf.last)) buf
      else {
        val i = buf.indexWhere(e => lt(x, e)) match { case -1 => buf.length; case j => j }
        (buf.take(i) :+ x) ++ buf.drop(i).take(k - i - 1)
      }
    }
    override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
      ExpressionEncoder[Seq[(Long, Double)]]()
    override def outputEncoder: Encoder[Seq[(Long, Double)]] =
      ExpressionEncoder[Seq[(Long, Double)]]()
  }

  /**
   * Per-key top-k of `(idCol, scoreCol)` rows via the typed aggregation path.
   * Output: (keyCol, idCol, scoreCol, rank) with rank 1..k in
   * (score desc, id asc) order — the same contract as the window form.
   * Key/id must be integral (cast to Long), score numeric (cast to Double).
   */
  def perKey(
      df: DataFrame, keyCol: String, idCol: String, scoreCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.select(col(keyCol).cast("long"), col(idCol).cast("long"),
        col(scoreCol).cast("double"))
      .as[(Long, Long, Double)]
    ds.groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(new TopK(k).toColumn.name("topk"))
      .flatMap { case (key, top) =>
        top.iterator.zipWithIndex.map { case ((id, score), i) => (key, id, score, (i + 1).toLong) }
      }
      .toDF(keyCol, idCol, scoreCol, "rank")
  }
}
