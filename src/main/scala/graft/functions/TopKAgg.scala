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

  /** [[TopK]] variant that also DEDUPLICATES by id: an id already in the
    * buffer is skipped on insert/merge.
    *
    * ==WARNING: exactness precondition==
    * EXACT only when every copy of an id carries the SAME score (then the
    * global top-k over distinct ids equals the merge of per-partition
    * distinct top-k buffers) — the situation of
    * [[graft.operators.Dedup.knnGraph]], where a candidate pair colliding in
    * several LSH tables scores identically (deterministic cosine, rounded)
    * and the former `dropDuplicates` exchange can instead fold into this
    * aggregation's map-side partials. Feeding copies with DIFFERING scores
    * (non-deterministic scoring, unrounded floats recomputed per collision)
    * makes the result order-dependent and silently approximate — which copy
    * survives depends on partitioning. The aggregator therefore VERIFIES the
    * precondition on every insert whose id is still in the buffer and throws
    * [[IllegalStateException]] on a score mismatch. The check is free (the
    * dedup scan already visits the entry) but BEST-EFFORT: a mismatching
    * copy arriving after its id was evicted from a ≤ k partial buffer
    * escapes it — it catches the systematic non-determinism a wrong caller
    * would produce, not every instance. */
  class TopKDistinct(k: Int) extends TopK(k) {
    override def reduce(buf: Seq[(Long, Double)], x: (Long, Double)): Seq[(Long, Double)] =
      buf.find(_._1 == x._1) match {
        case Some(e) =>
          // numeric == admits -0.0 vs 0.0 (bitwise-distinct but numerically
          // equal — a legal pair of copies); Double.compare admits equal NaNs
          // (numerically incomparable but the same value). Either suffices.
          if (!(e._2 == x._2 || java.lang.Double.compare(e._2, x._2) == 0))
            throw new IllegalStateException(
              s"TopKDistinct precondition violated: id ${x._1} seen with " +
                s"scores ${e._2} and ${x._2} — distinct-in-buffer top-k is " +
                "exact only when every copy of an id carries the same score " +
                "(use dropDuplicates + TopK, or make the score deterministic)")
          buf
        case None => super.reduce(buf, x)
      }
    override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] =
      b.foldLeft(a)(reduce)
  }

  /**
   * Per-key top-k of `(idCol, scoreCol)` rows via the typed aggregation path.
   * Output: (keyCol, idCol, scoreCol, rank) with rank 1..k in
   * (score desc, id asc) order — the same contract as the window form.
   * Key/id must be integral (cast to Long), score numeric (cast to Double).
   */
  def perKey(
      df: DataFrame, keyCol: String, idCol: String, scoreCol: String, k: Int): DataFrame =
    perKeyWith(df, keyCol, idCol, scoreCol, new TopK(k))

  /** [[perKey]] over the [[TopKDistinct]] aggregator — per-key top-k of
    * DISTINCT ids, exact under the equal-score-per-id precondition documented
    * on the aggregator. Fuses a `dropDuplicates(key, id)` + rank window into
    * ONE aggregation: one exchange carrying ≤ k rows per (key, partition)
    * instead of a candidate-sized dedup shuffle followed by a sort. */
  def perKeyDistinct(
      df: DataFrame, keyCol: String, idCol: String, scoreCol: String, k: Int): DataFrame =
    perKeyWith(df, keyCol, idCol, scoreCol, new TopKDistinct(k))

  /** [[perKey]] for a STRING key (e.g. a term column) — same contract,
    * same bounded map-side partials; key stays a string through the
    * aggregation. */
  def perKeyStr(
      df: DataFrame, keyCol: String, idCol: String, scoreCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.select(col(keyCol).cast("string"), col(idCol).cast("long"),
        col(scoreCol).cast("double"))
      .as[(String, Long, Double)]
    ds.groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(new TopK(k).toColumn.name("topk"))
      .flatMap { case (key, top) =>
        top.iterator.zipWithIndex.map { case ((id, score), i) => (key, id, score, (i + 1).toLong) }
      }
      .toDF(keyCol, idCol, scoreCol, "rank")
  }

  private def perKeyWith(
      df: DataFrame, keyCol: String, idCol: String, scoreCol: String,
      agg: TopK): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.select(col(keyCol).cast("long"), col(idCol).cast("long"),
        col(scoreCol).cast("double"))
      .as[(Long, Long, Double)]
    ds.groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.toColumn.name("topk"))
      .flatMap { case (key, top) =>
        top.iterator.zipWithIndex.map { case ((id, score), i) => (key, id, score, (i + 1).toLong) }
      }
      .toDF(keyCol, idCol, scoreCol, "rank")
  }
}
