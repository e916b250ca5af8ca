package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/**
 * Typed `Dataset[T]` facade over [[SimJoin]] — for pipelines that carry
 * case-class rows and want compile-time field access instead of Column
 * strings. Each input row keeps its full typed value through the join; the
 * result is a typed `(left, right, sim)` per retained pair.
 *
 * Implementation: dense ids via `zipWithIndex` on each side (physical order is
 * irrelevant — ids only key the join-back, and both consumers see one id
 * assignment via the lazy localCheckpoint), key extraction via the provided
 * function (arbitrary Scala, not restricted to a column expression), then the
 * relational [[SimJoin.keyedPairs]] plan and two join-backs. The extra
 * shuffles per join-back are the price of full-row fidelity; use keyedPairs
 * directly when rows already carry unique ids.
 */
object TypedSimJoin {

  /**
   * Top-n most-similar right rows per left row by trigram similarity of the
   * extracted keys (same semantics and tie-break as [[SimJoin.keyedPairs]]).
   */
  def topN[L, R](
      left: Dataset[L], leftKey: L => String,
      right: Dataset[R], rightKey: R => String,
      opts: SimJoinOptions = SimJoinOptions())(
      implicit le: Encoder[L], re: Encoder[R]): Dataset[(L, R, Double)] = {
    val spark = left.sparkSession
    val lkEnc: Encoder[(Long, L, String)] =
      Encoders.tuple(Encoders.scalaLong, le, Encoders.STRING)
    val rkEnc: Encoder[(Long, R, String)] =
      Encoders.tuple(Encoders.scalaLong, re, Encoders.STRING)
    val li = spark.createDataset(
      left.rdd.zipWithIndex().map { case (l, i) => (i, l, leftKey(l)) })(lkEnc)
      .toDF("__lid", "__lrow", "__lkey").localCheckpoint(eager = false)
    val ri = spark.createDataset(
      right.rdd.zipWithIndex().map { case (r, i) => (i, r, rightKey(r)) })(rkEnc)
      .toDF("__rid", "__rrow", "__rkey").localCheckpoint(eager = false)
    val pairs = SimJoin.keyedPairs(li, "__lid", "__lkey", ri, "__rid", "__rkey", opts,
      outLeft = "__lid", outRight = "__rid", outSim = "sim")
    val outEnc: Encoder[(L, R, Double)] =
      Encoders.tuple(le, re, Encoders.scalaDouble)
    pairs
      .join(li.select(col("__lid"), col("__lrow")), "__lid")
      .join(ri.select(col("__rid"), col("__rrow")), "__rid")
      .select(col("__lrow").as("_1"), col("__rrow").as("_2"), col("sim").as("_3"))
      .as[(L, R, Double)](outEnc)
  }
}
