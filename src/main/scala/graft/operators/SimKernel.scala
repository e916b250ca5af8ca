package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Trigrams

/**
 * Broadcast-kernel fast path for the similarity join — the Spark analogue of
 * the reference's `sparse_dot_topn` Gustavson kernel with a dense per-row
 * accumulator (/root/reference/src/cossim.rs:62-141): tokenize the (small)
 * RIGHT side once, broadcast its inverted index as primitive arrays, and scan
 * the partitioned LEFT side with a reusable dense accumulator per task.
 *
 * Results are IDENTICAL to [[SimJoin.keyedPairs]] with strategy="direct"
 * (same score arithmetic `dot / (√nl·√nr)` in Double, same
 * (sim desc, right-id asc) tie-break — pinned by the parity spec). Use when
 * the right side fits comfortably in executor memory (≲ a few million rows);
 * the relational plan remains the general-scale path.
 *
 * This mirrors the reference's "parallelize left, replicate right" driver
 * (ops 5+11 in SURVEY §2.1) with Spark partitions in place of rayon threads.
 */
object SimKernel {

  /** Right-side inverted index in primitive form (broadcast payload). */
  private final case class RightIndex(
      ids: Array[Long],            // dense right index -> caller id
      nTokens: Array[Int],         // dense right index -> |tokens|
      postings: Array[Array[Int]]) // token id -> dense right indexes (ascending)

  private def buildIndex(right: DataFrame, rightId: String, rightKey: String,
      maxTokenFrequency: Long = 0L): RightIndex = {
    // Tokenize DISTRIBUTED (executors do the string work); the driver collects
    // only (id, compact token-id array) pairs and assembles the postings —
    // never raw key strings. Dense index order = collect order; results don't
    // depend on it (output is keyed by real ids and tie-broken by real id).
    val tokenized: Array[(Long, Array[Int])] = right
      .select(col(rightId).cast("long"), col(rightKey).cast("string"))
      .rdd.flatMap { r =>
        if (r.isNullAt(0) || r.isNullAt(1)) None
        else {
          val toks = Trigrams.tokenIds(r.getString(1))
          if (toks.isEmpty) None else Some((r.getLong(0), toks))
        }
      }.collect()
    val ids = new Array[Long](tokenized.length)
    val nTok = new Array[Int](tokenized.length)
    val builders = new java.util.HashMap[Integer, scala.collection.mutable.ArrayBuffer[Int]]()
    var dense = 0
    tokenized.foreach { case (id, toks) =>
      ids(dense) = id
      nTok(dense) = toks.length
      toks.foreach { t =>
        var b = builders.get(t)
        if (b == null) { b = new scala.collection.mutable.ArrayBuffer[Int](); builders.put(t, b) }
        b += dense
      }
      dense += 1
    }
    val postings = new Array[Array[Int]](Trigrams.VocabSize)
    builders.forEach((t, b) => postings(t) = b.toArray)
    // maxTokenFrequency parity with the relational plan's skew guard: drop
    // tokens whose right posting list exceeds the cap (norms stay full-length,
    // matching scoredPairs which filters candidates but not __nr).
    if (maxTokenFrequency > 0L) {
      var t = 0
      while (t < postings.length) {
        if (postings(t) != null && postings(t).length > maxTokenFrequency) postings(t) = null
        t += 1
      }
    }
    RightIndex(ids, nTok, postings)
  }

  /**
   * Top-n similarity pairs, kernel edition. Output (outLeft: caller left-id
   * type passed through as Long cast, outRight: Long, outSim: Double) — same
   * contract as keyedPairs with Long ids.
   */
  def keyedPairs(
      left: DataFrame, leftId: String, leftKey: String,
      right: DataFrame, rightId: String, rightKey: String,
      opts: SimJoinOptions = SimJoinOptions(),
      outLeft: String = "row", outRight: String = "col", outSim: String = "sim"): DataFrame = {
    val spark = left.sparkSession
    val l2 = opts.normalization == "l2"
    val topN = opts.topN
    val bc = spark.sparkContext.broadcast(
      buildIndex(right, rightId, rightKey, opts.maxTokenFrequency))
    val outSchema = StructType(Seq(
      StructField(outLeft, LongType), StructField(outRight, LongType),
      StructField(outSim, DoubleType)))
    val slim = left.select(col(leftId).cast("long"), col(leftKey).cast("string"))
    val rdd = slim.rdd.mapPartitions { rows =>
      val idx = bc.value
      val nRight = idx.ids.length
      // dense accumulator + touched list, reused across rows (the reference's
      // per-thread dense score buffer, cossim.rs:89)
      val acc = new Array[Int](nRight)
      val touched = new Array[Int](nRight)
      rows.flatMap { r =>
        if (r.isNullAt(0) || r.isNullAt(1)) Iterator.empty
        else {
          val lid = r.getLong(0)
          val toks = Trigrams.tokenIds(r.getString(1))
          if (toks.isEmpty) Iterator.empty
          else {
            var nTouched = 0
            var ti = 0
            while (ti < toks.length) {
              val posting = idx.postings(toks(ti))
              if (posting != null) {
                var pi = 0
                while (pi < posting.length) {
                  val d = posting(pi)
                  if (acc(d) == 0) { touched(nTouched) = d; nTouched += 1 }
                  acc(d) += 1
                  pi += 1
                }
              }
              ti += 1
            }
            // score candidates; exact same Double arithmetic as SimJoin.simExpr
            val nl = math.sqrt(toks.length.toDouble)
            val cand = new Array[(Double, Long)](nTouched)
            var ci = 0
            while (ci < nTouched) {
              val d = touched(ci)
              val sim =
                if (l2) acc(d).toDouble / (nl * math.sqrt(idx.nTokens(d).toDouble))
                else acc(d).toDouble
              cand(ci) = (sim, idx.ids(d))
              acc(d) = 0 // reset for the next row
              ci += 1
            }
            // top-n by (sim desc, right id asc) — the deterministic tie-break
            val ord = Ordering.by[(Double, Long), (Double, Long)](c => (-c._1, c._2))
            cand.sorted(ord).iterator.take(topN).map { case (sim, rid) => Row(lid, rid, sim) }
          }
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
