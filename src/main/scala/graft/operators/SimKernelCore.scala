package graft.operators

import graft.functions.Trigrams

/**
 * Engine-internal core of the broadcast similarity kernel, shared by the
 * DataFrame-API face ([[SimKernel.keyedPairs]]) and the physical-operator
 * face ([[graft.plans.SimKernelExec]]): the right-side inverted index in
 * primitive-array form (the broadcast payload) and the dense-accumulator
 * scan. One implementation, two planner entry points — the two faces are
 * result-identical by construction.
 */
private[graft] object SimKernelCore {

  /** Right-side inverted index in primitive form (broadcast payload). */
  final case class RightIndex(
      ids: Array[Long],            // dense right index -> caller id
      nTokens: Array[Int],         // dense right index -> |tokens|
      postings: Array[Array[Int]]) // token id -> dense right indexes (ascending)

  /** Assemble the index from collected (id, token-ids) pairs; posting lists
    * longer than `maxTokenFrequency` (when > 0) are dropped — the same skew
    * guard as the relational plan's posting cap (norms stay full-length). */
  def buildIndex(
      tokenized: Array[(Long, Array[Int])], maxTokenFrequency: Long): RightIndex = {
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
   * Dense-accumulator scan over one partition's (leftId, tokens) stream:
   * per row, accumulate counts over the broadcast postings, score
   * `dot / (√nl·√nr)` (or raw count), emit top-n by (sim desc, right id asc).
   * The accumulator and touched list are allocated once per partition and
   * reused across rows (the reference kernel's per-thread buffer shape).
   */
  def scorePartition(
      rows: Iterator[(Long, Array[Int])], idx: RightIndex,
      topN: Int, l2: Boolean): Iterator[(Long, Long, Double)] = {
    val nRight = idx.ids.length
    val acc = new Array[Int](nRight)
    val touched = new Array[Int](nRight)
    rows.flatMap { case (lid, toks) =>
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
        val ord = Ordering.by[(Double, Long), (Double, Long)](c => (-c._1, c._2))
        cand.sorted(ord).iterator.take(topN).map { case (sim, rid) => (lid, rid, sim) }
      }
    }
  }
}
