package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.SimSearch

/** Model properties for the shared greedy-MMR kernel
  * ([[SimSearch.mmrSelect]], used by `topKMmr` and `clusterExemplars`):
  * checked against an independently-written quadratic reference. */
object MmrProps extends Properties("MmrSelect") {

  private val candGen: Gen[Array[(Long, Double, Array[Float])]] = for {
    n <- Gen.choose(1, 12)
    ids <- Gen.pick(n, 0L until 50L)
    rels <- Gen.listOfN(n, Gen.chooseNum(-1.0, 1.0))
    vecs <- Gen.listOfN(n, Gen.listOfN(3, Gen.chooseNum(0.1f, 2.0f)))
  } yield ids.toArray.sorted.lazyZip(rels).lazyZip(vecs.map(_.toArray))
    .map((id, r, v) => (id, r, v)).toArray

  private def cosRef(a: Array[Float], b: Array[Float]): Double = {
    val dot = a.indices.map(i => a(i).toDouble * b(i).toDouble).sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    dot / (na * nb)
  }

  /** Straightforward reference: recompute the argmax from scratch each step
    * over a Set-based remaining pool (different data structures and
    * traversal order than the kernel's boolean-mask scan). */
  private def mmrRef(
      cands: Array[(Long, Double, Array[Float])], k: Int,
      lambda: Double): Seq[(Long, Double, Int)] = {
    var remaining = cands.map(c => c._1 -> c).toMap
    var picked = Vector.empty[(Long, Double, Int)]
    var pickedVecs = Vector.empty[Array[Float]]
    for (rank <- 1 to math.min(k, cands.length)) {
      val scoredPool = remaining.values.toSeq.map { case (id, rel, v) =>
        val score =
          if (rank == 1) rel
          else lambda * rel - (1.0 - lambda) * pickedVecs.map(cosRef(v, _)).max
        (id, score, v)
      }
      val (bid, bscore, bvec) =
        scoredPool.minBy { case (id, s, _) => (-s, id) }
      picked :+= ((bid, bscore, rank))
      pickedVecs :+= bvec
      remaining -= bid
    }
    picked
  }

  property("mmrSelect equals the quadratic reference model") =
    forAll(candGen, Gen.choose(1, 6), Gen.oneOf(0.0, 0.3, 0.5, 1.0)) {
      (cands, k, lambda) =>
        SimSearch.mmrSelect(cands, k, lambda) == mmrRef(cands, k, lambda)
    }

  property("rank 1 is the (rel desc, id asc) argmax and k bounds the output") =
    forAll(candGen, Gen.choose(1, 6)) { (cands, k) =>
      val out = SimSearch.mmrSelect(cands, k, 0.5)
      val top = cands.minBy { case (id, r, _) => (-r, id) }
      out.head == ((top._1, top._2, 1)) &&
        out.length == math.min(k, cands.length) &&
        out.map(_._1).distinct.length == out.length
    }
}
