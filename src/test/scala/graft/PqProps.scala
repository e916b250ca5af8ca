package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Properties, Test => SCTest}
import org.scalacheck.Prop.forAll

import graft.operators.SimSearch

/**
 * ScalaCheck property suite for the persisted ANN-index contracts: on
 * ARBITRARY float corpora (not just the curated fixtures), the
 * encode-once/search-later paths must be bit-identical to their fused
 * counterparts, and encoding must respect the eligibility contract —
 * the properties the pointwise parity specs pin only on one shape each.
 *   - pqEncode → pqSearchEncoded ≡ fused topKPq (same model)
 *   - ivfPqEncode → ivfPqSearchEncoded ≡ fused topKIvfPq (same params)
 *   - pqEncode drops exactly the null/zero-norm/wrong-dim rows
 */
object PqProps extends Properties("PqIndex") {

  override def overrideParameters(p: SCTest.Parameters): SCTest.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("pq-props")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  // dim 4 corpora with occasional degenerate rows: nulls, zero vectors and a
  // wrong-dimension straggler — the eligibility edge cases
  private val elemGen: Gen[Float] = Gen.chooseNum(-2.0f, 2.0f)
  private val vecGen: Gen[Array[Float]] = Gen.frequency(
    (8, Gen.listOfN(4, elemGen).map(_.toArray)),
    (1, Gen.const(Array.fill(4)(0.0f))),
    (1, Gen.const(null.asInstanceOf[Array[Float]])))
  private val corpusGen: Gen[List[Array[Float]]] =
    Gen.choose(6, 24).flatMap(n => Gen.listOfN(n, vecGen))
  private val partsGen: Gen[Int] = Gen.choose(1, 4)

  private def df(vecs: List[Array[Float]], parts: Int): DataFrame = {
    val s = spark; import s.implicits._
    vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "vec")
      .repartition(math.max(1, parts)) // shrinker can step outside the Gen range
  }

  private def resultMap(out: DataFrame): Map[(Long, Long), Double] =
    out.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  property("pqSearchEncoded over pqEncode equals fused topKPq") =
    forAll(corpusGen, partsGen, Gen.choose(0, 1)) { (vecs, parts, nIters) =>
      val corpus = df(vecs, parts)
      // the seed rule filters AFTER the id-ranked LIMIT, so training fails
      // fast (documented) unless an ELIGIBLE vector sits in the seed prefix
      val hasEligible = vecs.take(4).exists(v =>
        v != null && v.length == 4 && v.exists(_ != 0.0f))
      !hasEligible || {
        val q = corpus.filter(col("id") < 4)
        val model = SimSearch.pqTrainModel(corpus, "id", "vec",
          nSub = 2, ksub = 4, nIters = nIters)
        val enc = SimSearch.pqEncode(corpus, "id", "vec", model)
        val split = resultMap(SimSearch.pqSearchEncoded(enc, "id", "codes",
          q, "id", "vec", model, 3, excludeSelf = true))
        val fused = resultMap(SimSearch.topKPq(q, "id", "vec",
          corpus, "id", "vec", 3, nSub = 2, ksub = 4, nIters = nIters,
          excludeSelf = true))
        split == fused
      }
    }

  property("ivfPqSearchEncoded over ivfPqEncode equals fused topKIvfPq") =
    forAll(corpusGen, partsGen) { (vecs, parts) =>
      val corpus = df(vecs, parts)
      // ivf seeds from the 2 smallest ids, pq from the 4 smallest (both
      // filter after the LIMIT) — guard the stricter prefix
      val hasEligible = vecs.take(2).exists(v =>
        v != null && v.length == 4 && v.exists(_ != 0.0f))
      !hasEligible || {
        val q = corpus.filter(col("id") < 4)
        val ivf = SimSearch.ivfTrainModel(corpus, "id", "vec", nList = 2, nIters = 1)
        val pq = SimSearch.pqTrainModel(corpus, "id", "vec", nSub = 2, ksub = 4, nIters = 1)
        val enc = SimSearch.ivfPqEncode(corpus, "id", "vec", ivf, pq)
        val split = resultMap(SimSearch.ivfPqSearchEncoded(enc, "id", "list", "codes",
          q, "id", "vec", ivf, pq, 3, nProbe = 2, excludeSelf = true))
        val fused = resultMap(SimSearch.topKIvfPq(q, "id", "vec",
          corpus, "id", "vec", 3, nList = 2, nProbe = 2, nIters = 1,
          nSub = 2, ksub = 4, pqIters = 1, excludeSelf = true))
        split == fused
      }
    }

  // strictly-positive coordinates: every vector (and therefore every codeword
  // mean and reconstruction) has nonzero norm, so PQ's zero-recon-norm drop
  // can't fire and a full-corpus shortlist makes rerank ≡ exact brute force
  private val posVecGen: Gen[Array[Float]] =
    Gen.listOfN(4, Gen.chooseNum(0.1f, 2.0f)).map(_.toArray)
  private val posCorpusGen: Gen[List[Array[Float]]] =
    Gen.choose(6, 24).flatMap(n => Gen.listOfN(n, posVecGen))

  property("topKPqRerank with full-corpus shortlist equals brute-force topK") =
    forAll(posCorpusGen, partsGen, Gen.choose(0, 1)) { (vecs, parts, nIters) =>
      val corpus = df(vecs, parts)
      val q = corpus.filter(col("id") < 4)
      val rerank = resultMap(SimSearch.topKPqRerank(q, "id", "vec",
        corpus, "id", "vec", 3, shortlist = math.max(3, vecs.length),
        nSub = 2, ksub = 4, nIters = nIters, excludeSelf = true))
      val brute = resultMap(SimSearch.topK(q, "id", "vec",
        corpus, "id", "vec", 3, excludeSelf = true))
      rerank == brute
    }

  property("topKIvfPqRerank with full probe + full-corpus shortlist equals brute-force topK") =
    forAll(posCorpusGen, partsGen, Gen.choose(0, 1)) { (vecs, parts, nIters) =>
      val corpus = df(vecs, parts)
      val q = corpus.filter(col("id") < 4)
      val rerank = resultMap(SimSearch.topKIvfPqRerank(q, "id", "vec",
        corpus, "id", "vec", 3, shortlist = math.max(3, vecs.length),
        nList = 4, nProbe = 4, nIters = nIters, nSub = 2, ksub = 4,
        excludeSelf = true))
      val brute = resultMap(SimSearch.topK(q, "id", "vec",
        corpus, "id", "vec", 3, excludeSelf = true))
      rerank == brute
    }

  property("rangeSearch with threshold -2 equals the full brute-force pair set") =
    forAll(posCorpusGen, partsGen) { (vecs, parts) =>
      val corpus = df(vecs, parts)
      val q = corpus.filter(col("id") < 4)
      val range = SimSearch.rangeSearch(q, "id", "vec", corpus, "id", "vec",
          -2.0, excludeSelf = true)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val brute = resultMap(SimSearch.topK(q, "id", "vec",
          corpus, "id", "vec", vecs.length, excludeSelf = true))
        .map { case ((qid, nid), cos) => (qid, nid, cos) }.toSet
      range == brute
    }

  property("pqEncode keeps exactly the eligible rows") =
    forAll(corpusGen, partsGen) { (vecs, parts) =>
      val corpus = df(vecs, parts)
      val hasEligible = vecs.take(4).exists(v =>
        v != null && v.length == 4 && v.exists(_ != 0.0f))
      !hasEligible || {
        val model = SimSearch.pqTrainModel(corpus, "id", "vec", nSub = 2, ksub = 4)
        val kept = SimSearch.pqEncode(corpus, "id", "vec", model)
          .select("id").collect().map(_.getLong(0)).toSet
        val expected = vecs.zipWithIndex.collect {
          case (v, i) if v != null && v.length == 4 && v.exists(_ != 0.0f) => i.toLong
        }.toSet
        kept == expected
      }
    }
}
