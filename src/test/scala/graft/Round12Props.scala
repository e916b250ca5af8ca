package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test => SCTest}
import org.scalacheck.Prop.forAll

import graft.operators.{Bm25, EventStats, GraphRank}

/**
 * ScalaCheck property suite for the round-12 operators: invariants on
 * ARBITRARY inputs — MaxScore pruning must be RESULT-IDENTICAL to the
 * exhaustive scorer on random corpora (the whole point of a safe-pruning
 * algorithm), attribution models must conserve exactly 1000 milli per
 * touched conversion, label propagation must be row-order-invariant, and
 * one-community modularity must be exactly zero.
 */
object Round12Props extends Properties("Round12") {

  override def overrideParameters(p: SCTest.Parameters): SCTest.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("round12-props")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val wordGen: Gen[String] =
    Gen.oneOf("alpha", "beta", "gamma", "delta", "echo", "fox", "golf", "hotel")
  private val docGen: Gen[String] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))
  private val corpusGen: Gen[List[String]] =
    Gen.choose(4, 20).flatMap(n => Gen.listOfN(n, docGen))

  private def docsDf(texts: List[String]): DataFrame = {
    val s = spark; import s.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  property("topKMaxScore ≡ topKIndexed on random corpora and queries") =
    forAll(corpusGen, Gen.choose(1, 3), Gen.choose(1, 6)) { (texts, nq, k) =>
      val docs = docsDf(texts)
      val queries = docs.filter(col("doc_id") < nq)
      val idx = Bm25.index(docs, "doc_id", "text")
      val full = Bm25.topKIndexed(idx, queries, "doc_id", "text", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(x => (x._1, x._4))
      val pruned = Bm25.topKMaxScore(idx, queries, "doc_id", "text", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(x => (x._1, x._4))
      pruned.toSeq == full.toSeq
    }

  private val eventsGen: Gen[List[(Long, String, Int)]] =
    Gen.choose(4, 30).flatMap(n => Gen.listOfN(n,
      for {
        u <- Gen.choose(1L, 4L)
        t <- Gen.oneOf("click", "view", "buy")
        d <- Gen.choose(0, 12)
      } yield (u, t, d)))

  private def evDf(rows: List[(Long, String, Int)]): DataFrame = {
    val s = spark; import s.implicits._
    rows.zipWithIndex.map { case ((u, t, d), i) =>
      (i.toLong, u, t, java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00"))
    }.toDF("event_id", "user_id", "event_type", "ts")
  }

  property("decayAttribution conserves 1000 milli per touched conversion") =
    forAll(eventsGen, Gen.choose(1, 6)) { (rows, hl) =>
      val ev = evDf(rows)
      val out = EventStats.decayAttribution(ev, "user_id", "event_type",
        "buy", lookbackDays = 7, halfLifeDays = hl).collect()
      // touched conversions = conversions with >= 1 touch = sum of n_last
      val touched = out.map(_.getAs[Long]("n_last")).sum
      out.map(_.getAs[Long]("credit_milli")).sum == 1000L * touched
    }

  private val edgesGen: Gen[List[(Long, Long)]] =
    Gen.choose(0, 25).flatMap(n => Gen.listOfN(n,
      for { a <- Gen.choose(1L, 12L); b <- Gen.choose(1L, 12L) if a != b }
        yield (math.min(a, b), math.max(a, b)))).map(_.distinct)

  property("labelPropagation is input-row-order invariant") =
    forAll(edgesGen, Gen.choose(1, 3)) { (edges, rounds) =>
      val s = spark; import s.implicits._
      val nodes = (1L to 12L).toDF("id")
      def run(es: List[(Long, Long)]): Map[Long, Long] =
        GraphRank.labelPropagation(nodes, "id", es.toDF("a", "b"), "a", "b", rounds)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      run(edges) == run(edges.reverse)
    }

  property("modularity of the one-blob assignment is exactly zero") =
    forAll(edgesGen.suchThat(_.nonEmpty)) { edges =>
      val s = spark; import s.implicits._
      val labels = (1L to 12L).map(n => (n, 1L)).toDF("id", "label")
      val out = GraphRank.modularity(edges.toDF("a", "b"), "a", "b",
        labels, "id", "label").collect().head
      out.getAs[Long]("q_micro") == 0L &&
        out.getAs[Long]("n_within") == out.getAs[Long]("m")
    }
}
