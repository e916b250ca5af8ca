package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.wordNGramHashUdf

/**
 * Benchmark decontamination by n-gram collision — the standard pre-training
 * hygiene step: flag corpus documents that share any n-word gram with a
 * benchmark/evaluation document (GPT-3-style 13-gram rule), so evaluation
 * data can be removed from the training mix.
 *
 * Plan shape: one gram-hash UDF pass per side, equi-join on the 64-bit gram
 * hash. The benchmark side is tiny by nature — its hash relation broadcasts —
 * so the corpus is scanned once and never shuffled on text. Exact on grams
 * (hash collisions of [[graft.functions.TextFunctions.tHash]] are the only
 * false-positive source, and flagging is the conservative direction for
 * decontamination).
 */
object Decontaminate {

  /**
   * @param n gram width in words (13 is the published convention)
   * @return (corpus idCol, bench_id) — one row per (contaminated doc,
   *         benchmark doc) collision pair, distinct
   */
  def flagged(
      corpus: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchIdCol: String, benchTextCol: String,
      n: Int = 13): DataFrame = {
    val ch = corpus.select(col(idCol).as("__cid"),
      explode(wordNGramHashUdf(n)(col(textCol))).as("__gh"))
    val bh = bench.select(col(benchIdCol).as("bench_id"),
      explode(wordNGramHashUdf(n)(col(benchTextCol))).as("__gh"))
    ch.join(broadcast(bh), "__gh")
      .select(col("__cid").as(idCol), col("bench_id"))
      .distinct()
  }
}
