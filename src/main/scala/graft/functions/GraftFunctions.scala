package graft.functions

import org.apache.spark.sql.SparkSession

/**
 * SQL-surface registration: makes the graft scalar functions callable from
 * `spark.sql(...)` — the Spark analogue of the reference being a Python-callable
 * library (/root/reference/python/polars_sim/__init__.py). Idempotent.
 *
 * Registered functions:
 *  - `trigrams(s)`          -> array<int> distinct trigram token ids
 *  - `trigram_strings(s)`   -> array<string> distinct trigram strings
 *  - `normalize_words(s)`   -> lowercase, non-alphanumerics stripped
 *                              (≙ reference normalize_string_col, join.py:6-12)
 *  - `thash(s)`             -> deterministic polynomial string hash
 *  - `word_shingles(s)`     -> array<string> distinct 3-word shingles
 *  - `minhash_sig(arr)`     -> array<bigint> MinHash signature of a shingle set
 *  - `minhash_bands(arr)`   -> array<string> LSH band keys of a shingle set
 *  - `doc_score(s)`         -> struct(quality double, langid string), fused single pass
 *  - `chunk_words(s, n, o)` -> array<string> word-window chunks (size n, overlap o)
 *  - `quantize_int8(v)`     -> struct(scale double, q array<int>)
 *  - `simhash64(s)`         -> struct(h1 bigint, h2 bigint) — the two 32-bit
 *                              SimHash halves of the doc's shingle set
 *  - `winnow(s, k, w)`      -> array<bigint> winnowing fingerprints
 *
 * (PII redaction and repetition ratio are pure Column expressions —
 * [[TextFunctions.redactPiiCol]] / [[TextFunctions.repetitionRatioCol]] — and
 * need no UDF registration to be used from SQL-generated plans.)
 */
object GraftFunctions {
  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("trigrams", (s: String) => Trigrams.tokenIds(s))
    spark.udf.register("trigram_strings", (s: String) => Trigrams.tokenStrings(s))
    spark.udf.register("normalize_words",
      (s: String) => if (s == null) null else s.replaceAll("[^a-zA-Z0-9]", "").toLowerCase)
    spark.udf.register("thash", (s: String) => TextFunctions.tHash(s))
    spark.udf.register("word_shingles", (s: String) => TextFunctions.shingles3Array(s))
    spark.udf.register("minhash_sig",
      (shs: Seq[String]) => TextFunctions.minHashSig(shs.toArray))
    spark.udf.register("minhash_bands",
      (shs: Seq[String]) => TextFunctions.minHashBandKeys(shs.toArray))
    spark.udf.register("doc_score", (s: String) => TextFunctions.scoreDoc(s))
    spark.udf.register("chunk_words",
      (s: String, size: Int, overlap: Int) => TextFunctions.chunkWords(s, size, overlap))
    spark.udf.register("quantize_int8",
      (v: Seq[Float]) => graft.operators.Embeddings.quantizeInt8Vec(v))
    spark.udf.register("simhash64", (s: String) => {
      val shs = TextFunctions.shingles3Array(s)
      (TextFunctions.simHashHalf(shs, TextFunctions.SimHashMult1),
        TextFunctions.simHashHalf(shs, TextFunctions.SimHashMult2))
    })
    spark.udf.register("winnow",
      (s: String, k: Int, w: Int) => TextFunctions.winnowFingerprints(s, k, w))
    spark.udf.register("kgram_hashes",
      (s: String, k: Int) => TextFunctions.kGramHashes(s, k))
  }
}
