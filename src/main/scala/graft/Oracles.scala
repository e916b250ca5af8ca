package graft

/**
 * DuckDB oracle SQL builders for [[SparkEntry.oracleSql]].
 *
 * Every query registered in [[SparkEntry.queries]] has a 1:1 ANSI-SQL
 * re-statement here, executed by the driver against the same parquet tables.
 * The SQL mirrors the Spark expressions OPERATION BY OPERATION (same casts,
 * same arithmetic order, same tie-breaks) so results hash-match bit-for-bit
 * (doubles from non-associative reductions are rounded identically on both
 * sides before comparison).
 */
object Oracles {

  /** Character-trigram token CTEs over `sel` (must project `id`, `s`).
    * Mirrors graft.functions.Trigrams: 3-char windows, all chars in [a-z],
    * set semantics. Generates CTEs `{p}src`, `{p}tok`, `{p}cnt`. */
  def trigramCtes(p: String, sel: String): String =
    s"""${p}src AS ($sel),
       |${p}tok AS (
       |  SELECT DISTINCT id, substring(s, g, 3) AS tok
       |  FROM (SELECT id, s, unnest(generate_series(1, greatest(length(s)-2, 0))) AS g FROM ${p}src)
       |  WHERE regexp_matches(substring(s, g, 3), '^[a-z]{3}$$')
       |),
       |${p}cnt AS (SELECT id, count(*) AS n FROM ${p}tok GROUP BY id)""".stripMargin

  /** Top-n trigram-similarity pairs (mirrors SimJoin.keyedPairs + round(sim,6)).
    * `leftSel`/`rightSel` must project `id`, `s`. */
  def trigramPairs(
      leftSel: String, rightSel: String, topN: Int, l2: Boolean,
      outL: String = "lid", outR: String = "rid"): String = {
    val simExpr =
      if (l2) "CAST(d.dot AS DOUBLE) / (sqrt(lc.n) * sqrt(rc.n))"
      else "CAST(d.dot AS DOUBLE)"
    s"""WITH ${trigramCtes("l", leftSel)},
       |${trigramCtes("r", rightSel)},
       |dots AS (
       |  SELECT lt.id AS lid, rt.id AS rid, count(*) AS dot
       |  FROM ltok lt JOIN rtok rt ON lt.tok = rt.tok GROUP BY 1, 2
       |),
       |sims AS (
       |  SELECT d.lid, d.rid, $simExpr AS sim
       |  FROM dots d JOIN lcnt lc ON d.lid = lc.id JOIN rcnt rc ON d.rid = rc.id
       |),
       |ranked AS (
       |  SELECT lid, rid, sim,
       |         row_number() OVER (PARTITION BY lid ORDER BY sim DESC, rid ASC) AS rn
       |  FROM sims
       |)
       |SELECT lid AS "$outL", rid AS "$outR", round(sim, 6) AS sim
       |FROM ranked WHERE rn <= $topN""".stripMargin
  }

  /** Same as [[trigramPairs]] but full-precision float sim (mirrors SimJoin.pairs). */
  def trigramPairsFloat(leftSel: String, rightSel: String, topN: Int, l2: Boolean): String = {
    val base = trigramPairs(leftSel, rightSel, topN, l2)
    base.replace("""SELECT lid AS "lid", rid AS "rid", round(sim, 6) AS sim""",
      """SELECT lid AS "row", rid AS "col", CAST(sim AS REAL) AS sim""")
  }

  /** Mirror of SimJoin.simJoin with how="left": left key = sparse regexp
    * extract of part names (empty → zero trigrams → no candidate), right =
    * names of part < 300; LEFT JOIN assembly keeps no-match left rows with
    * null sim / right columns while matched rows carry the usual top-n. */
  def simJoinLeftSql(topN: Int): String = {
    val lSel = "SELECT row_number() OVER (ORDER BY p_partkey) - 1 AS id, " +
      "regexp_extract(p_name, 'gizmo|widget', 0) AS s FROM part"
    val rSel = "SELECT row_number() OVER (ORDER BY p_partkey) - 1 AS id, p_name AS s " +
      "FROM part WHERE p_partkey < 300"
    s"""WITH ${trigramCtes("l", lSel)},
       |${trigramCtes("r", rSel)},
       |dots AS (
       |  SELECT lt.id AS lid, rt.id AS rid, count(*) AS dot
       |  FROM ltok lt JOIN rtok rt ON lt.tok = rt.tok GROUP BY 1, 2
       |),
       |sims AS (
       |  SELECT d.lid, d.rid, CAST(d.dot AS DOUBLE) / (sqrt(lc.n) * sqrt(rc.n)) AS sim
       |  FROM dots d JOIN lcnt lc ON d.lid = lc.id JOIN rcnt rc ON d.rid = rc.id
       |),
       |ranked AS (
       |  SELECT lid, rid, sim,
       |         row_number() OVER (PARTITION BY lid ORDER BY sim DESC, rid ASC) AS rn
       |  FROM sims
       |),
       |fin AS (SELECT lid, rid, CAST(sim AS REAL) AS sim FROM ranked WHERE rn <= $topN),
       |lw AS (SELECT p_partkey, regexp_extract(p_name, 'gizmo|widget', 0) AS probe,
       |       row_number() OVER (ORDER BY p_partkey) - 1 AS _lid FROM part),
       |rw AS (SELECT p_partkey, p_name, row_number() OVER (ORDER BY p_partkey) - 1 AS _rid
       |       FROM part WHERE p_partkey < 300)
       |SELECT l.p_partkey, l.probe, f.sim,
       |       r.p_partkey AS p_partkey_right, r.p_name
       |FROM lw l LEFT JOIN fin f ON f.lid = l._lid LEFT JOIN rw r ON f.rid = r._rid""".stripMargin
  }

  /** Full simJoin assembly on a part self-join (mirrors SimJoin.simJoin with
    * indexBy=p_partkey, suffix "_right"). */
  def simJoinFullPart(topN: Int): String = {
    val idSel = "SELECT row_number() OVER (ORDER BY p_partkey) - 1 AS id, p_name AS s FROM part"
    s"""WITH ${trigramCtes("l", idSel)},
       |${trigramCtes("r", idSel)},
       |dots AS (
       |  SELECT lt.id AS lid, rt.id AS rid, count(*) AS dot
       |  FROM ltok lt JOIN rtok rt ON lt.tok = rt.tok GROUP BY 1, 2
       |),
       |sims AS (
       |  SELECT d.lid, d.rid, CAST(d.dot AS DOUBLE) / (sqrt(lc.n) * sqrt(rc.n)) AS sim
       |  FROM dots d JOIN lcnt lc ON d.lid = lc.id JOIN rcnt rc ON d.rid = rc.id
       |),
       |ranked AS (
       |  SELECT lid, rid, sim,
       |         row_number() OVER (PARTITION BY lid ORDER BY sim DESC, rid ASC) AS rn
       |  FROM sims
       |),
       |pw AS (SELECT *, row_number() OVER (ORDER BY p_partkey) - 1 AS _rid FROM part),
       |fin AS (SELECT lid, rid, CAST(sim AS REAL) AS sim FROM ranked WHERE rn <= $topN)
       |SELECT l.p_partkey, l.p_name, l.p_brand, l.p_type, l.p_size, l.p_retailprice, f.sim,
       |       r.p_partkey AS p_partkey_right, r.p_name AS p_name_right,
       |       r.p_brand AS p_brand_right, r.p_type AS p_type_right,
       |       r.p_size AS p_size_right, r.p_retailprice AS p_retailprice_right
       |FROM fin f JOIN pw l ON f.lid = l._rid JOIN pw r ON f.rid = r._rid""".stripMargin
  }

  /** Word + 3-word-shingle CTEs over documents: `dwords`, `dsh`, `dcnt`. */
  val shingleCtes: String =
    """dwords AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws FROM documents),
      |dsh AS (
      |  SELECT DISTINCT doc_id, ws[g] || ' ' || ws[g+1] || ' ' || ws[g+2] AS sh
      |  FROM (SELECT doc_id, ws, unnest(generate_series(1, greatest(len(ws)-2, 0))) AS g FROM dwords)
      |),
      |dcnt AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id)""".stripMargin

  /** Exact mirror of Dedup.noveltyScores: per-shingle first-occurrence over
    * [[shingleCtes]]'s distinct (doc_id, sh) relation, reduced per doc. */
  def noveltySql: String =
    s"""WITH $shingleCtes,
       |fo AS (SELECT sh, min(doc_id) AS fd FROM dsh GROUP BY sh)
       |SELECT d.doc_id, count(*) AS n_shingles,
       |       CAST(sum(CASE WHEN d.doc_id = f.fd THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       |       round(CAST(sum(CASE WHEN d.doc_id = f.fd THEN 1 ELSE 0 END) AS DOUBLE)
       |             / count(*), 6) + 0.0 AS novelty
       |FROM dsh d JOIN fo f ON d.sh = f.sh
       |GROUP BY d.doc_id""".stripMargin

  /** Exact mirror of Dedup.boilerplateScores: per-shingle distinct-doc
    * frequency over [[shingleCtes]]'s distinct (doc_id, sh) relation,
    * reduced per doc against the minDocs threshold. */
  def boilerplateSql(minDocs: Long): String =
    s"""WITH $shingleCtes,
       |fr AS (SELECT sh, count(*) AS df FROM dsh GROUP BY sh)
       |SELECT d.doc_id, count(*) AS n_shingles,
       |       CAST(sum(CASE WHEN f.df >= $minDocs THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
       |       round(CAST(sum(CASE WHEN f.df >= $minDocs THEN 1 ELSE 0 END) AS DOUBLE)
       |             / count(*), 6) + 0.0 AS boilerplate
       |FROM dsh d JOIN fr f ON d.sh = f.sh
       |GROUP BY d.doc_id""".stripMargin

  /** Exact mirror of Dedup.softWeights: per-content-hash group size as a
    * window over md5(text) (nulls partition together on both engines),
    * weight = 1/group_size. */
  def softWeightsSql: String =
    s"""SELECT doc_id, md5(text) AS content_hash,
       |       count(*) OVER (PARTITION BY md5(text)) AS group_size,
       |       round(1.0 / count(*) OVER (PARTITION BY md5(text)), 6) + 0.0 AS weight
       |FROM documents""".stripMargin

  /** Brute-force 3-word-shingle Jaccard pairs ≥ threshold (mirrors
    * Dedup.jaccardPairs AND the verified output of Dedup.minHashLshPairs). */
  def jaccardPairs(threshold: Double): String =
    s"""WITH $shingleCtes,
       |inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
       |  FROM dsh a JOIN dsh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |),
       |jac AS (
       |  SELECT id_a, id_b, CAST(i AS DOUBLE) / CAST(ca.n + cb.n - i AS DOUBLE) AS jaccard
       |  FROM inter JOIN dcnt ca ON inter.id_a = ca.doc_id JOIN dcnt cb ON inter.id_b = cb.doc_id
       |)
       |SELECT id_a, id_b, round(jaccard, 6) AS jaccard FROM jac WHERE jaccard >= $threshold""".stripMargin

  /** Brute-force 3-word-shingle containment (overlap-coefficient) pairs ≥
    * threshold — mirrors Dedup.containmentPairs: |A∩B| / min(|A|,|B|). */
  def containmentPairs(threshold: Double): String =
    s"""WITH $shingleCtes,
       |inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
       |  FROM dsh a JOIN dsh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |),
       |cont AS (
       |  SELECT id_a, id_b, CAST(i AS DOUBLE) / CAST(least(ca.n, cb.n) AS DOUBLE) AS containment
       |  FROM inter JOIN dcnt ca ON inter.id_a = ca.doc_id JOIN dcnt cb ON inter.id_b = cb.doc_id
       |)
       |SELECT id_a, id_b, round(containment, 6) AS containment
       |FROM cont WHERE containment >= $threshold""".stripMargin

  /** Mirror of Dedup.jaccardPairs with `maxDocFrequency = cap`: shingles in
    * more than `cap` docs are dropped from the inverted index (intersection
    * counts shrink) while set sizes stay FULL — so jaccard is the operator's
    * documented lower bound, and the cap's result-changing semantics are
    * themselves hash-pinned. */
  def jaccardPairsCapped(threshold: Double, cap: Long): String =
    s"""WITH $shingleCtes,
       |tidx AS (
       |  SELECT doc_id, sh FROM dsh
       |  WHERE sh IN (SELECT sh FROM dsh GROUP BY sh HAVING count(*) <= $cap)
       |),
       |inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
       |  FROM tidx a JOIN tidx b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |),
       |jac AS (
       |  SELECT id_a, id_b, CAST(i AS DOUBLE) / CAST(ca.n + cb.n - i AS DOUBLE) AS jaccard
       |  FROM inter JOIN dcnt ca ON inter.id_a = ca.doc_id JOIN dcnt cb ON inter.id_b = cb.doc_id
       |)
       |SELECT id_a, id_b, round(jaccard, 6) AS jaccard FROM jac WHERE jaccard >= $threshold""".stripMargin

  /**
   * MinHash + LSH banding CTEs over a (idCol, sh) shingle relation `shRel` —
   * an EXACT mirror of Dedup.minHashLshPairs' candidate generation (NOT the
   * brute-force all-pairs equivalent: the banding itself is deterministic
   * integer arithmetic, so the approximate operator is exactly checkable).
   * K=32 hashes `(a_j·(tHash(sh) mod P1) + b_j) mod P2`, 8 bands of 4, band
   * key = ':'-joined mins in j order. Emits `mcand(id_a, id_b)` with
   * id_a < id_b, distinct.
   */
  def minHashBandCtes(shRel: String, idCol: String): String =
    s"""mh_th AS (SELECT $idCol, ${tHashSql("sh")} % 1000003 AS thc FROM $shRel),
       |mh AS (
       |  SELECT $idCol, j,
       |    min((((j*2654435761 + 1) % 1000000007) * thc + ((j*2654446111 + 12345) % 1000000007)) % 1000000007) AS mh
       |  FROM mh_th, (SELECT unnest(generate_series(0, 31)) AS j)
       |  GROUP BY $idCol, j
       |),
       |mbands AS (
       |  SELECT $idCol, j // 4 AS band, string_agg(CAST(mh AS VARCHAR), ':' ORDER BY j) AS bkey
       |  FROM mh GROUP BY $idCol, j // 4
       |),
       |mcand AS (
       |  SELECT DISTINCT a.$idCol AS id_a, b.$idCol AS id_b
       |  FROM mbands a JOIN mbands b ON a.band = b.band AND a.bkey = b.bkey AND a.$idCol < b.$idCol
       |)""".stripMargin

  /**
   * Shared connected-component CTE chain over the LSH-verified near-dup graph
   * of `documents` — layered on [[shingleCtes]] + [[minHashBandCtes]]; emits
   * `comp(doc_id, component)` with component = min reachable doc id. Must be
   * used inside `WITH RECURSIVE`. Shared by the dedup_clusters and
   * dedup_canonical oracles so the verification SQL cannot diverge.
   */
  def minHashComponentCtes(threshold: Double): String =
    s"""${minHashBandCtes("dsh", "doc_id")},
       |inter AS (
       |  SELECT c.id_a, c.id_b, count(*) AS i
       |  FROM mcand c
       |  JOIN dsh a ON c.id_a = a.doc_id
       |  JOIN dsh b ON c.id_b = b.doc_id AND a.sh = b.sh
       |  GROUP BY 1, 2
       |),
       |jac AS (
       |  SELECT id_a, id_b, CAST(i AS DOUBLE) / CAST(ca.n + cb.n - i AS DOUBLE) AS jaccard
       |  FROM inter JOIN dcnt ca ON inter.id_a = ca.doc_id JOIN dcnt cb ON inter.id_b = cb.doc_id
       |),
       |jp AS (SELECT id_a, id_b FROM jac WHERE jaccard >= $threshold),
       |edges AS (SELECT id_a AS a, id_b AS b FROM jp UNION SELECT id_b AS a, id_a AS b FROM jp),
       |reach(src, dst) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
       |),
       |comp AS (SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY src)""".stripMargin

  /** Exact mirror of Dedup.minHashSignatures → nearDupFromSignatures
    * (default 8×4 banding): the `mh` CTE IS the signature relation, band
    * candidates come from [[minHashBandCtes]], and the similarity is the
    * signature estimate — matching minima / 32 — with no exact-Jaccard
    * verification anywhere (the operator's whole point is that text is not
    * read at search time). */
  def minHashSigPairsSql(threshold: Double): String =
    s"""WITH $shingleCtes,
       |${minHashBandCtes("dsh", "doc_id")},
       |sig_est AS (
       |  SELECT c.id_a, c.id_b,
       |         CAST(sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS DOUBLE) / 32.0 AS est
       |  FROM mcand c
       |  JOIN mh a ON a.doc_id = c.id_a
       |  JOIN mh b ON b.doc_id = c.id_b AND a.j = b.j
       |  GROUP BY 1, 2
       |)
       |SELECT id_a, id_b, round(est, 6) AS est_jaccard
       |FROM sig_est WHERE est >= $threshold""".stripMargin

  /** Exact mirror of Dedup.nearDupFromSignaturesBetween (default 8×4
    * banding): side A / side B = `documents` filtered by predA / predB, band
    * candidates across sides, similarity = matching minima / 32 — no exact
    * verification (the signature-only contract). */
  def minHashSigBetweenSql(threshold: Double, predA: String, predB: String): String =
    s"""WITH $shingleCtes,
       |${minHashBandCtes("dsh", "doc_id")},
       |xc AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM mbands a JOIN mbands b ON a.band = b.band AND a.bkey = b.bkey
       |  WHERE a.doc_id IN (SELECT doc_id FROM documents WHERE $predA)
       |    AND b.doc_id IN (SELECT doc_id FROM documents WHERE $predB)
       |),
       |xest AS (
       |  SELECT c.id_a, c.id_b,
       |         CAST(sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS DOUBLE) / 32.0 AS est
       |  FROM xc c
       |  JOIN mh a ON a.doc_id = c.id_a
       |  JOIN mh b ON b.doc_id = c.id_b AND a.j = b.j
       |  GROUP BY 1, 2
       |)
       |SELECT id_a, id_b, round(est, 6) AS est_jaccard
       |FROM xest WHERE est >= $threshold""".stripMargin

  /** Exact mirror of Dedup.exactIncrement with seen = documents WHERE
    * seenPred, batch = documents WHERE batchPred: a batch row is kept iff its
    * md5 is not among the seen digests and it is the min-id holder of its
    * digest within the batch. */
  def exactIncrementSql(seenPred: String, batchPred: String): String =
    s"""WITH seen AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE $seenPred),
       |b AS (SELECT doc_id, md5(text) AS content_hash FROM documents WHERE $batchPred),
       |canon AS (SELECT content_hash, min(doc_id) AS c FROM b GROUP BY 1)
       |SELECT b.doc_id, b.content_hash,
       |       CAST(CASE WHEN s.h IS NOT NULL OR b.doc_id <> canon.c
       |            THEN 0 ELSE 1 END AS BIGINT) AS kept
       |FROM b JOIN canon USING (content_hash)
       |LEFT JOIN seen s ON b.content_hash = s.h""".stripMargin

  /** Exact mirror of Dedup.minHashLshPairsBetween (default 8×4 banding) with
    * side A / side B = `documents` filtered by predA / predB — banding
    * mirrored, then exact Jaccard of candidates. */
  def minHashLshBetweenSql(threshold: Double, predA: String, predB: String): String =
    s"""WITH $shingleCtes,
       |${minHashBandCtes("dsh", "doc_id")},
       |xcand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM mbands a JOIN mbands b ON a.band = b.band AND a.bkey = b.bkey
       |  WHERE a.doc_id IN (SELECT doc_id FROM documents WHERE $predA)
       |    AND b.doc_id IN (SELECT doc_id FROM documents WHERE $predB)
       |),
       |xinter AS (
       |  SELECT c.id_a, c.id_b, count(*) AS i
       |  FROM xcand c
       |  JOIN dsh a ON c.id_a = a.doc_id
       |  JOIN dsh b ON c.id_b = b.doc_id AND a.sh = b.sh
       |  GROUP BY 1, 2
       |),
       |xjac AS (
       |  SELECT xi.id_a, xi.id_b,
       |         CAST(i AS DOUBLE) / CAST(ca.n + cb.n - i AS DOUBLE) AS jaccard
       |  FROM xinter xi JOIN dcnt ca ON xi.id_a = ca.doc_id
       |                 JOIN dcnt cb ON xi.id_b = cb.doc_id
       |)
       |SELECT id_a, id_b, round(jaccard, 6) AS jaccard
       |FROM xjac WHERE jaccard >= $threshold""".stripMargin

  /** Exact mirror of Decontaminate.fuzzyFlagged with the benchmark side =
    * documents WHERE `benchPred`: cross-table LSH band-key candidates (reuses
    * mbands; the same-table mcand CTE goes unused), exact Jaccard
    * verification ≥ threshold, self-pairs removed (the gate's composition). */
  def fuzzyDecontaminateSql(threshold: Double, benchPred: String): String =
    s"""WITH $shingleCtes,
       |${minHashBandCtes("dsh", "doc_id")},
       |fcand AS (
       |  SELECT DISTINCT a.doc_id, b.doc_id AS bench_id
       |  FROM mbands a JOIN mbands b ON a.band = b.band AND a.bkey = b.bkey
       |  WHERE b.doc_id IN (SELECT doc_id FROM documents WHERE $benchPred)
       |),
       |finter AS (
       |  SELECT c.doc_id, c.bench_id, count(*) AS i
       |  FROM fcand c
       |  JOIN dsh a ON c.doc_id = a.doc_id
       |  JOIN dsh b ON c.bench_id = b.doc_id AND a.sh = b.sh
       |  GROUP BY 1, 2
       |),
       |fjac AS (
       |  SELECT fi.doc_id, fi.bench_id,
       |         CAST(i AS DOUBLE) / CAST(ca.n + cb.n - i AS DOUBLE) AS jaccard
       |  FROM finter fi JOIN dcnt ca ON fi.doc_id = ca.doc_id
       |                 JOIN dcnt cb ON fi.bench_id = cb.doc_id
       |)
       |SELECT doc_id, bench_id, round(jaccard, 6) AS jaccard
       |FROM fjac WHERE jaccard >= $threshold AND doc_id <> bench_id""".stripMargin

  /** Exact mirror of Dedup.minHashLshPairs over documents: LSH-banded candidates
    * (minHashBandCtes), then exact-Jaccard verification ≥ threshold. */
  def minHashLshPairsSql(threshold: Double): String =
    s"""WITH $shingleCtes,
       |${minHashBandCtes("dsh", "doc_id")},
       |inter AS (
       |  SELECT c.id_a, c.id_b, count(*) AS i
       |  FROM mcand c
       |  JOIN dsh a ON c.id_a = a.doc_id
       |  JOIN dsh b ON c.id_b = b.doc_id AND a.sh = b.sh
       |  GROUP BY 1, 2
       |),
       |jac AS (
       |  SELECT id_a, id_b, CAST(i AS DOUBLE) / CAST(ca.n + cb.n - i AS DOUBLE) AS jaccard
       |  FROM inter JOIN dcnt ca ON inter.id_a = ca.doc_id JOIN dcnt cb ON inter.id_b = cb.doc_id
       |)
       |SELECT id_a, id_b, round(jaccard, 6) AS jaccard FROM jac WHERE jaccard >= $threshold""".stripMargin

  /**
   * Exact mirror of SimSearch.topKLsh on the embeddings table: per
   * (vector, table t) sign-LSH bucket from the fixed integer hyperplane
   * formula (planeComponent(j,d) = ((j·8191+d)·2654435761 mod 1000003)/1000003
   * - 0.5, d 0-based; table t uses plane family t·nPlanes + j), same-table
   * same-bucket query×corpus pairs deduped across tables (OR-amplification),
   * cosine top-k per query.
   */
  def annLshSql(k: Int, nPlanes: Int, queryPred: String, nTables: Int = 1): String =
    s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
       |pdots AS (
       |  SELECT vec_id, t, j,
       |    list_sum(list_transform(generate_series(1, len(e)), d ->
       |      CAST(e[d] AS DOUBLE) *
       |      (CAST((((t*$nPlanes + j)*8191 + (d-1)) * 2654435761) % 1000003 AS DOUBLE) / 1000003.0 - 0.5))) AS dotj
       |  FROM (SELECT vec_id, e, unnest(generate_series(0, ${nTables - 1})) AS t FROM v),
       |       (SELECT unnest(generate_series(0, ${nPlanes - 1})) AS j)
       |),
       |bkt AS (
       |  SELECT vec_id, t, CAST(sum(CASE WHEN dotj > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM pdots GROUP BY vec_id, t
       |),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
       |  FROM bkt q
       |  JOIN bkt c ON q.t = c.t AND q.bucket = c.bucket AND q.vec_id <> c.vec_id
       |  WHERE $queryPred
       |),
       |p AS (
       |  SELECT cd.query_id, cd.neighbor_id, qv.e AS ea, cv.e AS eb
       |  FROM cand cd
       |  JOIN v qv ON cd.query_id = qv.vec_id
       |  JOIN v cv ON cd.neighbor_id = cv.vec_id
       |),
       |s AS (
       |  SELECT query_id, neighbor_id,
       |    list_sum(list_transform(generate_series(1, len(ea)), i -> CAST(ea[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE)))
       |    / (sqrt(list_sum(list_transform(generate_series(1, len(ea)), i -> CAST(ea[i] AS DOUBLE) * CAST(ea[i] AS DOUBLE))))
       |     * sqrt(list_sum(list_transform(generate_series(1, len(eb)), i -> CAST(eb[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE))))) AS cosine
       |  FROM p
       |),
       |r AS (
       |  SELECT query_id, neighbor_id, cosine,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rn
       |  FROM s
       |)
       |SELECT query_id, neighbor_id, round(cosine, 4) + 0.0 AS cosine FROM r WHERE rn <= $k""".stripMargin

  /**
   * Exact mirror of SimSearch.recallReport: brute-force top-k (the `ann_topk`
   * chain) left-joined against the [[annLshSql]] LSH top-k per query —
   * per-query hit count and recall@k, the ANN-quality audit as a gated
   * relation. Both chains are the already-verified oracles, re-namespaced to
   * coexist in one WITH.
   */
  def annRecallSql(k: Int, nPlanes: Int, nTables: Int, queryPred: String): String =
    s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
       |bp AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.e AS ea, c.e AS eb
       |  FROM v q JOIN v c ON q.vec_id <> c.vec_id
       |  WHERE ${queryPred.replace("vec_id", "q.vec_id")}
       |),
       |bs AS (SELECT query_id, neighbor_id, ${listCos("ea", "eb")} AS cosine FROM bp),
       |br AS (
       |  SELECT query_id, neighbor_id,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rn
       |  FROM bs
       |),
       |bt AS (SELECT query_id, neighbor_id FROM br WHERE rn <= $k),
       |pdots AS (
       |  SELECT vec_id, t, j,
       |    list_sum(list_transform(generate_series(1, len(e)), d ->
       |      CAST(e[d] AS DOUBLE) *
       |      (CAST((((t*$nPlanes + j)*8191 + (d-1)) * 2654435761) % 1000003 AS DOUBLE) / 1000003.0 - 0.5))) AS dotj
       |  FROM (SELECT vec_id, e, unnest(generate_series(0, ${nTables - 1})) AS t FROM v),
       |       (SELECT unnest(generate_series(0, ${nPlanes - 1})) AS j)
       |),
       |bkt AS (
       |  SELECT vec_id, t, CAST(sum(CASE WHEN dotj > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM pdots GROUP BY vec_id, t
       |),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
       |  FROM bkt q
       |  JOIN bkt c ON q.t = c.t AND q.bucket = c.bucket AND q.vec_id <> c.vec_id
       |  WHERE ${queryPred.replace("vec_id", "q.vec_id")}
       |),
       |lp AS (
       |  SELECT cd.query_id, cd.neighbor_id, qv.e AS ea, cv.e AS eb
       |  FROM cand cd
       |  JOIN v qv ON cd.query_id = qv.vec_id
       |  JOIN v cv ON cd.neighbor_id = cv.vec_id
       |),
       |ls AS (SELECT query_id, neighbor_id, ${listCos("ea", "eb")} AS cosine FROM lp),
       |lr AS (
       |  SELECT query_id, neighbor_id,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rn
       |  FROM ls
       |),
       |lt AS (SELECT query_id, neighbor_id, 1 AS hit FROM lr WHERE rn <= $k)
       |SELECT b.query_id, count(*) AS k_eval,
       |       CAST(sum(coalesce(l.hit, 0)) AS BIGINT) AS n_hits,
       |       round(CAST(sum(coalesce(l.hit, 0)) AS DOUBLE) / count(*), 6) + 0.0 AS recall
       |FROM bt b
       |LEFT JOIN lt l ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
       |GROUP BY b.query_id""".stripMargin

  /** Exact mirror of SimSearch.topKSq: corpus int8-quantized with the
    * emb_quantize formula (scale = max|x|/127, code = floor(x/scale + 0.5)),
    * then cosine of the float query against the INTEGER code vector — the
    * per-vector scale cancels in cosine, exactly as the Scala kernel scores.
    * All-zero code rows and zero-norm queries are excluded (no angle). */
  def annSqSql(k: Int, queryPred: String): String =
    s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
       |m AS (
       |  SELECT vec_id, e,
       |    list_max(list_transform(e, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
       |  FROM v WHERE e IS NOT NULL
       |),
       |qz AS (
       |  SELECT vec_id,
       |    CASE WHEN scale = 0 THEN list_transform(e, x -> CAST(0 AS DOUBLE))
       |         ELSE list_transform(e, x -> floor(CAST(x AS DOUBLE) / scale + 0.5)) END AS q
       |  FROM m
       |),
       |qzn AS (SELECT vec_id, q, list_sum(list_transform(q, x -> x * x)) AS cn2 FROM qz),
       |ql AS (
       |  SELECT vec_id, e FROM v
       |  WHERE ($queryPred) AND e IS NOT NULL
       |    AND list_sum(list_transform(e, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) > 0
       |),
       |sc AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    list_sum(list_transform(generate_series(1, len(b.q)),
       |      d -> CAST(a.e[d] AS DOUBLE) * b.q[d]))
       |      / (sqrt(list_sum(list_transform(a.e, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       |       * sqrt(b.cn2)) AS cosine
       |  FROM ql a JOIN qzn b ON len(a.e) = len(b.q) AND a.vec_id <> b.vec_id
       |  WHERE b.cn2 > 0
       |),
       |r AS (
       |  SELECT query_id, neighbor_id, cosine,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rn
       |  FROM sc
       |)
       |SELECT query_id, neighbor_id, round(cosine, 4) + 0.0 AS sq_cosine
       |FROM r WHERE rn <= $k""".stripMargin

  /** Exact mirror of SimSearch.rangeSearch: all query×corpus pairs with
    * UNROUNDED cosine ≥ minCosine (the same [[listCos]] fold the Scala
    * kernel computes, so the threshold cut is bit-identical), scores then
    * rounded to 4. No per-query ranking — the result set is the range. */
  def rangeSearchSql(minCosine: Double, queryPred: String): String =
    s"""WITH q AS (SELECT vec_id, embedding AS e FROM embeddings WHERE $queryPred),
       |p AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.e AS ea, c.embedding AS eb
       |  FROM q JOIN embeddings c ON q.vec_id <> c.vec_id
       |),
       |s AS (
       |  SELECT query_id, neighbor_id,
       |    ${listCos("ea", "eb")} AS cosine
       |  FROM p
       |)
       |SELECT query_id, neighbor_id, round(cosine, 4) + 0.0 AS cosine
       |FROM s WHERE cosine >= $minCosine""".stripMargin

  /**
   * Exact mirror of SimSearch.topKMmr: brute shortlist per query (unrounded
   * cosine, neighbor-id ties), pairwise candidate similarities via the same
   * [[listCos]] fold, then the k greedy MMR steps UNROLLED as CTEs — step i
   * scores every unselected candidate `λ·rel − (1−λ)·max(sim to selected)`
   * and picks the (score DESC, nid ASC) argmax, exactly the Scala kernel's
   * loop. λ literals are formatted from the same Doubles the kernel
   * multiplies with, so scores are bit-identical.
   */
  def annMmrSql(k: Int, shortlist: Int, lambda: Double, queryPred: String): String = {
    val lam = lambda.toString
    val oneMinus = (1.0 - lambda).toString
    val steps = (2 to k).map { i =>
      val prev = s"(${(1 until i).map(j => s"SELECT query_id, nid FROM sel$j").mkString(" UNION ALL ")})"
      s"""m$i AS (
         |  SELECT c.query_id, c.nid,
         |         $lam * c.rel - $oneMinus * max(p.sim) AS score
         |  FROM cand c
         |  JOIN $prev s ON s.query_id = c.query_id
         |  JOIN ps p ON p.query_id = c.query_id AND p.na = c.nid AND p.nb = s.nid
         |  LEFT JOIN $prev x ON x.query_id = c.query_id AND x.nid = c.nid
         |  WHERE x.nid IS NULL
         |  GROUP BY c.query_id, c.nid, c.rel
         |),
         |sel$i AS (
         |  SELECT query_id, nid, score, $i AS rank FROM (
         |    SELECT query_id, nid, score,
         |           row_number() OVER (PARTITION BY query_id ORDER BY score DESC, nid ASC) AS rn
         |    FROM m$i) WHERE rn = 1
         |)""".stripMargin
    }.mkString(",\n")
    val union = (1 to k).map(i => s"SELECT * FROM sel$i").mkString(" UNION ALL ")
    s"""WITH q AS (SELECT vec_id, embedding AS e FROM embeddings WHERE $queryPred),
       |c0 AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS nid, q.e AS qe, c.embedding AS ce
       |  FROM q JOIN embeddings c ON q.vec_id <> c.vec_id
       |),
       |cs AS (SELECT query_id, nid, ce, ${listCos("qe", "ce")} AS rel FROM c0),
       |cand AS (
       |  SELECT query_id, nid, ce, rel FROM (
       |    SELECT query_id, nid, ce, rel,
       |           row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, nid ASC) AS rn
       |    FROM cs) WHERE rn <= $shortlist
       |),
       |ps AS (
       |  SELECT a.query_id, a.nid AS na, b.nid AS nb, ${listCos("a.ce", "b.ce")} AS sim
       |  FROM cand a JOIN cand b ON a.query_id = b.query_id AND a.nid <> b.nid
       |),
       |sel1 AS (
       |  SELECT query_id, nid, rel AS score, 1 AS rank FROM (
       |    SELECT query_id, nid, rel,
       |           row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, nid ASC) AS rn
       |    FROM cand) WHERE rn = 1
       |),
       |$steps
       |SELECT query_id, nid AS neighbor_id, round(score, 4) + 0.0 AS mmr_score,
       |       CAST(rank AS BIGINT) AS rank
       |FROM ($union)""".stripMargin
  }

  /** Sequential-fold cosine between two DOUBLE-cast float lists (the shared
    * fragment of every embedding oracle; mirrors SimSearch's kernels). */
  private def listCos(a: String, b: String): String =
    s"""list_sum(list_transform(generate_series(1, len($a)), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))
       |    / (sqrt(list_sum(list_transform(generate_series(1, len($a)), i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE))))
       |     * sqrt(list_sum(list_transform(generate_series(1, len($b)), i -> CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))))""".stripMargin

  /**
   * Exact mirror of SimSearch.topKIvf on the embeddings table: coarse centroids
   * = the nList smallest-id vectors (index = id rank), refined by `nIters`
   * unrolled Lloyd iterations — each assigns every vector to its (cosine desc,
   * index asc) nearest centroid and rebuilds centroid elements as
   * `CAST(SUM(floor(x·10⁶ + 0.5) AS BIGINT) AS DOUBLE) / (10⁶ · count)`, the
   * same integer-quantized mean the Scala side computes (exact Long sums on
   * both engines ⇒ bit-identical centroids). Empty and zero-norm-mean
   * clusters keep their previous centroid, and null / zero-norm embeddings
   * are excluded from seeding, Lloyd sums, assignment and probing — both
   * exactly as the Scala kernels do. Then: every vector assigned to its nearest
   * final centroid, queries probe their nProbe nearest, same-list pairs
   * scored, top-k per query.
   */
  def annIvfSql(k: Int, nList: Int, nProbe: Int, queryPred: String, nIters: Int = 0): String =
    s"""${ivfAssignCtes(nList, nIters)},
       |qasgn AS (
       |  SELECT vec_id, cj FROM (
       |    SELECT vec_id, cj,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cj ASC) AS rn
       |    FROM ccos WHERE $queryPred) WHERE rn <= $nProbe
       |),
       |p AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, qv.e AS ea, cv.e AS eb
       |  FROM qasgn q
       |  JOIN casgn c ON q.cj = c.cj AND q.vec_id <> c.vec_id
       |  JOIN v qv ON q.vec_id = qv.vec_id
       |  JOIN v cv ON c.vec_id = cv.vec_id
       |),
       |s AS (
       |  SELECT query_id, neighbor_id,
       |    ${listCos("ea", "eb")} AS cosine
       |  FROM p
       |),
       |r AS (
       |  SELECT query_id, neighbor_id, cosine,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rn
       |  FROM s
       |)
       |SELECT query_id, neighbor_id, round(cosine, 4) + 0.0 AS cosine FROM r WHERE rn <= $k""".stripMargin

  /**
   * Exact mirror of Dedup.semDedup: same centroid quantizer + assignment as
   * annIvfSql (shared [[ivfAssignCtes]]), then within-cluster smaller-id
   * pairs with cosine ≥ threshold mark the larger id dropped.
   */
  def semDedupSql(threshold: Double, nList: Int, nIters: Int): String =
    s"""${ivfAssignCtes(nList, nIters)},
       |pr AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, va.e AS ea, vb.e AS eb
       |  FROM casgn a
       |  JOIN casgn b ON a.cj = b.cj AND a.vec_id < b.vec_id
       |  JOIN v va ON a.vec_id = va.vec_id
       |  JOIN v vb ON b.vec_id = vb.vec_id
       |),
       |sc AS (
       |  SELECT id_a, id_b,
       |    ${listCos("ea", "eb")} AS cosine
       |  FROM pr
       |),
       |drp AS (SELECT DISTINCT id_b FROM sc WHERE cosine >= $threshold)
       |SELECT c.vec_id, c.cj AS cluster,
       |       CAST(CASE WHEN d.id_b IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
       |FROM casgn c LEFT JOIN drp d ON c.vec_id = d.id_b""".stripMargin

  /**
   * Exact mirror of SimSearch.topKPq: per-subspace codebooks seeded from the
   * ksub smallest-id eligible vectors (filter AFTER the id-ranked LIMIT, like
   * the Scala seed collect), squared-L2 encoding with (dist asc, j asc)
   * ties, and ADC cosine where every accumulation is an ordered list fold —
   * d-ascending inside a subspace (`list_sum(list_transform(...))`),
   * subspaces m-ascending (`list_sum(list(... ORDER BY m))`) — so scores are
   * bit-identical to the Scala kernel's loop order. Zero-reconstruction-norm
   * corpus rows are dropped on both sides.
   */
  def annPqSql(k: Int, nSub: Int, ksub: Int, queryPred: String, nIters: Int = 0): String =
    s"""${pqAdcScoreCtes(nSub, ksub, nIters, queryPred)}
       |SELECT query_id, neighbor_id, round(cosine, 4) + 0.0 AS adc_cosine
       |FROM r WHERE rn <= $k""".stripMargin

  /**
   * Exact mirror of SimSearch.topKPqRerank: the [[annPqSql]] ADC chain cut to
   * a `shortlist`-deep candidate list per query (unrounded ADC cosine,
   * neighbor-id ties — bit-identical ordering across engines, so the
   * shortlist SET matches), then each candidate re-scored EXACTLY against
   * the raw float vectors ([[listCos]] = the CosineSimExpr fold) and cut to
   * the final top-k by (exact cosine desc, neighbor_id asc).
   */
  def annPqRerankSql(
      k: Int, shortlist: Int, nSub: Int, ksub: Int,
      queryPred: String, nIters: Int = 0): String =
    s"""${pqAdcScoreCtes(nSub, ksub, nIters, queryPred)},
       |slist AS (SELECT query_id, neighbor_id FROM r WHERE rn <= $shortlist),
       |ex AS (
       |  SELECT s.query_id, s.neighbor_id,
       |    ${listCos("qv.e", "cv.e")} AS cosine
       |  FROM slist s
       |  JOIN v qv ON s.query_id = qv.vec_id
       |  JOIN v cv ON s.neighbor_id = cv.vec_id
       |),
       |rr AS (
       |  SELECT query_id, neighbor_id, cosine,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rn
       |  FROM ex
       |)
       |SELECT query_id, neighbor_id, round(cosine, 4) + 0.0 AS cosine
       |FROM rr WHERE rn <= $k""".stripMargin

  /**
   * Exact mirror of SimSearch.topKMrlRerank: prefix-cosine shortlist
   * (unrounded fold over `embedding[1:prefixDim]`, neighbor-id ties), then
   * exact cosine over the full vectors cut to top-k — the [[annPqRerankSql]]
   * refine tail on a Matryoshka stage 1.
   */
  def annMrlRerankSql(
      k: Int, shortlist: Int, prefixDim: Int, queryPred: String): String =
    s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
       |q AS (SELECT vec_id, e[1:$prefixDim] AS p FROM v WHERE $queryPred),
       |cp AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.p AS ea, c.e[1:$prefixDim] AS eb
       |  FROM q JOIN v c ON q.vec_id <> c.vec_id
       |),
       |ps AS (SELECT query_id, neighbor_id, ${listCos("ea", "eb")} AS pcos FROM cp),
       |pr AS (
       |  SELECT query_id, neighbor_id,
       |         row_number() OVER (PARTITION BY query_id ORDER BY pcos DESC, neighbor_id ASC) AS rn
       |  FROM ps
       |),
       |slist AS (SELECT query_id, neighbor_id FROM pr WHERE rn <= $shortlist),
       |ex AS (
       |  SELECT s.query_id, s.neighbor_id,
       |    ${listCos("qv.e", "cv.e")} AS cosine
       |  FROM slist s
       |  JOIN v qv ON s.query_id = qv.vec_id
       |  JOIN v cv ON s.neighbor_id = cv.vec_id
       |),
       |rr AS (
       |  SELECT query_id, neighbor_id, cosine,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rn
       |  FROM ex
       |)
       |SELECT query_id, neighbor_id, round(cosine, 4) + 0.0 AS cosine
       |FROM rr WHERE rn <= $k""".stripMargin

  /** The [[annPqSql]] scoring chain, shared with [[annPqRerankSql]]: `WITH`
    * prefix through `r` (per-query ADC-cosine ranking, unrounded). Callers
    * append the final `SELECT` (or further CTEs after a comma). */
  private def pqAdcScoreCtes(
      nSub: Int, ksub: Int, nIters: Int, queryPred: String): String =
    s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
       |vl AS (
       |  SELECT vec_id, e FROM v
       |  WHERE e IS NOT NULL
       |    AND list_sum(list_transform(e, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) > 0
       |),
       |${pqCodebookCtes(nSub, ksub, nIters)},
       |q AS (SELECT vec_id, e FROM xe WHERE $queryPred),
       |qdot AS (
       |  SELECT q.vec_id, c.m, c.j,
       |    list_sum(list_transform(generate_series(1, dm.sdim),
       |      d -> CAST(q.e[c.m * dm.sdim + d] AS DOUBLE) * c.c[d])) AS dp
       |  FROM q CROSS JOIN cw c CROSS JOIN dm
       |),
       |qn2 AS (
       |  SELECT vec_id, list_sum(list(sn ORDER BY m)) AS qn2 FROM (
       |    SELECT q.vec_id, s.m,
       |      list_sum(list_transform(generate_series(1, dm.sdim),
       |        d -> CAST(q.e[s.m * dm.sdim + d] AS DOUBLE)
       |           * CAST(q.e[s.m * dm.sdim + d] AS DOUBLE))) AS sn
       |    FROM q CROSS JOIN sub s CROSS JOIN dm) t
       |  GROUP BY vec_id
       |),
       |sc AS (
       |  SELECT qd.vec_id AS query_id, e.vec_id AS neighbor_id,
       |         list_sum(list(qd.dp ORDER BY e.m)) AS dot
       |  FROM enc e JOIN qdot qd ON qd.m = e.m AND qd.j = e.j
       |  GROUP BY 1, 2
       |),
       |s2 AS (
       |  SELECT s.query_id, s.neighbor_id,
       |         s.dot / (sqrt(q2.qn2) * sqrt(r2.rn2)) AS cosine
       |  FROM sc s
       |  JOIN qn2 q2 ON s.query_id = q2.vec_id
       |  JOIN rn2 r2 ON s.neighbor_id = r2.vec_id
       |  WHERE r2.rn2 > 0 AND s.query_id <> s.neighbor_id
       |),
       |r AS (
       |  SELECT query_id, neighbor_id, cosine,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rn
       |  FROM s2
       |)""".stripMargin

  /**
   * Exact mirror of SimSearch.topKIvfPq: the [[ivfAssignCtes]] coarse
   * quantizer restricts pairs to (query probe-list = corpus list), scored by
   * the [[annPqSql]] ADC chain (shared `v`/`vl` eligibility; full-vector
   * codes, no residuals — the Scala side's documented trade).
   */
  def annIvfPqSql(
      k: Int, nList: Int, nProbe: Int, nIters: Int,
      nSub: Int, ksub: Int, queryPred: String, pqIters: Int = 0): String =
    s"""${ivfPqAdcScoreCtes(nList, nProbe, nIters, nSub, ksub, queryPred, pqIters)}
       |SELECT query_id, neighbor_id, round(cosine, 4) + 0.0 AS adc_cosine
       |FROM r WHERE rn <= $k""".stripMargin

  /**
   * Exact mirror of SimSearch.topKIvfPqRerank: the [[annIvfPqSql]] IVFADC
   * chain cut to a `shortlist`-deep candidate list per query (unrounded ADC
   * cosine, neighbor-id ties — bit-identical ordering across engines), then
   * each candidate re-scored EXACTLY against the raw float vectors
   * ([[listCos]] = the CosineSimExpr fold) and cut to the final top-k by
   * (exact cosine desc, neighbor_id asc).
   */
  def annIvfPqRerankSql(
      k: Int, shortlist: Int, nList: Int, nProbe: Int, nIters: Int,
      nSub: Int, ksub: Int, queryPred: String, pqIters: Int = 0): String =
    s"""${ivfPqAdcScoreCtes(nList, nProbe, nIters, nSub, ksub, queryPred, pqIters)},
       |slist AS (SELECT query_id, neighbor_id FROM r WHERE rn <= $shortlist),
       |ex AS (
       |  SELECT s.query_id, s.neighbor_id,
       |    ${listCos("qv.e", "cv.e")} AS cosine
       |  FROM slist s
       |  JOIN v qv ON s.query_id = qv.vec_id
       |  JOIN v cv ON s.neighbor_id = cv.vec_id
       |),
       |rr AS (
       |  SELECT query_id, neighbor_id, cosine,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rn
       |  FROM ex
       |)
       |SELECT query_id, neighbor_id, round(cosine, 4) + 0.0 AS cosine
       |FROM rr WHERE rn <= $k""".stripMargin

  /** Mirror of SimSearch.ivfPqEncode over a train/batch split — the
    * INCREMENTAL face of the persisted IVFADC layout: both quantizers
    * trained ONLY on `trainPred` rows ([[ivfAssignCtes]] coarse +
    * [[pqCodebookCtes]] product, the fused chains verbatim), then the
    * `batchPred` rows routed to their coarse list AND PQ-encoded against
    * the persisted codebooks — encode once, grow the index forever. Codes
    * compare as the uppercase hex string of the nSub code bytes (Spark
    * `hex(codes)`). */
  def annIvfPqEncodeIncrSql(
      nList: Int, nIters: Int, nSub: Int, ksub: Int, pqIters: Int,
      trainPred: String, batchPred: String): String =
    s"""${ivfAssignCtes(nList, nIters, trainPred, batchPred)},
       |${pqCodebookCtes(nSub, ksub, pqIters, encodePred = batchPred)}
       |SELECT c.vec_id, CAST(c.cj AS BIGINT) AS list,
       |       string_agg(upper(lpad(to_hex(e.j), 2, '0')), '' ORDER BY e.m) AS code_hex
       |FROM casgn c JOIN enc e ON e.vec_id = c.vec_id
       |GROUP BY c.vec_id, c.cj""".stripMargin

  /** The [[annIvfPqSql]] scoring chain, shared with [[annIvfPqRerankSql]]:
    * `WITH` prefix through `r` (per-query ADC-cosine ranking over the probed
    * coarse lists, unrounded). Callers append the final `SELECT` (or further
    * CTEs after a comma). */
  private def ivfPqAdcScoreCtes(
      nList: Int, nProbe: Int, nIters: Int,
      nSub: Int, ksub: Int, queryPred: String, pqIters: Int): String =
    s"""${ivfAssignCtes(nList, nIters)},
       |qasgn AS (
       |  SELECT vec_id, cj FROM (
       |    SELECT vec_id, cj,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cj ASC) AS rn
       |    FROM ccos WHERE $queryPred) WHERE rn <= $nProbe
       |),
       |${pqCodebookCtes(nSub, ksub, pqIters)},
       |q AS (SELECT vec_id, e FROM xe WHERE $queryPred),
       |qdot AS (
       |  SELECT q.vec_id, c.m, c.j,
       |    list_sum(list_transform(generate_series(1, dm.sdim),
       |      d -> CAST(q.e[c.m * dm.sdim + d] AS DOUBLE) * c.c[d])) AS dp
       |  FROM q CROSS JOIN cw c CROSS JOIN dm
       |),
       |qn2 AS (
       |  SELECT vec_id, list_sum(list(sn ORDER BY m)) AS qn2 FROM (
       |    SELECT q.vec_id, s.m,
       |      list_sum(list_transform(generate_series(1, dm.sdim),
       |        d -> CAST(q.e[s.m * dm.sdim + d] AS DOUBLE)
       |           * CAST(q.e[s.m * dm.sdim + d] AS DOUBLE))) AS sn
       |    FROM q CROSS JOIN sub s CROSS JOIN dm) t
       |  GROUP BY vec_id
       |),
       |sc AS (
       |  SELECT qa.vec_id AS query_id, ca.vec_id AS neighbor_id,
       |         list_sum(list(qd.dp ORDER BY e.m)) AS dot
       |  FROM qasgn qa
       |  JOIN casgn ca ON qa.cj = ca.cj AND qa.vec_id <> ca.vec_id
       |  JOIN enc e ON e.vec_id = ca.vec_id
       |  JOIN qdot qd ON qd.vec_id = qa.vec_id AND qd.m = e.m AND qd.j = e.j
       |  GROUP BY 1, 2
       |),
       |s2 AS (
       |  SELECT s.query_id, s.neighbor_id,
       |         s.dot / (sqrt(q2.qn2) * sqrt(r2.rn2)) AS cosine
       |  FROM sc s
       |  JOIN qn2 q2 ON s.query_id = q2.vec_id
       |  JOIN rn2 r2 ON s.neighbor_id = r2.vec_id
       |  WHERE r2.rn2 > 0
       |),
       |r AS (
       |  SELECT query_id, neighbor_id, cosine,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rn
       |  FROM s2
       |)""".stripMargin

  /** Shared product-quantizer CTE chain (assumes `v` raw and `vl` eligible
    * vectors are already defined): seeds per-subspace codebooks `cw0` from the
    * ksub smallest-id eligible vectors, unrolls `nIters` per-subspace Lloyd
    * training passes — each encodes every uniform-dim vector against the
    * previous codebooks (squared-L2, dist-asc/j-asc ties) and rebuilds each
    * codeword as the integer-quantized mean
    * `CAST(SUM(floor(x·10⁶ + 0.5) AS BIGINT) AS DOUBLE) / (10⁶ · count)`
    * element-wise (empty codewords keep their previous value) — exactly
    * SimSearch.pqRefine's Long sums, so codebooks are bit-identical across
    * engines. Emits `dm` (dim/subdim), `sub` (subspace ids), `xe`
    * (uniform-dim eligible vectors), `cw` (final codebooks), `cn2` (codeword
    * squared norms), `enc` (corpus encodings) and `rn2` (reconstruction
    * squared norms). */
  private def pqCodebookCtes(
      nSub: Int, ksub: Int, nIters: Int, encodePred: String = ""): String = {
    val train = (1 to nIters).map { i =>
      val prev = s"cw${i - 1}"
      s"""tdist${i - 1} AS (
         |  SELECT x.vec_id, c.m, c.j,
         |    list_sum(list_transform(generate_series(1, dm.sdim),
         |      d -> (CAST(x.e[c.m * dm.sdim + d] AS DOUBLE) - c.c[d])
         |         * (CAST(x.e[c.m * dm.sdim + d] AS DOUBLE) - c.c[d]))) AS dist
         |  FROM xe x CROSS JOIN $prev c CROSS JOIN dm
         |),
         |tenc$i AS (
         |  SELECT vec_id, m, j FROM (
         |    SELECT vec_id, m, j,
         |           row_number() OVER (PARTITION BY vec_id, m ORDER BY dist ASC, j ASC) AS rn
         |    FROM tdist${i - 1}) WHERE rn = 1
         |),
         |tsum$i AS (
         |  SELECT t.m, t.j, sd.d,
         |    SUM(CAST(floor(CAST(x.e[t.m * dm.sdim + sd.d] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS sq,
         |    COUNT(*) AS cnt
         |  FROM tenc$i t JOIN xe x ON t.vec_id = x.vec_id CROSS JOIN sdims sd CROSS JOIN dm
         |  GROUP BY t.m, t.j, sd.d
         |),
         |tnew$i AS (
         |  SELECT m, j, list(CAST(sq AS DOUBLE) / (1000000.0 * cnt) ORDER BY d) AS c
         |  FROM tsum$i GROUP BY m, j
         |),
         |cw$i AS (
         |  SELECT p.m, p.j, CASE WHEN n.c IS NULL THEN p.c ELSE n.c END AS c
         |  FROM $prev p LEFT JOIN tnew$i n ON p.m = n.m AND p.j = n.j
         |),""".stripMargin
    }.mkString("\n")
    s"""dm AS (SELECT CAST(max(len(e)) AS BIGINT) AS dim,
       |              CAST(max(len(e)) AS BIGINT) // $nSub AS sdim FROM vl),
       |sub AS (SELECT unnest(generate_series(0, $nSub - 1)) AS m),
       |sdims AS (SELECT unnest(generate_series(1, (SELECT sdim FROM dm))) AS d),
       |seed AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, e
       |  FROM (SELECT vec_id, e FROM v ORDER BY vec_id LIMIT $ksub)
       |  WHERE e IS NOT NULL
       |    AND list_sum(list_transform(e, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) > 0
       |),
       |cw0 AS (
       |  SELECT s.m, sd.j,
       |    list_transform(generate_series(1, dm.sdim),
       |      d -> CAST(sd.e[s.m * dm.sdim + d] AS DOUBLE)) AS c
       |  FROM sub s CROSS JOIN seed sd CROSS JOIN dm
       |),
       |xe AS (SELECT vec_id, e FROM vl CROSS JOIN dm WHERE len(e) = dm.dim),
       |$train
       |cw AS (SELECT m, j, c FROM cw$nIters),
       |cn2 AS (SELECT m, j, list_sum(list_transform(c, x -> x * x)) AS n2 FROM cw),
       |dist AS (
       |  SELECT x.vec_id, c.m, c.j,
       |    list_sum(list_transform(generate_series(1, dm.sdim),
       |      d -> (CAST(x.e[c.m * dm.sdim + d] AS DOUBLE) - c.c[d])
       |         * (CAST(x.e[c.m * dm.sdim + d] AS DOUBLE) - c.c[d]))) AS dist
       |  FROM ${if (encodePred.isEmpty) "xe"
              else
                s"""(SELECT vec_id, embedding AS e FROM embeddings CROSS JOIN dm
                   |   WHERE ($encodePred) AND embedding IS NOT NULL
                   |     AND list_sum(list_transform(embedding,
                   |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) > 0
                   |     AND len(embedding) = dm.dim)""".stripMargin} x CROSS JOIN cw c CROSS JOIN dm
       |),
       |enc AS (
       |  SELECT vec_id, m, j FROM (
       |    SELECT vec_id, m, j,
       |           row_number() OVER (PARTITION BY vec_id, m ORDER BY dist ASC, j ASC) AS rn
       |    FROM dist) WHERE rn = 1
       |),
       |rn2 AS (
       |  SELECT e.vec_id, list_sum(list(c.n2 ORDER BY e.m)) AS rn2
       |  FROM enc e JOIN cn2 c ON e.m = c.m AND e.j = c.j
       |  GROUP BY e.vec_id
       |)""".stripMargin
  }

  /** Shared centroid-quantizer + assignment CTE chain (see [[annIvfSql]]'s
    * scaladoc for the contract): emits `v` (raw vectors), `vl` (eligible),
    * `cent$nIters` (final centroids), `ccos` (vector×centroid cosines) and
    * `casgn` (each eligible vector's nearest centroid).
    *
    * `trainPred` restricts the TRAIN slice (seeds + Lloyd refinement);
    * `assignPred` restricts the final assignment slice — the incremental
    * assign-to-existing-codebook mirror (both default to the whole table,
    * reproducing the fused train-and-assign chain verbatim). */
  private def ivfAssignCtes(
      nList: Int, nIters: Int,
      trainPred: String = "", assignPred: String = "",
      emitTrainAssign: Boolean = false): String = {
    val lloyd = (1 to nIters).map { i =>
      val prev = s"cent${i - 1}"
      s"""ccos${i - 1} AS (
         |  SELECT x.vec_id, c.cj, ${listCos("x.e", "c.ce")} AS cos
         |  FROM vl x CROSS JOIN $prev c
         |),
         |asgn$i AS (
         |  SELECT vec_id, cj FROM (
         |    SELECT vec_id, cj,
         |           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cj ASC) AS rn
         |    FROM ccos${i - 1}) WHERE rn = 1
         |),
         |qsum$i AS (
         |  SELECT a.cj, dm.d,
         |    SUM(CAST(floor(CAST(x.e[dm.d] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS sq,
         |    COUNT(*) AS cnt
         |  FROM asgn$i a JOIN vl x ON a.vec_id = x.vec_id CROSS JOIN dims dm
         |  GROUP BY a.cj, dm.d
         |),
         |cnew$i AS (
         |  SELECT cj, list(CAST(sq AS DOUBLE) / (1000000.0 * cnt) ORDER BY d) AS ce
         |  FROM qsum$i GROUP BY cj
         |),
         |cent$i AS (
         |  SELECT p.cj,
         |         CASE WHEN n.ce IS NULL
         |                OR list_sum(list_transform(n.ce, x -> x * x)) = 0
         |              THEN p.ce ELSE n.ce END AS ce
         |  FROM $prev p LEFT JOIN cnew$i n ON p.cj = n.cj
         |),""".stripMargin
    }.mkString("\n")
    // vl = Lloyd/assignment-eligible vectors: the Scala kernels skip null and
    // zero-norm embeddings everywhere (seeding, Lloyd sums, final assignment,
    // query probing) — mirrored here so degenerate rows cannot split the two
    // engines. Note cent0 filters AFTER the id-ranked LIMIT, exactly like the
    // Scala seed collect (a null among the nList smallest ids shrinks the
    // seed set, it does not pull in the next id). Both engines require
    // uniform vector dimensions when nIters > 0.
    // Optional final-model assignment of the TRAIN slice itself (`vl`), for
    // oracles that read both sides of a train/batch split (ivfDriftSql) —
    // appended behind a flag so every existing caller's SQL stays
    // byte-identical.
    val trainAssign =
      if (!emitTrainAssign) ""
      else
        s""",
           |tccos AS (
           |  SELECT x.vec_id, c.cj, ${listCos("x.e", "c.ce")} AS cos
           |  FROM vl x CROSS JOIN cent$nIters c
           |),
           |tcasgn AS (
           |  SELECT vec_id, cj FROM (
           |    SELECT vec_id, cj,
           |           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cj ASC) AS rn
           |    FROM tccos) WHERE rn = 1
           |)""".stripMargin
    val trainWhere = if (trainPred.isEmpty) "" else s" WHERE $trainPred"
    val assignSrc =
      if (assignPred.isEmpty) "vl"
      else
        s"""(SELECT vec_id, embedding AS e FROM embeddings
           |   WHERE ($assignPred) AND embedding IS NOT NULL
           |     AND list_sum(list_transform(embedding,
           |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) > 0)""".stripMargin
    s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings$trainWhere),
       |vl AS (
       |  SELECT vec_id, e FROM v
       |  WHERE e IS NOT NULL
       |    AND list_sum(list_transform(e, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) > 0
       |),
       |dims AS (SELECT unnest(generate_series(1, (SELECT CAST(max(len(e)) AS BIGINT) FROM v))) AS d),
       |cent0 AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cj,
       |         list_transform(e, x -> CAST(x AS DOUBLE)) AS ce
       |  FROM (SELECT vec_id, e FROM v ORDER BY vec_id LIMIT $nList)
       |  WHERE e IS NOT NULL
       |    AND list_sum(list_transform(e, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) > 0
       |),
       |$lloyd
       |ccos AS (
       |  SELECT x.vec_id, c.cj,
       |    ${listCos("x.e", "c.ce")} AS cos
       |  FROM $assignSrc x CROSS JOIN cent$nIters c
       |),
       |casgn AS (
       |  SELECT vec_id, cj FROM (
       |    SELECT vec_id, cj,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cj ASC) AS rn
       |    FROM ccos) WHERE rn = 1
       |)$trainAssign""".stripMargin
  }

  /** Mirror of SimSearch.ivfAssign over a train/batch split: the
    * [[ivfAssignCtes]] quantizer trained ONLY on `trainPred` rows, the final
    * assignment pass run ONLY over `batchPred` rows — the incremental
    * assign-to-existing-codebook gate. */
  def ivfAssignIncrSql(
      nList: Int, nIters: Int, trainPred: String, batchPred: String): String =
    s"""${ivfAssignCtes(nList, nIters, trainPred, batchPred)}
       |SELECT a.vec_id, CAST(a.cj AS BIGINT) AS list,
       |       CAST(floor(c.cos * 1000000.0) AS BIGINT) AS cos_micro
       |FROM casgn a JOIN ccos c ON a.vec_id = c.vec_id AND a.cj = c.cj""".stripMargin

  /** Mirror of SimSearch.ivfDrift: the [[ivfAssignCtes]] quantizer trained on
    * `trainPred` rows, BOTH sides assigned on the final model (train via the
    * `emitTrainAssign` CTEs, batch via the standard tail), per-list exact
    * integer micro-unit means (`//` truncates toward zero like Spark `div`),
    * full-outer joined so one-sided lists report count 0 and a null mean. */
  def ivfDriftSql(
      nList: Int, nIters: Int, trainPred: String, batchPred: String): String =
    s"""${ivfAssignCtes(nList, nIters, trainPred, batchPred, emitTrainAssign = true)},
       |tstats AS (
       |  SELECT a.cj AS list, COUNT(*) AS n_train,
       |         CAST(SUM(CAST(floor(c.cos * 1000000.0) AS BIGINT)) AS BIGINT) AS s
       |  FROM tcasgn a JOIN tccos c ON a.vec_id = c.vec_id AND a.cj = c.cj
       |  GROUP BY a.cj
       |),
       |bstats AS (
       |  SELECT a.cj AS list, COUNT(*) AS n_batch,
       |         CAST(SUM(CAST(floor(c.cos * 1000000.0) AS BIGINT)) AS BIGINT) AS s
       |  FROM casgn a JOIN ccos c ON a.vec_id = c.vec_id AND a.cj = c.cj
       |  GROUP BY a.cj
       |)
       |SELECT CAST(COALESCE(t.list, b.list) AS BIGINT) AS list,
       |       COALESCE(t.n_train, 0) AS n_train,
       |       CAST(t.s // t.n_train AS BIGINT) AS train_mean_micro,
       |       COALESCE(b.n_batch, 0) AS n_batch,
       |       CAST(b.s // b.n_batch AS BIGINT) AS batch_mean_micro,
       |       CAST(b.s // b.n_batch - t.s // t.n_train AS BIGINT) AS delta_micro
       |FROM tstats t FULL OUTER JOIN bstats b ON t.list = b.list""".stripMargin

  /** Mirror of SimSearch.pqDrift: the [[pqCodebookCtes]] codebooks trained
    * ONLY on `trainPred` rows (its `encodePred` tail encodes the batch),
    * a second encode pass over the train slice itself, then per
    * (subspace, codeword) INTEGER-MILLI quantization errors
    * `Σ_d (round(x·10³) − round(c·10³))²` — sums of integer products, so
    * engine-bit-stable with no fold-order caveat — aggregated to exact
    * integer means (`//` truncates like Spark `div`), full-outer joined so
    * one-sided codewords report count 0 and a null mean. */
  def pqDriftSql(
      nSub: Int, ksub: Int, nIters: Int,
      trainPred: String, batchPred: String): String = {
    def errList(src: String) =
      s"""CAST(list_sum(list_transform(generate_series(1, dm.sdim),
         |      d -> (CAST(floor(CAST($src.e[e.m * dm.sdim + d] AS DOUBLE) * 1000.0 + 0.5) AS BIGINT)
         |          - CAST(floor(c.c[d] * 1000.0 + 0.5) AS BIGINT))
         |         * (CAST(floor(CAST($src.e[e.m * dm.sdim + d] AS DOUBLE) * 1000.0 + 0.5) AS BIGINT)
         |          - CAST(floor(c.c[d] * 1000.0 + 0.5) AS BIGINT)))) AS BIGINT) AS errq""".stripMargin
    s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings WHERE $trainPred),
       |vl AS (
       |  SELECT vec_id, e FROM v
       |  WHERE e IS NOT NULL
       |    AND list_sum(list_transform(e, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) > 0
       |),
       |${pqCodebookCtes(nSub, ksub, nIters, encodePred = batchPred)},
       |bsrc AS (
       |  SELECT vec_id, embedding AS e FROM embeddings CROSS JOIN dm
       |  WHERE ($batchPred) AND embedding IS NOT NULL
       |    AND list_sum(list_transform(embedding,
       |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) > 0
       |    AND len(embedding) = dm.dim
       |),
       |tpdist AS (
       |  SELECT x.vec_id, c.m, c.j,
       |    list_sum(list_transform(generate_series(1, dm.sdim),
       |      d -> (CAST(x.e[c.m * dm.sdim + d] AS DOUBLE) - c.c[d])
       |         * (CAST(x.e[c.m * dm.sdim + d] AS DOUBLE) - c.c[d]))) AS dist
       |  FROM xe x CROSS JOIN cw c CROSS JOIN dm
       |),
       |tpenc AS (
       |  SELECT vec_id, m, j FROM (
       |    SELECT vec_id, m, j,
       |           row_number() OVER (PARTITION BY vec_id, m ORDER BY dist ASC, j ASC) AS rn
       |    FROM tpdist) WHERE rn = 1
       |),
       |terr AS (
       |  SELECT e.m, e.j,
       |    ${errList("x")}
       |  FROM tpenc e JOIN xe x ON e.vec_id = x.vec_id
       |  JOIN cw c ON e.m = c.m AND e.j = c.j CROSS JOIN dm
       |),
       |berr AS (
       |  SELECT e.m, e.j,
       |    ${errList("x")}
       |  FROM enc e JOIN bsrc x ON e.vec_id = x.vec_id
       |  JOIN cw c ON e.m = c.m AND e.j = c.j CROSS JOIN dm
       |),
       |tstats AS (
       |  SELECT m, j, COUNT(*) AS n_train, CAST(SUM(errq) AS BIGINT) AS s
       |  FROM terr GROUP BY m, j
       |),
       |bstats AS (
       |  SELECT m, j, COUNT(*) AS n_batch, CAST(SUM(errq) AS BIGINT) AS s
       |  FROM berr GROUP BY m, j
       |)
       |SELECT CAST(COALESCE(t.m, b.m) AS BIGINT) AS sub,
       |       CAST(COALESCE(t.j, b.j) AS BIGINT) AS code,
       |       COALESCE(t.n_train, 0) AS n_train,
       |       CAST(t.s // t.n_train AS BIGINT) AS train_mean_errq,
       |       COALESCE(b.n_batch, 0) AS n_batch,
       |       CAST(b.s // b.n_batch AS BIGINT) AS batch_mean_errq,
       |       CAST(b.s // b.n_batch - t.s // t.n_train AS BIGINT) AS delta_errq
       |FROM tstats t FULL OUTER JOIN bstats b ON t.m = b.m AND t.j = b.j""".stripMargin
  }

  /**
   * Exact mirror of Dedup.clusterExemplars: the [[ivfAssignCtes]] quantizer
   * (relevance = the assignment cosine, read back from `ccos`), pairwise
   * within-cluster similarities via [[listCos]], then the k greedy MMR steps
   * unrolled per cluster — the [[annMmrSql]] pattern keyed by `cj`.
   */
  def clusterExemplarsSql(k: Int, lambda: Double, nList: Int, nIters: Int): String = {
    val lam = lambda.toString
    val oneMinus = (1.0 - lambda).toString
    val steps = (2 to k).map { i =>
      val prev = s"(${(1 until i).map(j => s"SELECT cj, vec_id FROM xsel$j").mkString(" UNION ALL ")})"
      s"""xm$i AS (
         |  SELECT c.cj, c.vec_id,
         |         $lam * c.cos - $oneMinus * max(p.sim) AS score
         |  FROM rel0 c
         |  JOIN $prev s ON s.cj = c.cj
         |  JOIN xps p ON p.cj = c.cj AND p.na = c.vec_id AND p.nb = s.vec_id
         |  LEFT JOIN $prev x ON x.cj = c.cj AND x.vec_id = c.vec_id
         |  WHERE x.vec_id IS NULL
         |  GROUP BY c.cj, c.vec_id, c.cos
         |),
         |xsel$i AS (
         |  SELECT cj, vec_id, score, $i AS rank FROM (
         |    SELECT cj, vec_id, score,
         |           row_number() OVER (PARTITION BY cj ORDER BY score DESC, vec_id ASC) AS rn
         |    FROM xm$i) WHERE rn = 1
         |)""".stripMargin
    }.mkString(",\n")
    val union = (1 to k).map(i => s"SELECT * FROM xsel$i").mkString(" UNION ALL ")
    s"""${ivfAssignCtes(nList, nIters)},
       |rel0 AS (
       |  SELECT a.vec_id, a.cj, c.cos
       |  FROM casgn a JOIN ccos c ON a.vec_id = c.vec_id AND a.cj = c.cj
       |),
       |xps AS (
       |  SELECT a.cj, a.vec_id AS na, b.vec_id AS nb, ${listCos("xa.e", "xb.e")} AS sim
       |  FROM rel0 a
       |  JOIN rel0 b ON a.cj = b.cj AND a.vec_id <> b.vec_id
       |  JOIN vl xa ON a.vec_id = xa.vec_id
       |  JOIN vl xb ON b.vec_id = xb.vec_id
       |),
       |xsel1 AS (
       |  SELECT cj, vec_id, cos AS score, 1 AS rank FROM (
       |    SELECT cj, vec_id, cos,
       |           row_number() OVER (PARTITION BY cj ORDER BY cos DESC, vec_id ASC) AS rn
       |    FROM rel0) WHERE rn = 1
       |),
       |$steps
       |SELECT CAST(cj AS BIGINT) AS cluster, vec_id, round(score, 4) + 0.0 AS score,
       |       CAST(rank AS BIGINT) AS rank
       |FROM ($union)""".stripMargin
  }

  /**
   * Exact mirror of Dedup.groupExemplars on the embeddings table with
   * `label` as the group: integer-quantized per-dim mean centroid per label,
   * relevance = cosine(vector, centroid), then the k greedy MMR steps
   * unrolled as CTEs (the clusterExemplarsSql shape with label groups).
   */
  def groupExemplarsSql(k: Int, lambda: Double): String = {
    val lam = lambda.toString
    val oneMinus = (1.0 - lambda).toString
    def norm(e: String) =
      s"list_sum(list_transform(generate_series(1, len($e)), i -> CAST($e[i] AS DOUBLE) * CAST($e[i] AS DOUBLE)))"
    val steps = (2 to k).map { i =>
      val prev = s"(${(1 until i).map(j => s"SELECT g, vec_id FROM gsel$j").mkString(" UNION ALL ")})"
      s"""gm$i AS (
         |  SELECT c.g, c.vec_id,
         |         $lam * c.cos - $oneMinus * max(p.sim) AS score
         |  FROM grel c
         |  JOIN $prev s ON s.g = c.g
         |  JOIN gps p ON p.g = c.g AND p.na = c.vec_id AND p.nb = s.vec_id
         |  LEFT JOIN $prev x ON x.g = c.g AND x.vec_id = c.vec_id
         |  WHERE x.vec_id IS NULL
         |  GROUP BY c.g, c.vec_id, c.cos
         |),
         |gsel$i AS (
         |  SELECT g, vec_id, score, $i AS rank FROM (
         |    SELECT g, vec_id, score,
         |           row_number() OVER (PARTITION BY g ORDER BY score DESC, vec_id ASC) AS rn
         |    FROM gm$i) WHERE rn = 1
         |)""".stripMargin
    }.mkString(",\n")
    val union = (1 to k).map(i => s"SELECT * FROM gsel$i").mkString(" UNION ALL ")
    s"""WITH gv AS (
       |  SELECT vec_id, label AS g, embedding AS e FROM embeddings
       |  WHERE embedding IS NOT NULL AND label IS NOT NULL
       |),
       |gcd AS (
       |  SELECT g, dim,
       |    SUM(CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS s,
       |    COUNT(*) AS n
       |  FROM (SELECT g, unnest(e) AS x,
       |               unnest(generate_series(1, len(e))) AS dim FROM gv)
       |  GROUP BY g, dim
       |),
       |gcent AS (
       |  SELECT g, list(CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0) ORDER BY dim) AS c
       |  FROM gcd GROUP BY g
       |),
       |grel AS (
       |  SELECT x.vec_id, x.g, ${listCos("x.e", "c.c")} AS cos
       |  FROM gv x JOIN gcent c USING (g)
       |  WHERE len(x.e) = len(c.c) AND ${norm("x.e")} > 0 AND ${norm("c.c")} > 0
       |),
       |gps AS (
       |  SELECT a.g, a.vec_id AS na, b.vec_id AS nb, ${listCos("xa.e", "xb.e")} AS sim
       |  FROM grel a
       |  JOIN grel b ON a.g = b.g AND a.vec_id <> b.vec_id
       |  JOIN gv xa ON a.vec_id = xa.vec_id
       |  JOIN gv xb ON b.vec_id = xb.vec_id
       |),
       |gsel1 AS (
       |  SELECT g, vec_id, cos AS score, 1 AS rank FROM (
       |    SELECT g, vec_id, cos,
       |           row_number() OVER (PARTITION BY g ORDER BY cos DESC, vec_id ASC) AS rn
       |    FROM grel) WHERE rn = 1
       |),
       |$steps
       |SELECT g AS label, vec_id, round(score, 4) + 0.0 AS score,
       |       CAST(rank AS BIGINT) AS rank
       |FROM ($union)""".stripMargin
  }

  /**
   * Exact mirror of Dedup.embeddingPairsLsh: per (vector, table t) sign-LSH
   * bucket from plane family index `t·nPlanes + j`, same-bucket same-table
   * pairs deduped across tables, cosine ≥ threshold.
   */
  def embeddingLshPairsSql(threshold: Double, nPlanes: Int, nTables: Int): String =
    s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
       |pd AS (
       |  SELECT vec_id, t, j,
       |    list_sum(list_transform(generate_series(1, len(e)), d ->
       |      CAST(e[d] AS DOUBLE) *
       |      (CAST((((t*$nPlanes + j)*8191 + (d-1)) * 2654435761) % 1000003 AS DOUBLE) / 1000003.0 - 0.5))) AS dotj
       |  FROM (SELECT vec_id, e, unnest(generate_series(0, ${nTables - 1})) AS t FROM v),
       |       (SELECT unnest(generate_series(0, ${nPlanes - 1})) AS j)
       |),
       |bt AS (
       |  SELECT vec_id, t, CAST(sum(CASE WHEN dotj > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM pd GROUP BY vec_id, t
       |),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM bt a JOIN bt b ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id
       |),
       |s AS (
       |  SELECT c.id_a, c.id_b,
       |    ${listCos("va.e", "vb.e")} AS cosine
       |  FROM cand c JOIN v va ON c.id_a = va.vec_id JOIN v vb ON c.id_b = vb.vec_id
       |)
       |SELECT id_a, id_b, round(cosine, 4) AS cosine FROM s WHERE cosine >= $threshold""".stripMargin

  /** Exact mirror of Dedup.knnGraph: same signed-random-projection buckets as
    * [[embeddingLshPairsSql]], candidates DIRECTED (both orientations), rank
    * by (cosine rounded to 4 desc, neighbor id asc), keep rank ≤ k. */
  /** Shared CTE chain of [[knnGraphSql]] / [[mutualKnnClustersSql]] — emits
    * `kg(src, nbr, cosine, rank)`, the directed approximate-kNN edge list,
    * so the two oracles cannot diverge on candidates or ranking. */
  private def knnGraphCtes(k: Int, nPlanes: Int, nTables: Int): String =
    s"""v AS (SELECT vec_id, embedding AS e FROM embeddings),
       |pd AS (
       |  SELECT vec_id, t, j,
       |    list_sum(list_transform(generate_series(1, len(e)), d ->
       |      CAST(e[d] AS DOUBLE) *
       |      (CAST((((t*$nPlanes + j)*8191 + (d-1)) * 2654435761) % 1000003 AS DOUBLE) / 1000003.0 - 0.5))) AS dotj
       |  FROM (SELECT vec_id, e, unnest(generate_series(0, ${nTables - 1})) AS t FROM v),
       |       (SELECT unnest(generate_series(0, ${nPlanes - 1})) AS j)
       |),
       |bt AS (
       |  SELECT vec_id, t, CAST(sum(CASE WHEN dotj > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM pd GROUP BY vec_id, t
       |),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS src, b.vec_id AS nbr
       |  FROM bt a JOIN bt b ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id <> b.vec_id
       |),
       |s AS (
       |  SELECT c.src, c.nbr,
       |    round(${listCos("va.e", "vb.e")}, 4) AS cosine
       |  FROM cand c JOIN v va ON c.src = va.vec_id JOIN v vb ON c.nbr = vb.vec_id
       |),
       |r AS (
       |  SELECT src, nbr, cosine,
       |         row_number() OVER (PARTITION BY src ORDER BY cosine DESC, nbr ASC) AS rn
       |  FROM s
       |),
       |kg AS (SELECT src, nbr, cosine, rn FROM r WHERE rn <= $k)""".stripMargin

  def knnGraphSql(k: Int, nPlanes: Int, nTables: Int): String =
    s"""WITH ${knnGraphCtes(k, nPlanes, nTables)}
       |SELECT src, nbr, cosine + 0.0 AS cosine, CAST(rn AS BIGINT) AS rank
       |FROM kg""".stripMargin

  /** Exact mirror of Dedup.mutualKnnClusters: undirected edge iff BOTH
    * directed kNN edges exist ([[knnGraphCtes]] both ways), components =
    * min reachable vec_id over those edges; every embeddings row returned
    * (singletons label themselves). Must run under `WITH RECURSIVE`. */
  def mutualKnnClustersSql(k: Int, nPlanes: Int, nTables: Int): String =
    s"""WITH RECURSIVE ${knnGraphCtes(k, nPlanes, nTables)},
       |mut AS (
       |  SELECT a.src AS id_a, a.nbr AS id_b
       |  FROM kg a JOIN kg b ON a.src = b.nbr AND a.nbr = b.src
       |  WHERE a.src < a.nbr
       |),
       |medges AS (SELECT id_a AS a, id_b AS b FROM mut UNION SELECT id_b AS a, id_a AS b FROM mut),
       |mreach(msrc, mdst) AS (
       |  SELECT vec_id, vec_id FROM embeddings
       |  UNION
       |  SELECT r.msrc, e.b FROM mreach r JOIN medges e ON r.mdst = e.a
       |)
       |SELECT msrc AS vec_id, min(mdst) AS component FROM mreach GROUP BY msrc""".stripMargin

  /** Exact mirror of Dedup.editVerifiedPairs (default 8×4 banding): LSH band
    * candidates from [[minHashBandCtes]], verified by integer-normalized
    * Levenshtein — both engines implement unit-cost edit distance and the
    * corpus is ASCII, so the DP value is engine-independent. */
  def editVerifiedPairsSql(maxDistMilli: Long): String =
    s"""WITH $shingleCtes,
       |${minHashBandCtes("dsh", "doc_id")},
       |ev AS (
       |  SELECT m.id_a, m.id_b,
       |    (CAST(levenshtein(a.text, b.text) AS BIGINT) * 1000)
       |      // greatest(length(a.text), length(b.text)) AS edit_milli
       |  FROM mcand m
       |  JOIN documents a ON m.id_a = a.doc_id
       |  JOIN documents b ON m.id_b = b.doc_id
       |)
       |SELECT id_a, id_b, edit_milli FROM ev WHERE edit_milli <= $maxDistMilli""".stripMargin

  /** Per-document character-code list: `cs[i]` = code point of the i-th
    * character of `text` (1-based). The corpus is ASCII (measured: max code
    * point 121 at every SF), so `string_split(text, '')` + `ascii` is exactly
    * the code-point sequence KGramHashPairsExpr hashes. Computed ONCE per doc
    * — every gram hash then indexes into it in O(1), which is what makes the
    * span-oracle family run in sub-second instead of the O(k·len²)
    * substring-rescan the driver timed out on in round 9. */
  private val charCodesSql: String =
    "list_transform(string_split(text, ''), ch -> ascii(ch))"

  /** The two weighted code-point sums of the k-gram at 1-based position
    * `posExpr`, expressed over a precomputed char-code list column `cs`
    * (see [[charCodesSql]]) — mirrors KGramHashPairsExpr BY VALUE: the same
    * splitmix64 weight table the expression uses, embedded as per-term SQL
    * literals (unrolled k-term sum, no lambda, O(k) per gram); all products
    * < 2⁶³, so both engines sum exactly. `family` = 1 or 2. */
  private def gramHashSql(posExpr: String, k: Int, family: Int): String = {
    val w = (0 until k).map(p =>
      if (family == 1) graft.functions.KGramHashPairsExpr.weight1(p)
      else graft.functions.KGramHashPairsExpr.weight2(p))
    "CAST(" + (0 until k).map(j => s"cs[$posExpr+$j]*${w(j)}").mkString(" + ") +
      " AS BIGINT)"
  }

  /** Span CTE chain `g → dup → d → r → sp` mirroring Dedup.duplicateSpans on
    * the documents table: sp(doc_id, s, e, ng) = maximal runs of k-gram
    * positions whose (h1, h2) gram identity occurs in ≥ 2 distinct docs. */
  def dupSpanCtes(k: Int): String =
    s"""WITH cl AS (
       |  SELECT doc_id, $charCodesSql AS cs,
       |         greatest(length(text) - ${k - 1}, 0) AS ngr FROM documents
       |),
       |g AS (
       |  SELECT doc_id, CAST(gp AS BIGINT) AS p,
       |         ${gramHashSql("gp", k, 1)} AS h1,
       |         ${gramHashSql("gp", k, 2)} AS h2
       |  FROM (SELECT doc_id, cs,
       |          unnest(generate_series(1, ngr)) AS gp
       |        FROM cl)
       |),
       |dup AS (SELECT h1, h2 FROM g GROUP BY h1, h2 HAVING count(DISTINCT doc_id) >= 2),
       |d AS (SELECT doc_id, p FROM g JOIN dup USING (h1, h2)),
       |r AS (
       |  SELECT doc_id, p,
       |         p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS isl
       |  FROM d
       |),
       |sp AS (
       |  SELECT doc_id, min(p) AS s, max(p) + ${k - 1} AS e, count(*) AS ng
       |  FROM r GROUP BY doc_id, isl
       |)""".stripMargin

  /** [[dupSpanCtes]] with the TOTAL-occurrence duplication rule (mirrors
    * Dedup.duplicateSpansAll: a gram qualifies at >= 2 occurrences anywhere,
    * within-doc repeats included) — only the HAVING clause differs. */
  def dupSpanCtesAll(k: Int): String =
    s"""WITH cl AS (
       |  SELECT doc_id, $charCodesSql AS cs,
       |         greatest(length(text) - ${k - 1}, 0) AS ngr FROM documents
       |),
       |g AS (
       |  SELECT doc_id, CAST(gp AS BIGINT) AS p,
       |         ${gramHashSql("gp", k, 1)} AS h1,
       |         ${gramHashSql("gp", k, 2)} AS h2
       |  FROM (SELECT doc_id, cs,
       |          unnest(generate_series(1, ngr)) AS gp
       |        FROM cl)
       |),
       |dup AS (SELECT h1, h2 FROM g GROUP BY h1, h2 HAVING count(*) >= 2),
       |d AS (SELECT doc_id, p FROM g JOIN dup USING (h1, h2)),
       |r AS (
       |  SELECT doc_id, p,
       |         p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS isl
       |  FROM d
       |),
       |sp AS (
       |  SELECT doc_id, min(p) AS s, max(p) + ${k - 1} AS e, count(*) AS ng
       |  FROM r GROUP BY doc_id, isl
       |)""".stripMargin

  /** Span CTE chain mirroring Decontaminate.contaminatedSpans: corpus rows =
    * documents WHERE corpusPred, benchmark gram hashes from documents WHERE
    * benchPred; sp = maximal corpus runs whose gram hash occurs ANYWHERE in
    * the benchmark text. */
  /** Mirror of Decontaminate.benchCoverage: distinct bench grams vs the
    * distinct matched grams, integer micro coverage ratio. */
  def benchCoverageSql(k: Int, corpusPred: String, benchPred: String): String =
    s"""WITH cl AS (
       |  SELECT doc_id, $charCodesSql AS cs,
       |         greatest(length(text) - ${k - 1}, 0) AS ngr FROM documents
       |),
       |bh AS (
       |  SELECT DISTINCT ${gramHashSql("gp", k, 1)} AS h1,
       |         ${gramHashSql("gp", k, 2)} AS h2
       |  FROM (SELECT c.cs, unnest(generate_series(1, c.ngr)) AS gp
       |        FROM cl c JOIN documents USING (doc_id) WHERE $benchPred)
       |),
       |cg AS (
       |  SELECT ${gramHashSql("gp", k, 1)} AS h1,
       |         ${gramHashSql("gp", k, 2)} AS h2
       |  FROM (SELECT c.cs, unnest(generate_series(1, c.ngr)) AS gp
       |        FROM cl c JOIN documents USING (doc_id) WHERE $corpusPred)
       |),
       |f AS (SELECT DISTINCT cg.h1, cg.h2 FROM cg
       |      JOIN bh ON bh.h1 = cg.h1 AND bh.h2 = cg.h2)
       |SELECT CAST((SELECT count(*) FROM bh) AS BIGINT) AS n_bench,
       |  CAST((SELECT count(*) FROM f) AS BIGINT) AS n_found,
       |  CAST((SELECT count(*) FROM f) * 1000000 // (SELECT count(*) FROM bh) AS BIGINT)
       |    AS coverage_micro""".stripMargin

  def contamSpanCtes(k: Int, corpusPred: String, benchPred: String): String =
    s"""WITH cl AS (
       |  SELECT doc_id, $charCodesSql AS cs,
       |         greatest(length(text) - ${k - 1}, 0) AS ngr FROM documents
       |),
       |g AS (
       |  SELECT doc_id, CAST(gp AS BIGINT) AS p,
       |         ${gramHashSql("gp", k, 1)} AS h1,
       |         ${gramHashSql("gp", k, 2)} AS h2
       |  FROM (SELECT c.doc_id, c.cs, unnest(generate_series(1, c.ngr)) AS gp
       |        FROM cl c JOIN documents USING (doc_id) WHERE $corpusPred)
       |),
       |bh AS (
       |  SELECT DISTINCT ${gramHashSql("gp", k, 1)} AS h1,
       |         ${gramHashSql("gp", k, 2)} AS h2
       |  FROM (SELECT c.cs, unnest(generate_series(1, c.ngr)) AS gp
       |        FROM cl c JOIN documents USING (doc_id) WHERE $benchPred)
       |),
       |d AS (SELECT doc_id, p FROM g JOIN bh USING (h1, h2)),
       |r AS (
       |  SELECT doc_id, p,
       |         p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS isl
       |  FROM d
       |),
       |sp AS (
       |  SELECT doc_id, min(p) AS s, max(p) + ${k - 1} AS e, count(*) AS ng
       |  FROM r GROUP BY doc_id, isl
       |)""".stripMargin

  /** Exact mirror of Decontaminate.leakReport on the documents table:
    * corpus = rows WHERE corpusPred (distinct gram identities only), bench =
    * rows WHERE benchPred; one row per bench doc with the integer-milli
    * leaked-gram fraction. */
  def leakReportSql(k: Int, corpusPred: String, benchPred: String): String =
    s"""WITH cl AS (
       |  SELECT doc_id, $charCodesSql AS cs,
       |         greatest(length(text) - ${k - 1}, 0) AS ngr FROM documents
       |),
       |cg AS (
       |  SELECT DISTINCT ${gramHashSql("gp", k, 1)} AS h1,
       |         ${gramHashSql("gp", k, 2)} AS h2
       |  FROM (SELECT c.cs, unnest(generate_series(1, c.ngr)) AS gp
       |        FROM cl c JOIN documents USING (doc_id) WHERE $corpusPred)
       |),
       |bg AS (
       |  SELECT doc_id, ${gramHashSql("gp", k, 1)} AS h1,
       |         ${gramHashSql("gp", k, 2)} AS h2
       |  FROM (SELECT c.doc_id, c.cs, unnest(generate_series(1, c.ngr)) AS gp
       |        FROM cl c JOIN documents USING (doc_id) WHERE $benchPred)
       |),
       |lk AS (SELECT doc_id, count(*) AS leaked FROM bg JOIN cg USING (h1, h2) GROUP BY doc_id)
       |SELECT d.doc_id, CAST(greatest(length(d.text) - ${k - 1}, 0) AS BIGINT) AS total_grams,
       |       coalesce(l.leaked, 0) AS leaked_grams,
       |       CASE WHEN length(d.text) > ${k - 1}
       |            THEN (coalesce(l.leaked, 0) * 1000) // (length(d.text) - ${k - 1})
       |            ELSE 0 END AS leak_milli
       |FROM documents d LEFT JOIN lk l USING (doc_id)
       |WHERE $benchPred""".stripMargin

  /** Word-gram span CTE chain mirroring Dedup.duplicateSpansWords on the
    * documents table: emits `wsp(doc_id, ws, we, ng)` — maximal runs of
    * n-word grams (words = `[a-z]+` runs of lower(text), grams valued as the
    * words joined by single spaces, hashed with KGramHashPairsExpr's weight
    * tables BY VALUE) present in ≥ 2 distinct docs, 1-based word positions. */
  def wordSpanCtes(n: Int): String = {
    val gram = (0 until n).map(k => s"ws[i+$k]").mkString(" || ' ' || ")
    // The expression's weight tables by value, hoisted into a ONE-ROW `wt`
    // CTE (512 = MaxGramChars bound; an over-long gram would index past the
    // list and null out loudly rather than silently diverge). The hash then
    // splits the gram once and O(1)-indexes the weight lists via an indexed
    // lambda — the per-gram 512-literal re-materialization this replaces is
    // what made the driver's round-9 gate time out (258 s for this one query
    // at sf0.01; now sub-second). Gram strings are `[a-z ]`-only, so
    // string_split(gr, '') is exactly the code-point sequence.
    def h(family: Int) =
      s"CAST(list_sum(list_transform(string_split(gr, ''), (ch, j) -> " +
        s"ascii(ch) * w${family}l[j])) AS BIGINT)"
    def wlist(family: Int) = {
      val w = (0 until graft.functions.KGramHashPairsExpr.MaxGramChars).map(p =>
        if (family == 1) graft.functions.KGramHashPairsExpr.weight1(p)
        else graft.functions.KGramHashPairsExpr.weight2(p))
      s"[${w.mkString(",")}]"
    }
    s"""WITH wt AS (SELECT ${wlist(1)} AS w1l, ${wlist(2)} AS w2l),
       |d0 AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws FROM documents),
       |g0 AS (
       |  SELECT doc_id, CAST(i AS BIGINT) AS p, $gram AS gr
       |  FROM (SELECT doc_id, ws,
       |          unnest(generate_series(1, greatest(len(ws) - ${n - 1}, 0))) AS i
       |        FROM d0)
       |  WHERE i <= len(ws) - ${n - 1}
       |),
       |g AS (
       |  SELECT doc_id, p, ${h(1)} AS h1,
       |         ${h(2)} AS h2
       |  FROM g0 CROSS JOIN wt
       |),
       |dup AS (SELECT h1, h2 FROM g GROUP BY h1, h2 HAVING count(DISTINCT doc_id) >= 2),
       |d AS (SELECT doc_id, p FROM g JOIN dup USING (h1, h2)),
       |r AS (
       |  SELECT doc_id, p,
       |         p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS isl
       |  FROM d
       |),
       |wsp AS (
       |  SELECT doc_id, min(p) AS ws, max(p) + ${n - 1} AS we, count(*) AS ng
       |  FROM r GROUP BY doc_id, isl
       |)""".stripMargin
  }

  /** Final word-span listing (mirrors Dedup.duplicateSpansWords's output). */
  def wordSpanListSql(n: Int): String =
    s"""${wordSpanCtes(n)}
       |SELECT doc_id, ws AS word_start, we AS word_end, ng AS n_grams FROM wsp""".stripMargin

  /** [[wordSpanCtes]] + the word-index → char-interval mapping (mirrors
    * Dedup.wordCharIntervals: word i = i-th maximal `[a-z]` run of
    * lower(text), 1-based code-point positions) + the char-span projection —
    * emits `sp(doc_id, s, e, ng)` so [[spanCleanSql]] composes on top. */
  def wordSpanCleanCtes(n: Int): String =
    s"""${wordSpanCtes(n)},
       |wiv AS (
       |  SELECT doc_id,
       |         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY cs) AS BIGINT) AS wi,
       |         cs, ce
       |  FROM (
       |    SELECT doc_id, min(p) AS cs, max(p) AS ce
       |    FROM (
       |      SELECT doc_id, p,
       |             p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS isl
       |      FROM (
       |        -- char table via ZIPPED unnest (positions × split chars, equal
       |        -- lengths on this ASCII corpus) — O(len) per doc, not the
       |        -- O(len²) per-position substring rescan
       |        SELECT doc_id, CAST(cp AS BIGINT) AS p, c
       |        FROM (SELECT doc_id,
       |                unnest(generate_series(1, length(text))) AS cp,
       |                unnest(list_transform(string_split(lower(text), ''), ch -> ascii(ch))) AS c
       |              FROM documents WHERE length(text) > 0)
       |      ) WHERE c BETWEEN 97 AND 122
       |    )
       |    GROUP BY doc_id, isl
       |  )
       |),
       |sp AS (
       |  SELECT w.doc_id, a.cs AS s, b.ce AS e, w.ng
       |  FROM wsp w
       |  JOIN wiv a ON w.doc_id = a.doc_id AND w.ws = a.wi
       |  JOIN wiv b ON w.doc_id = b.doc_id AND w.we = b.wi
       |)""".stripMargin

  /** Final span listing over a `sp(doc_id, s, e, ng)` CTE chain. */
  def spanListSql(spanCtes: String): String =
    s"""$spanCtes
       |SELECT doc_id, s AS span_start, e AS span_end, ng AS n_grams FROM sp""".stripMargin

  /** Interval union-merge + per-doc duplication stats over a
    * `sp(doc_id, s, e, ng)` CTE chain (mirrors Dedup.spanDuplicationStats):
    * every doc of `docSel` is returned; dup_milli = integer-milli duplicated
    * fraction, 0 for span-free or empty docs. */
  def spanStatsSql(spanCtes: String, docSel: String): String =
    s"""$spanCtes,
       |mg0 AS (
       |  SELECT doc_id, s, e,
       |    CASE WHEN s > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY s, e
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |           -4611686018427387904) + 1
       |         THEN 1 ELSE 0 END AS newg
       |  FROM sp
       |),
       |mg1 AS (
       |  SELECT doc_id, s, e,
       |         sum(newg) OVER (PARTITION BY doc_id ORDER BY s, e) AS grp
       |  FROM mg0
       |),
       |mg AS (SELECT doc_id, min(s) AS s, max(e) AS e FROM mg1 GROUP BY doc_id, grp),
       |rem AS (SELECT doc_id, sum(e - s + 1) AS removed FROM mg GROUP BY doc_id),
       |doc AS ($docSel)
       |SELECT dd.doc_id, CAST(length(dd.text) AS BIGINT) AS total_chars,
       |       CAST(coalesce(r.removed, 0) AS BIGINT) AS dup_chars,
       |       CAST(CASE WHEN length(dd.text) > 0
       |            THEN (coalesce(r.removed, 0) * 1000) // length(dd.text)
       |            ELSE 0 END AS BIGINT) AS dup_milli
       |FROM doc dd
       |LEFT JOIN rem r USING (doc_id)""".stripMargin

  /** Interval union-merge + lag-segment splice over a `sp(doc_id, s, e, ng)`
    * CTE chain (mirrors Dedup.cutSpans): every doc of `docSel` is returned;
    * docs with no span pass through with removed_chars = 0.
    *
    * DuckDB-version-robust by construction: `segs` never emits a zero-length
    * segment (so no `substring(_, _, 0)` whose ''-vs-NULL result varies
    * across DuckDB releases), every surviving segment is wrapped in
    * `coalesce(substring(...), '')`, and a span-BEARING doc whose segments
    * all vanished gets an explicit `''` — never the `ct -> text` fallback
    * that resurrected the original text when `string_agg` collapsed to NULL.
    * @param docSel relation `(doc_id, text)` whose text is rewritten */
  def spanCleanSql(spanCtes: String, docSel: String): String =
    s"""$spanCtes,
       |mg0 AS (
       |  SELECT doc_id, s, e,
       |    CASE WHEN s > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY s, e
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |           -4611686018427387904) + 1
       |         THEN 1 ELSE 0 END AS newg
       |  FROM sp
       |),
       |mg1 AS (
       |  SELECT doc_id, s, e,
       |         sum(newg) OVER (PARTITION BY doc_id ORDER BY s, e) AS grp
       |  FROM mg0
       |),
       |mg AS (SELECT doc_id, min(s) AS s, max(e) AS e FROM mg1 GROUP BY doc_id, grp),
       |rem AS (SELECT doc_id, sum(e - s + 1) AS removed FROM mg GROUP BY doc_id),
       |doc AS ($docSel),
       |segs AS (
       |  SELECT doc_id, fp, tp FROM (
       |    SELECT doc_id,
       |           coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) + 1 AS fp,
       |           s - 1 AS tp
       |    FROM mg
       |  ) WHERE tp >= fp
       |  UNION ALL
       |  SELECT m.doc_id, max(m.e) + 1 AS fp, max(length(dd.text)) AS tp
       |  FROM mg m JOIN doc dd USING (doc_id)
       |  GROUP BY m.doc_id
       |  HAVING max(m.e) + 1 <= max(length(dd.text))
       |),
       |clean0 AS (
       |  SELECT sg.doc_id,
       |    string_agg(coalesce(substring(dd.text, CAST(sg.fp AS INTEGER),
       |        CAST(sg.tp - sg.fp + 1 AS INTEGER)), ''),
       |      '' ORDER BY sg.fp) AS ct
       |  FROM segs sg JOIN doc dd USING (doc_id)
       |  GROUP BY sg.doc_id
       |)
       |SELECT dd.doc_id,
       |       CASE WHEN r.removed IS NOT NULL THEN coalesce(c.ct, '')
       |            ELSE dd.text END AS clean_text,
       |       CAST(coalesce(r.removed, 0) AS BIGINT) AS removed_chars
       |FROM doc dd
       |LEFT JOIN clean0 c USING (doc_id)
       |LEFT JOIN rem r USING (doc_id)""".stripMargin

  /** Deterministic polynomial string hash (mirrors TextFunctions.tHash). */
  def tHashSql(sExpr: String): String =
    s"CAST(COALESCE(list_sum(list_transform(generate_series(1, length($sExpr)), i -> " +
      s"ascii(substring($sExpr, i, 1)) * " +
      "([1,31,961,29791,923521,28629151,887503681,27512614111])[((i-1)%8)+1])), 0) AS BIGINT)"

  /** SimHash fingerprint CTEs over document shingles: emits `fp(doc_id, simhash1, simhash2)`.
    * Mirrors Dedup.simHashFingerprints. */
  val simHashCtes: String = {
    val sums = (1 to 2).flatMap { h =>
      (0 until 32).map(b => s"SUM(((g$h >> $b) & 1) * 2 - 1) AS s${h}_$b")
    }.mkString(",\n    ")
    def halfExpr(h: Int) =
      (0 until 32).map(b => s"(CASE WHEN s${h}_$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")
    s"""$shingleCtes,
       |dth AS (
       |  SELECT doc_id,
       |    (2654435761 * (th % 65521)) % 4294967296 AS g1,
       |    (2246822519 * (th % 65521)) % 4294967296 AS g2
       |  FROM (SELECT doc_id, ${tHashSql("sh")} AS th FROM dsh)
       |),
       |ssum AS (
       |  SELECT doc_id,
       |    $sums
       |  FROM dth GROUP BY doc_id
       |),
       |fp AS (
       |  SELECT doc_id,
       |    CAST(${halfExpr(1)} AS BIGINT) AS simhash1,
       |    CAST(${halfExpr(2)} AS BIGINT) AS simhash2
       |  FROM ssum
       |)""".stripMargin
  }

  /** Embedding pair CTEs: emits `cosims(id_a, id_b, cosine)` over all vec pairs a<b. */
  val embeddingPairCtes: String =
    """ep AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.embedding AS ea, b.embedding AS eb
      |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |),
      |cosims AS (
      |  SELECT id_a, id_b,
      |    list_sum(list_transform(generate_series(1, len(ea)), i -> CAST(ea[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(generate_series(1, len(ea)), i -> CAST(ea[i] AS DOUBLE) * CAST(ea[i] AS DOUBLE))))
      |     * sqrt(list_sum(list_transform(generate_series(1, len(eb)), i -> CAST(eb[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE))))) AS cosine
      |  FROM ep
      |)""".stripMargin

  /** English stopword list as a SQL IN-list (mirrors TextFunctions.StopwordLists head). */
  def stopIn(words: Seq[String]): String = words.map(w => s"'$w'").mkString("(", ", ", ")")

  /** Shared quality-score CTEs over `documents`: emits `scored(doc_id,
    * quality)` — exact mirror of TextFunctions.qualityScoreCol (round 6),
    * consumed by both the text_quality and quality_filter oracles. */
  /** Exact mirror of Bm25.topK with the query side = documents WHERE
    * `queryPred`: integer micro-nat idf (floor(ln·1e6)), per-term floored
    * integer contributions summed exactly, per-query row_number top-k with
    * doc-id tie-break. Double literals are interpolated from the SAME Scala
    * doubles the operator folds (`k1+1`, `1−b`), so both engines parse the
    * identical IEEE values. */
  def bm25Sql(k: Int, k1: Double, b: Double, queryPred: String): String =
    s"""WITH tf AS (
       |  SELECT d, w, count(*) AS tf FROM (
       |    SELECT doc_id AS d, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents
       |  ) GROUP BY d, w
       |),
       |dl AS (SELECT d, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY d),
       |tot AS (SELECT CAST(sum(dl) AS BIGINT) AS tw, count(*) AS nd FROM dl),
       |idf AS (
       |  SELECT w, CAST(floor(ln((CAST(nd AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
       |    / (CAST(df AS DOUBLE) + 0.5) + 1.0) * 1000000.0) AS BIGINT) AS idf
       |  FROM (SELECT w, count(*) AS df FROM tf GROUP BY w), tot
       |),
       |qt AS (
       |  SELECT DISTINCT q, w FROM (
       |    SELECT doc_id AS q, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
       |    FROM documents WHERE $queryPred
       |  )
       |),
       |contrib AS (
       |  SELECT qt.q, tf.d,
       |    CAST(floor(CAST(idf.idf AS DOUBLE) *
       |      (CAST(tf.tf AS DOUBLE) * ${k1 + 1.0} /
       |       (CAST(tf.tf AS DOUBLE) + $k1 * (${1.0 - b} + $b *
       |        (CAST(dl.dl AS DOUBLE) / (CAST(tot.tw AS DOUBLE) / CAST(tot.nd AS DOUBLE)))))))
       |      AS BIGINT) AS c
       |  FROM tf JOIN qt USING (w) JOIN idf USING (w) JOIN dl USING (d), tot
       |),
       |scores AS (SELECT q, d, CAST(sum(c) AS BIGINT) AS score_micro FROM contrib GROUP BY q, d),
       |r AS (
       |  SELECT q, d, score_micro,
       |    row_number() OVER (PARTITION BY q ORDER BY score_micro DESC, d) AS rnk
       |  FROM scores
       |)
       |SELECT q AS query_id, d AS doc_id, score_micro, CAST(rnk AS BIGINT) AS rank
       |FROM r WHERE rnk <= $k""".stripMargin

  /** Mirror of Bm25.topKPrf: the bm25Sql chain run twice — round 1 on the
    * raw query terms picks fbDocs feedback docs, expansion = top fbTerms by
    * (Σ tf in feedback docs DESC, term ASC) minus the original terms, round
    * 2 re-ranks on the union vocabulary. */
  def bm25PrfSql(
      k: Int, fbDocs: Int, fbTerms: Int, queryPred: String,
      k1: Double = 1.2, b: Double = 0.75): String = {
    def contrib(qt: String): String =
      s"""SELECT $qt.q, tf.d,
         |    CAST(floor(CAST(idf.idf AS DOUBLE) *
         |      (CAST(tf.tf AS DOUBLE) * ${k1 + 1.0} /
         |       (CAST(tf.tf AS DOUBLE) + $k1 * (${1.0 - b} + $b *
         |        (CAST(dl.dl AS DOUBLE) / (CAST(tot.tw AS DOUBLE) / CAST(tot.nd AS DOUBLE)))))))
         |      AS BIGINT) AS c
         |  FROM tf JOIN $qt USING (w) JOIN idf USING (w) JOIN dl USING (d), tot""".stripMargin
    s"""WITH tf AS (
       |  SELECT d, w, count(*) AS tf FROM (
       |    SELECT doc_id AS d, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents
       |  ) GROUP BY d, w
       |),
       |dl AS (SELECT d, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY d),
       |tot AS (SELECT CAST(sum(dl) AS BIGINT) AS tw, count(*) AS nd FROM dl),
       |idf AS (
       |  SELECT w, CAST(floor(ln((CAST(nd AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
       |    / (CAST(df AS DOUBLE) + 0.5) + 1.0) * 1000000.0) AS BIGINT) AS idf
       |  FROM (SELECT w, count(*) AS df FROM tf GROUP BY w), tot
       |),
       |qt0 AS (
       |  SELECT DISTINCT q, w FROM (
       |    SELECT doc_id AS q, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
       |    FROM documents WHERE $queryPred
       |  )
       |),
       |c0 AS (
       |  ${contrib("qt0")}
       |),
       |s0 AS (SELECT q, d, CAST(sum(c) AS BIGINT) AS sc FROM c0 GROUP BY q, d),
       |fb AS (
       |  SELECT q, d FROM (
       |    SELECT q, d, row_number() OVER (PARTITION BY q ORDER BY sc DESC, d) AS rnk FROM s0
       |  ) WHERE rnk <= $fbDocs
       |),
       |votes AS (
       |  SELECT fb.q, tf.w, CAST(sum(tf.tf) AS BIGINT) AS s
       |  FROM fb JOIN tf ON tf.d = fb.d GROUP BY fb.q, tf.w
       |),
       |ex AS (
       |  SELECT q, w FROM (
       |    SELECT v.q, v.w,
       |      row_number() OVER (PARTITION BY v.q ORDER BY v.s DESC, v.w ASC) AS rn
       |    FROM votes v LEFT JOIN qt0 ON qt0.q = v.q AND qt0.w = v.w
       |    WHERE qt0.w IS NULL
       |  ) WHERE rn <= $fbTerms
       |),
       |qt1 AS (SELECT q, w FROM qt0 UNION SELECT q, w FROM ex),
       |c1 AS (
       |  ${contrib("qt1")}
       |),
       |s1 AS (SELECT q, d, CAST(sum(c) AS BIGINT) AS score_micro FROM c1 GROUP BY q, d),
       |r1 AS (
       |  SELECT q, d, score_micro,
       |    row_number() OVER (PARTITION BY q ORDER BY score_micro DESC, d) AS rnk
       |  FROM s1
       |)
       |SELECT q AS query_id, d AS doc_id, score_micro, CAST(rnk AS BIGINT) AS rank
       |FROM r1 WHERE rnk <= $k""".stripMargin
  }

  /**
   * Exact mirror of the `hybrid_rrf` gate: [[bm25Sql]]'s full ranking and a
   * brute dense top-k (rank re-derived from the ROUNDED cosine with id ties,
   * exactly like the Spark side) fused by reciprocal rank —
   * `Σ 1/(kRrf + rank)`, fixed two-term order, ties by doc id.
   */
  def hybridRrfSql(
      k: Int, kRrf: Int, bmPred: String, densePred: String,
      k1: Double = 1.2, b: Double = 0.75): String =
    s"""WITH bm AS (
       |${bm25Sql(k, k1, b, bmPred)}
       |),
       |dq AS (SELECT vec_id, embedding AS e FROM embeddings WHERE $densePred),
       |dp AS (
       |  SELECT dq.vec_id AS query_id, c.vec_id AS neighbor_id, dq.e AS ea, c.embedding AS eb
       |  FROM dq JOIN embeddings c ON dq.vec_id <> c.vec_id
       |),
       |ds AS (SELECT query_id, neighbor_id, ${listCos("ea", "eb")} AS cosine FROM dp),
       |dt AS (
       |  SELECT query_id, neighbor_id, round(cosine, 4) AS rcos FROM (
       |    SELECT query_id, neighbor_id, cosine,
       |           row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rn
       |    FROM ds) WHERE rn <= $k
       |),
       |dr AS (
       |  SELECT query_id, neighbor_id AS doc_id,
       |         row_number() OVER (PARTITION BY query_id ORDER BY rcos DESC, neighbor_id ASC) AS rank
       |  FROM dt
       |),
       |u AS (
       |  SELECT coalesce(b2.query_id, d.query_id) AS query_id,
       |         coalesce(b2.doc_id, d.doc_id) AS doc_id,
       |         b2.rank AS ra, d.rank AS rb
       |  FROM bm b2 FULL OUTER JOIN dr d
       |    ON b2.query_id = d.query_id AND b2.doc_id = d.doc_id
       |),
       |sc AS (
       |  SELECT query_id, doc_id,
       |    coalesce(1.0 / ($kRrf.0 + CAST(ra AS DOUBLE)), 0.0)
       |      + coalesce(1.0 / ($kRrf.0 + CAST(rb AS DOUBLE)), 0.0) AS score
       |  FROM u
       |),
       |rr AS (
       |  SELECT query_id, doc_id, score,
       |         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rn
       |  FROM sc
       |)
       |SELECT query_id, doc_id, round(score, 6) + 0.0 AS rrf_score, CAST(rn AS BIGINT) AS rank
       |FROM rr WHERE rn <= $k""".stripMargin

  def qualityScoredCtes: String = {
    val stops = stopIn(graft.functions.TextFunctions.StopwordLists.head._2)
    s"""d AS (SELECT doc_id, text, regexp_extract_all(lower(text), '[a-z]+') AS ws FROM documents),
       |m AS (
       |  SELECT doc_id, length(text) AS rawchars, len(ws) AS rawwords,
       |    CAST(length(text) AS DOUBLE) AS nchars,
       |    CAST(len(ws) AS DOUBLE) AS nwords,
       |    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) AS alpha,
       |    CAST(len(list_filter(ws, w -> w IN $stops)) AS DOUBLE) AS stops
       |  FROM d
       |),
       |scored AS (
       |  SELECT doc_id,
       |    CASE WHEN rawchars = 0 OR rawwords = 0 THEN 0.0
       |         ELSE round(0.4 * (alpha / nchars) + 0.4 * least(3.0 * (stops / nwords), 1.0)
       |                   + 0.2 * least((alpha / nwords) / 8.0, 1.0), 6) END AS quality
       |  FROM m
       |)""".stripMargin
  }

  /** Exact mirror of CuratePipeline.curate: quality filter ([[qualityScoredCtes]])
    * → keep min doc id per md5(text) → integer floor-sqrt temperature quotas
    * → per-source rank by (tHash priority, id), rank ≤ quota. */
  /** The curate chain WITHOUT the WITH keyword, ending in
    * `csel(doc_id, source, rank)` — shared by [[curatePipelineSql]] and the
    * composed [[pipelineShardsSql]]. */
  private def curatePipelineCtes(minQuality: Double, budget: Long): String = {
    val pr = s"((${tHashSql("CAST(u.doc_id AS VARCHAR)")} % 1048576) + 1048576) % 1048576"
    s"""$qualityScoredCtes,
       |qd AS (
       |  SELECT d2.doc_id, d2.source, d2.text
       |  FROM documents d2 JOIN scored s USING (doc_id)
       |  WHERE s.quality >= $minQuality
       |),
       |u AS (
       |  SELECT doc_id, source FROM (
       |    SELECT doc_id, source, min(doc_id) OVER (PARTITION BY md5(text)) AS kd FROM qd
       |  ) WHERE doc_id = kd
       |),
       |c AS (SELECT source, count(*) AS n FROM u GROUP BY 1),
       |w AS (SELECT source, CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS w FROM c),
       |twc AS (SELECT sum(w) AS tw FROM w),
       |qt AS (SELECT source, (w * $budget) // tw AS quota FROM w, twc),
       |p AS (
       |  SELECT u.doc_id, u.source,
       |    row_number() OVER (PARTITION BY u.source ORDER BY $pr, u.doc_id) AS rnk
       |  FROM u
       |),
       |csel AS (
       |  SELECT p.doc_id, p.source, CAST(rnk AS BIGINT) AS rank
       |  FROM p JOIN qt USING (source) WHERE rnk <= qt.quota
       |)""".stripMargin
  }

  def curatePipelineSql(minQuality: Double, budget: Long): String =
    s"""WITH ${curatePipelineCtes(minQuality, budget)}
       |SELECT doc_id, source, rank FROM csel""".stripMargin

  /** Mirror of the composed shard-building pipeline (curate → greedy pack →
    * HRW bin sharding): the curate chain verbatim, token counts re-derived,
    * the packGreedy fold unrolled as a recursive CTE over per-source
    * row_number chains, and the rendezvous argmax over the composite bin
    * key — every stage the same formula its standalone oracle uses. */
  def pipelineShardsSql(
      minQuality: Double, budget: Long, capacity: Long, nShards: Int): String =
    s"""WITH RECURSIVE ${curatePipelineCtes(minQuality, budget)},
       |dtok AS (
       |  SELECT c.doc_id, c.source,
       |    CAST(len(regexp_split_to_array(trim(d3.text), '\\s+')) AS BIGINT) AS n_tokens,
       |    row_number() OVER (PARTITION BY c.source ORDER BY c.doc_id) AS rn
       |  FROM csel c JOIN documents d3 USING (doc_id)
       |),
       |pk AS (
       |  SELECT source, doc_id, n_tokens, rn, n_tokens AS acc,
       |    CAST(0 AS BIGINT) AS bin
       |  FROM dtok WHERE rn = 1
       |  UNION ALL
       |  SELECT d.source, d.doc_id, d.n_tokens, d.rn,
       |    CASE WHEN pk.acc > 0 AND pk.acc + d.n_tokens > $capacity
       |         THEN d.n_tokens ELSE pk.acc + d.n_tokens END,
       |    CASE WHEN pk.acc > 0 AND pk.acc + d.n_tokens > $capacity
       |         THEN pk.bin + 1 ELSE pk.bin END
       |  FROM dtok d JOIN pk ON d.source = pk.source AND d.rn = pk.rn + 1
       |),
       |bk AS (
       |  SELECT source, doc_id, n_tokens, bin,
       |    ((${tHashSql("source")} % 1000003) + 1000003) % 1000003 * 4096 + bin AS bkey
       |  FROM pk
       |),
       |sh AS (
       |  SELECT source, doc_id, n_tokens, bin,
       |    list_transform(generate_series(0, ${nShards - 1}), s ->
       |      ((bkey % 1000003) * 8191 + s) % 1000003 * 2654435761 % 1000003) AS rw
       |  FROM bk
       |)
       |SELECT doc_id, source, n_tokens, bin,
       |  CAST(list_position(rw, list_aggregate(rw, 'max')) - 1 AS BIGINT) AS shard
       |FROM sh""".stripMargin

  /** Exact mirror of Dedup.chunkDedup: non-overlapping `w`-word chunks of the
    * lowercased `[a-z]+` word runs; a chunk is dup iff its exact text occurs
    * in ≥ `minDocs` DISTINCT docs; clean_text = space-join of surviving
    * chunks in order. Every doc returned (wordless → '', 0, 0). */
  def chunkDedupSql(w: Int, minDocs: Int, keepFirst: Boolean = false): String =
    s"""WITH d AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws FROM documents),
       |c AS (
       |  SELECT doc_id, gi,
       |    array_to_string(list_slice(ws, gi*$w + 1, least((gi+1)*$w, len(ws))), ' ') AS chunk
       |  FROM (SELECT doc_id, ws, unnest(generate_series(0, (len(ws) + ${w - 1}) // $w - 1)) AS gi
       |        FROM d WHERE len(ws) > 0)
       |),
       |dk AS (
       |  SELECT md5(chunk) AS ck, min(doc_id) AS kd
       |  FROM c GROUP BY 1 HAVING count(DISTINCT doc_id) >= $minDocs
       |),
       |kp AS (
       |  SELECT dk.ck, dk.kd, min(c.gi) AS kg
       |  FROM dk JOIN c ON md5(c.chunk) = dk.ck AND c.doc_id = dk.kd
       |  GROUP BY 1, 2
       |),
       |f AS (
       |  SELECT c.doc_id, c.gi, c.chunk,
       |         CASE WHEN kp.ck IS NOT NULL
       |              ${if (keepFirst) "AND NOT (c.doc_id = kp.kd AND c.gi = kp.kg)" else ""}
       |              THEN 1 ELSE 0 END AS isdup
       |  FROM c LEFT JOIN kp ON md5(c.chunk) = kp.ck
       |),
       |agg AS (
       |  SELECT doc_id, count(*) AS n_chunks, sum(isdup) AS dup_chunks,
       |    coalesce(string_agg(CASE WHEN isdup = 0 THEN chunk END, ' ' ORDER BY gi), '') AS ct
       |  FROM f GROUP BY doc_id
       |)
       |SELECT dd.doc_id, coalesce(a.ct, '') AS clean_text,
       |       CAST(coalesce(a.n_chunks, 0) AS BIGINT) AS n_chunks,
       |       CAST(coalesce(a.dup_chunks, 0) AS BIGINT) AS dup_chunks
       |FROM documents dd LEFT JOIN agg a USING (doc_id)""".stripMargin

  /** Exact mirror of CorpusStats.gopherFlags over documents (default knobs):
    * all-integer rule evaluation, list_sum(empty)=NULL handled by the
    * n_words>0 branch. */
  def gopherFlagsSql(
      minWords: Int, maxWords: Int, minWlMilli: Long, maxWlMilli: Long,
      minStop: Int): String = {
    val stops = stopIn(graft.functions.TextFunctions.StopwordLists.head._2)
    s"""WITH d AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws FROM documents),
       |m AS (
       |  SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
       |    list_sum(list_transform(ws, w -> length(w))) AS chars,
       |    CAST(len(list_distinct(list_filter(ws, w -> w IN $stops))) AS BIGINT) AS stop_hits
       |  FROM d
       |),
       |r AS (
       |  SELECT doc_id, n_words,
       |    CASE WHEN n_words > 0 THEN (CAST(chars AS BIGINT) * 1000) // n_words
       |         ELSE 0 END AS mean_wl_milli,
       |    stop_hits
       |  FROM m
       |)
       |SELECT doc_id, n_words, mean_wl_milli, stop_hits,
       |  CASE WHEN n_words BETWEEN $minWords AND $maxWords THEN 1 ELSE 0 END AS flag_words,
       |  CASE WHEN mean_wl_milli BETWEEN $minWlMilli AND $maxWlMilli THEN 1 ELSE 0 END AS flag_wordlen,
       |  CASE WHEN stop_hits >= $minStop THEN 1 ELSE 0 END AS flag_stop,
       |  (CASE WHEN n_words BETWEEN $minWords AND $maxWords THEN 1 ELSE 0 END)
       |  * (CASE WHEN mean_wl_milli BETWEEN $minWlMilli AND $maxWlMilli THEN 1 ELSE 0 END)
       |  * (CASE WHEN stop_hits >= $minStop THEN 1 ELSE 0 END) AS pass
       |FROM r""".stripMargin
  }

  /** Exact mirror of Multimodal.frameSample over the documents demo payload
    * (UTF-8 text bytes; the corpus is ASCII so char slices ARE byte slices —
    * the established mm_meta equivalence): frames = least(n, len) evenly
    * spaced byte slices, frame f = [f·len DIV fr, max((f+1)·len DIV fr,
    * start+1)). */
  def mmFramesSql(n: Int): String =
    s"""WITH d AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len
       |           FROM documents WHERE length(text) > 0),
       |f AS (
       |  SELECT doc_id, text, len, least($n, len) AS fr,
       |         unnest(generate_series(0, CAST(least($n, len) AS INT) - 1)) AS fi
       |  FROM d
       |),
       |s AS (
       |  SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx,
       |    fi * len // fr AS st,
       |    greatest((fi + 1) * len // fr, fi * len // fr + 1) AS en
       |  FROM f
       |)
       |SELECT s.doc_id, s.frame_idx,
       |  sha256(substring(d.text, CAST(s.st + 1 AS INT), CAST(s.en - s.st AS INT))) AS frame_sha,
       |  CAST(s.en - s.st AS BIGINT) AS frame_bytes
       |FROM s JOIN d USING (doc_id)""".stripMargin

  /** Exact mirror of CorpusStats.sourceKlDivergence over documents: per-word
    * micro-nat-quantized log ratio on exact integer products, exact integer
    * per-source sum, final normalization rounded to 4. */
  def sourceKlSql: String =
    s"""WITH w AS (SELECT source, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS wd
       |           FROM documents),
       |csw AS (SELECT source, wd, count(*) AS csw FROM w GROUP BY 1, 2),
       |cw AS (SELECT wd, sum(csw) AS cw FROM csw GROUP BY 1),
       |ns AS (SELECT source, sum(csw) AS ns FROM csw GROUP BY 1),
       |nn AS (SELECT sum(cw) AS N FROM cw),
       |contrib AS (
       |  SELECT c.source, s.ns,
       |    c.csw * CAST(floor(ln(CAST(c.csw * nn.N AS DOUBLE) /
       |                          CAST(s.ns * w2.cw AS DOUBLE)) * 1000000.0) AS BIGINT) AS q
       |  FROM csw c JOIN cw w2 USING (wd) JOIN ns s USING (source), nn
       |)
       |SELECT source, CAST(max(ns) AS BIGINT) AS n_tokens,
       |       round(CAST(sum(q) AS DOUBLE) / (CAST(max(ns) AS DOUBLE) * 1000000.0), 4) AS kl
       |FROM contrib GROUP BY source""".stripMargin

  /** Exact mirror of CorpusStats.dsirWeights over documents: add-one-smoothed
    * target/raw unigram distributions over the union vocabulary, per-word
    * integer micro-nat surprisal difference, exact BIGINT per-doc sum. */
  def dsirWeightsSql(targetPred: String, ngram: Int = 1): String = {
    val featSrc =
      if (ngram == 1)
        s"""SELECT doc_id, ($targetPred) AS t,
           |         unnest(regexp_extract_all(lower(text), '[a-z]+')) AS wd
           |  FROM documents""".stripMargin
      else
        s"""SELECT doc_id, t, ws[i] || ' ' || ws[i + 1] AS wd
           |  FROM (
           |    SELECT doc_id, ($targetPred) AS t,
           |           regexp_extract_all(lower(text), '[a-z]+') AS ws,
           |           unnest(generate_series(1, len(regexp_extract_all(lower(text), '[a-z]+')) - 1)) AS i
           |    FROM documents)""".stripMargin
    s"""WITH toks AS (
       |  $featSrc),
       |tc AS (SELECT wd, count(*) AS ct FROM toks WHERE t GROUP BY 1),
       |rc AS (SELECT wd, count(*) AS cr FROM toks WHERE NOT t GROUP BY 1),
       |vocab AS (
       |  SELECT coalesce(tc.wd, rc.wd) AS wd, coalesce(ct, 0) AS ct, coalesce(cr, 0) AS cr
       |  FROM tc FULL OUTER JOIN rc ON tc.wd = rc.wd),
       |tot AS (SELECT sum(ct) AS nt, sum(cr) AS nr, count(*) AS v FROM vocab),
       |wt AS (
       |  SELECT wd,
       |    CAST(floor(-ln(CAST(cr + 1 AS DOUBLE) / CAST(nr + v AS DOUBLE)) * 1000000.0) AS BIGINT)
       |    - CAST(floor(-ln(CAST(ct + 1 AS DOUBLE) / CAST(nt + v AS DOUBLE)) * 1000000.0) AS BIGINT) AS d
       |  FROM vocab, tot)
       |SELECT t.doc_id, count(*) AS n_tokens, CAST(sum(w.d) AS BIGINT) AS dsir_micro
       |FROM toks t JOIN wt w USING (wd) GROUP BY 1""".stripMargin
  }

  /** Exact mirror of Dedup.dedupRateBySource over documents. */
  def dedupRateBySourceSql: String =
    s"""SELECT source, count(*) AS docs,
       |  count(text) AS docs_with_text,
       |  count(text) - count(DISTINCT md5(text)) AS dup_docs,
       |  CASE WHEN count(text) > 0
       |       THEN (count(text) - count(DISTINCT md5(text))) * 1000 // count(text)
       |       ELSE 0 END AS dup_milli
       |FROM documents GROUP BY source""".stripMargin

  /** Exact mirror of Sampling.temperatureShares on documents.source:
    * w = n^tau via integer floor-sqrt chains (tauMilli ∈ {250,500,1000}). */
  def temperatureSharesSql(budget: Long, tauMilli: Int): String = {
    val wExpr = tauMilli match {
      case 1000 => "available"
      case 500  => "CAST(floor(sqrt(CAST(available AS DOUBLE))) AS BIGINT)"
      case 250  => "CAST(floor(sqrt(floor(sqrt(CAST(available AS DOUBLE))))) AS BIGINT)"
      case t    => throw new IllegalArgumentException(s"tauMilli $t")
    }
    s"""WITH counts AS (SELECT source, count(*) AS available FROM documents GROUP BY source),
       |wt AS (SELECT source, available, $wExpr AS w FROM counts),
       |tot AS (SELECT sum(w) AS tw FROM wt)
       |SELECT source, available, w,
       |       CAST((w * 1000000) // tw AS BIGINT) AS share_micro,
       |       CAST((w * $budget) // tw AS BIGINT) AS quota
       |FROM wt, tot""".stripMargin
  }

  /** Exact mirror of Embeddings.projectSrp (gate shape: one row per output
    * dim): proj_micro[j] = Σ_i sign(j,i)·floor(v_i·10⁶ + 0.5), sign = parity
    * of ((j·8191 + i)·2654435761) mod 1000003, i 0-based. */
  def projectSrpSql(outDims: Int): String =
    s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) > 0),
       |p AS (
       |  SELECT vec_id, j,
       |    list_sum(list_transform(generate_series(1, len(e)), d ->
       |      (CASE WHEN ((j*8191 + (d-1)) * 2654435761) % 1000003 % 2 = 0 THEN 1 ELSE -1 END)
       |      * CAST(floor(CAST(e[d] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))) AS pm
       |  FROM v, (SELECT unnest(generate_series(0, ${outDims - 1})) AS j)
       |)
       |SELECT vec_id, CAST(j AS BIGINT) AS dim, CAST(pm AS BIGINT) AS proj_micro FROM p""".stripMargin

  /** Oracle for the bucketed-layout demo join — the plain relational answer
    * (layout changes the PLAN, never the rows): customers with ≥ 1 order,
    * order count + exact integer cents total. */
  def bucketedJoinSql: String =
    s"""SELECT c.c_custkey, count(*) AS n_orders,
       |  CAST(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
       |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
       |GROUP BY c.c_custkey""".stripMargin

  /** Zipf slope (mirrors CorpusStats.zipfSlope): the vocab rank CTE, logs
    * quantized to integer milli-nats, closed-form least squares in BIGINT. */
  def zipfSlopeSql(maxRank: Int): String =
    s"""WITH w AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
       |           FROM documents),
       |s AS (SELECT word, count(*) AS cf FROM w GROUP BY word),
       |v AS (SELECT cf, row_number() OVER (ORDER BY cf DESC, word ASC) AS rank FROM s),
       |q AS (
       |  SELECT CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000.0) AS BIGINT) AS x,
       |         CAST(floor(ln(CAST(cf AS DOUBLE)) * 1000.0) AS BIGINT) AS y
       |  FROM v WHERE rank <= $maxRank
       |),
       |a AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
       |         CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
       |         CAST(sum(x * x) AS BIGINT) AS sxx
       |  FROM q
       |)
       |SELECT n AS n_words,
       |  CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
       |       ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
       |              / CAST(n * sxx - sx * sx AS DOUBLE), 6) END AS slope
       |FROM a""".stripMargin

  /** LSH-banding recall audit (mirrors Dedup.lshAuditReport): truth = the
    * jaccardPairs CTEs, found = the minHashLshPairs CTEs, one summary row. */
  def lshAuditSql(threshold: Double): String =
    s"""WITH $shingleCtes,
       |${minHashBandCtes("dsh", "doc_id")},
       |tinter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
       |  FROM dsh a JOIN dsh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |),
       |truth AS (
       |  SELECT id_a, id_b
       |  FROM tinter JOIN dcnt ca ON tinter.id_a = ca.doc_id
       |              JOIN dcnt cb ON tinter.id_b = cb.doc_id
       |  WHERE CAST(i AS DOUBLE) / CAST(ca.n + cb.n - i AS DOUBLE) >= $threshold
       |),
       |finter AS (
       |  SELECT c.id_a, c.id_b, count(*) AS i
       |  FROM mcand c
       |  JOIN dsh a ON c.id_a = a.doc_id
       |  JOIN dsh b ON c.id_b = b.doc_id AND a.sh = b.sh
       |  GROUP BY 1, 2
       |),
       |found AS (
       |  SELECT id_a, id_b, 1 AS hit
       |  FROM finter JOIN dcnt ca ON finter.id_a = ca.doc_id
       |              JOIN dcnt cb ON finter.id_b = cb.doc_id
       |  WHERE CAST(i AS DOUBLE) / CAST(ca.n + cb.n - i AS DOUBLE) >= $threshold
       |),
       |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cand FROM mcand),
       |tt AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_true,
       |         CAST(coalesce(sum(coalesce(f.hit, 0)), 0) AS BIGINT) AS n_found
       |  FROM truth t LEFT JOIN found f USING (id_a, id_b)
       |)
       |SELECT tt.n_true, nc.n_cand, tt.n_found,
       |  CASE WHEN tt.n_true = 0 THEN 1.0
       |       ELSE round(CAST(tt.n_found AS DOUBLE) / tt.n_true, 6) END AS recall,
       |  CASE WHEN nc.n_cand = 0 THEN 1.0
       |       ELSE round(CAST(tt.n_found AS DOUBLE) / nc.n_cand, 6) END AS precision
       |FROM tt, nc""".stripMargin

  /** Per-column profile of the documents table (mirrors TableProfile.profile):
    * one UNION ALL branch per column — counts, exact distinct, stringified
    * min/max. */
  def profileDocsSql(cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_str, CAST(max($c) AS VARCHAR) AS max_str
         |FROM documents""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** Integer-exact PageRank over the approximate-kNN graph (mirrors
    * GraphRank.pageRank on Dedup.knnGraph edges): the knn CTEs feed an
    * unrolled fixed-iteration chain — contribution `r DIV outdeg`, update
    * `teleport + (damping·Σ) DIV 1000` — all BIGINT, reduction-order-proof. */
  def pageRankSql(k: Int, nPlanes: Int, nTables: Int,
      nIters: Int, dampingMilli: Int, seedPred: Option[String] = None): String =
    s"""WITH ${pageRankCtes(k, nPlanes, nTables, nIters, dampingMilli, seedPred)}
       |SELECT node, CAST(r AS BIGINT) AS rank_micro FROM r$nIters""".stripMargin

  /** Mirror of GraphRank.pageRankDelta: L1 + max gap between the last two
    * iterations of the same unrolled chain. */
  def pageRankDeltaSql(k: Int, nPlanes: Int, nTables: Int,
      nIters: Int, dampingMilli: Int): String =
    s"""WITH ${pageRankCtes(k, nPlanes, nTables, nIters, dampingMilli, None)}
       |SELECT CAST(count(*) AS BIGINT) AS n_nodes,
       |       CAST(sum(abs(a.r - b.r)) AS BIGINT) AS delta_micro,
       |       CAST(max(abs(a.r - b.r)) AS BIGINT) AS max_delta_micro
       |FROM r$nIters a JOIN r${nIters - 1} b ON a.node = b.node""".stripMargin

  private def pageRankCtes(k: Int, nPlanes: Int, nTables: Int,
      nIters: Int, dampingMilli: Int, seedPred: Option[String]): String = {
    val teleport = (1000L - dampingMilli) * 1000L
    val (r0r, r0t) = seedPred match {
      case None => ("CAST(1000000 AS BIGINT)", s"CAST($teleport AS BIGINT)")
      case Some(p) => (
        s"CAST(CASE WHEN $p THEN 1000000 ELSE 0 END AS BIGINT)",
        s"CAST(CASE WHEN $p THEN $teleport ELSE 0 END AS BIGINT)")
    }
    val iters = (1 to nIters).map { i =>
      s"""c$i AS (
         |  SELECT e.dst, sum(r${i - 1}.r // dg.od) AS s
         |  FROM e JOIN r${i - 1} ON r${i - 1}.node = e.src JOIN dg ON dg.src = e.src
         |  GROUP BY 1
         |),
         |r$i AS (
         |  SELECT nd.node, r0.t0 + ($dampingMilli * coalesce(c$i.s, 0)) // 1000 AS r
         |  FROM nd LEFT JOIN c$i ON c$i.dst = nd.node JOIN r0 ON r0.node = nd.node
         |)""".stripMargin
    }.mkString(",\n")
    s"""${knnGraphCtes(k, nPlanes, nTables)},
       |e AS (SELECT src, nbr AS dst FROM kg),
       |nd AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |dg AS (SELECT src, count(*) AS od FROM e GROUP BY 1),
       |r0 AS (SELECT node, $r0r AS r, $r0t AS t0 FROM nd),
       |$iters""".stripMargin
  }

  /** Exact mirror of GraphRank.triangleCounts over the kNN graph: symmetrize
    * + orient `a < b`, wedge join `a<b<c`, close with a third edge probe,
    * one explode-count per triangle corner. */
  /** Shared undirected-kNN-edge + triangle-count CTE chain, ending at
    * `tric(node, triangles)`. */
  private def triangleCtes(k: Int, nPlanes: Int, nTables: Int): String =
    s"""${knnGraphCtes(k, nPlanes, nTables)},
       |und AS (
       |  SELECT DISTINCT least(src, nbr) AS a, greatest(src, nbr) AS b
       |  FROM kg WHERE least(src, nbr) < greatest(src, nbr)
       |),
       |tri AS (
       |  SELECT e1.a AS a, e1.b AS b, e2.b AS c
       |  FROM und e1 JOIN und e2 ON e1.b = e2.a
       |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
       |),
       |corners AS (
       |  SELECT a AS node FROM tri
       |  UNION ALL SELECT b FROM tri
       |  UNION ALL SELECT c FROM tri
       |),
       |tric AS (SELECT node, count(*) AS triangles FROM corners GROUP BY 1)""".stripMargin

  def triangleCountsSql(k: Int, nPlanes: Int, nTables: Int): String =
    s"""WITH ${triangleCtes(k, nPlanes, nTables)}
       |SELECT node, triangles FROM tric""".stripMargin

  /** Mirror of GraphRank.clusteringCoefficient: `2·tri·10⁶ // (d·(d−1))`,
    * 0 for degree-1 nodes, triangles defaulted to 0. */
  def clusteringCoefficientSql(k: Int, nPlanes: Int, nTables: Int): String =
    s"""WITH ${triangleCtes(k, nPlanes, nTables)},
       |ends AS (SELECT a AS node FROM und UNION ALL SELECT b FROM und),
       |deg AS (SELECT node, count(*) AS degree FROM ends GROUP BY 1)
       |SELECT deg.node, deg.degree,
       |  CAST(coalesce(t.triangles, 0) AS BIGINT) AS triangles,
       |  CAST(CASE WHEN deg.degree >= 2
       |    THEN 2 * coalesce(t.triangles, 0) * 1000000 // (deg.degree * (deg.degree - 1))
       |    ELSE 0 END AS BIGINT) AS cc_micro
       |FROM deg LEFT JOIN tric t ON t.node = deg.node""".stripMargin

  /** Exact mirror of GraphRank.hits (unnormalized integer HITS), iterations
    * unrolled: aᵢ = Σ hᵢ₋₁ over in-edges, hᵢ = Σ aᵢ over out-edges. */
  def hitsSql(k: Int, nPlanes: Int, nTables: Int, nIters: Int): String = {
    val iters = (1 to nIters).map { i =>
      s"""a$i AS (
         |  SELECT nd.node, CAST(coalesce(s.s, 0) AS BIGINT) AS a
         |  FROM nd LEFT JOIN (
         |    SELECT e.dst, sum(h${i - 1}.h) AS s
         |    FROM e JOIN h${i - 1} ON h${i - 1}.node = e.src GROUP BY 1) s
         |  ON s.dst = nd.node
         |),
         |h$i AS (
         |  SELECT nd.node, CAST(coalesce(s.s, 0) AS BIGINT) AS h
         |  FROM nd LEFT JOIN (
         |    SELECT e.src, sum(a$i.a) AS s
         |    FROM e JOIN a$i ON a$i.node = e.dst GROUP BY 1) s
         |  ON s.src = nd.node
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${knnGraphCtes(k, nPlanes, nTables)},
       |e AS (SELECT src, nbr AS dst FROM kg),
       |nd AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |h0 AS (SELECT node, CAST(1 AS BIGINT) AS h FROM nd),
       |$iters
       |SELECT h$nIters.node, h$nIters.h AS hub, a$nIters.a AS auth
       |FROM h$nIters JOIN a$nIters ON a$nIters.node = h$nIters.node""".stripMargin
  }

  /** Rendezvous shard assignment (mirrors Packing.rendezvousShard): argmax
    * over per-(id, shard) integer-mix weights, ties to the smallest shard
    * (list_position finds the FIRST maximum). */
  def rendezvousShardSql(nShards: Int): String =
    s"""WITH r AS (
       |  SELECT doc_id,
       |    list_transform(generate_series(0, ${nShards - 1}), s ->
       |      ((doc_id % 1000003) * 8191 + s) % 1000003 * 2654435761 % 1000003) AS rw
       |  FROM documents
       |)
       |SELECT doc_id,
       |  CAST(list_position(rw, list_aggregate(rw, 'max')) - 1 AS BIGINT) AS shard
       |FROM r""".stripMargin

  /** PMI collocations (mirrors CorpusStats.collocations): adjacent word
    * pairs within docs, integer micro-nat PMI
    * `q(cx/N1) + q(cy/N1) − q(cxy/N2)`, top-k by (pmi DESC, w1, w2). */
  def collocationsSql(minCount: Long, topK: Int): String =
    s"""WITH d AS (SELECT regexp_extract_all(lower(text), '[a-z]+') AS ws FROM documents),
       |b AS (
       |  SELECT ws[i] AS w1, ws[i + 1] AS w2
       |  FROM (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i
       |        FROM d WHERE len(ws) >= 2)
       |),
       |uc AS (SELECT w, count(*) AS c1
       |       FROM (SELECT unnest(ws) AS w FROM d) GROUP BY 1),
       |n1 AS (SELECT sum(c1) AS n1 FROM uc),
       |bc AS (SELECT w1, w2, count(*) AS n_pair FROM b GROUP BY 1, 2),
       |n2 AS (SELECT sum(n_pair) AS n2 FROM bc)
       |SELECT w1, w2, n_pair,
       |  CAST(floor(-ln(CAST(x.c1 AS DOUBLE) / CAST(n1.n1 AS DOUBLE)) * 1000000.0) AS BIGINT)
       |  + CAST(floor(-ln(CAST(y.c1 AS DOUBLE) / CAST(n1.n1 AS DOUBLE)) * 1000000.0) AS BIGINT)
       |  - CAST(floor(-ln(CAST(bc.n_pair AS DOUBLE) / CAST(n2.n2 AS DOUBLE)) * 1000000.0) AS BIGINT)
       |  AS pmi_micro
       |FROM bc, n1, n2
       |JOIN uc x ON x.w = bc.w1
       |JOIN uc y ON y.w = bc.w2
       |WHERE bc.n_pair >= $minCount
       |ORDER BY pmi_micro DESC, w1, w2 LIMIT $topK""".stripMargin

  /** Mirror of CorpusStats.cooccurrence: the collocations PMI tail over a
    * ±window skip-gram pair relation. */
  def cooccurrenceSql(window: Int, minCount: Long, topK: Int): String =
    s"""WITH d AS (SELECT regexp_extract_all(lower(text), '[a-z]+') AS ws FROM documents),
       |i AS (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i
       |      FROM d WHERE len(ws) >= 2),
       |pp AS (SELECT ws, i, unnest(generate_series(1, least($window, len(ws) - i))) AS dd
       |       FROM i),
       |b AS (SELECT ws[i] AS w1, ws[i + dd] AS w2 FROM pp),
       |uc AS (SELECT w, count(*) AS c1
       |       FROM (SELECT unnest(ws) AS w FROM d) GROUP BY 1),
       |n1 AS (SELECT sum(c1) AS n1 FROM uc),
       |bc AS (SELECT w1, w2, count(*) AS n_pair FROM b GROUP BY 1, 2),
       |n2 AS (SELECT sum(n_pair) AS n2 FROM bc)
       |SELECT w1, w2, n_pair,
       |  CAST(floor(-ln(CAST(x.c1 AS DOUBLE) / CAST(n1.n1 AS DOUBLE)) * 1000000.0) AS BIGINT)
       |  + CAST(floor(-ln(CAST(y.c1 AS DOUBLE) / CAST(n1.n1 AS DOUBLE)) * 1000000.0) AS BIGINT)
       |  - CAST(floor(-ln(CAST(bc.n_pair AS DOUBLE) / CAST(n2.n2 AS DOUBLE)) * 1000000.0) AS BIGINT)
       |  AS pmi_micro
       |FROM bc, n1, n2
       |JOIN uc x ON x.w = bc.w1
       |JOIN uc y ON y.w = bc.w2
       |WHERE bc.n_pair >= $minCount
       |ORDER BY pmi_micro DESC, w1, w2 LIMIT $topK""".stripMargin

  /** First-occurrence chunk ledger (mirrors StreamChunkDedup.firstPerChunk on
    * a batch frame): the chunkDedupSql splitter, then each distinct chunk
    * hash at its minimum (doc_id, chunk_index) occurrence. */
  def streamChunkBatchSql(w: Int): String =
    s"""WITH d AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws FROM documents),
       |c AS (
       |  SELECT doc_id, gi,
       |    array_to_string(list_slice(ws, gi*$w + 1, least((gi+1)*$w, len(ws))), ' ') AS chunk
       |  FROM (SELECT doc_id, ws, unnest(generate_series(0, (len(ws) + ${w - 1}) // $w - 1)) AS gi
       |        FROM d WHERE len(ws) > 0)
       |),
       |r AS (
       |  SELECT doc_id, gi, md5(chunk) AS ck,
       |         row_number() OVER (PARTITION BY md5(chunk) ORDER BY doc_id, gi) AS rn
       |  FROM c
       |)
       |SELECT doc_id, CAST(gi AS BIGINT) AS chunk_index, ck AS chunk_hash
       |FROM r WHERE rn = 1""".stripMargin

  /** Z-order (Morton) layout key (mirrors Embeddings.zorderKey): per-dim
    * min–max quantization of the first `dims` embedding dims to `bits` bits
    * — `(x−mn)/(mx−mn)·(2^bits−1)` in the identical correctly-rounded IEEE
    * op order, floor→BIGINT→clamp — then pure BIGINT bit interleave. */
  def zorderKeySql(dims: Int, bits: Int): String = {
    val maxQ = (1L << bits) - 1
    val xs = (0 until dims).map(d =>
      s"CAST(embedding[${d + 1}] AS DOUBLE) AS x$d").mkString(",\n         ")
    val exts = (0 until dims).map(d =>
      s"min(x$d) AS mn$d, max(x$d) AS mx$d").mkString(", ")
    val qs = (0 until dims).map { d =>
      s"""CASE WHEN mx$d = mn$d THEN 0
         |      ELSE least(greatest(CAST(floor((x$d - mn$d) / (mx$d - mn$d) * $maxQ.0)
         |             AS BIGINT), 0), $maxQ) END AS q$d""".stripMargin
    }.mkString(",\n    ")
    val terms = (for { b <- 0 until bits; d <- 0 until dims } yield
      s"(((q$d >> $b) & 1) << ${b * dims + d})").mkString(" + ")
    s"""WITH base AS (
       |  SELECT vec_id,
       |         $xs
       |  FROM embeddings
       |  WHERE embedding IS NOT NULL AND len(embedding) >= $dims
       |),
       |ext AS (SELECT $exts FROM base),
       |q AS (
       |  SELECT vec_id,
       |    $qs
       |  FROM base, ext
       |)
       |SELECT vec_id, CAST($terms AS BIGINT) AS zkey FROM q""".stripMargin
  }

  /** Count-min-sketch heavy hitters (mirrors CorpusStats.cmsTopTokens):
    * depth×width sketch over corpus words via the tHash identity folded to
    * [0, 2³¹) + one affine map per hash row, estimate = min over the depth
    * cells, top-k by (est_count DESC, word). The A/B list literals mirror
    * CorpusStats.CmsA/CmsB; `h·A + B < 2⁶²` so BIGINT arithmetic is exact in
    * both engines. */
  /** Shared CMS sketch + estimate CTE chain (ends at `est(word, est_count)`),
    * mirroring CorpusStats.{cmsSketch, cmsEstimate} over the corpus words. */
  private def cmsEstCtes(width: Int, depth: Int): String = {
    val aLit = graft.operators.CorpusStats.CmsA.take(depth).mkString("[", ",", "]")
    val bLit = graft.operators.CorpusStats.CmsB.take(depth).mkString("[", ",", "]")
    s"""w AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
       |           FROM documents),
       |th AS (SELECT word, ${tHashSql("word")} % 2147483647 AS h FROM w),
       |jj AS (SELECT unnest(generate_series(0, ${depth - 1})) AS j),
       |sk AS (
       |  SELECT CAST(jj.j AS BIGINT) AS j,
       |         (th.h * ($aLit)[jj.j + 1] + ($bLit)[jj.j + 1]) % $width AS b,
       |         count(*) AS c
       |  FROM th, jj GROUP BY 1, 2
       |),
       |cand AS (SELECT DISTINCT word, h FROM th),
       |cb AS (
       |  SELECT word, CAST(jj.j AS BIGINT) AS j,
       |         (cand.h * ($aLit)[jj.j + 1] + ($bLit)[jj.j + 1]) % $width AS b
       |  FROM cand, jj
       |),
       |est AS (
       |  SELECT word, min(c) AS est_count
       |  FROM cb JOIN sk USING (j, b) GROUP BY word
       |)""".stripMargin
  }

  def cmsTopTokensSql(width: Int, depth: Int, topK: Int): String =
    s"""WITH ${cmsEstCtes(width, depth)}
       |SELECT word, est_count FROM est
       |ORDER BY est_count DESC, word LIMIT $topK""".stripMargin

  /** Mirror of CorpusStats.dyadicCmsSketch + cmsRankEstimates over
    * documents.n_chars: the level-block cells are recomputed exactly (same
    * tHash + affine rows), and the probe spine — dyadic cover nodes and
    * their per-row buckets — is generated BY THE SAME Scala function the
    * Spark face uses and baked in as literals. true_rank rides along for
    * the one-sided-bound audit. */
  def cmsRankSketchSql(
      probes: Seq[Long], levels: Int, width: Int, depth: Int): String = {
    import graft.operators.CorpusStats
    val maxV = (1L << levels) - 1L
    val spine = probes.flatMap { y =>
      CorpusStats.dyadicNodes(y, levels).flatMap { case (l, blk) =>
        val h = Math.floorMod(
          graft.functions.TextFunctions.tHash(s"$l:$blk"), 2147483647L)
        (0 until depth).map(j =>
          s"($y, $l, ${blk}, $j, ${(h * CorpusStats.CmsA(j) + CorpusStats.CmsB(j)) % width})")
      }
    }.mkString(",\n    ")
    val aList = (0 until depth).map(CorpusStats.CmsA).mkString(",")
    val bList = (0 until depth).map(CorpusStats.CmsB).mkString(",")
    val h = tHashSql("CAST(l AS VARCHAR) || ':' || CAST(blk AS VARCHAR)")
    s"""WITH v AS (
       |  SELECT least(greatest(CAST(n_chars AS BIGINT), 0), $maxV) AS v
       |  FROM documents WHERE n_chars IS NOT NULL
       |),
       |lv AS (
       |  SELECT CAST(l AS BIGINT) AS l, v >> l AS blk
       |  FROM (SELECT v, unnest(generate_series(0, ${levels - 1})) AS l FROM v)
       |),
       |lh AS (SELECT l, blk, (($h % 2147483647) + 2147483647) % 2147483647 AS h FROM lv),
       |cells AS (
       |  SELECT l, CAST(j AS BIGINT) AS j,
       |    (h * ([$aList])[j + 1] + ([$bList])[j + 1]) % $width AS b,
       |    count(*) AS c
       |  FROM (SELECT l, h, unnest(generate_series(0, ${depth - 1})) AS j FROM lh)
       |  GROUP BY 1, 2, 3
       |),
       |spine(probe, l, blk, j, b) AS (VALUES
       |    $spine
       |),
       |node AS (
       |  SELECT s.probe, s.l, s.blk, min(coalesce(c.c, 0)) AS est
       |  FROM spine s LEFT JOIN cells c
       |    ON c.l = s.l AND c.j = s.j AND c.b = s.b
       |  GROUP BY 1, 2, 3
       |),
       |er AS (SELECT probe, CAST(sum(est) AS BIGINT) AS est_rank FROM node GROUP BY 1),
       |tr AS (
       |  SELECT p.probe, count(v.v) AS true_rank
       |  FROM (SELECT DISTINCT probe FROM spine) p
       |  LEFT JOIN v ON v.v < p.probe
       |  GROUP BY 1
       |)
       |SELECT CAST(er.probe AS BIGINT) AS probe, er.est_rank,
       |  CAST(coalesce(tr.true_rank, 0) AS BIGINT) AS true_rank
       |FROM er LEFT JOIN tr ON er.probe = tr.probe""".stripMargin
  }

  /** Mirror of CorpusStats.derivedStopwordRatio: the sketch-derived top-K
    * list becomes the stopword set; per-doc ratio in integer micro-units. */
  def derivedStopwordRatioSql(width: Int, depth: Int, topK: Int): String =
    s"""WITH ${cmsEstCtes(width, depth)},
       |stop AS (SELECT word FROM est ORDER BY est_count DESC, word LIMIT $topK),
       |dw AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
       |       FROM documents)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |  CAST(sum(CASE WHEN s.word IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
       |  CAST(sum(CASE WHEN s.word IS NOT NULL THEN 1 ELSE 0 END) * 1000000
       |    // count(*) AS BIGINT) AS stop_micro
       |FROM dw LEFT JOIN stop s ON dw.word = s.word
       |GROUP BY doc_id""".stripMargin

  /** Mirror of CorpusStats.psiDrift over documents.n_chars with the gate's
    * even/odd doc_id split (base = even ids, current = odd ids). */
  def psiDriftSql(lo: Double, hi: Double, nBins: Int): String = {
    val w = (hi - lo) / nBins
    def binned(pred: String) =
      s"""SELECT least(greatest(CAST(floor((CAST(n_chars AS DOUBLE) - $lo) / $w) AS BIGINT), 0),
         |    ${nBins - 1}) AS bin, count(*) AS n
         |  FROM documents WHERE $pred AND n_chars IS NOT NULL GROUP BY 1""".stripMargin
    s"""WITH bb AS (${binned("doc_id % 2 = 0")}),
       |cc AS (${binned("doc_id % 2 = 1")}),
       |tb AS (SELECT coalesce(sum(n), 0) AS t FROM bb),
       |tc AS (SELECT coalesce(sum(n), 0) AS t FROM cc),
       |sp AS (SELECT CAST(unnest(generate_series(0, ${nBins - 1})) AS BIGINT) AS bin),
       |j AS (
       |  SELECT sp.bin, CAST(coalesce(bb.n, 0) AS BIGINT) AS n_base,
       |         CAST(coalesce(cc.n, 0) AS BIGINT) AS n_cur,
       |         CAST((coalesce(bb.n, 0) + 1) * 1000000 // (tb.t + $nBins) AS BIGINT) AS base_micro,
       |         CAST((coalesce(cc.n, 0) + 1) * 1000000 // (tc.t + $nBins) AS BIGINT) AS cur_micro
       |  FROM sp LEFT JOIN bb USING (bin) LEFT JOIN cc USING (bin)
       |  CROSS JOIN tb CROSS JOIN tc
       |)
       |SELECT bin, n_base, n_cur, base_micro, cur_micro,
       |  CAST((cur_micro - base_micro)
       |    * CAST(floor((ln(CAST(cur_micro AS DOUBLE)) - ln(CAST(base_micro AS DOUBLE))) * 1000000.0) AS BIGINT)
       |    // 1000000 AS BIGINT) AS psi_micro
       |FROM j""".stripMargin
  }

  /** Exact mirror of CorpusStats.bpeTrainMerges: nMerges unrolled rounds,
    * each recomputing its own best pair (count desc, pair asc), applying it
    * greedily leftmost-non-overlapping via the same sequence-index
    * gaps-and-islands windows, and feeding the merged symbols forward. */
  def bpeTrainSql(nMerges: Int): String = {
    val union = (1 to nMerges).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS merge_round, a AS sym_a, b AS sym_b,
         |       a || b AS merged, CAST(c AS BIGINT) AS cnt FROM best$r""".stripMargin
    }.mkString(" UNION ALL ")
    s"""WITH ${bpeRoundsCtes(nMerges)}
       |$union""".stripMargin
  }

  /** Mirror of CorpusStats.bpeSegmentWords: the same round chain, read out
    * as the final segmentation of every vocabulary word. */
  def bpeSegmentSql(nMerges: Int): String =
    s"""WITH ${bpeRoundsCtes(nMerges)}
       |SELECT w AS word, n, CAST(count(*) AS BIGINT) AS n_tokens,
       |       string_agg(s, ' ' ORDER BY p) AS seg
       |FROM sq${nMerges + 1} GROUP BY w, n""".stripMargin

  private def bpeRoundsCtes(nMerges: Int): String = {
    // Every multiply-referenced CTE is MATERIALIZED: default CTE inlining
    // would expand each round's references multiplicatively (4^nMerges
    // copies of the base scan — measured as an fd-exhaustion failure), while
    // materialization keeps the chain linear. The take flag is computed by
    // chained windows (running mark count -> island id -> in-island parity),
    // not a self-join, so each round is one single-pass pipeline.
    val rounds = (1 to nMerges).map { r =>
      s"""e$r AS MATERIALIZED (
         |  SELECT w, n, p, s,
         |         lead(s) OVER (PARTITION BY w ORDER BY p) AS nx,
         |         row_number() OVER (PARTITION BY w ORDER BY p) AS i
         |  FROM sq$r
         |),
         |best$r AS MATERIALIZED (
         |  SELECT s AS a, nx AS b, sum(n) AS c FROM e$r
         |  WHERE nx IS NOT NULL GROUP BY 1, 2
         |  ORDER BY c DESC, a ASC, b ASC LIMIT 1
         |),
         |mk$r AS (
         |  SELECT e.w, e.n, e.p, e.s, e.nx, e.i,
         |         (e.s = b.a AND e.nx IS NOT NULL AND e.nx = b.b) AS mark
         |  FROM e$r e CROSS JOIN best$r b
         |),
         |mk2$r AS (
         |  SELECT w, n, p, s, nx, mark,
         |    CASE WHEN mark THEN i - count(*) FILTER (WHERE mark)
         |      OVER (PARTITION BY w ORDER BY p ROWS UNBOUNDED PRECEDING)
         |    END AS isl
         |  FROM mk$r
         |),
         |mk3$r AS (
         |  SELECT w, n, p, s, nx,
         |    (mark AND row_number() OVER (PARTITION BY w, isl ORDER BY p) % 2 = 1) AS take
         |  FROM mk2$r
         |),
         |lg$r AS (
         |  SELECT w, n, p, s, nx, take,
         |         lag(take) OVER (PARTITION BY w ORDER BY p) AS ptake
         |  FROM mk3$r
         |),
         |sq${r + 1} AS MATERIALIZED (
         |  SELECT w, n, p, CASE WHEN take THEN s || nx ELSE s END AS s
         |  FROM lg$r WHERE ptake IS NULL OR NOT ptake
         |)""".stripMargin
    }.mkString(",\n")
    s"""w0 AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS n
       |  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents)
       |  GROUP BY 1
       |),
       |sq1 AS (
       |  SELECT w, n, i - 1 AS p, substring(w, i, 1) AS s
       |  FROM (SELECT w, n, unnest(generate_series(1, length(w))) AS i FROM w0)
       |),
       |$rounds""".stripMargin
  }

  /** Mirror of CorpusStats.bpeEncodeStats: the segment chain joined back to
    * every word occurrence, reduced per document. */
  def bpeEncodeSql(nMerges: Int): String =
    s"""WITH ${bpeRoundsCtes(nMerges)},
       |segt AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS t
       |  FROM sq${nMerges + 1} GROUP BY w
       |),
       |dwx AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
       |  FROM documents
       |)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(sum(coalesce(segt.t, length(dwx.w))) AS BIGINT) AS n_subwords
       |FROM dwx LEFT JOIN segt USING (w)
       |GROUP BY doc_id""".stripMargin

  /** Mirror of CorpusStats.bpeFertilityBySource: the encode chain's
    * segmentation lengths rolled up per source with char sums and
    * integer-milli ratios. */
  def bpeFertilitySql(nMerges: Int): String =
    s"""WITH ${bpeRoundsCtes(nMerges)},
       |segt AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS t
       |  FROM sq${nMerges + 1} GROUP BY w
       |),
       |dwx AS (
       |  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
       |  FROM documents
       |)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(coalesce(segt.t, length(dwx.w))) AS BIGINT) AS n_subwords,
       |  CAST(sum(length(dwx.w)) AS BIGINT) AS n_chars,
       |  CAST(sum(coalesce(segt.t, length(dwx.w))) * 1000 // count(*) AS BIGINT)
       |    AS fertility_milli,
       |  CAST(sum(length(dwx.w)) * 1000 // sum(coalesce(segt.t, length(dwx.w))) AS BIGINT)
       |    AS chars_per_token_milli
       |FROM dwx LEFT JOIN segt USING (w)
       |GROUP BY source""".stripMargin

  /** Mirror of CorpusStats.ulmPieces: the full unigram-LM EM-pruning round
    * chain, read out as the final vocabulary with usage counts. */
  def ulmPiecesSql(maxPieceLen: Int, seedK: Int, pruneKs: Seq[Int]): String = {
    val f = pruneKs.size + 1
    s"""WITH RECURSIVE ${ulmRoundsCtes(maxPieceLen, seedK, pruneKs)}
       |SELECT piece, CAST(length(piece) AS BIGINT) AS plen, CAST(c AS BIGINT) AS cnt
       |FROM use$f""".stripMargin
  }

  /** Mirror of CorpusStats.ulmSegmentWords: the same chain, read out as the
    * final greedy longest-match segmentation of every vocabulary word. */
  def ulmSegmentSql(maxPieceLen: Int, seedK: Int, pruneKs: Seq[Int]): String = {
    val f = pruneKs.size + 1
    s"""WITH RECURSIVE ${ulmRoundsCtes(maxPieceLen, seedK, pruneKs)}
       |SELECT w AS word, n, CAST(max(tix) AS BIGINT) AS n_tokens,
       |       string_agg(piece, ' ' ORDER BY tix) AS seg
       |FROM sg$f WHERE piece IS NOT NULL GROUP BY w, n""".stripMargin
  }

  /** Shared round chain of the unigram-LM trainer mirror: seed by windowed
    * (freq desc, piece asc) rank over every substring span, then per EM
    * round (1) `nx` = longest vocabulary piece at every word position —
    * plain windows, computed OUTSIDE the recursion, (2) `sg` = the greedy
    * segmentation as a recursive pointer-chase over `nx` (one row per
    * emitted token, no aggregates/windows in the recursive term —
    * DuckDB-legal), (3) `use`/`vocab` = usage-ranked prune keeping every
    * single char (coverage). Multiply-referenced CTEs are MATERIALIZED for
    * the same fd-exhaustion reason as [[bpeRoundsCtes]]. */
  private def ulmRoundsCtes(maxPieceLen: Int, seedK: Int, pruneKs: Seq[Int]): String = {
    // round r segments with vocab{r}; vocab{r+1} = top pruneKs(r-1) by usage
    val rounds = (1 to (pruneKs.size + 1)).map { r =>
      val prune =
        if (r <= pruneKs.size)
          s""",
             |vocab${r + 1} AS MATERIALIZED (
             |  SELECT piece FROM (
             |    SELECT piece, row_number() OVER (ORDER BY c DESC, piece ASC) AS rk
             |    FROM use$r WHERE length(piece) > 1
             |  ) WHERE rk <= ${pruneKs(r - 1)}
             |  UNION
             |  SELECT piece FROM chars
             |)""".stripMargin
        else ""
      s"""nx$r AS MATERIALIZED (
         |  SELECT w, pos, piece, plen FROM (
         |    SELECT p.w, p.pos, v.piece, length(v.piece) AS plen,
         |           row_number() OVER (PARTITION BY p.w, p.pos
         |                              ORDER BY length(v.piece) DESC) AS rn
         |    FROM wpos p JOIN vocab$r v
         |      ON substring(p.w, p.pos + 1, length(v.piece)) = v.piece
         |  ) WHERE rn = 1
         |),
         |sg$r(w, n, pos, piece, tix) AS (
         |  SELECT w, n, 0, CAST(NULL AS VARCHAR), CAST(0 AS BIGINT) FROM w0
         |  UNION ALL
         |  SELECT s.w, s.n, s.pos + x.plen, x.piece, s.tix + 1
         |  FROM sg$r s JOIN nx$r x ON x.w = s.w AND x.pos = s.pos
         |),
         |use$r AS MATERIALIZED (
         |  SELECT v.piece, coalesce(u.c, 0) AS c
         |  FROM vocab$r v LEFT JOIN (
         |    SELECT piece, sum(n) AS c FROM sg$r WHERE piece IS NOT NULL GROUP BY 1
         |  ) u USING (piece)
         |)$prune""".stripMargin
    }.mkString(",\n")
    s"""w0 AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS n
       |  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents)
       |  GROUP BY 1
       |),
       |wpos AS MATERIALIZED (
       |  SELECT w, n, i - 1 AS pos
       |  FROM (SELECT w, n, unnest(generate_series(1, length(w))) AS i FROM w0)
       |),
       |chars AS MATERIALIZED (
       |  SELECT DISTINCT substring(w, pos + 1, 1) AS piece FROM wpos
       |),
       |seedc AS (
       |  SELECT substring(w, i, l) AS piece, sum(n) AS c
       |  FROM (
       |    SELECT w, n, i, unnest(generate_series(2, least($maxPieceLen, length(w) - i + 1))) AS l
       |    FROM (SELECT w, n, unnest(generate_series(1, length(w))) AS i FROM w0)
       |  )
       |  GROUP BY 1
       |),
       |vocab1 AS MATERIALIZED (
       |  SELECT piece FROM (
       |    SELECT piece, row_number() OVER (ORDER BY c DESC, piece ASC) AS rk FROM seedc
       |  ) WHERE rk <= $seedK
       |  UNION
       |  SELECT piece FROM chars
       |),
       |$rounds""".stripMargin
  }

  /** Mirror of SimSearch.ivfReport: the shared assignment chain aggregated
    * to per-centroid occupancy + micro-quantized cohesion. */
  def ivfReportSql(nList: Int, nIters: Int): String =
    s"""${ivfAssignCtes(nList, nIters)},
       |rj AS (
       |  SELECT a.cj, CAST(floor(c.cos * 1000000.0) AS BIGINT) AS cm
       |  FROM casgn a JOIN ccos c ON a.vec_id = c.vec_id AND a.cj = c.cj
       |)
       |SELECT CAST(cj AS BIGINT) AS cluster, CAST(count(*) AS BIGINT) AS n_assigned,
       |       CAST(sum(cm) AS BIGINT) AS sum_cos_micro,
       |       round(CAST(sum(cm) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1000000.0), 6) + 0.0 AS mean_cos
       |FROM rj GROUP BY cj""".stripMargin

  /** Composed mirror of IngestScreen.screen: exactIncrement + LSH-between +
    * 13-gram contamination, joined to one verdict row per batch doc. */
  def ingestScreenSql(
      histPred: String, batchPred: String, benchPred: String,
      threshold: Double): String = {
    val gram13 = (0 until 13).map(k => s"ws[g+$k]").mkString(" || ' ' || ")
    s"""WITH ex AS (${exactIncrementSql(histPred, batchPred)}),
       |ndp AS (${minHashLshBetweenSql(threshold, batchPred, histPred)}),
       |ndx AS (SELECT DISTINCT id_a AS doc_id FROM ndp),
       |ctd AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws FROM documents),
       |ctg AS (
       |  SELECT doc_id, $gram13 AS gram
       |  FROM (SELECT doc_id, ws, unnest(generate_series(1, greatest(len(ws) - 12, 0))) AS g FROM ctd)
       |),
       |cth AS (SELECT DISTINCT doc_id, ${tHashSql("gram")} AS gh FROM ctg),
       |ctx AS (
       |  SELECT DISTINCT c.doc_id
       |  FROM cth c JOIN (SELECT DISTINCT gh FROM cth WHERE doc_id IN
       |    (SELECT doc_id FROM documents WHERE $benchPred)) b ON c.gh = b.gh
       |  WHERE c.doc_id IN (SELECT doc_id FROM documents WHERE $batchPred)
       |)
       |SELECT ex.doc_id, ex.content_hash,
       |  CAST(1 - ex.kept AS BIGINT) AS exact_dup,
       |  CAST(CASE WHEN ndx.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS near_dup,
       |  CAST(CASE WHEN ctx.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS contaminated,
       |  CAST(CASE WHEN ex.kept = 1 AND ndx.doc_id IS NULL AND ctx.doc_id IS NULL
       |       THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM ex LEFT JOIN ndx USING (doc_id) LEFT JOIN ctx USING (doc_id)""".stripMargin
  }

  /** Mirror of Embeddings.powerIteration: quantized mean co-moment matrix +
    * nIters unrolled integer power steps (DuckDB `//` truncates toward zero
    * exactly like Spark's `div` — verified including negatives). */
  def powerIterationSql(dims: Int, nIters: Int): String =
    s"""WITH ${powerIterCtes(dims, nIters, "TRUE", "")}
       |SELECT CAST(j AS BIGINT) AS dim, CAST(vj AS BIGINT) AS v_micro FROM v$nIters""".stripMargin

  /** CTE chain of [[powerIterationSql]] with a row predicate and a CTE-name
    * prefix, so two chains (e.g. [[directionDriftSql]]'s slice pair) can
    * coexist in one query. Final direction lands in `<pfx>v<nIters>`. */
  private def powerIterCtes(dims: Int, nIters: Int, pred: String,
      pfx: String): String = {
    val steps = (1 to nIters).map { r =>
      s"""${pfx}mv$r AS (
         |  SELECT ${pfx}cm.i, sum(${pfx}cm.c * ${pfx}v${r - 1}.vj // 1000000) AS m
         |  FROM ${pfx}cm JOIN ${pfx}v${r - 1} ON ${pfx}v${r - 1}.j = ${pfx}cm.j
         |  GROUP BY 1
         |),
         |${pfx}mx$r AS (SELECT greatest(max(abs(m)), 1) AS mx FROM ${pfx}mv$r),
         |${pfx}v$r AS (
         |  SELECT ${pfx}mv$r.i AS j, ${pfx}mv$r.m * 1000000 // ${pfx}mx$r.mx AS vj
         |  FROM ${pfx}mv$r CROSS JOIN ${pfx}mx$r
         |)""".stripMargin
    }.mkString(",\n")
    s"""${pfx}pe AS (
       |  SELECT embedding AS e FROM embeddings
       |  WHERE embedding IS NOT NULL AND len(embedding) >= $dims AND ($pred)
       |),
       |${pfx}px AS (
       |  SELECT i.i - 1 AS i, j.j - 1 AS j,
       |    CAST(floor(CAST(e[i.i] AS DOUBLE) * CAST(e[j.j] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS p
       |  FROM ${pfx}pe
       |  CROSS JOIN (SELECT unnest(generate_series(1, $dims)) AS i) i
       |  CROSS JOIN (SELECT unnest(generate_series(1, $dims)) AS j) j
       |),
       |${pfx}cm AS (
       |  SELECT i, j, CAST(sum(p) AS BIGINT) // count(*) AS c
       |  FROM ${pfx}px GROUP BY 1, 2
       |),
       |${pfx}v0 AS (SELECT unnest(generate_series(0, ${dims - 1})) AS j, CAST(1000000 AS BIGINT) AS vj),
       |$steps""".stripMargin
  }

  /** Mirror of Embeddings.directionDrift on the even/odd vec_id slices:
    * two prefixed power chains + one canonical-double cosine. */
  def directionDriftSql(dims: Int, nIters: Int): String =
    s"""WITH ${powerIterCtes(dims, nIters, "vec_id % 2 = 0", "da")},
       |${powerIterCtes(dims, nIters, "vec_id % 2 = 1", "db")},
       |dj AS (SELECT a.vj AS av, b.vj AS bv
       |       FROM dav$nIters a JOIN dbv$nIters b ON a.j = b.j),
       |ds AS (SELECT CAST(sum(av * bv // 1000000) AS BIGINT) AS dot,
       |         CAST(sum(av * av // 1000000) AS BIGINT) AS na,
       |         CAST(sum(bv * bv // 1000000) AS BIGINT) AS nb FROM dj)
       |SELECT CAST(floor(CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * nb) * 1000000.0)
       |    AS BIGINT) AS cos_micro,
       |  dot AS dot_micro, na AS na_micro, nb AS nb_micro
       |FROM ds""".stripMargin

  /** Mirror of Embeddings.secondComponent: the powerIteration chain, then
    * Hotelling deflation (λ = uᵀCu/uᵀu in the same per-term-div-10⁶
    * canonical order) and a second unrolled power loop over the deflated
    * matrix. */
  def secondComponentSql(dims: Int, nIters: Int): String = {
    def steps(cmN: String, p: String) = (1 to nIters).map { r =>
      s"""${p}mv$r AS (
         |  SELECT $cmN.i, sum($cmN.c * ${p}v${r - 1}.vj // 1000000) AS m
         |  FROM $cmN JOIN ${p}v${r - 1} ON ${p}v${r - 1}.j = $cmN.j
         |  GROUP BY 1
         |),
         |${p}mx$r AS (SELECT greatest(max(abs(m)), 1) AS mx FROM ${p}mv$r),
         |${p}v$r AS (
         |  SELECT ${p}mv$r.i AS j, ${p}mv$r.m * 1000000 // ${p}mx$r.mx AS vj
         |  FROM ${p}mv$r CROSS JOIN ${p}mx$r
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH pe AS (
       |  SELECT embedding AS e FROM embeddings
       |  WHERE embedding IS NOT NULL AND len(embedding) >= $dims
       |),
       |px AS (
       |  SELECT i.i - 1 AS i, j.j - 1 AS j,
       |    CAST(floor(CAST(e[i.i] AS DOUBLE) * CAST(e[j.j] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS p
       |  FROM pe
       |  CROSS JOIN (SELECT unnest(generate_series(1, $dims)) AS i) i
       |  CROSS JOIN (SELECT unnest(generate_series(1, $dims)) AS j) j
       |),
       |cm AS (
       |  SELECT i, j, CAST(sum(p) AS BIGINT) // count(*) AS c
       |  FROM px GROUP BY 1, 2
       |),
       |v0 AS (SELECT unnest(generate_series(0, ${dims - 1})) AS j, CAST(1000000 AS BIGINT) AS vj),
       |${steps("cm", "")},
       |uD AS (SELECT CAST(sum(vj * vj // 1000000) AS BIGINT) AS d FROM v$nIters),
       |ucu AS (SELECT cm.i, CAST(sum(cm.c * u.vj // 1000000) AS BIGINT) AS cu
       |        FROM cm JOIN v$nIters u ON u.j = cm.j GROUP BY 1),
       |uN AS (SELECT CAST(sum(u.vj * c.cu // 1000000) AS BIGINT) AS n
       |       FROM v$nIters u JOIN ucu c ON c.i = u.j),
       |ul AS (SELECT (uN.n * 1000000) // uD.d AS lam, uD.d AS d FROM uN CROSS JOIN uD),
       |cm2 AS (
       |  SELECT cm.i, cm.j,
       |    cm.c - (((ul.lam * ui.vj) // 1000000) * uj.vj) // ul.d AS c
       |  FROM cm JOIN v$nIters ui ON ui.j = cm.i
       |  JOIN v$nIters uj ON uj.j = cm.j
       |  CROSS JOIN ul
       |),
       |wv0 AS (SELECT unnest(generate_series(0, ${dims - 1})) AS j, CAST(1000000 AS BIGINT) AS vj),
       |${steps("cm2", "w")}
       |SELECT CAST(j AS BIGINT) AS dim, CAST(vj AS BIGINT) AS v2_micro FROM wv$nIters""".stripMargin
  }

  /** Mirror of Embeddings.removeTopComponent: the powerIteration chain's
    * direction as a double list, then the per-vector projection residuals
    * with the same d-ascending folds. */
  def removeTopComponentSql(dims: Int, nIters: Int): String =
    s"""WITH pu AS (
       |  SELECT list(CAST(v_micro AS DOUBLE) / 1000000.0 ORDER BY dim) AS uv
       |  FROM (${powerIterationSql(dims, nIters)})
       |),
       |pn AS (SELECT uv, list_sum(list_transform(uv, x -> x * x)) AS nu2 FROM pu),
       |pv AS (
       |  SELECT vec_id, embedding AS e FROM embeddings
       |  WHERE embedding IS NOT NULL AND len(embedding) >= $dims
       |),
       |pd AS (
       |  SELECT v.vec_id, v.e, p.uv, p.nu2,
       |    list_sum(list_transform(generate_series(1, $dims),
       |      i -> CAST(v.e[i] AS DOUBLE) * p.uv[i])) AS dot
       |  FROM pv v CROSS JOIN pn p
       |)
       |SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim,
       |  round(CAST(e[i] AS DOUBLE) - (dot / nu2) * uv[i], 6) + 0.0 AS resid
       |FROM (SELECT vec_id, e, uv, nu2, dot,
       |             unnest(generate_series(1, $dims)) AS i FROM pd)""".stripMargin

  /** Mirror of Dedup.paragraphDedup: newline paragraphs, dup = line digest
    * in >= minDocs distinct docs, survivors rejoined in original order
    * (string_agg skips the cut lines' NULLs; all-cut docs -> md5('')). */
  def paragraphDedupSql(minDocs: Int): String =
    s"""WITH pw AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws
       |            FROM documents WHERE text IS NOT NULL),
       |pch AS (
       |  SELECT doc_id, g, array_to_string(ws[g * 10 + 1 : g * 10 + 10], ' ') AS para
       |  FROM (SELECT doc_id, ws, unnest(generate_series(0, (len(ws) + 9) // 10 - 1)) AS g
       |        FROM pw WHERE len(ws) > 0)
       |),
       |pdoc AS (SELECT doc_id, string_agg(para, chr(10) ORDER BY g) AS text
       |         FROM pch GROUP BY doc_id),
       |d AS (SELECT doc_id, str_split(text, chr(10)) AS ls
       |      FROM pdoc WHERE text IS NOT NULL),
       |l AS (SELECT doc_id, i - 1 AS p, ls[i] AS ln
       |      FROM (SELECT doc_id, ls, unnest(generate_series(1, len(ls))) AS i FROM d)),
       |ne AS (SELECT doc_id, p, md5(ln) AS h FROM l WHERE length(ln) > 0),
       |dup AS (SELECT h FROM ne GROUP BY h HAVING count(DISTINCT doc_id) >= $minDocs),
       |fl AS (SELECT ne.doc_id, ne.p, 1 AS dup FROM ne JOIN dup USING (h)),
       |j AS (SELECT l.doc_id, l.p, l.ln, fl.dup
       |      FROM l LEFT JOIN fl ON fl.doc_id = l.doc_id AND fl.p = l.p)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
       |  CAST(sum(coalesce(dup, 0)) AS BIGINT) AS n_cut,
       |  md5(coalesce(string_agg(CASE WHEN dup IS NULL THEN ln END, chr(10) ORDER BY p), ''))
       |    AS clean_md5
       |FROM j GROUP BY doc_id""".stripMargin

  /** Mirror of Multimodal.dHash over the UTF-8 payload built from `text` —
    * valid because the synthetic corpus is pure ASCII (byte i == ascii of
    * char i), per-char sums into 65 integer-math segments, gradient bits. */
  def mmDHashSql: String = {
    val sums = (0 to 64).map(k =>
      s"coalesce(sum(CASE WHEN seg = $k THEN v END), 0) AS s$k").mkString(",\n    ")
    val bits = (0 until 64).map(i =>
      s"(CASE WHEN s$i > s${i + 1} THEN ${1L << i} ELSE 0 END)").mkString(" + ")
    s"""WITH p AS (SELECT doc_id, text, length(text) AS n FROM documents),
       |bx AS (
       |  SELECT doc_id, (CAST(i - 1 AS BIGINT) * 65) // n AS seg,
       |         ascii(substring(text, i, 1)) AS v
       |  FROM (SELECT doc_id, text, n, unnest(generate_series(1, n)) AS i
       |        FROM p WHERE n > 0)
       |),
       |sg AS (
       |  SELECT doc_id,
       |    $sums
       |  FROM bx GROUP BY doc_id
       |)
       |SELECT p.doc_id, CAST($bits AS BIGINT) AS phash
       |FROM p LEFT JOIN sg USING (doc_id)""".stripMargin
  }

  /** Shared CTE chain of the DECODED-image dHash mirror: the fixture's pixel
    * formula (Multimodal.fixtureImageBytes) evaluated analytically — valid
    * because the fixture encodes through LOSSLESS codecs (PNG/BMP), so the
    * engine's decode returns exactly these pixels — then per-pixel integer
    * luma, 2×2 block means, gradient bits, and the 64-bit assembly (bit 63
    * as the Long.MinValue literal — DuckDB errors on `1::BIGINT << 63`). */
  private def mmImageDHashCtes: String =
    s"""ids AS (SELECT doc_id FROM documents WHERE doc_id < 60),
       |px AS (
       |  SELECT doc_id, x, y, doc_id // 2 AS base,
       |    CASE WHEN doc_id % 2 = 1 AND x < 2 AND y < 2 THEN 60 ELSE 0 END AS p
       |  FROM ids,
       |       (SELECT unnest(generate_series(0, 17)) AS x) xs,
       |       (SELECT unnest(generate_series(0, 15)) AS y) ys
       |),
       |lm AS (
       |  SELECT doc_id, x // 2 AS gx, y // 2 AS gy,
       |    (299 * ((base * 31 + x * 7 + y * 13 + p) % 256)
       |     + 587 * ((base * 17 + x * 11 + y * 3 + p) % 256)
       |     + 114 * ((base * 23 + x * 5 + y * 19 + p) % 256)) // 1000 AS l
       |  FROM px
       |),
       |grid AS (
       |  SELECT doc_id, gy, gx, sum(l) // 4 AS v FROM lm GROUP BY 1, 2, 3
       |),
       |bits AS (
       |  SELECT a.doc_id, CAST(a.gy * 8 + a.gx AS BIGINT) AS bit
       |  FROM grid a JOIN grid b ON a.doc_id = b.doc_id AND a.gy = b.gy
       |    AND b.gx = a.gx + 1
       |  WHERE a.gx < 8 AND a.v > b.v
       |),
       |iph AS (
       |  SELECT ids.doc_id,
       |    CAST(coalesce(sum(CASE WHEN bit = 63 THEN -9223372036854775808
       |      ELSE (1::BIGINT << CAST(bit AS INT)) END), 0) AS BIGINT) AS phash
       |  FROM ids LEFT JOIN bits USING (doc_id) GROUP BY ids.doc_id
       |)""".stripMargin

  /** Mirror of Multimodal.imageDHash over the lossless image fixtures. */
  def mmImageDHashSql: String =
    s"""WITH $mmImageDHashCtes
       |SELECT doc_id, phash FROM iph""".stripMargin

  /** Mirror of Multimodal.imageDHashPairs: the decoded hashes banded 4×16,
    * same-(band, value) candidates, exact Hamming verify. */
  def mmImageDHashPairsSql(maxHamming: Int): String =
    s"""WITH $mmImageDHashCtes,
       |bd AS (
       |  SELECT doc_id, phash, b, (phash >> (b * 16)) & 65535 AS k
       |  FROM (SELECT doc_id, phash, unnest(generate_series(0, 3)) AS b FROM iph)
       |),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |         a.phash AS pa, b.phash AS pb
       |  FROM bd a JOIN bd b ON a.b = b.b AND a.k = b.k AND a.doc_id < b.doc_id
       |)
       |SELECT id_a, id_b, CAST(bit_count(xor(pa, pb)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(pa, pb)) <= $maxHamming""".stripMargin

  /** Mirror of Multimodal.dHashPairs: the dHash relation banded 4×16 bits,
    * same-(band, value) candidates, exact Hamming verify. */
  def mmDHashPairsSql(maxHamming: Int): String =
    s"""WITH ph AS ($mmDHashSql),
       |bd AS (
       |  SELECT doc_id, phash, b, (phash >> (b * 16)) & 65535 AS k
       |  FROM (SELECT doc_id, phash, unnest(generate_series(0, 3)) AS b FROM ph)
       |),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |         a.phash AS pa, b.phash AS pb
       |  FROM bd a JOIN bd b ON a.b = b.b AND a.k = b.k AND a.doc_id < b.doc_id
       |)
       |SELECT id_a, id_b, CAST(bit_count(xor(pa, pb)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(pa, pb)) <= $maxHamming""".stripMargin

  /** Mirror of StreamDrift.psiPerWindow's batch face over events.value:
    * baseline = the table's own global smoothed masses, windows = calendar
    * days, per-window PSI summed over the fixed bin spine. */
  def streamDriftSql(lo: Double, hi: Double, nBins: Int): String = {
    val w = (hi - lo) / nBins
    val binOf = (x: String) =>
      s"least(greatest(CAST(floor((CAST($x AS DOUBLE) - $lo) / $w) AS BIGINT), 0), ${nBins - 1})"
    s"""WITH v AS (
       |  SELECT ts, value FROM events WHERE value IS NOT NULL AND NOT isnan(value)
       |),
       |tt AS (SELECT count(*) AS tn FROM v),
       |sp AS (SELECT CAST(unnest(generate_series(0, ${nBins - 1})) AS BIGINT) AS bin),
       |gb AS (SELECT ${binOf("value")} AS bin, count(*) AS c FROM v GROUP BY 1),
       |base AS (
       |  SELECT sp.bin, (coalesce(gb.c, 0) + 1) * 1000000 // (tt.tn + $nBins) AS bm
       |  FROM sp LEFT JOIN gb USING (bin) CROSS JOIN tt
       |),
       |wb AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS win_start,
       |              ${binOf("value")} AS bin FROM v),
       |wt AS (SELECT win_start, count(*) AS n FROM wb GROUP BY 1),
       |wc AS (SELECT win_start, bin, count(*) AS c FROM wb GROUP BY 1, 2),
       |j AS (
       |  SELECT wt.win_start, wt.n, sp.bin, coalesce(wc.c, 0) AS c, base.bm
       |  FROM wt CROSS JOIN sp
       |  LEFT JOIN wc ON wc.win_start = wt.win_start AND wc.bin = sp.bin
       |  JOIN base ON base.bin = sp.bin
       |)
       |SELECT win_start, CAST(n AS BIGINT) AS n,
       |  CAST(sum(((c + 1) * 1000000 // (n + $nBins) - bm)
       |    * CAST(floor((ln(CAST((c + 1) * 1000000 // (n + $nBins) AS DOUBLE))
       |        - ln(CAST(bm AS DOUBLE))) * 1000000.0) AS BIGINT)
       |    // 1000000) AS BIGINT) AS psi_micro
       |FROM j GROUP BY win_start, n""".stripMargin
  }

  /** Mirror of CorpusStats.ksDrift over documents.n_chars, even/odd split. */
  def ksDriftSql(lo: Double, hi: Double, nBins: Int): String = {
    val w = (hi - lo) / nBins
    def binned(pred: String) =
      s"""SELECT least(greatest(CAST(floor((CAST(n_chars AS DOUBLE) - $lo) / $w) AS BIGINT), 0),
         |    ${nBins - 1}) AS bin, count(*) AS n
         |  FROM documents WHERE $pred AND n_chars IS NOT NULL GROUP BY 1""".stripMargin
    s"""WITH bb AS (${binned("doc_id % 2 = 0")}),
       |cc AS (${binned("doc_id % 2 = 1")}),
       |tb AS (SELECT coalesce(sum(n), 0) AS t FROM bb),
       |tc AS (SELECT coalesce(sum(n), 0) AS t FROM cc),
       |sp AS (SELECT CAST(unnest(generate_series(0, ${nBins - 1})) AS BIGINT) AS bin),
       |j AS (
       |  SELECT sp.bin, coalesce(bb.n, 0) AS nb, coalesce(cc.n, 0) AS nc
       |  FROM sp LEFT JOIN bb USING (bin) LEFT JOIN cc USING (bin)
       |),
       |cum AS (
       |  SELECT bin,
       |    sum(nb) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cb,
       |    sum(nc) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cn
       |  FROM j
       |),
       |g AS (
       |  SELECT bin,
       |    abs(cb * 1000000 // greatest(tb.t, 1) - cn * 1000000 // greatest(tc.t, 1)) AS gap
       |  FROM cum CROSS JOIN tb CROSS JOIN tc
       |)
       |SELECT CAST(tb.t AS BIGINT) AS n_base, CAST(tc.t AS BIGINT) AS n_cur,
       |       CAST(gap AS BIGINT) AS ks_micro, bin AS at_bin
       |FROM g CROSS JOIN tb CROSS JOIN tc
       |ORDER BY gap DESC, bin ASC LIMIT 1""".stripMargin
  }

  /** Mirror of CorpusStats.psiDriftByGroup over documents (source groups,
    * n_chars values, each source vs the whole corpus). */
  def psiDriftByGroupSql(lo: Double, hi: Double, nBins: Int): String = {
    val w = (hi - lo) / nBins
    s"""WITH r AS (
       |  SELECT source AS g,
       |    least(greatest(CAST(floor((CAST(n_chars AS DOUBLE) - $lo) / $w) AS BIGINT), 0),
       |      ${nBins - 1}) AS bin
       |  FROM documents WHERE source IS NOT NULL AND n_chars IS NOT NULL
       |),
       |pg AS (SELECT g, bin, count(*) AS ng FROM r GROUP BY 1, 2),
       |cp AS (SELECT bin, count(*) AS nc FROM r GROUP BY 1),
       |tg AS (SELECT g, sum(ng) AS t FROM pg GROUP BY 1),
       |tcx AS (SELECT coalesce(sum(nc), 0) AS t FROM cp),
       |sp AS (
       |  SELECT tg.g, tg.t, b.bin
       |  FROM tg CROSS JOIN (SELECT CAST(unnest(generate_series(0, ${nBins - 1})) AS BIGINT) AS bin) b
       |),
       |j AS (
       |  SELECT sp.g, sp.t AS tgt, coalesce(pg.ng, 0) AS ng,
       |         coalesce(cp.nc, 0) AS nc, tcx.t AS tct
       |  FROM sp LEFT JOIN pg ON pg.g = sp.g AND pg.bin = sp.bin
       |  LEFT JOIN cp ON cp.bin = sp.bin
       |  CROSS JOIN tcx
       |),
       |k AS (
       |  SELECT g, tgt,
       |    (nc + 1) * 1000000 // (tct + $nBins) AS bm,
       |    (ng + 1) * 1000000 // (tgt + $nBins) AS cm
       |  FROM j
       |),
       |p AS (
       |  SELECT g, tgt,
       |    (cm - bm) * CAST(floor((ln(CAST(cm AS DOUBLE)) - ln(CAST(bm AS DOUBLE))) * 1000000.0) AS BIGINT)
       |      // 1000000 AS psi
       |  FROM k
       |)
       |SELECT g AS source, CAST(max(tgt) AS BIGINT) AS n_docs,
       |       CAST(sum(psi) AS BIGINT) AS psi_micro
       |FROM p GROUP BY 1""".stripMargin
  }

  /** Mirror of CorpusStats.linearTextScore with the gate's deterministic
    * HRW-mix weight table (non-negative, so `div` and `//` agree). */
  def linearTextScoreSql(dim: Int): String =
    s"""WITH w AS (
       |  SELECT CAST(s AS BIGINT) AS bucket,
       |    CAST((s % 1000003) * 8191 % 1000003 * 2654435761 % 1000003 AS BIGINT) AS w_micro
       |  FROM (SELECT unnest(generate_series(0, ${dim - 1})) AS s)
       |),
       |dw AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
       |       FROM documents),
       |db AS (SELECT doc_id,
       |         ((${tHashSql("word")} % $dim) + $dim) % $dim AS bucket
       |       FROM dw)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |  CAST(sum(coalesce(w.w_micro, 0)) AS BIGINT) AS w_sum,
       |  CAST(sum(coalesce(w.w_micro, 0)) // count(*) AS BIGINT) AS score_micro
       |FROM db LEFT JOIN w USING (bucket)
       |GROUP BY doc_id""".stripMargin

  /** The dedup_paragraph gate's deterministic paragraph-ization (10-word
    * chunks of the single-line synthetic corpus joined by newlines), shared
    * by every line-granularity oracle: emits `l(doc_id, p, ln)`. */
  private val paraLinesCtes: String =
    s"""pw AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws
       |            FROM documents WHERE text IS NOT NULL),
       |pch AS (
       |  SELECT doc_id, g, array_to_string(ws[g * 10 + 1 : g * 10 + 10], ' ') AS para
       |  FROM (SELECT doc_id, ws, unnest(generate_series(0, (len(ws) + 9) // 10 - 1)) AS g
       |        FROM pw WHERE len(ws) > 0)
       |),
       |pdoc AS (SELECT doc_id, string_agg(para, chr(10) ORDER BY g) AS text
       |         FROM pch GROUP BY doc_id),
       |d AS (SELECT doc_id, str_split(text, chr(10)) AS ls
       |      FROM pdoc WHERE text IS NOT NULL),
       |l AS (SELECT doc_id, i - 1 AS p, ls[i] AS ln
       |      FROM (SELECT doc_id, ls, unnest(generate_series(1, len(ls))) AS i FROM d))""".stripMargin

  /** Mirror of Dedup.lineDedupWithinDoc over the paragraph-ized corpus:
    * within each doc the first occurrence of a distinct non-empty line
    * survives, later copies are cut; empty lines always survive. */
  val lineDedupWithinDocSql: String =
    s"""WITH $paraLinesCtes,
       |k AS (SELECT doc_id, p, ln,
       |        CASE WHEN length(ln) > 0 THEN md5(ln)
       |             ELSE 'e:' || CAST(p AS VARCHAR) END AS h
       |      FROM l),
       |f AS (SELECT doc_id, p, ln,
       |        CASE WHEN row_number() OVER (PARTITION BY doc_id, h ORDER BY p) > 1
       |             THEN 1 ELSE 0 END AS cut
       |      FROM k)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
       |  CAST(sum(cut) AS BIGINT) AS n_cut,
       |  md5(coalesce(string_agg(CASE WHEN cut = 0 THEN ln END, chr(10) ORDER BY p), ''))
       |    AS clean_md5
       |FROM f GROUP BY doc_id""".stripMargin

  /** Mirror of CorpusStats.lineRepetitionReport over the paragraph-ized
    * corpus (integer-milli duplicate-line and duplicate-char fractions). */
  val lineRepetitionSql: String =
    s"""WITH $paraLinesCtes,
       |ne AS (SELECT doc_id, md5(ln) AS h, CAST(length(ln) AS BIGINT) AS le
       |       FROM l WHERE length(ln) > 0),
       |g AS (SELECT doc_id, h, count(*) AS c, min(le) AS le FROM ne GROUP BY doc_id, h)
       |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines,
       |  CAST(sum(c - 1) AS BIGINT) AS dup_lines,
       |  CAST(sum(c - 1) * 1000 // sum(c) AS BIGINT) AS dup_line_milli,
       |  CAST(CASE WHEN sum(c * le) > 0 THEN sum((c - 1) * le) * 1000 // sum(c * le)
       |       ELSE 0 END AS BIGINT) AS dup_char_milli
       |FROM g GROUP BY doc_id""".stripMargin

  /** Mirror of Dedup.cdcChunks: Karp–Rabin boundary detection over the
    * per-doc char-code list (same b/p/m constants, every term < 2⁶³ so both
    * engines compute the identical BIGINT hash), lag-window segments,
    * md5-digest cross-doc dup verdict. */
  def cdcChunksSql(window: Int, avgChunk: Int, minDocs: Int): String = {
    val P = 1000000007L
    val pow = Array.iterate(1L, window)(x => x * 257L % P)
    val hsum = (0 until window).map(j => s"cs[i-$j]*${pow(j)}").mkString(" + ")
    s"""WITH cl AS (
       |  SELECT doc_id, text,
       |         list_transform(string_split(text, ''), ch -> CAST(ascii(ch) AS BIGINT)) AS cs,
       |         CAST(length(text) AS BIGINT) AS n
       |  FROM documents WHERE text IS NOT NULL AND length(text) > 0
       |),
       |bp AS (
       |  SELECT doc_id, i FROM (
       |    SELECT doc_id, CAST(unnest(generate_series($window, n)) AS BIGINT) AS i, cs
       |    FROM cl WHERE n >= $window)
       |  WHERE ($hsum) % $P % $avgChunk = ${avgChunk - 1}
       |  UNION
       |  SELECT doc_id, n AS i FROM cl
       |),
       |sg AS (
       |  SELECT doc_id,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS ci,
       |         coalesce(lag(i) OVER (PARTITION BY doc_id ORDER BY i), 0) + 1 AS s,
       |         i AS e
       |  FROM bp
       |),
       |ch AS (SELECT sg.doc_id, ci, s, e - s + 1 AS le,
       |         md5(substring(cl.text, CAST(s AS INT), CAST(e - s + 1 AS INT))) AS ck
       |       FROM sg JOIN cl USING (doc_id)),
       |dup AS (SELECT ck FROM ch GROUP BY ck HAVING count(DISTINCT doc_id) >= $minDocs)
       |SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx, CAST(s AS BIGINT) AS chunk_start,
       |  CAST(le AS BIGINT) AS chunk_len,
       |  CAST(CASE WHEN dup.ck IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_dup
       |FROM ch LEFT JOIN dup USING (ck)""".stripMargin
  }

  /** Mirror of Dedup.groupSignatureSim over documents.source: group
    * signature component j = min of the MinHash permutation over the
    * group's UNION of shingles (≡ the elementwise min of member doc
    * signatures the Scala side folds — min of mins), pairwise estimate =
    * matching minima / 32. Permutation formula copied verbatim from
    * [[minHashBandCtes]]. */
  def groupSigSimSql: String =
    s"""WITH $shingleCtes,
       |gsh AS (SELECT DISTINCT d.source, s.sh
       |        FROM dsh s JOIN documents d USING (doc_id)
       |        WHERE d.source IS NOT NULL),
       |gth AS (SELECT source, ${tHashSql("sh")} % 1000003 AS thc FROM gsh),
       |gmh AS (
       |  SELECT source, j,
       |    min((((j*2654435761 + 1) % 1000000007) * thc + ((j*2654446111 + 12345) % 1000000007)) % 1000000007) AS mh
       |  FROM gth, (SELECT unnest(generate_series(0, 31)) AS j)
       |  GROUP BY source, j
       |),
       |sz AS (SELECT source, count(*) AS n FROM documents
       |       WHERE source IS NOT NULL AND text IS NOT NULL GROUP BY source),
       |pm AS (
       |  SELECT a.source AS group_a, b.source AS group_b,
       |         CAST(sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS BIGINT) AS matching
       |  FROM gmh a JOIN gmh b ON a.j = b.j AND a.source < b.source
       |  GROUP BY 1, 2
       |)
       |SELECT pm.group_a, pm.group_b,
       |       CAST(za.n AS BIGINT) AS n_docs_a, CAST(zb.n AS BIGINT) AS n_docs_b,
       |       pm.matching, round(CAST(pm.matching AS DOUBLE) / 32.0, 6) + 0.0 AS est_jaccard
       |FROM pm
       |JOIN sz za ON pm.group_a = za.source
       |JOIN sz zb ON pm.group_b = zb.source""".stripMargin

  /** Mirror of Dedup.groupGramOverlap over documents.source: distinct
    * (source, n-gram md5), gram-keyed pair counts, containment vs the
    * smaller side. */
  def groupGramOverlapSql(n: Int): String =
    s"""WITH gow AS (SELECT source, regexp_extract_all(lower(text), '[a-z]+') AS ws
       |             FROM documents WHERE source IS NOT NULL),
       |gog AS (SELECT DISTINCT source,
       |          md5(array_to_string(ws[i:i+${n - 1}], ' ')) AS h
       |        FROM (SELECT source, ws, unnest(generate_series(1, len(ws) - ${n - 1})) AS i
       |              FROM gow WHERE len(ws) >= $n)),
       |goc AS (SELECT source, count(*) AS ng FROM gog GROUP BY source),
       |gop AS (SELECT a.source AS source_a, b.source AS source_b,
       |          CAST(count(*) AS BIGINT) AS shared_grams
       |        FROM gog a JOIN gog b ON a.h = b.h AND a.source < b.source
       |        GROUP BY 1, 2)
       |SELECT p.source_a, p.source_b,
       |       CAST(ca.ng AS BIGINT) AS n_grams_a, CAST(cb.ng AS BIGINT) AS n_grams_b,
       |       p.shared_grams,
       |       CAST(p.shared_grams * 1000 // least(ca.ng, cb.ng) AS BIGINT)
       |         AS containment_milli
       |FROM gop p
       |JOIN goc ca ON p.source_a = ca.source
       |JOIN goc cb ON p.source_b = cb.source""".stripMargin

  /** Mirror of Dedup.stitchPairs over `docRel` (a `(doc_id, text)` SQL
    * relation): directional pairs on the md5 of the k-word boundary gram
    * (tail of a == head of b). */
  def stitchPairsSql(k: Int,
      docRel: String = "SELECT doc_id, text FROM documents"): String =
    s"""WITH sdoc AS ($docRel),
       |w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws FROM sdoc),
       |e AS (SELECT doc_id, ws FROM w WHERE len(ws) >= $k),
       |hd AS (SELECT doc_id AS id_b, md5(array_to_string(ws[1:$k], ' ')) AS boundary_md5 FROM e),
       |tl AS (SELECT doc_id AS id_a,
       |         md5(array_to_string(ws[len(ws)-${k - 1}:len(ws)], ' ')) AS boundary_md5 FROM e)
       |SELECT id_a, id_b, boundary_md5
       |FROM tl JOIN hd USING (boundary_md5)
       |WHERE id_a <> id_b""".stripMargin

  /** The overlapping-halves fragment relation the doc_stitch_pairs gate
    * feeds [[stitchPairsSql]]: frag 2d = words[1..ceil(n/2)], frag 2d+1 =
    * words[ceil(n/2)-7..n] of every doc with ≥ 16 words. */
  def stitchFragmentsRel: String =
    s"""SELECT doc_id * 2 AS doc_id,
       |       array_to_string(ws[1:(len(ws)+1)//2], ' ') AS text
       |FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws
       |      FROM documents) WHERE len(ws) >= 16
       |UNION ALL
       |SELECT doc_id * 2 + 1,
       |       array_to_string(ws[(len(ws)+1)//2-7:len(ws)], ' ')
       |FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws
       |      FROM documents) WHERE len(ws) >= 16""".stripMargin

  /** Mirror of Sampling.bootstrapCounts: Poisson(1) multiplicity per
    * (doc, replicate) from the pinned 2³²-scaled CDF thresholds. */
  def bootstrapCountsSql(nReplicates: Int): String = {
    val t = graft.operators.Sampling.PoissonCdf32
    val key = "CAST(doc_id AS VARCHAR) || ':' || CAST(replicate AS VARCHAR)"
    s"""WITH r AS (SELECT unnest(generate_series(0, ${nReplicates - 1})) AS replicate),
       |d AS (SELECT doc_id FROM documents WHERE doc_id IS NOT NULL),
       |u AS (SELECT replicate,
       |        (((((${tHashSql(key)} % 65521) + 65521) % 65521) * 2654435761) % 4294967296) AS u
       |      FROM d, r),
       |c AS (SELECT replicate,
       |        CASE WHEN u < ${t(0)} THEN 0 WHEN u < ${t(1)} THEN 1
       |             WHEN u < ${t(2)} THEN 2 WHEN u < ${t(3)} THEN 3
       |             WHEN u < ${t(4)} THEN 4 WHEN u < ${t(5)} THEN 5
       |             ELSE 6 END AS c
       |      FROM u)
       |SELECT CAST(replicate AS BIGINT) AS replicate,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(c) AS BIGINT) AS n_drawn,
       |       CAST(sum(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
       |FROM c GROUP BY replicate""".stripMargin
  }

  /** Mirror of SimSearch.kmeansAssign: the [[ivfAssignCtes]] seed + Lloyd +
    * assignment chain, projected per vector instead of per list. */
  def kmeansAssignSql(k: Int, nIters: Int): String =
    s"""${ivfAssignCtes(k, nIters)}
       |SELECT a.vec_id, CAST(a.cj AS BIGINT) AS cluster,
       |       CAST(floor(c.cos * 1000000.0) AS BIGINT) AS cos_micro
       |FROM casgn a JOIN ccos c ON a.vec_id = c.vec_id AND a.cj = c.cj""".stripMargin

  /** Mirror of CorpusStats.stupidBackoffLogLoss: bigram LM from the
    * `trainPred` slice, cost −ln(c(v,w)/c(v)) when seen else
    * −ln(α·(c(w)+1)/(N+V)), micro-nat floored per distinct bigram before
    * the per-doc sum (same quantization as the xent family). */
  def stupidBackoffSql(trainPred: String, alphaMilli: Int): String = {
    val a = alphaMilli.toDouble / 1000.0
    s"""WITH aw AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws FROM documents),
       |pr AS (SELECT doc_id, ws[i] AS v, ws[i+1] AS w
       |       FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws)-1)) AS i
       |             FROM aw WHERE len(ws) >= 2)),
       |tu AS (SELECT unnest(ws) AS w FROM aw WHERE doc_id IN
       |         (SELECT doc_id FROM documents WHERE $trainPred)),
       |uni AS (SELECT w, count(*) AS cw FROM tu GROUP BY w),
       |tot AS (SELECT CAST(sum(cw) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS v FROM uni),
       |tb AS (SELECT ws[i] AS v, ws[i+1] AS w
       |       FROM (SELECT ws, unnest(generate_series(1, len(ws)-1)) AS i
       |             FROM aw WHERE len(ws) >= 2 AND doc_id IN
       |               (SELECT doc_id FROM documents WHERE $trainPred))),
       |big AS (SELECT v, w, count(*) AS cvw FROM tb GROUP BY v, w),
       |seen AS (SELECT b.v, b.w,
       |           CAST(floor(-ln(CAST(b.cvw AS DOUBLE) / CAST(u.cw AS DOUBLE))
       |                * 1000000.0) AS BIGINT) AS q
       |         FROM big b JOIN uni u ON b.v = u.w),
       |fb AS (SELECT w, CAST(floor(-ln($a * CAST(cw + 1 AS DOUBLE)
       |              / CAST(n + v AS DOUBLE)) * 1000000.0) AS BIGINT) AS qf
       |       FROM uni, tot),
       |oov AS (SELECT CAST(floor(-ln($a / CAST(n + v AS DOUBLE)) * 1000000.0) AS BIGINT) AS qo
       |        FROM tot),
       |cc AS (SELECT p.doc_id, coalesce(s.q, f.qf, o.qo) AS c
       |       FROM pr p
       |       LEFT JOIN seen s ON p.v = s.v AND p.w = s.w
       |       LEFT JOIN fb f ON p.w = f.w
       |       CROSS JOIN oov o)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |       round(CAST(sum(c) AS DOUBLE) / (count(*) * 1000000.0), 4) + 0.0 AS sbo_xent
       |FROM cc GROUP BY doc_id""".stripMargin
  }

  /** Mirror of CorpusStats.rakeTopPhrase: corpus-top-N stopwords, maximal
    * non-stopword runs, deg·1000 DIV freq word scores, top phrase per doc. */
  def rakeTopPhraseSql(nStopwords: Int): String =
    s"""WITH rw AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws FROM documents),
       |roc AS (SELECT doc_id, CAST(i AS BIGINT) AS p, ws[i] AS w
       |        FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i
       |              FROM rw WHERE len(ws) > 0)),
       |rcnt AS (SELECT w, count(*) AS c FROM roc GROUP BY w),
       |rstp AS (SELECT w FROM (SELECT w, row_number() OVER (ORDER BY c DESC, w ASC) AS rn
       |                        FROM rcnt) WHERE rn <= $nStopwords),
       |rns AS (SELECT doc_id, p, w FROM roc WHERE w NOT IN (SELECT w FROM rstp)),
       |risl AS (SELECT doc_id, p, w,
       |           p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS g
       |         FROM rns),
       |rpl AS (SELECT doc_id, g, count(*) AS plen FROM risl GROUP BY doc_id, g),
       |rocc AS (SELECT i.doc_id, i.g, i.p, i.w, rpl.plen
       |         FROM risl i JOIN rpl USING (doc_id, g)),
       |rwsc AS (SELECT doc_id, w, CAST(sum(plen) * 1000 // count(*) AS BIGINT) AS wsc
       |         FROM rocc GROUP BY doc_id, w),
       |rpsc AS (SELECT o.doc_id, o.g, CAST(sum(s.wsc) AS BIGINT) AS score_milli,
       |           string_agg(o.w, ' ' ORDER BY o.p) AS phrase
       |         FROM rocc o JOIN rwsc s ON o.doc_id = s.doc_id AND o.w = s.w
       |         GROUP BY o.doc_id, o.g),
       |rrk AS (SELECT doc_id, phrase, score_milli,
       |          row_number() OVER (PARTITION BY doc_id
       |            ORDER BY score_milli DESC, phrase ASC) AS rn
       |        FROM rpsc)
       |SELECT doc_id, phrase, score_milli FROM rrk WHERE rn = 1""".stripMargin

  /** Top-k face of [[rakeTopPhraseSql]] (mirrors CorpusStats.rakePhrases). */
  def rakePhrasesSql(nStopwords: Int, k: Int): String = {
    val base = rakeTopPhraseSql(nStopwords)
    base.substring(0, base.lastIndexOf("SELECT doc_id")) +
      s"""SELECT doc_id, CAST(rn AS BIGINT) AS rank, phrase, score_milli
         |FROM rrk WHERE rn <= $k""".stripMargin
  }

  /** Mirror of CorpusStats.groupQuantileNorm on documents(n_chars, source). */
  def groupQuantileNormSql: String =
    s"""SELECT doc_id, source, n_chars,
       |  CAST(CASE WHEN cnt > 1 THEN (r - 1) * 1000 // (cnt - 1) ELSE 0 END AS BIGINT)
       |    AS qnorm_milli
       |FROM (SELECT doc_id, source, n_chars,
       |        rank() OVER (PARTITION BY source ORDER BY n_chars ASC) AS r,
       |        count(*) OVER (PARTITION BY source) AS cnt
       |      FROM documents WHERE n_chars IS NOT NULL AND source IS NOT NULL)""".stripMargin

  /** Shared CTE chain of [[cappedQuotaSql]] / [[quotaFillSql]] — emits
    * `fq(source, w, raw_quota, quota)`. */
  private def cappedQuotaCtes(budget: Long, cap: Long): String =
    s"""counts AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS w FROM documents
       |           WHERE source IS NOT NULL AND n_chars IS NOT NULL GROUP BY source),
       |tot AS (SELECT CAST(sum(w) AS BIGINT) AS t FROM counts),
       |raw AS (SELECT source, w,
       |          CAST(CAST(w AS HUGEINT) * $budget // t AS BIGINT) AS raw_quota
       |        FROM counts, tot),
       |sp AS (SELECT
       |    CAST(sum(CASE WHEN raw_quota > $cap THEN raw_quota - $cap ELSE 0 END) AS BIGINT) AS l,
       |    CAST(sum(CASE WHEN raw_quota <= $cap THEN raw_quota ELSE 0 END) AS BIGINT) AS sr
       |  FROM raw),
       |fq AS (SELECT source, w, raw_quota,
       |  CAST(least($cap, CASE WHEN raw_quota > $cap THEN $cap
       |       ELSE raw_quota + CASE WHEN sr > 0
       |         THEN CAST(CAST(l AS HUGEINT) * raw_quota // sr AS BIGINT)
       |         ELSE 0 END END)
       |    AS BIGINT) AS quota
       |  FROM raw, sp)""".stripMargin

  /** Mirror of Sampling.cappedQuota on documents.source weighted by n_chars:
    * proportional quota, per-source cap, ONE overflow redistribution round. */
  def cappedQuotaSql(budget: Long, cap: Long): String =
    s"""WITH ${cappedQuotaCtes(budget, cap)}
       |SELECT source, w, raw_quota, quota FROM fq""".stripMargin

  /** Mirror of Sampling.quotaFill: per-source greedy (weight desc, id asc)
    * running-sum fill against the [[cappedQuotaCtes]] quotas. */
  def quotaFillSql(budget: Long, cap: Long): String =
    s"""WITH ${cappedQuotaCtes(budget, cap)},
       |cm AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
       |         CAST(sum(n_chars) OVER (PARTITION BY source
       |           ORDER BY n_chars DESC, doc_id ASC) AS BIGINT) AS cum_w
       |       FROM documents WHERE source IS NOT NULL AND n_chars IS NOT NULL)
       |SELECT cm.doc_id, cm.source, cm.n_chars, cm.cum_w, fq.quota
       |FROM cm JOIN fq USING (source) WHERE cm.cum_w <= fq.quota""".stripMargin

  /** Mirror of Bm25.topKQl: Dirichlet query likelihood, present-term
    * decomposition, micro-nat floored components (queries = `queryPred`
    * docs' distinct words). */
  def qlTopKSql(k: Int, mu: Double, queryPred: String): String =
    s"""WITH dw AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws FROM documents),
       |idx AS (
       |  SELECT doc_id AS d, CAST(len(ws) AS BIGINT) AS dl, w, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, ws, unnest(ws) AS w FROM dw WHERE len(ws) > 0)
       |  GROUP BY doc_id, len(ws), w
       |),
       |cf AS (SELECT w, CAST(sum(tf) AS BIGINT) AS cf FROM idx GROUP BY w),
       |tot AS (SELECT CAST(sum(tf) AS BIGINT) AS t FROM idx),
       |qt AS (SELECT DISTINCT doc_id AS q, unnest(ws) AS w FROM dw WHERE $queryPred),
       |qn AS (SELECT q, CAST(count(*) AS BIGINT) AS nq FROM qt GROUP BY q),
       |pres AS (
       |  SELECT qt.q, idx.d, idx.dl,
       |    CAST(floor(ln(1.0 + CAST(idx.tf * tot.t AS DOUBLE) /
       |      ($mu * CAST(cf.cf AS DOUBLE))) * 1000000.0) AS BIGINT) AS pc
       |  FROM idx JOIN qt USING (w) JOIN cf USING (w) CROSS JOIN tot
       |),
       |sc AS (SELECT p.q, p.d,
       |         CAST(sum(p.pc) + qn.nq *
       |           CAST(floor(ln($mu / (CAST(min(p.dl) AS DOUBLE) + $mu)) * 1000000.0) AS BIGINT)
       |           AS BIGINT) AS score_micro
       |       FROM pres p JOIN qn ON p.q = qn.q GROUP BY p.q, p.d, qn.nq),
       |rk AS (SELECT q, d, score_micro,
       |         row_number() OVER (PARTITION BY q ORDER BY score_micro DESC, d ASC) AS rn
       |       FROM sc)
       |SELECT q AS query_id, d AS doc_id, score_micro, CAST(rn AS BIGINT) AS rank
       |FROM rk WHERE rn <= $k""".stripMargin

  /** Mirror of the emb_outliers composition: [[ivfAssignCtes]] k-means
    * assignment + per-cluster cos_micro quantile rank, bottom `milliMax`. */
  def kmeansOutliersSql(k: Int, nIters: Int, milliMax: Long): String =
    s"""${ivfAssignCtes(k, nIters)},
       |kasgn AS (
       |  SELECT a.vec_id, CAST(a.cj AS BIGINT) AS cluster,
       |         CAST(floor(c.cos * 1000000.0) AS BIGINT) AS cos_micro
       |  FROM casgn a JOIN ccos c ON a.vec_id = c.vec_id AND a.cj = c.cj),
       |rk AS (SELECT vec_id, cluster, cos_micro,
       |         rank() OVER (PARTITION BY cluster ORDER BY cos_micro ASC) AS r,
       |         count(*) OVER (PARTITION BY cluster) AS cnt
       |       FROM kasgn)
       |SELECT vec_id, cluster, cos_micro,
       |  CAST(CASE WHEN cnt > 1 THEN (r - 1) * 1000 // (cnt - 1) ELSE 0 END AS BIGINT)
       |    AS qnorm_milli
       |FROM rk
       |WHERE CASE WHEN cnt > 1 THEN (r - 1) * 1000 // (cnt - 1) ELSE 0 END <= $milliMax""".stripMargin

  /** Shared sign-sketch CTE chain of [[annBinarySql]] /
    * [[annBinaryRerankSql]] — emits `brk(query_id, neighbor_id, hamming,
    * rn)`; bit 64 is the BIGINT sign bit, special-cased as a literal
    * because DuckDB errors on `1 << 63` where Spark's shiftleft wraps. */
  private def binarySketchCtes(queryPred: String): String =
    s"""v AS (SELECT vec_id, embedding AS e FROM embeddings
       |      WHERE embedding IS NOT NULL AND len(embedding) > 0),
       |sg AS (SELECT vec_id,
       |         bit_or(CASE WHEN e[d] > 0 AND d = 64 THEN (-9223372036854775807 - 1)
       |                     WHEN e[d] > 0 THEN (1::BIGINT << (d-1))
       |                     ELSE 0::BIGINT END) AS sig
       |       FROM v, (SELECT unnest(generate_series(1, 64)) AS d)
       |       WHERE d <= len(e)
       |       GROUP BY vec_id),
       |hp AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |         CAST(bit_count(xor(q.sig, c.sig)) AS BIGINT) AS hamming
       |       FROM sg q JOIN sg c ON q.vec_id <> c.vec_id
       |       WHERE ${queryPred.replace("vec_id", "q.vec_id")}),
       |brk AS (SELECT query_id, neighbor_id, hamming,
       |         row_number() OVER (PARTITION BY query_id
       |           ORDER BY hamming ASC, neighbor_id ASC) AS rn
       |       FROM hp)""".stripMargin

  /** Mirror of SimSearch.topKBinary: 64-bit sign words (bit d−1 set iff
    * e[d] > 0), brute Hamming top-k, ties (hamming asc, neighbor asc). */
  def annBinarySql(k: Int, queryPred: String): String =
    s"""WITH ${binarySketchCtes(queryPred)}
       |SELECT query_id, neighbor_id, hamming FROM brk WHERE rn <= $k""".stripMargin

  /** Mirror of SimSearch.topKBinaryRerank: Hamming shortlist → exact cosine
    * rerank, ties (cosine desc, neighbor asc). */
  def annBinaryRerankSql(k: Int, shortlist: Int, queryPred: String): String =
    s"""WITH ${binarySketchCtes(queryPred)},
       |bsl AS (SELECT query_id, neighbor_id FROM brk WHERE rn <= $shortlist),
       |brr AS (SELECT b.query_id, b.neighbor_id,
       |          ${listCos("qv.e", "cv.e")} AS cosine
       |        FROM bsl b
       |        JOIN v qv ON b.query_id = qv.vec_id
       |        JOIN v cv ON b.neighbor_id = cv.vec_id),
       |brk2 AS (SELECT query_id, neighbor_id, cosine,
       |          row_number() OVER (PARTITION BY query_id
       |            ORDER BY cosine DESC, neighbor_id ASC) AS rn
       |        FROM brr)
       |SELECT query_id, neighbor_id, round(cosine, 4) + 0.0 AS cosine
       |FROM brk2 WHERE rn <= $k""".stripMargin

  /** Mirror of the ann_binary_recall audit: per-query recall@k of the
    * binary-sketch rerank chain against exact brute force, integer-milli. */
  def annBinaryRecallSql(k: Int, shortlist: Int, queryPred: String): String =
    s"""WITH ${binarySketchCtes(queryPred)},
       |bsl AS (SELECT query_id, neighbor_id FROM brk WHERE rn <= $shortlist),
       |brr AS (SELECT b.query_id, b.neighbor_id,
       |          ${listCos("qv.e", "cv.e")} AS cosine
       |        FROM bsl b
       |        JOIN v qv ON b.query_id = qv.vec_id
       |        JOIN v cv ON b.neighbor_id = cv.vec_id),
       |brk2 AS (SELECT query_id, neighbor_id,
       |          row_number() OVER (PARTITION BY query_id
       |            ORDER BY cosine DESC, neighbor_id ASC) AS rn
       |        FROM brr),
       |bt2 AS (SELECT query_id, neighbor_id, 1 AS hit FROM brk2 WHERE rn <= $k),
       |xp AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |         ${listCos("q.e", "c.e")} AS cosine
       |       FROM v q JOIN v c ON q.vec_id <> c.vec_id
       |       WHERE ${queryPred.replace("vec_id", "q.vec_id")}),
       |xr AS (SELECT query_id, neighbor_id,
       |         row_number() OVER (PARTITION BY query_id
       |           ORDER BY cosine DESC, neighbor_id ASC) AS rn
       |       FROM xp),
       |xt AS (SELECT query_id, neighbor_id FROM xr WHERE rn <= $k)
       |SELECT x.query_id, CAST(count(*) AS BIGINT) AS k_eval,
       |       CAST(sum(coalesce(b.hit, 0)) AS BIGINT) AS n_hits,
       |       CAST(sum(coalesce(b.hit, 0)) * 1000 // count(*) AS BIGINT) AS recall_milli
       |FROM xt x
       |LEFT JOIN bt2 b ON x.query_id = b.query_id AND x.neighbor_id = b.neighbor_id
       |GROUP BY x.query_id""".stripMargin

  /** Mirror of EventStats.decayedEngagement: integer-cents value halved
    * every `halfLifeDays` by BIGINT shift, anchored to the corpus max day.
    * Null users excluded on all three faces (batch, stream, oracle) — the
    * stream op's typed Long key cannot hold null. */
  def eventsDecayedSql(halfLifeDays: Int): String =
    s"""WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day,
       |             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
       |           FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
       |mx AS (SELECT max(day) AS maxd FROM d),
       |c AS (SELECT user_id,
       |        cents // (1::BIGINT << CAST(least(
       |          date_diff('day', day, maxd) // $halfLifeDays, 40) AS INT)) AS c
       |      FROM d, mx)
       |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       |       CAST(sum(c) AS BIGINT) AS decayed_cents
       |FROM c GROUP BY user_id""".stripMargin

  /** Mirror of StreamQuota.admit on the batch frame: skip-and-continue
    * admission in id order against [[cappedQuotaCtes]] quotas — rejected
    * docs do NOT consume budget, so the fold is sequential per source
    * (recursive CTE; depth = rows per source). */
  def streamQuotaSql(budget: Long, cap: Long): String =
    s"""WITH RECURSIVE ${cappedQuotaCtes(budget, cap)},
       |qb AS (SELECT source, doc_id AS id, CAST(n_chars AS BIGINT) AS w,
       |         row_number() OVER (PARTITION BY source ORDER BY doc_id ASC) AS rn
       |       FROM documents WHERE source IS NOT NULL AND n_chars IS NOT NULL),
       |qst(source, rn, used, id, w, admitted) AS (
       |  SELECT b.source, b.rn,
       |         CASE WHEN b.w <= q.quota THEN b.w ELSE 0 END, b.id, b.w,
       |         CASE WHEN b.w <= q.quota THEN 1 ELSE 0 END
       |  FROM qb b JOIN fq q USING (source) WHERE b.rn = 1
       |  UNION ALL
       |  SELECT b.source, b.rn,
       |         CASE WHEN s.used + b.w <= q.quota THEN s.used + b.w ELSE s.used END,
       |         b.id, b.w,
       |         CASE WHEN s.used + b.w <= q.quota THEN 1 ELSE 0 END
       |  FROM qst s
       |  JOIN qb b ON b.source = s.source AND b.rn = s.rn + 1
       |  JOIN fq q ON q.source = b.source
       |)
       |SELECT id, source, w, CAST(admitted AS BIGINT) AS admitted FROM qst""".stripMargin

  /** Mirror of EventStats.weeklyChurn: Monday-start weeks, set arithmetic
    * on distinct (week, user), over a DENSE week spine (min..max week) so a
    * fully-churned week still gets a row carrying its churn count. */
  def weeklyChurnSql: String =
    s"""WITH wact AS (SELECT DISTINCT date_trunc('week', ts) AS w, user_id AS u
       |              FROM events WHERE user_id IS NOT NULL),
       |wsp AS (SELECT unnest(generate_series(min(w), max(w), INTERVAL 7 DAY)) AS w
       |        FROM wact),
       |wwk AS (SELECT w, count(*) AS n_active FROM wact GROUP BY w),
       |wret AS (SELECT a.w, count(*) AS ret
       |         FROM wact a JOIN wact b ON a.u = b.u AND b.w = a.w - INTERVAL 7 DAY
       |         GROUP BY a.w),
       |wprev AS (SELECT w + INTERVAL 7 DAY AS w, n_active AS prev FROM wwk)
       |SELECT strftime(wsp.w, '%Y-%m-%d') AS week,
       |  CAST(coalesce(wwk.n_active, 0) AS BIGINT) AS n_active,
       |  CAST(coalesce(wret.ret, 0) AS BIGINT) AS n_retained,
       |  CAST(coalesce(wwk.n_active, 0) - coalesce(wret.ret, 0) AS BIGINT) AS n_incoming,
       |  CAST(coalesce(wprev.prev, 0) - coalesce(wret.ret, 0) AS BIGINT) AS n_churned
       |FROM wsp
       |LEFT JOIN wwk ON wsp.w = wwk.w
       |LEFT JOIN wret ON wsp.w = wret.w
       |LEFT JOIN wprev ON wsp.w = wprev.w""".stripMargin

  /** Mirror of EventStats.associationRules on (user, day) baskets. */
  def associationRulesSql: String =
    s"""WITH ab AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day,
       |              event_type AS t
       |            FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
       |an AS (SELECT count(*) AS nb FROM (SELECT DISTINCT u, day FROM ab)),
       |ap AS (SELECT t, count(*) AS n FROM ab GROUP BY t),
       |apr AS (SELECT x.t AS type_a, y.t AS type_b, CAST(count(*) AS BIGINT) AS n_ab
       |        FROM ab x JOIN ab y ON x.u = y.u AND x.day = y.day AND x.t <> y.t
       |        GROUP BY 1, 2)
       |SELECT p.type_a, p.type_b, CAST(ca.n AS BIGINT) AS n_a, p.n_ab,
       |  CAST(p.n_ab * 1000 // ca.n AS BIGINT) AS confidence_milli,
       |  CAST(CAST(p.n_ab AS HUGEINT) * an.nb * 1000000
       |       // (CAST(ca.n AS HUGEINT) * cb.n) AS BIGINT) AS lift_micro
       |FROM apr p
       |JOIN ap ca ON p.type_a = ca.t
       |JOIN ap cb ON p.type_b = cb.t
       |CROSS JOIN an""".stripMargin

  /** Shared conversion-window CTE chain of the attribution oracles — emits
    * `aw(t, e, cid, n, rl, rf)`. */
  private def attributionCtes(convType: String, lookbackDays: Int): String = {
    val lookUs = lookbackDays.toLong * 86400L * 1000000L
    s"""ae AS (SELECT user_id AS u, event_type AS t, event_id AS e, epoch_us(ts) AS us
       |       FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
       |ac AS (SELECT u, e AS cid, us AS cus FROM ae WHERE t = '$convType'),
       |at2 AS (SELECT * FROM ae WHERE t <> '$convType'),
       |aj AS (SELECT t.t, t.e, t.us, c.cid, c.cus
       |       FROM at2 t JOIN ac c ON t.u = c.u
       |       WHERE t.us < c.cus AND t.us >= c.cus - $lookUs),
       |aw AS (SELECT t, e, cid, us, cus,
       |         count(*) OVER (PARTITION BY cid) AS n,
       |         row_number() OVER (PARTITION BY cid ORDER BY us DESC, e DESC) AS rl,
       |         row_number() OVER (PARTITION BY cid ORDER BY us ASC, e ASC) AS rf
       |       FROM aj)""".stripMargin
  }

  private def attributionRollupSql(ctes: String, creditExpr: String): String =
    s"""WITH $ctes
       |SELECT t AS event_type, CAST(count(*) AS BIGINT) AS n_touches,
       |  CAST(sum($creditExpr) AS BIGINT) AS credit_milli,
       |  CAST(sum(CASE WHEN rf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
       |  CAST(sum(CASE WHEN rl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_last
       |FROM aw GROUP BY t""".stripMargin

  /** Mirror of EventStats.linearAttribution: per-conversion linear credit
    * with the remainder to the last touch, channel rollup. */
  def linearAttributionSql(convType: String, lookbackDays: Int): String =
    attributionRollupSql(attributionCtes(convType, lookbackDays),
      "1000 // n + CASE WHEN rl = 1 THEN 1000 - n * (1000 // n) ELSE 0 END")

  /** Mirror of EventStats.positionAttribution (U-shape, remainder to the
    * last touch; n=1 takes 1000, n=2 splits 500/500). */
  def positionAttributionSql(convType: String, lookbackDays: Int,
      firstMilli: Long, lastMilli: Long): String = {
    val mid = s"(1000 - $firstMilli - $lastMilli)"
    attributionRollupSql(attributionCtes(convType, lookbackDays),
      s"""CASE WHEN n = 1 THEN 1000
         WHEN n = 2 THEN 500
         WHEN rf = 1 THEN $firstMilli
         WHEN rl = 1 THEN $lastMilli + ($mid - (n - 2) * ($mid // (n - 2)))
         ELSE $mid // (n - 2) END""")
  }

  /** Mirror of EventStats.seasonalBaseline: dense day spine, weekday
    * (isodow−1 ≡ Spark weekday) baselines via HUGEINT, residuals. */
  def seasonalBaselineSql: String =
    s"""WITH ec AS (SELECT event_type AS t, CAST(ts AS DATE) AS d, count(*) AS n
       |            FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
       |sp AS (SELECT CAST(unnest(generate_series(CAST(min(d) AS TIMESTAMP),
       |         CAST(max(d) AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d FROM ec),
       |ty AS (SELECT DISTINCT t FROM ec),
       |dn AS (SELECT ty.t, sp.d, coalesce(ec.n, 0) AS n,
       |         (isodow(sp.d) - 1) AS dw
       |       FROM sp CROSS JOIN ty
       |       LEFT JOIN ec ON ec.t = ty.t AND ec.d = sp.d),
       |bl AS (SELECT t, dw,
       |         CAST(CAST(sum(n) AS HUGEINT) * 1000000 // count(*) AS BIGINT)
       |           AS baseline_micro
       |       FROM dn GROUP BY 1, 2)
       |SELECT dn.t AS event_type, strftime(dn.d, '%Y-%m-%d') AS day,
       |  CAST(dn.n AS BIGINT) AS n_events, bl.baseline_micro,
       |  CAST(dn.n * 1000000 - bl.baseline_micro AS BIGINT) AS resid_micro
       |FROM dn JOIN bl ON bl.t = dn.t AND bl.dw = dn.dw""".stripMargin

  /** Mirror of EventStats.decayAttribution: power-of-two recency weights
    * (2^30 >> days_before DIV halfLife, capped at 30), weight-proportional
    * integer 1000-milli split, remainder to the last touch. */
  def decayAttributionSql(convType: String, lookbackDays: Int,
      halfLifeDays: Int): String = {
    val stepUs = 86400L * 1000000L * halfLifeDays
    s"""WITH ${attributionCtes(convType, lookbackDays)},
       |adw AS (SELECT t, cid, rl, rf,
       |          (1073741824::BIGINT >> CAST(least((cus - us) // $stepUs, 30) AS INT)) AS w
       |        FROM aw),
       |adb AS (SELECT t, cid, rl, rf,
       |          (1000 * w) // sum(w) OVER (PARTITION BY cid) AS base
       |        FROM adw),
       |ads AS (SELECT t, rl, rf, base,
       |          sum(base) OVER (PARTITION BY cid) AS bsum
       |        FROM adb)
       |SELECT t AS event_type, CAST(count(*) AS BIGINT) AS n_touches,
       |  CAST(sum(base + CASE WHEN rl = 1 THEN 1000 - bsum ELSE 0 END) AS BIGINT)
       |    AS credit_milli,
       |  CAST(sum(CASE WHEN rf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
       |  CAST(sum(CASE WHEN rl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_last
       |FROM ads GROUP BY t""".stripMargin
  }

  /** Mirror of Sampling.bootstrapDraws: one replicate's manifest. */
  def bootstrapDrawsSql(replicate: Int): String = {
    val t = graft.operators.Sampling.PoissonCdf32
    val key = s"CAST(doc_id AS VARCHAR) || ':' || CAST($replicate AS VARCHAR)"
    s"""WITH u AS (SELECT doc_id,
       |        (((((${tHashSql(key)} % 65521) + 65521) % 65521) * 2654435761) % 4294967296) AS u
       |      FROM documents WHERE doc_id IS NOT NULL),
       |c AS (SELECT doc_id,
       |        CASE WHEN u < ${t(0)} THEN 0 WHEN u < ${t(1)} THEN 1
       |             WHEN u < ${t(2)} THEN 2 WHEN u < ${t(3)} THEN 3
       |             WHEN u < ${t(4)} THEN 4 WHEN u < ${t(5)} THEN 5
       |             ELSE 6 END AS m
       |      FROM u)
       |SELECT doc_id, CAST(m AS BIGINT) AS multiplicity FROM c WHERE m > 0""".stripMargin
  }

  /** Mirror of Packing.lengthBucketBatches on documents.n_chars. */
  def packBucketsSql(nBuckets: Int, budget: Long): String =
    s"""WITH pbase AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars
       |              FROM documents WHERE n_chars IS NOT NULL),
       |pr AS (SELECT doc_id, n_chars,
       |         row_number() OVER (ORDER BY n_chars ASC, doc_id ASC) - 1 AS pos,
       |         count(*) OVER () AS n
       |       FROM pbase),
       |pb AS (SELECT doc_id, n_chars, pos * $nBuckets // n AS bucket FROM pr),
       |pc AS (SELECT doc_id, n_chars, bucket,
       |         sum(n_chars) OVER (PARTITION BY bucket
       |           ORDER BY n_chars ASC, doc_id ASC) AS cum
       |       FROM pb)
       |SELECT doc_id, n_chars, CAST(bucket AS BIGINT) AS bucket,
       |  CAST((cum - n_chars) // $budget AS BIGINT) AS batch_idx
       |FROM pc""".stripMargin

  /** Mirror of the graph_kcore composition: [[knnGraphCtes]] mutual edges +
    * `rounds` unrolled synchronous peel iterations at threshold `kcore`. */
  def kCorePeelSql(k: Int, nPlanes: Int, nTables: Int,
      kcore: Int, rounds: Int): String = {
    val peel = (1 to rounds).map { r =>
      s"""kd$r AS (SELECT e.a AS node, count(*) AS dg FROM medges e
         |  JOIN ks${r - 1} x ON e.a = x.node JOIN ks${r - 1} y ON e.b = y.node
         |  GROUP BY e.a),
         |ks$r AS (SELECT s.node FROM ks${r - 1} s JOIN kd$r d USING (node)
         |  WHERE d.dg >= $kcore),""".stripMargin
    }.mkString("\n")
    s"""WITH ${knnGraphCtes(k, nPlanes, nTables)},
       |mut AS (
       |  SELECT a.src AS id_a, a.nbr AS id_b
       |  FROM kg a JOIN kg b ON a.src = b.nbr AND a.nbr = b.src
       |  WHERE a.src < a.nbr
       |),
       |medges AS (SELECT id_a AS a, id_b AS b FROM mut
       |           UNION SELECT id_b AS a, id_a AS b FROM mut),
       |ks0 AS (SELECT DISTINCT vec_id AS node FROM embeddings),
       |$peel
       |kfd AS (SELECT e.a AS node, count(*) AS dg FROM medges e
       |  JOIN ks$rounds x ON e.a = x.node JOIN ks$rounds y ON e.b = y.node
       |  GROUP BY e.a)
       |SELECT n.node AS vec_id,
       |  CAST(CASE WHEN f.node IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS in_core,
       |  CAST(CASE WHEN f.node IS NOT NULL THEN coalesce(d.dg, 0) ELSE 0 END AS BIGINT) AS deg
       |FROM ks0 n
       |LEFT JOIN ks$rounds f ON n.node = f.node
       |LEFT JOIN kfd d ON n.node = d.node""".stripMargin
  }

  /** Mirror of the graph_labelprop composition: [[knnGraphCtes]] mutual
    * edges + `rounds` unrolled synchronous majority-vote label rounds
    * (neighbor labels + one self-vote, ties to the smallest label). */
  def labelPropagationSql(k: Int, nPlanes: Int, nTables: Int,
      rounds: Int): String =
    s"""WITH ${labelPropCtes(k, nPlanes, nTables, rounds)}
       |SELECT n AS vec_id, CAST(l AS BIGINT) AS label FROM lp$rounds""".stripMargin

  /** Shared CTE body of [[labelPropagationSql]] / [[modularitySql]]: mutual
    * kNN edges (`mut`/`medges`) + the unrolled vote rounds ending at
    * `lp<rounds>`. */
  private def labelPropCtes(k: Int, nPlanes: Int, nTables: Int,
      rounds: Int): String = {
    val prop = (1 to rounds).map { r =>
      s"""lv$r AS (SELECT e.a AS n, x.l FROM medges e JOIN lp${r - 1} x ON e.b = x.n
         |  UNION ALL SELECT n, l FROM lp${r - 1}),
         |lc$r AS (SELECT n, l, count(*) AS c FROM lv$r GROUP BY 1, 2),
         |lp$r AS (SELECT n, l FROM (
         |  SELECT n, l, row_number() OVER (PARTITION BY n ORDER BY c DESC, l ASC) AS rn
         |  FROM lc$r) WHERE rn = 1),""".stripMargin
    }.mkString("\n")
    s"""${knnGraphCtes(k, nPlanes, nTables)},
       |mut AS (
       |  SELECT a.src AS id_a, a.nbr AS id_b
       |  FROM kg a JOIN kg b ON a.src = b.nbr AND a.nbr = b.src
       |  WHERE a.src < a.nbr
       |),
       |medges AS (SELECT id_a AS a, id_b AS b FROM mut
       |           UNION SELECT id_b AS a, id_a AS b FROM mut),
       |lp0 AS (SELECT DISTINCT vec_id AS n, vec_id AS l FROM embeddings),
       |$prop
       |lpz AS (SELECT 1)""".stripMargin
  }

  /** Mirror of GraphRank.modularity over the graph_labelprop composition:
    * Q·10⁶ with both rational terms integer-divided in the same canonical
    * order (HUGEINT intermediates for the volume-squared sum). */
  def modularitySql(k: Int, nPlanes: Int, nTables: Int, rounds: Int): String =
    s"""WITH ${labelPropCtes(k, nPlanes, nTables, rounds)},
       |el AS (SELECT m.id_a, m.id_b, la.l AS la, lb.l AS lb
       |       FROM mut m JOIN lp$rounds la ON la.n = m.id_a
       |       JOIN lp$rounds lb ON lb.n = m.id_b),
       |mw AS (SELECT count(*) AS m,
       |         sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS w FROM el),
       |dg AS (SELECT v, count(*) AS d FROM (
       |         SELECT id_a AS v FROM mut UNION ALL SELECT id_b AS v FROM mut)
       |       GROUP BY 1),
       |vl AS (SELECT lp.l, CAST(sum(dg.d) AS BIGINT) AS vol
       |       FROM dg JOIN lp$rounds lp ON lp.n = dg.v GROUP BY 1),
       |s2 AS (SELECT sum(CAST(vol AS HUGEINT) * vol) AS s2 FROM vl)
       |SELECT CAST(mw.m AS BIGINT) AS m, CAST(mw.w AS BIGINT) AS n_within,
       |  CAST(CAST((CAST(mw.w AS HUGEINT) * 1000000) // mw.m AS BIGINT)
       |    - CAST((s2.s2 * 1000000) // (4::HUGEINT * mw.m * mw.m) AS BIGINT)
       |    AS BIGINT) AS q_micro
       |FROM mw CROSS JOIN s2""".stripMargin

  /** TPC-H Q10-shape returned-item report: exact integer cents, top 20 by
    * (revenue desc, custkey asc). */
  def ordersReturnsSql: String =
    s"""SELECT c.c_custkey, c.c_name, CAST(count(*) AS BIGINT) AS n_items,
       |  CAST(sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100.0 + 0.5)
       |    AS BIGINT)) AS BIGINT) AS revenue_cents
       |FROM lineitem l
       |JOIN orders o ON l.l_orderkey = o.o_orderkey
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |WHERE l.l_returnflag = 'R'
       |GROUP BY c.c_custkey, c.c_name
       |ORDER BY revenue_cents DESC, c.c_custkey ASC LIMIT 20""".stripMargin

  /** Mirror of the emb_kmeans_centroids export: [[ivfAssignCtes]]
    * assignment + per-(cluster, dim) integer-quantized mean. */
  def kmeansCentroidsSql(k: Int, nIters: Int): String =
    s"""${ivfAssignCtes(k, nIters)},
       |kcx AS (SELECT a.cj, d.d, x.e
       |        FROM casgn a JOIN vl x ON a.vec_id = x.vec_id
       |        CROSS JOIN (SELECT unnest(generate_series(1,
       |          (SELECT CAST(max(len(e)) AS BIGINT) FROM vl))) AS d) d
       |        WHERE d.d <= len(x.e))
       |SELECT CAST(cj AS BIGINT) AS cluster, CAST(d - 1 AS BIGINT) AS dim,
       |       CAST(count(*) AS BIGINT) AS n,
       |       CAST(sum(CAST(floor(CAST(e[d] AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))
       |         // count(*) AS BIGINT) AS c_micro
       |FROM kcx GROUP BY cj, d""".stripMargin

  /** Mirror of Dedup.lineRuleClean over the paragraph-ized corpus: a line
    * survives iff ≥ minWords words AND corpus distinct-doc frequency
    * < maxLineDf; clean_md5 digests the kept lines re-joined in order. */
  def lineRuleCleanSql(minWords: Int, maxLineDf: Long): String =
    s"""WITH $paraLinesCtes,
       |ne AS (SELECT doc_id, p, ln, md5(ln) AS h FROM l WHERE length(ln) > 0),
       |fr AS (SELECT h, count(DISTINCT doc_id) AS df FROM ne GROUP BY h),
       |f AS (SELECT ne.doc_id, ne.p, ne.ln,
       |        CASE WHEN len(regexp_extract_all(lower(ne.ln), '[a-z]+')) >= $minWords
       |                  AND fr.df < $maxLineDf THEN 1 ELSE 0 END AS keep
       |      FROM ne JOIN fr USING (h))
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
       |  CAST(sum(keep) AS BIGINT) AS kept_lines,
       |  md5(coalesce(string_agg(CASE WHEN keep = 1 THEN ln END, chr(10) ORDER BY p), ''))
       |    AS clean_md5
       |FROM f GROUP BY doc_id""".stripMargin

  /** Shared CTE chain of [[urlNormalizeSql]] / [[urlDomainsSql]]: the gate's
    * deterministic messy-URL synthesis (the word-salad corpus carries no
    * URLs), extraction, and the fixed normalize chain — byte-identical
    * pattern strings to `TextFunctions.urlNormalizeCol` (Java regex / RE2
    * shared syntax, no backreferences, anchored replaces so first-match and
    * replace-all semantics coincide). */
  private val urlNormCtes: String =
    """synth AS (
      |  SELECT doc_id,
      |    'see HtTpS://WwW.' || source || '.ExAmPle.COM:443/Data/' || lang || '/' ||
      |    CAST(doc_id % 7 AS VARCHAR) ||
      |    '/?utm_source=x&ref=y#frag and http://MiRrOr-' || source || '.OrG:80/). done' AS text
      |  FROM documents
      |),
      |ex AS (
      |  SELECT doc_id, unnest(regexp_extract_all(text, '(?i)https?://[^\s]+')) AS u
      |  FROM synth
      |),
      |st AS (
      |  SELECT doc_id,
      |    regexp_replace(regexp_replace(regexp_replace(u,
      |      '[).,;!?\]]+$', ''), '#.*$', ''), '\?.*$', '') AS nq
      |  FROM ex
      |),
      |norm AS (
      |  SELECT doc_id,
      |    lower(regexp_extract(nq, '(?i)^(https?)://', 1)) || '://' ||
      |    regexp_replace(regexp_replace(
      |      lower(regexp_extract(nq, '(?i)^https?://([^/]*)', 1)),
      |      '^www\.', ''), ':(80|443)$', '') ||
      |    regexp_replace(regexp_extract(nq, '(?i)^https?://[^/]*(.*)$', 1), '/+$', '')
      |      AS url
      |  FROM st
      |)""".stripMargin

  /** Mirror of the `url_normalize` gate: extract + canonicalize the
    * synthesized URLs — (doc_id, url), two rows per document. */
  def urlNormalizeSql(): String =
    s"""WITH $urlNormCtes
       |SELECT doc_id, url FROM norm""".stripMargin

  /** Mirror of the `url_domains` gate: per-host rollup of the canonical
    * keys — the domain-quota / blocklist read. */
  def urlDomainsSql(): String =
    s"""WITH $urlNormCtes
       |SELECT regexp_extract(url, '^https?://([^/]*)', 1) AS domain,
       |       CAST(count(*) AS BIGINT) AS n_urls,
       |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
       |FROM norm GROUP BY 1""".stripMargin
}
