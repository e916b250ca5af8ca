package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/**
 * Scale-safe distributed prefix sums and fixed-budget shard packing — the
 * sharding step of a training-data pipeline: give every document a running
 * token offset and a shard id so each shard holds ~`budget` tokens in a
 * deterministic global order.
 *
 * The naive SQL form — `sum(n) OVER (ORDER BY id)` with no PARTITION BY —
 * funnels the whole table through ONE task (Spark's partition-less window),
 * the same scale trap [[DenseRank]] exists to avoid. This is instead the
 * classic two-pass distributed scan:
 *
 *   1. range-partition + sort by `idCol` (global order across partitions);
 *   2. one pass computing per-partition totals — collects exactly ONE Long
 *      per partition, driver-safe at any scale;
 *   3. exclusive-prefix those totals on the driver, broadcast;
 *   4. one pass emitting each row's inclusive running total = partition
 *      offset + running sum within the partition. The second pass shares the
 *      first's RDD, so the range-exchange SHUFFLE is not re-run (stage
 *      skipping); the within-partition sort replays from the shuffle files on
 *      each pass — cheap relative to the exchange, and deterministic because
 *      the sort key is unique.
 *
 * Caller contract (shared with [[DenseRank]]): `idCol` values are unique and
 * non-null, so the order — and therefore every cumulative sum — is
 * deterministic regardless of physical layout.
 */
object Packing {

  /**
   * Slim prefix-sum relation: (idCol, nCol cast Long, cumOut = inclusive
   * prefix sum of nCol in ascending idCol order). Join back to the full frame
   * by idCol if other columns are needed.
   *
   * `nCol` must be non-null: a null count raises (mirroring
   * [[DenseRank.appendIndex]]'s `failOnNullCol` contract) rather than the
   * silent inconsistency of a row that contributes 0 to offsets yet lands in
   * no shard. Note a non-numeric `nCol` casts to null under non-ANSI SQL mode
   * and therefore also raises here, naming the offending row.
   */
  def withPrefixSum(
      df: DataFrame, idCol: String, nCol: String, cumOut: String = "cum"): DataFrame = {
    require(idCol != nCol && nCol != cumOut && idCol != cumOut,
      s"idCol/nCol/cumOut must be distinct, got $idCol/$nCol/$cumOut")
    val spark = df.sparkSession
    val slim = df.select(col(idCol), col(nCol).cast("long").as(nCol))
    val sorted = slim.repartitionByRange(col(idCol)).sortWithinPartitions(col(idCol))
    val rdd = sorted.rdd // shared by both passes — the range shuffle runs once
    // the totals pass doubles as validation: it runs (and collects) before the
    // second pass is submitted, so a null count fails the whole job loudly
    val partSums = rdd.mapPartitionsWithIndex { (pi, it) =>
      var s = 0L
      it.foreach { r =>
        if (r.isNullAt(1)) throw new IllegalArgumentException(
          s"null $nCol at $idCol=${r.get(0)}: token counts must be non-null " +
            "(a non-castable value surfaces as null under non-ANSI mode)")
        s += r.getLong(1)
      }
      Iterator((pi, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _) // exclusive prefix per partition
    val bc = spark.sparkContext.broadcast(offsets)
    val outSchema = StructType(sorted.schema.fields :+
      org.apache.spark.sql.types.StructField(cumOut, LongType, nullable = false))
    val outRdd = rdd.mapPartitionsWithIndex { (pi, it) =>
      var s = bc.value(pi)
      it.map { r =>
        s += r.getLong(1) // non-null: the totals pass above already validated
        Row.fromSeq(r.toSeq :+ s)
      }
    }
    spark.createDataFrame(outRdd, outSchema)
  }

  /**
   * Fixed-budget contiguous shard packing: (idCol, nCol, cumOut, shardOut)
   * with `shard = (cum - n) div budget` — the shard whose token window
   * contains the document's START offset. Deterministic and exactly
   * SQL-mirrorable; a document may straddle a shard boundary (inherent to any
   * fixed-size packing — the training loader consuming shard files owns the
   * tail handling).
   */
  def packByBudget(
      df: DataFrame, idCol: String, nCol: String, budget: Long,
      cumOut: String = "cum_tokens", shardOut: String = "shard"): DataFrame = {
    require(budget > 0L, s"budget must be positive, got $budget")
    withPrefixSum(df, idCol, nCol, cumOut)
      .withColumn(shardOut, expr(s"(`$cumOut` - `$nCol`) div ${budget}L"))
  }

  /**
   * FIXED-LENGTH TOKEN-STREAM CHUNK SPANS — the GPT-style packing read: the
   * corpus is one id-ordered token stream cut into fixed `chunkLen`
   * training sequences, and each document reports which sequences it lands
   * in (`first_chunk = (cum−n) div L`, `last_chunk = (cum−1) div L`) and
   * how many it spans — what a loader needs for document-boundary
   * attention masks, and what bounds cross-document bleed in a curriculum.
   * Zero-token docs span nothing (n_chunks = 0, first/last_chunk NULL —
   * clamped on BOTH engine and oracle sides so the columns are
   * meaningless-by-construction for n=0 instead of hinging on truncate-vs-
   * floor div parity of `(−1) div L` for a leading zero-token doc). Same
   * driver-safe two-pass prefix sum as [[packByBudget]]; exactly
   * SQL-mirrorable.
   * @return (idCol, nCol, cum_tokens, first_chunk, last_chunk, n_chunks)
   */
  def chunkSpans(
      df: DataFrame, idCol: String, nCol: String, chunkLen: Long): DataFrame = {
    require(chunkLen > 0L, s"chunkLen must be positive, got $chunkLen")
    withPrefixSum(df, idCol, nCol, "cum_tokens")
      .select(col(idCol), col(nCol), col("cum_tokens"),
        when(col(nCol) > 0L,
          expr(s"(cum_tokens - `$nCol`) div ${chunkLen}L")).as("first_chunk"),
        when(col(nCol) > 0L,
          expr(s"(cum_tokens - 1) div ${chunkLen}L")).as("last_chunk"),
        when(col(nCol) > 0L,
          expr(s"(cum_tokens - 1) div ${chunkLen}L - (cum_tokens - `$nCol`) div ${chunkLen}L + 1"))
          .otherwise(lit(0L)).as("n_chunks"))
  }

  /**
   * RENDEZVOUS (highest-random-weight) shard assignment — the stable
   * re-sharding rule for an incrementally-growing corpus: each row's shard is
   * `argmax_s w(id, s)` over a per-(row, shard) deterministic weight, so
   * growing `nShards` → `nShards + 1` moves ONLY the rows whose argmax IS the
   * new shard (≈ 1/(n+1) of the data — property-pinned), where hash-mod
   * sharding reshuffles ~everything. The consistent-hashing move for shard
   * layouts, checkpoint assignment, and cache routing, as one column.
   *
   * Weight: `w(id, s) = (((id % 1000003)·8191 + s) % 1000003 · 2654435761) %
   * 1000003` — the SRP/LSH integer-mix family; every product < 2⁶² so BIGINT
   * arithmetic is exact in both engines, and ties break to the smallest
   * shard (array_position returns the FIRST maximum). Pure per-row codegen'd
   * HOFs — no shuffle, no state, no driver work.
   *
   * @param idCol unique non-null numeric row id
   * @return df + (shardOut: BIGINT in [0, nShards))
   */
  def rendezvousShard(
      df: DataFrame, idCol: String, nShards: Int,
      shardOut: String = "shard"): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    require(!df.columns.contains(shardOut), s"output column '$shardOut' collides")
    df.withColumn("__rw", expr(
        s"""transform(sequence(0, ${nShards - 1}), s ->
           |  ((CAST($idCol AS BIGINT) % 1000003) * 8191 + s) % 1000003
           |    * 2654435761L % 1000003)""".stripMargin))
      .withColumn(shardOut,
        expr(s"CAST(array_position(__rw, array_max(__rw)) - 1 AS BIGINT)"))
      .drop("__rw")
  }

  /**
   * GREEDY capacity-reset sequence packing — the context-window packer:
   * within each group (source), walk documents in ascending `idCol` order
   * accumulating token counts; when adding the next document would overflow
   * `capacity`, close the bin and start the next. Unlike [[packByBudget]]'s
   * offset-window rule, no document straddles a bin: the first document of a
   * bin is always admitted whole (even alone over capacity), which is the
   * contract a fixed-context training loader wants.
   *
   * The fold is inherently sequential PER GROUP — that is the semantic, not a
   * limitation — and embarrassingly parallel ACROSS groups: one hash exchange
   * on the group key, an in-partition sort, and a single streaming pass
   * (`mapPartitions`, O(1) state). A pathologically large single group
   * serializes its own scan only; at 100 TB you shard the corpus by source
   * exactly this way. Null group/id rows are dropped (the engine-wide null-key
   * convention); a null token count raises loudly, mirroring
   * [[withPrefixSum]]'s contract.
   *
   * @return (groupCol, idCol, nCol, binOut) — binOut = 0-based bin within group
   */
  def packGreedy(
      df: DataFrame, groupCol: String, idCol: String, nCol: String,
      capacity: Long, binOut: String = "bin"): DataFrame = {
    require(capacity > 0L, s"capacity must be positive, got $capacity")
    val spark = df.sparkSession
    val slim = df
      .filter(col(groupCol).isNotNull && col(idCol).isNotNull)
      .select(col(groupCol).cast("string").as(groupCol), col(idCol),
        col(nCol).cast("long").as(nCol))
      .repartition(col(groupCol))
      .sortWithinPartitions(col(groupCol), col(idCol))
    val outSchema = StructType(slim.schema.fields :+
      org.apache.spark.sql.types.StructField(binOut, LongType, nullable = false))
    val outRdd = slim.rdd.mapPartitions { it =>
      var g: String = null
      var acc = 0L
      var bin = 0L
      it.map { r =>
        if (r.isNullAt(2)) throw new IllegalArgumentException(
          s"null $nCol at $idCol=${r.get(1)}: token counts must be non-null")
        val rg = r.getString(0)
        val n = r.getLong(2)
        if (rg != g) { g = rg; acc = 0L; bin = 0L }
        if (acc > 0L && acc + n > capacity) { bin += 1L; acc = 0L }
        acc += n
        Row.fromSeq(r.toSeq :+ bin)
      }
    }
    spark.createDataFrame(outRdd, outSchema)
  }

  /**
   * LENGTH-BUCKETED DYNAMIC BATCHING — the inference/training batching move
   * that cuts padding waste: docs are first split into `nBuckets` global
   * LENGTH deciles (so a batch never mixes a 10-token doc with a 2000-token
   * one), then batched WITHIN each bucket by a running length budget —
   * batch_idx = (running sum BEFORE this doc) DIV batchBudget, so a doc
   * lands in the batch where it starts and an oversized doc still gets a
   * batch of its own. Global rank via [[DenseRank]] (range-partitioned sort
   * + zipWithIndex, no single-task window); the within-bucket cumsum
   * windows on the bucket key — the natural parallelism.
   *
   * @return (idCol, lenCol, bucket 0..nBuckets-1, batch_idx)
   */
  def lengthBucketBatches(
      df: DataFrame, idCol: String, lenCol: String,
      nBuckets: Int = 10, batchBudget: Long = 4096L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    require(batchBudget >= 1L, s"batchBudget must be >= 1, got $batchBudget")
    val base = df.filter(col(lenCol).isNotNull)
      .select(col(idCol), col(lenCol).cast("long").as(lenCol))
    val ranked = DenseRank.appendIndex(base,
      Seq(col(lenCol).asc, col(idCol).asc), "__pos",
      failOnNullCol = Some(idCol))
    val n = ranked.agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(col("bucket")).orderBy(col(lenCol).asc, col(idCol).asc)
    ranked.crossJoin(broadcast(n))
      .select(col(idCol), col(lenCol),
        expr(s"__pos * $nBuckets DIV __n").as("bucket"))
      .withColumn("__cum", sum(col(lenCol)).over(w))
      .select(col(idCol), col(lenCol), col("bucket"),
        expr(s"(__cum - $lenCol) DIV ${batchBudget}L").as("batch_idx"))
  }
}
