package graft.dedup

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Parallel sorted-neighborhood framing over LSH band buckets.
  *
  * Every banded pair generator in the engine (MinHash `candidatePairs`,
  * simhash, blockhash) needs the same primitive: rank each (band, bkey)
  * bucket by a similarity-sorting key and pair each row with its next W
  * successors. The naive form — `collect_list().over(Window.partitionBy
  * (band, bkey))` — is output-correct and work-linear (n·W pairs), but
  * runs each bucket as ONE task: simhash's 4-bit band keys cap the stage
  * at 64 tasks at ANY corpus size, and a degenerate templated-text bucket
  * (boilerplate-heavy web data; the RecallSpec adversarial corpus)
  * serializes the whole stage through one executor — invisible at
  * local[32], fatal on a 1000-executor cluster.
  *
  * This helper produces IDENTICAL output with both phases parallel:
  *
  *  1. rank in parallel — global range-sort on (band, bkey, orderCols),
  *     per-partition local `row_number`, plus rank offsets for the
  *     buckets that SPAN a partition boundary. Range partitioning splits
  *     at most one bucket per boundary, so the offset collect is bounded
  *     by ~2 × #partitions rows however many buckets exist (never
  *     O(#cells) — single-partition buckets need no offset and are
  *     filtered out distributedly before the collect).
  *  2. frame in parallel — rows chunked by `rank div ChunkRows`; the
  *     first W rows of each chunk are ECHOED into the previous chunk so
  *     a chunk-tail row still sees its next-W successors; the frame
  *     emits neighbors only for non-echo rows, so every pair is produced
  *     exactly once and every window cell is ≤ ChunkRows + W rows —
  *     parallelism scales with corpus size, not bucket count.
  *
  * The sorted stage is checkpointed under `stageKey` ([[graft.functions
  * .Staging]]): `spark_partition_id` must be CONSISTENT between the
  * offset collect and the rank join, which only a materialized sort
  * guarantees across actions.
  */
object SortedNeighborhood {

  /** Frame-chunk length: window cells are ≤ ChunkRows + W rows, so a
    * degenerate n-row bucket fans out into n/4096 tasks. Far above any
    * neighbor window (W ≤ 32 everywhere) and far below executor memory. */
  val ChunkRows = 4096L

  /** Pinned shuffle width for the rank/frame stages (round-15): the band
    * rows are byte-light but the work ABOVE each exchange is CPU-heavy
    * and EXPANSIVE (W-struct collect_list frames, ×W pair explode,
    * set-intersection verify), so AQE's byte-based partition coalescing
    * (advisory 64 MB) mis-sizes them — at sf0.1 it folded every stage of
    * the pair family to 1-2 tasks and serialized the whole chain
    * (measured: graph_pagerank_step's frame+verify job ran 2 tasks /
    * 1.56 s task time on local[32]). Pinning the exchange width to
    * max(defaultParallelism, spark.sql.shuffle.partitions) restores the
    * cluster's configured width; at 100 TB the same expression equals
    * the production shuffle.partitions, i.e. exactly what the
    * ENSURE_REQUIREMENTS exchange used before coalescing — nothing is
    * lost at scale, and the per-bucket cost bounds are unchanged. */
  private[graft] def pinnedWidth(df: DataFrame): Int =
    math.max(df.sparkSession.sparkContext.defaultParallelism,
      df.sparkSession.sessionState.conf.numShufflePartitions)

  /** The materialized parallel-rank input: `banded` range-sorted on
    * (band, bkey, orderCols) with its physical partition id. Exposed
    * private[graft] for the plan/parallelism specs.
    *
    * The range partition count is pinned ([[pinnedWidth]]): the staged
    * checkpoint FREEZES whatever layout it was built with for the whole
    * session, so letting AQE coalesce it to 1-2 partitions at bench SF
    * starved every downstream rank/frame/verify stage of parallelism. */
  private[graft] def sortedStage(banded: DataFrame, orderCols: Seq[String],
                                 stageKey: String): DataFrame = {
    val keyCols = (Seq("band", "bkey") ++ orderCols).map(col)
    graft.functions.Staging.staged(banded.sparkSession, stageKey) {
      banded
        .repartitionByRange(pinnedWidth(banded), keyCols: _*)
        .sortWithinPartitions(keyCols: _*)
        .withColumn("__pid", spark_partition_id())
    }
  }

  /** `banded` (columns must include `band` and `bkey`) with one extra
    * column `__next`: the array of `struct(carryCols)` from the row's
    * next `w` successors in (band, bkey) bucket order — the exact output
    * of `collect_list(struct(carryCols)).over(Window.partitionBy(band,
    * bkey).orderBy(orderCols).rowsBetween(1, w))`, computed with both
    * the rank and the frame parallel (see class doc). `orderCols` must
    * be a total order within each bucket (include the row id). */
  def withNeighbors(banded: DataFrame, orderCols: Seq[String],
                    carryCols: Seq[String], w: Int, stageKey: String): DataFrame = {
    require(w > 0 && w < ChunkRows, s"neighbor window $w out of (0, $ChunkRows)")
    val spark = banded.sparkSession
    val outCols = banded.columns.toSeq
    val rk = sortedStage(banded, orderCols, stageKey)

    // per-(partition, bucket) row counts; only buckets spanning >1
    // partition need offsets, and those are ≤ ~2 × #partitions cells by
    // the range-partitioning argument above — the collect is metadata-
    // scale at any corpus size
    val cells = rk.groupBy(col("__pid"), col("band"), col("bkey"))
      .agg(count(lit(1)).as("__c"))
    val spanning = cells
      .withColumn("__np", count(lit(1)).over(Window.partitionBy("band", "bkey")))
      .filter(col("__np") > 1)
      .drop("__np")
      .collect()
    val offRows: Seq[Row] = spanning
      .groupBy(r => (r.get(1), r.get(2))).valuesIterator.flatMap { cs =>
        var run = 0L
        cs.sortBy(_.getInt(0)).map { r =>
          val off = run; run += r.getLong(3); Row(r.get(0), r.get(1), r.get(2), off)
        }
      }.toSeq
    val offSchema = StructType(cells.schema.fields.map(f =>
      if (f.name == "__c") f.copy(name = "__off") else f))
    val offDf = spark.createDataFrame(
      java.util.Arrays.asList(offRows: _*), offSchema)

    val wLocal = Window.partitionBy("__pid", "band", "bkey")
      .orderBy(orderCols.map(col): _*)
    val ranked = rk
      .withColumn("__lrn", row_number().over(wLocal).cast("long"))
      .join(broadcast(offDf), Seq("__pid", "band", "bkey"), "left")
      .withColumn("__rn", col("__lrn") + coalesce(col("__off"), lit(0L)))
      .withColumn("__ck", ((col("__rn") - 1) / ChunkRows).cast("long"))

    val main = ranked.withColumn("__jc", col("__ck")).withColumn("__echo", lit(0))
    val echo = ranked.filter((col("__rn") - 1) % ChunkRows < w)
      .withColumn("__jc", col("__ck") - 1).withColumn("__echo", lit(1))
    val wChunk = Window.partitionBy("band", "bkey", "__jc").orderBy("__rn")
    main.unionByName(echo)
      // explicit exchange at pinned width (round-15): the implicit
      // ENSURE_REQUIREMENTS exchange under the frame window carries few
      // bytes and AQE coalesced it to 1-2 tasks, serializing the
      // collect_list frames AND the ×W pair explode/verify stages above
      // them; same keys, same shuffle, width pinned (see pinnedWidth)
      .repartition(pinnedWidth(banded), col("band"), col("bkey"), col("__jc"))
      .withColumn("__next",
        collect_list(struct(carryCols.map(col): _*)).over(wChunk.rowsBetween(1, w)))
      .filter(col("__echo") === 0)
      .select((outCols :+ "__next").map(col): _*)
  }
}
