package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {

  /** One registered operator-query: Spark plan builder + optional DuckDB
    * oracle SQL over the same parquet tables. Column names and row order
    * must agree between both (the driver's compare sorts columns by name
    * then hashes values). */
  final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  object Q {
    def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
      Q(name, fn, Some(oracle))

    /** Register rows-only: the driver checks rows > 0 and the semantics are
      * pinned by specs instead of a DuckDB replay. Every such registration
      * has a structural reason — currently NONE. Round 10 graduated
      * hybrid_search_ann / stream_ingest / mm_feature_extract /
      * q_approx_distinct; round 11 graduated d15_query_cache (a
      * constant-expectation oracle over its deterministic trace — the
      * q_approx_distinct precedent), c1_embed_docs + e1_rerank (the
      * HTTP transports now drive an in-process loopback server serving
      * fixture responses in all three provider formats, so the full
      * request→parse→score path hashes against a constant oracle), and
      * a1_pdf_ingest (same constant-expectation route: the fixture PDFs
      * are deterministic bytes, so the byte→chunk pipeline output is a
      * 14-row constant the oracle pins exactly). Round 12 graduated the
      * last one, g4_latency_audit: the wall-clock values stay
      * nondeterministic, but the audit's SHAPE (three stage rows, each
      * with a non-negative measured duration) is the constant the oracle
      * pins. Kept for any future genuinely-unoracleable registration. */
    def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
      Q(name, fn, None)
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** ~1 MiB large-payload fixture corpus for the byte-window family's
    * bench-scale linearity rows (round-9 task 7): six FIXED docs (ids
    * present at every SF), text repeated to ≥ 1 MiB with the same
    * integer repeat count in both engines — so the large variants carry
    * exact oracles, and the committed bench artifact measures O(len)
    * linearity on real-sized payloads instead of only asserting it in a
    * unit spec. */
  def largeDocs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    table(spark, dir, "documents")
      .filter(col("doc_id").isin(1L, 98L, 195L, 292L, 389L, 486L))
      .select(col("doc_id"),
        expr("repeat(coalesce(text, ''), cast(greatest(1, 1048576 div greatest(length(text), 1)) as int))")
          .as("text"))
  }

  /** DuckDB twin of [[largeDocs]] (CTE body for `big(doc_id, text)`). */
  val largeDocsSql: String =
    """SELECT doc_id, repeat(coalesce(text, ''),
      |         greatest(1, 1048576 // greatest(length(text), 1))::INT) AS text
      |FROM documents WHERE doc_id IN (1, 98, 195, 292, 389, 486)""".stripMargin

  /** DuckDB per-char rows over `big` — LINEAR at 1 MiB payloads: ONE
    * regexp pass builds the char list ((?s) so newlines survive) and an
    * indexed lambda attaches 1-based positions; the per-char
    * `ascii(substr(text, j, 1))` idiom the smaller oracles use is an
    * O(position) code-point scan and goes quadratic at this size.
    * Defines CTEs lch and cbl(doc_id, j, v). */
  val largeCharRowsSql: String =
    """lch AS (SELECT doc_id, unnest(list_transform(regexp_extract_all(text, '(?s).'),
      |                 (x, k) -> {'j': k, 'v': ascii(x)})) AS s FROM big),
      |cbl AS (SELECT doc_id, s.j AS j, s.v AS v FROM lch)""".stripMargin

  /** (vec_id, embedding, bucket): the 8-bit sign-LSH signature, computed
    * scan-local against ONE broadcast hyperplane-array row (hyperplanes =
    * corpus vectors 8..15, the ann_lsh_bucketed scheme) — a fold per row,
    * no per-vector shuffle. ONE recipe shared by dedup_embedding_cosine
    * and curation_bitext_mine; [[signLsh8CtesSql]] is its DuckDB twin. */
  def signLsh8Buckets(vecs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions.dotProduct
    val hpArr = vecs.filter(col("vec_id").between(8, 15))
      .agg(collect_list(struct(
        expr("cast(shiftleft(1, cast(vec_id - 8 as int)) as bigint)").as("bit"),
        col("embedding").as("he"))).as("hps"))
    val bucket = aggregate(col("hps"), lit(0L), (acc, h) =>
      acc + when(dotProduct(col("embedding"), h.getField("he")) > 0, h.getField("bit"))
        .otherwise(lit(0L)))
    vecs.crossJoin(broadcast(hpArr))
      .select(col("vec_id"), col("embedding"), bucket.as("bucket"))
  }

  /** DuckDB twin of [[signLsh8Buckets]]: defines CTEs hp and bk
    * (bk = vec_id, bucket). */
  val signLsh8CtesSql: String =
    """hp AS (SELECT vec_id - 8 AS hid, embedding AS he FROM embeddings
      |            WHERE vec_id BETWEEN 8 AND 15),
      |bk AS (SELECT e.vec_id, sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[], hp.he::DOUBLE[]) > 0
      |                                THEN (1 << hid) ELSE 0 END)::BIGINT AS bucket
      |       FROM embeddings e CROSS JOIN hp GROUP BY e.vec_id)""".stripMargin

  /** HyperLogLog register recipe over a 60-bit hash column named `h` —
    * ONE definition for sketch_hll_distinct, sketch_hll_merge and
    * stream_hll_registers (register width 1024; rho = leading-zero rank
    * of the high 50 bits, rank 51 when they're all zero). The Spark and
    * SQL forms are twins: an edit to one without the other desyncs
    * every HLL query at once, which is exactly why they live here. */
  object Hll {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions._

    /** (bucket, rho) columns for a row holding `h`. */
    def bucketCol: Column = pmod(col("h"), lit(1024L)).as("bucket")
    def rhoCol: Column = (lit(51) - length(ltrim(bin(expr("h div 1024")), "0"))).as("rho")

    /** Register aggregate → (n_hit, s_scaled) over rows holding the
      * per-bucket max `mx`. s_scaled is the EXACT integer harmonic sum:
      * Σ 2^(51−mx) plus 2^51 per empty register. */
    def nHitCol: Column = count(lit(1)).as("n_hit")
    def sScaledCol: Column =
      (sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(51 - mx AS INT))"))
        + (lit(1024L) - count(lit(1))) * lit(2251799813685248L)).as("s_scaled")

    /** Bias-corrected estimate (micro-units) from `s_scaled`. */
    def estMicroCol: Column =
      floor(lit(0.7213) / (lit(1.0) + lit(1.079) / lit(1024.0))
          * lit(1048576.0) * lit(2251799813685248.0) * lit(1000000.0)
          / col("s_scaled").cast("double")).cast("long").as("hll_est_micro")

    /** DuckDB twins. `rhoSql` yields the two register coordinates from
      * an `h` column in scope; the others mirror the aggregate and the
      * estimate over `mx` / `s_scaled`. */
    val rhoSql: String =
      "h % 1024 AS bucket, 51 - length(ltrim(bin(h // 1024), '0')) AS rho"
    val sScaledSql: String =
      """(sum(1::BIGINT << (51 - mx)::INTEGER)::BIGINT
        |                  + (1024 - count(*)) * (1::BIGINT << 51))::BIGINT""".stripMargin
    def estMicroSql(sScaled: String): String =
      s"""CAST(floor(0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / 1024.0::DOUBLE)
         |                  * 1048576.0::DOUBLE * 2251799813685248.0::DOUBLE * 1000000.0::DOUBLE
         |                  / $sScaled::DOUBLE) AS BIGINT)""".stripMargin
  }

  /** Sequence-packing geometry shared by text_seq_pack and
    * pipeline_pretrain_e2e's pack stage. Buckets bounds packing
    * parallelism (each bucket packs independently — one window sort per
    * bucket), so it scales with the cluster, not a fixture: 32 here
    * (≥ local[32]); ∝ executor count in production. The packed-sequence
    * id strides buckets by 2⁴⁰ — up to ~10¹² sequences (≈ 0.5 PB of
    * 512-token sequences) per bucket and 2²³ buckets before Long
    * overflow, where the old `bucket·10⁶` stride silently collided past
    * 10⁶ sequences/bucket (round-4 finding). */
  object Packing {
    final val Buckets = 32
    final val SeqLen = 512
    final val SeqIdStride = 1L << 40

    /** Globally-unique packed-sequence id from (bucket, running token
      * count): same arithmetic in Spark and the DuckDB oracle. floor of
      * double division is exact here — the stride itself caps cum at
      * 2⁴⁰·512 ≈ 5.6·10¹⁴, inside double's 9·10¹⁵ integer-exact range. */
    def seqId(bucket: org.apache.spark.sql.Column,
              cum: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      import org.apache.spark.sql.functions.{floor, lit}
      bucket * lit(SeqIdStride) + floor(cum / lit(SeqLen)).cast("long")
    }
  }

  /** Deterministic staging for a query's intermediate table — see
    * [[graft.functions.Staging]] (one checkpoint per (session, key),
    * reused across the bench's warm+timed runs and the oracle gate). */
  def staged(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    graft.functions.Staging.staged(spark, key)(build)

  /** The (cid, ce) centroid rows collected into ONE broadcastable
    * array-of-structs row — the driver-sized side of scan-local cell
    * assignment. */
  def centArray(centRows: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    centRows.agg(collect_list(struct(col("cid"), col("ce"))).as("cents"))
  }

  /** Scan-local cosine cell assignment: every embedding row gets its
    * argmax-cosine cell from the broadcast centroid array, ties to the
    * LOWEST cid (max over (cos, -cid) structs). Shared by dedup_semantic
    * and ann_ivfpq — the negated-cid tie-break is subtle enough that two
    * copies would silently drift. */
  def assignCosineCells(vectors: DataFrame, centsArr: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions.cosineSim
    vectors.crossJoin(broadcast(centsArr))
      .withColumn("best", array_max(transform(col("cents"),
        c => struct(cosineSim(col("embedding"), c.getField("ce")).as("cos"),
                    (-c.getField("cid")).as("ncid")))))
      .select(col("vec_id"), col("embedding"),
        (-col("best").getField("ncid")).as("cid"))
  }

  /** events table with `ts` as a proper TimestampType, whatever physical
    * form the driver's parquet carries: TIMESTAMP(NANOS) reads as long
    * nanos (under spark.sql.legacy.parquet.nanosAsLong=true — set in
    * Verify/Bench), truncated nanos→micros exactly like DuckDB's read
    * path; plain TIMESTAMP(MICROS) without a timezone reads as
    * TIMESTAMP_NTZ, cast to the session (UTC) instant — the same
    * naive-as-UTC reading DuckDB's epoch_ms applies, so oracle ms
    * arithmetic agrees either way. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val df = table(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => df
    }
  }
}
