package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.embed.HashNgramEmbedder
import graft.multimodal.Multimodal
import graft.streaming.StreamingIngest

/** Structured Streaming + multimodal operator queries. Streaming queries
  * run bounded (Trigger.AvailableNow into a memory sink) so the driver's
  * batch harness can hash-check them like any other query. */
object StreamMultimodalQueries {

  private val embedder = HashNgramEmbedder(dim = 64)

  // ---- shared media-codec synthesis: ONE pixel/sample rule, both
  // engines. Per-doc 16-byte ByteWindowSums values are the entropy
  // source; frame f shifts the byte index by f·7. The 24×16 image and
  // 8×8 ahash grid constants live here only. ----

  /** Spark side: (media_id, ws, m) for one media-type stripe. Takes any
    * documents-shaped frame — batch scan or stream — since the whole
    * rule is stateless per-row work. */
  private def mediaWsFrom(docs: DataFrame, mod: Int): DataFrame =
    // real codec work (PNG encode/decode, resample) rides scan-local above
    // this frame — fan a 1-task input out first (F.fanout is the identity
    // on streams and on any already-parallel scan)
    graft.functions.F.fanout(docs)
      .filter(col("doc_id") % 3 === mod && length(col("text")) >= 16)
      .select(col("doc_id").as("media_id"),
        graft.functions.BlobFunctions.byteWindowSums(
          encode(col("text"), "UTF-8"), 16).as("ws"))
      .withColumn("m", size(col("ws")))

  private def mediaWsBase(spark: SparkSession, dir: String, mod: Int): DataFrame =
    mediaWsFrom(table(spark, dir, "documents"), mod)

  /** Byte q (shifted by `off`) of the per-doc rule, as 0..255. */
  private def mediaByteAt(q: Column, off: Int): Column =
    (element_at(col("ws"), ((q + lit(off)) % col("m") + 1).cast("int")) % 256).cast("int")

  /** Frame f's 24×16 image, PNG-encoded through the real codec. */
  private def mediaFrame(f: Int): Column =
    graft.functions.MediaFunctions.pngEncodeRgb(
      transform(sequence(lit(0), lit(24 * 16 - 1)),
        p => mediaByteAt(p * 3, f * 7) * 65536 +
          mediaByteAt(p * 3 + 1, f * 7) * 256 +
          mediaByteAt(p * 3 + 2, f * 7)), 24, 16)

  /** DuckDB side, prologue: the ByteWindowSums replay (a/w/ws chain)
    * over the same stripe. */
  private def mediaWsCtes(mod: Int): String =
    s"""a AS (SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 3 = $mod AND length(text) >= 16),
       |w AS (SELECT media_id, i,
       |        list_aggregate(list_transform(range(16),
       |          j -> ascii(substr(text, (i * 16 + j + 1)::INT, 1))), 'sum')::BIGINT AS en
       |      FROM a, unnest(range(0, length(text) // 16)) AS u(i)),
       |ws AS (SELECT media_id, list(en ORDER BY i) AS ws FROM w GROUP BY media_id)""".stripMargin

  /** DuckDB side, pixel rule + decode-stat + ahash replay for `frames`
    * frames: yields st(media_id, f, sr, sg, sb) and
    * bits(media_id, f, ahash_hi, ahash_lo). */
  private def mediaPixelCtes(frames: Int): String =
    s"""px AS (SELECT media_id, f::INT AS f, p::INT AS p,
       |         (ws[((p * 3 + f * 7) % len(ws))::INT + 1] % 256)::INT AS r,
       |         (ws[((p * 3 + 1 + f * 7) % len(ws))::INT + 1] % 256)::INT AS g,
       |         (ws[((p * 3 + 2 + f * 7) % len(ws))::INT + 1] % 256)::INT AS b
       |       FROM ws, unnest(range(0, $frames)) AS uf(f), unnest(range(0, 384)) AS up(p)),
       |st AS (SELECT media_id, f, sum(r)::BIGINT AS sr, sum(g)::BIGINT AS sg, sum(b)::BIGINT AS sb
       |       FROM px GROUP BY media_id, f),
       |lum AS (SELECT media_id, f, p, ((299 * r + 587 * g + 114 * b) // 1000)::BIGINT AS luma FROM px),
       |grid AS (SELECT l.media_id, l.f, g.gp, l.luma
       |         FROM (SELECT gp::INT AS gp, (((gp // 8) * 2) * 24 + (gp % 8) * 3)::INT AS q
       |               FROM unnest(range(0, 64)) AS t(gp)) g
       |         JOIN lum l ON l.p = g.q),
       |gm AS (SELECT media_id, f, (sum(luma) // 64)::BIGINT AS mean FROM grid GROUP BY media_id, f),
       |bits AS (SELECT grid.media_id, grid.f,
       |           sum(CASE WHEN luma > mean AND gp >= 32 THEN (1::BIGINT << (gp - 32)) ELSE 0 END)::BIGINT AS ahash_hi,
       |           sum(CASE WHEN luma > mean AND gp < 32 THEN (1::BIGINT << gp) ELSE 0 END)::BIGINT AS ahash_lo
       |         FROM grid JOIN gm ON gm.media_id = grid.media_id AND gm.f = grid.f
       |         GROUP BY grid.media_id, grid.f)""".stripMargin

  /** Oracle shared by mm_image_decode and its streaming twin. */
  private lazy val imageDecodeSql: String =
    s"""WITH ${mediaWsCtes(0)},
      |${mediaPixelCtes(1)}
      |SELECT st.media_id AS media_id, 24::INT AS width, 16::INT AS height,
      |       (sr * 1000000 // 384)::BIGINT AS mean_r_micro,
      |       (sg * 1000000 // 384)::BIGINT AS mean_g_micro,
      |       (sb * 1000000 // 384)::BIGINT AS mean_b_micro,
      |       bits.ahash_hi, bits.ahash_lo
      |FROM st JOIN bits ON bits.media_id = st.media_id AND bits.f = st.f
      |ORDER BY st.media_id LIMIT 1000""".stripMargin

  /** Decode-stat projection shared by the batch and streaming twins. */
  private def imageDecodeProjected(base: DataFrame): DataFrame = {
    import graft.functions.MediaFunctions.imageDecodeStats
    base
      .withColumn("payload", mediaFrame(0))
      .select(col("media_id"), imageDecodeStats(col("payload")).as("st"))
      .select(col("media_id"),
        col("st.width").as("width"), col("st.height").as("height"),
        expr("st.sum_r * 1000000 DIV 384").as("mean_r_micro"),
        expr("st.sum_g * 1000000 DIV 384").as("mean_g_micro"),
        expr("st.sum_b * 1000000 DIV 384").as("mean_b_micro"),
        shiftrightunsigned(col("st.ahash"), 32).as("ahash_hi"),
        col("st.ahash").bitwiseAND(lit(0xffffffffL)).as("ahash_lo"))
  }

  val all: Seq[Q] = Seq(

    // Streaming ingest INTO THE WORKSPACE: file-source documents →
    // foreachBatch → chunk store + posting index, via the live Engine
    // facade (the reference's incremental index queue,
    // mainwindow.cpp:713-761; incremental chunk emission
    // pdf_processor.cpp:396-403). ORACLE-GREEN since round 10 (the
    // stream_image_decode graduation recipe): the bounded run drains to
    // completion and the PERSISTED chunk table it fed is hashed against
    // the SAME TextChunker recursive-CTE fold as the batch pipeline —
    // chunking is per-document stateless work, so micro-batch boundaries
    // cannot change the result, and now the oracle proves it.
    Q("stream_ingest",
      """WITH RECURSIVE
        |sec AS (SELECT doc_id::VARCHAR AS source, coalesce(text, '') AS text FROM documents),
        |""".stripMargin + B9OracleSql.foldCtes + """
        |SELECT source AS doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |       chunk_len AS len, 64::BIGINT AS dim
        |FROM chunks
        |ORDER BY source::BIGINT, chunk_idx LIMIT 1000""".stripMargin) { (spark, dir) =>
      val root = graft.util.TempRoot.dir("stream-ws-").toString
      val engine = graft.api.Engine.open(spark, root, "main")
      engine.startStreamingIngest(
        StreamingIngest.stageAsDir(s"$dir/documents.parquet"))
        .awaitTermination()
      engine.workspace.readChunks()
        .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          length(col("text_chunk")).cast("long").as("len"),
          size(col("embedding")).cast("long").as("dim"))
        .orderBy(col("doc_id").cast("long"), col("chunk_idx"))
        .limit(1000)
    },

    // Streaming windowed aggregation with watermark — checked against the
    // same aggregate computed by DuckDB in batch (bounded stream ≡ batch).
    Q("stream_window_agg",
      """SELECT date_trunc('hour', ts) AS win, event_type, count(*) AS n
        |FROM events GROUP BY win, event_type
        |ORDER BY win, event_type""".stripMargin) { (spark, dir) =>
      // complete mode: a bounded run must emit ALL windows (append would
      // withhold windows newer than the final watermark)
      StreamingIngest.runToMemory(spark,
        StreamingIngest.windowedEventCounts(spark, StreamingIngest.stageAsDir(s"$dir/events.parquet")),
        s"stream_win_${System.nanoTime()}", outputMode = "complete")
        .select(col("win"), col("event_type"), col("n"))
        .orderBy("win", "event_type")
    },

    // Streaming value histogram — the incremental member of the
    // histogram family (sketch_quantile_hist is the batch form): fixed
    // 1024-bin integer-cent domain, so state is BOUNDED at
    // event_types × 1024 groups however long the stream runs, and
    // partial histograms merge by addition. Bounded run ≡ the batch
    // groupBy, which is the exact oracle.
    Q("stream_value_histogram",
      """SELECT event_type,
        |       least(1023, greatest(0, CAST(round(value * 100, 0) AS BIGINT) // 1024)) AS bin,
        |       count(*) AS n
        |FROM events GROUP BY event_type, bin
        |ORDER BY event_type, bin""".stripMargin) { (spark, dir) =>
      StreamingIngest.runToMemory(spark,
        StreamingIngest.histogramStream(spark,
          StreamingIngest.stageAsDir(s"$dir/events.parquet")),
        s"stream_hist_${System.nanoTime()}", outputMode = "complete")
        .select(col("event_type"), col("bin"), col("n"))
        .orderBy("event_type", "bin")
    },

    // Streaming NEAR-dup filtering: online MinHash-LSH dedup — each
    // arriving doc is banded with the SAME DedupPipeline signatures as
    // dedup_minhash_lsh, and per-bucket state (one long: the smallest id
    // seen) reports whether an earlier doc already occupies the bucket;
    // kept = every bucket fresh. The first-in-bucket-wins contract a
    // production ingest filter applies BEFORE paying embed/index cost for
    // a near-duplicate; state bounded by occupied buckets, not stream
    // length. Bounded id-ordered run ≡ the batch min-per-bucket verdicts,
    // which is the exact oracle.
    Q("stream_neardup", {
      val src = s"SELECT * FROM (${DedupQueries.tokenSetsSql}) WHERE len(toks) > 0"
      s"""WITH ${DedupQueries.lshCtes(src)},
         |mn AS (SELECT band, bkey, min(doc_id) AS first_id FROM b GROUP BY band, bkey)
         |SELECT b.doc_id,
         |       sum(CASE WHEN b.doc_id > mn.first_id THEN 1 ELSE 0 END)::BIGINT AS dup_bands,
         |       bool_or(b.doc_id > mn.first_id) AS is_dup
         |FROM b JOIN mn USING (band, bkey)
         |GROUP BY b.doc_id ORDER BY doc_id LIMIT 1000""".stripMargin
    }) { (spark, dir) =>
      StreamingIngest.runToMemory(spark,
        StreamingIngest.nearDupStream(spark,
          StreamingIngest.stageAsDir(s"$dir/documents.parquet")),
        s"stream_neardup_${System.nanoTime()}")
        .groupBy("doc_id")
        .agg(sum(when(col("dup"), 1L).otherwise(0L)).as("dup_bands"),
          max(col("dup")).as("is_dup"))
        .orderBy("doc_id")
        .limit(1000)
    },

    // Streaming sequence packing: the concat-and-chop pack layout
    // maintained incrementally — each arriving doc takes the next
    // n_tokens slots of its hash bucket's 512-token sequence stream,
    // with ONE long of state per bucket. The third admission-side
    // streaming operator (near-dup rejects redundancy, source-quota
    // caps over-representation, pack emits training-ready sequences).
    // Bounded id-ordered run ≡ the batch layout — the oracle is
    // LITERALLY text_seq_pack's SQL (shared definition).
    Q("stream_seq_pack", TextQueries.seqPackSql) { (spark, dir) =>
      StreamingIngest.runToMemory(spark,
        StreamingIngest.seqPackStream(spark,
          StreamingIngest.stageAsDir(s"$dir/documents.parquet")),
        s"stream_pack_${System.nanoTime()}")
        .orderBy("doc_id")
        .limit(1000)
    },

    // Streaming HLL registers: the distinct-count sketch maintained as
    // streaming state — max-rho per register is the mergeable-sketch
    // merge, so micro-batch partials fold associatively and state is
    // bounded at 1024 rows for any stream length. Bounded run ≡ the
    // batch register table (exact oracle); the estimator over these
    // registers is pinned by sketch_hll_distinct.
    Q("stream_hll_registers",
      s"""WITH gr AS (SELECT unnest(list_transform(range(1, len(regexp_extract_all(lower(text), '[a-z0-9]+')) - 3),
         |              i -> array_to_string(list_slice(regexp_extract_all(lower(text), '[a-z0-9]+'), i, i + 4), ' '))) AS g
         |            FROM documents),
         |h AS (SELECT ('0x' || substr(md5(g), 1, 15))::BIGINT AS h FROM gr),
         |r AS (SELECT ${Hll.rhoSql} FROM h)
         |SELECT bucket, max(rho)::BIGINT AS mx
         |FROM r GROUP BY bucket ORDER BY bucket""".stripMargin) { (spark, dir) =>
      StreamingIngest.runToMemory(spark,
        StreamingIngest.hllRegisterStream(spark,
          StreamingIngest.stageAsDir(s"$dir/documents.parquet")),
        s"stream_hll_${System.nanoTime()}", outputMode = "complete")
        .select(col("bucket"), col("mx"))
        .orderBy("bucket")
    },

    // Streaming CMS counter cells: the term-frequency sketch maintained
    // as streaming state — the "how often" complement of
    // stream_hll_registers' "how many distinct". Counter cells fold by
    // addition across micro-batches, so state is bounded at
    // CmsRows×CmsWidth rows however long the stream runs; the bucket
    // arithmetic is the SAME cmsRowBuckets definition the batch build
    // uses, and the heavy-hitter estimator over these cells is pinned by
    // sketch_cms_estimate. Bounded run ≡ the batch cell table (exact
    // oracle).
    Q("stream_cms_cells",
      s"""WITH tk AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
         |            FROM documents),
         |cells AS (SELECT r.r,
         |                 ('0x' || substr(md5(r.r::VARCHAR || ':' || tok), 1, 15))::BIGINT % ${ScaleQueries.CmsWidth} AS b,
         |                 count(*) AS cnt
         |          FROM tk CROSS JOIN (SELECT unnest(range(${ScaleQueries.CmsRows})) AS r) r GROUP BY r.r, b)
         |SELECT r, b, cnt::BIGINT AS cnt FROM cells ORDER BY r, b""".stripMargin) { (spark, dir) =>
      StreamingIngest.runToMemory(spark,
        StreamingIngest.cmsCellStream(spark,
          StreamingIngest.stageAsDir(s"$dir/documents.parquet")),
        s"stream_cms_${System.nanoTime()}", outputMode = "complete")
        .select(col("r"), col("b"), col("cnt"))
        .orderBy("r", "b")
    },

    // Streaming per-source token-quota admission: each source may
    // contribute at most 800 tokens to the mix; a doc is admitted iff
    // its source's running total (doc id order) still fits. The
    // admission-control complement of stream_neardup (that one rejects
    // redundancy, this one caps over-representation); state = one long
    // per source. Bounded id-ordered run ≡ the batch per-source prefix
    // cumsum, which is the exact oracle.
    Q("stream_source_quota",
      """WITH t AS (SELECT doc_id, source,
        |             len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT AS n_tokens
        |           FROM documents),
        |c AS (SELECT doc_id, source, n_tokens,
        |        sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS cum
        |      FROM t)
        |SELECT doc_id, source, n_tokens, (cum <= 800) AS admitted
        |FROM c ORDER BY doc_id LIMIT 1000""".stripMargin) { (spark, dir) =>
      StreamingIngest.runToMemory(spark,
        StreamingIngest.sourceQuotaStream(spark,
          StreamingIngest.stageAsDir(s"$dir/documents.parquet"), budget = 800),
        s"stream_quota_${System.nanoTime()}")
        .orderBy("doc_id")
        .limit(1000)
    },

    // Streaming exact dedup: dropDuplicates state over the content hash —
    // bounded run ≡ batch DISTINCT, which is the exact oracle.
    Q("stream_dedup",
      """SELECT DISTINCT md5(lower(trim(text))) AS text_md5
        |FROM documents ORDER BY text_md5 LIMIT 1000""".stripMargin) { (spark, dir) =>
      StreamingIngest.runToMemory(spark,
        StreamingIngest.dedupStream(spark, StreamingIngest.stageAsDir(s"$dir/documents.parquet")),
        s"stream_dedup_${System.nanoTime()}")
        .select(col("text_md5"))
        .orderBy("text_md5")
        .limit(1000)
    },

    // Streaming dedup with BOUNDED state (dropDuplicatesWithinWatermark):
    // the at-scale variant of stream_dedup — seen-key state is evicted as
    // the event-time watermark advances instead of growing with distinct
    // keys forever. The stream replicates each event 3×; duplicates share the
    // event-time (inside the delay), where single emission is guaranteed,
    // so the bounded run is exactly the distinct event_id set.
    Q("stream_dedup_watermark",
      """SELECT event_id FROM events ORDER BY event_id LIMIT 2000""") { (spark, dir) =>
      StreamingIngest.runToMemory(spark,
        StreamingIngest.dedupWithinWatermarkStream(spark,
          StreamingIngest.stageAsDir(s"$dir/events.parquet")),
        s"stream_dedup_wm_${System.nanoTime()}")
        .select(col("event_id"))
        .orderBy("event_id")
        .limit(2000)
    },

    // Streaming sessionization via flatMapGroupsWithState (custom state:
    // open session + emitted-session counter per user); sentinel events
    // close final sessions, making the bounded run ≡ batch sessionize,
    // which is the exact oracle (same SQL as q_sessionize).
    Q("stream_sessionize",
      """WITH x AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ms,
        |         CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) > 1800000
        |                   OR lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) IS NULL
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (SELECT user_id, event_id, ms,
        |             sum(brk) OVER (PARTITION BY user_id ORDER BY ms, event_id ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
        |      FROM x)
        |SELECT user_id, session_id, count(*) AS n, max(ms) - min(ms) AS dur_ms
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin) { (spark, dir) =>
      StreamingIngest.runToMemory(spark,
        StreamingIngest.sessionStream(spark,
          StreamingIngest.stageEventsWithSentinels(spark, s"$dir/events.parquet")),
        s"stream_sess_${System.nanoTime()}")
        .select(col("user_id"), col("session_id"), col("n"), col("dur_ms"))
        .orderBy("user_id", "session_id")
    },

    // Stream-static enrichment: streaming events broadcast-joined to the
    // static customer dimension, running per-segment totals (complete
    // mode). Values quantized to cents per row → the bounded run equals
    // the batch join-aggregate exactly.
    Q("stream_enrich_join",
      """SELECT c.c_mktsegment AS segment, count(*) AS n,
        |       sum(CAST(floor(e.value * 100) AS BIGINT))::BIGINT AS value_cents
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY segment ORDER BY segment""".stripMargin) { (spark, dir) =>
      StreamingIngest.runToMemory(spark,
        StreamingIngest.enrichStream(spark,
          StreamingIngest.stageAsDir(s"$dir/events.parquet"),
          table(spark, dir, "customer")),
        s"stream_enrich_${System.nanoTime()}", outputMode = "complete")
        .select(col("segment"), col("n"), col("value_cents"))
        .orderBy("segment")
    },

    // Stream-stream time-range self-join (clicks ⋈ same-user views from
    // the prior 30 min, watermarked both sides) — inner join emits on
    // match, so the bounded run equals the batch range join exactly.
    Q("stream_click_view_join",
      """SELECT c.event_id AS click_id, v.event_id AS view_id,
        |       epoch_ms(c.ts) - epoch_ms(v.ts) AS lag_ms
        |FROM events c JOIN events v
        |  ON c.user_id = v.user_id AND c.event_type = 'click' AND v.event_type = 'view'
        | AND epoch_ms(v.ts) BETWEEN epoch_ms(c.ts) - 1800000 AND epoch_ms(c.ts)
        |ORDER BY click_id, view_id""".stripMargin) { (spark, dir) =>
      StreamingIngest.runToMemory(spark,
        StreamingIngest.clickViewStream(spark, StreamingIngest.stageAsDir(s"$dir/events.parquet")),
        s"stream_cv_${System.nanoTime()}")
        .select(col("click_id"), col("view_id"), col("lag_ms"))
        .orderBy("click_id", "view_id")
    },

    // Multimodal: partition-local feature extraction — the FLOAT stage,
    // ORACLE-GREEN since round 10 (the c1_embed_hash_coords recipe applied
    // to the L1 normalization): the same two stripes as
    // mm_feature_extract_int run through the REAL Multimodal
    // .extractFeatures (PNG encode + ImageIO decode on the image stripe,
    // byte featurizer on the text stripe), and every coordinate replays as
    // floor(float32(count / denom) · 10⁶) — Long→Float conversion is exact
    // below 2²⁴ (counts ≤ 97920 here) and IEEE float division is exactly
    // specified, so the hash compare is bit-exact.
    Q("mm_feature_extract",
      s"""WITH ${mediaWsCtes(0)},
         |${mediaPixelCtes(1)},
         |lbins AS (SELECT media_id, least(luma * 11 // 256, 10) AS bin, count(*) AS c
         |          FROM lum GROUP BY media_id, bin),
         |lfull AS (SELECT ws.media_id, t.b AS bin, coalesce(lb.c, 0) AS c
         |          FROM ws CROSS JOIN unnest(range(0, 11)) AS t(b)
         |          LEFT JOIN lbins lb ON lb.media_id = ws.media_id AND lb.bin = t.b),
         |imgc AS (
         |  SELECT media_id, 0 AS idx, 24000000::BIGINT AS val_micro FROM ws
         |  UNION ALL SELECT media_id, 1, 16000000::BIGINT FROM ws
         |  UNION ALL SELECT media_id, 2, floor((sr::FLOAT / 384::FLOAT)::DOUBLE * 1000000)::BIGINT FROM st
         |  UNION ALL SELECT media_id, 3, floor((sg::FLOAT / 384::FLOAT)::DOUBLE * 1000000)::BIGINT FROM st
         |  UNION ALL SELECT media_id, 4, floor((sb::FLOAT / 384::FLOAT)::DOUBLE * 1000000)::BIGINT FROM st
         |  UNION ALL SELECT media_id, 5 + bin,
         |    floor((c::FLOAT / 384::FLOAT)::DOUBLE * 1000000)::BIGINT FROM lfull),
         |bt AS (SELECT doc_id AS media_id, coalesce(text, '') AS text
         |       FROM documents WHERE doc_id % 3 = 1),
         |bc AS (SELECT media_id, (ascii(substr(text, i::INT + 1, 1)) // 16) AS bin, count(*) AS c
         |       FROM bt, unnest(range(0, length(text))) AS u(i) GROUP BY media_id, bin),
         |bfull AS (SELECT bt.media_id, t.b AS bin, coalesce(bc.c, 0) AS c,
         |                 length(bt.text) AS denom
         |          FROM bt CROSS JOIN unnest(range(0, 16)) AS t(b)
         |          LEFT JOIN bc ON bc.media_id = bt.media_id AND bc.bin = t.b),
         |bytc AS (SELECT media_id, bin AS idx,
         |                CASE WHEN denom = 0 THEN 0::BIGINT
         |                     ELSE floor((c::FLOAT / denom::FLOAT)::DOUBLE * 1000000)::BIGINT END AS val_micro
         |         FROM bfull)
         |SELECT media_id, idx::BIGINT AS idx, val_micro
         |FROM (SELECT * FROM imgc UNION ALL SELECT * FROM bytc)
         |ORDER BY media_id, idx LIMIT 1600""".stripMargin) { (spark, dir) =>
      def coords(media: DataFrame): DataFrame =
        Multimodal.extractFeatures(media)
          .select(col("media_id"), posexplode(col("features")).as(Seq("idx", "v")))
          .select(col("media_id"), col("idx").cast("long").as("idx"),
            floor(col("v").cast("double") * 1000000).cast("long").as("val_micro"))
      val imgStripe = coords(mediaWsBase(spark, dir, 0)
        .select(col("media_id"), mediaFrame(0).as("payload")))
      val byteStripe = coords(Multimodal.asMediaTable(
        table(spark, dir, "documents").filter(col("doc_id") % 3 === 1)))
      imgStripe.unionAll(byteStripe)
        .orderBy("media_id", "idx")
        .limit(1600)
    },

    // The INTEGER stage of mm_feature_extract, oracle-green (round-9
    // task 6): only the L1 float normalization is outside the SQL
    // surface — the sniffed path, width/height, mean-RGB numerators,
    // luma-histogram counts and byte-nibble counts all replay exactly.
    // The byte stripe's ascii()/length() arithmetic assumes the corpus is
    // pure ASCII (byte == char); StreamMultimodalSpec's "corpus ASCII
    // invariant" test pins that assumption loudly at all three SFs.
    // Two stripes through the REAL Multimodal.decodeToIntFeatures: the
    // doc%3=0 stripe is PNG-ENCODED through the actual codec (the
    // mm_image_decode pixel synthesis) and decoded back by ImageIO —
    // pinning the image branch end to end; the doc%3=1 stripe exercises
    // the byte-featurizer fallback on raw text payloads. Zero bins are
    // emitted explicitly (the dense-histogram contract), and the joined
    // bins string keeps the compare compact.
    Q("mm_feature_extract_int",
      s"""WITH ${mediaWsCtes(0)},
         |${mediaPixelCtes(1)},
         |lbins AS (SELECT media_id, least(luma * 11 // 256, 10) AS bin, count(*) AS c
         |          FROM lum GROUP BY media_id, bin),
         |lfull AS (SELECT ws.media_id, t.b AS bin, coalesce(lb.c, 0) AS c
         |          FROM ws CROSS JOIN unnest(range(0, 11)) AS t(b)
         |          LEFT JOIN lbins lb ON lb.media_id = ws.media_id AND lb.bin = t.b),
         |lstr AS (SELECT media_id, string_agg(c::VARCHAR, '-' ORDER BY bin) AS bins
         |         FROM lfull GROUP BY media_id),
         |img AS (SELECT st.media_id, 'image' AS kind, 24::BIGINT AS width, 16::BIGINT AS height,
         |               st.sr AS sum_r, st.sg AS sum_g, st.sb AS sum_b, lstr.bins,
         |               384::BIGINT AS denom
         |        FROM st JOIN lstr USING (media_id)),
         |bt AS (SELECT doc_id AS media_id, coalesce(text, '') AS text
         |       FROM documents WHERE doc_id % 3 = 1),
         |bc AS (SELECT media_id, (ascii(substr(text, i::INT + 1, 1)) // 16) AS bin, count(*) AS c
         |       FROM bt, unnest(range(0, length(text))) AS u(i) GROUP BY media_id, bin),
         |bfull AS (SELECT bt.media_id, t.b AS bin, coalesce(bc.c, 0) AS c
         |          FROM bt CROSS JOIN unnest(range(0, 16)) AS t(b)
         |          LEFT JOIN bc ON bc.media_id = bt.media_id AND bc.bin = t.b),
         |bstr AS (SELECT media_id, string_agg(c::VARCHAR, '-' ORDER BY bin) AS bins
         |         FROM bfull GROUP BY media_id),
         |byt AS (SELECT bt.media_id, 'bytes' AS kind, 0::BIGINT AS width, 0::BIGINT AS height,
         |               0::BIGINT AS sum_r, 0::BIGINT AS sum_g, 0::BIGINT AS sum_b, bstr.bins,
         |               length(bt.text)::BIGINT AS denom
         |        FROM bt JOIN bstr USING (media_id))
         |SELECT * FROM (SELECT * FROM img UNION ALL SELECT * FROM byt)
         |ORDER BY media_id LIMIT 1000""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      def ints(media: DataFrame): DataFrame =
        media.select(col("media_id"), col("payload"))
          .as[(Long, Array[Byte])]
          .mapPartitions(rows => rows.map { case (id, payload) =>
            val (kind, w, h, sr, sg, sb, bins, denom) =
              Multimodal.decodeToIntFeatures(payload)
            (id, kind, w.toLong, h.toLong, sr, sg, sb, bins.mkString("-"), denom)
          })
          .toDF("media_id", "kind", "width", "height", "sum_r", "sum_g",
            "sum_b", "bins", "denom")
      val imgStripe = ints(mediaWsBase(spark, dir, 0)
        .select(col("media_id"), mediaFrame(0).as("payload")))
      val byteStripe = ints(Multimodal.asMediaTable(
        table(spark, dir, "documents").filter(col("doc_id") % 3 === 1)))
      imgStripe.unionAll(byteStripe)
        .orderBy("media_id")
        .limit(1000)
    },

    // Multimodal frame sampling: byte-window signatures — exact oracle via
    // string substr (ASCII corpus: byte and char offsets coincide).
    Q("mm_frame_sample",
      """SELECT doc_id AS media_id, i - 1 AS frame_idx,
        |       md5(substr(text, ((i - 1) * 16 + 1)::INT, 32)) AS frame_sig
        |FROM documents, unnest(range(1, (greatest(length(text) - 31, 1) + 15) // 16 + 1)) AS u(i)
        |WHERE doc_id % 10 = 0
        |ORDER BY media_id, frame_idx LIMIT 1000""".stripMargin) { (spark, dir) =>
      val media = Multimodal.asMediaTable(
        table(spark, dir, "documents").filter(col("doc_id") % 10 === 0))
      Multimodal.sampleFrames(media, frameBytes = 32, stride = 16)
        .select(col("media_id"), (col("frame_idx")).as("frame_idx"), col("frame_sig"))
        .orderBy("media_id", "frame_idx")
        .limit(1000)
    },

    // Multimodal frame dedup: duplicate frame signatures ACROSS the media
    // corpus (intro/outro boilerplate detection in a video corpus). Same
    // honest two-shuffle shape as dedup_substring_spans — the signature
    // count grows with the corpus and can never broadcast.
    Q("mm_frame_dedup",
      """WITH f AS (SELECT doc_id AS media_id,
        |             md5(substr(text, ((i - 1) * 16 + 1)::INT, 32)) AS frame_sig
        |           FROM documents, unnest(range(1, (greatest(length(text) - 31, 1) + 15) // 16 + 1)) AS u(i)
        |           WHERE doc_id % 5 = 0),
        |c AS (SELECT frame_sig, count(*) AS cnt FROM f GROUP BY frame_sig),
        |d AS (SELECT f.media_id, count(*)::BIGINT AS n_frames,
        |             sum(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup
        |      FROM f JOIN c ON c.frame_sig = f.frame_sig GROUP BY f.media_id)
        |SELECT media_id, n_frames, n_dup,
        |       CAST(floor(n_dup * 1000000.0 / n_frames) AS BIGINT) AS dup_ppm
        |FROM d ORDER BY media_id LIMIT 1000""".stripMargin) { (spark, dir) =>
      val media = Multimodal.asMediaTable(
        table(spark, dir, "documents").filter(col("doc_id") % 5 === 0))
      val f = Multimodal.sampleFrames(media, frameBytes = 32, stride = 16)
        .select(col("media_id"), col("frame_sig"))
      val c = f.groupBy("frame_sig").agg(count(lit(1)).as("cnt"))
      f.join(c, Seq("frame_sig"))
        .groupBy("media_id")
        .agg(count(lit(1)).as("n_frames"),
          sum(when(col("cnt") > 1, 1L).otherwise(0L)).as("n_dup"))
        .select(col("media_id"), col("n_frames"), col("n_dup"),
          floor(col("n_dup") * 1000000.0 / col("n_frames")).cast("long").as("dup_ppm"))
        .orderBy("media_id")
        .limit(1000)
    },

    // Perceptual-hash near-dup over the opaque BINARY payload — the
    // multimodal twin of dedup_simhash_pairs (cf. average-hash/aHash in
    // the pHash family): a 60-bit signature with bit j set iff the j-th
    // full 64-byte block of the payload's first 3840 bytes beats the
    // prefix's mean block sum (the integer cross-multiply
    // w_j·nwin > Σw needs no division, so it is bit-exact cross-engine).
    // ByteWindowSums computes all block sums in ONE O(len) codegen pass
    // (never the quadratic per-offset substr). Candidates come from 4
    // 15-bit hash bands + the sorted-neighborhood window — the standard
    // hamming-LSH shape, so pair cost is bucket-bounded at any corpus
    // size; pairs verify at hamming ≤ 6. This is the dedup an image/
    // audio pipeline runs BEFORE paying decode cost — byte-level
    // signatures kill exact and near-exact payload copies however the
    // metadata differs.
    Q("mm_blockhash_pairs", {
      val bandSel = (0 until 4)
        .map(b => s"SELECT media_id, bh, $b AS band, (bh >> ${15 * b}) & 32767 AS bkey FROM s")
        .mkString(" UNION ALL ")
      s"""WITH a AS (SELECT doc_id AS media_id, text FROM documents),
         |w AS (SELECT media_id,
         |        list_transform(range(least(length(text), 3840) // 64), w ->
         |          list_aggregate(list_transform(range(64),
         |            j -> ascii(substr(text, (w * 64 + j + 1)::INT, 1))), 'sum')) AS ws
         |      FROM a),
         |s AS (SELECT media_id,
         |        list_aggregate(list_transform(range(least(len(ws), 60)), j ->
         |          CASE WHEN ws[j + 1] * len(ws) > list_aggregate(ws, 'sum')
         |               THEN (1::BIGINT << j) ELSE 0 END), 'sum')::BIGINT AS bh
         |      FROM w WHERE len(ws) > 0),
         |b AS ($bandSel),
         |rk AS (SELECT media_id, bh, band, bkey,
         |              row_number() OVER (PARTITION BY band, bkey ORDER BY bh, media_id) AS rn
         |       FROM b),
         |p AS (SELECT DISTINCT least(l.media_id, r.media_id) AS a_id,
         |             greatest(l.media_id, r.media_id) AS b_id,
         |             bit_count(xor(l.bh, r.bh))::BIGINT AS hamming
         |      FROM rk l JOIN rk r ON l.band = r.band AND l.bkey = r.bkey
         |                         AND r.rn > l.rn AND r.rn <= l.rn + ${graft.dedup.DedupPipeline.NeighborWindow})
         |SELECT a_id, b_id, hamming FROM p WHERE hamming <= 6
         |ORDER BY hamming, a_id, b_id LIMIT 200""".stripMargin
    }) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val s = Multimodal.asMediaTable(table(spark, dir, "documents"))
        .select(col("media_id"),
          graft.functions.BlobFunctions.byteWindowSums(
            expr("substring(payload, 1, 3840)"), 64).as("ws"))
        .filter(size(col("ws")) > 0)
        .withColumn("nwin", size(col("ws")).cast("long"))
        .withColumn("total", expr("aggregate(ws, 0L, (a, x) -> a + x)"))
        .withColumn("bh", expr("aggregate(transform(slice(ws, 1, 60), " +
          "(w, j) -> IF(w * nwin > total, shiftleft(1L, j), 0L)), 0L, (a, x) -> a + x)"))
        .select(col("media_id"), col("bh"))
      val banded = s.select(col("media_id"), col("bh"),
          explode(array((0 until 4).map(b =>
            struct(lit(b).as("band"),
              shiftright(col("bh"), 15 * b).bitwiseAND(32767).as("bkey"))): _*)).as("bb"))
        .select(col("media_id"), col("bh"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
      // Sorted-neighborhood pairs, PARALLEL even on a degenerate bucket
      // (round 11; since factored into [[graft.dedup.SortedNeighborhood]]
      // and shared with the whole text-dedup pair family). Blockhash
      // band 3 is structurally degenerate for short documents: bits
      // 45-59 of bh are zero whenever a doc has < 46 byte-windows
      // (< ~3 KB), so at EVERY SF one bucket holds ~the whole corpus
      // (sf10 measured: 499,552 of 500k rows in one cell, wall G = 23.5
      // from parallelism collapse, not work growth). The helper keeps
      // pair work n·W and fans both the rank and the frame out with
      // corpus size; its offset collect is bounded by partition-spanning
      // buckets (~2 × #partitions rows), never #cells.
      graft.dedup.SortedNeighborhood.withNeighbors(
          banded, Seq("bh", "media_id"), Seq("media_id", "bh"),
          graft.dedup.DedupPipeline.NeighborWindow, s"$dir#blockhash_rk")
        .select(col("media_id"), col("bh"), explode(col("__next")).as("nb"))
        .select(least(col("media_id"), col("nb.media_id")).as("a_id"),
          greatest(col("media_id"), col("nb.media_id")).as("b_id"),
          expr("bit_count(bh ^ nb.bh)").cast("long").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 6)
        .orderBy("hamming", "a_id", "b_id")
        .limit(200)
    },

    // Audio energy segmentation (the VAD shape: window energy →
    // threshold → contiguous active runs): each audio track's payload is
    // cut into fixed 64-byte windows, window energy = byte-value sum
    // (the codec-free stand-in for RMS — exact integers, so the
    // threshold is bit-stable cross-engine), and consecutive active
    // windows merge into segments via the gaps-and-islands trick
    // (win − row_number over active windows = run id). Plan shape: the
    // windows explode scan-local, the islands window partitions by
    // media_id over that track's ≤ payload/64 windows (never global),
    // and the segment rollup groups on (media, run) — the segmentation
    // a speech pipeline runs before paying ASR cost per segment.
    Q("mm_energy_segments",
      """WITH a AS (SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 3 = 1),
        |w AS (SELECT media_id, i,
        |        list_aggregate(list_transform(range(64),
        |          j -> ascii(substr(text, (i * 64 + j + 1)::INT, 1))), 'sum')::BIGINT AS en
        |      FROM a, unnest(range(0, length(text) // 64)) AS u(i)),
        |act AS (SELECT media_id, i, en,
        |          i - row_number() OVER (PARTITION BY media_id ORDER BY i) AS run
        |        FROM w WHERE en >= 6050)
        |SELECT media_id, min(i)::BIGINT AS start_win, count(*) AS n_win,
        |       sum(en)::BIGINT AS energy_sum
        |FROM act GROUP BY media_id, run
        |ORDER BY media_id, start_win LIMIT 1000""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      // Byte-indexed single pass: encode the payload to BINARY once per
      // row, then ByteWindowSums scans every byte exactly once (codegen)
      // — O(len) per doc where the old per-char ascii(substr(text, …))
      // lambda was O(len²/64) (STRING substr is an O(position)
      // code-point scan). The char-based DuckDB oracle is exact on this
      // ASCII corpus (byte value == code point, verified 0 non-ASCII
      // rows at sf0.01/sf0.1); posexplode's pos == range(0, len // 64).
      val wins = table(spark, dir, "documents")
        .filter(col("doc_id") % 3 === 1 && length(col("text")) >= 64)
        .select(col("doc_id").as("media_id"),
          posexplode(graft.functions.BlobFunctions.byteWindowSums(
            encode(col("text"), "UTF-8"), 64)))
        .select(col("media_id"), col("pos").cast("long").as("i"),
          col("col").as("en"))
      val act = wins.filter(col("en") >= 6050)
        .withColumn("run", col("i") - row_number().over(
          Window.partitionBy("media_id").orderBy("i")))
      act.groupBy(col("media_id"), col("run"))
        .agg(min(col("i")).as("start_win"), count(lit(1)).as("n_win"),
          sum(col("en")).as("energy_sum"))
        .select(col("media_id"), col("start_win"), col("n_win"), col("energy_sum"))
        .orderBy("media_id", "start_win")
        .limit(1000)
    },

    // mm_energy_segments at ~1 MiB payloads (round-9 task 7): the SAME
    // segmentation semantics over the six-doc large-payload fixture, so
    // the committed bench artifact measures the ByteWindowSums kernel's
    // O(len) linearity at real media sizes (~16k windows/payload vs ~12
    // at base scale) instead of only asserting it in the 1 MB unit spec.
    // Oracle stays linear too: char-list rows (largeCharRowsSql), block
    // sums by GROUP BY (j-1)//64 with full-window HAVING.
    Q("mm_energy_segments_large",
      s"""WITH big AS ($largeDocsSql),
         |$largeCharRowsSql,
         |w AS (SELECT doc_id AS media_id, (j - 1) // 64 AS i, sum(v)::BIGINT AS en
         |      FROM cbl GROUP BY media_id, i HAVING count(*) = 64),
         |act AS (SELECT media_id, i, en,
         |          i - row_number() OVER (PARTITION BY media_id ORDER BY i) AS run
         |        FROM w WHERE en >= 6050)
         |SELECT media_id, min(i)::BIGINT AS start_win, count(*) AS n_win,
         |       sum(en)::BIGINT AS energy_sum
         |FROM act GROUP BY media_id, run
         |ORDER BY media_id, start_win LIMIT 1000""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val wins = largeDocs(spark, dir)
        .filter(length(col("text")) >= 64)
        .select(col("doc_id").as("media_id"),
          posexplode(graft.functions.BlobFunctions.byteWindowSums(
            encode(col("text"), "UTF-8"), 64)))
        .select(col("media_id"), col("pos").cast("long").as("i"),
          col("col").as("en"))
      val act = wins.filter(col("en") >= 6050)
        .withColumn("run", col("i") - row_number().over(
          Window.partitionBy("media_id").orderBy("i")))
      act.groupBy(col("media_id"), col("run"))
        .agg(min(col("i")).as("start_win"), count(lit(1)).as("n_win"),
          sum(col("en")).as("energy_sum"))
        .select(col("media_id"), col("start_win"), col("n_win"), col("energy_sum"))
        .orderBy("media_id", "start_win")
        .limit(1000)
    },

    // mm_blockhash's signature path at ~1 MiB payloads (round-9 task 7):
    // the 60-bit block signature over the first 3840 bytes (identical
    // rule to mm_blockhash_pairs) PLUS full-payload window stats, so the
    // bench row pays the whole O(len) ByteWindowSums scan. Prefix blocks
    // coincide with full-payload blocks i < 60 (non-overlapping windows
    // at the same offsets), which keeps the oracle one shared block CTE.
    Q("mm_blockhash_large",
      s"""WITH big AS ($largeDocsSql),
         |$largeCharRowsSql,
         |w64 AS (SELECT doc_id AS media_id, (j - 1) // 64 AS i, sum(v)::BIGINT AS en
         |        FROM cbl GROUP BY media_id, i HAVING count(*) = 64),
         |pref AS (SELECT media_id, count(*)::BIGINT AS nwin, sum(en)::BIGINT AS total
         |         FROM w64 WHERE i < 60 GROUP BY media_id),
         |sig AS (SELECT w.media_id,
         |          sum(CASE WHEN w.en * p.nwin > p.total THEN (1::BIGINT << w.i::INT) ELSE 0 END)::BIGINT AS bh
         |        FROM w64 w JOIN pref p USING (media_id)
         |        WHERE w.i < 60 GROUP BY w.media_id),
         |full_s AS (SELECT media_id, count(*)::BIGINT AS n_windows, sum(en)::BIGINT AS byte_sum
         |           FROM w64 GROUP BY media_id)
         |SELECT s.media_id, s.bh, f.n_windows, f.byte_sum
         |FROM sig s JOIN full_s f USING (media_id)
         |ORDER BY media_id""".stripMargin) { (spark, dir) =>
      largeDocs(spark, dir)
        .filter(length(col("text")) >= 64)
        .select(col("doc_id").as("media_id"), encode(col("text"), "UTF-8").as("payload"))
        .select(col("media_id"),
          graft.functions.BlobFunctions.byteWindowSums(
            expr("substring(payload, 1, 3840)"), 64).as("ws"),
          graft.functions.BlobFunctions.byteWindowSums(col("payload"), 64).as("aws"))
        .filter(size(col("ws")) > 0)
        .withColumn("nwin", size(col("ws")).cast("long"))
        .withColumn("total", expr("aggregate(ws, 0L, (a, x) -> a + x)"))
        .withColumn("bh", expr("aggregate(transform(slice(ws, 1, 60), " +
          "(w, j) -> IF(w * nwin > total, shiftleft(1L, j), 0L)), 0L, (a, x) -> a + x)"))
        .select(col("media_id"), col("bh"),
          size(col("aws")).cast("long").as("n_windows"),
          expr("aggregate(aws, 0L, (a, x) -> a + x)").as("byte_sum"))
        .orderBy("media_id")
    },

    // Multimodal A/V alignment: every video frame as-of-joined to the
    // latest audio window at-or-before its offset on the same track
    // (media_id div 3 pairs each video with its audio sibling in the
    // synthetic layout). Composes the generic AsOfJoin operator — ONE
    // (track, offset) shuffle, no range explosion; the oracle is the
    // argmax inequality join.
    Q("mm_av_align",
      """WITH v AS (SELECT doc_id // 3 AS tid, doc_id AS media_id, (i - 1) * 16 + 1 AS off
        |           FROM documents, unnest(range(1, (greatest(length(text) - 31, 1) + 15) // 16 + 1)) AS u(i)
        |           WHERE doc_id % 3 = 2),
        |a AS (SELECT doc_id // 3 AS tid, (j - 1) * 64 + 1 AS aoff
        |      FROM documents, unnest(range(1, (greatest(length(text) - 31, 1) + 63) // 64 + 1)) AS u(j)
        |      WHERE doc_id % 3 = 1)
        |SELECT v.media_id, v.off AS frame_off,
        |       max(a.aoff) AS audio_off,
        |       v.off - max(a.aoff) AS lag_bytes
        |FROM v LEFT JOIN a ON a.tid = v.tid AND a.aoff <= v.off
        |GROUP BY v.tid, v.media_id, v.off
        |ORDER BY media_id, frame_off LIMIT 1000""".stripMargin) { (spark, dir) =>
      val media = Multimodal.asMediaTable(table(spark, dir, "documents"))
      val v = Multimodal.sampleFrames(media.filter(col("media_type") === "video"),
          frameBytes = 32, stride = 16)
        .select(expr("media_id div 3").as("tid"), col("media_id"),
          col("byte_offset").as("off"))
      val a = Multimodal.sampleFrames(media.filter(col("media_type") === "audio"),
          frameBytes = 32, stride = 64)
        .select(expr("media_id div 3").as("tid"), col("byte_offset").as("aoff"))
      graft.operators.AsOfJoin.join(v, a, "tid", "off", "aoff", Seq("aoff"))
        .select(col("media_id"), col("off").as("frame_off"),
          col("asof_aoff").as("audio_off"),
          (col("off") - col("asof_aoff")).as("lag_bytes"))
        .orderBy("media_id", "frame_off")
        .limit(1000)
    },

    // Multimodal resize metadata math (codec-free part of the resize op).
    Q("mm_resize_meta",
      """SELECT doc_id AS media_id,
        |       ((doc_id % 640) + 1)::INT AS meta_width,
        |       ((doc_id % 480) + 1)::INT AS meta_height,
        |       CAST(ceil(((doc_id % 640) + 1) * least(256.0 / ((doc_id % 640) + 1), 256.0 / ((doc_id % 480) + 1), 1.0)) AS INT) AS resized_width,
        |       CAST(ceil(((doc_id % 480) + 1) * least(256.0 / ((doc_id % 640) + 1), 256.0 / ((doc_id % 480) + 1), 1.0)) AS INT) AS resized_height
        |FROM documents ORDER BY media_id LIMIT 1000""".stripMargin) { (spark, dir) =>
      Multimodal.resizeMeta(Multimodal.asMediaTable(table(spark, dir, "documents")), 256)
        .select(col("media_id"), col("meta_width"), col("meta_height"),
          col("resized_width"), col("resized_height"))
        .orderBy("media_id")
        .limit(1000)
    },

    // REAL image decode, oracle-exact: each image-typed doc synthesizes
    // a 24×16 RGB image (pixel bytes from the one-pass ByteWindowSums
    // rule — O(len) per doc, oracle-replayable as windowed sums), PNG-
    // encodes it through javax.imageio, then DECODES the actual PNG
    // bytes back (ImageDecodeStats/ImageAhash) and reports exact
    // integer pixel statistics + an 8×8 average-hash. PNG is lossless,
    // so the DuckDB oracle replays the pixel RULE and the query only
    // matches if the real codec round-trips bit-exactly — the decode
    // path is the thing under test, usable unchanged on any real
    // PNG/JPEG/GIF/BMP column. Scan-local end to end (encode, decode,
    // hash per row; TakeOrdered top-k); the 64-bit ahash ships as two
    // 32-bit halves because a set bit 63 has no portable BIGINT
    // literal. At 100 TB this plan's only data motion is the top-k.
    Q("mm_image_decode", imageDecodeSql) { (spark, dir) =>
      imageDecodeProjected(mediaWsBase(spark, dir, 0))
        .orderBy("media_id")
        .limit(1000)
    },

    // The SAME codec pipeline inside Structured Streaming — what a
    // production media ingest actually runs: decode features extracted
    // per micro-batch as documents arrive, no state (every step is a
    // per-row projection), so the bounded stream run is row-identical
    // to the batch query and shares its exact oracle. At scale the
    // stream shape bounds work to O(batch) per trigger regardless of
    // corpus size.
    Q("stream_image_decode", imageDecodeSql) { (spark, dir) =>
      val staged = StreamingIngest.stageAsDir(s"$dir/documents.parquet")
      val docsStream = spark.readStream
        .schema(StreamingIngest.documentsSchema)
        .parquet(staged)
      StreamingIngest.runToMemory(spark,
        imageDecodeProjected(mediaWsFrom(docsStream, 0)),
        s"stream_imgdec_${System.nanoTime()}")
        .orderBy("media_id")
        .limit(1000)
    },

    // REAL audio container round-trip, oracle-exact: each audio-typed
    // doc synthesizes 400 PCM16 samples (ByteWindowSums rule), writes a
    // genuine mono RIFF/WAVE file (WavEncodePcm16), then PARSES those
    // bytes back with the real chunk walker (WavParse: fmt /data in any
    // order, unknown chunks skipped, even-byte padding honored) and
    // reports the header fields + exact integer signal stats. The
    // oracle replays the sample rule — the query only matches if the
    // header was written AND parsed correctly and every sample
    // round-tripped bit-exactly through little-endian PCM16. The
    // parser is usable unchanged on any real PCM16 WAV payload (the
    // unit spec cross-validates it against javax.sound's own writer).
    Q("mm_wav_meta",
      s"""WITH ${mediaWsCtes(1)},
        |s AS (SELECT media_id, i,
        |        ((ws[(i % len(ws))::INT + 1] * 16 + i) % 65536) - 32768 AS smp
        |      FROM ws, unnest(range(0, 400)) AS u(i))
        |SELECT media_id,
        |       (8000 + (media_id % 8) * 1000)::INT AS sample_rate,
        |       1::INT AS channels,
        |       400::BIGINT AS n_frames,
        |       (400 * 1000000 // (8000 + (media_id % 8) * 1000))::BIGINT AS duration_micro,
        |       sum(smp * smp)::BIGINT AS sum_sq,
        |       max(abs(smp))::INT AS peak
        |FROM s GROUP BY media_id ORDER BY media_id LIMIT 1000""".stripMargin) { (spark, dir) =>
      import graft.functions.MediaFunctions.{wavEncodePcm16, wavParse}
      val base = mediaWsBase(spark, dir, 1)
        .withColumn("rate", (lit(8000) + pmod(col("media_id"), lit(8)) * 1000).cast("int"))
      val samples = transform(sequence(lit(0), lit(399)),
        i => (((element_at(col("ws"), (i % col("m") + 1).cast("int")) * 16 + i) % 65536) - 32768)
          .cast("int"))
      base.withColumn("st", wavParse(wavEncodePcm16(samples, col("rate"))))
        .select(col("media_id"),
          col("st.sample_rate").as("sample_rate"),
          col("st.channels").as("channels"),
          col("st.n_frames").as("n_frames"),
          expr("st.n_frames * 1000000 DIV st.sample_rate").as("duration_micro"),
          col("st.sum_sq").as("sum_sq"),
          col("st.peak").as("peak"))
        .orderBy("media_id")
        .limit(1000)
    },

    // REAL image resize, oracle-exact — retires the "resize is a codec
    // stub" note: the chain is encode(24×16 PNG) → decode →
    // nearest-neighbor resample to 8×6 (ImageResampleRgb — exact
    // integer sampling, unlike Graphics2D's implementation-defined
    // filtering) → RE-encode as PNG → decode THAT and report its exact
    // pixel stats. Four real codec passes; the oracle replays the
    // resample rule over the synthesized pixels, so a match proves the
    // whole decode→resample→re-encode→decode chain is bit-exact.
    // Scan-local; only the top-k moves.
    Q("mm_image_resize",
      s"""WITH ${mediaWsCtes(0)},
        |${mediaPixelCtes(1)},
        |rp AS (SELECT px.media_id, m.p2, px.r, px.g, px.b
        |       FROM px JOIN (SELECT p2::INT AS p2,
        |                            ((((p2 // 8) * 16) // 6) * 24 + (p2 % 8) * 3)::INT AS q
        |                     FROM unnest(range(0, 48)) AS t(p2)) m ON px.p = m.q)
        |SELECT media_id, 8::INT AS width, 6::INT AS height,
        |       (sum(r) * 1000000 // 48)::BIGINT AS mean_r_micro,
        |       (sum(g) * 1000000 // 48)::BIGINT AS mean_g_micro,
        |       (sum(b) * 1000000 // 48)::BIGINT AS mean_b_micro
        |FROM rp GROUP BY media_id ORDER BY media_id LIMIT 1000""".stripMargin) { (spark, dir) =>
      import graft.functions.MediaFunctions.{imageDecodeStats, imageResampleRgb, pngEncodeRgb}
      mediaWsBase(spark, dir, 0)
        .withColumn("payload", mediaFrame(0))
        .withColumn("resized", pngEncodeRgb(imageResampleRgb(col("payload"), 8, 6), 8, 6))
        .select(col("media_id"), imageDecodeStats(col("resized")).as("st"))
        .select(col("media_id"),
          col("st.width").as("width"), col("st.height").as("height"),
          expr("st.sum_r * 1000000 DIV 48").as("mean_r_micro"),
          expr("st.sum_g * 1000000 DIV 48").as("mean_g_micro"),
          expr("st.sum_b * 1000000 DIV 48").as("mean_b_micro"))
        .orderBy("media_id")
        .limit(1000)
    },

    // REAL video-shaped decode, oracle-exact — completes the media
    // triple (image %3=0, audio %3=1, video %3=2): each video-typed doc
    // packs 4 per-frame PNGs into a length-prefixed binary container
    // (the generic [4-byte BE length][record]… pack), then the query
    // UNPACKS the container (LenPrefixedSlices — one O(len) walk that
    // nulls on corruption instead of silently truncating), decodes
    // every frame through the real codec, and reports per-frame exact
    // pixel stats + the 8×8 average-hash (the per-frame signature a
    // frame-dedup pass keys on). The oracle replays the per-frame pixel
    // rule — a match requires the container walk AND all four codec
    // round-trips to be bit-exact. All scan-local; only the top-k rows
    // move. The 4-frame pack is built once per row (non-cheap alias —
    // CollapseProject keeps it out of the consumers, same discipline as
    // text_fingerprint's hoist).
    Q("mm_video_frame_decode",
      s"""WITH ${mediaWsCtes(2)},
        |${mediaPixelCtes(4)}
        |SELECT st.media_id AS media_id, st.f AS frame_idx, 24::INT AS width, 16::INT AS height,
        |       (sr * 1000000 // 384)::BIGINT AS mean_r_micro,
        |       (sg * 1000000 // 384)::BIGINT AS mean_g_micro,
        |       (sb * 1000000 // 384)::BIGINT AS mean_b_micro,
        |       bits.ahash_hi, bits.ahash_lo
        |FROM st JOIN bits ON bits.media_id = st.media_id AND bits.f = st.f
        |ORDER BY st.media_id, st.f LIMIT 1000""".stripMargin) { (spark, dir) =>
      import graft.functions.MediaFunctions.{imageDecodeStats, lenPrefixedSlices}
      val packed = mediaWsBase(spark, dir, 2)
        .withColumn("fr", array((0 until 4).map(mediaFrame): _*))
        .withColumn("payload",
          aggregate(col("fr"), lit(Array.emptyByteArray),
            (acc, x) => concat(acc, unhex(lpad(hex(length(x)), 8, "0")), x)))
      packed
        .select(col("media_id"), posexplode(lenPrefixedSlices(col("payload"))))
        .select(col("media_id"), col("pos").cast("int").as("frame_idx"),
          imageDecodeStats(col("col")).as("st"))
        .select(col("media_id"), col("frame_idx"),
          col("st.width").as("width"), col("st.height").as("height"),
          expr("st.sum_r * 1000000 DIV 384").as("mean_r_micro"),
          expr("st.sum_g * 1000000 DIV 384").as("mean_g_micro"),
          expr("st.sum_b * 1000000 DIV 384").as("mean_b_micro"),
          shiftrightunsigned(col("st.ahash"), 32).as("ahash_hi"),
          col("st.ahash").bitwiseAND(lit(0xffffffffL)).as("ahash_lo"))
        .orderBy("media_id", "frame_idx")
        .limit(1000)
    }
  )
}
