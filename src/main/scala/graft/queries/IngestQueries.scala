package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.embed.{Embedder, HashNgramEmbedder}
import graft.functions.F
import graft.ingest.TextChunker

/** Ingestion / document-structure operators of SURVEY §2 (B-family) + the
  * embedding boundary (C1), expressed over the `documents` corpus.
  *
  * The layout-aware phases (B2–B8) are pure per-document functions exercised
  * by unit tests ([[graft.ingest.Chunker]]); here we register the operators
  * whose semantics are corpus-level (and hence distributed): the B1
  * frequency pre-pass, identity hashing, filters, and the section
  * aggregation that feeds summarization.
  */
object IngestQueries {

  /** The hash-ngram embedder replayed coordinate by coordinate in DuckDB
    * over the %37 doc stripe — tokenization, per-occurrence word +
    * char-trigram features, the seeded md5 coordinate hash (top 8 bytes
    * big-endian, h>>>1 mod dim, sign from the low bit), signed
    * accumulation, and the exact L2 normalization op sequence (1/sqrt then
    * multiply, stored as float32). Shared by c1_embed_hash_coords (the
    * hermetic stand-in) and c1_embed_docs (the same values through the
    * loopback HTTP transport). `dense`/`nrm` expose (doc_id, idx, cnt, n2);
    * `val` is the float32-rounded coordinate. */
  private val HashCoordsCtes: String =
    """WITH d AS (SELECT doc_id, coalesce(text, '') AS text
      |           FROM documents WHERE doc_id % 37 = 5),
      |tk AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok FROM d),
      |feat AS (SELECT doc_id, 'w:' || tok AS f FROM tk
      |         UNION ALL
      |         SELECT doc_id, 'c:' || substr(tok, i::INT + 1, 3) AS f
      |         FROM tk, unnest(range(greatest(length(tok) - 2, 0))) AS u(i)
      |         WHERE length(tok) >= 3),
      |h AS (SELECT doc_id, ('0x' || substr(md5('42:' || f), 1, 16))::UBIGINT AS hu FROM feat),
      |cs AS (SELECT doc_id, ((hu // 2) % 64)::BIGINT AS idx,
      |              sum(CASE WHEN hu % 2 = 0 THEN 1 ELSE -1 END)::BIGINT AS cnt
      |       FROM h GROUP BY doc_id, idx),
      |dense AS (SELECT d.doc_id, t.i AS idx, coalesce(cs.cnt, 0) AS cnt
      |          FROM d CROSS JOIN range(64) t(i)
      |          LEFT JOIN cs ON cs.doc_id = d.doc_id AND cs.idx = t.i),
      |nrm AS (SELECT doc_id, sum(cnt * cnt)::BIGINT AS n2 FROM dense GROUP BY doc_id),
      |coord AS (SELECT dense.doc_id, dense.idx::BIGINT AS idx,
      |            (CASE WHEN nrm.n2 = 0 THEN 0.0
      |             ELSE (dense.cnt::DOUBLE * (1.0 / sqrt(nrm.n2::DOUBLE)))::REAL::DOUBLE
      |             END) AS val
      |          FROM dense JOIN nrm USING (doc_id))""".stripMargin

  /** c1_embed_docs' oracle: the same coordinate-exact replay, with each
    * doc's provider pinned by the %3 stripe split the Spark side uses. */
  private val C1HttpOracleSql: String = HashCoordsCtes + """
    |SELECT doc_id,
    |       CASE doc_id % 3 WHEN 0 THEN 'gemini' WHEN 1 THEN 'ollama'
    |            ELSE 'openai' END AS provider,
    |       idx, floor(val * 1000000)::BIGINT AS val_micro
    |FROM coord
    |ORDER BY doc_id, idx""".stripMargin

  /** DuckDB replay of B2–B6 over corpus-synthesized glyphs — every phase
    * of the layout pipeline in window SQL (see the registration comment
    * on `b2_b6_line_assembly`). The chain (shared with the B7 breadcrumb
    * oracle) ends at bk (clean lines + block ids) and bl (per-page
    * baseline). */
  private val B2B6ChainSql: String =
    """src AS (
      |  SELECT source,
      |         substr(regexp_replace(coalesce(text, ''), '[^ -~]', '', 'g'), 1, 160) AS clean,
      |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS pi
      |  FROM documents WHERE doc_id % 7 = 0),
      |bodyg AS (
      |  SELECT s.source, s.pi, substr(s.clean, t.n + 1, 1) AS ch,
      |         t.n // 40 AS rw, t.n % 40 AS cl, t.n AS i
      |  FROM src s CROSS JOIN range(160) t(n)
      |  WHERE t.n < length(s.clean) AND substr(s.clean, t.n + 1, 1) > ' '),
      |g1 AS (
      |  SELECT source, pi, ch,
      |         CASE WHEN pi % 3 = 0 THEN
      |           CASE WHEN cl < 20 THEN 60.0 + cl * 6 ELSE 320.0 + (cl - 20) * 6 END
      |         ELSE 72.0 + cl * 6 END AS gl,
      |         CASE WHEN pi % 3 = 0 AND cl >= 20
      |              THEN 593.0 - (rw * 14 + CASE WHEN rw >= 2 THEN 30 ELSE 0 END)
      |              ELSE 600.0 - (rw * 14 + CASE WHEN rw >= 2 THEN 30 ELSE 0 END)
      |                   + ((i % 3) - 1) * 1.5 END AS gt,
      |         10.0 + ((rw + pi) % 3) * 4 AS sz,
      |         CASE WHEN rw = 0 THEN 700 ELSE 400 END AS wt
      |  FROM bodyg),
      |foot AS (
      |  SELECT s.source, s.pi, substr('Confidential Report', t.n + 1, 1) AS ch,
      |         72.0 + t.n * 6 AS gl, 40.0 AS gt, 8.0 AS sz, 400 AS wt
      |  FROM src s CROSS JOIN range(19) t(n)
      |  WHERE substr('Confidential Report', t.n + 1, 1) > ' '),
      |pnum AS (
      |  SELECT s.source, s.pi, substr(s.pi::VARCHAR, t.n + 1, 1) AS ch,
      |         500.0 + t.n * 6 AS gl, 20.0 AS gt, 8.0 AS sz, 400 AS wt
      |  FROM src s CROSS JOIN range(4) t(n)
      |  WHERE t.n < length(s.pi::VARCHAR)),
      |hdg AS (
      |  SELECT s.source, s.pi,
      |         CASE WHEN s.pi % 7 = 1 THEN 'Chapter ' || s.pi || ' intro'
      |              WHEN s.pi % 7 = 3 THEN s.pi || '.2 methods'
      |              WHEN s.pi % 7 = 5 THEN s.pi || '.2.1 details'
      |              WHEN s.pi % 7 = 2 THEN 'notes and errata'
      |              ELSE '' END AS ht
      |  FROM src s),
      |hg AS (
      |  SELECT source, pi, substr(ht, t.n + 1, 1) AS ch,
      |         60.0 + t.n * 6 AS gl, 640.0 AS gt, 20.0 AS sz, 700 AS wt
      |  FROM hdg CROSS JOIN range(20) t(n)
      |  WHERE t.n < length(ht) AND substr(ht, t.n + 1, 1) > ' '),
      |g AS (SELECT source, pi, ch, gl, gt, gl + 6 AS gr, gt - 10 AS gb, sz, wt FROM g1
      |      UNION ALL SELECT source, pi, ch, gl, gt, gl + 6, gt - 10, sz, wt FROM foot
      |      UNION ALL SELECT source, pi, ch, gl, gt, gl + 6, gt - 10, sz, wt FROM pnum
      |      UNION ALL SELECT source, pi, ch, gl, gt, gl + 6, gt - 10, sz, wt FROM hg),
      |o AS (SELECT *, lag(gt) OVER (PARTITION BY source, pi ORDER BY gt DESC, gl) AS ptop FROM g),
      |clus AS (SELECT *, sum(CASE WHEN ptop IS NULL OR ptop - gt > 5.0 THEN 1 ELSE 0 END)
      |                OVER (PARTITION BY source, pi ORDER BY gt DESC, gl
      |                      ROWS UNBOUNDED PRECEDING) AS rid FROM o),
      |w AS (SELECT *, max(gr) OVER (PARTITION BY source, pi, rid ORDER BY gl
      |                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_r
      |      FROM clus),
      |ln AS (SELECT source, pi, rid,
      |              string_agg(CASE WHEN prev_r IS NOT NULL AND gl - prev_r > 4.0
      |                              THEN ' ' || ch ELSE ch END, '' ORDER BY gl) AS text,
      |              min(gl) AS x_left, max(gr) AS x_right,
      |              760 - max(gt) AS line_top, 760 - min(gb) AS line_bottom,
      |              avg(sz) AS font_size,
      |              round(avg(wt))::BIGINT AS font_weight
      |       FROM w GROUP BY source, pi, rid),
      |frq AS (SELECT source, norm, count(DISTINCT pi) AS freq FROM (
      |          SELECT source, pi, trim(regexp_replace(lower(text), '[0-9]+', '', 'g')) AS norm
      |          FROM ln) WHERE norm <> '' GROUP BY source, norm),
      |pg AS (SELECT source, pi,
      |              count(*) FILTER (WHERE x_left < 300.0 AND x_right > 300.0) AS crossing,
      |              count(*) FILTER (WHERE x_right <= 300.0) AS nleft,
      |              count(*) FILTER (WHERE x_left >= 300.0) AS nright
      |       FROM ln GROUP BY source, pi),
      |ord0 AS (SELECT l.*, trim(regexp_replace(lower(l.text), '[0-9]+', '', 'g')) AS norm,
      |                (p.crossing = 0 AND p.nleft > 0 AND p.nright > 0) AS twocol,
      |                CASE WHEN p.crossing = 0 AND p.nleft > 0 AND p.nright > 0
      |                          AND l.x_left >= 300.0 THEN 1 ELSE 0 END AS colgrp
      |         FROM ln l JOIN pg p USING (source, pi)),
      |fin AS (SELECT *, row_number() OVER (PARTITION BY source, pi
      |              ORDER BY colgrp, line_top, x_left) - 1 AS seq
      |        FROM (SELECT o.*, CASE
      |                WHEN coalesce(f.freq, 0) > 5 AND
      |                     (o.line_top <= 760 * 0.15 OR o.line_bottom >= 760 * (1.0 - 0.15)) THEN 1
      |                WHEN regexp_full_match(trim(o.text), '[0-9]{1,4}') THEN 1
      |                ELSE 0 END AS noise
      |              FROM ord0 o LEFT JOIN frq f ON f.source = o.source AND f.norm = o.norm)
      |        WHERE noise = 0),
      |bk AS (SELECT *, sum(CASE WHEN pbot IS NOT NULL AND line_top - pbot > 15.0
      |                          THEN 1 ELSE 0 END)
      |              OVER (PARTITION BY source, pi ORDER BY seq
      |                    ROWS UNBOUNDED PRECEDING) AS block_idx
      |       FROM (SELECT *, lag(line_bottom) OVER (PARTITION BY source, pi ORDER BY seq) AS pbot
      |             FROM fin)),
      |bl AS (SELECT source, pi, szr AS baseline FROM (
      |        SELECT source, pi, round(font_size)::BIGINT AS szr,
      |               row_number() OVER (PARTITION BY source, pi
      |                 ORDER BY count(*) DESC, round(font_size)::BIGINT ASC) AS rn
      |        FROM fin GROUP BY source, pi, round(font_size)::BIGINT) WHERE rn = 1)""".stripMargin

  private val B2B6OracleSql: String =
    s"""WITH $B2B6ChainSql
      |SELECT k.source, k.pi::BIGINT AS page_num, k.seq::BIGINT AS seq, k.text,
      |       k.x_left, k.line_top, k.x_right, k.line_bottom, k.font_size,
      |       k.font_weight, k.block_idx::BIGINT AS block_idx, bl.baseline,
      |       (CASE WHEN k.twocol THEN 1 ELSE 0 END)::BIGINT AS two_col
      |FROM bk k JOIN bl USING (source, pi)
      |ORDER BY source, page_num, seq""".stripMargin

  /** DuckDB replay of B7 — heading detection (the three numbering
    * regexes + the short-block layout heuristics against B6's baseline)
    * and the Chapter > Section > Subsection breadcrumb fold, expressed
    * as windows instead of a recursive CTE: the tracker's reset rule
    * ("a level-n heading clears deeper levels") is exactly "part k is
    * the latest level-k heading iff it came AFTER every shallower
    * level's latest heading", so three running-max positions + title
    * joins replay the fold closed-form. */
  private val B7OracleSql: String =
    s"""WITH $B2B6ChainSql,
      |blk AS (SELECT k.source, k.pi, k.block_idx,
      |               string_agg(k.text, ' ' ORDER BY k.seq) AS btext,
      |               count(*) AS n_lines, avg(k.font_size) AS afs,
      |               avg(k.font_weight) AS aw
      |        FROM bk k GROUP BY k.source, k.pi, k.block_idx),
      |hd AS (SELECT blk.*, trim(btext) AS title,
      |         CASE WHEN trim(btext) = '' THEN NULL
      |              WHEN regexp_full_match(trim(btext), '(Chapter|CHAPTER|PART|Part)\\s+\\d+.*') THEN 1
      |              WHEN regexp_full_match(trim(btext), '\\d+\\.\\d+\\.\\d+\\s+.*') THEN 3
      |              WHEN regexp_full_match(trim(btext), '\\d+\\.\\d+\\s+.*') THEN 2
      |              WHEN n_lines <= 3 AND length(trim(btext)) <= 120
      |                   AND afs >= bl.baseline + 6 THEN 1
      |              WHEN n_lines <= 3 AND length(trim(btext)) <= 120
      |                   AND (afs >= bl.baseline + 3 OR aw > 600) THEN 2
      |              ELSE NULL END AS lvl
      |       FROM blk JOIN bl USING (source, pi)),
      |pos AS (SELECT *, row_number() OVER (PARTITION BY source
      |               ORDER BY pi, block_idx) AS pos
      |        FROM hd),
      |stt AS (SELECT *,
      |          max(CASE WHEN lvl = 1 THEN pos END) OVER wf AS p1,
      |          max(CASE WHEN lvl = 2 THEN pos END) OVER wf AS p2,
      |          max(CASE WHEN lvl = 3 THEN pos END) OVER wf AS p3
      |        FROM pos
      |        WINDOW wf AS (PARTITION BY source ORDER BY pos
      |                      ROWS UNBOUNDED PRECEDING)),
      |crumbs AS (SELECT s.source, s.pi, s.block_idx, s.lvl,
      |             t1.title AS part1,
      |             CASE WHEN s.p2 > coalesce(s.p1, 0) THEN t2.title END AS part2,
      |             CASE WHEN s.p3 > coalesce(s.p1, 0) AND s.p3 > coalesce(s.p2, 0)
      |                  THEN t3.title END AS part3
      |           FROM stt s
      |           LEFT JOIN pos t1 ON t1.source = s.source AND t1.pos = s.p1
      |           LEFT JOIN pos t2 ON t2.source = s.source AND t2.pos = s.p2
      |           LEFT JOIN pos t3 ON t3.source = s.source AND t3.pos = s.p3)
      |SELECT source, pi::BIGINT AS page_num, block_idx::BIGINT AS block_idx,
      |       coalesce(lvl, 0)::BIGINT AS heading_level,
      |       concat_ws(' > ', part1, part2, part3) AS path,
      |       (CASE WHEN part3 IS NOT NULL THEN 3 WHEN part2 IS NOT NULL THEN 2
      |             WHEN part1 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS crumb_level
      |FROM crumbs
      |ORDER BY source, page_num, block_idx""".stripMargin

  /** The sampled corpus slice the layout fixtures build from — modulus
    * CO-PRIME to the corpus's source assignment (doc_id % 20): % 5 would
    * silently restrict the sample to 4 sources at 25 pages each, pinning
    * the footer-frequency branch permanently above the > 5 threshold. */
  private def layoutDocs(spark: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[(String, Seq[(Long, String)])] = {
    import spark.implicits._
    table(spark, dir, "documents")
      .filter(col("doc_id") % 7 === 0)
      .groupBy("source")
      .agg(collect_list(struct(col("doc_id"), col("text"))).as("docs"))
      .as[(String, Seq[(Long, String)])]
  }

  /** Per-page heading text for the synthetic layout fixture: three
    * regex-pattern levels (chapter / section / subsection) plus ONE
    * layout-only heading whose detected level depends on the page's B6
    * baseline (size 20 vs mode 10/14/18 → level 1 where baseline ≤ 14,
    * level 2 via the 700 weight where baseline = 18) — so B7's layout
    * heuristics are exercised against B6's output, not just the regexes. */
  private def layoutHeadingText(pi: Int): String =
    if (pi % 7 == 1) s"Chapter $pi intro"
    else if (pi % 7 == 3) s"$pi.2 methods"
    else if (pi % 7 == 5) s"$pi.2.1 details"
    else if (pi % 7 == 2) "notes and errata"
    else ""

  /** The deterministic glyph fixture shared by b2_b6_line_assembly and
    * b7_heading_breadcrumbs (see the registration comment on the former
    * for the full layout contract; [[B2B6ChainSql]] is its DuckDB twin).
    * Pages are built through the REAL CharPdfExtractor.assembleLines
    * fold. */
  private def syntheticLayoutPages(ds: Seq[(Long, String)])
      : Seq[graft.ingest.LayoutChunker.Page] = {
    import graft.ingest.{CharPdfExtractor, LayoutChunker}
    val ex = CharPdfExtractor()
    ds.sortBy(_._1).zipWithIndex.map { case ((_, text0), pi0) =>
      val pi = pi0 + 1
      val clean = (if (text0 == null) "" else text0)
        .replaceAll("[^ -~]", "").take(160)
      val twocol = pi % 3 == 0
      val body = clean.zipWithIndex.collect { case (ch, i) if ch > ' ' =>
        val row = i / 40; val c = i % 40
        val left =
          if (twocol) { if (c < 20) 60.0 + c * 6 else 320.0 + (c - 20) * 6 }
          else 72.0 + c * 6
        // rows >= 2 drop an extra 30 pt — a > 15 pt vertical gap, so
        // B5's block fold splits on every page with >= 3 body rows
        val rowDrop = row * 14 + (if (row >= 2) 30 else 0)
        val top =
          if (twocol && c >= 20) 593.0 - rowDrop
          else 600.0 - rowDrop + ((i % 3) - 1) * 1.5
        (ch, left, top, left + 6, top - 10,
          10.0 + ((row + pi) % 3) * 4, // page-varying sizes → B6's mode varies
          if (row == 0) 700 else 400)
      }.toSeq
      // the heading row sits at 640 pt — outside the 15% margins (the
      // repeated-noise rule must never eat it), a 38.5 pt row gap above
      // the body (own line) and a 28.5 pt block gap (own B5 block);
      // ≤ 20 chars keeps it inside the left half on two-column pages
      val heading = layoutHeadingText(pi).zipWithIndex.collect {
        case (ch, i) if ch > ' ' =>
          (ch, 60.0 + i * 6, 640.0, 66.0 + i * 6, 630.0, 20.0, 700)
      }.toSeq
      val footer = "Confidential Report".zipWithIndex.collect {
        case (ch, i) if ch > ' ' =>
          (ch, 72.0 + i * 6, 40.0, 78.0 + i * 6, 30.0, 8.0, 400)
      }.toSeq
      val pageNum = pi.toString.zipWithIndex.map { case (ch, i) =>
        (ch, 500.0 + i * 6, 20.0, 506.0 + i * 6, 10.0, 8.0, 400)
      }
      LayoutChunker.Page(pi, 600, 760,
        ex.assembleGlyphs(heading ++ body ++ footer ++ pageNum, 760))
    }
  }

  val all: Seq[Q] = Seq(

    // A1 — real PDF ingest, end to end: the deterministic sample PDF
    // (valid xref, Courier metrics, one Flate-compressed page) is written
    // to a temp dir, scanned via binaryFile, per-char extracted
    // (CharPdfExtractor) and layout-chunked (B1–B9). Graduated in round 11
    // via the d15/q_approx_distinct precedent: DuckDB cannot parse PDF
    // bytes, but the fixture output is fully deterministic, so a
    // constant-expectation oracle pins the ENTIRE byte→chunk pipeline
    // (both font paths: Courier widths and the Type3 /Differences
    // glyph-name decode) on the driver gate — doc ids are md5(name +
    // "_" + bytes.length), so even the fixture byte LENGTHS are pinned.
    Q("a1_pdf_ingest",
      """WITH pages(p, h) AS (VALUES
        |    (1, '1 Introduction'), (2, '2 Methods'), (3, '3 Results'),
        |    (4, '4 Discussion'), (5, '5 Evaluation'), (6, '6 Related Work'),
        |    (7, '7 Conclusion')),
        |  files(doc_id, source_file) AS (VALUES
        |    ('09b9588a0ccf1aebda011dfa08d65560', 'sample.pdf'),
        |    ('6bec3238c0ca0a744a178c4f182c7f17', 'type3.pdf'))
        |SELECT f.doc_id, f.source_file, p.p - 1 AS chunk_idx, p.p AS page_num,
        |       'This is body text on page ' || p.p ||
        |       '. It explains the topic in detail. A second line continues the paragraph with more words. kerned gap' AS text_chunk,
        |       p.h AS heading_path, 1 AS heading_level, 'text' AS chunk_type,
        |       4 AS sentence_count, '' AS list_type, 0 AS list_length
        |FROM files f CROSS JOIN pages p
        |ORDER BY f.doc_id, chunk_idx""".stripMargin) { (spark, dir) =>
      val tmp = graft.util.TempRoot.dir("a1-")
      java.nio.file.Files.write(tmp.resolve("sample.pdf"), graft.ingest.PdfSampleDoc.bytes)
      // the Type3 /Differences twin rides along: same text through the
      // glyph-name decode path, so the chunk output doubles exactly
      java.nio.file.Files.write(tmp.resolve("type3.pdf"), graft.ingest.PdfSampleDoc.bytesType3)
      graft.ingest.PdfSource.extractChunks(spark, tmp.toString)
        .orderBy("doc_id", "chunk_idx")
    },

    // A2 — cloud-OCR extraction over the loopback /ocr endpoint: a
    // deterministic 256-byte "scanned" payload (no local text layer)
    // rides the reference's exact generateContent inline_data request
    // (gemini_api.cpp:281-307) and reply parse (:637-648); the server
    // derives the text from the DECODED payload (md5 + length), so this
    // row going green proves the base64 round trip, both JSON shapes,
    // and the OCR-text re-entry into the layout pipeline. Oracle =
    // constant expectation (the a1 route).
    Q("a2_pdf_cloud",
      """SELECT * FROM (VALUES
        |  ('c2cb6c9db4e94d487931f128b8994ecb', 'scan.pdf', 0, 1,
        |   '1 Scan Digest The scanned payload decodes to 256 bytes. Its md5 digest is e2c865db4162bed963bfaa9ef6ac18f0. Every byte survived the base64 round trip. 2 Scan Verification A second page confirms pagination. The extraction prompt and mime type matched the reference shapes.',
        |   '', 0, 'text', 5, '', 0))
        |AS t(doc_id, source_file, chunk_idx, page_num, text_chunk,
        |     heading_path, heading_level, chunk_type, sentence_count,
        |     list_type, list_length)""".stripMargin) { (spark, dir) =>
      val tmp = graft.util.TempRoot.dir("a2-")
      java.nio.file.Files.write(tmp.resolve("scan.pdf"),
        Array.tabulate[Byte](256)(_.toByte))
      graft.ingest.PdfSource.extractChunks(spark, tmp.toString, "*",
        graft.ingest.CloudOcrExtractor(
          graft.ingest.CloudOcr.geminiTransport(
            graft.embed.LoopbackProviderServer.url("/ocr"))))
        .orderBy("doc_id", "chunk_idx")
    },

    // B1 — header/footer frequency pre-pass: normalize a line signature,
    // count corpus-wide, keep the >5-occurrences candidates
    // (pdf_processor.cpp:33-64). Distributed as the classic 2-phase
    // aggregate (map-side partial → merge), not the reference's
    // single-process hash map.
    Q("b1_header_freq",
      """SELECT regexp_extract_all(lower(text), '[a-z0-9]+')[1] AS sig,
        |       count(*) AS n
        |FROM documents
        |GROUP BY sig HAVING count(*) > 5
        |ORDER BY n DESC, sig LIMIT 100""".stripMargin) { (spark, dir) =>
      table(spark, dir, "documents")
        .select(expr("try_element_at(regexp_extract_all(lower(text), '[a-z0-9]+', 0), 1)").as("sig"))
        .groupBy("sig")
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 5)
        .orderBy(col("n").desc, col("sig"))
        .limit(100)
    },

    // B10 — doc identity: md5(name + "_" + size) (pdf_processor.cpp:409-416).
    Q("b10_doc_identity",
      """SELECT doc_id, md5(source || '_' || n_chars::VARCHAR) AS identity
        |FROM documents ORDER BY doc_id LIMIT 1000""".stripMargin) { (spark, dir) =>
      table(spark, dir, "documents")
        .select(col("doc_id"), md5(concat_ws("_", col("source"), col("n_chars"))).as("identity"))
        .orderBy("doc_id")
        .limit(1000)
    },

    // B11 — tiny-chunk skip: drop trimmed length ≤ 3 before embedding
    // (mainwindow.cpp:742-748).
    Q("b11_tiny_filter",
      """SELECT lang, count(*) AS n
        |FROM documents WHERE length(trim(text)) > 3
        |GROUP BY lang ORDER BY lang""".stripMargin) { (spark, dir) =>
      table(spark, dir, "documents")
        .filter(length(trim(col("text"))) > 3)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang")
    },

    // B12 — section buffer: per-section ordered concatenation feeding the
    // summary phase (mainwindow.cpp:263-267). Output fingerprinted (md5) so
    // the compare stays compact; order inside the group is pinned by doc_id.
    Q("b12_section_concat",
      """SELECT source, md5(string_agg(text, chr(10) ORDER BY doc_id)) AS section_md5, count(*) AS n
        |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (spark, dir) =>
      table(spark, dir, "documents")
        .groupBy("source")
        .agg(
          md5(concat_ws("\n",
            transform(array_sort(collect_list(struct(col("doc_id"), col("text")))),
              x => x.getField("text")))).as("section_md5"),
          count(lit(1)).as("n"))
        .orderBy("source")
    },

    // B9 — chunk accumulator over per-source concatenated text (target 800 /
    // hard max 1500 / overlap 160, pdf_processor.cpp:260-262). Sequential
    // within a document, parallel across documents (flatMap). The oracle
    // replays the fold EXACTLY in a recursive CTE (the d10 greedy-replay
    // discipline, round-7 task 3): state = (pending sentence, accumulator,
    // sentence count, fresh-content flag, next chunk idx); each step either
    // loads the next sentence, consumes a hardMax-sized slice of an
    // oversized one, or appends and emits past the 800 target — including
    // the 160-char tail carry, the >20-char tail rule and the
    // first-chunk-never-dropped exception. The lookbehind sentence split
    // `(?<=[.?!])\s+` (RE2 has no lookbehind) is mirrored as
    // regexp_replace('([.?!])\s+' → '\1' + \x01) + split, which consumes
    // the same whitespace runs. Documented equivalence bounds: Java's \s
    // includes \x0B (RE2's does not) and String.trim strips all chars
    // ≤ 0x20 (the oracle trims space/tab/LF/CR) — exact on this corpus
    // (printable ASCII + standard whitespace, verified), divergent only
    // for vertical-tab/control-char payloads.
    Q("b9_chunk_docs", B9OracleSql.sql) { (spark, dir) =>
      import spark.implicits._
      val sections = table(spark, dir, "documents")
        .groupBy("source")
        .agg(concat_ws(". ",
          transform(array_sort(collect_list(struct(col("doc_id"), col("text")))),
            x => x.getField("text"))).as("text"))
        .as[(String, String)]
      sections.flatMap { case (source, text) =>
        TextChunker.chunk(text).map(c =>
          (source, c.chunkIdx.toLong, c.text.length.toLong, c.sentenceCount.toLong))
      }.toDF("source", "chunk_idx", "chunk_len", "sentence_count")
        .orderBy("source", "chunk_idx")
    },

    // B2–B6 — ORACLE-GREEN line assembly + column reorder + noise filter +
    // block reassembly + baseline font (round-9 task 4; the round-8 verdict
    // asked for exactly this graduation; PDFium anchor
    // pdf_processor.cpp:97-151,168-201). Both engines synthesize the SAME
    // positioned glyphs from the documents corpus (40-col/14pt grid, ±1.5pt
    // top jitter inside the 5pt row tolerance, spaces DROPPED so the 4pt
    // space-gap inference must re-infer them, every 3rd page two-column
    // with a 7pt cross-column row offset, a repeated footer line and a
    // bare-page-number line); the Spark side then runs the REAL
    // CharPdfExtractor.assembleLines fold + LayoutChunker.reorderColumns /
    // isNoise / assembleBlocks / baselineFontSize, while the oracle
    // replays every phase in window SQL: gap-clustered rows (5pt), running
    // max-right space inference (4pt), char-averaged font metrics, the
    // midline crossing test, the page-frequency noise join (footer freq
    // flips the >5 threshold between sf0.01 and sf0.1 — both branches are
    // exercised), the 15pt block gap fold, and the count-desc/size-asc
    // font mode. All coordinates are binary-exact doubles, so the hash
    // compare is bit-exact.
    Q("b2_b6_line_assembly", B2B6OracleSql) { (spark, dir) =>
      import spark.implicits._
      import graft.ingest.LayoutChunker
      layoutDocs(spark, dir).flatMap { case (source, ds) =>
        val pages = syntheticLayoutPages(ds)
        val freq = LayoutChunker.headerFooterFrequency(pages)
        pages.flatMap { page =>
          val mid = page.width / 2.0
          val leftCol = page.lines.filter(_.right <= mid)
          val rightCol = page.lines.filter(_.left >= mid)
          val twoColDetected =
            page.lines.size - leftCol.size - rightCol.size == 0 &&
              leftCol.nonEmpty && rightCol.nonEmpty
          val ordered = LayoutChunker.reorderColumns(page)
          val cleanLines = ordered.filterNot(l => LayoutChunker.isNoise(l, page, freq))
          val blocks = LayoutChunker.assembleBlocks(cleanLines, page.pageNum)
          val baseline = LayoutChunker.baselineFontSize(blocks)
          blocks.zipWithIndex
            .flatMap { case (b, bi) => b.lines.map(l => (l, bi)) }
            .zipWithIndex.map { case ((l, bi), seq) =>
              (source, page.pageNum.toLong, seq.toLong, l.text,
                l.left, l.top, l.right, l.bottom, l.fontSize,
                l.fontWeight.toLong, bi.toLong, baseline.toLong,
                if (twoColDetected) 1L else 0L)
            }
        }
      }.toDF("source", "page_num", "seq", "text", "x_left", "line_top",
          "x_right", "line_bottom", "font_size", "font_weight", "block_idx",
          "baseline", "two_col")
        .orderBy("source", "page_num", "seq")
    },

    // B7 — ORACLE-GREEN heading detection + breadcrumb fold (the optional
    // half of round-9 task 4; anchor pdf_processor.cpp:253-296). Runs the
    // REAL LayoutChunker.detectHeading + BreadcrumbTracker over the same
    // glyph fixture as b2_b6_line_assembly — which now carries one
    // heading row per pattern page: chapter/section/subsection regex
    // levels plus a LAYOUT-ONLY heading whose level flips with the page's
    // B6 baseline (level 1 where baseline ≤ 14 via size, level 2 where
    // baseline = 18 via the bold rule), so the font heuristics are pinned
    // against B6's output. The oracle replays the stateful tracker
    // closed-form: part k of the breadcrumb is the latest level-k heading
    // iff it came after every shallower level's latest heading.
    Q("b7_heading_breadcrumbs", B7OracleSql) { (spark, dir) =>
      import spark.implicits._
      import graft.ingest.LayoutChunker
      layoutDocs(spark, dir).flatMap { case (source, ds) =>
        val pages = syntheticLayoutPages(ds)
        val freq = LayoutChunker.headerFooterFrequency(pages)
        val crumbs = new LayoutChunker.BreadcrumbTracker
        val out = Seq.newBuilder[(String, Long, Long, Long, String, Long)]
        pages.foreach { page =>
          val ordered = LayoutChunker.reorderColumns(page)
          val cleanLines = ordered.filterNot(l => LayoutChunker.isNoise(l, page, freq))
          val blocks = LayoutChunker.assembleBlocks(cleanLines, page.pageNum)
          val baseline = LayoutChunker.baselineFontSize(blocks)
          blocks.zipWithIndex.foreach { case (b, bi) =>
            val h = LayoutChunker.detectHeading(b, baseline)
            h.foreach(crumbs.update)
            out += ((source, page.pageNum.toLong, bi.toLong,
              h.map(_.level.toLong).getOrElse(0L), crumbs.path, crumbs.level.toLong))
          }
        }
        out.result()
      }.toDF("source", "page_num", "block_idx", "heading_level", "path", "crumb_level")
        .orderBy("source", "page_num", "block_idx")
    },

    // B2–B8 — the FULL layout-aware chunking pipeline, ORACLE-GREEN
    // (round 9; previously the last rows-only layout row): synthetic page
    // models built deterministically from the corpus (each source = one
    // document, each doc = one page, lines at 14pt pitch, a chapter
    // heading every 5th page), run through the REAL chunkDocument — B1
    // frequency noise, block reassembly, baseline font, B7 heading +
    // breadcrumb state, B8 classification, prose accumulation and the
    // TextChunker fold — while B2B8OracleSql replays every phase in SQL
    // (the B9 recursive CTE re-keyed per prose run; see the object's
    // Scaladoc). The heading-noise branch flips between SFs: at sf0.01
    // each source has 5 chapter pages (freq = 5, kept), at sf0.1 fifty
    // (freq > 5 + top margin, dropped — breadcrumbs go empty and prose
    // runs span whole sources), and both states hash-match.
    Q("b2_b8_layout_chunk", B2B8OracleSql.sql) { (spark, dir) =>
      import spark.implicits._
      import graft.ingest.LayoutChunker
      val docs = table(spark, dir, "documents")
        .groupBy("source")
        .agg(collect_list(struct(col("doc_id"), col("text"))).as("docs"))
        .as[(String, Seq[(Long, String)])]
      docs.flatMap { case (source, ds) =>
        val pages = ds.sortBy(_._1).zipWithIndex.map { case ((docId, text), pi) =>
          // one chapter heading every 5 pages (a heading repeated on every
          // page would be — correctly — dropped by the B4 noise filter)
          val heading =
            if (pi % 5 == 0)
              Seq(LayoutChunker.Line(s"Chapter ${pi / 5 + 1} $source", 50, 40, 350, 60, 20, 700))
            else Seq.empty
          val body = (if (text == null) "" else text).grouped(80).zipWithIndex.map { case (seg, i) =>
            LayoutChunker.Line(seg, 50, 100 + i * 14.0, 550, 112 + i * 14.0, 12, 400)
          }.toSeq
          LayoutChunker.Page(pi + 1, 600, 2000, heading ++ body)
        }
        LayoutChunker.chunkDocument(pages).zipWithIndex.map { case (c, i) =>
          (source, i.toLong, c.pageNum.toLong, c.headingPath, c.headingLevel.toLong,
            c.chunkType, c.text.length.toLong, c.sentenceCount.toLong)
        }
      }.toDF("source", "chunk_idx", "page_num", "heading_path", "heading_level",
          "chunk_type", "chunk_len", "sentence_count")
        .orderBy("source", "chunk_idx")
    },

    // C1 — the embedding boundary through the REAL HTTP transport,
    // ORACLE-GREEN since round 11: the %37 doc stripe is split across the
    // three provider formats (gemini / ollama / openai-style,
    // gemini_api.cpp:238-273 request shapes, :570-623 reply shapes); each
    // sub-stripe embeds via HttpEmbedder against the in-process loopback
    // server, which computes the deterministic hash-ngram embedding
    // SERVER-side and replies in that provider's response shape — so
    // request serialization, the socket hop, and all three reply parsers
    // are on the hashed path, and the oracle is the same coordinate-exact
    // hash-ngram replay as c1_embed_hash_coords (floats survive the hop
    // bit-exact: Float.toString is the shortest round-tripping decimal).
    Q("c1_embed_docs", C1HttpOracleSql) { (spark, dir) =>
      import graft.embed.{HttpEmbedder, LoopbackProviderServer, LoopbackTransport, ProviderFormats}
      val transport = LoopbackTransport(LoopbackProviderServer.url("/embed"))
      val docs = table(spark, dir, "documents").filter(col("doc_id") % 37 === 5)
      Seq((ProviderFormats.Gemini, 0), (ProviderFormats.Ollama, 1),
          (ProviderFormats.OpenAiStyle, 2)).map { case (p, m) =>
        val emb = HttpEmbedder(p, "loopback-hash-ngram-64", 64, transport)
        Embedder.embedText(docs.filter(col("doc_id") % 3 === m), "text", emb)
          .select(col("doc_id"), lit(p.name).as("provider"), posexplode(col("embedding")))
          .select(col("doc_id"), col("provider"), col("pos").cast("long").as("idx"),
            floor(col("col").cast("double") * 1000000).cast("long").as("val_micro"))
      }.reduce(_ unionByName _).orderBy("doc_id", "idx")
    },

    // C1's hermetic stand-in, ORACLE-GREEN end to end (round 9): the
    // deterministic hash-ngram embedder every downstream green query
    // builds on — tokenization, per-occurrence word + char-trigram
    // features, the seeded md5 coordinate hash (top 8 bytes big-endian,
    // h>>>1 mod dim, sign from the low bit), signed accumulation and the
    // exact L2 normalization op sequence (1/sqrt then multiply, stored
    // as float32) — replayed coordinate by coordinate in DuckDB and
    // micro-floored. Since round 11 the HTTP transport variant
    // (c1_embed_docs above) hashes against the same replay through a real
    // loopback hop; this one pins the contract the hermetic tests and
    // benchmarks actually run on, with no network in the loop.
    Q("c1_embed_hash_coords", HashCoordsCtes + """
        |SELECT doc_id, idx, floor(val * 1000000)::BIGINT AS val_micro
        |FROM coord
        |ORDER BY doc_id, idx""".stripMargin) { (spark, dir) =>
      val docs = table(spark, dir, "documents").filter(col("doc_id") % 37 === 5)
      Embedder.embedText(docs, "text", HashNgramEmbedder(dim = 64))
        .select(col("doc_id"), posexplode(col("embedding")))
        .select(col("doc_id"), col("pos").cast("long").as("idx"),
          floor(col("col").cast("double") * 1000000).cast("long").as("val_micro"))
        .orderBy("doc_id", "idx")
    }
  )
}

/** The b2_b8 FULL-pipeline oracle (round 9): B1-B9 replayed end to end —
  * line synthesis, the header/footer frequency noise pass, gap-fold
  * blocks, baseline font mode, B7 heading detection + the closed-form
  * breadcrumb windows, B8 classification (code score / table / lists /
  * definition / theorem / generic kinds), prose-run delimitation by
  * trigger blocks (headings and non-text emissions), the TextChunker
  * fold re-keyed per prose run through [[B9OracleSql.foldCtes]], and the
  * exact emission interleave (a run's chunks flush BEFORE its trigger's
  * standalone row; breadcrumbs read the state one block earlier so a
  * heading's own update never labels the prose it flushed). */
private object B2B8OracleSql {
  def sql: String =
    """WITH RECURSIVE
    |pg AS (SELECT source, coalesce(text, '') AS text,
    |              row_number() OVER (PARTITION BY source ORDER BY doc_id) AS pi
    |       FROM documents),
    |ln AS (
    |  SELECT source, pi, 'Chapter ' || ((pi - 1) // 5 + 1) || ' ' || source AS ltext,
    |         40.0::DOUBLE AS top, 60.0::DOUBLE AS bot, 20.0::DOUBLE AS fs, 700 AS fw, 0 AS lno
    |  FROM pg WHERE (pi - 1) % 5 = 0
    |  UNION ALL
    |  SELECT source, pi, substr(text, (i * 80 + 1)::INT, 80) AS ltext,
    |         (100.0 + 14 * i)::DOUBLE AS top, (112.0 + 14 * i)::DOUBLE AS bot, 12.0::DOUBLE AS fs, 400 AS fw, (i + 1)::INT AS lno
    |  FROM pg, unnest(range((length(text) + 79) // 80)) AS u(i)),
    |lnn AS (SELECT *, trim(regexp_replace(lower(ltext), '[0-9]+', '', 'g')) AS norm FROM ln),
    |frq AS (SELECT source, norm, count(DISTINCT pi) AS freq
    |        FROM lnn WHERE norm <> '' GROUP BY source, norm),
    |kept AS (SELECT *, row_number() OVER (PARTITION BY source, pi ORDER BY lno) - 1 AS seq
    |         FROM (SELECT l.*,
    |                 CASE WHEN coalesce(f.freq, 0) > 5 AND
    |                           (l.top <= 2000 * 0.15 OR l.bot >= 2000 * (1.0 - 0.15)) THEN 1
    |                      WHEN regexp_full_match(trim(l.ltext), '[0-9]{1,4}') THEN 1
    |                      ELSE 0 END AS noise
    |               FROM lnn l LEFT JOIN frq f ON f.source = l.source AND f.norm = l.norm)
    |         WHERE noise = 0),
    |bk2 AS (SELECT *, sum(CASE WHEN pbot IS NOT NULL AND top - pbot > 15.0 THEN 1 ELSE 0 END)
    |               OVER (PARTITION BY source, pi ORDER BY seq ROWS UNBOUNDED PRECEDING) AS bidx
    |        FROM (SELECT *, lag(bot) OVER (PARTITION BY source, pi ORDER BY seq) AS pbot FROM kept)),
    |bl2 AS (SELECT source, pi, szr AS baseline FROM (
    |         SELECT source, pi, round(fs)::BIGINT AS szr,
    |                row_number() OVER (PARTITION BY source, pi
    |                  ORDER BY count(*) DESC, round(fs)::BIGINT ASC) AS rn
    |         FROM bk2 GROUP BY source, pi, round(fs)::BIGINT) WHERE rn = 1),
    |blk AS (SELECT source, pi, bidx,
    |               string_agg(ltext, ' ' ORDER BY seq) AS btext,
    |               count(*) AS n_lines, avg(fs) AS afs, avg(fw) AS aw,
    |               sum(CASE WHEN ltext LIKE '  %' THEN 1 ELSE 0 END) AS n_indent,
    |               sum(CASE WHEN regexp_full_match(ltext, '\s*[-•*]\s+.*') THEN 1 ELSE 0 END) AS n_bullet,
    |               sum(CASE WHEN regexp_full_match(ltext, '\s*\d+[.)]\s+.*') THEN 1 ELSE 0 END) AS n_numbered
    |        FROM bk2 GROUP BY source, pi, bidx),
    |hd AS (SELECT blk.*, bl2.baseline, trim(btext) AS t,
    |         CASE WHEN trim(btext) = '' THEN NULL
    |              WHEN regexp_full_match(trim(btext), '(Chapter|CHAPTER|PART|Part)\s+\d+.*') THEN 1
    |              WHEN regexp_full_match(trim(btext), '\d+\.\d+\.\d+\s+.*') THEN 3
    |              WHEN regexp_full_match(trim(btext), '\d+\.\d+\s+.*') THEN 2
    |              WHEN n_lines <= 3 AND length(trim(btext)) <= 120 AND afs >= bl2.baseline + 6 THEN 1
    |              WHEN n_lines <= 3 AND length(trim(btext)) <= 120
    |                   AND (afs >= bl2.baseline + 3 OR aw > 600) THEN 2
    |              ELSE NULL END AS hlvl
    |       FROM blk JOIN bl2 USING (source, pi)),
    |typ AS (SELECT *,
    |          (CASE WHEN length(btext) - length(regexp_replace(btext, '[{}()\[\];=<>+*/&|-]', '', 'g')) > 2 * greatest(n_lines, 1) THEN 4 ELSE 0 END +
    |           CASE WHEN regexp_matches(btext, '\b(def|class|return|import|void|int|for|while|function|var|let|const)\b') THEN 3 ELSE 0 END +
    |           CASE WHEN n_indent * 2 >= greatest(n_lines, 1) THEN 3 ELSE 0 END) AS code_score,
    |          length(btext) - length(regexp_replace(btext, '[0-9]', '', 'g')) AS digits,
    |          length(btext) - length(regexp_replace(btext, '\.', '', 'g')) AS periods,
    |          greatest(n_lines, 1) AS nl
    |        FROM hd),
    |cty AS (SELECT *, CASE
    |          WHEN hlvl IS NOT NULL THEN 'heading'
    |          WHEN code_score >= 5 THEN 'code'
    |          WHEN digits > 3 * nl AND periods < nl THEN 'table'
    |          WHEN n_bullet * 2 >= nl AND n_bullet >= 2 THEN 'list'
    |          WHEN n_numbered * 2 >= nl AND n_numbered >= 2 THEN 'list'
    |          WHEN regexp_full_match(t, '(Definition|DEFINITION)[:.\s].*') THEN 'definition'
    |          WHEN regexp_full_match(t, '(Theorem|Lemma|Corollary|Proof|THEOREM)[:.\s].*') THEN 'theorem'
    |          WHEN regexp_full_match(t, '(Definition|Example|Theorem|Summary|Exercise|Corollary|Lemma|Proof)\b.*')
    |               THEN lower(regexp_extract(t, '^[A-Za-z]+'))
    |          ELSE 'text' END AS ctyp
    |        FROM typ),
    |pos AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY pi, bidx) AS pos FROM cty),
    |stt AS (SELECT *,
    |          max(CASE WHEN hlvl = 1 THEN pos END) OVER wf AS p1,
    |          max(CASE WHEN hlvl = 2 THEN pos END) OVER wf AS p2,
    |          max(CASE WHEN hlvl = 3 THEN pos END) OVER wf AS p3
    |        FROM pos WINDOW wf AS (PARTITION BY source ORDER BY pos ROWS UNBOUNDED PRECEDING)),
    |pthv AS (SELECT source, pos,
    |           concat_ws(' > ', part1, part2, part3) AS path,
    |           CASE WHEN part3 IS NOT NULL THEN 3 WHEN part2 IS NOT NULL THEN 2
    |                WHEN part1 IS NOT NULL THEN 1 ELSE 0 END AS plevel
    |         FROM (SELECT s.source, s.pos, t1.t AS part1,
    |                 CASE WHEN s.p2 > coalesce(s.p1, 0) THEN t2.t END AS part2,
    |                 CASE WHEN s.p3 > coalesce(s.p1, 0) AND s.p3 > coalesce(s.p2, 0) THEN t3.t END AS part3
    |               FROM stt s
    |               LEFT JOIN pos t1 ON t1.source = s.source AND t1.pos = s.p1
    |               LEFT JOIN pos t2 ON t2.source = s.source AND t2.pos = s.p2
    |               LEFT JOIN pos t3 ON t3.source = s.source AND t3.pos = s.p3)),
    |trg AS (SELECT source, pos, row_number() OVER (PARTITION BY source ORDER BY pos) AS tno
    |        FROM pos WHERE hlvl IS NOT NULL OR ctyp <> 'text'),
    |maxp AS (SELECT source, max(pos) AS mx FROM pos GROUP BY source),
    |runs0 AS (SELECT *, coalesce(sum(CASE WHEN hlvl IS NOT NULL OR ctyp <> 'text' THEN 1 ELSE 0 END)
    |                 OVER (PARTITION BY source ORDER BY pos
    |                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS rid
    |          FROM pos),
    |run AS (SELECT source, rid, min(pi) AS start_page, string_agg(btext, ' ' ORDER BY pos) AS rtext
    |        FROM runs0 WHERE hlvl IS NULL AND ctyp = 'text' GROUP BY source, rid),
    |rend AS (SELECT r.*, coalesce(tg.pos, mp.mx + 1) AS emit_pos
    |         FROM run r
    |         LEFT JOIN trg tg ON tg.source = r.source AND tg.tno = r.rid + 1
    |         JOIN maxp mp ON mp.source = r.source),
    |sec AS (SELECT source || chr(2) || rid AS source, rtext AS text
    |        FROM rend
    |        WHERE length(trim(rtext, chr(32) || chr(9) || chr(10) || chr(13))) > 3),
    |""".stripMargin + B9OracleSql.foldCtes + """,
    |pemit AS (SELECT r.source, r.rid, r.emit_pos, r.start_page,
    |                 c.chunk_idx, c.chunk_len, c.sentence_count
    |          FROM rend r JOIN chunks c ON c.source = r.source || chr(2) || r.rid),
    |semit AS (SELECT source, pos AS emit_pos, pi, ctyp, length(btext) AS clen,
    |                 greatest(len(list_filter(string_split(regexp_replace(btext, '([.?!])\s+', '\1' || chr(1), 'g'), chr(1)), x -> length(x) > 0)), 1) AS scnt
    |          FROM pos WHERE hlvl IS NULL AND ctyp <> 'text'),
    |emits AS (
    |  SELECT p.source, p.emit_pos, 0 AS kind, p.chunk_idx AS sub, p.start_page AS page_num,
    |         coalesce(v.path, '') AS path, coalesce(v.plevel, 0) AS plevel,
    |         'text' AS ctyp, p.chunk_len AS clen, p.sentence_count AS scnt
    |  FROM pemit p LEFT JOIN pthv v ON v.source = p.source AND v.pos = p.emit_pos - 1
    |  UNION ALL
    |  SELECT s.source, s.emit_pos, 1, 0, s.pi, coalesce(v.path, ''), coalesce(v.plevel, 0),
    |         s.ctyp, s.clen, s.scnt
    |  FROM semit s LEFT JOIN pthv v ON v.source = s.source AND v.pos = s.emit_pos)
    |SELECT source,
    |       row_number() OVER (PARTITION BY source ORDER BY emit_pos, kind, sub) - 1 AS chunk_idx,
    |       page_num::BIGINT AS page_num, path AS heading_path, plevel::BIGINT AS heading_level,
    |       ctyp AS chunk_type, clen::BIGINT AS chunk_len, scnt::BIGINT AS sentence_count
    |FROM emits ORDER BY source, chunk_idx""".stripMargin
}

/** The b9_chunk_docs oracle: the TextChunker fold replayed as a DuckDB
  * recursive CTE (see the query's comment). Kept in its own object — the
  * state machine is long, and the SQL is the spec. [[foldCtes]] exposes
  * the fold over an arbitrary `sec(source, text)` input so the b2_b8
  * full-pipeline oracle can re-key it per prose run. */
private object B9OracleSql {
  def sql: String =
    """WITH RECURSIVE
    |sec AS (
    |  SELECT source, string_agg(text, '. ' ORDER BY doc_id) AS text
    |  FROM documents GROUP BY source),
    |""".stripMargin + foldCtes + """
    |SELECT source, CAST(chunk_idx AS BIGINT) AS chunk_idx, chunk_len, sentence_count
    |FROM chunks ORDER BY source, chunk_idx""".stripMargin

  /** The TextChunker state machine (target 800 / hard max 1500 / overlap
    * 160) as CTEs secl → sent → st → terminal → chunks over a preceding
    * `sec(source, text)` CTE. `chunks` yields (source, chunk_idx,
    * chunk_len, sentence_count) with per-section 0-based indices. */
  val foldCtes: String =
    """secl AS (
    |  SELECT source,
    |         list_filter(string_split(regexp_replace(text, '([.?!])\s+', '\1' || chr(1), 'g'), chr(1)),
    |                     x -> length(x) > 0) AS lst
    |  FROM sec),
    |sent AS (
    |  SELECT source, CAST(i AS INT) AS i, lst[i] AS s
    |  FROM secl, unnest(range(1, len(lst) + 1)) AS u(i)),
    |st AS (
    |  SELECT source, 1 AS i, lst[1] AS pend,
    |         '' AS acc, 0 AS naccs, FALSE AS fresh, 0 AS idx,
    |         CAST(NULL AS INT) AS e_idx, CAST(NULL AS BIGINT) AS e_len,
    |         CAST(NULL AS BIGINT) AS e_scnt, CAST(NULL AS VARCHAR) AS e_txt, 0 AS step
    |  FROM secl WHERE len(lst) > 0
    |  UNION ALL
    |  SELECT
    |    q.source,
    |    CASE WHEN q.adv THEN q.i + 1 ELSE q.i END AS i,
    |    CASE WHEN q.adv THEN q.ns
    |         WHEN q.over THEN substring(q.pend, q.take_n + 1)
    |         ELSE '' END AS pend,
    |    CASE WHEN q.adv THEN q.acc
    |         WHEN l.emit_now THEN (CASE WHEN length(q.newacc) > 160
    |                               THEN substring(q.newacc, length(q.newacc) - 159)
    |                               ELSE '' END)
    |         ELSE q.newacc END AS acc,
    |    CASE WHEN q.adv THEN q.naccs
    |         WHEN l.emit_now THEN 0
    |         ELSE q.naccs + 1 END AS naccs,
    |    CASE WHEN q.adv THEN q.fresh
    |         WHEN l.emit_now THEN FALSE
    |         ELSE TRUE END AS fresh,
    |    CASE WHEN NOT q.adv AND l.emit_now AND m.emitted THEN q.idx + 1 ELSE q.idx END AS idx,
    |    CASE WHEN NOT q.adv AND l.emit_now AND m.emitted THEN q.idx ELSE NULL END AS e_idx,
    |    CASE WHEN NOT q.adv AND l.emit_now AND m.emitted THEN CAST(length(q.newacc) AS BIGINT) ELSE NULL END AS e_len,
    |    CASE WHEN NOT q.adv AND l.emit_now AND m.emitted THEN CAST(greatest(q.naccs + 1, 1) AS BIGINT) ELSE NULL END AS e_scnt,
    |    CASE WHEN NOT q.adv AND l.emit_now AND m.emitted THEN q.newacc ELSE NULL END AS e_txt,
    |    q.step + 1 AS step
    |  FROM (
    |    SELECT st.*, ns.s AS ns,
    |      (st.pend = '') AS adv,
    |      (length(st.acc) + 1 + length(st.pend) > 1500) AS over,
    |      greatest(1500 - length(st.acc) - 1, 1) AS room0,
    |      least(greatest(1500 - length(st.acc) - 1, 1), length(st.pend)) AS take_n,
    |      CASE WHEN st.acc = '' THEN
    |             CASE WHEN (length(st.acc) + 1 + length(st.pend) > 1500)
    |                  THEN substring(st.pend, 1, least(greatest(1500 - length(st.acc) - 1, 1), length(st.pend)))
    |                  ELSE st.pend END
    |           ELSE st.acc || ' ' ||
    |             CASE WHEN (length(st.acc) + 1 + length(st.pend) > 1500)
    |                  THEN substring(st.pend, 1, least(greatest(1500 - length(st.acc) - 1, 1), length(st.pend)))
    |                  ELSE st.pend END
    |      END AS newacc
    |    FROM st LEFT JOIN sent ns ON ns.source = st.source AND ns.i = st.i + 1 AND st.pend = ''
    |  ) q
    |  CROSS JOIN LATERAL (SELECT
    |      (q.over OR length(q.newacc) >= 800) AS emit_now,
    |      (length(trim(q.newacc, chr(32) || chr(9) || chr(10) || chr(13))) > 20
    |        OR (q.idx = 0 AND length(trim(q.newacc, chr(32) || chr(9) || chr(10) || chr(13))) > 0)) AS emitted0
    |    ) l (emit_now, emitted0)
    |  CROSS JOIN LATERAL (SELECT (l.emit_now AND l.emitted0) AS e) m (emitted)
    |  WHERE NOT (q.adv AND q.ns IS NULL)
    |),
    |terminal AS (
    |  SELECT * FROM (
    |    SELECT *, row_number() OVER (PARTITION BY source ORDER BY step DESC) AS rn FROM st) t
    |  WHERE rn = 1),
    |chunks AS (
    |  SELECT source, e_idx AS chunk_idx, e_len AS chunk_len, e_scnt AS sentence_count,
    |         e_txt AS chunk_text
    |  FROM st WHERE e_idx IS NOT NULL
    |  UNION ALL
    |  SELECT source, idx, CAST(length(acc) AS BIGINT), CAST(greatest(naccs, 1) AS BIGINT), acc
    |  FROM terminal
    |  WHERE fresh AND (length(trim(acc, chr(32) || chr(9) || chr(10) || chr(13))) > 20
    |                   OR (idx = 0 AND length(trim(acc, chr(32) || chr(9) || chr(10) || chr(13))) > 0)))""".stripMargin
}
