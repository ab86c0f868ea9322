package graft.queries

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

  val all: Seq[Q] = Seq(

    // A1 — real PDF ingest, end to end: the deterministic sample PDF
    // (valid xref, Courier metrics, one Flate-compressed page) is written
    // to a temp dir, scanned via binaryFile, per-char extracted
    // (CharPdfExtractor) and layout-chunked (B1–B9). Rows-only: the PDF
    // byte format is outside the oracle's SQL surface; semantics are
    // pinned line-by-line in CharPdfExtractorSpec.
    Q.noOracle("a1_pdf_ingest") { (spark, dir) =>
      val tmp = graft.util.TempRoot.dir("a1-")
      java.nio.file.Files.write(tmp.resolve("sample.pdf"), graft.ingest.PdfSampleDoc.bytes)
      // the Type3 /Differences twin rides along: same text through the
      // glyph-name decode path, so the chunk output doubles exactly
      java.nio.file.Files.write(tmp.resolve("type3.pdf"), graft.ingest.PdfSampleDoc.bytesType3)
      graft.ingest.PdfSource.extractChunks(spark, tmp.toString)
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

    // B2–B8 — layout-aware chunking: synthetic page models built
    // deterministically from the corpus (each source = one document, each
    // doc = one page, lines laid out at 14pt pitch with a heading line per
    // page), run through the full per-document layout pipeline as a flatMap.
    // Rows-only check; LayoutChunkerSpec pins each heuristic.
    Q.noOracle("b2_b8_layout_chunk") { (spark, dir) =>
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
          (source, i, c.pageNum, c.headingPath, c.headingLevel, c.chunkType,
            c.text.length, c.sentenceCount)
        }
      }.toDF("source", "chunk_idx", "page_num", "heading_path", "heading_level",
          "chunk_type", "chunk_len", "sentence_count")
        .orderBy("source", "chunk_idx")
    },

    // C1 — embedding boundary: deterministic local embedder (dim 64), the
    // hermetic stand-in for the reference's HTTP embedders
    // (gemini_api.cpp:238-273). Rows-only check; unit specs pin values.
    Q.noOracle("c1_embed_docs") { (spark, dir) =>
      val emb = HashNgramEmbedder(dim = 64)
      Embedder.embedText(table(spark, dir, "documents"), "text", emb)
        .select(
          col("doc_id"),
          size(col("embedding")).as("model_dim"),
          lit(emb.modelSig).as("model_sig"),
          round(graft.functions.VectorFunctions.l2Norm(col("embedding")), 4).as("norm"))
        .orderBy("doc_id")
        .limit(1000)
    }
  )
}

/** The b9_chunk_docs oracle: the TextChunker fold replayed as a DuckDB
  * recursive CTE (see the query's comment). Kept in its own object — the
  * state machine is long, and the SQL is the spec. */
private object B9OracleSql {
  val sql: String =
    """WITH RECURSIVE
    |sec AS (
    |  SELECT source, string_agg(text, '. ' ORDER BY doc_id) AS text
    |  FROM documents GROUP BY source),
    |secl AS (
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
    |         CAST(NULL AS BIGINT) AS e_scnt, 0 AS step
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
    |  SELECT source, e_idx AS chunk_idx, e_len AS chunk_len, e_scnt AS sentence_count
    |  FROM st WHERE e_idx IS NOT NULL
    |  UNION ALL
    |  SELECT source, idx, CAST(length(acc) AS BIGINT), CAST(greatest(naccs, 1) AS BIGINT)
    |  FROM terminal
    |  WHERE fresh AND (length(trim(acc, chr(32) || chr(9) || chr(10) || chr(13))) > 20
    |                   OR (idx = 0 AND length(trim(acc, chr(32) || chr(9) || chr(10) || chr(13))) > 0)))
    |SELECT source, CAST(chunk_idx AS BIGINT) AS chunk_idx, chunk_len, sentence_count
    |FROM chunks ORDER BY source, chunk_idx""".stripMargin
}
