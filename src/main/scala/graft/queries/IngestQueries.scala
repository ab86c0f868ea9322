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
    // within a document, parallel across documents (flatMap). Not
    // SQL-expressible → rows-only check; unit specs pin the semantics.
    Q.noOracle("b9_chunk_docs") { (spark, dir) =>
      import spark.implicits._
      val sections = table(spark, dir, "documents")
        .groupBy("source")
        .agg(concat_ws(". ",
          transform(array_sort(collect_list(struct(col("doc_id"), col("text")))),
            x => x.getField("text"))).as("text"))
        .as[(String, String)]
      sections.flatMap { case (source, text) =>
        TextChunker.chunk(text).map(c => (source, c.chunkIdx, c.text.length, c.sentenceCount))
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
