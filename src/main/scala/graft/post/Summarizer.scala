package graft.post

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.embed.Embedder

/** Section summarization indexed back into the store (SURVEY §2 C4/B12).
  *
  * The reference buffers per-heading text during ingest, prompts an LLM
  * ("max 3 sentences" over the first 5000 chars, gemini_api.cpp:316-377),
  * re-embeds the summary and inserts it as a `chunk_type='summary'` row at
  * heading level 1 (mainwindow.cpp:763-802). The LLM is a pluggable
  * boundary; the hermetic default is extractive (first 3 sentences), which
  * keeps the whole pipeline deterministic.
  */
trait SummaryModel extends Serializable {
  def summarize(text: String): String
}

final case class ExtractiveSummaryModel(maxSentences: Int = 3) extends SummaryModel {
  override def summarize(text: String): String =
    text.split("(?<=[.?!])\\s+").filter(_.nonEmpty).take(maxSentences).mkString(" ")
}

object Summarizer {

  val InputCap = 5000 // mainwindow.cpp:780

  /** Build summary rows from a chunk table: group text per heading_path
    * (ordered by chunk_idx), summarize the first 5000 chars, embed, and
    * shape them as chunk rows (unioned back by the caller). Distributed as
    * one groupBy + flatMap — the model call sits at the same partition
    * boundary as embedding. */
  def summaryRows(chunks: DataFrame, model: SummaryModel, embedder: Embedder): DataFrame = {
    val spark = chunks.sparkSession
    import spark.implicits._
    val m = model
    val e = embedder
    val sections = chunks
      .filter(length(col("text_chunk")) > 5)
      .groupBy(col("doc_id"), col("heading_path"))
      .agg(concat_ws("\n",
        transform(array_sort(collect_list(struct(col("chunk_idx"), col("text_chunk")))),
          x => x.getField("text_chunk"))).as("section_text"))
      .select(col("doc_id"), col("heading_path"), col("section_text"))
      .as[(String, String, String)]
    sections.map { case (docId, headingPath, text) =>
      val summary = m.summarize(text.take(InputCap))
      (docId, headingPath, summary, e.embed(summary), e.modelSig, e.dim)
    }.toDF("doc_id", "heading_path", "summary", "embedding", "model_sig", "model_dim")
      .withColumn("chunk_type", lit("summary"))
      .withColumn("heading_level", lit(1))
  }
}
