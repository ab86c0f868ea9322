package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.embed.HashNgramEmbedder
import graft.store.ChunkStore

/** Bucketed chunk tables: the co-located-join layout for the 100 TB
  * posture (SURVEY §4 "partitioned by workspace + bucketed by doc_id").
  * A join between two tables bucketed on the same key by the same count
  * plans WITHOUT a shuffle exchange on either side — asserted here against
  * the physical plan, the same way PlanQualitySpec pins the query shapes.
  */
class BucketingSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val wh = Files.createTempDirectory("graft-wh-").toString
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  test("doc_id-bucketed self-join (context windows at scale) plans shuffle-free") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    val chunks = ChunkStore.buildChunks(docs, HashNgramEmbedder(dim = 16))
      .select("id", "doc_id", "chunk_idx", "text_chunk")

    // a prior JVM's table location may survive without catalog metadata —
    // clear both before writing
    spark.sql("DROP TABLE IF EXISTS chunks_bucketed")
    val wh = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "chunks_bucketed")
    if (java.nio.file.Files.exists(wh)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(wh).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    chunks.write.mode("overwrite")
      .bucketBy(8, "doc_id")
      .sortBy("doc_id", "chunk_idx")
      .saveAsTable("chunks_bucketed")

    val t = spark.table("chunks_bucketed")
    val a = t.select(col("doc_id"), col("chunk_idx").as("a_idx"))
    val b = t.select(col("doc_id"), col("chunk_idx").as("b_idx"))
    val joined = a.join(b, Seq("doc_id"))
      .filter(abs(col("a_idx") - col("b_idx")) <= 1)

    // force the large-table path (a tiny test table would broadcast —
    // also shuffle-free, but not the layout property under test)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val plan =
      try joined.queryExecution.executedPlan.toString
      finally {
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not re-shuffle either side:\n$plan")

    // and it computes the right thing: every chunk pairs with itself
    assert(joined.filter(col("a_idx") === col("b_idx")).count() == t.count())
  }
}
