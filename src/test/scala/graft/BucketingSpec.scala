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
      .config("spark.sql.extensions", "graft.GraftExtensions")
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

  test("z-ordered layout: parquet row-group stats prune a single-dimension filter") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    def recordsReadDuring(body: => Unit): Long = {
      val total = new java.util.concurrent.atomic.AtomicLong(0)
      val listener = new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            total.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
      }
      spark.sparkContext.addSparkListener(listener)
      try { body; Thread.sleep(500) }
      finally spark.sparkContext.removeSparkListener(listener)
      total.get()
    }
    // the q_zorder_key bit interleave over two 16-bucket dimensions
    val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      .select(pmod(col("user_id"), lit(16)).cast("int").as("x"),
        pmod(col("event_id"), lit(16)).cast("int").as("y"))
    val zbits = (0 until 4).map(j =>
      expr(s"(((x >> $j) & 1) << ${2 * j}) + (((y >> $j) & 1) << ${2 * j + 1})"))
      .reduce(_ + _)
    val t = ev.withColumn("zkey", zbits)
    val n = t.count()
    val base = Files.createTempDirectory("graft-zskip-").toString
    // small row groups so min/max stats operate at sub-file granularity
    def write(df: org.apache.spark.sql.DataFrame, path: String): Unit =
      df.coalesce(1).sortWithinPartitions("zkey")
        .write.option("parquet.block.size", 16384).parquet(path)
    write(t, s"$base/zorder")
    // control: same data, same row-group size, laid out by arrival
    t.coalesce(1).write.option("parquet.block.size", 16384).parquet(s"$base/plain")
    def readFor(path: String): Long = recordsReadDuring {
      spark.read.parquet(path).filter(col("y") === 3).count()
    }
    val zRead = readFor(s"$base/zorder")
    val plainRead = readFor(s"$base/plain")
    // the z-ordered file's row groups cover 4x4 (x, y) tiles, so a y=3
    // filter's min/max pushdown skips most groups; the arrival-ordered
    // control reads essentially everything
    assert(plainRead > (n * 0.9).toLong, s"control should scan ~all rows, read $plainRead of $n")
    assert(zRead < n / 2,
      s"z-ordered scan should prune most row groups: read $zRead of $n")
    assert(zRead < plainRead / 2,
      s"z-order pruning ($zRead) should beat the arrival layout ($plainRead) decisively")
  }
}
