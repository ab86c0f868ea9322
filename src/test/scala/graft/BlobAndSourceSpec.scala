package graft

import java.nio.file.Files
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BlobFunctions
import graft.ingest.{DocId, PdfSource}

/** Blob codec parity (FIXTURES §2.6: np.frombuffer little-endian float32)
  * and the binaryFile document source (A1). */
class BlobAndSourceSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("float32 decode: little-endian parity with np.frombuffer layout") {
    import spark.implicits._
    val values = Array(1.0f, -2.5f, 3.25f, 0.0f, Float.MinPositiveValue)
    val buf = ByteBuffer.allocate(values.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    values.foreach(buf.putFloat)
    val df = Seq(Tuple1(buf.array())).toDF("blob")
    val decoded = df.select(BlobFunctions.float32Decode(col("blob")).as("v"))
      .head().getAs[scala.collection.Seq[Float]]("v")
    assert(decoded == values.toSeq)
  }

  test("float32 encode/decode roundtrip, both codegen paths") {
    import spark.implicits._
    val df = Seq(Tuple1(Array(0.1f, -0.2f, 1e10f, -1e-10f))).toDF("v")
    for (mode <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      val rt = df.select(BlobFunctions.float32Decode(BlobFunctions.float32Encode(col("v"))).as("r"))
        .head().getAs[scala.collection.Seq[Float]]("r")
      assert(rt == Seq(0.1f, -0.2f, 1e10f, -1e-10f), mode)
    }
    spark.conf.unset("spark.sql.codegen.factoryMode")
    // 3072-dim → 12,288 bytes (the vectors.db shape)
    val blob = df.sparkSession.range(1).select(
      BlobFunctions.float32Encode(array((0 until 3072).map(_ => lit(1.0f)): _*)).as("b"))
      .head().getAs[Array[Byte]]("b")
    assert(blob.length == 12288)
  }

  test("doc identity: md5(name_size) matches reference formula (B10)") {
    // pdf_processor.cpp:409-416: MD5 of "<name>_<size>"
    val id = DocId.generate("report.pdf", 1024L)
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("report.pdf_1024".getBytes).map("%02x".format(_)).mkString
    assert(id == expected)
    assert(id.length == 32)
  }

  test("binaryFile source: files → pages → layout chunks, parallel per file (A1)") {
    val dir = Files.createTempDirectory("graft-docs-")
    Files.write(dir.resolve("a.txt"),
      ("Chapter 1 Alpha\n\n" + "Prose line one about topics. " * 3 + "\n\fSecond page content here, enough to chunk.").getBytes)
    Files.write(dir.resolve("b.txt"),
      ("Definition: a beta document speaks for itself and carries weight.").getBytes)
    val chunks = PdfSource.extractChunks(spark, dir.toString, "*.txt")
    val rows = chunks.collect()
    assert(rows.length >= 2)
    val aChunks = chunks.filter(col("source_file") === "a.txt")
    assert(aChunks.filter(col("heading_path") === "Chapter 1 Alpha").count() > 0)
    // prose spanning pages is one chunk tagged with its start page;
    // the page-2 text must still be present
    assert(aChunks.filter(col("text_chunk").contains("Second page content")).count() > 0)
    val bTypes = chunks.filter(col("source_file") === "b.txt")
      .select("chunk_type").collect().map(_.getString(0)).toSet
    assert(bTypes.contains("definition"))
    // doc_id is the B10 identity, distinct per file
    assert(chunks.select("doc_id").distinct().count() == 2)
  }
}
