package graft.embed

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.udf

/** Embedding providers.
  *
  * The reference treats the embedder as a pluggable HTTP black box
  * (gemini_api.cpp:238-273 — Gemini / Ollama / LM Studio, three response
  * shapes); the engine contract is only "text in, float[dim] out, dim
  * pinned per workspace". For hermetic tests and benchmarks we provide a
  * deterministic local embedder (hash-ngram projection, seed 42) with the
  * same contract (SURVEY §7.4 risk 1).
  */
trait Embedder extends Serializable {
  def dim: Int
  def modelSig: String
  def embed(text: String): Array[Float]
}

/** Deterministic hash-ngram projection embedder.
  *
  * Features = word unigrams + character trigrams; each feature is md5-hashed
  * with the seed, mapped to a coordinate (hash mod dim) with a ±1 sign from
  * the next hash bit; the sum is L2-normalized. Stable across JVMs (md5, no
  * String.hashCode), mirroring the reference's "embedder as black box"
  * boundary while staying offline.
  */
final case class HashNgramEmbedder(dim: Int = 64, seed: Int = 42) extends Embedder {
  override def modelSig: String = s"hash-ngram-$dim-$seed"

  private def featureHash(md: MessageDigest, f: String): Long = {
    val b = md.digest(s"$seed:$f".getBytes(StandardCharsets.UTF_8))
    // first 8 bytes, big-endian (digest() leaves md reset for the next call)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (b(i) & 0xffL); i += 1 }
    h
  }

  override def embed(text: String): Array[Float] = {
    // one digest instance per thread, reused across every feature of every
    // call: MessageDigest.getInstance per FEATURE was ~40% of embed time
    // (provider lookup + allocation for each of the ~10⁰–10¹ features per
    // token). Not a field: MessageDigest is unserializable and the
    // embedder rides into executor closures.
    val md = HashNgramEmbedder.md5.get()
    val v = new Array[Double](dim)
    val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    def add(f: String): Unit = {
      val h = featureHash(md, f)
      val idx = java.lang.Math.floorMod(h >>> 1, dim.toLong).toInt
      val sign = if ((h & 1L) == 0L) 1.0 else -1.0
      v(idx) += sign
    }
    toks.foreach { t =>
      add("w:" + t)
      if (t.length >= 3) {
        var i = 0
        while (i + 3 <= t.length) { add("c:" + t.substring(i, i + 3)); i += 1 }
      }
    }
    var norm = 0.0
    var i = 0
    while (i < dim) { norm += v(i) * v(i); i += 1 }
    val inv = if (norm == 0.0) 0.0 else 1.0 / math.sqrt(norm)
    val out = new Array[Float](dim)
    i = 0
    while (i < dim) { out(i) = (v(i) * inv).toFloat; i += 1 }
    out
  }
}

object HashNgramEmbedder {
  /** Per-thread reusable MD5 instance (embed() hot path). */
  private val md5: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
}

object Embedder {
  /** Column form of an embedder. A scalar UDF is acceptable here: this is
    * the model-call boundary, exactly where the reference also leaves its
    * query engine (HTTP); everything downstream of it stays codegen'd. */
  def embedCol(e: Embedder): Column => Column = {
    val f = udf((s: String) => e.embed(if (s == null) "" else s))
    c => f(c)
  }

  /** Batch embedding over a DataFrame, preserving all input columns.
    * At scale this is the `mapPartitions`-with-pooled-client site; the
    * deterministic embedder needs no pooling so a UDF keeps the plan
    * fully declarative. */
  def embedText(df: DataFrame, textCol: String, e: Embedder, out: String = "embedding"): DataFrame =
    df.withColumn(out, embedCol(e)(df(textCol)))
}
