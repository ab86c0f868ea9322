package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics specs for the round-7 curation/attribution additions:
  * weighted sampling (A-ES), curriculum ordering, gradient-dot influence
  * and per-dim standardization. The DuckDB oracle pins cross-engine
  * exactness; these pin the MATH against independent re-derivations.
  */
class CurationExtrasSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("weighted sample: exact A-ES keys, rank contiguous, mass-biased toward heavy docs") {
    val rows = SparkEntry.queries("curation_weighted_sample")(spark, sf).collect()
    assert(rows.length == 256)
    assert(rows.map(_.getLong(3)).toSeq == (1L to 256L).toSeq)
    // keys non-increasing in rank order
    val keys = rows.map(_.getLong(2)).toSeq
    assert(keys.zip(keys.tail).forall { case (a, b) => a >= b })
    // independent re-derivation of the rk=1 doc's key: ln(u)/w in picos
    val top = rows.head
    val w = top.getLong(1).toDouble
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(top.getLong(0).toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    val u = (java.lang.Long.parseLong(h, 16) + 1).toDouble / 1152921504606846977.0
    assert(math.floor(math.log(u) / w * 1e12).toLong == top.getLong(2))
    // weighted-without-replacement bias: the sampled mean weight exceeds
    // the corpus mean (P(select) grows with w)
    val sampleMean = rows.map(_.getLong(1)).sum.toDouble / rows.length
    val corpusMean = docs.agg(avg(greatest(col("n_chars"), lit(1)))).head().getDouble(0)
    assert(sampleMean > corpusMean,
      s"sample mean weight $sampleMean should exceed corpus mean $corpusMean")
  }

  test("curriculum order: positions unique per source, each bucket's first doc sits at pos=bucket") {
    val rows = SparkEntry.queries("curation_curriculum_order")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // pos encodes (round, bucket) uniquely within a source
    val bySource = rows.groupBy(_._2)
    for ((src, rs) <- bySource) {
      val ps = rs.map(_._4)
      assert(ps.distinct.length == ps.length, s"duplicate pos in $src")
      // round-robin: the first doc of every present bucket is at pos == bucket
      for ((b, brs) <- rs.groupBy(_._3))
        assert(brs.map(_._4).min == b, s"source $src bucket $b first pos")
      // a full first round sweeps buckets 0..9 once
      val firstRound = rs.filter(_._4 < 10).map(_._3).sorted.toSeq
      assert(firstRound == firstRound.distinct, s"first round of $src repeats a bucket")
    }
  }

  test("influence: validation docs held out; top row's dot product re-derives exactly") {
    val out = SparkEntry.queries("ml_influence_grad_dot")(spark, sf).collect()
    assert(out.length == 20)
    assert(out.forall(_.getLong(0) % 7 != 0), "validation doc leaked into scored set")
    // recompute influence for the top doc from raw features
    val toks = F2.toks _
    val all = docs.select(col("doc_id"), col("lang"), col("text")).collect().map { r =>
      val t = toks(r.getString(2))
      val n = math.max(t.length, 1).toDouble
      val x = Seq(1.0, t.distinct.length / n,
        t.count(Set("the", "and", "of", "to", "a")) / n, t.length / 1000.0)
      val y = if (r.getString(1) == "en") 1.0 else 0.0
      (r.getLong(0), y, x)
    }
    val gv = (0 until 4).map(k => all.filter(_._1 % 7 == 0)
      .map { case (_, y, x) => math.floor((0.5 - y) * x(k) * 1e6).toLong }.sum)
    val top = out.head
    val (_, y, x) = all.find(_._1 == top.getLong(0)).get
    val expected = (0 until 4)
      .map(k => math.floor((0.5 - y) * x(k) * 1e6).toLong * gv(k)).sum
    assert(expected == top.getLong(1))
    // and it really is the max over the scored population
    val maxAll = all.filter(_._1 % 7 != 0).map { case (id, yy, xx) =>
      (0 until 4).map(k => math.floor((0.5 - yy) * xx(k) * 1e6).toLong * gv(k)).sum
    }.max
    assert(top.getLong(1) == maxAll)
  }

  test("confusion matrix: cells partition the corpus; positives agree with the AUC query's label") {
    val m = SparkEntry.queries("ml_confusion_matrix")(spark, sf).head()
    val (tp, fp, tn, fn) = (m.getLong(0), m.getLong(1), m.getLong(2), m.getLong(3))
    assert(tp + fp + tn + fn == docs.count(), "cells must partition the corpus")
    assert(tp + fn == docs.filter(col("lang") === "en").count(), "row margin = positive count")
    // derived metrics re-derive from the cells in integer micros
    assert(m.getLong(4) == (if (tp + fp == 0) 0L else tp * 1000000 / (tp + fp)))
    assert(m.getLong(5) == (if (tp + fn == 0) 0L else tp * 1000000 / (tp + fn)))
    assert(m.getLong(6) == (if (2 * tp + fp + fn == 0) 0L else 2 * tp * 1000000 / (2 * tp + fp + fn)))
  }

  test("PSI drift: near zero on the structure-free split, fires on a synthetically shifted half") {
    val out = SparkEntry.queries("embed_psi_drift")(spark, sf).collect()
    assert(out.length == 64)
    // even/odd halves of one corpus: at this fixture size (250 vectors
    // per half) the +1-smoothed PSI noise floor is ≈ 7·(2/250) ≈ 0.056,
    // so a FEW dims cross the conventional 0.1 gate by chance — the
    // structure-free expectation is "rare", not "never" (at production
    // sample sizes the noise floor vanishes as 1/N)
    assert(out.count(_.getBoolean(2)) <= 9,
      s"structure-free split flagged drift widely: ${out.filter(_.getBoolean(2)).map(_.getLong(0)).toSeq}")
    // synthetic drift: shift dim 0 of the odd half by +0.5 — the monitor
    // must fire on dim 0 and stay quiet elsewhere
    import org.apache.spark.sql.functions.{transform => atransform}
    val shifted = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        when(col("vec_id") % 2 === 1,
          atransform(col("embedding"),
            (x, i) => when(i === 0, x + lit(0.5f)).otherwise(x)))
          .otherwise(col("embedding")).as("embedding"))
    val dir = graft.util.TempRoot.dir("psi-").toString
    shifted.write.parquet(s"$dir/embeddings.parquet")
    val drifted = SparkEntry.queries("embed_psi_drift")(spark, dir).collect()
    val dim0 = drifted.find(_.getLong(0) == 0L).get
    assert(dim0.getBoolean(2), "shifted dim 0 not flagged")
    // the injected shift must DOMINATE the small-sample noise floor —
    // dim 0's PSI is the maximum, by a wide margin over the runner-up
    val others = drifted.filter(_.getLong(0) != 0L).map(_.getLong(1)).max
    assert(dim0.getLong(1) > 3 * others,
      s"shifted dim PSI ${dim0.getLong(1)} should dominate noise max $others")
  }

  test("standardize: z re-derives from integer sums; z order matches x order per dim") {
    val out = SparkEntry.queries("embed_standardize")(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(out.size == 5 * 64)
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // independent stats for dim 0 over the whole corpus
    val xm0 = vecs.values.map(v => math.floor(v(0).toDouble * 1e6).toLong).toSeq
    val n = xm0.length
    val sm = xm0.sum
    val ss = xm0.map(x => x * x).sum
    val mean = sm.toDouble / n
    val std = math.sqrt(ss.toDouble / n - mean * mean)
    for (vid <- 0L until 5L) {
      val xm = math.floor(vecs(vid)(0).toDouble * 1e6).toLong
      assert(out((vid, 0L)) == math.floor((xm - mean) / std * 1e6).toLong, s"vec $vid dim 0")
    }
    // monotone: z preserves the raw-x order within every dim
    for (k <- 0 until 64) {
      val byX = (0L until 5L).sortBy(v => vecs(v)(k))
      val byZ = (0L until 5L).sortBy(v => out((v, k.toLong)))
      assert(byX == byZ, s"dim $k z-order diverges from x-order")
    }
  }
}

/** Tokenizer twin of F.tokens for driver-side re-derivations. */
private object F2 {
  def toks(s: String): Array[String] =
    "[a-z0-9]+".r.findAllIn(s.toLowerCase).toArray
}
