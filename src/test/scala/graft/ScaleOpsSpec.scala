package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.TokenIndex

/** Specs for the scale-path modules: posting-list index, extensions
  * registration, salted aggregation equivalence. */
class ScaleOpsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("token index: postings equal the scan-side term frequencies (D4 parity)") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta alpha"), (2L, "beta gamma"), (3L, "delta")).toDF("doc_id", "text")
    val postings = TokenIndex.build(docs, "doc_id", "text")
    val got = postings.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("alpha", 1L, 2L), ("beta", 1L, 1L), ("beta", 2L, 1L),
      ("gamma", 2L, 1L), ("delta", 3L, 1L)))
    val hits = TokenIndex.search(postings, Seq("alpha", "beta"), 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(hits.toSeq == Seq((1L, 3L), (2L, 1L))) // doc1: 2+1, doc2: 1
  }

  test("token index write: partitioned by token bucket for pruning") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(50)
    val dir = java.nio.file.Files.createTempDirectory("graft-idx-").toString + "/postings"
    TokenIndex.write(TokenIndex.build(docs, "doc_id", "text"), dir, buckets = 8)
    val back = spark.read.parquet(dir)
    assert(back.select("token_bucket").distinct().count() <= 8)
    // pruned read: one bucket touches a subset of files
    assert(back.filter(col("token_bucket") === 0).count() < back.count())
  }

  test("GraftExtensions registers SQL-callable expressions") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val reg = org.apache.spark.sql.graft.ColumnBridge.registerExtensions(
      ext, FunctionRegistry.builtin.clone())
    for (fn <- Seq("cosine_sim", "dot_product", "l2_norm", "float32_decode",
        "float32_encode", "pq_encode", "topk_by", "byte_window_sums",
        "byte_cdc_boundaries", "png_encode_rgb", "image_decode_stats",
        "image_ahash", "image_resample_rgb", "wav_encode_pcm16", "wav_parse",
        "len_prefixed_slices"))
      assert(reg.functionExists(FunctionIdentifier(fn)), fn)
    // byte_cdc_boundaries through the registered builder: all-zero bytes →
    // every j >= window-1 position is a boundary (0 % m == 0)
    val cdcB = reg.lookupFunctionBuilder(FunctionIdentifier("byte_cdc_boundaries")).get
    val cdc = cdcB(Seq(
      Literal.create(Array.fill[Byte](6)(0), org.apache.spark.sql.types.BinaryType),
      Literal(4), Literal(8)))
    assert(cdc.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toIntArray().toSeq == Seq(4, 5, 6))
    // pq_encode: nearest of two 1-entry-subspace codebook rows
    val pqb = reg.lookupFunctionBuilder(FunctionIdentifier("pq_encode")).get
    val fa = org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)
    val pq = pqb(Seq(
      Literal.create(Array(0.9f, 0.1f), fa),
      Literal.create(Array(Array(0.0f, 0.0f), Array(1.0f, 0.0f)),
        org.apache.spark.sql.types.ArrayType(fa)),
      Literal(2)))
    val codes = pq.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(codes.toIntArray().toSeq == Seq(1)) // (0.9,0.1) nearer (1,0) than (0,0)
    // build + eval cosine through the registered builder
    val b = reg.lookupFunctionBuilder(FunctionIdentifier("cosine_sim")).get
    val e = b(Seq(
      Literal.create(Array(1.0f, 0.0f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      Literal.create(Array(1.0f, 0.0f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))))
    assert(math.abs(e.eval(null).asInstanceOf[Double] - 1.0) < 1e-12)
  }

  test("k-means BSP trainer: inertia non-increasing, exact centroid count, empty-safe") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
    val r = graft.ml.KMeans.train(vecs, "embedding", "vec_id", k = 8, iters = 4)
    assert(r.centroids.size == 8)
    assert(r.centroids.forall(_.size == 64))
    assert(r.inertia.size == 4)
    // slack 1e-3: means are micro-quantized for oracle determinism, which
    // perturbs each centroid coordinate by < 1e-6 — at a Lloyd plateau the
    // linear term vanishes (the exact mean minimizes it), leaving an
    // O(n·d·1e-12) quadratic inertia wobble the exact trace wouldn't have
    r.inertia.sliding(2).foreach { case Seq(a, b) => assert(b <= a + 1e-3, r.inertia) }
    // training moved the centroids off their init (the first 8 vectors)
    val init = vecs.orderBy("vec_id").limit(8).select("embedding")
      .collect().map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
    assert(r.centroids != init)
  }

  test("trained IVF cells: recall vs brute force >= untrained IVF cells") {
    def topSets(name: String): Map[Long, Set[Long]] =
      graft.queries.ScaleQueries.all.find(_.name == name).get.fn(spark, sf)
        .collect().map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = graft.queries.AnnQueries.all.find(_.name == "ann_bruteforce_topk").get
      .fn(spark, sf).filter("rank <= 5")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recall(approx: Map[Long, Set[Long]]): Double =
      exact.map { case (q, t) => approx.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
        .sum / exact.size
    val untrained = recall(topSets("ann_ivf_cells"))
    val trained = recall(topSets("ann_ivf_trained"))
    assert(trained >= untrained, s"trained $trained < untrained $untrained")
    assert(trained > 0.0)
  }

  test("IVFPQ: residual-ADC candidates confined to <=2 probe cells; refine's l2 is the exact distance") {
    val ivfpq = graft.queries.AnnQueries.all.find(_.name == "ann_ivfpq").get
      .fn(spark, sf).collect()
    assert(ivfpq.length == 20)
    // pruning: every candidate lives in one of the query's nprobe=2 cells
    val cells = ivfpq.map(_.getLong(1)).toSet
    assert(cells.size <= 2, s"candidates from ${cells.size} cells: $cells")
    // results sorted by (adc, vec_id) — the serving contract. (The ADC
    // values themselves are residual-code lookups per probe cell — the
    // FAISS IVFADC scheme — so they intentionally do NOT equal the
    // raw-vector ann_pq_adc scan's; their quality contract is RecallSpec.)
    val pairs = ivfpq.map(r => (r.getLong(2), r.getLong(0))).toSeq
    assert(pairs == pairs.sorted, "IVFPQ results not in (adc, vec_id) order")

    // the refine stage's published distance is EXACT: recompute each
    // returned l2_micro from the raw vectors in plain driver-side Scala
    // (independent of every Spark/SQL code path) — per-subspace
    // micro-floored sums, the cross-engine contract
    val refined = graft.queries.AnnQueries.all.find(_.name == "ann_ivfpq_refined").get
      .fn(spark, sf).collect()
    assert(refined.length == 20)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val qv = emb(0L)
    refined.foreach { r =>
      val v = emb(r.getLong(0))
      val expect = (0 until 8).map { m =>
        var s = 0.0
        var k = 0
        while (k < 8) {
          val d = v(m * 8 + k).toDouble - qv(m * 8 + k).toDouble
          s += d * d; k += 1
        }
        math.floor(s * 1000000).toLong
      }.sum
      assert(r.getLong(2) == expect,
        s"refined l2_micro diverges from the exact distance for vec ${r.getLong(0)}")
    }
  }

  /** Run one registered ScaleQueries entry against the fixture SF. */
  private def q(name: String) =
    graft.queries.ScaleQueries.all.find(_.name == name).get.fn(spark, sf)

  test("KMV merge: the merged per-source sketches equal the global sketch bit-for-bit") {
    val merged = q("sketch_kmv_merge").filter(col("source") === "(merged)").head()
    val global = q("sketch_kmv_distinct").head()
    // the mergeability property: a globally-k-smallest hash is within its
    // own source's k smallest, so the union of sketches re-pruned to k IS
    // the global sketch — identical k, max-hash-derived estimate, and
    // exact universe
    assert(merged.getAs[Long]("k") == global.getAs[Long]("k"))
    assert(merged.getAs[Long]("kmv_est") == global.getAs[Long]("kmv_est"))
    assert(merged.getAs[Long]("n_exact") == global.getAs[Long]("n_exact"))
  }

  test("CMS merge: per-source sketches summed cell-wise equal the one-pass sketch") {
    val rows = q("sketch_cms_merge").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("cnt_merged") == r.getAs[Long]("cnt_global"),
        s"CMS linearity broken at cell (${r.getAs[Long]("r")}, ${r.getAs[Long]("b")})")
    }
  }

  test("HLL merge: max-merged per-source registers yield the one-pass estimate") {
    val out = q("sketch_hll_merge").collect()
    val merged = out.find(_.getAs[String]("source") == "(merged)").get
    val global = out.find(_.getAs[String]("source") == "(global)").get
    for (c <- Seq("n_exact", "n_hit", "s_scaled", "hll_est_micro"))
      assert(merged.getAs[Long](c) == global.getAs[Long](c), s"HLL merge diverges on $c")
  }

  test("quantile-histogram merge: 30 daily partials re-summed reproduce the single-pass sketch row-for-row") {
    val merged = q("sketch_quantile_merge").collect().map(_.toSeq)
    val direct = q("sketch_quantile_hist").collect().map(_.toSeq)
    assert(merged.nonEmpty && merged.toSeq == direct.toSeq)
  }

  test("semantic dedup: every cluster keeps its lowest-id member; every dup has a dominating lower-id cell-mate") {
    import graft.functions.VectorFunctions.cosineSim
    val out = graft.queries.DedupQueries.all.find(_.name == "dedup_semantic").get
      .fn(spark, sf)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // representative invariant: the minimum vec_id of each cluster is kept
    rows.groupBy(_._2).foreach { case (cl, members) =>
      val rep = members.minBy(_._1)
      assert(rep._3 == 0L, s"cluster $cl flags its representative ${rep._1} as dup")
    }
    // soundness: recompute the dominated set with an independent pair join
    // over the query's own cluster assignment and the same codegen cosine
    val asg = out.select(col("vec_id"), col("cluster"))
      .join(spark.read.parquet(s"$sf/embeddings.parquet"), "vec_id")
    val x = asg.select(col("cluster"), col("vec_id").as("a"), col("embedding").as("ea"))
    val y = asg.select(col("cluster"), col("vec_id").as("b"), col("embedding").as("eb"))
    val dominated = x.join(y, "cluster")
      .filter(col("a") < col("b") && cosineSim(col("ea"), col("eb")) > 0.35)
      .select(col("b")).distinct().collect().map(_.getLong(0)).toSet
    val flagged = rows.filter(_._3 == 1L).map(_._1).toSet
    assert(flagged == dominated,
      s"flag set diverges: extra=${flagged -- dominated} missing=${dominated -- flagged}")
  }

  test("SignLshBuckets: one-node codegen buckets equal the composed when/sum dot-product buckets") {
    import graft.functions.VectorFunctions.{dotProduct, signLshBuckets}
    import org.apache.spark.sql.functions.{element_at, typedlit, when}
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val hpRows: Seq[Seq[Float]] = e.filter(col("vec_id").between(56, 119))
      .select(col("vec_id"), col("embedding")).collect()
      .sortBy(_.getLong(0)).map(_.getSeq[Float](1).toSeq).toSeq
    // the compositional form the expression replaced — the semantics pin
    def composed(t: Int) = (0 until 8).map(i =>
      when(dotProduct(col("embedding"), typedlit(hpRows(8 * t + i))) > 0,
        lit(1L << i)).otherwise(lit(0L))).reduce(_ + _)
    val both = e.select(
      col("vec_id"),
      signLshBuckets(col("embedding"), typedlit(hpRows), tables = 8).as("fast"),
      org.apache.spark.sql.functions.array((0 until 8).map(composed): _*).as("slow"))
    val rows = both.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"bucket divergence at vec_id ${r.getLong(0)}")
    }
    // a NULL hyperplane element contributes dot 0.0 (bit unset) — the
    // composed-DotProduct outcome, not a crash (live for SQL users)
    val withNull = e.filter(col("vec_id") === 0)
      .select(signLshBuckets(col("embedding"),
        org.apache.spark.sql.functions.array(
          typedlit(hpRows.head), lit(null).cast("array<float>")), tables = 1))
      .head().getSeq[Long](0)
    val refBit = e.filter(col("vec_id") === 0)
      .select((when(dotProduct(col("embedding"), typedlit(hpRows.head)) > 0, 1L)
        .otherwise(0L)).as("b")).head().getLong(0)
    assert(withNull == Seq(refBit), s"null hyperplane mishandled: $withNull vs $refBit")

    // interpreted path (nullSafeEval) agrees with codegen
    val one = e.filter(col("vec_id") === 0)
      .select(signLshBuckets(col("embedding"), typedlit(hpRows), tables = 8)).head().getSeq[Long](0)
    val viaElement = e.filter(col("vec_id") === 0)
      .select((1 to 8).map(t => element_at(
        signLshBuckets(col("embedding"), typedlit(hpRows), tables = 8), t)): _*).head()
    assert((0 until 8).forall(t => viaElement.getLong(t) == one(t)))
  }

  test("embed decontam: argmax fold equals the explode/window twin; ties keep the lowest eval id") {
    import graft.functions.VectorFunctions.cosineSim
    val out = graft.queries.ScaleQueries.all.find(_.name == "curation_embed_decontam").get
      .fn(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.nonEmpty)
    // independent relational twin: explode the (corpus × eval) pairs and
    // pick the max score / min eval id with a window — a DIFFERENT plan
    // over the same codegen cosine, so a fold bug can't hide in both
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val ev = e.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("eid"), col("embedding").as("ev"))
    val sc = e.filter(col("vec_id") % 97 =!= 0).crossJoin(ev)
      .select(col("vec_id"), col("eid"),
        floor(cosineSim(col("embedding"), col("ev")) * 1000000).cast("long").as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("c").desc, col("eid"))
    val twin = sc.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(1))).toMap
    assert(out == twin)
  }

  test("TopKBy aggregate: heap semantics, serde round-trip, equivalence with the rank window") {
    import graft.functions.TopKBy
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val agg = TopKBy(BoundReference(0, LongType, nullable = true),
      BoundReference(1, DoubleType, nullable = true), k = 2)
    // insertion order must not matter; ties break by lowest payload
    def run(rows: Seq[(Long, Double)]): Seq[(Long, Double)] = {
      val buf = rows.foldLeft(agg.createAggregationBuffer()) { (b, r) =>
        agg.update(b, InternalRow(r._1, r._2))
      }
      val out = agg.eval(agg.deserialize(agg.serialize(buf)))
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      (0 until out.numElements()).map { i =>
        val r = out.getStruct(i, 2); (r.getLong(0), r.getDouble(1))
      }
    }
    val data = Seq((1L, 5.0), (2L, 7.0), (3L, 7.0), (4L, 1.0))
    val expect = Seq((2L, 7.0), (3L, 7.0)) // score desc, payload asc
    assert(run(data) == expect)
    assert(run(data.reverse) == expect)
    // merge across partial buffers = same result
    val (l, r) = data.splitAt(2)
    val bl = l.foldLeft(agg.createAggregationBuffer())((b, x) => agg.update(b, InternalRow(x._1, x._2)))
    val br = r.foldLeft(agg.createAggregationBuffer())((b, x) => agg.update(b, InternalRow(x._1, x._2)))
    val merged = agg.eval(agg.merge(bl, br)).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert((0 until merged.numElements()).map { i =>
      val row = merged.getStruct(i, 2); (row.getLong(0), row.getDouble(1))
    } == expect)
    // DataFrame path vs the window formulation on real data
    import org.apache.spark.sql.expressions.Window
    val ev = graft.queries.events(spark, sf).filter(col("value").isNotNull)
    val viaAgg = ev.groupBy("event_type")
      .agg(graft.functions.TopKFunctions.topkBy(col("event_id"), col("value"), 3).as("top"))
      .select(col("event_type"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("event_type"), col("pos"), col("e.payload").as("event_id"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val viaWindow = ev.withColumn("rnk", row_number().over(
        Window.partitionBy("event_type").orderBy(col("value").desc, col("event_id"))))
      .filter(col("rnk") <= 3)
      .select(col("event_type"), (col("rnk") - 1).cast("int").as("pos"), col("event_id"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaAgg == viaWindow)
  }

  test("binned range join equals the naive inequality join") {
    val B = 1800000L
    val ev = graft.queries.events(spark, sf).withColumn("ms", unix_millis(col("ts")))
    val w = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("window_id"), col("ms").as("ws"))
    val naive = ev.join(w, col("ms") >= col("ws") && col("ms") < col("ws") + B)
      .groupBy("window_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val binned = graft.queries.ScaleQueries.all.find(_.name == "q_range_join_binned").get
      .fn(spark, sf).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the query truncates to top-100; every returned window must carry the
    // exact naive count, and the top-1 must agree
    binned.foreach { case (id, n) => assert(naive(id) == n, s"window $id: $n vs ${naive(id)}") }
    assert(binned.values.max == naive.values.max)
  }

  test("BPE merges: counts match a hand-replayed merge on the word table") {
    val out = graft.queries.TextQueries.all.find(_.name == "text_bpe_train").get
      .fn(spark, sf).collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.length == 3 && out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    // replay driver-side on the collected word-frequency table
    val words = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(graft.functions.F.tokens(col("text"))).as("tk"))
      .groupBy("tk").agg(count(lit(1)).as("freq"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    var table = words.map { case (tk, f) => tk.toCharArray.mkString(" ") -> f }
    for ((step, pair, merged, c) <- out) {
      val counts = scala.collection.mutable.Map.empty[String, Long]
      table.foreach { case (s, f) =>
        val syms = s.split(" ")
        syms.sliding(2).filter(_.length == 2)
          .foreach(p => counts(p.mkString(" ")) = counts.getOrElse(p.mkString(" "), 0L) + f)
      }
      val (bestPair, bestC) = counts.toSeq.minBy { case (p, n) => (-n, p) }
      assert((bestPair, bestC) == (pair, c), s"step $step: got ($pair,$c), replay says ($bestPair,$bestC)")
      assert(merged == pair.replace(" ", ""))
      // boundary-correct apply (see TextQueries.applyMergeSql): double the
      // separators so the pair can only match whole symbols, not suffixes
      table = table.map { case (s, f) =>
        (" " + s.replace(" ", "  ") + " ")
          .replace(" " + pair.replace(" ", "  ") + " ", " " + merged + " ")
          .replace("  ", " ").trim -> f
      }
    }
  }

  test("salted two-phase aggregation equals direct groupBy") {
    val ev = graft.queries.events(spark, sf)
    val direct = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = graft.queries.ScaleQueries.all.find(_.name == "q_salted_skew_agg").get
      .fn(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(direct == salted)
  }
}
