package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.VectorFunctions.{cosineSim, dotProduct}
import graft.search.{AnnIndex, IvfGenerator}

/** Recall-at-scale evidence for the approximate-ANN family (round-4
  * "What's missing #3"): measured recall@k vs the exact scan, per variant,
  * on a real corpus — the quality side of the speed/quality tradeoff the
  * ann_* queries only demonstrate the speed of. Run by [[graft.Recall]]
  * (emits RECALL_r{N}.json next to the bench numbers) and floor-pinned by
  * RecallSpec so a regression fails loudly.
  *
  * Each variant is measured against the metric it targets (cosine for
  * LSH/IVF/SQ8, squared-L2 for the ADC family) — mixing metrics would
  * conflate quantizer error with metric mismatch.
  */
object RecallEval {

  final case class VariantRecall(
      variant: String, metric: String, params: String, recallAtK: Double)

  final case class Report(
      sfDir: String, corpus: Long, numQueries: Int, k: Int,
      variants: Seq[VariantRecall]) {
    def json: String = {
      val vs = variants.map(v =>
        s"""{"variant":"${v.variant}","metric":"${v.metric}","params":"${v.params}",""" +
        s""""recall_at_$k":${"%.4f".format(v.recallAtK)}}""").mkString("[", ",", "]")
      s"""{"sf_dir":"$sfDir","corpus":$corpus,"num_queries":$numQueries,"k":$k,"variants":$vs}"""
    }
  }

  private def topkPerQuery(cands: DataFrame, score: Column, asc: Boolean,
                           k: Int): Map[Long, Seq[Long]] = {
    val ord = if (asc) score.asc else score.desc
    val w = Window.partitionBy(col("q_id")).orderBy(ord, col("n_id"))
    cands.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("q_id", "n_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSeq }
  }

  private def recallOf(truth: Map[Long, Seq[Long]], got: Map[Long, Seq[Long]]): Double = {
    val per = truth.map { case (q, t) =>
      (t.toSet & got.getOrElse(q, Seq.empty).toSet).size.toDouble / t.size
    }
    per.sum / per.size
  }

  /** Evaluate recall@k over the driver's embeddings table. The driver
    * corpus is near-uniform — structurally the WORST case for a coarse
    * quantizer — so pair it with [[evaluateClustered]] for the
    * distribution IVF is built for. */
  def evaluate(spark: SparkSession, dir: String,
               numQueries: Int = 20, k: Int = 10): Report =
    evaluateOn(spark, dir,
      table(spark, dir, "embeddings").select(
        col("vec_id").cast("long").as("vec_id"), col("embedding")),
      numQueries, k)

  /** Deterministic clustered corpus at bench scale: `centers` unit
    * gaussian directions, each vector = its center (round-robin by id) +
    * per-dim gaussian noise, all from fixed seeds — the blob distribution
    * a coarse quantizer exists for (the AnnEngineSpec fixture contract,
    * scaled to the sf0.1 corpus size so the ≥0.9 clustered claim carries
    * bench-scale evidence, round-5 task 6). */
  def clusteredCorpus(spark: SparkSession, n: Int, dim: Int,
                      centers: Int, noiseSigma: Double): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val cs = Array.fill(centers) {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val norm = math.sqrt(v.map(x => x * x).sum)
      v.map(x => x / norm)
    }
    (0 until n).map { i =>
      val c = cs(i % centers)
      val r = new scala.util.Random(1000003L * i + 17)
      (i.toLong, c.map(x => (x + noiseSigma * r.nextGaussian()).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }

  def evaluateClustered(spark: SparkSession, n: Int = 2000, dim: Int = 64,
                        centers: Int = 16, noiseSigma: Double = 0.05,
                        numQueries: Int = 20, k: Int = 10): Report =
    evaluateOn(spark,
      s"clustered(n=$n,dim=$dim,centers=$centers,sigma=$noiseSigma)",
      clusteredCorpus(spark, n, dim, centers, noiseSigma), numQueries, k)

  /** Recall of the LIVE ENGINE's serving path (round-6 "Next round" #4):
    * the clustered corpus indexed through the Workspace ANN layout (cid=
    * partition dirs + persisted SQ8 codes, exactly what Engine.index
    * writes) and served by [[IvfGenerator]] — both the SQ8 two-phase
    * probe (byte-code phase 1 + exact re-rank, the default when the
    * persisted codes are present) and the pure float IVF probe (codes
    * dropped). Ground truth = [[graft.search.ExactScanGenerator]], the
    * reference-semantics scan. Unlike the query-registry variants above,
    * this measures index → search end to end: build, parquet round-trip,
    * partition pruning, probe selection, and ranking. */
  def evaluateEngineClustered(spark: SparkSession, n: Int = 2000, dim: Int = 64,
                              centers: Int = 16, noiseSigma: Double = 0.05,
                              numQueries: Int = 20, k: Int = 10,
                              nprobe: Int = 2): Report =
    evaluateEngineOn(spark,
      s"engine-clustered(n=$n,dim=$dim,centers=$centers,sigma=$noiseSigma)",
      clusteredCorpus(spark, n, dim, centers, noiseSigma),
      cells = centers, numQueries, k, nprobe)

  /** The engine serving path measured on the driver's NEAR-UNIFORM
    * embeddings — the coarse quantizer's worst case, so the serving
    * tiers' floor is measured on both distributions, not just the
    * friendly one (round-7 "Next round" #5). Recall here is bounded by
    * the nprobe/cells coverage fraction, exactly like the
    * query-registry `ivf` variant. Pass `nprobe = 0` for the AUTO
    * contract ([[AnnIndex.chooseNprobe]], the `annProbes = 0` serving
    * mode): the width the build derives for itself from measured
    * coverage — on this corpus that lifts recall off the blind
    * default's 0.355 ceiling to the ~0.9 coverage target. */
  def evaluateEngineUniform(spark: SparkSession, dir: String,
                            numQueries: Int = 20, k: Int = 10,
                            nprobe: Int = 2): Report =
    evaluateEngineOn(spark, s"engine-uniform($dir)",
      table(spark, dir, "embeddings").select(
        col("vec_id").cast("long").as("vec_id"), col("embedding")),
      cells = 16, numQueries, k, nprobe)

  private def evaluateEngineOn(spark: SparkSession, label: String,
                               corpusIn: DataFrame, cells: Int,
                               numQueries: Int, k: Int,
                               nprobeIn: Int): Report = {
    // checkpoint FIRST, count the materialized frame: counting the raw
    // input would execute the corpus pipeline twice per report
    val corpus = corpusIn.localCheckpoint()
    val n = corpus.count().toInt
    try {
      val ws = new graft.store.Workspace(spark,
        graft.util.TempRoot.dir("recall-engine-ws-").toString)
      val (built, cents) = graft.search.AnnIndex.build(
        corpus, "vec_id", "embedding", cells = cells)
      // nprobeIn = 0 → the auto contract: the width the build derives for
      // itself (Engine annProbes = 0), tagged in params for the report
      val nprobe =
        if (nprobeIn >= 1) nprobeIn else AnnIndex.chooseNprobe(built, cents)
      val probeTag = s"nprobe=$nprobe${if (nprobeIn < 1) "(auto)" else ""}"
      ws.writeAnn(built, cents)
      // a second workspace with the residual-PQ layout (4-bit codes +
      // frozen codebook) — the round-7 IVFADC serving tier
      val wsPq = new graft.store.Workspace(spark,
        graft.util.TempRoot.dir("recall-engine-pq-ws-").toString)
      val cbOpt = graft.search.AnnIndex.trainPqCodebook(built, cents)
      cbOpt.foreach(cb => wsPq.writeAnn(built, cents, Some(cb)))
      val exact = new graft.search.ExactScanGenerator(
        corpus.select(col("vec_id").as("id"), col("embedding")))
      val sq8Gen = new IvfGenerator(ws.readAnn(), ws.readAnnCentroids(), nprobe)
      val floatGen = new IvfGenerator(
        ws.readAnn().drop(IvfGenerator.Sq8Columns: _*), ws.readAnnCentroids(), nprobe)
      val pqGen = cbOpt.map(_ => new IvfGenerator(
        wsPq.readAnn(), wsPq.readAnnCentroids(), nprobe, wsPq.readPqCodebook()))
      val stride = math.max(1, n / numQueries)
      val qRows = corpus
        .filter(pmod(col("vec_id"), lit(stride)) === 0 &&
          col("vec_id") < stride.toLong * numQueries)
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      def topK(gen: graft.search.CandidateGenerator, qid: Long,
               qv: Array[Float]): Set[Long] =
        gen.candidates(qv, k).filter(col("id") =!= qid)
          .orderBy(col("sem_score").desc, col("id"))
          .limit(k).collect().map(_.getLong(0)).toSet
      def meanRecall(gen: graft.search.CandidateGenerator): Double = {
        val per = qRows.map { case (qid, qv) =>
          val truth = topK(exact, qid, qv)
          (truth & topK(gen, qid, qv)).size.toDouble / truth.size
        }
        per.sum / per.length
      }
      Report(label,
        n, qRows.length, k, Seq(
          VariantRecall("engine_ivf_sq8", "cosine",
            s"cells=$cells,$probeTag,two_phase,overfetch=${IvfGenerator.Sq8Overfetch}",
            meanRecall(sq8Gen)),
          VariantRecall("engine_ivf_float", "cosine",
            s"cells=$cells,$probeTag", meanRecall(floatGen))) ++
          pqGen.map(g => VariantRecall("engine_ivf_pq", "cosine",
            s"cells=$cells,$probeTag,two_phase,residual," +
              s"overfetch=${IvfGenerator.PqRefineOverfetch}", meanRecall(g))))
    } finally graft.functions.Checkpoints.release(corpus)
  }

  /** Evaluate recall@k for every ANN variant over `numQueries` corpus
    * vectors sampled at a fixed stride (deterministic). Every input —
    * hyperplanes, PQ codebook init, IVF training — derives from the
    * corpus itself, so any (vec_id, embedding) frame evaluates. */
  def evaluateOn(spark: SparkSession, label: String, corpus: DataFrame,
                 numQueries: Int = 20, k: Int = 10): Report = {
    val e = corpus
      .localCheckpoint() // every variant re-reads the same materialized corpus
    try {
      val n = e.count()
      val stride = math.max(1L, n / numQueries)
      val qs = e.filter(pmod(col("vec_id"), lit(stride)) === 0 && col("vec_id") < stride * numQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
        .localCheckpoint()
      try {
        // all-pairs (query × corpus) scored candidates — 2000×20 rows at
        // sf0.1; every variant below restricts this by its own pruning
        val pairs = e.crossJoin(broadcast(qs)).filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("qv"), col("vec_id").as("n_id"), col("embedding"))

        val cosTruth = topkPerQuery(
          pairs.select(col("q_id"), col("n_id"), cosineSim(col("embedding"), col("qv")).as("s")),
          col("s"), asc = false, k)
        val d2 = aggregate(zip_with(col("embedding"), col("qv"),
            (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
          lit(0.0), (s, v) => s + v)
        val l2Truth = topkPerQuery(
          pairs.select(col("q_id"), col("n_id"), d2.as("s")), col("s"), asc = true, k)

        // ---- trained IVF (the Workspace index shape), nprobe ∈ {1, 2} ----
        val (assigned, cents) = AnnIndex.build(e, "vec_id", "embedding", cells = 16)
        val av = assigned.select(col("id").as("n_id"), col("embedding"), col("cid"))
          .localCheckpoint()
        try {
        val qRows = qs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
        def ivfRecall(nprobe: Int): Double = {
          import spark.implicits._
          val probes = qRows.flatMap { case (qid, qv) =>
            IvfGenerator.nearestCells(qv, cents, nprobe).map(c => (qid, c))
          }.toSeq.toDF("q_id", "pcid")
          val cands = av.join(broadcast(probes), col("cid") === col("pcid"))
            .join(broadcast(qs), Seq("q_id"))
            .filter(col("n_id") =!= col("q_id"))
            .select(col("q_id"), col("n_id"), cosineSim(col("embedding"), col("qv")).as("s"))
          recallOf(cosTruth, topkPerQuery(cands, col("s"), asc = false, k))
        }
        val ivf1 = ivfRecall(1)
        val ivf2 = ivfRecall(2)
        val ivf4 = ivfRecall(4)

        // ---- sign-LSH buckets (ann_lsh_bucketed's hyperplane scheme) ----
        def lshRecall(numHp: Int): Double = {
          val hp = e.filter(col("vec_id").between(8, 8 + numHp - 1))
            .agg(collect_list(struct((col("vec_id") - 8).as("hid"), col("embedding").as("he"))).as("hps"))
          val bucketed = e.crossJoin(broadcast(hp))
            .select(col("vec_id"), col("embedding"),
              aggregate(transform(col("hps"), h =>
                when(dotProduct(col("embedding"), h.getField("he")) > 0,
                  pow(lit(2.0), h.getField("hid")).cast("long")).otherwise(lit(0L))),
                lit(0L), (s, v) => s + v).as("bucket"))
            .localCheckpoint()
          try {
            val qb = bucketed.join(broadcast(qs.select(col("q_id"))),
                col("vec_id") === col("q_id"))
              .select(col("q_id"), col("bucket").as("qbucket"), col("embedding").as("qv"))
            val cands = bucketed.join(broadcast(qb),
                col("bucket") === col("qbucket") && col("vec_id") =!= col("q_id"))
              .select(col("q_id"), col("vec_id").as("n_id"),
                cosineSim(col("embedding"), col("qv")).as("s"))
            recallOf(cosTruth, topkPerQuery(cands, col("s"), asc = false, k))
          } finally graft.functions.Checkpoints.release(bucketed)
        }
        val lsh8 = lshRecall(8)
        val lsh4 = lshRecall(4)

        // ---- multi-table sign-LSH (ann_lsh_multitable's Indyk–Motwani
        // scheme): L independent 8-bit tables, candidates = the union of
        // the query's buckets across tables, exact cosine re-rank — each
        // table multiplies the chance a true neighbor shares a bucket ----
        def lshMultiRecall(tables: Int): Double =
          lshMultiFrom(e.filter(col("vec_id").between(56, 56 + 8 * tables - 1))
            .select(expr("(vec_id - 56) div 8").as("tbl"),
              expr("(vec_id - 56) % 8").as("hid"), col("embedding").as("he")))
        def lshMultiFrom(hp: DataFrame): Double = {
          val bk = e.crossJoin(broadcast(hp))
            .groupBy(col("vec_id"), col("tbl"))
            .agg(sum(when(dotProduct(col("embedding"), col("he")) > 0,
              expr("shiftleft(CAST(1 AS BIGINT), cast(hid as int))")).otherwise(0L)).as("bucket"))
            .localCheckpoint()
          try {
            val qb = bk.join(broadcast(qs.select(col("q_id"))), col("vec_id") === col("q_id"))
              .select(col("q_id"), col("tbl").as("qtbl"), col("bucket").as("qbucket"))
            val cands = bk.join(broadcast(qb),
                col("tbl") === col("qtbl") && col("bucket") === col("qbucket") &&
                  col("vec_id") =!= col("q_id"))
              .select(col("q_id"), col("vec_id").as("n_id")).distinct()
            val scored = cands
              .join(e.select(col("vec_id").as("n_id"), col("embedding")), Seq("n_id"))
              .join(broadcast(qs), Seq("q_id"))
              .select(col("q_id"), col("n_id"), cosineSim(col("embedding"), col("qv")).as("s"))
            recallOf(cosTruth, topkPerQuery(scored, col("s"), asc = false, k))
          } finally graft.functions.Checkpoints.release(bk)
        }
        val lshMulti = lshMultiRecall(8)

        // ---- AUTO-geometry multi-table LSH (round-7 "What's wrong #2"):
        // the banding geometry derives from a bounded k-NN angle sample
        // instead of the blind 8×8 default — see [[graft.search.LshGeometry]].
        // On this near-uniform corpus the chosen band is shallow (the
        // honest price of a flat distribution); on clustered corpora it
        // deepens to maxBits and prunes hard. Hyperplanes are seeded
        // gaussians, not corpus rows.
        val geom = graft.search.LshGeometry.choose(
          graft.search.LshGeometry.estimateKnnAngle(e, "vec_id", "embedding", k),
          targetRecall = 0.7, tables = 8, maxBits = 16)
        val dim = e.select(size(col("embedding"))).head().getInt(0)
        val lshAuto = lshMultiFrom(
          graft.search.LshGeometry.hyperplanes(spark, geom, dim))

        // ---- 1-bit sign signatures (ann_hamming_binary's packing):
        // Hamming prefilter keeps k·16 candidates, exact cosine re-ranks —
        // the cheapest two-phase pipeline (8 bytes/vector phase 1) ----
        val binary = {
          def word(off: Int) = expr(
            s"aggregate(transform(sequence(0, 31), " +
              s"i -> IF(embedding[i + $off] > CAST(0 AS FLOAT), shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT))), " +
              "CAST(0 AS BIGINT), (s, v) -> s + v)")
          val sigs = e.select(col("vec_id"), word(0).as("lo"), word(32).as("hi"))
          val qsig = sigs.join(broadcast(qs.select(col("q_id"))),
              col("vec_id") === col("q_id"))
            .select(col("q_id"), col("lo").as("qlo"), col("hi").as("qhi"))
          val hd = (bit_count(col("lo").bitwiseXOR(col("qlo"))) +
            bit_count(col("hi").bitwiseXOR(col("qhi")))).as("hd")
          val pre = sigs.crossJoin(broadcast(qsig))
            .filter(col("vec_id") =!= col("q_id"))
            .select(col("q_id"), col("vec_id").as("n_id"), hd)
            .withColumn("rk", row_number().over(
              Window.partitionBy(col("q_id")).orderBy(col("hd").asc, col("n_id"))))
            .filter(col("rk") <= k * 16)
          val reranked = pre
            .join(e.select(col("vec_id").as("n_id"), col("embedding")), Seq("n_id"))
            .join(broadcast(qs), Seq("q_id"))
            .select(col("q_id"), col("n_id"), cosineSim(col("embedding"), col("qv")).as("s"))
          recallOf(cosTruth, topkPerQuery(reranked, col("s"), asc = false, k))
        }

        // ---- IVFPQ: trained coarse cells (nprobe=2) + trained RESIDUAL
        // ADC ranking (FAISS IVFADC, the ann_ivfpq scheme): the codebook
        // trains on and encodes x − centroid(cell), so the 4 bits per
        // subspace describe in-cell offsets instead of the shared
        // centroid component — the fix for the clustered-corpus collapse
        // (raw codes measured 0.085 recall@10 where residual IVF routes
        // perfectly). Init = residual rows 16..31 (the ann_pq_adc init
        // convention applied to residuals).
        val subDim = AnnQueries.SubDim
        val centsLit = typedlit(cents.map(_.toSeq))
        val avr = av.withColumn("rv",
          zip_with(col("embedding"), element_at(centsLit, col("cid") + 1),
            (x, y) => (x.cast("double") - y).cast("float")))
          .localCheckpoint()
        try {
        val cbInit = avr.filter(col("n_id").between(16, 31))
          .select(col("n_id").cast("int").as("j"), col("rv"))
          .collect().map(r => (r.getInt(0) - 16) -> r.getSeq[Float](1).toSeq)
          .sortBy(_._1).map(_._2).toSeq
        val cb = graft.ml.KMeans.trainPq(avr, "rv", subDim, cbInit, iters = 2)
        import graft.functions.VectorFunctions.pqEncode
        val numSub = cb.head.length / subDim
        // the ENGINE's own nprobe derivation on this exact geometry
        // (CandidateGenerator.chooseNprobe — the value Engine.index
        // persists as ann_nprobe), so the auto variant below measures
        // the query registry's ann_ivfpq_refined_auto slate discipline
        // with the engine's width: one floor ties both together
        val npAuto = AnnIndex.chooseNprobe(assigned, cents)
        val (ivfpqRecall, ivfpqRefinedRecall, ivfpqRefinedAutoRecall) = {
          import spark.implicits._
          // ADC: per-(query, probe-cell) LUT of query-RESIDUAL-to-centroid
          // distances per subspace, joined via the (q_id, cell) probe rows
          val enc = avr.select(col("n_id"), col("cid"),
            pqEncode(col("rv"), typedlit(cb.map(_.toSeq)), subDim).as("codes"))
          def lutFor(qv: Array[Float], pc: Int): Seq[Seq[Double]] = {
            val rq = qv.indices.map(i => (qv(i).toDouble - cents(pc)(i)).toFloat)
            (0 until numSub).map { m =>
              cb.map { c =>
                var s = 0.0; var kk = 0
                while (kk < subDim) {
                  val dd = rq(m * subDim + kk).toDouble - c(m * subDim + kk).toDouble
                  s += dd * dd; kk += 1
                }
                s
              }
            }
          }
          def adcCands(nprobe: Int) = {
            val luts = qRows.flatMap { case (qid, qv) =>
              IvfGenerator.nearestCells(qv, cents, nprobe)
                .map(pc => (qid, pc, lutFor(qv, pc)))
            }.toSeq.toDF("q_id", "pcid", "lut")
            enc.join(broadcast(luts), col("cid") === col("pcid"))
              .filter(col("n_id") =!= col("q_id"))
              .select(col("q_id"), col("n_id"),
                (0 until numSub).map(m =>
                  element_at(element_at(col("lut"), m + 1), element_at(col("codes"), m + 1) + 1))
                  .reduce(_ + _).as("adc"))
          }
          val cands = adcCands(2)
          val raw = recallOf(l2Truth, topkPerQuery(cands, col("adc"), asc = true, k))

          // FAISS-refine stage (round-5 "What's missing #3"): the raw ADC
          // order goes uncorrected for quantization error, so serve the ADC
          // top k·overfetch and re-rank those with the EXACT distance — the
          // SQ8 two-phase pattern applied to IVFPQ. Cost: one bounded
          // re-read of overfetch·k·|Q| float vectors.
          val wAdc = Window.partitionBy(col("q_id")).orderBy(col("adc").asc, col("n_id"))
          def refinedRecall(cands: DataFrame, slate: Int): Double = {
            val survivors = cands.withColumn("rk", row_number().over(wAdc))
              .filter(col("rk") <= slate)
              .select("q_id", "n_id")
            val refined = survivors
              .join(av.select(col("n_id"), col("embedding")), Seq("n_id"))
              .join(broadcast(qs), Seq("q_id"))
              .select(col("q_id"), col("n_id"), d2.as("s"))
            recallOf(l2Truth, topkPerQuery(refined, col("s"), asc = true, k))
          }
          // auto serving tier: engine-derived nprobe + the pqSlateScale
          // contract (slate × ceil(nprobe/2)) — the round-8 serving fix,
          // now measured through the SAME refine pipeline as the tuned
          // nprobe=2 row so the two numbers are directly comparable
          (raw,
            refinedRecall(cands, k * IvfGenerator.PqRefineOverfetch),
            refinedRecall(adcCands(npAuto),
              k * IvfGenerator.PqRefineOverfetch * math.max(1, (npAuto + 1) / 2)))
        }

        // the nprobe ceiling under the L2 metric: EXACT re-rank of every
        // probed-cell row — what any in-cell refinement converges to, so
        // the JSON reads raw ≤ refined ≤ ceiling (the residual gap is
        // coarse-quantizer loss, not PQ error)
        val ivfL2Ceiling = {
          import spark.implicits._
          val probes = qRows.flatMap { case (qid, qv) =>
            IvfGenerator.nearestCells(qv, cents, 2).map(c => (qid, c))
          }.toSeq.toDF("q_id", "pcid")
          val cands = av.join(broadcast(probes), col("cid") === col("pcid"))
            .join(broadcast(qs), Seq("q_id"))
            .filter(col("n_id") =!= col("q_id"))
            .select(col("q_id"), col("n_id"), d2.as("s"))
          recallOf(l2Truth, topkPerQuery(cands, col("s"), asc = true, k))
        }

        // ---- SQ8 two-phase (the IvfGenerator serving path, full corpus):
        // select by rescaled int8 cosine (4× overfetch), re-rank exact ----
        val sq = AnnIndex.withSq8(e)
        val sqPairs = sq.crossJoin(broadcast(qs)).filter(col("vec_id") =!= col("q_id"))
        val qd = col("qv").cast("array<double>")
        val qnorm = sqrt(aggregate(zip_with(qd, qd, (a, b) => a * b), lit(0.0), (s, v) => s + v))
        val approx = when(col("sq_norm") > 0,
          aggregate(zip_with(col("sq_code").cast("array<double>"), qd, (x, y) => x * y),
            lit(0.0), (s, v) => s + v) / col("sq_scale") / (col("sq_norm") * qnorm))
          .otherwise(lit(-1.0))
        val phase1 = sqPairs.select(col("q_id"), col("vec_id").as("n_id"),
            col("embedding"), col("qv"), approx.as("a"))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("q_id")).orderBy(col("a").desc, col("n_id"))))
          .filter(col("rk") <= k * IvfGenerator.Sq8Overfetch)
        val sq8Cands = phase1.select(col("q_id"), col("n_id"),
          cosineSim(col("embedding"), col("qv")).as("s"))
        val sq8 = recallOf(cosTruth, topkPerQuery(sq8Cands, col("s"), asc = false, k))

        Report(label, n, qRows.length, k, Seq(
          VariantRecall("ivf", "cosine", "cells=16,iters=2,nprobe=1", ivf1),
          VariantRecall("ivf", "cosine", "cells=16,iters=2,nprobe=2", ivf2),
          VariantRecall("ivf", "cosine", "cells=16,iters=2,nprobe=4", ivf4),
          VariantRecall("lsh", "cosine", "hyperplanes=8,buckets=256", lsh8),
          VariantRecall("lsh", "cosine", "hyperplanes=4,buckets=16", lsh4),
          VariantRecall("lsh_multitable", "cosine", "tables=8,hyperplanes=8,buckets=256", lshMulti),
          VariantRecall("lsh_multitable_auto", "cosine", "auto:" + geom.params, lshAuto),
          VariantRecall("binary_rerank", "cosine", "bits=64,overfetch=16", binary),
          VariantRecall("ivfpq", "l2", "cells=16,nprobe=2,m=8,k*=16,trained,residual", ivfpqRecall),
          VariantRecall("ivfpq_refined", "l2",
            s"cells=16,nprobe=2,m=8,k*=16,trained,residual,overfetch=${IvfGenerator.PqRefineOverfetch}",
            ivfpqRefinedRecall),
          VariantRecall("ivfpq_refined_auto", "l2",
            s"cells=16,auto:nprobe=$npAuto,slate_scale=${math.max(1, (npAuto + 1) / 2)}," +
              s"m=8,k*=16,trained,residual,overfetch=${IvfGenerator.PqRefineOverfetch}",
            ivfpqRefinedAutoRecall),
          VariantRecall("ivf_l2_ceiling", "l2", "cells=16,nprobe=2,exact_rerank=all",
            ivfL2Ceiling),
          VariantRecall("sq8_two_phase", "cosine", s"overfetch=${IvfGenerator.Sq8Overfetch}", sq8)))
        } finally graft.functions.Checkpoints.release(avr)
        } finally graft.functions.Checkpoints.release(av)
      } finally graft.functions.Checkpoints.release(qs)
    } finally graft.functions.Checkpoints.release(e)
  }
}
