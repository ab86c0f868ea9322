package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosineSim
import graft.ml.KMeans

/** The semantic branch's candidate source — which rows the cosine ranking
  * ever SEES (SURVEY §2 D2 at 100 TB).
  *
  * The reference's hybrid search brute-force-scans the whole corpus per
  * query (vector_store.cpp:206-237); [[ExactScanGenerator]] keeps exactly
  * those semantics (zero recall loss, embarrassingly parallel) and stays
  * the default. [[IvfGenerator]] is the scale path: the corpus is
  * pre-partitioned into trained k-means cells and a query scans only its
  * `nprobe` nearest cells — candidate cost ∝ probed cells, not corpus.
  * Both emit the same (id, sem_score) shape; the caller top-ks and ranks.
  */
trait CandidateGenerator {
  /** Candidate (id, sem_score) rows for the query vector. */
  def candidates(qv: Array[Float], depth: Int): DataFrame

  /** Human-readable mode tag (logs / specs). */
  def mode: String
}

/** Reference semantics: exact cosine against every chunk — one scan +
  * TakeOrderedAndProject, no shuffle (the round-1 plan, unchanged). */
final class ExactScanGenerator(chunks: DataFrame) extends CandidateGenerator {
  override val mode: String = "exact"
  override def candidates(qv: Array[Float], depth: Int): DataFrame =
    chunks.select(col("id"), cosineSim(col("embedding"), typedLit(qv)).as("sem_score"))
}

/** IVF probe over a prebuilt cell index: `ann` holds (id, embedding, cid)
  * with `cid` as the PARTITION key (parquet partition column when read
  * from the workspace — the `isin` filter then prunes at the scan, so a
  * query reads nprobe/k of the corpus). Probe selection is a driver-side
  * k·d loop against the trained centroids — the same "tiny side stays on
  * the driver" contract as the k-means trainer itself.
  *
  * When the index carries the persisted SQ8 columns (the Workspace layout
  * writes them — `sq_code` int8 array, `sq_scale`, `sq_norm`), the probe
  * is TWO-PHASE: the full probed-cell pass reads only the byte codes (4×
  * fewer scan bytes than the float vectors) and approximates cosine from
  * the rescaled integer dot product; the exact cosine then re-ranks only
  * the top `depth × 4` survivors, re-read with an `id IN (…)` pushdown on
  * the same pruned partitions. The bounded driver hop between phases is ≤
  * 4·depth ids — the same class as the engine's other ≤2·depth collects. */
final class IvfGenerator(
    ann: DataFrame,
    centroids: Seq[Seq[Double]],
    nprobe: Int,
    pqCodebook: Option[Seq[Seq[Float]]] = None) extends CandidateGenerator {
  require(centroids.nonEmpty, "IVF index has no centroids")
  require(nprobe >= 1, "nprobe must be >= 1")

  private val usePq = pqCodebook.isDefined &&
    IvfGenerator.PqColumns.forall(ann.columns.contains)
  private val useSq8 = !usePq && IvfGenerator.Sq8Columns.forall(ann.columns.contains)

  override val mode: String =
    s"ivf(cells=${centroids.size},nprobe=$nprobe" +
      s"${if (usePq) ",pq" else if (useSq8) ",sq8" else ""})"

  private def probed(qv: Array[Float]): DataFrame = {
    val cells = IvfGenerator.nearestCells(qv, centroids, nprobe)
    ann.filter(col("cid").isin(cells: _*))
  }

  /** Phase 1 of the SQ8 probe: approximate cosine from the persisted int8
    * codes — the ONLY pass over every probed row, and its scan must not
    * touch the float `embedding` column (plan-asserted in AnnEngineSpec).
    * cos(x, q) ≈ (Σ code_i·q_i)/scale / (‖x‖·‖q‖); zero-norm rows score
    * −1 (NaN would sort ABOVE every real score in a descending sort). */
  private[graft] def approxByCode(qv: Array[Float], depth: Int): DataFrame = {
    val q = qv.map(_.toDouble).toSeq
    val qnorm = math.sqrt(q.map(x => x * x).sum)
    // codegen dot (round-14), replacing the interpreted zip_with/aggregate
    // fold: bit-identical — tinyint→float→double widening is exact for
    // |code| ≤ 127, the query literal's float→double round-trips the same
    // doubles, and DotProduct accumulates the identical index-order fold.
    val dot = graft.functions.VectorFunctions.dotProduct(
      col("sq_code"), typedlit(qv.toSeq))
    val approx =
      if (qnorm == 0.0) lit(-1.0)
      else when(col("sq_norm") > 0,
        dot / col("sq_scale") / (col("sq_norm") * lit(qnorm))).otherwise(lit(-1.0))
    probed(qv)
      .select(col("id"), approx.as("approx_score"))
      .orderBy(col("approx_score").desc, col("id"))
      .limit(math.min(depth.toLong * IvfGenerator.Sq8Overfetch, Int.MaxValue.toLong).toInt)
  }

  /** Phase 1 of the RESIDUAL-PQ probe (round-7; the persisted 4-bit tier
    * — 8× fewer phase-1 scan bytes than SQ8's byte codes): approximate
    * cosine against the RECONSTRUCTION x̂ = centroid(cid) + codeword per
    * subspace. dot(q, x̂) = dot(q, centroid(cid)) + Σₘ LUT[m][codeₘ]
    * where LUT[m][j] = dot(q slice m, codebook[j] slice m) — the
    * centroid dot and the 8×16 LUT are driver-side per-query scalars
    * riding the scan as literals; the scan itself touches only the
    * 4-byte codes + the stored norm, never the float embedding
    * (plan-asserted). Zero-norm rows score −1 (NaN would sort above). */
  private[graft] def pqApproxByCode(qv: Array[Float], depth: Int): DataFrame = {
    val cb = pqCodebook.get
    val dim = qv.length
    val numSub = AnnIndex.PqSubSpaces
    val subDim = dim / numSub
    val qnorm = math.sqrt(qv.map(x => x.toDouble * x).sum)
    val lut: Seq[Seq[Double]] = (0 until numSub).map { m =>
      cb.map { c =>
        var s = 0.0
        var k = 0
        while (k < subDim) { s += qv(m * subDim + k).toDouble * c(m * subDim + k); k += 1 }
        s
      }
    }
    val cells = IvfGenerator.nearestCells(qv, centroids, nprobe)
    val qDotCent: Map[Int, Double] = cells.map { c =>
      c -> centroids(c).zipWithIndex.map { case (x, i) => x * qv(i) }.sum
    }.toMap
    val centDot = cells.tail.foldRight(lit(qDotCent(cells.head)): Column) { (c, acc) =>
      when(col("cid") === lit(c), lit(qDotCent(c))).otherwise(acc)
    }
    val codeDot = (0 until numSub)
      .map(m => element_at(typedLit(lut(m)), element_at(col("pq_code"), m + 1).cast("int") + 1))
      .reduce(_ + _)
    val approx =
      if (qnorm == 0.0) lit(-1.0)
      else when(col("pq_norm") > 0,
        (centDot + codeDot) / (col("pq_norm") * lit(qnorm))).otherwise(lit(-1.0))
    probed(qv)
      .select(col("id"), approx.as("approx_score"))
      .orderBy(col("approx_score").desc, col("id"))
      .limit(math.min(
        depth.toLong * IvfGenerator.PqRefineOverfetch * pqSlateScale,
        Int.MaxValue.toLong).toInt)
  }

  /** The PQ refine slate scales with the probe width: 16× depth was
    * tuned at nprobe=2, where it covers ~2/3 of the probed population —
    * the coverage the noisy 4-bit approx ordering needs. A WIDER probe
    * (auto-nprobe on a flat corpus) grows the probed population
    * linearly, and a fixed slate silently shrinks to a sliver of it
    * (measured: engine-path uniform recall 0.715 vs the float tier's
    * 0.92 at nprobe=12 with the fixed slate; scaling restores parity).
    * ceil(nprobe/2) keeps the tuned slate-to-population RATIO constant;
    * the phase-2 driver hop grows to ≤ 16·depth·nprobe/2 ids — still
    * probe-bounded, never corpus-bounded. */
  private val pqSlateScale: Long = math.max(1L, (nprobe + 1L) / 2L)

  /** Exact cosine re-rank of phase-1 survivors: the `id IN` predicate
    * pushes down to the parquet scan (row-group pruning) on the SAME
    * cid-pruned partitions, so the float column is read for the bounded
    * survivor set only. */
  private def rerankExact(qv: Array[Float], survivors: Array[Long]): DataFrame =
    probed(qv)
      .filter(col("id").isin(survivors.map(Long.box): _*))
      .select(col("id"), cosineSim(col("embedding"), typedLit(qv)).as("sem_score"))

  override def candidates(qv: Array[Float], depth: Int): DataFrame =
    if (usePq)
      rerankExact(qv, pqApproxByCode(qv, depth).collect().map(_.getLong(0)))
    else if (useSq8)
      rerankExact(qv, approxByCode(qv, depth).collect().map(_.getLong(0)))
    else
      probed(qv).select(col("id"), cosineSim(col("embedding"), typedLit(qv)).as("sem_score"))
}

object IvfGenerator {

  /** The persisted SQ8 serving columns ([[AnnIndex.withSq8]]). */
  final val Sq8Columns = Seq("sq_code", "sq_scale", "sq_norm")

  /** The persisted residual-PQ serving columns ([[AnnIndex.withPq]]). */
  final val PqColumns = Seq("pq_code", "pq_norm")

  /** Phase-1 → phase-2 overfetch: the exact re-rank sees 4× the requested
    * depth, absorbing int8 quantization error in the approximate ordering
    * (recall floor pinned in AnnEngineSpec). */
  final val Sq8Overfetch = 4

  /** Refine overfetch for the IVFPQ path (the FAISS IndexRefine k_factor):
    * 4-bit codes carry far more quantization error than int8, so the
    * exact re-rank needs a much deeper candidate slate than SQ8's 4× —
    * 16× holds the clustered ENGINE-path recall ≥ 0.9 at depth 10 where
    * 8× measured 0.75 (in-cell residual codes order near-ties noisily;
    * the slate must cover well over half the probed population), and sits
    * at the nprobe ceiling on the uniform corpus (RECALL_r07.json). The
    * exact pass stays bounded: depth × 16 rows re-read by id pushdown. */
  final val PqRefineOverfetch = 16

  /** The query's `nprobe` nearest cells by squared L2 (the trainer's
    * metric), ties broken by lowest cid — k·d doubles of driver work.
    * A dimension mismatch (embedder changed after the index was built) is
    * a loud error, not a silent truncation: probe selection against
    * misaligned centroids would be quietly wrong for every query. */
  def nearestCells(qv: Array[Float], centroids: Seq[Seq[Double]], nprobe: Int): Seq[Int] =
    centroids.zipWithIndex.map { case (c, i) =>
      require(c.length == qv.length,
        s"IVF centroid dim ${c.length} != query dim ${qv.length}: index built with a different embedder")
      var s = 0.0
      var j = 0
      while (j < c.length) { val d = qv(j) - c(j); s += d * d; j += 1 }
      (s, i)
    }.sortBy(identity).take(nprobe).map(_._2)
}

/** Builder for the IVF cell index: train centroids with the distributed
  * Lloyd trainer, then assign every vector scan-locally (argmin L2 against
  * the literal centroid array — no exchange ever carries the corpus
  * embedding for assignment, same shape as ann_ivf_trained). */
object AnnIndex {

  final val DefaultCells = 16
  final val DefaultIters = 2

  /** SQ8 serving columns for a vector table: per-vector scale s =
    * 127/max|x| (ε-floored), codes = floor(x·s) — exact integers in
    * [−127, 127], so the rescaled dot product is deterministic (the same
    * scheme as the ann_sq8_topk oracle, FAISS-SQ8 shape) — plus the float
    * norm, so approximate cosine needs only the byte codes at probe time.
    * Idempotent on tables that already carry the columns. */
  def withSq8(vectors: DataFrame, vecCol: String = "embedding"): DataFrame =
    if (IvfGenerator.Sq8Columns.forall(vectors.columns.contains)) vectors
    else {
      // codegen expressions (round-14): bit-identical to the replaced
      // higher-order forms — scale = 127/max|x| with (double) casts per
      // element, codes floor(x·s) with long→tinyint truncation, norm the
      // same left-fold Σx² — but compiled instead of interpreted lambda
      // dispatch per element (VectorExprSpec pins the equality).
      import graft.functions.VectorFunctions.{maxAbs, sq8Code, l2Norm}
      val scale = lit(127.0) / greatest(maxAbs(col(vecCol)), lit(1e-12))
      vectors
        .withColumn("sq_scale", scale)
        .withColumn("sq_code", sq8Code(col(vecCol), col("sq_scale")))
        .withColumn("sq_norm", l2Norm(col(vecCol)))
    }

  /** PQ subspace count for the persisted serving codes: 4-bit codes × 8
    * subspaces = 4 bytes/vector — 8× smaller than SQ8's byte codes, the
    * storage tier a 100 TB corpus actually wants for phase-1 scans. */
  final val PqSubSpaces = 8

  /** Train the RESIDUAL PQ codebook for an assigned (id, embedding, cid)
    * index (the round-7 IVFADC scheme, engine side): residual = embedding
    * − centroid(cid) (scan-local literal-array lookup), init = the first
    * k rows' residuals by id order, then the distributed per-subspace
    * Lloyd trainer. Returns None when the geometry doesn't fit (dim not
    * divisible by [[PqSubSpaces]], or an empty corpus). */
  def trainPqCodebook(assigned: DataFrame, cents: Seq[Seq[Double]],
                      k: Int = 16, iters: Int = 2): Option[Seq[Seq[Float]]] = {
    val dim = cents.headOption.map(_.size).getOrElse(0)
    if (dim == 0 || dim % PqSubSpaces != 0) return None
    val rf = withResidual(assigned, cents)
    val init = rf.orderBy(col("id")).limit(k)
      .select(col("rv")).collect().map(_.getSeq[Float](0).toSeq).toSeq
    if (init.isEmpty) None
    else Some(graft.ml.KMeans.trainPq(rf, "rv", dim / PqSubSpaces, init, iters))
  }

  /** The scan-local residual column: embedding − centroid(cid), double
    * subtract cast to float (the PQ codebook's train/encode input). */
  private def withResidual(assigned: DataFrame, cents: Seq[Seq[Double]]): DataFrame = {
    val centsLit = typedLit(cents.map(_.toSeq))
    assigned.withColumn("rv",
      zip_with(col("embedding"), element_at(centsLit, col("cid") + 1),
        (x, y) => (x.cast("double") - y).cast("float")))
  }

  /** Residual-PQ serving columns: `pq_code` (one 0..15 code per subspace,
    * stored as tinyint — 4 bits of information each) from the FROZEN
    * codebook + `pq_norm` (the exact vector norm, so phase-1 approximates
    * cosine against the reconstruction centroid + codeword without
    * touching the float embedding). Scan-local: the centroid array and
    * codebook ride along as literals. Idempotent. */
  def withPq(assigned: DataFrame, cents: Seq[Seq[Double]],
             codebook: Seq[Seq[Float]]): DataFrame =
    if (IvfGenerator.PqColumns.forall(assigned.columns.contains)) assigned
    else {
      import graft.functions.VectorFunctions.pqEncode
      val subDim = codebook.head.size / PqSubSpaces
      val emb = col("embedding").cast("array<double>")
      withResidual(assigned, cents)
        .withColumn("pq_code",
          transform(pqEncode(col("rv"), typedLit(codebook.map(_.toSeq)), subDim),
            c => c.cast("tinyint")))
        .withColumn("pq_norm",
          sqrt(aggregate(zip_with(emb, emb, (a, b) => a * b), lit(0.0), (s, v) => s + v)))
        .drop("rv")
    }

  /** Auto-derive `nprobe` for a freshly-trained IVF index from its own
    * measured coverage ceiling — the IVF analog of
    * [[LshGeometry.choose]]'s derive-don't-default contract, and the
    * engine-side twin of the `ann_ivf_auto_nprobe` query: a blind
    * nprobe default silently caps recall at the cell-coverage ceiling
    * (RECALL_r08: the near-uniform corpus ceilings at 0.355 across EVERY
    * serving tier at nprobe=2/16), and no downstream overfetch or exact
    * re-rank can recover a neighbor whose cell was never probed.
    *
    * Method: for `numQueries` sampled query vectors the exact top-`k` is
    * computed over a stride-capped corpus sample; each true neighbor's
    * cell is ranked in the query's centroid-preference order
    * ([[IvfGenerator.nearestCells]] with nprobe=cells); the chosen
    * nprobe is the smallest whose covered fraction clears `target`
    * (cells when none does — the exact-equivalent fallback).
    *
    * Bounded at any corpus size: one distributed job (corpus-sample scan
    * × broadcast query sample, per-partition partial top-k), then a
    * ≤ numQueries·k-row collect and a numQueries × cells × dim driver
    * loop. Sub-sampling the corpus biases the estimate CONSERVATIVE:
    * the sample's top-k are farther neighbors, spread over more cells,
    * so measured coverage only under-states the true index's — the
    * chosen nprobe errs toward more recall than the target, never less.
    */
  def chooseNprobe(assigned: DataFrame, cents: Seq[Seq[Double]],
                   target: Double = 0.9, k: Int = 10,
                   numQueries: Int = 16, corpusCap: Long = 4096L): Int = {
    val cells = cents.size
    if (cells <= 1) return 1
    val e = assigned.select(col("id").cast("long").as("id"), col("embedding"), col("cid"))
    val n = e.count()
    if (n <= 1) return 1
    // queries sampled by HASH STRIDE across the whole corpus, never the
    // first-N by id: low/adjacent ids often carry planted or ingest-order
    // structure (the driver corpus plants near-dup twins on low vec_ids,
    // whose top-k collapse into one cell — measured coverage(1) = 0.95
    // for ids 0..15 vs 0.23 for a stride sample on the same index), and
    // a coverage curve over such queries derives a catastrophically
    // narrow nprobe for everyone else. xxhash64 decorrelates the sample
    // from id adjacency; orderBy over the ~numQueries survivors keeps it
    // deterministic under any partitioning.
    val qStride = math.max(1L, n / numQueries)
    val qSampled = e.filter(pmod(xxhash64(col("id")), lit(qStride)) === 0)
      .orderBy(col("id")).limit(numQueries)
      .select(col("id").as("q_id"), col("embedding").as("qv"))
    // hash-stride variance can empty the sample on tiny corpora — fall
    // back to the full-corpus prefix rather than failing the derivation
    val qRows =
      if (qSampled.limit(1).isEmpty)
        e.orderBy(col("id")).limit(numQueries)
          .select(col("id").as("q_id"), col("embedding").as("qv"))
      else qSampled
    // the same sample rides the distributed job (broadcast) and the
    // driver's preference-order loop — one definition of "the sample"
    val qLocal = qRows.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    if (qLocal.isEmpty) return 1
    val cStride = math.max(1L, n / corpusCap)
    val side =
      if (cStride == 1L) e
      else e.filter(pmod(xxhash64(col("id")), lit(cStride)) === 0)
    val nb = side.crossJoin(broadcast(qRows))
      .filter(col("id") =!= col("q_id"))
      .select(col("q_id"), col("id"), col("cid"),
        cosineSim(col("embedding"), col("qv")).as("c"))
      // id tie-break: duplicate vectors at the rank-k cutoff must not make
      // the chosen nprobe partition-order-dependent (LshGeometry discipline)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id")).orderBy(col("c").desc, col("id"))))
      .filter(col("rk") <= k)
      .select("q_id", "cid")
      .collect() // bounded: ≤ numQueries·k rows
      .map(r => (r.getLong(0), r.getInt(1)))
    if (nb.isEmpty) return 1
    // centroid-preference rank per (query, cell): cell id → 1-based rank
    val prefRank: Map[Long, Map[Int, Int]] = qLocal.map { case (qid, qv) =>
      qid -> IvfGenerator.nearestCells(qv, cents, cells)
        .zipWithIndex.map { case (cid, i) => cid -> (i + 1) }.toMap
    }.toMap
    val ranks = nb.map { case (qid, cid) => prefRank(qid)(cid) }
    val total = ranks.length
    (1 to cells)
      .find(np => ranks.count(_ <= np).toDouble / total >= target)
      .getOrElse(cells)
  }

  /** @return (vectors (id, embedding, cid), trained centroids). The id
    *         column is renamed to `id` and the vector column to
    *         `embedding` so the index schema is stable regardless of the
    *         source table. */
  def build(vectors: DataFrame, idCol: String, vecCol: String,
            cells: Int = DefaultCells, iters: Int = DefaultIters): (DataFrame, Seq[Seq[Double]]) = {
    // null embeddings would assign cid=null and silently vanish from every
    // probe — exclude them up front (they are invisible to the semantic
    // branch either way; exact cosine scores them null too)
    val valid = vectors.filter(col(vecCol).isNotNull)
    // a corpus smaller than the requested cell count trains fewer cells
    // (k > n would leave empty init slots)
    val k = math.min(cells, valid.count()).toInt
    require(k >= 1, "cannot build an IVF index over an empty corpus")
    val trained = KMeans.train(valid, vecCol, idCol, k, iters)
    val assigned = valid.select(
      col(idCol).as("id"),
      col(vecCol).as("embedding"),
      KMeans.assign(col(vecCol), trained.centroids).as("cid"))
    (assigned, trained.centroids)
  }
}
