package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over an embedding column — the codebook
  * trainer behind the IVF cell map and the PQ codebook (the repo's
  * ann_ivf_* / ann_pq_adc queries use deterministic untrained stand-ins;
  * this is how a deployment refines them).
  *
  * Shape per iteration: assignment is SCAN-LOCAL (centroids ride along as
  * one literal array — k·d doubles, always driver-sized), and the update
  * is a (cluster, dim) partial aggregate: map-side combine reduces each
  * partition to ≤ k·d rows, so the only shuffle is k·d compact rows per
  * round regardless of corpus size. Only the k·d centroid means are ever
  * collected — the classic BSP loop (driver iterates over ROUNDS, never
  * over data), same hygiene as DedupPipeline.components.
  */
object KMeans {

  /** Distance vector to every centroid: argmin = first index achieving
    * the array_min (ties → lowest index, since the literal is in index
    * order). Codegen expression (round-14); the replaced higher-order
    * `transform(cents, c => aggregate(zip_with(...)))` form was
    * interpreted per element — arithmetic is bit-identical (left-fold
    * s + ((double)x − y)² in index order, VectorExprSpec pins it). */
  private def distances(vec: Column, cents: Seq[Seq[Double]]): Column =
    graft.functions.VectorFunctions.l2CellDistances(vec, cents, micro = false)

  final case class Result(centroids: Seq[Seq[Double]], inertia: Seq[Double])

  /** Scan-local cluster assignment against a trained codebook: argmin L2,
    * first-match tie-break (lowest cid) — the literal centroid array rides
    * along with the scan, so assignment never shuffles the vectors. */
  def assign(vec: Column, cents: Seq[Seq[Double]]): Column = {
    val d = distances(vec, cents)
    (array_position(d, array_min(d)) - 1).cast("int")
  }

  /** Per-subspace product-quantization codebook trainer: Lloyd iterations
    * where assignment is the [[graft.functions.PqEncode]] codegen argmin
    * (micro-quantized squared L2, lowest-j ties) and the update is a
    * (subspace, code, dim) partial aggregate of MICRO-QUANTIZED sums —
    * integer sums are order-free, so the trained centroids are
    * bit-identical across engines and runs (the DuckDB oracle replays the
    * identical arithmetic). Each round's means are float-cast (the
    * codebook's serving dtype); shuffle per round is ≤ subspaces·k·subDim
    * compact rows however large the corpus.
    *
    * The codebook is k FULL-dimension rows whose m-th slice is subspace
    * m's j-th centroid — subspaces train independently (a row's m-slice
    * only ever aggregates vectors assigned to j in subspace m).
    */
  def trainPq(vectors: DataFrame, vecCol: String, subDim: Int,
              init: Seq[Seq[Float]], iters: Int): Seq[Seq[Float]] = {
    import graft.functions.VectorFunctions.pqEncode
    val k = init.size
    require(k >= 1 && init.forall(_.nonEmpty), "PQ init codebook must be non-empty")
    var cb = init
    for (_ <- 0 until iters) {
      // materialize codes BEFORE the posexplode: a projection collapsed
      // above a Generate re-evaluates the k-way argmin per exploded dim
      val assigned = vectors.select(
        col(vecCol).as("v"),
        pqEncode(col(vecCol), typedlit(cb.map(_.toSeq)), subDim).as("codes"))
        .localCheckpoint()
      val sums = assigned
        .select(col("codes"), posexplode(col("v")).as(Seq("k64", "x")))
        .select(
          (col("k64") / lit(subDim)).cast("int").as("m"),
          element_at(col("codes"), (col("k64") / lit(subDim)).cast("int") + 1).as("j"),
          pmod(col("k64"), lit(subDim)).cast("int").as("kk"),
          floor(col("x").cast("double") * 1000000).cast("long").as("xm"))
        .groupBy("m", "j", "kk")
        .agg(sum(col("xm")).as("sm"), count(lit(1)).as("n"))
        .collect()
      // Dataset.unpersist() would NOT release localCheckpoint blocks
      // (they are an RDD-level persist behind a LogicalRDD)
      graft.functions.Checkpoints.release(assigned)
      val byCell = sums.map(r => (r.getAs[Int]("m"), r.getAs[Int]("j"), r.getAs[Int]("kk")) ->
        (r.getAs[Long]("sm"), r.getAs[Long]("n"))).toMap
      cb = (0 until k).map { j =>
        cb(j).indices.map { i =>
          byCell.get((i / subDim, j, i % subDim)) match {
            case Some((sm, n)) => ((sm.toDouble / n) / 1000000.0).toFloat
            case None => cb(j)(i) // empty (m, j) cell keeps its centroid slice
          }
        }.toSeq
      }
    }
    cb
  }

  /** Micro-floored distance vector to every centroid — the deterministic
    * assignment metric of [[train]]: floor(d2·10⁶) as a long, so argmin
    * comparisons and the DuckDB oracle replay are bit-identical (the same
    * discipline [[trainPq]] and ml_kmeans_step use). */
  def microDistances(vec: Column, cents: Seq[Seq[Double]]): Column =
    graft.functions.VectorFunctions.l2CellDistances(vec, cents, micro = true)

  /** Scan-local cluster assignment by MICRO-FLOORED L2 argmin, first-match
    * (= lowest cid) tie-break — assignment against [[train]]ed centroids
    * that an oracle can replay exactly. */
  def assignMicro(vec: Column, cents: Seq[Seq[Double]]): Column = {
    val d = microDistances(vec, cents)
    (array_position(d, array_min(d)) - 1).cast("int")
  }

  /** Train k-means with deterministic init (the first k rows by id order).
    * Returns the final centroids plus the per-iteration inertia trace
    * (total squared distance BEFORE each update — non-increasing up to
    * micro-quantization, see below).
    *
    * Every engine-affecting number is integer-deterministic so a SQL
    * oracle can replay the training bit-for-bit (the ann_ivf_trained
    * gate): assignment compares micro-floored distances (floor(d2·10⁶)
    * longs, lowest-cid ties), and the update aggregates MICRO-QUANTIZED
    * coordinate sums — integer sums are order-free across partitions, so
    * the means (sm/n)/10⁶ come out identical however the shuffle lands.
    * Inertia is reported in the same micro units (/10⁶); quantizing the
    * means perturbs each coordinate by < 10⁻⁶, so the trace is
    * non-increasing only up to that rounding (consumers allow the
    * epsilon). */
  def train(vectors: DataFrame, vecCol: String, idCol: String,
            k: Int, iters: Int): Result = {
    val dim = vectors.select(size(col(vecCol))).head().getInt(0)
    var cents: Seq[Seq[Double]] = vectors
      .orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
    val inertia = Seq.newBuilder[Double]
    for (_ <- 0 until iters) {
      val dists = microDistances(col(vecCol), cents)
      // materialize the assignment BEFORE the posexplode below: a
      // projection collapsed above a Generate re-evaluates the k-way
      // argmin once per exploded dimension (64×)
      val assigned = vectors.select(
        (array_position(dists, array_min(dists)) - 1).cast("int").as("cluster"),
        array_min(dists).as("d"),
        col(vecCol).as("v"))
        .localCheckpoint()
      // one pass: inertia + (cluster, dim) sums/counts via posexplode
      val sums = assigned
        .select(col("cluster"), col("d"), posexplode(col("v")).as(Seq("kdim", "x")))
        .groupBy(col("cluster"), col("kdim"))
        .agg(sum(floor(col("x").cast("double") * 1000000).cast("long")).as("sm"),
          count(lit(1)).as("n"),
          sum(when(col("kdim") === 0, col("d")).otherwise(0L)).as("din"))
        .collect()
      // Dataset.unpersist() would NOT release localCheckpoint blocks
      // (they are an RDD-level persist behind a LogicalRDD)
      graft.functions.Checkpoints.release(assigned)
      inertia += sums.map(_.getAs[Long]("din")).sum / 1000000.0
      val byCluster = sums.groupBy(_.getAs[Int]("cluster"))
      cents = (0 until k).map { c =>
        byCluster.get(c) match {
          case Some(rows) =>
            val d = rows.sortBy(_.getAs[Int]("kdim"))
            d.map(r => (r.getAs[Long]("sm").toDouble / r.getAs[Long]("n")) / 1000000.0).toSeq
          case None => cents(c) // empty cluster keeps its centroid
        }
      }
      require(cents.forall(_.size == dim))
    }
    Result(cents, inertia.result())
  }
}
