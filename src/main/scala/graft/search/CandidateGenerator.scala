package graft.search

import org.apache.spark.sql.DataFrame
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
  */
final class IvfGenerator(
    ann: DataFrame,
    centroids: Seq[Seq[Double]],
    nprobe: Int) extends CandidateGenerator {
  require(centroids.nonEmpty, "IVF index has no centroids")
  require(nprobe >= 1, "nprobe must be >= 1")

  override val mode: String = s"ivf(cells=${centroids.size},nprobe=$nprobe)"

  override def candidates(qv: Array[Float], depth: Int): DataFrame = {
    val cells = IvfGenerator.nearestCells(qv, centroids, nprobe)
    ann.filter(col("cid").isin(cells: _*))
      .select(col("id"), cosineSim(col("embedding"), typedLit(qv)).as("sem_score"))
  }
}

object IvfGenerator {
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
