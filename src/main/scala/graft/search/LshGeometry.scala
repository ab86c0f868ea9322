package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.VectorFunctions.cosineSim

/** Auto-derivation of multi-table sign-LSH banding geometry from a cheap
  * corpus statistic — the round-7 finding: a user picking LSH on a
  * flat-distribution corpus at the blind default (8 tables × 8
  * hyperplanes) silently got recall\@10 ≈ 0.21 (0.00 single-table),
  * because for sign-LSH the per-hyperplane collision probability of a
  * neighbor at angle θ is p₁ = 1 − θ/π (Goemans–Williamson / Charikar,
  * SimHash), and a near-uniform corpus puts the true k-NN at θ ≈ 69° →
  * p₁ ≈ 0.6, so an 8-bit band collides at p₁⁸ ≈ 0.02 per table.
  *
  * The heuristic measures the mean k-NN angle on a BOUNDED sample
  * (numQueries × ≤corpusCap exact-scored pairs — one broadcast, no
  * shuffle of the corpus side beyond a stride filter), then picks the
  * DEEPEST band b ≤ maxBits whose L-table union recall
  * 1 − (1 − p₁ᵇ)^L still clears the target. Deeper bands = smaller
  * buckets = fewer candidates scored, so this returns the most-pruning
  * geometry that honors the recall contract — and on a corpus where no
  * b ≥ 1 clears it, b = 1 with the expectation REPORTED, never silent.
  *
  * Sub-sampling the corpus side biases θ̂ UP (the sample's kth neighbor
  * is farther than the corpus's), hence p₁ down, hence b down — i.e.
  * the estimate errs toward MORE recall than the target, never less.
  *
  * Cost/recall at scale (docs/PLANS.md): on a near-uniform corpus the
  * chosen b is small, so each query scores L/2ᵇ of the corpus — LSH
  * fundamentally cannot prune a flat distribution hard AND hit high
  * recall; the geometry makes that trade explicit instead of silently
  * collapsing. On clustered corpora θ̂ is small, b lands at maxBits,
  * and pruning is real. Exactness bar unchanged: candidates are always
  * exact-cosine re-ranked (vector_store.cpp:206-237 semantics).
  */
object LshGeometry {

  final case class Geometry(tables: Int, bits: Int, thetaDeg: Double,
                            p1: Double, expectedRecall: Double) {
    def params: String =
      f"tables=$tables,hyperplanes=$bits,theta=$thetaDeg%.1f,expected=$expectedRecall%.2f"
  }

  /** Mean angle (radians) between a sampled query vector and its k exact
    * nearest neighbors, averaged over ranks 1..k and queries. Bounded
    * work: numQueries stride-sampled queries × a stride-capped corpus
    * side (≤ corpusCap rows) — the corpus never shuffles; the sample
    * broadcasts. */
  def estimateKnnAngle(corpus: DataFrame, idCol: String, vecCol: String,
                       k: Int = 10, numQueries: Int = 16,
                       corpusCap: Long = 4096L): Double = {
    val e = corpus.select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("embedding"))
    val n = e.count()
    val qStride = math.max(1L, n / numQueries)
    val qs = e.filter(pmod(col("vec_id"), lit(qStride)) === 0 &&
        col("vec_id") < qStride * numQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val cStride = math.max(1L, n / corpusCap)
    val side = e.filter(pmod(col("vec_id"), lit(cStride)) === 0)
    val scored = side.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), cosineSim(col("embedding"), col("qv")).as("c"))
      // vec_id tie-break: duplicate vectors (exact cosine ties at the
      // rank-k cutoff — common in dedup corpora) must not make θ̂
      // partition-order-dependent, or choose() could flip bands between
      // runs of the same corpus
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("c").desc, col("vec_id"))))
      .filter(col("rk") <= k)
      .agg(avg(acos(least(greatest(col("c"), lit(-1.0)), lit(1.0)))).as("theta"))
      .head()
    // degenerate corpus (0–1 vectors → zero scored pairs → null avg):
    // fall back to the uniform-random prior θ = π/2 (p₁ = 0.5) — the
    // most conservative band — instead of NPE-ing the entry point
    if (scored.isNullAt(0)) math.Pi / 2 else scored.getDouble(0)
  }

  /** Union recall of L b-bit tables at per-hyperplane collision p₁,
    * treating each neighbor independently: 1 − (1 − p₁ᵇ)^L. */
  def expectedRecall(p1: Double, bits: Int, tables: Int): Double =
    1.0 - math.pow(1.0 - math.pow(p1, bits), tables)

  /** Deepest band b ∈ [1, maxBits] whose expected union recall clears
    * `targetRecall` at `tables` tables; b = 1 (widest buckets) when even
    * that can't — the expectation is in the returned Geometry either way,
    * so the caller sees the contract it's getting. */
  def choose(thetaRad: Double, targetRecall: Double = 0.7,
             tables: Int = 8, maxBits: Int = 16): Geometry = {
    val p1 = math.max(0.0, math.min(1.0, 1.0 - thetaRad / math.Pi))
    val bits = (maxBits to 1 by -1)
      .find(b => expectedRecall(p1, b, tables) >= targetRecall)
      .getOrElse(1)
    Geometry(tables, bits, math.toDegrees(thetaRad), p1,
      expectedRecall(p1, bits, tables))
  }

  /** estimate + choose in one call. */
  def autoGeometry(corpus: DataFrame, idCol: String, vecCol: String,
                   k: Int = 10, targetRecall: Double = 0.7,
                   tables: Int = 8, maxBits: Int = 16,
                   numQueries: Int = 16, corpusCap: Long = 4096L): Geometry =
    choose(estimateKnnAngle(corpus, idCol, vecCol, k, numQueries, corpusCap),
      targetRecall, tables, maxBits)

  /** Deterministic gaussian hyperplanes for the chosen geometry, as a
    * broadcastable (tbl, hid, he) frame — tables·bits·dim floats, always
    * driver-sized. Seeded: the same geometry re-derives the same planes
    * (index persistence / replay). */
  def hyperplanes(spark: SparkSession, geom: Geometry, dim: Int,
                  seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val rows = for (t <- 0 until geom.tables; h <- 0 until geom.bits) yield {
      val r = new scala.util.Random(seed + 1000003L * t + 131L * h)
      (t, h, Array.fill(dim)(r.nextGaussian().toFloat).toSeq)
    }
    rows.toDF("tbl", "hid", "he")
  }
}
