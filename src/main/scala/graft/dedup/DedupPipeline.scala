package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.F

/** End-to-end near-dup grouping: candidates → verify → connected
  * components.
  *
  * Blocking keeps the pair join block-local (lang block here; LSH band
  * buckets in the general case — see DedupQueries), the Jaccard verify
  * prunes to real edges, and components form by iterative min-label
  * propagation — each round is one join + one aggregate, converging in
  * O(component diameter) rounds. This is the BSP/Pregel shape: no driver
  * loop over data, only over rounds (bounded, typically < 10).
  */
object DedupPipeline {

  /** Distinct-token sets for sampled docs (the signature input). */
  private def tokenSets(docs: DataFrame, sampleMod: Int): DataFrame =
    docs.filter(col("doc_id") % sampleMod === 0)
      .select(col("doc_id"), col("lang"),
        array_distinct(F.tokens(col("text"))).as("s"))

  /** Verified near-dup edges (symmetric), Jaccard ≥ threshold within
    * lang blocks. */
  def edges(docs: DataFrame, threshold: Double, sampleMod: Int = 4): DataFrame = {
    val d = tokenSets(docs, sampleMod)
    val a = d.select(col("doc_id").as("a"), col("lang").as("la"), col("s").as("sa"))
    val b = d.select(col("doc_id").as("b"), col("lang").as("lb"), col("s").as("sb"))
    val inter = size(array_intersect(col("sa"), col("sb"))).cast("double")
    val jac = inter / (size(col("sa")) + size(col("sb")) - inter)
    a.join(b, col("la") === col("lb") && col("a") =!= col("b"))
      .filter(jac >= threshold)
      .select(col("a"), col("b"))
  }

  /** Connected components: label = min doc_id reachable. Converges to the
    * exact component minimum (fixpoint detected via label-sum delta). */
  def components(docs: DataFrame, threshold: Double = 0.9, sampleMod: Int = 4,
                 maxIters: Int = 20): DataFrame = {
    val d = tokenSets(docs, sampleMod).select(col("doc_id"))
    val e = edges(docs, threshold, sampleMod).cache()
    var labels = d.select(col("doc_id").as("id"), col("doc_id").as("lbl")).cache()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val fromNeighbors = e.join(labels, e("a") === labels("id"))
        .groupBy(col("b").as("id2"))
        .agg(min(col("lbl")).as("nlbl"))
      val next = labels.join(fromNeighbors, labels("id") === col("id2"), "left")
        .select(col("id"), least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
        .cache()
      val changed = next.join(labels.withColumnRenamed("lbl", "old"), Seq("id"))
        .filter(col("lbl") < col("old")).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    labels.select(col("id").as("doc_id"), col("lbl").as("component"))
  }
}
