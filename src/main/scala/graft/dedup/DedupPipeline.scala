package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.F

/** End-to-end near-dup grouping: LSH candidates → verify → connected
  * components.
  *
  * Candidate generation is MinHash+LSH band bucketing (the SAME buckets the
  * `dedup_minhash_lsh` statistics query reports): docs sharing a band key
  * are the only pairs ever compared, so the verify join is bucket-local —
  * at 100 TB pair cost is Σ|bucket|², never O(n²) over a lang/label block.
  * The Jaccard verify prunes candidates to real edges, and components form
  * by iterative min-label propagation — each round one join + one
  * aggregate, converging in O(component diameter) rounds. This is the
  * BSP/Pregel shape: no driver loop over data, only over rounds (bounded,
  * typically < 10).
  */
object DedupPipeline {

  /** 8 minhashes banded 2-per-band into 4 band keys (rows-per-band = 2). */
  val NumHashes = 8
  val Bands = 4

  /** Sorted-neighborhood window inside a bucket: each doc pairs with at
    * most this many successors in signature order. Buckets of ≤ W+1 docs
    * get exact all-pairs; a DEGENERATE bucket (thousands of templated
    * near-identical docs sharing one band key — real corpora have them)
    * degrades gracefully to W·n pairs instead of n²/2, with near-identical
    * docs adjacent in (rotated) sort order. At 100 TB this bound is the
    * difference between Σ|bucket|·W and an accidental quadratic blowup on
    * one hot bucket.
    *
    * W trades DIRECT pair-listing recall for cost inside dense cliques
    * (a k-clique holds k²/2 true pairs but the window emits ≤ k·W) —
    * what must NOT degrade is dedup GROUPING: every true near-dup pair
    * must land in one connected component via the chain of window edges.
    * Measured on sf0.01 (450 true J≥0.9 pairs, two ~78-doc cliques):
    * W=16 → 432/450 co-component (chains broke where adjacent docs
    * dipped under the verify threshold); W=32 → 450/450 with pair
    * recall 0.84. RecallSpec pins both floors. */
  val NeighborWindow = 32

  /** Band rows (id, band, bkey, sig) from the fused MinHash over a set
    * column: the md5 material is computed once per element
    * ([[F.minhashFulls]]), the 8 signatures are cheap slices, each band key
    * is the md5 of its 2 concatenated signatures, and `sig` (the full
    * signature concat) is the sorted-neighborhood sort key. */
  def bandBuckets(sets: DataFrame, idCol: String, setCol: String): DataFrame = {
    val withMh = sets
      .withColumn("__fulls", F.minhashFulls(col(setCol)))
      .withColumn("__mh", array((0 until NumHashes).map(i => F.minhashSig(col("__fulls"), i)): _*))
    withMh
      .select(col(idCol),
        explode(array((0 until Bands).map { b =>
          struct(lit(b).as("band"),
            md5(concat(element_at(col("__mh"), 2 * b + 1), element_at(col("__mh"), 2 * b + 2))).as("bkey"),
            // the band's ORDERING signature is the minhash sequence
            // ROTATED to start at this band's own hashes: everyone in the
            // bucket shares the leading two, and each further hash agrees
            // between a true near-dup pair w.p. ≈ J — so similar docs
            // sort ADJACENTLY in every band's bucket, which is what makes
            // the sorted-neighborhood window catch them. An unrotated
            // signature only orders band 0's buckets by similarity; the
            // other bands' buckets sort on unrelated leading hashes and
            // the window walks past true pairs (measured: pair recall
            // 0.47 → see RecallSpec's banding test).
            concat((0 until NumHashes).map(i =>
              element_at(col("__mh"), (2 * b + i) % NumHashes + 1)): _*).as("sig"))
        }: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bkey").as("bkey"),
        col("bb.sig").as("sig"))
  }

  /** Distinct candidate pairs (a_id < b_id) from band buckets, windowed:
    * rank each bucket by (sig, id), pair each row with its next
    * [[NeighborWindow]] rows only — via [[SortedNeighborhood]], so both
    * the rank and the frame are parallel even on a degenerate
    * templated-text mega-bucket (the naive bucket window runs each
    * bucket as one task; see SortedNeighborhood's doc). Per-bucket cost
    * stays min(n²/2, n·W); distinct() folds pairs sharing several bands.
    *
    * `stageKey` keys the materialized range-sort ([[graft.functions
    * .Staging]]); pass an explicit (dir, kind) tag when the bands plan
    * contains lambda-bearing expressions (their semantic hash is
    * unstable across invocations — see DedupQueries.pairStats). */
  def candidatePairs(bands: DataFrame, idCol: String,
                     window: Int = NeighborWindow,
                     stageKey: String = ""): DataFrame = {
    val key = if (stageKey.nonEmpty) stageKey else {
      val plan = bands.queryExecution.logical
      // the semanticHash fallback is UNSTABLE for lambda-bearing plans
      // (fresh NamedLambdaVariable ids per invocation): each call would
      // silently stage a fresh checkpoint, bounded only by Staging's LRU.
      // bandBuckets plans always carry lambdas (minhash over the set
      // column), so an omitted stageKey on the normal path is a caller
      // bug — surface it instead of paying the silent restage.
      val hasLambda = plan.exists(_.expressions.exists(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.LambdaFunction])))
      if (hasLambda)
        System.err.println("[graft] candidatePairs: stageKey omitted on a " +
          "lambda-bearing bands plan; semanticHash is unstable across calls " +
          "and each call stages a fresh checkpoint — pass an explicit stageKey")
      s"snb_rk#${plan.semanticHash()}"
    }
    SortedNeighborhood.withNeighbors(bands, Seq("sig", idCol), Seq(idCol), window, key)
      .select(col(idCol).as("x"), explode(col("__next")).as("nb"))
      .select(least(col("x"), col(s"nb.$idCol")).as("a_id"),
        greatest(col("x"), col(s"nb.$idCol")).as("b_id"))
      .distinct()
  }

  /** Distinct-token sets for sampled docs (the signature input). The
    * tokenize + downstream minhash are scan-local CPU-heavy work; fan a
    * 1-split input out first (round-14; identity on parallel inputs). */
  private def tokenSets(docs: DataFrame, sampleMod: Int): DataFrame =
    F.fanout(docs.filter(col("doc_id") % sampleMod === 0))
      .select(col("doc_id"), array_distinct(F.tokens(col("text"))).as("s"))

  /** Verified near-dup edges (symmetric): LSH-bucket candidates with
    * Jaccard ≥ threshold over the full distinct-token sets. */
  def edges(docs: DataFrame, threshold: Double, sampleMod: Int = 4): DataFrame = {
    // materialize the token sets once: they feed the signature pipeline
    // plus both sides of the verify join (three tokenize passes
    // otherwise); keyed staging so repeated calls reuse the blocks
    val setsKey = s"dedup_edges_sets#${docs.queryExecution.logical.semanticHash()}#$sampleMod"
    val d = graft.functions.Staging.staged(docs.sparkSession, setsKey)(
      tokenSets(docs, sampleMod))
    val pairs = candidatePairs(bandBuckets(d, "doc_id", "s"), "doc_id",
      stageKey = s"$setsKey#rk")
    val sa = d.select(col("doc_id").as("a_id"), col("s").as("sa"))
    val sb = d.select(col("doc_id").as("b_id"), col("s").as("sb"))
    val inter = size(array_intersect(col("sa"), col("sb"))).cast("double")
    val jac = inter / (size(col("sa")) + size(col("sb")) - inter)
    // pinned-width exchange of the COMPACT (a_id, b_id) pairs before the
    // verify join (round-15): the pairs arrive on the distinct's
    // AQE-coalesced output (1-2 partitions at bench SF — bytes are tiny,
    // but the per-pair set-intersection above is CPU-heavy), so the
    // verify stage serialized. Re-keying by a_id is ALSO the verify
    // join's own clustering requirement, so at corpus scale (where the
    // set sides stop broadcasting and the join becomes shuffled) this
    // exchange replaces the one the join would plan anyway.
    val wide = pairs.repartition(
      SortedNeighborhood.pinnedWidth(pairs), col("a_id"))
    val verified = wide.join(sa, Seq("a_id")).join(sb, Seq("b_id"))
      .filter(jac >= threshold)
      .select(col("a_id").as("a"), col("b_id").as("b"))
    verified.union(verified.select(col("b").as("a"), col("a").as("b")))
  }

  /** Connected components: label = min doc_id reachable. Converges to the
    * exact component minimum (fixpoint detected via label-change count).
    *
    * Each round does neighbor-min propagation PLUS path halving
    * (label(v) ← label(label(v)), the pointer-doubling shortcut): plain
    * neighbor propagation needs O(graph diameter) rounds, and LSH
    * sorted-neighborhood edges form near-path chains whose diameter grows
    * with the corpus — at sf0.1 they already exceeded a 20-round budget.
    * Halving makes convergence O(log diameter), which is what survives a
    * 100× corpus (labels are in-component node ids throughout, so the
    * shortcut join is labels⋈labels on the label key).
    *
    * Each round CHECKPOINTS: `next` embeds the previous labels plan plus
    * the edge plan, so without truncation the logical plan doubles per
    * round — plan compilation (and even plan stringification) goes
    * super-linear long before the data does. `localCheckpoint` materializes
    * and cuts lineage (the standard iterative-algorithm hygiene; a
    * cluster deployment with fault-tolerance needs would use a reliable
    * `checkpoint` dir instead). */
  def components(docs: DataFrame, threshold: Double = 0.9, sampleMod: Int = 4,
                 maxIters: Int = 20): DataFrame = {
    val d = tokenSets(docs, sampleMod).select(col("doc_id"))
    val e = edges(docs, threshold, sampleMod).localCheckpoint()
    var labels = d.select(col("doc_id").as("id"), col("doc_id").as("lbl")).localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val fromNeighbors = e.join(labels, e("a") === labels("id"))
        .groupBy(col("b").as("id2"))
        .agg(min(col("lbl")).as("nlbl"))
      // staged once: it feeds both sides of the halving self-join
      val prop = labels.join(fromNeighbors, labels("id") === col("id2"), "left")
        .select(col("id"), least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
        .localCheckpoint()
      // path halving: follow the label one hop (lbl is itself a node id
      // in the same component, so its label is reachable too)
      val parents = prop.select(col("id").as("pid"), col("lbl").as("plbl"))
      val next = prop.join(parents, prop("lbl") === col("pid"), "left")
        .select(prop("id"), least(prop("lbl"), coalesce(col("plbl"), prop("lbl"))).as("lbl"))
        .localCheckpoint()
      val changed = next.join(labels.withColumnRenamed("lbl", "old"), Seq("id"))
        .filter(col("lbl") < col("old")).count()
      graft.functions.Checkpoints.release(prop)
      graft.functions.Checkpoints.release(labels)
      labels = next
      converged = changed == 0
      iter += 1
    }
    graft.functions.Checkpoints.release(e)
    labels.select(col("id").as("doc_id"), col("lbl").as("component"))
  }
}
