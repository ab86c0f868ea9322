package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the corpus-analytics operators that the oracle gate can
  * pin only cell-by-cell: the PCA covariance feeds an actual power
  * iteration here (the oracle proves the cells; this proves they form the
  * matrix PCA needs), the Count-Min sketch's one-sided error contract is
  * checked against exact counts, and the PageRank step must conserve
  * probability mass to within its documented pico-quantization slack. */
class AnalyticsOpsSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("SCD2 fold: runs starting in the same millisecond chain by event order, not state name") {
    import spark.implicits._
    // ts is µs-precision and the ms truncation can land two state-runs on
    // the same millisecond — the pinned fixtures never do, so the tie is
    // covered here: state 'b' (event 1) precedes state 'a' (event 2) at
    // ms=100; ordering intervals by (valid_from_ms, state) would chain
    // 'a' before 'b' and leave the WRONG row current
    val e = Seq(
      (7L, "b", 100L, 1L),
      (7L, "a", 100L, 2L),
      (7L, "a", 250L, 3L)).toDF("user_id", "state", "ms", "event_id")
    val out = graft.queries.RelationalQueries.scd2Intervals(e).collect()
    assert(out.length == 2)
    val b = out.find(_.getString(1) == "b").get
    val a = out.find(_.getString(1) == "a").get
    assert(b.getLong(2) == 100L && b.getLong(3) == 100L, s"run 'b' must close at run 2's start: $b")
    assert(a.getLong(2) == 100L && a.isNullAt(3), s"run 'a' is the current row: $a")
    assert(a.getLong(4) == 2L && b.getLong(4) == 1L)
  }

  test("ml_pca_covariance cells power-iterate to the top principal component") {
    val cells = SparkEntry.queries("ml_pca_covariance")(spark, sf).collect()
    val n = cells.head.getLong(3)
    val d = 64
    val c = Array.ofDim[Double](d, d)
    cells.foreach { r =>
      val (i, j) = (r.getLong(0).toInt, r.getLong(1).toInt)
      val v = r.getLong(2).toDouble / 1e6 / n
      c(i)(j) = v; c(j)(i) = v
    }
    var v = Array.fill(d)(1.0 / math.sqrt(d))
    var lambda = 0.0
    for (_ <- 0 until 200) {
      val w = Array.tabulate(d)(i => (0 until d).map(j => c(i)(j) * v(j)).sum)
      lambda = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / lambda)
    }
    assert(lambda > 0, s"top eigenvalue $lambda not positive")
    // converged: C v = lambda v (the iterate is an actual eigenvector)
    val res = Array.tabulate(d)(i => (0 until d).map(j => c(i)(j) * v(j)).sum - lambda * v(i))
    val resNorm = math.sqrt(res.map(x => x * x).sum)
    // the synthetic corpus has a tight eigen-gap, so 200 rounds land at
    // residual/lambda ~ 1e-7; 1e-5 still pins "this IS an eigenvector"
    assert(resNorm <= 1e-5 * lambda, s"power iteration residual $resNorm vs lambda $lambda")
    // the top PC captures at least as much variance as every raw axis
    val vCv = (0 until d).map(i => (0 until d).map(j => v(i) * c(i)(j) * v(j)).sum).sum
    val maxDiag = (0 until d).map(i => c(i)(i)).max
    assert(vCv >= maxDiag - 1e-9, s"top-PC variance $vCv below best axis $maxDiag")
  }

  test("CMS estimates are one-sided: est >= exact, and within the width-error envelope") {
    val rows = SparkEntry.queries("sketch_cms_estimate")(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length == 20)
    val totalTokens = SparkEntry.queries("sketch_cms_cells")(spark, "/root/testdata/sf0.01")
      .filter("r = 0").agg(org.apache.spark.sql.functions.sum("cnt")).head().getLong(0)
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"CMS under-estimated ${r.getString(0)}: $est < $exact")
      // deterministic-practical envelope: min over CmsRows rows keeps the
      // collision overshoot well under 2N/width (the expected single-row
      // overshoot is N/width; 4-row min is far tighter)
      assert(est - exact <= 2L * totalTokens / graft.queries.ScaleQueries.CmsWidth,
        s"CMS overshoot ${est - exact} outside envelope for ${r.getString(0)}")
    }
  }

  test("PageRank step conserves probability mass within pico-quantization slack") {
    val rows = SparkEntry.queries("graph_pagerank_step")(spark, sf).collect()
    val n = rows.length
    assert(n > 0)
    val base = rows.map(_.getLong(1)).min
    assert(base > 0, "base rank must be positive")
    val mass = rows.map(_.getLong(1)).sum
    val edges = rows.map(_.getLong(2)).sum // each directed edge credited once
    // every floor() loses < 1 pico-unit: n base terms + `edges` contributions
    val slack = n + edges + 1
    assert(mass <= 1000000000000L + 2 && mass >= 1000000000000L - slack,
      s"rank mass $mass outside [1e12 - $slack, 1e12 + 2] (n=$n, edges=$edges)")
    rows.foreach(r => assert(r.getLong(1) >= base))
  }

  test("KMV estimate lands within the 4-sigma order-statistic envelope of exact") {
    val r = SparkEntry.queries("sketch_kmv_distinct")(spark, "/root/testdata/sf0.01").head()
    val (exact, est, k) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(k == graft.queries.ScaleQueries.KmvK, s"sketch not full: k=$k")
    assert(exact > k, "fixture vocabulary must exceed the sketch size")
    // KMV relative std error ~ 1/sqrt(k-2) ≈ 6.3% at k=256; 4 sigma
    val tol = 4.0 / math.sqrt(k - 2.0)
    assert(math.abs(est - exact) <= tol * exact,
      s"KMV estimate $est vs exact $exact outside ±${(tol * 100).round}%")
  }

  test("HLL estimate lands within the 4-sigma register envelope of exact") {
    val r = SparkEntry.queries("sketch_hll_distinct")(spark, "/root/testdata/sf0.01").head()
    val (exact, nHit, sScaled, estMicro) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nHit <= 1024, s"more registers hit than exist: $nHit")
    // a corpus far above m should touch (almost) every register
    assert(nHit >= 1000, s"fixture too small to exercise the sketch: $nHit registers")
    // s_scaled is bounded by all-empty (1024 * 2^51) and positive
    assert(sScaled > 0 && sScaled <= 1024L * (1L << 51), s"s_scaled $sScaled out of range")
    // HLL relative std error = 1.04/sqrt(m) ≈ 3.25% at m=1024; 4 sigma
    val est = estMicro / 1e6
    val tol = 4.0 * 1.04 / math.sqrt(1024.0)
    assert(math.abs(est - exact) <= tol * exact,
      s"HLL estimate $est vs exact $exact outside ±${(tol * 100).round}%")
  }

  test("triangle count matches a brute-force count over the same co-presence edges") {
    import org.apache.spark.sql.functions.{col, date_trunc}
    val r = SparkEntry.queries("graph_triangle_count")(spark, sf).head()
    val (nVertices, nEdges, nTriangles) = (r.getLong(0), r.getLong(1), r.getLong(2))

    // independent reference: same W=2 sorted-neighborhood edge rule,
    // counted by naive common-neighbor intersection on the driver
    val groups = graft.queries.events(spark, sf)
      .select(date_trunc("hour", col("ts")).as("hr"), col("event_type"), col("user_id"))
      .distinct().collect()
      .groupBy(row => (row.get(0), row.getString(1)))
    val edges = groups.values.flatMap { rows =>
      val us = rows.map(_.getLong(2)).distinct.sorted
      us.indices.flatMap(i => Seq(1, 2).flatMap(o =>
        if (i + o < us.length) Some((us(i), us(i + o))) else None))
    }.toSet
    val adj = edges.foldLeft(Map.empty[Long, Set[Long]]) { case (m, (a, b)) =>
      m.updated(a, m.getOrElse(a, Set.empty) + b).updated(b, m.getOrElse(b, Set.empty) + a)
    }
    val bruteTriangles = edges.toSeq.map { case (a, b) => (adj(a) & adj(b) - a - b).size }.sum / 3
    assert(nEdges == edges.size, s"edge count $nEdges != reference ${edges.size}")
    assert(nVertices == adj.size, s"vertex count $nVertices != reference ${adj.size}")
    assert(nTriangles == bruteTriangles,
      s"degree-oriented count $nTriangles != brute-force $bruteTriangles")
    assert(nTriangles > 0, "fixture graph has no triangles — spec is vacuous")
  }

  test("histogram quantiles: each estimate's bin CONTAINS the exact ceil-rank order statistic") {
    val sfDir = "/root/testdata/sf0.01"
    val est = SparkEntry.queries("sketch_quantile_hist")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    // exact order statistics under the SAME rank convention the sketch
    // uses (value at 1-based rank ceil(q·n)), replayed driver-side
    val cents = graft.queries.events(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.expr("CAST(round(value * 100, 0) AS BIGINT)").as("c"))
      .collect().groupBy(_.getString(0))
      .map { case (t, rs) => t -> rs.map(_.getLong(1)).sorted }
    val all = cents.values.flatten
    val (mn, mx) = (all.min, all.max)
    // integer-division bin width upper bound PLUS the floor/ceil edge
    // slack: bin b's smallest member is ceil(b·R/1024) while the reported
    // edge is floor(b·R/1024), so a legit member can sit at edge + R/1024 + 1
    val width = (mx - mn + 1) / 1024 + 2
    assert(est.keySet == cents.keySet)
    est.foreach { case (t, (p50, p90, p99)) =>
      val vs = cents(t)
      def rankVal(pct: Int): Long = vs((vs.length * pct + 99) / 100 - 1)
      Seq((p50, 50), (p90, 90), (p99, 99)).foreach { case (edge, pct) =>
        val v = rankVal(pct)
        assert(edge <= v && v < edge + width,
          s"$t p$pct: order stat $v outside its estimated bin [$edge, ${edge + width})")
      }
    }
  }

  test("k-core peel equals a driver-side two-round peel over the same edges") {
    import org.apache.spark.sql.functions.{col, date_trunc}
    val got = SparkEntry.queries("graph_kcore_peel")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    val groups = graft.queries.events(spark, sf)
      .select(date_trunc("hour", col("ts")).as("hr"), col("event_type"), col("user_id"))
      .distinct().collect()
      .groupBy(row => (row.get(0), row.getString(1)))
    val edges = groups.values.flatMap { rows =>
      val us = rows.map(_.getLong(2)).distinct.sorted
      us.indices.flatMap(i => Seq(1, 2).flatMap(o =>
        if (i + o < us.length) Some((us(i), us(i + o))) else None))
    }.toSet
    def degs(es: Set[(Long, Long)]): Map[Long, Int] =
      (es.toSeq.map(_._1) ++ es.toSeq.map(_._2)).groupBy(identity)
        .map { case (u, xs) => u -> xs.length }
    def peel(es: Set[(Long, Long)]): Set[(Long, Long)] = {
      val alive = degs(es).filter(_._2 >= 3).keySet
      es.filter { case (a, b) => alive(a) && alive(b) }
    }
    val d0 = degs(edges)
    val d2 = degs(peel(peel(edges)))
    assert(got.keySet == d2.keySet, s"survivor sets diverge: ${got.keySet} vs ${d2.keySet}")
    assert(d2.nonEmpty, "fixture graph has no 2-round 3-core — spec is vacuous")
    got.foreach { case (u, (deg0, deg2)) =>
      assert(deg0 == d0(u) && deg2 == d2(u), s"vertex $u: ($deg0, $deg2) vs (${d0(u)}, ${d2(u)})")
      assert(deg2 <= deg0, s"vertex $u gained degree while peeling")
    }
  }

  test("Bloom decontamination has no false negatives vs the exact gram join") {
    val bloom = SparkEntry.queries("curation_bloom_decontam")(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val exact = SparkEntry.queries("curation_decontaminate")(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact.nonEmpty, "exact decontamination found nothing to compare against")
    // every truly-shared gram hits all its own bloom positions, so each
    // contaminated doc must be flagged with at least its exact count
    exact.foreach { case (doc, nShared) =>
      val flagged = bloom.getOrElse(doc, 0L)
      assert(flagged >= nShared,
        s"doc $doc: bloom flagged $flagged < exact shared $nShared (false negative)")
    }
  }

  test("linear probe training replays the exact 3-step GD arithmetic and reduces the loss") {
    import org.apache.spark.sql.functions.{array, array_distinct, col, filter, greatest, lit, size, when}
    val got = SparkEntry.queries("ml_linear_probe_train")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // independent driver-side replication of the whole trainer from the
    // raw features: same micro-flooring, same fixed-order dot product
    val toks = graft.functions.F.tokens(col("text"))
    val nTok = greatest(size(toks), lit(1)).cast("double")
    val rows = graft.queries.table(spark, sf, "documents").select(
      when(col("lang") === "en", 1.0).otherwise(0.0).as("y"),
      array(
        lit(1.0),
        size(array_distinct(toks)).cast("double") / nTok,
        size(filter(toks, t => t.isin("the", "and", "of", "to", "a"))).cast("double") / nTok,
        size(toks).cast("double") / 1000.0).as("x"))
      .collect().map(r => (r.getDouble(0), r.getSeq[Double](1).toArray))
    def step(w: Array[Long]): Array[Long] = {
      val g = Array.fill(4)(0L)
      rows.foreach { case (y, x) =>
        val dot = (0 until 4).map(k => w(k).toDouble / 1e6 * x(k)).sum
        (0 until 4).foreach(k => g(k) += math.floor((dot - y) * x(k) * 1000000).toLong)
      }
      Array.tabulate(4)(k => w(k) - math.floor(g(k).toDouble / (10.0 * rows.length)).toLong)
    }
    val w3 = step(step(step(Array(0L, 0L, 0L, 0L))))
    (0 until 4).foreach(k =>
      assert(got(k.toLong) == w3(k), s"w[$k]: query ${got(k.toLong)} != replication ${w3(k)}"))

    // and the probe actually learns: squared error strictly drops
    def loss(w: Array[Long]): Double = rows.map { case (y, x) =>
      val r = (0 until 4).map(k => w(k).toDouble / 1e6 * x(k)).sum - y
      r * r
    }.sum
    assert(loss(w3) < loss(Array(0L, 0L, 0L, 0L)),
      s"3 GD steps did not reduce the loss: ${loss(w3)} vs ${loss(Array(0L, 0L, 0L, 0L))}")
  }

  test("source-overlap matrix equals a driver-side shingle-set intersection replay") {
    val got = SparkEntry.queries("curation_source_overlap")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val docs = graft.queries.table(spark, sf, "documents").collect()
      .map(r => r.getString(3) -> r.getString(1)) // (source, text)
    val bySource = docs.groupBy(_._1).map { case (s, xs) =>
      s -> xs.flatMap { case (_, text) =>
        val ts = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
        ts.sliding(5).filter(_.length == 5).map(_.mkString(" "))
      }.toSet
    }
    val sources = bySource.keys.toSeq.sorted
    for (a <- sources; b <- sources if a < b) {
      val shared = (bySource(a) & bySource(b)).size.toLong
      val want =
        if (shared == 0) None
        else Some((shared, shared * 1000000L / math.min(bySource(a).size, bySource(b).size)))
      assert(got.get((a, b)) == want, s"($a, $b): ${got.get((a, b))} vs $want")
    }
  }

  test("a synthetic far-out vector trips the outlier flag (the fixtures never do)") {
    import spark.implicits._
    // 40 near-uniform unit-ish vectors plus ONE at 10x the radius: the
    // fixture corpora are too uniform to ever fire the 4x-mean rule, so
    // without this the query's true branch would be spec-invisible
    val r = new scala.util.Random(11)
    val normal = (0L until 40L).map(i =>
      (i, Array.fill(8)((r.nextDouble() - 0.5).toFloat)))
    val far = (99L, Array.fill(8)(5.0f))
    val flags = graft.queries.ScaleQueries.outlierFlags(
      (normal :+ far).toDF("vec_id", "embedding")).collect()
      .map(row => row.getLong(0) -> row.getBoolean(2)).toMap
    assert(flags(99L), "the far-out vector was not flagged")
    assert(normal.forall { case (i, _) => !flags(i) },
      "a near-uniform vector was falsely flagged")
  }

  test("embedding outlier flags equal a driver-side centroid-distance replay") {
    val got = SparkEntry.queries("embed_outlier_flags")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val vecs = graft.queries.table(spark, sf, "embeddings").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val n = vecs.length
    val mu = Array.tabulate(64) { k =>
      vecs.map(v => math.floor(v._2(k).toDouble * 1000000).toLong).sum.toDouble / (n * 1000000L)
    }
    val d2 = vecs.map { case (id, v) =>
      id -> (0 until 64).map { k =>
        val d = v(k).toDouble - mu(k)
        math.floor(d * d * 1000000).toLong
      }.sum
    }.toMap
    val s1 = d2.values.sum
    assert(got.keySet == d2.keySet)
    val outliers = got.count(_._2._2)
    d2.foreach { case (id, dd) =>
      assert(got(id)._1 == dd, s"vec $id: d2 ${got(id)._1} != replay $dd")
      assert(got(id)._2 == (dd * n > 4 * s1), s"vec $id: flag mismatch")
    }
    info(s"$outliers/$n vectors flagged beyond 4x the mean squared distance")
  }

  test("label propagation adopts the majority seed label with deterministic ties") {
    val rows = SparkEntry.queries("graph_label_prop")(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    val propagated = rows.filter(_.getBoolean(3))
    assert(propagated.nonEmpty, "graph has no labeled neighborhoods at sf0.01")
    rows.foreach { r =>
      val (doc, label, support) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(label >= 0 && label < 7, s"doc $doc: label $label outside seed space")
      if (r.getBoolean(3)) assert(support >= 1, s"doc $doc propagated without support")
      else {
        // unlabeled neighborhood: the node must be a seed keeping its own label
        assert(doc % 3 == 0 && label == doc % 7,
          s"doc $doc: non-propagated node must keep its seed label")
        assert(support == 0)
      }
    }
  }
}
