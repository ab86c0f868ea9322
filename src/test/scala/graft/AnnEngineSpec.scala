package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Engine
import graft.model.SearchOptions
import graft.search.{AnnIndex, IvfGenerator}
import graft.store.Workspace

/** The ANN-in-the-live-engine seam, end to end: the IVF index is built at
  * index() time, persisted cid-partitioned, probed by search(), prunes the
  * parquet scan to its probed partitions, and loses bounded recall vs the
  * exact scan — with the exact mode byte-identical to the pre-seam engine.
  */
class AnnEngineSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs100 =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)

  // ---- unit: probe selection

  test("nearestCells: orders by squared L2, ties broken by lowest cid") {
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(1.0, 0.0)) // 0 and 2 tie
    val picked = IvfGenerator.nearestCells(Array(1.0f, 0.0f), cents, nprobe = 2)
    assert(picked == Seq(0, 2)) // both zero-distance; lowest cid first
    val far = IvfGenerator.nearestCells(Array(0.0f, 1.0f), cents, nprobe = 1)
    assert(far == Seq(1))
  }

  test("nearestCells: dimension mismatch fails loudly, never truncates") {
    val cents = Seq(Seq(1.0, 0.0, 0.0))
    intercept[IllegalArgumentException] {
      IvfGenerator.nearestCells(Array(1.0f, 0.0f), cents, 1)
    }
  }

  // ---- unit: index construction

  test("AnnIndex.build: clamps k to corpus size, rejects empty corpus, drops null embeddings") {
    import spark.implicits._
    val tiny = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, null.asInstanceOf[Array[Float]])).toDF("id", "embedding")
    val (vectors, cents) = AnnIndex.build(tiny, "id", "embedding", cells = 16)
    assert(cents.size == 2) // k > n clamps to the 2 non-null rows
    val rows = vectors.collect()
    assert(rows.map(_.getAs[Long]("id")).toSet == Set(1L, 2L)) // null row excluded
    assert(rows.forall(r => !r.isNullAt(r.fieldIndex("cid"))))

    val empty = Seq.empty[(Long, Array[Float])].toDF("id", "embedding")
    intercept[IllegalArgumentException] { AnnIndex.build(empty, "id", "embedding") }
  }

  test("KMeans.assign: argmin L2 with first-match (lowest cid) tie-break") {
    import spark.implicits._
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(1.0, 0.0))
    val df = Seq(
      (1L, Array(1.0f, 0.0f)),   // ties cells 0 and 2 → 0
      (2L, Array(0.0f, 1.0f)),   // cell 1
      (3L, Array(0.9f, 0.1f)))   // nearest cell 0
      .toDF("id", "v")
      .select(col("id"), graft.ml.KMeans.assign(col("v"), cents).as("cid"))
    assert(df.orderBy("id").collect().map(_.getInt(1)).toSeq == Seq(0, 1, 0))
  }

  test("Workspace ANN persistence round-trips vectors and centroids") {
    import spark.implicits._
    val ws = new Workspace(spark, Files.createTempDirectory("graft-annrt-").toString)
    val vectors = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.0f, 1.0f), 1))
      .toDF("id", "embedding", "cid")
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    assert(!ws.hasAnn)
    ws.writeAnn(vectors, cents)
    assert(ws.hasAnn)
    assert(ws.readAnnCentroids() == cents) // ordered by cid, read by name
    val back = ws.readAnn().orderBy("id").collect()
    assert(back.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L))
    assert(back.map(_.getAs[Int]("cid")).toSeq == Seq(0, 1))
  }

  // ---- the wired facade

  test("annMode=ivf: index() builds the cell index and search() probes it; nprobe=cells is byte-identical to exact") {
    val root = Files.createTempDirectory("graft-annwire-").toString
    val q = "what is a merge window"

    val exact = Engine.open(spark, root, "exact")
    exact.index(docs100)
    assert(!exact.workspace.hasAnn) // exact mode builds no index
    val exactHits = exact.search(q)
    assert(exactHits.size == 5)

    // full probe = every cell scanned = the exact candidate set: scores and
    // order must match the exact engine bit for bit (zero recall loss)
    val full = Engine.open(spark, root, "ivf_full",
      SearchOptions(annMode = "ivf", annCells = 8, annProbes = 8))
    full.index(docs100)
    assert(full.workspace.hasAnn)
    val fullHits = full.search(q)
    assert(fullHits.map(h => (h.id, h.score, h.semanticRank)) ==
      exactHits.map(h => (h.id, h.score, h.semanticRank)))

    // partial probe: sane top-k (k rows, positive scores, no duplicates)
    val part = Engine.open(spark, root, "ivf_part",
      SearchOptions(annMode = "ivf", annCells = 8, annProbes = 2))
    part.index(docs100)
    val partHits = part.search(q)
    assert(partHits.size == 5)
    assert(partHits.map(_.id).distinct.size == 5)
    assert(partHits.forall(_.score > 0))
  }

  test("chooseNprobe: clustered corpus derives a narrow probe, spread-out neighbors force a wide one") {
    import spark.implicits._
    // 4 tight clusters on orthogonal axes: every true neighbor shares its
    // query's cell, so coverage(1) = 1.0 and the derived nprobe is 1
    val dim = 4
    val clustered = (0 until 80).map { i =>
      val axis = i % 4
      val v = Array.fill(dim)(0.001f * (i % 7))
      v(axis) = 1.0f
      (i.toLong, v)
    }.toDF("id", "embedding")
    val (cv, cc) = AnnIndex.build(clustered, "id", "embedding", cells = 4, iters = 4)
    assert(AnnIndex.chooseNprobe(cv, cc, target = 0.9, k = 3) == 1)

    // adversarial geometry: force every vector into its OWN far-apart cell
    // (cells = n), so each of the k true neighbors lives in a different
    // cell and coverage(np) grows only linearly — target 0.9 over k=3
    // needs np ≥ 3 even in preference order
    val spread = (0 until 8).map { i =>
      val v = Array.fill(8)(0.0f); v(i) = 1.0f; (i.toLong, v)
    }.toDF("id", "embedding")
    val (sv, sc) = AnnIndex.build(spread, "id", "embedding", cells = 8, iters = 4)
    val np = AnnIndex.chooseNprobe(sv, sc, target = 0.9, k = 3)
    assert(np >= 3, s"orthogonal singleton cells need wide probes, got $np")

    // degenerate shapes never crash and never return < 1
    assert(AnnIndex.chooseNprobe(sv.limit(1), sc, target = 0.9) == 1)
    assert(AnnIndex.chooseNprobe(sv, sc.take(1), target = 0.9) == 1)
  }

  test("annProbes=0: index() persists the derived nprobe and search() serves with it") {
    val root = Files.createTempDirectory("graft-annauto-").toString
    val auto = Engine.open(spark, root, "ws",
      SearchOptions(annMode = "ivf", annCells = 8, annProbes = 0))
    auto.index(docs100)
    val recorded = auto.workspace.getMeta("ann_nprobe").map(_.toInt)
    assert(recorded.isDefined, "auto mode must persist the derived nprobe")
    assert(recorded.get >= 1 && recorded.get <= 8, s"derived nprobe out of range: $recorded")
    val hits = auto.search("what is a merge window")
    assert(hits.size == 5)
    assert(hits.map(_.id).distinct.size == 5)
    // a fixed-probe engine on the same workspace ignores the recorded knob
    val fixed = Engine.open(spark, root, "ws",
      SearchOptions(annMode = "ivf", annCells = 8, annProbes = 8))
    assert(fixed.search("what is a merge window").size == 5)
  }

  test("re-indexing through a NON-ivf engine drops a previously built ANN index (no stale probes)") {
    val root = Files.createTempDirectory("graft-annstale-").toString
    val ivf = Engine.open(spark, root, "ws",
      SearchOptions(annMode = "ivf", annCells = 8, annProbes = 2))
    ivf.index(docs100)
    assert(ivf.workspace.hasAnn)
    // the same workspace re-indexed by a default (exact) engine: the old
    // index now references a replaced chunk table — it must not survive
    // for a later ivf engine to silently probe
    val exact = Engine.open(spark, root, "ws")
    exact.index(docs100.limit(50))
    assert(!exact.workspace.hasAnn, "stale ANN index survived a non-ivf re-index")
    // and a fresh ivf engine on the re-indexed workspace falls back to the
    // exact scan (sane results) instead of probing dead ids
    val again = Engine.open(spark, root, "ws",
      SearchOptions(annMode = "ivf", annCells = 8, annProbes = 2))
    assert(again.search("what is a merge window").size == 5)
  }

  test("annMode=ivf on a workspace without an index falls back to the exact scan") {
    val root = Files.createTempDirectory("graft-annfb-").toString
    val exact = Engine.open(spark, root, "ws")
    exact.index(docs100)
    // same workspace, ivf options, but no ann/ dir was ever built
    val ivf = Engine.open(spark, root, "ws",
      SearchOptions(annMode = "ivf"))
    assert(!ivf.workspace.hasAnn)
    val hits = ivf.search("what is a merge window")
    assert(hits.size == 5) // search still works, exact semantics
  }

  test("summarizeSections keeps the ANN index fresh: summary chunks are probe-visible") {
    val root = Files.createTempDirectory("graft-annsum-").toString
    val e = Engine.open(spark, root, "main",
      SearchOptions(annMode = "ivf", annCells = 4, annProbes = 4))
    e.index(docs100.limit(40))
    val before = e.workspace.readAnn().count()
    val added = e.summarizeSections()
    assert(added > 0)
    // the rebuilt index covers the appended summary rows too
    assert(e.workspace.readAnn().count() == before + added)
  }

  // ---- recall: the probe loses bounded recall vs exact

  test("IVF probe recall@10 >= 0.9 vs the exact scan on a clustered fixture corpus") {
    // IVF's contract is high recall on CLUSTERED embeddings (real embedders
    // place related text together); a hash-ngram space over unrelated docs
    // is near-uniform and any cell subset loses mass. The fixture is 512
    // vectors in 8 well-separated Gaussian blobs — interleaved so the
    // trainer's deterministic init (first k rows by id) seeds one centroid
    // per blob — probed through the REAL persisted parquet index.
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val dim = 64
    val centers = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian() * 5.0))
    val vectors = (0 until 512).map { i =>
      val c = centers(i % 8) // id % 8 = blob: ids 0..7 cover all blobs
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.3).toFloat))
    }
    val ws = new Workspace(spark, Files.createTempDirectory("graft-annrec-").toString)
    val (built, cents) = AnnIndex.build(
      vectors.toDF("id", "embedding"), "id", "embedding", cells = 8)
    ws.writeAnn(built, cents)

    val exactGen = new graft.search.ExactScanGenerator(
      vectors.toDF("id", "embedding"))
    val ivfGen = new IvfGenerator(ws.readAnn(), ws.readAnnCentroids(), nprobe = 2)

    def top10(gen: graft.search.CandidateGenerator, qv: Array[Float]): Set[Long] =
      gen.candidates(qv, 10).orderBy(col("sem_score").desc, col("id"))
        .limit(10).collect().map(_.getAs[Long]("id")).toSet

    val recalls = (0 until 20).map { qi =>
      val qv = vectors(rnd.nextInt(512))._2.map(x => (x + rnd.nextGaussian() * 0.1).toFloat)
      val truth = top10(exactGen, qv)
      val approx = top10(ivfGen, qv)
      (truth & approx).size.toDouble / truth.size
    }
    val recall = recalls.sum / recalls.size
    assert(recall >= 0.9, s"mean recall@10 $recall over 20 queries: $recalls")
  }

  // ---- trained PQ codebook: training must buy recall

  test("trained PQ codebook: ADC top-50 recall vs exact L2 improves over the untrained stand-in") {
    import graft.functions.VectorFunctions.pqEncode
    val sf = "/root/testdata/sf0.01" // 500 vectors: top-50 is a real subset
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val qv = e.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)
    val subDim = 8

    // ground truth: exact squared-L2 top-50 (the metric ADC approximates)
    val d2 = aggregate(
      zip_with(col("embedding"), typedlit(qv.map(_.toDouble)), (x, y) =>
        (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (s, v) => s + v)
    val truth = e.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), d2.as("d"))
      .orderBy(col("d"), col("vec_id")).limit(50)
      .collect().map(_.getAs[Long]("vec_id")).toSet

    def adcTop50(cb: Seq[Seq[Float]]): Set[Long] = {
      val lut: Seq[Seq[Long]] = (0 until 8).map { m =>
        cb.map { c =>
          var s = 0.0; var k = 0
          while (k < subDim) {
            val d = qv(m * subDim + k).toDouble - c(m * subDim + k).toDouble
            s += d * d; k += 1
          }
          math.floor(s * 1000000).toLong
        }
      }
      val enc = e.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), pqEncode(col("embedding"), typedlit(cb.map(_.toSeq)), subDim).as("codes"))
      val adc = (0 until 8)
        .map(m => element_at(typedlit(lut(m)), element_at(col("codes"), m + 1) + 1))
        .reduce(_ + _)
      enc.select(col("vec_id"), adc.as("adc"))
        .orderBy(col("adc"), col("vec_id")).limit(50)
        .collect().map(_.getAs[Long]("vec_id")).toSet
    }

    val standin = graft.queries.AnnQueries.standinCodebook(spark, sf)
    val trained = graft.queries.AnnQueries.trainedCodebook(spark, sf)
    val rStandin = (truth & adcTop50(standin)).size / 50.0
    val rTrained = (truth & adcTop50(trained)).size / 50.0
    assert(rTrained > rStandin,
      s"training did not improve ADC recall: trained=$rTrained standin=$rStandin")
  }

  // ---- the at-scale contract: probes prune the parquet scan

  test("IVF probe prunes the persisted index scan to its probed cid= partitions") {
    val ws = new Workspace(spark, Files.createTempDirectory("graft-annprune-").toString)
    val chunks = graft.store.ChunkStore.buildChunks(
      docs100, graft.embed.HashNgramEmbedder(dim = 64))
    val (vectors, cents) = AnnIndex.build(chunks, "id", "embedding", cells = 8)
    ws.writeAnn(vectors, cents)

    val gen = new IvfGenerator(ws.readAnn(), ws.readAnnCentroids(), nprobe = 2)
    val qv = graft.embed.HashNgramEmbedder(dim = 64).embed("what is a merge window")
    val df = gen.candidates(qv, 20)
    df.collect()

    val scan = df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    // the cid IN (...) filter must reach the scan as a PARTITION filter —
    // the read touches nprobe directories, not the whole index
    val partsRead = scan.metrics.get("numPartitions").map(_.value)
    assert(partsRead.contains(2L),
      s"expected 2 probed partitions, read $partsRead:\n${scan.metadata.get("PartitionFilters")}")
    assert(scan.metadata("PartitionFilters").contains("cid"),
      s"cid filter not pushed as a partition filter: ${scan.metadata}")
  }
}
