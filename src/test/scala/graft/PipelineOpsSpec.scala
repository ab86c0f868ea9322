package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the training-pipeline operators added in round 4's
  * third pass: sequence packing, mixture sampling, unigram-LM scoring,
  * duplicated-span detection, matryoshka prefix-dim retrieval. Each test
  * recomputes the operator's defining invariant independently of the query
  * plan (plain Scala over collected rows — inputs are sf0.001-sized).
  */
class PipelineOpsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("text_seq_pack: offsets in [0, 512); per-bucket chop replays exactly") {
    import graft.queries.Packing
    val rows = run("text_seq_pack").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, _, _, off, _) => off >= 0 && off < Packing.SeqLen })
    // replay the packing per bucket: running token sum in doc_id order
    rows.groupBy(_._2).foreach { case (bucket, rs) =>
      var cum = 0L
      rs.sortBy(_._1).foreach { case (_, _, seqId, off, nTok) =>
        assert(seqId == bucket * Packing.SeqIdStride + cum / Packing.SeqLen,
          s"seq_id mismatch in bucket $bucket")
        assert(off == cum % Packing.SeqLen, s"offset mismatch in bucket $bucket")
        cum += nTok
      }
    }
  }

  test("text_word_entropy: values equal a plain-Scala replay; uniform docs hit log2(n)") {
    val got = run("text_word_entropy").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    got.foreach { case (id, nTok, hMicro) =>
      val toks = "[a-z0-9]+".r.findAllIn(docs(id).toLowerCase).toSeq
      assert(nTok == toks.size)
      val n = toks.size.toDouble
      val h = toks.groupBy(identity).values.map { g =>
        val p = g.size / n
        math.floor(p * (-math.log(p) / math.log(2.0)) * 1e6).toLong
      }.sum
      assert(h == hMicro, s"doc $id entropy mismatch")
    }
    // arithmetic pin: a 4-word uniform distribution lands on log2(4) = 2
    // bits up to the per-term micro-floor (< 1 micro lost per term)
    val p = 0.25
    val expect = 4 * math.floor(p * (-math.log(p) / math.log(2.0)) * 1e6).toLong
    assert(math.abs(expect - 2000000L) <= 4)
  }

  test("ml_quality_filter_apply: kept set is exactly the top-2n/5 by (score desc, id)") {
    val rows = run("ml_quality_filter_apply").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    assert(rows.nonEmpty)
    val k = rows.size.toLong * 2 / 5
    assert(rows.count(_._3 == 1L) == k, "kept count must be exactly floor(2n/5)")
    // the kept flag must agree with a global (score desc, doc_id asc) sort
    val sorted = rows.sortBy { case (id, s, _) => (-s, id) }
    assert(sorted.take(k.toInt).forall(_._3 == 1L))
    assert(sorted.drop(k.toInt).forall(_._3 == 0L),
      "a dropped doc outranks a kept one — the boundary-bin rank is wrong")
  }

  test("dedup_containment: values equal a bigram-set replay; an embedded doc scores 1.0") {
    val got = run("dedup_containment").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty)
    def bigrams(t: String): Set[String] = {
      val toks = "[a-z0-9]+".r.findAllIn(t.toLowerCase).toSeq
      toks.zip(toks.drop(1)).map { case (a, b) => s"$a $b" }.toSet
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> bigrams(r.getString(1))).toMap
    got.foreach { case (inner, outer, contMicro) =>
      val (a, b) = (docs(inner), docs(outer))
      assert(a.size <= b.size, "inner must be the smaller set")
      if (a.size == b.size) assert(inner < outer, "size tie must keep the lower id inner")
      val expect = (a & b).size.toLong * 1000000L / math.max(math.min(a.size, b.size), 1).toLong
      assert(expect == contMicro, s"pair ($inner,$outer) containment mismatch")
      assert(contMicro >= 500000L)
    }
    // asymmetry pin: a strict subset scores full containment even though
    // its Jaccard vs the superset is far below any dedup threshold
    val sub = bigrams("key agg row scan slow fast")
    val sup = bigrams("key agg row scan slow fast table value part hash merge batch " +
      "spark line sort window column group stream order")
    assert((sub & sup).size == sub.size)
    val jac = (sub & sup).size.toDouble / (sub | sup).size
    assert(jac < 0.5 && (sub & sup).size * 1000000L / sub.size == 1000000L)
  }

  test("curation_token_budget: selection fits the 30% budget and prefers higher-quality bins") {
    import org.apache.spark.sql.functions._
    val sel = run("curation_token_budget").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sel.nonEmpty)
    val total = spark.read.parquet(s"$sf/documents.parquet")
      .select(size(graft.functions.F.tokens(col("text"))).cast("long").as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    val budget = total * 3 / 10
    val selected = sel.map(_._3).sum
    assert(selected <= budget, s"selected $selected tokens > budget $budget")
    // greedy-by-bin: leftover headroom is smaller than one more document
    // from the boundary bin would need — i.e. the budget is actually used
    assert(selected > budget / 2, s"budget underused: $selected of $budget")
    // bins are the 21-step integer distinct-ratio scale
    assert(sel.map(_._2).min >= 0 && sel.map(_._2).max <= 20)
  }

  test("curation_mixture_temperature: rates sit between full equalization and no downsampling") {
    val tempRates = run("curation_mixture_temperature").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val linRates = run("curation_mixture_sample").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tempRates.keySet == linRates.keySet)
    tempRates.foreach { case (src, tr) =>
      val lr = linRates(src)
      assert(tr >= lr, s"$src: temperature rate $tr below the linear (alpha=0) rate $lr")
      assert(tr <= 10000, s"$src: rate above 1.0")
    }
    // at least one large source is genuinely downsampled
    assert(tempRates.values.exists(_ < 10000))
  }

  test("curation_mixture_epochs: largest source stays at one epoch, upsampling bounded by the cap") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), size(graft.functions.F.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val totals = docs.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val nBySrc = docs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val got = run("curation_mixture_epochs").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSet == totals.keySet, "an upsampling mixer must not drop sources")
    got.foreach { case (src, nDocs, nRows, tokensOut) =>
      assert(nDocs == nBySrc(src), s"$src lost documents")
      assert(nRows >= nDocs, s"$src deflated below one epoch")
      assert(nRows <= 4 * nDocs, s"$src exceeds the 4-epoch cap")
      assert(tokensOut >= totals(src), s"$src emitted fewer tokens than one epoch")
    }
    val maxSrc = totals.maxBy(_._2)._1
    assert(got.find(_._1 == maxSrc).exists(g => g._2 == g._3),
      "the largest source must stay at exactly one epoch")
    assert(got.exists(g => g._3 > g._2), "no source was upsampled at all")
  }

  test("ml_logreg_grad: bias gradient reflects the class balance exactly") {
    import org.apache.spark.sql.functions._
    val g = run("ml_logreg_grad").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g.keySet == Set(0L, 1L, 2L, 3L))
    // bias feature x=1: gradient_micro = sum(floor((0.5 - y)·1e6)) =
    // 500000·(n_neg) - 500000·(n_pos)
    val counts = spark.read.parquet(s"$sf/documents.parquet")
      .agg(count(when(col("lang") === "en", 1)).as("pos"), count(lit(1)).as("n")).head()
    val pos = counts.getLong(0); val n = counts.getLong(1)
    assert(g(0L) == 500000L * (n - pos) - 500000L * pos,
      s"bias gradient ${g(0L)} disagrees with class balance ($pos/$n)")
  }

  test("Packing.seqId: globally unique across buckets at adversarial token counts") {
    import spark.implicits._
    import graft.queries.Packing
    // cum values straddling the old bucket·10⁶ collision zone: ≥10⁶
    // sequences per bucket (≈512 M tokens — routine at 100 TB, where a
    // bucket holds ~750 M sequences)
    val adversarial = for {
      bucket <- 0L until Packing.Buckets.toLong
      seqInBucket <- Seq(0L, 999999L, 1000000L, 1000001L, 750000000L, (1L << 40) - 1)
    } yield (bucket, seqInBucket * Packing.SeqLen)
    val df = adversarial.toDF("bucket", "cum")
      .select(Packing.seqId(org.apache.spark.sql.functions.col("bucket"),
        org.apache.spark.sql.functions.col("cum")).as("seq_id"))
    val ids = df.collect().map(_.getLong(0))
    assert(ids.distinct.length == adversarial.size,
      "packed-sequence ids collide across buckets")
    // the OLD stride (bucket·10⁶) collides on exactly this input set
    val oldIds = adversarial.map { case (b, cum) => b * 1000000L + cum / Packing.SeqLen }
    assert(oldIds.distinct.length < adversarial.size,
      "adversarial set no longer exercises the old collision")
  }

  test("curation_mixture_sample: rates derive from recomputed per-source totals; min source fully kept") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), size(graft.functions.F.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val totals = docs.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val mn = totals.values.min
    val got = run("curation_mixture_sample").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    got.foreach { case (src, rateBp, nDocs, tokSampled) =>
      assert(rateBp == mn * 10000 / totals(src), s"rate for $src")
      assert(nDocs > 0 && tokSampled > 0)
    }
    // the smallest source keeps everything (rate == 10000 basis points)
    val minSrc = totals.minBy(_._2)._1
    assert(got.find(_._1 == minSrc).exists(_._2 == 10000L))
  }

  test("text_bigram_lift: values equal a plain-Scala count replay; lift ranks association") {
    val got = SparkEntry.queries("text_bigram_lift")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty && got.length <= 30)
    val docs = graft.queries.table(spark, sf, "documents").collect()
      .map(_.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq)
    val uni = docs.flatten.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val bi = docs.flatMap(ts => ts.zip(ts.drop(1)).map { case (a, b) => s"$a $b" })
      .groupBy(identity).map { case (g, xs) => g -> xs.length.toLong }
    val n = uni.values.sum
    got.foreach { case (g, cab, liftMicro) =>
      assert(bi(g) == cab, s"$g: cab $cab != replay ${bi(g)}")
      assert(cab >= 5, s"$g admitted below the min-count floor")
      val Array(a, b) = g.split(" ")
      val want = math.floor(cab * 1000000.0 * n / (uni(a) * uni(b))).toLong
      assert(liftMicro == want, s"$g: lift $liftMicro != replay $want")
    }
    // the returned list is the global top by (lift, bigram) — spot-check
    // it dominates every excluded bigram over the count floor
    val minGot = got.map(x => (x._3, x._1)).min
    val excluded = bi.filter { case (g, c) => c >= 5 && !got.exists(_._1 == g) }
    excluded.foreach { case (g, cab) =>
      val Array(a, b) = g.split(" ")
      val lift = math.floor(cab * 1000000.0 * n / (uni(a) * uni(b))).toLong
      assert(lift < minGot._1 || (lift == minGot._1 && g > minGot._2),
        s"excluded $g (lift $lift) outranks returned minimum $minGot")
    }
  }

  test("text_lm_perplexity: buckets split strictly around the corpus mean") {
    val rows = run("text_lm_perplexity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.nonEmpty)
    val byBucket = rows.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byBucket.keySet.subsetOf(Set("head", "middle", "tail")))
    // head docs score strictly below every tail doc (floored micros can
    // only tighten the strict inequality between the two open intervals)
    for (h <- byBucket.get("head"); t <- byBucket.get("tail"))
      assert(h.max < t.min, "head/tail overlap")
    // repeated-common-token docs compress better than average: bits are
    // positive and bounded by log2(N+V) (the rarest-possible token cost)
    assert(rows.forall(_._2 > 0))
  }

  test("dedup_substring_spans: exact-duplicate docs are 100% duplicated spans") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), md5(lower(trim(col("text")))).as("h"),
        size(graft.functions.F.tokens(col("text"))).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val dupIds = docs.groupBy(_._2).values.filter(_.length > 1)
      .flatten.filter(_._3 >= 10).map(_._1).toSet
    val rows = run("dedup_substring_spans").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (_, nSpans, nDup, ppm) =>
      assert(nDup <= nSpans)
      assert(ppm == nDup * 1000000L / nSpans)
    }
    val byId = rows.map(r => r._1 -> r._4).toMap
    dupIds.foreach { id =>
      assert(byId(id) == 1000000L, s"doc $id is an exact dup but ppm=${byId(id)}")
    }
  }

  test("curation_dsir_weights: scores equal a plain-Scala replay of the hashed-unigram log-ratio") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"), lower(col("text")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def bucket(tk: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tk.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 1024L
    }
    val tokRe = "[a-z0-9]+".r
    val docToks = docs.map { case (id, src, text) =>
      (id, src, tokRe.findAllIn(text).map(bucket).toSeq)
    }
    val target = docs.map(_._2).min
    val all = docToks.flatMap(_._3)
    val tgt = docToks.filter(_._2 == target).flatMap(_._3)
    val cc = all.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ct = tgt.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val (nc, nt) = (all.length.toLong, tgt.length.toLong)
    val w = cc.map { case (b, c) =>
      b -> math.floor((math.log((ct.getOrElse(b, 0L) + 1).toDouble / (nt + 1024)) -
                       math.log((c + 1).toDouble / (nc + 1024))) * 1e6).toLong
    }
    val want = docToks.map { case (id, _, bs) => id -> bs.map(w).sum }.toMap
    val rows = run("curation_dsir_weights").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, s, keep) =>
      assert(s == want(id), s"score mismatch for doc $id")
      assert(keep == (if (s > 0) 1L else 0L))
    }
  }

  test("connected components converge on a >20-diameter chain (path halving) and equal a union-find replay") {
    import spark.implicits._
    // sliding-window docs: consecutive docs share 19/20 tokens
    // (jaccard ≈ 0.905 ≥ 0.9), distance-2 share 18/20 (≈ 0.82 < 0.9) —
    // the verified edge set is a long near-path whose diameter defeats
    // plain O(diameter) min-label propagation within the round budget
    val n = 60
    val docs = (0 until n).map { i =>
      i.toLong -> (i until i + 20).map(t => s"tok$t").mkString(" ")
    }.toDF("doc_id", "text")
    val got = graft.dedup.DedupPipeline.components(docs, threshold = 0.9, sampleMod = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n)
    // ground truth: union-find over the pipeline's own verified edges
    val es = graft.dedup.DedupPipeline.edges(docs, 0.9, sampleMod = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map((0L until n.toLong).map(i => i -> i): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = (0L until n.toLong).map(i => i -> find(i)).toMap
    assert(got == want, "components disagree with union-find over the same edges")
    // the chain really is long: one component spanning most docs
    assert(want.values.groupBy(identity).values.map(_.size).max > 20,
      "fixture failed to build a long chain — the test would not exercise halving")
  }

  test("dedup_canonical_docs: one max-quality representative per component, members conserved") {
    val comp = SparkEntry.queries("dedup_pipeline_components")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap // doc -> component
    val canon = SparkEntry.queries("dedup_canonical_docs")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // exactly one row per component, and the member counts conserve nodes
    assert(canon.map(_._1).distinct.length == canon.length, "component emitted twice")
    assert(canon.map(_._1).toSet == comp.values.toSet, "component sets diverge")
    assert(canon.map(_._3).sum == comp.size, "cluster sizes do not sum to the node count")
    // the representative belongs to its own cluster
    canon.foreach { case (c, doc, _, _) =>
      assert(comp(doc) == c, s"canonical doc $doc not in component $c") }
    // and carries the cluster's maximum score (ties to the lowest doc_id)
    val score = graft.queries.table(spark, sf, "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") % 4 === 0)
      .collect().map { r =>
        val toks = r.getString(1).toLowerCase
          .split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
        r.getLong(0) -> toks.distinct.length.toLong * 1000000L / math.max(toks.length, 1)
      }.toMap
    val byComp = comp.groupBy(_._2)
    canon.foreach { case (c, doc, n, s) =>
      val members = byComp(c).keys.toSeq
      assert(members.length == n, s"component $c: n_members $n != ${members.length}")
      val best = members.map(d => (score(d), -d)).max
      assert((s, -doc) == best,
        s"component $c: chose ($doc, $s), best is (${-best._2}, ${best._1})")
    }
  }

  test("pipeline_pretrain_e2e: stage invariants — shrinkage, gate bounds, packing consistency") {
    val rows = run("pipeline_pretrain_e2e").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // monotone shrinkage: the pipeline can only DROP docs vs exact dedup
    val nDistinct = spark.read.parquet(s"$sf/documents.parquet")
      .select(countDistinct(md5(lower(trim(col("text"))))))
      .head().getLong(0)
    assert(rows.map(_._3).sum <= nDistinct)
    rows.foreach { case (_, _, nDocs, nTokens, nSeqs) =>
      // the Gopher gate bounds every surviving doc to 30..90 tokens
      assert(nTokens >= nDocs * 30 && nTokens <= nDocs * 90)
      // packing: each doc starts in exactly one sequence
      assert(nSeqs >= 1 && nSeqs <= nDocs)
    }
    // every (source, bucket) key is unique — the accounting is a partition
    assert(rows.map(r => (r._1, r._2)).distinct.length == rows.length)
  }

  test("q_funnel: stage assignment equals an ordered-sequence replay over raw events") {
    val ev = graft.queries.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ms"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val want = byUser.flatMap { case (u, es) =>
      es.filter(_._2 == "view").map(_._3).minOption.map { t1 =>
        val t2 = es.filter(e => e._2 == "click" && e._3 >= t1).map(_._3).minOption
        val t3 = t2.flatMap(c => es.filter(e => e._2 == "purchase" && e._3 >= c).map(_._3).minOption)
        u -> ((t1, t2, t3, 1L + t2.size + t3.size))
      }
    }
    val got = run("q_funnel").collect().map { r =>
      r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getLong(4)))
    }.toMap
    assert(got.nonEmpty)
    assert(got == want)
  }

  test("curation_quality_quantile: the keep gate is relative to each source's own distribution") {
    val rows = run("curation_quality_quantile").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (_, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._1))
      val n = sorted.length
      sorted.zipWithIndex.foreach { case ((_, _, _, prMicro, keep), i) =>
        val pr = if (n == 1) 0.0 else i.toDouble / (n - 1)
        assert(prMicro == math.floor(pr * 1e6).toLong)
        assert(keep == (if (pr >= 0.25) 1L else 0L))
      }
      // the gate keeps ~75% of EVERY source, regardless of its scale
      val kept = sorted.count(_._5 == 1L)
      assert(kept >= (n * 3) / 4 - 1 && kept <= n)
    }
  }

  test("dedup_simhash_pairs: hamming values match independently recomputed signatures") {
    // recompute each doc's 16-bit simhash from its distinct token set
    def h60(tk: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tk.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val tokRe = "[a-z0-9]+".r
    val sigs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), lower(col("text"))).collect()
      .map { r =>
        val toks = tokRe.findAllIn(r.getString(1)).toSeq.distinct
        val sig = (0 until 16).map { j =>
          val bal = toks.map(t => if (((h60(t) >> j) & 1L) == 1L) 1 else -1).sum
          if (bal > 0) 1 << j else 0
        }.sum
        r.getLong(0) -> sig
      }.toMap
    val rows = run("dedup_simhash_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.distinct.length == rows.length, "duplicate pairs emitted")
    rows.foreach { case (a, b, ham) =>
      assert(a < b)
      assert(ham <= 3)
      assert(ham == java.lang.Integer.bitCount(sigs(a) ^ sigs(b)),
        s"hamming mismatch for ($a,$b)")
    }
  }

  test("BPE merge apply is symbol-boundary-correct (no suffix merges, consecutive pairs all merge)") {
    def apply1(s: String, pr: String): String =
      spark.sql("SELECT " + graft.queries.TextQueries.applyMergeSql(
        s"'$s'", s"'$pr'", s"'${pr.replace(" ", "")}'") + " AS r").head().getString(0)
    assert(apply1("t h e", "h e") == "t he")
    assert(apply1("th e", "h e") == "th e", "h is only the suffix of th — must not merge")
    assert(apply1("h e h e", "h e") == "he he", "consecutive non-overlapping pairs all merge")
    assert(apply1("x h e y h e z", "h e") == "x he y he z")
    assert(apply1("a", "h e") == "a")
  }

  test("text_bpe_encode: symbol counts equal a string-replay of the trained merges") {
    val merges = graft.queries.TextQueries.trainMerges(spark, sf)
      .map { case (_, pr, m, _) => (pr, m) }
    assert(merges.length == 3)
    val tokRe = "[a-z0-9]+".r
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), lower(col("text"))).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // boundary-correct apply (see TextQueries.applyMergeSql)
    def applyMerge(s: String, pr: String, m: String): String =
      (" " + s.replace(" ", "  ") + " ")
        .replace(" " + pr.replace(" ", "  ") + " ", " " + m + " ")
        .replace("  ", " ").trim
    val want = docs.map { case (id, text) =>
      val toks = tokRe.findAllIn(text).toSeq
      val nChars = toks.map(_.length.toLong).sum
      val nSym = toks.map { tk =>
        val applied = merges.foldLeft(tk.mkString(" ")) {
          case (s, (pr, m)) => applyMerge(s, pr, m)
        }
        applied.split(" ").length.toLong
      }.sum
      id -> ((nChars, nSym, nChars - nSym))
    }.toMap
    val got = run("text_bpe_encode").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.nonEmpty)
    assert(got == want)
    // the merges actually compress: some doc saves at least one symbol
    assert(got.values.exists(_._3 > 0))
  }

  test("q_snapshot_diff: classification equals a replay over the two snapshot filters") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), round(col("o_totalprice") * 100, 0).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val old = orders.filter(_._1 % 5 != 0).toMap
    val nw = orders.filter(_._1 % 7 != 0)
      .map { case (k, v) => k -> (if (k % 3 == 0) v * 2 else v) }.toMap
    val classes = (old.keySet ++ nw.keySet).toSeq.map { k =>
      (old.get(k), nw.get(k)) match {
        case (None, Some(v))              => ("inserted", v)
        case (Some(v), None)              => ("deleted", -v)
        case (Some(a), Some(b)) if a != b => ("updated", b - a)
        case (Some(_), Some(_))           => ("unchanged", 0L)
        case (None, None)                 => fail("impossible")
      }
    }
    val want = classes.groupBy(_._1).map { case (s, xs) =>
      s -> ((xs.length.toLong, xs.map(_._2).sum))
    }
    val got = run("q_snapshot_diff").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
  }

  test("mm_frame_dedup: per-media dup fractions equal a byte-level replay") {
    def md5hex(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(b).map("%02x".format(_)).mkString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 5 === 0).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8")))
    val frames = docs.flatMap { case (id, payload) =>
      val stop = math.max(payload.length - 31, 1)
      (1 to stop by 16).map { off =>
        id -> md5hex(payload.slice(off - 1, math.min(off - 1 + 32, payload.length)))
      }
    }
    val counts = frames.groupBy(_._2).view.mapValues(_.length).toMap
    val want = frames.groupBy(_._1).map { case (id, fs) =>
      val dup = fs.count(f => counts(f._2) > 1)
      id -> ((fs.length.toLong, dup.toLong, dup.toLong * 1000000L / fs.length))
    }
    val got = run("mm_frame_dedup").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.nonEmpty)
    assert(got == want)
  }

  test("mm_av_align: every frame gets the latest audio window at-or-before it (exact replay)") {
    val rows = run("mm_av_align").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(rows.nonEmpty)
    val lens = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), length(col("text"))).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { case (mediaId, frameOff, audioOff, lag) =>
      assert(mediaId % 3 == 2, "only video media emit frames")
      val audioId = mediaId - 1 // same track: div-3 sibling with doc_id % 3 == 1
      lens.get(audioId) match {
        case Some(alen) =>
          val lastWin = ((math.max(alen - 31, 1) - 1) / 64) * 64 + 1
          val wantOff = math.min((frameOff - 1) / 64 * 64 + 1, lastWin.toLong)
          assert(audioOff.contains(wantOff), s"media $mediaId frame $frameOff: $audioOff != $wantOff")
          assert(lag.contains(frameOff - wantOff))
        case None =>
          assert(audioOff.isEmpty && lag.isEmpty)
      }
    }
  }

  test("ann_sq8_topk: scores equal an int8-quantize-then-dot replay; top-k tracks the float ranking") {
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val q = embs(0L)
    val scored = embs.toSeq.filter(_._1 != 0L).map { case (id, v) =>
      val s = 127.0 / math.max(v.map(math.abs).max, 1e-12)
      val codes = v.map(x => math.floor(x * s))
      val dot = codes.zip(q).map { case (c, y) => c * y }.sum
      id -> math.floor(dot / s * 1e6).toLong
    }
    val want = scored.sortBy { case (id, m) => (-m, id) }.take(10)
    val got = run("ann_sq8_topk").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
    // quantization keeps the ranking useful: most of the SQ8 top-10 are
    // also in the exact float-dot top-10
    val exact10 = embs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => id -> v.zip(q).map { case (x, y) => x * y }.sum }
      .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
    assert(got.count(g => exact10(g._1)) >= 7, s"SQ8 top-10 drifted: $got")
  }

  test("q_zorder_key: every z-prefix bucket confines BOTH dimensions to a 4x4 tile") {
    val rows = run("q_zorder_key").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty && rows.length <= 16)
    rows.foreach { case (zb, n, minX, maxX, minY, maxY) =>
      assert(n > 0)
      // the locality property that makes min/max stats prunable on either
      // dim: a z-prefix tile spans at most 4 consecutive values per dim,
      // anchored at the tile origin decoded from the prefix bits
      val tileX = 4 * (((zb >> 0) & 1) + 2 * ((zb >> 2) & 1))
      val tileY = 4 * (((zb >> 1) & 1) + 2 * ((zb >> 3) & 1))
      assert(minX >= tileX && maxX < tileX + 4, s"bucket $zb x-range [$minX,$maxX]")
      assert(minY >= tileY && maxY < tileY + 4, s"bucket $zb y-range [$minY,$maxY]")
    }
  }

  test("embed_matryoshka: overlap flags equal a plain-Scala brute-force recompute") {
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val q = embs(0L)
    def cos(a: Array[Float], b: Array[Float], d: Int): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- 0 until d) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val others = embs.toSeq.filter(_._1 != 0L)
    val top8 = others.map { case (id, v) => (id, math.floor(cos(v, q, 8) * 1e6).toLong) }
      .sortBy { case (id, s) => (-s, id) }.take(20)
    val full20 = others.map { case (id, v) => (id, cos(v, q, q.length)) }
      .sortBy { case (id, s) => (-s, id) }.take(20).map(_._1).toSet
    val got = run("embed_matryoshka").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 20)
    assert(got.map(g => (g._1, g._2)).toSeq == top8)
    got.foreach { case (id, _, flag) =>
      assert(flag == (if (full20(id)) 1L else 0L), s"flag mismatch for $id")
    }
  }
}
