package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.F
import graft.functions.VectorFunctions.{cosineSim, dotProduct, l2Norm}
import graft.operators.AsOfJoin
import graft.store.TokenIndex

/** Scale-path variants: posting-list keyword search, IVF ANN, salted skew
  * aggregation — the shapes that survive a 100× scale-up where their naive
  * counterparts don't. */
object ScaleQueries {

  private val terms = Seq("merge", "window", "hash")
  private val NumQueries = 5
  private val Cells = 16
  private val CentLo = 16
  private val CentHi = 31

  /** Ensure orders/customer exist as BUCKETED parquet tables (8 buckets,
    * bucketed+sorted by the join key) in the session catalog, and return
    * their table names. The write repartitions by the bucket key first —
    * repartition and bucket-id hashing are the same murmur3 pmod, so each
    * task holds exactly one bucket and every bucket is ONE file (which is
    * what lets the reader trust the sort and elide both shuffle and sort
    * under a sort-merge join). Session-scoped: the in-memory catalog
    * forgets tables between sessions, so a fresh session pays the write
    * once (the scale analog: the bucketed fact table is written once,
    * then every co-bucketed join reads it shuffle-free). Table data lives
    * under java.io.tmpdir, tagged by SF dir. */
  /** 8-hex tag identifying an SF dir in shared-tmpdir staging paths —
    * one recipe for every session-staged layout (bucketed tables, the
    * dt-partitioned event log). */
  private def sfTag(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)

  /** JVM-lifetime nonce isolating this process's bucketed-table staging
    * dirs from any concurrently-running JVM (verify + test can run the
    * same SF at once): a second process overwriting a shared path while
    * the first reads it would cause flaky short reads. Unlike the events
    * dataset (path-addressed, so it can be published once and shared via
    * atomic rename), a bucketed table's bucket spec lives in the session
    * catalog — per-JVM anyway — so the files may as well be per-JVM too. */
  private val jvmNonce = java.util.UUID.randomUUID.toString.take(8)

  // q_range_join_binned's span-bounded (bin, events, errors) histogram per
  // (session, corpus) — the statistics that price its two physical plans
  private val rangeBinStats =
    new graft.util.SessionCache[(SparkSession, String), Array[(Long, Long, Long)]](8)

  /** Staging dirs owned by THIS JVM, kept mtime-fresh by a heartbeat:
    * parquet dir mtime does not advance on reads, so without a heartbeat
    * a long-lived verify/bench JVM (multi-window bench rounds run for
    * hours) could have its live staging dir swept by a younger sibling
    * process the moment it crossed the stale threshold. The daemon
    * touches each registered dir every 10 min; the sweep threshold (24h)
    * additionally sits far above any plausible session length, so both
    * lines of defense must fail before a live dir is deleted. */
  private val liveStagingDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()
  private lazy val heartbeat: Thread = {
    val t = new Thread(() => {
      while (true) {
        Thread.sleep(10L * 60 * 1000)
        liveStagingDirs.forEach { p =>
          try java.nio.file.Files.setLastModifiedTime(
            p, java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
          catch { case scala.util.control.NonFatal(_) => () } // dir gone: nothing to keep alive
        }
      }
    }, "graft-staging-heartbeat")
    t.setDaemon(true)
    t.start()
    t
  }
  private def registerLiveStagingDir(path: String): Unit = {
    liveStagingDirs.add(java.nio.file.Paths.get(path))
    heartbeat // force lazy init
  }

  private def bucketedOrdersCustomer(spark: SparkSession, dir: String): (String, String) = {
    val tag = sfTag(dir)
    val ot = s"graft_bkt_orders_$tag"
    val ct = s"graft_bkt_customer_$tag"
    def ensure(name: String, key: String)(build: => org.apache.spark.sql.DataFrame): Unit =
      if (!spark.catalog.tableExists(name)) synchronized {
        if (!spark.catalog.tableExists(name)) {
          val parent = java.nio.file.Paths
            .get(sys.props("java.io.tmpdir"), "graft_bucketed")
          // sweep orphans from crashed JVMs (same discipline as the
          // dt-partitioned events helper) — only stale ones: a fresh dir
          // may belong to a live sibling process. 24h threshold (far
          // above any session) + the sibling's own 10-min heartbeat
          // together guarantee a LIVE JVM's dir is never swept even
          // though parquet dir mtime does not advance on reads.
          val staleMs = 24L * 60 * 60 * 1000
          Option(parent.toFile.listFiles()).getOrElse(Array.empty)
            .filter(f => f.getName.startsWith(s"${name}_") &&
              !f.getName.endsWith(jvmNonce) &&
              System.currentTimeMillis() - f.lastModified() > staleMs)
            .foreach(org.apache.commons.io.FileUtils.deleteQuietly)
          val path = parent.resolve(s"${name}_$jvmNonce").toString
          build.repartition(8, col(key))
            .write.format("parquet")
            .bucketBy(8, key).sortBy(key)
            .option("path", path)
            .mode(org.apache.spark.sql.SaveMode.Overwrite)
            .saveAsTable(name)
          // register only AFTER the write succeeds: a dir registered before
          // it exists makes every heartbeat tick swallow NoSuchFileException
          // until the write lands, and a failed write would leave a
          // never-created path in liveStagingDirs for the JVM's lifetime.
          registerLiveStagingDir(path)
        }
      }
    ensure(ot, "o_custkey")(
      table(spark, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"))
    ensure(ct, "c_custkey")(
      table(spark, dir, "customer").select("c_custkey", "c_mktsegment"))
    (ot, ct)
  }

  /** Ensure events exist as a dt-PARTITIONED parquet dataset (one
    * directory per UTC day, Hive-style `dt=2024-01-07`) under
    * java.io.tmpdir, tagged by SF dir, and return the dataset path.
    * The write repartitions by dt so each day is one file. Written once
    * per path lifetime (guarded by the _SUCCESS marker) — the scale
    * analog: the 100 TB event log is laid out by date ONCE, then every
    * time-ranged query prunes whole directories at PLANNING time
    * (static filters) or at RUNTIME (dynamic partition pruning from a
    * dim-side filter) instead of scanning the full history. */
  private def dtPartitionedEvents(spark: SparkSession, dir: String): String = {
    val target = java.nio.file.Paths
      .get(sys.props("java.io.tmpdir"), "graft_partitioned", s"events_dt_${sfTag(dir)}")
    def ready = java.nio.file.Files.exists(target.resolve("_SUCCESS"))
    if (!ready) synchronized {
      if (!ready) {
        // the target is shared across JVMs (verify + test can run
        // concurrently on the same SF): write to a process-unique temp
        // dir, then publish with ONE atomic directory rename — a loser
        // of the race just discards its copy, and readers only ever see
        // a complete dataset
        // sweep orphaned temp dirs (a crashed writer's .tmp.* would
        // otherwise accumulate forever under the shared tmpdir) — but
        // ONLY stale ones: a fresh .tmp.* may be another process's
        // in-flight write, and deleting it would re-introduce the race
        // the atomic-rename publish exists to prevent
        val staleMs = 60L * 60 * 1000
        Option(target.getParent.toFile.listFiles()).getOrElse(Array.empty)
          .filter(f => f.getName.startsWith(s"${target.getFileName}.tmp.") &&
            System.currentTimeMillis() - f.lastModified() > staleMs)
          .foreach(org.apache.commons.io.FileUtils.deleteQuietly)
        val tmp = target.resolveSibling(
          s"${target.getFileName}.tmp.${java.util.UUID.randomUUID.toString.take(8)}")
        events(spark, dir)
          .withColumn("dt", to_date(col("ts")))
          .repartition(col("dt"))
          .write.partitionBy("dt")
          .mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(tmp.toString)
        try java.nio.file.Files.move(tmp, target,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch {
          case _: java.nio.file.FileAlreadyExistsException |
               _: java.nio.file.AccessDeniedException |
               _: java.nio.file.DirectoryNotEmptyException =>
            // another process published first; ours is equivalent
            org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
        }
      }
    }
    target.toString
  }

  // ---- DuckDB replay of KMeans.train (the ann_ivf_trained oracle) ----

  /** Micro-floored squared L2 between a REAL[64] embedding and a
    * DOUBLE[64] centroid list — the exact left-fold KMeans.microDistances
    * generates. */
  private def ivfD2l(v: String, c: String) =
    s"CAST(floor(list_aggregate(list_transform(range(64), i -> " +
      s"($v[i+1]::DOUBLE - $c[i+1]) * ($v[i+1]::DOUBLE - $c[i+1])), " +
      s"'sum') * 1000000) AS BIGINT)"

  /** One full-vector Lloyd iteration (KMeans.train's loop body): assign
    * by micro-L2 argmin (lowest-cid ties), update as integer micro-sums
    * with means (sm/n)/10⁶; an empty cluster keeps its centroid. */
  private def lloydIterSql(cbIn: String, n: Int) =
    s"""d$n AS (SELECT e.vec_id, cb.cid, ${ivfD2l("e.embedding", "cb.c")} AS d2
       |        FROM embeddings e CROSS JOIN $cbIn cb),
       |a$n AS (SELECT vec_id, cid FROM
       |        (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM d$n)
       |        WHERE rn = 1),
       |u$n AS (SELECT a.cid, ks.k,
       |               sum(CAST(floor(e.embedding[ks.k+1]::DOUBLE * 1000000) AS BIGINT)) AS sm,
       |               count(*) AS n
       |        FROM a$n a JOIN embeddings e USING (vec_id) CROSS JOIN ks
       |        GROUP BY a.cid, ks.k),
       |cb$n AS (SELECT c0.cid, coalesce(u.c, c0.c) AS c
       |         FROM $cbIn c0 LEFT JOIN
       |           (SELECT cid, list((sm::DOUBLE / n) / 1000000.0 ORDER BY k) AS c
       |            FROM u$n GROUP BY cid) u ON u.cid = c0.cid)""".stripMargin

  val all: Seq[Q] = Seq(

    // Keyword search via the inverted index: same result as the D4 scan,
    // but candidate cost ∝ posting lists, not corpus (partition-pruned by
    // token at scale).
    Q("d4_posting_search", {
      val inList = terms.map(t => s"'$t'").mkString(", ")
      s"""WITH post AS (
         |  SELECT doc_id AS chunk_id, t AS token, count(*) AS tf
         |  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t FROM documents)
         |  GROUP BY doc_id, t)
         |SELECT chunk_id, sum(tf)::BIGINT AS score
         |FROM post WHERE token IN ($inList)
         |GROUP BY chunk_id
         |ORDER BY score DESC, chunk_id LIMIT 20""".stripMargin
    }) { (spark, dir) =>
      val postings = TokenIndex.build(table(spark, dir, "documents"), "doc_id", "text")
      TokenIndex.search(postings, terms, 20)
    },

    // FTS5 MATCH fidelity (vector_store.cpp:252): `"merge window" windo*`
    // — a positional phrase term AND a prefix term. Phrase occurrences via
    // positional-posting intersection; prefix via a token-dictionary
    // range; implicit AND across terms. The oracle sequence-matches the
    // raw token list with list arithmetic.
    Q("d4_phrase_search",
      """WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
        |              FROM documents),
        |sc AS (SELECT doc_id,
        |              len(list_filter(range(len(ts) - 1),
        |                    i -> ts[i+1] = 'merge' AND ts[i+2] = 'window'))::BIGINT AS phrase_occ,
        |              len(list_filter(ts, t -> starts_with(t, 'windo')))::BIGINT AS pref_tf
        |       FROM toks)
        |SELECT doc_id AS chunk_id, (phrase_occ + pref_tf)::BIGINT AS score
        |FROM sc WHERE phrase_occ > 0 AND pref_tf > 0
        |ORDER BY score DESC, chunk_id LIMIT 20""".stripMargin) { (spark, dir) =>
      val postings = TokenIndex.build(table(spark, dir, "documents"), "doc_id", "text")
      TokenIndex.searchTerms(postings, TokenIndex.parse("\"merge window\" windo*"), 20)
    },

    // IVF ANN: 16 centroids drawn from the corpus; every vector assigned to
    // its nearest cell; a query scans only its own cell (nprobe=1). The
    // cell id is the shuffle/partition key at scale.
    Q("ann_ivf_cells",
      s"""WITH c AS (SELECT vec_id - $CentLo AS cid, embedding AS ce FROM embeddings
         |           WHERE vec_id BETWEEN $CentLo AND $CentHi),
         |a AS (SELECT e.vec_id, c.cid,
         |             row_number() OVER (PARTITION BY e.vec_id
         |                                ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.ce::DOUBLE[]) DESC, c.cid) AS rn
         |      FROM embeddings e CROSS JOIN c),
         |cells AS (SELECT vec_id, cid FROM a WHERE rn = 1),
         |qs AS (SELECT vec_id AS q_id, cid FROM cells WHERE vec_id < $NumQueries)
         |SELECT qs.q_id, n.vec_id AS n_id,
         |       round(list_cosine_similarity(ne.embedding::DOUBLE[], qe.embedding::DOUBLE[]), 6) AS score,
         |       row_number() OVER (PARTITION BY qs.q_id
         |                          ORDER BY list_cosine_similarity(ne.embedding::DOUBLE[], qe.embedding::DOUBLE[]) DESC, n.vec_id) AS rank
         |FROM qs
         |JOIN cells n ON n.cid = qs.cid AND n.vec_id <> qs.q_id
         |JOIN embeddings ne ON ne.vec_id = n.vec_id
         |JOIN embeddings qe ON qe.vec_id = qs.q_id
         |QUALIFY rank <= 5
         |ORDER BY q_id, rank""".stripMargin) { (spark, dir) =>
      val e = table(spark, dir, "embeddings")
      // the 16 centroids collapse to ONE broadcast row holding an array of
      // (cid, centroid) structs — cell assignment is then a scan-local
      // argmax (max struct = max cos, then min cid), so NO exchange ever
      // carries the corpus or its embedding column for the assignment
      val centsArr = e.filter(col("vec_id").between(CentLo, CentHi))
        .agg(collect_list(
          struct((col("vec_id") - CentLo).as("cid"), col("embedding").as("ce"))).as("cents"))
      val assigned = e.crossJoin(broadcast(centsArr))
        .withColumn("best", array_max(transform(col("cents"),
          c => struct(cosineSim(col("embedding"), c.getField("ce")).as("cos"),
                      (-c.getField("cid")).as("ncid")))))
        .select(col("vec_id"), col("embedding"),
          (-col("best").getField("ncid")).as("cid"))
      // queries keep their embedding through assignment (no re-join with e);
      // candidate scoring is cell-local via the broadcast query side
      val qs = assigned.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("cid").as("qcid"), col("embedding").as("qv"))
      assigned.join(broadcast(qs),
          col("cid") === col("qcid") && col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          cosineSim(col("embedding"), col("qv")).as("s"))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("s").desc, col("n_id"))))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("n_id"), round(col("s"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("q_id", "rank")
    },

    // IVF auto-nprobe — the IVF analog of ann_lsh_auto_geometry's
    // derive-don't-default contract: nprobe is the recall knob, and a
    // blind default silently caps recall at the cell-coverage ceiling
    // (RECALL_r08: uniform corpus at nprobe=2 ceilings at 0.355 across
    // EVERY serving tier). This query measures the ceiling directly from
    // a bounded sample — for each sampled query, the exact top-10 is
    // computed and each true neighbor's cell is ranked against the
    // query's centroid preference order; coverage(nprobe) = the fraction
    // of true neighbors whose cell rank ≤ nprobe, i.e. the recall any
    // probe-then-rerank pipeline can at most reach. Output is the whole
    // curve with the smallest nprobe clearing 90% flagged. Sample side
    // is broadcast (16 queries — the same fixed size at any corpus
    // scale); the corpus never shuffles. All-integer comparisons, so the
    // curve is bit-identical in DuckDB.
    Q("ann_ivf_auto_nprobe",
      s"""WITH c AS (SELECT vec_id - $CentLo AS cid, embedding AS ce FROM embeddings
         |           WHERE vec_id BETWEEN $CentLo AND $CentHi),
         |a AS (SELECT e.vec_id, c.cid,
         |             row_number() OVER (PARTITION BY e.vec_id
         |                                ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.ce::DOUBLE[]) DESC, c.cid) AS rn
         |      FROM embeddings e CROSS JOIN c),
         |cells AS (SELECT vec_id, cid FROM a WHERE rn = 1),
         |qs AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 16),
         |gt AS (SELECT qs.q_id, e.vec_id AS n_id,
         |              row_number() OVER (PARTITION BY qs.q_id
         |                ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], qs.qv::DOUBLE[]) DESC, e.vec_id) AS rk
         |       FROM embeddings e CROSS JOIN qs WHERE e.vec_id <> qs.q_id),
         |topk AS (SELECT q_id, n_id FROM gt WHERE rk <= 10),
         |cr AS (SELECT qs.q_id, c.cid,
         |              row_number() OVER (PARTITION BY qs.q_id
         |                ORDER BY list_cosine_similarity(c.ce::DOUBLE[], qs.qv::DOUBLE[]) DESC, c.cid) AS crank
         |       FROM c CROSS JOIN qs),
         |nb AS (SELECT t.q_id, cr.crank
         |       FROM topk t JOIN cells ce ON ce.vec_id = t.n_id
         |                   JOIN cr ON cr.q_id = t.q_id AND cr.cid = ce.cid),
         |tot AS (SELECT count(*) AS total FROM topk),
         |cov AS (SELECT p.np, sum(CASE WHEN nb.crank <= p.np THEN 1 ELSE 0 END)::BIGINT AS covered
         |        FROM nb CROSS JOIN (SELECT unnest(range(1, 17)) AS np) p GROUP BY p.np),
         |curve AS (SELECT np, covered, covered * 10000 // tot.total AS coverage_bp
         |          FROM cov CROSS JOIN tot),
         |pick AS (SELECT coalesce(min(np), 16) AS np FROM curve WHERE coverage_bp >= 9000)
         |SELECT curve.np::BIGINT AS nprobe, covered, coverage_bp::BIGINT AS coverage_bp,
         |       (CASE WHEN curve.np = pick.np THEN 1 ELSE 0 END)::BIGINT AS chosen
         |FROM curve CROSS JOIN pick ORDER BY nprobe""".stripMargin) { (spark, dir) =>
      val e = table(spark, dir, "embeddings")
      val centsArr = e.filter(col("vec_id").between(CentLo, CentHi))
        .agg(collect_list(
          struct((col("vec_id") - CentLo).as("cid"), col("embedding").as("ce"))).as("cents"))
      // corpus cell assignment: scan-local argmax against the broadcast
      // centroid array — identical shape to ann_ivf_cells
      val cells = e.crossJoin(broadcast(centsArr))
        .withColumn("best", array_max(transform(col("cents"),
          c => struct(cosineSim(col("embedding"), c.getField("ce")).as("cos"),
                      (-c.getField("cid")).as("ncid")))))
        .select(col("vec_id"), (-col("best").getField("ncid")).as("cid"))
      val qs = e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      val topk = e.crossJoin(broadcast(qs))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          cosineSim(col("embedding"), col("qv")).as("s"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("s").desc, col("n_id"))))
        .filter(col("rk") <= 10)
        .select("q_id", "n_id")
      val cr = e.filter(col("vec_id").between(CentLo, CentHi))
        .select((col("vec_id") - CentLo).as("cid"), col("embedding").as("ce"))
        .crossJoin(broadcast(qs))
        .select(col("q_id"), col("cid"), cosineSim(col("ce"), col("qv")).as("s"))
        .withColumn("crank", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("s").desc, col("cid"))))
        .select("q_id", "cid", "crank")
      val nb = topk.join(cells.withColumnRenamed("vec_id", "n_id"), Seq("n_id"))
        .join(cr, Seq("q_id", "cid"))
        .select("q_id", "crank")
      val tot = topk.agg(count(lit(1)).as("total"))
      val cov = nb.crossJoin(spark.range(1, 17).select(col("id").cast("int").as("np")))
        .groupBy("np")
        .agg(sum(when(col("crank") <= col("np"), 1L).otherwise(0L)).as("covered"))
      val curve = cov.crossJoin(broadcast(tot))
        .select(col("np"), col("covered"),
          expr("covered * 10000 DIV total").as("coverage_bp"))
      val pick = curve.filter(col("coverage_bp") >= 9000)
        .agg(coalesce(min(col("np")), lit(16)).as("pnp"))
      curve.crossJoin(broadcast(pick))
        .select(col("np").cast("long").as("nprobe"), col("covered"),
          col("coverage_bp").cast("long").as("coverage_bp"),
          when(col("np") === col("pnp"), 1L).otherwise(0L).as("chosen"))
        .orderBy("nprobe")
    },

    // IVF multi-probe (nprobe=2): queries scan their TWO nearest cells —
    // the recall knob of IVF search. Corpus assignment stays scan-local
    // (same broadcast centroid-array argmax as ann_ivf_cells); each query
    // contributes 2 probe rows to the broadcast side, and a neighbor can
    // match at most one probe (it lives in exactly one cell), so no
    // dedup join is needed.
    Q("ann_ivf_multiprobe",
      s"""WITH c AS (SELECT vec_id - $CentLo AS cid, embedding AS ce FROM embeddings
         |           WHERE vec_id BETWEEN $CentLo AND $CentHi),
         |a AS (SELECT e.vec_id, c.cid,
         |             row_number() OVER (PARTITION BY e.vec_id
         |                                ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], c.ce::DOUBLE[]) DESC, c.cid) AS rn
         |      FROM embeddings e CROSS JOIN c),
         |cells AS (SELECT vec_id, cid FROM a WHERE rn = 1),
         |qs AS (SELECT vec_id AS q_id, cid FROM a WHERE vec_id < $NumQueries AND rn <= 2)
         |SELECT qs.q_id, n.vec_id AS n_id,
         |       round(list_cosine_similarity(ne.embedding::DOUBLE[], qe.embedding::DOUBLE[]), 6) AS score,
         |       row_number() OVER (PARTITION BY qs.q_id
         |                          ORDER BY list_cosine_similarity(ne.embedding::DOUBLE[], qe.embedding::DOUBLE[]) DESC, n.vec_id) AS rank
         |FROM qs
         |JOIN cells n ON n.cid = qs.cid AND n.vec_id <> qs.q_id
         |JOIN embeddings ne ON ne.vec_id = n.vec_id
         |JOIN embeddings qe ON qe.vec_id = qs.q_id
         |QUALIFY rank <= 5
         |ORDER BY q_id, rank""".stripMargin) { (spark, dir) =>
      val e = table(spark, dir, "embeddings")
      val centsArr = e.filter(col("vec_id").between(CentLo, CentHi))
        .agg(collect_list(
          struct((col("vec_id") - CentLo).as("cid"), col("embedding").as("ce"))).as("cents"))
      // scan-local: rank all 16 centroids per vector (ascending by
      // (-cos, cid) = the oracle's cos DESC, cid ASC), keep best for the
      // corpus and the top 2 as query probes
      val rankedCents = array_sort(transform(col("cents"),
        c => struct((-cosineSim(col("embedding"), c.getField("ce"))).as("ncos"),
                    c.getField("cid").as("cid"))))
      val assigned = e.crossJoin(broadcast(centsArr))
        .withColumn("rc", rankedCents)
        .select(col("vec_id"), col("embedding"),
          element_at(col("rc"), 1).getField("cid").as("cid"),
          element_at(col("rc"), 2).getField("cid").as("cid2"))
      val qs = assigned.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"),
          explode(array(col("cid"), col("cid2"))).as("qcid"))
      assigned.join(broadcast(qs),
          col("cid") === col("qcid") && col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          cosineSim(col("embedding"), col("qv")).as("s"))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("s").desc, col("n_id"))))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("n_id"), round(col("s"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("q_id", "rank")
    },

    // IVF with TRAINED cells: centroids refined by the distributed Lloyd
    // trainer (graft.ml.KMeans, 2 rounds) instead of raw corpus rows, then
    // the same scan-local assignment + cell-local probe. The trainer's
    // arithmetic is integer-deterministic end to end (micro-floored
    // distance argmin, micro-quantized coordinate sums, means (sm/n)/10⁶),
    // so the ORACLE REPLAYS THE FULL TRAINING as two unrolled Lloyd CTE
    // rounds from the same first-k init and hash-checks the probed
    // candidates exactly; ScaleOpsSpec additionally pins recall against
    // brute force ≥ the untrained variant's.
    Q("ann_ivf_trained",
      // init keyed by ROW POSITION in vec_id order (row_number − 1), not
      // by vec_id value: KMeans.train's init is "first k rows by id
      // order" with the centroid index = array position, so the two
      // agree on ANY id space — the earlier `WHERE vec_id < k AND
      // cid = vec_id` form silently coupled to ids being contiguous
      // from 0 (round-6 advice)
      s"""WITH ks AS (SELECT unnest(range(64)) AS k),
         |cb0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
         |               list_transform(embedding, x -> x::DOUBLE) AS c
         |        FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT $Cells)),
         |${lloydIterSql("cb0", 1)},
         |${lloydIterSql("cb1", 2)},
         |df AS (SELECT e.vec_id, cb.cid, ${ivfD2l("e.embedding", "cb.c")} AS d2
         |       FROM embeddings e CROSS JOIN cb2 cb),
         |cells AS (SELECT vec_id, cid FROM
         |          (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM df)
         |          WHERE rn = 1),
         |qs AS (SELECT vec_id AS q_id, cid FROM cells WHERE vec_id < $NumQueries)
         |SELECT qs.q_id, n.vec_id AS n_id,
         |       round(list_cosine_similarity(ne.embedding::DOUBLE[], qe.embedding::DOUBLE[]), 6) AS score,
         |       row_number() OVER (PARTITION BY qs.q_id
         |                          ORDER BY list_cosine_similarity(ne.embedding::DOUBLE[], qe.embedding::DOUBLE[]) DESC, n.vec_id) AS rank
         |FROM qs
         |JOIN cells n ON n.cid = qs.cid AND n.vec_id <> qs.q_id
         |JOIN embeddings ne ON ne.vec_id = n.vec_id
         |JOIN embeddings qe ON qe.vec_id = qs.q_id
         |QUALIFY rank <= 5
         |ORDER BY q_id, rank""".stripMargin) { (spark, dir) =>
      val e = table(spark, dir, "embeddings")
      val trained = graft.ml.KMeans.train(e, "embedding", "vec_id", k = Cells, iters = 2)
      // assignment by the trainer's own metric: micro-floored L2 argmin,
      // first-match (= lowest cid) ties — replayable exactly by the oracle
      val assigned = e
        .select(col("vec_id"), col("embedding"),
          graft.ml.KMeans.assignMicro(col("embedding"), trained.centroids)
            .cast("long").as("cid"))
      val qs = assigned.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("cid").as("qcid"), col("embedding").as("qv"))
      assigned.join(broadcast(qs),
          col("cid") === col("qcid") && col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          cosineSim(col("embedding"), col("qv")).as("s"))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("s").desc, col("n_id"))))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("n_id"), round(col("s"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("q_id", "rank")
    },

    // Exact per-group top-k via the custom TopKBy TypedImperativeAggregate:
    // the window-rank formulation shuffles EVERY row to its group before
    // ranking; the aggregate gets map-side partial reduction, so the
    // exchange carries ≤ k rows per group per map task however large the
    // input (plan-asserted: ObjectHashAggregate with partial_topk_by, no
    // Window). Result identical to the rank window, which is the oracle.
    Q("q_topk_by_agg",
      """SELECT event_type, rnk, event_id,
        |       CAST(floor(value * 1000000) AS BIGINT) AS score_micro
        |FROM (SELECT event_type, event_id, value,
        |             row_number() OVER (PARTITION BY event_type
        |                                ORDER BY value DESC, event_id) AS rnk
        |      FROM events WHERE value IS NOT NULL)
        |WHERE rnk <= 3 ORDER BY event_type, rnk""".stripMargin) { (spark, dir) =>
      events(spark, dir)
        .filter(col("value").isNotNull)
        .groupBy(col("event_type"))
        .agg(graft.functions.TopKFunctions.topkBy(col("event_id"), col("value"), 3).as("top"))
        .select(col("event_type"), posexplode(col("top")).as(Seq("pos", "e")))
        .select(col("event_type"), (col("pos") + 1).cast("long").as("rnk"),
          col("e.payload").as("event_id"),
          floor(col("e.score") * 1000000).cast("long").as("score_micro"))
        .orderBy("event_type", "rnk")
    },

    // Deterministic distributed training-order shuffle — the "global
    // shuffle" every pretraining pipeline runs before sharding, done
    // WITHOUT a global sort: key each doc by a seeded md5 permutation
    // hash, bucket on the hash's LEADING byte range (bucket = byte DIV
    // 32 → 8 contiguous hash ranges, so (bucket, hash) order IS hash
    // order), rank only WITHIN buckets, and lift to a global position
    // via an 8-row cumulative-offset broadcast. At 100 TB the only
    // corpus-sized operations are one scan and one bucket-keyed
    // shuffle of (bucket, hash) pairs; the cross-bucket coordination
    // is the 8-row offset table. The permutation is a pure function of
    // (seed, doc_id) — reproducible across runs, engines, and
    // partitionings, which is what makes a training order auditable.
    Q("curation_shuffle_order",
      """WITH k AS (SELECT doc_id, md5('shuf42:' || doc_id::VARCHAR) AS h FROM documents),
        |b AS (SELECT doc_id, h, ('0x' || substr(h, 1, 2))::BIGINT // 32 AS bucket FROM k),
        |p AS (SELECT doc_id, bucket, h,
        |             row_number() OVER (PARTITION BY bucket ORDER BY h, doc_id) AS pos
        |      FROM b),
        |c AS (SELECT bucket, count(*) AS cnt FROM b GROUP BY bucket),
        |o AS (SELECT bucket,
        |             coalesce(sum(cnt) OVER (ORDER BY bucket
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
        |      FROM c)
        |SELECT p.doc_id, p.bucket::BIGINT AS bucket,
        |       (o.off + p.pos)::BIGINT AS global_pos
        |FROM p JOIN o ON o.bucket = p.bucket
        |ORDER BY global_pos LIMIT 2000""".stripMargin) { (spark, dir) =>
      val keyed = table(spark, dir, "documents")
        .select(col("doc_id"),
          md5(concat(lit("shuf42:"), col("doc_id").cast("string"))).as("h"))
        .withColumn("bucket",
          expr("CAST(conv(substring(h, 1, 2), 16, 10) AS BIGINT) DIV 32"))
      val pos = keyed.withColumn("pos", row_number().over(
          Window.partitionBy(col("bucket")).orderBy(col("h"), col("doc_id"))).cast("long"))
      // 8-row offset table: exclusive prefix sum of bucket sizes — the
      // single-partition window runs over 8 rows, never the corpus.
      // limit(8) is LOSSLESS (bucket = byte DIV 32 ∈ 0..7 by
      // construction) and encodes that bound in the plan, where the
      // unpartitioned-window guard in PlanQualitySpec can see it
      val offsets = keyed.groupBy("bucket").agg(count(lit(1)).as("cnt"))
        .limit(8)
        .withColumn("off", coalesce(sum(col("cnt")).over(
          Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .select("bucket", "off")
      pos.join(broadcast(offsets), Seq("bucket"))
        .select(col("doc_id"), col("bucket").cast("long").as("bucket"),
          (col("off") + col("pos")).cast("long").as("global_pos"))
        .orderBy("global_pos")
        .limit(2000)
    },

    // Auto-derived skew salting — the derive-don't-default contract
    // applied to the q_salted_skew_agg knob: a FIXED salt factor either
    // under-splits a hot key (straggler survives) or over-splits a
    // uniform one (8× partial-agg rows for nothing). The factor is
    // derived from the observed skew: a deterministic stride sample
    // (≤4096 rows at any corpus size) measures the hottest key's share
    // s in basis points, and the salt is ceil(s × 32) clamped to
    // [1, 32] — just enough sub-keys that the hot key's largest shard
    // is back at the uniform per-partition share. The derivation is
    // exact integer arithmetic on a deterministic sample, so the
    // chosen factor is ORACLE-CHECKED (emitted as a column), not just
    // the salted aggregate's result. Cost: one metadata-cheap count +
    // one sample aggregate; the salted two-phase agg is unchanged.
    Q("q_auto_salt_agg",
      """WITH tot AS (SELECT count(*) AS n FROM events),
        |s AS (SELECT greatest(1, (SELECT n FROM tot) // 4096) AS stride),
        |samp AS (SELECT user_id FROM events, s WHERE event_id % s.stride = 0),
        |sc AS (SELECT count(*) AS sn FROM samp),
        |share AS (SELECT max(cnt) * 10000 // (SELECT sn FROM sc) AS bp
        |          FROM (SELECT count(*) AS cnt FROM samp GROUP BY user_id)),
        |sf AS (SELECT least(32, greatest(1, (bp * 32 + 9999) // 10000))::BIGINT AS salt_factor
        |       FROM share)
        |SELECT e.user_id, count(*) AS n,
        |       round(sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0, 2) AS total,
        |       sf.salt_factor
        |FROM events e CROSS JOIN sf
        |GROUP BY e.user_id, sf.salt_factor ORDER BY user_id""".stripMargin) { (spark, dir) =>
      val ev = events(spark, dir)
      val n = ev.count()
      val stride = math.max(1L, n / 4096L)
      val bp = ev.filter(pmod(col("event_id"), lit(stride)) === 0)
        .groupBy("user_id").agg(count(lit(1)).as("cnt"))
        .agg(expr("max(cnt) * 10000 DIV sum(cnt)").as("bp"))
        .head().getLong(0)
      val saltFactor = math.min(32L, math.max(1L, (bp * 32L + 9999L) / 10000L))
      val salted = ev
        .withColumn("salt", pmod(col("event_id"), lit(saltFactor)))
        .groupBy(col("user_id"), col("salt"))
        .agg(count(lit(1)).as("pn"),
          sum(round(col("value") * 100, 0).cast("long")).as("pv"))
      salted.groupBy(col("user_id"))
        .agg(sum(col("pn")).as("n"),
          round(sum(col("pv")) / 100.0, 2).as("total"))
        .withColumn("salt_factor", lit(saltFactor))
        .orderBy("user_id")
    },

    // Salted two-phase aggregation: partial agg on (key, salt) then final on
    // key — the skew-safe shape (a hot key spreads over 8 salt partitions).
    // Result identical to the direct groupBy, which is the oracle.
    Q("q_salted_skew_agg",
      """SELECT user_id, count(*) AS n,
        |       round(sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0, 2) AS total
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (spark, dir) =>
      val salted = events(spark, dir)
        .withColumn("salt", pmod(col("event_id"), lit(8)))
        .groupBy(col("user_id"), col("salt"))
        .agg(count(lit(1)).as("pn"),
          sum(round(col("value") * 100, 0).cast("long")).as("pv"))
      salted.groupBy(col("user_id"))
        .agg(sum(col("pn")).as("n"),
          round(sum(col("pv")) / 100.0, 2).as("total"))
        .orderBy("user_id")
    },

    // Salted skew JOIN — the join-side counterpart of q_salted_skew_agg
    // (AQE's skew-join split automates this; salting is the plan-level
    // form that works under any engine config): the fact side salts each
    // row into one of 8 sub-keys, the dimension side replicates 8×, and
    // the join runs on (key, salt) — a hot key's probe rows spread over
    // 8 partitions instead of one straggler task. Result identical to
    // the unsalted join, which is the oracle; the dim replication is
    // |dim|×8 rows (broadcast-sized here, bounded at scale by
    // salt ∝ observed skew).
    Q("q_salted_skew_join",
      """WITH dim AS (SELECT user_id, count(*) AS user_events,
        |                    sum(CAST(round(value * 100, 0) AS BIGINT))::BIGINT AS user_cents
        |             FROM events GROUP BY user_id)
        |SELECT e.event_id, e.user_id, d.user_events, d.user_cents
        |FROM events e JOIN dim d ON d.user_id = e.user_id
        |ORDER BY e.event_id LIMIT 2000""".stripMargin) { (spark, dir) =>
      val ev = events(spark, dir)
      val dim = ev.groupBy("user_id")
        .agg(count(lit(1)).as("user_events"),
          sum(round(col("value") * 100, 0).cast("long")).as("user_cents"))
      val salted = ev
        .select(col("event_id"), col("user_id"), pmod(col("event_id"), lit(8)).as("salt"))
      val dimReplicated = dim
        .select(col("user_id"), col("user_events"), col("user_cents"),
          explode(sequence(lit(0L), lit(7L))).as("salt"))
      salted.join(dimReplicated, Seq("user_id", "salt"))
        .select(col("event_id"), col("user_id"), col("user_events"), col("user_cents"))
        .orderBy("event_id")
        .limit(2000)
    },

    // Bucketed-layout co-located join: both sides pre-written as
    // parquet tables bucketed (and sorted) by the join key with
    // matching bucket counts, so the sort-merge join reads co-located
    // buckets with ZERO shuffle on either side (plan-pinned: the only
    // hash exchange in the plan belongs to the final aggregate). This
    // is the storage-layout answer to the repeated-join bill at 100 TB:
    // the fact table's join shuffle is paid ONCE at write time (here:
    // staged per session via the catalog, rewritten only when absent)
    // and every subsequent join against any equally-bucketed table is
    // shuffle-free. The merge hint forces the SMJ so the demonstration
    // doesn't silently degrade to a broadcast at test scale; result is
    // identical to the plain join, which is the oracle.
    Q("q_bucketed_colocated_join",
      """SELECT c.c_mktsegment AS mktsegment, count(*) AS n_orders,
        |       round(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)) / 100.0, 2) AS total
        |FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |GROUP BY c.c_mktsegment ORDER BY mktsegment""".stripMargin) { (spark, dir) =>
      val (ordersT, customerT) = bucketedOrdersCustomer(spark, dir)
      spark.table(ordersT).hint("merge")
        .join(spark.table(customerT).hint("merge"),
          col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_mktsegment").as("mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(round(col("o_totalprice") * 100, 0).cast("long")) / 100.0, 2).as("total"))
        .orderBy("mktsegment")
    },

    // Static partition pruning: the date-ranged aggregate over the
    // dt-partitioned event log. The BETWEEN lands in the scan's
    // PartitionFilters (directory-level pruning at planning time, before
    // any file is opened) — 3 of 30 day-directories read, and the same
    // ratio holds when each day is a terabyte. The oracle replays the
    // filter over the raw table: partition layout must never change
    // results, only which bytes are touched. Plan-pinned in
    // PlanQualitySpec (partition filters present, 3 partitions selected).
    Q("q_partition_pruned_scan",
      """SELECT event_type,
        |       count(*) AS n,
        |       CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS value_micro
        |FROM events
        |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-12'
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (spark, dir) =>
      val p = dtPartitionedEvents(spark, dir)
      spark.read.parquet(p)
        .filter(col("dt").between(to_date(lit("2024-01-10")), to_date(lit("2024-01-12"))))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * 1000000).cast("long")).as("value_micro"))
        .orderBy("event_type")
    },

    // DYNAMIC partition pruning: the filter lives on the DIM side (a
    // calendar of interesting days derived at runtime), not on the fact's
    // partition column — static pruning can't see it. Spark's DPP rule
    // turns the broadcast dim into a runtime IN-subquery inside the fact
    // scan's PartitionFilters, so only the dim's surviving days are read
    // (5 of 30 here). At 100 TB this is the difference between scanning
    // the month and scanning the audit days. The oracle replays the
    // equivalent direct predicate (an inner join against a DISTINCT dim
    // IS the filter). Plan-pinned: dynamicpruning expression present in
    // the fact scan.
    Q("q_dpp_partition_join",
      """SELECT event_type,
        |       count(*) AS n,
        |       CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS value_micro
        |FROM events
        |WHERE date_part('day', CAST(ts AS DATE)) % 7 = 1
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (spark, dir) =>
      val p = dtPartitionedEvents(spark, dir)
      val dim = events(spark, dir)
        .select(to_date(col("ts")).as("dt")).distinct()
        .filter(dayofmonth(col("dt")) % 7 === 1)
      spark.read.parquet(p)
        .join(broadcast(dim), Seq("dt"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * 1000000).cast("long")).as("value_micro"))
        .orderBy("event_type")
    },

    // KNN on precomputed norms: the query is written as PLAIN cosine over
    // norm-tagged columns, and the NormPrecomputeRewrite analyzer rule
    // (SURVEY §4 upgrade 3, a Catalyst rule since round 11) rewrites it to
    // normalized_dot — the stored-norm layout cuts the per-row kernel from
    // 3 FMAs/element to 1. Bit-identical to the fused cosine (plan-pinned
    // in PlanQualitySpec: normalized_dot present, cosine_sim absent).
    Q("d2b_knn_precomputed_norm",
      """WITH q AS (SELECT embedding AS qv,
        |                  sqrt(list_aggregate(list_transform(embedding::DOUBLE[], x -> x*x), 'sum')) AS qn
        |           FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id AS vec_id,
        |       round(list_dot_product(e.embedding::DOUBLE[], q.qv::DOUBLE[]) /
        |             (sqrt(list_aggregate(list_transform(e.embedding::DOUBLE[], x -> x*x), 'sum')) * q.qn), 6) AS score
        |FROM embeddings e CROSS JOIN q
        |WHERE e.vec_id <> 0
        |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin) { (spark, dir) =>
      import graft.functions.VectorFunctions.{cosineSim, normTagged}
      val e = table(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"),
          normTagged(l2Norm(col("embedding")), "nrm", "embedding"))
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"), normTagged(col("nrm"), "qn", "qv"))
      e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"),
          round(cosineSim(col("embedding"), col("qv")), 6).as("score"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(10)
    },

    // As-of join (events enriched with the latest preceding signup value
    // per user) — one shuffle of (key, ts), no range explosion; oracle is
    // DuckDB's native ASOF LEFT JOIN.
    Q("q_asof_join",
      """WITH s AS (SELECT user_id, ts, value FROM events WHERE event_type = 'signup')
        |SELECT e.event_id, s.value AS asof_value
        |FROM events e ASOF LEFT JOIN s ON e.user_id = s.user_id AND e.ts >= s.ts
        |ORDER BY e.event_id LIMIT 1000""".stripMargin) { (spark, dir) =>
      val ev = events(spark, dir)
      // event_id rides along as the right-side tie-break for duplicate
      // (user, ts) signups (deterministic: highest event_id wins)
      val right = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("value"), col("event_id"))
      AsOfJoin.join(ev, right, "user_id", "ts", "ts", Seq("value"), tieBreak = Some("event_id"))
        .select(col("event_id"), col("asof_value"))
        .orderBy("event_id")
        .limit(1000)
    },

    // Forward as-of join WITH tolerance (the pandas merge_asof surface —
    // direction='forward', tolerance=10min): every view event attributed
    // to the next purchase by the same user within the window, the
    // conversion-attribution query of any behavioral pipeline. Same
    // one-(key, ts)-shuffle plan as q_asof_join — the tolerance is a
    // scan-local gate on the carried match's own timestamp, never a range
    // join. The oracle replays with an explicit rank-1 forward match.
    Q("q_asof_join_forward_tol",
      """WITH v AS (SELECT event_id AS view_id, user_id, epoch_us(ts) AS vts
        |           FROM events WHERE event_type = 'view'),
        |p AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS pts
        |      FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT v.view_id, p.purchase_id, p.pts,
        |             row_number() OVER (PARTITION BY v.view_id
        |                                ORDER BY p.pts, p.purchase_id) AS rn
        |      FROM v JOIN p ON p.user_id = v.user_id AND p.pts >= v.vts)
        |SELECT v.view_id, v.user_id,
        |       CASE WHEN j.pts - v.vts <= 600000000 THEN j.purchase_id END AS purchase_id,
        |       CASE WHEN j.pts - v.vts <= 600000000 THEN j.pts - v.vts END AS gap_us
        |FROM v LEFT JOIN (SELECT * FROM j WHERE rn = 1) j ON j.view_id = v.view_id
        |ORDER BY v.view_id LIMIT 2000""".stripMargin) { (spark, dir) =>
      val ev = events(spark, dir).withColumn("tsu", expr("unix_micros(ts)"))
      val v = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"), col("tsu"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("tsu").as("ptsu"), col("event_id"))
      AsOfJoin.join(v, p, "user_id", "tsu", "ptsu",
          Seq("event_id", "ptsu"), tieBreak = Some("event_id"),
          direction = "forward", tolerance = Some(600000000L))
        .select(col("view_id"), col("user_id"),
          col("asof_event_id").as("purchase_id"),
          (col("asof_ptsu") - col("tsu")).as("gap_us"))
        .orderBy("view_id")
        .limit(2000)
    },

    // Range (interval-overlap) join, binned: every event joined to the
    // 30-minute incident windows that contain it. The naive plan is an
    // inequality-only join — a BroadcastNestedLoopJoin that goes quadratic
    // at scale. The scale path: quantize time into bins the size of the
    // window, explode each window into the (≤2) bins it covers, bin each
    // event, EQUI-join on the bin, then apply the exact range filter —
    // the join key makes it a hash/merge join, and since an event's bin is
    // unique, no pair can match twice (no dedup pass). The oracle is the
    // plain inequality join.
    Q("q_range_join_binned",
      """WITH w AS (SELECT event_id AS window_id, epoch_ms(ts) AS ws
        |           FROM events WHERE event_type = 'error')
        |SELECT w.window_id, count(*) AS n_events
        |FROM w JOIN events e ON epoch_ms(e.ts) >= w.ws AND epoch_ms(e.ts) < w.ws + 1800000
        |GROUP BY w.window_id
        |ORDER BY n_events DESC, window_id LIMIT 100""".stripMargin) { (spark, dir) =>
      // Round 11: the sf10 decade ladder caught the bin-join form
      // materializing Σ_bin |errors|·|events| pairs — on a FIXED 30-day
      // span both densities grow with the corpus, so 10x data measured
      // ~100x work (50.2 s at sf10; the r10 simhash lesson at the
      // interval-count shape). The fix is DENSITY-DERIVED (the
      // derive-don't-default contract): one span-bounded histogram pass
      // (span/B rows at ANY corpus size) prices both plans driver-side,
      // then
      //  - sparse (pair work ≤ 32 linear passes — the measured per-row
      //    cost ratio between a codegen'd join-probe row and a
      //    shuffle+sort window row: at pairWork/total = 28 (sf0.1) the
      //    two branches tie within noise, at 277 (sf1) the prefix wins
      //    ~3x and the gap widens with density): the broadcast bin-join,
      //    cheaper while the pair product stays near-linear, or
      //  - dense: a prefix-count — n_events(w) = cdf(ws+B) − cdf(ws),
      //    cdf(t) = #events with ms < t — split into the histogram's
      //    exclusive prefix (a driver literal, the centroid-array
      //    pattern) + a per-bin running count (one keyed window, bins
      //    uniform by construction of time). ZERO joins, work linear in
      //    events + probes (3.1 s at sf10 vs 50.2). Ties break exactly:
      //    probes order before events at equal ms, so "< t" is strict
      //    and the window's own error row at ms = ws stays counted,
      //    matching the inclusive start. Both branches verified
      //    hash-identical vs the oracle at three SFs.
      val B = 1800000L
      val ev = events(spark, dir).withColumn("ms", unix_millis(col("ts")))
      // span-bounded per-bin statistics (span/B rows at ANY corpus size)
      def binHistogram(): Array[(Long, Long, Long)] =
        ev.groupBy(floor(col("ms") / B).cast("long").as("bin"))
          .agg(count(lit(1)).as("cnt"),
            count(when(col("event_type") === "error", 1)).as("err"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      // The CACHED histogram prices the two physical plans, per (session,
      // corpus) like every other derived-stat cache here — a real engine
      // maintains table statistics, it does not rescan for them on each
      // query. It is PRICING-ONLY: stale stats may pick the slower (still
      // correct) branch, never a wrong result — the dense branch below
      // recomputes its prefix counts from a LIVE scan (r12 advice: a
      // result fed by cached counts would silently go wrong if the dir's
      // data were rewritten in-session).
      val binCnt = rangeBinStats.getOrBuild((spark, dir))(binHistogram())
      val total = binCnt.map(_._2).sum
      val cnts = binCnt.map(t => t._1 -> t._2).toMap
      val pairWork = binCnt.map { case (b, _, e) =>
        e * (cnts.getOrElse(b, 0L) + cnts.getOrElse(b + 1, 0L))
      }.sum
      if (pairWork <= 32 * total) {
        val w = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("window_id"), col("ms").as("ws"))
          .withColumn("bin", explode(array_distinct(array(
            floor(col("ws") / B), floor((col("ws") + B - 1) / B)))))
        val e = ev.select(col("ms"), floor(col("ms") / B).as("bin"))
        e.join(w, Seq("bin"))
          .filter(col("ms") >= col("ws") && col("ms") < col("ws") + B)
          .groupBy(col("window_id"))
          .agg(count(lit(1)).as("n_events"))
          .orderBy(col("n_events").desc, col("window_id"))
          .limit(100)
      } else {
        // LIVE histogram for the result-feeding prefix: one extra
        // span-bounded aggregation per invocation buys independence from
        // the stats cache (see its comment above)
        val liveBin = binHistogram()
        val liveCnts = liveBin.map(t => t._1 -> t._2).toMap
        val minBin = liveBin.head._1
        val nBins = (liveBin.last._1 - minBin + 2).toInt // + one-past-the-end
        val cumBefore = new Array[Long](nBins)
        locally {
          var run = 0L
          var i = 0
          while (i < nBins) {
            cumBefore(i) = run; run += liveCnts.getOrElse(minBin + i, 0L); i += 1
          }
        }
        val eRows = ev.select(col("ms").as("t"), lit(1L).as("w"),
          lit(null).cast("long").as("window_id"), lit(null).cast("int").as("kind"))
        val probes = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("window_id"), col("ms").as("ws"))
          .select(col("window_id"), explode(array(
            struct(col("ws").as("t"), lit(0).as("kind")),
            struct((col("ws") + B).as("t"), lit(1).as("kind")))).as("p"))
          .select(col("p.t").as("t"), lit(0L).as("w"), col("window_id"),
            col("p.kind").as("kind"))
        val win = Window.partitionBy("bin").orderBy(col("t"), col("w"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val binC = floor(col("t") / B).cast("long")
        val idx = least(greatest(binC - minBin, lit(0L)), lit((nBins - 1).toLong))
        eRows.unionByName(probes)
          .withColumn("bin", binC)
          .withColumn("within", sum(col("w")).over(win))
          .filter(col("window_id").isNotNull)
          .withColumn("cdf",
            element_at(typedlit(cumBefore.toSeq), (idx + 1).cast("int")) + col("within"))
          .groupBy("window_id")
          .agg((max(when(col("kind") === 1, col("cdf"))) -
                max(when(col("kind") === 0, col("cdf")))).as("n_events"))
          .orderBy(col("n_events").desc, col("window_id"))
          .limit(100)
      }
    },

    // Sessionization: 30-minute-gap session ids via lag + running sum —
    // the canonical event-pipeline shape (keyed window, one shuffle).
    Q("q_sessionize",
      """WITH x AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ms,
        |         CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) > 1800000
        |                   OR lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) IS NULL
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (SELECT user_id, event_id, ms,
        |             sum(brk) OVER (PARTITION BY user_id ORDER BY ms, event_id ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
        |      FROM x)
        |SELECT user_id, session_id, count(*) AS n, max(ms) - min(ms) AS dur_ms
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
      val x = events(spark, dir)
        .withColumn("ms", unix_millis(col("ts")))
        .withColumn("brk",
          when(col("ms") - lag(col("ms"), 1).over(w) > 1800000 ||
               lag(col("ms"), 1).over(w).isNull, 1).otherwise(0))
      x.withColumn("session_id",
          sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n"), (max(col("ms")) - min(col("ms"))).as("dur_ms"))
        .orderBy("user_id", "session_id")
    },

    // Rollup: hierarchical aggregates in one pass.
    Q("q_rollup",
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (spark, dir) =>
      table(spark, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    },

    // Exact interpolated quantiles (both engines: linear interpolation over
    // the sorted set).
    Q("q_quantiles",
      """SELECT event_type,
        |       round(quantile_cont(value::DOUBLE, 0.5), 4) AS p50,
        |       round(quantile_cont(value::DOUBLE, 0.9), 4) AS p90,
        |       round(quantile_cont(value::DOUBLE, 0.99), 4) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (spark, dir) =>
      events(spark, dir)
        .groupBy("event_type")
        .agg(
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.9)"), 4).as("p90"),
          round(expr("percentile(value, 0.99)"), 4).as("p99"))
        .orderBy("event_type")
    },

    // Histogram-sketch quantiles — the mergeable scale path next to
    // q_quantiles' exact percentile (which sorts every group): bin the
    // value domain into 1024 fixed integer-cent buckets, count per
    // (group, bin) with map-side combine (≤ groups×1024 keys shuffle at
    // ANY corpus size), read quantiles off the cumulative histogram.
    // Histograms merge by addition, so this is also the incremental /
    // streaming form (partial histograms union and re-sum). Everything
    // is integer arithmetic — bin index, bin edge, ceil thresholds — so
    // both engines agree bit-for-bit; estimate error is bounded by one
    // bin width (the spec pins it against the exact percentile).
    Q("sketch_quantile_hist",
      s"""WITH ev AS (SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents
         |            FROM events),
         |mm AS (SELECT min(cents) AS mn, max(cents) AS mx FROM ev),
         |hb AS (SELECT event_type,
         |              least(1023, (cents - mn) * 1024 // (mx - mn + 1)) AS bin,
         |              count(*) AS n
         |       FROM ev CROSS JOIN mm GROUP BY event_type, bin),
         |$quantileReadoffSql""".stripMargin) { (spark, dir) =>
      val ev = events(spark, dir)
        .select(col("event_type"), round(col("value") * 100, 0).cast("long").as("cents"))
      val mm = ev.agg(min(col("cents")).as("mn"), max(col("cents")).as("mx"))
      val hb = ev.crossJoin(broadcast(mm))
        .select(col("event_type"),
          least(lit(1023L), expr("(cents - mn) * 1024 div (mx - mn + 1)")).as("bin"))
        .groupBy("event_type", "bin").agg(count(lit(1)).as("n"))
      quantileReadoff(hb, mm)
    },

    // Histogram-sketch MERGEABILITY — the incremental form promised by
    // sketch_quantile_hist, made concrete: 30 per-DAY partial histograms
    // (the daily micro-batch of a streaming pipeline, or one executor's
    // shard) re-sum bin-wise into the monthly histogram, and the same
    // cumulative-threshold read-off yields the same quantile estimates.
    // The honest mergeability contract for fixed-bin histograms is that
    // bin GEOMETRY is agreed before binning — here (mn, mx) itself
    // merges associatively (min of daily mins, max of daily maxes), so
    // the agreement costs one metadata-scale pass. Equality with the
    // direct single-pass sketch is pinned by ScaleOpsSpec (row-for-row
    // against sketch_quantile_hist).
    Q("sketch_quantile_merge",
      s"""WITH ev AS (SELECT CAST(ts AS DATE) AS dy, event_type,
         |                   CAST(round(value * 100, 0) AS BIGINT) AS cents
         |            FROM events),
         |dm AS (SELECT dy, min(cents) AS mn_d, max(cents) AS mx_d FROM ev GROUP BY dy),
         |mm AS (SELECT min(mn_d) AS mn, max(mx_d) AS mx FROM dm),
         |dh AS (SELECT dy, event_type,
         |              least(1023, (cents - mn) * 1024 // (mx - mn + 1)) AS bin,
         |              count(*) AS n
         |       FROM ev CROSS JOIN mm GROUP BY dy, event_type, bin),
         |hb AS (SELECT event_type, bin, sum(n) AS n FROM dh GROUP BY event_type, bin),
         |$quantileReadoffSql""".stripMargin) { (spark, dir) =>
      val ev = events(spark, dir)
        .select(to_date(col("ts")).as("dy"), col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents"))
      // geometry merge: per-day (min, max) partials → global edges
      val dm = ev.groupBy("dy").agg(min(col("cents")).as("mn_d"), max(col("cents")).as("mx_d"))
      val mm = dm.agg(min(col("mn_d")).as("mn"), max(col("mx_d")).as("mx"))
      // per-day partial histograms on the agreed edges, then bin-wise
      // re-sum; the read-off is LITERALLY sketch_quantile_hist's (shared
      // helper), which is what makes the row-for-row equality pin a
      // mergeability statement rather than a coincidence
      val dh = ev.crossJoin(broadcast(mm))
        .select(col("dy"), col("event_type"),
          least(lit(1023L), expr("(cents - mn) * 1024 div (mx - mn + 1)")).as("bin"))
        .groupBy("dy", "event_type", "bin").agg(count(lit(1)).as("n"))
      val hb = dh.groupBy("event_type", "bin").agg(sum(col("n")).as("n"))
      quantileReadoff(hb, mm)
    },

    // Embedding-space outlier detection: distance-to-centroid flags, the
    // "drop the degenerate embeddings" gate a vector corpus runs before
    // indexing (encoder failures and empty inputs land far from the
    // centroid). EXACT integer discipline end-to-end: per-dim micro sums
    // give the centroid (the ml_pca_covariance convention), each
    // vector's squared distance floors per-dim to micros before the
    // order-free integer sum, and the outlier rule is the integer
    // cross-multiplication d2·n > 4·Σd2 (4× the mean squared distance) —
    // no float aggregate anywhere, so no summation-order hazard. Two
    // corpus passes (centroid, then distances), centroid broadcast.
    Q("embed_outlier_flags",
      """WITH s AS (SELECT ks.k,
        |             sum(CAST(floor(embedding[ks.k + 1]::DOUBLE * 1000000) AS BIGINT))::BIGINT AS sm,
        |             count(*) AS n
        |           FROM embeddings CROSS JOIN (SELECT unnest(range(64)) AS k) ks GROUP BY ks.k),
        |m AS (SELECT k, sm::DOUBLE / (n * 1000000) AS mu FROM s),
        |ml AS (SELECT list(mu ORDER BY k) AS mu FROM m),
        |d AS (SELECT vec_id,
        |             list_aggregate(list_transform(range(64),
        |               i -> CAST(floor((embedding[i + 1]::DOUBLE - mu[i + 1])
        |                              * (embedding[i + 1]::DOUBLE - mu[i + 1]) * 1000000) AS BIGINT)),
        |               'sum')::BIGINT AS d2_micro
        |      FROM embeddings CROSS JOIN ml),
        |st AS (SELECT count(*) AS n, sum(d2_micro)::BIGINT AS s1 FROM d)
        |SELECT vec_id, d2_micro, (d2_micro * st.n > 4 * st.s1) AS is_outlier
        |FROM d CROSS JOIN st ORDER BY vec_id LIMIT 1000""".stripMargin) { (spark, dir) =>
      outlierFlags(table(spark, dir, "embeddings"),
          stageKey = Some(s"$dir#outlier_d2"))
        .orderBy("vec_id")
        .limit(1000)
    },

    // Embedding-space decontamination — the semantic complement of the
    // n-gram suites (curation_decontaminate / curation_bloom_decontam):
    // paraphrased or reformatted eval leakage shares no 5-gram with the
    // eval suite but still sits next to it in embedding space. The eval
    // split (the % 97 convention the n-gram suites use) collects to ONE
    // sorted broadcast struct array — eval suites are MBs while the
    // corpus is the 100 TB side — and the corpus pays a single
    // scan-local argmax fold over that array: no explode, no join, no
    // shuffle anywhere on the corpus side (the bloom-decontam contract,
    // in cosine space). Per-pair scores micro-floor before the argmax so
    // the fold is exact cross-engine; strict > keeps the FIRST (lowest
    // eval id — the array is id-sorted) hit on ties, which the oracle
    // mirrors as min(eid) over the max score.
    Q("curation_embed_decontam",
      """WITH ev AS (SELECT vec_id AS eid, embedding AS ev FROM embeddings WHERE vec_id % 97 = 0),
        |sc AS (SELECT e.vec_id, ev.eid,
        |         CAST(floor(list_cosine_similarity(e.embedding::DOUBLE[], ev.ev::DOUBLE[]) * 1000000) AS BIGINT) AS c
        |       FROM embeddings e CROSS JOIN ev WHERE e.vec_id % 97 <> 0),
        |mx AS (SELECT vec_id, max(c) AS mx FROM sc GROUP BY vec_id),
        |pk AS (SELECT s.vec_id, m.mx AS mx_micro, min(s.eid) AS nearest_eval
        |       FROM sc s JOIN mx m ON m.vec_id = s.vec_id AND s.c = m.mx
        |       GROUP BY s.vec_id, m.mx)
        |SELECT vec_id, mx_micro, nearest_eval, (mx_micro >= 350000) AS contaminated
        |FROM pk ORDER BY mx_micro DESC, vec_id LIMIT 1000""".stripMargin) { (spark, dir) =>
      val e = table(spark, dir, "embeddings")
      val evs = e.filter(col("vec_id") % 97 === 0)
        .agg(sort_array(collect_list(struct(
          col("vec_id").as("eid"), col("embedding").as("ev")))).as("evs"))
      val best = aggregate(col("evs"),
        struct(lit(Long.MinValue).as("mx"), lit(-1L).as("eid")),
        (acc, h) => {
          val c = floor(cosineSim(col("embedding"), h.getField("ev")) * 1000000).cast("long")
          when(c > acc.getField("mx"),
            struct(c.as("mx"), h.getField("eid").cast("long").as("eid")))
            .otherwise(acc)
        })
      e.filter(col("vec_id") % 97 =!= 0)
        .crossJoin(broadcast(evs))
        .select(col("vec_id"), best.as("b"))
        .select(col("vec_id"), col("b.mx").as("mx_micro"),
          col("b.eid").as("nearest_eval"),
          (col("b.mx") >= 350000L).as("contaminated"))
        .orderBy(col("mx_micro").desc, col("vec_id"))
        .limit(1000)
    },

    // Embedding quantization to int8: per-vector symmetric scale
    // (127/max|v|), floor quantization — the 4x storage compression step of
    // a 100 TB vector corpus. Deterministic floor keeps both engines exact.
    Q("embed_quantize_int8",
      """WITH q AS (
        |  SELECT vec_id,
        |         127.0 / greatest(list_aggregate(list_transform(embedding::DOUBLE[], x -> abs(x)), 'max'), 1e-12) AS scale,
        |         embedding
        |  FROM embeddings)
        |SELECT vec_id,
        |       round(scale, 4) AS scale_r,
        |       md5(array_to_string(list_transform(embedding::DOUBLE[], x -> CAST(floor(x * scale) AS BIGINT)::VARCHAR), ',')) AS q_md5
        |FROM q ORDER BY vec_id LIMIT 1000""".stripMargin) { (spark, dir) =>
      val scale = lit(127.0) / greatest(
        array_max(transform(col("embedding").cast("array<double>"), x => abs(x))), lit(1e-12))
      table(spark, dir, "embeddings")
        .withColumn("scale", scale)
        .select(col("vec_id"),
          round(col("scale"), 4).as("scale_r"),
          md5(concat_ws(",",
            transform(col("embedding").cast("array<double>"),
              x => floor(x * col("scale")).cast("long").cast("string")))).as("q_md5"))
        .orderBy("vec_id")
        .limit(1000)
    },

    // Per-dimension standardization (the z-score/whitening step ahead of
    // PCA or a distance metric — dominant dimensions otherwise swamp the
    // rest): pass 1 aggregates per-dim Σx and Σx² over micro-quantized
    // integers (order-free — the ml_kmeans_step discipline: map-side
    // combine reduces every partition to ≤ d rows, the only shuffle is d
    // compact rows at any corpus size); pass 2 applies z = (x − μ)/σ
    // scan-local against the broadcast d-row stats. The double pipeline
    // (÷, −, ×, sqrt) is IEEE-exact in both engines, so z_micro hashes
    // bit-identically. Integer Σx² bounds the corpus at ~9·10⁶ vectors
    // per long; past that the per-dim sums aggregate as DECIMAL(38) —
    // same plan shape.
    Q("embed_standardize",
      """WITH x AS (SELECT vec_id, ks.k,
        |             CAST(floor(embedding[ks.k + 1]::DOUBLE * 1000000) AS BIGINT) AS xm
        |           FROM embeddings CROSS JOIN (SELECT unnest(range(64)) AS k) ks),
        |st AS (SELECT k, sum(xm)::BIGINT AS sm, sum(xm * xm)::BIGINT AS ss, count(*) AS n
        |       FROM x GROUP BY k)
        |SELECT x.vec_id, x.k::BIGINT AS k,
        |       CAST(floor((x.xm::DOUBLE - st.sm::DOUBLE / st.n)
        |                  / sqrt(st.ss::DOUBLE / st.n - (st.sm::DOUBLE / st.n) * (st.sm::DOUBLE / st.n))
        |                  * 1000000) AS BIGINT) AS z_micro
        |FROM x JOIN st ON st.k = x.k
        |WHERE x.vec_id < 5
        |ORDER BY x.vec_id, x.k""".stripMargin) { (spark, dir) =>
      val e = table(spark, dir, "embeddings")
      val x = e.select(col("vec_id"), posexplode(col("embedding")).as(Seq("k", "xv")))
        .select(col("vec_id"), col("k"),
          floor(col("xv").cast("double") * 1000000).cast("long").as("xm"))
      val st = x.groupBy("k")
        .agg(sum(col("xm")).as("sm"), sum(col("xm") * col("xm")).as("ss"),
          count(lit(1)).as("n"))
      val mean = col("sm").cast("double") / col("n")
      x.filter(col("vec_id") < 5)
        .join(broadcast(st), Seq("k"))
        .select(col("vec_id"), col("k").cast("long").as("k"),
          floor((col("xm").cast("double") - mean)
              / sqrt(col("ss").cast("double") / col("n") - mean * mean)
              * 1000000).cast("long").as("z_micro"))
        .orderBy("vec_id", "k")
    },

    // Random-projection dimensionality reduction: 16 corpus-drawn
    // projection rows, reduced vector = dots against each (the ANN
    // preprocessing step; projection rows broadcast, one scan).
    Q("embed_random_projection",
      s"""WITH h AS (SELECT vec_id - 32 AS hid, embedding AS he FROM embeddings
         |           WHERE vec_id BETWEEN 32 AND 47),
         |d AS (SELECT e.vec_id, h.hid,
         |             CAST(round(list_dot_product(e.embedding::DOUBLE[], h.he::DOUBLE[]) * 1000000, 0) AS BIGINT) AS dp_micro
         |      FROM embeddings e CROSS JOIN h)
         |SELECT vec_id, string_agg(dp_micro::VARCHAR, ',' ORDER BY hid) AS reduced_micro
         |FROM d GROUP BY vec_id ORDER BY vec_id LIMIT 1000""".stripMargin) { (spark, dir) =>
      val e = table(spark, dir, "embeddings")
      val h = e.filter(col("vec_id").between(32, 47))
        .select((col("vec_id") - 32).as("hid"), col("embedding").as("he"))
      e.crossJoin(broadcast(h))
        .select(col("vec_id"), col("hid"),
          round(dotProduct(col("embedding"), col("he")) * 1e6, 0).cast("long").as("dp_micro"))
        .groupBy("vec_id")
        .agg(concat_ws(",",
          transform(array_sort(collect_list(struct(col("hid"), col("dp_micro")))),
            p => p.getField("dp_micro").cast("string"))).as("reduced_micro"))
        .orderBy("vec_id")
        .limit(1000)
    },

    // Per-dimension PSI drift between two corpus snapshots (population
    // stability index — the standard production monitor for "has the
    // embedding distribution moved since the index was built"; PSI>0.1
    // is the conventional investigate threshold). Snapshots here are the
    // even/odd vec_id halves (a structure-free split: PSI ≈ 0 is itself
    // the assertion — a real deployment feeds two time slices). Fixed
    // 8-bin histogram per dim (floor(x·16) clamped to [−4, 3] — bin
    // edges data-independent, as a streaming-safe monitor requires),
    // +1-smoothed. Per-(dim, bin) terms are micro-floored BEFORE the
    // per-dim sum (order-free). Scale shape: one scan → (dim, bin, half)
    // counts with map-side combine (≤ 64·8·2 rows shuffle at any corpus
    // size) → scan-free composition.
    Q("embed_psi_drift",
      """WITH x AS (SELECT vec_id % 2 AS half, ks.k,
        |             least(3, greatest(-4, CAST(floor(embedding[ks.k + 1]::DOUBLE * 16) AS BIGINT))) AS bin
        |           FROM embeddings CROSS JOIN (SELECT unnest(range(64)) AS k) ks),
        |n AS (SELECT half, count(*) // 64 AS nh FROM x GROUP BY half),
        |c AS (SELECT k, bin,
        |        sum(CASE WHEN half = 0 THEN 1 ELSE 0 END)::BIGINT AS c0,
        |        sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)::BIGINT AS c1
        |      FROM x GROUP BY k, bin),
        |t AS (SELECT c.k,
        |        CAST(floor(((c0 + 1)::DOUBLE / (n0.nh + 8) - (c1 + 1)::DOUBLE / (n1.nh + 8))
        |                   * ln(((c0 + 1)::DOUBLE / (n0.nh + 8)) / ((c1 + 1)::DOUBLE / (n1.nh + 8)))
        |                   * 1000000) AS BIGINT) AS term
        |      FROM c CROSS JOIN (SELECT nh FROM n WHERE half = 0) n0
        |             CROSS JOIN (SELECT nh FROM n WHERE half = 1) n1)
        |SELECT k::BIGINT AS k, sum(term)::BIGINT AS psi_micro,
        |       (sum(term) > 100000) AS drifted
        |FROM t GROUP BY k ORDER BY k""".stripMargin) { (spark, dir) =>
      val e = table(spark, dir, "embeddings")
      val x = e.select((col("vec_id") % 2).as("half"),
          posexplode(col("embedding")).as(Seq("k", "xv")))
        .select(col("half"), col("k"),
          least(lit(3L), greatest(lit(-4L),
            floor(col("xv").cast("double") * 16).cast("long"))).as("bin"))
      // per-half row counts: 2 longs to the driver (the same bounded
      // contract as DSIR's nt/nc scalars)
      val nh: Map[Long, Long] = x.groupBy("half").agg((count(lit(1)) / 64).cast("long").as("nh"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val c = x.groupBy("k", "bin")
        .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("c0"),
          sum(when(col("half") === 1, 1L).otherwise(0L)).as("c1"))
      val p = (col("c0") + 1).cast("double") / lit(nh(0L) + 8.0)
      val q = (col("c1") + 1).cast("double") / lit(nh(1L) + 8.0)
      c.select(col("k").cast("long").as("k"),
          floor((p - q) * log(p / q) * 1000000).cast("long").as("term"))
        .groupBy("k")
        .agg(sum(col("term")).as("psi_micro"))
        .select(col("k"), col("psi_micro"), (col("psi_micro") > 100000).as("drifted"))
        .orderBy("k")
    },

    // Z-order (Morton) layout keys: interleave the bits of two query
    // dimensions so ONE sort key clusters BOTH — the lakehouse data-layout
    // trick that lets min/max file stats prune scans on either dimension.
    // Each 4-bit z-prefix bucket is a 4×4 tile in (user-bucket, value-
    // bucket) space; the per-tile min/max bounds ARE the pruning property
    // (asserted in the spec). Scan-local bit math + one compact groupBy.
    Q("q_zorder_key", {
      val zBitsSql = (0 until 4).map(j =>
        s"(((x >> $j) & 1) << ${2 * j}) + (((y >> $j) & 1) << ${2 * j + 1})").mkString(" + ")
      s"""WITH t AS (SELECT user_id % 16 AS x,
         |             CAST(floor(value) AS BIGINT) % 16 AS y
         |           FROM events),
         |z AS (SELECT x, y, ($zBitsSql) AS zv FROM t)
         |SELECT (zv >> 4)::BIGINT AS zbucket, count(*) AS n,
         |       min(x)::BIGINT AS min_x, max(x)::BIGINT AS max_x,
         |       min(y)::BIGINT AS min_y, max(y)::BIGINT AS max_y
         |FROM z GROUP BY zbucket ORDER BY zbucket""".stripMargin
    }) { (spark, dir) =>
      val zBits = (0 until 4).map(j =>
        (shiftright(col("x"), j).bitwiseAND(1) * (1 << (2 * j))) +
        (shiftright(col("y"), j).bitwiseAND(1) * (1 << (2 * j + 1)))).reduce(_ + _)
      events(spark, dir)
        .select((col("user_id") % 16).as("x"),
          (floor(col("value")).cast("long") % 16).as("y"))
        .withColumn("zv", zBits)
        .groupBy(shiftright(col("zv"), 4).cast("long").as("zbucket"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).cast("long").as("min_x"), max(col("x")).cast("long").as("max_x"),
          min(col("y")).cast("long").as("min_y"), max(col("y")).cast("long").as("max_y"))
        .orderBy("zbucket")
    },

    // Matryoshka prefix-dim retrieval (Kusupati et al. 2022): score with
    // only the FIRST 8 of 64 dims (cosine of the truncated vectors — the
    // renormalization is implicit in the norm product) and report which of
    // the cheap top-20 also sit in the full-dim top-20. At scale this is
    // the coarse pass of a two-stage funnel: an 8× narrower scan (and 8×
    // smaller index) feeds a full-dim rerank of 20 rows; both top-k's are
    // TakeOrdered per-partition heaps — no global window, no extra shuffle.
    Q("embed_matryoshka",
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |tr AS (SELECT e.vec_id,
        |              CAST(floor(list_cosine_similarity(list_slice(e.embedding, 1, 8)::DOUBLE[],
        |                                                list_slice(q.qe, 1, 8)::DOUBLE[]) * 1000000) AS BIGINT) AS cos8_micro
        |       FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0),
        |top8 AS (SELECT vec_id, cos8_micro FROM tr ORDER BY cos8_micro DESC, vec_id LIMIT 20),
        |fullk AS (SELECT e.vec_id
        |          FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0
        |          ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]) DESC, e.vec_id
        |          LIMIT 20)
        |SELECT top8.vec_id, top8.cos8_micro,
        |       CASE WHEN fullk.vec_id IS NULL THEN 0 ELSE 1 END::BIGINT AS in_full_topk
        |FROM top8 LEFT JOIN fullk ON fullk.vec_id = top8.vec_id
        |ORDER BY cos8_micro DESC, top8.vec_id""".stripMargin) { (spark, dir) =>
      val e = table(spark, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      val cand = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      val top8 = cand
        .select(col("vec_id"),
          floor(cosineSim(slice(col("embedding"), 1, 8), slice(col("qe"), 1, 8)) * 1000000)
            .cast("long").as("cos8_micro"))
        .orderBy(col("cos8_micro").desc, col("vec_id"))
        .limit(20)
      val fullk = cand
        .select(col("vec_id"), cosineSim(col("embedding"), col("qe")).as("cf"))
        .orderBy(col("cf").desc, col("vec_id"))
        .limit(20)
        .select(col("vec_id"), lit(1L).as("flag"))
      top8.join(fullk, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cos8_micro"),
          coalesce(col("flag"), lit(0L)).as("in_full_topk"))
        .orderBy(col("cos8_micro").desc, col("vec_id"))
    },

    // Hard-negative mining for contrastive / retrieval training: for each
    // anchor, the most-similar vectors OUTSIDE its class (pseudo-label =
    // vec_id mod 4 on the synthetic corpus; a real run joins its label
    // column) — the "hard" negatives a bi-encoder trains against. One
    // scan against the broadcast anchor side, per-anchor TakeOrdered-style
    // heap via the tiny partitioned window — at 100 TB the anchor batch
    // stays broadcast-sized and the corpus never shuffles.
    Q("embed_hard_negatives",
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qe, vec_id % 4 AS qc
         |           FROM embeddings WHERE vec_id < $NumQueries)
         |SELECT q.q_id, e.vec_id AS neg_id,
         |       round(list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]), 6) AS score,
         |       row_number() OVER (PARTITION BY q.q_id
         |                          ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]) DESC, e.vec_id) AS rank
         |FROM q JOIN embeddings e ON e.vec_id % 4 <> q.qc
         |QUALIFY rank <= 5
         |ORDER BY q_id, rank""".stripMargin) { (spark, dir) =>
      val e = table(spark, dir, "embeddings")
      val q = e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
          (col("vec_id") % 4).as("qc"))
      e.join(broadcast(q), (col("vec_id") % 4) =!= col("qc"))
        .select(col("q_id"), col("vec_id").as("neg_id"),
          cosineSim(col("embedding"), col("qe")).as("s"))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("s").desc, col("neg_id"))))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("neg_id"), round(col("s"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("q_id", "rank")
    },

    // SQL interface: the same KNN through spark.sql with the extension-
    // registered cosine_sim — SQL users are first-class (same oracle as d2).
    Q("sql_interface_knn",
      """SELECT e.vec_id AS vec_id,
        |       round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]), 6) AS score
        |FROM embeddings e CROSS JOIN (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
        |WHERE e.vec_id <> 0
        |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin) { (spark, dir) =>
      graft.functions.VectorFunctions.register(spark)
      table(spark, dir, "embeddings").createOrReplaceTempView("graft_embeddings")
      spark.sql(
        """SELECT e.vec_id AS vec_id,
          |       round(cosine_sim(e.embedding, q.qv), 6) AS score
          |FROM graft_embeddings e
          |CROSS JOIN (SELECT embedding AS qv FROM graft_embeddings WHERE vec_id = 0) q
          |WHERE e.vec_id <> 0
          |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin)
    },

    // Approximate distinct counting — ORACLE-GREEN since round 10 as an
    // ERROR-ENVELOPE oracle: Spark's HLL++ and DuckDB's sketch are
    // different algorithms, so hash-matching the estimate is impossible
    // by design — but the oracle CAN compute the exact distinct count,
    // and the estimator's 3σ contract (rsd 0.02 → 6%) folds into a
    // boolean the oracle pins to TRUE. The estimate is deterministic for
    // fixed input, so the boolean is a fixed value, not a flaky
    // probabilistic check; an estimator regression past 3σ now FAILS the
    // gate instead of passing rows-only.
    Q("q_approx_distinct",
      """SELECT event_type, count(DISTINCT user_id) AS exact, TRUE AS within_3sigma
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (spark, dir) =>
      events(spark, dir)
        .groupBy("event_type")
        .agg(
          countDistinct(col("user_id")).as("exact"),
          approx_count_distinct(col("user_id"), 0.02).as("approx"))
        .select(col("event_type"), col("exact"),
          (abs(col("approx") - col("exact")) <= col("exact") * lit(0.06)).as("within_3sigma"))
        .orderBy("event_type")
    },

    // Count-Min sketch over the corpus term-frequency stream: CmsRows
    // seeded md5 hash rows × CmsWidth buckets. The sketch build is the
    // at-scale heavy-hitter primitive — tokens pre-aggregate to term
    // frequencies (map-side combine bounds the shuffle by vocabulary,
    // not corpus), the seeded hashes run per DISTINCT token, and the
    // final shuffle is ≤ CmsRows·CmsWidth compact (row, bucket) keys
    // regardless of corpus size. Both engines replay the identical
    // seeded hash, so the cells are oracle-exact.
    Q("sketch_cms_cells",
      s"""WITH tk AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
         |            FROM documents),
         |c AS (SELECT r.r,
         |             ('0x' || substr(md5(r.r::VARCHAR || ':' || tok), 1, 15))::BIGINT % $CmsWidth AS b
         |      FROM tk CROSS JOIN (SELECT unnest(range($CmsRows)) AS r) r)
         |SELECT r::BIGINT AS r, b::BIGINT AS b, count(*) AS cnt
         |FROM c GROUP BY r, b ORDER BY r, b""".stripMargin) { (spark, dir) =>
      cmsCells(spark, dir).orderBy("r", "b")
    },

    // CMS point-estimate vs exact for the top heavy hitters: est(tok) =
    // min over rows of its cell counter — the classic one-sided estimator
    // (est ≥ exact always; CmsSketchSpec pins the ε·N error bound). The
    // 1k-cell sketch broadcasts; only the exact-count reference pays a
    // token-keyed shuffle.
    Q("sketch_cms_estimate",
      s"""WITH tk AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
         |            FROM documents),
         |cells AS (SELECT r.r,
         |                 ('0x' || substr(md5(r.r::VARCHAR || ':' || tok), 1, 15))::BIGINT % $CmsWidth AS b,
         |                 count(*) AS cnt
         |          FROM tk CROSS JOIN (SELECT unnest(range($CmsRows)) AS r) r GROUP BY r.r, b),
         |top AS (SELECT tok, count(*) AS exact FROM tk
         |        GROUP BY tok ORDER BY exact DESC, tok LIMIT 20),
         |probe AS (SELECT t.tok, t.exact, r.r,
         |                 ('0x' || substr(md5(r.r::VARCHAR || ':' || t.tok), 1, 15))::BIGINT % $CmsWidth AS b
         |          FROM top t CROSS JOIN (SELECT unnest(range($CmsRows)) AS r) r)
         |SELECT p.tok, p.exact, min(c.cnt)::BIGINT AS est
         |FROM probe p JOIN cells c ON c.r = p.r AND c.b = p.b
         |GROUP BY p.tok, p.exact ORDER BY p.exact DESC, p.tok""".stripMargin) { (spark, dir) =>
      val top = termFreqs(spark, dir)
        .select(col("tok"), col("tf").as("exact"))
        .orderBy(col("exact").desc, col("tok")).limit(20)
      top
        .select(col("tok"), col("exact"), explode(cmsRowBuckets(col("tok"))).as("rb"))
        .select(col("tok"), col("exact"), col("rb.r").as("r"), col("rb.b").as("b"))
        .join(broadcast(cmsCells(spark, dir)), Seq("r", "b"))
        .groupBy("tok", "exact")
        .agg(min(col("cnt")).as("est"))
        .orderBy(col("exact").desc, col("tok"))
    },

    // CMS MERGEABILITY — the property that lets 1000 executors (or 1000
    // days of stream) each keep a private sketch and tree-reduce: CMS is
    // LINEAR, so per-source sketches summed cell-wise ARE the global
    // sketch. Proven in-data: cnt_merged (built per source, then summed)
    // and cnt_global (built in one pass) ride in the same row for every
    // cell — byte-identical columns or the oracle compare fails. Shuffle
    // cost: per-source cells ≤ sources·rows·width keys, merge ≤
    // rows·width — both corpus-size-independent.
    Q("sketch_cms_merge",
      s"""WITH tk AS (SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
         |            FROM documents),
         |sc AS (SELECT source, r.r,
         |              ('0x' || substr(md5(r.r::VARCHAR || ':' || tok), 1, 15))::BIGINT % $CmsWidth AS b,
         |              count(*) AS cnt
         |       FROM tk CROSS JOIN (SELECT unnest(range($CmsRows)) AS r) r
         |       GROUP BY source, r.r, b),
         |mg AS (SELECT r, b, sum(cnt) AS cnt_merged FROM sc GROUP BY r, b),
         |gl AS (SELECT r.r,
         |              ('0x' || substr(md5(r.r::VARCHAR || ':' || tok), 1, 15))::BIGINT % $CmsWidth AS b,
         |              count(*) AS cnt_global
         |       FROM tk CROSS JOIN (SELECT unnest(range($CmsRows)) AS r) r
         |       GROUP BY r.r, b)
         |SELECT mg.r::BIGINT AS r, mg.b::BIGINT AS b,
         |       mg.cnt_merged::BIGINT AS cnt_merged, gl.cnt_global::BIGINT AS cnt_global
         |FROM mg JOIN gl ON gl.r = mg.r AND gl.b = mg.b
         |ORDER BY r, b""".stripMargin) { (spark, dir) =>
      val stf = table(spark, dir, "documents")
        .select(col("source"), explode(F.tokens(col("text"))).as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("tf"))
      val scells = stf
        .select(col("source"), col("tf"), explode(cmsRowBuckets(col("tok"))).as("rb"))
        .groupBy(col("source"), col("rb.r").as("r"), col("rb.b").as("b"))
        .agg(sum(col("tf")).as("cnt"))
      val merged = scells.groupBy("r", "b").agg(sum(col("cnt")).as("cnt_merged"))
      merged
        .join(cmsCells(spark, dir).withColumnRenamed("cnt", "cnt_global"), Seq("r", "b"))
        .orderBy("r", "b")
    },

    // KMV (k-minimum-values) distinct-count sketch over the corpus's
    // 5-gram shingle universe: keep the k smallest 60-bit gram hashes;
    // the k-th smallest order statistic estimates the cardinality as
    // (k−1)·2⁶⁰/h₍ₖ₎ (Bar-Yossef et al. 2002 — the mergeable
    // bounded-size alternative to exact countDistinct, and the cheap
    // "how big is the decontamination universe" probe that sizes the
    // Bloom filter above). At 100 TB: hashes are scan-local, each
    // partition's hash-distinct prunes to its local k-minimum, and the
    // global TakeOrdered heap merges k rows per partition; the estimate
    // arithmetic replays exactly cross-engine (2⁶⁰ is a power of two so
    // the multiply is exact, and IEEE divide is correctly rounded). The
    // exact count rides along as the reference, exactly like
    // sketch_cms_estimate's heavy hitters.
    Q("sketch_kmv_distinct",
      s"""WITH gr AS (SELECT DISTINCT unnest(list_transform(range(1, len(regexp_extract_all(lower(text), '[a-z0-9]+')) - 3),
         |              i -> array_to_string(list_slice(regexp_extract_all(lower(text), '[a-z0-9]+'), i, i + 4), ' '))) AS g
         |            FROM documents),
         |h AS (SELECT ('0x' || substr(md5(g), 1, 15))::BIGINT AS h FROM gr),
         |km AS (SELECT h FROM h ORDER BY h LIMIT $KmvK),
         |s AS (SELECT count(*) AS k, max(h) AS hk FROM km)
         |SELECT (SELECT count(*) FROM h) AS n_exact,
         |       CAST(floor((s.k - 1)::DOUBLE * 1152921504606846976 / s.hk::DOUBLE) AS BIGINT) AS kmv_est,
         |       s.k AS k
         |FROM s""".stripMargin) { (spark, dir) =>
      // staged: the k-minimum branch and the exact-count reference both
      // consume the distinct hash set (cardinality-bounded, tiny)
      val h = kmvHashSet(spark, dir)
      val s = h.orderBy("h").limit(KmvK)
        .agg(count(lit(1)).as("k"), max(col("h")).as("hk"))
      h.agg(count(lit(1)).as("n_exact"))
        .crossJoin(s)
        .select(col("n_exact"),
          floor((col("k") - 1).cast("double") * lit(1152921504606846976L)
              / col("hk").cast("double")).cast("long").as("kmv_est"),
          col("k"))
    },

    // KMV sketch MERGE — the property that makes the sketch family
    // distributed: each source builds its own k-minimum sketch, and the
    // union of sketches re-pruned to k IS the global sketch exactly (a
    // globally-k-smallest hash is within its own source's k smallest, so
    // no merge input ever lost it). Per-source estimates and the merged
    // estimate ship in one table with their exact references; the merged
    // row is bit-identical to sketch_kmv_distinct's estimate over the
    // same universe (spec-pinned). Scale shape: the (source, h) distinct
    // is one keyed shuffle with map-side combine; the per-source k-min
    // runs as a SALTED two-phase rank (partial prune within (source,
    // salt), final window over ≤ 8k rows per source — the
    // stratified-sample discipline, no full per-source sort); the merge
    // is a TakeOrdered heap over ≤ sources·k rows.
    Q("sketch_kmv_merge",
      s"""WITH $kmvKeptCtes,
         |ps AS (SELECT k.source, e.n_exact, k.k,
         |              CAST(floor((k.k - 1)::DOUBLE * 1152921504606846976 / k.hk::DOUBLE) AS BIGINT) AS kmv_est
         |       FROM (SELECT source, count(*) AS k, max(h) AS hk FROM kept GROUP BY source) k
         |       JOIN (SELECT source, count(*) AS n_exact FROM hs GROUP BY source) e ON e.source = k.source),
         |mk AS (SELECT h FROM (SELECT DISTINCT h FROM kept) ORDER BY h LIMIT $KmvK),
         |mrow AS (SELECT '(merged)' AS source,
         |                (SELECT count(DISTINCT h) FROM hs) AS n_exact,
         |                count(*) AS k,
         |                CAST(floor((count(*) - 1)::DOUBLE * 1152921504606846976 / max(h)::DOUBLE) AS BIGINT) AS kmv_est
         |         FROM mk)
         |SELECT source, n_exact::BIGINT AS n_exact, k::BIGINT AS k, kmv_est FROM ps
         |UNION ALL SELECT source, n_exact::BIGINT, k::BIGINT, kmv_est FROM mrow
         |ORDER BY source""".stripMargin) { (spark, dir) =>
      val hs = kmvSourceHashes(spark, dir)
      val kept = kmvKeptPerSource(spark, dir)
      val est = floor((col("k") - 1).cast("double") * lit(1152921504606846976L)
          / col("hk").cast("double")).cast("long").as("kmv_est")
      val ps = kept.groupBy("source").agg(count(lit(1)).as("k"), max(col("h")).as("hk"))
        .join(hs.groupBy("source").agg(count(lit(1)).as("n_exact")), "source")
        .select(col("source"), col("n_exact"), col("k"), est)
      val mk = kept.select("h").distinct().orderBy("h").limit(KmvK)
        .agg(count(lit(1)).as("k"), max(col("h")).as("hk"))
      val mrow = hs.select("h").distinct().agg(count(lit(1)).as("n_exact"))
        .crossJoin(mk)
        .select(lit("(merged)").as("source"), col("n_exact"), col("k"), est)
      ps.unionByName(mrow).orderBy("source")
    },

    // KMV set-INTERSECTION estimation (the Theta-sketch family's other
    // half — audience-overlap estimation): for every source pair, clip
    // both k-min sketches to θ = min(maxₐ, max_b); below θ each sketch
    // is a COMPLETE sample of its universe ∩ [0, θ) (any universe hash
    // ≤ a source's k-th minimum is inside its kept set), so shared
    // entries below θ estimate the intersection density:
    // est = ⌊common · 2⁶⁰ / θ⌋. All pairwise work happens in SKETCH
    // space (≤ sources·k rows — that is the sketch's point: overlap of
    // two 100 TB corpora from two k-row summaries); the exact reference
    // rides along from the staged per-source hash set. The pair frame
    // is a broadcast product of the per-source maxima — #sources rows,
    // metadata-scale by construction.
    Q("sketch_kmv_intersect",
      s"""WITH $kmvKeptCtes,
         |$kmvPairCtes,
         |cm AS (SELECT ka.source AS src_a, kb.source AS src_b, count(*) AS common
         |       FROM kept ka JOIN kept kb ON ka.h = kb.h AND ka.source < kb.source
         |       JOIN pairs p ON p.src_a = ka.source AND p.src_b = kb.source
         |       WHERE ka.h < p.theta
         |       GROUP BY ka.source, kb.source)
         |SELECT p.src_a, p.src_b, p.theta,
         |       coalesce(cm.common, 0)::BIGINT AS common,
         |       coalesce(ex.n_exact_inter, 0)::BIGINT AS n_exact_inter,
         |       CAST(floor(coalesce(cm.common, 0)::DOUBLE * 1152921504606846976 / p.theta::DOUBLE) AS BIGINT) AS inter_est
         |FROM pairs p
         |LEFT JOIN cm ON cm.src_a = p.src_a AND cm.src_b = p.src_b
         |LEFT JOIN ex ON ex.src_a = p.src_a AND ex.src_b = p.src_b
         |ORDER BY p.src_a, p.src_b""".stripMargin) { (spark, dir) =>
      val kept = kmvKeptPerSource(spark, dir)
      val pairs = kmvPairThetas(kept)
      val common = kept.select(col("source").as("src_a"), col("h"))
        .join(kept.select(col("source").as("src_b"), col("h")), Seq("h"))
        .filter(col("src_a") < col("src_b"))
        .join(broadcast(pairs), Seq("src_a", "src_b"))
        .filter(col("h") < col("theta"))
        .groupBy("src_a", "src_b").agg(count(lit(1)).as("common"))
      pairs
        .join(common, Seq("src_a", "src_b"), "left")
        .join(kmvExactPairIntersections(spark, dir), Seq("src_a", "src_b"), "left")
        .na.fill(0L, Seq("common", "n_exact_inter"))
        .withColumn("inter_est",
          floor(col("common").cast("double") * lit(1152921504606846976L).cast("double")
            / col("theta").cast("double")).cast("long"))
        .select(col("src_a"), col("src_b"), col("theta"), col("common"),
          col("n_exact_inter"), col("inter_est"))
        .orderBy("src_a", "src_b")
    },

    // KMV set-JACCARD estimation — completes the theta-sketch overlap
    // family (merge = union size, intersect = overlap size, this =
    // overlap RATIO, the number a dedup planner actually routes on):
    // clip both kept sets to θ = min(maxₐ, max_b); below θ the union of
    // the two sketches is a complete sample of (A ∪ B) ∩ [0, θ), so
    // u = |union below θ| estimates the union and common/u estimates
    // Jaccard directly — no division of two separately-noisy estimates.
    // common falls out as count(*) − count(DISTINCT h) (each h appears
    // at most once per source). All pairwise work in sketch space; the
    // pair frame (#sources² rows) and its explode are metadata-scale
    // broadcasts. Integer outputs: union_est = ⌊u·2⁶⁰/θ⌋, jaccard_bp =
    // ⌊common·10⁴/u⌋ (u ≥ k−1 > 0 by construction); exact references
    // ride along from the staged per-source hash set.
    Q("sketch_kmv_jaccard",
      s"""WITH $kmvKeptCtes,
         |$kmvPairCtes,
         |ku AS (SELECT p.src_a, p.src_b, p.theta, k.h
         |       FROM pairs p JOIN kept k ON (k.source = p.src_a OR k.source = p.src_b)
         |       WHERE k.h < p.theta),
         |sk AS (SELECT src_a, src_b, max(theta) AS theta,
         |              count(*) - count(DISTINCT h) AS common,
         |              count(DISTINCT h) AS u_below
         |       FROM ku GROUP BY src_a, src_b)
         |SELECT s.src_a, s.src_b,
         |       s.common::BIGINT AS common, s.u_below::BIGINT AS u_below,
         |       CAST(floor(s.u_below::DOUBLE * 1152921504606846976 / s.theta::DOUBLE) AS BIGINT) AS union_est,
         |       CAST(floor(s.common::DOUBLE * 10000 / s.u_below::DOUBLE) AS BIGINT) AS jaccard_bp,
         |       coalesce(ex.n_exact_inter, 0)::BIGINT AS n_exact_inter
         |FROM sk s LEFT JOIN ex ON ex.src_a = s.src_a AND ex.src_b = s.src_b
         |ORDER BY s.src_a, s.src_b""".stripMargin) { (spark, dir) =>
      val kept = kmvKeptPerSource(spark, dir)
      val pairs = kmvPairThetas(kept)
      // pair × {src_a, src_b} explode keeps the kept-side join a plain
      // equi-join on source against a broadcast (2·#pairs rows)
      val sides = pairs.select(col("src_a"), col("src_b"), col("theta"),
        explode(array(col("src_a"), col("src_b"))).as("source"))
      val sk = kept.join(broadcast(sides), Seq("source"))
        .filter(col("h") < col("theta"))
        .groupBy("src_a", "src_b")
        .agg(max(col("theta")).as("theta"),
          (count(lit(1)) - countDistinct(col("h"))).as("common"),
          countDistinct(col("h")).as("u_below"))
      sk.join(kmvExactPairIntersections(spark, dir), Seq("src_a", "src_b"), "left")
        .na.fill(0L, Seq("n_exact_inter"))
        .select(col("src_a"), col("src_b"), col("common"), col("u_below"),
          floor(col("u_below").cast("double") * lit(1152921504606846976L).cast("double")
            / col("theta").cast("double")).cast("long").as("union_est"),
          floor(col("common").cast("double") * 10000 / col("u_below").cast("double"))
            .cast("long").as("jaccard_bp"),
          col("n_exact_inter"))
        .orderBy("src_a", "src_b")
    },

    // HyperLogLog distinct-count sketch over the same 5-gram shingle
    // universe (Flajolet et al. 2007) — completes the sketch family: CMS
    // answers "how often", KMV and HLL answer "how many distinct", HLL
    // with O(m) registers and NO distinct anywhere in the plan (that is
    // its point — KMV's per-partition heap still touches a hash-distinct
    // set). Register index = low 10 bits of the 60-bit md5 hash; rho =
    // leading-zero rank of the remaining 50 bits, via length(ltrim(bin))
    // in BOTH engines (rem=0 → rho 51 falls out of the ltrim). The 100 TB
    // shape: hash + rho are scan-local, the ONLY shuffle is 1024 register
    // keys with map-side partial max. The harmonic sum is EXACT integer
    // arithmetic — sum of 2^(51-M_j) as BIGINT (≤ 2^61, no float
    // summation order) — and the estimate pays ONE identically-shaped
    // double expression cross-engine (correctly-rounded IEEE ops on a
    // literal constant tree). Empty registers contribute 2^51 each, per
    // the raw estimator. Exact distinct rides along as the reference via
    // KMV's staged hash set (shared checkpoint, one tokenize per session).
    Q("sketch_hll_distinct",
      s"""WITH gr AS (SELECT unnest(list_transform(range(1, len(regexp_extract_all(lower(text), '[a-z0-9]+')) - 3),
         |              i -> array_to_string(list_slice(regexp_extract_all(lower(text), '[a-z0-9]+'), i, i + 4), ' '))) AS g
         |            FROM documents),
         |h AS (SELECT ('0x' || substr(md5(g), 1, 15))::BIGINT AS h FROM gr),
         |r AS (SELECT ${Hll.rhoSql} FROM h),
         |reg AS (SELECT bucket, max(rho) AS mx FROM r GROUP BY bucket),
         |s AS (SELECT count(*)::BIGINT AS n_hit,
         |             ${Hll.sScaledSql} AS s_scaled
         |      FROM reg),
         |ex AS (SELECT count(*)::BIGINT AS n_exact FROM (SELECT DISTINCT h FROM h))
         |SELECT ex.n_exact, s.n_hit, s.s_scaled,
         |       ${Hll.estMicroSql("s.s_scaled")} AS hll_est_micro
         |FROM s CROSS JOIN ex""".stripMargin) { (spark, dir) =>
      val h = table(spark, dir, "documents")
        .select(explode(F.shingles(F.tokens(col("text")), 5)).as("g"))
        .select(F.hash60(col("g")).as("h"))
      val reg = h
        .select(Hll.bucketCol, Hll.rhoCol)
        .groupBy("bucket").agg(max(col("rho")).as("mx"))
      val s = reg.agg(Hll.nHitCol, Hll.sScaledCol)
      // exact reference: KMV's staged distinct hash set (same key, same
      // builder — the two sketches measure the same universe).
      // distinct HASHES, not distinct grams, on BOTH sides: a 60-bit
      // collision between two distinct grams must not skew the compare
      val ex = kmvHashSet(spark, dir).agg(countDistinct(col("h")).as("n_exact"))
      ex.crossJoin(s)
        .select(col("n_exact"), col("n_hit"), col("s_scaled"), Hll.estMicroCol)
    },

    // HLL MERGEABILITY — registers merge by element-wise MAX (max is
    // idempotent and commutative, so per-source registers max-merged ARE
    // the one-pass registers; duplicates across sources cannot skew it).
    // Proven in-data: the "(merged)" row (per-source registers → max →
    // estimate) and the "(global)" row (one register pass over all
    // sources) must be identical field-for-field. Per-source estimate
    // rows ride along with their exact distinct counts — the per-shard
    // view an operator actually monitors. Shuffles: (source, bucket)
    // then bucket keys — ≤ sources·1024 rows regardless of corpus size.
    Q("sketch_hll_merge",
      s"""WITH $kmvKeptCtes,
         |r AS (SELECT source, ${Hll.rhoSql} FROM hs),
         |sreg AS (SELECT source, bucket, max(rho) AS mx FROM r GROUP BY source, bucket),
         |sest AS (SELECT source, count(*)::BIGINT AS n_hit,
         |                ${Hll.sScaledSql} AS s_scaled
         |         FROM sreg GROUP BY source),
         |mreg AS (SELECT bucket, max(mx) AS mx FROM sreg GROUP BY bucket),
         |greg AS (SELECT bucket, max(rho) AS mx FROM r GROUP BY bucket),
         |mest AS (SELECT '(merged)' AS source, count(*)::BIGINT AS n_hit,
         |                ${Hll.sScaledSql} AS s_scaled
         |         FROM mreg),
         |gest AS (SELECT '(global)' AS source, count(*)::BIGINT AS n_hit,
         |                ${Hll.sScaledSql} AS s_scaled
         |         FROM greg),
         |ex AS (SELECT source, count(*)::BIGINT AS n_exact FROM hs GROUP BY source),
         |exall AS (SELECT count(DISTINCT h)::BIGINT AS n_exact FROM hs),
         |un AS (SELECT s.source, ex.n_exact, s.n_hit, s.s_scaled
         |       FROM sest s JOIN ex ON ex.source = s.source
         |       UNION ALL SELECT m.source, x.n_exact, m.n_hit, m.s_scaled FROM mest m CROSS JOIN exall x
         |       UNION ALL SELECT g.source, x.n_exact, g.n_hit, g.s_scaled FROM gest g CROSS JOIN exall x)
         |SELECT source, n_exact, n_hit, s_scaled,
         |       ${Hll.estMicroSql("s_scaled")} AS hll_est_micro
         |FROM un ORDER BY source""".stripMargin) { (spark, dir) =>
      val hs = kmvSourceHashes(spark, dir)
      val r = hs.select(col("source"), Hll.bucketCol, Hll.rhoCol)
      val sreg = r.groupBy("source", "bucket").agg(max(col("rho")).as("mx"))
      // the shared Hll recipe serves all three row kinds (per-source,
      // merged, global) — they cannot drift apart
      def est(regs: org.apache.spark.sql.DataFrame) =
        regs.groupBy("source").agg(Hll.nHitCol, Hll.sScaledCol)
      val mReg = sreg.groupBy("bucket").agg(max(col("mx")).as("mx"))
        .withColumn("source", lit("(merged)"))
      val gReg = r.groupBy("bucket").agg(max(col("rho")).as("mx"))
        .withColumn("source", lit("(global)"))
      val exAll = hs.agg(countDistinct(col("h")).as("n_exact"))
      val sEst = est(sreg)
        .join(hs.groupBy("source").agg(count(lit(1)).as("n_exact")), Seq("source"))
      val mgEst = est(mReg.unionByName(gReg)).crossJoin(broadcast(exAll))
      sEst.select("source", "n_exact", "n_hit", "s_scaled")
        .unionByName(mgEst.select("source", "n_exact", "n_hit", "s_scaled"))
        .withColumn("hll_est_micro", Hll.estMicroCol)
        .orderBy("source")
    },

    // Distributed covariance of the embedding corpus — the PCA/whitening
    // input every embedding-quality pipeline computes. Upper-triangular
    // Gram entries are emitted scan-local (d·(d+1)/2 per row) and
    // map-side-combined, so the only shuffles are 64 mean keys then 2080
    // covariance keys at ANY corpus size. Per-row products are
    // micro-floored BEFORE aggregation (order-free integer sums — the
    // same cross-engine discipline as ml_kmeans_step); the mean itself
    // derives from integer micro-sums, so both engines center on
    // bit-identical doubles. PcaSpec runs the power iteration on these
    // cells to the top principal component.
    Q("ml_pca_covariance",
      """WITH s AS (SELECT ks.k,
        |             sum(CAST(floor(embedding[ks.k + 1]::DOUBLE * 1000000) AS BIGINT))::BIGINT AS sm,
        |             count(*) AS n
        |           FROM embeddings CROSS JOIN (SELECT unnest(range(64)) AS k) ks GROUP BY ks.k),
        |m AS (SELECT k, sm::DOUBLE / (n * 1000000) AS mu FROM s),
        |p AS (SELECT ij.i, ij.j,
        |             CAST(floor((e.embedding[ij.i + 1]::DOUBLE - mi.mu)
        |                      * (e.embedding[ij.j + 1]::DOUBLE - mj.mu) * 1000000) AS BIGINT) AS pm
        |      FROM embeddings e
        |      CROSS JOIN (SELECT a.i, b.j
        |                  FROM (SELECT unnest(range(64)) AS i) a
        |                  CROSS JOIN (SELECT unnest(range(64)) AS j) b
        |                  WHERE b.j >= a.i) ij
        |      JOIN m mi ON mi.k = ij.i
        |      JOIN m mj ON mj.k = ij.j)
        |SELECT i::BIGINT AS i, j::BIGINT AS j, sum(pm)::BIGINT AS cov_sum_micro, count(*) AS n
        |FROM p GROUP BY i, j ORDER BY i, j""".stripMargin) { (spark, dir) =>
      val e = table(spark, dir, "embeddings")
      val sums = e.select(posexplode(col("embedding")).as(Seq("k", "x")))
        .groupBy(col("k").cast("long").as("k"))
        .agg(sum(floor(col("x").cast("double") * 1000000).cast("long")).as("sm"),
          count(lit(1)).as("n"))
      // one broadcastable row holding mu[0..63]; k-sorted so element_at
      // (mu, k+1) is the mean of dimension k
      val mus = sums
        .agg(sort_array(collect_list(struct(col("k"), col("sm"), col("n")))).as("ks"))
        .select(transform(col("ks"),
          s => s.getField("sm").cast("double") / (s.getField("n") * lit(1000000L))).as("mu"))
      // centered vector once per row, then ONE native gram_micro
      // aggregate: each map task folds its slice into a single tri(64)
      // long[] buffer (no per-entry rows to generate or hash — the
      // declarative explode+hashAgg form measured 10× slower), and the
      // exchange carries one 2080-long buffer per partition. The (i, j)
      // labels come back from a 2080-entry literal lookup.
      val triIdx = typedlit(
        (for (i <- 0 until 64; j <- i until 64) yield (i.toLong, j.toLong)).toSeq)
      e.crossJoin(broadcast(mus))
        .select(zip_with(col("embedding"), col("mu"),
          (x, m) => x.cast("double") - m).as("cx"))
        .agg(graft.functions.GramMicro.gramMicro(col("cx"), 64).as("g"))
        .select(col("g.n").as("n"), posexplode(col("g.sums")).as(Seq("pos", "cov_sum_micro")))
        .select(
          element_at(triIdx, col("pos") + 1).getField("_1").as("i"),
          element_at(triIdx, col("pos") + 1).getField("_2").as("j"),
          col("cov_sum_micro"), col("n"))
        .orderBy("i", "j")
    }
  )

  // ---- Count-Min sketch geometry (seeded md5 — the one hash both ----
  // ---- engines share; see F.hash60) ----

  private[graft] final val CmsRows = 4
  private[graft] final val CmsWidth = 256

  /** KMV sketch size (k smallest hashes kept). */
  private[graft] final val KmvK = 256

  /** Quantile read-off over a (event_type, bin, n) histogram `hb`
    * against a one-row (mn, mx) geometry frame `mm`: cumulative window →
    * ceil-threshold bins → bin-edge estimates. ONE recipe for the direct
    * sketch (sketch_quantile_hist) and the merged-partial sketch
    * (sketch_quantile_merge) — ScaleOpsSpec pins them row-for-row equal,
    * which is only a meaningful contract while the read-off is shared.
    * [[quantileReadoffSql]] is the DuckDB twin. */
  private def quantileReadoff(hb: org.apache.spark.sql.DataFrame,
                              mm: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("bin"))
    val wAll = Window.partitionBy(col("event_type"))
    val cum = hb
      .withColumn("cum", sum(col("n")).over(wOrd))
      .withColumn("tot", sum(col("n")).over(wAll))
    def bq(pct: Int) = min(when(
      col("cum") >= expr(s"(tot * $pct + 99) div 100"), col("bin")))
    val est = cum.groupBy("event_type")
      .agg(max(col("tot")).as("n"), bq(50).as("b50"), bq(90).as("b90"), bq(99).as("b99"))
    est.crossJoin(broadcast(mm))
      .select(col("event_type"), col("n"),
        expr("mn + b50 * (mx - mn + 1) div 1024").as("p50_est_cents"),
        expr("mn + b90 * (mx - mn + 1) div 1024").as("p90_est_cents"),
        expr("mn + b99 * (mx - mn + 1) div 1024").as("p99_est_cents"))
      .orderBy("event_type")
  }

  /** DuckDB twin of [[quantileReadoff]]: cum/est CTEs + the final SELECT,
    * appended after CTEs defining hb (event_type, bin, n) and mm (mn, mx). */
  private def quantileReadoffSql: String =
    """cum AS (SELECT event_type, bin, n,
      |               sum(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
      |               sum(n) OVER (PARTITION BY event_type) AS tot
      |        FROM hb),
      |est AS (SELECT event_type, max(tot) AS n,
      |               min(CASE WHEN cum >= (tot * 50 + 99) // 100 THEN bin END) AS b50,
      |               min(CASE WHEN cum >= (tot * 90 + 99) // 100 THEN bin END) AS b90,
      |               min(CASE WHEN cum >= (tot * 99 + 99) // 100 THEN bin END) AS b99
      |        FROM cum GROUP BY event_type)
      |SELECT event_type, n::BIGINT AS n,
      |       (mn + b50 * (mx - mn + 1) // 1024)::BIGINT AS p50_est_cents,
      |       (mn + b90 * (mx - mn + 1) // 1024)::BIGINT AS p90_est_cents,
      |       (mn + b99 * (mx - mn + 1) // 1024)::BIGINT AS p99_est_cents
      |FROM est CROSS JOIN mm ORDER BY event_type""".stripMargin

  /** The embed_outlier_flags pipeline over ANY (vec_id, embedding) frame —
    * extracted so the spec can drive it with a SYNTHETIC far-out vector
    * (the fixtures' near-uniform embeddings never trip the 4×-mean rule,
    * which would leave the true branch of the flag permanently untested).
    * See the registered query for the arithmetic contract. */
  private[graft] def outlierFlags(e: org.apache.spark.sql.DataFrame,
                                  stageKey: Option[String] = None): org.apache.spark.sql.DataFrame = {
    val spark = e.sparkSession
    val sums = e.select(posexplode(col("embedding")).as(Seq("k", "x")))
      .groupBy("k")
      .agg(sum(floor(col("x").cast("double") * 1000000).cast("long")).as("sm"),
        count(lit(1)).as("n"))
    val mu = sums
      .agg(sort_array(collect_list(struct(col("k"),
        (col("sm").cast("double") / (col("n") * 1000000)).as("m")))).as("km"))
      .select(transform(col("km"), x => x.getField("m")).as("mu"))
    // staged when keyed: the stats aggregate AND the flag projection both
    // read the distance table — unstaged, the centroid join evaluates twice
    def d2Plan = e.crossJoin(broadcast(mu))
      .select(col("vec_id"),
        aggregate(zip_with(col("embedding"), col("mu"),
          (x, m) => floor((x.cast("double") - m) * (x.cast("double") - m) * 1000000).cast("long")),
          lit(0L), (s, v) => s + v).as("d2_micro"))
    val d2 = stageKey.map(k => staged(spark, k)(d2Plan)).getOrElse(d2Plan)
    val st = d2.agg(count(lit(1)).as("n"), sum(col("d2_micro")).as("s1"))
    d2.crossJoin(broadcast(st))
      .select(col("vec_id"), col("d2_micro"),
        (col("d2_micro") * col("n") > lit(4L) * col("s1")).as("is_outlier"))
  }

  /** The corpus's distinct 5-gram-shingle 60-bit hash set, staged once per
    * (session, dir) — the shared universe both distinct sketches (KMV,
    * HLL's exact reference) measure. ONE definition on purpose: two
    * inlined copies under the same cache key would let an edit to one
    * silently feed the other a stale or mismatched staging. */
  private def kmvHashSet(spark: SparkSession, dir: String) =
    staged(spark, s"kmv_h#$dir")(
      table(spark, dir, "documents")
        .select(explode(F.shingles(F.tokens(col("text")), 5)).as("g"))
        .distinct()
        .select(F.hash60(col("g")).as("h")))

  /** Per-source distinct 5-gram hash set (source, h), staged: feeds the
    * per-source sketches AND the exact references of sketch_kmv_merge /
    * sketch_kmv_intersect. */
  private def kmvSourceHashes(spark: SparkSession, dir: String) =
    staged(spark, s"kmv_src_h#$dir")(
      table(spark, dir, "documents")
        .select(col("source"), explode(F.shingles(F.tokens(col("text")), 5)).as("g"))
        .select(col("source"), F.hash60(col("g")).as("h"))
        .distinct())

  /** Per-source KMV sketch (source, h): the k smallest distinct hashes
    * per source via the SALTED two-phase rank — partial prune within
    * (source, salt), final window over ≤ 8·k rows per source; same kept
    * set as a direct window (min-k is min-k however you stage it).
    * Staged: merge and intersect both consume it. */
  private def kmvKeptPerSource(spark: SparkSession, dir: String) =
    staged(spark, s"kmv_kept#$dir") {
      import org.apache.spark.sql.expressions.Window
      val hs = kmvSourceHashes(spark, dir)
      val w1 = Window.partitionBy("source", "salt").orderBy("h")
      val pre = hs.withColumn("salt", pmod(col("h"), lit(8)))
        .withColumn("rn1", row_number().over(w1)).filter(col("rn1") <= KmvK)
      val w2 = Window.partitionBy("source").orderBy("h")
      pre.withColumn("rn", row_number().over(w2)).filter(col("rn") <= KmvK)
        .select(col("source"), col("h"))
    }

  /** Per-source-pair θ frame (src_a, src_b, theta): broadcast product of
    * per-source sketch maxima — #sources² rows, metadata-scale by
    * construction. Shared by sketch_kmv_intersect and sketch_kmv_jaccard
    * (one definition; the θ-clip IS the estimator's validity condition). */
  private def kmvPairThetas(kept: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val mx = kept.groupBy("source").agg(max(col("h")).as("mx"))
    mx.select(col("source").as("src_a"), col("mx").as("mxa"))
      .crossJoin(broadcast(mx.select(col("source").as("src_b"), col("mx").as("mxb"))))
      .filter(col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"), least(col("mxa"), col("mxb")).as("theta"))
  }

  /** Exact per-pair intersection sizes (src_a, src_b, n_exact_inter) —
    * the hs-on-h self-join is the only corpus-sized piece of either
    * overlap estimator, so it is STAGED and computed once per (session,
    * dir) for both sketch_kmv_intersect and sketch_kmv_jaccard. */
  private def kmvExactPairIntersections(spark: SparkSession, dir: String) =
    staged(spark, s"kmv_ex_pair#$dir") {
      val hs = kmvSourceHashes(spark, dir)
      hs.select(col("source").as("src_a"), col("h"))
        .join(hs.select(col("source").as("src_b"), col("h")), Seq("h"))
        .filter(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_exact_inter"))
    }

  /** DuckDB twin of [[kmvPairThetas]] + [[kmvExactPairIntersections]]:
    * defines CTEs mx, pairs (src_a, src_b, theta) and ex (src_a, src_b,
    * n_exact_inter), over the kept/hs CTEs from [[kmvKeptCtes]]. */
  private def kmvPairCtes: String =
    """mx AS (SELECT source, max(h) AS mx FROM kept GROUP BY source),
      |pairs AS (SELECT a.source AS src_a, b.source AS src_b, least(a.mx, b.mx) AS theta
      |          FROM mx a JOIN mx b ON a.source < b.source),
      |ex AS (SELECT ha.source AS src_a, hb.source AS src_b, count(*) AS n_exact_inter
      |       FROM hs ha JOIN hs hb ON ha.h = hb.h AND ha.source < hb.source
      |       GROUP BY ha.source, hb.source)""".stripMargin

  /** DuckDB twin of [[kmvSourceHashes]] + [[kmvKeptPerSource]]: defines
    * CTEs gr, hs (source, h) and kept (source, h). */
  private def kmvKeptCtes: String =
    s"""gr AS (SELECT source, unnest(list_transform(range(1, len(regexp_extract_all(lower(text), '[a-z0-9]+')) - 3),
       |              i -> array_to_string(list_slice(regexp_extract_all(lower(text), '[a-z0-9]+'), i, i + 4), ' '))) AS g
       |            FROM documents),
       |hs AS (SELECT DISTINCT source, ('0x' || substr(md5(g), 1, 15))::BIGINT AS h FROM gr),
       |kept AS (SELECT source, h FROM (
       |           SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM hs)
       |         WHERE rn <= $KmvK)""".stripMargin

  /** Term frequencies (tok → tf), staged once per (session, dir): the
    * sketch build and the exact heavy-hitter reference both consume it.
    * Aggregating FIRST is the at-scale win twice over — map-side combine
    * collapses each partition to its distinct tokens before the shuffle
    * (vocabulary-bounded keys, not the occurrence stream), and the
    * seeded md5 bucket hashes downstream run CmsRows× per DISTINCT
    * token instead of per occurrence. Cell counts are identical:
    * sum of tf per bucket = count of occurrences per bucket. */
  private def termFreqs(spark: SparkSession, dir: String) =
    staged(spark, s"cms_tf#$dir")(
      table(spark, dir, "documents")
        .select(explode(F.tokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("tf")))

  /** The CmsRows (r, bucket) cells of one token: bucket_r = seeded
    * 60-bit md5 hash mod width — identical arithmetic in the DuckDB
    * oracle. Shared with the streaming sketch build (stream_cms_cells)
    * so the batch and incremental forms can't drift. */
  private[graft] def cmsRowBuckets(tok: Column): Column =
    array((0 until CmsRows).map(r =>
      struct(lit(r).cast("long").as("r"),
        (F.hash60(concat(lit(s"$r:"), tok)) % CmsWidth).as("b"))): _*)

  /** The materialized sketch: ≤ CmsRows·CmsWidth counter rows. */
  private[graft] def cmsCells(spark: SparkSession, dir: String) =
    termFreqs(spark, dir)
      .select(col("tf"), explode(cmsRowBuckets(col("tok"))).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(sum(col("tf")).as("cnt"))
}
