package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: `Dev <sfDir> entry` smoke-checks the flagship query;
  * `Dev <sfDir> explain <name>` prints a query's formatted physical plan;
  * `Dev <sfDir> run <name>` shows the result; `Dev <sfDir> time <name>`
  * times it Bench-style (warm + min-of-3). SPARK_GRAFT_CPUS overrides
  * the thread count (default 8). */
object Dev {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).toList match {
      case "entry" :: _ =>
        val df = SparkEntry.entry(spark)
        println(s"entry rows=${df.count()}")
        df.show(10, truncate = false)
      case "explain" :: name :: _ =>
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      case "run" :: name :: _ =>
        SparkEntry.queries(name)(spark, sfDir).show(20, truncate = false)
      case "time" :: name :: _ =>
        val fn = SparkEntry.queries(name)
        fn(spark, sfDir).count() // warm: plan compile + codegen
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"$name min=${ts.min}%.3f runs=[${ts.map(t => f"$t%.3f").mkString(", ")}]")
      case "dump" :: name :: _ =>
        SparkEntry.queries(name)(spark, sfDir).toJSON.collect().foreach(println)
      case "oracle" :: name :: _ =>
        println(SparkEntry.oracleSql.getOrElse(name, s"(no oracle for $name)"))
      case "times" :: list :: _ =>
        // one-JVM multi-query timing (round-15 text-family evidence):
        // same warm + min-of-3 methodology as `time`, all queries in one
        // session so a before/after pair compares inside one window
        list.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
          val fn = SparkEntry.queries(name)
          try {
            fn(spark, sfDir).count()
            val ts = (1 to 3).map { _ =>
              val t0 = System.nanoTime()
              fn(spark, sfDir).count()
              (System.nanoTime() - t0) / 1e9
            }
            println(f"$name min=${ts.min}%.3f runs=[${ts.map(t => f"$t%.3f").mkString(", ")}]")
          } catch { case e: Throwable =>
            println(s"$name FAILED ${e.getClass.getSimpleName}")
          }
        }

      case "jobs" :: name :: _ =>
        // per-JOB wall breakdown of one query execution (round-15
        // measurement): warm run first, then one timed run with a
        // listener printing every job's duration, task count and summed
        // task time — splits a multi-action query (checkpoint loops,
        // streaming foreachBatch, broadcast subjobs) into its jobs so
        // the driver-overhead vs cluster-work split is visible.
        val fn = SparkEntry.queries(name)
        fn(spark, sfDir).count() // warm: plan compile + codegen + staging
        val t0 = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
        val taskN = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
        val taskNanos = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
        val stageJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
        spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            val desc = Option(j.properties)
              .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
            t0.put(j.jobId, (System.nanoTime(), desc))
            j.stageIds.foreach(s => stageJob.put(s, j.jobId))
          }
          override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            val jid = stageJob.getOrDefault(t.stageId, -1)
            taskN.computeIfAbsent(jid, _ => new java.util.concurrent.atomic.AtomicLong).incrementAndGet()
            Option(t.taskMetrics).foreach(m =>
              taskNanos.computeIfAbsent(jid, _ => new java.util.concurrent.atomic.AtomicLong)
                .addAndGet(m.executorRunTime * 1000000L))
          }
          override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            Option(t0.get(j.jobId)).foreach { case (s, desc) =>
              val wall = (System.nanoTime() - s) / 1e9
              val n = Option(taskN.get(j.jobId)).map(_.get).getOrElse(0L)
              val tt = Option(taskNanos.get(j.jobId)).map(_.get).getOrElse(0L) / 1e9
              println(f"[job] id=${j.jobId}%4d wall=$wall%7.3f s tasks=$n%4d taskTime=$tt%7.3f s  $desc")
            }
          }
        })
        val s0 = System.nanoTime()
        fn(spark, sfDir).count()
        println(f"[jobs-total] $name ${(System.nanoTime() - s0) / 1e9}%.3f s")
        Thread.sleep(500) // let late listener events drain before stop

      case "profile-index" :: _ =>
        // phase decomposition of the ann_index_build lifecycle (round-14
        // optimization measurement; mirrors Engine.index's phase order).
        // A listener counts jobs/tasks + sums task time per phase so the
        // wall numbers can be split into cluster work vs driver overhead.
        import graft.queries.table
        import org.apache.spark.sql.functions._
        val jobs = new java.util.concurrent.atomic.AtomicInteger
        val tasks = new java.util.concurrent.atomic.AtomicInteger
        val taskNanos = new java.util.concurrent.atomic.AtomicLong
        spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            jobs.incrementAndGet()
          override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            tasks.incrementAndGet()
            Option(t.taskMetrics).foreach(m => taskNanos.addAndGet(m.executorRunTime * 1000000L))
          }
        })
        def t[A](label: String)(f: => A): A = {
          val (j0, k0, n0) = (jobs.get, tasks.get, taskNanos.get)
          val t0 = System.nanoTime(); val r = f
          val wall = (System.nanoTime() - t0) / 1e9
          println(f"[profile] $label%-28s $wall%7.3f s  jobs=${jobs.get - j0}%3d tasks=${tasks.get - k0}%4d taskTime=${(taskNanos.get - n0) / 1e9}%7.3f s")
          r
        }
        (1 to 3).foreach { round =>
          println(s"-- round $round --")
          val root = graft.util.TempRoot.dir("profile-idx-").toString
          val ws = new graft.store.Workspace(spark, root)
          val docs = table(spark, sfDir, "documents")
          val embedder = graft.embed.HashNgramEmbedder(dim = 64)
          t("chunk+embed (count only)") {
            graft.store.ChunkStore.buildChunks(docs, embedder).count()
          }
          t("buildChunks+writeChunks") {
            ws.writeChunks(graft.store.ChunkStore.buildChunks(docs, embedder))
          }
          t("postings build+write") {
            val chunks = ws.readLiveChunks()
            ws.writePostings(graft.store.TokenIndex.build(
              chunks.select(col("id"), concat_ws(" ",
                coalesce(col("heading_path"), lit("")), col("text_chunk")).as("itext")),
              "id", "itext"))
          }
          val trained = t("ann train") {
            graft.search.AnnIndex.build(ws.readLiveChunks(), "id", "embedding", 8)
          }
          t("ann quantize+write") { ws.writeAnn(trained._1, trained._2, None) }
          t("count") { ws.count() }
          graft.util.TempRoot.deleteRecursively(java.nio.file.Paths.get(root))
        }

      case "snb-probe" :: _ =>
        // structural fan-out evidence for the parallel sorted-neighborhood
        // on the degenerate skew corpus (round-12 verdict task 1)
        println(graft.queries.DedupQueries.snbProbe(spark, sfDir))
      case "recall-clustered" :: rest =>
        val n = rest.headOption.map(_.toInt).getOrElse(2000)
        println(graft.queries.RecallEval.evaluateClustered(spark, n = n, dim = 64).json)
      case _ =>
        println(s"queries: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    }
    spark.stop()
  }
}
