package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.F

/** Text-analysis suite for the training-data pipeline: language ID, quality
  * scoring, token statistics, document fingerprinting. All scan-local (no
  * shuffle except the final order/limit), so they scale linearly with
  * corpus size.
  */
object TextQueries {

  private val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "que", "de", "y"))

  private val enStops = langStopwords.head._2

  private def stopScore(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  private def stopScoreSql(words: Seq[String]): String = {
    val inList = words.map(w => s"'$w'").mkString(", ")
    s"len(list_filter(toks, t -> t IN ($inList)))"
  }

  private val toksSql = "regexp_extract_all(lower(text), '[a-z0-9]+')"

  /** The document quality score in integer micros — ONE definition,
    * shared by text_quality_score (per-doc) and curation_dataset_card
    * (per-source rollup): length / punctuation / stopword / word-length
    * mix, weights 0.3/0.3/0.2/0.2. */
  private def qualityMicro(text: Column, toks: Column): Column = {
    val punct = length(regexp_replace(lower(text), "[a-z0-9 ]", "")).cast("double") /
      greatest(length(text), lit(1))
    val nTok = size(toks)
    val stopRatio = stopScore(toks, enStops).cast("double") / greatest(nTok, lit(1))
    val avgLen = aggregate(transform(toks, x => length(x)), lit(0), (a, x) => a + x).cast("double") /
      greatest(nTok, lit(1))
    floor((lit(0.3) * least(nTok / 100.0, lit(1.0)) +
           lit(0.3) * (lit(1.0) - punct) +
           lit(0.2) * least(stopRatio * 5.0, lit(1.0)) +
           lit(0.2) * least(avgLen / 8.0, lit(1.0))) * 1000000).cast("long")
  }

  /** DuckDB twin of [[qualityMicro]], over a frame carrying text + toks. */
  private def qualityMicroSql: String =
    s"""CAST(floor((0.3 * least(len(toks) / 100.0, 1.0)
       | + 0.3 * (1.0 - length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))::DOUBLE / greatest(length(text), 1))
       | + 0.2 * least((${stopScoreSql(enStops)})::DOUBLE / greatest(len(toks), 1) * 5.0, 1.0)
       | + 0.2 * least(list_aggregate(list_transform(toks, x -> length(x)), 'sum')::DOUBLE / greatest(len(toks), 1) / 8.0, 1.0)) * 1000000) AS BIGINT)""".stripMargin.replace("\n", "")

  /** The seq-pack oracle, shared by text_seq_pack (batch) and
    * stream_seq_pack (incremental) — ONE definition on purpose: the two
    * engines' layouts must stay bit-identical, so their oracle must be
    * literally the same SQL. */
  private[queries] val seqPackSql: String =
    s"""WITH t AS (SELECT doc_id,
       |             len($toksSql)::BIGINT AS n_tokens,
       |             ('0x' || substr(md5(doc_id::VARCHAR || ':pack'), 1, 15))::BIGINT % ${Packing.Buckets} AS bucket
       |           FROM documents),
       |c AS (SELECT doc_id, bucket, n_tokens,
       |             coalesce(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
       |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum
       |      FROM t)
       |SELECT doc_id, bucket, bucket * ${Packing.SeqIdStride} + cum // ${Packing.SeqLen} AS seq_id,
       |       cum % ${Packing.SeqLen} AS seq_off, n_tokens
       |FROM c ORDER BY doc_id LIMIT 1000""".stripMargin

  // one BPE training run per (session, sfdir): text_bpe_train,
  // text_bpe_encode, and the replay spec share the 3-round BSP loop
  private val mergeCache = new graft.util.SessionCache[
    (org.apache.spark.sql.SparkSession, String), Seq[(Long, String, String, Long)]](8)

  /** Boundary-correct BPE merge apply, one SQL string valid in BOTH
    * engines (concat/replace/trim only). A raw substring replace of
    * `"h e"` also fires where `h` is merely the SUFFIX of a longer symbol
    * (`"th e"` → `"the"` — merging a pair the count never saw). The fix:
    * double every separator and pad the ends, so each symbol owns a space
    * on each side and the pattern `" h  e "` can only match whole
    * symbols; consecutive pair occurrences stay non-overlapping
    * (`"h e h e"` merges both), then collapse the doubled separators.
    * `prSel`/`mergedSel` are SQL expressions (literals or subselects). */
  private[graft] def applyMergeSql(inner: String, prSel: String, mergedSel: String): String =
    s"trim(replace(replace(concat(' ', replace($inner, ' ', '  '), ' '), " +
      s"concat(' ', replace($prSel, ' ', '  '), ' '), " +
      s"concat(' ', $mergedSel, ' ')), '  ', ' '))"

  // DuckDB oracle builders for the BPE training rounds, shared verbatim
  // by text_bpe_train and text_bpe_encode so the encode oracle replays
  // EXACTLY the training the train oracle reports.
  private def bpePIterSql(sIn: String, n: Int) =
    s"""p$n AS (SELECT pr, sum(freq)::BIGINT AS c FROM (
       |        SELECT unnest(list_transform(range(len(a) - 1), i -> a[i+1] || ' ' || a[i+2])) AS pr, freq
       |        FROM (SELECT string_split(s, ' ') AS a, freq FROM $sIn))
       |       GROUP BY pr),
       |t$n AS (SELECT pr, c FROM p$n ORDER BY c DESC, pr LIMIT 1)""".stripMargin

  private def bpeSNextSql(sIn: String, tIn: String, n: Int) =
    s"""s$n AS (SELECT ${applyMergeSql("s",
           s"(SELECT pr FROM $tIn)", s"replace((SELECT pr FROM $tIn), ' ', '')")} AS s,
       |        freq FROM $sIn)""".stripMargin

  /** The 3-round BPE merge training loop (BSP like graft.ml.KMeans): the
    * word-frequency table is staged once, each round collects ONE argmax
    * pair and applies it scan-local. Returns (step, pair, merged, count). */
  private[graft] def trainMerges(
      spark: org.apache.spark.sql.SparkSession, dir: String): Seq[(Long, String, String, Long)] =
    mergeCache.getOrBuild((spark, dir)) {
      // word-frequency table staged once; every round reads vocab, not corpus
      var cur = table(spark, dir, "documents")
        .select(explode(F.tokens(col("text"))).as("tk"))
        .groupBy("tk").agg(count(lit(1)).as("freq"))
        .select(concat_ws(" ",
          regexp_extract_all(col("tk"), lit("."), lit(0))).as("s"), col("freq"))
        .localCheckpoint()
      val merges = Seq.newBuilder[(Long, String, String, Long)]
      for (step <- 1 to 3) {
        val a = split(col("s"), " ")
        val pairs = cur
          .select(explode(transform(slice(a, lit(1), size(a) - 1),
            (x, i) => concat(x, lit(" "), element_at(a, i + 2)))).as("pr"), col("freq"))
          .groupBy("pr").agg(sum(col("freq")).as("c"))
          .orderBy(col("c").desc, col("pr")).limit(1)
          .head()
        val (pr, c) = (pairs.getString(0), pairs.getLong(1))
        val merged = pr.replace(" ", "")
        merges += ((step.toLong, pr, merged, c))
        // merge apply is scan-local (boundary-correct, see applyMergeSql);
        // re-stage so the next round's count reads the merged table, not
        // a 3-deep replace lineage — and release the previous round's
        // checkpoint blocks once the next is materialized (the last round
        // needs no merged table: its pair is already collected)
        if (step < 3) {
          val next = cur
            .select(expr(applyMergeSql("s", s"'$pr'", s"'$merged'")).as("s"), col("freq"))
            .localCheckpoint()
          graft.functions.Checkpoints.release(cur)
          cur = next
        }
      }
      graft.functions.Checkpoints.release(cur)
      merges.result()
    }

  val all: Seq[Q] = Seq(

    // Language ID: stopword-hit scoring per language, deterministic argmax.
    Q("text_langid", {
      val scores = langStopwords.map { case (l, ws) => s"${stopScoreSql(ws)} AS sc_$l" }.mkString(", ")
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |s AS (SELECT doc_id, $scores FROM t)
         |SELECT doc_id, sc_en, sc_de, sc_es,
         |       CASE WHEN sc_en >= sc_de AND sc_en >= sc_es THEN 'en'
         |            WHEN sc_de >= sc_es THEN 'de' ELSE 'es' END AS predicted
         |FROM s ORDER BY doc_id LIMIT 1000""".stripMargin
    }) { (spark, dir) =>
      val t = table(spark, dir, "documents")
        .select(col("doc_id"), F.tokens(col("text")).as("toks"))
      val s = langStopwords.foldLeft(t) { case (df, (l, ws)) =>
        df.withColumn(s"sc_$l", stopScore(col("toks"), ws).cast("long"))
      }
      s.select(col("doc_id"), col("sc_en"), col("sc_de"), col("sc_es"),
          when(col("sc_en") >= col("sc_de") && col("sc_en") >= col("sc_es"), "en")
            .when(col("sc_de") >= col("sc_es"), "de").otherwise("es").as("predicted"))
        .orderBy("doc_id")
        .limit(1000)
    },

    // Language ID, char-trigram variant: count occurrences of each
    // language's characteristic trigrams (the n-gram-profile heuristic;
    // profiles are tiny so the op is a scan-local regex count).
    Q("text_langid_ngram", {
      val profiles = Seq(
        "en" -> Seq("the", "ing", "and"),
        "de" -> Seq("der", "sch", "ein"),
        "es" -> Seq("que", "cio", "ado"))
      val scores = profiles.map { case (l, gs) =>
        val re = gs.mkString("|")
        s"len(regexp_extract_all(lower(text), '($re)')) AS ng_$l"
      }.mkString(", ")
      s"""WITH s AS (SELECT doc_id, $scores FROM documents)
         |SELECT doc_id, ng_en, ng_de, ng_es,
         |       CASE WHEN ng_en >= ng_de AND ng_en >= ng_es THEN 'en'
         |            WHEN ng_de >= ng_es THEN 'de' ELSE 'es' END AS predicted
         |FROM s ORDER BY doc_id LIMIT 1000""".stripMargin
    }) { (spark, dir) =>
      val profiles = Seq(
        "en" -> Seq("the", "ing", "and"),
        "de" -> Seq("der", "sch", "ein"),
        "es" -> Seq("que", "cio", "ado"))
      val s = profiles.foldLeft(table(spark, dir, "documents")) { case (df, (l, gs)) =>
        df.withColumn(s"ng_$l",
          size(regexp_extract_all(lower(col("text")), lit(s"(${gs.mkString("|")})"), lit(0))).cast("long"))
      }
      s.select(col("doc_id"), col("ng_en"), col("ng_de"), col("ng_es"),
          when(col("ng_en") >= col("ng_de") && col("ng_en") >= col("ng_es"), "en")
            .when(col("ng_de") >= col("ng_es"), "de").otherwise("es").as("predicted"))
        .orderBy("doc_id")
        .limit(1000)
    },

    // Quality scoring: length / punctuation / stopword / word-length mix.
    Q("text_quality_score",
      s"""WITH t AS (
         |  SELECT doc_id, text, $toksSql AS toks,
         |         length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))::DOUBLE / greatest(length(text), 1) AS punct_ratio
         |  FROM documents),
         |m AS (
         |  SELECT doc_id,
         |         len(toks) AS n_tokens,
         |         punct_ratio,
         |         (${stopScoreSql(enStops)})::DOUBLE / greatest(len(toks), 1) AS stop_ratio,
         |         list_aggregate(list_transform(toks, x -> length(x)), 'sum')::DOUBLE / greatest(len(toks), 1) AS avg_tok_len
         |  FROM t)
         |SELECT doc_id,
         |       CAST(floor((0.3 * least(n_tokens / 100.0, 1.0) + 0.3 * (1.0 - punct_ratio)
         |             + 0.2 * least(stop_ratio * 5.0, 1.0) + 0.2 * least(avg_tok_len / 8.0, 1.0)) * 1000000) AS BIGINT) AS quality_micro
         |FROM m ORDER BY doc_id LIMIT 1000""".stripMargin) { (spark, dir) =>
      table(spark, dir, "documents")
        .select(col("doc_id"), col("text"), F.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          qualityMicro(col("text"), col("toks")).as("quality_micro"))
        .orderBy("doc_id")
        .limit(1000)
    },

    // Dataset card: the per-source corpus report a curation run ships
    // with every snapshot — volume, token mass, quality, language mix,
    // exact-dup incidence — one row per source. ONE corpus scan derives
    // every per-doc feature scan-locally (the quality formula is the
    // SHARED qualityMicro definition; langid is text_langid's stopword
    // CASE); the dup flag rides dedup_exact's content-hash groupBy (a
    // shuffle of compact (h, source, counts) rows, never documents), and
    // the rollup is a source-keyed aggregate with map-side combine —
    // ≈|sources| result rows at any corpus size.
    Q("curation_dataset_card", {
      val scores = langStopwords.map { case (l, ws) => s"${stopScoreSql(ws)} AS sc_$l" }.mkString(", ")
      s"""WITH t AS (SELECT doc_id, source, text, $toksSql AS toks FROM documents),
         |f AS (SELECT doc_id, source, md5(text) AS h,
         |        len(toks)::BIGINT AS n_tokens,
         |        $qualityMicroSql AS q,
         |        $scores
         |      FROM t),
         |g AS (SELECT *, CASE WHEN sc_en >= sc_de AND sc_en >= sc_es THEN 'en'
         |                     WHEN sc_de >= sc_es THEN 'de' ELSE 'es' END AS predicted
         |      FROM f),
         |hc AS (SELECT h, count(*) AS c FROM g GROUP BY h)
         |SELECT g.source, count(*)::BIGINT AS n_docs,
         |       sum(g.n_tokens)::BIGINT AS sum_tokens,
         |       sum(g.q)::BIGINT AS sum_quality_micro,
         |       sum(CASE WHEN predicted = 'en' THEN 1 ELSE 0 END)::BIGINT AS n_en,
         |       sum(CASE WHEN predicted = 'de' THEN 1 ELSE 0 END)::BIGINT AS n_de,
         |       sum(CASE WHEN predicted = 'es' THEN 1 ELSE 0 END)::BIGINT AS n_es,
         |       sum(CASE WHEN hc.c > 1 THEN 1 ELSE 0 END)::BIGINT AS n_exact_dup
         |FROM g JOIN hc ON hc.h = g.h
         |GROUP BY g.source ORDER BY g.source""".stripMargin
    }) { (spark, dir) =>
      val t = table(spark, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"), F.tokens(col("text")).as("toks"))
      val f0 = t.select(col("doc_id"), col("source"), md5(col("text")).as("h"),
        size(col("toks")).cast("long").as("n_tokens"),
        qualityMicro(col("text"), col("toks")).as("q"),
        col("toks"))
      val f = langStopwords.foldLeft(f0) { case (df, (l, ws)) =>
        df.withColumn(s"sc_$l", stopScore(col("toks"), ws).cast("long"))
      }.drop("toks")
      val g = f.withColumn("predicted",
        when(col("sc_en") >= col("sc_de") && col("sc_en") >= col("sc_es"), "en")
          .when(col("sc_de") >= col("sc_es"), "de").otherwise("es"))
      val hc = g.groupBy("h").agg(count(lit(1)).as("c"))
      g.join(hc, Seq("h"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"),
          sum(col("q")).as("sum_quality_micro"),
          sum(when(col("predicted") === "en", 1L).otherwise(0L)).as("n_en"),
          sum(when(col("predicted") === "de", 1L).otherwise(0L)).as("n_de"),
          sum(when(col("predicted") === "es", 1L).otherwise(0L)).as("n_es"),
          sum(when(col("c") > 1, 1L).otherwise(0L)).as("n_exact_dup"))
        .orderBy("source")
    },

    // Gopher-style rule filter (Rae et al. 2021 §A.1.1, adapted to this
    // corpus's 10–99-token docs): word-count bounds, mean-word-length
    // bounds, alphabetic-word ratio, stopword floor, top-token repetition
    // cap, symbol-to-word cap — each rule a 0/1 flag plus the conjunctive
    // verdict, so downstream curation can both filter and diagnose.
    // Scan-local: every ratio folds over the per-row token list.
    Q("text_gopher_rules",
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         |m AS (SELECT doc_id,
         |        len(toks) AS n_words,
         |        list_aggregate(list_transform(toks, x -> length(x)), 'sum')::DOUBLE / greatest(len(toks), 1) AS mean_len,
         |        len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))::DOUBLE / greatest(len(toks), 1) AS alpha_ratio,
         |        ${stopScoreSql(enStops)} AS stop_hits,
         |        list_max(list_transform(list_distinct(toks), t -> len(list_filter(toks, x -> x = t))))::DOUBLE / greatest(len(toks), 1) AS top_ratio,
         |        ((length(text) - length(replace(text, '#', ''))) + (length(text) - length(replace(text, '...', ''))) // 3)::DOUBLE / greatest(len(toks), 1) AS sym_ratio
         |      FROM t)
         |SELECT doc_id,
         |       (CASE WHEN n_words BETWEEN 30 AND 90 THEN 1 ELSE 0 END)::BIGINT AS f_wordcount,
         |       (CASE WHEN mean_len >= 3.0 AND mean_len <= 10.0 THEN 1 ELSE 0 END)::BIGINT AS f_meanlen,
         |       (CASE WHEN alpha_ratio > 0.8 THEN 1 ELSE 0 END)::BIGINT AS f_alpha,
         |       (CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END)::BIGINT AS f_stop,
         |       (CASE WHEN top_ratio < 0.2 THEN 1 ELSE 0 END)::BIGINT AS f_rep,
         |       (CASE WHEN sym_ratio < 0.1 THEN 1 ELSE 0 END)::BIGINT AS f_symbol,
         |       (CASE WHEN n_words BETWEEN 30 AND 90 AND mean_len >= 3.0 AND mean_len <= 10.0
         |                  AND alpha_ratio > 0.8 AND stop_hits >= 2
         |                  AND top_ratio < 0.2 AND sym_ratio < 0.1 THEN 1 ELSE 0 END)::BIGINT AS pass
         |FROM m ORDER BY doc_id LIMIT 1000""".stripMargin) { (spark, dir) =>
      val t = table(spark, dir, "documents")
        .select(col("doc_id"), col("text"), F.tokens(col("text")).as("toks"))
      val nWords = size(col("toks"))
      val denom = greatest(nWords, lit(1))
      val m = t.select(col("doc_id"),
        nWords.as("n_words"),
        (aggregate(transform(col("toks"), x => length(x)), lit(0), (a, x) => a + x)
          .cast("double") / denom).as("mean_len"),
        (size(filter(col("toks"), t => t.rlike("[a-z]"))).cast("double") / denom).as("alpha_ratio"),
        stopScore(col("toks"), enStops).as("stop_hits"),
        (array_max(transform(array_distinct(col("toks")),
          t => size(filter(col("toks"), x => x === t)))).cast("double") / denom).as("top_ratio"),
        (((length(col("text")) - length(regexp_replace(col("text"), "#", ""))) +
          floor((length(col("text")) - length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / 3).cast("int"))
          .cast("double") / denom).as("sym_ratio"))
      val fWc = when(col("n_words").between(30, 90), 1L).otherwise(0L)
      val fMl = when(col("mean_len") >= 3.0 && col("mean_len") <= 10.0, 1L).otherwise(0L)
      val fAl = when(col("alpha_ratio") > 0.8, 1L).otherwise(0L)
      val fSt = when(col("stop_hits") >= 2, 1L).otherwise(0L)
      val fTr = when(col("top_ratio") < 0.2, 1L).otherwise(0L)
      val fSy = when(col("sym_ratio") < 0.1, 1L).otherwise(0L)
      m.select(col("doc_id"),
          fWc.as("f_wordcount"), fMl.as("f_meanlen"), fAl.as("f_alpha"),
          fSt.as("f_stop"), fTr.as("f_rep"), fSy.as("f_symbol"),
          (fWc * fMl * fAl * fSt * fTr * fSy).as("pass"))
        .orderBy("doc_id")
        .limit(1000)
    },

    // Token statistics: whitespace/regex token count + a BPE-ish subword
    // count (≈ ceil(len/4) pieces per token) + distinct count.
    Q("text_token_stats",
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents)
         |SELECT doc_id,
         |       len(toks) AS n_tokens,
         |       len(list_distinct(toks)) AS n_distinct,
         |       list_aggregate(list_transform(toks, x -> (length(x) + 3) // 4), 'sum')::BIGINT AS n_subwords
         |FROM t ORDER BY doc_id LIMIT 1000""".stripMargin) { (spark, dir) =>
      table(spark, dir, "documents")
        .select(col("doc_id"), F.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_tokens"),
          size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
          aggregate(transform(col("toks"),
            x => floor((length(x) + 3) / 4).cast("int")), lit(0), (a, x) => a + x).cast("long").as("n_subwords"))
        .orderBy("doc_id")
        .limit(1000)
    },

    // BPE merge training (3 rounds): the tokenizer-training loop itself.
    // Round structure is the classic Sennrich et al. 2016 algorithm: count
    // adjacent symbol pairs over the WORD-FREQUENCY table (not the corpus —
    // after the first explode+groupBy the working set is the vocabulary,
    // which is how BPE trainers scale to 100 TB corpora), take the most
    // frequent pair (count desc, pair asc), merge it everywhere, repeat.
    // Driver loop = BSP like graft.ml.KMeans: per round one tiny collect
    // (the argmax pair) + one scan-local merge apply (leftmost
    // non-overlapping `replace`, identical semantics in both engines);
    // the oracle unrolls the same 3 rounds as CTEs.
    Q("text_bpe_train",
      s"""WITH tok AS (SELECT unnest($toksSql) AS tk FROM documents),
         |w AS (SELECT tk, count(*) AS freq FROM tok GROUP BY tk),
         |s1 AS (SELECT array_to_string(regexp_extract_all(tk, '.'), ' ') AS s, freq FROM w),
         |${bpePIterSql("s1", 1)},
         |${bpeSNextSql("s1", "t1", 2)},
         |${bpePIterSql("s2", 2)},
         |${bpeSNextSql("s2", "t2", 3)},
         |${bpePIterSql("s3", 3)}
         |SELECT 1::BIGINT AS step, pr AS pair, replace(pr, ' ', '') AS merged, c FROM t1
         |UNION ALL SELECT 2::BIGINT, pr, replace(pr, ' ', ''), c FROM t2
         |UNION ALL SELECT 3::BIGINT, pr, replace(pr, ' ', ''), c FROM t3
         |ORDER BY step""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      trainMerges(spark, dir).toDF("step", "pair", "merged", "c").orderBy("step")
    },

    // BPE encoding: apply the 3 trained merges to every document and
    // report its symbol count before/after — the train→encode round trip
    // of the tokenizer story. The merge table is 3 driver-held literals
    // (at any corpus size the merge list is vocabulary-sized and
    // broadcast); the apply is scan-local string rewriting per token,
    // identical leftmost-non-overlapping semantics in both engines.
    Q("text_bpe_encode", {
      def applyN(tIn: String)(inner: String): String =
        applyMergeSql(inner,
          s"(SELECT pr FROM $tIn)", s"replace((SELECT pr FROM $tIn), ' ', '')")
      val apply3 = applyN("t3")(applyN("t2")(applyN("t1")(
        "array_to_string(regexp_extract_all(tk, '.'), ' ')")))
      s"""WITH tok AS (SELECT unnest($toksSql) AS tk FROM documents),
         |w AS (SELECT tk, count(*) AS freq FROM tok GROUP BY tk),
         |s1 AS (SELECT array_to_string(regexp_extract_all(tk, '.'), ' ') AS s, freq FROM w),
         |${bpePIterSql("s1", 1)},
         |${bpeSNextSql("s1", "t1", 2)},
         |${bpePIterSql("s2", 2)},
         |${bpeSNextSql("s2", "t2", 3)},
         |${bpePIterSql("s3", 3)},
         |d AS (SELECT doc_id, unnest($toksSql) AS tk FROM documents),
         |e AS (SELECT doc_id, length(tk)::BIGINT AS n_chars,
         |             len(string_split($apply3, ' '))::BIGINT AS n_sym
         |      FROM d)
         |SELECT doc_id, sum(n_chars)::BIGINT AS n_chars, sum(n_sym)::BIGINT AS n_symbols,
         |       (sum(n_chars) - sum(n_sym))::BIGINT AS n_saved
         |FROM e GROUP BY doc_id ORDER BY doc_id LIMIT 1000""".stripMargin
    }) { (spark, dir) =>
      val merges = trainMerges(spark, dir).map { case (_, pr, m, _) => (pr, m) }
      // same boundary-correct apply as training (applyMergeSql) with the
      // collected merges inlined as literals, evaluated per token
      val appliedExpr = merges.foldLeft("concat_ws(' ', regexp_extract_all(tk, '.', 0))") {
        case (inner, (pr, m)) => applyMergeSql(inner, s"'$pr'", s"'$m'")
      }
      table(spark, dir, "documents")
        .select(col("doc_id"), explode(F.tokens(col("text"))).as("tk"))
        .select(col("doc_id"), length(col("tk")).cast("long").as("n_chars"),
          expr(s"size(split($appliedExpr, ' '))").cast("long").as("n_sym"))
        .groupBy("doc_id")
        .agg(sum(col("n_chars")).as("n_chars"), sum(col("n_sym")).as("n_symbols"),
          (sum(col("n_chars")) - sum(col("n_sym"))).as("n_saved"))
        .orderBy("doc_id")
        .limit(1000)
    },

    // Vocabulary building: corpus-wide token frequencies, top-k — the
    // explode+groupBy shape every tokenizer-training pipeline starts from.
    Q("text_vocab_topk",
      """SELECT t AS token, count(*) AS n
        |FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t FROM documents)
        |GROUP BY t ORDER BY n DESC, token LIMIT 30""".stripMargin) { (spark, dir) =>
      table(spark, dir, "documents")
        .select(explode(F.tokens(col("text"))).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(30)
    },

    // Collocation mining: corpus-wide bigram LIFT (the log-free PMI
    // core, n·c(a,b) / (c(a)·c(b))) over adjacent token pairs — the
    // phrase/term-extraction signal tokenizer and glossary pipelines
    // compute. Unigram and bigram counts are explode+groupBy with
    // map-side combine (vocabulary-bounded shuffles); the two count
    // joins are token-keyed; the single float division uses an
    // identical expression tree in both engines and micro-floors (no
    // transcendental log — rank by lift ≡ rank by PMI). Top-30 via a
    // TakeOrdered heap.
    Q("text_bigram_lift",
      """WITH toks AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS ts FROM documents),
        |uni AS (SELECT t, count(*)::BIGINT AS c
        |        FROM (SELECT unnest(ts) AS t FROM toks) GROUP BY t),
        |bi AS (SELECT g, count(*)::BIGINT AS cab
        |       FROM (SELECT unnest(list_transform(range(1, len(ts)),
        |                      i -> ts[i] || ' ' || ts[i + 1])) AS g FROM toks)
        |       GROUP BY g HAVING count(*) >= 5),
        |nn AS (SELECT sum(c)::BIGINT AS n FROM uni),
        |j AS (SELECT bi.g, bi.cab, ua.c AS ca, ub.c AS cb
        |      FROM bi JOIN uni ua ON ua.t = split_part(bi.g, ' ', 1)
        |              JOIN uni ub ON ub.t = split_part(bi.g, ' ', 2))
        |SELECT g AS bigram, cab,
        |       CAST(floor(cab * 1000000.0 * nn.n / (ca * cb)) AS BIGINT) AS lift_micro
        |FROM j CROSS JOIN nn
        |ORDER BY lift_micro DESC, bigram LIMIT 30""".stripMargin) { (spark, dir) =>
      val t = staged(spark, s"$dir#bigram_toks")(
        table(spark, dir, "documents").select(F.tokens(col("text")).as("ts")))
      val uni = t.select(explode(col("ts")).as("tk"))
        .groupBy("tk").agg(count(lit(1)).as("c"))
      val bi = t.select(explode(F.shingles(col("ts"), 2)).as("g"))
        .groupBy("g").agg(count(lit(1)).as("cab"))
        .filter(col("cab") >= 5)
      val nn = uni.agg(sum(col("c")).as("n"))
      bi
        .withColumn("a", split(col("g"), " ").getItem(0))
        .withColumn("b", split(col("g"), " ").getItem(1))
        .join(uni.select(col("tk").as("a"), col("c").as("ca")), Seq("a"))
        .join(uni.select(col("tk").as("b"), col("c").as("cb")), Seq("b"))
        .crossJoin(broadcast(nn))
        .select(col("g").as("bigram"), col("cab"),
          floor(col("cab") * lit(1000000.0) * col("n") / (col("ca") * col("cb")))
            .cast("long").as("lift_micro"))
        .orderBy(col("lift_micro").desc, col("bigram"))
        .limit(30)
    },

    // Length histogram: document-size distribution in 100-char buckets
    // (the quality-filter tuning view of a training corpus).
    Q("text_length_histogram",
      """SELECT (n_chars // 100) * 100 AS bucket, count(*) AS n
        |FROM documents GROUP BY bucket ORDER BY bucket""".stripMargin) { (spark, dir) =>
      table(spark, dir, "documents")
        .groupBy((floor(col("n_chars") / 100) * 100).as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket")
    },

    // Deterministic train/val split: portable hash bucket per doc (the
    // reproducible-split requirement of any training corpus — no RNG, the
    // same doc lands in the same split on every engine and every run).
    Q("text_train_val_split",
      """SELECT lang,
        |       CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR || ':split'), 1, 15))::BIGINT % 100 < 90
        |            THEN 'train' ELSE 'val' END AS split,
        |       count(*) AS n
        |FROM documents GROUP BY lang, split ORDER BY lang, split""".stripMargin) { (spark, dir) =>
      table(spark, dir, "documents")
        .withColumn("split",
          when(pmod(F.hash60(concat(col("doc_id").cast("string"), lit(":split"))), lit(100)) < 90, "train")
            .otherwise("val"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "split")
    },

    // Key-skew profile: per-key share of the corpus, top offenders first —
    // the diagnostic that decides when salting/AQE-skew handling is needed.
    Q("q_skew_profile",
      """SELECT user_id, count(*) AS n,
        |       CAST(floor(count(*) * 1000000.0 / (SELECT count(*) FROM events)) AS BIGINT) AS share_ppm
        |FROM events GROUP BY user_id
        |ORDER BY n DESC, user_id LIMIT 20""".stripMargin) { (spark, dir) =>
      val ev = events(spark, dir)
      val total = ev.select(count(lit(1)).as("total"))
      ev.groupBy("user_id")
        .agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(total))
        .select(col("user_id"), col("n"),
          floor(col("n") * 1000000.0 / col("total")).cast("long").as("share_ppm"))
        .orderBy(col("n").desc, col("user_id"))
        .limit(20)
    },

    // Data-quality profile: null/distinct/range statistics per column — the
    // first pass any corpus QA runs before training.
    Q("q_data_profile",
      """SELECT count(*) AS n_rows,
        |       count(*) - count(l_quantity) AS null_qty,
        |       count(DISTINCT l_returnflag) AS d_flags,
        |       count(DISTINCT l_linestatus) AS d_status,
        |       round(min(l_quantity), 2) AS min_qty,
        |       round(max(l_quantity), 2) AS max_qty,
        |       round(min(l_discount), 2) AS min_disc,
        |       round(max(l_discount), 2) AS max_disc
        |FROM lineitem""".stripMargin) { (spark, dir) =>
      table(spark, dir, "lineitem")
        .agg(
          count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(col("l_quantity"))).as("null_qty"),
          countDistinct(col("l_returnflag")).as("d_flags"),
          countDistinct(col("l_linestatus")).as("d_status"),
          round(min(col("l_quantity")), 2).as("min_qty"),
          round(max(col("l_quantity")), 2).as("max_qty"),
          round(min(col("l_discount")), 2).as("min_disc"),
          round(max(col("l_discount")), 2).as("max_disc"))
    },

    // Document fingerprinting: min-hash of strided character 8-grams
    // (rolling-hash winnowing, simplified to stride-4 sampling).
    Q("text_fingerprint",
      """SELECT doc_id,
        |       list_aggregate(list_transform(range(1, greatest(length(lower(text)) - 6, 2), 4),
        |                                     i -> md5(substr(lower(text), i, 8))), 'min') AS fingerprint
        |FROM documents ORDER BY doc_id LIMIT 1000""".stripMargin) { (spark, dir) =>
      // encode(lower(text)) is hoisted into its own projection so the
      // lambda body references the materialized BINARY column — lambda
      // bodies get no CSE, and binary substr is an O(slice) byte copy
      // where STRING substr is an O(position) code-point scan; md5 over
      // the byte slice is bit-identical to md5 over the char slice on
      // this ASCII corpus (CollapseProject keeps the non-cheap,
      // twice-referenced alias from inlining into the lambda; the
      // 256 KB-doc linearity spec pins the O(len) wall-time shape).
      table(spark, dir, "documents")
        .select(col("doc_id"), encode(lower(col("text")), "UTF-8").as("payload"))
        .select(col("doc_id"),
          expr("array_min(transform(sequence(1, greatest(length(payload) - 7, 1), 4), i -> md5(substr(payload, i, 8))))").as("fingerprint"))
        .orderBy("doc_id")
        .limit(1000)
    },

    // C4-style cross-corpus line dedup: a sentence occurring >= 3 times
    // ACROSS the corpus is boilerplate and is dropped from every doc; the
    // rebuilt text keeps original sentence order. Two shuffles — the
    // global line count (map-side partial agg) and the per-doc regroup —
    // which IS the canonical at-scale shape for corpus-level line dedup
    // (the count side can't broadcast: it grows with the corpus).
    Q("text_line_dedup",
      """WITH t AS (SELECT doc_id, string_split(text, '. ') AS ls FROM documents),
        |l AS (SELECT doc_id, unnest(range(len(ls))) AS i, unnest(ls) AS line FROM t),
        |c AS (SELECT line, count(*) AS cnt FROM l GROUP BY line),
        |k AS (SELECT l.doc_id, l.i, l.line FROM l JOIN c ON c.line = l.line WHERE c.cnt < 3)
        |SELECT doc_id, count(*) AS n_kept,
        |       md5(array_to_string(list(line ORDER BY i), '. ')) AS kept_md5
        |FROM k GROUP BY doc_id
        |ORDER BY doc_id LIMIT 1000""".stripMargin) { (spark, dir) =>
      val l = table(spark, dir, "documents")
        .select(col("doc_id"), posexplode(split(col("text"), "\\. ")).as(Seq("i", "line")))
      val cnt = l.groupBy("line").agg(count(lit(1)).as("cnt"))
      l.join(cnt, Seq("line")).filter(col("cnt") < 3)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_kept"),
          md5(array_join(
            transform(array_sort(collect_list(struct(col("i"), col("line")))),
              s => s.getField("line")),
            ". ")).as("kept_md5"))
        .orderBy("doc_id")
        .limit(1000)
    },

    // Sequence packing (concat-and-chop): assign every document a slot in
    // a fixed-length training sequence. Docs are hash-bucketed, ordered by
    // doc_id within the bucket, and the running token count chops the
    // stream into 512-token sequences — the packing every LM training run
    // does before batching. The cumulative sum is WINDOWED PER BUCKET, so
    // at 100 TB each bucket packs independently (one shuffle on the bucket
    // key, sort within partition); no global order is ever required.
    // Bucket count and the 2⁴⁰ seq-id stride come from [[Packing]] —
    // parallelism ∝ buckets, ids globally unique to ~10¹² seqs/bucket.
    Q("text_seq_pack", seqPackSql) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val t = table(spark, dir, "documents")
        .select(col("doc_id"),
          size(F.tokens(col("text"))).cast("long").as("n_tokens"),
          pmod(F.hash60(concat(col("doc_id").cast("string"), lit(":pack"))),
            lit(Packing.Buckets.toLong)).as("bucket"))
      val w = Window.partitionBy("bucket").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      t.withColumn("cum", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
        .select(col("doc_id"), col("bucket"),
          Packing.seqId(col("bucket"), col("cum")).as("seq_id"),
          (col("cum") % Packing.SeqLen).as("seq_off"), col("n_tokens"))
        .orderBy("doc_id")
        .limit(1000)
    },

    // Packing-efficiency report over the seq-pack layout: per bucket,
    // how many 512-token sequences the token mass consumes, the
    // tail-waste tokens (concat-and-chop wastes only each bucket's final
    // partial sequence), and — the number packers actually tune for —
    // how many documents STRADDLE a sequence boundary (a split doc
    // trains with a truncated context on both sides; lower is better,
    // and it trades off directly against padding waste in
    // pad-vs-pack decisions). Same bucket windows as text_seq_pack →
    // one ≤|buckets|-row aggregate.
    Q("curation_pack_report", {
      val L = Packing.SeqLen
      s"""WITH t AS (SELECT doc_id,
         |             len($toksSql)::BIGINT AS n_tokens,
         |             ('0x' || substr(md5(doc_id::VARCHAR || ':pack'), 1, 15))::BIGINT % ${Packing.Buckets} AS bucket
         |           FROM documents),
         |c AS (SELECT doc_id, bucket, n_tokens,
         |             coalesce(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
         |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum
         |      FROM t)
         |SELECT bucket, count(*) AS n_docs, sum(n_tokens)::BIGINT AS total_tokens,
         |       ((sum(n_tokens) + ${L - 1}) // $L)::BIGINT AS n_seqs,
         |       (((sum(n_tokens) + ${L - 1}) // $L) * $L - sum(n_tokens))::BIGINT AS tail_waste,
         |       sum(CASE WHEN n_tokens > 0 AND cum // $L <> (cum + n_tokens - 1) // $L
         |                THEN 1 ELSE 0 END)::BIGINT AS n_split_docs
         |FROM c GROUP BY bucket ORDER BY bucket""".stripMargin
    }) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val t = table(spark, dir, "documents")
        .select(col("doc_id"),
          size(F.tokens(col("text"))).cast("long").as("n_tokens"),
          pmod(F.hash60(concat(col("doc_id").cast("string"), lit(":pack"))),
            lit(Packing.Buckets.toLong)).as("bucket"))
      val w = Window.partitionBy("bucket").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val L = Packing.SeqLen
      t.withColumn("cum", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"),
          sum(when(col("n_tokens") > 0 &&
              expr(s"cum div $L") =!= expr(s"(cum + n_tokens - 1) div $L"), 1L)
            .otherwise(0L)).as("n_split_docs"))
        .select(col("bucket"), col("n_docs"), col("total_tokens"),
          expr(s"(total_tokens + ${L - 1}) div $L").as("n_seqs"),
          (expr(s"(total_tokens + ${L - 1}) div $L") * L - col("total_tokens")).as("tail_waste"),
          col("n_split_docs"))
        .orderBy("bucket")
    },

    // Unigram-LM scoring (the CCNet-style quality signal): train an
    // add-one-smoothed unigram LM over the corpus (one token-keyed agg —
    // the vocab table), score every doc as average bits/token, and bucket
    // head/middle/tail against the corpus mean. Per-token bits are floored
    // to integer micros BEFORE the per-doc sum, so the aggregation is an
    // order-free integer sum (bit-identical across engines); the bucket
    // cutoffs come from ONE tiny global agg (broadcast), never a global
    // sort — at 100 TB this is vocab-join + scan-local math.
    Q("text_lm_perplexity",
      s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS tk FROM documents),
         |nv AS (SELECT count(*)::BIGINT AS n, count(DISTINCT tk)::BIGINT AS v FROM tok),
         |cnt AS (SELECT tk, count(*)::BIGINT AS c FROM tok GROUP BY tk),
         |sc AS (SELECT tok.doc_id,
         |              CAST(floor(-ln((cnt.c + 1)::DOUBLE / (nv.n + nv.v)) / ln(2.0) * 1000000) AS BIGINT) AS bits_micro
         |       FROM tok JOIN cnt ON cnt.tk = tok.tk CROSS JOIN nv),
         |d AS (SELECT doc_id, sum(bits_micro)::BIGINT AS total_micro, count(*)::BIGINT AS n_tokens
         |      FROM sc GROUP BY doc_id),
         |g AS (SELECT sum(total_micro)::DOUBLE / sum(n_tokens) AS mean_bits FROM d)
         |SELECT doc_id,
         |       CAST(floor(total_micro::DOUBLE / n_tokens) AS BIGINT) AS avg_bits_micro,
         |       CASE WHEN total_micro::DOUBLE / n_tokens < 0.98 * mean_bits THEN 'head'
         |            WHEN total_micro::DOUBLE / n_tokens > 1.02 * mean_bits THEN 'tail'
         |            ELSE 'middle' END AS bucket
         |FROM d CROSS JOIN g ORDER BY doc_id LIMIT 1000""".stripMargin) { (spark, dir) =>
      // fanoutScaled (round-15): this tokenize+explode chain is heavy
      // enough to win 2.4× from a fan-out once the input carries real
      // bytes (measured at sf1), but the exchange is a net loss on a
      // sub-4MB input (measured +107% at sf0.1) — so the fan-out is
      // size-gated, not unconditional
      val tok = staged(spark, s"$dir#lm_tok") {
        F.fanoutScaled(table(spark, dir, "documents"))
          .select(col("doc_id"), explode(F.tokens(col("text"))).as("tk"))
      }
      // Aggregate-before-join (round 11): joining token INSTANCES on tk
      // puts a Zipf-hot token's every occurrence in one shuffle partition
      // (the sf10 band probe measured G = 14.2 on a corpus with 10
      // mega-hot tokens; "the" does the same to any real corpus at
      // 100 TB). Per-doc TYPE counts join instead — the hot key's join
      // rows shrink from its occurrence count to its document count —
      // and each floored per-token term is weighted by ct, which is
      // integer-EXACT the same sum (floor runs before the weighting, so
      // summing an identical term ct times equals ct × term).
      val dt = tok.groupBy("doc_id", "tk").agg(count(lit(1)).as("ct"))
      // ONE pass over token instances (round-15): the corpus vocab `cnt`
      // and the global (n, v) row previously re-aggregated `tok` twice
      // more; both are exact integer derivations of the per-doc type
      // counts (c = Σ ct over docs; n = Σ c; v = |vocab|), so derive
      // them from `dt` — the two extra shuffles now carry TYPE rows,
      // never instances.
      val cnt = dt.groupBy("tk").agg(sum(col("ct")).as("c"))
      val nv = cnt.agg(sum(col("c")).as("n"), count(lit(1)).as("v"))
      val sc = dt.join(cnt, "tk").crossJoin(broadcast(nv))
        .select(col("doc_id"), col("ct"),
          (col("ct") *
            floor(-log((col("c") + 1).cast("double") / (col("n") + col("v"))) / log(lit(2.0)) * 1000000)
              .cast("long")).as("bits_micro"))
      val d = sc.groupBy("doc_id")
        .agg(sum(col("bits_micro")).as("total_micro"), sum(col("ct")).as("n_tokens"))
      val g = d.agg((sum(col("total_micro")).cast("double") / sum(col("n_tokens"))).as("mean_bits"))
      val avg = col("total_micro").cast("double") / col("n_tokens")
      d.crossJoin(broadcast(g))
        .select(col("doc_id"),
          floor(avg).cast("long").as("avg_bits_micro"),
          when(avg < lit(0.98) * col("mean_bits"), "head")
            .when(avg > lit(1.02) * col("mean_bits"), "tail")
            .otherwise("middle").as("bucket"))
        .orderBy("doc_id")
        .limit(1000)
    },

    // Per-document word-distribution Shannon entropy — the diversity
    // signal heuristic quality filters threshold on (low entropy = loops
    // or boilerplate, cf. the repetition rules in Gopher §A1.1). Exactly
    // the lm_perplexity determinism discipline: each distinct word's
    // −p·log2(p) term is micro-floored BEFORE the per-doc integer sum, so
    // the cross-engine hash never rides on float summation order. Cost
    // shape: one tokenize scan + one (doc_id, word) count shuffle — no
    // corpus-global state at all, so it holds at any scale.
    Q("text_word_entropy",
      s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS tk FROM documents),
         |n AS (SELECT doc_id, count(*)::BIGINT AS n_tokens FROM tok GROUP BY doc_id),
         |c AS (SELECT doc_id, tk, count(*)::BIGINT AS c FROM tok GROUP BY doc_id, tk),
         |t AS (SELECT c.doc_id,
         |             CAST(floor(c.c::DOUBLE / n.n_tokens
         |                        * (-ln(c.c::DOUBLE / n.n_tokens) / ln(2.0))
         |                        * 1000000) AS BIGINT) AS term_micro
         |      FROM c JOIN n ON n.doc_id = c.doc_id)
         |SELECT t.doc_id, n.n_tokens, sum(t.term_micro)::BIGINT AS h_micro
         |FROM t JOIN n ON n.doc_id = t.doc_id
         |GROUP BY t.doc_id, n.n_tokens
         |ORDER BY t.doc_id LIMIT 1000""".stripMargin) { (spark, dir) =>
      // size-gated fan-out, same evidence as text_lm_perplexity: 2.4×
      // win at sf1, net loss below the openCost gate at sf0.1
      val tok = F.fanoutScaled(table(spark, dir, "documents"))
        .select(col("doc_id"), explode(F.tokens(col("text"))).as("tk"))
      // ONE tokenize pass (round-15): the old shape fed `tok` to two
      // aggregates (n_tokens and per-term counts), and the optimizer
      // planned two full scan→fan-out→tokenize→explode branches (no
      // exchange reuse across them — 2 RoundRobin exchanges, tokenize
      // paid twice). n_tokens == Σ c over the doc's term counts exactly
      // (integer identity), so derive it from the counts with a
      // doc_id-partitioned window — compact (doc_id, tk, c) rows, never
      // a global window — and the tokenize/explode chain is planned and
      // executed exactly once. The final groupBy(doc_id, n_tokens)
      // reuses the window's doc_id hash partitioning (no extra
      // exchange). Per-term floor arithmetic unchanged → bit-identical
      // output (oracle re-verified).
      val c = tok.groupBy("doc_id", "tk").agg(count(lit(1)).as("c"))
        .withColumn("n_tokens", sum(col("c")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      val p = col("c").cast("double") / col("n_tokens")
      c.select(col("doc_id"), col("n_tokens"),
          floor(p * (-log(p) / log(lit(2.0))) * 1000000).cast("long").as("term_micro"))
        .groupBy("doc_id", "n_tokens")
        .agg(sum(col("term_micro")).as("h_micro"))
        .orderBy("doc_id")
        .limit(1000)
    },

    // PII redaction: emails, phone numbers, IPv4 addresses counted and
    // replaced with typed placeholders — the scrubbing pass every
    // training corpus runs before export. The fixture corpus carries no
    // PII, so deterministic synthetic PII is appended per doc (same
    // expression in both engines); the md5 of the redacted text pins the
    // exact replacement semantics. Scan-local: zero shuffles.
    Q("text_pii_redact", {
      val email = "[a-z0-9.]+@[a-z0-9.]+"
      val phone = "[0-9]{3}-[0-9]{4}"
      val ip = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
      s"""WITH p AS (SELECT doc_id,
         |             text || ' contact user' || doc_id || '@mail.example.com call 555-' ||
         |             lpad(((doc_id * 7) % 10000)::VARCHAR, 4, '0') ||
         |             ' ip 10.0.' || (doc_id % 256) || '.1 end' AS pii
         |           FROM documents)
         |SELECT doc_id,
         |       len(regexp_extract_all(pii, '$email'))::BIGINT AS n_email,
         |       len(regexp_extract_all(pii, '$phone'))::BIGINT AS n_phone,
         |       len(regexp_extract_all(pii, '$ip'))::BIGINT AS n_ip,
         |       md5(regexp_replace(regexp_replace(regexp_replace(pii,
         |             '$email', '<EMAIL>', 'g'),
         |             '$ip', '<IP>', 'g'),
         |             '$phone', '<PHONE>', 'g')) AS redacted_md5
         |FROM p ORDER BY doc_id LIMIT 1000""".stripMargin
    }) { (spark, dir) =>
      val email = "[a-z0-9.]+@[a-z0-9.]+"
      val phone = "[0-9]{3}-[0-9]{4}"
      val ip = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
      val pii = concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com call 555-"),
        lpad(((col("doc_id") * 7) % 10000).cast("string"), 4, "0"),
        lit(" ip 10.0."), (col("doc_id") % 256).cast("string"), lit(".1 end"))
      table(spark, dir, "documents")
        .select(col("doc_id"), pii.as("pii"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("pii"), lit(email), lit(0))).cast("long").as("n_email"),
          size(regexp_extract_all(col("pii"), lit(phone), lit(0))).cast("long").as("n_phone"),
          size(regexp_extract_all(col("pii"), lit(ip), lit(0))).cast("long").as("n_ip"),
          md5(regexp_replace(regexp_replace(regexp_replace(col("pii"),
            email, "<EMAIL>"),
            ip, "<IP>"),
            phone, "<PHONE>")).as("redacted_md5"))
        .orderBy("doc_id")
        .limit(1000)
    }
  )
}
