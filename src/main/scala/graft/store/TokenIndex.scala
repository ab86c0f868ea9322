package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.F

/** Inverted-index (posting-list) table — the scale path for keyword search
  * (SURVEY §4: "the FTS analog is a precomputed posting-list table
  * maintained alongside the chunk table, so keyword search is a join, not
  * a scan").
  *
  * At 100 TB the D4 regex-scan-per-query is untenable; the same job that
  * writes chunks writes `(token, chunk_id, tf)` postings, partitioned by
  * token. A query then touches only the partitions of its own tokens —
  * candidate generation cost is proportional to the posting lists, not the
  * corpus.
  */
object TokenIndex {

  val DefaultBuckets = 64

  /** Build postings from any table: one row per (token, id) with term
    * frequency AND the token's sorted positions (FTS5 keeps positional
    * postings for phrase queries, vector_store.cpp:252 — `MATCH "a b"`).
    * Single posexplode + groupBy (map-side partial agg). */
  def build(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("chunk_id"),
        posexplode(F.tokens(col(textCol))).as(Seq("pos", "token")))
      .groupBy("token", "chunk_id")
      .agg(count(lit(1)).as("tf"), sort_array(collect_list(col("pos"))).as("positions"))

  /** Partition bucket of a token — JVM twin of the write-side column
    * (first 15 md5 hex chars → long, mod buckets), so a query can prune
    * partitions without touching Spark internals. */
  def tokenBucket(token: String, buckets: Int = DefaultBuckets): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(token.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (new java.math.BigInteger(hex.substring(0, 15), 16)
      .mod(java.math.BigInteger.valueOf(buckets))).intValue
  }

  /** Persist partitioned by token-hash bucket so a query's token lookups
    * prune to a handful of files (the bucket column uses the same md5-60
    * hash as [[tokenBucket]]). */
  def write(postings: DataFrame, path: String, buckets: Int = DefaultBuckets): Unit =
    shaped(postings, buckets).write.mode("overwrite")
      .partitionBy("token_bucket").parquet(path)

  /** Merge-append a batch's postings into an EXISTING index's token-bucket
    * partitions (same bucketing as [[write]]): each affected bucket gains
    * one file of new rows; untouched buckets and existing files are never
    * rewritten — per-batch cost ∝ batch postings, not index size. Only
    * sound for strictly-new chunk ids (the append-only chunk table). */
  def append(postings: DataFrame, path: String, buckets: Int = DefaultBuckets): Unit =
    shaped(postings, buckets).write.mode("append")
      .partitionBy("token_bucket").parquet(path)

  private def shaped(postings: DataFrame, buckets: Int): DataFrame =
    postings
      .withColumn("token_bucket", pmod(F.hash60(col("token")), lit(buckets)))
      .repartition(col("token_bucket"))

  /** Keyword search as a posting join: filter the index to the query's
    * tokens, sum tf per chunk, top-k. When the postings table carries the
    * `token_bucket` partition column, the filter includes the query
    * tokens' buckets so the parquet scan prunes to their partitions. */
  def search(postings: DataFrame, queryTokens: Seq[String], k: Int,
             buckets: Int = DefaultBuckets): DataFrame = {
    val pruned =
      if (postings.columns.contains("token_bucket"))
        postings.filter(col("token_bucket")
          .isin(queryTokens.map(tokenBucket(_, buckets)).distinct: _*))
      else postings
    pruned
      .filter(col("token").isin(queryTokens: _*))
      .groupBy("chunk_id")
      .agg(sum(col("tf")).as("score"))
      .orderBy(col("score").desc, col("chunk_id"))
      .limit(k)
  }

  // ---- FTS5 MATCH fidelity: phrase + prefix terms -----------------------
  // The reference passes raw user queries to FTS5 MATCH
  // (vector_store.cpp:252, :361), which supports `"exact phrase"` and
  // `prefix*` operators with implicit AND across terms. [[parse]] +
  // [[searchTerms]] reproduce those semantics over the posting table;
  // [[termScore]] is the scan-side twin for the no-index fallback.

  /** One parsed MATCH term. */
  sealed trait Term
  object Term {
    final case class Word(t: String) extends Term
    final case class Prefix(p: String) extends Term
    final case class Phrase(toks: Seq[String]) extends Term
  }

  private def tokensOf(s: String): Seq[String] =
    "[a-z0-9]+".r.findAllIn(s.toLowerCase).toSeq

  /** Does the query use WELL-FORMED MATCH operators (balanced quotes or a
    * trailing `*`)? Plain queries keep the engine's historical
    * bag-of-tokens scoring — and so does a query with an unbalanced
    * quote (e.g. `15" laptop`, `said "hello`): FTS5 raises a syntax
    * error there, and routing it to the implicit-AND term path would
    * silently flip keyword matching from any-term overlap to
    * all-terms-required. Graceful degradation beats both. */
  def hasOperators(q: String): Boolean = {
    val quotes = q.count(_ == '"')
    (quotes >= 2 && quotes % 2 == 0) ||
      q.split("\\s+").exists(_.matches("(?i)[a-z0-9]+\\*"))
  }

  /** Parse an FTS5-ish MATCH query: quoted segments become phrases
    * (single-token quotes collapse to words), a trailing `*` marks a
    * prefix term, everything else tokenizes to bare words. */
  def parse(q: String): Seq[Term] = {
    val terms = Seq.newBuilder[Term]
    def unquoted(s: String): Unit =
      s.split("\\s+").filter(_.nonEmpty).foreach { w =>
        if (w.matches("(?i)[a-z0-9]+\\*")) terms += Term.Prefix(w.dropRight(1).toLowerCase)
        else tokensOf(w).foreach(t => terms += Term.Word(t))
      }
    var last = 0
    for (m <- "\"([^\"]*)\"".r.findAllMatchIn(q)) {
      unquoted(q.substring(last, m.start))
      tokensOf(m.group(1)) match {
        case Seq()  => ()
        case Seq(t) => terms += Term.Word(t)
        case toks   => terms += Term.Phrase(toks)
      }
      last = m.end
    }
    unquoted(q.substring(last))
    terms.result()
  }

  /** MATCH over the posting table: every term must hit (FTS5's implicit
    * AND); score = Σ per-term hits (word tf, prefix tf-sum, phrase
    * occurrence count from positional intersection). Word/phrase terms
    * prune to their tokens' hash-bucket partitions; a prefix term scans
    * the token dictionary (no hash pruning possible for a prefix) but
    * still touches only posting rows, never the corpus. */
  def searchTerms(postings: DataFrame, terms: Seq[Term], k: Int,
                  buckets: Int = DefaultBuckets): DataFrame = {
    require(terms.nonEmpty, "searchTerms needs at least one parsed term")
    val hasBucket = postings.columns.contains("token_bucket")
    def prunedTo(toks: Seq[String]): DataFrame =
      if (hasBucket)
        postings.filter(col("token_bucket")
          .isin(toks.map(tokenBucket(_, buckets)).distinct: _*))
      else postings

    val perTerm: Seq[DataFrame] = terms.zipWithIndex.map {
      case (Term.Word(t), i) =>
        prunedTo(Seq(t)).filter(col("token") === t)
          .select(col("chunk_id"), col("tf").cast("long").as(s"s$i"))
      case (Term.Prefix(p), i) =>
        postings.filter(col("token").startsWith(p))
          .groupBy("chunk_id")
          .agg(sum(col("tf")).cast("long").as(s"s$i"))
      case (Term.Phrase(toks), i) =>
        val uniq = toks.distinct
        val grouped = prunedTo(uniq).filter(col("token").isin(uniq: _*))
          .groupBy("chunk_id")
          .agg(map_from_entries(collect_list(struct(col("token"), col("positions")))).as("tp"))
          .filter(uniq.map(t => map_contains_key(col("tp"), lit(t))).reduce(_ && _))
        // occurrences = positions p of the head token with token_j at p+j
        // for every following token (classic positional-intersection)
        val occ = size(filter(element_at(col("tp"), lit(toks.head)),
          p => toks.zipWithIndex.tail
            .map { case (t, j) => array_contains(element_at(col("tp"), lit(t)), p + j) }
            .reduceOption(_ && _).getOrElse(lit(true))))
        grouped.select(col("chunk_id"), occ.cast("long").as(s"s$i"))
          .filter(col(s"s$i") > 0)
    }
    perTerm.reduce((a, b) => a.join(b, Seq("chunk_id"))) // implicit AND
      .select(col("chunk_id"),
        terms.indices.map(i => col(s"s$i")).reduce(_ + _).as("score"))
      .orderBy(col("score").desc, col("chunk_id"))
      .limit(k)
  }

  /** Scan-side twin of [[searchTerms]] over a token-array expression: the
    * same AND semantics and per-term scores, for engines without a posting
    * index (branch equivalence is spec-pinned). The token array is bound
    * via the 1-element-array trick so a computed `toksExpr` evaluates ONCE
    * per row however many terms reference it. */
  def termScore(toksExpr: Column, terms: Seq[Term]): Column = {
    require(terms.nonEmpty, "termScore needs at least one parsed term")
    def one(ts: Column, term: Term): Column = term match {
      case Term.Word(t)   => size(filter(ts, x => x === lit(t)))
      case Term.Prefix(p) => size(filter(ts, x => x.startsWith(p)))
      case Term.Phrase(toks) =>
        val n = toks.size
        // guard size>=n: Spark's `sequence` runs DESCENDING for stop<start
        when(size(ts) >= n,
          size(filter(sequence(lit(0), size(ts) - n),
            i => toks.zipWithIndex
              .map { case (t, j) => element_at(ts, i + j + 1) === lit(t) }
              .reduce(_ && _))))
          .otherwise(lit(0))
    }
    element_at(transform(array(toksExpr), ts => {
      val scores = terms.map(one(ts, _))
      when(scores.map(_ > lit(0)).reduce(_ && _), scores.reduce(_ + _))
        .otherwise(lit(0))
    }), 1).cast("long")
  }
}
