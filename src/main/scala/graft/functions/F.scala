package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level helpers shared by the query library.
  *
  * Everything here composes codegen'd built-ins only (no UDFs), and each
  * helper has an exact ANSI-SQL equivalent runnable by DuckDB — that parity
  * is what makes the oracle gate exact rather than tolerance-based. In
  * particular all hashing is md5-based (not xxhash64/murmur) because md5 is
  * the one hash both engines share bit-for-bit.
  */
object F {

  /** Scale-adaptive scan fan-out (optimization guide §2.5, "input skew:
    * one huge unsplittable file — repartition immediately after the
    * read"). A single-file single-row-group parquet input plans as a
    * ONE-task scan — parquet rows cannot split below row-group
    * granularity — so every scan-local CPU-heavy stage above it (embed,
    * media codecs, tokenize+hash chains) runs on one core of local[N].
    * When the planned scan parallelism is below the cluster's default,
    * round-robin the rows across `defaultParallelism` partitions BEFORE
    * the heavy per-row work; when the input already fans out (many
    * files / row groups — any real corpus), this is the identity and
    * adds no exchange, so the rewrite is a no-op at 100 TB where the
    * shuffle would be the bug. Correctness: the repartition is row-wise
    * (deterministic under sortBeforeRepartition), every consumer either
    * transforms row-wise, aggregates by key behind its own exchange, or
    * sums integers (order-free) — the oracle gate over every touched
    * query re-verified green (round 14). Streaming frames pass through
    * untouched (micro-batch sources own their partitioning). */
  /** Dev-only kill-switch for A/B measurement legs (round-15 text-family
    * evidence): lets one compiled binary time fanout-on vs fanout-off in
    * alternating same-window legs. The driver never sets it. */
  private val fanoutDisabled = sys.env.contains("SPARK_GRAFT_NO_FANOUT")

  def fanout(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    if (fanoutDisabled || df.isStreaming) df
    else {
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (plannedPartitions(df) < target) df.repartition(target) else df
    }

  /** Size-gated fan-out for MODERATE per-row chains (round-15): a plain
    * tokenize/regexp chain is ~20-50 MB/s/core, so below a few MB of
    * input the round-robin exchange costs more than the single-core work
    * it parallelizes (measured: the 19 text-family fan-outs were a
    * uniform +48% at sf0.1's 0.6 MB corpus, while the heavy word-entropy
    * and LM chains won 2.4× at sf1's 5.8 MB). Gate on the optimizer's
    * size estimate: fan out only when the input carries at least
    * `spark.sql.files.openCostInBytes` (default 4 MB) — if the whole
    * input is smaller than the scheduler's own per-file open-cost
    * charge, an exchange cannot pay for itself. Heavy per-row chains
    * (embed model boundary, media codecs, minhash/md5 pipelines) keep
    * the ungated [[fanout]]: they win at ANY input size (round-14
    * measured 3-7× at 0.6 MB). */
  def fanoutScaled(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    if (df.isStreaming) df
    else {
      val minBytes = df.sparkSession.sessionState.conf.filesOpenCostInBytes
      if (df.queryExecution.optimizedPlan.stats.sizeInBytes >= minBytes) fanout(df)
      else df
    }

  /** The planned partition count of `df`, memoized per (session,
    * semantic plan hash): `df.rdd.getNumPartitions` forces a full
    * physical-planning pass per call just to read one integer — cheap on
    * a toy scan, measurable at 100 TB plan sizes, and every fanout call
    * site asks about the same handful of base-scan plans over and over
    * (round-15, verdict item 5). The count depends only on the plan and
    * session state (file listing, split confs), so the semantic hash —
    * stable across invocations for the lambda-free scan/filter plans
    * fanout is applied to — is a sound key; an unstable (lambda-bearing)
    * hash only misses the cache and re-plans, never returns a wrong
    * count. LRU-bounded so held SparkSession refs can't accumulate. */
  private val plannedParts =
    new graft.util.SessionCache[(org.apache.spark.sql.SparkSession, Int), Int](256)

  private def plannedPartitions(df: org.apache.spark.sql.DataFrame): Int =
    plannedParts.getOrBuild((df.sparkSession, df.queryExecution.logical.semanticHash())) {
      df.rdd.getNumPartitions
    }

  /** Lowercased alnum tokens. DuckDB: regexp_extract_all(lower(x), '[a-z0-9]+') */
  def tokens(c: Column): Column = regexp_extract_all(lower(c), lit("[a-z0-9]+"), lit(0))

  def tokens(name: String): Column = tokens(col(name))

  /** Occurrence count of `term` as a whole token.
    * DuckDB: len(list_filter(tokens, t -> t = 'term')) */
  def termCount(toks: Column, term: String): Column =
    size(filter(toks, t => t === lit(term)))

  /** Portable 60-bit positive hash: first 15 hex chars of md5 → long.
    * DuckDB: ('0x' || substr(md5(x), 1, 15))::BIGINT */
  def hash60(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Word n-gram shingles from a token array.
    * DuckDB: list_transform(range(1, len(t)-n+2), i -> array_to_string(t[i:i+n-1], ' '))
    * Guarded against size<n: Spark's `sequence` would otherwise run descending.
    *
    * `toks` is bound to a lambda variable (via the 1-element array wrap) so
    * it is evaluated ONCE per row even when callers pass a computed
    * expression: a raw `slice(toks, i+1, n)` inside the transform lambda
    * would re-evaluate the whole expression per shingle — measured 60×
    * slower when `toks` is `regexp_extract_all(text)`. */
  def shingles(toks: Column, n: Int): Column =
    element_at(
      transform(array(toks), t =>
        when(size(t) < n, array().cast("array<string>"))
          .otherwise(transform(
            sequence(lit(0), size(t) - n),
            i => concat_ws(" ", slice(t, i + 1, lit(n)))))),
      1)

  /** Fused MinHash hash material: md5(s) || md5(s || '#') — 64 hex chars
    * computed ONCE per set element; each of up to 8 signatures is then the
    * array-min of a cheap 8-hex slice (see [[minhashSig]]). This replaces
    * n independent keyed-md5 passes (n md5 calls per element) with 2 calls
    * per element. DuckDB: list_transform(toks, s -> md5(s) || md5(s || '#')) */
  def minhashFulls(setCol: Column): Column =
    transform(setCol, s => concat(md5(s), md5(concat(s, lit("#")))))

  /** MinHash signature i (0-based, i < 8) from the fulls array: min of the
    * 32-bit hex slice [1+8i, 8i+8]. A fixed slice of md5 output is a uniform
    * permutation key, so the string-min is a valid MinHash; hex strings
    * compare identically in the JVM and DuckDB.
    * DuckDB: list_aggregate(list_transform(fulls, f -> substr(f, 1+8i, 8)), 'min') */
  def minhashSig(fullsCol: Column, i: Int): Column =
    array_min(transform(fullsCol, f => substring(f, 1 + 8 * i, 8)))

  /** Sigmoid, shared by MMR lambda + rerank calibration. */
  def sigmoid(c: Column): Column = lit(1.0) / (lit(1.0) + exp(-c))

  /** Trust/recency score of the reference engine (vector_store.cpp:221-225):
    * boost × max(0.5, 1 − ageSeconds/30days). */
  def trustScore(boost: Column, ageSeconds: Column): Column =
    boost * greatest(lit(0.5), lit(1.0) - ageSeconds / lit(2592000.0))
}
