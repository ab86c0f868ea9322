package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.store.TokenIndex
import graft.store.TokenIndex.Term

/** FTS5 MATCH fidelity (reference vector_store.cpp:252, :361): `"exact
  * phrase"` and `prefix*` operators with implicit AND — parser, positional
  * posting search, the scan-side twin, and branch equivalence between them.
  */
class FtsMatchSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ---- parser

  test("parse: words, prefixes, phrases, mixed") {
    assert(TokenIndex.parse("merge window") == Seq(Term.Word("merge"), Term.Word("window")))
    assert(TokenIndex.parse("merg*") == Seq(Term.Prefix("merg")))
    assert(TokenIndex.parse("\"merge window\"") == Seq(Term.Phrase(Seq("merge", "window"))))
    assert(TokenIndex.parse("\"a b c\" pre* plain") ==
      Seq(Term.Phrase(Seq("a", "b", "c")), Term.Prefix("pre"), Term.Word("plain")))
    // single-token quotes collapse to a word; empty quotes vanish
    assert(TokenIndex.parse("\"solo\"") == Seq(Term.Word("solo")))
    assert(TokenIndex.parse("\"\" x") == Seq(Term.Word("x")))
    // punctuation tokenizes like the engine's tokenizer
    assert(TokenIndex.parse("Merge-Window") == Seq(Term.Word("merge"), Term.Word("window")))
  }

  test("hasOperators: quotes or trailing star only") {
    assert(TokenIndex.hasOperators("\"merge window\""))
    assert(TokenIndex.hasOperators("merg*"))
    assert(TokenIndex.hasOperators("plain merg* tail"))
    assert(!TokenIndex.hasOperators("plain words only"))
    assert(!TokenIndex.hasOperators("a*b")) // star mid-word is not a prefix op
    // unbalanced quotes are NOT operators: FTS5 errors on them, and the
    // term path's implicit AND would silently flip matching semantics —
    // these degrade gracefully to the plain bag-of-tokens branch
    assert(!TokenIndex.hasOperators("15\" laptop screen"))
    assert(!TokenIndex.hasOperators("said \"hello"))
    assert(!TokenIndex.hasOperators("a \"b c\" d\" e")) // 3 quotes: still unbalanced
  }

  // ---- positional posting search on a hand-checked fixture

  private def fixturePostings = {
    import spark.implicits._
    val docs = Seq(
      (1L, "the merge window opens before the merge window closes"), // phrase ×2
      (2L, "window merge"),                                          // reversed: no phrase
      (3L, "a merge then a window then windows of merges"),          // no adjacency
      (4L, "merge window"),                                          // phrase ×1
      (5L, "nothing relevant here")).toDF("doc_id", "text")
    TokenIndex.build(docs, "doc_id", "text")
  }

  test("searchTerms: phrase counts adjacent occurrences only, in order") {
    val out = TokenIndex.searchTerms(fixturePostings,
      Seq(Term.Phrase(Seq("merge", "window"))), 10)
      .collect().map(r => r.getAs[Long]("chunk_id") -> r.getAs[Long]("score")).toMap
    assert(out == Map(1L -> 2L, 4L -> 1L)) // doc 2 reversed, doc 3 gapped: excluded
  }

  test("searchTerms: prefix sums tf over all matching dictionary tokens") {
    val out = TokenIndex.searchTerms(fixturePostings, Seq(Term.Prefix("window")), 10)
      .collect().map(r => r.getAs[Long]("chunk_id") -> r.getAs[Long]("score")).toMap
    assert(out == Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 1L)) // 'window'+'windows'
  }

  test("searchTerms: implicit AND across terms (FTS5 MATCH)") {
    val out = TokenIndex.searchTerms(fixturePostings,
      Seq(Term.Phrase(Seq("merge", "window")), Term.Word("closes")), 10)
      .collect().map(r => r.getAs[Long]("chunk_id") -> r.getAs[Long]("score")).toMap
    assert(out == Map(1L -> 3L)) // doc 4 has the phrase but not 'closes'
  }

  test("termScore (scan twin) agrees with searchTerms on the fixture") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the merge window opens before the merge window closes"),
      (2L, "window merge"),
      (3L, "a merge then a window then windows of merges"),
      (4L, "merge window"),
      (5L, "nothing relevant here")).toDF("doc_id", "text")
    for (q <- Seq("\"merge window\"", "windo*", "\"merge window\" windo*",
                  "\"merge window\" closes", "\"no such phrase\"")) {
      val terms = TokenIndex.parse(q)
      val viaPost = TokenIndex.searchTerms(fixturePostings, terms, 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val viaScan = docs
        .select(col("doc_id"), TokenIndex.termScore(
          graft.functions.F.tokens(col("text")), terms).as("score"))
        .filter(col("score") > 0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(viaPost == viaScan, s"branches diverge for query $q")
    }
  }

  // ---- live engine branch equivalence (the PlanQualitySpec contract,
  // extended to MATCH-operator queries)

  test("engine keyword branches: posting term path and scan fallback return identical candidates") {
    val sf = "/root/testdata/sf0.001"
    val chunks = graft.queries.EngineQueries.chunksFor(spark, sf)
    val postings = graft.queries.EngineQueries.postingsFor(spark, sf)
    val withIndex = new graft.search.HybridEngine(spark, chunks, postings = Some(postings))
    val scanOnly = new graft.search.HybridEngine(spark, chunks)
    for (q <- Seq("\"merge window\"", "merg*", "\"merge window\" hash", "\"zzz nothing\"")) {
      val terms = TokenIndex.parse(q)
      val a = withIndex.keywordTermCandidates(terms, 20).collect().map(_.toSeq).toSeq
      val b = scanOnly.keywordTermCandidates(terms, 20).collect().map(_.toSeq).toSeq
      assert(a == b, s"term branches diverge for $q:\n$a\nvs\n$b")
    }
  }

  test("search() routes operator queries through the term path and still returns top-k") {
    val sf = "/root/testdata/sf0.001"
    val chunks = graft.queries.EngineQueries.chunksFor(spark, sf)
    val postings = graft.queries.EngineQueries.postingsFor(spark, sf)
    val engine = new graft.search.HybridEngine(spark, chunks, postings = Some(postings))
    val embedder = graft.embed.HashNgramEmbedder(dim = 64)
    val hits = engine.search("\"merge window\"", embedder, 5)
    assert(hits.size == 5)
    // the phrase-bearing chunks must out-rank on the keyword side: the top
    // hit's text contains the exact phrase
    assert(hits.exists(_.text.toLowerCase.contains("merge window")))
  }
}
