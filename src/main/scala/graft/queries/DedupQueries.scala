package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.F
import graft.functions.VectorFunctions.cosineSim

/** Deduplication suite for the training-data pipeline: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, and embedding-cosine near-dup — each with a
  * DuckDB oracle.
  *
  * Scale posture: every variant is block-local (LSH band buckets, lang
  * blocks, label blocks) so no O(n²) pair join ever crosses the full corpus;
  * candidate generation is a groupBy on a computed key (one shuffle of
  * compact signatures, never of full documents).
  */
object DedupQueries {

  private val NumHashes = 8
  private val Bands = 4 // rows-per-band = 2

  /** doc_id + distinct-token set, the input of the signature ops. */
  private def tokenSets(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"), array_distinct(F.tokens(col("text"))).as("toks"))

  private val tokenSetsSql =
    "SELECT doc_id, list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')) AS toks FROM documents"

  val all: Seq[Q] = Seq(

    // Exact dedup: hash-groupBy on normalized text (single shuffle of md5
    // keys — at 100 TB this is the cheapest possible full-corpus dedup).
    Q("dedup_exact",
      """SELECT count(*) AS n_docs,
        |       count(DISTINCT md5(lower(trim(text)))) AS n_distinct,
        |       count(*) - count(DISTINCT md5(lower(trim(text)))) AS n_dup_rows
        |FROM documents""".stripMargin) { (spark, dir) =>
      table(spark, dir, "documents")
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(md5(lower(trim(col("text"))))).as("n_distinct"),
          (count(lit(1)) - countDistinct(md5(lower(trim(col("text")))))).as("n_dup_rows"))
    },

    // MinHash + LSH: 8 keyed-md5 min-hashes over the distinct-token set,
    // banded 2-per-band into 4 band keys; docs sharing a band key are
    // near-dup candidates. Reported as bucket statistics (bucket explosion
    // stays bounded; the pairwise verify lives in dedup_ngram_jaccard).
    Q("dedup_minhash_lsh", {
      val mh = (0 until NumHashes)
        .map(i => s"list_aggregate(list_transform(toks, s -> md5(s || ':$i')), 'min')")
        .mkString("[", ", ", "]")
      val bandRows = (0 until Bands)
        .map(b => s"SELECT doc_id, $b AS band, md5(mh[${2 * b + 1}] || mh[${2 * b + 2}]) AS bkey FROM m")
        .mkString(" UNION ALL ")
      s"""WITH t AS ($tokenSetsSql),
         |m AS (SELECT doc_id, $mh AS mh FROM t),
         |b AS ($bandRows)
         |SELECT band, bkey, count(*) AS n
         |FROM b GROUP BY band, bkey HAVING count(*) > 1
         |ORDER BY n DESC, band, bkey LIMIT 100""".stripMargin
    }) { (spark, dir) =>
      val withMh = (0 until NumHashes).foldLeft(tokenSets(spark, dir)) {
        case (df, i) => df.withColumn(s"mh$i", F.minhash(col("toks"), i))
      }
      val bands = withMh.select(
        col("doc_id"),
        explode(array((0 until Bands).map { b =>
          struct(lit(b).as("band"), md5(concat(col(s"mh${2 * b}"), col(s"mh${2 * b + 1}"))).as("bkey"))
        }: _*)).as("bb"))
      bands.select(col("bb.band").as("band"), col("bb.bkey").as("bkey"))
        .groupBy("band", "bkey")
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .orderBy(col("n").desc, col("band"), col("bkey"))
        .limit(100)
    },

    // SimHash: 16-bit signature; bit j is the sign of the sum over distinct
    // tokens of ±1 by bit j of a portable 60-bit token hash.
    Q("dedup_simhash", {
      val bitSums = (0 until 16)
        .map(j => s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS b$j")
        .mkString(", ")
      val combine = (0 until 16)
        .map(j => s"(CASE WHEN b$j > 0 THEN ${1 << j} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH t AS ($tokenSetsSql),
         |tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
         |h AS (SELECT doc_id, ('0x' || substr(md5(tk), 1, 15))::BIGINT AS h FROM tok),
         |bits AS (SELECT doc_id, $bitSums FROM h GROUP BY doc_id)
         |SELECT doc_id, $combine AS simhash
         |FROM bits ORDER BY doc_id LIMIT 1000""".stripMargin
    }) { (spark, dir) =>
      val h = tokenSets(spark, dir)
        .select(col("doc_id"), explode(col("toks")).as("tk"))
        .select(col("doc_id"), F.hash60(col("tk")).as("h"))
      val bitSums = (0 until 16).map { j =>
        sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$j")
      }
      val combine = (0 until 16)
        .map(j => when(col(s"b$j") > 0, 1 << j).otherwise(0))
        .reduce[Column](_ + _)
      h.groupBy("doc_id")
        .agg(bitSums.head, bitSums.tail: _*)
        .select(col("doc_id"), combine.as("simhash"))
        .orderBy("doc_id")
        .limit(1000)
    },

    // n-gram Jaccard: pairwise Jaccard over distinct word-bigram shingles,
    // blocked by lang + deterministic sampling so the pair join is always
    // block-local (the at-scale contract: pairs only within LSH buckets).
    Q("dedup_ngram_jaccard",
      """WITH d AS (
        |  SELECT doc_id, lang,
        |         list_distinct(list_transform(range(1, len(regexp_extract_all(lower(text), '[a-z0-9]+'))),
        |           i -> array_to_string(list_slice(regexp_extract_all(lower(text), '[a-z0-9]+'), i, i + 1), ' '))) AS sh
        |  FROM documents WHERE doc_id % 4 = 0)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |       round(len(list_intersect(a.sh, b.sh))::DOUBLE /
        |             (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
        |FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |ORDER BY jaccard DESC, a_id, b_id LIMIT 50""".stripMargin) { (spark, dir) =>
      val d = table(spark, dir, "documents")
        .filter(col("doc_id") % 4 === 0)
        .select(col("doc_id"), col("lang"),
          array_distinct(F.shingles(F.tokens(col("text")), 2)).as("sh"))
      val a = d.select(col("doc_id").as("a_id"), col("lang").as("lang_a"), col("sh").as("sa"))
      val b = d.select(col("doc_id").as("b_id"), col("lang").as("lang_b"), col("sh").as("sb"))
      val inter = size(array_intersect(col("sa"), col("sb"))).cast("double")
      a.join(b, col("lang_a") === col("lang_b") && col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          round(inter / (size(col("sa")) + size(col("sb")) - inter), 6).as("jaccard"))
        .orderBy(col("jaccard").desc, col("a_id"), col("b_id"))
        .limit(50)
    },

    // End-to-end dedup grouping: blocked candidates → Jaccard-verified
    // edges → connected components by min-label propagation (the exact
    // component minimum; oracle = recursive-CTE transitive closure).
    Q("dedup_pipeline_components",
      """WITH RECURSIVE
        |d AS (SELECT doc_id, lang, list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')) AS s
        |      FROM documents WHERE doc_id % 4 = 0),
        |e AS (SELECT a.doc_id AS a, b.doc_id AS b
        |      FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id <> b.doc_id
        |      WHERE len(list_intersect(a.s, b.s))::DOUBLE /
        |            (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.9),
        |reach(id, r) AS (
        |  SELECT doc_id, doc_id FROM d
        |  UNION
        |  SELECT e.b, reach.r FROM reach, e WHERE e.a = reach.id)
        |SELECT id AS doc_id, min(r) AS component
        |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      graft.dedup.DedupPipeline.components(table(spark, dir, "documents"))
        .orderBy("doc_id")
    },

    // Embedding-cosine near-dup: pair scan blocked by label + sampling;
    // the native codegen cosine keeps the kernel in WholeStageCodegen.
    Q("dedup_embedding_cosine",
      """WITH e AS (SELECT vec_id, label, embedding FROM embeddings WHERE vec_id % 5 = 0)
        |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos
        |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.2
        |ORDER BY cos DESC, a_id, b_id LIMIT 50""".stripMargin) { (spark, dir) =>
      val e = table(spark, dir, "embeddings").filter(col("vec_id") % 5 === 0)
      val a = e.select(col("vec_id").as("a_id"), col("label").as("label_a"), col("embedding").as("ea"))
      val b = e.select(col("vec_id").as("b_id"), col("label").as("label_b"), col("embedding").as("eb"))
      val cos = cosineSim(col("ea"), col("eb"))
      a.join(b, col("label_a") === col("label_b") && col("a_id") < col("b_id"))
        .filter(cos > 0.2)
        .select(col("a_id"), col("b_id"), round(cos, 6).as("cos"))
        .orderBy(col("cos").desc, col("a_id"), col("b_id"))
        .limit(50)
    }
  )
}
