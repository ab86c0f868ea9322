package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.VectorFunctions.{cosineSim, dotProduct}

/** Approximate-nearest-neighbor search over the embedding column.
  *
  * `ann_bruteforce_topk` is the exact baseline: broadcast the (tiny) query
  * set against a single scan of the corpus, per-query top-k via window rank —
  * per-partition partial top-k, one shuffle of k·|Q| rows.
  *
  * `ann_lsh_bucketed` is the scale path: an 8-bit sign-LSH signature
  * (hyperplanes drawn deterministically from the corpus) buckets the corpus;
  * each query only scans its own bucket — at 1000 executors the bucket id is
  * the shuffle/partition key and the full-corpus scan disappears.
  */
object AnnQueries {

  private val NumQueries = 5
  private val K = 10
  private val HpLo = 8
  private val HpHi = 15 // 8 hyperplanes → 256 buckets

  private def embeddings(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "embeddings")

  val all: Seq[Q] = Seq(

    Q("ann_bruteforce_topk",
      s"""SELECT q.vec_id AS q_id, e.vec_id AS n_id,
         |       round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6) AS score,
         |       row_number() OVER (PARTITION BY q.vec_id
         |                          ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC, e.vec_id) AS rank
         |FROM embeddings q CROSS JOIN embeddings e
         |WHERE q.vec_id < $NumQueries AND e.vec_id <> q.vec_id
         |QUALIFY rank <= $K
         |ORDER BY q_id, rank""".stripMargin) { (spark, dir) =>
      val e = embeddings(spark, dir)
      val q = e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      val scored = e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          cosineSim(col("embedding"), col("qv")).as("s"))
      scored
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("s").desc, col("n_id"))))
        .filter(col("rank") <= K)
        .select(col("q_id"), col("n_id"), round(col("s"), 6).as("score"), col("rank").cast("long").as("rank"))
        .orderBy(col("q_id"), col("rank"))
    },

    Q("ann_lsh_bucketed",
      s"""WITH hp AS (SELECT vec_id - $HpLo AS hid, embedding AS he FROM embeddings
         |            WHERE vec_id BETWEEN $HpLo AND $HpHi),
         |bk AS (SELECT e.vec_id, sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[], hp.he::DOUBLE[]) > 0
         |                               THEN (1 << hid) ELSE 0 END)::BIGINT AS bucket
         |       FROM embeddings e CROSS JOIN hp GROUP BY e.vec_id),
         |qs AS (SELECT vec_id AS q_id, bucket FROM bk WHERE vec_id < $NumQueries)
         |SELECT qs.q_id, c.vec_id AS n_id,
         |       round(list_cosine_similarity(ce.embedding::DOUBLE[], qe.embedding::DOUBLE[]), 6) AS score,
         |       row_number() OVER (PARTITION BY qs.q_id
         |                          ORDER BY list_cosine_similarity(ce.embedding::DOUBLE[], qe.embedding::DOUBLE[]) DESC, c.vec_id) AS rank
         |FROM qs
         |JOIN bk c ON c.bucket = qs.bucket AND c.vec_id <> qs.q_id
         |JOIN embeddings ce ON ce.vec_id = c.vec_id
         |JOIN embeddings qe ON qe.vec_id = qs.q_id
         |QUALIFY rank <= $K
         |ORDER BY q_id, rank""".stripMargin) { (spark, dir) =>
      val e = embeddings(spark, dir)
      val hp = e.filter(col("vec_id").between(HpLo, HpHi))
        .select((col("vec_id") - HpLo).as("hid"), col("embedding").as("he"))
      // 8-bit signature: one broadcast of 8 hyperplanes, map-side partial agg
      val bk = e.crossJoin(broadcast(hp))
        .groupBy(col("vec_id"))
        .agg(sum(when(dotProduct(col("embedding"), col("he")) > 0,
          expr("shiftleft(1, cast(hid as int))")).otherwise(0)).as("bucket"))
      val qs = bk.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("bucket").as("qbucket"))
      val cands = bk.join(broadcast(qs),
          col("bucket") === col("qbucket") && col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"))
      val withVecs = cands
        .join(e.select(col("vec_id").as("n_id"), col("embedding").as("nv")), Seq("n_id"))
        .join(broadcast(e.filter(col("vec_id") < NumQueries)
          .select(col("vec_id").as("q_id"), col("embedding").as("qv"))), Seq("q_id"))
        .select(col("q_id"), col("n_id"), cosineSim(col("nv"), col("qv")).as("s"))
      withVecs
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("s").desc, col("n_id"))))
        .filter(col("rank") <= K)
        .select(col("q_id"), col("n_id"), round(col("s"), 6).as("score"), col("rank").cast("long").as("rank"))
        .orderBy(col("q_id"), col("rank"))
    }
  )
}
