package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.VectorFunctions.cosineSim
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
      val cents = e.filter(col("vec_id").between(CentLo, CentHi))
        .select((col("vec_id") - CentLo).as("cid"), col("embedding").as("ce"))
      val cells = e.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("cid"),
          row_number().over(Window.partitionBy(col("vec_id"))
            .orderBy(cosineSim(col("embedding"), col("ce")).desc, col("cid"))).as("rn"))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("cid"))
      val qs = cells.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("cid").as("qcid"))
      val cands = cells.join(broadcast(qs),
          col("cid") === col("qcid") && col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"))
      cands
        .join(e.select(col("vec_id").as("n_id"), col("embedding").as("nv")), Seq("n_id"))
        .join(broadcast(e.filter(col("vec_id") < NumQueries)
          .select(col("vec_id").as("q_id"), col("embedding").as("qv"))), Seq("q_id"))
        .select(col("q_id"), col("n_id"), cosineSim(col("nv"), col("qv")).as("s"))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("s").desc, col("n_id"))))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("n_id"), round(col("s"), 6).as("score"),
          col("rank").cast("long").as("rank"))
        .orderBy("q_id", "rank")
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
    }
  )
}
