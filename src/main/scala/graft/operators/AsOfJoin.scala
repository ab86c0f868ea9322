package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * `rightTs <= leftTs` on the same key.
  *
  * Spark-first composition (preference order (a) of the builder contract):
  * tag and union both sides, sort within key by (ts, right-first), carry
  * the right payload forward with `last(_, ignoreNulls)`, keep left rows.
  * Cost = ONE shuffle of (key, ts) — identical to a sort-merge join's
  * exchange, with no range-explosion; skew behaves like any keyed window.
  * This beats a generic range join (O(n·m) per key) and needs no custom
  * physical operator.
  */
object AsOfJoin {

  /** @param payloadCols right-side columns to carry onto each left row
    *                    (null when no right row precedes the left row).
    * @param tieBreak right-side column ordering duplicate (key, ts) right
    *                 rows deterministically (the LAST by this order wins). */
  def join(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String,
           payloadCols: Seq[String], tieBreak: Option[String] = None): DataFrame = {

    val leftCols = left.columns.toSeq
    val payload = payloadCols.map(c => s"__asof_$c")

    val taggedLeft = payload.foldLeft(
      left.withColumn("__asof_ts", col(leftTs)).withColumn("__asof_is_right", lit(0))
    ) { case (df, p) => df.withColumn(p, lit(null).cast(right.schema(p.stripPrefix("__asof_")).dataType)) }

    val taggedRight = {
      val base = right
        .withColumn("__asof_ts", col(rightTs))
        .withColumn("__asof_is_right", lit(1))
        .withColumn("__asof_tb", tieBreak.map(col).getOrElse(lit(0)))
      val withPayload = payloadCols.foldLeft(base) {
        case (df, c) => df.withColumn(s"__asof_$c", col(c))
      }
      // align to the left schema: null out left-only columns
      val aligned = leftCols.foldLeft(withPayload) {
        case (df, c) if !withPayload.columns.contains(c) =>
          df.withColumn(c, lit(null).cast(left.schema(c).dataType))
        case (df, _) => df
      }
      aligned.select((leftCols ++ Seq("__asof_ts", "__asof_is_right", "__asof_tb") ++ payload).map(col): _*)
    }

    val unioned = taggedLeft
      .withColumn("__asof_tb", lit(null).cast(
        tieBreak.map(c => right.schema(c).dataType).getOrElse(org.apache.spark.sql.types.IntegerType)))
      .select((leftCols ++ Seq("__asof_ts", "__asof_is_right", "__asof_tb") ++ payload).map(col): _*)
      .unionByName(taggedRight)

    // right rows sort BEFORE left rows at equal ts (inclusive <=); the
    // tie-break is a RIGHT-side column (null on left rows) so duplicate
    // right timestamps carry deterministically — last by tie-break wins
    val orderCols = Seq(col("__asof_ts").asc, col("__asof_is_right").desc,
      col("__asof_tb").asc_nulls_first)
    val w = Window.partitionBy(col(key)).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, 0)

    // carry ONE struct of all payload columns, tagged non-null exactly on
    // right rows: every carried value then comes from the SAME (latest)
    // right row, and a NULL payload value in that row stays NULL instead of
    // falling back to an older row (which per-column last(ignoreNulls)
    // would do — and with several payload columns could even mix rows)
    val payloadStruct = struct(payloadCols.map(c => col(s"__asof_$c").as(c)): _*)
    val carried = unioned.withColumn("__asof_pl",
      last(when(col("__asof_is_right") === 1, payloadStruct), ignoreNulls = true).over(w))

    val unpacked = payloadCols.foldLeft(carried.filter(col("__asof_is_right") === 0)) {
      case (df, c) => df.withColumn(s"asof_$c", col("__asof_pl").getField(c))
    }
    unpacked.drop((Seq("__asof_ts", "__asof_is_right", "__asof_tb", "__asof_pl") ++ payload): _*)
  }
}
