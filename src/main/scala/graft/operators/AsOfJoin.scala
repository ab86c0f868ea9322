package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * `rightTs <= leftTs` on the same key (direction="backward", the
  * default), or the earliest right row with `rightTs >= leftTs`
  * (direction="forward") — optionally only within a `tolerance` gap
  * (the pandas merge_asof surface).
  *
  * Spark-first composition (preference order (a) of the builder contract):
  * tag and union both sides, sort within key by (ts, right-first), carry
  * the right payload with `last(_, ignoreNulls)` over the incremental
  * [unboundedPreceding, current] frame — forward direction MIRRORS the
  * sort (ts desc) and reuses the same frame, never a
  * [current, unboundedFollowing] frame (Spark recomputes those from
  * scratch per row: O(n²) on a skewed key). Keep left rows.
  * Cost = ONE shuffle of (key, ts) — identical to a sort-merge join's
  * exchange, with no range-explosion; skew behaves like any keyed window;
  * the tolerance is a scan-local post-filter on the carried match's own
  * timestamp, never a range join. This beats a generic range join
  * (O(n·m) per key) and needs no custom physical operator.
  */
object AsOfJoin {

  /** @param payloadCols right-side columns to carry onto each left row
    *                    (null when no right row matches).
    * @param tieBreak right-side column ordering duplicate (key, ts) right
    *                 rows deterministically (backward: the LAST by this
    *                 order wins; forward: the FIRST).
    * @param direction "backward" (rightTs <= leftTs, latest wins) or
    *                  "forward" (rightTs >= leftTs, earliest wins); both
    *                  inclusive.
    * @param tolerance max |rightTs - leftTs| for a match to stand, in the
    *                  ts columns' own units — NUMERIC ts only (cast
    *                  timestamps to unix micros first). */
  def join(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String,
           payloadCols: Seq[String], tieBreak: Option[String] = None,
           direction: String = "backward",
           tolerance: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    // both sides checked: a numeric left ts with a timestamp right ts
    // would otherwise pass here and surface later as an opaque
    // unionByName analysis error instead of this message
    require(tolerance.isEmpty ||
        (left.schema(leftTs).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] &&
         right.schema(rightTs).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]),
      "tolerance needs numeric ts columns on BOTH sides (cast timestamps to unix micros first)")

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

    // carry ONE struct of all payload columns (PLUS the right row's own
    // ts, so a tolerance can disqualify a too-distant match after the
    // carry), tagged non-null exactly on right rows: every carried value
    // then comes from the SAME matched right row, and a NULL payload
    // value in that row stays NULL instead of falling back to another row
    // (which per-column last(ignoreNulls) would do — and with several
    // payload columns could even mix rows)
    val payloadStruct = struct(
      payloadCols.map(c => col(s"__asof_$c").as(c)) :+ col("__asof_ts").as("__src_ts"): _*)
    val rightOnly = when(col("__asof_is_right") === 1, payloadStruct)
    val keyW = Window.partitionBy(col(key))
    val carried = direction match {
      case "backward" =>
        // right rows sort BEFORE left rows at equal ts (inclusive <=); the
        // tie-break is a RIGHT-side column (null on left rows) so duplicate
        // right timestamps carry deterministically — last by tie-break wins
        val w = keyW.orderBy(col("__asof_ts").asc, col("__asof_is_right").desc,
            col("__asof_tb").asc_nulls_first)
          .rowsBetween(Window.unboundedPreceding, 0)
        unioned.withColumn("__asof_pl", last(rightOnly, ignoreNulls = true).over(w))
      case _ =>
        // forward = the backward carry over the MIRRORED sort (ts desc):
        // the same incremental [unboundedPreceding, current] frame, O(n)
        // per key — an [current, unboundedFollowing] frame with first()
        // would be recomputed from scratch per row by Spark's
        // UnboundedFollowing frame processor, O(n²) on a skewed key.
        // Right rows sort BEFORE left rows at equal ts (inclusive >=);
        // tb DESC so last() lands on the FIRST right row by tie-break
        val w = keyW.orderBy(col("__asof_ts").desc, col("__asof_is_right").desc,
            col("__asof_tb").desc_nulls_first)
          .rowsBetween(Window.unboundedPreceding, 0)
        unioned.withColumn("__asof_pl", last(rightOnly, ignoreNulls = true).over(w))
    }

    // the tolerance gate is scan-local: compare the matched right row's
    // own ts against the left ts, drop the whole match beyond the gap
    val gated = tolerance match {
      case Some(g) => carried.withColumn("__asof_pl",
        when(abs(col("__asof_pl").getField("__src_ts") - col("__asof_ts")) <= g,
          col("__asof_pl")))
      case None => carried
    }

    val unpacked = payloadCols.foldLeft(gated.filter(col("__asof_is_right") === 0)) {
      case (df, c) => df.withColumn(s"asof_$c", col("__asof_pl").getField(c))
    }
    unpacked.drop((Seq("__asof_ts", "__asof_is_right", "__asof_tb", "__asof_pl") ++ payload): _*)
  }
}
