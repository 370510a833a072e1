package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the single right row
  * with the greatest timestamp <= the left row's timestamp, per key.
  *
  * Implemented with the union-merge trick rather than a range join:
  * tag both sides, union them, sort within each key by (ts, side) and
  * carry the last-seen right payload forward with
  * `last_value(ignoreNulls)` over rows UNBOUNDED PRECEDING..CURRENT.
  *
  * Scale shape: ONE shuffle on the key (the window partition), zero
  * row replication, no O(|L|x|R|) candidate pairs — the plan a
  * backward range join would need. Both inputs stream through the
  * sort in timestamp order, so state per key is a single payload
  * struct. This survives 100 TB where a theta-join (l.ts >= r.ts)
  * degenerates to nested loops.
  *
  * Right-side ties on (key, ts) resolve to the largest `tieCol` value
  * so the result is deterministic.
  */
object AsOf {

  /** @param left      probe side (keeps all its rows)
    * @param right     build side (its `payloadCols` are attached)
    * @param keyCols   equi-key both sides share
    * @param tsCol     event-time column name present on both sides
    * @param tieCol    right-side column breaking equal-ts ties (max wins)
    * @param payloadCols right-side columns to surface, aliased as given
    */
  def join(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           tsCol: String, tieCol: String,
           payloadCols: Seq[(String, String)]): DataFrame = {
    val leftCols = left.columns.toSeq
    // side=0 sorts right rows BEFORE left rows at equal ts, so a right
    // row with ts == left.ts is visible to it ("at or before").
    val taggedRight = right.select(
      keyCols.map(col) ++ Seq(
        col(tsCol).as("_ts"), lit(0).as("_side"),
        col(tieCol).as("_tie"),
        struct(payloadCols.map { case (c, a) => col(c).as(a) }: _*).as("_payload")): _*)
    val taggedLeft = left.select(
      keyCols.map(col) ++ Seq(
        col(tsCol).as("_ts"), lit(1).as("_side"),
        lit(null).cast(taggedRight.schema("_tie").dataType).as("_tie"),
        lit(null).cast(taggedRight.schema("_payload").dataType).as("_payload")) ++
        leftCols.map(c => col(c).as(s"_l_$c")): _*)
    val unioned = taggedLeft.unionByName(
      taggedRight.select(taggedRight.columns.map(col) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"_l_$c")): _*))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_match", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(c => col(s"_l_$c").as(c)) ++
        payloadCols.map { case (_, a) => col(s"_match.$a").as(a) }: _*)
  }
}
