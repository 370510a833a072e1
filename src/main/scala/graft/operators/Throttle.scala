package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's throttler (squeryer.go:352-361): at most N elements
  * per period, overflow discarded.
  *
  * Batch semantics: "arrival order" is event-time order, so the first
  * N rows of each period by (timestamp, tie-breakers) survive. One
  * shuffle on the period key; row_number is computed per-partition
  * after the shuffle, so at 100 TB the cost is one exchange on a
  * well-distributed key (period count grows with data span).
  *
  * Streaming semantics live at the source instead — see
  * LogSource.stream's maxFilesPerTrigger.
  */
object Throttle {

  def firstNPerPeriod(df: DataFrame, tsCol: String, periodSec: Long, n: Int,
                      tieCols: Seq[String] = Nil): DataFrame = {
    val tus = unix_micros(col(tsCol))
    val period = floor(tus / lit(periodSec * 1000000L))
    val order: Seq[Column] = tus +: tieCols.map(col)
    val w = Window.partitionBy(period).orderBy(order: _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= n)
      .drop("_rn")
  }
}
