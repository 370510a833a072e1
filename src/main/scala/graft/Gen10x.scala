package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
/** Dev tool: build a 10x copy of an sf dir (key-offset fact copies,
  * dims as-is) for scaling experiments. Usage: runMain graft.Gen10x
  * <srcDir> <dstDir> [copies]. Never touches /root/testdata.
  */
object Gen10x {
  def main(args: Array[String]): Unit = {
    val Array(src, dst) = args.take(2)
    val n = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.get("32")
    def rd(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def wr(df: DataFrame, t: String) =
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")
    def stretch(df: DataFrame, keys: Map[String, Long]): DataFrame =
      (0 until n).map { i =>
        keys.foldLeft(df) { case (d, (k, span)) =>
          d.withColumn(k, col(k) + lit(i * span)) }
      }.reduce(_ unionAll _)

    val oSpan = rd("orders").agg(max("o_orderkey")).head.getLong(0) + 1
    val cSpan = rd("customer").agg(max("c_custkey")).head.getLong(0) + 1
    val eSpan = rd("events").agg(max("event_id")).head.getLong(0) + 1
    val dSpan = rd("documents").agg(max("doc_id")).head.getLong(0) + 1
    val vSpan = rd("embeddings").agg(max("vec_id")).head.getLong(0) + 1

    wr(stretch(rd("lineitem"), Map("l_orderkey" -> oSpan)), "lineitem")
    wr(stretch(rd("orders"), Map("o_orderkey" -> oSpan, "o_custkey" -> cSpan)), "orders")
    wr(stretch(rd("customer"), Map("c_custkey" -> cSpan)), "customer")
    wr(stretch(rd("events"), Map("event_id" -> eSpan, "user_id" -> cSpan)), "events")
    wr(stretch(rd("documents"), Map("doc_id" -> dSpan)), "documents")
    wr(stretch(rd("embeddings"), Map("vec_id" -> vSpan)), "embeddings")
    for (t <- Seq("region", "nation", "supplier", "part")) wr(rd(t), t)
    spark.stop()
  }
}
