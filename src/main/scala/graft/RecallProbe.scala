package graft
import org.apache.spark.sql.functions._
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.get("8")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      def res(name: String) = SparkEntry.queries(name)(s, sf)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val brute = res("s01_ann_brute")
      val lsh = res("s02_ann_lsh")
      val ivf = res("s03_ann_ivf")
      def recall(m: Map[Long, Set[Long]]) = {
        val per = brute.keys.map(q => (m.getOrElse(q, Set.empty) intersect brute(q)).size.toDouble / brute(q).size)
        per.sum / per.size
      }
      println(f"RECALL sf=$sf lsh=${recall(lsh)}%.3f ivf=${recall(ivf)}%.3f nvec=${s.read.parquet(s"$sf/embeddings.parquet").count()}")
    }
    s.stop()
  }
}
