package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** The q40b 100×-curve adjudication probe (r16 verdict task 4): time
  * each LPA round's pieces separately on the q40b co-purchase graph
  * at the given dirs, so the 14.7× wall ratio at 100× edges
  * decomposes into edge-build / per-round argmax / relabel / final
  * sort masses and the super-per-edge stage (if any) is named, not
  * guessed. Also reports the (node,label) pair mass entering each
  * round's argmax — the suspected hub-skew axis (Gen10x stretches
  * ORDER keys only, so part nodes become 100× hubs).
  * Usage: runMain graft.Q40bProbe [dir ...]
  */
object Q40bProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/gen100x")
    val spark = GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q40b] $label%-26s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    for (dir <- dirs) {
      println(s"[q40b] === $dir ===")
      val e0 = spark.read.parquet(s"$dir/lineitem.parquet")
        .groupBy((col("l_orderkey") * 2).as("src"),
          (col("l_partkey") * 2 + 1).as("dst"))
        .agg(sum(col("l_quantity").cast("long")).as("w"))
      val edges = e0.unionByName(
        e0.select(col("dst").as("src"), col("src").as("dst"), col("w")))
      val e = edges.select(col("src").cast("long").as("_src"),
        col("dst").cast("long").as("_dst"), col("w").cast("long").as("_w"))
        .repartition(col("_src")).persist()
      val nEdges = t("edge_build_persist")(e.count())
      val nodes = e.select(col("_src").as("id"))
        .unionByName(e.select(col("_dst").as("id"))).distinct().persist()
      val nNodes = t("nodes_distinct")(nodes.count())
      println(s"[q40b] edges=$nEdges nodes=$nNodes")
      var lab = nodes.withColumn("label", col("id")).persist()
      lab.count()
      for (r <- 1 to 3) {
        val scores = lab.select(col("id").as("_src"), col("label"))
          .join(e, Seq("_src"))
          .groupBy(col("_dst").as("id"), col("label"))
          .agg(sum(col("_w")).as("_m")).persist()
        val pairMass = t(s"round${r}_argmax_agg")(scores.count())
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("id")).orderBy(col("_m").desc, col("label"))
        val best = scores.withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1).select(col("id"), col("label").as("_nl"))
          .persist()
        t(s"round${r}_window_top1")(best.count())
        val next = lab.join(best, Seq("id"), "left")
          .select(col("id"), coalesce(col("_nl"), col("label")).as("label"))
          .persist()
        t(s"round${r}_relabel")(next.count())
        println(s"[q40b] round$r pair_mass=$pairMass")
        scores.unpersist(); best.unpersist(); lab.unpersist()
        lab = next
      }
      t("final_orderBy_noop") {
        lab.select(
            when(col("id") % 2 === 0, lit("order")).otherwise(lit("part")).as("kind"),
            shiftright(col("id"), 1).as("node_id"))
          .orderBy("kind", "node_id")
          .write.format("noop").mode("overwrite").save()
      }
      lab.unpersist(); e.unpersist(); nodes.unpersist()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
