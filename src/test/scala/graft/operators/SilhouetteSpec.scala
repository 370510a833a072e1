package graft.operators

import graft.SparkSpec

/** Simplified silhouette (s36): separated clusters score high, a
  * sliced blob scores near zero, coincident centroids don't divide
  * by zero.
  */
class SilhouetteSpec extends SparkSpec {
  import spark.implicits._

  private def run(points: Seq[Array[Float]],
                  cents: Array[Array[Long]]): Seq[(Long, Double)] =
    Similarity.silhouette(
      points.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding"),
      "vec_id", "embedding", cents, dims = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq

  private def micro(xs: Double*): Array[Long] =
    xs.map(x => math.round(x * 1e6)).toArray

  test("well-separated clusters score near 1; a sliced blob scores near 0") {
    // two tight clusters around (0,0) and (10,10)
    val tight = Seq(Array(0.0f, 0.1f), Array(0.1f, 0.0f),
      Array(10.0f, 10.1f), Array(10.1f, 10.0f))
    val cSep = Array(micro(0.05, 0.05), micro(10.05, 10.05))
    val sep = run(tight, cSep)
    assert(sep.forall(_._2 > 0.95), sep.toString)
    // the same blob sliced by two nearby centroids: d1 ~ d2 -> s ~ 0
    val blob = Seq(Array(5.0f, 5.0f), Array(5.1f, 5.0f),
      Array(5.0f, 5.1f), Array(5.1f, 5.1f))
    val cSlice = Array(micro(5.04, 5.05), micro(5.06, 5.05))
    val sliced = run(blob, cSlice)
    assert(sliced.forall(_._2 < 0.2), sliced.toString)
  }

  test("coincident centroids give s = 0, never a division by zero") {
    val c = Array(micro(1.0, 1.0), micro(1.0, 1.0))
    val out = run(Seq(Array(1.0f, 1.0f)), c)
    assert(out == Seq((0L, 0.0)), out.toString)
  }
}
