package graft.operators

import graft.SparkSpec

/** Keyframe selection (m09): boundaries split frames into scenes,
  * the max-energy frame represents each scene, ties go earliest,
  * and a boundary-free video is one scene.
  */
class KeyframeSpec extends SparkSpec {
  import spark.implicits._

  private def run(blob: Array[Byte], tau2: Long) =
    Multimodal.keyframes(Seq((1L, blob)).toDF("doc_id", "blob"),
        "doc_id", "blob", n = 4, tau2 = tau2)
      .orderBy("scene").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  test("a content shift splits two scenes; each keyframe is the max-energy frame") {
    // frames: aa | aa | zz | zz -> boundary at frame 2; 'z' > 'a' so
    // within each scene energies tie -> earliest frame wins
    val out = run((("a" * 200) + ("z" * 200)).getBytes("UTF-8"), tau2 = 1000L)
    assert(out.length == 2, out.toSeq)
    val (s0, n0, k0, _) = out(0)
    val (s1, n1, k1, _) = out(1)
    assert(s0 == 0L && n0 == 2L && k0 == 0L, out(0)) // tie -> frame 0
    assert(s1 == 1L && n1 == 2L && k1 == 2L, out(1)) // tie -> frame 2
  }

  test("no boundary means one scene whose keyframe has the top energy") {
    // ramp a < b < c < d: energies strictly increase -> keyframe 3
    val blob = (("a" * 100) + ("b" * 100) + ("c" * 100) + ("d" * 100))
      .getBytes("UTF-8")
    val out = run(blob, tau2 = Long.MaxValue)
    assert(out.length == 1, out.toSeq)
    val (s, n, k, e) = out(0)
    assert(s == 0L && n == 4L && k == 3L, out(0))
    // frame of 100 'd' bytes: 8 bins, 4 bins of 13 bytes + 4 of 12
    // ('d' = 100): energy = 4*(13*100)^2 + 4*(12*100)^2
    assert(e == 4L * 1300L * 1300L + 4L * 1200L * 1200L, e)
  }

  test("every frame lands in exactly one scene") {
    val blob = (("a" * 120) + ("q" * 130) + ("a" * 150)).getBytes("UTF-8")
    val out = run(blob, tau2 = 1000L)
    assert(out.map(_._2).sum == 4L, out.toSeq) // n_frames sums to all 4
  }
}
