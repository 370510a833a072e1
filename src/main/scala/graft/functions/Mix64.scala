package graft.functions

/** The one splitmix64 finalizer every graft hash family derives from.
  * MinHash (batch aggregate AND streaming row-local), SimHash, shingle
  * hashing, and LSH hyperplane components all promise interchangeable
  * results across code paths — which only holds while they share this
  * single mixer. Do not fork it.
  */
object Mix64 {
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}
