package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins on pathological keys.
  *
  * AQE's skew-join split handles most cases at runtime; salting is
  * the explicit tool when one key dominates so heavily that even a
  * split partition won't fit (the classic null-key / celebrity-key
  * problem at 100 TB).
  */
object Skew {

  /** Salted equi-join: the skewed (large) side gets a random salt in
    * [0, factor); the small side is replicated `factor` ways with
    * every salt value. The join key becomes (key, salt), spreading a
    * hot key over `factor` reducers. Inner join semantics preserved.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 factor: Int, seed: Long = 42L): DataFrame = {
    val salted = skewed.withColumn("_salt", (rand(seed) * factor).cast("int"))
    val replicated = other
      .withColumn("_salt", explode(array((0 until factor).map(lit): _*)))
    salted
      .join(replicated, Seq(key, "_salt"))
      .drop("_salt")
  }
}
