package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys — the "salting" scale technique
  * (builder brief; AQE's skew-join handles many cases at runtime, but
  * salting is the explicit form when a key is pathologically hot or AQE
  * is unavailable).
  *
  * The big (probe) side gets a per-row salt in [0, salt); the small
  * (build) side is replicated once per salt value. Joining on
  * (key, salt) splits each hot key across `salt` shuffle partitions
  * while preserving exact inner-join semantics: a big row carries ONE
  * salt value and meets each matching small row exactly once (at that
  * salt's replica).
  */
object SkewJoin {

  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      salt: Int): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    val bigS = big.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salt)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(smallS,
        bigS(bigKey) === smallS(smallKey) &&
          bigS("__salt") === smallS("__salt"))
      .drop("__salt")
  }
}
