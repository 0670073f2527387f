package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose hot keys exceed what AQE's skew-join
  * splitting handles (GraftSession enables
  * `spark.sql.adaptive.skewJoin.enabled` as the first line of defense).
  *
  * Salting: the skewed (big) side gets a deterministic salt in [0, n)
  * hashed from a unique column, splitting each hot key into n sub-keys;
  * the small side replicates n ways. The join runs on (key, salt), so one
  * hot key spreads over n reducers instead of one straggler. Cost:
  * n-way duplication of the small side — use for fact×dim joins where the
  * dim is modest but too big (or too dynamic) to broadcast.
  */
object Skew {

  /** @param big       skewed side
    * @param small     side that will be replicated n times
    * @param key       equi-join key column (same name both sides)
    * @param bigUnique any column of `big` unique-ish per row (drives the
    *                  deterministic salt; a row id or primary key)
    * @param n         salt fan-out
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      bigUnique: String, n: Int, joinType: String = "inner"): DataFrame = {
    require(n > 0)
    // small-side-preserving types (right/full outer) would emit each
    // unmatched small row n times — once per salt replica — silently
    // changing join semantics; only big-side-preserving types are sound
    require(Set("inner", "cross", "left", "leftouter",
        "leftsemi", "leftanti").contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin: joinType '$joinType' preserves unmatched small-side " +
        "rows, which salting would duplicate n times; use inner/left variants")
    val bigS = big.withColumn("__salt", pmod(xxhash64(col(bigUnique)), lit(n)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0L), lit((n - 1).toLong))))
    bigS.join(smallS, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
