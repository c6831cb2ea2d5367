package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE's skew-join splitting handles most
  * cases at runtime; explicit salting remains the tool when one key
  * dominates so hard that even a split partition's build side won't
  * fit, or when the skewed join is followed by an aggregation that
  * must also spread (AQE only re-plans the join itself).
  */
object Skew {

  /** Join `left` (skewed on `key`) with `right`, spreading each hot key
    * over `salt` partitions: the left side gets a deterministic salt
    * from a unique column (reproducible across retries — no rand()),
    * the right side is replicated `salt` times. Row-identical to the
    * plain join; the shuffle key becomes (key, salt) so no single
    * partition owns a hot key's whole row set. Replication cost is
    * |right| × salt — use for dim-vs-fact skew, not fact-vs-fact.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
    leftUniqueCol: String, salt: Int): DataFrame = {
    val sl = left.withColumn("__salt",
      pmod(xxhash64(col(leftUniqueCol)), lit(salt.toLong)).cast("int"))
    val sr = right.withColumn("__salt",
      explode(expr(s"sequence(0, ${salt - 1})")))
    sl.join(sr, Seq(key, "__salt")).drop("__salt")
  }
}
