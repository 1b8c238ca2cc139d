package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual skew mitigation for the
  * case AQE's runtime skew-join can't reach (AQE only splits sort-merge
  * partitions AFTER a first pass materializes the skewed shuffle files; a
  * known-hot key is cheaper to pre-salt, and streaming / non-AQE plans have
  * no runtime re-plan at all).
  *
  * Shape: the fact side gets a uniform salt in [0, salts); the dim side is
  * replicated once per salt value (explode of a literal range — rows × salts,
  * only acceptable because the dim side is the SMALL side); the join key
  * becomes (key, salt), so one hot key's rows spread over `salts` reducers
  * instead of stalling one. Result set is identical to the unsalted join —
  * every fact row still meets exactly one replica of its dim row.
  *
  * The salt must spread a single key's rows (so it cannot be a function of
  * the key alone) and must be DETERMINISTIC under task retry — a `rand()`
  * salt resamples on recompute, so a retried partition could meet a
  * different dim replica than the shuffle files already written (rows
  * double-counted or lost). Hashing the full fact row is retry-stable and
  * spreads a hot key's (non-identical) rows uniformly.
  */
object SaltedJoin {

  /** Inner equi-join of `fact` (big, possibly skewed on `key`) against
    * `dim` (small) on `key`, salted `salts` ways. Columns = fact.* ++ dim.*
    * minus dim's key (like a plain `join(dim, key)` with the key kept once).
    */
  def join(fact: DataFrame, dim: DataFrame, key: String, salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    val reserved = Seq("_salt")
    val clash = (fact.columns ++ dim.columns).intersect(reserved)
    require(clash.isEmpty, s"inputs already contain reserved column(s): ${clash.mkString(", ")}")
    // retry-deterministic uniform salt: hash of the full fact row
    val factRowHash: Column = hash(fact.columns.map(col): _*)
    val salted = fact.withColumn("_salt", pmod(factRowHash, lit(salts)))
    val replicated = dim
      .withColumn("_salt", explode(array((0 until salts).map(lit): _*)))
    salted
      .join(replicated, Seq(key, "_salt"))
      .drop("_salt")
  }
}
