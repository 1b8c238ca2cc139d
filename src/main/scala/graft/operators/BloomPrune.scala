package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, udf}

/** Bloom-filter join pruning: build a Bloom filter over the join keys of the
  * (already filtered) small side, broadcast it, and drop big-side rows that
  * cannot match BEFORE they reach the join's shuffle. Bloom filters have no
  * false negatives, so the subsequent exact join returns exactly the rows a
  * plain join would — the filter only cuts shuffle volume (by ~(1-sel-fpp)
  * of the big side), it never changes semantics.
  *
  * This is the explicit, deterministic form of what Spark's
  * `InjectRuntimeFilter` rule does adaptively when its thresholds trigger
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`); owning the operator
  * means the prune happens regardless of stats, and the sketch parameters
  * are chosen by the caller who knows the dim's cardinality.
  *
  * Scale notes (100 TB posture): the sketch is a few MiB for tens of
  * millions of keys (driver builds it with one job over the small side —
  * `stat.bloomFilter` aggregates partial sketches tree-wise), the broadcast
  * is that sketch, and the big side's scan → filter stays narrow. This is
  * the standard fact-table shuffle-saver when the dim is too large to
  * broadcast-hash-join but its KEY SET still fits a sketch.
  */
object BloomPrune {

  /** Prune `big` to rows whose `bigKey` might be present in `small`'s
    * `smallKey` set (integral keys). No false negatives: the result joined
    * against `small` is byte-identical to the unpruned join.
    */
  /** Build the sketch alone (one tree-aggregated job over the small side) —
    * split out so callers constructing plans repeatedly (audit/bench
    * tooling) can memoize it instead of re-running the job per construction.
    */
  def buildFilter(
      small: DataFrame,
      smallKey: String,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.03): org.apache.spark.util.sketch.BloomFilter =
    small.stat.bloomFilter(smallKey, expectedItems, fpp)

  /** Prune with a prebuilt sketch. */
  def prune(big: DataFrame, bigKey: String,
      bf: org.apache.spark.util.sketch.BloomFilter): DataFrame = {
    val bcast = big.sparkSession.sparkContext.broadcast(bf)
    val might = udf((k: java.lang.Long) => k != null && bcast.value.mightContainLong(k))
    big.where(might(col(bigKey)))
  }

  def pruneByBloom(
      big: DataFrame,
      bigKey: String,
      small: DataFrame,
      smallKey: String,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.03): DataFrame =
    prune(big, bigKey, buildFilter(small, smallKey, expectedItems, fpp))
}
