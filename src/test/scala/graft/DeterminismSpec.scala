package graft

/** Retry/replay determinism: the queries whose semantics DEPEND on hashing,
  * sampling, salting or permutation must return bit-identical results when
  * re-executed — at 100 TB every one of these runs under task retries and
  * stage replays, and a nondeterministic member silently corrupts downstream
  * joins (the reason every "random" choice in the engine is a pure function
  * of (salt, id), never RNG state).
  */
class DeterminismSpec extends SparkSpec {

  private def runTwice(name: String): Unit = {
    val fn = SparkEntry.queries(name)
    def snap(): Seq[String] =
      fn(spark, sfDir).collect().map(_.toString).sorted.toSeq
    val a = snap()
    val b = snap()
    assert(a.nonEmpty, s"$name returned no rows at $sfDir")
    assert(a == b, s"$name is not re-execution deterministic")
  }

  Seq(
    "sample_stratified",   // hash-threshold sampling
    "sample_per_stratum",  // hash-ranked fixed-size cut
    "split_train_eval",    // salted-hash split accounting
    "epoch_shuffle",       // sharded permutation
    "skew_salted_join",    // retry-deterministic salt
    "mixture_rebalance",   // hash-threshold downsample
    "dedup_minhash",       // md5 signature + banding
    "kmeans_train",        // integer Lloyd trajectory
    "graph_influence",     // integer propagation
    "ann_int8_topk",       // quantized scoring + tie-broken top-k
    "ann_lsh_topk",        // md5-derived hyperplane buckets
    "contrastive_negatives", // hash-ranked fixed pool + salted md5 rank
    "dsir_select",         // hashed-bigram bucket weights + top-K cut
    "temperature_mixture", // isqrt quotas + hash-ranked members
    "rp_project",          // md5-derived sparse projection matrix
    "perceptron_train"     // integer weight trajectory
  ).foreach { q =>
    test(s"$q returns identical results when re-executed") { runTwice(q) }
  }
}
