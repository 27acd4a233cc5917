package graft

import org.apache.spark.sql.functions._

/**
 * Deterministic cache footprint: every operator-internal persist goes
 * through [[CacheScope]], so after a harness sweep + release, the
 * session retains NO new persistent RDDs — the storage budget of a
 * long-lived session is flat, not "whatever block-manager LRU kept".
 */
class CacheScopeSpec extends SparkSpec {

  test("sweep of every cache-scoped operator releases to a clean block manager") {
    // snapshot first: other suites in this shared session may hold their
    // own (self-managed) caches; this spec asserts no NEW retention
    CacheScope.releaseAll(blocking = true)
    val before = spark.sparkContext.getPersistentRDDs.keySet

    // one query per cache-scoped site: jaccardJoin (Dedup ×2),
    // collocations (Ngrams), pairRules (Assoc), rollingActive (Temporal),
    // ivfPqTopK (Similarity), plus the CC family whose final-round
    // label caches are ADOPTED into the scope (pre-fix they leaked one
    // |V|-row cache per invocation, unreleasable by callers) — and the
    // r10 scoped sites: ngramJaccard's candidate set, both durable-serve
    // probe frames (searchIvfPq/searchIvf), trainLogit's feature frame,
    // and Lm.trainBigram's bigram-count table (quality_lm_score) — and
    // the r12 scoped site: Dsir.trainHashed's ≤buckets-row count table
    // (select_dsir_hashed; uncached it re-ran the full corpus tokenize
    // per consumer, the r10 verdict's perf finding)
    val names = Seq("dedup_jaccard_join", "text_collocations", "assoc_rules",
      "rolling_active", "sim_topk_ivfpq", "dedup_groups_cc",
      "dedup_groups_cc_stars", "dedup_ngram_jaccard",
      "sim_topk_ivfpq_index_verdict", "sim_topk_ivf_index_verdict",
      "quality_logit_train", "quality_lm_score", "select_dsir_hashed")
    names.foreach { n =>
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    assert(CacheScope.retainedCount >= 10,
      s"expected every scoped cache registered, got ${CacheScope.retainedCount}")

    CacheScope.releaseAll(blocking = true)
    assert(CacheScope.retainedCount == 0)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"persistent RDDs leaked past release: $leaked")
  }

  test("releaseAll on an empty registry is a no-op; results stay correct after release") {
    CacheScope.releaseAll() // no registered caches — must not throw
    // correctness is cache-independent: same result before/after release
    val r1 = SparkEntry.queries("assoc_rules")(spark, sfDir).collect().toSeq
    CacheScope.releaseAll(blocking = true)
    val r2 = SparkEntry.queries("assoc_rules")(spark, sfDir).collect().toSeq
    CacheScope.releaseAll(blocking = true)
    assert(r1 == r2)
  }
}
