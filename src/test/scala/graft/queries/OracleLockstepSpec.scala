package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/**
 * The house tokenizer (`Dedup.tokens`: lowercase, split on `[^a-z0-9]+`,
 * drop empties) is replicated VERBATIM inside ~20 DuckDB oracle strings —
 * that replication IS the cross-engine lockstep contract, and a future
 * tokenizer change that misses one copy would silently desync a subset
 * of oracles. This spec pins every copy: each `string_split_regex` in an
 * oracle must use one of the two sanctioned splits (the house tokenizer,
 * or the language-ID tokenizer with its Han-padding preprocessor), so a
 * partial edit fails here instead of surfacing as a driver hash-FAIL.
 */
class OracleLockstepSpec extends AnyFunSuite {

  test("every oracle tokenizer split uses a sanctioned pattern") {
    val splitCall = "(?i)string_split_regex|regexp_split_to_array".r
    // the sanctioned split character classes, as they appear inline
    // (the house class also appears in REGEXP_REPLACE normalizations —
    // only SPLIT calls are checked, by inspecting the text that follows
    // each call site)
    val housePat = "'[^a-z0-9]+'"
    val langidPat = "'[^\\p{L}0-9]+'"
    val wsPat = "'\\s+'" // text_stats' whitespace-token count (own contract)
    // the r15 unicode lexical contract (Dedup.tokensUnicode): token class
    // incl. marks + Nd, and statsRowUnicode's pinned ASCII ws class
    val uniPat = "'[^\\p{L}\\p{M}\\p{Nd}]+'"
    val wsUniPat = "'[ \\t\\n\\x0B\\f\\r]+'"
    graft.Queries.oracles.foreach { case (name, sql) =>
      splitCall.findAllMatchIn(sql).foreach { m =>
        val window = sql.substring(m.start, math.min(sql.length, m.start + 200))
        assert(window.contains(housePat) || window.contains(langidPat) ||
          window.contains(wsPat) || window.contains(uniPat) ||
          window.contains(wsUniPat),
          s"$name: a tokenizer split call drifted from the house/langid/" +
            s"unicode contract (see Dedup.tokens/tokensUnicode, langIdPick): $window")
      }
    }
  }

  test("langid/unicode oracles carry the Han-padding preprocessor next to each \\p{L} split") {
    graft.Queries.oracles.foreach { case (name, sql) =>
      // every \p{L}-class split (the langid tokenizer AND the r15
      // unicode contract) must ride with exactly one Han-padding
      // preprocessor — CJK single-char segmentation is part of both rules
      val nWide = sliding(sql, "'[^\\p{L}0-9]+'") +
        sliding(sql, "'[^\\p{L}\\p{M}\\p{Nd}]+'")
      val nHan = sliding(sql, "\\p{Han}")
      assert(nWide == nHan,
        s"$name: ${nWide} \\p{L}-class split(s) but $nHan Han-padding " +
          "preprocessor(s) — the CJK single-char segmentation must ride " +
          "with every copy of the langid/unicode tokenizers")
    }
  }

  /**
   * Verdict-twin oracles are constant-gated: the SQL side emits a pure
   * planted list (`doc_id % 100 = 0`, `+ 10000000`, …) with TRUE/FALSE
   * gates the Spark pipeline must reproduce. Those constants are
   * replicated in the Spark query bodies; an edit that moves one side's
   * modulus/shift (or a fixture regen that repurposes the planted id
   * range) would leave a verdict vacuously green or permanently red with
   * no error pointing at the drift. This table pins every verdict
   * oracle's sanctioned constants — changing either side forces a
   * deliberate, visible update here.
   */
  private val verdictContracts: Map[String, Seq[String]] = Map(
    "dedup_simhash_planted" -> Seq("doc_id % 100 = 0",
      "[10000000, 20000000, 30000000]", "TRUE AS twin_found"),
    "sim_topk_lsh_verdict" -> Seq("vec_id < 5", "range(1, 11)",
      "TRUE AS in_exact_top50"),
    "sim_topk_ivf_verdict" -> Seq("vec_id < 5", "range(1, 11)",
      "TRUE AS in_exact_top50"),
    "sim_topk_pq_verdict" -> Seq("vec_id < 5", "TRUE AS copy_found"),
    "sim_topk_ivfpq_verdict" -> Seq("vec_id < 5", "TRUE AS copy_found"),
    "sim_neardup_verdict" -> Seq("vec_id % 100 = 0", "vec_id + 10000000",
      "TRUE AS pair_found"),
    "sim_semantic_dedup_verdict" -> Seq("vec_id % 100 = 0",
      "vec_id + 10000000", "FALSE AS kept"),
    "corpus_increment_embed_verdict" -> Seq("vec_id % 2 = 1", "vec_id < 10",
      "FALSE AS admitted"),
    "dedup_minhash_keep_verdict" -> Seq("doc_id % 100 = 0",
      "doc_id + 10000000", "TRUE AS twin_removed"),
    "dedup_minhash_cc_verdict" -> Seq("doc_id % 100 = 0",
      "doc_id + 10000000", "TRUE AS twin_removed"),
    "corpus_increment_neardup_verdict" -> Seq("doc_id % 100 = 0",
      "doc_id + 10000000", "FALSE AS admitted"),
    "multimodal_neardup_verdict" -> Seq("doc_id % 100 = 0",
      "doc_id + 10000000", "TRUE AS pair_found"),
    "multimodal_dedup_perceptual_verdict" -> Seq("doc_id % 100 = 0",
      "doc_id + 10000000", "TRUE AS twin_removed", "TRUE AS original_kept"),
    "embed_kmeans_verdict" -> Seq("range(1, 4)", "TRUE AS cost_non_increasing",
      "TRUE AS clusters_le_k"),
    "embed_kmeans_par_verdict" -> Seq("range(1, 4)",
      "TRUE AS cost_non_increasing", "TRUE AS clusters_le_k"),
    "hardneg_shortfall" -> Seq("vec_id < 5", "CAST(10 AS BIGINT) AS n_returned",
      "CAST(0 AS BIGINT) AS shortfall", "TRUE AS overfetch_sufficient"),
    "decontaminate_bloom_verdict" -> Seq("doc_id % 97 = 0",
      "doc_id % 97 <> 0", "TRUE AS bloom_flagged"),
    // direct value oracle, but its PAIR LIST is a planted constant the
    // Spark side replicates — same drift risk, same pin
    "dedup_ngram_jaccard_verdict" -> Seq("doc_id % 20 = 0", "doc_id + 1"),
    "ann_append_drift" -> Seq("FALSE AS drifted", "TRUE AS append_ok",
      "SELECT 'skew', TRUE, TRUE"),
    "sim_topk_ivfpq_index_verdict" -> Seq("vec_id < 5", "TRUE AS served_equal"),
    "sim_topk_ivf_index_verdict" -> Seq("vec_id < 5", "TRUE AS served_equal"),
    // hybrid-from-artifacts: the (query 1..3 × rank 1..10) grid with both
    // serve paths pinned to their deterministic in-memory twins
    "text_hybrid_index_verdict" -> Seq("(1), (2), (3)", "(10)",
      "TRUE AS sparse_equal", "TRUE AS dense_equal"),
    "quality_logit_train" -> Seq("RANGE(1, 31)", "TRUE AS loss_non_increasing",
      "TRUE AS agreement_ok"),
    "embed_pca_verdict" -> Seq("range(0, 8)", "TRUE AS eig_nonneg",
      "TRUE AS basis_ok", "TRUE AS parseval_ok"),
    "quality_compress_verdict" -> Seq("STRLEN(text)",
      "TRUE AS roundtrip_ok", "TRUE AS double_better", "TRUE AS ratio_bounded"),
    "embed_rp_verdict" -> Seq("a.vec_id % 10 = 0", "TRUE AS mean_ratio_ok",
      "TRUE AS frac_ok", "TRUE AS norm_ok"),
    "sim_topk_ann_delete_verdict" -> Seq("vec_id < 5", "TRUE AS copy_found",
      "TRUE AS restored_equal", "TRUE AS tombstones_cleared"))

  test("every verdict-twin oracle carries its sanctioned planted-fixture constants") {
    val oracles = graft.Queries.oracles
    // completeness: a NEW verdict surface must register its contract here
    val verdictNames = oracles.keys.filter(n =>
      n.endsWith("_verdict") || n == "dedup_simhash_planted" ||
        n == "hardneg_shortfall" || n == "ann_append_drift" ||
        n == "quality_logit_train")
    verdictNames.foreach { n =>
      assert(verdictContracts.contains(n),
        s"$n: verdict oracle without a lockstep contract — add its planted " +
          "constants to OracleLockstepSpec.verdictContracts")
    }
    verdictContracts.foreach { case (name, needles) =>
      val sql = oracles.getOrElse(name,
        fail(s"$name: contract exists but oracle is gone — remove or rename"))
      needles.foreach { needle =>
        assert(sql.contains(needle),
          s"$name: oracle drifted from its sanctioned constant '$needle' — " +
            "update BOTH the Spark query and this contract together")
      }
    }
  }

  private def sliding(haystack: String, needle: String): Int =
    if (needle.isEmpty) 0
    else haystack.sliding(needle.length).count(_ == needle)
}
