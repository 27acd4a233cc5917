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
    val splitCall = "(?i)string_split_regex".r
    // the two sanctioned split character classes, as they appear inline
    // (the house class also appears in REGEXP_REPLACE normalizations —
    // only SPLIT calls are checked, by inspecting the text that follows
    // each call site)
    val housePat = "'[^a-z0-9]+'"
    val langidPat = "'[^\\p{L}0-9]+'"
    val wsPat = "'\\s+'" // text_stats' whitespace-token count (own contract)
    graft.Queries.oracles.foreach { case (name, sql) =>
      splitCall.findAllMatchIn(sql).foreach { m =>
        val window = sql.substring(m.start, math.min(sql.length, m.start + 160))
        assert(window.contains(housePat) || window.contains(langidPat) ||
          window.contains(wsPat),
          s"$name: a string_split_regex call drifted from the house/langid " +
            s"tokenizer contract (see Dedup.tokens / langIdPick): $window")
      }
    }
  }

  test("langid oracles carry the Han-padding preprocessor next to the \\p{L} split") {
    graft.Queries.oracles.foreach { case (name, sql) =>
      val nWide = sliding(sql, "'[^\\p{L}0-9]+'")
      val nHan = sliding(sql, "\\p{Han}")
      assert(nWide == nHan,
        s"$name: ${nWide} \\p{L} split(s) but $nHan Han-padding " +
          "preprocessor(s) — the CJK single-char segmentation must ride " +
          "with every language-ID tokenizer copy (langIdPick's rule)")
    }
  }

  private def sliding(haystack: String, needle: String): Int =
    if (needle.isEmpty) 0
    else haystack.sliding(needle.length).count(_ == needle)
}
