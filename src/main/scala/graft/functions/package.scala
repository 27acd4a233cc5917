package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.CatalystBridge

/**
 * Column-level function surface of the engine — the analog of
 * `org.apache.spark.sql.functions` for graft's custom expressions.
 */
package object functions {

  private[graft] def expr(c: Column): Expression = CatalystBridge.expression(c)
  private[graft] def col(e: Expression): Column = CatalystBridge.column(e)

  /** gzip-decompress a binary column (reference T1). `maxBytes` bounds
    * the inflated size — strict mode throws past it, lenient nulls
    * (one hostile high-ratio payload must not kill an executor). */
  def gunzip(c: Column, failOnError: Boolean = true,
      maxBytes: Long = Long.MaxValue): Column =
    col(GzipDecompress(expr(c), failOnError, maxBytes))

  /** gzip-decompress + UTF-8 decode (reference T1+T2 fused). */
  def gunzip_string(c: Column, failOnError: Boolean = true,
      maxBytes: Long = Long.MaxValue): Column =
    col(GzipDecompressToString(expr(c), failOnError, maxBytes))

  /** gzip-compress a binary column (reference W1 ingest). */
  def gzip(c: Column): Column = col(GzipCompress(expr(c)))

  /** gzip-compress a string column's UTF-8 bytes. */
  def gzip_string(c: Column): Column = col(GzipCompressString(expr(c)))

  /** cosine similarity of two array<float> columns → double. */
  def cosine_similarity(a: Column, b: Column): Column =
    col(CosineSimilarity(expr(a), expr(b)))

  /** dot product of two array<float> columns → double. */
  def dot_product(a: Column, b: Column): Column =
    col(DotProduct(expr(a), expr(b)))

  /** L2 (euclidean) distance of two array<float> columns → double. */
  def l2_distance(a: Column, b: Column): Column =
    col(L2Distance(expr(a), expr(b)))

  /** index of the L2-nearest centroid in an array<array<float>> model
    * literal → int; ties take the lowest index (codegen'd k-means / PQ
    * assignment — the ANN corpus-scan kernel). */
  def argmin_l2(vec: Column, cents: Column): Column =
    col(ArgminL2(expr(vec), expr(cents)))

  /** distance to the L2-nearest centroid → double (seeding's d(x, C)). */
  def min_l2(vec: Column, cents: Column): Column =
    col(MinL2(expr(vec), expr(cents)))

  /** index of the max-inner-product centroid → int; ties take the lowest
    * index (IVF corpus-side cell routing). */
  def argmax_dot(vec: Column, cents: Column): Column =
    col(ArgmaxDot(expr(vec), expr(cents)))

  /** packed sign-bit LSH bucket id against an array<array<float>> plane
    * literal → long (codegen'd random-hyperplane bucketing). */
  def hyperplane_bucket(vec: Column, planes: Column): Column =
    col(HyperplaneBucket(expr(vec), expr(planes)))

  /** vec − cents[idx] (0-based) → array<float> (codegen'd IVF-PQ
    * residual projection). */
  def centroid_residual(vec: Column, cents: Column, idx: Column): Column =
    col(CentroidResidual(expr(vec), expr(cents), expr(idx)))

  /** k-lane minhash signature of an array<string> shingle column. */
  def minhash_signature(shingles: Column, k: Int = 64, seed: Long = 42L): Column =
    col(MinHashSignature(expr(shingles), k, seed))

  /** 64-bit simhash of an array<string> token column. */
  def simhash64(tokens: Column): Column = col(SimHash64(expr(tokens)))

  /** Fused tokenize→w-shingle→k-lane minhash over raw text (the scale
    * path: no token/shingle materialization; see TextHash.minhashText). */
  def minhash_text(
      text: Column, w: Int = 3, k: Int = 64, seed: Long = 42L,
      unicode: Boolean = false): Column =
    col(MinHashText(expr(text), w, k, seed, unicode))

  /** Fused tokenize→simhash over raw text. */
  def simhash_text(text: Column): Column = col(SimHashText(expr(text)))

  /** Sorted distinct w-shingle hash set of raw text (Jaccard verification). */
  def shingle_hash_set(text: Column, w: Int = 3, unicode: Boolean = false): Column =
    col(ShingleHashSet(expr(text), w, unicode))

  /** |a ∩ b| for two ascending-sorted array<long> columns. */
  def sorted_intersect_size(a: Column, b: Column): Column =
    col(SortedIntersectSize(expr(a), expr(b)))

  /** |a ∩ b| with Jaccard-threshold early exit: exact size when
    * J(a, b) ≥ tau is still reachable, −1 once it provably is not. */
  def sorted_intersect_ge(a: Column, b: Column, tau: Double): Column =
    col(SortedIntersectGe(expr(a), expr(b), tau))

  /** count of positions where two array<long> columns agree (minhash
    * signature lane matches — codegen'd, unlike a zip_with/filter HOF). */
  def lane_match_count(a: Column, b: Column): Column =
    col(LaneMatchCount(expr(a), expr(b)))

  /** Generator: the lazy i<j (min, max)-oriented id triangle of a
    * bucket's member-id array — pair enumeration without scoring
    * (see [[IdPairs]]). */
  def id_pairs(ids: Column): Column = col(IdPairs(expr(ids)))

  /** Generator: all in-bucket pairs with hamming ≤ maxHamming, from an
    * array<struct<id, sh>> bucket (simhash counterpart). */
  def hamming_qualifying_pairs(items: Column, maxHamming: Int): Column =
    col(HammingQualifyingPairs(expr(items), maxHamming))

  /** rolling-hash document fingerprint (case/whitespace-normalized). */
  def doc_fingerprint(text: Column): Column = col(DocFingerprint(expr(text)))

  /** one-pass text statistics struct (chars, ws/alnum tokens, token-length
    * sum, punctuation chars, stopword hits) — the fused kernel behind the
    * quality/token-count operators. */
  def text_stats(
      text: Column, stopwords: Seq[String] = Seq.empty,
      unicode: Boolean = false): Column =
    col(TextStats(expr(text), stopwords, unicode))

  /** language pick by marker-word profile (fused langId kernel). */
  def lang_id_pick(text: Column, markers: Seq[(String, Seq[String])]): Column =
    col(LangIdPick(expr(text), markers))

  /** Bounded top-k aggregate: per group, the k largest values descending
    * (k-element min-heap buffer ⇒ partial agg ships k doubles per group
    * per partition, unlike the shuffle-everything window-rank pattern). */
  /** one-pass PCA moments (n, Σx, upper-triangle Σxxᵀ) of an
    * array<float> column → flat array<double> (O(d²) buffer per
    * partition, never a per-row blowup). */
  def gram_moments(c: Column): Column =
    col(GramMoments(expr(c)).toAggregateExpression())

  /** centered projections of an array<float> vector onto k double
    * component rows → array<double> (the PCA reduce step). */
  def pca_project(vec: Column, mean: Column, comps: Column): Column =
    col(PcaProject(expr(vec), expr(mean), expr(comps)))

  /** ‖vec − mean‖² against an array<double> mean literal → double. */
  def centered_norm2(vec: Column, mean: Column): Column =
    col(CenteredNorm2(expr(vec), expr(mean)))

  def topk_doubles(c: Column, k: Int): Column =
    col(TopKDoubles(expr(c), k).toAggregateExpression())

  /** BPE token count of a text column under a trained rank-ordered merge
    * table (the apply side of Bpe.trainMerges; merges broadcast inside
    * the codegen'd expression). */
  def bpe_token_count(
      text: Column, merges: Seq[(String, String)],
      unicode: Boolean = false): Column =
    col(BpeTokenCount(expr(text), merges, unicode))

  /** Unigram-LM token count of a text column under a trained
    * (piece → micro-cost) vocabulary (the apply side of
    * Unigram.trainVocab; vocab broadcast inside the codegen'd kernel). */
  def unigram_token_count(
      text: Column, pieces: Seq[(String, Long)],
      maxPieceLen: Int, unkCostMicro: Long,
      unicode: Boolean = false): Column =
    col(UnigramTokenCount(expr(text), pieces, maxPieceLen, unkCostMicro, unicode))

  /** Viterbi segmentation of ONE word under a trained unigram
    * vocabulary → array<string> (the training E-step's expansion). */
  def unigram_segment(
      word: Column, pieces: Seq[(String, Long)],
      maxPieceLen: Int, unkCostMicro: Long): Column =
    col(UnigramSegment(expr(word), pieces, maxPieceLen, unkCostMicro))

  /** Probe a string column against a pre-built Bloom filter (row-local,
    * codegen'd; `false` definitive, `true` at the filter's FPP). */
  def bloom_might_contain(c: Column, bloom: org.apache.spark.util.sketch.BloomFilter): Column =
    col(BloomMightContain(expr(c), bloom))

  /** Token array of `text` under the house lexical contract — the fused
    * twin of the `Dedup.tokens`/`tokensUnicode` HOF columns (one
    * byte-walk, no regex, no interpreted filter; see [[TokensArray]]). */
  def tokens_array(text: Column, unicode: Boolean = false): Column =
    col(TokensArray(expr(text), unicode))

  /** `size(tokens(text))` without materializing the token strings —
    * for count-only consumers (content gates, zero-token filters). */
  def token_count(text: Column, unicode: Boolean = false): Column =
    col(TokenCount(expr(text), unicode))

  /** Fused span-removal rebuild: tokens of `text` outside every
    * `[s0, e0]` 1-based token interval of `ivs`, joined by ' ', plus the
    * total/kept token counts — struct<text_clean, n_tokens, n_kept>
    * (see [[RemoveSpans]]). */
  def remove_spans(text: Column, ivs: Column, unicode: Boolean = false): Column =
    col(RemoveSpans(expr(text), expr(ivs), unicode))

  /** Generator: one (pos, tok) row per token of `text` under the house
    * lexical contract — the fused twin of
    * `posexplode(Dedup.tokensMode(text, unicode))` (no regex, no
    * intermediate token array; see [[TokenRows]]). */
  def token_rows(text: Column, unicode: Boolean = false): Column =
    col(TokenRows(expr(text), unicode))

  /** Generator: one (prev, tok) bigram row per token of `text`, `bos`
    * as the first prev — the fused twin of Lm.docBigrams' per-row
    * transform+explode chain (see [[BigramRows]]). */
  def bigram_rows(text: Column, unicode: Boolean = false,
      bos: String = "<s>"): Column =
    col(BigramRows(expr(text), unicode, bos))

  /** Generator: one (pos, gh) row per full word n-gram of `text` —
    * gram-hash keys without the lead()-window/string-concat form, for
    * consumers that use grams only as join/count keys
    * (see [[GramHashRows]]). */
  def gram_hash_rows(text: Column, n: Int, unicode: Boolean = false): Column =
    col(GramHashRows(expr(text), n, unicode))
}
