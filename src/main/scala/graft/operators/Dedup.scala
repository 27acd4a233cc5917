package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{doc_fingerprint, minhash_text, shingle_hash_set, simhash_text, sorted_intersect_size}

/**
 * Deduplication operators for document corpora (SURVEY §2.3; the
 * training-data-pipeline extension surface).
 *
 * Scale design (100 TB):
 *  - exact dedup is one hash-shuffle on the dedup key; a fingerprint
 *    (64-bit) is shuffled instead of full text, so exchange volume is
 *    bytes-per-row, not document size.
 *  - minhash LSH shuffles (band, bandHash) pairs — b×rows keys, each a
 *    16-byte tuple; candidate verification joins only within buckets, so
 *    the quadratic blowup is confined to colliding buckets. Oversized
 *    buckets (degenerate content) are capped to bound worst-case skew.
 *  - simhash shuffles one long per (table, row); hamming verification is
 *    banded the same way (4×16-bit chunks ⇒ any pair within hamming
 *    distance 3 of 64 bits shares ≥1 exact chunk).
 *  - no driver-side collection anywhere.
 */
object Dedup {

  /** Tokenize: lowercase, split on non-alphanumerics, drop empties. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)

  /** Word w-shingles of the token array (w consecutive tokens joined). */
  def shingles(toks: Column, w: Int = 3): Column = {
    val idxs = sequence(lit(1), greatest(size(toks) - lit(w - 1), lit(1)))
    when(size(toks) < w, array(concat_ws(" ", toks)))
      .otherwise(transform(idxs, i => concat_ws(" ", slice(toks, i, lit(w)))))
  }

  /**
   * Exact dedup: deterministic keeper per duplicate group — the minimum id
   * wins (dropDuplicates keeps an arbitrary row; min-id is reproducible
   * and oracle-friendly). Returns the kept rows.
   */
  def exactByKey(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /**
   * Remove rows whose bucket key holds more than `maxBucket` members —
   * BEFORE any collect_list/self-join touches them. The oversized-key set
   * is tiny by definition (each key is huge), so it broadcasts; and the
   * counting aggregate shuffles on the same keys as the downstream bucket
   * aggregate, so the physical exchange is planned once and reused. This
   * ordering matters at scale: filtering on size AFTER collect_list still
   * materializes the degenerate bucket (all-empty-docs hash collisions →
   * one multi-GB group) in the aggregation buffer first.
   */
  private def dropOversizedBuckets(
      banded: DataFrame, keys: Seq[String], maxBucket: Int): DataFrame = {
    val big = banded.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBucket)
      .select(keys.map(col): _*)
    banded.join(broadcast(big), keys, "left_anti")
  }

  /** Exact content dedup via 64-bit fingerprint (case/space-folded) —
    * the scale path: groups by a long, never shuffles document text. */
  def exactByFingerprint(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val fp = df.withColumn("__fp", doc_fingerprint(col(textCol)))
    exactByKey(fp, Seq("__fp"), idCol).drop("__fp")
  }

  /**
   * MinHash-LSH near-duplicate candidate pairs.
   *
   * signature: k lanes (numHashes), banded into `bands` groups of k/bands
   * rows each; docs sharing any band bucket become candidates; candidates
   * are scored by estimated Jaccard = matching lanes / k. Pairs with
   * estJaccard ≥ threshold are returned as (id_a < id_b, est_jaccard).
   *
   * maxBucket caps degenerate buckets (e.g. empty docs) — a bucket with
   * more members than this is dropped (logged volume, bounded skew).
   */
  def minhashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.7,
      maxBucket: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands

    val sigs = df.select(
      col(idCol).as("id"),
      minhash_text(col(textCol), w = 3, k = numHashes).as("sig"))

    // explode into (band, bandHash, id); bandHash = hash of the band's lanes
    val banded = sigs.select(
      col("id"), col("sig"),
      explode(expr(
        s"transform(sequence(0, ${bands - 1}), " +
          s"b -> named_struct('band', b, 'bh', xxhash64(slice(sig, b * $rowsPerBand + 1, $rowsPerBand))))"))
        .as("bb"))
      .select(col("id"), col("sig"), col("bb.band").as("band"), col("bb.bh").as("bh"))

    // Oversized buckets (degenerate content — the skew/OOM guard) are
    // anti-joined out BEFORE aggregation (see dropOversizedBuckets); then
    // ONE shuffle builds the buckets, singleton buckets (no pairs) drop
    // with a plain size filter, and pairs are generated map-side within
    // each bucket (double posexplode, bounded by maxBucket²) and scored
    // before anything shuffles again — the pair-dedup exchange carries
    // only 24-byte (id, id, est) rows.
    val buckets = dropOversizedBuckets(banded, Seq("band", "bh"), maxBucket)
      .groupBy(col("band"), col("bh"))
      .agg(collect_list(struct(col("id"), col("sig"))).as("items"))
      .filter(size(col("items")) >= 2)

    val pairs = buckets
      .select(col("items"), posexplode(col("items")).as(Seq("pi", "a")))
      .select(col("pi"), col("a"), posexplode(col("items")).as(Seq("pj", "b")))
      .filter(col("pi") < col("pj"))
      .select(
        least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"),
        expr(s"size(filter(zip_with(a.sig, b.sig, (x, y) -> x = y), m -> m)) / cast($numHashes as double)")
          .as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)

    pairs
      .dropDuplicates("id_a", "id_b")
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Connected-component-free dedup from candidate pairs: every doc that
    * appears as the larger id of a qualifying pair is dropped (min-id
    * representative per near-dup set, computed distributively). */
  def minhashDedup(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.7): DataFrame = {
    val losers = minhashPairs(df, textCol, idCol, numHashes, bands, threshold)
      .select(col("id_b").as("__loser")).distinct()
    df.join(losers, df(idCol) === col("__loser"), "left_anti")
  }

  /**
   * SimHash near-duplicate pairs: 64-bit signature, banded into 4×16-bit
   * chunks; pairs sharing a chunk are verified by exact hamming distance.
   */
  def simhashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxHamming: Int = 3,
      maxBucket: Int = 1000): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), simhash_text(col(textCol)).as("sh"))
    val banded = sigs.select(col("id"), col("sh"),
      explode(expr(
        "transform(sequence(0, 3), b -> named_struct('band', b, 'chunk', (sh >> (b * 16)) & 65535))"))
        .as("bb"))
      .select(col("id"), col("sh"), col("bb.band").as("band"), col("bb.chunk").as("chunk"))

    // same guarded single-shuffle bucket shape as minhashPairs
    val buckets = dropOversizedBuckets(banded, Seq("band", "chunk"), maxBucket)
      .groupBy(col("band"), col("chunk"))
      .agg(collect_list(struct(col("id"), col("sh"))).as("items"))
      .filter(size(col("items")) >= 2)

    buckets
      .select(col("items"), posexplode(col("items")).as(Seq("pi", "a")))
      .select(col("pi"), col("a"), posexplode(col("items")).as(Seq("pj", "b")))
      .filter(col("pi") < col("pj"))
      .select(
        least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"),
        expr("bit_count(a.sh ^ b.sh)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Exact n-gram Jaccard between candidate pairs (verification-grade
    * similarity, usually applied after LSH candidate generation). */
  def ngramJaccard(
      df: DataFrame,
      textCol: String,
      idCol: String,
      pairs: DataFrame, // columns id_a, id_b
      w: Int = 3): DataFrame = {
    // The candidate set is evaluated ONCE (it is typically the output of
    // LSH banding — an expensive DAG; naive double-join would recompute it
    // per reference). Each pair explodes into two (id_a, id_b, id) rows
    // which are broadcast — post-LSH candidates are orders of magnitude
    // smaller than the corpus, so the corpus-side shingle sets stream
    // map-side with no shuffle. Shingle sets are sorted distinct 64-bit
    // hashes: 8 B/element payload and an O(n+m) merge-walk intersection
    // instead of string-array intersect.
    val side = pairs.select(col("id_a"), col("id_b"),
      explode(array(col("id_a"), col("id_b"))).as("id"))
    val sh = df.select(col(idCol).as("id"),
      shingle_hash_set(col(textCol), w).as("sh"))
    sh.join(broadcast(side), Seq("id"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(
        first(when(col("id") === col("id_a"), col("sh")), ignoreNulls = true).as("sh_x"),
        first(when(col("id") === col("id_b"), col("sh")), ignoreNulls = true).as("sh_y"))
      .filter(col("sh_x").isNotNull && col("sh_y").isNotNull) // id absent from df ⇒ drop pair (inner-join semantics)
      .withColumn("__inter", sorted_intersect_size(col("sh_x"), col("sh_y")))
      .withColumn("jaccard",
        col("__inter") / (size(col("sh_x")) + size(col("sh_y")) - col("__inter")).cast("double"))
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }
}
