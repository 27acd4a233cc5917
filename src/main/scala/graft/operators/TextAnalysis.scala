package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.doc_fingerprint

/**
 * Text analysis operators for document corpora (SURVEY §2.3: language ID,
 * quality scoring, token counting, fingerprinting).
 *
 * Everything here is built-in expressions (codegen'd, no UDFs) except the
 * rolling-hash fingerprint, which is a custom codegen'd expression. All
 * operators are row-local (no shuffle) except the corpus-level token
 * frequency aggregate, which is one explode + hash-shuffle on token.
 */
object TextAnalysis {

  /** Whitespace token count (the cheap "how long is this doc" measure). */
  def tokenCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => length(t) > 0)).cast(LongType)

  /** BPE-ish subword count: alphanumeric runs + punctuation marks each
    * count as one token (approximates tokenizer length much better than
    * whitespace for code/punctuated text). */
  def subwordCount(text: Column): Column =
    size(filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)).cast(LongType) +
      length(regexp_replace(text, "[a-zA-Z0-9\\s]", "")).cast(LongType)

  /** Quality metrics: doc length, mean word length, punctuation ratio,
    * stopword ratio, uppercase ratio — the usual pretraining filters. */
  def qualityMetrics(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    // tokenize once into a column — inlining the (interpreted) HOF filter
    // into every metric would rerun the regex split ~7× per row
    val toks = col("__toks")
    val stopwords = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
    df.withColumn("__toks", filter(split(lower(t), "[^a-z0-9]+"), x => length(x) > 0))
      .withColumn("n_chars_m", length(t).cast(LongType))
      .withColumn("n_tokens", size(toks).cast(LongType))
      .withColumn("mean_word_len",
        when(size(toks) > 0,
          aggregate(toks, lit(0L), (acc, x) => acc + length(x)).cast(DoubleType)
            / size(toks))
          .otherwise(lit(0.0)))
      .withColumn("punct_ratio",
        when(length(t) > 0,
          length(regexp_replace(t, "[a-zA-Z0-9\\s]", "")).cast(DoubleType) / length(t))
          .otherwise(lit(0.0)))
      .withColumn("stopword_ratio",
        when(size(toks) > 0,
          size(filter(toks, x => x.isin(stopwords.map(lit(_)): _*))).cast(DoubleType)
            / size(toks))
          .otherwise(lit(0.0)))
      .drop("__toks")
  }

  /** Language ID: n-gram-free stopword-profile heuristic — score each
    * language by its marker-word hit count over the token set; ties break
    * alphabetically, zero hits → "und". Deterministic, SQL-free of UDFs. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "with", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "mit", "für", "nicht"),
    "es" -> Seq("el", "la", "los", "las", "es", "con", "para", "que"),
    "fr" -> Seq("le", "la", "les", "est", "avec", "pour", "que", "dans"),
    "zh" -> Seq("的", "是", "和", "在", "了", "有", "我", "不"))

  def langId(df: DataFrame, textCol: String): DataFrame = {
    // Tokenize ONCE into a real column, then score each language over it —
    // inlining the token expression into every marker filter would
    // re-evaluate the regex split per language per reference (the HOF
    // filters are interpreted, so Catalyst's codegen CSE can't rescue it).
    // array_max on struct(hits, negrank, lang): max hits; ties pick the
    // alphabetically-first language via the negated rank.
    val ranked = langMarkers.keys.toSeq.sorted.zipWithIndex.toMap
    val scoredRanked = langMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      struct(
        size(filter(col("__toks"), x => x.isin(markers.map(lit(_)): _*))).as("hits"),
        lit(-ranked(lang)).as("negrank"),
        lit(lang).as("lang"))
    }
    df.withColumn("__toks",
      filter(split(lower(col(textCol)), "[^\\p{L}0-9]+"), x => length(x) > 0))
      .withColumn("__best", array_max(array(scoredRanked: _*)))
      .withColumn("pred_lang",
        when(col("__best").getField("hits") <= 0, lit("und"))
          .otherwise(col("__best").getField("lang")))
      .drop("__toks", "__best")
  }

  /** 64-bit rolling-hash fingerprint column (custom expression). */
  def fingerprint(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("fp", doc_fingerprint(col(textCol)))

  /** Corpus token frequency: top-n tokens by count (explode + hash agg —
    * the one shuffling operator here; partial aggregation makes the
    * exchange carry only (token, count) pairs). */
  def tokenFrequency(df: DataFrame, textCol: String, topN: Int = 20): DataFrame =
    df.select(explode(filter(split(lower(col(textCol)), "[^a-z0-9]+"),
      x => length(x) > 0)).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(topN)
}
