package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * JSONL corpus ingest/export (SURVEY §2.3 source surface): newline-
 * delimited JSON is the lingua franca of raw LLM-pretraining corpora
 * (Common Crawl derivatives, instruction datasets, vendor drops), and
 * the operational reality of those feeds is that some fraction of lines
 * is malformed — truncated uploads, encoding damage, concatenated
 * records. The production contract this module pins:
 *
 *  - a corrupt line must not kill a 100 TB ingest job, AND
 *  - it must not be silently dropped — it lands in a QUARANTINE lane
 *    with the raw line preserved byte-for-byte for audit/repair.
 *
 * Spark-first shape: the JSON reader's PERMISSIVE mode with
 * `columnNameOfCorruptRecord` does the heavy lifting inside the scan
 * (codegen'd Jackson parse, no UDF, file-split parallel); this module
 * fixes the schema/flag contract so callers branch on `line_ok` instead
 * of re-deciding null-semantics at every call site.
 */
object JsonlCorpus {

  /** The documents-table line schema (matches `Tables.documents`). */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /**
   * Read a JSONL corpus with corrupt-line quarantine: well-formed lines
   * parse to typed columns with `line_ok = true`; malformed lines carry
   * the raw input verbatim in `_raw` (typed columns null,
   * `line_ok = false`). FAILFAST/DROPMALFORMED are deliberately not
   * options here — the first kills the job on one bad byte, the second
   * destroys the audit trail.
   *
   * Implementation note: this is a TEXT scan + `from_json` projection,
   * NOT `spark.read.json` with `columnNameOfCorruptRecord`. The JSON
   * scan path forbids queries whose referenced columns reduce to the
   * corrupt column alone (`QUERY_ONLY_CORRUPT_RECORD_COLUMN`) — and
   * "count the quarantined lines" is exactly such a query, so the most
   * natural audit aggregation would throw at the call site. The text
   * scan has no such restriction, splits/parallelizes identically, and
   * the Jackson parse runs in the projection instead of the reader.
   */
  def readQuarantined(
      spark: SparkSession,
      path: String,
      schema: StructType = docSchema): DataFrame = {
    validateSchema(schema)
    quarantineProject(spark.read.text(path), schema)
  }

  /** Streaming twin of [[readQuarantined]] — the continuous-ingest
    * shape: new JSONL shards land in `path`, each micro-batch parses
    * through the IDENTICAL projection (shared kernel, so the lanes
    * cannot drift from batch), and a malformed line quarantines instead
    * of poison-pilling the query. Combine with
    * `option("maxFilesPerTrigger", …)` on the session for admission
    * pacing and an exactly-once file sink downstream. */
  def readQuarantinedStream(
      spark: SparkSession,
      path: String,
      schema: StructType = docSchema): DataFrame = {
    validateSchema(schema)
    quarantineProject(spark.readStream.text(path), schema)
  }

  private val corrupt = "__graft_corrupt"

  /** Reject schemas claiming the reader's own columns — BEFORE the path
    * is even opened, so the caller sees the contract error, not a
    * reader error. */
  private def validateSchema(schema: StructType): Unit = {
    // every name the projection owns: the two output columns it adds
    // (_raw, line_ok), the corrupt-record scratch column, and the text
    // reader's `value` column a caller field would ambiguously shadow
    val reserved = Seq("_raw", "line_ok", "value", corrupt)
    val clash = schema.fieldNames.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"schema must not define reader-owned column(s): ${clash.mkString(", ")}")
  }

  /** The ONE quarantine projection both entry points share. */
  private def quarantineProject(lines: DataFrame, schema: StructType): DataFrame = {
    lines
      .select(col("value"), from_json(col("value"),
        schema.add(StructField(corrupt, StringType)),
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corrupt))
        .as("__j"))
      // empty / whitespace-only input makes from_json return a NULL
      // struct with a NULL corrupt column — corrupt.isNull alone would
      // classify such a line OK with every typed field null, silently
      // violating the "never silently dropped" contract. Requiring the
      // parsed struct itself be non-null closes that hole (a JSON `null`
      // literal line quarantines the same way).
      .withColumn("line_ok", col("__j").isNotNull && col(s"__j.$corrupt").isNull)
      .select(col("__j.*"), col("value"), col("line_ok"))
      .withColumn("_raw", when(!col("line_ok"), col("value")))
      .drop(corrupt, "value")
  }

  /** Export a corpus as JSONL shards — the interchange twin of
    * [[readQuarantined]] (Spark's JSON sink: one shard per partition,
    * scale-out writes). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
