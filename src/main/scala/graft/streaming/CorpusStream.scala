package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.TextAnalysis

/**
 * Streaming corpus ingest — the incremental twin of the batch
 * `pipeline_corpus` story: documents arrive as file micro-batches, are
 * quality-gated row-locally, and deduplicated on their content digest so
 * a document seen in any earlier micro-batch never enters the corpus
 * twice. CorpusStreamSpec pins parity with the equivalent batch pipeline
 * on the fixture.
 *
 * Scale notes: the quality gate and digest are stateless/row-local; only
 * the dedup keeps state — one 16-byte digest per admitted doc. That
 * state is deliberately NOT watermarked (corpus identity has no event
 * time: a duplicate arriving a month later must still be rejected), so
 * at 100 TB it lives in the RocksDB state store
 * ([[EventStreams.withRocksDBState]]) where it scales with executor
 * disk, not heap.
 */
object CorpusStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Streaming read of the documents table (file micro-batches). */
  def readDocuments(spark: SparkSession, sfDir: String): DataFrame =
    spark.readStream
      .schema(docSchema)
      .format("parquet")
      .option("pathGlobFilter", "documents.parquet")
      .load(sfDir)

  /**
   * Exactly-once streaming shard append — the foreachBatch recipe: each
   * micro-batch lands under `path/batch=<id>`, and because Structured
   * Streaming replays a failed batch with the SAME id (checkpointed
   * offsets) while `overwrite` makes the per-batch directory write
   * idempotent, a crash between write and commit cannot duplicate or
   * drop rows. Restarting against the same checkpoint with no new input
   * writes nothing. This is how the streaming ingest reaches durable
   * training shards.
   */
  def appendShards(
      streaming: DataFrame,
      path: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    streaming.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$path/batch=$batchId")
      }
      .start()

  /** Quality gate + digest + dedup. The admitted CORPUS (the digest
    * set) is identical on the streaming and batch paths; which doc_id
    * survives per digest is first-arrival in streaming and unspecified
    * in batch (`dropDuplicates` keeps an arbitrary row) — callers who
    * need a deterministic survivor run [[graft.operators.Dedup.exactByKey]]
    * (min-id) on the batch side instead. */
  def cleanIngest(docs: DataFrame): DataFrame =
    TextAnalysis.qualityMetrics(docs, "text")
      .filter(col("n_tokens") >= 10 &&
        col("punct_ratio") < 0.25 &&
        col("stopword_ratio") > 0.0)
      .withColumn("digest", md5(col("text")))
      // project BEFORE the stateful dedup: the streaming dedup operator's
      // state schema is resolved against its input, and a post-dedup
      // projection can fail attribute binding (observed on Spark 4.1)
      .select(col("doc_id"), col("digest"), col("n_tokens"))
      .dropDuplicates("digest")
}
