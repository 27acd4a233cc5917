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

  /** Streaming read of the documents table (file micro-batches),
    * robust to BOTH fixture shapes. A flat file (the driver fixtures)
    * cannot be loaded directly — FileStreamSource requires a directory
    * basePath — so it streams via parent-dir + basename glob; a
    * DIRECTORY table (any Spark-written fixture, e.g. the scale probe's
    * generated corpus) streams by its own path, because the basename
    * glob would match ZERO of its part files and the stream would run
    * silently empty (the r13 BenchScale crash). */
  def readDocuments(spark: SparkSession, sfDir: String): DataFrame = {
    val table = new org.apache.hadoop.fs.Path(s"$sfDir/documents.parquet")
    val fs = table.getFileSystem(
      spark.sessionState.newHadoopConf())
    require(fs.exists(table), s"no documents table under $sfDir")
    val base = spark.readStream.schema(docSchema).format("parquet")
    if (fs.getFileStatus(table).isDirectory) base.load(table.toString)
    else base.option("pathGlobFilter", "documents.parquet").load(sfDir)
  }

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

  val embSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /**
   * Continuous semantic admission — the streaming face of
   * [[graft.operators.Similarity.admitNewEmbeddings]]: every micro-batch
   * is admitted against the STANDING corpus plus everything earlier
   * batches admitted (first-wins), then lands in its own per-batch shard
   * dir with the [[appendShards]] exactly-once recipe. Replay safety:
   * the "previously admitted" set reads only batch dirs with id < the
   * current batch id, so a replayed batch never rejects its own rows
   * from a half-written earlier attempt — `overwrite` + the id filter
   * make the whole step idempotent.
   *
   * Near-dups WITHIN one micro-batch are both admitted (the admission
   * check is against the standing set only — same contract as
   * first-pass ingest everywhere); a periodic
   * [[graft.operators.Similarity.semanticDedup]] compaction closes
   * that, exactly like batch pipelines re-dedup their accumulating
   * corpus.
   */
  def admitEmbeddingsStream(
      streaming: DataFrame,
      standing: DataFrame,
      path: String,
      checkpoint: String,
      threshold: Double = 0.95,
      nBits: Int = 8,
      dim: Int = 64): org.apache.spark.sql.streaming.StreamingQuery =
    streaming.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val sp = batch.sparkSession
        // list prior batch dirs through the Hadoop FileSystem (the
        // ShardSink/ShardReader pattern): java.io.File silently returns
        // nothing on hdfs://-s3a://-style paths, which would skip the
        // cross-batch dedup entirely — every batch re-admitted against
        // only the standing set, no error anywhere
        val fsPath = new org.apache.hadoop.fs.Path(path)
        val fs = fsPath.getFileSystem(sp.sparkContext.hadoopConfiguration)
        val priorDirs =
          (if (fs.exists(fsPath)) fs.listStatus(fsPath).toSeq else Seq.empty)
            .filter { st =>
              val n = st.getPath.getName
              st.isDirectory && n.startsWith("batch=") &&
                n.stripPrefix("batch=").toLong < batchId
            }
            .map(_.getPath.toString)
        val base = standing.select(col("vec_id"), col("embedding"))
        val existing =
          if (priorDirs.isEmpty) base
          else base.union(
            sp.read.schema(embSchema).parquet(priorDirs.toIndexedSeq: _*)
              .select(col("vec_id"), col("embedding")))
        graft.operators.Similarity
          .admitNewEmbeddings(batch, existing, "vec_id", "embedding",
            threshold, nBits, dim)
          .select(col("vec_id"), col("embedding"))
          .write.mode("overwrite").parquet(s"$path/batch=$batchId")
      }
      .start()

  /**
   * Continuous inverted-index maintenance — the streaming twin of
   * [[graft.operators.Retrieval.writeIndex]]: each micro-batch of newly
   * ingested documents lands its own posting + norm segment via
   * [[graft.operators.Retrieval.writeIndexSegment]], with the
   * [[appendShards]] exactly-once recipe (checkpointed batch ids +
   * idempotent per-segment overwrite). No standing segment is read or
   * merged — corpus docs are immutable append-only, so index
   * maintenance is pure segment append, and
   * [[graft.operators.Retrieval.searchIndex]] over the parent dir
   * serves the up-to-date union with df/corpus stats derived fresh at
   * serve time. CorpusStreamSpec pins bit-equality between serving the
   * streamed segments and a from-scratch batch index.
   *
   * The append-only contract is the CALLER's to uphold: a doc id
   * re-ingested in a later micro-batch lands in a second segment and
   * double-counts at serve time. Feed this from [[cleanIngest]] (whose
   * digest dedup drops cross-batch repeats) or an equivalent
   * first-wins admission stage.
   */
  def indexDocsStream(
      streaming: DataFrame,
      idCol: String,
      textCol: String,
      dir: String,
      checkpoint: String,
      unicode: Boolean = false): org.apache.spark.sql.streaming.StreamingQuery =
    streaming.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.operators.Retrieval.writeIndexSegment(
          batch, idCol, textCol, dir, s"batch=$batchId", unicode = unicode)
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
      // projection can fail attribute binding (observed on Spark 4.1).
      // `text` rides along — the scaladoc wiring
      // indexDocsStream(cleanIngest(...)) needs it, and dropping it here
      // made that documented composition fail analysis on every batch
      .select(col("doc_id"), col("digest"), col("n_tokens"), col("text"))
      .dropDuplicates("digest")

  /** Streaming twin of [[TextAnalysis.logitQuality]]'s keep-filter: the
    * classifier is a row-local codegen'd projection, so the same column
    * expressions run per micro-batch with zero state — scoring a
    * firehose costs exactly what the scan costs, and the batch/stream
    * verdicts are bit-identical (CorpusStreamSpec pins the parity). */
  def scoreQualityStream(
      docs: DataFrame,
      w: TextAnalysis.LogitWeights = TextAnalysis.LogitWeights()): DataFrame =
    TextAnalysis.logitQuality(docs, "doc_id", "text", w)
      .filter(col("keep"))

}
