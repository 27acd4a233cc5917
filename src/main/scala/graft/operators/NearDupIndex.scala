package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Durable LSH band index — the persisted form of
 * [[Dedup.buildBandIndex]], and the near-dup analog of the segmented
 * BM25 index ([[Retrieval]]) and the durable ANN index ([[AnnIndex]]):
 * the (band, bucket-hash) keys a standing corpus occupies are written
 * ONCE as parquet segments, so every later ingest batch is near-dup
 * screened against 12-byte keys on disk — the standing corpus's text is
 * never re-shingled, never re-minhashed, and at 100 TB never even
 * co-located with the ingest cluster. This is the piece the in-memory
 * band index deliberately leaves out (its caller recomputes the index
 * per run): a nightly-ingest pipeline builds the index when the corpus
 * is built, appends a segment per admitted batch, and serves admission
 * from the index alone, forever.
 *
 * Layout and commit discipline (same contract as
 * [[Retrieval.CommitMarker]]'s append half):
 *
 *   dir/_GRAFT_NEARDUP_META        banding params, written once at build
 *   dir/bands/batch=<id>/…parquet  (band, bh) keys, sorted by (band, bh)
 *   dir/bands/batch=<id>/_GRAFT_COMMIT   marker-LAST = segment committed
 *
 * A segment write is idempotent (per-directory overwrite, marker last),
 * so a streaming appender replaying a micro-batch id converges; a serve
 * racing an append sees only committed segments. Params live in ONE
 * meta file and every reader bands through them — an admission screen
 * that banded differently from the build would silently admit
 * everything (zero collisions), which is why the params are not
 * arguments on the read path.
 *
 * Reference semantics: same collision curve as [[Dedup.minhashPairs]]
 * at equal (numHashes, bands); defaults tuned for recall like
 * [[Dedup.admitNewNearDup]] (an admission screen prefers a false
 * rejection — one lost doc — over a missed near-dup).
 */
object NearDupIndex {

  private[operators] val CommitMarker = "_GRAFT_COMMIT"
  private[operators] val MetaFile = "_GRAFT_NEARDUP_META"

  /** Id floor for compaction-merged segments. Streaming segments are
    * `idBase + batchId` (~10⁶ + batch) and build segments are 0, so
    * merged ids never collide with replayable ones — which is also why
    * [[compactSegments]] may ALWAYS re-absorb a merged segment
    * regardless of `maxSegmentId`: a merged segment is compaction
    * output, never a streaming batch, so no replay can rewrite it.
    * Without that carve-out each bounded compaction under an always-on
    * stream would add one more permanently-protected merged segment and
    * the file count compaction exists to bound would grow forever. */
  private[operators] val MergedIdFloor = 1000000000000L

  private def fsFor(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Meta is published by EXCLUSIVE CREATE of the final path exactly
    * once at build (`fs.create(…, overwrite = false)` — fails loud when
    * the file exists on every filesystem; a temp + rename publish is
    * NOT safe here because RawLocalFileSystem delegates rename to POSIX
    * rename, which silently overwrites, so two racing builds with
    * different params could both pass an exists() check and the loser's
    * rename would clobber the winner — banding the winner's segments
    * under the loser's params, the cross-banding failure the one-meta
    * design exists to prevent). An EXISTING meta is never deleted:
    * a re-build with IDENTICAL params is a no-op, a re-build with
    * DIFFERENT params fails loud — changing banding params requires a
    * fresh index directory, because existing segments were banded
    * under the old ones. A build that loses the create race re-reads
    * the winner's meta and applies the same identical/different rule. */
  private def writeMeta(
      spark: SparkSession, dir: String, numHashes: Int, bands: Int,
      unicode: Boolean): Unit = {
    import org.apache.hadoop.fs.Path
    val (fs, _) = fsFor(spark, dir)
    val meta = new Path(s"$dir/$MetaFile")
    def checkExisting(): Unit = {
      val existing = readMeta(spark, dir)
      if (existing == ((numHashes, bands, unicode))) return
      throw new IllegalStateException(
        s"near-dup index at $dir already built with params $existing; " +
          s"rebuilding with ($numHashes, $bands, unicode=$unicode) would " +
          "cross-band its segments — use a fresh directory")
    }
    if (fs.exists(meta)) { checkExisting(); return }
    val out = try fs.create(meta, false) catch {
      // lost the create race — the winner's params decide, same rule
      case _: java.io.IOException => checkExisting(); return
    }
    scala.util.Using.resource(out) { o =>
      o.write((s"numHashes=$numHashes\nbands=$bands\n" +
        s"unicode=${if (unicode) 1 else 0}\n").getBytes("UTF-8"))
    }
  }

  /** (numHashes, bands, unicode). `unicode` defaults to false when the
    * key is absent — pre-r15 indexes on disk were all ASCII-banded. */
  private[operators] def readMeta(
      spark: SparkSession, dir: String): (Int, Int, Boolean) = {
    val (fs, _) = fsFor(spark, dir)
    val meta = new org.apache.hadoop.fs.Path(s"$dir/$MetaFile")
    require(fs.exists(meta), s"no near-dup index meta under $dir")
    val kv = scala.util.Using.resource(fs.open(meta)) { in =>
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(_.nonEmpty)
        .map { l => val Array(k, v) = l.split("=", 2); (k, v.toInt) }.toMap
    }
    (kv("numHashes"), kv("bands"), kv.getOrElse("unicode", 0) == 1)
  }

  /** One committed band segment: the DISTINCT (band, bh) keys of `df`,
    * re-clustered by band hash so a serve's semi-join co-locates, and
    * idempotently replayable (overwrite + marker-last). `segment` is
    * `batch=<id>` — the streaming foreachBatch id or 0 for a build. */
  def writeIndexSegment(
      df: DataFrame,
      textCol: String,
      dir: String,
      segment: String,
      numHashes: Int,
      bands: Int,
      unicode: Boolean = false): Unit = {
    import org.apache.hadoop.fs.Path
    val spark = df.sparkSession
    val (fs, _) = fsFor(spark, dir)
    val segPath = new Path(s"$dir/bands/$segment")
    // un-commit first: a replay that fails mid-write must leave the
    // segment invisible, not half-new-half-old under a stale marker
    fs.delete(new Path(segPath, CommitMarker), false)
    Dedup.buildBandIndex(df, textCol, numHashes, bands, unicode)
      .repartition(col("band"), col("bh"))
      .sortWithinPartitions(col("band"), col("bh"))
      .write.mode("overwrite").parquet(segPath.toString)
    fs.create(new Path(segPath, CommitMarker), true).close()
  }

  /** Build the index: meta + one committed segment over the corpus. */
  def writeIndex(
      df: DataFrame,
      textCol: String,
      dir: String,
      numHashes: Int = 64,
      bands: Int = 32,
      unicode: Boolean = false): Unit = {
    writeMeta(df.sparkSession, dir, numHashes, bands, unicode)
    writeIndexSegment(df, textCol, dir, "batch=0", numHashes, bands, unicode)
  }

  /** Append a committed segment for an ingest batch, banding through
    * the INDEX's OWN params (read from meta — the one place they live). */
  def appendSegment(
      df: DataFrame,
      textCol: String,
      dir: String,
      segment: String): Unit = {
    val (numHashes, bands, unicode) = readMeta(df.sparkSession, dir)
    writeIndexSegment(df, textCol, dir, segment, numHashes, bands, unicode)
  }

  /** The committed segment paths a serve may read (marker present). */
  private def committedSegments(
      spark: SparkSession, dir: String): Seq[String] = {
    val (fs, _) = fsFor(spark, dir)
    fs.globStatus(
      new org.apache.hadoop.fs.Path(s"$dir/bands/batch=*/$CommitMarker"))
      .toSeq.map(_.getPath.getParent.toString)
  }

  /** Ids a committed marker names as superseded-by-compaction (one id
    * per line in the merged segment's marker; ordinary build/append
    * markers are empty). These are the only ids [[vacuumIndexSegments]]
    * may reclaim — an id never named in any marker may be an in-flight
    * append and is untouchable. */
  private def namedTombstones(
      fs: org.apache.hadoop.fs.FileSystem, dir: String): Seq[Long] =
    fs.globStatus(
      new org.apache.hadoop.fs.Path(s"$dir/bands/batch=*/$CommitMarker"))
      .toSeq.flatMap { st =>
        scala.util.Using.resource(fs.open(st.getPath)) { in =>
          scala.io.Source.fromInputStream(in, "UTF-8").getLines()
            .map(_.trim).filter(_.nonEmpty).map(_.toLong).toList
        }
      }.distinct

  /**
   * The highest streaming segment id [[compactSegments]] may safely
   * absorb while [[admitDocsStream]] can still replay: batches at or
   * below the checkpoint's last COMMITTED batch are never replayed, so
   * their index segments (id = `idBase` + batch) are compactable;
   * anything above may be re-run by a restart, and compacting a
   * replayable batch's segment makes the replay screen against its own
   * keys — it would reject every one of its own rows and overwrite its
   * output with EMPTY, silent permanent data loss (the un-commit-first
   * step in the foreachBatch can't help once the keys live in a merged
   * segment). Reads Spark's streaming commit log (`checkpoint/commits/
   * <batchId>`, the engine's own completed-batch record); with no
   * committed batch yet, only pre-stream segments (`id < idBase`) are
   * compactable.
   */
  def safeCompactionBound(
      spark: SparkSession, checkpoint: String, idBase: Long = 1000000L): Long = {
    val (fs, _) = fsFor(spark, s"$checkpoint/commits")
    val commits = fs.globStatus(
      new org.apache.hadoop.fs.Path(s"$checkpoint/commits/*"))
    val ids = Option(commits).toSeq.flatten
      .map(_.getPath.getName).filter(_.forall(_.isDigit)).map(_.toLong)
    if (ids.isEmpty) idBase - 1 else idBase + ids.max
  }

  /** Merge committed band segments into ONE distinct-keyed segment —
    * the housekeeping that bounds file count and drops the duplicate
    * (band, bh) keys append accumulates (a key two segments share is
    * stored twice but means once). Same protocol as
    * [[Retrieval.compactIndexSegments]]'s append half, simplified by
    * the semi-join serve semantics: the merged segment is written
    * UNMARKED under a fresh id, then one atomic publish step commits it
    * (its marker NAMES the absorbed ids — the tombstone record
    * [[vacuumIndexSegments]] reclaims from) and un-commits the sources
    * (marker deletes failing LOUD — an orphan with a live marker serves
    * duplicate keys, harmless for admission but re-inflating the file
    * count compaction exists to bound). A crash before the new marker
    * leaves the old set serving; after it, the next compaction or a
    * vacuum retries the reclaim.
    *
    * Replay safety (`maxSegmentId`): NEVER absorb a segment a streaming
    * replay could rewrite — pass
    * `maxSegmentId = safeCompactionBound(spark, checkpoint, idBase)`
    * whenever an [[admitDocsStream]] over this index is running or
    * restartable; see that method's contract for the data-loss mode
    * this prevents. The default (no bound) is only safe when every
    * writer is stopped AND checkpoint-committed.
    *
    * Zero-disruption serves: with `reclaimSources = true` (default) a
    * serve that listed segments just before the publish can race the
    * source deletion — FileNotFound on read, or with
    * `spark.sql.files.ignoreMissingFiles` a silently PARTIAL index,
    * which for an admission screen means missed keys = false
    * admissions (worse than a crash). Serving fleets that cannot retry
    * should pass `reclaimSources = false` and run
    * [[vacuumIndexSegments]] after a grace period longer than their
    * longest admission query.
    *
    * Single-maintainer discipline is STRUCTURAL: compaction and vacuum
    * take the index directory's [[graft.sources.v2.ShardLock]], so two
    * compactions (both claiming `max(ids)+1`) or a compaction racing a
    * vacuum fail loud with the layout intact. Appends stay lock-free
    * and race freely — an appended segment misses this merge and joins
    * the next. Returns the live segment count after compaction. */
  def compactSegments(
      spark: SparkSession,
      dir: String,
      reclaimSources: Boolean = true,
      maxSegmentId: Long = Long.MaxValue,
      leaseMs: Long = graft.sources.v2.ShardLock.DefaultLeaseMs): Int =
    graft.sources.v2.ShardLock.withLock(spark, dir, leaseMs) {
    import org.apache.hadoop.fs.Path
    val (fs, _) = fsFor(spark, dir)
    val segs = committedSegments(spark, dir)
    require(segs.nonEmpty, s"no committed near-dup index segments under $dir")
    val ids = segs.map(p => new Path(p).getName.stripPrefix("batch=").toLong)
    // merged segments (id >= MergedIdFloor) are compaction output, never
    // streaming-replayable, so they join the merge set regardless of the
    // bound — otherwise every bounded compaction cycle under an always-on
    // stream would strand one more permanently-protected merged segment
    val (mergeIds, protectedIds) =
      ids.partition(id => id <= maxSegmentId || id >= MergedIdFloor)
    if (mergeIds.size <= 1) return ids.size
    val newId = math.max(ids.max + 1, MergedIdFloor)
    val seg = s"$dir/bands/batch=$newId"
    val mergePaths = mergeIds.map(id => s"$dir/bands/batch=$id")
    graft.sources.ParquetSchemaCache.read(spark, mergePaths: _*)
      .select(col("band"), col("bh")).distinct()
      .repartition(col("band"), col("bh"))
      .sortWithinPartitions(col("band"), col("bh"))
      .write.mode("overwrite").parquet(seg)
    // tombstones = the ids being absorbed + previously-named ids whose
    // data still exists (bounded to ACTUAL orphans by the existence
    // probe, so the marker doesn't accumulate every id ever compacted)
    val orphansAlive = namedTombstones(fs, dir)
      .filter(id => fs.exists(new Path(s"$dir/bands/batch=$id")))
      .filterNot(mergeIds.contains)
    val tombstones = (mergeIds ++ orphansAlive).distinct.sorted
    val markerPath = new Path(seg, CommitMarker)
    val tmp = new Path(seg,
      s".$CommitMarker.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    scala.util.Using.resource(fs.create(tmp, true)) { out =>
      out.write(tombstones.mkString("", "\n", "\n").getBytes("UTF-8"))
    }
    if (!fs.rename(tmp, markerPath))
      throw new java.io.IOException(s"compact marker publish failed: $markerPath")
    tombstones.foreach { id =>
      val m = new Path(s"$dir/bands/batch=$id/$CommitMarker")
      if (!fs.delete(m, false) && fs.exists(m))
        throw new java.io.IOException(
          s"compaction could not un-commit near-dup segment $id ($m survives)")
      if (reclaimSources) fs.delete(new Path(s"$dir/bands/batch=$id"), true)
    }
    1 + protectedIds.size
    }

  /** Reclaim superseded segments deferred by
    * `compactSegments(…, reclaimSources = false)`: deletes the data
    * directories of every id NAMED in a committed marker's tombstone
    * list. Only named ids are touched — an uncommitted, un-named
    * directory may be an in-flight append and is left alone. Run after
    * a grace period longer than the serving fleet's longest admission
    * query, and under the same `maxSegmentId` discipline as compaction
    * (a correctly-bounded compaction never names a replayable id, so a
    * vacuum after it is replay-safe by construction). Takes the
    * index's maintenance lock, like compaction. Returns the
    * number of segment ids reclaimed. */
  def vacuumIndexSegments(spark: SparkSession, dir: String,
      leaseMs: Long = graft.sources.v2.ShardLock.DefaultLeaseMs): Int =
    graft.sources.v2.ShardLock.withLock(spark, dir, leaseMs) {
    import org.apache.hadoop.fs.Path
    val (fs, _) = fsFor(spark, dir)
    val dead = namedTombstones(fs, dir).sorted
      .filter(id => fs.exists(new Path(s"$dir/bands/batch=$id")))
    dead.foreach { id =>
      val m = new Path(s"$dir/bands/batch=$id/$CommitMarker")
      if (!fs.delete(m, false) && fs.exists(m))
        throw new java.io.IOException(
          s"vacuum could not un-commit superseded segment $id ($m survives)")
      fs.delete(new Path(s"$dir/bands/batch=$id"), true)
    }
    dead.size
    }

  /**
   * Continuous screen-and-grow ingest — the streaming face of the
   * durable index: every micro-batch is near-dup screened against the
   * STANDING index (build-time segments plus everything earlier batches
   * admitted), the admitted rows land under `outPath/batch=<id>` with
   * the exactly-once per-batch-overwrite recipe, and the admitted rows'
   * OWN band keys are appended as index segment `batch=<id + idBase>`
   * (marker-last, idempotent) so later batches screen against them.
   * Replay safety: the batch's OWN index segment is un-committed FIRST
   * — a replay would otherwise screen against the keys it admitted on
   * the failed attempt and reject every one of its own rows — then the
   * screen sees exactly the pre-batch standing set and both writes
   * converge. Near-dups WITHIN one micro-batch are all admitted
   * (admission screens against the standing set only, the
   * [[graft.streaming.CorpusStream.admitEmbeddingsStream]] contract).
   *
   * Housekeeping: periodic [[compactSegments]] bounds the segment
   * count, but while this stream runs (or could be restarted) it MUST
   * be bounded by [[safeCompactionBound]] — compacting a segment whose
   * batch is committed in the index but not yet in the streaming
   * checkpoint hands the replay its own keys and it rejects every one
   * of its own rows (see [[compactSegments]]'s replay-safety contract).
   */
  def admitDocsStream(
      streaming: DataFrame,
      textCol: String,
      idCol: String,
      indexDir: String,
      outPath: String,
      checkpoint: String,
      idBase: Long = 1000000L): org.apache.spark.sql.streaming.StreamingQuery =
    streaming.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val sp = batch.sparkSession
        // un-commit this batch's own segment from any prior half-run
        // BEFORE screening (see the replay-safety contract above)
        val own = new org.apache.hadoop.fs.Path(
          s"$indexDir/bands/batch=${idBase + batchId}/$CommitMarker")
        own.getFileSystem(sp.sessionState.newHadoopConf()).delete(own, false)
        val admitted = admitNewIndexed(batch, textCol, idCol, indexDir)
        admitted.write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        // appending AFTER the data write: a crash between the two means
        // the replay re-screens against the same standing set and
        // idempotently overwrites both. Band keys come from the JUST-
        // WRITTEN parquet, not the lazy `admitted` plan — re-executing
        // that plan would pay the whole screen (re-minhash + semi-join
        // against every standing segment) a second time per micro-batch
        appendSegment(sp.read.parquet(s"$outPath/batch=$batchId"),
          textCol, indexDir, s"batch=${idBase + batchId}")
      }
      .start()

  /** Indexed near-dup admission — [[Dedup.admitNewNearDup]] served from
    * the DURABLE index: an incoming doc is dropped iff any of its band
    * buckets exists in any committed segment. The incoming batch ships
    * (id, band, bh) — never text — into a left-semi join against the
    * on-disk keys; survivors anti-join back by id. Duplicate keys
    * across segments are harmless under semi-join semantics (a
    * compaction that distinct-merges segments is pure housekeeping). */
  def admitNewIndexed(
      incoming: DataFrame,
      textCol: String,
      idCol: String,
      dir: String): DataFrame = {
    val spark = incoming.sparkSession
    val (numHashes, bands, unicode) = readMeta(spark, dir)
    val segs = committedSegments(spark, dir)
    require(segs.nonEmpty, s"no committed near-dup index segments under $dir")
    val index = graft.sources.ParquetSchemaCache.read(spark, segs: _*)
      .select(col("band"), col("bh"))
    val hits = Dedup.bandKeys(incoming, textCol, idCol, numHashes, bands, unicode)
      .join(index, Seq("band", "bh"), "left_semi")
      .select(col("id")).distinct()
    incoming.join(hits, incoming(idCol) === hits("id"), "left_anti")
  }
}
