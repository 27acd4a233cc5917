package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Key-tombstone segments — ONE implementation of the takedown record
 * shared by every doc/vec-keyed durable index ([[Retrieval]]'s BM25
 * postings, [[AnnIndex]]'s codes/vectors): a delete publishes a
 * marker-committed parquet of keys under `<dir>/tombstones/batch=<n>/`,
 * serve paths anti-join live tombstones out, and the artifact's
 * compaction MATERIALIZES the deletes and reclaims the absorbed
 * tombstone segments (safe direction only: a surviving tombstone can
 * only re-filter keys the materialized data no longer contains — a
 * no-op — never resurrect anything).
 *
 * Same discipline everywhere: the key frame is takedown-sized and is
 * JOINED, never collected; marker-last commit (a crash mid-write leaves
 * an uncommitted, invisible directory); fresh ids past every existing
 * directory (committed or not — an uncommitted leftover may be a
 * concurrent writer's in-flight segment and must not be overwritten);
 * re-using a deleted key for new content is undefined until a
 * compaction has materialized and reclaimed the tombstone.
 */
private[operators] object KeyTombstones {

  private val Marker = "_GRAFT_COMMIT"

  /** Publish one committed tombstone segment of the (single-column)
    * `keys` frame, stored under the canonical `keyCol` name. */
  def publish(
      spark: SparkSession, dir: String, keys: DataFrame, keyCol: String): Unit = {
    require(keys.columns.length == 1,
      s"keys must be a one-column frame, got ${keys.columns.mkString(",")}")
    val tombs = new Path(s"$dir/tombstones")
    val fs = tombs.getFileSystem(spark.sessionState.newHadoopConf())
    val existing = Option(fs.globStatus(new Path(tombs, "batch=*"))).toSeq.flatten
      .map(_.getPath.getName.stripPrefix("batch=")).filter(_.forall(_.isDigit))
      .map(_.toLong)
    val seg = new Path(tombs, s"batch=${existing.maxOption.getOrElse(-1L) + 1L}")
    keys.select(col(keys.columns.head).cast("long").as(keyCol)).distinct()
      .coalesce(1)
      .write.mode("overwrite").parquet(seg.toString)
    fs.create(new Path(seg, Marker), true).close()
  }

  /** Committed tombstone segment paths under `dir` (marker present). */
  def committed(fs: FileSystem, dir: String): Seq[String] =
    Option(fs.globStatus(new Path(s"$dir/tombstones/batch=*/$Marker")))
      .toSeq.flatten.map(_.getPath.getParent.toString)

  /** Anti-join `df` against the committed tombstones on `keyCol`. */
  def minus(
      spark: SparkSession, fs: FileSystem, dir: String,
      df: DataFrame, keyCol: String): DataFrame = {
    val t = committed(fs, dir)
    if (t.isEmpty) df
    else df.join(
      graft.sources.ParquetSchemaCache.read(spark, t: _*)
        .select(col(keyCol)).distinct(),
      Seq(keyCol), "left_anti")
  }

  /** Best-effort reclaim of the given tombstone segment paths — called
    * AFTER a compaction has materialized them into the data. */
  def reclaim(fs: FileSystem, paths: Seq[String]): Unit =
    paths.foreach(p => fs.delete(new Path(p), true))

  /** Drop the whole tombstone layout (full-rebuild semantics: the
    * rebuilt artifact indexes exactly what the caller passes). */
  def clear(fs: FileSystem, dir: String): Unit = {
    fs.delete(new Path(s"$dir/tombstones"), true); ()
  }
}
