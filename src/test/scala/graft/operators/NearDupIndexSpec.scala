package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NearDupIndexSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again today"),
    (2L, "a completely different document with other words in it now"),
    (3L, "yet another unrelated text about distributed query engines"),
    (4L, "sparkling parquet files hold columnar data very efficiently")
  ).toDF("doc_id", "text")

  test("build + append + indexed admission: copies rejected, novel admitted") {
    val dir = java.nio.file.Files.createTempDirectory("neardup-idx").toString
    NearDupIndex.writeIndex(corpus.filter($"doc_id" <= 2), "text", dir)
    NearDupIndex.appendSegment(corpus.filter($"doc_id" > 2), "text", dir, "batch=1")
    val probe = Seq(
      (101L, "the quick brown fox jumps over the lazy dog again today"), // copy of 1 (build seg)
      (104L, "sparkling parquet files hold columnar data very efficiently"), // copy of 4 (appended seg)
      (105L, "entirely novel content nothing shares any shingle with this")
    ).toDF("doc_id", "text")
    val admitted = NearDupIndex.admitNewIndexed(probe, "text", "doc_id", dir)
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == Set(105L), s"got $admitted")
  }

  test("uncommitted segment is invisible; replay re-commits idempotently") {
    val dir = java.nio.file.Files.createTempDirectory("neardup-torn").toString
    NearDupIndex.writeIndex(corpus.filter($"doc_id" <= 2), "text", dir)
    // segment lands but its marker is destroyed — crash between write
    // and commit; the serve must screen against the BUILD segment only
    NearDupIndex.appendSegment(corpus.filter($"doc_id" > 2), "text", dir, "batch=1")
    assert(new java.io.File(s"$dir/bands/batch=1/_GRAFT_COMMIT").delete())
    val probe = Seq(
      (104L, "sparkling parquet files hold columnar data very efficiently"))
      .toDF("doc_id", "text")
    val torn = NearDupIndex.admitNewIndexed(probe, "text", "doc_id", dir)
      .select("doc_id").as[Long].collect().toSet
    assert(torn == Set(104L), "uncommitted segment served")
    // replaying the append (same segment id) converges and commits
    NearDupIndex.appendSegment(corpus.filter($"doc_id" > 2), "text", dir, "batch=1")
    val after = NearDupIndex.admitNewIndexed(probe, "text", "doc_id", dir)
      .select("doc_id").as[Long].collect().toSet
    assert(after == Set.empty, "replayed segment not serving")
  }

  test("compactSegments distinct-merges to one segment; admission unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("neardup-cpt").toString
    NearDupIndex.writeIndex(corpus.filter($"doc_id" <= 2), "text", dir)
    NearDupIndex.appendSegment(corpus.filter($"doc_id" > 2), "text", dir, "batch=1")
    // overlapping keys across segments: re-append doc 1's text as a new
    // segment so the distinct-merge has real duplicates to drop
    NearDupIndex.appendSegment(corpus.filter($"doc_id" === 1), "text", dir, "batch=2")
    val probe = Seq(
      (101L, "the quick brown fox jumps over the lazy dog again today"),
      (104L, "sparkling parquet files hold columnar data very efficiently"),
      (105L, "entirely novel content nothing shares any shingle with this")
    ).toDF("doc_id", "text")
    val before = NearDupIndex.admitNewIndexed(probe, "text", "doc_id", dir)
      .select("doc_id").as[Long].collect().toSet
    assert(NearDupIndex.compactSegments(spark, dir) == 1)
    // sources physically reclaimed; one marked segment remains
    val segs = new java.io.File(s"$dir/bands").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).toSeq
    assert(segs.size == 1 && segs.head == "batch=1000000000000", s"got $segs")
    val after = NearDupIndex.admitNewIndexed(probe, "text", "doc_id", dir)
      .select("doc_id").as[Long].collect().toSet
    assert(after == before && after == Set(105L), s"before $before after $after")
    // re-compacting a compact index is a no-op
    assert(NearDupIndex.compactSegments(spark, dir) == 1)
  }

  test("admission bands through the index's own meta params") {
    val dir = java.nio.file.Files.createTempDirectory("neardup-meta").toString
    // non-default banding at build time; admitNewIndexed takes NO params
    NearDupIndex.writeIndex(corpus, "text", dir, numHashes = 32, bands = 16)
    assert(NearDupIndex.readMeta(spark, dir) == (32, 16))
    val probe = Seq(
      (101L, "the quick brown fox jumps over the lazy dog again today"))
      .toDF("doc_id", "text")
    // a copy must still be rejected — banding params came from meta, so
    // build and screen cannot have drifted
    val admitted = NearDupIndex.admitNewIndexed(probe, "text", "doc_id", dir)
      .collect()
    assert(admitted.isEmpty, "copy admitted: build/screen banding drifted")
  }
}
