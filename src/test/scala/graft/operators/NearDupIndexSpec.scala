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

  test("admitDocsStream: screen-and-grow across batches, idempotent restart") {
    val base = java.nio.file.Files.createTempDirectory("neardup-stream").toString
    val in = s"$base/in"; val idx = s"$base/idx"
    val out = s"$base/out"; val ckpt = s"$base/ckpt"
    NearDupIndex.writeIndex(corpus.filter($"doc_id" <= 2), "text", idx)
    // batch 1: a copy of indexed doc 1 (reject) + novel doc 10 (admit)
    // batch 2: a copy of BATCH-1-admitted doc 10 (reject — only possible
    //          if batch 1's admitted keys joined the index) + novel 11
    val slices = Seq(
      Seq((101L, "the quick brown fox jumps over the lazy dog again today"),
        (10L, "novel content about streaming admission of new documents")),
      Seq((110L, "novel content about streaming admission of new documents"),
        (11L, "another genuinely fresh document with unshared shingles here")))
    slices.zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(s"$in/slice$i")
      new java.io.File(s"$in/slice$i").listFiles()
        .foreach(_.setLastModified(1000000L * (i + 1)))
    }
    def stream() = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
      .option("maxFilesPerTrigger", "1").parquet(s"$in/slice*")
    val q = NearDupIndex.admitDocsStream(stream(), "text", "doc_id", idx, out, ckpt)
    try q.processAllAvailable() finally q.stop()
    val admitted = spark.read.parquet(s"$out/batch=*")
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == Set(10L, 11L), s"got $admitted")
    // restart on the same checkpoint with no new input: nothing changes
    val q2 = NearDupIndex.admitDocsStream(stream(), "text", "doc_id", idx, out, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    val again = spark.read.parquet(s"$out/batch=*")
      .select("doc_id").as[Long].collect().toSet
    assert(again == admitted, "restart changed the admitted set")
    // the grown index serves batch admission too
    val probe = Seq((111L, "another genuinely fresh document with unshared shingles here"))
      .toDF("doc_id", "text")
    assert(NearDupIndex.admitNewIndexed(probe, "text", "doc_id", idx).isEmpty,
      "stream-appended segment not serving")
  }

  test("writeMeta: identical-params rebuild is a no-op, changed params fail loud") {
    val dir = java.nio.file.Files.createTempDirectory("neardup-remeta").toString
    NearDupIndex.writeIndex(corpus.filter($"doc_id" <= 2), "text", dir)
    // same params: rebuild converges (meta untouched, batch=0 overwritten)
    NearDupIndex.writeIndex(corpus.filter($"doc_id" <= 2), "text", dir)
    assert(NearDupIndex.readMeta(spark, dir) == ((64, 32, false)))
    // different params: would cross-band the existing segments — refuse
    val e = intercept[IllegalStateException] {
      NearDupIndex.writeIndex(corpus, "text", dir, numHashes = 32, bands = 16)
    }
    assert(e.getMessage.contains("cross-band"))
    assert(NearDupIndex.readMeta(spark, dir) == ((64, 32, false)), "meta clobbered")
  }

  test("compactSegments maxSegmentId protects replayable segments") {
    val dir = java.nio.file.Files.createTempDirectory("neardup-bound").toString
    NearDupIndex.writeIndex(corpus.filter($"doc_id" <= 1), "text", dir)
    NearDupIndex.appendSegment(corpus.filter($"doc_id" === 2), "text", dir, "batch=1")
    // batch=1000005 plays the part of a streaming segment whose batch is
    // not yet checkpoint-committed — compaction must not absorb it
    NearDupIndex.appendSegment(corpus.filter($"doc_id" > 2), "text", dir,
      "batch=1000005")
    assert(NearDupIndex.compactSegments(spark, dir, maxSegmentId = 1000004L) == 2)
    val segs = new java.io.File(s"$dir/bands").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).toSet
    assert(segs == Set("batch=1000005", "batch=1000000000000"), s"got $segs")
    // both the merged segment and the protected one still screen
    val probe = Seq(
      (101L, "the quick brown fox jumps over the lazy dog again today"),
      (104L, "sparkling parquet files hold columnar data very efficiently"),
      (105L, "entirely novel content nothing shares any shingle with this")
    ).toDF("doc_id", "text")
    val admitted = NearDupIndex.admitNewIndexed(probe, "text", "doc_id", dir)
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == Set(105L), s"got $admitted")
    // nothing compactable below the bound now (merged id > bound): no-op
    assert(NearDupIndex.compactSegments(spark, dir, maxSegmentId = 1000004L) == 2)
  }

  test("bounded compaction cycles converge back to ONE merged segment") {
    // an always-on stream means every compaction is bounded; merged
    // segments are never replayable, so each cycle must re-absorb the
    // previous cycle's output instead of stranding it forever
    val dir = java.nio.file.Files.createTempDirectory("neardup-cycles").toString
    NearDupIndex.writeIndex(corpus.filter($"doc_id" <= 1), "text", dir)
    NearDupIndex.appendSegment(corpus.filter($"doc_id" === 2), "text", dir, "batch=1")
    // cycle 1: bounded merge of {0, 1} → one merged segment
    assert(NearDupIndex.compactSegments(spark, dir, maxSegmentId = 1000000L) == 1)
    // new committed batches arrive, then cycle 2 under the same bound:
    // the merge set must include the cycle-1 merged segment
    NearDupIndex.appendSegment(corpus.filter($"doc_id" === 3), "text", dir, "batch=2")
    NearDupIndex.appendSegment(corpus.filter($"doc_id" === 4), "text", dir,
      "batch=1000005") // not yet checkpoint-committed — stays protected
    assert(NearDupIndex.compactSegments(spark, dir, maxSegmentId = 1000000L) == 2)
    val segs = new java.io.File(s"$dir/bands").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).toSet
    assert(segs == Set("batch=1000005", "batch=1000000000001"), s"got $segs")
    // everything merged or protected still screens
    val probe = Seq(
      (101L, "the quick brown fox jumps over the lazy dog again today"),
      (103L, "yet another unrelated text about distributed query engines"),
      (104L, "sparkling parquet files hold columnar data very efficiently"),
      (105L, "entirely novel content nothing shares any shingle with this")
    ).toDF("doc_id", "text")
    val admitted = NearDupIndex.admitNewIndexed(probe, "text", "doc_id", dir)
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == Set(105L), s"got $admitted")
  }

  test("reclaimSources=false defers deletion to vacuumIndexSegments") {
    val dir = java.nio.file.Files.createTempDirectory("neardup-vac").toString
    NearDupIndex.writeIndex(corpus.filter($"doc_id" <= 2), "text", dir)
    NearDupIndex.appendSegment(corpus.filter($"doc_id" > 2), "text", dir, "batch=1")
    assert(NearDupIndex.compactSegments(spark, dir, reclaimSources = false) == 1)
    // superseded data dirs survive (a racing serve keeps its file list)
    // but are un-committed (no marker → not served by a fresh listing)
    val dirs = new java.io.File(s"$dir/bands").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).toSet
    assert(dirs == Set("batch=0", "batch=1", "batch=1000000000000"), s"got $dirs")
    assert(!new java.io.File(s"$dir/bands/batch=0/_GRAFT_COMMIT").exists())
    val probe = Seq(
      (101L, "the quick brown fox jumps over the lazy dog again today"),
      (105L, "entirely novel content nothing shares any shingle with this")
    ).toDF("doc_id", "text")
    val admitted = NearDupIndex.admitNewIndexed(probe, "text", "doc_id", dir)
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == Set(105L), s"got $admitted")
    // vacuum reclaims exactly the two tombstoned ids, and only them
    assert(NearDupIndex.vacuumIndexSegments(spark, dir) == 2)
    val after = new java.io.File(s"$dir/bands").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).toSet
    assert(after == Set("batch=1000000000000"), s"got $after")
    assert(NearDupIndex.vacuumIndexSegments(spark, dir) == 0)
  }

  test("safeCompactionBound tracks the streaming checkpoint's commit log") {
    val base = java.nio.file.Files.createTempDirectory("neardup-safe").toString
    val in = s"$base/in"; val idx = s"$base/idx"
    val out = s"$base/out"; val ckpt = s"$base/ckpt"
    NearDupIndex.writeIndex(corpus.filter($"doc_id" <= 2), "text", idx)
    // before any stream: only pre-stream segments are compactable
    assert(NearDupIndex.safeCompactionBound(spark, ckpt) == 999999L)
    Seq((10L, "novel content about streaming admission of new documents"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$in/slice0")
    def stream() = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
      .option("maxFilesPerTrigger", "1").parquet(s"$in/slice*")
    val q = NearDupIndex.admitDocsStream(stream(), "text", "doc_id", idx, out, ckpt)
    try q.processAllAvailable() finally q.stop()
    // batch 0 committed → its segment (1000000 + 0) is now compactable
    assert(NearDupIndex.safeCompactionBound(spark, ckpt) == 1000000L)
    // a bounded compaction may absorb build + batch-0 segments: 2 → 1
    assert(NearDupIndex.compactSegments(spark, idx,
      maxSegmentId = NearDupIndex.safeCompactionBound(spark, ckpt)) == 1)
    // the grown, compacted index still rejects batch-0's own content
    val probe = Seq(
      (110L, "novel content about streaming admission of new documents"))
      .toDF("doc_id", "text")
    assert(NearDupIndex.admitNewIndexed(probe, "text", "doc_id", idx).isEmpty)
  }

  test("admission bands through the index's own meta params") {
    val dir = java.nio.file.Files.createTempDirectory("neardup-meta").toString
    // non-default banding at build time; admitNewIndexed takes NO params
    NearDupIndex.writeIndex(corpus, "text", dir, numHashes = 32, bands = 16)
    assert(NearDupIndex.readMeta(spark, dir) == ((32, 16, false)))
    val probe = Seq(
      (101L, "the quick brown fox jumps over the lazy dog again today"))
      .toDF("doc_id", "text")
    // a copy must still be rejected — banding params came from meta, so
    // build and screen cannot have drifted
    val admitted = NearDupIndex.admitNewIndexed(probe, "text", "doc_id", dir)
      .collect()
    assert(admitted.isEmpty, "copy admitted: build/screen banding drifted")
  }
  test("near-dup index maintenance lock: compaction racing a vacuum fails loud with the layout intact") {
    import graft.sources.v2.ShardLock
    val dir = java.nio.file.Files.createTempDirectory("neardup-lock").toString
    NearDupIndex.writeIndex(corpus.filter($"doc_id" <= 2), "text", dir)
    NearDupIndex.appendSegment(corpus.filter($"doc_id" > 2), "text", dir, "batch=1")
    val segsBefore = new java.io.File(s"$dir/bands").listFiles().map(_.getName).toSet

    val lockFile = new java.io.File(dir, ShardLock.FileName)
    val w = new java.io.PrintWriter(lockFile)
    w.println(s"vacuum-holder\t${System.currentTimeMillis()}"); w.close()
    intercept[ShardLock.LockHeldException] {
      NearDupIndex.compactSegments(spark, dir)
    }
    intercept[ShardLock.LockHeldException] {
      NearDupIndex.vacuumIndexSegments(spark, dir)
    }
    assert(new java.io.File(s"$dir/bands").listFiles().map(_.getName).toSet == segsBefore,
      "refused maintenance must not touch the segment layout")
    assert(lockFile.delete())

    // with the lock free, compaction proceeds and releases cleanly
    assert(NearDupIndex.compactSegments(spark, dir) == 1)
    assert(!lockFile.exists())
    graft.CacheScope.releaseAll()
  }
}
