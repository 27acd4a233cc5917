package graft.sources

import org.apache.spark.sql.functions._

import graft.sources.v2.ShardReader

import graft.SparkSpec

class ShardSinkSpec extends SparkSpec {
  import spark.implicits._

  test("V2 shard sink: two-phase commit, manifest counts, JSONL round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shard-sink").toString
    val df = Seq(
      (1L, "plain text", 1.5, true),
      (2L, "quote \" backslash \\ newline \n tab \t done", 2.0, false),
      (3L, null.asInstanceOf[String], 0.25, true)
    ).toDF("doc_id", "text", "score", "keep").repartition(2)

    df.write.format("graft.sources.v2.ShardSink")
      .option("path", dir).mode("append").save()

    val root = new java.io.File(dir)
    val shards = root.listFiles().filter(_.getName.endsWith(".jsonl"))
    assert(shards.length == 2, s"one shard per task: ${root.listFiles().toSeq}")
    // staging fully cleaned after job commit — nothing half-visible
    assert(!root.listFiles().exists(_.getName.startsWith("_staging")),
      "staging must not survive a committed job")
    // manifest lists every shard with its row count
    val manifest = scala.io.Source.fromFile(s"$dir/_MANIFEST").getLines()
      .map(_.split("\t")).map(a => a(0) -> a(1).toLong).toMap
    assert(manifest.keySet == shards.map(_.getName).toSet)
    assert(manifest.values.sum == 3L)

    // round-trip through a standard JSON reader: values identical,
    // including escapes and the null field
    val back = spark.read.json(s"$dir/*.jsonl")
      .select(col("doc_id").cast("long"), col("text"),
        col("score").cast("double"), col("keep").cast("boolean"))
    assert(back.count() == 3)
    val orig = df.collect().map(r =>
      (r.getLong(0), Option(r.getString(1)), r.getDouble(2), r.getBoolean(3))).toSet
    val got = back.collect().map(r =>
      (r.getLong(0), Option(r.getString(1)), r.getDouble(2), r.getBoolean(3))).toSet
    assert(got == orig, s"round-trip diverged:\n$got\nvs\n$orig")
  }

  test("V2 shard sink: second append job MERGES the manifest, not replaces it") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shard-append").toString
    def write(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").repartition(1)
        .write.format("graft.sources.v2.ShardSink")
        .option("path", dir).mode("append").save()

    write(Seq((1L, "first job a"), (2L, "first job b")))
    write(Seq((3L, "second job")))

    val root = new java.io.File(dir)
    val shards = root.listFiles().filter(_.getName.endsWith(".jsonl"))
    assert(shards.length == 2, s"one shard per job: ${root.listFiles().toSeq}")
    // the manifest must still publish the FIRST job's shard — a reader
    // that trusts only the manifest sees both jobs' rows
    val manifest = scala.io.Source.fromFile(s"$dir/_MANIFEST").getLines()
      .filter(_.nonEmpty).map(_.split("\t")).map(a => a(0) -> a(1).toLong).toMap
    assert(manifest.keySet == shards.map(_.getName).toSet,
      s"manifest lost shards across appends: ${manifest.keySet}")
    assert(manifest.values.sum == 3L)
    val manifested = manifest.keys.map(n => s"$dir/$n").toSeq
    assert(spark.read.json(manifested: _*).count() == 3L)
  }

  test("manifest publish is staged (no torn in-place rewrite); corruption fails fast, not laundered") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shard-atomic").toString
    def write(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").repartition(1)
        .write.format("graft.sources.v2.ShardSink")
        .option("path", dir).mode("append").save()

    write(Seq((1L, "a")))
    write(Seq((2L, "b")))
    // staged-rename publication: the temp file never survives a commit
    val leftovers = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("_MANIFEST."))
    assert(leftovers.isEmpty, s"staged manifest left behind: ${leftovers.toSeq}")

    // plant a torn line (the crash artifact the staged rename prevents;
    // simulate external corruption): the NEXT commit must refuse to
    // merge it — strict parse — rather than copy it into every future
    // manifest generation
    val mf = new java.io.File(dir, "_MANIFEST")
    val orig = scala.io.Source.fromFile(mf).mkString
    java.nio.file.Files.writeString(mf.toPath, orig + "torn-line-no-tab")
    // drop the local-FS checksum sidecar: we're simulating corruption of
    // the manifest CONTENT (e.g. a torn write on a store without CRCs),
    // not a checksum mismatch
    new java.io.File(dir, "._MANIFEST.crc").delete()
    val e = intercept[Exception] { write(Seq((3L, "c"))) }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(_.contains("malformed manifest")), chain(e).toString)
    // and the reader refuses the corrupt table too, with the same error
    val e2 = intercept[Exception] {
      ShardReader.read(spark, dir,
        Seq((0L, "")).toDF("doc_id", "text").schema).collect()
    }
    assert(chain(e2).exists(_.contains("malformed manifest")), chain(e2).toString)
  }

  test("ShardReader sees ONLY manifested shards: orphans and staging leftovers are invisible") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shard-read").toString
    def write(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").repartition(1)
        .write.format("graft.sources.v2.ShardSink")
        .option("path", dir).mode("append").save()
    write(Seq((1L, "alpha"), (2L, "beta")))
    write(Seq((3L, "gamma")))
    // simulate a job that crashed between renames: an orphan shard that
    // exists on disk but was never published in the manifest...
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(dir, "part-99999-deadbeef.jsonl"),
      "{\"doc_id\":666,\"text\":\"orphan\"}\n")
    // ...and an in-flight job's staging leftovers
    val staging = java.nio.file.Path.of(dir, "_staging-crashed")
    java.nio.file.Files.createDirectory(staging)
    java.nio.file.Files.writeString(staging.resolve("part-00000-ffff.jsonl"),
      "{\"doc_id\":777,\"text\":\"staged\"}\n")

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val got = ShardReader.read(spark, dir, schema)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")),
      s"reader leaked unpublished shards: $got")
    assert(ShardReader.manifestRowCount(spark, dir) == 3L)
    // a naive directory read WOULD see the orphan — that's the contrast
    // this reader exists for
    val naive = spark.read.schema(schema).json(dir).count()
    assert(naive == 4L, s"fixture broken: naive read saw $naive rows")
  }

  test("ShardCompact: consolidates shards atomically; rows identical; re-run is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shard-compact").toString
    def write(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").repartition(1)
        .write.format("graft.sources.v2.ShardSink")
        .option("path", dir).mode("append").save()
    write(Seq((1L, "a"), (2L, "b")))
    write(Seq((3L, "c")))
    write(Seq((4L, "d"), (5L, "e")))
    val schema = Seq((0L, "")).toDF("doc_id", "text").schema
    val before = graft.sources.v2.ShardReader.read(spark, dir, schema)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(before.size == 5)

    val n = graft.sources.v2.ShardCompact.compact(spark, dir, schema, targetShards = 1)
    assert(n == 1)
    val after = graft.sources.v2.ShardReader.read(spark, dir, schema)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(after == before)
    // old shards are gone, exactly one remains, manifest row count holds
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".jsonl"))
    assert(files.length == 1, files.toSeq.toString)
    assert(graft.sources.v2.ShardReader.manifestRowCount(spark, dir) == 5L)
    // no scratch leftovers; re-compacting a compact table is a no-op
    assert(!new java.io.File(dir).listFiles().exists(_.getName.startsWith("_compact-")))
    assert(graft.sources.v2.ShardCompact.compact(spark, dir, schema, targetShards = 1) == 1)
    // an append AFTER compaction merges cleanly with the new manifest
    write(Seq((6L, "f")))
    assert(graft.sources.v2.ShardReader.read(spark, dir, schema).count() == 6L)
  }

  test("V2 shard sink: unsupported nested schema is rejected at plan time") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shard-bad").toString
    val df = Seq((1L, Seq(1, 2))).toDF("id", "xs")
    val e = intercept[Exception] {
      df.write.format("graft.sources.v2.ShardSink")
        .option("path", dir).mode("append").save()
    }
    assert(e.getMessage.contains("unsupported type") ||
      Option(e.getCause).exists(_.getMessage.contains("unsupported type")))
  }

  test("ShardDelete: copy-on-write keyed delete rewrites ONLY hit shards") {
    import graft.sources.v2.ShardDelete
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val dir = java.nio.file.Files.createTempDirectory("graft-shard-del").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def append(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1)
        .write.format("graft.sources.v2.ShardSink")
        .option("path", dir).mode("append").save()
    append(Seq((1L, "one"), (2L, "two"), (3L, "three")))   // shard A
    append(Seq((10L, "ten"), (11L, "eleven")))             // shard B (untouched)
    append(Seq((20L, "twenty"), (21L, "twentyone")))       // shard C
    val mfBefore = scala.io.Source.fromFile(s"$dir/_MANIFEST").getLines().toSeq
    val untouched = mfBefore.map(_.split("\t")(0)).find { n =>
      scala.io.Source.fromFile(s"$dir/$n").getLines().exists(_.contains("eleven"))
    }.get

    // delete keys hitting shards A and C (key 999 matches nothing)
    val deleted = ShardDelete.deleteByKey(spark, dir, schema, "doc_id",
      Seq(2L, 21L, 999L).toDF("k"))
    assert(deleted == 2L, s"got $deleted")
    val back = ShardReader.read(spark, dir, schema)
      .select("doc_id").as[Long].collect().toSet
    assert(back == Set(1L, 3L, 10L, 11L, 20L), s"got $back")
    // the untouched shard kept its manifest entry (same file, not rewritten)
    val mfAfter = scala.io.Source.fromFile(s"$dir/_MANIFEST").getLines().toSeq
    assert(mfAfter.exists(_.startsWith(untouched + "\t")),
      s"untouched shard $untouched was rewritten: $mfAfter")
    // manifest row counts stay truthful
    assert(ShardReader.manifestRowCount(spark, dir) == 5L)
    // no scratch residue
    assert(!new java.io.File(dir).listFiles().exists(_.getName.startsWith("_delete-")))

    // re-run with the same keys: converged, a no-op
    assert(ShardDelete.deleteByKey(spark, dir, schema, "doc_id",
      Seq(2L, 21L, 999L).toDF("k")) == 0L)
    // no-match delete: manifest byte-identical
    val mf1 = scala.io.Source.fromFile(s"$dir/_MANIFEST").mkString
    assert(ShardDelete.deleteByKey(spark, dir, schema, "doc_id",
      Seq(12345L).toDF("k")) == 0L)
    assert(scala.io.Source.fromFile(s"$dir/_MANIFEST").mkString == mf1)
  }

  test("ShardDelete.upsertByKey: replaces matches, inserts new keys, heals multi-copies, only hit shards rewritten") {
    import graft.sources.v2.ShardDelete
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val dir = java.nio.file.Files.createTempDirectory("graft-shard-up").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def append(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1)
        .write.format("graft.sources.v2.ShardSink")
        .option("path", dir).mode("append").save()
    append(Seq((1L, "one"), (2L, "two")))      // shard A (hit via 2)
    append(Seq((10L, "ten"), (11L, "eleven"))) // shard B (untouched)
    append(Seq((2L, "two-again"), (20L, "twenty"))) // shard C — historical copy of 2
    val mfBefore = scala.io.Source.fromFile(s"$dir/_MANIFEST").getLines().toSeq
    val untouched = mfBefore.map(_.split("\t")(0)).find { n =>
      scala.io.Source.fromFile(s"$dir/$n").getLines().exists(_.contains("eleven"))
    }.get

    // update key 2 (2 historical copies → healed to ONE row), insert key 30
    val (replaced, inserted) = ShardDelete.upsertByKey(spark, dir, schema,
      "doc_id", Seq((2L, "TWO"), (30L, "thirty")).toDF("doc_id", "text"))
    assert((replaced, inserted) == ((2L, 1L)), s"got ($replaced, $inserted)")
    val back = ShardReader.read(spark, dir, schema)
      .as[(Long, String)].collect().toSet
    assert(back == Set((1L, "one"), (2L, "TWO"), (10L, "ten"),
      (11L, "eleven"), (20L, "twenty"), (30L, "thirty")), s"got $back")
    // the untouched shard kept its manifest entry
    val mfAfter = scala.io.Source.fromFile(s"$dir/_MANIFEST").getLines().toSeq
    assert(mfAfter.exists(_.startsWith(untouched + "\t")),
      s"untouched shard $untouched was rewritten: $mfAfter")
    assert(ShardReader.manifestRowCount(spark, dir) == 6L)
    assert(!new java.io.File(dir).listFiles().exists(_.getName.startsWith("_upsert-")))

    // re-run converges: same updates replace their own prior values
    val (r2, i2) = ShardDelete.upsertByKey(spark, dir, schema, "doc_id",
      Seq((2L, "TWO"), (30L, "thirty")).toDF("doc_id", "text"))
    assert((r2, i2) == ((2L, 0L)), s"got ($r2, $i2)")
    assert(ShardReader.read(spark, dir, schema)
      .as[(Long, String)].collect().toSet == back)

    // key-duplicate updates fail loud with the table intact
    val mf1 = scala.io.Source.fromFile(s"$dir/_MANIFEST").mkString
    intercept[IllegalArgumentException] {
      ShardDelete.upsertByKey(spark, dir, schema, "doc_id",
        Seq((5L, "x"), (5L, "y")).toDF("doc_id", "text"))
    }
    assert(scala.io.Source.fromFile(s"$dir/_MANIFEST").mkString == mf1)
    // empty updates: a (0, 0) no-op
    assert(ShardDelete.upsertByKey(spark, dir, schema, "doc_id",
      Seq.empty[(Long, String)].toDF("doc_id", "text")) == ((0L, 0L)))
    graft.CacheScope.releaseAll()
  }

  test("ShardSnapshot: time travel survives delete/upsert/compact; pins gate vacuum; diff classifies") {
    import graft.sources.v2.{ShardCompact, ShardDelete, ShardSnapshot}
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val dir = java.nio.file.Files.createTempDirectory("graft-shard-snap").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def append(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1)
        .write.format("graft.sources.v2.ShardSink")
        .option("path", dir).mode("append").save()
    append(Seq((1L, "one"), (2L, "two")))
    append(Seq((3L, "three"), (4L, "four")))
    val v1 = ShardSnapshot.create(spark, dir)
    assert(v1 == 1)
    val v1Rows = Set((1L, "one"), (2L, "two"), (3L, "three"), (4L, "four"))

    // mutate through every copy-on-write operator
    ShardDelete.upsertByKey(spark, dir, schema, "doc_id",
      Seq((2L, "TWO"), (5L, "five")).toDF("doc_id", "text"))
    val v2 = ShardSnapshot.create(spark, dir)
    ShardDelete.deleteByKey(spark, dir, schema, "doc_id", Seq(3L).toDF("k"))
    ShardCompact.compact(spark, dir, schema, targetShards = 1)

    // v1 still reads the ORIGINAL table — its shards were pinned
    // through an upsert, a delete, and a compaction
    assert(ShardSnapshot.read(spark, dir, schema, v1)
      .as[(Long, String)].collect().toSet == v1Rows)
    assert(ShardSnapshot.read(spark, dir, schema, v2)
      .as[(Long, String)].collect().toSet ==
      Set((1L, "one"), (2L, "TWO"), (3L, "three"), (4L, "four"), (5L, "five")))
    // current readers see the post-everything table
    assert(ShardReader.read(spark, dir, schema)
      .as[(Long, String)].collect().toSet ==
      Set((1L, "one"), (2L, "TWO"), (4L, "four"), (5L, "five")))

    // diff v1 → v2: 5 added, 2 changed, nothing removed
    val d = ShardSnapshot.diffByKey(spark, dir, schema, "doc_id", v1, v2)
      .as[(Long, String)].collect().toSet
    assert(d == Set((5L, "added"), (2L, "changed")), s"got $d")

    // vacuum with live pins reclaims nothing a snapshot needs
    ShardSnapshot.vacuum(spark, dir)
    assert(ShardSnapshot.read(spark, dir, schema, v1)
      .as[(Long, String)].collect().toSet == v1Rows)

    // drop both snapshots → vacuum reclaims the ex-shards; current
    // table is untouched; the dropped snapshot is gone loud
    ShardSnapshot.drop(spark, dir, v1)
    ShardSnapshot.drop(spark, dir, v2)
    val reclaimed = ShardSnapshot.vacuum(spark, dir)
    assert(reclaimed.nonEmpty, "expected pinned ex-shards to be reclaimed")
    assert(ShardReader.read(spark, dir, schema)
      .as[(Long, String)].collect().toSet ==
      Set((1L, "one"), (2L, "TWO"), (4L, "four"), (5L, "five")))
    intercept[IllegalArgumentException] {
      ShardSnapshot.read(spark, dir, schema, v1)
    }
    graft.CacheScope.releaseAll()
  }

  test("ShardLock: mutators fail fast under a held lock; stale lease breaks; release restores") {
    import graft.sources.v2.{ShardDelete, ShardLock, ShardSnapshot}
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val dir = java.nio.file.Files.createTempDirectory("graft-shard-lock").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    Seq((1L, "one"), (2L, "two")).toDF("doc_id", "text").coalesce(1)
      .write.format("graft.sources.v2.ShardSink")
      .option("path", dir).mode("append").save()

    // a held (fresh) lock: every mutator fails LOUD, table untouched.
    // Written EMPTY first — the mid-create window another writer's
    // reader can land in — then with content: both must read as held
    val lockFile = new java.io.File(dir, ShardLock.FileName)
    lockFile.createNewFile()
    val mfBefore0 = scala.io.Source.fromFile(s"$dir/_MANIFEST").mkString
    intercept[ShardLock.LockHeldException] {
      ShardDelete.deleteByKey(spark, dir, schema, "doc_id", Seq(1L).toDF("k"))
    }
    assert(scala.io.Source.fromFile(s"$dir/_MANIFEST").mkString == mfBefore0)
    val w = new java.io.PrintWriter(lockFile)
    w.println(s"other-writer\t${System.currentTimeMillis()}"); w.close()
    val mfBefore = scala.io.Source.fromFile(s"$dir/_MANIFEST").mkString
    intercept[ShardLock.LockHeldException] {
      ShardDelete.deleteByKey(spark, dir, schema, "doc_id", Seq(1L).toDF("k"))
    }
    intercept[ShardLock.LockHeldException] {
      ShardDelete.upsertByKey(spark, dir, schema, "doc_id",
        Seq((9L, "nine")).toDF("doc_id", "text"))
    }
    intercept[ShardLock.LockHeldException] {
      ShardSnapshot.create(spark, dir)
    }
    assert(scala.io.Source.fromFile(s"$dir/_MANIFEST").mkString == mfBefore)
    // the foreign lock survives the failed attempts
    assert(lockFile.exists())

    // an EXPIRED lease (crashed holder) is broken and the run proceeds —
    // expiry is judged by the lock file's MTIME (content timestamps are
    // informational: a fresh empty file mid-create must read as held)
    val w2 = new java.io.PrintWriter(lockFile)
    w2.println(s"crashed-writer\t${System.currentTimeMillis() - 3600000L}")
    w2.close()
    assert(lockFile.setLastModified(System.currentTimeMillis() - 3600000L))
    assert(ShardDelete.deleteByKey(spark, dir, schema, "doc_id",
      Seq(2L).toDF("k")) == 1L)
    // the lock was released after the successful run
    assert(!lockFile.exists())
    assert(ShardReader.read(spark, dir, schema)
      .select("doc_id").as[Long].collect().toSet == Set(1L))
    graft.CacheScope.releaseAll()
  }

  test("ShardDelete: whole-shard deletion drops the shard; orphans stay invisible") {
    import graft.sources.v2.ShardDelete
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val dir = java.nio.file.Files.createTempDirectory("graft-shard-del2").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def append(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1)
        .write.format("graft.sources.v2.ShardSink")
        .option("path", dir).mode("append").save()
    append(Seq((1L, "a"), (2L, "b")))
    append(Seq((3L, "c")))
    // crash-between-phases stand-in: an orphan data file (renamed in but
    // never manifested — the state a crash between steps 2 and 3 leaves)
    // must stay invisible before, during, and after the delete
    val orphan = new java.io.File(dir, "part-99999-orphan.jsonl")
    val w = new java.io.PrintWriter(orphan)
    w.println("""{"doc_id":777,"text":"ghost"}"""); w.close()
    assert(!ShardReader.read(spark, dir, schema)
      .select("doc_id").as[Long].collect().contains(777L))

    // deleting every row of shard 2 removes it from the manifest entirely
    assert(ShardDelete.deleteByKey(spark, dir, schema, "doc_id",
      Seq(3L).toDF("k")) == 1L)
    val back = ShardReader.read(spark, dir, schema)
      .select("doc_id").as[Long].collect().toSet
    assert(back == Set(1L, 2L), s"got $back")
    assert(ShardReader.manifestShardCount(spark, dir) == 1)
    assert(!ShardReader.read(spark, dir, schema)
      .select("doc_id").as[Long].collect().contains(777L), "orphan served")
  }
}
