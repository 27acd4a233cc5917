package graft.sources.v2

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec

/**
 * Optimistic concurrent appends (r16 verdict #2): N append jobs racing
 * on one table must ALL land exactly once — the losers of each commit
 * race retry under the `commitRetryMs` budget and re-merge, instead of
 * failing loud. The copy-on-write mutators keep their fail-fast
 * semantics (separate assertion), and a zero budget restores fail-fast
 * for appends too.
 */
class ShardAppendFleetSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  test("N racing appends all land exactly once: manifest = union, counts exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fleet").toString
    val fleet = 6
    val perJob = 25
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val start = new java.util.concurrent.CountDownLatch(1)
    val threads = (0 until fleet).map { j =>
      new Thread(() => {
        try {
          start.await()
          (j * perJob until (j + 1) * perJob)
            .map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
            .coalesce(2)
            .write.format("graft.sources.v2.ShardSink")
            .option("path", dir).option("statsColumn", "doc_id")
            .option("commitRetryMs", "30000")
            .mode("append").save()
        } catch { case t: Throwable => errors.add(t) }
      }, s"fleet-append-$j")
    }
    threads.foreach(_.start())
    start.countDown() // fire all jobs at once — commits race on the lock
    threads.foreach(_.join(120000))
    assert(errors.isEmpty, s"fleet appends failed: ${errors.peek()}")

    // every job's rows landed exactly once
    val back = ShardReader.read(spark, dir, schema)
    assert(back.count() == fleet.toLong * perJob)
    assert(back.select("doc_id").distinct().count() == fleet.toLong * perJob)
    assert(ShardReader.manifestRowCount(spark, dir) == fleet.toLong * perJob)
    // the manifest is the union of every job's shards (2 per job)
    assert(ShardReader.manifestShardCount(spark, dir) == fleet * 2)
    // and the merged _STATS carries every shard (pruning survived the races)
    val p = new org.apache.hadoop.fs.Path(dir)
    val stats = ShardStats.readIfExists(
      p.getFileSystem(spark.sessionState.newHadoopConf()), p).get
    assert(stats.ranges.size == fleet * 2)
    // the lock was released by the last committer
    assert(!new java.io.File(dir, ShardLock.FileName).exists())
  }

  test("zero budget = fail-fast; mutators never retry under a held lock") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fleet-ff").toString
    Seq((1L, "a")).toDF("doc_id", "text").coalesce(1)
      .write.format("graft.sources.v2.ShardSink")
      .option("path", dir).mode("append").save()
    val lockFile = new java.io.File(dir, ShardLock.FileName)
    val w = new java.io.PrintWriter(lockFile)
    w.println(s"other-writer\t${System.currentTimeMillis()}"); w.close()

    // a delete under a held lock fails IMMEDIATELY (no retry budget on
    // the copy-on-write mutators — their conflicts are not mergeable)
    val t0 = System.nanoTime()
    intercept[ShardLock.LockHeldException] {
      ShardDelete.deleteByKey(spark, dir, schema, "doc_id", Seq(1L).toDF("k"))
    }
    assert((System.nanoTime() - t0) / 1e9 < 5.0, "mutator waited on the lock")

    // an append with commitRetryMs=0 fails fast too (and publishes nothing)
    val e = intercept[Exception] {
      Seq((2L, "b")).toDF("doc_id", "text").coalesce(1)
        .write.format("graft.sources.v2.ShardSink")
        .option("path", dir).option("commitRetryMs", "0")
        .mode("append").save()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8).toSeq
    assert(chain(e).exists {
      case l: ShardLock.LockHeldException => l.retryable
      case _ => false
    }, chain(e).map(_.getClass.getName).toString)
    assert(ShardReader.manifestRowCount(spark, dir) == 1L)
    assert(lockFile.delete())

    // with the default budget, the same append succeeds once the lock
    // holder finishes: hold the lock briefly in a thread, append in the
    // main thread — the retry waits it out
    val holderDone = new java.util.concurrent.CountDownLatch(1)
    val holderIn = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() => {
      ShardLock.withLock(spark, dir, leaseMs = 60000L) {
        holderIn.countDown()
        holderDone.await(30, java.util.concurrent.TimeUnit.SECONDS)
      }
    })
    holder.start()
    assert(holderIn.await(10, java.util.concurrent.TimeUnit.SECONDS))
    // release the lock shortly after the append starts retrying
    new Thread(() => { Thread.sleep(1500); holderDone.countDown() }).start()
    Seq((2L, "b")).toDF("doc_id", "text").coalesce(1)
      .write.format("graft.sources.v2.ShardSink")
      .option("path", dir).mode("append").save()
    holder.join(10000)
    assert(ShardReader.manifestRowCount(spark, dir) == 2L)
  }
}
