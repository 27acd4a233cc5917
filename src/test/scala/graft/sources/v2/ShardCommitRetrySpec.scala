package graft.sources.v2

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path => JPath}

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Driver-retry idempotency of the job-level commit, exercised directly
  * (the DataFrame path cannot simulate a retry): a re-invoked `commit`
  * finds its renames already applied — src gone, dst present — and must
  * treat that as the rename's postcondition, reach the manifest write,
  * and not duplicate manifest entries. Lives in this package because
  * [[ShardBatchWrite]] is `private[v2]`.
  */
class ShardCommitRetrySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def stage(dir: JPath, queryId: String, name: String, lines: String): String = {
    val staging = dir.resolve(s"_staging-$queryId")
    Files.createDirectories(staging)
    val f = staging.resolve(name)
    Files.writeString(f, lines)
    f.toString
  }

  private def readManifest(dir: JPath): Seq[(String, Long)] =
    new String(Files.readAllBytes(dir.resolve("_MANIFEST")), StandardCharsets.UTF_8)
      .linesIterator.filter(_.nonEmpty)
      .map(_.split("\t")).map(a => a(0) -> a(1).toLong).toSeq

  test("retried commit: renames already applied -> success, no duplicate manifest rows") {
    val dir = Files.createTempDirectory("graft-shard-retry")
    val staged = stage(dir, "q1", "part-00000-aaaaaaaa.jsonl",
      "{\"doc_id\":1,\"text\":\"a\"}\n")
    val write = new ShardBatchWrite(dir.toString, "q1", schema,
      new SerializableHadoopConf(new Configuration()), Nil)
    val msgs: Array[org.apache.spark.sql.connector.write.WriterCommitMessage] =
      Array(ShardCommit(staged, 1L))

    write.commit(msgs)
    // the driver retries the SAME commit (e.g. a transient error was
    // reported after the work had in fact completed)
    write.commit(msgs)

    assert(readManifest(dir) == Seq("part-00000-aaaaaaaa.jsonl" -> 1L),
      s"retry must not duplicate or lose manifest rows: ${readManifest(dir)}")
    assert(Files.exists(dir.resolve("part-00000-aaaaaaaa.jsonl")))
  }

  test("crash between renames and manifest write: retry repairs visibility") {
    val dir = Files.createTempDirectory("graft-shard-repair")
    val staged = stage(dir, "q2", "part-00000-bbbbbbbb.jsonl",
      "{\"doc_id\":2,\"text\":\"b\"}\n")
    // simulate the crash: the rename happened, the manifest write did not
    Files.move(JPath.of(staged), dir.resolve("part-00000-bbbbbbbb.jsonl"))
    val write = new ShardBatchWrite(dir.toString, "q2", schema,
      new SerializableHadoopConf(new Configuration()), Nil)

    write.commit(Array(ShardCommit(staged, 1L)))

    // without the dst-exists tolerance this threw before reaching the
    // manifest write, leaving the shard permanently unmanifested
    assert(readManifest(dir) == Seq("part-00000-bbbbbbbb.jsonl" -> 1L))
  }

  test("a rename that truly failed (src and dst both missing) still throws") {
    val dir = Files.createTempDirectory("graft-shard-fail")
    val write = new ShardBatchWrite(dir.toString, "q3", schema,
      new SerializableHadoopConf(new Configuration()), Nil)
    intercept[java.io.IOException] {
      write.commit(Array(ShardCommit(
        dir.resolve("_staging-q3/part-00000-cccccccc.jsonl").toString, 1L)))
    }
  }
}
