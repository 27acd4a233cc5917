package graft.sources.v2

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

import graft.SparkSpec

/**
 * Widen-only schema evolution on the durable shard store: the `_SCHEMA`
 * sidecar is the table's authoritative column set — adds are free (old
 * shards null-fill), type changes are refused loud (the JSONL
 * silent-NULL corruption class), and the whole maintenance suite keeps
 * working against the evolved schema.
 */
class ShardSchemaSpec extends SparkSpec {
  import spark.implicits._

  private def schemaFile(dir: String): String =
    scala.io.Source.fromFile(s"$dir/_SCHEMA").mkString

  test("first append publishes _SCHEMA; widening bumps the generation; old shards null-fill") {
    val dir = java.nio.file.Files.createTempDirectory("graft-schema-ev").toString
    Seq((1L, "one")).toDF("doc_id", "text").coalesce(1)
      .write.format("graft.sources.v2.ShardSink")
      .option("path", dir).mode("append").save()
    assert(schemaFile(dir) ==
      "#v\t1\n#format\tjsonl\ndoc_id\tlong\ntext\tstring\n")

    // same-schema append: generation unchanged
    Seq((2L, "two")).toDF("doc_id", "text").coalesce(1)
      .write.format("graft.sources.v2.ShardSink")
      .option("path", dir).mode("append").save()
    assert(schemaFile(dir).startsWith("#v\t1\n"))

    // widening append: new column joins the table schema, generation +1
    Seq((3L, "three", 0.5)).toDF("doc_id", "text", "score").coalesce(1)
      .write.format("graft.sources.v2.ShardSink")
      .option("path", dir).mode("append").save()
    assert(schemaFile(dir) ==
      "#v\t2\n#format\tjsonl\ndoc_id\tlong\ntext\tstring\nscore\tdouble\n")

    // schema-less read: the table knows its own columns; pre-widening
    // shards read back NULL in the added column
    assert(ShardReader.tableSchema(spark, dir) == StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("score", DoubleType))))
    val got = ShardReader.readEvolved(spark, dir)
      .select(col("doc_id"), col("score"))
      .as[(Long, Option[Double])].collect().toSet
    assert(got == Set((1L, None), (2L, None), (3L, Some(0.5))), s"got $got")

    // a narrower append (missing a known column) is fine: schema
    // unchanged, its rows read back NULL there
    Seq((4L, "four")).toDF("doc_id", "text").coalesce(1)
      .write.format("graft.sources.v2.ShardSink")
      .option("path", dir).mode("append").save()
    assert(schemaFile(dir).startsWith("#v\t2\n"))
    assert(ShardReader.readEvolved(spark, dir).count() == 4L)
  }

  test("a type-changing append is refused loud at plan time with the layout intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-schema-ty").toString
    Seq((1L, "one")).toDF("doc_id", "text").coalesce(1)
      .write.format("graft.sources.v2.ShardSink")
      .option("path", dir).mode("append").save()
    val mf = scala.io.Source.fromFile(s"$dir/_MANIFEST").mkString
    val sc = schemaFile(dir)
    val e = intercept[Exception] {
      // doc_id as STRING: would read back as silent NULLs under the
      // table's long schema — exactly the refusal class
      Seq(("5", "five")).toDF("doc_id", "text").coalesce(1)
        .write.format("graft.sources.v2.ShardSink")
        .option("path", dir).mode("append").save()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(_.contains("evolution is add-only")), chain(e))
    assert(scala.io.Source.fromFile(s"$dir/_MANIFEST").mkString == mf)
    assert(schemaFile(dir) == sc)
    // no staging/garbage left behind; the table still reads
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith("_staging")))
    assert(ShardReader.readEvolved(spark, dir).count() == 1L)
  }

  test("maintenance suite works against the evolved schema (delete/compact/readByKey via tableSchema)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-schema-mx").toString
    def append(df: org.apache.spark.sql.DataFrame): Unit =
      df.coalesce(1).write.format("graft.sources.v2.ShardSink")
        .option("path", dir).option("statsColumn", "doc_id")
        .mode("append").save()
    append(Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text"))
    append(Seq((10L, "c", 0.9), (11L, "d", 0.1)).toDF("doc_id", "text", "score"))
    val ts = ShardReader.tableSchema(spark, dir)

    assert(ShardDelete.deleteByKey(spark, dir, ts, "doc_id",
      Seq(2L).toDF("k")) == 1L)
    assert(ShardCompact.compact(spark, dir, ts, targetShards = 1) == 1)
    val back = ShardReader.readEvolved(spark, dir)
      .select(col("doc_id"), col("score"))
      .as[(Long, Option[Double])].collect().toSet
    assert(back == Set((1L, None), (10L, Some(0.9)), (11L, Some(0.1))),
      s"got $back")
    // the compaction rewrite went through the sink: schema survives and
    // the rewritten shard carries ALL evolved columns
    assert(schemaFile(dir).contains("score\tdouble"))
    val hit = ShardReader.readByKey(spark, dir, ts, "doc_id",
      Seq(10L).toDF("k")).as[(Long, String, Option[Double])].collect().toSeq
    assert(hit == Seq((10L, "c", Some(0.9))), s"got $hit")
    graft.CacheScope.releaseAll()
  }

  test("maintenance with a narrower schema than _SCHEMA is refused (would silently drop evolved columns)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-schema-nar").toString
    Seq((1L, "a", 0.5)).toDF("doc_id", "text", "score").coalesce(1)
      .write.format("graft.sources.v2.ShardSink")
      .option("path", dir).mode("append").save()
    Seq((2L, "b", 0.7)).toDF("doc_id", "text", "score").coalesce(1)
      .write.format("graft.sources.v2.ShardSink")
      .option("path", dir).mode("append").save()
    val narrow = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val e = intercept[IllegalArgumentException] {
      ShardCompact.compact(spark, dir, narrow, targetShards = 1)
    }
    assert(e.getMessage.contains("missing evolved column 'score'"), e.getMessage)
    intercept[IllegalArgumentException] {
      ShardDelete.deleteByKey(spark, dir, narrow, "doc_id", Seq(1L).toDF("k"))
    }
    intercept[IllegalArgumentException] {
      ShardDelete.upsertByKey(spark, dir, narrow, "doc_id",
        Seq((3L, "c")).toDF("doc_id", "text"))
    }
    // the full schema proceeds
    val ts = ShardReader.tableSchema(spark, dir)
    assert(ShardCompact.compact(spark, dir, ts, targetShards = 1) == 1)
    assert(ShardReader.readEvolved(spark, dir).count() == 2L)
    graft.CacheScope.releaseAll()
  }

  test("pre-evolution tables: tableSchema fails loud, explicit-schema read still works") {
    val dir = java.nio.file.Files.createTempDirectory("graft-schema-pre").toString
    Seq((1L, "x")).toDF("doc_id", "text").coalesce(1)
      .write.format("graft.sources.v2.ShardSink")
      .option("path", dir).mode("append").save()
    assert(new java.io.File(dir, "_SCHEMA").delete()) // simulate pre-r16 table
    intercept[IllegalArgumentException] {
      ShardReader.tableSchema(spark, dir)
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    assert(ShardReader.read(spark, dir, schema).count() == 1L)
    // an append to a pre-schema table with committed shards is REFUSED
    // (bootstrapping _SCHEMA from the append alone would silently drop
    // any historical column the append does not carry) — and the refusal
    // publishes NOTHING: manifest byte-identical, no new shards
    val mfBefore = scala.io.Source.fromFile(s"$dir/_MANIFEST").mkString
    val thrown = intercept[Exception] {
      Seq((2L, "y")).toDF("doc_id", "text").coalesce(1)
        .write.format("graft.sources.v2.ShardSink")
        .option("path", dir).mode("append").save()
    }
    assert(thrown.getMessage != null)
    assert(scala.io.Source.fromFile(s"$dir/_MANIFEST").mkString == mfBefore)
    assert(!new java.io.File(dir, "_SCHEMA").exists())
    // the audited adoption step supplies the FULL historical schema…
    ShardSchema.migrate(spark, dir, schema)
    assert(ShardReader.tableSchema(spark, dir) == StructType(schema.map(
      f => StructField(f.name, f.dataType, nullable = true))))
    // …migrate is one-time: a second call on an adopted table is refused
    intercept[IllegalArgumentException] { ShardSchema.migrate(spark, dir, schema) }
    // …after which appends evolve normally
    Seq((2L, "y")).toDF("doc_id", "text").coalesce(1)
      .write.format("graft.sources.v2.ShardSink")
      .option("path", dir).mode("append").save()
    assert(ShardReader.readEvolved(spark, dir).count() == 2L)
  }
}
