package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Schema drift is a constant of long-running ingest: a source adds a
  * column mid-corpus and the reader must take both drops without a
  * rewrite. Pins the two engine surfaces that make that safe. */
class SchemaDriftSpec extends SparkSpec {
  import spark.implicits._

  test("mergeSchema reads old + new parquet drops as one evolved table") {
    val dir = java.nio.file.Files.createTempDirectory("graft-drift").toString
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.parquet(s"$dir/drop=1")
    Seq((3L, "gamma", "en")).toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/drop=2")

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("doc_id", "drop", "lang", "text"))
    val rows = merged.select("doc_id", "lang").as[(Long, Option[String])]
      .collect().toMap
    assert(rows(1L).isEmpty && rows(2L).isEmpty, "old rows null-fill the new column")
    assert(rows(3L).contains("en"))
    // and the evolved column still predicate-pushes on the new drop
    assert(merged.filter(col("lang") === "en").count() == 1)
  }

  test("unionByName(allowMissingColumns) is the in-plan analog for mixed batches") {
    val old = Seq((1L, "alpha")).toDF("doc_id", "text")
    val neu = Seq((2L, "beta", "en")).toDF("doc_id", "text", "lang")
    val u = old.unionByName(neu, allowMissingColumns = true)
    assert(u.columns.toSeq == Seq("doc_id", "text", "lang"))
    assert(u.filter(col("lang").isNull).count() == 1)
    // order-insensitive: reversed union carries the same evolved schema
    val r = neu.unionByName(old, allowMissingColumns = true)
    assert(r.columns.sorted.toSeq == u.columns.sorted.toSeq && r.count() == 2)
  }
}
