package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TraceExport
import graft.sources.v2.TraceGenScan

class TraceGenSourceSpec extends SparkSpec {
  import spark.implicits._

  private def gen(rows: Long, nParams: Int = 16, partitions: Int = 8) =
    spark.read.format("graft.sources.v2.TraceGenSource")
      .option("rows", rows).option("nParams", nParams).option("partitions", partitions)
      .load()

  test("generates the requested row count with the storage schema") {
    val df = gen(1000)
    assert(df.count() == 1000)
    assert(df.schema.map(f => (f.name, f.dataType)) ==
      TraceExport.storageSchema.map(f => (f.name, f.dataType)))
  }

  test("paramIndex filter pushes down and prunes whole partitions") {
    val df = gen(1000, nParams = 16, partitions = 8)
    val one = df.filter($"paramIndex" === 3L)
    val n = one.count()
    assert(n > 0 && n < 1000)
    // params 1..16 over 8 partitions ⇒ param 3 lives in exactly 1 partition
    assert(TraceGenScan.lastPlannedPartitions.get() == 1,
      s"expected 1 planned partition, got ${TraceGenScan.lastPlannedPartitions.get()}")
    val explain = one.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(explain.contains("PushedFilters=[EqualTo(paramIndex,3)]"), explain)
  }

  test("column pruning: traceData never generated for a pruned projection") {
    val ids = gen(1000).select("paramIndex").distinct()
      .as[Long].collect().sorted
    assert(ids.toSeq == (1L to 16L))
  }

  test("payloads are the reference seed JSONs, gzip round-trips") {
    val row = gen(9).filter($"paramIndex" === 1L)
      .select(graft.functions.gunzip_string($"traceData").as("json"))
      .head()
    assert(row.getString(0).contains("\"status\""))
  }

  test("volume: 500k generated rows stream through the full export") {
    // ~0.5M gzip payloads decompressed through the whole pipeline — the
    // fixture tables never exercise the flagship at this volume
    val trace = gen(500000, nParams = 100, partitions = 32)
    val out = TraceExport.exportUnordered(trace, (1L to 100L),
      Timestamp.valueOf("2024-01-01 00:00:00"),
      Timestamp.valueOf("2026-01-01 00:00:00"))
    assert(out.count() == 500000)
  }

  test("flagship pipeline runs end-to-end over the V2 source") {
    val trace = gen(10000, nParams = 64, partitions = 16)
    val out = TraceExport.export(trace, Seq(1L, 2L, 3L),
      Timestamp.valueOf("2024-01-01 00:00:00"),
      Timestamp.valueOf("2024-01-07 23:59:59"))
    val back = out.collect()
    assert(back.nonEmpty)
    assert(back.forall(r => Set(1L, 2L, 3L).contains(r.getLong(0))))
    assert(back.forall(_.getString(3).startsWith("{")))
  }
}
