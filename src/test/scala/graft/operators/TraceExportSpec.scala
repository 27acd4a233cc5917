package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class TraceExportSpec extends SparkSpec {

  private val jan0 = Timestamp.valueOf("2024-01-01 00:00:00")
  private val jan1 = Timestamp.valueOf("2024-01-31 23:59:59")

  test("golden: README filter {1,2} over reference seed → exactly the 2 reference rows, in order") {
    val out = TraceExport.export(TraceExport.referenceSeed(spark), Seq(1L, 2L), jan0, jan1)
    val rows = out.collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(0) == 1L && rows(1).getLong(0) == 2L)
    assert(rows(0).getString(3) == """{"value": 100, "status": "OK"}""")
    assert(rows(1).getString(3) == """{"value": 250, "status": "WARN", "temp": 45.5}""")
    // names + types must match the Avro ParameterRecord analog
    // (nullability is laxer in-flight: casts mark columns nullable)
    assert(out.schema.map(f => (f.name, f.dataType)) ==
      TraceExport.outputSchema.map(f => (f.name, f.dataType)))
  }

  test("F2 is closed on both ends and constrains startTime only") {
    val seed = TraceExport.referenceSeed(spark)
    // exact boundary: start == row 1's startTime, end == row 3's startTime
    val out = TraceExport.export(seed, Seq(1L, 2L, 3L),
      Timestamp.valueOf("2024-01-10 10:00:00"), Timestamp.valueOf("2024-01-20 09:15:00"))
    assert(out.count() == 3)
  }

  test("typed flagship: Dataset[ParameterRecord] fields match the untyped rows") {
    val seed = TraceExport.referenceSeed(spark)
    val typed = TraceExport.exportTyped(seed, Seq(1L, 2L), jan0, jan1).collect()
    assert(typed.length == 2)
    assert(typed(0).paramIndex == 1L && typed(1).paramIndex == 2L)
    assert(typed(0).traceData == """{"value": 100, "status": "OK"}""")
    assert(typed(0).startTime == java.time.LocalDateTime.parse("2024-01-10T10:00:00"))
  }

  test("streaming flagship equals the batch export, order aside") {
    import graft.streaming.EventStreams
    val dir = java.nio.file.Files.createTempDirectory("graft-trace-stream").toString
    val trace = TraceExport.fromEvents(spark, sfDir)
    trace.write.mode("overwrite").parquet(dir)
    val ids = Seq(1L, 2L, 3L, 5L, 8L, 13L)
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = Timestamp.valueOf("2024-01-31 23:59:59")
    val streamedIn = spark.readStream.schema(trace.schema).parquet(dir)
    val streamed = EventStreams.runToBatch(spark,
      TraceExport.exportStream(streamedIn, ids, t0, t1), "t_trace_stream")
    val batch = TraceExport.export(trace, ids, t0, t1)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("A1: inverted time range is a caller error (reference 400 semantic)") {
    val seed = TraceExport.referenceSeed(spark)
    intercept[IllegalArgumentException] {
      TraceExport.export(seed, Seq(1L), jan1, jan0)
    }
  }

  test("F3: empty id list → empty result with the output schema, no scan") {
    val out = TraceExport.export(TraceExport.referenceSeed(spark), Seq.empty, jan0, jan1)
    assert(out.isEmpty && out.schema == TraceExport.outputSchema)
  }

  test("K1/K2: parquet sink round-trip; empty export reports no data") {
    val dir = java.nio.file.Files.createTempDirectory("graft").toString
    val seed = TraceExport.referenceSeed(spark)
    assert(TraceExport.exportToParquet(
      TraceExport.export(seed, Seq(1L, 2L), jan0, jan1), s"$dir/ok"))
    val back = spark.read.parquet(s"$dir/ok")
    assert(back.count() == 2)
    assert(!TraceExport.exportToParquet(
      TraceExport.export(seed, Seq(99L), jan0, jan1), s"$dir/empty"))
    intercept[NoDataFoundException] { // A2: reference's 404 semantic
      TraceExport.exportToParquetStrict(
        TraceExport.export(seed, Seq(99L), jan0, jan1), s"$dir/empty2")
    }
  }

  test("fromEvents trace table round-trips props through gzip") {
    val out = TraceExport.export(TraceExport.fromEvents(spark, sfDir),
      Seq(1L, 2L), jan0, jan1)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(3).startsWith("{")))
  }
}
