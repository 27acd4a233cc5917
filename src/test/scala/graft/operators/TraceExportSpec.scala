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

  test("maxPayloadBytes: generous bound keeps reference parity, tight bound aborts the export") {
    val seed = TraceExport.referenceSeed(spark)
    val bounded = TraceExport.export(seed, Seq(1L, 2L), jan0, jan1,
      maxPayloadBytes = 1L << 20).collect()
    assert(bounded.length == 2) // well-formed payloads: identical result
    intercept[Exception] { // over-budget row fails the export (strict policy)
      TraceExport.export(seed, Seq(1L, 2L), jan0, jan1, maxPayloadBytes = 4L).collect()
    }
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

  test("K1 single-file mode writes exactly one data file (reference one-artifact contract)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-single").toString
    val seed = TraceExport.referenceSeed(spark)
    assert(TraceExport.exportToParquet(
      TraceExport.export(seed, Seq(1L, 2L, 3L), jan0, jan1), s"$dir/one", singleFile = true))
    val dataFiles = new java.io.File(s"$dir/one").listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    assert(dataFiles.length == 1, dataFiles.map(_.getName).toSeq)
    // coalesce(1) concatenates range partitions in index order — the
    // reference's global ORDER BY survives into the single artifact
    val back = spark.read.parquet(s"$dir/one").collect()
    assert(back.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }

  test("TIMESTAMP_MILLIS parity: physical schema matches the reference's Avro output") {
    // The reference writes INT64 TIMESTAMP(MILLIS, UTC-adjusted)
    // (ParameterRecord.avsc timestamp-millis; verified in its data.parquet).
    // Parity mode: cast NTZ→LTZ (UTC session ⇒ same wall clock) and write
    // with outputTimestampType=TIMESTAMP_MILLIS; assert the parquet footer.
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-millis").toString
    val key = "spark.sql.parquet.outputTimestampType"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "TIMESTAMP_MILLIS")
    try {
      val out = TraceExport.export(TraceExport.referenceSeed(spark), Seq(1L, 2L, 3L), jan0, jan1)
        .select(col("paramIndex"),
          col("startTime").cast("timestamp").as("startTime"),
          col("endTime").cast("timestamp").as("endTime"),
          col("traceData"))
      assert(TraceExport.exportToParquet(out, s"$dir/millis", singleFile = true))
    } finally spark.conf.set(key, prev)

    val file = new java.io.File(s"$dir/millis").listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).head
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file.getPath),
      spark.sparkContext.hadoopConfiguration)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    val schema =
      try reader.getFooter.getFileMetaData.getSchema
      finally reader.close()
    import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType}
    Seq("startTime", "endTime").foreach { f =>
      val pt = schema.getType(Seq(f): _*).asPrimitiveType()
      assert(pt.getPrimitiveTypeName == PrimitiveType.PrimitiveTypeName.INT64, f)
      val ann = pt.getLogicalTypeAnnotation
        .asInstanceOf[LogicalTypeAnnotation.TimestampLogicalTypeAnnotation]
      assert(ann.getUnit == LogicalTypeAnnotation.TimeUnit.MILLIS, f)
      assert(ann.isAdjustedToUTC, f)
    }
    // second-precision reference payloads survive the millis round-trip
    val back = spark.read.parquet(s"$dir/millis")
    assert(back.count() == 3)
    assert(back.collect().map(_.getTimestamp(1).toString).sorted.head == "2024-01-10 10:00:00.0")
  }

  test("fromEvents trace table round-trips props through gzip") {
    val out = TraceExport.export(TraceExport.fromEvents(spark, sfDir),
      Seq(1L, 2L), jan0, jan1)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(3).startsWith("{")))
  }
}
