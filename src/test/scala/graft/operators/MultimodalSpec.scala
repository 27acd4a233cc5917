package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("asset table carries binary content + modality") {
    val assets = Multimodal.assetTable(spark, sfDir)
    assert(assets.schema("content").dataType.typeName == "binary")
    val mods = assets.select("modality").distinct().as[String].collect().toSet
    assert(mods == Set("image", "audio", "video"))
  }

  test("decodeStub emits typed metadata per row via mapPartitions") {
    val decoded = MultimodalStubs.decodeStub(Multimodal.assetTable(spark, sfDir))
    val row = decoded.filter($"asset_id" === 0).select("meta.*").head()
    assert(row.getAs[Long]("byte_len") > 0)
    assert(row.getAs[Int]("width") >= 1 && row.getAs[Int]("width") <= 256)
    assert(row.getAs[String]("format").endsWith("/stub"))
    assert(decoded.count() == 500)
  }

  test("decodeImage REALLY decodes: PNG magic in fixture, dims + pixels match ground truth") {
    val assets = Multimodal.imageAssetTable(spark, sfDir)
    // fixture bytes are genuine PNGs, not text stand-ins
    val first = assets.orderBy("asset_id").head()
    val magic = first.getAs[Array[Byte]]("content").take(8).map(_ & 0xff)
    assert(magic.toSeq == Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a),
      s"not a PNG signature: ${magic.toSeq}")
    val decoded = Multimodal.decodeImage(assets)
      .select("asset_id", "width", "height", "format", "mean_px")
      .as[(Long, Int, Int, String, Int)].collect()
    assert(decoded.length == 500)
    decoded.foreach { case (id, w, h, fmt, px) =>
      assert(w == (id % 13 + 1).toInt && h == (id % 7 + 1).toInt,
        s"asset $id decoded ${w}x$h, expected ${id % 13 + 1}x${id % 7 + 1}")
      assert(fmt == "png", s"asset $id sniffed as $fmt")
      assert(px == (id % 256).toInt, s"asset $id mean_px $px != ${id % 256}")
    }
  }

  test("decodeAudio REALLY decodes: RIFF magic in fixture, format + samples match ground truth") {
    val assets = Multimodal.audioAssetTable(spark, sfDir)
    // fixture bytes are genuine RIFF/WAVE containers, not stand-ins
    val first = assets.orderBy("asset_id").head()
    val head = first.getAs[Array[Byte]]("content")
    assert(new String(head.take(4), "US-ASCII") == "RIFF" &&
      new String(head.slice(8, 12), "US-ASCII") == "WAVE",
      "not a RIFF/WAVE container")
    val decoded = Multimodal.decodeAudio(assets)
      .select("asset_id", "sample_rate", "channels", "bits", "n_samples", "sum_abs")
      .as[(Long, Int, Int, Int, Long, Long)].collect()
    assert(decoded.length == 500)
    decoded.foreach { case (id, sr, ch, bits, n, sum) =>
      assert(sr == 8000 && ch == 1 && bits == 16, s"asset $id format $sr/$ch/$bits")
      val en = id % 50 + 10
      assert(n == en, s"asset $id decoded $n samples, expected $en")
      val esum = (0L until en).map(i => math.abs((id * 31 + i * 17) % 2001 - 1000)).sum
      assert(sum == esum, s"asset $id sum_abs $sum != $esum")
    }
  }

  test("decodeVideo REALLY decodes: AVI magic in fixture, headers + every frame's pixels match ground truth") {
    val assets = Multimodal.videoAssetTable(spark, sfDir)
    // fixture bytes are genuine RIFF/AVI containers, not stand-ins
    val head = assets.orderBy("asset_id").head().getAs[Array[Byte]]("content")
    assert(new String(head.take(4), "US-ASCII") == "RIFF" &&
      new String(head.slice(8, 12), "US-ASCII") == "AVI ",
      "not a RIFF/AVI container")
    val decoded = Multimodal.decodeVideo(assets)
      .select("asset_id", "byte_len", "width", "height", "n_frames", "fps", "first_px", "sum_px")
      .as[(Long, Long, Int, Int, Long, Int, Int, Long)].collect()
    assert(decoded.length == 500)
    decoded.foreach { case (id, blen, w, h, nf, fps, fpx, sum) =>
      val (ew, eh, enf) = ((id % 11 + 1).toInt, (id % 6 + 1).toInt, id % 5 + 2)
      assert(w == ew && h == eh && nf == enf && fps == 10,
        s"asset $id header ${w}x$h/$nf@$fps, expected ${ew}x$eh/$enf@10")
      val stride = Multimodal.dibStride(ew)
      assert(blen == 232 + enf * (24 + stride * eh),
        s"asset $id byte_len $blen != ${232 + enf * (24 + stride * eh)}")
      assert(fpx == (id * 7 % 256).toInt, s"asset $id first_px $fpx != ${id * 7 % 256}")
      val esum = (0L until enf).map(f => ew * eh * ((id * 7 + f * 13) % 256)).sum
      assert(sum == esum, s"asset $id sum_px $sum != $esum")
    }
  }

  test("decodeVideo honors the bottom-up DIB row order (first_px reads the image-space top row)") {
    // 1×2 frame whose raw rows differ: raw row 0 (BOTTOM of the image)
    // holds red 50, raw row 1 (TOP) holds red 200 — an upside-down
    // decode would report first_px = 50
    val stride = Multimodal.dibStride(1)
    val frame = new Array[Byte](stride * 2)
    frame(2) = 50.toByte   // raw row 0, pixel 0, R
    frame(stride + 2) = 200.toByte // raw row 1, pixel 0, R
    val avi = Multimodal.aviBytes(Seq(frame), w = 1, h = 2, fps = 10, fourcc = "DIB ")
    val assets = spark.createDataFrame(Seq((1L, "video", avi)))
      .toDF("asset_id", "modality", "content")
    val row = Multimodal.decodeVideo(assets).head()
    assert(row.getAs[Int]("first_px") == 200, "bottom-up row order violated")
    assert(row.getAs[Long]("sum_px") == 250L)
  }

  test("decodeVideo MJPG path: JPEG frames dispatch to the javax.imageio codec") {
    // two solid-gray 8×8 frames, ImageIO-encoded as genuine JPEGs
    val grays = Seq(64, 192)
    val frames = grays.map { g =>
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (g << 16) | (g << 8) | g
      for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val avi = Multimodal.aviBytes(frames, w = 8, h = 8, fps = 25, fourcc = "MJPG")
    val assets = spark.createDataFrame(Seq((9L, "video", avi)))
      .toDF("asset_id", "modality", "content")
    val row = Multimodal.decodeVideo(assets).head()
    assert(row.getAs[Int]("width") == 8 && row.getAs[Int]("height") == 8)
    assert(row.getAs[Long]("n_frames") == 2L && row.getAs[Int]("fps") == 25)
    // JPEG is lossy but a solid-gray plane decodes within ±2 of the fill
    val meanPerFrame = row.getAs[Long]("sum_px").toDouble / (2 * 64)
    assert(math.abs(meanPerFrame - grays.sum.toDouble / 2) <= 2.0,
      s"decoded mean $meanPerFrame too far from ${grays.sum.toDouble / 2}")
    assert(math.abs(row.getAs[Int]("first_px") - grays.head) <= 2)
  }

  test("decodeVideo fails loud on truncated or header-inconsistent containers") {
    val good = Multimodal.videoAssetTable(spark, sfDir)
      .orderBy("asset_id").head().getAs[Array[Byte]]("content")
    // truncation drops movi frames the avih header still claims
    val truncated = good.take(good.length - 20)
    val assets = spark.createDataFrame(Seq((1L, "video", truncated)))
      .toDF("asset_id", "modality", "content")
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeVideo(assets).collect()
    }
    assert(ex.getMessage != null)
  }

  test("resampleAudio: 2x decimation keeps exact even-index samples at half the rate") {
    val assets = Multimodal.audioAssetTable(spark, sfDir).filter($"asset_id" < 30)
    val decoded = Multimodal.decodeAudio(Multimodal.resampleAudio(assets, factor = 2))
      .select("asset_id", "sample_rate", "n_samples", "sum_abs")
      .as[(Long, Int, Long, Long)].collect()
    assert(decoded.length == 30)
    decoded.foreach { case (id, rate, n, sum) =>
      val n0 = id % 50 + 10
      assert(rate == 4000, s"asset $id resampled rate $rate")
      assert(n == (n0 + 1) / 2, s"asset $id kept $n of $n0 samples")
      val esum = (0L until n0 by 2)
        .map(i => math.abs((id * 31 + i * 17) % 2001 - 1000)).sum
      assert(sum == esum, s"asset $id sum_abs $sum != $esum")
    }
    // non-divisible rate/factor must fail loud, not round silently
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.resampleAudio(assets.limit(1), factor = 3).collect()
    }
    assert(e.getMessage != null)
  }

  test("decodeAudio fails loud on undecodable bytes") {
    val bogus = Multimodal.assetTable(spark, sfDir)
      .filter($"modality" === "audio").limit(3)
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeAudio(bogus).collect()
    }
    assert(ex.getMessage != null)
  }

  test("resizeImage round-trip: decode of the resized PNG shows the target dims") {
    val assets = Multimodal.imageAssetTable(spark, sfDir).filter($"asset_id" < 20)
    val resized = Multimodal.resizeImage(assets, targetW = 5, targetH = 3)
    val decoded = Multimodal.decodeImage(resized)
      .select("asset_id", "width", "height", "mean_px")
      .as[(Long, Int, Int, Int)].collect()
    assert(decoded.length == 20)
    decoded.foreach { case (id, w, h, px) =>
      assert(w == 5 && h == 3, s"asset $id resized to ${w}x$h")
      // constant-fill source: scaling preserves the gray level exactly
      assert(px == (id % 256).toInt, s"asset $id mean_px drifted to $px")
    }
  }

  test("decodeImage fails loud on undecodable bytes (no invented dimensions)") {
    val bad = Seq((1L, "image", "not an image at all".getBytes("UTF-8")))
      .toDF("asset_id", "modality", "content")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeImage(bad).collect()
    }
    assert(e.getMessage != null)
  }

  test("featuresStub: fixed-dim deterministic vectors") {
    val assets = Multimodal.assetTable(spark, sfDir)
    val f1 = MultimodalStubs.featuresStub(assets, dim = 16).orderBy("asset_id").collect()
    val f2 = MultimodalStubs.featuresStub(assets, dim = 16).orderBy("asset_id").collect()
    assert(f1.sameElements(f2)) // deterministic
    assert(f1.head.getSeq[Float](1).length == 16)
  }

  test("decodeAny: one kernel routes by container magic, not the modality label") {
    // deliberately MISLABEL every asset: sniffing must still route each
    // payload to the correct codec
    val mislabeled = Multimodal.imageAssetTable(spark, sfDir)
      .unionByName(Multimodal.audioAssetTable(spark, sfDir))
      .unionByName(Multimodal.videoAssetTable(spark, sfDir))
      .withColumn("modality", lit("bogus"))
    val out = Multimodal.decodeAny(mislabeled)
    assert(out.count() == 1500)
    val byMod = out.groupBy("modality").count().as[(String, Long)].collect().toMap
    assert(byMod == Map("image" -> 500L, "audio" -> 500L, "video" -> 500L))
    // spot-check each modality's decoded proof against ground truth
    val img7 = out.filter($"modality" === "image" && $"asset_id" === 7).head()
    assert(img7.getAs[Long]("content_sum") == (7 % 256) * (7 % 13 + 1) * (7 % 7 + 1))
    val aud7 = out.filter($"modality" === "audio" && $"asset_id" === 7).head()
    assert(aud7.getAs[Long]("n_units") == 7 % 50 + 10)
    val vid7 = out.filter($"modality" === "video" && $"asset_id" === 7).head()
    assert(vid7.getAs[Long]("n_units") == 7 % 5 + 2)
  }

  test("decodeVideoRow fails loud on a zero dwMicroSecPerFrame (no fps=-1 wrap)") {
    val good = Multimodal.aviBytes(
      Seq(new Array[Byte](Multimodal.dibStride(2) * 2)), 2, 2,
      fps = 10, fourcc = "DIB ")
    // avih dwMicroSecPerFrame lives at offset 32 (RIFF 12 + LIST 12 + avih 8)
    val bad = good.clone()
    bad(32) = 0; bad(33) = 0; bad(34) = 0; bad(35) = 0
    val e = intercept[IllegalArgumentException] {
      Multimodal.decodeVideoRow(1L, bad)
    }
    assert(e.getMessage.contains("dwMicroSecPerFrame"))
  }

  test("decodeAny fails loud on an unrecognized container") {
    val junk = Seq((1L, "image", "not a media container".getBytes("UTF-8")))
      .toDF("asset_id", "modality", "content")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeAny(junk).collect()
    }
    assert(e.getMessage.contains("unrecognized container") ||
      Option(e.getCause).exists(_.getMessage.contains("unrecognized container")))
  }

  test("assetDedupExact: duplicate byte streams collapse to the min asset id") {
    val assets = Seq(
      (1L, "image", "same bytes here".getBytes("UTF-8")),
      (2L, "image", "same bytes here".getBytes("UTF-8")),   // dup of 1
      (3L, "audio", "different bytes".getBytes("UTF-8"))
    ).toDF("asset_id", "modality", "content")
    val kept = Multimodal.assetDedupExact(assets)
      .select("asset_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L))
  }

  test("phash64 is PERCEPTUAL: re-encoding and resizing preserve the hash, different pictures diverge") {
    val textured = Multimodal.texturedImageAssetTable(spark, sfDir)
      .filter($"asset_id" < 8)
    // PNG → uncompressed BMP: zero shared container bytes, same picture
    val reenc = Multimodal.reencodedTwins(textured, idShift = 0, scale = 1)
    // PNG → 2× nearest-neighbor upscale → BMP: different container AND
    // different resolution, same picture
    val upscaled = Multimodal.reencodedTwins(textured, idShift = 0, scale = 2)
    val hOrig = Multimodal.phashImage(textured).as[(Long, Long)].collect().toMap
    val hRe = Multimodal.phashImage(reenc).as[(Long, Long)].collect().toMap
    val hUp = Multimodal.phashImage(upscaled).as[(Long, Long)].collect().toMap
    hOrig.foreach { case (id, h) =>
      assert(hRe(id) == h, s"asset $id: BMP re-encode moved the pHash")
      assert(hUp(id) == h, s"asset $id: 2x upscale moved the pHash")
    }
    // distinct noise textures must be FAR apart — the property that
    // keeps the banding from flooding with spurious pairs
    val hs = hOrig.toSeq.sortBy(_._1).map(_._2)
    for (i <- hs.indices; j <- i + 1 until hs.length) {
      val d = java.lang.Long.bitCount(hs(i) ^ hs(j))
      assert(d > 12, s"textured assets $i/$j only $d bits apart")
    }
    // a byte-level hash could never do this: the BMP twin shares no bytes
    val pngBytes = textured.orderBy("asset_id").head().getAs[Array[Byte]]("content")
    val bmpBytes = reenc.orderBy("asset_id").head().getAs[Array[Byte]]("content")
    assert(!bmpBytes.take(4).sameElements(pngBytes.take(4)))
  }

  test("assetNearDupPairs: re-encoded+resized twins pair at hamming 0, unrelated textures don't") {
    val textured = Multimodal.texturedImageAssetTable(spark, sfDir)
      .filter($"asset_id" < 20)
    val twins = Multimodal.reencodedTwins(
      textured.filter($"asset_id" % 5 === 0), idShift = 1000L, scale = 2)
    val pairs = Multimodal.assetNearDupPairs(
      textured.unionByName(twins), maxHamming = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = Seq(0L, 5L, 10L, 15L).map(id => (id, id + 1000L)).toSet
    assert(expected.subsetOf(pairs), s"planted twin pairs missed: $pairs")
    assert(pairs == expected, s"unrelated textures paired: ${pairs -- expected}")
    // deterministic across runs
    val h1 = Multimodal.phashImage(textured).orderBy("asset_id").collect().toSeq
    val h2 = Multimodal.phashImage(textured).orderBy("asset_id").collect().toSeq
    assert(h1 == h2)
  }

  test("assetDedupPerceptual: transitive perceptual copies collapse to the original") {
    val textured = Multimodal.texturedImageAssetTable(spark, sfDir)
      .filter($"asset_id" < 10)
    // two independent perceptual copies per original — the closure must
    // collapse the whole {original, BMP copy, 2x copy} cluster even
    // though the two copies also pair with EACH OTHER
    val copies1 = Multimodal.reencodedTwins(textured, idShift = 1000L, scale = 1)
    val copies2 = Multimodal.reencodedTwins(textured, idShift = 2000L, scale = 2)
    val kept = Multimodal.assetDedupPerceptual(
      textured.unionByName(copies1).unionByName(copies2), maxHamming = 6)
      .select("asset_id").as[Long].collect().sorted
    assert(kept.toSeq == (0L until 10L),
      s"expected only the originals to survive, got ${kept.toSeq}")
  }

  test("sampleVideoFrames: every stride-th REALLY-decoded frame with exact pixel stats") {
    val assets = Multimodal.videoAssetTable(spark, sfDir).filter($"asset_id" < 50)
    val frames = Multimodal.sampleVideoFrames(assets, stride = 2)
      .select("asset_id", "frame_no", "width", "height", "mean_px", "sum_px")
      .as[(Long, Int, Int, Int, Int, Long)].collect()
    val expectedRows = (0L until 50L).map(id => (id % 5 + 2 + 1) / 2).sum
    assert(frames.length == expectedRows,
      s"${frames.length} frames != $expectedRows")
    frames.foreach { case (id, f, w, h, mean, sum) =>
      assert(f % 2 == 0, s"asset $id emitted non-stride frame $f")
      val (ew, eh) = ((id % 11 + 1).toInt, (id % 6 + 1).toInt)
      val g = ((id * 7 + f * 13) % 256).toInt
      assert(w == ew && h == eh, s"asset $id frame $f dims ${w}x$h")
      assert(mean == g, s"asset $id frame $f mean_px $mean != $g")
      assert(sum == ew.toLong * eh * g, s"asset $id frame $f sum_px $sum")
    }
  }

  test("imageHistogramFeatures: multi-bin histogram from really-decoded pixels") {
    // the fixture oracle only ever sees one-hot histograms (solid-gray
    // images) — this image spreads pixels across three known bins, so a
    // decode that faked the histogram from byte stats cannot pass
    val img = new java.awt.image.BufferedImage(
      3, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val grays = Seq(0, 10, 100, 100, 200, 255) // bins 0,0,6,6,12,15
    grays.zipWithIndex.foreach { case (g, i) =>
      img.setRGB(i % 3, i / 3, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val assets = Seq((7L, "image", bos.toByteArray), (8L, "audio", Array[Byte](1)))
      .toDF("asset_id", "modality", "content")
    val got = Multimodal.imageHistogramFeatures(assets)
      .as[(Long, Seq[Long])].collect().toMap
    assert(got.keySet == Set(7L), s"non-image modality leaked: ${got.keySet}")
    val expected = Seq.tabulate(16)(b => grays.count(_ / 16 == b).toLong)
    assert(got(7L) == expected, s"histogram diverged: ${got(7L)} vs $expected")
  }

}
