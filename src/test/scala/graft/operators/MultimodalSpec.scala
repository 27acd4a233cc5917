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
    val decoded = Multimodal.decodeStub(Multimodal.assetTable(spark, sfDir))
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
    val f1 = Multimodal.featuresStub(assets, dim = 16).orderBy("asset_id").collect()
    val f2 = Multimodal.featuresStub(assets, dim = 16).orderBy("asset_id").collect()
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

  test("assetNearDupPairs: near-identical byte streams pair up, unrelated don't") {
    val base = ("A" * 200 + "B" * 200).getBytes("UTF-8")
    val tweaked = base.clone(); tweaked(50) = 'C'; tweaked(300) = 'D'
    val assets = Seq(
      (1L, "image", base),
      (2L, "image", tweaked),                              // 2 flipped bytes of 400
      (3L, "image", ("Z" * 150 + "Q" * 250).getBytes("UTF-8"))
    ).toDF("asset_id", "modality", "content")
    val pairs = Multimodal.assetNearDupPairs(assets, maxHamming = 12)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"near-dup pair missed: $pairs")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      s"unrelated assets paired: $pairs")
    // phash is deterministic
    val h1 = Multimodal.phashStub(assets).orderBy("asset_id").collect().toSeq
    val h2 = Multimodal.phashStub(assets).orderBy("asset_id").collect().toSeq
    assert(h1 == h2)
  }

  test("resizeStub: image assets only, bounded output size, deterministic") {
    val assets = Multimodal.assetTable(spark, sfDir)
    val resized = Multimodal.resizeStub(assets, targetW = 64, targetH = 64)
    val imageIds = assets.filter($"modality" === "image")
      .select("asset_id").as[Long].collect().toSet
    val rows = resized.collect()
    assert(rows.map(_.getLong(0)).toSet == imageIds)
    assert(rows.forall(_.getAs[Array[Byte]]("resized").length <= 64 * 64 / 16))
    assert(rows.forall(r => r.getInt(2) == 64 && r.getInt(3) == 64))
    val again = Multimodal.resizeStub(assets, 64, 64).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("resized").toSeq).toMap
    assert(rows.forall(r => again(r.getLong(0)) == r.getAs[Array[Byte]]("resized").toSeq))
  }

  test("sampleFrames: assets shorter than one frame yield no frames (no descending-sequence garbage)") {
    val assets = Seq(
      (1L, "video", "short".getBytes("UTF-8")),          // 5 bytes < 32
      (2L, "video", ("x" * 64).getBytes("UTF-8")))       // exactly 2 chunks
      .toDF("asset_id", "modality", "content")
    val frames = Multimodal.sampleFrames(assets, frameBytes = 32, stride = 2).collect()
    assert(frames.forall(_.getLong(0) == 2L),
      s"short asset emitted frames: ${frames.toSeq}")
    assert(frames.length == 1) // chunks 0,1 -> keep i=0 only
    assert(frames.head.getAs[Array[Byte]]("frame_bytes").length == 32)
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

  test("sampleFrames: strided chunking of video assets only") {
    val assets = Multimodal.assetTable(spark, sfDir)
    val frames = Multimodal.sampleFrames(assets, frameBytes = 32, stride = 2)
    assert(frames.count() > 0)
    val ids = frames.select("asset_id").distinct().as[Long].collect().toSet
    val videoIds = assets.filter($"modality" === "video")
      .select("asset_id").as[Long].collect().toSet
    assert(ids.subsetOf(videoIds))
    val f = frames.head()
    assert(f.getAs[Array[Byte]]("frame_bytes").length == 32)
  }
}
