package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("media table carries binary payloads with typed metadata") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    assert(media.schema("bytes").dataType.typeName === "binary")
    assert(media.schema("meta").dataType.typeName === "struct")
    val r = media.orderBy(col("media_id")).head()
    val doc = Tables.documents(spark, sfDir).orderBy(col("doc_id")).head()
    // payload round-trips the source text bytes
    assert(new String(r.getAs[Array[Byte]]("bytes"), "UTF-8") === doc.getAs[String]("text"))
  }

  test("sampleFrames slices fixed-size frames with a step, expression-only") {
    import TestSpark.spark.implicits._
    val df = Seq(("x" * 1000)).toDF("text")
      .select(Multimodal.sampleFrames(encode(col("text"), "UTF-8"), 256, 2).as("frames"))
    val frames = df.head().getSeq[Array[Byte]](0)
    // 1000 bytes -> frames 0..3; step 2 keeps frames 0 and 2
    assert(frames.length === 2)
    assert(frames(0).length === 256)
    assert(frames(1).length === 256)
  }

  test("stub decoder is deterministic and partition-independent") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val f1 = Multimodal.decodeFeatures(media.repartition(1), Multimodal.StubDecoder)
      .collect().map(m => m.media_id -> m.feature.toSeq).toMap
    val f8 = Multimodal.decodeFeatures(media.repartition(8), Multimodal.StubDecoder)
      .collect().map(m => m.media_id -> m.feature.toSeq).toMap
    assert(f1 === f8)
    assert(f1.values.head.length === Multimodal.StubDecoder.featureDim)
  }

  test("resizeImages rewrites image metadata and scales payloads, leaves audio/video untouched") {
    val media = Multimodal.mediaFromDocuments(spark, sfDir)
    val resized = Multimodal.resizeImages(media, 32, 32)
    val images = resized.filter(col("kind") === "image")
    assert(images.filter(col("meta.width") =!= 32 || col("meta.height") =!= 32).count() === 0)
    // payload shrank proportionally (64x64 -> 32x32 = 1/4 the bytes)
    val cmp = resized.alias("r").join(media.alias("m"), "media_id")
      .filter(col("r.kind") === "image")
      .select(length(col("r.bytes")).as("nb"), length(col("m.bytes")).as("ob"))
    assert(cmp.filter(col("nb") > col("ob")).count() === 0)
    assert(cmp.filter(col("nb") < col("ob")).count() > 0)
    // non-image rows byte-identical
    val others = resized.alias("r").join(media.alias("m"), "media_id")
      .filter(col("r.kind") =!= "image")
      .filter(col("r.bytes") =!= col("m.bytes") || col("r.meta.width") =!= col("m.meta.width"))
    assert(others.count() === 0)
  }

  test("decoded features flow into downstream aggregation") {
    val out = Multimodal.decodeQuery(spark, sfDir).collect()
    assert(out.map(_.getAs[String]("kind")).toSet === Set("image", "audio", "video"))
    assert(out.map(_.getAs[Long]("n_media")).sum ===
      Tables.documents(spark, sfDir).count())
  }

  test("pngMedia payloads are real PNGs and ImageIoDecoder round-trips them exactly") {
    val media = Multimodal.pngMediaFromDocuments(spark, sfDir)
      .orderBy(col("media_id")).limit(5).collect()
    val doc = Tables.documents(spark, sfDir)
      .filter(length(col("text")) >= 1)
      .orderBy(col("doc_id")).limit(5).collect()
    media.zip(doc).foreach { case (m, d) =>
      val id = m.getAs[Long]("media_id")
      val bytes = m.getAs[Array[Byte]]("bytes")
      // PNG magic: 89 50 4E 47 — proves the JDK encoder really ran
      assert((bytes(0) & 0xff) === 0x89 && bytes(1) === 'P' &&
        bytes(2) === 'N' && bytes(3) === 'G')
      val f = Multimodal.ImageIoDecoder.decode("image", bytes, 1)
      val (w, h) = (1 + (id % 31).toInt, 1 + (id % 13).toInt)
      assert(f(0) === w.toFloat && f(1) === h.toFloat)
      assert(f(2) === 1.0f) // grayscale: one band
      val text = d.getAs[String]("text").getBytes("UTF-8")
      val expected = (0 until w * h).map(k => (text(k % text.length) & 0xff).toLong).sum
      assert(f(3) === expected.toFloat) // lossless round trip: exact pixel sum
    }
  }

  test("ImageIoDecoder falls back to the stub for bytes no JDK codec sniffs") {
    val junk = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    val viaDecoder = Multimodal.ImageIoDecoder.decode("image", junk, 1)
    val viaStub = Multimodal.StubDecoder.decode("image", junk, 1).take(4)
    assert(viaDecoder.toSeq === viaStub.toSeq)
  }

  test("media dedup: exactly one min-id keeper per head-hash group") {
    val out = Multimodal.mediaDedupQuery(spark, sfDir).collect()
    assert(out.length === Tables.documents(spark, sfDir).count())
    out.groupBy(_.getString(1)).values.foreach { rows =>
      assert(rows.count(_.getAs[Int]("kept") == 1) === 1)
      assert(rows.forall(_.getAs[Long]("group_n") === rows.length.toLong))
      val keeper = rows.find(_.getAs[Int]("kept") == 1).get.getAs[Long]("media_id")
      assert(keeper === rows.map(_.getAs[Long]("media_id")).min)
    }
  }

  test("videoMedia containers hold real per-frame PNGs; decoder round-trips exactly") {
    val media = Multimodal.videoMediaFromDocuments(spark, sfDir)
      .orderBy(col("media_id")).limit(5).collect()
    val doc = Tables.documents(spark, sfDir)
      .filter(length(col("text")) >= 1)
      .orderBy(col("doc_id")).limit(5).collect()
    media.zip(doc).foreach { case (m, d) =>
      val id = m.getAs[Long]("media_id")
      val bytes = m.getAs[Array[Byte]]("bytes")
      val frames = Multimodal.parseGvidFrames(bytes)
      val nf = 2 + (id % 5).toInt
      assert(frames.length === nf)
      // every frame payload is a REAL PNG (JDK encoder ran per frame)
      frames.foreach { p =>
        assert((p(0) & 0xff) === 0x89 && p(1) === 'P' && p(2) === 'N' && p(3) === 'G')
      }
      val f = Multimodal.VideoContainerDecoder.decode("video", bytes, nf)
      val (w, h) = (1 + (id % 9).toInt, 1 + (id % 7).toInt)
      assert(f(0) === nf.toFloat && f(1) === w.toFloat && f(2) === h.toFloat)
      val text = d.getAs[String]("text").getBytes("UTF-8")
      val expected = (0 until nf).map { fr =>
        (0 until w * h).map(k => (text((k + 37 * fr) % text.length) & 0xff).toLong).sum
      }.sum
      assert(f(3) === expected.toFloat)
    }
  }

  test("VideoContainerDecoder treats declared sizes as untrusted") {
    // negative frame count, negative frame size, overrunning frame size
    def gvid(n: Int, entries: (Int, Array[Byte])*): Array[Byte] = {
      val total = 8 + entries.map(_._2.length + 4).sum
      val bb = java.nio.ByteBuffer.allocate(total)
      bb.putInt(0x47564944).putInt(n)
      entries.foreach { case (sz, p) => bb.putInt(sz); bb.put(p) }
      bb.array()
    }
    val junk = Array.tabulate[Byte](16)(i => (i * 11).toByte)
    val bad = Seq(
      gvid(-1),
      gvid(1, (-5, junk)),
      gvid(2, (junk.length + 999, junk)),
      Array.tabulate[Byte](32)(i => (i * 3).toByte)) // no magic
    bad.foreach { b =>
      assert(Multimodal.parseGvidFrames(b) === null)
      val viaDecoder = Multimodal.VideoContainerDecoder.decode("video", b, 1)
      val viaStub = Multimodal.StubDecoder.decode("video", b, 1).take(4)
      assert(viaDecoder.toSeq === viaStub.toSeq)
    }
  }

  test("WavDecoder bails to the stub on malformed RIFF chunk sizes") {
    // well-formed RIFF/WAVE preamble, then a chunk with negative size
    // (previously an infinite loop) and one that overruns the buffer
    def riff(chunkSize: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(24)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(0x46464952).putInt(16).putInt(0x45564157)
      bb.putInt(0x20746d66).putInt(chunkSize)
      bb.array()
    }
    Seq(riff(-8), riff(4096)).foreach { b =>
      val viaDecoder = Multimodal.WavDecoder.decode("audio", b, 1)
      val viaStub = Multimodal.StubDecoder.decode("audio", b, 1).take(4)
      assert(viaDecoder.toSeq === viaStub.toSeq)
    }
  }
}
