package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Frame slicing / stub decode edge cases for the multimodal plumbing. */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def media(rows: (Long, String)*) =
    rows.toDF("doc_id", "txt").select(col("doc_id"),
      lit("image/test").as("media_type"),
      encode(col("txt"), "UTF-8").as("payload"))

  test("frame slicing: exact multiple, remainder, sub-frame, empty") {
    val m = media(
      (1L, "a" * 8),   // exactly 2 frames of 4
      (2L, "b" * 10),  // 2 full + remainder 2
      (3L, "c"),       // single sub-frame
      (4L, ""))        // empty payload -> no frames
    val f = Multimodal.frames(m, 4).orderBy("doc_id", "frame_idx").collect()
    val byDoc = f.groupBy(_.getLong(0)).view.mapValues(_.map(r =>
      (r.getLong(1), r.getLong(2))).toSeq).toMap
    assert(byDoc(1L) == Seq((0L, 4L), (1L, 4L)))
    assert(byDoc(2L) == Seq((0L, 4L), (1L, 4L), (2L, 2L)))
    assert(byDoc(3L) == Seq((0L, 1L)))
    assert(!byDoc.contains(4L))
  }

  test("frame sample picks first/mid/last, deduplicated for short payloads") {
    val m = media((1L, "x" * 20)) // 5 frames of 4 -> idx 0, 2, 4
    val s = Multimodal.frameSample(Multimodal.frames(m, 4))
      .orderBy("frame_idx").collect().map(_.getLong(1)).toSeq
    assert(s == Seq(0L, 2L, 4L))
    val one = media((2L, "y")) // 1 frame -> single row, not triplicated
    val s1 = Multimodal.frameSample(Multimodal.frames(one, 4)).collect()
    assert(s1.length == 1 && s1(0).getLong(1) == 0L)
  }

  test("stub decode is deterministic and checksums match spark md5") {
    val m = media((7L, "hello world"))
    val d = Multimodal.decodeStub(m.as[Multimodal.MediaRow]).collect().head
    assert(d.n_bytes == 11L)
    assert(d.width == 64 + ((11 * 131 + 7) % 193))
    val sparkMd5 = m.select(md5(col("payload"))).collect().head.getString(0)
    assert(d.checksum == sparkMd5)
  }

  test("decode parses real BMP and PPM headers; text falls back to pseudo") {
    import spark.implicits._
    // minimal BMP: magic, size, reserved=0, data offset, DIB=40, w=320, h=-240
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val bmp = "BM".getBytes("US-ASCII") ++ le32(60) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(320) ++ le32(-240) ++ Array.fill[Byte](30)(0)
    val ppm = ("P6\n# a comment\n17 9\n255\n" + "x" * (17 * 9 * 3)).getBytes("US-ASCII")
    val txt = "BMW is a carmaker, P6 is an engine layout".getBytes("UTF-8")
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", bmp),
      Multimodal.MediaRow(2L, "image", ppm),
      Multimodal.MediaRow(3L, "text", txt)).toDS()
    val out = Multimodal.decode(rows).collect().map(d => d.doc_id -> d).toMap
    assert((out(1L).width, out(1L).height) == (320, 240)) // top-down height folded
    assert((out(2L).width, out(2L).height) == (17, 9))
    val n = txt.length.toLong
    assert(out(3L).width == 64 + ((n * 131 + 3) % 193).toInt, "text must pseudo-decode")
  }

  test("PPM parser: comment abutting a token flushes it; prose never parses") {
    import spark.implicits._
    // '#' right after the width digits — netpbm reads (17, 9), not 179
    val ppm = ("P6 17# a comment\n9\n255\n" + "x" * (17 * 9 * 3)).getBytes("US-ASCII")
    // prose with three plausible ints but no raster payload behind them
    val prose = "P5 10 20 30 short text".getBytes("UTF-8")
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", ppm),
      Multimodal.MediaRow(2L, "text", prose)).toDS()
    val out = Multimodal.decode(rows).collect().map(d => d.doc_id -> d).toMap
    assert((out(1L).width, out(1L).height) == (17, 9))
    val n = prose.length.toLong
    assert(out(2L).width == 64 + ((n * 131 + 2) % 193).toInt,
      "prose must take the pseudo-decode fallback")
  }

  test("decode reads real JPEG/PNG/GIF dims via the JDK's ImageIO") {
    import spark.implicits._
    def encodeImg(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(java.awt.Color.ORANGE); g.fillRect(0, 0, w, h); g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val jpg = encodeImg("jpg", 123, 45)
    val png = encodeImg("png", 31, 77)
    val gif = encodeImg("gif", 12, 8)
    val truncated = jpg.take(8) // valid magic, unreadable header
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", jpg),
      Multimodal.MediaRow(2L, "image", png),
      Multimodal.MediaRow(3L, "image", gif),
      Multimodal.MediaRow(4L, "image", truncated)).toDS()
    val out = Multimodal.decode(rows).collect().map(d => d.doc_id -> d).toMap
    assert((out(1L).width, out(1L).height) == (123, 45))
    assert((out(2L).width, out(2L).height) == (31, 77))
    assert((out(3L).width, out(3L).height) == (12, 8))
    assert(out(4L).width == 64 + ((8 * 131 + 4) % 193).toInt,
      "truncated payload must take the pseudo-decode fallback")
  }

  test("resize plan preserves aspect and caps the long side") {
    val m = media((1L, "z" * 500))
    val r = Multimodal.resizePlan(
      Multimodal.decodeStub(m.as[Multimodal.MediaRow]), maxSide = 100)
      .collect().head
    val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
    val (ow, oh) = (r.getAs[Int]("out_width"), r.getAs[Int]("out_height"))
    assert(math.max(ow, oh) <= 100)
    if (math.max(w, h) <= 100) assert((ow, oh) == (w, h))
    else assert(math.abs(ow.toDouble / oh - w.toDouble / h) < 0.05)
  }
}
