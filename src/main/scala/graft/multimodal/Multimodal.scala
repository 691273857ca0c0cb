package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column operators for training-data pipelines: image/audio/video
  * travel as opaque `binary` payload columns with typed metadata, and every
  * transformation is either a pure expression (slicing, hashing, counting) or
  * a typed `mapPartitions` kernel over payload batches — the Scala analogue
  * of `mapInPandas` batch processing.
  *
  * Scale design:
  *  - payloads never shuffle unless an operator needs them co-located; the
  *    frame/metadata paths below are all map-side;
  *  - the decode kernel is per-partition batched (one iterator pass, no
  *    per-row driver involvement), so at 100 TB it parallelizes by input
  *    split exactly like any scan;
  *  - [[decode]] parses real uncompressed container headers (BMP, PPM/PGM)
  *    in pure JVM code and falls back to a deterministic pseudo-decode for
  *    formats whose codecs aren't shipped here (JPEG/PNG/MP4 would slot
  *    into the same kernel via JNI/ImageIO). The schema, partitioning,
  *    kernel signature and batch shape are the production contract either
  *    way.
  */
object Multimodal {

  /** Canonical media row: opaque payload + typed metadata. */
  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** STUB decode output — deterministic pseudo-metadata derived from the
    * payload so tests/oracles are exact. A real decoder fills the same
    * fields from the actual container headers.
    */
  case class DecodedMedia(doc_id: Long, media_type: String, n_bytes: Long,
                          width: Int, height: Int, checksum: String)

  /** Fixed-size frame slicing as pure expressions: (doc_id, frame_idx,
    * frame_bytes, frame_md5). Binary `substring` + `sequence`/`explode`
    * stay codegen-friendly and map-side.
    */
  def frames(media: DataFrame, frameBytes: Int): DataFrame =
    media
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("n_frames",
        ((col("n_bytes") + frameBytes - 1) / frameBytes).cast("long"))
      .withColumn("frame_idx",
        // guard: sequence(0, -1) would generate a DESCENDING range for an
        // empty payload; emit no frames instead
        explode(when(col("n_frames") > 0,
          sequence(lit(0L), col("n_frames") - 1))
          .otherwise(array().cast("array<long>"))))
      .withColumn("frame",
        expr(s"substring(payload, cast(frame_idx * $frameBytes + 1 as int), $frameBytes)"))
      .select(col("doc_id"), col("frame_idx"),
        octet_length(col("frame")).cast("long").as("frame_bytes"),
        md5(col("frame")).as("frame_md5"))

  /** Deterministic frame sampling (first / middle / last) — the
    * frame-sample stage of a video pipeline, as pure expressions.
    */
  def frameSample(framesDf: DataFrame): DataFrame = {
    // per-doc max as a window, not a groupBy+join: one shuffle on doc_id,
    // fully parallel. (The former broadcast(groupBy) form force-broadcast
    // a one-row-PER-DOCUMENT table — data-scaled, an OOM at corpus scale.)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id")
    framesDf
      .withColumn("last_idx", max("frame_idx").over(w))
      .withColumn("mid_idx", (col("last_idx") / 2).cast("long"))
      .where(col("frame_idx") === 0 || col("frame_idx") === col("mid_idx") ||
        col("frame_idx") === col("last_idx"))
      .select(col("doc_id"), col("frame_idx"), col("frame_bytes"), col("frame_md5"))
  }

  /** Parsed netpbm binary header: dims, maxval, channel count and the byte
    * offset where the raster begins (one whitespace after maxval).
    */
  private[multimodal] case class PnmHeader(w: Int, h: Int, maxval: Int,
                                           channels: Int, rasterOff: Int)

  /** Binary PPM/PGM ("P6"/"P5") header parse with '#' comments acting as
    * token separators (netpbm's pm_getc semantics: a pending digit run
    * flushes BEFORE the comment skip). False-positive hardened — prose can
    * start "P6 ..." — by requiring a plausible maxval AND a payload large
    * enough to hold the full raster after the header.
    */
  private[multimodal] def parsePnm(p: Array[Byte]): Option[PnmHeader] = {
    if (!(p.length >= 10 && p(0) == 'P'.toByte &&
        (p(1) == '5'.toByte || p(1) == '6'.toByte) &&
        (p(2).toChar.isWhitespace || p(2) == '#'.toByte))) return None
    val vals = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 2; var cur = -1; var bad = false; var rasterOff = -1
    while (i < p.length && rasterOff < 0 && !bad) {
      val c = p(i).toChar
      if (c == '#') {
        if (cur >= 0) { vals += cur; cur = -1 }
        if (vals.length == 3) bad = true // maxval must end in whitespace
        else while (i < p.length && p(i) != '\n'.toByte) i += 1
      } else if (c.isDigit) {
        cur = (if (cur < 0) 0 else cur) * 10 + (c - '0')
        if (cur > (1 << 28)) bad = true // absurd dimension → not an image
      } else if (cur >= 0) {
        vals += cur; cur = -1
        // the single whitespace byte terminating maxval: raster starts next
        if (vals.length == 3) {
          if (c.isWhitespace) rasterOff = i + 1 else bad = true
        }
      }
      i += 1
    }
    if (!bad && rasterOff > 0 && vals(0) > 0 && vals(1) > 0 &&
        vals(2) > 0 && vals(2) <= 65535) {
      val channels = if (p(1) == '6'.toByte) 3 else 1
      val bps = if (vals(2) < 256) 1L else 2L
      val need = vals(0).toLong * vals(1).toLong * channels * bps
      // Windows-text-mode tolerance: a "\r\n" maxval terminator would leave
      // the '\n' as the first raster byte and shift every pixel by one —
      // skip it when the remaining payload still covers the raster
      val off =
        if (rasterOff < p.length && p(rasterOff - 1) == '\r'.toByte &&
            p(rasterOff) == '\n'.toByte &&
            (p.length.toLong - (rasterOff + 1)) >= need) rasterOff + 1
        else rasterOff
      if ((p.length.toLong - off) >= need)
        Some(PnmHeader(vals(0), vals(1), vals(2), channels, off))
      else None
    } else None
  }

  /** Real header parsing for the uncompressed container formats a pure-JVM
    * kernel can decode without native libs: BMP (little-endian int32 dims at
    * offsets 18/22; negative height = top-down rows) and binary PPM/PGM
    * ("P6"/"P5" ASCII header, '#' comments). Returns None for anything else.
    */
  private[multimodal] def parseDims(p: Array[Byte]): Option[(Int, Int)] = {
    def le32(o: Int): Int = (p(o) & 0xff) | (p(o + 1) & 0xff) << 8 |
      (p(o + 2) & 0xff) << 16 | (p(o + 3) & 0xff) << 24
    if (p.length >= 26 && p(0) == 'B'.toByte && p(1) == 'M'.toByte &&
        le32(6) == 0 && Set(12, 40, 52, 56, 108, 124).contains(le32(14))) {
      // reserved-zero + known DIB header size: text starting "BM" never
      // carries four NUL bytes at offset 6, so no ASCII false positives
      val (w, h) = (le32(18), math.abs(le32(22)))
      if (w > 0 && h > 0) Some((w, h)) else None
    } else parsePnm(p).map(hd => (hd.w, hd.h))
  }

  /** Compressed-image dimensions via the JDK's built-in ImageIO readers —
    * JPEG/PNG/GIF codecs ship with every JRE, no external dependency.
    * Magic-byte sniff first so arbitrary binary payloads never reach a
    * codec; the reader reads ONLY the header (getWidth/getHeight on a
    * lazily-set input), not the pixel raster, so this is scan-speed.
    */
  private[multimodal] def imageIODims(p: Array[Byte]): Option[(Int, Int)] = {
    val isJpeg = p.length >= 3 && (p(0) & 0xff) == 0xff &&
      (p(1) & 0xff) == 0xd8 && (p(2) & 0xff) == 0xff
    val isPng = p.length >= 8 && (p(0) & 0xff) == 0x89 && p(1) == 'P'.toByte &&
      p(2) == 'N'.toByte && p(3) == 'G'.toByte
    val isGif = p.length >= 6 && p(0) == 'G'.toByte && p(1) == 'I'.toByte &&
      p(2) == 'F'.toByte && p(3) == '8'.toByte
    if (!isJpeg && !isPng && !isGif) None
    else {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(p))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis, true, true)
            val (w, h) = (r.getWidth(0), r.getHeight(0))
            if (w > 0 && h > 0) Some((w, h)) else None
          } catch { case _: Exception => None } // truncated/corrupt payload
          finally r.dispose()
        }
      } finally iis.close()
    }
  }

  /** Batched per-partition decode: one iterator pass, one decoded row per
    * payload, the partition never materialized. Real container headers
    * (BMP, PPM/PGM in pure JVM code; JPEG/PNG/GIF via the JDK's ImageIO)
    * yield their true dimensions; unknown formats (video/audio containers)
    * fall back to a deterministic pseudo-decode so synthetic corpora stay
    * oracle-exact.
    */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedMedia] =
    media.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        val n = m.payload.length.toLong
        val (width, height) = parseDims(m.payload)
          .orElse(imageIODims(m.payload)).getOrElse(pseudoDims(n, m.doc_id))
        digest.reset()
        DecodedMedia(m.doc_id, m.media_type, n, width, height,
          digest.digest(m.payload).map("%02x".format(_)).mkString)
      }
    }(Encoders.product[DecodedMedia])

  /** Former name of [[decode]], kept for source compatibility. */
  def decodeStub(media: Dataset[MediaRow]): Dataset[DecodedMedia] = decode(media)

  /** Full pixel decode to a packed 0xRRGGBB row-major raster. Pure-JVM for
    * binary PPM/PGM (8-bit maxval; 16-bit stays header-only), JDK ImageIO
    * for JPEG/PNG/GIF/BMP (codecs ship with every JRE). Magic-byte sniff
    * first so arbitrary binary payloads never reach a codec. Returns None
    * for unknown/corrupt payloads — callers fall back to header-only or
    * pseudo-decode metadata.
    */
  private[multimodal] def decodeRaster(p: Array[Byte]): Option[(Int, Int, Array[Int])] =
    parsePnm(p) match {
      case Some(hd) if hd.maxval < 256 =>
        // normalize to 8-bit like ImageIO does: scale by 255/maxval
        // (round-half-up) so a maxval<255 PGM/PPM yields the same pixels —
        // and pixel_md5 — as the same image through the ImageIO path.
        // maxval=255 reduces to the identity.
        val mv = hd.maxval
        def s8(v: Int): Int = if (mv == 255) v else (v * 255 + mv / 2) / mv
        val px = new Array[Int](hd.w * hd.h)
        var i = 0
        while (i < px.length) {
          val o = hd.rasterOff + i * hd.channels
          val r = s8(p(o) & 0xff)
          val g = if (hd.channels == 3) s8(p(o + 1) & 0xff) else r
          val b = if (hd.channels == 3) s8(p(o + 2) & 0xff) else r
          px(i) = r << 16 | g << 8 | b
          i += 1
        }
        Some((hd.w, hd.h, px))
      case Some(_) => None // 16-bit netpbm: header-only path
      case None =>
        val sniffed = imageIODims(p).isDefined ||
          (p.length >= 26 && p(0) == 'B'.toByte && p(1) == 'M'.toByte &&
            parseDims(p).isDefined)
        if (!sniffed) None
        else try {
          Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p)))
            .map { img =>
              val (w, h) = (img.getWidth, img.getHeight)
              val px = img.getRGB(0, 0, w, h, null, 0, w)
              var i = 0
              while (i < px.length) { px(i) &= 0xffffff; i += 1 }
              (w, h, px)
            }
        } catch { case _: Exception => None } // truncated/corrupt payload
    }

  /** Bilinear resample of a packed 0xRRGGBB raster — half-pixel-centered
    * source mapping (the standard convention: src = (dst + 0.5)·ratio − 0.5,
    * edge-clamped), per-channel interpolation, round-to-nearest.
    */
  private[multimodal] def bilinearResize(src: Array[Int], w: Int, h: Int,
                                         ow: Int, oh: Int): Array[Int] = {
    val out = new Array[Int](ow * oh)
    val xr = w.toDouble / ow; val yr = h.toDouble / oh
    var y = 0
    while (y < oh) {
      val sy = math.min(math.max((y + 0.5) * yr - 0.5, 0.0), h - 1.0)
      val y0 = sy.toInt; val y1 = math.min(y0 + 1, h - 1); val fy = sy - y0
      var x = 0
      while (x < ow) {
        val sx = math.min(math.max((x + 0.5) * xr - 0.5, 0.0), w - 1.0)
        val x0 = sx.toInt; val x1 = math.min(x0 + 1, w - 1); val fx = sx - x0
        val p00 = src(y0 * w + x0); val p01 = src(y0 * w + x1)
        val p10 = src(y1 * w + x0); val p11 = src(y1 * w + x1)
        var px = 0; var sh = 16
        while (sh >= 0) {
          val c00 = (p00 >> sh) & 0xff; val c01 = (p01 >> sh) & 0xff
          val c10 = (p10 >> sh) & 0xff; val c11 = (p11 >> sh) & 0xff
          val top = c00 + (c01 - c00) * fx
          val bot = c10 + (c11 - c10) * fx
          px |= math.round(top + (bot - top) * fy).toInt << sh
          sh -= 8
        }
        out(y * ow + x) = px
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decoded-and-resized media row: metadata + the resample result.
    * `decoded` marks payloads whose pixel raster was actually read;
    * `pixel_md5` is the checksum of the resized raster's row-major RGB
    * triplets (None on the metadata-only fallback path).
    */
  case class ResizedMedia(doc_id: Long, media_type: String, n_bytes: Long,
                          width: Int, height: Int, checksum: String,
                          out_width: Int, out_height: Int,
                          decoded: Boolean, pixel_md5: Option[String])

  /** Decode + bilinear-resize kernel: one batched mapPartitions pass, the
    * real raster for every payload [[decodeRaster]] can read (netpbm /
    * JPEG / PNG / GIF / BMP), aspect-preserving box scale to `maxSide`,
    * and an RGB checksum of the resampled pixels. Unknown formats keep the
    * deterministic metadata path (same dims/out-dims rule as [[resizePlan]])
    * with `decoded = false`. At 100 TB this parallelizes by input split like
    * any scan — pixels never shuffle; only metadata + checksum leave the
    * task.
    */
  def resize(media: Dataset[MediaRow], maxSide: Int): Dataset[ResizedMedia] =
    media.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      def hex(b: Array[Byte]): String = {
        digest.reset(); digest.digest(b).map("%02x".format(_)).mkString
      }
      it.map { m =>
        val n = m.payload.length.toLong
        decodeRaster(m.payload) match {
          case Some((w, h, px)) =>
            val (ow, oh) = fitBox(w, h, maxSide)
            val out = if (ow == w && oh == h) px
                      else bilinearResize(px, w, h, ow, oh)
            val rgb = new Array[Byte](out.length * 3)
            var i = 0
            while (i < out.length) {
              rgb(3 * i) = ((out(i) >> 16) & 0xff).toByte
              rgb(3 * i + 1) = ((out(i) >> 8) & 0xff).toByte
              rgb(3 * i + 2) = (out(i) & 0xff).toByte
              i += 1
            }
            val pmd5 = hex(rgb)
            ResizedMedia(m.doc_id, m.media_type, n, w, h, hex(m.payload),
              ow, oh, decoded = true, Some(pmd5))
          case None =>
            val (w, h) = parseDims(m.payload).orElse(imageIODims(m.payload))
              .getOrElse(pseudoDims(n, m.doc_id))
            val (ow, oh) = fitBox(w, h, maxSide)
            ResizedMedia(m.doc_id, m.media_type, n, w, h, hex(m.payload),
              ow, oh, decoded = false, None)
        }
      }
    }(Encoders.product[ResizedMedia])

  /** Deterministic pseudo-decode fallback dims — ORACLE-MIRRORED (the
    * DuckDB mm_* gates replay this exact formula): one definition so the
    * decode and resize paths can never drift apart.
    */
  private[multimodal] def pseudoDims(nBytes: Long, docId: Long): (Int, Int) =
    (64 + ((nBytes * 131L + docId) % 193L).toInt,
      64 + ((nBytes * 37L + docId * 7L) % 157L).toInt)

  /** Aspect-preserving fit into a maxSide box: the LONG side lands EXACTLY
    * on maxSide — the former floor(side · (maxSide/long)) FP-rounded below
    * it for many sizes (7·(3/7) = 2.999…, floor → 2) — and the short side
    * floors side·maxSide/long: integer-exact operands, one IEEE division,
    * so every engine computes the identical result.
    */
  private[multimodal] def fitBox(w: Int, h: Int, maxSide: Int): (Int, Int) =
    if (math.max(w, h) <= maxSide) (w, h)
    else if (w >= h)
      (maxSide, math.max(1, math.floor(h.toDouble * maxSide / w).toInt))
    else
      (math.max(1, math.floor(w.toDouble * maxSide / h).toInt), maxSide)

  /** Resize metadata stage (header-only decode downstream): target box
    * scaling with aspect preservation — pure arithmetic on the decoded
    * metadata; [[resize]] is the full-raster variant in the same kernel
    * family.
    */
  def resizePlan(decoded: Dataset[DecodedMedia], maxSide: Int): DataFrame =
    decoded.toDF()
      .withColumn("out_width",
        when(greatest(col("width"), col("height")) <= maxSide, col("width"))
          .when(col("width") >= col("height"), lit(maxSide))
          .otherwise(greatest(lit(1), floor(
            col("width").cast("double") * maxSide / col("height"))).cast("int")))
      .withColumn("out_height",
        when(greatest(col("width"), col("height")) <= maxSide, col("height"))
          .when(col("height") > col("width"), lit(maxSide))
          .otherwise(greatest(lit(1), floor(
            col("height").cast("double") * maxSide / col("width"))).cast("int")))
}
