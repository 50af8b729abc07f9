package graft

import graft.ops.Multimodal
import graft.ops.Multimodal.ImageHeader

/** The image header codec: encode→parse round trips across the legal
  * parameter space, spec-violation rejection, and truncation safety
  * (every byte prefix of a valid stream must classify, never throw).
  * The q33 gate proves the distributed path + oracle agreement; this
  * spec proves the parser against the container specs directly. */
class MultimodalSpec extends SparkSuite {

  test("PNG round trip: all color types, legal depths, boundary sizes") {
    val channelsOf = Map(0 -> 1, 2 -> 3, 3 -> 1, 4 -> 2, 6 -> 4)
    for {
      (ct, ch) <- channelsOf
      depth <- Seq(1, 2, 4, 8, 16)
      // depth restrictions (ISO/IEC 15948 table 11.1) don't matter to
      // the header parse; exercise the full grid anyway
      (w, h) <- Seq((1, 1), (640, 480), (70000, 3), (Int.MaxValue, 1))
    } {
      val parsed = Multimodal.parseImageHeader(Multimodal.encodePng(w, h, ct, depth))
      assert(parsed == Right(ImageHeader("png", w, h, ch, depth)),
        s"ct=$ct depth=$depth w=$w h=$h -> $parsed")
    }
  }

  test("JPEG round trip: component counts, 12-bit precision, 16-bit dims") {
    for {
      ncomp <- Seq(1, 3, 4)
      precision <- Seq(8, 12)
      (w, h) <- Seq((1, 1), (640, 480), (65535, 65535))
    } {
      val parsed = Multimodal.parseImageHeader(
        Multimodal.encodeJpeg(w, h, ncomp, precision))
      assert(parsed == Right(ImageHeader("jpeg", w, h, ncomp, precision)),
        s"ncomp=$ncomp precision=$precision w=$w h=$h -> $parsed")
    }
  }

  test("every byte prefix classifies without throwing; Right exactly when complete") {
    val png = Multimodal.encodePng(640, 480, 2, 8)
    for (k <- 0 to png.length) {
      val r = Multimodal.parseImageHeader(png.take(k))
      // PNG header parse needs sig(8) + len(4) + type(4) + IHDR(13) = 29
      if (k < 29) assert(r.isLeft, s"png prefix $k -> $r")
      else assert(r == Right(ImageHeader("png", 640, 480, 3, 8)), s"png prefix $k")
    }
    val jpg = Multimodal.encodeJpeg(640, 480, 3)
    for (k <- 0 to jpg.length) {
      val r = Multimodal.parseImageHeader(jpg.take(k))
      // SOI(2) + APP0(2+16) + SOF marker/len(4) + P,Y,X,Nf(6) = 30
      if (k < 30) assert(r.isLeft, s"jpeg prefix $k -> $r")
      else assert(r == Right(ImageHeader("jpeg", 640, 480, 3, 8)), s"jpeg prefix $k")
    }
  }

  test("JPEG fill bytes before markers parse per T.81 B.1.1.2") {
    // any number of 0xFF fill bytes may precede a marker byte; insert
    // runs before APP0 and before SOF0 and the header must still parse
    val base = Multimodal.encodeJpeg(640, 480, 3)
    def withFill(at: Int, n: Int): Array[Byte] =
      base.take(at) ++ Array.fill(n)(0xff.toByte) ++ base.drop(at)
    for (n <- Seq(1, 2, 7)) {
      assert(Multimodal.parseImageHeader(withFill(2, n)) ==
        Right(ImageHeader("jpeg", 640, 480, 3, 8)), s"fill $n before APP0")
      // SOF0 marker starts at SOI(2) + APP0(2+16) = 20
      assert(Multimodal.parseImageHeader(withFill(20, n)) ==
        Right(ImageHeader("jpeg", 640, 480, 3, 8)), s"fill $n before SOF0")
    }
    // a stream that ENDS inside a fill run is truncated, not bad
    assert(Multimodal.parseImageHeader(
      Array(0xff, 0xd8, 0xff, 0xff, 0xff).map(_.toByte)) == Left("truncated"))
  }

  test("imageQualityFilter: aspect arithmetic survives Int.MaxValue dimensions") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 2,200,000 x 1,000 is spec-legal PNG and aspect 2200:1 — a 32-bit
    // greatest*1000 would wrap negative and ADMIT it
    val rows = Seq((1L, true, Some(2200000), Some(1000), Some(3)),
      (2L, true, Some(Int.MaxValue), Some(Int.MaxValue), Some(3)))
    val out = graft.ops.Multimodal.imageQualityFilter(
        rows.toDF("media_id", "ok", "width", "height", "channels"))
      .orderBy(col("media_id")).select("keep").collect()
      .map(r => !r.isNullAt(0) && r.getBoolean(0))
    assert(out.toSeq == Seq(false, true))
  }

  test("spec violations reject with the right reason") {
    def mut(b: Array[Byte])(f: Array[Byte] => Unit): Array[Byte] = {
      val c = b.clone(); f(c); c
    }
    val png = Multimodal.encodePng(640, 480, 2, 8)
    // zeroed magic byte
    assert(Multimodal.parseImageHeader(mut(png)(_(0) = 0)) == Left("bad_magic"))
    // signature corrupted mid-way
    assert(Multimodal.parseImageHeader(mut(png)(_(4) = 'X'.toByte)) == Left("bad_magic"))
    // illegal color type / bit depth / zero width
    assert(Multimodal.parseImageHeader(mut(png)(_(25) = 5)) == Left("bad_header"))
    assert(Multimodal.parseImageHeader(mut(png)(_(24) = 3)) == Left("bad_header"))
    assert(Multimodal.parseImageHeader(
      mut(png) { b => b(16) = 0; b(17) = 0; b(18) = 0; b(19) = 0 }) == Left("bad_header"))
    // first chunk not IHDR
    assert(Multimodal.parseImageHeader(mut(png)(_(12) = 'J'.toByte)) == Left("bad_header"))
    // JPEG: EOI straight after SOI -> no frame header
    assert(Multimodal.parseImageHeader(
      Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)) == Left("no_sof"))
    // JPEG: garbage where a marker must be
    assert(Multimodal.parseImageHeader(
      Array(0xff, 0xd8, 0x00, 0x00).map(_.toByte)) == Left("bad_header"))
    // JPEG: zero components is spec-invalid
    val jz = Multimodal.encodeJpeg(640, 480, 1)
    // SOI(2)+APP0(18): Nf byte sits at marker+9 = 20+9
    assert(Multimodal.parseImageHeader(mut(jz)(_(29) = 0)) == Left("bad_header"))
    // empty / single byte
    assert(Multimodal.parseImageHeader(Array.emptyByteArray) == Left("truncated"))
    assert(Multimodal.parseImageHeader(Array(0x89.toByte)) == Left("truncated"))
    assert(Multimodal.parseImageHeader("plain text".getBytes("UTF-8")) == Left("bad_magic"))
  }

  test("imageQualityFilter boundaries: min dim, exact 2:1 aspect, channel floor") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // (id, ok, width, height, channels) hand-placed on each boundary
    val rows = Seq(
      (1L, true, Some(32), Some(32), Some(3)),   // all at minimum -> keep
      (2L, true, Some(31), Some(32), Some(3)),   // width under -> drop
      (3L, true, Some(64), Some(32), Some(3)),   // exactly 2:1 -> keep
      (4L, true, Some(65), Some(32), Some(3)),   // just past 2:1 -> drop
      (5L, true, Some(32), Some(32), Some(2)),   // gray+alpha -> drop
      (6L, false, Option.empty[Int], Option.empty[Int], Option.empty[Int]))
    val out = graft.ops.Multimodal.imageQualityFilter(
        rows.toDF("media_id", "ok", "width", "height", "channels"))
      .orderBy(col("media_id")).select("keep").collect()
      .map(r => !r.isNullAt(0) && r.getBoolean(0))
    assert(out.toSeq == Seq(true, false, true, false, false, false))
  }

  test("imageHeaders: distributed decode routes dead letters in-band") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (1L, "0", Multimodal.encodePng(12, 34, 6, 8)),
      (2L, "1", Multimodal.encodeJpeg(56, 78, 3)),
      (3L, "2", Multimodal.encodePng(1, 1, 0, 16).take(6)),
      (4L, "0", "not an image".getBytes("UTF-8")))
    val out = Multimodal.imageHeaders(spark,
        rows.toDF("media_id", "kind", "media"))
      .orderBy(col("media_id"))
      .collect()
    assert(out(0).getBoolean(2) && out(0).getString(4) == "png" &&
      out(0).getInt(5) == 12 && out(0).getInt(6) == 34 &&
      out(0).getInt(7) == 4 && out(0).getInt(8) == 8)
    assert(out(1).getBoolean(2) && out(1).getString(4) == "jpeg" &&
      out(1).getInt(5) == 56 && out(1).getInt(6) == 78 && out(1).getInt(7) == 3)
    assert(!out(2).getBoolean(2) && out(2).getString(3) == "truncated" &&
      out(2).isNullAt(4))
    assert(!out(3).getBoolean(2) && out(3).getString(3) == "bad_magic")
  }

  test("WAV round trip: channel/rate/depth grid, exact duration floor") {
    for {
      ch <- Seq(1, 2, 6)
      rate <- Seq(8000, 44100, 48000)
      bits <- Seq(8, 16, 24)
      n <- Seq(0, 1, 97, 4410)
    } {
      val hd = Multimodal.parseWavHeader(
        Multimodal.encodeWav(ch, rate, bits, n))
      assert(hd == Right(Multimodal.WavHeader(ch, rate, bits, n.toLong,
        n.toLong * 1000000L / rate)), s"ch=$ch rate=$rate bits=$bits n=$n")
    }
  }

  test("WAV: every byte prefix classifies without throwing") {
    val full = Multimodal.encodeWav(2, 16000, 16, 5)
    (0 until full.length).foreach { n =>
      val r = Multimodal.parseWavHeader(full.take(n))
      // mid-structure cuts are truncated; a cut landing exactly on a
      // chunk boundary is a well-formed stream that lacks a data
      // chunk (12 = bare RIFF/WAVE, 36 = descriptor + whole fmt)
      val expected = if (n == 12 || n == 36) Left("no_data")
                     else Left("truncated")
      assert(r == expected, s"prefix $n -> $r")
    }
    assert(Multimodal.parseWavHeader(full).isRight)
  }

  test("WAV spec violations reject with the right reason") {
    def mut(i: Int, v: Int): Array[Byte] = {
      val b = Multimodal.encodeWav(2, 16000, 16, 5); b(i) = v.toByte; b
    }
    assert(Multimodal.parseWavHeader(mut(0, 'X')) == Left("bad_magic"))
    assert(Multimodal.parseWavHeader(mut(8, 'X')) == Left("bad_magic"))
    // fmt chunk: non-PCM audio format
    assert(Multimodal.parseWavHeader(mut(20, 3)) == Left("bad_header"))
    // zero channels; inconsistent block align; inconsistent byte rate
    assert(Multimodal.parseWavHeader(mut(22, 0)) == Left("bad_header"))
    assert(Multimodal.parseWavHeader(mut(32, 7)) == Left("bad_header"))
    assert(Multimodal.parseWavHeader(mut(28, 9)) == Left("bad_header"))
    // fmt present but the data chunk id clobbered -> walks off: no_data
    assert(Multimodal.parseWavHeader(mut(36, 'x')) == Left("no_data"))
    // data chunk declares more bytes than the stream carries
    val overrun = Multimodal.encodeWav(1, 8000, 8, 4)
    overrun(40) = 99 // data size low byte: 4 -> 99
    assert(Multimodal.parseWavHeader(overrun) == Left("truncated"))
  }

  test("wavHeaders: distributed decode routes dead letters in-band") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (1L, "audio", Multimodal.encodeWav(2, 44100, 16, 441)),
      (2L, "audio", Multimodal.encodeWav(1, 8000, 8, 3).take(10)),
      (3L, "audio", "RIFFxxxxJUNK".getBytes("US-ASCII")))
    val out = Multimodal.wavHeaders(spark,
        rows.toDF("media_id", "kind", "media"))
      .orderBy(col("media_id")).collect()
    assert(out(0).getBoolean(1) && out(0).getInt(3) == 2 &&
      out(0).getInt(4) == 44100 && out(0).getInt(5) == 16 &&
      out(0).getLong(6) == 441L && out(0).getLong(7) == 10000L)
    assert(!out(1).getBoolean(1) && out(1).getString(2) == "truncated")
    assert(!out(2).getBoolean(1) && out(2).getString(2) == "bad_magic")
  }

  // ---- ISO-BMFF (MP4) -------------------------------------------------

  test("MP4 round trip: brands, timescales, dims, track counts") {
    for {
      brand <- Seq("isom", "mp42", "avc1")
      (ts, dur) <- Seq((600L, 1L), (1000L, 999L), (90000L, 123456L))
      (w, h) <- Seq((1, 1), (1920, 1080), (65535, 65535))
      n <- Seq(1, 2, 3)
    } {
      val parsed = Multimodal.parseMp4Header(
        Multimodal.encodeMp4(brand, ts, dur, w, h, n))
      assert(parsed == Right(Multimodal.Mp4Header(
        brand, n, ts, dur, dur * 1000000L / ts, w, h)),
        s"brand=$brand ts=$ts dur=$dur w=$w h=$h n=$n -> $parsed")
    }
  }

  test("MP4: every strict byte prefix classifies Left without throwing") {
    val full = Multimodal.encodeMp4("isom", 1000, 500, 640, 480, 2)
    val want = Multimodal.parseMp4Header(full)
    assert(want.isRight)
    for (k <- 0 until full.length) {
      val r = Multimodal.parseMp4Header(full.take(k))
      // the only clean cut is the ftyp/moov boundary (no moov yet);
      // everything else lands inside a promised structure
      assert(r == Left("truncated") || r == Left("bad_magic") ||
        r == Left("no_moov"), s"prefix $k -> $r")
    }
  }

  test("MP4 dead letters: magic, zero timescale, undersized box, missing mvhd") {
    val good = Multimodal.encodeMp4("isom", 600, 60, 320, 240, 1)
    val clobbered = good.clone(); clobbered(4) = 'X'.toByte
    assert(Multimodal.parseMp4Header(clobbered) == Left("bad_magic"))
    assert(Multimodal.parseMp4Header(
      Multimodal.encodeMp4("isom", 0, 60, 320, 240, 1)) == Left("bad_header"))
    // a top-level box after ftyp declaring size 4 (< 8) is bad_header
    val tiny = good.take(24) ++ Array[Byte](0, 0, 0, 4) ++
      "free".getBytes("US-ASCII")
    assert(Multimodal.parseMp4Header(tiny) == Left("bad_header"))
    // moov without mvhd: an empty moov box
    val emptyMoov = good.take(24) ++ Array[Byte](0, 0, 0, 8) ++
      "moov".getBytes("US-ASCII")
    assert(Multimodal.parseMp4Header(emptyMoov) == Left("bad_header"))
    // a file that is just ftyp: clean walk, no moov
    assert(Multimodal.parseMp4Header(good.take(24)) == Left("no_moov"))
  }

  test("MP4: 64-bit largesize and version-1 mvhd/tkhd parse") {
    def be32a(v: Long): Array[Byte] = Array(
      ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64a(v: Long): Array[Byte] = be32a(v >>> 32) ++ be32a(v & 0xffffffffL)
    def boxOf(typ: String, body: Array[Byte]): Array[Byte] =
      be32a(8L + body.length) ++ typ.getBytes("US-ASCII") ++ body
    def largeBoxOf(typ: String, body: Array[Byte]): Array[Byte] =
      be32a(1L) ++ typ.getBytes("US-ASCII") ++ be64a(16L + body.length) ++ body
    val matrix = Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L,
      0x40000000L).flatMap(be32a).toArray
    val ftyp = boxOf("ftyp", "isom".getBytes("US-ASCII") ++ be32a(0L) ++
      "isom".getBytes("US-ASCII"))
    // v1 mvhd: 64-bit creation/modification/duration
    val mvhdV1 = boxOf("mvhd", Array[Byte](1, 0, 0, 0) ++
      be64a(0L) ++ be64a(0L) ++ be32a(90000L) ++ be64a(5000000000L) ++
      be32a(0x00010000L) ++ Array[Byte](0x01, 0x00) ++
      Array.fill[Byte](10)(0) ++ matrix ++ Array.fill[Byte](24)(0) ++
      be32a(2L))
    // v1 tkhd: 64-bit creation/modification/duration
    val tkhdV1 = boxOf("tkhd", Array[Byte](1, 0, 0, 7) ++
      be64a(0L) ++ be64a(0L) ++ be32a(1L) ++ be32a(0L) ++ be64a(5000000000L) ++
      Array.fill[Byte](16)(0) ++ matrix ++
      be32a(1280L << 16) ++ be32a(720L << 16))
    // moov carried in a largesize box
    val moov = largeBoxOf("moov", mvhdV1 ++ boxOf("trak", tkhdV1))
    val parsed = Multimodal.parseMp4Header(ftyp ++ moov)
    assert(parsed == Right(Multimodal.Mp4Header("isom", 1, 90000L,
      5000000000L, 5000000000L * 1000000L / 90000L, 1280, 720)), parsed.toString)
  }

  test("mp4Headers: distributed decode routes dead letters in-band") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (1L, "video", Multimodal.encodeMp4("mp42", 1000, 2500, 1920, 1080, 2)),
      (2L, "video", Multimodal.encodeMp4("isom", 600, 60, 320, 240, 1).take(9)),
      (3L, "video", "not a bmff stream".getBytes("US-ASCII")))
    val out = Multimodal.mp4Headers(spark,
        rows.toDF("media_id", "kind", "media"))
      .orderBy(col("media_id")).collect()
    assert(out(0).getBoolean(1) && out(0).getString(3) == "mp42" &&
      out(0).getInt(4) == 2 && out(0).getLong(5) == 1000L &&
      out(0).getLong(6) == 2500L && out(0).getLong(7) == 2500000L &&
      out(0).getInt(8) == 1920 && out(0).getInt(9) == 1080)
    assert(!out(1).getBoolean(1) && out(1).getString(2) == "truncated")
    assert(!out(2).getBoolean(1) && out(2).getString(2) == "bad_magic")
  }

  test("mediaDedupExact: byte-identity groups, min-id rep, null " +
      "payload excluded, near-identical bytes stay apart") {
    import spark.implicits._
    val wavA = Multimodal.encodeWav(1, 8000, 8, 10)
    val wavB = Multimodal.encodeWav(2, 8000, 8, 10) // differs in header
    val wavC = wavA.clone(); wavC(wavC.length - 1) =
      (wavC(wavC.length - 1) ^ 1).toByte // one payload bit flipped
    val rows = Seq(
      (5L, wavA), (3L, wavA), (9L, wavA), // trip of exact dupes
      (2L, wavB), (7L, wavC),
      (8L, null.asInstanceOf[Array[Byte]]))
    val out = Multimodal.mediaDedupExact(
        rows.toDF("media_id", "media"), "media_id", "media")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2)))
      .toMap
    assert(out.keySet == Set(3L, 2L, 7L)) // min ids; null excluded
    assert(out(3L) == ((3L, wavA.length))) // the trio collapses to one
    assert(out(2L) == ((1L, wavB.length)))
    // same length + 1-bit payload difference must NOT merge
    assert(wavA.length == wavC.length)
    assert(out(7L) == ((1L, wavC.length)))
  }

  test("PNG pixel round trip: decode(encode) bit-exact under every " +
      "filter predictor, per-row filter mix, odd sizes") {
    def pix(x: Int, y: Int): Int = (x * 31 + y * 57 + (x * y) % 13) % 256
    // each single filter type, then the cycling mix, on a size whose
    // rows exercise left/up/up-left edges; plus 1-pixel and odd dims
    for (f <- 0 to 4; (w, h) <- Seq((1, 1), (7, 3), (16, 16))) {
      val enc = Multimodal.encodePngGray(w, h, pix, _ => f)
      val got = Multimodal.decodePngGray(enc)
      val want = (0 until h).flatMap(y => (0 until w).map(x => pix(x, y)))
      assert(got.exists(t => t._1 == w && t._2 == h &&
        t._3.toSeq == want), s"f=$f w=$w h=$h -> $got")
    }
    val mixed = Multimodal.encodePngGray(16, 16, pix, y => y % 5)
    val dm = Multimodal.decodePngGray(mixed)
    assert(dm.exists(t => t._1 == 16 && t._2 == 16 && t._3.toSeq ==
      (0 until 16).flatMap(y => (0 until 16).map(x => pix(x, y)))))
    // the header tier agrees on the same payload
    assert(Multimodal.parseImageHeader(mixed) ==
      Right(Multimodal.ImageHeader("png", 16, 16, 1, 8)))
  }

  test("PNG pixel dead letters: truncation at every prefix, bad_crc, " +
      "bad_filter, bad_magic, unsupported colour") {
    val good = Multimodal.encodePngGray(8, 8, (x, y) => x * 8 + y, _ => 2)
    // every strict byte prefix classifies Left without throwing
    for (n <- 0 until good.length) {
      val r = Multimodal.decodePngGray(good.take(n))
      assert(r.isLeft, s"prefix $n decoded")
      assert(r.swap.exists(Set("truncated", "bad_crc", "bad_magic")),
        s"prefix $n -> $r") // a cut inside a chunk body breaks its CRC
    }
    // flipping any single IDAT-data byte must surface as bad_crc
    val corrupt = good.clone(); corrupt(45) = (corrupt(45) ^ 0x5a).toByte
    assert(Multimodal.decodePngGray(corrupt) == Left("bad_crc"))
    assert(Multimodal.decodePngGray(
      "not a png at all".getBytes("US-ASCII")) == Left("bad_magic"))
    // truecolour DECODES since r19 — a header-only ct=2 container
    // now reads truncated (no IDAT data); palette (ct=3) stays the
    // unsupported lane
    assert(Multimodal.decodePngGray(
      Multimodal.encodePng(4, 4, colorType = 2, bitDepth = 8)) ==
      Left("truncated"))
    assert(Multimodal.decodePngGray(
      Multimodal.encodePng(4, 4, colorType = 3, bitDepth = 8)) ==
      Left("unsupported"))
    // filter byte 7: rebuild the stream with a corrupt scanline —
    // deflate(7 ++ row) wrapped in hand-built chunks with REAL CRCs,
    // so only the filter check can reject it
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val len = data.length
      val head = Array(((len >>> 24) & 0xff).toByte,
        ((len >>> 16) & 0xff).toByte, ((len >>> 8) & 0xff).toByte,
        (len & 0xff).toByte)
      val td = typ.getBytes("US-ASCII") ++ data
      val crc = new java.util.zip.CRC32(); crc.update(td)
      val c = crc.getValue
      head ++ td ++ Array(((c >>> 24) & 0xff).toByte,
        ((c >>> 16) & 0xff).toByte, ((c >>> 8) & 0xff).toByte,
        (c & 0xff).toByte)
    }
    val raw = Array[Byte](7, 1, 2) // filter 7, two samples
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val z = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](256)
    while (!defl.finished()) z.write(buf, 0, defl.deflate(buf))
    defl.end()
    val ihdr = Array[Byte](0, 0, 0, 2, 0, 0, 0, 1, 8, 0, 0, 0, 0)
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    val badFilter = sig ++ chunk("IHDR", ihdr) ++
      chunk("IDAT", z.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
    assert(Multimodal.decodePngGray(badFilter) == Left("bad_filter"))
  }

  test("perceptual hashes: brightness-shift invariance, hand aHash " +
      "on an 8×8 image, bad_dims lane") {
    import spark.implicits._
    def media(rows: Seq[(Long, Array[Byte])]) =
      rows.map { case (id, b) => (id, "png", b) }
        .toDF("media_id", "kind", "media")
    // 8×8: blocks are single pixels, so the aHash is p ≥ mean and the
    // dHash is p(x) > p(x+1) — hand-computable. Gradient image:
    // p = x*2 + y (mean = 10.5 → aHash bit iff 2x+y ≥ 10.5... integer
    // form: p*64 ≥ total with total = 672, i.e. 64p ≥ 672 ⇔ p ≥ 10.5)
    def grad(shift: Int)(x: Int, y: Int): Int = x * 2 + y + shift
    val imgs = media(Seq(
      1L -> Multimodal.encodePngGray(8, 8, grad(0), _ => 4),
      2L -> Multimodal.encodePngGray(8, 8, grad(30), y => y % 5),
      3L -> Multimodal.encodePngGray(7, 8, grad(0), _ => 0)))
    val out = Multimodal.imagePerceptualHashes(spark, imgs)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1),
          if (r.isNullAt(3)) null else (r.getLong(3), r.getLong(4),
            r.getLong(5)),
          if (r.isNullAt(2)) null else r.getString(2))).toMap
    // hand aHash: bit(x,y) = 1 iff 2x+y ≥ 11 (p integer ⇒ ≥ 10.5 ⇔ ≥ 11)
    var hi = 0L; var lo = 0L; var dh = 0L
    for (y <- 0 until 8; x <- 0 until 8) {
      val idx = y * 8 + x
      if (2 * x + y >= 11) {
        if (idx >= 32) hi |= 1L << (idx - 32) else lo |= 1L << idx
      }
      // strictly increasing in x ⇒ every dHash bit 0
    }
    assert(out(1L) == ((true, (hi, lo, dh), null)))
    // +30 brightness: identical hashes (and a different filter mix —
    // the hash sees pixels, not encoding choices)
    assert(out(2L) == ((true, (hi, lo, dh), null)))
    assert(out(3L) == ((false, null, "bad_dims")))
  }

  test("perceptualNearDupPairs: planted near-dup found through the " +
      "bands, hamming-4 pair rejected, distinct collapse") {
    import spark.implicits._
    def img(f: (Int, Int) => Int) =
      Multimodal.encodePngGray(16, 16, f, y => y % 5)
    // base: block-checkerboard (strong bit structure); near: one
    // corner block brightened (≤ 3 bits move); far: inverted pattern
    def base(x: Int, y: Int): Int =
      40 + (if (((x / 2) + (y / 2)) % 2 == 0) 120 else 0)
    val rows = Seq(
      10L -> img(base),
      11L -> img((x, y) => base(x, y) + 7), // brightness: hamming 0
      // near dup: the bright corner block dropped BELOW the global
      // mean (160 → 40 per pixel) — flips exactly that aHash bit
      12L -> img((x, y) =>
        base(x, y) - (if (x < 2 && y < 2) 120 else 0)),
      13L -> img((x, y) =>
        40 + (if (((x / 2) + (y / 2)) % 2 == 1) 120 else 0))) // far
      .map { case (id, b) => (id, "png", b) }
      .toDF("media_id", "kind", "media")
    val hashes = Multimodal.imagePerceptualHashes(spark, rows)
    val pairs = Multimodal.perceptualNearDupPairs(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2))
      .toMap
    assert(pairs((10L, 11L)) == 0)
    assert(pairs.contains((10L, 12L)) && pairs((10L, 12L)) >= 1)
    // the inverted image flips all 64 bits vs every variant — its
    // bands CAN'T collide with theirs, and hamming 64 > 3 anyway
    assert(!pairs.keySet.exists(p => p._1 == 13L || p._2 == 13L))
    // each surviving pair appears exactly once despite multi-band
    // agreement (hamming-0 pairs share all 4 bands)
    val all = Multimodal.perceptualNearDupPairs(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(all.length == all.distinct.length)
  }

  /** Independent DCT hash reference: BigInt accumulation in the
    * OPPOSITE loop nesting (v-major, no row-sum factoring) + a Seq
    * sort for the median — shares nothing with the kernel but the
    * cosine table (which IS the contract: one shared table, two
    * independent consumers). */
  private def refDctHash(p: (Int, Int) => Int): Long = {
    val f = for (u <- 0 until 8; v <- 0 until 8) yield {
      var acc = BigInt(0)
      for (x <- 0 until 16; y <- 0 until 16)
        acc += BigInt(p(x, y)) * Multimodal.cosMicro(u)(x) *
          Multimodal.cosMicro(v)(y)
      (u * 8 + v, acc)
    }
    val keep = f.filter { case (i, _) => i != 0 && i != 63 }
    val med = keep.map(_._2).sorted.apply(30)
    keep.filter(_._2 > med)
      .map { case (i, _) => 1L << i }.foldLeft(0L)(_ | _)
  }

  test("imageDctHash: ≡ BigInt opposite-order reference, brightness " +
      "lands in the discarded DC (identical hash), bad_dims lane, " +
      "every coefficient inside int64") {
    import spark.implicits._
    def img(f: (Int, Int) => Int) =
      Multimodal.encodePngGray(16, 16, f, y => y % 5)
    def tex(x: Int, y: Int): Int =
      (x * x * 3 + y * 7 + (x * y) % 11) % 200
    val rows = Seq(
      (20L, "png", img(tex)),
      (21L, "png", img((x, y) => tex(x, y) + 55)),       // +DC only
      (22L, "png", img((x, y) => 255 - tex(x, y))),      // inverted
      (23L, "png", Multimodal.encodePngGray(8, 8,
        (x, y) => x + y, _ => 0)))                       // bad dims
      .toDF("media_id", "kind", "media")
    val out = Multimodal.imageDctHash(spark, rows)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(2)) null else r.getString(2)))).toMap
    assert(out(20L) == ((true, refDctHash(tex), null)))
    assert(out(21L)._2 == out(20L)._2,
      "a uniform +55 must land entirely in the discarded DC term")
    assert(out(22L) == ((true,
      refDctHash((x, y) => 255 - tex(x, y)), null)))
    assert(out(22L)._2 != out(20L)._2)
    assert(out(23L) == ((false, -1L, "bad_dims")))
    // worst-case magnitude claim in the scaladoc: all-255 image
    val extreme = refDctHash((_, _) => 255) // must not throw/overflow
    assert(extreme == 0L) // constant image: every AC coefficient ties
  }

  test("decodeWavPcm: round trip for 8-bit and 16-bit, stereo " +
      "mix-down, dead-letter lanes") {
    val s8 = Array(128, 130, 126, 228, 28) // centered: 0, 2, -2, 100, -100
    val b8 = Multimodal.encodeWavSamples(1, 8000, 8, s8)
    assert(Multimodal.decodeWavPcm(b8).exists(t =>
      t._1 == 1 && t._2 == 8000 &&
        t._3.toSeq == Seq(0, 2, -2, 100, -100)))
    val s16 = Array(0, 256, -256, 25600, -25600)
    val r16 = Multimodal.decodeWavPcm(
      Multimodal.encodeWavSamples(1, 16000, 16, s16))
    assert(r16.exists(t => t._2 == 16000 &&
      t._3.toSeq == Seq(0, 1, -1, 100, -100)))
    // stereo: mix-down sums the centered channels per frame
    val st = Array(130, 126, 228, 28) // frames: (2,-2), (100,-100)
    val rs = Multimodal.decodeWavPcm(
      Multimodal.encodeWavSamples(2, 8000, 8, st))
    assert(rs.exists(t => t._1 == 2 && t._3.toSeq == Seq(0, 0)))
    // dead letters
    assert(Multimodal.decodeWavPcm(b8.take(10)) == Left("truncated"))
    assert(Multimodal.decodeWavPcm(b8.take(30)) == Left("truncated"))
    val bad = b8.clone(); bad(0) = 'X'.toByte
    assert(Multimodal.decodeWavPcm(bad) == Left("bad_magic"))
  }

  test("audioFingerprint: hand window energies, contour bits, " +
      "volume twins share the contour with 4x energy") {
    import spark.implicits._
    // 8 frames, windows=4: windows of 2 frames each
    // s = [3, 1, 0, 0, 2, 2, 5, 0] -> e = [10, 0, 8, 25]
    // contour (e_w > e_w+1): w0: 10>0 yes, w1: 0>8 no, w2: 8>25 no -> 0b001
    val s = Array(3, 1, 0, 0, 2, 2, 5, 0)
    def wav(amp: Int) =
      Multimodal.encodeWavSamples(1, 8000, 8, s.map(128 + amp * _))
    val rows = Seq((1L, "audio", wav(1)), (2L, "audio", wav(2)))
      .toDF("media_id", "kind", "media")
    val out = Multimodal.audioFingerprint(spark, rows, windows = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out(1L) == ((8L, 43L, 1L)))
    assert(out(2L) == ((8L, 172L, 1L)), "4x energy, same contour")
    val pairs = Multimodal.audioNearDupPairs(
        Multimodal.audioFingerprint(spark, rows, windows = 4))
      .collect()
    assert(pairs.length == 1 &&
      pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)
    // a spec-conformant container with ZERO frames gets its own lane
    val empty = Seq((9L, "audio",
        Multimodal.encodeWavSamples(1, 8000, 8, Array.empty[Int])))
      .toDF("media_id", "kind", "media")
    val er = Multimodal.audioFingerprint(spark, empty, windows = 4)
      .collect().head
    assert(!er.getBoolean(1) && er.getString(2) == "no_frames")
  }

  test("audioBandFingerprint: reference replay, EXACT gain " +
      "invariance (x2, x3, 16-bit twin), distinct content separates, " +
      "dead lanes incl. too_long") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    // reference implementation straight from the formula
    def ref(mix: Array[Int], windows: Int = 9, bands: Int = 8): Long = {
      val xc = Array.ofDim[Long](windows, bands)
      val xs = Array.ofDim[Long](windows, bands)
      for (f <- mix.indices; bi <- 0 until bands) {
        val w = (f.toLong * windows / mix.length).toInt
        xc(w)(bi) += mix(f).toLong * Multimodal.hkCosCenti(bi)(f % 16)
        xs(w)(bi) += mix(f).toLong * Multimodal.hkSinCenti(bi)(f % 16)
      }
      val e = Array.tabulate(windows, bands)((w, bi) =>
        xc(w)(bi) * xc(w)(bi) + xs(w)(bi) * xs(w)(bi))
      var h = 0L
      for (w <- 1 until windows; bi <- 0 until bands - 1)
        if ((e(w)(bi) - e(w)(bi + 1)) -
          (e(w - 1)(bi) - e(w - 1)(bi + 1)) > 0)
          h |= 1L << ((w - 1) * (bands - 1) + bi)
      h
    }
    val g = Array.tabulate(40)(f => ((f * 13 + 7) % 61) - 30)
    val g2 = Array.tabulate(40)(f => ((f * 29 + 3) % 57) - 28)
    def wav8(s: Array[Int], amp: Int) =
      Multimodal.encodeWavSamples(1, 8000, 8, s.map(128 + amp * _))
    def wav16(s: Array[Int], amp: Int) =
      Multimodal.encodeWavSamples(1, 8000, 16, s.map(amp * _ * 256))
    val rows = Seq(
      (1L, wav8(g, 1)), (2L, wav8(g, 2)), (3L, wav16(g, 3)),
      (4L, wav8(g2, 1)),
      (5L, wav8(g, 1).take(20)))
      .toDF("media_id", "media").withColumn("kind", lit("audio"))
    val out = Multimodal.audioBandFingerprint(spark, rows)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1),
          if (r.isNullAt(2)) null else r.getString(2),
          if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    assert(out(1L) == ((true, null, ref(g))))
    // gain x2, x3 (through the 16-bit width): EXACTLY the same hash
    assert(out(2L)._3 == out(1L)._3)
    assert(out(3L)._3 == out(1L)._3)
    assert(out(4L) == ((true, null, ref(g2))))
    assert(out(4L)._3 != out(1L)._3, "distinct content must separate")
    assert(out(5L) == ((false, "truncated", -1L)))
    // pairs: the three gain variants form one clique, g2 stays out
    val pairs = Multimodal.audioBandNearDupPairs(
        Multimodal.audioBandFingerprint(spark, rows))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(pairs == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    // int64-bound guards: 2^20 + 1 frames dead-letter as too_long, a
    // 4-channel full-scale mix (|mix| up to 508) as too_loud — both
    // BEFORE any filterbank math can wrap
    val big = Multimodal.encodeWavSamples(1, 8000, 8,
      Array.fill((1 << 20) + 1)(128))
    val loud = Multimodal.encodeWavSamples(4, 8000, 8,
      Array.fill(64)(255)) // 16 frames of 4 channels at +127 each
    val out2 = Multimodal.audioBandFingerprint(spark,
        Seq((9L, big), (10L, loud)).toDF("media_id", "media")
          .withColumn("kind", lit("audio")))
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getString(2)))).toMap
    assert(out2(9L) == ((false, "too_long")))
    assert(out2(10L) == ((false, "too_loud")))
    // the cap SCALES with windows (ADVICE r18): 2·2^20/9 + 1 frames
    // wrap-risk at windows=2 (per-window projection ~n/2) and must
    // dead-letter there, while the default 9 windows accepts the
    // same row (n < 2^20)
    val mid = Multimodal.encodeWavSamples(1, 8000, 8,
      Array.fill(2 * (1 << 20) / 9 + 1)(128))
    val midDf = Seq((11L, mid)).toDF("media_id", "media")
      .withColumn("kind", lit("audio"))
    val atW2 = Multimodal.audioBandFingerprint(spark, midDf, windows = 2)
      .collect().map(r => (r.getBoolean(1), r.getString(2))).head
    assert(atW2 == ((false, "too_long")))
    val atW9 = Multimodal.audioBandFingerprint(spark, midDf)
      .collect().map(r => r.getBoolean(1)).head
    assert(atW9, "default 9 windows must still accept 233k frames")
  }

  test("sampleMp4Frames: real stsc/stsz/stco walk over a two-chunk " +
      "layout — all samples byte-exact, even-spacing rule, dead " +
      "letters (bad_magic, no_stbl, truncated)") {
    import spark.implicits._
    // 5 samples, sizes 3..7, byte (j,i) = 10j + i; chunks [3, 2]
    val sizes = Array(3, 4, 5, 6, 7)
    def sb(j: Int, i: Int): Int = 10 * j + i
    val mp4 = Multimodal.encodeMp4Samples("isom", 1000L, 5000L,
      sizes, sb, nChunks = 2)
    val noTbl = Multimodal.encodeMp4("isom", 1000L, 5000L, 64, 64, 1)
    val bad = mp4.clone(); bad(4) = 'X'.toByte
    val rows = Seq((1L, "video", mp4), (2L, "video", noTbl),
      (3L, "video", bad), (4L, "video", mp4.take(40)))
      .toDF("media_id", "kind", "media")
    // nFrames ≥ S: every sample, exact position-pinned stats
    val all = Multimodal.sampleMp4Frames(spark, rows, nFrames = 9)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) -1 else r.getInt(3)) ->
        ((r.getBoolean(1), if (r.isNullAt(2)) null else r.getString(2),
          if (r.isNullAt(4)) -1L else r.getLong(4),
          if (r.isNullAt(5)) -1L else r.getLong(5),
          if (r.isNullAt(6)) -1L else r.getLong(6)))).toMap
    for (j <- 0 until 5) {
      val bytes = (0 until sizes(j)).map(i => sb(j, i))
      val expect = (true, null, sizes(j).toLong,
        bytes.map(_.toLong).sum,
        bytes.zipWithIndex.map { case (v, i) => (i + 1).toLong * v }.sum)
      assert(all((1L, j)) == expect, s"sample $j")
    }
    assert(all((2L, -1)) == ((false, "no_stbl", -1L, -1L, -1L)))
    assert(all((3L, -1)) == ((false, "bad_magic", -1L, -1L, -1L)))
    assert(all((4L, -1)) == ((false, "truncated", -1L, -1L, -1L)))
    // nFrames = 2 over 5 samples: indices 0·5/2 = 0 and 1·5/2 = 2
    val two = Multimodal.sampleMp4Frames(spark,
        rows.filter($"media_id" === 1L), nFrames = 2)
      .collect().map(_.getInt(3)).sorted
    assert(two.toSeq == Seq(0, 2))
  }

  test("crafted oversized sizes dead-letter, never loop or throw " +
      "(ADVICE r16: unsigned-32 chunk/table walks)") {
    // WAV: an unknown chunk whose unsigned size (0xFFFFFFF8) made the
    // old walk advance by 8 + sz.toInt = 0 — an executor infinite loop
    val bb = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1); bb.putInt(8000); bb.putInt(8000)
    bb.putShort(1); bb.putShort(8)
    bb.put("junk".getBytes("US-ASCII")); bb.putInt(0xFFFFFFF8)
    assert(Multimodal.decodeWavPcm(bb.array()) == Left("truncated"))

    // MP4: corrupt a valid container's sample tables in place
    def be32(a: Array[Byte], at: Int, v: Long): Unit = {
      a(at) = ((v >> 24) & 0xff).toByte; a(at + 1) = ((v >> 16) & 0xff).toByte
      a(at + 2) = ((v >> 8) & 0xff).toByte; a(at + 3) = (v & 0xff).toByte
    }
    def find(a: Array[Byte], typ: String): Int = {
      val t = typ.getBytes("US-ASCII")
      (0 until a.length - 4).find(i => a(i) == t(0) && a(i + 1) == t(1) &&
        a(i + 2) == t(2) && a(i + 3) == t(3)).get - 4 // box START
    }
    val sizes = Array(3, 4, 5, 6, 7)
    def sb(j: Int, i: Int): Int = 10 * j + i
    def fresh() = Multimodal.encodeMp4Samples("isom", 1000L, 5000L,
      sizes, sb, nChunks = 2)
    import spark.implicits._
    def reasonOf(m: Array[Byte]): String =
      Multimodal.sampleMp4Frames(spark,
          Seq((1L, "video", m)).toDF("media_id", "kind", "media"), 2)
        .collect().head.getString(2)
    // stsz declares ~2^31 samples: must dead-letter, not allocate
    val evil1 = fresh(); be32(evil1, find(evil1, "stsz") + 16, 0x7FFFFFF0L)
    assert(reasonOf(evil1) == "truncated")
    // stco declares more chunk offsets than its box holds
    val evil2 = fresh(); be32(evil2, find(evil2, "stco") + 12, 0xFFFFFF00L)
    assert(reasonOf(evil2) == "truncated")
    // stsc first_chunk = 0 (ISO 8.7.4 is 1-based): old code indexed
    // perChunk(-1)
    val evil3 = fresh(); be32(evil3, find(evil3, "stsc") + 16, 0L)
    assert(reasonOf(evil3) == "truncated")
    // a child box whose size overruns its parent must end the walk
    // as a dead letter, not wrap the advance
    val evil4 = fresh(); be32(evil4, find(evil4, "trak"), 0xFFFFFFF0L)
    val r4 = reasonOf(evil4)
    assert(r4 == "truncated" || r4 == "no_stbl")
  }

  test("videoFrameDctHashes + videoNearDupPairs: planted brightness " +
      "twin collapses, distinct content does not, non-PNG samples " +
      "dead-letter the whole video as bad_frame") {
    import spark.implicits._
    // the textured q335-fixture base (a flat gradient has too little
    // AC energy — its near-zero median lets a corner bump flip > 3
    // DCT bits; texture anchors the median, hamming lands at 1–2)
    def png(shift: Int, corner: Int)(f: Int): Array[Byte] =
      Multimodal.encodePngGray(16, 16,
        (x, y) => (7 * x + 11 * y + 13 * ((x * y + f) % 5)) % 120 +
          shift + (if (f == 0 && x < 2 && y < 2) corner else 0),
        y => (f + y) % 5)
    def mp4(frames: Seq[Array[Byte]]): Array[Byte] =
      Multimodal.encodeMp4Samples("isom", 1000L, 4000L,
        frames.map(_.length).toArray, (j, i) => frames(j)(i) & 0xff)
    val a = mp4((0 until 3).map(png(0, 0)))     // original
    val b = mp4((0 until 3).map(png(5, 16)))    // brightness + corner
    val c = mp4((0 until 3).map(f =>            // different content
      Multimodal.encodePngGray(16, 16,
        (x, y) => (13 * x * y + f) % 200, y => y % 5)))
    val bad = Multimodal.encodeMp4Samples("isom", 1000L, 4000L,
      Array(4), (_, i) => i + 1, nChunks = 1)   // not a PNG
    val rows = Seq((1L, "mp4", a), (2L, "mp4", b), (3L, "mp4", c),
      (4L, "mp4", bad), (5L, "mp4", a.take(40)))
      .toDF("media_id", "kind", "media")
    val fh = Multimodal.videoFrameDctHashes(spark, rows, nFrames = 3)
    val byId = fh.collect().groupBy(_.getLong(0))
    assert(byId(1L).length == 3 && byId(1L).forall(_.getBoolean(1)))
    assert(byId(4L).head.getString(2) == "bad_frame")
    assert(byId(5L).head.getString(2) == "truncated")
    val pairs = Multimodal.videoNearDupPairs(fh, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 3L)),
      s"only the planted twin pairs, with n_frames: ${pairs.toSeq}")
  }

  test("resizePngGray: hand 4×4→2×2 block means, payload decodes " +
      "to exactly those pixels, non-divisible dims and dead letters " +
      "route with reasons") {
    import spark.implicits._
    // 4×4 gradient p = 4x + y; 2×2 block means:
    // block(0,0): {0,1,4,5} -> 2; (1,0): {8,9,12,13} -> 10
    // (0,1): {2,3,6,7} -> 4;  (1,1): {10,11,14,15} -> 12
    val img = Multimodal.encodePngGray(4, 4, (x, y) => 4 * x + y,
      y => y % 5)
    val odd = Multimodal.encodePngGray(3, 4, (x, y) => x + y, _ => 0)
    val rows = Seq(
      (1L, "png", img),
      (2L, "png", odd),                       // 3 % 2 != 0
      (3L, "png", img.take(9)))               // truncated
      .toDF("media_id", "kind", "media")
    val out = Multimodal.resizePngGray(spark, rows, 2, 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(3),
          if (r.isNullAt(4)) null else r.getString(4),
          r.getAs[Array[Byte]](2)))).toMap
    assert(out(1L)._1 && out(1L)._2 == null)
    val dec = Multimodal.decodePngGray(out(1L)._3)
    assert(dec.exists(t => t._1 == 2 && t._2 == 2 &&
      t._3.toSeq == Seq(2, 10, 4, 12)))
    assert(out(2L) == ((false, "bad_dims", Array.emptyByteArray))
      || (!out(2L)._1 && out(2L)._2 == "bad_dims"))
    assert(!out(3L)._1 && out(3L)._2 == "truncated")
  }

  test("dctNearDupPairs: banding is lossless to hamming 3 " +
      "(≡ brute-force pairs from the same hashes)") {
    import spark.implicits._
    def img(f: (Int, Int) => Int) =
      Multimodal.encodePngGray(16, 16, f, y => y % 5)
    def base(x: Int, y: Int): Int =
      40 + (if (((x / 2) + (y / 2)) % 2 == 0) 120 else 0)
    val rows = Seq(
      30L -> img(base),
      31L -> img((x, y) => base(x, y) + 7),    // DC shift: hamming 0
      32L -> img((x, y) => base(x, y) +
        (if (x < 2 && y < 2) 60 else 0)),      // local bump: small
      33L -> img((x, y) => 160 - base(x, y) + 40)) // inverted: far
      .map { case (id, b) => (id, "png", b) }
      .toDF("media_id", "kind", "media")
    val hashes = Multimodal.imageDctHash(spark, rows)
    val hs = hashes.collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val brute = (for {
      a <- hs.keys; b <- hs.keys if a < b
      h = java.lang.Long.bitCount(hs(a) ^ hs(b)) if h <= 3
    } yield (a, b) -> h).toMap
    val got = Multimodal.dctNearDupPairs(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2))
      .toMap
    assert(got == brute, "banded join must equal brute force ≤ 3")
    assert(got((30L, 31L)) == 0)
    assert(!got.keySet.exists(p => p._1 == 33L || p._2 == 33L))
  }
}
