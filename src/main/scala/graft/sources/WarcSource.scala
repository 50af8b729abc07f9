package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC container source (r19, VERDICT r18 missing #1): the one link
  * between crawl bytes and everything downstream — WET extraction
  * ([[graft.ops.WebExtract.extractText]]), C4, dedup, langid all
  * consume what a WARC reader produces. ISO 28500 layout: a `.warc.gz`
  * file is a CONCATENATION of gzip members, one member per record, so
  * record boundaries are recoverable without inflating the whole file
  * into memory and a corrupt record header is CONTAINED to its member
  * (the next member re-syncs). A record is a `WARC/1.x` version line,
  * named header fields (`WARC-Type`, `WARC-Target-URI`,
  * `Content-Length` — the payload byte count), a blank line, then the
  * payload; `response` records carry an `application/http` payload
  * whose body (after the HTTP header block) is the HTML.
  *
  * Decode discipline (the PNG/JPEG codec rules, ADVICE r16): every
  * size is bounded in Long BEFORE any advance; the inflate loop
  * never allocates beyond `maxPayload` + one scratch block (an
  * over-cap member keeps inflating into a fixed scratch buffer ONLY
  * to locate the next member boundary — zip-bomb-safe by
  * construction); dead-letter lanes instead of throws everywhere:
  *
  *   - `bad_magic`     — bytes at a member boundary are not a gzip
  *                       header (resync impossible: emitted once,
  *                       rest of the file is skipped),
  *   - `bad_gzip`      — DEFLATE stream is malformed (ditto),
  *   - `truncated`     — the file ends inside a member / trailer, or
  *                       the record's declared Content-Length exceeds
  *                       the member's remaining bytes,
  *   - `bad_header`    — no WARC/1.x version line, malformed header
  *                       block, or missing/non-numeric Content-Length,
  *   - `oversized`     — declared Content-Length over `maxPayload`
  *                       (payload skipped, never materialized),
  *   - `bad_http`      — a `response` record whose payload has no
  *                       HTTP header block.
  *
  * The per-row/per-file decode runs inside the scan task — payload
  * bytes NEVER shuffle; at 100 TB the unit of parallelism is the
  * WARC file (Common Crawl ships ~1 GB files, ~10⁵ of them per
  * crawl), which is exactly Spark's binary-file split unit. */
object WarcSource {

  /** One parsed record (or dead letter) of a WARC file. */
  final case class WarcRec(
      rec_idx: Int, ok: Boolean, reason: Option[String],
      warc_type: Option[String], target_uri: Option[String],
      content_length: Option[Long], http_status: Option[Int],
      content_type: Option[String], body: Option[String])

  // -------------------------------------------------------------------
  // Encode half — the fixture source (the q33/q129/q337 discipline:
  // the generator controls every byte, so gate oracles re-derive all
  // attributes from id formulas and never parse a byte).
  // -------------------------------------------------------------------

  private val Crlf = "\r\n"

  /** One WARC/1.0 response record, UNCOMPRESSED. `declaredDelta`
    * inflates the declared Content-Length past the actual payload
    * (the `truncated` fixture lane); `clobberVersion` corrupts the
    * version line (the `bad_header` lane — the gzip member stays
    * intact, proving containment). */
  def encodeWarcResponse(recordId: String, targetUri: String,
      payload: Array[Byte], declaredDelta: Int = 0,
      clobberVersion: Boolean = false,
      warcType: String = "response"): Array[Byte] = {
    val version = if (clobberVersion) "XARC/1.0" else "WARC/1.0"
    val head = new StringBuilder()
      .append(version).append(Crlf)
      .append("WARC-Type: ").append(warcType).append(Crlf)
      .append("WARC-Record-ID: <urn:graft:").append(recordId)
      .append(">").append(Crlf)
      .append("WARC-Target-URI: ").append(targetUri).append(Crlf)
      .append("Content-Type: application/http; msgtype=response")
      .append(Crlf)
      .append("Content-Length: ")
      .append(payload.length.toLong + declaredDelta).append(Crlf)
      .append(Crlf).toString
    val out = new java.io.ByteArrayOutputStream()
    out.write(head.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.write(payload)
    // ISO 28500 §4: two CRLFs terminate the record block
    out.write((Crlf + Crlf).getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    out.toByteArray
  }

  /** The standard HTTP response head the fixture wraps HTML in. */
  val HttpHead: String =
    "HTTP/1.1 200 OK" + Crlf + "Content-Type: text/html" + Crlf + Crlf

  /** One gzip member per record, concatenated — the ISO 28500 annex-C
    * recommended compression layout (java.util.zip writes a fixed
    * 10-byte header: no FLG bits, MTIME 0 — deterministic). */
  def encodeWarcGz(records: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(r)
      gz.close() // finishes the member + frees the deflater;
      // ByteArrayOutputStream.close() is a no-op, so `out` stays open
    }
    out.toByteArray
  }

  // -------------------------------------------------------------------
  // Decode half.
  // -------------------------------------------------------------------

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  /** Split one `.warc.gz` blob into records. Pure function of the
    * bytes — partition-local, bounded memory (≤ maxPayload + 64 KiB
    * scratch live at once). */
  def parseWarcGz(bytes: Array[Byte],
      maxPayload: Long = 1L << 20): Seq[WarcRec] = {
    val recs = scala.collection.mutable.ArrayBuffer.empty[WarcRec]
    var pos = 0
    var idx = 0
    var halt = false
    def dead(reason: String): Unit = {
      recs += WarcRec(idx, ok = false, Some(reason), None, None, None,
        None, None, None)
      idx += 1
    }
    while (!halt && pos < bytes.length) {
      // ---- gzip member header (RFC 1952 §2.3) ----
      if (pos + 10 > bytes.length ||
        u8(bytes, pos) != 0x1f || u8(bytes, pos + 1) != 0x8b) {
        dead(if (pos + 2 <= bytes.length &&
          (u8(bytes, pos) != 0x1f || u8(bytes, pos + 1) != 0x8b))
          "bad_magic" else "truncated")
        halt = true
      } else if (u8(bytes, pos + 2) != 8) {
        dead("bad_gzip"); halt = true // CM must be DEFLATE
      } else {
        val flg = u8(bytes, pos + 3)
        var p = pos + 10 // fixed header
        var headBad = false
        if ((flg & 0x04) != 0) { // FEXTRA: 2-byte little-endian len
          if (p + 2 > bytes.length) headBad = true
          else {
            val xlen = u8(bytes, p) | (u8(bytes, p + 1) << 8)
            p += 2 + xlen
            if (p > bytes.length) headBad = true
          }
        }
        for (bit <- Seq(0x08, 0x10) if !headBad) { // FNAME, FCOMMENT
          if ((flg & bit) != 0) {
            while (p < bytes.length && bytes(p) != 0) p += 1
            if (p >= bytes.length) headBad = true else p += 1
          }
        }
        if (!headBad && (flg & 0x02) != 0) { // FHCRC
          p += 2; if (p > bytes.length) headBad = true
        }
        if (headBad) { dead("truncated"); halt = true }
        else {
          // ---- inflate the member (nowrap), bounded ----
          val inf = new java.util.zip.Inflater(true)
          inf.setInput(bytes, p, bytes.length - p)
          val store = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](65536)
          var overflow = false
          val status =
            try {
              var stuck = false
              while (!inf.finished() && !stuck) {
                val m = inf.inflate(buf)
                if (m == 0) {
                  if (inf.needsInput() || inf.needsDictionary())
                    stuck = true
                } else if (!overflow) {
                  if (store.size().toLong + m >
                    maxPayload + 65536) overflow = true
                  else store.write(buf, 0, m)
                }
                // on overflow: keep inflating into scratch ONLY to
                // find the member boundary — nothing else is stored
              }
              if (stuck) Left("truncated") else Right(())
            } catch {
              case _: java.util.zip.DataFormatException =>
                Left("bad_gzip")
            }
          status match {
            case Left(r) =>
              inf.end(); dead(r); halt = true
            case Right(_) =>
              val consumed = (bytes.length - p) - inf.getRemaining
              inf.end()
              val next = p + consumed + 8 // CRC32 + ISIZE trailer
              if (next > bytes.length) { dead("truncated"); halt = true }
              else {
                recs += parseRecord(idx, store.toByteArray, overflow,
                  maxPayload)
                idx += 1
                pos = next
              }
          }
        }
      }
    }
    recs.toSeq
  }

  /** Parse one inflated record block. `overflow` = the member blew
    * the storage cap mid-inflate (its tail was discarded) — only an
    * over-declared Content-Length can reach that state, so it folds
    * into the `oversized` lane after the header parse. */
  private def parseRecord(idx: Int, rec: Array[Byte], overflow: Boolean,
      maxPayload: Long): WarcRec = {
    def dead(reason: String, cl: Option[Long] = None) =
      WarcRec(idx, ok = false, Some(reason), None, None, cl, None,
        None, None)
    val split = indexOfCrlfCrlf(rec, 0)
    if (split < 0) return dead("bad_header")
    val head = new String(rec, 0, split,
      java.nio.charset.StandardCharsets.UTF_8)
    val lines = head.split("\r\n", -1)
    if (!lines(0).startsWith("WARC/1.")) return dead("bad_header")
    val hdrs = lines.drop(1).flatMap { l =>
      val c = l.indexOf(':')
      if (c <= 0) None
      else Some(l.substring(0, c).trim.toLowerCase ->
        l.substring(c + 1).trim)
    }.toMap
    val clStr = hdrs.getOrElse("content-length", "")
    // ≤ 18 digits before the parse: a crafted 30-digit length must
    // dead-letter, not overflow Long (the canonicalizeUrls port rule)
    if (!clStr.matches("[0-9]{1,18}")) return dead("bad_header")
    val cl = clStr.toLong
    if (cl > maxPayload) return dead("oversized", Some(cl))
    val avail = rec.length - (split + 4)
    if (overflow || avail < cl) return dead("truncated", Some(cl))
    val warcType = hdrs.getOrElse("warc-type", "")
    val target = hdrs.get("warc-target-uri")
    val payload = java.util.Arrays.copyOfRange(rec, split + 4,
      split + 4 + cl.toInt)
    if (warcType == "response" &&
      hdrs.getOrElse("content-type", "").startsWith("application/http")) {
      val hs = indexOfCrlfCrlf(payload, 0)
      if (hs < 0)
        return WarcRec(idx, ok = false, Some("bad_http"), Some(warcType),
          target, Some(cl), None, None, None)
      val httpHead = new String(payload, 0, hs,
        java.nio.charset.StandardCharsets.UTF_8)
      val hlines = httpHead.split("\r\n", -1)
      val status = "HTTP/[0-9.]+ ([0-9]{3}).*".r
      val code = hlines(0) match {
        case status(c) => Some(c.toInt)
        case _ => None
      }
      if (code.isEmpty)
        return WarcRec(idx, ok = false, Some("bad_http"), Some(warcType),
          target, Some(cl), None, None, None)
      val ctype = hlines.drop(1).collectFirst {
        case l if l.toLowerCase.startsWith("content-type:") =>
          l.substring(l.indexOf(':') + 1).trim
      }
      val body = new String(payload, hs + 4, payload.length - hs - 4,
        java.nio.charset.StandardCharsets.UTF_8)
      WarcRec(idx, ok = true, None, Some(warcType), target, Some(cl),
        code, ctype, Some(body))
    } else
      // non-response / non-http records (warcinfo, request, metadata):
      // surfaced with their payload as text, no HTTP fields
      WarcRec(idx, ok = true, None, Some(warcType), target, Some(cl),
        None, None, Some(new String(payload,
          java.nio.charset.StandardCharsets.UTF_8)))
  }

  private def indexOfCrlfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' &&
        b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  /** DataFrame surface: one input row per `.warc.gz` FILE
    * (`fileIdCol`, `dataCol` binary) → one output row per record —
    * (file_id, rec_idx, ok, reason, warc_type, target_uri,
    * content_length, http_status, content_type, body). Per-file
    * decode inside the scan task (the documented mapPartitions
    * codec pattern); bytes never shuffle. */
  def records(spark: SparkSession, files: DataFrame, fileIdCol: String,
      dataCol: String, maxPayload: Long = 1L << 20): DataFrame = {
    import spark.implicits._
    files.select(col(fileIdCol).cast("long"), col(dataCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (fid, data) =>
        parseWarcGz(if (data == null) Array.emptyByteArray else data,
          maxPayload).map { r =>
          (fid, r.rec_idx, r.ok, r.reason, r.warc_type, r.target_uri,
            r.content_length, r.http_status, r.content_type, r.body)
        }
      }
      .toDF("file_id", "rec_idx", "ok", "reason", "warc_type",
        "target_uri", "content_length", "http_status", "content_type",
        "body")
  }

  /** File-based entry: read every `.warc.gz` under `path` via Spark's
    * binaryFile source and split records. file_id = the file path. */
  def read(spark: SparkSession, path: String,
      maxPayload: Long = 1L << 20): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, data) =>
        parseWarcGz(if (data == null) Array.emptyByteArray else data,
          maxPayload).map { r =>
          (p, r.rec_idx, r.ok, r.reason, r.warc_type, r.target_uri,
            r.content_length, r.http_status, r.content_type, r.body)
        }
      }
      .toDF("file_id", "rec_idx", "ok", "reason", "warc_type",
        "target_uri", "content_length", "http_status", "content_type",
        "body")
  }
}
