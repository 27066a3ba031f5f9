package graft.multimodal

import java.io.ByteArrayOutputStream
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Real container-metadata probe over opaque binary media columns —
  * the ffprobe surface of the reference's ingest
  * (/root/reference/app/esper/ingest.py:21-43 extracts width, height,
  * fps, num_frames/duration before any decode): a genuine ISO-BMFF
  * (MP4) box walk and RIFF (AVI) chunk walk over the payload bytes,
  * not a byte-statistics stub. Only the HEADERS are parsed — no codec
  * work — which is exactly what ffprobe does for these fields and all
  * a 100 TB ingest needs before scheduling decode work.
  *
  * Scale shape: one narrow map over the binary column, embarrassingly
  * parallel, no shuffle; emits typed integer metadata (fps as ppm,
  * duration in ms) so results are engine-exact.
  *
  * [[Mp4Fixture]]/[[AviFixture]] build spec-conformant header blobs
  * from scalar parameters — the inverse direction a real pipeline gets
  * from disk — so the m06 oracle can check the parser end to end: the
  * query builds payloads from doc_id-derived parameters, parses them
  * back with the real box walk, and DuckDB recomputes the fields from
  * the same closed-form parameters. A parse bug (wrong offset, wrong
  * endianness, wrong box path) breaks the hash match immediately. */
object MediaProbe {

  case class ProbeRow(media_id: Long, container: String, width: Int,
                      height: Int, fps_ppm: Long, duration_ms: Long,
                      n_bytes: Int)

  /** Parse (media_id, payload) rows; unknown containers surface as
    * container="unknown" with -1 fields rather than an error (an
    * ingest queue must not die on one corrupt file). */
  def probe(media: DataFrame): Dataset[ProbeRow] = {
    import media.sparkSession.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .map { case (id, b) => parse(id, b) }
  }

  def parse(id: Long, b: Array[Byte]): ProbeRow =
    if (b.length >= 12 && fourcc(b, 4) == "ftyp") parseMp4(id, b)
    else if (b.length >= 12 && fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "AVI ")
      parseAvi(id, b)
    else ProbeRow(id, "unknown", -1, -1, -1L, -1L, b.length)

  // ---- byte readers ----
  private def u32be(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  // ---- ISO-BMFF (MP4) ----

  /** First child box of `typ` in [from, end); returns (payloadStart,
    * boxEnd). Box layout: u32be size (incl. 8-byte header), 4cc type. */
  private def findBox(b: Array[Byte], from: Int, end: Int,
                      typ: String): Option[(Int, Int)] = {
    var o = from
    while (o + 8 <= end) {
      val sz = u32be(b, o)
      if (sz < 8 || o + sz > end) return None
      if (fourcc(b, o + 4) == typ) return Some((o + 8, o + sz.toInt))
      o += sz.toInt
    }
    None
  }

  private def parseMp4(id: Long, b: Array[Byte]): ProbeRow = {
    val bad = ProbeRow(id, "mp4", -1, -1, -1L, -1L, b.length)
    (for {
      (moov, moovEnd) <- findBox(b, 0, b.length, "moov")
      (mvhd, mvhdEnd) <- findBox(b, moov, moovEnd, "mvhd")
      (trak, trakEnd) <- findBox(b, moov, moovEnd, "trak")
      (tkhd, tkhdEnd) <- findBox(b, trak, trakEnd, "tkhd")
      (mdia, mdiaEnd) <- findBox(b, trak, trakEnd, "mdia")
      (mdhd, mdhdEnd) <- findBox(b, mdia, mdiaEnd, "mdhd")
      (minf, minfEnd) <- findBox(b, mdia, mdiaEnd, "minf")
      (stbl, stblEnd) <- findBox(b, minf, minfEnd, "stbl")
      (stts, sttsEnd) <- findBox(b, stbl, stblEnd, "stts")
      // every fixed-offset field read below must fit INSIDE its box:
      // findBox bounds the header scan, not the payload length, so a
      // degenerate (spec-violating but well-framed) 8-byte mvhd would
      // otherwise read past the box — or past the buffer — and throw,
      // breaking the never-throw ingest contract
      if mvhdEnd - mvhd >= 20 && tkhdEnd - tkhd >= 84 &&
        mdhdEnd - mdhd >= 16 && sttsEnd - stts >= 16
    } yield {
      // mvhd v0: version/flags(4) ctime(4) mtime(4) timescale(4) dur(4)
      val mvTs = u32be(b, mvhd + 12)
      val mvDur = u32be(b, mvhd + 16)
      // tkhd v0: ver/flags(4) ctime(4) mtime(4) track(4) rsvd(4) dur(4)
      // rsvd(8) layer(2) alt(2) vol(2) rsvd(2) matrix(36) then
      // width/height as 16.16 fixed point
      val width = (u32be(b, tkhd + 76) >> 16).toInt
      val height = (u32be(b, tkhd + 80) >> 16).toInt
      // mdhd v0: ver/flags(4) ctime(4) mtime(4) timescale(4) dur(4)
      val mdTs = u32be(b, mdhd + 12)
      // stts v0: ver/flags(4) entry_count(4) then (count, delta) pairs
      val delta = u32be(b, stts + 12)
      val fpsPpm = if (delta > 0) mdTs * 1000000L / delta else -1L
      val durMs = if (mvTs > 0) mvDur * 1000L / mvTs else -1L
      ProbeRow(id, "mp4", width, height, fpsPpm, durMs, b.length)
    }).getOrElse(bad)
  }

  // ---- RIFF (AVI) ----

  /** First LIST chunk with the given list-type in [from, end); returns
    * (childrenStart, chunkEnd). RIFF chunk: 4cc id, u32le size,
    * payload (word-aligned). */
  private def findList(b: Array[Byte], from: Int, end: Int,
                       listType: String): Option[(Int, Int)] = {
    var o = from
    while (o + 12 <= end) {
      val id = fourcc(b, o)
      val sz = u32le(b, o + 4)
      if (o + 8 + sz > end) return None
      if (id == "LIST" && fourcc(b, o + 8) == listType)
        return Some((o + 12, o + 8 + sz.toInt))
      o += 8 + sz.toInt + (sz.toInt & 1)
    }
    None
  }

  private def findChunk(b: Array[Byte], from: Int, end: Int,
                        typ: String): Option[(Int, Int)] = {
    var o = from
    while (o + 8 <= end) {
      val id = fourcc(b, o)
      val sz = u32le(b, o + 4)
      if (o + 8 + sz > end) return None
      if (id == typ) return Some((o + 8, o + 8 + sz.toInt))
      o += 8 + sz.toInt + (sz.toInt & 1)
    }
    None
  }

  private def parseAvi(id: Long, b: Array[Byte]): ProbeRow = {
    val bad = ProbeRow(id, "avi", -1, -1, -1L, -1L, b.length)
    (for {
      (hdrl, hdrlEnd) <- findList(b, 12, b.length, "hdrl")
      (avih, avihEnd) <- findChunk(b, hdrl, hdrlEnd, "avih")
      // the fixed-offset reads must fit inside the chunk (see the
      // mp4-side comment): a declared-short avih would otherwise
      // index past the chunk or the buffer
      if avihEnd - avih >= 40
    } yield {
      // avih: usPerFrame(0) maxBps(4) pad(8) flags(12) totalFrames(16)
      // initial(20) streams(24) bufSize(28) width(32) height(36)
      val usPerFrame = u32le(b, avih)
      val totalFrames = u32le(b, avih + 16)
      val width = u32le(b, avih + 32).toInt
      val height = u32le(b, avih + 36).toInt
      val fpsPpm = if (usPerFrame > 0) 1000000000000L / usPerFrame else -1L
      // both fields are u32 so the product can exceed Long range on
      // hostile headers — overflow must surface as the -1 sentinel,
      // not as a wrapped negative duration
      val durMs =
        if (totalFrames > 0 && usPerFrame > Long.MaxValue / totalFrames) -1L
        else totalFrames * usPerFrame / 1000L
      ProbeRow(id, "avi", width, height, fpsPpm, durMs, b.length)
    }).getOrElse(bad)
  }
}

/** Minimal spec-conformant MP4 header builder (ftyp + moov with the
  * mvhd/tkhd/mdhd/stts fields the probe reads) — the fixture inverse
  * of [[MediaProbe.parseMp4]]'s box walk. */
object Mp4Fixture {
  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    val out = new ByteArrayOutputStream()
    out.write(be32(body.length + 8L))
    out.write(typ.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    out.write(body)
    out.toByteArray
  }
  private val zeros = (n: Int) => new Array[Byte](n)
  private val identityMatrix: Array[Byte] =
    be32(0x00010000L) ++ zeros(12) ++ be32(0x00010000L) ++ zeros(12) ++
      be32(0x40000000L)

  def build(width: Int, height: Int, timescale: Long, durTicks: Long,
            sampleDelta: Long): Array[Byte] = {
    val ftyp = box("ftyp",
      "isom".getBytes("ISO-8859-1"), be32(0L), "isom".getBytes("ISO-8859-1"))
    val mvhd = box("mvhd", zeros(4), be32(0L), be32(0L), be32(timescale),
      be32(durTicks), be32(0x00010000L), be32(0x01000000L), zeros(8),
      identityMatrix, zeros(24), be32(2L))
    val tkhd = box("tkhd", Array(0.toByte, 0.toByte, 0.toByte, 7.toByte),
      be32(0L), be32(0L), be32(1L), zeros(4), be32(durTicks), zeros(8),
      zeros(8), identityMatrix,
      be32(width.toLong << 16), be32(height.toLong << 16))
    val mdhd = box("mdhd", zeros(4), be32(0L), be32(0L), be32(timescale),
      be32(durTicks), be32(0x55c40000L))
    val stts = box("stts", zeros(4), be32(1L),
      be32(durTicks / sampleDelta), be32(sampleDelta))
    val stbl = box("stbl", stts)
    val minf = box("minf", stbl)
    val mdia = box("mdia", mdhd, minf)
    val trak = box("trak", tkhd, mdia)
    val moov = box("moov", mvhd, trak)
    ftyp ++ moov
  }
}

/** Minimal RIFF AVI header builder (hdrl/avih with the fields the
  * probe reads) — the fixture inverse of [[MediaProbe.parseAvi]]. */
object AviFixture {
  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def cc(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

  def build(width: Int, height: Int, usPerFrame: Long,
            totalFrames: Long): Array[Byte] = {
    val avihPayload = le32(usPerFrame) ++ le32(0L) ++ le32(0L) ++ le32(0L) ++
      le32(totalFrames) ++ le32(0L) ++ le32(1L) ++ le32(0L) ++
      le32(width.toLong) ++ le32(height.toLong) ++ new Array[Byte](16)
    val avih = cc("avih") ++ le32(avihPayload.length.toLong) ++ avihPayload
    val hdrl = cc("LIST") ++ le32(avih.length + 4L) ++ cc("hdrl") ++ avih
    val riffBody = cc("AVI ") ++ hdrl
    cc("RIFF") ++ le32(riffBody.length.toLong) ++ riffBody
  }
}
