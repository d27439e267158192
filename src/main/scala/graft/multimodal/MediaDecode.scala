package graft.multimodal

import java.io.ByteArrayInputStream

/** Real media decoding for the formats a pure JVM can handle without any
  * external native library: PNG / JPEG / BMP / GIF via `javax.imageio`'s
  * codec readers (true header parse by the format plugin — geometry and
  * color model, with raster allocation deliberately avoided so a
  * decompression-bomb payload cannot OOM an executor), WAV/RIFF via a
  * direct chunk-walk of the format header, and — round 11 — WebP
  * (VP8/VP8L/VP8X bitstream headers) and MP4/ISO-BMFF (ftyp→moov→trak→
  * tkhd box walk) geometry via the same pure byte-walking: the container
  * layouts are published and carry geometry in plain header fields, so
  * only PIXEL decode of those codecs still needs a JNI binding behind
  * the same `decode` signature.
  *
  * Stateless and referenced as a module from `mapPartitions`, so executors
  * get it without closure capture. ImageIO's reader registry is
  * process-wide and thread-safe for `read`; per-partition reader reuse
  * happens inside ImageIO's SPI cache.
  */
object MediaDecode {

  /** Geometry of a decoded payload.
    *
    * Images: (width, height, color components) from the decoded raster.
    * WAV audio: (sampleRate, bitsPerSample, channels) — the natural
    * "geometry" of PCM audio, occupying the same three slots so the
    * downstream schema is modality-independent (the `kind` column
    * disambiguates, mirroring how a feature store keys modality).
    */
  final case class Geometry(width: Int, height: Int, channels: Int)

  private def startsWith(b: Array[Byte], magic: Int*): Boolean =
    b.length >= magic.length && magic.indices.forall(i => (b(i) & 0xff) == magic(i))

  /** Magic-byte sniff — cheap, no allocation, safe on arbitrary bytes. */
  def sniff(b: Array[Byte]): String =
    if (b == null) "null"
    else if (startsWith(b, 0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)) "png"
    else if (startsWith(b, 0xff, 0xd8, 0xff)) "jpeg"
    else if (startsWith(b, 'B', 'M')) "bmp"
    else if (startsWith(b, 'G', 'I', 'F', '8')) "gif"
    else if (startsWith(b, 'R', 'I', 'F', 'F') && b.length >= 12 &&
             b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') "wav"
    else if (startsWith(b, 'R', 'I', 'F', 'F') && b.length >= 12 &&
             b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P') "webp"
    else if (b.length >= 12 && b(4) == 'f' && b(5) == 't' &&
             b(6) == 'y' && b(7) == 'p') "mp4"
    else "unknown"

  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** RIFF chunk walk to the `fmt ` chunk. Tolerates extra chunks (LIST,
    * fact, ...) before it; rejects truncated or malformed headers by
    * returning None. The offset is a Long and sizes are bounds-checked:
    * hostile declared sizes must yield undecodable, never a wrap-around
    * walk (backwards OR via Int overflow) or a cross-chunk read. */
  private def decodeWav(b: Array[Byte]): Option[Geometry] = {
    var off = 12L
    while (off + 8 <= b.length) {
      val o = off.toInt
      val id = new String(b, o, 4, "US-ASCII")
      val size = leInt(b, o + 4)
      if (size < 0) return None
      if (id == "fmt ") {
        // PCM fmt payload is >= 16 bytes; a smaller declared size means
        // the fields below would read the NEXT chunk's bytes as audio
        // geometry — fabricated data, not a decode.
        if (size < 16 || off + 8 + 16 > b.length) return None
        val channels = leShort(b, o + 10)
        val sampleRate = leInt(b, o + 12)
        val bits = leShort(b, o + 22)
        // Plausibility bounds, not just positivity: the RIFF magic is
        // printable ASCII ("RIFF..WAVE"), so a text payload that happens
        // to start with it walks this code with letter bytes in the fmt
        // fields — which land far outside any real PCM encoding
        // (ASCII-pair leShorts are >= 0x2020 = 8224) and must read as
        // undecodable, not as fabricated geometry (round-9 ADVICE).
        return if (channels >= 1 && channels <= 64 &&
            sampleRate >= 1 && sampleRate <= 10000000 &&
            bits >= 1 && bits <= 64)
          Some(Geometry(sampleRate, bits, channels)) else None
      }
      off += 8L + size.toLong + (size & 1) // chunks are word-aligned
    }
    None
  }

  /** WebP geometry via a pure header walk — no codec library exists in
    * the JVM for WebP, but geometry lives in the first bitstream bytes
    * of the VP8 (lossy) / VP8L (lossless) / VP8X (extended) chunk, all
    * published container layouts. Same RIFF chunk-walk discipline as
    * [[decodeWav]]: Long offsets, bounds-checked declared sizes, and
    * per-format sync bytes so ASCII-text payloads that happen to carry
    * the RIFF....WEBP magic read as undecodable, never as geometry
    * (VP8's 0x9D 0x01 0x2A sync is non-printable; VP8L's and VP8X's
    * reserved bits must be zero). */
  private def decodeWebp(b: Array[Byte]): Option[Geometry] = {
    var off = 12L
    while (off + 8 <= b.length) {
      val o = off.toInt
      val id = new String(b, o, 4, "US-ASCII")
      val size = leInt(b, o + 4)
      if (size < 0) return None
      val p = o + 8 // chunk payload start
      id match {
        case "VP8 " =>
          // key-frame header: 3-byte frame tag, sync 9D 01 2A, then
          // 14-bit width / height (le16 & 0x3FFF)
          if (size < 10 || p + 10 > b.length) return None
          if ((b(p + 3) & 0xff) != 0x9d || (b(p + 4) & 0xff) != 0x01 ||
              (b(p + 5) & 0xff) != 0x2a) return None
          val w = leShort(b, p + 6) & 0x3fff
          val h = leShort(b, p + 8) & 0x3fff
          return if (w >= 1 && h >= 1) Some(Geometry(w, h, 3)) else None
        case "VP8L" =>
          // signature byte 0x2F, then 14+14-bit (w-1, h-1) and the
          // alpha-used bit; the 3 version bits MUST be zero
          if (size < 5 || p + 5 > b.length) return None
          if ((b(p) & 0xff) != 0x2f) return None
          val bits = leInt(b, p + 1)
          if (((bits >>> 29) & 0x7) != 0) return None
          val w = (bits & 0x3fff) + 1
          val h = ((bits >>> 14) & 0x3fff) + 1
          val ch = if (((bits >>> 28) & 1) == 1) 4 else 3
          return Some(Geometry(w, h, ch))
        case "VP8X" =>
          // flags byte (2 reserved high bits must be zero), 3 reserved
          // bytes, then 24-bit LE (canvasW-1, canvasH-1)
          if (size < 10 || p + 10 > b.length) return None
          val flags = b(p) & 0xff
          if ((flags & 0xc0) != 0) return None
          if (b(p + 1) != 0 || b(p + 2) != 0 || b(p + 3) != 0) return None
          val w = ((b(p + 4) & 0xff) | ((b(p + 5) & 0xff) << 8) |
                   ((b(p + 6) & 0xff) << 16)) + 1
          val h = ((b(p + 7) & 0xff) | ((b(p + 8) & 0xff) << 8) |
                   ((b(p + 9) & 0xff) << 16)) + 1
          val ch = if ((flags & 0x10) != 0) 4 else 3
          return Some(Geometry(w, h, ch))
        case _ => // ICCP/EXIF/etc. before the bitstream chunk: keep walking
      }
      off += 8L + size.toLong + (size & 1)
    }
    None
  }

  /** MP4 / ISO-BMFF video geometry via a pure box walk (ftyp → moov →
    * trak → tkhd), the published container layout — pixel DECODE of the
    * codec inside still needs a native binding, but track geometry is
    * plain big-endian header fields, exactly like the WAV walk. The
    * first track with plausible nonzero 16.16-fixed width/height wins
    * (audio tracks carry zeros). Box sizes are bounds-checked Longs;
    * size==1 (64-bit largesize) and size==0 (to end-of-enclosure) are
    * handled; anything malformed reads as undecodable. */
  private def decodeMp4(b: Array[Byte]): Option[Geometry] = {
    def beInt(off: Int): Long =
      ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
        ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
    // Walks boxes in [from, to); returns the first plausible tkhd
    // geometry inside, recursing through container boxes.
    def walk(from: Long, to: Long, depth: Int): Option[Geometry] = {
      if (depth > 8) return None // malformed nesting must terminate
      var off = from
      while (off + 8 <= to) {
        val o = off.toInt
        val declared = beInt(o)
        val id = new String(b, o + 4, 4, "US-ASCII")
        var header = 8L
        val size: Long =
          if (declared == 1L) {
            if (off + 16 > to) return None
            header = 16L
            (beInt(o + 8) << 32) | beInt(o + 12)
          } else if (declared == 0L) to - off
          else declared
        if (size < header || off + size > to) return None
        if (id == "moov" || id == "trak") {
          val g = walk(off + header, off + size, depth + 1)
          if (g.isDefined) return g
        } else if (id == "tkhd") {
          val p = (off + header).toInt
          if (off + header + 4 <= to) {
            val ver = b(p) & 0xff
            // fullbox(4) + times/ids (v1: 32, v0: 20) + reserved/layer/
            // volume (16) + matrix (36) → 16.16-fixed width, height
            val geomOff = 4 + (if (ver == 1) 32 else 20) + 16 + 36
            if (ver <= 1 && off + header + geomOff + 8 <= to) {
              val w = (beInt(p + geomOff) >>> 16).toInt
              val h = (beInt(p + geomOff + 4) >>> 16).toInt
              if (w >= 1 && h >= 1 && w <= (1 << 16) && h <= (1 << 16))
                return Some(Geometry(w, h, 3))
            }
          }
          // zero/implausible geometry: an audio track — keep walking
        }
        off += size
      }
      None
    }
    // the sniff guaranteed "ftyp" at offset 4; require its declared size
    // to be sane before trusting the rest of the walk (an ASCII payload
    // that happens to spell "ftyp" has a ~1.9e9 size field and dies here)
    val ftypSize = beInt(0)
    if (ftypSize < 16 || ftypSize > b.length) None
    else walk(0L, b.length.toLong, 0)
  }

  /** True iff the ImageIO reader's self-declared format agrees with the
    * magic-byte sniff. The SPI pick is content-based too, but the
    * cross-check catches the disagreement case (e.g. a text payload
    * starting "BM" claimed by some lenient reader as another format)
    * cheaply and explicitly. */
  private def formatAgrees(sniffed: String, readerFormat: String): Boolean = {
    val f = readerFormat.toLowerCase(java.util.Locale.ROOT)
    sniffed match {
      case "jpeg" => f == "jpeg" || f == "jpg"
      case other  => f == other
    }
  }

  private def decodeImage(b: Array[Byte], sniffed: String): Option[Geometry] =
    // Geometry comes from the codec's HEADER parse (ImageReader), not
    // ImageIO.read's full raster decode: a decompression bomb (KB file
    // declaring 60000x60000) would force a multi-GB allocation and an
    // OutOfMemoryError no Exception catch can contain — the header read
    // allocates nothing pixel-sized. Corrupt-but-recognized input can
    // still throw; treat it as undecodable rather than failing the
    // partition, the same policy a 100 TB ingest needs for the
    // inevitable truncated file. Pixel-consuming stages (feature
    // extraction) belong behind the same seam with bounded-buffer
    // streaming, gated on these header dimensions first.
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(new ByteArrayInputStream(b))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            val w = r.getWidth(0)
            val h = r.getHeight(0)
            val types = r.getImageTypes(0)
            val channels =
              if (types.hasNext) types.next().getColorModel.getNumComponents else 3
            // Sanity-bound the claimed geometry (round-9 ADVICE): the BMP
            // and GIF magics are printable ASCII, so synthetic text bytes
            // starting "BM"/"GIF8" can reach a real header parse whose
            // dimension fields are letter bytes — little-endian ASCII
            // quads decode to ~5·10⁸, far past any real raster (bounded
            // here at 2²⁴ px per side / 16 components). Garbage headers
            // must read as undecodable, never as positive geometry.
            if (w >= 1 && h >= 1 && w <= (1 << 24) && h <= (1 << 24) &&
                channels >= 1 && channels <= 16 &&
                formatAgrees(sniffed, r.getFormatName))
              Some(Geometry(w, h, channels))
            else None
          } finally r.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch { case _: Exception => None }

  /** Decode a payload to its geometry; None when the bytes are not a
    * format this JVM can decode (including the synthetic text-as-bytes
    * fixture corpus, which callers handle with a deterministic fallback).
    */
  def decode(payload: Array[Byte]): Option[Geometry] =
    sniff(payload) match {
      case k @ ("png" | "jpeg" | "bmp" | "gif") => decodeImage(payload, k)
      case "wav"                                => decodeWav(payload)
      case "webp"                               => decodeWebp(payload)
      case "mp4"                                => decodeMp4(payload)
      case _                                    => None
    }
}
