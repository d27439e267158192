package graft.multimodal

import java.io.ByteArrayInputStream

/** Real media decoding for the formats a pure JVM can decode without any
  * external native library: PNG / JPEG / BMP / GIF via `javax.imageio`'s
  * codec readers (true header parse by the format plugin — geometry and
  * color model, with raster allocation deliberately avoided so a
  * decompression-bomb payload cannot OOM an executor) and WAV/RIFF via a
  * direct chunk-walk of the format header. Formats beyond these (MP4,
  * FLAC, WebP, ...) would bind a JNI decoder behind the same `decode`
  * signature.
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
      case _                                    => None
    }
}
