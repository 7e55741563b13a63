package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.7).
  *
  * Media assets are opaque `binary` columns + a typed metadata struct
  * travelling beside them. The real decode (image/audio codecs) is STUBBED
  * — the container has no media libraries — behind [[MediaDecoder]]; the
  * Spark-side shape is real and tested: binary payloads, metadata structs,
  * batched per-partition decode (`mapPartitions`, the Scala analogue of
  * mapInPandas batching), decode output schema, and partition sizing.
  */
object Multimodal {

  /** One decoded frame/feature record. */
  case class DecodedMeta(
      doc_id: Long, n_bytes: Long, width: Int, height: Int, n_frames: Int)

  /** The decode seam: a real build would link an image/audio codec here.
    * The deterministic fake derives plausible dimensions from the payload
    * bytes so tests and oracles can assert the plumbing end-to-end. */
  trait MediaDecoder extends Serializable {
    def decode(id: Long, payload: Array[Byte]): DecodedMeta
  }

  /** Deterministic fake decoder (see MediaDecoder): dimensions are pure
    * arithmetic over payload length, frame count samples 1 frame per 256
    * bytes. A real decoder is intentionally unimplementable here (no
    * codecs in the container). */
  object FakeDecoder extends MediaDecoder {
    def decode(id: Long, payload: Array[Byte]): DecodedMeta = {
      val n = payload.length.toLong
      DecodedMeta(id, n, (64 + n % 577).toInt, (64 + n % 331).toInt,
        (1 + n / 256).toInt)
    }
  }

  /** REAL image-header decoder over the binary column (round-1 advice:
    * make the decode non-fake where no codec is required). Byte-level
    * container parsing, the part of image decode that needs no library:
    *  - PNG:  8-byte signature, IHDR width/height as big-endian u32 at
    *    offsets 16/20
    *  - GIF:  "GIF89a", logical-screen width/height as little-endian u16
    *    at offsets 6/8
    *  - JPEG: SOI then a real marker-segment scan (skip APPn/COM et al.
    *    by their lengths) to the first SOF0-SOF15 frame header, height
    *    and width big-endian u16 at +5/+7
    * Unknown payloads decode to 0×0 rather than throwing. */
  object HeaderDecoder extends MediaDecoder {
    def decode(id: Long, p: Array[Byte]): DecodedMeta = {
      def u8(i: Int): Int = p(i) & 0xff
      def be32(i: Int): Int =
        (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
      val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      val (w, h) =
        if (p.length >= 24 && pngSig.indices.forall(i => u8(i) == pngSig(i)))
          (be32(16), be32(20))
        else if (p.length >= 10 && u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F')
          (u8(6) | (u8(7) << 8), u8(8) | (u8(9) << 8))
        else if (p.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
          var i = 2
          var res = (0, 0)
          var done = false
          while (!done && i + 8 < p.length) {
            if (u8(i) != 0xff) i += 1
            else {
              val m = u8(i + 1)
              val isSof = m >= 0xc0 && m <= 0xcf &&
                m != 0xc4 && m != 0xc8 && m != 0xcc
              // 0xFF after 0xFF is fill/padding (JPEG spec B.1.1.2): consume
              // one fill byte and re-read — treating it as a marker would
              // read a bogus length from the padding and could skip the
              // real SOF (round-2 advice).
              if (m == 0xff) i += 1
              else if (isSof) {
                res = ((u8(i + 7) << 8) | u8(i + 8), (u8(i + 5) << 8) | u8(i + 6))
                done = true
              } else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd9) || m == 0x01 || m == 0x00) i += 2
              else i += 2 + ((u8(i + 2) << 8) | u8(i + 3))
            }
          }
          res
        } else (0, 0)
      DecodedMeta(id, p.length.toLong, w, h, 1)
    }
  }

  /** One decoded audio record (WAV/RIFF metadata). */
  case class AudioMeta(doc_id: Long, n_bytes: Long, sample_rate: Int,
      channels: Int, bits: Int, n_samples: Long)

  /** REAL WAV (RIFF) header decoder — the audio analogue of
    * [[HeaderDecoder]]: a genuine RIFF chunk scan ("fmt " fields, then
    * walk chunks by size — skipping LIST/INFO etc., honoring the RIFF
    * word-alignment rule that odd-sized chunks are padded — to the
    * "data" chunk whose size gives the sample count). Unknown payloads
    * decode to zeros rather than throwing. */
  object WavDecoder extends Serializable {
    def decode(id: Long, p: Array[Byte]): AudioMeta = {
      def u8(i: Int): Int = p(i) & 0xff
      def leU16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      def leU32(i: Int): Long =
        (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)).toLong |
          (u8(i + 3).toLong << 24)
      def tag(i: Int): String = new String(p.slice(i, i + 4), "US-ASCII")
      if (p.length < 36 || tag(0) != "RIFF" || tag(8) != "WAVE")
        AudioMeta(id, p.length.toLong, 0, 0, 0, 0L)
      else {
        var i = 12
        var sr = 0; var ch = 0; var bits = 0; var dataSize = -1L
        while (i + 8 <= p.length && dataSize < 0) {
          val t = tag(i)
          val size = leU32(i + 4)
          if (t == "fmt " && i + 24 <= p.length) {
            ch = leU16(i + 10); sr = leU32(i + 12).toInt; bits = leU16(i + 22)
          }
          if (t == "data") dataSize = size
          else i += 8 + size.toInt + (size.toInt & 1) // word-aligned chunks
        }
        val blockAlign = ch * bits / 8
        val nSamples =
          if (dataSize >= 0 && blockAlign > 0) dataSize / blockAlign else 0L
        AudioMeta(id, p.length.toLong, sr, ch, bits, nSamples)
      }
    }
  }

  // ---------- expression-level header parsing (codegen'd, no UDF) ----------

  private def beU32(media: org.apache.spark.sql.Column, off: Int) =
    conv(hex(substring(media, off, 4)), 16, 10).cast("long")
  private def byteAt(media: org.apache.spark.sql.Column, off: Int) =
    conv(hex(substring(media, off, 1)), 16, 10).cast("long")

  /** Format sniff by magic bytes — pure expressions over BINARY. */
  def sniffFormat(media: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(hex(substring(media, 1, 8)) === "89504E470D0A1A0A", "png")
      .when(hex(substring(media, 1, 3)) === "474946", "gif")
      .when(hex(substring(media, 1, 2)) === "FFD8", "jpeg")
      .when(hex(substring(media, 1, 4)) === "52494646" &&
        hex(substring(media, 9, 4)) === "57415645", "wav")
      .when(hex(substring(media, 5, 4)) === "66747970", "mp4")
      .otherwise("unknown")

  private def leU16(media: org.apache.spark.sql.Column, off: Int) =
    byteAt(media, off) + byteAt(media, off + 1) * 256
  private def leU32(media: org.apache.spark.sql.Column, off: Int) =
    byteAt(media, off) + byteAt(media, off + 1) * 256 +
      byteAt(media, off + 2) * 65536 + byteAt(media, off + 3) * 16777216

  /** WAV fmt-chunk fields as expressions. The fmt chunk leads every
    * well-formed WAV (fixed 1-based offsets 23/25); the data chunk does
    * NOT sit at a fixed offset (LIST/INFO chunks may precede it) — sample
    * counts need [[WavDecoder]]'s real chunk scan. */
  def wavChannels(media: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(sniffFormat(media) === "wav", leU16(media, 23))

  def wavSampleRate(media: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(sniffFormat(media) === "wav", leU32(media, 25))

  /** PNG/GIF dimensions as expressions (fixed-offset containers); null
    * for formats needing a scan (JPEG — see [[HeaderDecoder]]). */
  def headerWidth(media: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(sniffFormat(media) === "png", beU32(media, 17))
      .when(sniffFormat(media) === "gif",
        byteAt(media, 7) + byteAt(media, 8) * 256)

  def headerHeight(media: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(sniffFormat(media) === "png", beU32(media, 21))
      .when(sniffFormat(media) === "gif",
        byteAt(media, 9) + byteAt(media, 10) * 256)

  /** Synthetic media table with REAL container headers built by
    * expressions (unhex of computed header hex + the text body), so the
    * parsers above parse genuine bytes while an arithmetic oracle knows
    * the planted dimensions: fmt = doc_id % 3 (png/gif/jpeg),
    * width = 100 + doc_id % 577, height = 64 + doc_id % 331. */
  def syntheticMediaTable(docs: DataFrame): DataFrame = {
    val w = lit(100) + col("doc_id") % 577
    val h = lit(64) + col("doc_id") % 331
    def hex32(v: org.apache.spark.sql.Column) = lpad(hex(v), 8, "0")
    def hexLe16(v: org.apache.spark.sql.Column) =
      concat(lpad(hex(v % 256), 2, "0"), lpad(hex(floor(v / 256).cast("long")), 2, "0"))
    def hexBe16(v: org.apache.spark.sql.Column) =
      concat(lpad(hex(floor(v / 256).cast("long")), 2, "0"), lpad(hex(v % 256), 2, "0"))
    val pngHeader = concat(
      lit("89504E470D0A1A0A"), lit("0000000D49484452"), hex32(w), hex32(h))
    val gifHeader = concat(lit("474946383961"), hexLe16(w), hexLe16(h))
    val jpegHeader = concat(
      lit("FFD8"),
      lit("FFE000104A46494600010100000100010000"), // APP0/JFIF segment
      lit("FFC0001108"), hexBe16(h), hexBe16(w))
    val header = when(col("doc_id") % 3 === 0, pngHeader)
      .when(col("doc_id") % 3 === 1, gifHeader)
      .otherwise(jpegHeader)
    docs.select(
      col("doc_id"),
      concat(unhex(header), encode(col("text"), "UTF-8")).as("media"))
  }

  /** Synthetic WAV table with REAL RIFF containers built by expressions
    * (same design as [[syntheticMediaTable]]): canonical 44-byte PCM
    * header, channels = 1 + doc_id % 2, sample_rate = 8000 +
    * (doc_id % 8) * 4000, 16-bit, the UTF-8 text body standing in as PCM
    * data — and every 4th doc carries a LIST/INFO chunk between fmt and
    * data, so fixed-offset parsing CANNOT find the data chunk and the
    * decoder's chunk scan is exercised for real. */
  def syntheticWavTable(docs: DataFrame): DataFrame = {
    val ch = lit(1) + col("doc_id") % 2
    val sr = lit(8000) + (col("doc_id") % 8) * 4000
    val bits = lit(16)
    val blockAlign = ch * 2
    val byteRate = sr * blockAlign
    val dataLen = length(col("text")) // ASCII corpus: text bytes = chars
    val hasList = col("doc_id") % 4 === 0
    val listLen = when(hasList, 12).otherwise(0)
    def hexLe16(v: org.apache.spark.sql.Column) = concat(
      lpad(hex(v % 256), 2, "0"),
      lpad(hex(floor(v / 256).cast("long") % 256), 2, "0"))
    def hexLe32(v: org.apache.spark.sql.Column) = concat(
      lpad(hex(v % 256), 2, "0"),
      lpad(hex(floor(v / 256).cast("long") % 256), 2, "0"),
      lpad(hex(floor(v / 65536).cast("long") % 256), 2, "0"),
      lpad(hex(floor(v / 16777216).cast("long") % 256), 2, "0"))
    val riffSize = lit(4) + lit(8 + 16) + listLen + lit(8) + dataLen
    val header = concat(
      lit("52494646"), hexLe32(riffSize), lit("57415645"), // RIFF....WAVE
      lit("666D7420"), hexLe32(lit(16)),                   // "fmt " + size
      hexLe16(lit(1)), hexLe16(ch),                        // PCM, channels
      hexLe32(sr), hexLe32(byteRate),
      hexLe16(blockAlign), hexLe16(bits),
      when(hasList, concat(lit("4C495354"), hexLe32(lit(4)), lit("494E464F")))
        .otherwise(lit("")),                               // LIST size INFO
      lit("64617461"), hexLe32(dataLen))                   // "data" + size
    docs.select(
      col("doc_id"),
      concat(unhex(header), encode(col("text"), "UTF-8")).as("media"))
  }

  /** GIF-variant LZW codec over an 8-bit alphabet at FIXED 9-bit code
    * width (LSB-first packing, leading CLEAR, trailing EOI — the wire
    * form inside a GIF image block). The images encoded here are small
    * enough that the code table never reaches 512 entries, so the
    * width-growth schedule is deliberately out of scope (its
    * encoder/decoder pairing conventions are the classic GIF
    * interop trap); everything else is the real algorithm — greedy
    * longest-match insertion on the encode side, the KwKwK
    * (code == next-entry) reconstruction case on the decode side,
    * spec-pinned. */
  object GifLzw extends Serializable {
    private val MinCode = 8
    private val Clear = 1 << MinCode
    private val Eoi = Clear + 1
    private val CodeSize = MinCode + 1

    def encode(pixels: Array[Int]): Array[Byte] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
      var cur = 0L; var nbits = 0
      def emit(code: Int): Unit = {
        cur |= code.toLong << nbits; nbits += CodeSize
        while (nbits >= 8) {
          out += (cur & 0xFF).toByte; cur >>= 8; nbits -= 8
        }
      }
      val dict = scala.collection.mutable.HashMap.empty[List[Int], Int]
      var next = Eoi + 1
      emit(Clear)
      var w = List(pixels(0))
      (1 until pixels.length).foreach { i =>
        val wk = w :+ pixels(i)
        if (dict.contains(wk)) w = wk
        else {
          emit(if (w.length == 1) w.head else dict(w))
          require(next < (1 << CodeSize),
            "image too large for the fixed-width variant")
          dict(wk) = next; next += 1
          w = List(pixels(i))
        }
      }
      emit(if (w.length == 1) w.head else dict(w))
      emit(Eoi)
      if (nbits > 0) out += (cur & 0xFF).toByte
      out.toArray
    }

    def decode(bytes: Array[Byte]): Array[Int] = {
      var bit = 0
      def read(): Int = {
        var v = 0
        (0 until CodeSize).foreach { j =>
          val b = bit + j
          if ((bytes(b >> 3) >> (b & 7) & 1) != 0) v |= 1 << j
        }
        bit += CodeSize
        v
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[Int]
      val dict = scala.collection.mutable.HashMap.empty[Int, List[Int]]
      var next = Eoi + 1
      var prev: List[Int] = Nil
      var done = false
      while (!done) {
        val c = read()
        if (c == Clear) { dict.clear(); next = Eoi + 1; prev = Nil }
        else if (c == Eoi) done = true
        else {
          val entry =
            if (c < Clear) List(c)
            else dict.getOrElse(c, {
              require(c == next && prev.nonEmpty,
                s"corrupt LZW stream: code $c, next $next")
              prev :+ prev.head // the KwKwK case
            })
          out ++= entry
          if (prev.nonEmpty) { dict(next) = prev :+ entry.head; next += 1 }
          prev = entry
        }
      }
      out.toArray
    }
  }

  /** REAL GIF89a encoding — complete files: header, logical screen
    * descriptor, 256-entry grayscale global color table, image
    * descriptor, the [[GifLzw]]-compressed index stream framed in
    * ≤255-byte sub-blocks, trailer. Pixel truth is planted arithmetic
    * pix(x, y) = (doc_id + 7x + 13y) mod 8 — eight distinct indices, so
    * runs repeat and the LZW dictionary genuinely builds multi-symbol
    * entries (the compression is real, not degenerate literals). */
  def syntheticGifTable(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      def le16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
      it.map { id =>
        val w = 4 + (id % 5).toInt
        val h = 3 + (id % 4).toInt
        val pixels = (for (y <- 0 until h; x <- 0 until w)
          yield ((id + 7L * x + 13L * y) % 8).toInt).toArray
        val lzw = GifLzw.encode(pixels)
        val sub = lzw.grouped(255)
          .flatMap(g => g.length.toByte +: g).toArray
        val palette = (0 until 256)
          .flatMap(i => Seq(i.toByte, i.toByte, i.toByte)).toArray
        val bytes = "GIF89a".getBytes("US-ASCII") ++
          le16(w) ++ le16(h) ++ Array(0xF7.toByte, 0.toByte, 0.toByte) ++
          palette ++
          Array(0x2C.toByte) ++ le16(0) ++ le16(0) ++ le16(w) ++ le16(h) ++
          Array(0.toByte, 8.toByte) ++ // descriptor flags, min code size
          sub ++ Array(0.toByte, 0x3B.toByte) // terminator, trailer
        (id, bytes)
      }
    }.toDF("doc_id", "media")
  }

  /** REAL GIF pixel decode: signature check, logical-screen walk (global
    * color table skipped by its declared size), extension blocks (0x21)
    * skipped by sub-block framing, image descriptor, sub-block
    * de-framing, full [[GifLzw]] decompression (dictionary rebuild
    * including the KwKwK case), and pixel values resolved THROUGH the
    * palette (red channel of each index — nothing assumes the identity
    * palette the generator happens to use). */
  def decodeGif(media: DataFrame): Dataset[PixelMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, p) =>
          def u8(i: Int): Int = p(i) & 0xFF
          def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
          require(new String(p.take(4), "US-ASCII") == "GIF8",
            s"doc $id: not a GIF")
          val flags = u8(10)
          var i = 13
          val palOff =
            if ((flags & 0x80) != 0) { val o = i
              i += 3 * (1 << ((flags & 7) + 1)); o
            } else -1
          while (u8(i) == 0x21) { // extensions: label + sub-blocks
            i += 2
            while (u8(i) != 0) i += 1 + u8(i)
            i += 1
          }
          require(u8(i) == 0x2C, s"doc $id: expected image descriptor")
          val w = le16(i + 5); val h = le16(i + 7)
          require((u8(i + 9) & 0x80) == 0, s"doc $id: local palettes unsupported")
          i += 10
          require(u8(i) == 8, s"doc $id: unexpected min code size")
          i += 1
          val lzw = new java.io.ByteArrayOutputStream()
          while (u8(i) != 0) {
            val n = u8(i); lzw.write(p, i + 1, n); i += 1 + n
          }
          val idx = GifLzw.decode(lzw.toByteArray)
          require(idx.length == w * h,
            s"doc $id: decoded ${idx.length} pixels, expected ${w * h}")
          val sum = idx.foldLeft(0L)((acc, ix) =>
            acc + (if (palOff >= 0) u8(palOff + 3 * ix) else ix))
          PixelMeta(id, w, h, w.toLong * h, sum)
        }
      }
  }

  case class PcmStats(doc_id: Long, n_samples: Long, peak_abs: Long,
      sum_abs: Long)

  /** REAL PCM sample decode — past the header, into the data: the RIFF
    * walk locates the `data` chunk (same alignment/LIST-skip rules as
    * [[WavDecoder]]), its payload is interpreted as little-endian
    * SIGNED 16-bit samples, and exact integer sample statistics fold
    * out (peak |amplitude|, Σ|amplitude|) — the clipping/level scan an
    * audio-curation gate runs. A trailing odd byte is ignored
    * (truncated final sample). Signedness is real two's-complement
    * (spec-pinned with planted negative samples); the ASCII test
    * corpus happens to produce positive samples, which is what lets
    * the DuckDB oracle re-derive the stats from the text bytes. */
  def decodePcm(media: DataFrame): Dataset[PcmStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, p) =>
          def u8(i: Int): Int = p(i) & 0xff
          def leU32(i: Int): Long =
            (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)).toLong |
              (u8(i + 3).toLong << 24)
          def tag(i: Int): String =
            new String(p.slice(i, i + 4), "US-ASCII")
          var off = -1; var size = 0L
          if (p.length >= 36 && tag(0) == "RIFF" && tag(8) == "WAVE") {
            var i = 12
            while (i + 8 <= p.length && off < 0) {
              val t = tag(i)
              val sz = leU32(i + 4)
              if (t == "data") { off = i + 8; size = sz }
              else i += 8 + sz.toInt + (sz.toInt & 1)
            }
          }
          var n = 0L; var peak = 0L; var sumAbs = 0L
          if (off >= 0) {
            val end = math.min(off + size, p.length.toLong).toInt
            var i = off
            while (i + 1 < end) {
              val v = (u8(i) | (u8(i + 1) << 8)).toShort.toLong // signed LE16
              val a = math.abs(v)
              if (a > peak) peak = a
              sumAbs += a; n += 1; i += 2
            }
          }
          PcmStats(id, n, peak, sumAbs)
        }
      }
  }

  /** Batched per-partition WAV decode (iterator-to-iterator, decoder
    * once per partition — same batching contract as [[decodeMedia]]). */
  def decodeWav(media: DataFrame): Dataset[AudioMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (id, bytes) => WavDecoder.decode(id, bytes) } }
  }

  case class VideoMeta(doc_id: Long, n_bytes: Long, brand: String,
      timescale: Long, duration: Long, duration_s: Long, mdat_bytes: Long)

  /** REAL MP4 (ISO-BMFF) box parser — the video analogue of
    * [[WavDecoder]]: a genuine top-level box walk ([size:be32][4cc]
    * records; `free` boxes interposed so fixed offsets cannot reach
    * `moov`), then a child walk inside `moov` (a `udta` box precedes
    * `mvhd`, forcing a real skip-by-size) to the version-0 `mvhd` whose
    * timescale/duration sit at payload offsets +12/+16. `mdat` size
    * comes from its own box header. Malformed payloads decode to zeros
    * rather than throwing. */
  object Mp4Decoder extends Serializable {
    def decode(id: Long, p: Array[Byte]): VideoMeta = {
      def u8(i: Int): Int = p(i) & 0xff
      def be32(i: Int): Long =
        ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) |
          u8(i + 3)).toLong
      def tag(i: Int): String = new String(p.slice(i, i + 4), "US-ASCII")
      if (p.length < 16 || tag(4) != "ftyp")
        return VideoMeta(id, p.length.toLong, "", 0L, 0L, 0L, 0L)
      var brand = ""
      var timescale = 0L; var duration = 0L; var mdat = 0L
      var i = 0
      var ok = true
      while (ok && i + 8 <= p.length) {
        val size = be32(i)
        val t = tag(i + 4)
        if (size < 8 || i + size > p.length) ok = false
        else {
          t match {
            case "ftyp" => brand = tag(i + 8)
            case "mdat" => mdat = size - 8
            case "moov" =>
              var j = i + 8
              while (j + 8 <= i + size) {
                val cs = be32(j)
                if (cs < 8 || j + cs > i + size) { j = i + size.toInt }
                else {
                  if (tag(j + 4) == "mvhd" && u8(j + 8) == 0 &&
                      j + 28 <= p.length) {
                    timescale = be32(j + 20)
                    duration = be32(j + 24)
                  }
                  j += cs.toInt
                }
              }
            case _ => ()
          }
          i += size.toInt
        }
      }
      val durS = if (timescale > 0) duration / timescale else 0L
      VideoMeta(id, p.length.toLong, brand, timescale, duration, durS, mdat)
    }
  }

  /** MP4 brand as an expression: `ftyp` is the mandatory FIRST box, so
    * its major brand sits at a fixed offset — unlike moov/mvhd, which
    * need [[Mp4Decoder]]'s box walk (a `free` box may precede them). */
  def mp4Brand(media: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(hex(substring(media, 5, 4)) === "66747970",
      decode(substring(media, 9, 4), "US-ASCII"))

  /** Synthetic MP4 table (the [[syntheticWavTable]] pattern): real
    * ISO-BMFF box layout — ftyp(16) [+ free(16) on every 4th doc]
    * + moov(128: udta(12) then mvhd(108, version 0)) + mdat(8+text) —
    * with arithmetic-known planted values: brand = doc_id % 3
    * (isom/mp41/mp42), timescale = 600·(1 + doc_id % 5),
    * duration_s = 10 + doc_id % 50. */
  def syntheticMp4Table(docs: DataFrame): DataFrame = {
    def hex32(v: org.apache.spark.sql.Column) = lpad(hex(v), 8, "0")
    val brand = element_at(
      array(lit("69736F6D"), lit("6D703431"), lit("6D703432")),
      (col("doc_id") % 3).cast("int") + 1)
    val timescale = (lit(1) + col("doc_id") % 5) * 600
    val durS = lit(10) + col("doc_id") % 50
    val duration = durS * timescale
    val hasFree = col("doc_id") % 4 === 0
    val textLen = length(col("text"))
    val mvhd = concat(
      lit("0000006C"), lit("6D766864"),          // size 108, 'mvhd'
      lit("00000000"),                           // version 0 + flags
      lit("00000000"), lit("00000000"),          // creation, modification
      hex32(timescale), hex32(duration),
      lit("00010000"), lit("01000000"),          // rate 1.0, volume 1.0 + rsvd
      lit("0" * 16),                             // reserved2 (8 bytes)
      lit("00010000" + "0" * 24 + "00010000" + "0" * 24 + "40000000"), // matrix
      lit("0" * 48),                             // pre_defined (24 bytes)
      lit("00000002"))                           // next_track_ID
    val header = concat(
      lit("00000010"), lit("66747970"), brand, lit("00000200"), // ftyp(16)
      when(hasFree,
        concat(lit("00000010"), lit("66726565"), lit("4752414654303030")))
        .otherwise(lit("")),                                    // free box
      lit("00000080"), lit("6D6F6F76"),                         // moov(128)
      lit("0000000C"), lit("75647461"), lit("00000000"),        // udta(12)
      mvhd,
      hex32(textLen + 8), lit("6D646174"))                      // mdat
    docs.select(
      col("doc_id"),
      concat(unhex(header), encode(col("text"), "UTF-8")).as("media"))
  }

  /** Batched per-partition MP4 decode (same iterator-to-iterator
    * contract as [[decodeMedia]]/[[decodeWav]]). */
  def decodeMp4(media: DataFrame): Dataset[VideoMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) => Mp4Decoder.decode(id, bytes) }
      }
  }

  /** One thumbnail record: source dims + aspect-fit target dims. */
  case class ThumbMeta(doc_id: Long, width: Int, height: Int,
      thumb_w: Int, thumb_h: Int)

  /** Aspect-fit thumbnail planning over decoded headers: fit (w, h)
    * into a `box`² target preserving aspect ratio, never upscaling —
    * the real geometry every resize stage runs; only the pixel resample
    * itself would need a codec. Integer arithmetic (floor division,
    * min 1 px) so the oracle reproduces it exactly. Runs through the
    * same iterator-to-iterator batched seam as decode. */
  def thumbnailPlan(media: DataFrame, decoder: MediaDecoder,
      box: Int): Dataset[ThumbMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val m = decoder.decode(id, bytes)
          val side = math.max(m.width, m.height)
          val (tw, th) =
            if (side <= 0) (0, 0)
            else if (side <= box) (m.width, m.height) // never upscale
            else (math.max(1, m.width * box / side),
              math.max(1, m.height * box / side))
          ThumbMeta(id, m.width, m.height, tw, th)
        }
      }
  }

  /** One image's ViT-style patch grid: ceil-division patch counts per
    * axis, the zero-padding the resizeless path would add, and the
    * resulting transformer sequence length (n_patches + 1 CLS token) —
    * the number every vision-training batcher needs per image BEFORE
    * any pixel is decoded. */
  case class PatchPlan(doc_id: Long, width: Int, height: Int,
      n_px: Int, n_py: Int, n_patches: Int, pad_w: Int, pad_h: Int,
      seq_len: Int)

  /** Patch-grid planning over decoded image headers — the geometry half
    * of ViT tokenization (patch embedding itself is the codec seam):
    * pure integer ceil arithmetic from the real header parse, one
    * map-side pass, no shuffle. Feeds sequence packing / batch shaping
    * the same way token counting feeds text packing. */
  def patchPlan(media: DataFrame, decoder: MediaDecoder,
      patch: Int): Dataset[PatchPlan] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val m = decoder.decode(id, bytes)
          val npx = (m.width + patch - 1) / patch
          val npy = (m.height + patch - 1) / patch
          PatchPlan(id, m.width, m.height, npx, npy, npx * npy,
            npx * patch - m.width, npy * patch - m.height,
            npx * npy + 1)
        }
      }
  }

  /** STFT-style frame-window planning over decoded audio headers — the
    * audio twin of [[patchPlan]] (whose patch grid is the geometry half
    * of ViT tokenization, this is the geometry half of fbank/MFCC
    * feature extraction; the windowed FFT itself is the codec seam).
    * Frame/hop lengths in samples derive from the REAL fmt-chunk parse
    * (`frameMs`/`hopMs` at the doc's own sample rate), the window count
    * is the standard (n - frame) / hop + 1, and each planned window
    * emits one row with its sample offset — the slice list a
    * feature-extract stage consumes, capped at `maxFrames` windows per
    * doc. Pure integer arithmetic (SQL `div`, exact in any engine),
    * map-side, one generator — no shuffle, no UDF past the decode
    * seam; scale cost is O(output windows). */
  def frameWindows(decoded: DataFrame, frameMs: Int, hopMs: Int,
      maxFrames: Int): DataFrame = {
    frameCounts(decoded, frameMs, hopMs, maxFrames)
      .select(col("doc_id"), col("sample_rate"), col("n_samples"),
        col("frame_len"), col("hop_len"), col("n_frames"),
        posexplode(sequence(lit(0L), col("seq_len") - 1))
          .as(Seq("frame_idx", "win")))
      .select(col("doc_id"), col("sample_rate"), col("n_samples"),
        col("frame_len"), col("hop_len"), col("n_frames"),
        col("frame_idx"),
        (col("win") * col("hop_len")).as("start_sample"))
  }

  /** Per-doc planned-window COUNTS without materializing the windows —
    * the audio-token budget a packer consumes ([[frameWindows]] is this
    * plus the explode; the count is all sequence packing needs, so the
    * packing path never generates O(windows) rows). `seq_len` is the
    * capped count, `n_frames` the uncapped plan size. Same guards as
    * the window generator: sub-frame docs (and the decoder's
    * unknown-payload zero rows) drop. Map-side, no shuffle. */
  def frameCounts(decoded: DataFrame, frameMs: Int, hopMs: Int,
      maxFrames: Int): DataFrame = {
    decoded
      .select(col("doc_id"),
        col("sample_rate").cast("long").as("sample_rate"),
        col("n_samples"),
        expr(s"(cast(sample_rate as bigint) * $frameMs) div 1000")
          .as("frame_len"),
        expr(s"(cast(sample_rate as bigint) * $hopMs) div 1000")
          .as("hop_len"))
      // a doc shorter than one frame yields no windows (frame_len > 0
      // also screens the decoder's unknown-payload zero rows)
      .where(col("frame_len") > 0 && col("n_samples") >= col("frame_len"))
      .withColumn("n_frames",
        expr("(n_samples - frame_len) div hop_len + 1"))
      .withColumn("seq_len",
        least(col("n_frames"), lit(maxFrames.toLong)))
  }

  /** Attach a binary payload column + metadata struct to documents —
    * the ingestion shape for media tables: (id, media BINARY,
    * media_meta STRUCT<mime, n_bytes>). */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        lit("application/octet-stream").as("mime"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))
        .as("media_meta"))

  case class PixelMeta(doc_id: Long, width: Int, height: Int,
      n_pixels: Long, pixel_sum: Long)

  /** REAL PNG encoding — the step beyond header synthesis: each doc
    * becomes a complete, spec-valid 8-bit grayscale PNG (IHDR + IDAT +
    * IEND, every chunk CRC32-stamped, scanlines zlib-DEFLATED through
    * `java.util.zip.Deflater` with alternating None/Up row filters so
    * the decoder's unfilter path is genuinely exercised). Pixel truth
    * is planted arithmetic — pixel(x, y) = (doc_id + 7x + 13y) mod 256
    * on a (4 + id%5) × (3 + id%4) grid — so the DuckDB oracle derives
    * the decoded sums without ever touching compression. Runs
    * iterator-to-iterator per partition like every media op here. */
  def syntheticPngTable(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      val crc = new java.util.zip.CRC32()
      def chunk(tag: String, payload: Array[Byte]): Array[Byte] = {
        val out = java.nio.ByteBuffer.allocate(12 + payload.length)
        out.putInt(payload.length)
        val tb = tag.getBytes("US-ASCII")
        out.put(tb).put(payload)
        crc.reset(); crc.update(tb); crc.update(payload)
        out.putInt(crc.getValue.toInt)
        out.array()
      }
      it.map { id =>
        val w = 4 + (id % 5).toInt
        val h = 3 + (id % 4).toInt
        def pix(x: Int, y: Int): Int = ((id + 7L * x + 13L * y) % 256).toInt
        // filtered raw stream: one filter byte + w samples per scanline
        val raw = new Array[Byte](h * (w + 1))
        var p = 0
        (0 until h).foreach { y =>
          val f = if (y % 2 == 0) 0 else 2 // None / Up alternating
          raw(p) = f.toByte; p += 1
          (0 until w).foreach { x =>
            raw(p) = (if (f == 0) pix(x, y)
                      else (pix(x, y) - pix(x, y - 1)) & 0xFF).toByte
            p += 1
          }
        }
        val defl = new java.util.zip.Deflater()
        defl.setInput(raw); defl.finish()
        val buf = new Array[Byte](raw.length + 64)
        val n = defl.deflate(buf)
        defl.end()
        val ihdr = java.nio.ByteBuffer.allocate(13)
          .putInt(w).putInt(h)
          .put(8.toByte).put(0.toByte) // bit depth 8, grayscale
          .put(0.toByte).put(0.toByte).put(0.toByte).array()
        val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
          .map(_.toByte)
        (id, sig ++ chunk("IHDR", ihdr) ++
          chunk("IDAT", buf.take(n)) ++ chunk("IEND", Array.emptyByteArray))
      }
    }.toDF("doc_id", "media")
  }

  /** REAL PNG pixel decode — the inverse, with nothing assumed: chunk
    * walk from the signature, CRC32 of EVERY chunk verified (a corrupt
    * byte anywhere is an error, not a wrong number), IDAT payloads
    * concatenated and INFLATED, scanlines un-filtered (None/Sub/Up —
    * the filters an encoder of grayscale content actually emits), and
    * the pixel sum folded exactly. The stub-decode charter allowance is
    * no longer used for PNG: this is the genuine codec path, pure JVM
    * (`java.util.zip`), batched iterator-to-iterator. */
  def decodePng(media: DataFrame): Dataset[PixelMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val crc = new java.util.zip.CRC32()
        it.map { case (id, bytes) =>
          val bb = java.nio.ByteBuffer.wrap(bytes)
          require(bb.getLong == 0x89504E470D0A1A0AL, s"doc $id: not a PNG")
          var w = 0; var h = 0
          val idat = new java.io.ByteArrayOutputStream()
          var done = false
          while (!done) {
            val len = bb.getInt
            val tag = new Array[Byte](4); bb.get(tag)
            val payload = new Array[Byte](len); bb.get(payload)
            val stored = bb.getInt
            crc.reset(); crc.update(tag); crc.update(payload)
            require(crc.getValue.toInt == stored,
              s"doc $id: CRC mismatch in ${new String(tag, "US-ASCII")}")
            new String(tag, "US-ASCII") match {
              case "IHDR" =>
                val ib = java.nio.ByteBuffer.wrap(payload)
                w = ib.getInt; h = ib.getInt
                require(ib.get == 8 && ib.get == 0,
                  s"doc $id: only 8-bit grayscale supported")
              case "IDAT" => idat.write(payload)
              case "IEND" => done = true
              case _ => () // ancillary chunks skip by size
            }
          }
          val inf = new java.util.zip.Inflater()
          inf.setInput(idat.toByteArray)
          val raw = new Array[Byte](h * (w + 1))
          var off = 0
          while (off < raw.length && !inf.finished()) {
            val n = inf.inflate(raw, off, raw.length - off)
            require(n > 0 || inf.finished(),
              s"doc $id: truncated IDAT stream")
            off += n
          }
          inf.end()
          require(off == raw.length, s"doc $id: truncated IDAT stream")
          // unfilter in place to recovered pixels, then fold the sum
          val prev = new Array[Int](w)
          var sum = 0L
          var p = 0
          (0 until h).foreach { y =>
            val f = raw(p) & 0xFF; p += 1
            var left = 0
            (0 until w).foreach { x =>
              val v = raw(p) & 0xFF
              val recon = f match {
                case 0 => v
                case 1 => (v + left) & 0xFF
                case 2 => (v + prev(x)) & 0xFF
                case other =>
                  throw new IllegalArgumentException(
                    s"doc $id: unsupported filter $other")
              }
              sum += recon; left = recon; prev(x) = recon; p += 1
            }
          }
          PixelMeta(id, w, h, w.toLong * h, sum)
        }
      }
  }

  /** Batched per-partition decode. Partition-parallel, streaming
    * iterator-to-iterator (no partition materialization), decoder
    * instantiated once per partition — the properties that matter when
    * each partition holds gigabytes of media. */
  def decodeMedia(media: DataFrame, decoder: MediaDecoder): Dataset[DecodedMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (id, bytes) => decoder.decode(id, bytes) } }
  }

  // ---------- baseline sequential JPEG (the last media codec) ----------

  /** One decoded JPEG's stats: dims, block count, exact pixel fold
    * (sum is AC-invariant — every AC basis function sums to zero over
    * its block — while min/max DO move with the planted AC coefficient,
    * so the oracle checks the Huffman AC path arithmetically, not just
    * the DC path). */
  case class JpegPixelMeta(doc_id: Long, width: Int, height: Int,
      n_blocks: Int, n_pixels: Long, pixel_sum: Long,
      pixel_min: Int, pixel_max: Int)

  /** Shared JFIF machinery for the encoder/decoder pair: zigzag order,
    * canonical Huffman table construction, and the planted-coefficient
    * arithmetic (see [[syntheticJpegTable]]). */
  object Jpeg extends Serializable {
    /** Standard zigzag scan: zigzag index -> raster index (row*8+col). */
    val Zigzag: Array[Int] = {
      val out = new Array[Int](64)
      var r = 0; var c = 0
      (0 until 64).foreach { i =>
        out(i) = r * 8 + c
        if ((r + c) % 2 == 0) { // moving up-right
          if (c == 7) r += 1 else if (r == 0) c += 1 else { r -= 1; c += 1 }
        } else { // moving down-left
          if (r == 7) c += 1 else if (c == 0) r += 1 else { r += 1; c -= 1 }
        }
      }
      out
    }

    /** A canonical Huffman table as the DHT wire pair (BITS counts by
      * code length 1..16, values in code order) plus the derived
      * symbol -> (code, length) map for the encoder. */
    final case class HuffTable(bits: Array[Int], values: Array[Int]) {
      val codes: Map[Int, (Int, Int)] = {
        var code = 0
        var k = 0
        val out = Map.newBuilder[Int, (Int, Int)]
        (1 to 16).foreach { len =>
          (0 until bits(len - 1)).foreach { _ =>
            out += values(k) -> ((code, len)); code += 1; k += 1
          }
          code <<= 1
        }
        out.result()
      }
    }

    /** DC table: categories 0..5 (planted diffs span -16..16), all at
      * code length 3 — a legal canonical table, not the Annex K one:
      * the DECODER builds its tables from the DHT segment, so a
      * non-standard table is exactly what proves that path real. */
    val DcTable: HuffTable = HuffTable(
      Array(0, 0, 6, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0),
      Array(0, 1, 2, 3, 4, 5))

    /** AC table: EOB, ZRL, and (run=6, size 1..2) for the single
      * planted coefficient at zigzag 39 = (4,4) (38 leading zeros =
      * ZRL x2 + run 6). Three codes at 2 bits + one at 3 leaves the
      * all-ones codeword unused, the spec's padding-safety convention
      * (scan padding is 1-bits and must never decode as a symbol). */
    val AcTable: HuffTable = HuffTable(
      Array(0, 3, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0),
      Array(0x00, 0xF0, 0x61, 0x62))

    /** Quantization table in ZIGZAG order: 8 at DC and at (4,4) — the
      * planted positions, chosen so dequantized values are multiples
      * of 8 and the flat/±(4,4) IDCT lands on exact integers — 16
      * elsewhere (read and applied by the decoder like any table). */
    val Quant: Array[Int] = Array.tabulate(64)(i =>
      if (i == 0 || i == 39) 8 else 16)

    /** Planted truth, shared by encoder, decoder spec, and the DuckDB
      * oracle: grid (8(1+id%3)) x (8(1+id%2)); per block (bx, by) the
      * quantized DC level is (id + bx + 3 by) mod 17 and the quantized
      * (4,4) AC level is ((id + bx + by) mod 5) - 2. With Q=8 at both
      * positions the IDCT is exactly pixel = 128 + dc + s(x)s(y) ac,
      * s = (+,-,-,+,+,-,-,+): cos(4(2x+1)pi/16) = ±sqrt(2)/2 and the
      * two sqrt(2)/2 factors square away, so every planted pixel is an
      * exact integer in [126, 146] — no clamping, and the decoder's
      * float IDCT sits ~1e-13 from it (rounding can never flip). */
    def dims(id: Long): (Int, Int) =
      (8 * (1 + (id % 3).toInt), 8 * (1 + (id % 2).toInt))
    def dcLevel(id: Long, bx: Int, by: Int): Int =
      ((id + bx + 3L * by) % 17).toInt
    def acLevel(id: Long, bx: Int, by: Int): Int =
      ((id + bx + by) % 5).toInt - 2

    /** JPEG entropy-coded amplitude: category (bit size) of v. */
    def category(v: Int): Int = {
      var a = math.abs(v); var n = 0
      while (a > 0) { a >>= 1; n += 1 }
      n
    }

    /** MSB-first bit writer with JPEG byte stuffing (a 0x00 after
      * every emitted 0xFF, spec B.1.1.5). */
    final class BitWriter {
      private val out = new java.io.ByteArrayOutputStream()
      private var acc = 0
      private var nbits = 0
      def put(code: Int, len: Int): Unit = {
        var i = len - 1
        while (i >= 0) {
          acc = (acc << 1) | ((code >> i) & 1)
          nbits += 1
          if (nbits == 8) {
            out.write(acc)
            if (acc == 0xFF) out.write(0x00)
            acc = 0; nbits = 0
          }
          i -= 1
        }
      }
      /** Amplitude bits: v as-is when positive, v - 1 low bits when
        * negative (the EXTEND convention, spec F.1.2.1). */
      def putAmplitude(v: Int, size: Int): Unit =
        if (size > 0) put(if (v >= 0) v else v + (1 << size) - 1, size)
      def finish(): Array[Byte] = {
        if (nbits > 0) { // pad with 1s
          acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
          out.write(acc)
          if (acc == 0xFF) out.write(0x00)
        }
        out.toByteArray
      }
    }

    /** MSB-first bit reader over the entropy segment with byte
      * UN-stuffing; refuses markers other than the stuffing pattern
      * inside the scan (no restart intervals are written here). */
    final class BitReader(p: Array[Byte], var pos: Int) {
      private var acc = 0
      private var nbits = 0
      def bit(): Int = {
        if (nbits == 0) {
          val b = p(pos) & 0xFF; pos += 1
          if (b == 0xFF) {
            val next = p(pos) & 0xFF; pos += 1
            require(next == 0x00, f"marker FF$next%02X inside entropy data")
          }
          acc = b; nbits = 8
        }
        nbits -= 1
        (acc >> nbits) & 1
      }
      def bits(n: Int): Int = {
        var v = 0
        (0 until n).foreach(_ => v = (v << 1) | bit())
        v
      }
      /** EXTEND (spec F.2.2.1): map `size` amplitude bits to a value. */
      def extend(n: Int): Int = {
        if (n == 0) return 0
        val v = bits(n)
        if (v < (1 << (n - 1))) v - (1 << n) + 1 else v
      }
    }

    /** Canonical Huffman DECODE tables from a DHT wire pair — MINCODE /
      * MAXCODE / VALPTR per the spec's Generate_size/code procedure
      * (F.2.2.3), NOT the encoder's map run backwards: the decoder must
      * work from the 17+n DHT bytes alone. */
    final class HuffDecoder(bits: Array[Int], values: Array[Int]) {
      private val minCode = new Array[Int](17)
      private val maxCode = new Array[Int](17)
      private val valPtr = new Array[Int](17)
      locally {
        var code = 0
        var k = 0
        (1 to 16).foreach { len =>
          valPtr(len) = k
          minCode(len) = code
          code += bits(len - 1); k += bits(len - 1)
          maxCode(len) = if (bits(len - 1) > 0) code - 1 else -1
          code <<= 1
        }
      }
      def decode(r: BitReader): Int = {
        var len = 1
        var code = r.bit()
        while (maxCode(len) < 0 || code > maxCode(len)) {
          require(len < 16, "corrupt Huffman code")
          code = (code << 1) | r.bit(); len += 1
        }
        values(valPtr(len) + (code - minCode(len)))
      }
    }
  }

  /** REAL baseline-sequential JPEG encoding — the final media codec
    * seam retired (PNG and GIF went first): each doc becomes a
    * complete, spec-valid 8-bit grayscale JFIF stream — DQT (zigzag
    * quant table), SOF0, two DHT segments (custom canonical DC and AC
    * tables), SOS, entropy-coded MCUs with DC prediction, amplitude
    * EXTEND coding, ZRL runs, EOB, byte stuffing, EOI. Pixel truth is
    * the planted-coefficient arithmetic in [[Jpeg]]: one DC level and
    * one (4,4) AC level per 8x8 block, both positions quantized at 8 so
    * the decoded block is EXACTLY flat+checkered integers — lossless
    * through a lossy format by construction, which is what lets a SQL
    * oracle verify a transform-coded codec. */
  def syntheticJpegTable(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val (w, h) = Jpeg.dims(id)
        val out = new java.io.ByteArrayOutputStream()
        def marker(m: Int, payload: Array[Byte]): Unit = {
          out.write(0xFF); out.write(m)
          val len = payload.length + 2
          out.write(len >> 8); out.write(len & 0xFF)
          out.write(payload, 0, payload.length)
        }
        out.write(0xFF); out.write(0xD8) // SOI
        marker(0xDB, Array(0.toByte) ++ Jpeg.Quant.map(_.toByte)) // DQT id 0
        marker(0xC0, Array[Byte](8, // SOF0: precision
          (h >> 8).toByte, (h & 0xFF).toByte,
          (w >> 8).toByte, (w & 0xFF).toByte,
          1, 1, 0x11, 0)) // 1 component, id 1, 1x1 sampling, qtable 0
        def dht(clazz: Int, t: Jpeg.HuffTable): Unit =
          marker(0xC4, Array(((clazz << 4) | 0).toByte) ++
            t.bits.map(_.toByte) ++ t.values.map(_.toByte))
        dht(0, Jpeg.DcTable)
        dht(1, Jpeg.AcTable)
        marker(0xDA, Array[Byte](1, 1, 0x00, 0, 63, 0)) // SOS
        val bw = new Jpeg.BitWriter
        var pred = 0
        (0 until h / 8).foreach { by =>
          (0 until w / 8).foreach { bx =>
            val dc = Jpeg.dcLevel(id, bx, by)
            val ac = Jpeg.acLevel(id, bx, by)
            val diff = dc - pred
            pred = dc
            val cat = Jpeg.category(diff)
            val (dcode, dlen) = Jpeg.DcTable.codes(cat)
            bw.put(dcode, dlen)
            bw.putAmplitude(diff, cat)
            if (ac != 0) {
              // 38 zeros before zigzag 39: ZRL (16 zeros) twice + run 6
              val (z, zl) = Jpeg.AcTable.codes(0xF0)
              bw.put(z, zl); bw.put(z, zl)
              val size = Jpeg.category(ac)
              val (acode, alen) = Jpeg.AcTable.codes(0x60 | size)
              bw.put(acode, alen)
              bw.putAmplitude(ac, size)
            }
            val (e, el) = Jpeg.AcTable.codes(0x00) // EOB
            bw.put(e, el)
          }
        }
        out.write(bw.finish())
        out.write(0xFF); out.write(0xD9) // EOI
        (id, out.toByteArray)
      }
    }.toDF("doc_id", "media")
  }

  /** REAL baseline-sequential JPEG pixel decode — nothing assumed from
    * the encoder: marker walk from SOI (APPn/COM skipped by length),
    * DQT read in zigzag order, SOF0 dims, BOTH Huffman tables built
    * from their DHT wire bytes via the spec's MINCODE/MAXCODE/VALPTR
    * procedure, then the entropy scan: per-MCU DC category decode +
    * EXTEND + prediction, the AC run/size loop (EOB / ZRL / run-length
    * zeros), dequantization through the zigzag, and a full 64-point
    * separable floating IDCT with level shift, rounding, and clamp —
    * the general baseline decoder, not a planted-position shortcut.
    * Exactness contract: the planted coefficients make every true
    * pixel an exact integer, and the float IDCT's ~1e-13 error can
    * never move the round (the PAPERS.md float-oracle discipline).
    * Batched iterator-to-iterator like every media op here; the
    * per-partition cosine table is built once. */
  def decodeJpeg(media: DataFrame): Dataset[JpegPixelMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // cos((2x+1) u pi / 16) * C(u), shared across blocks
        val cosT = Array.tabulate(8, 8) { (x, u) =>
          (if (u == 0) 1.0 / math.sqrt(2.0) else 1.0) *
            math.cos((2 * x + 1) * u * math.Pi / 16.0)
        }
        it.map { case (id, p) =>
          require((p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xD8,
            s"doc $id: not a JPEG")
          var pos = 2
          var w = 0; var h = 0
          val quant = new Array[Int](64)
          var dcDec: Jpeg.HuffDecoder = null
          var acDec: Jpeg.HuffDecoder = null
          var scanAt = -1
          while (scanAt < 0) {
            require((p(pos) & 0xFF) == 0xFF, s"doc $id: marker expected")
            val m = p(pos + 1) & 0xFF
            require(m != 0xD9, s"doc $id: EOI before scan")
            val len = ((p(pos + 2) & 0xFF) << 8) | (p(pos + 3) & 0xFF)
            val body = pos + 4
            m match {
              case 0xDB =>
                require((p(body) & 0x0F) == 0, s"doc $id: quant id")
                (0 until 64).foreach(i => quant(i) = p(body + 1 + i) & 0xFF)
              case 0xC0 =>
                h = ((p(body + 1) & 0xFF) << 8) | (p(body + 2) & 0xFF)
                w = ((p(body + 3) & 0xFF) << 8) | (p(body + 4) & 0xFF)
                require((p(body + 5) & 0xFF) == 1,
                  s"doc $id: only single-component baseline supported")
              case 0xC4 =>
                val clazz = (p(body) & 0xF0) >> 4
                val bits = Array.tabulate(16)(i => p(body + 1 + i) & 0xFF)
                val n = bits.sum
                val values = Array.tabulate(n)(i => p(body + 17 + i) & 0xFF)
                val dec = new Jpeg.HuffDecoder(bits, values)
                if (clazz == 0) dcDec = dec else acDec = dec
              case 0xDA => scanAt = pos + 2 + len // entropy data follows SOS
              case _ => () // APPn/COM skip by length
            }
            pos += 2 + len
          }
          require(w > 0 && h > 0 && dcDec != null && acDec != null,
            s"doc $id: missing SOF/DHT before SOS")
          val r = new Jpeg.BitReader(p, scanAt)
          var pred = 0
          var sum = 0L
          var pmin = 255; var pmax = 0
          val coef = new Array[Int](64)
          (0 until h / 8).foreach { _ =>
            (0 until w / 8).foreach { _ =>
              java.util.Arrays.fill(coef, 0)
              val cat = dcDec.decode(r)
              pred += r.extend(cat)
              coef(0) = pred * quant(0)
              var k = 1
              var eob = false
              while (k < 64 && !eob) {
                val rs = acDec.decode(r)
                val run = (rs >> 4) & 0x0F
                val size = rs & 0x0F
                if (size == 0) {
                  if (run == 15) k += 16 // ZRL
                  else eob = true        // EOB
                } else {
                  k += run
                  require(k < 64, s"doc $id: AC run past block end")
                  coef(Jpeg.Zigzag(k)) = r.extend(size) * quant(k)
                  k += 1
                }
              }
              // separable 2D IDCT: rows then columns
              val tmp = new Array[Double](64)
              (0 until 8).foreach { y =>
                (0 until 8).foreach { x =>
                  var s = 0.0
                  (0 until 8).foreach { u =>
                    s += cosT(x)(u) * coef(y * 8 + u)
                  }
                  tmp(y * 8 + x) = s
                }
              }
              (0 until 8).foreach { y =>
                (0 until 8).foreach { x =>
                  var s = 0.0
                  (0 until 8).foreach { v =>
                    s += cosT(y)(v) * tmp(v * 8 + x)
                  }
                  val px = math.max(0, math.min(255,
                    math.round(s / 4.0 + 128.0).toInt))
                  sum += px
                  if (px < pmin) pmin = px
                  if (px > pmax) pmax = px
                }
              }
            }
          }
          JpegPixelMeta(id, w, h, (w / 8) * (h / 8), w.toLong * h,
            sum, pmin, pmax)
        }
      }
  }
}
