package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.ExtCorpus

class ExtensionSpec extends AnyFunSuite {
  import SparkTest._

  test("WordShingles/FoldHash expressions ≡ the HOF formulations they replace") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // adversarial strings: runs of spaces (empty tokens), leading/trailing
    // spaces, short texts, repeats (distinct), non-ASCII codepoints
    val texts = Seq(
      "a b c d e", "a  b c", " a b c ", "", "x", "x y", "a b a b a b",
      "héllo wörld ünïcode test", "tab\tnot split here ok", "a b c")
      .toDF("text")
    graft.expressions.ShingleOps.ensureRegistered(spark)
    val toks = split(col("text"), " ")
    val hofShingles = array_distinct(filter(
      transform(toks, (_, i) =>
        when(i + 2 < size(toks),
          concat_ws(" ",
            element_at(toks, i + 1),
            element_at(toks, i + 2),
            element_at(toks, i + 3)))),
      s => s.isNotNull))
    val both = texts.select(
      col("text"),
      call_function("word_shingles", col("text")).as("expr_sh"),
      hofShingles.as("hof_sh"))
    both.collect().foreach { r =>
      assert(r.getSeq[String](1) === r.getSeq[String](2),
        s"shingle mismatch for '${r.getString(0)}'")
    }
    // fold hash over every shingle + edge cases, vs the HOF char fold
    val hofFold = (s: org.apache.spark.sql.Column) =>
      when(length(s) > 0,
        aggregate(
          transform(sequence(lit(1), length(s)), i =>
            ascii(s.substr(i, lit(1))).cast("long")),
          lit(0L), (acc, x) => (acc * 131 + x) % graft.operators.Dedup.P))
        .otherwise(0L)
    val strs = (Seq("", "a", "ab c", "héllo", "ünïcode wörld") ++
      Seq.tabulate(50)(i => s"w$i w${i + 1} w${i + 2}")).toDF("s")
    val cmp = strs.select(
      call_function("fold_hash", col("s")).as("expr_h"),
      hofFold(col("s")).as("hof_h"))
    cmp.collect().foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("BigramBuckets kernel ≡ the HOF concat/fold_hash formulation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.expressions.ShingleOps.ensureRegistered(spark)
    val texts = Seq("a b c", "one", "", "x  y", "héllo wörld über",
      "a b a b a", "tab\tword more").toDF("text")
    val hof = texts.select(expr(
      """transform(zip_with(
           slice(split(text, ' '), 1, greatest(size(split(text, ' ')) - 1, 0)),
           slice(split(text, ' '), 2, greatest(size(split(text, ' ')) - 1, 0)),
           (a, b) -> concat(a, ' ', b)),
         bg -> fold_hash(bg) % 1024L)""").as("bk"))
      .as[Seq[Long]].collect().toSeq
    val kernel = texts.select(
        call_function("word_bigram_buckets", col("text"), lit(1024L)).as("bk"))
      .as[Seq[Long]].collect().toSeq
    assert(kernel === hof)
  }

  test("HeaderDecoder parses canonical hand-written image headers") {
    import graft.operators.Multimodal.HeaderDecoder
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // 640×480 PNG: signature + IHDR length/type + dims
    val png = bytes(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0x02, 0x80, 0, 0, 0x01, 0xe0, 8, 6, 0, 0, 0)
    val p = HeaderDecoder.decode(1, png)
    assert((p.width, p.height) === (640, 480))
    // 320×200 GIF89a: little-endian u16 dims
    val gif = bytes('G', 'I', 'F', '8', '9', 'a', 0x40, 0x01, 0xc8, 0x00, 0)
    val g = HeaderDecoder.decode(2, gif)
    assert((g.width, g.height) === (320, 200))
    // JPEG: SOI, APP0 (16 bytes), COM segment, then SOF2 (progressive)
    // 123×45 — the scan must skip variable segments and accept any SOF
    val jpeg = bytes(0xff, 0xd8,
      0xff, 0xe0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0,
      0xff, 0xfe, 0x00, 0x04, 'h', 'i', // COM, length 4
      0xff, 0xc2, 0x00, 0x11, 8, 0x00, 0x2d, 0x00, 0x7b, 3, 0, 0, 0, 0, 0, 0, 0, 0)
    val j = HeaderDecoder.decode(3, jpeg)
    assert((j.width, j.height) === (123, 45))
    // garbage decodes to 0x0, no throw
    val u = HeaderDecoder.decode(4, bytes(1, 2, 3, 4, 5))
    assert((u.width, u.height) === (0, 0))
  }

  test("PNG decode: real zlib round-trip, filter reconstruction, CRC rejection") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq(0L, 1L, 7L, 19L).toDF("doc_id")
    val pngs = graft.operators.Multimodal.syntheticPngTable(docs)
    val got = graft.operators.Multimodal.decodePng(pngs)
      .collect().map(m => m.doc_id -> m).toMap
    Seq(0L, 1L, 7L, 19L).foreach { id =>
      val w = 4 + (id % 5).toInt; val h = 3 + (id % 4).toInt
      val expect = (for { y <- 0 until h; x <- 0 until w }
        yield (id + 7L * x + 13L * y) % 256).sum
      assert(got(id).width == w && got(id).height == h &&
        got(id).pixel_sum == expect,
        s"doc $id decoded wrong: ${got(id)}")
    }
    // a single flipped payload byte must be REJECTED (CRC), never a
    // silently wrong sum
    val corrupted = pngs.as[(Long, Array[Byte])].map { case (id, b) =>
      val c = b.clone(); c(c.length - 15) = (c(c.length - 15) ^ 0x01).toByte
      (id, c)
    }.toDF("doc_id", "media")
    val ex = intercept[org.apache.spark.SparkException] {
      graft.operators.Multimodal.decodePng(corrupted).collect()
    }
    val messages = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .toSeq
    assert(messages.exists(_.contains("CRC")),
      s"expected a CRC rejection, got: $messages")
  }

  test("GifLzw: round-trip incl. the KwKwK case; decodeGif walks extensions") {
    import graft.operators.Multimodal.GifLzw
    // [1,1,1] forces code==next on decode (the classic KwKwK edge)
    assert(GifLzw.decode(GifLzw.encode(Array(1, 1, 1))).toSeq == Seq(1, 1, 1))
    // deterministic pseudo-random and highly repetitive streams
    val r = (0 until 300).map(i => (i * 31 + 7) % 8).toArray
    assert(GifLzw.decode(GifLzw.encode(r)).toSeq == r.toSeq)
    val runs = Array.fill(200)(3) ++ Array.fill(100)(5)
    assert(GifLzw.decode(GifLzw.encode(runs)).toSeq == runs.toSeq)
    // a planted extension block must be skipped by sub-block framing
    import spark.implicits._
    val gif = graft.operators.Multimodal.syntheticGifTable(
      Seq(5L).toDF("doc_id")).as[(Long, Array[Byte])].collect().head._2
    val palEnd = 13 + 768
    val ext = Array(0x21.toByte, 0xFE.toByte, // comment extension
      3.toByte, 'h'.toByte, 'i'.toByte, '!'.toByte, 0.toByte)
    val withExt = gif.take(palEnd) ++ ext ++ gif.drop(palEnd)
    val got = graft.operators.Multimodal.decodeGif(
      Seq((5L, withExt)).toDF("doc_id", "media")).collect().head
    val expect = (for { y <- 0 until (3 + 5 % 4); x <- 0 until (4 + 5 % 5) }
      yield (5L + 7 * x + 13 * y) % 8).sum
    assert(got.pixel_sum == expect && got.width == 4 && got.height == 4,
      s"extension-skipping decode wrong: $got")
  }

  test("JPEG: baseline encode/decode round-trip on planted coefficients; " +
      "truncation rejected") {
    import spark.implicits._
    import graft.operators.Multimodal
    // the planted AC position must be raster (4,4) — the one AC basis
    // whose two cos factors square to exactly 1/2, making every pixel
    // an exact integer (the oracle's arithmetic rests on this)
    assert(Multimodal.Jpeg.Zigzag(39) === 4 * 8 + 4)
    val ids = Seq(0L, 1L, 5L, 11L, 23L, 40L)
    val jpegs = Multimodal.syntheticJpegTable(ids.toDF("doc_id"))
    val got = Multimodal.decodeJpeg(jpegs)
      .collect().map(m => m.doc_id -> m).toMap
    ids.foreach { id =>
      val (w, h) = Multimodal.Jpeg.dims(id)
      val blocks = for { by <- 0 until h / 8; bx <- 0 until w / 8 }
        yield (Multimodal.Jpeg.dcLevel(id, bx, by),
          Multimodal.Jpeg.acLevel(id, bx, by))
      val m = got(id)
      assert((m.width, m.height, m.n_blocks, m.n_pixels) ===
        (w, h, blocks.size, w.toLong * h), s"doc $id dims: $m")
      assert(m.pixel_sum ===
        blocks.map { case (d, _) => 64L * (128 + d) }.sum,
        s"doc $id sum (DC/Huffman/prediction path): $m")
      assert(m.pixel_min ===
        blocks.map { case (d, e) => 128 + d - math.abs(e) }.min,
        s"doc $id min (AC EXTEND sign path): $m")
      assert(m.pixel_max ===
        blocks.map { case (d, e) => 128 + d + math.abs(e) }.max,
        s"doc $id max (AC path): $m")
    }
    // a truncated entropy segment must throw, never return short stats
    val cut = jpegs.as[(Long, Array[Byte])]
      .map { case (id, b) => (id, b.take(b.length - 8)) }
      .toDF("doc_id", "media")
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeJpeg(cut).collect()
    }
    ()
  }

  test("decodePcm: signed two's-complement samples, odd trailing byte, non-WAV") {
    import spark.implicits._
    // canonical 44-byte header + planted samples: +1, -1, -32768, +score
    def le16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def le32(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    val data = le16(1) ++ le16(0xFFFF) ++ le16(0x8000) ++ le16(300) ++
      Array(0x7F.toByte) // odd trailing byte: truncated final sample
    val wav = "RIFF".getBytes ++ le32(4 + 24 + 8 + data.length) ++
      "WAVE".getBytes ++ "fmt ".getBytes ++ le32(16) ++
      le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++
      le16(2) ++ le16(16) ++ "data".getBytes ++ le32(data.length) ++ data
    val got = graft.operators.Multimodal.decodePcm(
      Seq((1L, wav)).toDF("doc_id", "media")).collect().head
    assert(got.n_samples == 4, s"odd byte must truncate: $got")
    assert(got.peak_abs == 32768, s"two's-complement peak: $got")
    assert(got.sum_abs == 1 + 1 + 32768 + 300, s"abs sum: $got")
    // garbage input decodes to zeros, never throws (audio gates skip)
    val junk = graft.operators.Multimodal.decodePcm(
      Seq((2L, "not a riff".getBytes)).toDF("doc_id", "media"))
      .collect().head
    assert(junk.n_samples == 0 && junk.peak_abs == 0)
  }

  test("WavDecoder: canonical header, LIST-chunk scan, odd-size padding, garbage") {
    import graft.operators.Multimodal.WavDecoder
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    def le32(v: Int) = Seq(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >> 24) & 0xff)
    def le16(v: Int) = Seq(v & 0xff, (v >> 8) & 0xff)
    def fmt(ch: Int, sr: Int, bits: Int) =
      Seq('f'.toInt, 'm'.toInt, 't'.toInt, ' '.toInt) ++ le32(16) ++
        le16(1) ++ le16(ch) ++ le32(sr) ++ le32(sr * ch * bits / 8) ++
        le16(ch * bits / 8) ++ le16(bits)
    def riff(inner: Seq[Int]) =
      bytes(Seq('R'.toInt, 'I'.toInt, 'F'.toInt, 'F'.toInt) ++ le32(4 + inner.size) ++
        Seq('W'.toInt, 'A'.toInt, 'V'.toInt, 'E'.toInt) ++ inner: _*)
    val dataTag = Seq('d'.toInt, 'a'.toInt, 't'.toInt, 'a'.toInt)
    // canonical: stereo 44100 Hz 16-bit, 8 data bytes = 2 samples
    val canonical = riff(fmt(2, 44100, 16) ++ dataTag ++ le32(8) ++ Seq.fill(8)(0))
    val c = WavDecoder.decode(1, canonical)
    assert((c.sample_rate, c.channels, c.bits, c.n_samples) === ((44100, 2, 16, 2L)))
    // an ODD-sized LIST chunk before data: the scan must add the RIFF
    // word-alignment pad byte or it misreads everything after
    val listOdd = Seq('L'.toInt, 'I'.toInt, 'S'.toInt, 'T'.toInt) ++ le32(5) ++
      Seq('I'.toInt, 'N'.toInt, 'F'.toInt, 'O'.toInt, 0) ++ Seq(0) // pad
    val padded = riff(fmt(1, 8000, 8) ++ listOdd ++ dataTag ++ le32(6) ++ Seq.fill(6)(0))
    val d = WavDecoder.decode(2, padded)
    assert((d.sample_rate, d.channels, d.bits, d.n_samples) === ((8000, 1, 8, 6L)))
    // garbage: zeros, no throw
    val u = WavDecoder.decode(3, bytes(1, 2, 3, 4, 5))
    assert((u.sample_rate, u.channels, u.n_samples) === ((0, 0, 0L)))
  }

  test("frameWindows: tiling invariants + edge docs over the real WAV parse") {
    import spark.implicits._
    // planted texts: shorter than one frame (sr=8000 → frame 200 samples,
    // mono 16-bit → 2 bytes/sample → <400 bytes drops), exactly one
    // frame, mid-size, and long enough to hit the 12-window cap
    val docs = Seq(
      (0L, "x" * 100),   // 50 samples < 200 → no windows
      (8L, "y" * 400),   // sr=8000 mono → exactly 200 samples = 1 window
      (1L, "z" * 2000),  // sr=12000 stereo → 500 samples, frame 300 hop 120
      (16L, "w" * 8000)) // sr=8000 mono → 4000 samples → 48 frames, cap 12
      .toDF("doc_id", "text")
    val wav = Multimodal.syntheticWavTable(docs)
    val out = Multimodal.frameWindows(Multimodal.decodeWav(wav).toDF(),
      frameMs = 25, hopMs = 10, maxFrames = 12).collect()
    assert(!out.exists(_.getLong(0) == 0L)) // sub-frame doc emits nothing
    val one = out.filter(_.getLong(0) == 8L)
    assert(one.length === 1 && one.head.getLong(7) === 0L)
    val mid = out.filter(_.getLong(0) == 1L)
    // (500 - 300) div 120 + 1 = 2 windows at offsets 0, 120
    assert(mid.map(_.getLong(7)).sorted.toSeq === Seq(0L, 120L))
    mid.foreach { r =>
      assert(r.getLong(3) === 300L && r.getLong(4) === 120L)
      // every emitted window fits inside the sample count
      assert(r.getLong(7) + r.getLong(3) <= r.getLong(2))
    }
    val capped = out.filter(_.getLong(0) == 16L)
    assert(capped.length === 12 && capped.map(_.getLong(5)).head === 48L)
    assert(capped.map(_.getInt(6)).sorted.toSeq === (0 until 12))
    // offsets tile with the hop everywhere
    out.foreach(r => assert(r.getLong(7) % r.getLong(4) === 0L))
  }

  test("frameCounts ≡ frameWindows cardinality; interleaved pack budgets") {
    import spark.implicits._
    val docs = Seq(
      (0L, "x" * 100), (8L, "y" * 400), (1L, "z" * 2000), (16L, "w" * 8000))
      .toDF("doc_id", "text")
    val dec = Multimodal.decodeWav(Multimodal.syntheticWavTable(docs)).toDF()
    val counts = Multimodal.frameCounts(dec, 25, 10, 12)
      .select("doc_id", "seq_len").as[(Long, Long)].collect().toMap
    val wins = Multimodal.frameWindows(dec, 25, 10, 12)
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(counts === wins) // the count path IS the explode's cardinality
    assert(!counts.contains(0L)) // sub-frame doc dropped on both paths

    // interleaved sample budget: vis seq + text tokens + 2, per doc
    val d2 = Seq((3L, "a b c"), (4L, "one two")).toDF("doc_id", "text")
    val media = Multimodal.syntheticMediaTable(d2)
    val vis = Multimodal.patchPlan(media, Multimodal.HeaderDecoder, 16)
      .toDF().select($"doc_id", $"seq_len".cast("long").as("v"))
    val got = vis.join(
        d2.select($"doc_id", size(split($"text", " ")).cast("long").as("t")),
        "doc_id")
      .select($"doc_id", ($"v" + $"t" + lit(2L)).as("n"))
      .as[(Long, Long)].collect().toMap
    // doc 3: w=103,h=67 → ceil grids 7x5 → 35+1 vis, 3 text, +2 = 41
    assert(got(3L) === (7 * 5 + 1) + 3 + 2)
    // doc 4: w=104,h=68 → 7x5 → 36 vis, 2 text, +2 = 40
    assert(got(4L) === (7 * 5 + 1) + 2 + 2)
  }

  test("Mp4Decoder: box walk with free shift + udta skip; truncated box; garbage") {
    import graft.operators.Multimodal.Mp4Decoder
    def be32(v: Int) = Seq((v >> 24) & 0xff, (v >> 16) & 0xff, (v >> 8) & 0xff, v & 0xff)
    def cc(s: String) = s.map(_.toInt)
    def box(t: String, payload: Seq[Int]) = be32(8 + payload.size) ++ cc(t) ++ payload
    def bytes(xs: Seq[Int]): Array[Byte] = xs.map(_.toByte).toArray
    def mvhd(ts: Int, dur: Int) = box("mvhd",
      be32(0) ++ be32(0) ++ be32(0) ++ be32(ts) ++ be32(dur) ++
        Seq.fill(80)(0)) // rate..next_track_id, zero-filled (size is right)
    val ftyp = box("ftyp", cc("mp42") ++ be32(0))
    // free box BEFORE moov, udta BEFORE mvhd: both walks must skip by size
    val full = bytes(ftyp ++ box("free", Seq.fill(8)(0)) ++
      box("moov", box("udta", be32(0)) ++ mvhd(1000, 42000)) ++
      box("mdat", Seq.fill(13)(0)))
    val m = Mp4Decoder.decode(1, full)
    assert((m.brand, m.timescale, m.duration, m.duration_s, m.mdat_bytes) ===
      (("mp42", 1000L, 42000L, 42L, 13L)))
    // a box whose declared size overruns the payload: stop cleanly with
    // whatever was parsed before it, never read out of bounds
    val truncated = bytes(ftyp ++ be32(9999) ++ cc("moov"))
    val t = Mp4Decoder.decode(2, truncated)
    assert((t.brand, t.timescale) === (("mp42", 0L)))
    // garbage (no ftyp): zeros, no throw
    val g = Mp4Decoder.decode(3, bytes(Seq(1, 2, 3, 4, 5)))
    assert((g.brand, g.timescale, g.mdat_bytes) === (("", 0L, 0L)))
  }

  test("JPEG marker scan consumes 0xFF fill bytes instead of reading a bogus length (B.1.1.2)") {
    import graft.operators.Multimodal.HeaderDecoder
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // SOI, three fill bytes before APP0, two more before SOF0 — real-world
    // encoders pad with 0xFF; parsing a fill byte as a marker would read a
    // garbage length and skip the real SOF (round-2 advice). 77×33.
    val jpeg = bytes(0xff, 0xd8,
      0xff, 0xff, 0xff, // fill
      0xff, 0xe0, 0x00, 0x04, 0, 0, // APP0, length 4
      0xff, 0xff, // fill
      0xff, 0xc0, 0x00, 0x11, 8, 0x00, 0x21, 0x00, 0x4d, 3,
      0, 0, 0, 0, 0, 0, 0, 0)
    val j = HeaderDecoder.decode(9, jpeg)
    assert((j.width, j.height) === (77, 33))
  }

  test("connectedComponents: min-id labels across chained and separate clusters") {
    import spark.implicits._
    // 1-2-3 chained (diameter 2), {10,11} separate, {5,6,7} a triangle
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (5L, 6L), (6L, 7L), (5L, 7L))
      .toDF("a_id", "b_id")
    val comps = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(comps === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("dedup_exact finds exactly the planted identical copies") {
    import spark.implicits._
    val out = Dedup.exact(ExtCorpus.docCorpus(spark, Sf), "doc_id", "text")
      .select($"canonical_id", $"copies").as[(Long, Long)].collect().toMap
    val planted = spark.read.parquet(s"$Sf/documents.parquet")
      .where($"doc_id" % 17 === 0).select($"doc_id").as[Long].collect().toSet
    assert(out.keySet === planted)
    assert(out.values.forall(_ == 2L))
  }

  test("minhash LSH recovers planted near-dups with high recall, no junk") {
    import spark.implicits._
    val pairs = Dedup.minhashLsh(ExtCorpus.docCorpus(spark, Sf), "doc_id", "text", 0.5)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    val nearPlanted = spark.read.parquet(s"$Sf/documents.parquet")
      .where($"doc_id" % 10 === 0).select($"doc_id").as[Long].collect()
      .map(id => (id, id + 200000L)).toSet
    val exactPlanted = spark.read.parquet(s"$Sf/documents.parquet")
      .where($"doc_id" % 17 === 0).select($"doc_id").as[Long].collect()
      .map(id => (id, id + 100000L)).toSet
    // exact dups always collide in every band → full recall on them
    // (other surviving pairs are genuine ≥0.5-Jaccard neighbors — the
    // 31-word corpus vocabulary makes some natural near-dups real)
    assert(exactPlanted.subsetOf(pairs))
    // near-dup recall is probabilistic via banding but should be high
    val recall = nearPlanted.count(pairs.contains).toDouble / nearPlanted.size
    assert(recall > 0.8, s"near-dup recall $recall")
  }

  test("overlap matrix: LSH tier ≡ Jaccard tier on the planted corpus") {
    // both tiers verify candidates with the same exact-Jaccard >= 0.5
    // gate, and on the planted corpus neither candidate generator
    // (rare-shingle pairing / banded signatures) misses a true pair —
    // so the source-pair matrices must agree exactly
    val jacc = graft.queries.ExtensionQueries
      .queries("dedup_overlap_matrix")(spark, Sf).collect().toSeq
    val lsh = graft.queries.ExtensionQueries
      .queries("dedup_overlap_matrix_lsh")(spark, Sf).collect().toSeq
    assert(lsh === jacc)
  }

  test("embedding near-dup blocking finds planted neighbors, no cross junk") {
    import spark.implicits._
    val pairs = Dedup.embeddingNearDups(ExtCorpus.embCorpus(spark, Sf), 0.9)
      .select($"a_id", $"b_id", $"cos").collect()
    assert(pairs.nonEmpty)
    // all pairs are (v, v+100000) planted ones and similarity is ~1
    pairs.foreach { r =>
      assert(r.getLong(1) === r.getLong(0) + 100000L)
      assert(r.getDouble(2) > 0.95)
    }
  }

  test("brute-force ANN: self excluded, k respected, ranks contiguous") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$Sf/embeddings.parquet").select($"vec_id",
      transform($"embedding", x => x.cast("double")).as("embedding"))
    val qs = emb.where($"vec_id" % 100 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val out = Similarity.bruteForceTopK(qs, emb, 5)
    val grouped = out.select($"q_id", $"rnk", $"vec_id")
      .as[(Long, Int, Long)].collect().groupBy(_._1)
    assert(grouped.values.forall(_.length == 5))
    grouped.foreach { case (q, rows) =>
      assert(rows.forall(_._3 != q))
      assert(rows.map(_._2).sorted.toSeq == Seq(1, 2, 3, 4, 5))
    }
  }

  test("multimodal decode plumbing: schema and deterministic fake decode") {
    import spark.implicits._
    val media = Multimodal.asMediaTable(spark.read.parquet(s"$Sf/documents.parquet"))
    assert(media.schema("media").dataType.typeName === "binary")
    val decoded = Multimodal.decodeMedia(media, Multimodal.FakeDecoder)
    val one = decoded.orderBy($"doc_id").head()
    assert(one.n_bytes > 0 && one.width >= 64 && one.n_frames >= 1)
    assert(decoded.count() === media.count())
  }

  test("NfcNormalize composes decomposed marks; normalize collapses whitespace") {
    import spark.implicits._
    graft.expressions.NormalizeOps.ensureRegistered(spark)
    val out = Seq(
      "café",      // e + combining acute -> precomposed U+00E9
      "À̇",   // grave composes to U+00C0; dot-above stays combining
      "plain ascii",     // fast path: already NFC
      "")
      .toDF("s")
      .select(call_function("nfc_normalize", col("s")))
      .as[String].collect()
    assert(out(0) === "caf\u00e9")
    assert(out(1) === "\u00c0\u0307")
    assert(out(2) === "plain ascii")
    assert(out(3) === "")
    // end-to-end: NFC -> whitespace-run collapse -> trim, with codepoint
    // counts before/after (tab, a+0301, double space, trailing space)
    val n = TextAnalysis.normalize(
      Seq((1L, "\t á  b ")).toDF("id", "t"), "id", "t").head()
    assert(n.getLong(1) === 8L) // \t,' ',a,U+0301,' ',' ',b,' '
    assert(n.getLong(2) === 3L) // á,' ',b
    assert(n.getString(3) === "\u00e1 b")
  }

  test("incremental: exact / near / novel classification against a fixed corpus") {
    import spark.implicits._
    val base = Seq(
      (1L, "a b c d e f g h"), (2L, "p q r s t u v w")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "a b c d e f g h"),            // identical to base 1
      (11L, "a b c d e f g h extra tail"), // 6 shared of 8 trigrams: 0.75
      (12L, "z y x w v u t s")             // disjoint trigram set
    ).toDF("doc_id", "text")
    val out = Dedup.incremental(base, batch, "doc_id", "text", 0.5)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(0) === 10L && out(0).getString(1) === "exact" &&
      out(0).getLong(2) === 1L && out(0).getDouble(3) === 1.0)
    assert(out(1).getLong(0) === 11L && out(1).getString(1) === "near" &&
      out(1).getLong(2) === 1L && out(1).getDouble(3) === 0.75)
    assert(out(2).getLong(0) === 12L && out(2).getString(1) === "novel" &&
      out(2).isNullAt(2) && out(2).isNullAt(3))
    spark.catalog.clearCache()
  }

  test("paragraphDedup: first corpus-wide occurrence survives, docs reassemble in order") {
    import spark.implicits._
    // segWords=2: doc 1 = [a b][c d]; doc 2 shares [a b], keeps [x y];
    // doc 3's only segment [c d] loses to doc 1's (smaller doc_id);
    // doc 4 duplicates doc 1 entirely; doc 5 has an odd trailing segment
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b x y"), (3L, "c d"),
      (4L, "a b c d"), (5L, "a b z")).toDF("id", "text")
    val out = Dedup.paragraphDedup(docs, "id", "text", 2)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    assert(out(0).getLong(2) === 2L && out(0).getString(3) === "a b c d")
    assert(out(1).getLong(2) === 1L && out(1).getString(3) === "x y")
    assert(out(2).getLong(2) === 0L && out(2).getString(3) === "")
    assert(out(3).getLong(2) === 0L && out(3).getString(3) === "")
    assert(out(4).getLong(1) === 2L && out(4).getString(3) === "z")
  }

  test("hard negatives: every returned pair crosses labels, ranks dense from 1") {
    val dir = "/root/testdata/sf0.01"
    val spark0 = spark
    val out = graft.queries.ExtensionQueries
      .queries("ann_hard_negatives")(spark0, dir)
    val labels = graft.sources.Tables.table(spark0, dir, "embeddings")
      .select(col("vec_id"), col("label"))
    val crossed = out
      .join(labels.withColumnRenamed("vec_id", "q_id")
        .withColumnRenamed("label", "q_label"), "q_id")
      .join(labels, "vec_id")
    assert(crossed.where(col("label") === col("q_label")).count() === 0L,
      "a hard negative shared its query's label")
    // dense ranks 1..5 per query (the scan-stage filter must not
    // shorten the top-k the way post-filtering would)
    val badRanks = out.groupBy("q_id")
      .agg(count(lit(1)).as("n"), max(col("rnk")).as("mx"))
      .where(col("n") =!= 5 || col("mx") =!= 5)
    assert(badRanks.count() === 0L)
  }

  test("diversified top-k: never >2 per label, order is shortlist order") {
    val dir = "/root/testdata/sf0.01"
    val out = graft.queries.ExtensionQueries
      .queries("ann_diverse_topk")(spark, dir).collect()
    val perLabel = out.groupBy(r => (r.getLong(0), r.getLong(3)))
    assert(perLabel.values.forall(_.length <= 2), "label cap violated")
    // within a query, cos is non-increasing in div_rnk (shortlist order)
    out.groupBy(_.getLong(0)).values.foreach { rows =>
      val byRnk = rows.sortBy(_.getInt(1))
      assert(byRnk.map(_.getDouble(4)).sliding(2)
        .forall(w => w.length < 2 || w(0) >= w(1)))
    }
  }

  test("rag packing: prefix-closed per query, cut is tight against the budget") {
    val dir = "/root/testdata/sf0.01"
    val out = graft.queries.ExtensionQueries
      .queries("rag_context_pack")(spark, dir).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).values.foreach { rows =>
      val ordered = rows.sortBy(r => (r.getInt(1), r.getLong(3)))
      // running sum matches cum_tokens and never exceeds the budget;
      // chunks are a PREFIX of the (rnk, chunk_idx) order — no holes
      var cum = 0L
      ordered.foreach { r =>
        cum += r.getLong(4)
        assert(r.getLong(5) === cum, "cum_tokens is not the running sum")
      }
      assert(cum <= 96L)
      // n_tokens of each packed chunk is the chunk's real token count
      ordered.foreach { r =>
        val n = r.getString(6).split(" ", -1).length
        assert(r.getLong(4) === n.toLong)
      }
    }
  }

  test("IVF nprobe knob: recall@5 vs brute force never drops when nprobe grows") {
    import org.apache.spark.sql.DataFrame
    val dir = "/root/testdata/sf0.01"
    def pairs(name: String): Set[(Long, Long)] = {
      val df: DataFrame = graft.queries.ExtensionQueries.queries(name)(spark, dir)
      df.select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val truth = pairs("ann_cosine_topk")
    val h1 = (pairs("ann_ivf_topk") & truth).size
    val h2 = (pairs("ann_ivf_nprobe2") & truth).size
    assert(h2 >= h1, s"recall dropped: nprobe1=$h1 nprobe2=$h2")
    assert(h1 > 0) // non-vacuous: single-cell search already finds hits
  }

  test("duplicatedSpans: planted repeats merge to maximal spans, unique text reports nothing") {
    import spark.implicits._
    val k = 3
    // doc 0 and doc 1 share tokens c..h (6 tokens -> 4 marked 3-gram
    // starts merging into ONE span); doc 2 repeats its own c d e
    // internally (within-doc duplication counts); doc 3 is unique.
    val docs = Seq(
      (0L, "a b c d e f g h i"),
      (1L, "x y c d e f g h z"),
      (2L, "c d e q1 q2 q3 q4 c d e"),
      (3L, "p1 p2 p3 p4 p5 p6 p7 p8")).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpans(docs, "doc_id", "text", k)
      .select($"doc_id", $"span_start", $"span_end", $"span_tokens",
        $"n_grams")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // shared run c..h sits at tokens 2..7 in doc 0 and 2..7 in doc 1:
    // marked gram starts {2,3,4,5}, span [2, 5+3) = [2, 8), 6 tokens.
    // doc 2's c d e occurs at 0 and 7: spans [0,3) and [7,10).
    assert(out === Set(
      (0L, 2L, 8L, 6L, 4L),
      (1L, 2L, 8L, 6L, 4L),
      (2L, 0L, 3L, 3L, 1L),
      (2L, 7L, 10L, 3L, 1L)))
  }

  test("duplicatedSpans: adjacent-but-not-overlapping windows merge (coverage is contiguous)") {
    import spark.implicits._
    // grams at starts 0 and 3 with k=3 cover [0,3) and [3,6): touching
    // ranges must merge even though the starts are k apart. Build it by
    // repeating the 6-token run in two docs but breaking the middle
    // gram's duplicate status is impossible for a verbatim repeat — so
    // instead plant two separate 3-token repeats back to back and one
    // with a 1-token gap (must NOT merge).
    val docs = Seq(
      (0L, "a b c d e f"),     // a b c + d e f both repeat -> one span
      (1L, "a b c x d e f"),   // same repeats, 1-token gap -> two spans
      (2L, "a b c z z d e f")  // provides the second occurrences
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpans(docs, "doc_id", "text", 3)
      .select($"doc_id", $"span_start", $"span_end")
      .as[(Long, Long, Long)].collect().toSet
    assert(out.filter(_._1 == 0L) === Set((0L, 0L, 6L)),
      s"back-to-back repeats must merge: $out")
    assert(out.filter(_._1 == 1L) === Set((1L, 0L, 3L), (1L, 4L, 7L)),
      s"gapped repeats must stay separate: $out")
  }

  test("incrementalSpans: corpus hits, within-batch repeats, novel text — scoped to the batch") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "a b c d e"),
      (1L, "p q r s t")).toDF("doc_id", "text")
    val batch = Seq(
      (100L, "a b c d e"),        // verbatim corpus copy -> full span
      (101L, "n1 n2 n3 n4 n5"),   // novel -> no span
      (102L, "x y z m1 x y z"),   // within-batch self-repeat -> 2 spans
      (103L, "c d e f g")         // shares c d e with corpus -> 1 span
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalSpans(corpus, batch, "doc_id", "text", 3)
      .select($"doc_id", $"span_start", $"span_end")
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set(
      (100L, 0L, 5L),
      (102L, 0L, 3L), (102L, 4L, 7L),
      (103L, 0L, 3L)),
      s"got $out")
    // corpus docs never appear: the report is scoped to the batch
    assert(out.forall(_._1 >= 100L))
  }

  test("containment flags small-in-big copies that Jaccard misses, directed") {
    import spark.implicits._
    // doc 0: 6 tokens, all inside doc 1's 30. Shingle sets: |A| = 4,
    // |B| = 10 distinct, A∩B = 4 → Jaccard 4/10 = 0.4 (misses at 0.5);
    // containment = 4/min(4,10) = 1.0.
    val big = ("w1 " * 12) + "a b c d e f " + ("z1 " * 12)
    val docs = Seq(
      (0L, "a b c d e f"),
      (1L, big.trim),
      (2L, "u1 u2 u3 u4 u5 u6")).toDF("doc_id", "text")
    val jac = Dedup.ngramJaccard(docs, "doc_id", "text", 0.5)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(!jac.contains((0L, 1L)), s"jaccard should miss the copy: $jac")
    val cont = Dedup.containment(docs, "doc_id", "text", 0.9)
      .select($"contained_id", $"container_id", $"containment")
      .as[(Long, Long, Double)].collect().toSet
    assert(cont === Set((0L, 1L, 1.0)),
      s"containment must flag doc 0 inside doc 1, directed: $cont")
  }

  test("removeDuplicatedSpans: spans slice out, clean docs pass through verbatim") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c d e f g h i"),
      (1L, "x y c d e f g h z"),
      (2L, "c d e q1 q2 q3 q4 c d e"),
      (3L, "p1 p2 p3 p4 p5 p6 p7 p8")).toDF("doc_id", "text")
    val out = Dedup.removeDuplicatedSpans(docs, "doc_id", "text", 3)
      .select($"doc_id", $"n_before", $"n_after", $"text_clean")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(out === Set(
      (0L, 9L, 3L, "a b i"),
      (1L, 9L, 3L, "x y z"),
      (2L, 10L, 4L, "q1 q2 q3 q4"),
      (3L, 8L, 8L, "p1 p2 p3 p4 p5 p6 p7 p8")))
  }
}
