package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.multimodal.MultimodalOps

/** Multimodal plumbing: sniffing is real; decode is a deterministic
  * stub (no codec libs in this container) — assert schema, batch
  * shapes, determinism, and frame fan-out cardinality.
  */
class MultimodalSpec extends SparkSpec {

  private def blob(magic: Array[Int], n: Int, seed: Int): Array[Byte] = {
    val b = new Array[Byte](n)
    val rnd = new scala.util.Random(seed)
    rnd.nextBytes(b)
    magic.zipWithIndex.foreach { case (v, i) => b(i) = v.toByte }
    b
  }

  private lazy val media = {
    val png = blob(Array(0x89, 'P', 'N', 'G'), 256, 1)
    val jpg = blob(Array(0xff, 0xd8, 0xff), 300, 2)
    val wav = {
      val b = blob(Array('R', 'I', 'F', 'F'), 400, 3)
      Array('W', 'A', 'V', 'E').zipWithIndex.foreach { case (c, i) => b(8 + i) = c.toByte }
      b
    }
    spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, png), Row(2L, jpg), Row(3L, wav)),
      StructType(Seq(StructField("id", LongType), StructField("content", BinaryType))))
  }

  test("withMeta sniffs formats and attaches typed struct") {
    val out = MultimodalOps.withMeta(media).repartition(3) // exercise multi-partition path
    assert(out.schema("meta").dataType == MultimodalOps.metaSchema)
    val fmts = out.select("id", "meta.format").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fmts == Map(1L -> "png", 2L -> "jpeg", 3L -> "wav"))
  }

  test("extractFeatures is deterministic with exact dim") {
    val a = MultimodalOps.extractFeatures(media, dim = 64).select("id", "features")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b = MultimodalOps.extractFeatures(media, dim = 64).select("id", "features")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(a.keySet == Set(1L, 2L, 3L))
    a.foreach { case (k, v) => assert(v.length == 64 && v == b(k)) }
  }

  test("resizeImage emits exactly w*h values") {
    val px = MultimodalOps.resizeImage(media, 8, 6).select("pixels")
      .collect().map(_.getSeq[Float](0))
    assert(px.forall(_.length == 48))
  }

  test("real png decode: actual dimensions and real resized pixels") {
    import java.awt.image.BufferedImage
    def pngBytes(img: BufferedImage): Array[Byte] = {
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val checker = new BufferedImage(5, 3, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 5; y <- 0 until 3)
      checker.setRGB(x, y, if ((x + y) % 2 == 0) 0xffffff else 0x000000)
    val white = new BufferedImage(4, 4, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 4; y <- 0 until 4) white.setRGB(x, y, 0xffffff)
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, pngBytes(checker)), Row(2L, pngBytes(white))),
      StructType(Seq(StructField("id", LongType), StructField("content", BinaryType))))
    // withMeta reports the REAL dimensions (stills: no duration/rate)
    val metas = MultimodalOps.withMeta(df)
      .select("id", "meta.format", "meta.width", "meta.height", "meta.duration_ms")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getInt(3), r.getLong(4))).toMap
    assert(metas(1L) == (("png", 5, 3, 0L)), metas)
    assert(metas(2L) == (("png", 4, 4, 0L)), metas)
    // resize goes through the real AWT path: a solid-white image
    // resizes to all-1.0 grayscale pixels, exactly w*h of them
    val px = MultimodalOps.resizeImage(df, 2, 2).select("id", "pixels")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(px(2L).length == 4 && px(2L).forall(_ == 1.0f), px(2L))
    assert(px(1L).length == 4 && px(1L).forall(v => v >= 0f && v <= 1f), px(1L))
  }

  /** A real PCM16 mono WAV: sine wave, amplitude 0.5. */
  private def wavBytes(rate: Int, frames: Int): Array[Byte] = {
    val dataLen = frames * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(1)            // PCM, mono
    bb.putInt(rate); bb.putInt(rate * 2)      // byte rate
    bb.putShort(2); bb.putShort(16)           // block align, bits
    bb.put("data".getBytes); bb.putInt(dataLen)
    for (i <- 0 until frames)
      bb.putShort((0.5 * math.sin(2 * math.Pi * 440 * i / rate) * 32767).toShort)
    bb.array()
  }

  test("real wav decode: RIFF chunk walk yields actual duration and rate") {
    val wav = wavBytes(rate = 8000, frames = 2000) // exactly 250 ms
    val info = MultimodalOps.decodeWav(wav).get
    assert(info.channels == 1 && info.sampleRate == 8000)
    assert(info.nFrames == 2000 && info.durationMs == 250)
    // withMeta routes wav through the real decoder
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, wav)),
      StructType(Seq(StructField("id", LongType), StructField("content", BinaryType))))
    val m = MultimodalOps.withMeta(df)
      .select("meta.format", "meta.duration_ms", "meta.sample_rate").head()
    assert((m.getString(0), m.getLong(1), m.getInt(2)) == (("wav", 250L, 8000)))
  }

  test("audioStats computes real RMS and peak from PCM samples") {
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, wavBytes(8000, 2000)),
        Row(2L, blob(Array(0x89, 'P', 'N', 'G'), 64, 9))), // non-audio -> null stats
      StructType(Seq(StructField("id", LongType), StructField("content", BinaryType))))
    val rows = MultimodalOps.audioStats(df).select("id", "audio").collect()
      .map(r => r.getLong(0) -> Option(r.getStruct(1))).toMap
    assert(rows(2L).isEmpty)
    val a = rows(1L).get
    // sine at amplitude 0.5: rms = 0.5/sqrt(2) ~ 0.3536, peak ~ 0.5
    assert(math.abs(a.getAs[Double]("rms") - 0.3536) < 0.01, a)
    assert(math.abs(a.getAs[Double]("peak") - 0.5) < 0.01, a)
    assert(a.getAs[Long]("duration_ms") == 250L)
  }

  /** A PCM16 mono WAV playing a tone MELODY: one frequency per
    * segment, optional deterministic noise — the fixture the audio
    * fingerprint needs (frame energies must VARY across the clip). */
  private def melodyWav(rate: Int, perSeg: Int, freqs: Seq[Double],
                        gain: Double = 0.5, noiseAmp: Double = 0.0,
                        seed: Int = 1): Array[Byte] = {
    val n = perSeg * freqs.length
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(1)
    bb.putInt(rate); bb.putInt(rate * 2)
    bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(dataLen)
    val rnd = new scala.util.Random(seed)
    for (i <- 0 until n) {
      val f = freqs(i / perSeg)
      val v = gain * math.sin(2 * math.Pi * f * i / rate) +
        noiseAmp * (rnd.nextDouble() * 2 - 1)
      bb.putShort((math.max(-1.0, math.min(1.0, v)) * 32767).toShort)
    }
    bb.array()
  }

  test("audio fingerprint: gain-invariant, noise-stable, melody-sensitive (round 10)") {
    import MultimodalOps.audioFingerprint
    val rate = 8000
    val melodyA = Seq(300.0, 2800.0, 500.0, 2000.0, 400.0, 1500.0, 3000.0, 350.0, 900.0)
    val melodyB = melodyA.reverse
    val base = melodyWav(rate, 1200, melodyA)
    val quiet = melodyWav(rate, 1200, melodyA, gain = 0.05)
    val noisy = melodyWav(rate, 1200, melodyA, noiseAmp = 0.01, seed = 7)
    val other = melodyWav(rate, 1200, melodyB)
    val h = audioFingerprint(base).get
    // double-differencing cancels LINEAR gain; PCM16 re-quantization at
    // 10x lower amplitude may still flip a near-zero difference bit
    val dg = java.lang.Long.bitCount(h ^ audioFingerprint(quiet).get)
    assert(dg <= 2, s"gain flipped $dg bits")
    // mild noise (SNR ~34 dB) flips at most a few bits. Pure-tone
    // fixtures are ADVERSARIAL here: bands away from the active tone
    // carry near-zero energy, so their difference signs are the
    // noise-dominated ones — broadband real audio behaves better
    // (measured: 6 bits at 0.01 noise, 26-28 bits between melodies)
    val dn = java.lang.Long.bitCount(h ^ audioFingerprint(noisy).get)
    assert(dn <= 8, s"noise flipped $dn bits")
    // a different melody is far away
    val db = java.lang.Long.bitCount(h ^ audioFingerprint(other).get)
    assert(db > 8, s"different melody only $db bits away")
    // non-wav and too-short content fingerprint to None
    assert(audioFingerprint("not a wav".getBytes).isEmpty)
    assert(audioFingerprint(wavBytes(8000, 50)).isEmpty) // sub-grid clip
    // banded near-dup pairs the renditions, not the different melody
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, base), Row(2L, quiet), Row(3L, noisy),
        Row(4L, other), Row(5L, null.asInstanceOf[Array[Byte]])),
      StructType(Seq(StructField("id", LongType), StructField("content", BinaryType))))
    val pairs = MultimodalOps.nearDupAudio(df, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)), pairs)
  }

  test("non-PCM16 wav keeps real header fields but null rms/peak") {
    // 8-bit mono PCM: decodable header, sample depth we do not read
    val frames = 1000
    val bb = java.nio.ByteBuffer.allocate(44 + frames)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + frames); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(1); bb.putInt(8000); bb.putInt(8000)
    bb.putShort(1); bb.putShort(8)
    bb.put("data".getBytes); bb.putInt(frames)
    val wav8 = bb.array()
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, wav8)),
      StructType(Seq(StructField("id", LongType), StructField("content", BinaryType))))
    val a = MultimodalOps.audioStats(df).select("audio").head().getStruct(0)
    assert(a.getAs[Integer]("sample_rate") == 8000 && a.getAs[Long]("duration_ms") == 125L)
    assert(a.isNullAt(a.fieldIndex("rms")) && a.isNullAt(a.fieldIndex("peak")), a)
  }

  /** PCM16 mono wav from an explicit sample array. */
  private def pcm16Wav(rate: Int, samples: Array[Double]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(1)
    bb.putInt(rate); bb.putInt(rate * 2)
    bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(dataLen)
    samples.foreach(v =>
      bb.putShort((math.max(-1.0, math.min(1.0, v)) * 32767).toShort))
    bb.array()
  }

  /** IEEE-float32 mono wav (format 3) from the same samples. */
  private def floatWav(rate: Int, samples: Array[Double]): Array[Byte] = {
    val dataLen = samples.length * 4
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(3); bb.putShort(1)            // IEEE float, mono
    bb.putInt(rate); bb.putInt(rate * 4)
    bb.putShort(4); bb.putShort(32)
    bb.put("data".getBytes); bb.putInt(dataLen)
    samples.foreach(v => bb.putFloat(v.toFloat))
    bb.array()
  }

  /** One tone per 250 ms segment, tones drawn deterministically. */
  private def toneSamples(rate: Int, segments: Int, seed: Int): Array[Double] = {
    val pool = Array(400.0, 700.0, 1100.0, 1600.0, 2200.0, 2900.0)
    val rnd = new scala.util.Random(seed)
    val tones = Array.fill(segments)(pool(rnd.nextInt(pool.length)))
    val perSeg = rate / 4
    Array.tabulate(segments * perSeg)(i =>
      0.5 * math.sin(2 * math.Pi * tones(i / perSeg) * i / rate))
  }

  test("windowed sub-fingerprints pair a trimmed clip the clip-grain hash misses (r11)") {
    import MultimodalOps.{audioFingerprint, audioSubFingerprints}
    val rate = 8000
    val base = toneSamples(rate, 24, seed = 5)        // 6 s melody
    val wavBase = pcm16Wav(rate, base)
    val wavTrim = pcm16Wav(rate, base.drop(rate / 2)) // first 0.5 s cut
    val wavOther = pcm16Wav(rate, toneSamples(rate, 24, seed = 9))
    // clip-grain grid stretches with clip length: the trim scrambles
    // the 64-bit hash far past any sane banding threshold
    val dTrim = java.lang.Long.bitCount(
      audioFingerprint(wavBase).get ^ audioFingerprint(wavTrim).get)
    assert(dTrim > 8, s"clip-grain hash unexpectedly survived the trim ($dTrim bits)")
    // the sub-fingerprint stream is ALIGNED: a 0.5 s trim is exactly 2
    // hops at 250 ms, so the trimmed stream is a shifted subset
    val sBase = audioSubFingerprints(wavBase)
    val sTrim = audioSubFingerprints(wavTrim)
    assert(sBase.length > 10 && sTrim.length > 8, s"${sBase.length}/${sTrim.length}")
    assert(sTrim.indices.forall(t => sTrim(t) == sBase(t + 2)),
      "trimmed sub-fingerprints must equal the base stream shifted by 2 hops")
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, wavBase), Row(2L, wavTrim), Row(3L, wavOther)),
      StructType(Seq(StructField("id", LongType), StructField("content", BinaryType))))
    // old path: no (1,2) pair at the family's banding threshold
    val oldPairs = MultimodalOps.nearDupAudio(df, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!oldPairs.contains((1L, 2L)),
      s"clip-grain path was expected to miss the trimmed pair: $oldPairs")
    // new path: found, at the right alignment, with near-all windows
    val got = MultimodalOps.nearDupAudioWindowed(df)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got.contains((1L, 2L)), s"windowed path missed the trimmed pair: $got")
    val (off, n) = got((1L, 2L))
    assert(off == -2L, s"best alignment should be -2 hops, got $off")
    assert(n >= sTrim.length - 1, s"aligned matches $n < ${sTrim.length - 1}")
    assert(!got.contains((1L, 3L)) && !got.contains((2L, 3L)), got)
  }

  test("IEEE-float wav decodes and pairs with its PCM16 twin (r11)") {
    val rate = 8000
    val samples = toneSamples(rate, 24, seed = 5)
    val f = floatWav(rate, samples)
    val info = MultimodalOps.decodeWav(f).get
    assert(info.audioFormat == 3 && info.bitsPerSample == 32 &&
      info.durationMs == 6000L, info)
    // float samples round-trip (PCM16 quantization absent entirely)
    val got = MultimodalOps.wavSamples(f, info)
    assert(got.length == samples.length)
    assert(got.indices.forall(i => math.abs(got(i) - samples(i)) < 1e-6))
    // the float rendition fingerprints and near-dups against PCM16
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, pcm16Wav(rate, samples)), Row(2L, f)),
      StructType(Seq(StructField("id", LongType), StructField("content", BinaryType))))
    val pairs = MultimodalOps.nearDupAudioWindowed(df)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.get((1L, 2L)).contains(0L),
      s"float/PCM16 twins should align at offset 0: $pairs")
  }

  test("truncated or corrupt wav falls back, never throws") {
    val good = wavBytes(8000, 100)
    val truncated = good.take(50) // header promises more data than present
    assert(MultimodalOps.decodeWav(truncated).isEmpty)
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, truncated)),
      StructType(Seq(StructField("id", LongType), StructField("content", BinaryType))))
    assert(MultimodalOps.withMeta(df).select("meta.format").head().getString(0) == "wav")
    assert(MultimodalOps.audioStats(df).select("audio").head().isNullAt(0))
  }

  /** A minimal valid ISO-BMFF file: ftyp + moov(mvhd v0 + trak(tkhd v0))
    * + mdat. Box layout per ISO/IEC 14496-12 (public spec). */
  private def mp4Bytes(timescale: Int, duration: Int, w: Int, h: Int): Array[Byte] = {
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length); bb.put(typ.getBytes("US-ASCII")); bb.put(payload)
      bb.array()
    }
    val ftyp = box("ftyp", {
      val bb = java.nio.ByteBuffer.allocate(12)
      bb.put("isom".getBytes); bb.putInt(0x200); bb.put("isom".getBytes)
      bb.array()
    })
    val mvhd = box("mvhd", {
      val bb = java.nio.ByteBuffer.allocate(100) // v0 mvhd payload size
      bb.putInt(0)          // version 0 + flags
      bb.putInt(0); bb.putInt(0) // creation / modification
      bb.putInt(timescale); bb.putInt(duration)
      bb.array()            // rate/volume/matrix/next_track_id left zero
    })
    val tkhd = box("tkhd", {
      val bb = java.nio.ByteBuffer.allocate(84) // v0 tkhd payload size
      bb.putInt(0)          // version 0 + flags
      bb.position(76); bb.putInt(w << 16) // width,  16.16 fixed
      bb.putInt(h << 16)                  // height, 16.16 fixed
      bb.array()
    })
    val moov = box("moov", mvhd ++ box("trak", tkhd))
    ftyp ++ moov ++ box("mdat", Array[Byte](1, 2, 3, 4))
  }

  test("real mp4 header decode: mvhd duration + tkhd dimensions") {
    val mp4 = mp4Bytes(timescale = 600, duration = 3000, w = 640, h = 360) // 5 s
    val info = MultimodalOps.decodeMp4(mp4).get
    assert(info.majorBrand == "isom")
    assert(info.timescale == 600 && info.duration == 3000 && info.durationMs == 5000)
    assert(info.width == 640 && info.height == 360)
    // withMeta routes mp4 through the real header parse
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, mp4)),
      StructType(Seq(StructField("id", LongType), StructField("content", BinaryType))))
    val m = MultimodalOps.withMeta(df)
      .select("meta.format", "meta.width", "meta.height", "meta.duration_ms").head()
    assert((m.getString(0), m.getInt(1), m.getInt(2), m.getLong(3)) == (("mp4", 640, 360, 5000L)))
    // frame fan-out now runs on the REAL duration: 0..5000 step 1000 -> 6
    val frames = MultimodalOps.sampleFrames(df, everyMs = 1000)
    assert(frames.count() == 6)
  }

  test("corrupt mp4 falls back to the stub, never throws") {
    val good = mp4Bytes(600, 3000, 640, 360)
    val truncated = good.take(30)  // moov's declared size runs past the bytes
    assert(MultimodalOps.decodeMp4(truncated).isEmpty)
    val ftypOnly = good.take(20)   // complete ftyp box, no moov at all
    assert(MultimodalOps.decodeMp4(ftypOnly).isEmpty)
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, truncated)),
      StructType(Seq(StructField("id", LongType), StructField("content", BinaryType))))
    val m = MultimodalOps.withMeta(df).select("meta.format", "meta.duration_ms").head()
    assert(m.getString(0) == "mp4" && m.getLong(1) > 0) // stub duration, no crash
  }

  test("real MJPEG-in-AVI decode: container walk, frame slices, REAL pixel features") {
    import java.awt.image.BufferedImage
    // three visually distinct frames, JPEG-encoded via the JDK
    def frame(shade: Int): Array[Byte] = {
      val img = new BufferedImage(32, 24, BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(shade, shade / 2, 255 - shade))
      g.fillRect(0, 0, 32, 24)
      g.setColor(java.awt.Color.WHITE)
      g.fillRect(0, 0, 16, 12) // top-left bright quadrant
      g.dispose()
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", baos)
      baos.toByteArray
    }
    val jpegs = Seq(frame(40), frame(130), frame(220))
    // hand-assembled AVI RIFF: hdrl(avih + strl(strh MJPG)) + movi(00dc*)
    def u32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def chunk(tag: String, payload: Array[Byte]): Array[Byte] = {
      val padded = if (payload.length % 2 == 1) payload :+ 0.toByte else payload
      fcc(tag) ++ u32(payload.length.toLong) ++ padded
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", fcc(kind) ++ body)
    val avih = {
      val b = new Array[Byte](56)
      def put(off: Int, v: Long): Unit = u32(v).copyToArray(b, off)
      put(0, 40000L)              // dwMicroSecPerFrame: 25 fps
      put(16, jpegs.length.toLong) // dwTotalFrames
      put(32, 32L); put(36, 24L)  // dwWidth / dwHeight
      b
    }
    val strh = fcc("vids") ++ fcc("MJPG") ++ new Array[Byte](48)
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", new Array[Byte](40))))
    val movi = list("movi", jpegs.map(j => chunk("00dc", j)).reduce(_ ++ _))
    val body = fcc("AVI ") ++ hdrl ++ movi
    val avi = fcc("RIFF") ++ u32(body.length.toLong) ++ body

    assert(MultimodalOps.sniffFormat(avi) == "avi")
    val info = MultimodalOps.decodeAvi(avi).get
    assert(info.width == 32 && info.height == 24 && info.totalFrames == 3)
    assert(info.usPerFrame == 40000L && info.durationMs == 120L)
    assert(info.videoCodec == "MJPG")
    val slices = MultimodalOps.aviFrameSlices(avi)
    assert(slices.length == 3)
    // each slice is a decodable JPEG with the right dimensions
    slices.foreach { case (off, len) =>
      val img = MultimodalOps.decodeImage(
        java.util.Arrays.copyOfRange(avi, off, off + len)).get
      assert(img.getWidth == 32 && img.getHeight == 24)
    }
    // withMeta reads REAL container numbers
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, avi)),
      StructType(Seq(StructField("id", LongType), StructField("content", BinaryType))))
    val m = MultimodalOps.withMeta(df)
      .select("meta.format", "meta.width", "meta.height", "meta.duration_ms").head()
    assert((m.getString(0), m.getInt(1), m.getInt(2), m.getLong(3)) == (("avi", 32, 24, 120L)))
    // sampleFrames emits REAL luminance features: every frame's bright
    // top-left quadrant must dominate its bottom-right (true of the
    // rendered pixels, vanishingly unlikely for the hash stub), and the
    // features must EQUAL frameFeatures16 of the directly decoded JPEG
    val frames = MultimodalOps.sampleFrames(df, everyMs = 40)
      .select("frame_ts_ms", "frame_features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).sortBy(_._1)
    assert(frames.length == 4) // ts 0,40,80,120 (120 clamps to last frame)
    frames.foreach { case (_, f) => assert(f(0) > f(15), s"not real pixels: $f") }
    val want = MultimodalOps.frameFeatures16(
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpegs(1)))).toSeq
    assert(frames.find(_._1 == 40L).get._2 == want, "frame 1 features != direct decode")
    // a non-MJPEG AVI keeps real header metadata but stub features
    val xvid = {
      val strh2 = fcc("vids") ++ fcc("XVID") ++ new Array[Byte](48)
      val hdrl2 = list("hdrl", chunk("avih", avih) ++
        list("strl", chunk("strh", strh2) ++ chunk("strf", new Array[Byte](40))))
      val b2 = fcc("AVI ") ++ hdrl2 ++ movi
      fcc("RIFF") ++ u32(b2.length.toLong) ++ b2
    }
    assert(MultimodalOps.decodeAvi(xvid).get.videoCodec == "XVID")
    val df2 = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, xvid)),
      StructType(Seq(StructField("id", LongType), StructField("content", BinaryType))))
    val f2 = MultimodalOps.sampleFrames(df2, everyMs = 40)
      .select("frame_features").head().getSeq[Float](0)
    assert(f2 != want) // hash stub, not pixels
  }

  test("AVI corruption hardening: truncated lists, audio-first strl, header overflow") {
    def u32(v: Long): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def chunk(tag: String, payload: Array[Byte]): Array[Byte] = {
      val padded = if (payload.length % 2 == 1) payload :+ 0.toByte else payload
      fcc(tag) ++ u32(payload.length.toLong) ++ padded
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", fcc(kind) ++ body)
    def riff(body: Array[Byte]): Array[Byte] = {
      val b = fcc("AVI ") ++ body
      fcc("RIFF") ++ u32(b.length.toLong) ++ b
    }
    // (1) a LIST whose payload ends within 4 bytes of the buffer end
    // (ADVICE r9 #1): the type-fourcc read must be bounds-guarded —
    // corrupt media degrades to None instead of throwing
    val truncated = riff(fcc("LIST") ++ u32(2L) ++ Array[Byte](0x68, 0x64))
    assert(MultimodalOps.sniffFormat(truncated) == "avi")
    assert(MultimodalOps.decodeAvi(truncated).isEmpty)
    // (2) audio stream declared FIRST (ADVICE r9 #2): every strl must
    // be inspected, not just the first — the vids codec still surfaces
    def avih(usPerFrame: Long, frames: Long): Array[Byte] = {
      val b = new Array[Byte](56)
      u32(usPerFrame).copyToArray(b, 0)
      u32(frames).copyToArray(b, 16)
      u32(32L).copyToArray(b, 32); u32(24L).copyToArray(b, 36)
      b
    }
    val audioFirst = riff(list("hdrl", chunk("avih", avih(40000L, 3L)) ++
      list("strl", chunk("strh", fcc("auds") ++ fcc("    ") ++
        new Array[Byte](48))) ++
      list("strl", chunk("strh", fcc("vids") ++ fcc("MJPG") ++ new Array[Byte](48)))))
    assert(MultimodalOps.decodeAvi(audioFirst).get.videoCodec == "MJPG")
    // (3) corrupt u32 headers at their 4.29e9 max (ADVICE r9 #3): the
    // duration product overflows Long — must clamp, never go negative
    val big = 0xffffffffL
    val overflow = riff(list("hdrl", chunk("avih", avih(big, big))))
    val info = MultimodalOps.decodeAvi(overflow).get
    assert(info.durationMs == (BigInt(big) * BigInt(big) / 1000).toLong)
    assert(info.durationMs > 0L)
  }

  test("pHash: stable under resize + brightness, far for different images") {
    import java.awt.image.BufferedImage
    def pngBytes(img: BufferedImage): Array[Byte] = {
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val a = MultimodalOps.imagePHash(pngBytes(MultimodalSpec.field(1, 64, 0))).get
    val aScaled = MultimodalOps.imagePHash(pngBytes(MultimodalSpec.field(1, 96, 12))).get
    val b = MultimodalOps.imagePHash(pngBytes(MultimodalSpec.field(2, 64, 0))).get
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(a, aScaled) <= 8, s"near-dup pair too far: ${ham(a, aScaled)}")
    assert(ham(a, b) > 16, s"distinct images too close: ${ham(a, b)}")
    // non-decodable bytes: honest absence
    assert(MultimodalOps.imagePHash("not an image".getBytes).isEmpty)
  }

  test("nearDupImages finds the perturbed copy and nothing else") {
    import java.awt.image.BufferedImage
    def pngBytes(img: BufferedImage): Array[Byte] = {
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val gradA = pngBytes(MultimodalSpec.field(11, 64, 0))
    val gradA2 = pngBytes(MultimodalSpec.field(11, 80, 10)) // resized + brighter
    val stripes = pngBytes(MultimodalSpec.field(12, 64, 0))
    val blob = pngBytes(MultimodalSpec.field(13, 64, 0))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, gradA), Row(2L, gradA2), Row(3L, stripes), Row(4L, blob),
        Row(5L, "not an image".getBytes)),
      StructType(Seq(StructField("id", LongType), StructField("content", BinaryType))))
    val pairs = MultimodalOps.nearDupImages(df, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), pairs)
  }

  test("sampleFrames fan-out matches duration/step") {
    val out = MultimodalOps.sampleFrames(media, everyMs = 5000)
    val counts = out.groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val durs = MultimodalOps.withMeta(media).select("id", "meta.duration_ms")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    counts.foreach { case (id, n) => assert(n == durs(id) / 5000 + 1) }
    assert(out.schema("frame_features").dataType == ArrayType(FloatType))
  }
}

object MultimodalSpec {
  /** Deterministic spectrum-rich grayscale image: a seeded sum of 2D
    * sinusoids with frequencies spanning pHash's whole 8x8 DCT block.
    * Frequencies are relative to image size, so the SAME seed rendered
    * at ANY resolution is the same continuous picture — the invariance
    * pHash promises. (A flat gradient or single pure tone is spectrally
    * degenerate: most ACs ~0 and the median threshold slices noise.) */
  def field(seed: Long, n: Int, brighten: Int): java.awt.image.BufferedImage = {
    val rnd = new scala.util.Random(seed)
    // DENSE spectrum: one component per half-integer frequency pair up
    // to 3.5 cycles (DCT bins 1..7 in each axis), random amplitude and
    // phase — every bin of the 8x8 block carries decisive energy, like
    // a photo's 1/f spectrum. A sparse field leaves ~50 bins near zero,
    // all clustered at the median threshold, where resampling noise
    // flips bits of the SAME picture.
    val comps = for {
      i <- 1 to 7; j <- 1 to 7
    } yield (i * 0.5, j * 0.5, rnd.nextDouble() * 2 * math.Pi,
      rnd.nextDouble() * 2 * math.Pi, 0.2 + rnd.nextDouble())
    val norm = comps.map(_._5).sum * 0.35 // sparse-sum scale: keep contrast
    val img = new java.awt.image.BufferedImage(
      n, n, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until n; y <- 0 until n) {
      val s = comps.map { case (fx, fy, p1, p2, a) =>
        a * math.sin(2 * math.Pi * fx * x / n + p1) *
          math.cos(2 * math.Pi * fy * y / n + p2)
      }.sum / norm
      val v = math.max(0, math.min(255, (128 + 115 * s).toInt + brighten))
      img.setRGB(x, y, v << 16 | v << 8 | v)
    }
    img
  }
}
