package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, decoded by a partition-local batched
  * decoder.
  *
  * The decode step itself is STUBBED (no image/audio libraries in this
  * environment): `StubDecoder` derives deterministic features from the
  * payload bytes. Everything around it is the real Spark shape a media
  * pipeline needs at 100 TB:
  *  - schema: (media_id, kind, payload BINARY, meta STRUCT) — payloads
  *    stay opaque to Catalyst, metadata stays columnar/prunable;
  *  - decode via `mapPartitions` over typed rows in fixed-size batches
  *    (the JVM dual of `mapInPandas`' Arrow batches): amortizes
  *    per-batch decoder setup, keeps memory bounded by batch size, never
  *    shuffles — a decode stage is embarrassingly parallel;
  *  - partitioning: decode inherits the scan's partitioning; size input
  *    splits by `spark.sql.files.maxPartitionBytes` so one task's batch
  *    of payloads fits executor memory.
  */
object Multimodal {

  final case class MediaMeta(source: String, declaredKind: String)
  final case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Long,
      checksum: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      duration_ms: Long)

  implicit val recEnc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
  implicit val featEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  /** A batched media decoder. Real implementations would wrap an image /
    * audio / video library handle per batch; the stub derives features
    * arithmetically so tests (and the DuckDB oracle) can verify the
    * surrounding plumbing exactly. */
  trait MediaDecoder extends Serializable {
    def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures]
  }

  /** Deterministic fake decode: checksum = sum of unsigned payload bytes.
    * Feature formulas are pure integer arithmetic (oracle-replicable). */
  object StubDecoder extends MediaDecoder {
    override def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
      batch.map { r =>
        val checksum = r.payload.foldLeft(0L)((acc, b) => acc + (b & 0xff))
        MediaFeatures(
          media_id = r.media_id,
          kind = r.kind,
          byte_len = r.payload.length.toLong,
          checksum = checksum,
          width = (64 + checksum % 577).toInt,
          height = (64 + checksum % 433).toInt,
          n_frames = if (r.kind == "video") (1 + checksum % 97).toInt else 1,
          duration_ms = if (r.kind == "audio") 1000L + (checksum * 7) % 59999 else 0L)
      }
  }

  val BatchSize = 64

  /** Partition-local batched decode — the mapInPandas-shaped stage. */
  def decode(media: Dataset[MediaRecord], decoder: MediaDecoder = StubDecoder): Dataset[MediaFeatures] =
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap(batch => decoder.decodeBatch(batch))
    }

  final case class VadFeatures(
      media_id: Long, n_frames: Long, n_voiced: Long, max_run: Long)
  implicit val vadEnc: Encoder[VadFeatures] = Encoders.product[VadFeatures]

  /** Windowed-energy voice-activity detection over audio payloads — the
    * speech-pipeline pre-filter (silence stripping / segment selection)
    * in the same batched partition-local shape as [[decode]]: the
    * payload stands in for PCM, non-overlapping `frameLen`-byte frames
    * score Σ unsigned bytes, and a frame is voiced when its MEAN energy
    * exceeds the whole clip's mean — compared by integer
    * cross-multiplication (energy·len > total·frameLen), so no float
    * enters the verdict. Longest voiced run is the segment-extraction
    * signal. Per-row state is a handful of longs; no shuffle — a real
    * VAD model swaps in behind the same seam as MediaDecoder. */
  def voiceActivity(media: Dataset[MediaRecord], frameLen: Int = 32): Dataset[VadFeatures] =
    // Empty payloads are excluded (a zero-byte clip has no frames to
    // score); per-row computation, so no batch wrapper — unlike decode,
    // there is no per-batch handle to amortize behind this seam.
    media.filter(r => r.kind == "audio" && r.payload.nonEmpty).mapPartitions { it =>
      it.map { r =>
        val bytes = r.payload
        val len = bytes.length.toLong
        var tot = 0L
        var j = 0
        while (j < bytes.length) { tot += bytes(j) & 0xff; j += 1 }
        val nf = ((len + frameLen - 1) / frameLen).toInt
        var i = 0; var voiced = 0L; var run = 0L; var maxRun = 0L
        while (i < nf) {
          val s = i * frameLen
          val e = math.min(s + frameLen.toLong, len).toInt
          var sum = 0L; var k = s
          while (k < e) { sum += bytes(k) & 0xff; k += 1 }
          val fl = (e - s).toLong
          if (sum * len > tot * fl) {
            voiced += 1; run += 1; if (run > maxRun) maxRun = run
          } else run = 0
          i += 1
        }
        VadFeatures(r.media_id, nf.toLong, voiced, maxRun)
      }
    }

  /** REAL media kernel (r12): RIFF/WAVE PCM16 header parse + sample
    * extraction — the one decode this environment can do end-to-end
    * without media jars (a WAV header is a 44-byte little-endian
    * struct; PCM16 is the raw samples). Walks the chunk list (fmt /
    * data, skipping LIST etc.), refuses non-PCM16 loudly. */
  object WavPcm16 {
    final case class Wav(sampleRate: Int, channels: Int, samples: Array[Int])

    def isWav(b: Array[Byte]): Boolean =
      b.length >= 12 &&
        b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

    def parse(bytes: Array[Byte]): Wav = {
      require(isWav(bytes), "not a RIFF/WAVE payload")
      def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
      def u32(o: Int): Long =
        (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
          ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
      var off = 12
      var rate = -1; var ch = -1
      var dataOff = -1; var dataLen = -1
      while (off + 8 <= bytes.length && (dataOff < 0 || rate < 0)) {
        val id = new String(bytes, off, 4, "US-ASCII")
        val sz = u32(off + 4).toInt
        require(sz >= 0 && off + 8 + sz <= bytes.length,
          s"truncated '$id' chunk: size $sz at offset $off of ${bytes.length}")
        if (id == "fmt ") {
          // A PCM fmt chunk is >= 16 bytes; a shorter one would make the
          // field reads below silently consume the NEXT chunk's bytes.
          require(sz >= 16, s"malformed WAV: fmt chunk size $sz < 16")
          val fmt = u16(off + 8)
          require(fmt == 1, s"unsupported WAV: audio format $fmt (need PCM=1)")
          ch = u16(off + 10)
          rate = u32(off + 12).toInt
          val bps = u16(off + 22)
          require(bps == 16, s"unsupported WAV: $bps bits/sample (need 16)")
        } else if (id == "data") { dataOff = off + 8; dataLen = sz }
        off += 8 + sz + (sz & 1) // chunks are word-aligned
      }
      require(rate > 0 && dataOff >= 0, "WAV missing fmt/data chunk")
      val n = dataLen / 2
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        // little-endian signed 16-bit: the high byte sign-extends.
        out(i) = (bytes(dataOff + 2 * i) & 0xff) | (bytes(dataOff + 2 * i + 1) << 8)
        i += 1
      }
      Wav(rate, ch, out)
    }
  }

  /** VAD over REAL PCM: the same windowed-energy detector as
    * [[voiceActivity]], but frames are `frameSamples` decoded 16-bit
    * samples from an actual WAV payload and energy is Σ|sample| — so
    * the one media format the env can decode runs END-TO-END real
    * (WavVadSpec drives it over in-test generated PCM fixtures). The
    * voiced verdict stays integer cross-multiplied (energy·totalLen >
    * totalEnergy·frameLen): no float anywhere. Non-WAV audio rows are
    * excluded (they belong to the stub seam). Multi-channel clips score
    * their INTERLEAVED samples as one stream — `frameSamples` counts
    * interleaved samples, so a stereo frame spans half the wall-clock
    * of a mono one; energy-threshold VAD is channel-agnostic, but a
    * caller wanting per-channel windows should deinterleave first. */
  def voiceActivityWav(media: Dataset[MediaRecord], frameSamples: Int = 160): Dataset[VadFeatures] =
    media.filter(r => r.kind == "audio" && WavPcm16.isWav(r.payload))
      .mapPartitions { it =>
        it.map { r =>
          val s = WavPcm16.parse(r.payload).samples
          val len = s.length.toLong
          var tot = 0L
          var j = 0
          while (j < s.length) { tot += math.abs(s(j).toLong); j += 1 }
          val nf = if (len == 0) 0 else ((len + frameSamples - 1) / frameSamples).toInt
          var i = 0; var voiced = 0L; var run = 0L; var maxRun = 0L
          while (i < nf) {
            val st = i * frameSamples
            val en = math.min(st + frameSamples.toLong, len).toInt
            var sum = 0L; var k = st
            while (k < en) { sum += math.abs(s(k).toLong); k += 1 }
            val fl = (en - st).toLong
            if (sum * len > tot * fl) {
              voiced += 1; run += 1; if (run > maxRun) maxRun = run
            } else run = 0
            i += 1
          }
          VadFeatures(r.media_id, nf.toLong, voiced, maxRun)
        }
      }

  /** REAL image kernel (r13, promoting the WAV pattern to an image
    * format): BMP (BITMAPINFOHEADER, 24bpp uncompressed) encode + parse
    * — the one image container this environment can decode end-to-end
    * without media jars. The header is a little-endian struct like
    * WAV's; rows are 4-byte aligned and stored bottom-up unless height
    * is negative (top-down). Non-24bpp / compressed payloads are
    * refused loudly (they belong behind the stub seam). */
  object Bmp {
    /** Decoded image: row-major TOP-DOWN luma (0-255 per pixel,
      * (r+g+b)/3 integer — exact for grayscale payloads). */
    final case class Image(width: Int, height: Int, luma: Array[Int])

    def isBmp(b: Array[Byte]): Boolean =
      b.length >= 54 && b(0) == 'B' && b(1) == 'M'

    /** Encode an 8-bit grayscale image (row-major top-down `gray`,
      * values 0-255) as a standard bottom-up 24bpp BMP; `topDown = true`
      * writes the negative-height variant. Fixture generator for the
      * spec AND the engine-side payload builder of mm_phash_bmp_neardup
      * (the parse is the kernel under test; encoding is bookkeeping). */
    def encodeGray(width: Int, height: Int, gray: Array[Int], topDown: Boolean = false): Array[Byte] = {
      require(gray.length == width * height,
        s"encodeGray: ${gray.length} pixels for ${width}x$height")
      val rowSize = ((24 * width + 31) / 32) * 4
      val dataSize = rowSize * height
      val out = new Array[Byte](54 + dataSize)
      def w16(o: Int, v: Int): Unit = {
        out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
      }
      def w32(o: Int, v: Int): Unit = {
        w16(o, v & 0xffff); w16(o + 2, (v >>> 16) & 0xffff)
      }
      out(0) = 'B'; out(1) = 'M'
      w32(2, out.length); w32(10, 54)       // file size, pixel-data offset
      w32(14, 40)                           // BITMAPINFOHEADER size
      w32(18, width); w32(22, if (topDown) -height else height)
      w16(26, 1); w16(28, 24); w32(30, 0)   // planes, bpp, BI_RGB
      w32(34, dataSize)
      var r = 0
      while (r < height) {
        // File row r holds image row (height-1-r) bottom-up, r top-down.
        val imgRow = if (topDown) r else height - 1 - r
        var x = 0
        while (x < width) {
          val v = (gray(imgRow * width + x) & 0xff).toByte
          val o = 54 + r * rowSize + 3 * x
          out(o) = v; out(o + 1) = v; out(o + 2) = v
          x += 1
        }
        r += 1
      }
      out
    }

    def parse(bytes: Array[Byte]): Image = {
      require(isBmp(bytes), "not a BMP payload")
      def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
      def s32(o: Int): Int =
        (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
          ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
      val dataOff = s32(10)
      val hdrSize = s32(14)
      require(hdrSize >= 40, s"unsupported BMP: header size $hdrSize (need BITMAPINFOHEADER)")
      val width = s32(18)
      val rawHeight = s32(22)
      val topDown = rawHeight < 0
      val height = math.abs(rawHeight)
      val bpp = u16(28)
      require(bpp == 24, s"unsupported BMP: $bpp bpp (need 24)")
      val compression = s32(30)
      require(compression == 0, s"unsupported BMP: compression $compression (need BI_RGB)")
      // Row size in LONG: a hostile header with width ~90M would
      // overflow 24*width to a negative Int rowSize and sail past the
      // truncation require into an opaque executor
      // ArrayIndexOutOfBounds; with Long arithmetic the truncation
      // require below rejects any dims the payload can't physically
      // hold, loudly.
      require(width > 0 && height > 0,
        s"malformed BMP: ${width}x$rawHeight")
      val rowSize = ((24L * width + 31) / 32) * 4
      require(dataOff >= 54 && dataOff.toLong + rowSize * height <= bytes.length,
        s"truncated BMP: need ${rowSize * height} pixel bytes at $dataOff of ${bytes.length}")
      val luma = new Array[Int](width * height)
      var r = 0
      while (r < height) {
        val fileRow = if (topDown) r else height - 1 - r
        var x = 0
        while (x < width) {
          val o = (dataOff + fileRow * rowSize + 3L * x).toInt
          val b = bytes(o) & 0xff; val g = bytes(o + 1) & 0xff; val rr = bytes(o + 2) & 0xff
          luma(r * width + x) = (rr + g + b) / 3
          x += 1
        }
        r += 1
      }
      Image(width, height, luma)
    }
  }

  /** SECOND real image container (r13 next-round 8): binary PPM ("P6"),
    * the format a 20-line parser decodes end-to-end — ASCII header
    * (magic, width, height, maxval; '#' comments and arbitrary
    * whitespace between tokens per the netpbm spec) followed by raw RGB
    * triplets, row-major TOP-DOWN (no padding, no bottom-up flip — the
    * structural contrasts to BMP are exactly what a second container
    * buys the decode seam). Parses to the same [[Bmp.Image]] luma
    * raster, so every hash kernel downstream is container-blind. */
  object Ppm {
    def isPpm(b: Array[Byte]): Boolean =
      b.length >= 2 && b(0) == 'P' && b(1) == '6'

    /** Fixture/payload encoder — gray triplets, minimal header. */
    def encodeGray(width: Int, height: Int, gray: Array[Int]): Array[Byte] = {
      require(gray.length == width * height,
        s"encodeGray: ${gray.length} pixels for ${width}x$height")
      val hdr = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](hdr.length + 3 * gray.length)
      System.arraycopy(hdr, 0, out, 0, hdr.length)
      var i = 0
      while (i < gray.length) {
        val v = (gray(i) & 0xff).toByte
        val o = hdr.length + 3 * i
        out(o) = v; out(o + 1) = v; out(o + 2) = v
        i += 1
      }
      out
    }

    def parse(bytes: Array[Byte]): Bmp.Image = {
      require(isPpm(bytes), "not a PPM payload")
      var pos = 2
      def isWs(b: Byte) = b == ' ' || b == '\t' || b == '\n' || b == '\r'
      // netpbm header token scan: whitespace separates tokens; a '#'
      // starts a comment running to end-of-line.
      def nextInt(): Int = {
        while (pos < bytes.length && (isWs(bytes(pos)) || bytes(pos) == '#')) {
          if (bytes(pos) == '#')
            while (pos < bytes.length && bytes(pos) != '\n') pos += 1
          else pos += 1
        }
        var v = 0L
        val start = pos
        while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
          v = v * 10 + (bytes(pos) - '0')
          require(v <= Int.MaxValue, "malformed PPM: header value overflows")
          pos += 1
        }
        require(pos > start, s"malformed PPM: expected integer at byte $pos")
        v.toInt
      }
      val width = nextInt()
      val height = nextInt()
      val maxval = nextInt()
      require(maxval == 255, s"unsupported PPM: maxval $maxval (need 255)")
      require(width > 0 && height > 0, s"malformed PPM: ${width}x$height")
      pos += 1 // exactly ONE whitespace byte after maxval per spec
      require(pos.toLong + 3L * width * height <= bytes.length,
        s"truncated PPM: need ${3L * width * height} pixel bytes at $pos of ${bytes.length}")
      val luma = new Array[Int](width * height)
      var i = 0
      while (i < luma.length) {
        val o = pos + 3 * i
        val r = bytes(o) & 0xff; val g = bytes(o + 1) & 0xff; val b = bytes(o + 2) & 0xff
        luma(i) = (r + g + b) / 3
        i += 1
      }
      Bmp.Image(width, height, luma)
    }
  }

  /** Container dispatch of the decode seam: magic-sniff BMP vs PPM and
    * parse to the shared luma raster; anything else is refused loudly
    * (real codecs live behind the sanctioned [[MediaDecoder]] stub). */
  def decodeRaster(bytes: Array[Byte]): Bmp.Image =
    if (Bmp.isBmp(bytes)) Bmp.parse(bytes)
    else if (Ppm.isPpm(bytes)) Ppm.parse(bytes)
    else sys.error("decodeRaster: payload is neither BMP nor PPM")

  final case class MediaHash(media_id: Long, simhash: Long)
  implicit val hashEnc: Encoder[MediaHash] = Encoders.product[MediaHash]

  /** Perceptual average-hash over REAL decoded BMP pixels — the image
    * twin of [[voiceActivityWav]]: parse the container, then bit i of
    * the hash = raster segment i's luma mass above the image mean,
    * compared by integer cross-multiplication (seg·n > total·segLen; no
    * float anywhere). Same 32-segment structure as the payload-level
    * aHash in mm_phash_neardup, so the output feeds the identical
    * banded-Hamming pair machinery (Dedup.simhashPairs — never
    * all-pairs). Non-BMP images are excluded (stub seam). Partition-
    * local, no shuffle; a DCT-based pHash would change ONLY the
    * bit-derivation inside this loop. */
  def phashBmp(media: Dataset[MediaRecord], segments: Int = 32): Dataset[MediaHash] =
    media.filter(r => r.kind == "image" && Bmp.isBmp(r.payload)).mapPartitions { it =>
      it.map(r => MediaHash(r.media_id, aHash(Bmp.parse(r.payload).luma, segments)))
    }

  /** Container-blind average-hash: any BMP-or-PPM image payload through
    * [[decodeRaster]] and the same segment hash — the decode seam's
    * dispatch proven at the operator level (mm_phash_ppm_neardup pins
    * that PPM payloads of the same pixels hash identically to the BMP
    * path, against the IDENTICAL oracle). */
  def phashRaster(media: Dataset[MediaRecord], segments: Int = 32): Dataset[MediaHash] =
    media.filter(r => r.kind == "image" && (Bmp.isBmp(r.payload) || Ppm.isPpm(r.payload)))
      .mapPartitions { it =>
        it.map(r => MediaHash(r.media_id, aHash(decodeRaster(r.payload).luma, segments)))
      }

  private def aHash(px: Array[Int], segments: Int): Long = {
    val n = px.length
    var total = 0L
    var k = 0
    while (k < n) { total += px(k); k += 1 }
    var h = 0L
    var i = 0
    while (i < segments) {
      // Segment bounds in Long: i*n overflows Int on a legitimate
      // ~67M-pixel image (Bmp.parse accepts any dims its payload
      // holds — the same hostile-header class its own row-size
      // arithmetic guards in Long).
      val s = (i.toLong * n / segments).toInt
      val e = ((i + 1).toLong * n / segments).toInt
      var seg = 0L; var j = s
      while (j < e) { seg += px(j); j += 1 }
      if (seg * n > total * (e - s)) h |= 1L << i
      i += 1
    }
    h
  }

  /** pHash proper (r13 next-round 8): 2D DCT-II over the decoded 16×16
    * luma, hash = the 63 low-frequency coefficients (8×8 block minus
    * DC) thresholded at their median — the classic perceptual hash
    * (aHash's segment means see only spatial MASS; DCT bits see spatial
    * STRUCTURE, so a brightness-preserving rearrangement that fools
    * aHash flips these bits).
    *
    * All arithmetic is integer-EXACT on both gate sides: the cosine
    * basis is fixed-point (`round(cos((2x+1)uπ/32)·2^14)` — the one
    * table both engines derive from the same closed form; every entry
    * except u=0 is irrational pre-rounding, so no half-way rounding
    * boundary exists for libm-vs-JVM cos to disagree across), each
    * coefficient a Long multiply-add (≤ 255·2^28·256 ≈ 1.8e16, inside
    * Long), the median the 32nd-smallest of 63 exact integers. Images
    * whose dims are exact multiples of 16 fold by equal-area box sums
    * first (a constant scale on every coefficient — threshold-
    * invariant); other dims are refused loudly (resize belongs behind
    * the stub seam). */
  def dctPhash(media: Dataset[MediaRecord]): Dataset[MediaHash] =
    media.filter(r => r.kind == "image" && (Bmp.isBmp(r.payload) || Ppm.isPpm(r.payload)))
      .mapPartitions { it =>
        val ct = Array.tabulate(8, 16) { (u, x) =>
          math.round(math.cos((2 * x + 1) * u * math.Pi / 32) * 16384)
        }
        it.map { r =>
          val img = decodeRaster(r.payload)
          require(img.width % 16 == 0 && img.height % 16 == 0,
            s"dctPhash: ${img.width}x${img.height} not a multiple of 16 — resize first")
          val bw = img.width / 16; val bh = img.height / 16
          // Coefficient magnitude bound ≤ 255·(bw·bh)·256·2^28 — keep it
          // inside Long with headroom (500k ≈ a 128-megapixel image).
          require(bw.toLong * bh <= 500000L,
            s"dctPhash: ${img.width}x${img.height} box area overflows the exact-integer bound")
          val box = new Array[Long](256)
          var y = 0
          while (y < img.height) {
            var x = 0
            while (x < img.width) {
              box((y / bh) * 16 + (x / bw)) += img.luma(y * img.width + x)
              x += 1
            }
            y += 1
          }
          val co = new Array[Long](64)
          var u = 0
          while (u < 8) {
            var v = 0
            while (v < 8) {
              var acc = 0L
              var yy = 0
              while (yy < 16) {
                var rowAcc = 0L
                var xx = 0
                while (xx < 16) { rowAcc += box(yy * 16 + xx) * ct(u)(xx); xx += 1 }
                acc += rowAcc * ct(v)(yy)
                yy += 1
              }
              co(v * 8 + u) = acc
              v += 1
            }
            u += 1
          }
          val ac = co.drop(1) // 63 coefficients, DC excluded
          val med = ac.sorted.apply(31)
          var h = 0L
          var k = 0
          while (k < 63) { if (ac(k) > med) h |= 1L << k; k += 1 }
          MediaHash(r.media_id, h)
        }
      }

  final case class ResizedFeatures(
      media_id: Long, kind: String, rs_len: Long, rs_checksum: Long)

  /** A batched resize kernel, mirroring MediaDecoder: a real scaler holds
    * its native handle per batch. The stub strides each payload down to
    * ~targetPixels samples — integer-exact for the oracle. */
  trait ResizeKernel extends Serializable {
    def resizeBatch(batch: Seq[MediaRecord], targetPixels: Int): Seq[ResizedFeatures]
  }

  object StubResizer extends ResizeKernel {
    override def resizeBatch(batch: Seq[MediaRecord], targetPixels: Int): Seq[ResizedFeatures] =
      batch.map { r =>
        val len = r.payload.length
        val stride = math.max(1, len / targetPixels)
        var i = 0; var sum = 0L; var n = 0L
        while (i < len) { sum += (r.payload(i) & 0xff); n += 1; i += stride }
        ResizedFeatures(r.media_id, r.kind, n, sum)
      }
  }

  /** Resize stage: same batched partition-local shape as `decode` — the
    * whole batch goes to the kernel so per-batch scaler setup amortizes. */
  def resize(
      media: Dataset[MediaRecord],
      targetPixels: Int,
      kernel: ResizeKernel = StubResizer): Dataset[ResizedFeatures] = {
    implicit val enc: Encoder[ResizedFeatures] = Encoders.product[ResizedFeatures]
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap(batch => kernel.resizeBatch(batch, targetPixels))
    }
  }

  /** Frame sampling: decode once, keep video rows, explode every k-th
    * frame index with a per-frame fingerprint — declarative from the
    * features on (codegen'd `sequence` + `explode`; the per-frame decode
    * would slot into a batched stage like `decode`). */
  def sampleFrames(features: Dataset[MediaFeatures], everyK: Int): DataFrame =
    features.toDF()
      .filter(col("kind") === "video")
      .selectExpr(
        "media_id", "n_frames",
        s"explode(sequence(0, n_frames - 1, $everyK)) AS frame_idx",
        "checksum")
      .selectExpr(
        "media_id", "n_frames", "frame_idx",
        "(checksum * 31 + frame_idx) % 1000003 AS frame_hash")

  /** Build a media table from `documents`: the UTF-8 payload stands in
    * for opaque media bytes; kind cycles by doc_id. Real pipelines read
    * (path, binary) via `spark.read.format("binaryFile")` or a manifest. */
  def mediaFromDocuments(spark: SparkSession, docsParquet: String): Dataset[MediaRecord] = {
    val df = spark.read.parquet(docsParquet).select(
      col("doc_id").as("media_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(col("source").as("source"), lit("synthetic").as("declaredKind")).as("meta"))
    df.as[MediaRecord]
  }
}
