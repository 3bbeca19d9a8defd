package graft

import java.nio.{ByteBuffer, ByteOrder}

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaRecord, WavPcm16}

/** The one REAL media kernel the environment can run end-to-end: WAV
  * (RIFF/PCM16) header parse + windowed-energy VAD over the decoded
  * samples — fixtures are genuine WAV byte streams generated here, so
  * the parse walks real chunk structure, not a stand-in. */
class WavVadSpec extends SparkSuite {

  /** A real little-endian RIFF/WAVE file: optional LIST junk chunk
    * before fmt (parsers must skip unknown chunks), PCM16 mono. */
  private def wavBytes(samples: Array[Int], rate: Int = 8000,
      withJunkChunk: Boolean = false): Array[Byte] = {
    val junk = if (withJunkChunk) 8 + 6 else 0 // "LIST" + size + 6 bytes (padded odd->even by us)
    val dataLen = samples.length * 2
    val riffLen = 4 + junk + (8 + 16) + (8 + dataLen)
    val bb = ByteBuffer.allocate(8 + riffLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(riffLen)
      .put("WAVE".getBytes("US-ASCII"))
    if (withJunkChunk)
      bb.put("LIST".getBytes("US-ASCII")).putInt(6)
        .put("INFOab".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort)              // PCM
      .putShort(1.toShort)              // mono
      .putInt(rate)
      .putInt(rate * 2)                 // byte rate
      .putShort(2.toShort)              // block align
      .putShort(16.toShort)             // bits/sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(v => bb.putShort(v.toShort))
    bb.array()
  }

  private def rec(id: Long, payload: Array[Byte]): MediaRecord =
    MediaRecord(id, "audio", payload, Multimodal.MediaMeta("test", "audio"))

  test("WAV parse: header fields, junk-chunk skip, signed LE samples") {
    val s = Array(0, 1000, -1000, 32767, -32768)
    val w = WavPcm16.parse(wavBytes(s, rate = 16000, withJunkChunk = true))
    assert(w.sampleRate == 16000 && w.channels == 1)
    assert(w.samples.toSeq == s.toSeq)
  }

  test("malformed WAVs refuse loudly") {
    val ok = wavBytes(Array(1, 2, 3))
    intercept[IllegalArgumentException](WavPcm16.parse("not a wav".getBytes))
    // declared float format
    val badFmt = ok.clone(); badFmt(20) = 3
    intercept[IllegalArgumentException](WavPcm16.parse(badFmt))
    // truncated data chunk
    intercept[IllegalArgumentException](WavPcm16.parse(ok.dropRight(2)))
  }

  test("vad over real PCM fixtures: silence vs tone frames, longest run") {
    val s = spark
    import s.implicits._
    val frame = 4
    // 8 frames of 4 samples: [silence ×2][tone ×3][silence ×1][tone ×2]
    // amplitude 1000 tone; clip mean = 1000·20/32 = 625/sample, so tone
    // frames (mean 1000) are voiced, silence frames are not.
    val samples =
      Array.fill(8)(0) ++ Array.fill(12)(1000) ++ Array.fill(4)(0) ++ Array.fill(8)(1000)
    val media = Seq(
      rec(1L, wavBytes(samples)),
      // a non-WAV audio row must be EXCLUDED, not crash the stage
      rec(2L, "plain bytes, not RIFF".getBytes)).toDS()
    val out = Multimodal.voiceActivityWav(media, frameSamples = frame)
      .collect().map(v => (v.media_id, v.n_frames, v.n_voiced, v.max_run)).toSeq
    assert(out == Seq((1L, 8L, 5L, 3L)), out.toString)
  }

  test("negative samples carry energy: |sample| not raw value") {
    val s = spark
    import s.implicits._
    val samples = Array.fill(4)(0) ++ Array.fill(4)(-2000)
    val out = Multimodal.voiceActivityWav(
        Seq(rec(3L, wavBytes(samples))).toDS(), frameSamples = 4)
      .collect().head
    assert(out.n_frames == 2 && out.n_voiced == 1 && out.max_run == 1)
  }
}
