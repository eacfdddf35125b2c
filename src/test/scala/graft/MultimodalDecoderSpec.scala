package graft

import java.io.ByteArrayOutputStream

import graft.llm.Multimodal

/** The real-decoder contract test for the Multimodal injection seam: a
  * genuine RIFF/WAVE PCM-16 payload (built byte-by-byte here, no codec
  * library) decoded end-to-end through `extractFeatures` — proof the seam
  * carries a real decoder, not just the deterministic stub. */
class MultimodalDecoderSpec extends SparkSpec {
  import spark.implicits._

  /** Minimal valid WAV: RIFF header + fmt chunk (PCM, mono, 16-bit) +
    * data chunk with the given samples; plus an unknown odd-sized chunk
    * before data to exercise the aligned chunk walk. */
  private def wav(samples: Seq[Int]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
    val dataBytes = samples.length * 2
    ascii("RIFF"); le32(4 + 24 + (8 + 5 + 1) + 8 + dataBytes); ascii("WAVE")
    ascii("fmt "); le32(16)
    le16(1)      // audioFormat = PCM
    le16(1)      // channels
    le32(8000)   // sample rate
    le32(16000)  // byte rate
    le16(2)      // block align
    le16(16)     // bits per sample
    ascii("LIST"); le32(5); out.write(Array[Byte](1, 2, 3, 4, 5)); out.write(0) // odd chunk + pad
    ascii("data"); le32(dataBytes)
    samples.foreach(le16)
    out.toByteArray
  }

  test("PcmWavDecoder parses a real WAV: sample count, amplitudes, zero crossings") {
    val f = Multimodal.PcmWavDecoder(wav(Seq(1000, -1000, 1000, -1000, 0, 500, -250, 750)))
    assert(f(0) == 8f)                  // n_samples
    assert(f(1) == ((1000L * 4 + 0 + 500 + 250 + 750) / 8.0).toFloat) // mean |amp|
    assert(f(2) == 1000f)               // max |amp|
    assert(f(3) == 6f)                  // sign flips (0 pairs with a negative: flip)
  }

  test("extractFeatures carries the real decoder through the batched mapPartitions stage") {
    val df = Seq(
      (1L, wav(Seq(100, -100, 100, -100))),
      (2L, wav(Seq(0, 0, 0, 0, 0, 0)))).toDF("id", "payload")
    val got = Multimodal.extractFeatures(df, "id", "payload", Multimodal.PcmWavDecoder)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(got(1L) == Seq(4f, 100f, 100f, 3f))
    assert(got(2L) == Seq(6f, 0f, 0f, 0f))
  }

  test("PcmWavDecoder rejects non-WAV payloads (fail-fast, not silent garbage)") {
    intercept[IllegalArgumentException] {
      Multimodal.PcmWavDecoder("definitely not audio bytes".getBytes("UTF-8"))
    }
  }
}
