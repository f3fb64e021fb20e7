package graft.llm

import javax.sound.sampled.AudioSystem
import javax.sound.sampled.AudioFormat.Encoding

/** WAV PCM decode via the JDK's `javax.sound.sampled` — no external
  * audio library. Pure bytes-in, samples-out; kept kernel-shaped (like
  * [[MediaHeaderKernel]]) so the Spark layer stays a thin
  * `mapPartitions` and the decode is unit-testable without a session.
  */
object AudioKernel {

  /** Decode a WAV payload to (sampleRate, channels, mono samples).
    * Samples are normalized to [-1, 1] with channels averaged to mono.
    * Supports PCM signed/unsigned, 8/16/24/32-bit, either endianness.
    * Returns null for undecodable payloads (caller maps to null row —
    * one corrupt file must not fail a 100 TB task). */
  def decodePcm(bytes: Array[Byte]): (Int, Int, Array[Double]) = {
    if (bytes == null) return null
    val in =
      try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => return null }
    try {
      val fmt = in.getFormat
      val enc = fmt.getEncoding
      if (enc != Encoding.PCM_SIGNED && enc != Encoding.PCM_UNSIGNED) return null
      val bits = fmt.getSampleSizeInBits
      if (bits != 8 && bits != 16 && bits != 24 && bits != 32) return null
      val ch = fmt.getChannels
      val frameSize = fmt.getFrameSize
      if (ch < 1 || frameSize < 1) return null
      val data = in.readAllBytes()
      val bytesPer = bits / 8
      val nFrames = data.length / frameSize
      val out = new Array[Double](nFrames)
      val unsigned = enc == Encoding.PCM_UNSIGNED
      val big = fmt.isBigEndian
      var f = 0
      while (f < nFrames) {
        var acc = 0.0
        var c = 0
        while (c < ch) {
          acc += sample(data, f * frameSize + c * bytesPer, bytesPer, big,
            unsigned, bits)
          c += 1
        }
        out(f) = acc / ch
        f += 1
      }
      (fmt.getSampleRate.toInt, ch, out)
    } catch { case _: Exception => null } finally in.close()
  }

  private def sample(b: Array[Byte], off: Int, bytesPer: Int, big: Boolean,
      unsigned: Boolean, bits: Int): Double = {
    var v = 0L
    if (big) {
      var i = 0
      while (i < bytesPer) { v = (v << 8) | (b(off + i) & 0xff); i += 1 }
    } else {
      var i = bytesPer - 1
      while (i >= 0) { v = (v << 8) | (b(off + i) & 0xff); i -= 1 }
    }
    val full = 1L << (bits - 1)
    if (unsigned) (v.toDouble - full) / full
    else ((v << (64 - bits)) >> (64 - bits)).toDouble / full
  }
}
