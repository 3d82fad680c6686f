package graft

import org.scalatest.funsuite.AnyFunSuite
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Parity pins for [[graft.operators.Multimodal.AudioIO]] (r20 optimization):
  * the cached-provider dispatch must be byte-identical to the
  * `AudioSystem` path it replaces — same readers parse the same containers
  * to the same PCM, the same conversion providers produce the same target
  * bytes, the same writers emit the same container bytes. A mismatch here
  * means the ServiceLoader enumeration diverged from the JDK's internal
  * provider order and the optimization is NOT transparent. */
class AudioCodecSpec extends AnyFunSuite {
  import graft.operators.Multimodal

  // build a couple of real containers through the PUBLIC AudioSystem path
  // so both decode pipelines start from identical bytes
  private def pcmBytes(n: Int, f: Long => Int): Array[Byte] = {
    val b = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = f(i.toLong)
      b(2 * i) = (s & 0xFF).toByte
      b(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    b
  }

  private def container(tpe: AudioFileFormat.Type): Array[Byte] = {
    val pcm = pcmBytes(256, i => (((i * 257 + 7) * (i * 257 + 7)) % 65536 - 32768).toInt)
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 256L)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, tpe, bos)
    bos.toByteArray
  }

  private def decodeVia(
      open: java.io.InputStream => AudioInputStream,
      convert: (AudioFormat, AudioInputStream) => AudioInputStream,
      payload: Array[Byte]): Array[Byte] = {
    val src = open(new java.io.ByteArrayInputStream(payload))
    try {
      val f = src.getFormat
      val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        f.getSampleRate, 16, f.getChannels, f.getChannels * 2,
        f.getSampleRate, false)
      val pcm = convert(target, src)
      try pcm.readAllBytes() finally pcm.close()
    } finally src.close()
  }

  test("AudioIO decode == AudioSystem decode, byte-for-byte, WAV and AIFF") {
    for (tpe <- Seq(AudioFileFormat.Type.WAVE, AudioFileFormat.Type.AIFF)) {
      val payload = container(tpe)
      val viaJdk = decodeVia(AudioSystem.getAudioInputStream,
        AudioSystem.getAudioInputStream, payload)
      val viaCached = decodeVia(Multimodal.AudioIO.audioInputStream,
        Multimodal.AudioIO.convert, payload)
      assert(java.util.Arrays.equals(viaJdk, viaCached), s"PCM drift for $tpe")
      assert(viaJdk.nonEmpty)
    }
  }

  test("AudioIO write == AudioSystem write, byte-for-byte, WAVE and AIFF") {
    val pcm = pcmBytes(400, i => ((i * 131 + 11) % 65536 - 32768).toInt)
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    for (tpe <- Seq(AudioFileFormat.Type.WAVE, AudioFileFormat.Type.AIFF)) {
      def ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 400L)
      val jdk = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, tpe, jdk)
      val cached = new java.io.ByteArrayOutputStream()
      Multimodal.AudioIO.write(ais, tpe, cached)
      assert(java.util.Arrays.equals(jdk.toByteArray, cached.toByteArray),
        s"container drift for $tpe")
    }
  }

  test("AudioIO rejects junk exactly like AudioSystem (UnsupportedAudioFileException)") {
    val junk = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    intercept[javax.sound.sampled.UnsupportedAudioFileException] {
      Multimodal.AudioIO.audioInputStream(new java.io.ByteArrayInputStream(junk))
    }
    intercept[javax.sound.sampled.UnsupportedAudioFileException] {
      AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(junk))
    }
  }
}
