package graft.operators

import graft.SparkSpec
import graft.operators.AudioOps._

/** REAL WAV codec: RIFF container round-trip through javax.sound.sampled,
  * magic-byte sniffing, closed-form decoded statistics, frame features. */
class AudioOpsSpec extends SparkSpec {

  test("WAV encode produces a genuine RIFF/WAVE container the JDK can decode") {
    val samples = synthSamples(3L)
    val wav = WavCodec.encode(samples)
    assert(wav.take(4).map(_.toChar).mkString == "RIFF")
    assert(wav.slice(8, 12).map(_.toChar).mkString == "WAVE")
    assert(WavCodec.sniffFormat(wav) == "audio/wav")
    assert(WavCodec.sniffFormat(Array[Byte](1, 2, 3)) == "application/octet-stream")
    val (rate, decoded) = WavCodec.decode(wav)
    assert(rate == WavCodec.SampleRate)
    assert(decoded.sameElements(samples), "PCM round-trip must be lossless")
  }

  test("decoded statistics match the sawtooth closed form") {
    // the q112 oracle's per-sample enumeration, in Scala
    Seq(0L, 1L, 5L, 12L).foreach { id =>
      val (n, p, a) = clipParams(id)
      val expectedPeak = (0 until n).map(i => math.abs(((i % p) - p / 2).toLong * a)).max
      val expectedSum = (0 until n).map(i => math.abs(((i % p) - p / 2).toLong * a)).sum
      val (_, decoded) = WavCodec.decode(WavCodec.encode(synthSamples(id)))
      assert(decoded.length == n)
      assert(decoded.map(s => math.abs(s.toLong)).max == expectedPeak)
      assert(decoded.map(s => math.abs(s.toLong)).sum == expectedSum)
    }
  }

  test("frame energies partition the clip's total energy") {
    val samples = synthSamples(7L)
    val frames = WavCodec.frameEnergies(samples, 160)
    assert(frames.length == (samples.length + 159) / 160)
    assert(frames.sum == samples.map(s => math.abs(s.toLong)).sum)
  }

  test("q112 runs: one stats row per document, all-integer columns") {
    val df = q112AudioDecode.run(spark, sfDir)
    val rows = df.collect()
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    assert(rows.length == nDocs)
    assert(df.schema.fields.forall(_.dataType.typeName == "long"))
    // amplitude bound: 16-bit PCM never clips by construction
    assert(rows.forall(_.getAs[Long]("peak") < 32768L))
  }

  test("q162: VAD frame report ≡ sequential recompute, partial tail frame kept") {
    val rows = q162AudioVad.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    for ((id, nf, voiced, mx, arg) <- rows) {
      val fes = AudioOps.WavCodec.frameEnergies(AudioOps.synthSamples(id), AudioOps.VadFrameLen)
      assert(nf == fes.length.toLong, s"clip $id frame count")
      assert(voiced == fes.count(_ >= AudioOps.VadThreshold).toLong, s"clip $id voiced")
      assert(mx == fes.max, s"clip $id max energy")
      assert(arg == fes.indexOf(fes.max).toLong, s"clip $id argmax is FIRST max frame")
      val (n, _, _) = AudioOps.clipParams(id)
      assert(nf == (n + AudioOps.VadFrameLen - 1) / AudioOps.VadFrameLen,
        s"clip $id: ceil framing keeps the partial tail")
    }
    // the corpus genuinely exercises both voiced and quiet frames
    assert(rows.exists(r => r._3 < r._2), "some clip has sub-threshold frames")
    assert(rows.exists(r => r._3 > 0), "some clip has voiced frames")
  }
}
