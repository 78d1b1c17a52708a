package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}

/** Audio-column support — the second REAL multimodal codec next to
  * [[Multimodal.ImageCodec]] (SURVEY.md §2.5 [X], LLM: multimodal
  * columns). WAV/PCM encode+decode through the JDK's
  * `javax.sound.sampled` (no external dependency): [[WavCodec.encode]]
  * writes a genuine RIFF/WAVE container, [[WavCodec.decode]] parses it
  * back through `AudioSystem` (header, format, frame stream), and the
  * decoded-sample statistics land under the DuckDB oracle exactly like
  * q65's pixel means.
  *
  * The test corpus is synthesized deterministically from the documents
  * table (a sawtooth wave whose length/period/amplitude derive from
  * doc_id), so every decoded statistic has a closed form the oracle
  * reproduces per-sample in SQL — any decode defect (endianness, sign,
  * header offset, frame size) shifts peak/sum_abs and fails the hash
  * compare.
  *
  * Scale notes: identical invariant to images — payloads are opaque
  * binary that never crosses a shuffle; decode is a narrow mapPartitions
  * and only the small per-clip feature rows move. At 100 TB of audio the
  * decode cost dominates, which is exactly the embarrassingly-parallel
  * regime Spark's scan stage handles; there is no join or agg touching
  * payload bytes anywhere in this file.
  */
object AudioOps {

  final case class AudioClip(doc_id: Long, payload: Array[Byte])
  final case class AudioStats(doc_id: Long, n_samples: Long, sample_rate: Long,
                              peak: Long, sum_abs: Long)

  /** Real WAV (RIFF) codec over `javax.sound.sampled` — pure JDK.
    * 16-bit signed little-endian PCM, mono. */
  object WavCodec {
    val SampleRate = 8000f

    private def pcmFormat: AudioFormat =
      new AudioFormat(SampleRate, 16, 1, true, false) // signed, little-endian

    /** Encode PCM samples as a real WAVE container (44-byte RIFF header +
      * data chunk), via `AudioSystem.write` — the same path a production
      * ingest uses to normalize heterogeneous audio to a canonical PCM
      * layout. */
    def encode(samples: Array[Short]): Array[Byte] = {
      val bytes = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        bytes(2 * i) = (samples(i) & 0xff).toByte
        bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val stream = new AudioInputStream(
        new ByteArrayInputStream(bytes), pcmFormat, samples.length.toLong)
      val out = new ByteArrayOutputStream()
      AudioSystem.write(stream, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }

    /** Decode a WAVE payload back to (sampleRate, samples): AudioSystem
      * parses the actual container header and streams the frames; we
      * reassemble 16-bit little-endian signed samples. */
    def decode(payload: Array[Byte]): (Float, Array[Short]) = {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
          s"unexpected decoded format: $fmt")
        val bytes = in.readAllBytes()
        val samples = new Array[Short](bytes.length / 2)
        var i = 0
        while (i < samples.length) {
          samples(i) = (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort
          i += 1
        }
        (fmt.getSampleRate, samples)
      } finally in.close()
    }

    /** Container sniff from the real magic bytes (`RIFF....WAVE`) — the
      * audio arm of [[Multimodal.ImageCodec.sniffFormat]]'s router. */
    def sniffFormat(payload: Array[Byte]): String =
      if (payload.length >= 12 && payload(0) == 'R' && payload(1) == 'I' &&
        payload(2) == 'F' && payload(3) == 'F' && payload(8) == 'W' &&
        payload(9) == 'A' && payload(10) == 'V' && payload(11) == 'E') "audio/wav"
      else "application/octet-stream"

    /** Per-frame energy (sum of |sample| per `frameLen`-sample frame) —
      * the framewise feature a VAD / audio-quality filter consumes; the
      * audio analog of [[Multimodal.ImageCodec.features]]. */
    def frameEnergies(samples: Array[Short], frameLen: Int): Array[Long] = {
      val n = (samples.length + frameLen - 1) / frameLen
      val acc = new Array[Long](n)
      var i = 0
      while (i < samples.length) {
        acc(i / frameLen) += math.abs(samples(i).toLong)
        i += 1
      }
      acc
    }
  }

  /** Deterministic clip parameters for doc `id` — shared by the builder,
    * the spec, and (in closed form) the q112 oracle: a sawtooth of
    * `n = 400 + id%7*100` samples, period `p = 16 + id%9`, amplitude step
    * `a = 256*(1 + id%4)`; sample i = ((i mod p) − p/2)·a. Max |sample| =
    * 12·1024 = 12288 < 2^15, so 16-bit PCM never clips. */
  private[operators] def clipParams(id: Long): (Int, Int, Int) =
    ((400 + (id % 7) * 100).toInt, (16 + (id % 9)).toInt, (256 * (1 + id % 4)).toInt)

  private[operators] def synthSamples(id: Long): Array[Short] = {
    val (n, p, a) = clipParams(id)
    Array.tabulate(n)(i => (((i % p) - p / 2) * a).toShort)
  }

  /** Build the deterministic audio corpus from `documents` (one WAV clip
    * per doc). Real pipelines ingest via `binaryFile`; the synthetic
    * corpus exists so decode correctness is oracle-checkable. */
  def audioFromDocuments(s: SparkSession, d: String): Dataset[AudioClip] = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .map(id => AudioClip(id, WavCodec.encode(synthSamples(id))))
  }

  /** q112: the REAL audio decode path under the oracle. Spark encodes a
    * WAV per document, then DECODES it with `javax.sound.sampled` and
    * measures integer sample statistics; DuckDB re-derives the same
    * statistics by enumerating every sample index of the closed-form
    * sawtooth (`generate_series`) — all-integer, so the hash compare is
    * exact. A wrong decode (byte order, sign convention, header length,
    * sample width) corrupts peak/sum_abs on almost every clip. */
  val q112AudioDecode = QueryDef(
    "q112_audio_decode",
    (s, d) => {
      import s.implicits._
      audioFromDocuments(s, d)
        .mapPartitions(_.map { clip =>
          val (rate, samples) = WavCodec.decode(clip.payload)
          var peak = 0L
          var sumAbs = 0L
          var i = 0
          while (i < samples.length) {
            val v = math.abs(samples(i).toLong)
            if (v > peak) peak = v
            sumAbs += v
            i += 1
          }
          AudioStats(clip.doc_id, samples.length.toLong, rate.toLong, peak, sumAbs)
        })
        .toDF()
        .orderBy("doc_id")
    },
    Some("""WITH params AS (
           |  SELECT doc_id,
           |         CAST(400 + (doc_id % 7) * 100 AS BIGINT) AS n,
           |         CAST(16 + (doc_id % 9) AS BIGINT) AS p,
           |         CAST(256 * (1 + doc_id % 4) AS BIGINT) AS a
           |  FROM documents),
           |samples AS (
           |  SELECT doc_id, n, ((unnest(generate_series(0, n - 1)) % p) - p // 2) * a AS s
           |  FROM params)
           |SELECT doc_id, CAST(ANY_VALUE(n) AS BIGINT) AS n_samples,
           |       CAST(8000 AS BIGINT) AS sample_rate,
           |       CAST(MAX(ABS(s)) AS BIGINT) AS peak,
           |       CAST(SUM(ABS(s)) AS BIGINT) AS sum_abs
           |FROM samples GROUP BY doc_id ORDER BY doc_id""".stripMargin)
  )

  final case class AudioVad(doc_id: Long, n_frames: Long, voiced: Long,
                            max_fe: Long, argmax_frame: Long)

  /** q162 framing: 160 samples = 20 ms at 8 kHz (the standard VAD hop);
    * a frame is "voiced" when its Σ|sample| clears this floor. */
  val VadFrameLen = 160
  val VadThreshold = 400000L

  /** q162: framewise energy / voice-activity report — the per-clip
    * feature pass an audio-corpus pipeline runs between ingest and
    * training-set assembly (trim silence, drop dead clips, locate the
    * loudest segment for preview sampling). Decodes the REAL WAV
    * container (same [[WavCodec]] path q112 proves), then
    * [[WavCodec.frameEnergies]] over [[VadFrameLen]]-sample frames:
    * frame count, voiced-frame count at [[VadThreshold]], the peak
    * frame energy and its FIRST frame index (ties → lowest index, so
    * the report is deterministic).
    *
    * The oracle re-derives every frame energy by enumerating the
    * closed-form sawtooth per sample index in SQL — a wrong frame
    * boundary, a dropped partial tail frame, or an off-by-one in the
    * hop shifts voiced/argmax on almost every clip. All-integer (Σ|s| ≤
    * 160·12 288 ≈ 2e6 per frame), hash-exact.
    *
    * Scale shape: identical to q112 — narrow mapPartitions decode,
    * payloads never shuffle, one ~40-byte feature row per clip moves.
    * The partial final frame is kept (real VADs pad or keep; keeping is
    * the choice both engines mirror). */
  val q162AudioVad = QueryDef(
    "q162_audio_vad",
    (s, d) => {
      import s.implicits._
      audioFromDocuments(s, d)
        .mapPartitions(_.map { clip =>
          val (_, samples) = WavCodec.decode(clip.payload)
          val fes = WavCodec.frameEnergies(samples, VadFrameLen)
          var mx = 0L
          var arg = 0L
          var voiced = 0L
          var i = 0
          while (i < fes.length) {
            if (fes(i) > mx) { mx = fes(i); arg = i.toLong }
            if (fes(i) >= VadThreshold) voiced += 1
            i += 1
          }
          AudioVad(clip.doc_id, fes.length.toLong, voiced, mx, arg)
        })
        .toDF()
        .orderBy("doc_id")
    },
    Some(s"""WITH params AS (
           |  SELECT doc_id,
           |         CAST(400 + (doc_id % 7) * 100 AS BIGINT) AS n,
           |         CAST(16 + (doc_id % 9) AS BIGINT) AS p,
           |         CAST(256 * (1 + doc_id % 4) AS BIGINT) AS a
           |  FROM documents),
           |samples AS (
           |  SELECT doc_id, unnest(generate_series(0, n - 1)) AS i, p, a
           |  FROM params),
           |frames AS (
           |  SELECT doc_id, i // $VadFrameLen AS f,
           |         CAST(SUM(ABS(((i % p) - p // 2) * a)) AS BIGINT) AS fe
           |  FROM samples GROUP BY doc_id, i // $VadFrameLen),
           |fr2 AS (
           |  SELECT doc_id, f, fe, MAX(fe) OVER (PARTITION BY doc_id) AS mx
           |  FROM frames)
           |SELECT doc_id,
           |  CAST(COUNT(*) AS BIGINT) AS n_frames,
           |  CAST(SUM(CASE WHEN fe >= $VadThreshold THEN 1 ELSE 0 END) AS BIGINT) AS voiced,
           |  CAST(ANY_VALUE(mx) AS BIGINT) AS max_fe,
           |  CAST(MIN(CASE WHEN fe = mx THEN f END) AS BIGINT) AS argmax_frame
           |FROM fr2 GROUP BY doc_id ORDER BY doc_id""".stripMargin)
  )

  final case class AudioZcr(doc_id: Long, n_samples: Long, zc: Long,
                            zcr_x1m: Long, est_period_x2: Long)

  /** q260: ZERO-CROSSING RATE — the third audio feature after q112's
    * sample statistics and q162's frame energies, and the classic
    * speech/music/noise discriminator (voiced speech crosses rarely,
    * fricatives and hiss cross constantly): count sign changes between
    * consecutive decoded samples (crossing at i iff `s[i-1] < 0 ≤ s[i]`
    * or `s[i-1] ≥ 0 > s[i]` — a stated convention both engines mirror),
    * report the count, the rate ×1e6 over the n−1 adjacent pairs, and
    * the implied dominant period `2(n−1) div zc` in double-sample units
    * (a sawtooth crosses exactly twice per period, so the estimate
    * recovers the clip's closed-form period — a structural check on the
    * whole decode+feature path, not just a checksum). All integer; zc is
    * provably positive on this corpus (every clip spans many periods).
    *
    * Scale shape: identical to q112/q162 — narrow mapPartitions over
    * the REAL WAV decode, payloads never shuffle, one feature row per
    * clip moves. The oracle re-derives every adjacent pair with a LAG
    * window over the closed-form sawtooth. */
  val q260AudioZcr = QueryDef(
    "q260_audio_zcr",
    (s, d) => {
      import s.implicits._
      audioFromDocuments(s, d)
        .mapPartitions(_.map { clip =>
          val (_, samples) = WavCodec.decode(clip.payload)
          var zc = 0L
          var i = 1
          while (i < samples.length) {
            val a = samples(i - 1) < 0
            val b = samples(i) < 0
            if (a != b) zc += 1
            i += 1
          }
          val pairs = (samples.length - 1).toLong
          AudioZcr(clip.doc_id, samples.length.toLong, zc,
            zc * 1000000L / pairs, 2L * pairs / zc)
        })
        .toDF()
        .orderBy("doc_id")
    },
    Some("""WITH params AS (
           |  SELECT doc_id,
           |         CAST(400 + (doc_id % 7) * 100 AS BIGINT) AS n,
           |         CAST(16 + (doc_id % 9) AS BIGINT) AS p,
           |         CAST(256 * (1 + doc_id % 4) AS BIGINT) AS a
           |  FROM documents),
           |samples AS (
           |  SELECT doc_id, n, i, ((i % p) - p // 2) * a AS s
           |  FROM (SELECT doc_id, n, p, a, unnest(generate_series(0, n - 1)) AS i
           |        FROM params) t),
           |x AS (
           |  SELECT doc_id, n,
           |    CASE WHEN (LAG(s) OVER w < 0 AND s >= 0)
           |           OR (LAG(s) OVER w >= 0 AND s < 0) THEN 1 ELSE 0 END AS c
           |  FROM samples WINDOW w AS (PARTITION BY doc_id ORDER BY i))
           |SELECT doc_id, CAST(ANY_VALUE(n) AS BIGINT) AS n_samples,
           |  CAST(SUM(c) AS BIGINT) AS zc,
           |  CAST(SUM(c) * 1000000 // (ANY_VALUE(n) - 1) AS BIGINT) AS zcr_x1m,
           |  CAST(2 * (ANY_VALUE(n) - 1) // SUM(c) AS BIGINT) AS est_period_x2
           |FROM x GROUP BY doc_id ORDER BY doc_id""".stripMargin)
  )

  val all: Seq[QueryDef] = Seq(q112AudioDecode, q162AudioVad, q260AudioZcr)
}
