package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The audio decode leg against GROUND TRUTH — generated tones whose
  * sample counts and energy are known in closed form:
  *
  *   · a full-scale-α sine has RMS α·32767/√2 (to within the ±0.5/sample
  *     16-bit quantization and the partial final cycle);
  *   · decode must return exactly the sample count, rate, and channel
  *     count that were encoded;
  *   · corrupt payloads DROP (never throw — the 100 TB contract shared
  *     with the image leg);
  *   · linear resampling halves the sample count and preserves RMS (a
  *     4000 Hz-sampled 440 Hz tone is still far above Nyquist).
  */
class MultimodalAudioSpec extends SparkSpec {

  import spark.implicits._

  private def mediaOf(rows: Seq[(Long, Array[Byte])]) =
    rows.toDF("media_id", "data")
      .withColumn("mime", lit("audio/wav"))
      .withColumn("meta", struct(length(col("data")).cast("long").as("n_bytes"),
        lit("test").as("source")))

  test("decode returns exact sample count, rate, channels; RMS = amp/sqrt(2)") {
    val wav = Multimodal.syntheticToneWav(freqHz = 440.0, nSamples = 8000,
      sampleRate = 8000, amplitude = 0.5)
    val got = Multimodal.extractAudioFeatures(mediaOf(Seq(1L -> wav)))
      .collect()
    assert(got.length === 1)
    val f = got.head
    assert(f.media_id === 1L)
    assert(f.sample_rate === 8000)
    assert(f.channels === 1)
    assert(f.n_samples === 8000L)
    // 440 Hz over exactly 1 s = 440 whole cycles: RMS = 0.5·32767/√2
    val expectedRms = 0.5 * 32767.0 / math.sqrt(2.0)
    assert(math.abs(f.rms_milli / 1000.0 - expectedRms) < 20.0,
      s"RMS ${f.rms_milli / 1000.0} vs expected $expectedRms")
    // peak: the sine's max sample is within quantization of 0.5 full scale
    assert(math.abs(f.peak - 16384) <= 16, s"peak ${f.peak}")
  }

  test("silence decodes to zero energy") {
    val wav = Multimodal.syntheticToneWav(freqHz = 440.0, nSamples = 1000,
      sampleRate = 8000, amplitude = 0.0)
    val f = Multimodal.extractAudioFeatures(mediaOf(Seq(1L -> wav)))
      .collect().head
    assert(f.rms_milli === 0L && f.peak === 0)
  }

  test("corrupt payloads drop; valid rows in the same partition survive") {
    val wav = Multimodal.syntheticToneWav(freqHz = 300.0, nSamples = 500,
      sampleRate = 8000, amplitude = 0.3)
    val junk = Array.tabulate[Byte](400)(i => (i * 37 + 11).toByte)
    val truncated = wav.take(16) // RIFF magic but a torn header
    val got = Multimodal.extractAudioFeatures(
      mediaOf(Seq(1L -> wav, 2L -> junk, 3L -> truncated)).coalesce(1))
      .collect()
    assert(got.map(_.media_id).toSet === Set(1L),
      s"only the valid WAV survives: ${got.map(_.media_id).toList}")
  }

  test("resample halves the sample count, preserves RMS, keeps WAV decodable") {
    val wav = Multimodal.syntheticToneWav(freqHz = 440.0, nSamples = 8000,
      sampleRate = 8000, amplitude = 0.5)
    val resampled = Multimodal.resampleAudio(mediaOf(Seq(1L -> wav)), 4000)
    val f = Multimodal.extractAudioFeatures(resampled).collect().head
    assert(f.sample_rate === 4000)
    assert(f.n_samples === 4000L, s"8000 samples @8 kHz -> 4000 @4 kHz: ${f.n_samples}")
    val expectedRms = 0.5 * 32767.0 / math.sqrt(2.0)
    // linear interpolation shaves a little energy off a 440 Hz tone at
    // 4 kHz (9 samples/cycle) — 3% covers it without masking a real bug
    assert(math.abs(f.rms_milli / 1000.0 - expectedRms) < 0.03 * expectedRms,
      s"resampled RMS ${f.rms_milli / 1000.0} vs $expectedRms")
  }

  test("resample passes corrupt payloads through unchanged") {
    val junk = Array.tabulate[Byte](64)(i => (i * 13 + 7).toByte)
    val out = Multimodal.resampleAudio(mediaOf(Seq(9L -> junk)), 4000)
      .select("media_id", "data").as[(Long, Array[Byte])].collect()
    assert(out.length === 1 && out.head._2.toSeq === junk.toSeq,
      "corrupt rows must pass through byte-identical")
  }

  test("spectral bands: a bin-aligned tone concentrates ALL milli energy in its band") {
    val bands = Array(400.0, 800.0, 1600.0, 2400.0)
    for ((f, bi) <- bands.zipWithIndex) {
      val wav = Multimodal.syntheticToneWav(f, 2000, 8000, 0.5)
      val got = Multimodal.spectralBands(wav, bands, window = 400).get
      assert(got.n_windows === 5 && got.sample_rate === 8000)
      assert(got.dominant_band === bi, s"f=$f got=$got")
      assert(got.band_milli(bi) === 1000L, s"f=$f got=$got")
      assert(got.band_milli.zipWithIndex.filter(_._2 != bi).forall(_._1 == 0L))
    }
  }

  test("spectral bands: an OFF-bin tone still dominates its nearest band (>=90%)") {
    val bands = Array(400.0, 800.0, 1600.0, 2400.0)
    // 410 Hz: half-bin offset at 20 Hz resolution — worst-case leakage
    val got = Multimodal.spectralBands(
      Multimodal.syntheticToneWav(410.0, 2000, 8000, 0.5), bands, 400).get
    assert(got.dominant_band === 0)
    assert(got.band_milli(0) >= 900L, s"got=$got")
  }

  test("spectral bands: silence is all-zero with dominant -1; corrupt drops; short drops") {
    val bands = Array(400.0, 800.0, 1600.0, 2400.0)
    val silent = Multimodal.spectralBands(
      Multimodal.syntheticToneWav(440.0, 2000, 8000, 0.0), bands, 400).get
    assert(silent.dominant_band === -1 && silent.band_milli.forall(_ == 0L))
    assert(Multimodal.spectralBands("junk junk junk".getBytes, bands, 400).isEmpty)
    // payload shorter than one full window drops rather than emitting a
    // zero-window row
    assert(Multimodal.spectralBands(
      Multimodal.syntheticToneWav(440.0, 300, 8000, 0.5), bands, 400).isEmpty)
  }

  test("spectral stage mixes channels and keeps ids; distributed run matches kernel") {
    val bands = Array(400.0, 800.0, 1600.0, 2400.0)
    val tone = Multimodal.syntheticToneWav(800.0, 2000, 8000, 0.5)
    val rows = Seq(1L -> tone, 2L -> "garbage".getBytes: (Long, Array[Byte]))
    val got = Multimodal.audioSpectralFeatures(mediaOf(rows), bands, 400)
      .collect()
    assert(got.map(_.media_id).toSeq === Seq(1L))
    assert(got.head.dominant_band === 1 && got.head.band_milli(1) === 1000L)
  }

  test("the m5 corpus decodes end-to-end with deterministic features") {
    val docs = Seq((0L, "x"), (1L, "y"), (7L, "z")).toDF("doc_id", "text")
    val feats = Multimodal.extractAudioFeatures(
      Multimodal.audioFromDocs(docs)).collect().sortBy(_.media_id)
    assert(feats.map(_.media_id).toList === List(0L, 1L, 7L))
    assert(feats.forall(f => f.sample_rate == 8000 && f.n_samples == 2000L))
    // amplitude 0.2 + (id % 5)·0.15 → RMS tracks amplitude ordering
    val rms = feats.map(_.rms_milli)
    assert(rms(0) < rms(1) && rms(1) < rms(2),
      s"RMS must track the per-id amplitude schedule: ${rms.toList}")
  }
}
