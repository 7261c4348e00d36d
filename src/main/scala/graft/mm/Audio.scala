package graft.mm

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Audio column plumbing through the REAL JDK WAV codec
  * (`javax.sound.sampled.AudioSystem`): the audio leg of the multimodal
  * surface, mirroring [[Multimodal]]'s image/video discipline — media as
  * an opaque `binary` column, decode/feature passes partition-local with
  * per-partition codec scope, zero shuffles.
  *
  * The container has no audio test data, so the PCM payload is a
  * deterministic synthetic waveform from an integer sample formula of
  * `doc_id`; WAV PCM round-trips losslessly through AudioSystem, so every
  * decoded sample — and therefore the windowed amplitude envelope — is an
  * integer function the DuckDB oracle reproduces in SQL with no knowledge
  * of WAV byte layout. The codec work (RIFF header parse, stream frame
  * accounting) is the real JDK implementation, not a stub.
  *
  * At scale: identical posture to images — audio bytes ride their own
  * column (projection pruning keeps metadata queries byte-free),
  * partitions byte-bounded via files.maxPartitionBytes, all decode in
  * mapPartitions.
  */
object Audio {

  /** Unsigned 8-bit PCM sample i of doc — pure integer formula the SQL
    * oracle mirrors operator-for-operator (ids required non-negative at
    * the generator entry, same contract as the image formulas).
    */
  def sampleValue(docId: Long, i: Int): Int =
    ((docId * 31L + i.toLong * 17L) % 256L).toInt

  /** Samples per doc — deliberately NOT a multiple of the 256-sample
    * window so the trailing partial window is exercised and
    * oracle-checked.
    */
  def sampleCount(docId: Long): Int =
    1000 + (docId % 5L).toInt * 256 + (docId % 7L).toInt * 3

  val SampleRate = 8000f
  val Window = 256

  /** REAL encode: 8-bit unsigned mono PCM → WAV container via
    * AudioSystem (RIFF header + fmt/data chunks written by the JDK).
    */
  def encodeWav(samples: Array[Byte]): Array[Byte] = {
    val fmt = new AudioFormat(SampleRate, 8, 1, false, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(samples), fmt, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL decode: AudioSystem container parse. Throws on corrupt bytes. */
  def decodeWav(bytes: Array[Byte]): (AudioFormat, Array[Byte]) = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try (ais.getFormat, ais.readAllBytes())
    finally ais.close()
  }

  case class AudioRow(doc_id: Long, media: Array[Byte], format: String)
  case class EnvelopeRow(doc_id: Long, win: Int, n_samples: Int, abs_sum: Long)

  /** Audio media frame: one synthetic WAV per doc through the real
    * AudioSystem encoder. Partition-local, no shuffle.
    */
  def audioFrame(spark: SparkSession, docs: DataFrame): Dataset[AudioRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        require(id >= 0, s"doc_id must be non-negative (formula/oracle contract), got $id")
        val n = sampleCount(id)
        val buf = new Array[Byte](n)
        var i = 0
        while (i < n) { buf(i) = sampleValue(id, i).toByte; i += 1 }
        AudioRow(id, encodeWav(buf), "audio/wav")
      })
  }

  case class FeatureRow(doc_id: Long, win: Int, n_samples: Int, energy: Long, zero_cross: Long)

  /** Windowed spectral-proxy features: per `win`-sample window, the
    * integer energy Σ(sample−128)² and the zero-crossing count (sign
    * flips around the 128 midline, counted over within-window neighbor
    * pairs only — the speech/music/noise discriminator pair classical
    * audio pipelines gate on). Sign classes are `<128` vs `≥128`, so a
    * sample ON the midline is deterministic, never a float epsilon
    * call. Same posture as [[envelope]]: one real WAV decode per row,
    * all accumulation in-partition, integer outputs the oracle
    * reproduces from the sample formula with no codec knowledge.
    */
  def features(spark: SparkSession, audio: Dataset[AudioRow], win: Int = Window): Dataset[FeatureRow] = {
    import spark.implicits._
    audio.mapPartitions(_.flatMap { row =>
      val (fmt, pcm) = decodeWav(row.media)
      require(fmt.getSampleSizeInBits == 8 && fmt.getChannels == 1,
        s"expected 8-bit mono PCM, got $fmt")
      (0 until (pcm.length + win - 1) / win).map { w =>
        val from = w * win
        val to = math.min(from + win, pcm.length)
        var energy = 0L
        var zc = 0L
        var i = from
        while (i < to) {
          val d = (pcm(i) & 0xff) - 128
          energy += d.toLong * d.toLong
          if (i > from &&
              ((pcm(i - 1) & 0xff) < 128) != ((pcm(i) & 0xff) < 128)) zc += 1L
          i += 1
        }
        FeatureRow(row.doc_id, w, to - from, energy, zc)
      }
    })
  }

  /** Windowed amplitude envelope: Σ|sample − 128| per `win`-sample
    * window over the decoded PCM — the VAD/silence-trim/loudness
    * primitive. One real WAV decode per row, envelope accumulation
    * in-partition; integer output.
    */
  def envelope(spark: SparkSession, audio: Dataset[AudioRow], win: Int = Window): Dataset[EnvelopeRow] = {
    import spark.implicits._
    audio.mapPartitions(_.flatMap { row =>
      val (fmt, pcm) = decodeWav(row.media)
      require(fmt.getSampleSizeInBits == 8 && fmt.getChannels == 1,
        s"expected 8-bit mono PCM, got $fmt")
      (0 until (pcm.length + win - 1) / win).map { w =>
        val from = w * win
        val to = math.min(from + win, pcm.length)
        var acc = 0L
        var i = from
        while (i < to) { acc += math.abs((pcm(i) & 0xff) - 128).toLong; i += 1 }
        EnvelopeRow(row.doc_id, w, to - from, acc)
      }
    })
  }

  /** Audio frame with PLANTED duplicates: the waveform is keyed by a
    * "recording id" `doc_id % groups` instead of the doc itself, so all
    * docs sharing a recording id carry byte-identical WAVs — the
    * ground-truth equality classes the content-addressable audio dedup
    * ([[SparkEntry]] `mm_audio_match`) must recover purely from DECODED
    * bytes. Same real-codec/no-shuffle posture as [[audioFrame]].
    */
  def dupAudioFrame(spark: SparkSession, docs: DataFrame, groups: Int = 50): Dataset[AudioRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        require(id >= 0, s"doc_id must be non-negative (formula/oracle contract), got $id")
        val rec = id % groups
        val n = sampleCount(rec)
        val buf = new Array[Byte](n)
        var i = 0
        while (i < n) { buf(i) = sampleValue(rec, i).toByte; i += 1 }
        AudioRow(id, encodeWav(buf), "audio/wav")
      })
  }

  case class FingerprintRow(doc_id: Long, fp: String, n_samples: Int)

  /** Content fingerprint of the DECODED PCM payload: md5 hex over the
    * raw sample bytes (container metadata excluded — two encodings of
    * the same audio match; any decode corruption splits its group). One
    * real WAV decode per row, partition-local; the 32-char fingerprint
    * is the only thing that ever shuffles.
    */
  def fingerprints(spark: SparkSession, audio: Dataset[AudioRow]): Dataset[FingerprintRow] = {
    import spark.implicits._
    audio.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { row =>
        val (fmt, pcm) = decodeWav(row.media)
        require(fmt.getSampleSizeInBits == 8 && fmt.getChannels == 1,
          s"expected 8-bit mono PCM, got $fmt")
        md.reset()
        val fp = md.digest(pcm).map("%02x".format(_)).mkString
        FingerprintRow(row.doc_id, fp, pcm.length)
      }
    }
  }
}
