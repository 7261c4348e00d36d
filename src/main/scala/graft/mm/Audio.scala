package graft.mm

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream}

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

  /** The JDK's own codec providers, resolved ONCE per JVM. The
    * `AudioSystem.getAudioInputStream`/`write` facades re-resolve the
    * provider list on EVERY call under a global static lock
    * (`JDK13Services.getProviders` is `static synchronized`), which
    * serializes a 32-thread decode stage into single-file — measured as
    * a ~75x per-call slowdown under executor concurrency vs the same
    * call single-threaded. Loading the providers through the public
    * `ServiceLoader` SPI once and invoking the reader/writer objects
    * directly is the same real JDK codec (the identical
    * `WaveFileReader`/`WaveFileWriter` instances the facade would pick)
    * minus the per-call global lock. The provider objects are stateless
    * over the streams passed in, so sharing them across threads is safe.
    */
  private lazy val fileReaders: Array[javax.sound.sampled.spi.AudioFileReader] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    val buf = scala.collection.mutable.ArrayBuffer.empty[javax.sound.sampled.spi.AudioFileReader]
    while (it.hasNext) buf += it.next()
    // Probe order matters enormously: in ServiceLoader order the JDK's
    // SoftMidiAudioFileReader sits BEFORE WaveFileReader, and its probe
    // calls MidiSystem.getSequence — which takes the SAME
    // JSSecurityManager class lock on every call (jstack-verified: 31/32
    // decode threads blocked on that monitor, a 32-thread stage running
    // slower than one thread). Probing the RIFF readers first means a
    // WAV never reaches the MIDI reader, keeping the hot path lock-free;
    // non-WAV containers still fall through the full JDK provider list.
    buf.sortBy(r => (if (r.getClass.getSimpleName.contains("Wave")) 0 else 1,
      if (r.getClass.getSimpleName.contains("Midi")) 2 else 1)).toArray
  }
  private lazy val wavWriter: javax.sound.sampled.spi.AudioFileWriter = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
    var found: javax.sound.sampled.spi.AudioFileWriter = null
    while (found == null && it.hasNext) {
      val w = it.next()
      if (w.isFileTypeSupported(AudioFileFormat.Type.WAVE)) found = w
    }
    require(found != null, "no WAVE AudioFileWriter provider on this JVM")
    found
  }

  /** Open a real codec stream over container bytes: each JDK reader
    * probes the header exactly as the AudioSystem facade would.
    */
  def openAudio(bytes: Array[Byte]): AudioInputStream = {
    var i = 0
    while (i < fileReaders.length) {
      try return fileReaders(i).getAudioInputStream(new ByteArrayInputStream(bytes))
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
      i += 1
    }
    throw new javax.sound.sampled.UnsupportedAudioFileException(
      s"no JDK provider recognized the ${bytes.length}-byte stream")
  }

  /** REAL encode: 8-bit unsigned mono PCM → WAV container via the JDK's
    * WAVE writer (RIFF header + fmt/data chunks written by the JDK).
    */
  def encodeWav(samples: Array[Byte]): Array[Byte] = {
    val fmt = new AudioFormat(SampleRate, 8, 1, false, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(samples), fmt, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    wavWriter.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL decode: JDK container parse. Throws on corrupt bytes. */
  def decodeWav(bytes: Array[Byte]): (AudioFormat, Array[Byte]) = {
    val ais = openAudio(bytes)
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
    // fan the id-only frame out to every core BEFORE the heavy per-row
    // encode/decode stage: a small parquet scan arrives as one input
    // split, and without this the whole codec stage runs single-task
    // (measured: the 10x audio stress row was a straight single-core
    // linear scan). The exchange ships 8-byte ids — free next to the
    // codec work it parallelizes; at 100 TB maxPartitionBytes already
    // fans the scan out and the repartition is a no-op-sized shuffle.
    docs.select(col("doc_id")).repartition(spark.sparkContext.defaultParallelism)
      .as[Long]
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
    // same decode-stage fan-out as [[audioFrame]] (8-byte ids, then the
    // per-row codec work spreads across every core)
    docs.select(col("doc_id")).repartition(spark.sparkContext.defaultParallelism)
      .as[Long]
      .mapPartitions { it =>
        // only `groups` distinct waveforms exist by construction, so the
        // synthetic encode memoizes per partition: without this the
        // GENERATOR (not the dedup operator) dominated the 10x
        // ScaleStress row — 50k full encodes for 50 distinct recordings.
        // Output bytes are unchanged (the cache is keyed by the same rec
        // the formula is).
        val cache = new java.util.HashMap[Long, Array[Byte]]()
        it.map { id =>
          require(id >= 0, s"doc_id must be non-negative (formula/oracle contract), got $id")
          val rec = id % groups
          var wav = cache.get(rec)
          if (wav == null) {
            val n = sampleCount(rec)
            val buf = new Array[Byte](n)
            var i = 0
            while (i < n) { buf(i) = sampleValue(rec, i).toByte; i += 1 }
            wav = encodeWav(buf)
            cache.put(rec, wav)
          }
          AudioRow(id, wav, "audio/wav")
        }
      }
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

  /** Sampled-window content fingerprint — the SCALE path for
    * content-addressable audio dedup. [[fingerprints]] digests every
    * decoded sample, so its cost is O(track length) per row (ScaleStress
    * measured the full-PCM path 15.4x at 10x data — linear decode
    * dominates); this digests only `nWindows` evenly-spaced
    * `winLen`-sample windows ([[Multimodal.sampleIndices]], the
    * `mm_frames` trick applied to PCM) plus the total sample count, so
    * per-track cost is O(nWindows * winLen) REGARDLESS of duration —
    * hour-long tracks cost the same as ten-second clips.
    *
    * Identity contract: byte-identical tracks always collide (no false
    * splits — duplicate groups are recovered exactly), and the digested
    * length means prefix-equal tracks of different durations never
    * collide. Distinct same-length tracks agreeing on every sampled
    * window WOULD merge — the standard screen trade; run the full
    * [[fingerprints]] within multi-member groups when the corpus needs
    * certified byte equality (the dedup-family candidates+verify
    * discipline). Tracks too short for non-overlapping windows fall back
    * to the full digest, which is cheap exactly there. The header parse
    * and the window reads all go through the real AudioSystem stream
    * (skip + read on the codec's frame accounting), partition-local.
    */
  def sampledFingerprints(
      spark: SparkSession,
      audio: Dataset[AudioRow],
      nWindows: Int = 8,
      winLen: Int = 64): Dataset[FingerprintRow] = {
    import spark.implicits._
    audio.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val buf = new Array[Byte](winLen)
      it.map { row =>
        val ais = openAudio(row.media)
        try {
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 8 && fmt.getChannels == 1,
            s"expected 8-bit mono PCM, got $fmt")
          val n = ais.getFrameLength.toInt // 1 byte per frame: 8-bit mono
          md.reset()
          var x = n.toLong // length is part of the identity
          val lenBytes = new Array[Byte](8)
          var j = 0
          while (j < 8) { lenBytes(j) = (x & 0xff).toByte; x >>= 8; j += 1 }
          md.update(lenBytes)
          if (n <= nWindows * winLen * 2) {
            md.update(ais.readAllBytes()) // short track: full digest is cheaper
          } else {
            // n / nWindows > 2 * winLen here, so windows never overlap and
            // the stream advances strictly forward: skip + read suffice
            var pos = 0L
            Multimodal.sampleIndices(n, nWindows).foreach { st =>
              var toSkip = st - pos
              while (toSkip > 0) {
                val s = ais.skip(toSkip)
                require(s > 0, s"codec skip stalled at $pos of $n")
                toSkip -= s
              }
              val want = math.min(winLen, n - st)
              var got = 0
              while (got < want) {
                val r = ais.read(buf, got, want - got)
                require(r > 0, s"codec read stalled at $st of $n")
                got += r
              }
              md.update(buf, 0, want)
              pos = st + want
            }
          }
          FingerprintRow(row.doc_id, md.digest().map("%02x".format(_)).mkString, n)
        } finally ais.close()
      }
    }
  }
}
