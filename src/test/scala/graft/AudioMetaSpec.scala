package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.plans.AudioMeta

/**
 * Real-byte fixtures for the audio container header parser: the WAV
 * fixtures exercise the chunk walk (JUNK/LIST chunks before `fmt `, odd
 * sizes with pad bytes, headers-only `data`), the FLAC fixtures exercise
 * the STREAMINFO bit unpacking across byte boundaries, and corrupt /
 * truncated / non-audio payloads must all return None — never garbage
 * parameters.
 */
class AudioMetaSpec extends SparkSpec {
  import spark.implicits._

  private def hexBytes(hex: String): Array[Byte] =
    hex.replaceAll("[^0-9A-Fa-f]", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  // canonical 16-bit stereo 44.1 kHz WAV: fmt then data (100 frames =
  // 400 bytes claimed; body absent — headers-only ingest)
  private val stereoWav = hexBytes(
    "52494646 00000000 57415645" + // RIFF size WAVE
      "666D7420 10000000 0100 0200 44AC0000 10B10200 0400 1000" +
      "64617461 90010000")

  test("WAV: canonical fmt+data parses; frames = data size / block align") {
    assert(AudioMeta.parse(stereoWav) == Some(("wav", 2, 44100, 16, 100L)))
  }

  test("WAV: chunk walk skips an odd-sized LIST chunk (pad byte) before fmt") {
    // LIST of size 5 (odd -> 1 pad byte), then mono 8 kHz 8-bit, 10 frames
    val wav = hexBytes(
      "52494646 00000000 57415645" +
        "4C495354 05000000 4141414141 00" +
        "666D7420 10000000 0100 0100 401F0000 401F0000 0100 0800" +
        "64617461 0A000000")
    assert(AudioMeta.parse(wav) == Some(("wav", 1, 8000, 8, 10L)))
  }

  test("WAV: fmt with no data chunk yields zero frames; missing fmt is None") {
    val noData = hexBytes(
      "52494646 00000000 57415645" +
        "666D7420 10000000 0100 0100 401F0000 401F0000 0100 0800")
    assert(AudioMeta.parse(noData) == Some(("wav", 1, 8000, 8, 0L)))
    val noFmt = hexBytes("52494646 00000000 57415645 64617461 0A000000")
    assert(AudioMeta.parse(noFmt).isEmpty)
    // truncated fmt body
    assert(AudioMeta.parse(hexBytes(
      "52494646 00000000 57415645 666D7420 10000000 0100")).isEmpty)
    // bad RIFF/WAVE magic
    assert(AudioMeta.parse(hexBytes("52494647 00000000 57415645")).isEmpty)
  }

  test("FLAC: STREAMINFO bits unpack across byte boundaries") {
    // 44100 Hz, 2 channels, 16-bit, 0x12345 samples:
    // rate 0x0AC44 -> bytes 0A C4, high nibble 4; ch-1=1 -> bits 001;
    // bps-1=15 -> 0 1111; packed: 0A C4 | 0100 001 0 | 1111 0000 | ...
    val flac = hexBytes(
      "664C6143 80000022 10001000 000000000000" +
        "0AC442F0 00012345" + "00000000000000000000000000000000")
    assert(AudioMeta.parse(flac) == Some(("flac", 2, 44100, 16, 0x12345L)))
    // 36-bit frame counts reach past 2^32
    val big = hexBytes(
      "664C6143 80000022 10001000 000000000000" +
        "0AC442FA 00012345" + "00000000000000000000000000000000")
    assert(AudioMeta.parse(big) == Some(("flac", 2, 44100, 16, 0xA00012345L)))
    // zero sample rate is invalid per spec
    val zeroRate = hexBytes(
      "664C6143 80000022 10001000 000000000000" +
        "000002F0 00000001" + "00000000000000000000000000000000")
    assert(AudioMeta.parse(zeroRate).isEmpty)
    // a first block that is NOT STREAMINFO (type 4 = VORBIS_COMMENT)
    val wrongBlock = hexBytes(
      "664C6143 84000022 10001000 000000000000" +
        "0AC442F0 00012345" + "00000000000000000000000000000000")
    assert(AudioMeta.parse(wrongBlock).isEmpty)
    assert(AudioMeta.parse(flac.take(30)).isEmpty) // truncated
  }

  test("parse is total: truncations, huge chunk sizes, and random bytes return, never throw") {
    for (n <- 0 to stereoWav.length)
      AudioMeta.parse(stereoWav.take(n)) // must not throw
    // a chunk whose DECLARED size pushes the next offset past 2^31: an
    // Int offset would wrap negative and index out of bounds
    // (regression — 0x7FFFFFF6 passes the corrupt-size guard)
    val huge = hexBytes(
      "52494646 00000000 57415645" +
        "4A554E4B F6FFFF7F" + // JUNK claiming ~2.147 GB
        "4A554E4B 04000000 41414141")
    assert(AudioMeta.parse(huge).isEmpty)
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 500) {
      val bytes = Array.fill(rnd.nextInt(120))(rnd.nextInt(256).toByte)
      AudioMeta.parse(bytes) // must not throw
    }
  }

  test("audioMeta column: codegen path matches the JVM parse, null-safe") {
    val rows = Seq(
      (1L, stereoWav),
      (2L, hexBytes("664C6143 80000022 10001000 000000000000" +
        "0AC442F0 00012345" + "00000000000000000000000000000000")),
      (3L, Array.empty[Byte]),
      (4L, null)).toDF("id", "payload")
    val out = Multimodal.audioMeta(spark, col("payload"))
    val got = rows.select(col("id"), out.getField("format").as("f"),
        out.getField("n_frames").as("n"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, Some("wav"), 100L), (2L, Some("flac"), 0x12345L),
      (3L, None, -1L), (4L, None, -1L)))
  }
}
