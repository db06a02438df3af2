package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.plans.VideoMeta

/**
 * Real-byte fixtures for the MP4 / ISO-BMFF box walk: boxes at
 * data-dependent offsets (a `free` box before `moov`), mvhd versions 0
 * and 1, largesize escapes, truncated / headers-only payloads, and
 * corrupt size fields — which must all return None, never garbage.
 */
class VideoMetaSpec extends SparkSpec {
  import spark.implicits._

  private def hexBytes(hex: String): Array[Byte] =
    hex.replaceAll("[^0-9A-Fa-f]", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  // minimal 32-byte mvhd v0 (head fields + rate; the parser reads the
  // fixed-width head and SKIPS by the declared size, so the tail a real
  // muxer writes — volume/matrix/next-id — is never required)
  private def mvhd0(ts: Int, dur: Int) = f"00000020 6D766864 00000000" +
    f"00000000 00000000 $ts%08X $dur%08X 00010000"
  private def trak = "00000008 7472616B" // empty trak: size 8, header only

  private val simple = hexBytes(
    "00000014 66747970 69736F6D 00000000 69736F6D" + // ftyp "isom"
      "00000038 6D6F6F76" + mvhd0(600, 6000) + trak + trak) // moov: 8+32+8+8

  test("ftyp + moov(mvhd v0, 2 traks) parses brand, timescale, duration, tracks") {
    assert(VideoMeta.parse(simple) == Some(("isom", 600, 6000L, 2)))
  }

  test("a free box between ftyp and moov moves the walk, not the result") {
    val shifted = hexBytes(
      "00000014 66747970 6D703432 00000000 69736F6D" + // brand "mp42"
        "0000000D 66726565 4141414141" + // free, 5-byte body
        "00000030 6D6F6F76" + mvhd0(1000, 44100) + trak)
    assert(VideoMeta.parse(shifted) == Some(("mp42", 1000, 44100L, 1)))
  }

  test("mvhd v1 reads u64 duration past 2^32; largesize escape walks correctly") {
    // v1 body: verflags + 8+8 timestamps + u32 timescale + u64 duration
    val v1 = hexBytes(
      "00000014 66747970 61766331 00000000 69736F6D" +
        "00000030 6D6F6F76" +
        "00000028 6D766864 01000000" +
        "0000000000000000 0000000000000000 000003E8 00000001 00000000")
    assert(VideoMeta.parse(v1) == Some(("avc1", 1000, 0x100000000L, 0)))
    // same moov via a 64-bit largesize header (size field 1)
    val large = hexBytes(
      "00000014 66747970 61766331 00000000 69736F6D" +
        "00000001 6D6F6F76 0000000000000038" + mvhd0(600, 6000) + trak)
    assert(VideoMeta.parse(large) == Some(("avc1", 600, 6000L, 1)))
  }

  test("undersized ftyp followed by a valid moov is corruption, not a brand") {
    // ftyp declaring size 8 (no room for its own brand) with a COMPLETE
    // valid moov right behind it: the brand must not be read out of the
    // next box's size field — the declared extent bounds the read
    val moov = "00000038 6D6F6F76" + mvhd0(600, 6000) + trak + trak
    assert(VideoMeta.parse(hexBytes("00000008 66747970" + moov)).isEmpty)
    // declared size 10: still short of header + 4-byte brand
    assert(VideoMeta.parse(hexBytes("0000000A 66747970 4141" + moov)).isEmpty)
    // declared size 12 exactly fits the brand — valid again
    assert(VideoMeta.parse(hexBytes("0000000C 66747970 69736F6D" + moov))
      == Some(("isom", 600, 6000L, 2)))
  }

  test("corrupt, truncated, and non-BMFF payloads are None — never garbage") {
    assert(VideoMeta.parse(null).isEmpty)
    assert(VideoMeta.parse(Array.empty[Byte]).isEmpty)
    assert(VideoMeta.parse("not a video at all".getBytes).isEmpty)
    // ftyp without any moov / mvhd
    assert(VideoMeta.parse(hexBytes(
      "00000014 66747970 69736F6D 00000000 69736F6D")).isEmpty)
    // box size smaller than its own header
    assert(VideoMeta.parse(hexBytes(
      "00000004 66747970 69736F6D 00000000 69736F6D")).isEmpty)
    // mvhd with an unknown version byte
    assert(VideoMeta.parse(hexBytes(
      "00000014 66747970 69736F6D 00000000 69736F6D" +
        "00000028 6D6F6F76 00000020 6D766864 02000000" +
        "00000000 00000000 00000258 00001770 00010000")).isEmpty)
    // truncated mid-mvhd: the fixed-width read would run past the end
    assert(VideoMeta.parse(simple.take(40)).isEmpty)
    // zero timescale is invalid
    assert(VideoMeta.parse(hexBytes(
      "00000014 66747970 69736F6D 00000000 69736F6D" +
        "00000028 6D6F6F76" + mvhd0(0, 6000))).isEmpty)
  }

  test("parse is total: every truncation of a valid payload and random bytes return, never throw") {
    // a poison payload in a binary column must yield NULL, not kill the
    // job — sweep EVERY prefix of a valid file (this catches
    // boundary-exact truncations like an mvhd cut right after its
    // header) plus deterministic pseudo-random garbage
    val shifted = hexBytes(
      "00000014 66747970 6D703432 00000000 69736F6D" +
        "0000000D 66726565 4141414141" +
        "00000030 6D6F6F76" + mvhd0(1000, 44100) + trak)
    for (payload <- Seq(simple, shifted); n <- 0 to payload.length)
      VideoMeta.parse(payload.take(n)) // must not throw
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val bytes = Array.fill(rnd.nextInt(120))(rnd.nextInt(256).toByte)
      VideoMeta.parse(bytes) // must not throw
    }
    // adversarial largesize: Long.MaxValue would overflow the offset
    // into a negative index if sizes weren't clamped (regression)
    assert(VideoMeta.parse(hexBytes(
      "00000001 61626364 7FFFFFFFFFFFFFFF")).isEmpty)
    // negative largesize is corrupt, not a crash
    assert(VideoMeta.parse(hexBytes(
      "00000001 61626364 FFFFFFFFFFFFFFF0")).isEmpty)
  }

  test("a complete moov too small for its own children is corruption, not a field read into the next box") {
    // moov declares 24 bytes but its mvhd needs 32: the v0 fields would
    // otherwise come from the FOLLOWING mdat's bytes — must be None
    val tooSmall = hexBytes(
      "00000014 66747970 69736F6D 00000000 69736F6D" +
        "00000018 6D6F6F76" + // moov size 24: header + 16 bytes
        "00000020 6D766864 00000000 00000000" + // mvhd claims 32
        "00000010 6D646174 4141414141414141") // complete mdat follows
    assert(VideoMeta.parse(tooSmall).isEmpty)
    // a child largesize header overrunning a COMPLETE parent (more
    // payload follows) is also corruption, not truncation — even with
    // an already-parsed mvhd, the result must be None, not Some
    val badLarge = hexBytes(
      "00000014 66747970 69736F6D 00000000 69736F6D" +
        "00000034 6D6F6F76" + mvhd0(600, 6000) +
        "00000001 6D646174 41414141" + // 12 bytes left, largesize needs 16
        "00000010 6D646174 4141414141414141")
    assert(VideoMeta.parse(badLarge).isEmpty)
  }

  test("headers-only ingest: truncating a trailing mdat largesize header keeps parsed metadata") {
    // the standard big-file layout — ftyp + moov + huge mdat — cut
    // mid-way through the mdat's 16-byte largesize header: everything
    // already parsed must survive (the walk ENDS, it doesn't invalidate)
    val full = hexBytes(
      "00000014 66747970 69736F6D 00000000 69736F6D" +
        "00000030 6D6F6F76" + mvhd0(600, 6000) + trak +
        "00000001 6D646174 00000000FFFFFFFF") // mdat, largesize ~4 GB
    for (cut <- 8 until 16) { // 8..15 bytes into the mdat header
      val truncated = full.take(full.length - 16 + cut)
      assert(VideoMeta.parse(truncated) == Some(("isom", 600, 6000L, 1)),
        s"cut=$cut")
    }
  }

  test("frameSampleInstants: exact instants from the parsed clock, capped, garbage drops") {
    // simple: timescale 600, duration 6000 ticks -> dur_ms = 10000 ->
    // instants 0..10s at 1s stride, but capped below at 4 frames
    val zeroDur = hexBytes(
      "00000014 66747970 69736F6D 00000000 69736F6D" +
        "00000030 6D6F6F76" + mvhd0(600, 0) + trak)
    val rows = Seq(
      (1L, simple), (2L, "not a video".getBytes), (3L, zeroDur))
      .toDF("id", "payload")
    val out = Multimodal.frameSampleInstants(spark, rows, "id", "payload",
      strideMs = 1000L, maxFrames = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(
      (1L, 0L, 0L), (1L, 1L, 1000L), (1L, 2L, 2000L), (1L, 3L, 3000L), // cap 4
      (3L, 0L, 0L))) // zero-length video keeps its t=0 frame; garbage drops
    val ex = intercept[IllegalArgumentException] {
      Multimodal.frameSampleInstants(spark, rows, "id", "payload", strideMs = 0L)
    }
    assert(ex.getMessage.contains("strideMs > 0"))
  }

  test("videoMeta column: codegen path matches the JVM parse, null-safe") {
    val rows = Seq(
      (1L, simple),
      (2L, "garbage".getBytes),
      (3L, null)).toDF("id", "payload")
    val out = Multimodal.videoMeta(spark, col("payload"))
    val got = rows.select(col("id"), out.getField("brand").as("b"),
        out.getField("duration").as("d"), out.getField("n_tracks").as("t"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1 else r.getInt(3)))
    assert(got.toSeq == Seq(
      (1L, Some("isom"), 6000L, 2), (2L, None, -1L, -1), (3L, None, -1L, -1)))
  }
}
