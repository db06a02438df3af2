package graft

import java.util.Base64

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.plans.ImageDims

/**
 * Real-byte fixtures for the image container header parser: the PNG is a
 * genuine whole file (1×1 transparent pixel, the classic tracking-pixel
 * payload), the JPEG exercises the segment walk (APP0 + COM + fill bytes
 * before SOF), GIF/BMP cover the little-endian paths, and corrupt /
 * truncated / non-image payloads must all return None — never garbage
 * dimensions.
 */
class ImageDimsSpec extends SparkSpec {
  import spark.implicits._

  // a complete real-world 1×1 PNG file (67 bytes)
  private val onePxPng: Array[Byte] = Base64.getDecoder.decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg==")

  private def hexBytes(hex: String): Array[Byte] =
    hex.replaceAll("[^0-9A-Fa-f]", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  test("PNG: real 1x1 file and a 640x480 header parse; corrupt sig/dims do not") {
    assert(ImageDims.parse(onePxPng) == Some(("png", 1, 1)))
    val hdr = hexBytes("89504E470D0A1A0A 0000000D 49484452 00000280 000001E0 08 06 000000")
    assert(ImageDims.parse(hdr) == Some(("png", 640, 480)))
    // zero width is a corrupt header, not a 0-pixel image
    val zero = hexBytes("89504E470D0A1A0A 0000000D 49484452 00000000 000001E0 08 06 000000")
    assert(ImageDims.parse(zero).isEmpty)
    assert(ImageDims.parse(hdr.take(20)).isEmpty) // truncated before dims
    val badSig = hdr.clone(); badSig(1) = 'Q'.toByte
    assert(ImageDims.parse(badSig).isEmpty)
  }

  test("JPEG: segment walk skips APP0/COM/fill bytes to SOF0 and SOF2") {
    // SOI | APP0(JFIF, len 16) | COM(len 5, 3 bytes) | fill FFs | SOF0
    // h=0x0120=288, w=0x0200=512 (SOF stores height first)
    val jpeg = hexBytes(
      "FFD8" + "FFE0 0010 4A46494600 0101 00 0001 0001 0000" +
        "FFFE 0005 414243" + "FFFF" + "FFC0 0011 08 0120 0200 03 012200 021101 031101")
    assert(ImageDims.parse(jpeg) == Some(("jpeg", 512, 288)))
    // progressive SOF2 is a frame header too
    val sof2 = hexBytes("FFD8" + "FFC2 000B 08 0040 0030 01 012200")
    assert(ImageDims.parse(sof2) == Some(("jpeg", 48, 64)))
    // DHT (C4) must NOT be mistaken for a frame header
    val dht = hexBytes("FFD8" + "FFC4 0005 00 01 02" + "FFC0 000B 08 0010 0020 01 012200")
    assert(ImageDims.parse(dht) == Some(("jpeg", 32, 16)))
    // payload ending EXACTLY at the width bytes still parses (j+7 is
    // the last byte read)
    assert(ImageDims.parse(hexBytes("FFD8 FFC0 000B 08 0040 0030")) ==
      Some(("jpeg", 48, 64)))
    // ...but one byte shorter does not
    assert(ImageDims.parse(hexBytes("FFD8 FFC0 000B 08 0040 00")).isEmpty)
    // EOI before any SOF → no dimensions
    assert(ImageDims.parse(hexBytes("FFD8 FFD9")).isEmpty)
    // desynced (non-marker byte where a marker must be) → None
    assert(ImageDims.parse(hexBytes("FFD8 0041")).isEmpty)
  }

  test("GIF and BMP little-endian dimensions; BMP top-down height normalizes") {
    assert(ImageDims.parse(hexBytes("474946383961 0301 0200 00 00 00")) ==
      Some(("gif", 259, 2)))
    assert(ImageDims.parse(hexBytes("474946383761 1000 0800 00")) ==
      Some(("gif", 16, 8))) // GIF87a variant
    // BMP: 26+ bytes, width LE32 @18, height LE32 @22 (negative = top-down)
    val bmp = hexBytes("424D 00000000 0000 0000 36000000 28000000 40000000 20000000")
    assert(ImageDims.parse(bmp) == Some(("bmp", 64, 32)))
    val topDown = hexBytes("424D 00000000 0000 0000 36000000 28000000 40000000 E0FFFFFF")
    assert(ImageDims.parse(topDown) == Some(("bmp", 64, 32)))
  }

  test("non-image payloads (text bytes, empty, null) return None / NULL column") {
    assert(ImageDims.parse("just some text".getBytes("UTF-8")).isEmpty)
    assert(ImageDims.parse(Array.emptyByteArray).isEmpty)
    assert(ImageDims.parse(null).isEmpty)
  }

  test("imageDims column: codegen parse over a DataFrame matches the JVM parse") {
    val rows = Seq(
      ("png1", onePxPng),
      ("gif", hexBytes("474946383961 0301 0200 00")),
      ("text", "not an image".getBytes("UTF-8")))
    val out = rows.toDF("name", "payload")
      .select(col("name"), Multimodal.imageDims(spark, col("payload")).as("d"))
      .orderBy("name").collect()
      .map(r => (r.getString(0), Option(r.getAs[Row]("d"))
        .map(d => (d.getString(0), d.getInt(1), d.getInt(2)))))
    assert(out.toSeq == Seq(
      ("gif", Some(("gif", 259, 2))),
      ("png1", Some(("png", 1, 1))),
      ("text", None)))
  }

  test("defaultDecoder uses real header dims for recognized formats, stub otherwise") {
    val real = Multimodal.defaultDecoder(Multimodal.MediaRow(1L, onePxPng))
    assert(real.width == 1 && real.height == 1 && real.bytes == onePxPng.length)
    val stub = Multimodal.defaultDecoder(Multimodal.MediaRow(2L, "plain".getBytes("UTF-8")))
    assert(stub.width >= 64 && stub.height >= 64) // deterministic fake path
  }

  test("parse is total: truncations of valid containers and random bytes return, never throw") {
    val fixtures = Seq(
      // PNG sig + IHDR 64x48
      "89504E470D0A1A0A0000000D494844520000004000000030" + "0806000000",
      // JPEG SOI + COM(4) + SOF0
      "FFD8FFFE00044141FFC0000B0800300040",
      // GIF89a 64x48 LE
      "47494638396140003000",
      // BMP header through dims
      "424D000000000000000000000000280000004000000030000000",
    ).map(h => h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
    for (f <- fixtures; n <- 0 to f.length)
      graft.plans.ImageDims.parse(f.take(n)) // must not throw
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 500) {
      val bytes = Array.fill(rnd.nextInt(120))(rnd.nextInt(256).toByte)
      graft.plans.ImageDims.parse(bytes) // must not throw
    }
  }
}
