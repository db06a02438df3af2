package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression: MP4 / ISO-BMFF (ISO 14496-12) container
 * metadata straight from the leading bytes of a binary payload — no
 * codec library. The video sibling of [[ImageDims]] and [[AudioMeta]],
 * completing the multimodal metadata trio (SURVEY §2.2 #35; reference
 * analog: typed-column derivation from raw assets, dag.py:132-202).
 *
 * ISO-BMFF is a BOX WALK: `[size:u32be][type:4cc][body]` sequences,
 * where size 1 escapes to a 64-bit largesize and size 0 means
 * "extends to end of file" — boxes sit at data-dependent offsets, so
 * a fixed-offset peek cannot parse it:
 *
 *  - `ftyp` carries the major brand (the 4cc naming the file's
 *    conformance profile — "isom", "mp42", "avc1", …).
 *  - `moov` is a CONTAINER; its child walk finds `mvhd` (movie
 *    header: version 0 packs u32 timescale/duration after 2×u32
 *    timestamps, version 1 after 2×u64 timestamps with a u64
 *    duration) and counts `trak` children — one per media track.
 *
 * The walk reads only box HEADERS plus mvhd's fixed-width fields: a
 * truncated payload (metadata-only ingest keeps just the head bytes)
 * still parses whatever boxes its bytes cover. Payloads without both
 * an ftyp brand and an mvhd return NULL. Pure byte arithmetic per
 * row, zero shuffle, codegen via one static call.
 */
case class VideoMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects BINARY, got ${t.sql}")
  }

  override def dataType: DataType = VideoMeta.schema

  override def nullable: Boolean = true

  override def prettyName: String = "graft_video_meta"

  override protected def nullSafeEval(input: Any): Any =
    VideoMeta.parseRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val row = ctx.freshName("meta")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $row = graft.plans.VideoMeta.parseRow($b);
         |if ($row == null) { ${ev.isNull} = true; } else { ${ev.value} = $row; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VideoMeta {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("brand", StringType, nullable = false),
    StructField("timescale", IntegerType, nullable = false),
    StructField("duration", LongType, nullable = false),
    StructField("n_tracks", IntegerType, nullable = false)))

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def is4cc(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t.charAt(0) && b(i + 1) == t.charAt(1) &&
      b(i + 2) == t.charAt(2) && b(i + 3) == t.charAt(3)

  /** JVM-facing parse: (brand, timescale, duration, n_tracks), or None. */
  def parse(b: Array[Byte]): Option[(String, Int, Long, Int)] = {
    if (b == null || b.length < 16) return None
    var brand: String = null
    var timescale = -1L
    var duration = -1L
    var nTracks = 0
    var sawMvhd = false
    var i = 0L
    var go = true
    // top-level walk. Two distinct failure modes, handled differently:
    // CORRUPTION (a declared size smaller than its own header, a
    // negative largesize, an unknown mvhd version) invalidates the file
    // → None; TRUNCATION (headers-only ingest cut a box header or body
    // short) ENDS the walk, keeping whatever already parsed — the
    // documented contract. All offsets are Long and every size is
    // CLAMPED to the remaining payload before advancing, so a
    // hostile size field (up to Long.MaxValue via the largesize
    // escape) can neither overflow the offset into a negative index
    // nor spin the loop.
    while (go && i + 8 <= b.length) {
      val ii = i.toInt
      var size = be32(b, ii)
      var hdr = 8
      if (size == 1) { // largesize escape
        if (i + 16 > b.length) { go = false } // header itself truncated
        else { size = be64(b, ii + 8); hdr = 16 }
      } else if (size == 0) size = b.length - i // extends to end of file
      if (go) {
        if (size < hdr) return None // corrupt (negative largesize lands here)
        val declared = size // the box's own extent, before truncation clamp
        if (size > b.length - i) size = b.length - i // truncated body: clamp
        if (is4cc(b, ii + 4, "ftyp")) {
          // the brand read is bounded by the box's OWN declared extent,
          // never the payload: a corrupt ftyp declaring size 8-11 with
          // another box behind it must not read its brand out of that
          // next box's size field (the moov child walk guards the same
          // class). Truncation is different — a declared extent that DOES
          // cover the brand but whose bytes were cut away ends the walk.
          if (declared < hdr + 4) return None // no room for a brand: corrupt
          else if (i + hdr + 4 > b.length) go = false // brand truncated away
          else brand = new String(b, ii + hdr, 4, "ISO-8859-1")
        } else if (is4cc(b, ii + 4, "moov")) {
          // child walk; a moov truncated by headers-only ingest still
          // yields every child whose header bytes are present. Child
          // reads are bounded by the PARENT'S extent, never the whole
          // payload — a complete moov whose declared size is too small
          // for its own mvhd must not read metadata out of the NEXT
          // box's bytes. A boundary miss is TRUNCATION (end the walk,
          // keep parsed fields) only when the moov's extent reaches the
          // payload's end — i.e. its body may genuinely be cut;
          // anywhere else it is structural corruption → None.
          val end = i + size // already clamped to the payload
          val mayBeTruncated = end == b.length
          var j = i + hdr
          var cgo = true
          while (cgo && j + 8 <= end) {
            val jj = j.toInt
            var csize = be32(b, jj)
            var chdr = 8
            if (csize == 1) {
              if (j + 16 > end) {
                if (mayBeTruncated) cgo = false else return None
              } else { csize = be64(b, jj + 8); chdr = 16 }
            } else if (csize == 0) csize = end - j
            if (cgo) {
              if (csize < chdr) return None // corrupt
              if (csize > end - j) {
                if (mayBeTruncated) csize = end - j // truncated: clamp
                else return None // body overruns a complete parent
              }
              if (is4cc(b, jj + 4, "mvhd")) {
                // the version byte sits PAST the box header: a payload
                // truncated at the header boundary must not read it
                if (j + chdr >= end) {
                  if (mayBeTruncated) cgo = false else return None
                } else {
                  val v = b(jj + chdr) & 0xff
                  if (v == 0) { // u32 creation/modification, u32 duration
                    if (j + chdr + 20 > end) {
                      if (mayBeTruncated) cgo = false else return None
                    } else {
                      timescale = be32(b, jj + chdr + 12)
                      duration = be32(b, jj + chdr + 16)
                      sawMvhd = true
                    }
                  } else if (v == 1) { // u64 timestamps, u64 duration
                    if (j + chdr + 32 > end) {
                      if (mayBeTruncated) cgo = false else return None
                    } else {
                      timescale = be32(b, jj + chdr + 20)
                      duration = be64(b, jj + chdr + 24)
                      sawMvhd = true
                    }
                  } else return None // unknown version: corrupt
                }
              } else if (is4cc(b, jj + 4, "trak")) {
                nTracks += 1
              }
              if (cgo) j += csize
            }
          }
        }
        i += size
      }
    }
    if (brand == null || !sawMvhd || timescale <= 0 || timescale > Int.MaxValue ||
      duration < 0) None
    else Some((brand, timescale.toInt, duration, nTracks))
  }

  /** Codegen/eval-facing parse: an InternalRow of [[schema]], or null. */
  def parseRow(b: Array[Byte]): InternalRow = parse(b) match {
    case Some((brand, scale, dur, tracks)) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString("mp4"),
        UTF8String.fromString(brand), Integer.valueOf(scale),
        java.lang.Long.valueOf(dur), Integer.valueOf(tracks)))
    case None => null
  }
}
