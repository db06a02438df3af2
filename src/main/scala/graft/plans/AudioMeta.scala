package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression: audio container header parsing — format,
 * channel count, sample rate, bit depth, and frame count straight from
 * the leading bytes of a binary payload, no codec library. The audio
 * sibling of [[ImageDims]] in the multimodal column story (SURVEY §2.2
 * #35; reference analog: typed-column derivation from raw assets,
 * dag.py:132-202):
 *
 *  - WAV/RIFF is a little-endian CHUNK WALK (chunks are not at fixed
 *    offsets and pad to even sizes): the `fmt ` chunk carries
 *    channels/rate/depth, the `data` chunk's SIZE field gives the frame
 *    count — a truncated body (metadata-only ingest keeps just the head
 *    bytes) still parses, because only headers are read.
 *  - FLAC's mandatory-first STREAMINFO block is BIT-PACKED big-endian:
 *    a 20-bit sample rate, 3-bit channels-1, 5-bit bits-1 and 36-bit
 *    total-samples share byte boundaries and must be shifted out.
 *
 * Unrecognized payloads return NULL. Pure byte arithmetic per row, zero
 * shuffle, codegen via one static call.
 */
case class AudioMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects BINARY, got ${t.sql}")
  }

  override def dataType: DataType = AudioMeta.schema

  override def nullable: Boolean = true

  override def prettyName: String = "graft_audio_meta"

  override protected def nullSafeEval(input: Any): Any =
    AudioMeta.parseRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val row = ctx.freshName("meta")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $row = graft.plans.AudioMeta.parseRow($b);
         |if ($row == null) { ${ev.isNull} = true; } else { ${ev.value} = $row; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AudioMeta {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false)))

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** JVM-facing parse: (format, channels, rate, bits, frames), or None. */
  def parse(b: Array[Byte]): Option[(String, Int, Int, Int, Long)] = {
    if (b == null) return None
    // WAV: "RIFF" size "WAVE", then even-padded chunks at walk offsets.
    if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
        b(11) == 'E') {
      // the offset is a LONG: declared chunk sizes come from the file
      // and can sum past 2^31 — an Int offset would overflow negative
      // and index out of bounds on a corrupt/adversarial payload
      var i = 12L
      var channels = -1; var rate = 0; var bits = 0; var blockAlign = 0
      var dataSize = -1L
      // the walk reads only chunk HEADERS: a body past end-of-payload
      // (headers-only ingest, or a `data` chunk whose bytes were never
      // stored) terminates the loop without invalidating what's parsed
      while (i + 8 <= b.length) {
        val ii = i.toInt
        val size = le32(b, ii + 4)
        if (size > Int.MaxValue - 9) return None // corrupt size field
        if (b(ii) == 'f' && b(ii + 1) == 'm' && b(ii + 2) == 't' &&
            b(ii + 3) == ' ') {
          if (size < 16 || i + 8 + 16 > b.length) return None
          channels = le16(b, ii + 10)
          val r = le32(b, ii + 12)
          blockAlign = le16(b, ii + 20)
          bits = le16(b, ii + 22)
          if (r <= 0 || r > Int.MaxValue) return None
          rate = r.toInt
        } else if (b(ii) == 'd' && b(ii + 1) == 'a' && b(ii + 2) == 't' &&
            b(ii + 3) == 'a') {
          dataSize = size
        }
        i += 8 + size + (size & 1)
      }
      if (channels <= 0 || bits <= 0) return None
      val frames = if (dataSize < 0 || blockAlign <= 0) 0L
        else dataSize / blockAlign
      return Some(("wav", channels, rate, bits, frames))
    }
    // FLAC: "fLaC", then the mandatory-first STREAMINFO metadata block
    // (type 0) — sample rate 20 bits, channels-1 3 bits, bits-1 5 bits,
    // total samples 36 bits, packed big-endian from block offset 10.
    if (b.length >= 42 && b(0) == 'f' && b(1) == 'L' && b(2) == 'a' &&
        b(3) == 'C' && (b(4) & 0x7f) == 0) {
      val rate = ((b(18) & 0xff) << 12) | ((b(19) & 0xff) << 4) |
        ((b(20) & 0xff) >>> 4)
      val channels = (((b(20) & 0xff) >>> 1) & 0x7) + 1
      val bits = (((b(20) & 1) << 4) | ((b(21) & 0xff) >>> 4)) + 1
      val frames = ((b(21) & 0xfL) << 32) | ((b(22) & 0xffL) << 24) |
        ((b(23) & 0xffL) << 16) | ((b(24) & 0xffL) << 8) | (b(25) & 0xffL)
      if (rate <= 0) return None // 0 is invalid per spec
      return Some(("flac", channels, rate, bits, frames))
    }
    None
  }

  /** Codegen/eval-facing parse: an InternalRow of [[schema]], or null. */
  def parseRow(b: Array[Byte]): InternalRow = parse(b) match {
    case Some((fmt, ch, rate, bits, frames)) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(fmt),
        Integer.valueOf(ch), Integer.valueOf(rate), Integer.valueOf(bits),
        java.lang.Long.valueOf(frames)))
    case None => null
  }
}
