package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression: image container header sniffing — format +
 * pixel dimensions straight from the leading bytes of a binary payload,
 * no codec library. This is the real metadata extractor behind the
 * multimodal column plumbing (SURVEY §2.2 #35; the reference derives
 * typed columns from raw assets the same way, dag.py:132-202): PNG IHDR
 * and GIF logical-screen dimensions sit at fixed offsets, JPEG requires
 * an actual segment walk to the SOF marker, BMP's InfoHeader is
 * little-endian at fixed offsets. Payloads that match no magic return
 * NULL — the caller decides whether that falls back to a stub decoder.
 *
 * Pure byte arithmetic per row, zero shuffle, codegen via one static
 * call (no boxing beyond the result row, which is bounded and tiny).
 */
case class ImageDims(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects BINARY, got ${t.sql}")
  }

  override def dataType: DataType = ImageDims.schema

  override def nullable: Boolean = true

  override def prettyName: String = "graft_image_dims"

  override protected def nullSafeEval(input: Any): Any =
    ImageDims.parseRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val row = ctx.freshName("dims")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $row = graft.plans.ImageDims.parseRow($b);
         |if ($row == null) { ${ev.isNull} = true; } else { ${ev.value} = $row; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageDims {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  /** Big-endian u16/u32 readers (PNG/JPEG network order). */
  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  /** Little-endian u16/i32 readers (GIF/BMP). */
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /**
   * JVM-facing parse: (format, width, height), or None when no container
   * magic matches. Shared by the codegen path and
   * [[graft.operators.Multimodal]]'s batch decoder.
   */
  def parse(b: Array[Byte]): Option[(String, Int, Int)] = {
    if (b == null) return None
    // PNG: 8-byte signature, then the IHDR chunk is mandatory-first —
    // width/height are the big-endian u32 pair at offsets 16/20.
    if (b.length >= 24 &&
        (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        (b(4) & 0xff) == 0x0d && (b(5) & 0xff) == 0x0a &&
        (b(6) & 0xff) == 0x1a && (b(7) & 0xff) == 0x0a &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      val w = be32(b, 16); val h = be32(b, 20)
      // spec caps dims at 2^31-1; reject corrupt headers instead of
      // returning negative ints
      if (w > 0 && w <= Int.MaxValue && h > 0 && h <= Int.MaxValue)
        return Some(("png", w.toInt, h.toInt))
      return None
    }
    // GIF: "GIF87a"/"GIF89a", little-endian u16 logical screen size at 6/8.
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      return Some(("gif", le16(b, 6), le16(b, 8)))
    }
    // BMP: "BM", InfoHeader width/height as little-endian i32 at 18/22
    // (height may be negative = top-down row order; magnitude is the size).
    if (b.length >= 26 && b(0) == 'B' && b(1) == 'M') {
      val w = le32(b, 18); val h = le32(b, 22)
      if (w > 0 && h != 0 && h != Int.MinValue)
        return Some(("bmp", w, math.abs(h)))
      return None
    }
    // JPEG: SOI then a marker-segment walk to the first SOF frame header
    // (C0-CF except DHT C4, JPG C8, DAC CC) — dimensions are not at a
    // fixed offset; this walk IS the parse.
    if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 1 < b.length) {
        if ((b(i) & 0xff) != 0xff) return None // desynced: not a marker
        // fill bytes: any number of 0xFF may pad before the marker id
        var j = i + 1
        while (j < b.length && (b(j) & 0xff) == 0xff) j += 1
        if (j >= b.length) return None
        val marker = b(j) & 0xff
        if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          // SOF: len(2) precision(1) height(2) width(2) — the last byte
          // read is j+7, so a payload may END exactly there
          if (j + 8 > b.length) return None
          return Some(("jpeg", be16(b, j + 6), be16(b, j + 4)))
        } else if (marker == 0xd9 || (marker >= 0xd0 && marker <= 0xd7) ||
            marker == 0x01) {
          i = j + 1 // standalone marker, no length field
        } else {
          if (j + 2 >= b.length) return None
          i = j + 1 + be16(b, j + 1) // skip marker id + its length-prefixed body
        }
      }
      None
    } else None
  }

  /** Codegen/eval-facing parse: an InternalRow of [[schema]], or null. */
  def parseRow(b: Array[Byte]): InternalRow = parse(b) match {
    case Some((fmt, w, h)) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(fmt),
        Integer.valueOf(w), Integer.valueOf(h)))
    case None => null
  }
}
