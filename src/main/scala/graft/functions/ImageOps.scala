package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM image kernels for the multimodal column convention: header
  * parsing (format/width/height from PNG / JPEG / GIF magic bytes — no
  * image library needed; the container has none) and a deterministic
  * byte-histogram embedding. Both are native expressions whose generated
  * code calls a static kernel, so they run inside whole-stage codegen
  * like any builtin.
  */
object ImageHeaderKernel {
  private def be16(b: Array[Byte], i: Int): Int = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  /** (format, width, height) from the encoded header, or null when the
    * payload is not a recognized image. PNG: IHDR at a fixed offset.
    * JPEG: walk the marker segments to the first SOFn frame header.
    * GIF: little-endian logical screen size after the version tag.
    */
  def parse(bytes: Array[Byte]): InternalRow = {
    if (bytes == null) return null
    val n = bytes.length
    // PNG: 8-byte signature, then IHDR chunk (len+"IHDR"+13 data bytes)
    if (n >= 24 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' &&
      bytes(3) == 'G' && bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' &&
      bytes(15) == 'R') {
      return row("png", be32(bytes, 16), be32(bytes, 20))
    }
    // GIF87a / GIF89a: LE width/height at offsets 6/8
    if (n >= 10 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == '8' && (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a') {
      val w = (bytes(6) & 0xff) | ((bytes(7) & 0xff) << 8)
      val h = (bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8)
      return row("gif", w, h)
    }
    // JPEG: SOI then marker segments; SOFn (C0-CF except C4/C8/CC) holds
    // height/width at +5/+7 of the segment start
    if (n >= 4 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 3 < n) {
        if ((bytes(i) & 0xff) != 0xff) return null // desynced marker stream
        val marker = bytes(i + 1) & 0xff
        if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 && marker != 0xc8 &&
          marker != 0xcc) {
          if (i + 8 < n) return row("jpeg", be16(bytes, i + 7), be16(bytes, i + 5))
          return null
        } else if (marker == 0xff) {
          i += 1 // fill byte (FF padding before a marker)
        } else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) {
          i += 2 // standalone marker, no length field
        } else if (marker == 0xd9) {
          return null // EOI before any frame header
        } else {
          i += 2 + be16(bytes, i + 2)
        }
      }
      return null
    }
    null
  }

  private def row(fmt: String, w: Int, h: Int): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(fmt), w, h))
}

object ByteHistogramKernel {
  /** Normalized histogram of byte values over `bins` equal-width buckets —
    * a deterministic, content-sensitive stand-in for a learned embedding
    * with the same plumbing (fixed-dim double vector per payload).
    */
  def hist(bytes: Array[Byte], bins: Int): ArrayData = {
    val counts = new Array[Double](bins)
    if (bytes != null && bytes.length > 0) {
      var i = 0
      while (i < bytes.length) {
        counts(((bytes(i) & 0xff) * bins) / 256) += 1.0
        i += 1
      }
      val inv = 1.0 / bytes.length
      i = 0
      while (i < bins) { counts(i) *= inv; i += 1 }
    }
    new GenericArrayData(counts)
  }
}

/** struct<format, width, height> parsed from an encoded image's header
  * bytes; null for unrecognized payloads.
  */
case class ImageHeader(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ImageHeader.schema
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ImageHeaderKernel.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.ImageHeaderKernel.parse($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageHeader {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  def apply(content: Column): Column =
    GraftColumnBridge.column(ImageHeader(GraftColumnBridge.expression(content)))
}

/** Normalized byte-value histogram (array<double> of length `bins`). */
case class ByteHistogram(child: Expression, bins: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ByteHistogramKernel.hist(input.asInstanceOf[Array[Byte]], bins)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ByteHistogramKernel.hist($c, $bins);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ByteHistogram {
  def apply(content: Column, bins: Int): Column =
    GraftColumnBridge.column(ByteHistogram(GraftColumnBridge.expression(content), bins))
}
