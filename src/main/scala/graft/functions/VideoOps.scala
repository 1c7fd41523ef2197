package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM video kernel for the multimodal column convention (the video
  * sibling of [[ImageHeaderKernel]] / [[WavHeaderKernel]]): typed
  * metadata straight from an MP4 container's box structure — the public
  * ISO/IEC 14496-12 (ISO-BMFF) layout: `[size:4 BE][type:4][payload]`
  * boxes, `ftyp` first, `moov/mvhd` carrying timescale + duration,
  * `moov/trak` one per track. No media library exists in this image and
  * none is needed for the header walk; frame DECODE stays an
  * opaque-binary concern ([[graft.operators.Multimodal]]).
  */
object Mp4HeaderKernel {
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** (major_brand, timescale, duration_ms, n_tracks) from an ISO-BMFF
    * container, or null when the payload does not start with `ftyp`.
    * Truncated payloads (header-prefix sampling) yield the brand with
    * null duration fields once `moov` is out of reach.
    *
    * Crawl-safety contract: the walk tracks every offset as a Long and
    * bails out (returning the partial row) whenever a declared box size
    * would make the next offset non-increasing or out of range, so a
    * crafted 64-bit size (e.g. exactly 2^32, or one that wraps negative
    * when truncated) can neither spin the task nor index out of bounds.
    */
  def parse(bytes: Array[Byte]): InternalRow = {
    if (bytes == null) return null
    val n = bytes.length
    if (n < 12 || fourcc(bytes, 4) != "ftyp") return null
    val brand = fourcc(bytes, 8)
    var timescale: Any = null
    var durationMs: Any = null
    var nTracks = 0
    var i = 0L
    var sawMoov = false
    while (i + 8 <= n) {
      val at = i.toInt // i + 8 <= n <= Int.MaxValue, so the cast is exact
      val size32 = be32(bytes, at)
      val hdr = if (size32 == 1L) 16 else 8
      val size: Long = if (size32 == 1L) {
        if (i + 16 > n) return finish(brand, timescale, durationMs, nTracks)
        be64(bytes, at + 8)
      } else if (size32 == 0L) n - i // box runs to end of payload
      else size32
      // be64 is a raw bit pattern: negative, < header, or non-advancing
      // sizes are all malformed geometry — stop and keep what we have.
      if (size < hdr) return finish(brand, timescale, durationMs, nTracks)
      if (fourcc(bytes, at + 4) == "moov") {
        sawMoov = true
        // walk moov children within the declared extent that is present
        val end = math.min(i + size, n.toLong).toInt
        var j = i + hdr
        while (j + 8 <= end) {
          val cat = j.toInt
          val csize32 = be32(bytes, cat)
          val chdr = if (csize32 == 1L) 16 else 8
          val csize: Long = if (csize32 == 1L) {
            if (j + 16 > end) return finish(brand, timescale, durationMs, nTracks)
            be64(bytes, cat + 8)
          } else if (csize32 == 0L) end - j
          else csize32
          if (csize < chdr) return finish(brand, timescale, durationMs, nTracks)
          fourcc(bytes, cat + 4) match {
            case "mvhd" =>
              val body = cat + chdr
              if (body < end) {
                val version = bytes(body) & 0xff
                // FullBox: version+flags (4), then creation/modification
                // (4+4 at v0, 8+8 at v1), timescale (4), duration (4 / 8)
                if (version == 0 && body + 20 <= end) {
                  val ts = be32(bytes, body + 12)
                  val dur = be32(bytes, body + 16)
                  if (ts > 0) { timescale = ts.toInt; durationMs = dur * 1000.0 / ts }
                } else if (version == 1 && body + 32 <= end) {
                  val ts = be32(bytes, body + 20)
                  val dur = be64(bytes, body + 24)
                  if (ts > 0) { timescale = ts.toInt; durationMs = dur * 1000.0 / ts }
                }
              }
            case "trak" => nTracks += 1
            case _ =>
          }
          val jNext = j + csize // Long math: a 2^32 child size advances, not spins
          if (jNext <= j) return finish(brand, timescale, durationMs, nTracks)
          j = jNext
        }
      }
      val iNext = i + size
      if (iNext <= i) return finish(brand, timescale, durationMs, nTracks)
      i = iNext
    }
    if (!sawMoov && nTracks == 0 && timescale == null) finish(brand, null, null, 0)
    else finish(brand, timescale, durationMs, nTracks)
  }

  private def finish(brand: String, ts: Any, dur: Any, tracks: Int): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(brand), ts, dur, tracks))
}

/** struct<major_brand, timescale, duration_ms, n_tracks> parsed from
  * ISO-BMFF (MP4/MOV/M4A) bytes; null for non-MP4 payloads.
  */
case class Mp4Header(child: Expression) extends UnaryExpression {
  override def dataType: DataType = Mp4Header.schema
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Mp4HeaderKernel.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.Mp4HeaderKernel.parse($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Mp4Header {
  val schema: StructType = StructType(Seq(
    StructField("major_brand", StringType),
    StructField("timescale", IntegerType),
    StructField("duration_ms", DoubleType),
    StructField("n_tracks", IntegerType)))

  def apply(content: Column): Column =
    GraftColumnBridge.column(Mp4Header(GraftColumnBridge.expression(content)))
}
