package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM audio kernel for the multimodal column convention (the
  * audio sibling of [[ImageHeaderKernel]]): typed metadata straight
  * from a WAV container's RIFF header — no audio library exists in the
  * container, and none is needed to read the public RIFF/WAVE layout.
  * The expression runs inside whole-stage codegen like any builtin;
  * payload DECODE beyond the header stays an opaque-binary concern
  * ([[graft.operators.Multimodal]] batching, chunk sampling).
  */
object WavHeaderKernel {
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** (codec, channels, sample_rate, bits, n_frames, duration_ms) from a
    * RIFF/WAVE header, or null when the payload is not a WAV. Chunks are
    * walked (word-aligned) to the `fmt ` and `data` chunks; frames =
    * data bytes / block align, duration from the declared sample rate.
    */
  def parse(bytes: Array[Byte]): InternalRow = {
    if (bytes == null) return null
    val n = bytes.length
    if (n < 44 || bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' ||
      bytes(3) != 'F' || bytes(8) != 'W' || bytes(9) != 'A' || bytes(10) != 'V' ||
      bytes(11) != 'E') return null
    // crawl-safety: offsets advance in Long arithmetic — an unsigned
    // 32-bit chunk size truncated to Int could make the advance zero
    // (task spins) or negative (walks backwards); any non-advancing
    // geometry aborts to null instead
    var i = 12L
    var fmtTag = -1; var channels = -1; var rate = -1L; var bits = -1
    var blockAlign = -1; var dataLen = -1L
    while (i + 8 <= n && (fmtTag < 0 || dataLen < 0)) {
      val at = i.toInt // i + 8 <= n, so the cast is exact
      val size = le32(bytes, at + 4)
      val body = at + 8
      if (bytes(at) == 'f' && bytes(at + 1) == 'm' && bytes(at + 2) == 't' &&
        bytes(at + 3) == ' ') {
        if (size < 16 || body + 16 > n) return null // truncated fmt chunk
        fmtTag = le16(bytes, body)
        channels = le16(bytes, body + 2)
        rate = le32(bytes, body + 4)
        blockAlign = le16(bytes, body + 12)
        bits = le16(bytes, body + 14)
      } else if (bytes(at) == 'd' && bytes(at + 1) == 'a' && bytes(at + 2) == 't' &&
        bytes(at + 3) == 'a') {
        dataLen = size
      }
      val next = body.toLong + size + (size & 1L) // chunks are word-aligned
      if (next <= i) return null // malformed: non-advancing chunk geometry
      i = next
    }
    if (fmtTag < 0 || dataLen < 0 || channels <= 0 || rate <= 0 ||
      rate > Int.MaxValue || blockAlign <= 0)
      return null
    val codec = fmtTag match {
      case 1 => "pcm"
      case 3 => "float"
      case 6 => "alaw"
      case 7 => "mulaw"
      case other => s"fmt_$other"
    }
    val frames = dataLen / blockAlign
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(codec), channels, rate.toInt, bits, frames,
      frames * 1000.0 / rate))
  }
}

/** struct<codec, channels, sample_rate, bits, n_frames, duration_ms>
  * parsed from WAV bytes; null for non-WAV payloads.
  */
case class WavHeader(child: Expression) extends UnaryExpression {
  override def dataType: DataType = WavHeader.schema
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    WavHeaderKernel.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.WavHeaderKernel.parse($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WavHeader {
  val schema: StructType = StructType(Seq(
    StructField("codec", StringType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bits", IntegerType),
    StructField("n_frames", LongType),
    StructField("duration_ms", DoubleType)))

  def apply(content: Column): Column =
    GraftColumnBridge.column(WavHeader(GraftColumnBridge.expression(content)))
}

/** Signal-level WAV statistics for audio curation (the loudness /
  * silence / clipping triage a speech-data pipeline runs before paying
  * for transcription): RMS and peak amplitude (full-scale normalized),
  * silence fraction (|sample| ≤ 1% FS ≈ −40 dBFS), clipping fraction
  * (rail samples) over ALL interleaved channels of a 16-bit PCM `data`
  * chunk. Pure-JVM single pass over the payload bytes inside codegen —
  * no audio library, no shuffle; non-WAV / non-PCM-16 payloads → null
  * (header-only metadata still comes from [[WavHeader]]).
  */
object WavStatsKernel {
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  def stats(bytes: Array[Byte]): InternalRow = {
    if (bytes == null) return null
    val n = bytes.length
    if (n < 44 || bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' ||
      bytes(3) != 'F' || bytes(8) != 'W' || bytes(9) != 'A' || bytes(10) != 'V' ||
      bytes(11) != 'E') return null
    var i = 12L
    var fmtTag = -1; var bits = -1
    var dataOff = -1L; var dataLen = -1L
    while (i + 8 <= n && (fmtTag < 0 || dataOff < 0)) {
      val at = i.toInt
      val size = le32(bytes, at + 4)
      val body = at + 8
      if (bytes(at) == 'f' && bytes(at + 1) == 'm' && bytes(at + 2) == 't' &&
        bytes(at + 3) == ' ') {
        if (size < 16 || body + 16 > n) return null
        fmtTag = le16(bytes, body)
        bits = le16(bytes, body + 14)
      } else if (bytes(at) == 'd' && bytes(at + 1) == 'a' && bytes(at + 2) == 't' &&
        bytes(at + 3) == 'a') {
        dataOff = body
        dataLen = size
      }
      val next = body.toLong + size + (size & 1L)
      if (next <= i) return null
      i = next
    }
    if (fmtTag != 1 || bits != 16 || dataOff < 0) return null
    // clamp to the payload actually present (a truncated sample is ignored)
    val end = math.min(dataOff + dataLen, n.toLong)
    var p = dataOff
    var count = 0L
    var sumSq = 0.0
    var peak = 0
    var silent = 0L
    var clipped = 0L
    while (p + 2 <= end) {
      val at = p.toInt
      val s = (le16(bytes, at) << 16) >> 16 // sign-extend
      val a = math.abs(s)
      if (a > peak) peak = a
      if (a <= 327) silent += 1
      if (s == 32767 || s == -32768) clipped += 1
      sumSq += s.toDouble * s.toDouble
      count += 1
      p += 2
    }
    if (count == 0) return null
    new GenericInternalRow(Array[Any](
      math.sqrt(sumSq / count) / 32768.0, peak / 32768.0,
      silent.toDouble / count, clipped.toDouble / count, count))
  }
}

/** struct<rms, peak, silence_frac, clip_frac, n_samples> over a 16-bit
  * PCM WAV payload; null for other codecs/containers.
  */
case class WavStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = WavStats.schema
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    WavStatsKernel.stats(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.WavStatsKernel.stats($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WavStats {
  val schema: StructType = StructType(Seq(
    StructField("rms", DoubleType),
    StructField("peak", DoubleType),
    StructField("silence_frac", DoubleType),
    StructField("clip_frac", DoubleType),
    StructField("n_samples", LongType)))

  def apply(content: Column): Column =
    GraftColumnBridge.column(WavStats(GraftColumnBridge.expression(content)))
}
