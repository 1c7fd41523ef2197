package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import scala.collection.mutable.ArrayBuffer

/** Protobuf record format over binary payload columns (SURVEY.md §2.1
  * "formats: protobuf" — the reference's flink-protobuf row format, [U]
  * flink-formats/flink-protobuf PbRowDataDeserializationSchema).
  *
  * No protobuf runtime exists on this image (only shaded
  * org.sparkproject.connect.protobuf classes), so this is a from-scratch
  * implementation of the PUBLIC protobuf wire format
  * (developers.google.com/protocol-buffers/docs/encoding): tag =
  * varint((field_number << 3) | wire_type); wire types 0 = varint,
  * 1 = 64-bit little-endian, 2 = length-delimited, 5 = 32-bit
  * little-endian; base-128 varints; zigzag for sint; negative int32/64
  * as 10-byte two's-complement varints; packed repeated scalars.
  *
  * Message shape travels as a Scala descriptor ([[PbMessage]]) — the
  * analog of a compiled .proto descriptor. proto3 semantics: defaults
  * are omitted on encode and restored on decode; unknown fields are
  * skipped by wire type (forward compatibility); repeated scalars decode
  * from both packed and unpacked encodings, encode packed.
  *
  * Like [[AvroFormat]], decode/encode are mapPartitions kernels with
  * per-partition buffer reuse — the same amortization a connector's
  * deserializer performs; each row is independent so the operator is
  * embarrassingly parallel at any scale.
  */
object ProtobufFormat {

  sealed trait PbType
  case object PInt32 extends PbType // varint, two's complement
  case object PInt64 extends PbType
  case object PSInt32 extends PbType // varint, zigzag
  case object PSInt64 extends PbType
  case object PBool extends PbType
  case object PFloat extends PbType // fixed 32-bit LE
  case object PDouble extends PbType // fixed 64-bit LE
  case object PFixed32 extends PbType // unsigned fixed → IntegerType (bit pattern)
  case object PFixed64 extends PbType
  case object PString extends PbType
  case object PBytes extends PbType
  final case class PNested(msg: PbMessage) extends PbType
  final case class PRepeated(elem: PbType) extends PbType {
    require(!elem.isInstanceOf[PRepeated], "repeated of repeated is not a protobuf shape")
  }

  final case class PbField(number: Int, name: String, tpe: PbType) {
    require(number >= 1 && number < (1 << 29), s"field number $number out of range")
  }
  final case class PbMessage(fields: Seq[PbField]) {
    require(fields.map(_.number).distinct.size == fields.size, "duplicate field numbers")
    val byNumber: Map[Int, PbField] = fields.map(f => f.number -> f).toMap
    /** field number → position in `fields` (hoisted out of the per-row decode loop). */
    val indexByNumber: Map[Int, Int] =
      fields.zipWithIndex.map { case (f, i) => f.number -> i }.toMap
  }

  /** Spark schema equivalent of a message descriptor. All fields nullable
    * on the Spark side (proto3 presence is not tracked; absent = default).
    */
  def sparkSchema(msg: PbMessage): StructType =
    StructType(msg.fields.map(f => StructField(f.name, sparkType(f.tpe), nullable = true)))

  private def sparkType(t: PbType): DataType = t match {
    case PInt32 | PSInt32 | PFixed32 => IntegerType
    case PInt64 | PSInt64 | PFixed64 => LongType
    case PBool                       => BooleanType
    case PFloat                      => FloatType
    case PDouble                     => DoubleType
    case PString                     => StringType
    case PBytes                      => BinaryType
    case PNested(m)                  => sparkSchema(m)
    case PRepeated(e)                => ArrayType(sparkType(e))
  }

  // ---- wire primitives -----------------------------------------------

  private final class Writer {
    private var buf = new Array[Byte](256)
    var len = 0
    def reset(): Unit = len = 0
    private def ensure(n: Int): Unit =
      if (len + n > buf.length) {
        val nb = new Array[Byte](math.max(buf.length * 2, len + n))
        System.arraycopy(buf, 0, nb, 0, len); buf = nb
      }
    def byte(b: Int): Unit = { ensure(1); buf(len) = b.toByte; len += 1 }
    def varint(v0: Long): Unit = {
      var v = v0
      ensure(10)
      while ((v & ~0x7fL) != 0) { buf(len) = ((v & 0x7f) | 0x80).toByte; len += 1; v >>>= 7 }
      buf(len) = v.toByte; len += 1
    }
    def fixed32(v: Int): Unit = {
      ensure(4)
      buf(len) = v.toByte; buf(len + 1) = (v >>> 8).toByte
      buf(len + 2) = (v >>> 16).toByte; buf(len + 3) = (v >>> 24).toByte
      len += 4
    }
    def fixed64(v: Long): Unit = { fixed32(v.toInt); fixed32((v >>> 32).toInt) }
    def bytes(b: Array[Byte]): Unit = { ensure(b.length); System.arraycopy(b, 0, buf, len, b.length); len += b.length }
    def tag(number: Int, wire: Int): Unit = varint((number.toLong << 3) | wire)
    def toBytes: Array[Byte] = java.util.Arrays.copyOf(buf, len)
  }

  private final class Reader(val b: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    // every read is bounds-checked against `end` (the enclosing
    // sub-message slice, not b.length): a truncated or malformed nested
    // message must fail loudly, not read the parent's bytes
    private def need(n: Int): Unit =
      if (pos + n > end) throw new IllegalArgumentException(
        s"truncated protobuf: need $n byte(s) at offset $pos, message ends at $end")
    def varint(): Long = {
      var shift = 0; var v = 0L
      while (shift < 64) {
        need(1)
        val x = b(pos); pos += 1
        v |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) return v
        shift += 7
      }
      throw new IllegalArgumentException("malformed varint")
    }
    def fixed32(): Int = {
      need(4)
      val v = (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8) |
        ((b(pos + 2) & 0xff) << 16) | ((b(pos + 3) & 0xff) << 24)
      pos += 4; v
    }
    def fixed64(): Long = (fixed32() & 0xffffffffL) | (fixed32().toLong << 32)
    def lenDelim(): (Int, Int) = { // (start, end) of the payload
      // check on the Long varint: a declared length near 2^31 would
      // overflow `pos + n` in Int and slip past the bound into an
      // out-of-bounds read instead of this loud error
      val nl = varint()
      require(nl >= 0 && nl <= (end - pos).toLong,
        "length-delimited field overruns buffer")
      val s = pos; pos += nl.toInt; (s, pos)
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => need(8); pos += 8
      case 2 => lenDelim()
      case 5 => need(4); pos += 4
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }

  private def zigzag32(n: Int): Int = (n << 1) ^ (n >> 31)
  private def unzigzag32(n: Int): Int = (n >>> 1) ^ -(n & 1)
  private def zigzag64(n: Long): Long = (n << 1) ^ (n >> 63)
  private def unzigzag64(n: Long): Long = (n >>> 1) ^ -(n & 1L)

  private def wireType(t: PbType): Int = t match {
    case PInt32 | PInt64 | PSInt32 | PSInt64 | PBool => 0
    case PDouble | PFixed64                          => 1
    case PFloat | PFixed32                           => 5
    case PString | PBytes | _: PNested               => 2
    case PRepeated(e)                                => 2 // packed (scalars) or per-element (len-delim elems)
  }

  private def isDefault(t: PbType, v: Any): Boolean = v match {
    case null => true
    case _ => t match {
        case PInt32 | PSInt32 | PFixed32 => v == 0
        case PInt64 | PSInt64 | PFixed64 => v == 0L
        case PBool                       => v == false
        case PFloat                      => v == 0.0f
        case PDouble                     => v == 0.0d
        case PString                     => v == ""
        case PBytes                      => v.asInstanceOf[Array[Byte]].isEmpty
        case _                           => false // nested/repeated handled by caller
      }
  }

  // ---- encode ---------------------------------------------------------

  private def writeScalarPayload(w: Writer, t: PbType, v: Any): Unit = t match {
    case PInt32  => w.varint(v.asInstanceOf[Int].toLong)
    case PInt64  => w.varint(v.asInstanceOf[Long])
    case PSInt32 => w.varint(zigzag32(v.asInstanceOf[Int]).toLong & 0xffffffffL)
    case PSInt64 => w.varint(zigzag64(v.asInstanceOf[Long]))
    case PBool   => w.varint(if (v.asInstanceOf[Boolean]) 1L else 0L)
    case PFloat  => w.fixed32(java.lang.Float.floatToIntBits(v.asInstanceOf[Float]))
    case PDouble => w.fixed64(java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]))
    case PFixed32 => w.fixed32(v.asInstanceOf[Int])
    case PFixed64 => w.fixed64(v.asInstanceOf[Long])
    case other   => throw new IllegalArgumentException(s"not a packed-able scalar: $other")
  }

  private def writeField(w: Writer, f: PbField, v: Any): Unit = f.tpe match {
    case _ if v == null => // absent
    case t @ (PString | PBytes) =>
      val bytes = t match {
        case PString => v.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
        case _       => v.asInstanceOf[Array[Byte]]
      }
      if (bytes.nonEmpty) { w.tag(f.number, 2); w.varint(bytes.length.toLong); w.bytes(bytes) }
    case PNested(m) =>
      val inner = new Writer
      writeMessage(inner, m, v.asInstanceOf[Row])
      w.tag(f.number, 2); w.varint(inner.len.toLong); w.bytes(inner.toBytes)
    case PRepeated(e) =>
      val xs = v match {
        case s: scala.collection.Seq[_] => s
        case a: Array[_]                => a.toSeq
      }
      if (xs.nonEmpty) e match {
        // unpacked, one tag per element; every element encodes, even a
        // default-valued one (repeated has no default-omission)
        case PString =>
          xs.foreach { x =>
            val b = x.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
            w.tag(f.number, 2); w.varint(b.length.toLong); w.bytes(b)
          }
        case PBytes =>
          xs.foreach { x =>
            val b = x.asInstanceOf[Array[Byte]]
            w.tag(f.number, 2); w.varint(b.length.toLong); w.bytes(b)
          }
        case PNested(m) =>
          xs.foreach { x =>
            val inner = new Writer
            writeMessage(inner, m, x.asInstanceOf[Row])
            w.tag(f.number, 2); w.varint(inner.len.toLong); w.bytes(inner.toBytes)
          }
        case scalar => // packed
          val inner = new Writer
          xs.foreach(x => writeScalarPayload(inner, scalar, x))
          w.tag(f.number, 2); w.varint(inner.len.toLong); w.bytes(inner.toBytes)
      }
    case t =>
      if (!isDefault(t, v)) { w.tag(f.number, wireType(t)); writeScalarPayload(w, t, v) }
  }

  private def writeMessage(w: Writer, msg: PbMessage, row: Row): Unit =
    msg.fields.zipWithIndex.foreach { case (f, i) => writeField(w, f, row.get(i)) }

  def encodeRow(msg: PbMessage, row: Row): Array[Byte] = {
    val w = new Writer
    writeMessage(w, msg, row)
    w.toBytes
  }

  /** Per-partition variant: reuse one growable buffer across rows. */
  private def encodeRowReusing(w: Writer, msg: PbMessage, row: Row): Array[Byte] = {
    w.reset()
    writeMessage(w, msg, row)
    w.toBytes
  }

  // ---- decode ---------------------------------------------------------

  private def readScalar(r: Reader, t: PbType, wire: Int): Any = t match {
    case PInt32  => r.varint().toInt
    case PInt64  => r.varint()
    case PSInt32 => unzigzag32(r.varint().toInt)
    case PSInt64 => unzigzag64(r.varint())
    case PBool   => r.varint() != 0L
    case PFloat  => java.lang.Float.intBitsToFloat(r.fixed32())
    case PDouble => java.lang.Double.longBitsToDouble(r.fixed64())
    case PFixed32 => r.fixed32()
    case PFixed64 => r.fixed64()
    case other   => throw new IllegalArgumentException(s"not a scalar: $other")
  }

  private def defaultValue(t: PbType): Any = t match {
    case PInt32 | PSInt32 | PFixed32 => 0
    case PInt64 | PSInt64 | PFixed64 => 0L
    case PBool                       => false
    case PFloat                      => 0.0f
    case PDouble                     => 0.0d
    case PString                     => ""
    case PBytes                      => Array.emptyByteArray
    case PNested(m)                  => null // absent message stays null
    case PRepeated(_)                => Seq.empty
  }

  def decodeMessage(msg: PbMessage, bytes: Array[Byte], from: Int, to: Int): Row = {
    val r = new Reader(bytes, from, to)
    val idx = msg.indexByNumber
    val vals = new Array[Any](msg.fields.size)
    val reps = scala.collection.mutable.Map.empty[Int, ArrayBuffer[Any]]
    while (r.hasMore) {
      val key = r.varint()
      val number = (key >>> 3).toInt
      val wire = (key & 7).toInt
      msg.byNumber.get(number) match {
        case None => r.skip(wire) // unknown field: forward-compatible skip
        case Some(f) =>
          val i = idx(number)
          f.tpe match {
            case PString =>
              val (s, e) = r.lenDelim()
              vals(i) = new String(bytes, s, e - s, java.nio.charset.StandardCharsets.UTF_8)
            case PBytes =>
              val (s, e) = r.lenDelim()
              vals(i) = java.util.Arrays.copyOfRange(bytes, s, e)
            case PNested(m) =>
              val (s, e) = r.lenDelim()
              vals(i) = decodeMessage(m, bytes, s, e)
            case PRepeated(e) =>
              val buf = reps.getOrElseUpdate(i, ArrayBuffer.empty[Any])
              e match {
                case PString =>
                  val (s, en) = r.lenDelim()
                  buf += new String(bytes, s, en - s, java.nio.charset.StandardCharsets.UTF_8)
                case PBytes =>
                  val (s, en) = r.lenDelim()
                  buf += java.util.Arrays.copyOfRange(bytes, s, en)
                case PNested(m) =>
                  val (s, en) = r.lenDelim()
                  buf += decodeMessage(m, bytes, s, en)
                case scalar if wire == 2 => // packed
                  val (s, en) = r.lenDelim()
                  val rr = new Reader(bytes, s, en)
                  while (rr.hasMore) buf += readScalar(rr, scalar, wireType(scalar))
                case scalar => // unpacked element
                  buf += readScalar(r, scalar, wire)
              }
            case scalar => vals(i) = readScalar(r, scalar, wire)
          }
      }
    }
    msg.fields.zipWithIndex.foreach { case (f, i) =>
      if (reps.contains(i)) vals(i) = reps(i).toSeq
      else if (vals(i) == null) vals(i) = defaultValue(f.tpe)
    }
    Row.fromSeq(vals.toSeq)
  }

  def decodeRow(msg: PbMessage, bytes: Array[Byte]): Row =
    decodeMessage(msg, bytes, 0, bytes.length)

  // ---- DataFrame surface (mirrors AvroFormat) -------------------------

  /** Decode a binary protobuf column into payload columns (appended after
    * the input's other columns).
    */
  def decodeProtobuf(df: DataFrame, binaryCol: String, msg: PbMessage): DataFrame = {
    val payload = sparkSchema(msg)
    val outSchema = StructType(df.schema.fields.filterNot(_.name == binaryCol) ++ payload.fields)
    val keepIdx = df.schema.fields.zipWithIndex.collect { case (f, i) if f.name != binaryCol => i }.toSeq
    val binIdx = df.schema.fieldIndex(binaryCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val decoded = decodeRow(msg, r.getAs[Array[Byte]](binIdx))
        Row.fromSeq(keepIdx.map(r.get) ++ decoded.toSeq)
      }
    }(enc)
  }

  /** Encode the descriptor's columns into one binary column named `proto`
    * (other columns pass through).
    */
  def encodeProtobuf(df: DataFrame, msg: PbMessage): DataFrame = {
    val names = msg.fields.map(_.name)
    val keep = df.schema.fieldNames.filterNot(names.contains).toSeq
    val outSchema = StructType(
      keep.map(n => df.schema(n)) :+ StructField("proto", BinaryType, nullable = false))
    val idx = names.map(df.schema.fieldIndex)
    val keepIdx = keep.map(df.schema.fieldIndex)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      val w = new Writer
      rows.map { r =>
        val payload = Row.fromSeq(idx.map(r.get))
        Row.fromSeq(keepIdx.map(r.get) :+ encodeRowReusing(w, msg, payload))
      }
    }(enc)
  }

  /** Round-trip a DataFrame's payload columns through the wire format
    * (spec + query hook).
    */
  def roundTrip(df: DataFrame, msg: PbMessage): DataFrame =
    decodeProtobuf(encodeProtobuf(df, msg).select(col("proto")), "proto", msg)
}
