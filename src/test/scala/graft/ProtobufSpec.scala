package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.sources.ProtobufFormat._

/** Protobuf wire format (SURVEY.md §2.1 "formats: protobuf") — the
  * from-scratch codec in graft.sources.ProtobufFormat. Wire-level golden
  * bytes are hand-derived from the PUBLIC encoding spec
  * (developers.google.com/protocol-buffers/docs/encoding), including the
  * doc's own canonical examples (field 1 int32 = 150 → `08 96 01`;
  * field 2 string "testing" → `12 07 74 65 73 74 69 6e 67`), so a real
  * protobuf implementation would produce/accept exactly these bytes.
  */
class ProtobufSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def hex(bs: Array[Byte]): String = bs.map(b => f"$b%02x").mkString(" ")

  test("canonical wire bytes: int32=150 encodes as 08 96 01 (spec example)") {
    val msg = PbMessage(Seq(PbField(1, "a", PInt32)))
    assert(hex(encodeRow(msg, Row(150))) == "08 96 01")
    assert(decodeRow(msg, Array[Byte](0x08, 0x96.toByte, 0x01)) == Row(150))
  }

  test("canonical wire bytes: string field 2 = \"testing\" (spec example)") {
    val msg = PbMessage(Seq(PbField(2, "b", PString)))
    assert(hex(encodeRow(msg, Row("testing"))) == "12 07 74 65 73 74 69 6e 67")
    assert(decodeRow(msg, encodeRow(msg, Row("testing"))) == Row("testing"))
  }

  test("negative int64 encodes as 10-byte two's-complement varint") {
    val msg = PbMessage(Seq(PbField(1, "a", PInt64)))
    // -2 → fe ff ff ff ff ff ff ff ff 01 per the spec's varint rules
    assert(hex(encodeRow(msg, Row(-2L))) == "08 fe ff ff ff ff ff ff ff ff 01")
    assert(decodeRow(msg, encodeRow(msg, Row(-2L))) == Row(-2L))
  }

  test("sint zigzag: -1→1, 1→2, -2147483648→ffffffff (spec table)") {
    val m32 = PbMessage(Seq(PbField(1, "a", PSInt32)))
    assert(hex(encodeRow(m32, Row(-1))) == "08 01")
    assert(hex(encodeRow(m32, Row(1))) == "08 02")
    assert(decodeRow(m32, encodeRow(m32, Row(Int.MinValue))) == Row(Int.MinValue))
    val m64 = PbMessage(Seq(PbField(1, "a", PSInt64)))
    assert(decodeRow(m64, encodeRow(m64, Row(Long.MinValue))) == Row(Long.MinValue))
    assert(hex(encodeRow(m64, Row(-2L))) == "08 03")
  }

  test("proto3 defaults are omitted on the wire and restored on decode") {
    val msg = PbMessage(Seq(
      PbField(1, "i", PInt32), PbField(2, "s", PString), PbField(3, "b", PBool),
      PbField(4, "d", PDouble)))
    assert(encodeRow(msg, Row(0, "", false, 0.0)).isEmpty) // nothing on the wire
    assert(decodeRow(msg, Array.emptyByteArray) == Row(0, "", false, 0.0))
  }

  test("packed repeated varints: [3,270,86942] → 22 06 03 8e 02 9e a7 05 (spec example)") {
    val msg = PbMessage(Seq(PbField(4, "xs", PRepeated(PInt32))))
    assert(hex(encodeRow(msg, Row(Seq(3, 270, 86942)))) == "22 06 03 8e 02 9e a7 05")
    assert(decodeRow(msg, encodeRow(msg, Row(Seq(3, 270, 86942)))) == Row(Seq(3, 270, 86942)))
  }

  test("unpacked repeated scalars decode too (proto2-style wire compat)") {
    val msg = PbMessage(Seq(PbField(1, "xs", PRepeated(PInt64))))
    // two separate tagged varints: tag 08 each
    val bytes = Array[Byte](0x08, 0x05, 0x08, 0x07)
    assert(decodeRow(msg, bytes) == Row(Seq(5L, 7L)))
  }

  test("repeated strings keep empty elements; repeated round trip") {
    val msg = PbMessage(Seq(PbField(1, "ss", PRepeated(PString))))
    val row = Row(Seq("a", "", "bc"))
    assert(decodeRow(msg, encodeRow(msg, row)) == row)
  }

  test("nested messages round trip; absent nested stays null") {
    val inner = PbMessage(Seq(PbField(1, "x", PInt32), PbField(2, "y", PString)))
    val outer = PbMessage(Seq(PbField(1, "id", PInt64), PbField(2, "m", PNested(inner))))
    val row = Row(7L, Row(42, "deep"))
    assert(decodeRow(outer, encodeRow(outer, row)) == row)
    assert(decodeRow(outer, encodeRow(outer, Row(7L, null))) == Row(7L, null))
  }

  test("floats/doubles/bytes/fixed round trip with exact bit patterns") {
    val msg = PbMessage(Seq(
      PbField(1, "f", PFloat), PbField(2, "d", PDouble), PbField(3, "raw", PBytes),
      PbField(4, "fx", PFixed64), PbField(5, "f32", PFixed32)))
    val row = Row(1.5f, -2.25e100, Array[Byte](0, 1, -1), -1L, Int.MinValue)
    val back = decodeRow(msg, encodeRow(msg, row))
    assert(back.getFloat(0) == 1.5f && back.getDouble(1) == -2.25e100)
    assert(back.getAs[Array[Byte]](2).toSeq == Seq[Byte](0, 1, -1))
    assert(back.getLong(3) == -1L && back.getInt(4) == Int.MinValue)
    // double 1.0 → fixed64 LE of 0x3FF0000000000000 (spec example shape)
    val d1 = PbMessage(Seq(PbField(1, "d", PDouble)))
    assert(hex(encodeRow(d1, Row(1.0))) == "09 00 00 00 00 00 00 f0 3f")
  }

  test("unknown fields are skipped by wire type (forward compatibility)") {
    val wide = PbMessage(Seq(
      PbField(1, "a", PInt32), PbField(2, "s", PString), PbField(3, "d", PDouble),
      PbField(4, "xs", PRepeated(PInt32))))
    val narrow = PbMessage(Seq(PbField(2, "s", PString)))
    val bytes = encodeRow(wide, Row(9, "kept", 3.5, Seq(1, 2)))
    assert(decodeRow(narrow, bytes) == Row("kept"))
  }

  test("truncated or overrunning messages fail loudly, never read past their slice") {
    val msg = PbMessage(Seq(PbField(1, "a", PInt64), PbField(2, "d", PDouble)))
    val good = encodeRow(msg, Row(150L, 2.5))
    // cut mid-varint, mid-fixed64, and right after a tag: every prefix
    // that severs a value must throw, not decode garbage (cut=3 is the
    // field-1/field-2 boundary — a VALID message with field 2 defaulted)
    for (cut <- 1 until good.length if cut != 3) {
      val e = intercept[IllegalArgumentException] {
        decodeRow(msg, java.util.Arrays.copyOf(good, cut))
      }
      assert(e.getMessage.contains("truncated") || e.getMessage.contains("overruns"),
        s"cut=$cut: ${e.getMessage}")
    }
    // a nested message whose declared length exceeds its payload must not
    // consume the parent's trailing fields as its own
    val inner = PbMessage(Seq(PbField(1, "x", PInt32)))
    val outer = PbMessage(Seq(PbField(1, "m", PNested(inner)), PbField(2, "y", PInt32)))
    val innerBytes = encodeRow(inner, Row(7))
    val bad = Array[Byte](0x0a, (innerBytes.length + 1).toByte) ++ innerBytes
    intercept[IllegalArgumentException] { decodeRow(outer, bad) }
    // a declared length near 2^31 must hit the loud overrun error, not
    // overflow `pos + n` into an out-of-bounds read
    val strMsg = PbMessage(Seq(PbField(1, "s", PString)))
    val hugeLen = Array[Byte](0x0a, // field 1, wire 2
      0xfa.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0x07, // varint 0x7ffffffa
      'x', 'x')
    val e2 = intercept[IllegalArgumentException] { decodeRow(strMsg, hugeLen) }
    assert(e2.getMessage.contains("overruns"), e2.getMessage)
    // and one past Long truncation territory (2^35): same loud error
    val hugeLen2 = Array[Byte](0x0a,
      0x80.toByte, 0x80.toByte, 0x80.toByte, 0x80.toByte, 0x80.toByte, 0x01) // 2^35
    val e3 = intercept[IllegalArgumentException] { decodeRow(strMsg, hugeLen2) }
    assert(e3.getMessage.contains("overruns"), e3.getMessage)
  }

  test("protobuf decode runs on a stream (Kafka-shaped binary payload pipeline)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val msg = PbMessage(Seq(
      PbField(1, "id", PInt64), PbField(2, "s", PString), PbField(3, "d", PDouble)))
    val sample = Seq((1L, "a", 1.5), (2L, "", -2.25), (3L, "c", 0.0)).toDF("id", "s", "d")
    val payloads = encodeProtobuf(sample, msg).select("proto").as[Array[Byte]].collect()
    val input = MemoryStream[Array[Byte]]
    val decoded = decodeProtobuf(
      input.toDF().withColumnRenamed("value", "proto"), "proto", msg)
    val q = decoded.writeStream.outputMode("append").format("memory")
      .queryName("proto_stream").start()
    try {
      payloads.grouped(2).foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val got = spark.table("proto_stream").collect().map(_.toSeq).toSet
      assert(got == sample.collect().map(_.toSeq).toSet)
    } finally q.stop()
  }

  test("DataFrame round trip over lineitem columns matches the source") {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_linestatus")
      .limit(500)
    val msg = PbMessage(Seq(
      PbField(1, "l_orderkey", PInt64), PbField(2, "l_linenumber", PInt32),
      PbField(3, "l_quantity", PDouble), PbField(4, "l_returnflag", PString),
      PbField(5, "l_linestatus", PString)))
    val src = li.withColumn("l_orderkey", li("l_orderkey").cast("long"))
      .withColumn("l_linenumber", li("l_linenumber").cast("int"))
      .withColumn("l_quantity", li("l_quantity").cast("double"))
    val back = roundTrip(src, msg)
    val a = src.collect().map(_.toSeq).toSet
    val b = back.collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
