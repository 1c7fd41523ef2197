package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import scala.jdk.CollectionConverters._

/** Avro record format over binary payload columns (SURVEY.md §2.1
  * "formats: avro") — the Kafka-style wire shape: each row carries one
  * binary-encoded Avro record; the writer schema travels out-of-band as
  * JSON. Built directly on avro-core (on Spark's runtime classpath); the
  * spark-avro CONNECTOR jar is absent from this image, so the decode is a
  * mapPartitions kernel with per-partition reader/decoder reuse — the
  * same amortization the connector's deserializer performs.
  *
  * Supported Avro types ([U] flink-formats/flink-avro
  * AvroRowDataDeserializationSchema's type matrix): boolean, int, long,
  * float, double, string, bytes; nested RECORD (→ struct, avro field
  * order), ARRAY (→ array), MAP (→ map<string, T> — avro map keys are
  * strings); the `date` / `timestamp-millis` / `timestamp-micros`
  * logical types (→ DATE / TIMESTAMP); and nullable `[null, T]` unions
  * of all of the above at any nesting depth. Struct values on the
  * encode side must carry fields in avro field order (the order
  * [[sparkSchema]] produces).
  *
  * protobuf has no runtime on this classpath either (only shaded
  * org.sparkproject.connect.protobuf classes) — see [[ProtobufFormat]]
  * for the from-scratch wire-format codec that covers it.
  */
object AvroFormat {

  /** Spark schema equivalent of a flat Avro record schema. */
  def sparkSchema(avroJson: String): StructType = {
    val rec = new Schema.Parser().parse(avroJson)
    require(rec.getType == Schema.Type.RECORD, "top-level Avro schema must be a record")
    StructType(rec.getFields.asScala.toSeq.map { f =>
      val (t, nullable) = fieldType(f.schema())
      StructField(f.name(), t, nullable)
    })
  }

  /** Spark schema → Avro record-schema JSON — the inverse of
    * [[sparkSchema]], the derivation Flink's avro format applies to a
    * table schema: nullable fields become `["null", T]` unions, dates
    * and timestamps carry their logical types.
    */
  def avroJson(schema: StructType, recordName: String = "record"): String = {
    var nested = 0
    def rec(st: StructType, name: String): String = {
      val fs = st.fields.toSeq.map(f =>
        s"""{"name": "${f.name}", "type": ${tpe(f.dataType, f.nullable)}}""")
      s"""{"type": "record", "name": "$name", "fields": [${fs.mkString(", ")}]}"""
    }
    def tpe(dt: DataType, nullable: Boolean): String = {
      val base = dt match {
        case BooleanType => "\"boolean\""
        case IntegerType | ShortType | ByteType => "\"int\""
        case LongType => "\"long\""
        case FloatType => "\"float\""
        case DoubleType => "\"double\""
        case StringType => "\"string\""
        case BinaryType => "\"bytes\""
        case DateType => """{"type": "int", "logicalType": "date"}"""
        case TimestampType => """{"type": "long", "logicalType": "timestamp-micros"}"""
        case st: StructType => nested += 1; rec(st, s"${recordName}_n$nested")
        case ArrayType(et, en) => s"""{"type": "array", "items": ${tpe(et, en)}}"""
        case MapType(StringType, vt, vn) => s"""{"type": "map", "values": ${tpe(vt, vn)}}"""
        case other => throw new IllegalArgumentException(
          s"no Avro mapping for Spark type ${other.sql}")
      }
      if (nullable) s"""["null", $base]""" else base
    }
    rec(schema, recordName)
  }

  private def logicalName(s: Schema): String =
    Option(s.getLogicalType).map(_.getName).orNull

  private def fieldType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.toSeq
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"only [null, T] unions supported, got $s")
      (fieldType(nonNull.head)._1, true)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT if logicalName(s) == "date" => (DateType, false)
    case Schema.Type.INT     => (IntegerType, false)
    case Schema.Type.LONG
        if logicalName(s) == "timestamp-millis" ||
          logicalName(s) == "timestamp-micros" => (TimestampType, false)
    case Schema.Type.LONG    => (LongType, false)
    case Schema.Type.FLOAT   => (FloatType, false)
    case Schema.Type.DOUBLE  => (DoubleType, false)
    case Schema.Type.STRING  => (StringType, false)
    case Schema.Type.BYTES   => (BinaryType, false)
    case Schema.Type.RECORD =>
      (StructType(s.getFields.asScala.toSeq.map { f =>
        val (t, n) = fieldType(f.schema())
        StructField(f.name(), t, n)
      }), false)
    case Schema.Type.ARRAY =>
      val (et, en) = fieldType(s.getElementType)
      (ArrayType(et, containsNull = en), false)
    case Schema.Type.MAP =>
      val (vt, vn) = fieldType(s.getValueType)
      (MapType(StringType, vt, valueContainsNull = vn), false)
    case other => throw new IllegalArgumentException(s"unsupported Avro type $other")
  }

  /** Decode a binary Avro-record column into payload columns (appended
    * after the input's other columns). Reader, record holder, and decoder
    * are reused across each partition.
    */
  def decodeAvro(df: DataFrame, binaryCol: String, avroJson: String): DataFrame = {
    val payload = sparkSchema(avroJson)
    val outSchema = StructType(
      df.schema.fields.filterNot(_.name == binaryCol) ++ payload.fields)
    val keepIdx = df.schema.fields.zipWithIndex.collect {
      case (f, i) if f.name != binaryCol => i
    }
    val binIdx = df.schema.fieldIndex(binaryCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(avroJson)
      val reader = new GenericDatumReader[GenericRecord](schema)
      var decoder: org.apache.avro.io.BinaryDecoder = null
      var record: GenericRecord = null
      val fields = schema.getFields.asScala.toSeq
      rows.map { r =>
        decoder = DecoderFactory.get().binaryDecoder(r.getAs[Array[Byte]](binIdx), decoder)
        record = reader.read(record, decoder)
        val vals = fields.map(f => fromAvro(record.get(f.pos()), f.schema()))
        Row.fromSeq(keepIdx.toSeq.map(r.get) ++ vals)
      }
    }(enc)
  }

  /** Encode the given columns into one binary Avro-record column named
    * `avro` (other columns pass through).
    */
  def encodeAvro(df: DataFrame, avroJson: String): DataFrame = {
    val payload = sparkSchema(avroJson)
    val names = payload.fieldNames.toSeq
    val keep = df.schema.fieldNames.filterNot(names.contains).toSeq
    val outSchema = StructType(
      keep.map(n => df.schema(n)) :+ StructField("avro", BinaryType, nullable = false))
    val idx = names.map(df.schema.fieldIndex)
    val keepIdx = keep.map(df.schema.fieldIndex)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(avroJson)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      val baos = new java.io.ByteArrayOutputStream()
      var encoder: org.apache.avro.io.BinaryEncoder = null
      val fields = schema.getFields.asScala.toSeq
      rows.map { r =>
        val rec = new GenericData.Record(schema)
        fields.zip(idx).foreach { case (f, i) => rec.put(f.pos(), toAvro(r.get(i), f.schema())) }
        baos.reset()
        encoder = EncoderFactory.get().binaryEncoder(baos, encoder)
        writer.write(rec, encoder)
        encoder.flush()
        Row.fromSeq(keepIdx.map(r.get) :+ baos.toByteArray)
      }
    }(enc)
  }

  private def nonNullBranch(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    else s

  /** Avro runtime value → Spark external value, schema-directed so
    * nested records/arrays/maps and logical types convert at any depth.
    */
  private def fromAvro(v: Any, s0: Schema): Any = {
    if (v == null) return null
    val s = nonNullBranch(s0)
    s.getType match {
      case Schema.Type.RECORD =>
        val rec = v.asInstanceOf[GenericRecord]
        Row.fromSeq(s.getFields.asScala.toSeq.map(f => fromAvro(rec.get(f.pos()), f.schema())))
      case Schema.Type.ARRAY =>
        v.asInstanceOf[java.util.Collection[_]].asScala.toSeq
          .map(fromAvro(_, s.getElementType))
      case Schema.Type.MAP =>
        v.asInstanceOf[java.util.Map[_, _]].asScala
          .map { case (k, x) => k.toString -> fromAvro(x, s.getValueType) }.toMap
      case Schema.Type.INT if logicalName(s) == "date" =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
      case Schema.Type.LONG if logicalName(s) == "timestamp-millis" =>
        new java.sql.Timestamp(v.asInstanceOf[Long])
      case Schema.Type.LONG if logicalName(s) == "timestamp-micros" =>
        val us = v.asInstanceOf[Long]
        val t = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
        t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
        t
      case _ => v match {
        case u: org.apache.avro.util.Utf8 => u.toString
        case b: java.nio.ByteBuffer =>
          val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
        case other => other
      }
    }
  }

  /** Spark external value → Avro runtime value (inverse of [[fromAvro]];
    * struct fields must be in avro field order).
    */
  private def toAvro(v: Any, s0: Schema): Any = {
    if (v == null) return null
    val s = nonNullBranch(s0)
    s.getType match {
      case Schema.Type.RECORD =>
        val row = v.asInstanceOf[Row]
        val rec = new GenericData.Record(s)
        s.getFields.asScala.foreach(f => rec.put(f.pos(), toAvro(row.get(f.pos()), f.schema())))
        rec
      case Schema.Type.ARRAY =>
        v.asInstanceOf[scala.collection.Seq[_]]
          .map(toAvro(_, s.getElementType)).asJava
      case Schema.Type.MAP =>
        val m = new java.util.HashMap[String, Any]()
        v.asInstanceOf[scala.collection.Map[_, _]]
          .foreach { case (k, x) => m.put(k.toString, toAvro(x, s.getValueType)) }
        m
      case Schema.Type.INT if logicalName(s) == "date" =>
        v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt
      case Schema.Type.LONG if logicalName(s) == "timestamp-millis" =>
        v.asInstanceOf[java.sql.Timestamp].getTime
      case Schema.Type.LONG if logicalName(s) == "timestamp-micros" =>
        val t = v.asInstanceOf[java.sql.Timestamp]
        Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
      case _ => v match {
        case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
        case other => other
      }
    }
  }

  /** Convenience: round-trip a DataFrame's payload columns through the
    * Avro wire format (spec hook).
    */
  def roundTrip(df: DataFrame, avroJson: String): DataFrame =
    decodeAvro(encodeAvro(df, avroJson).select(col("avro")), "avro", avroJson)
}
