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
  * Supported Avro types: boolean, int, long, float, double, string,
  * bytes, and nullable unions `[null, T]` of those — the flat-record
  * class the reference's avro table format decodes
  * ([U] flink-formats/flink-avro AvroRowDataDeserializationSchema).
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

  private def fieldType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.toSeq
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"only [null, T] unions supported, got $s")
      (fieldType(nonNull.head)._1, true)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT     => (IntegerType, false)
    case Schema.Type.LONG    => (LongType, false)
    case Schema.Type.FLOAT   => (FloatType, false)
    case Schema.Type.DOUBLE  => (DoubleType, false)
    case Schema.Type.STRING  => (StringType, false)
    case Schema.Type.BYTES   => (BinaryType, false)
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
        val vals = fields.map(f => fromAvroValue(record.get(f.pos())))
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
        fields.zip(idx).foreach { case (f, i) => rec.put(f.pos(), toAvroValue(r.get(i))) }
        baos.reset()
        encoder = EncoderFactory.get().binaryEncoder(baos, encoder)
        writer.write(rec, encoder)
        encoder.flush()
        Row.fromSeq(keepIdx.map(r.get) :+ baos.toByteArray)
      }
    }(enc)
  }

  private def fromAvroValue(v: Any): Any = v match {
    case u: org.apache.avro.util.Utf8 => u.toString
    case b: java.nio.ByteBuffer =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case other => other
  }

  private def toAvroValue(v: Any): Any = v match {
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case other => other
  }

  /** Convenience: round-trip a DataFrame's payload columns through the
    * Avro wire format (spec hook).
    */
  def roundTrip(df: DataFrame, avroJson: String): DataFrame =
    decodeAvro(encodeAvro(df, avroJson).select(col("avro")), "avro", avroJson)
}
