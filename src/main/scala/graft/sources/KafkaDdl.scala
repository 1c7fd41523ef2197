package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Kafka-shaped connector DDL, translated at the PLAN level — the
  * reference's `'connector' = 'kafka'` / `'upsert-kafka'` table options
  * ([U] flink-connector-kafka KafkaConnectorOptions; externalized from
  * core in 1.19, but present in nearly every real deployment script).
  *
  * Spark has Kafka support built in (spark-sql-kafka), so the mapping is
  * option translation plus a value/key decode pipeline over Spark's
  * fixed Kafka scan shape (`key`/`value` BINARY, `topic`, `partition`,
  * `offset`, `timestamp`, `timestampType`):
  *
  *  - [[translate]]: Flink WITH options → Spark kafka source options
  *    (`topic` → `subscribe`, `properties.*` → `kafka.*`,
  *    `scan.startup.mode` → `startingOffsets`/`startingTimestamp`, ...);
  *  - [[decode]]: the declared row out of `key`/`value` per the
  *    declared format — JSON / CSV via from_json/from_csv, the CDC
  *    formats via [[graft.operators.Changelog]] (row_kind convention),
  *    `value.fields-include = 'EXCEPT_KEY'` stitching key fields back
  *    from `key`, and upsert-kafka's tombstone encoding (NULL value →
  *    `-D` of the key, else `+U`) onto the same row_kind convention;
  *  - [[encode]] / [[translateSink]]: the SINK side — rows back into
  *    `key`/`value` binaries (upsert tombstones for `-D`/`-U` row_kind
  *    inputs) plus the writer options; decode∘encode is spec-locked as
  *    the identity.
  *
  * ZERO-EGRESS CAVEAT: this container carries no spark-sql-kafka jar
  * and no broker, so the runtime scan path is NOT exercised here —
  * FlinkDdlSpec locks the translation and the decode plan against a
  * hand-built Kafka-shaped frame instead. With the kafka package on the
  * classpath, `spark.readStream.format("kafka").options(translate(o))
  * .load()` then `decode(...)` is the deployment shape. The runtime
  * round-trip is SELF-CLOSING: FlinkDdlSpec's "kafka runtime
  * round-trip" test detects spark-sql-kafka on the classpath and a
  * GRAFT_KAFKA_BOOTSTRAP broker address, runs the full
  * batch-INSERT → streaming-scan → decode round-trip when both are
  * present, and cancels with the missing prerequisite named when not.
  */
object KafkaDdl {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"kafka connector: $msg")

  /** The single column Flink's raw format carries ([U]
    * flink-formats/flink-raw RawFormatFactory): exactly one physical
    * field of STRING (UTF-8 — the one charset supported here) or BYTES.
    * Numeric raw encodings ('raw.endianness') are not modeled — clear
    * error, use json for typed scalars. `side` ("key"/"value") picks the
    * charset option spelling: 'key.raw.charset' / 'value.raw.charset',
    * with bare 'raw.charset' as the value-side fallback (the
    * 'format'='raw' declaration form).
    */
  private def rawField(target: StructType, opts: Map[String, String],
      side: String): org.apache.spark.sql.types.StructField = {
    if (target.fields.length != 1)
      fail(s"raw format takes exactly one physical column, got ${target.fields.length}")
    val cs = opts.get(s"$side.raw.charset")
      .orElse(if (side == "value") opts.get("raw.charset") else None)
      .getOrElse("UTF-8")
    if (!cs.equalsIgnoreCase("UTF-8"))
      fail(s"raw format: only charset UTF-8 is supported, got '$cs'")
    val f = target.fields(0)
    f.dataType match {
      case org.apache.spark.sql.types.StringType |
           org.apache.spark.sql.types.BinaryType => f
      case dt => fail(s"raw format supports STRING and BYTES columns, " +
        s"got ${dt.sql} (use json for typed scalars)")
    }
  }

  /** Spark's fixed Kafka scan schema (what `format("kafka")` serves). */
  val scanSchema: StructType = StructType.fromDDL(
    "key BINARY, value BINARY, topic STRING, partition INT, " +
      "offset BIGINT, timestamp TIMESTAMP, timestampType INT")

  /** [[scanSchema]] plus the `headers` column Spark serves under
    * `includeHeaders = true` — the scan shape when a `headers` METADATA
    * column is declared.
    */
  val scanSchemaWithHeaders: StructType = StructType(scanSchema.fields :+
    org.apache.spark.sql.types.StructField("headers",
      org.apache.spark.sql.types.DataType.fromDDL(
        "ARRAY<STRUCT<key: STRING, value: BINARY>>")))

  /** Flink kafka metadata keys readable here, mapped onto Spark's scan
    * columns ([U] flink-connector-kafka KafkaDynamicSource readable
    * metadata). `leader-epoch` is the one upstream key with no Spark
    * scan analog and fails clearly.
    */
  val readableMetadataKeys: Set[String] =
    Set("topic", "partition", "offset", "timestamp", "timestamp-type", "headers")

  /** A Flink kafka metadata key as an expression over the Spark scan
    * shape. `timestamp-type` renders Kafka's enum names the way Flink
    * exposes them; `headers` converts Spark's entry-array to Flink's
    * MAP<STRING, BYTES> (last entry wins on duplicate header keys, the
    * map conversion's rule).
    */
  def metadataExpr(key: String): org.apache.spark.sql.Column = key match {
    case "topic"     => col("topic")
    case "partition" => col("partition")
    case "offset"    => col("offset")
    case "timestamp" => col("timestamp")
    case "timestamp-type" =>
      // Kafka TimestampType ids: NO_TIMESTAMP_TYPE=-1, CREATE_TIME=0,
      // LOG_APPEND_TIME=1 (Spark's scan column carries the raw id)
      when(col("timestampType") === 0, "CreateTime")
        .when(col("timestampType") === 1, "LogAppendTime")
        .otherwise("NoTimestampType")
    case "headers" => map_from_entries(col("headers"))
    case "leader-epoch" =>
      fail("metadata key 'leader-epoch' has no Spark kafka scan analog")
    case other => fail(s"unknown kafka metadata key '$other' " +
      s"(readable: ${readableMetadataKeys.toSeq.sorted.mkString(", ")})")
  }

  /** Flink kafka/upsert-kafka WITH options → Spark kafka source options.
    * Unsupported scan modes fail clearly; sink-side and consumer-tuning
    * options that have no Spark analog are accepted and dropped (a
    * migrating script must not die on them).
    */
  def translate(opts: Map[String, String]): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    opts.get("topic").foreach { t =>
      // Flink separates multiple topics with ';', Spark with ','
      out += "subscribe" -> t.split(";").map(_.trim).mkString(",")
    }
    opts.get("topic-pattern").foreach(p => out += "subscribePattern" -> p)
    if (!opts.contains("topic") && !opts.contains("topic-pattern"))
      fail("requires 'topic' or 'topic-pattern'")
    opts.get("properties.bootstrap.servers") match {
      case Some(bs) => out += "kafka.bootstrap.servers" -> bs
      case None => fail("requires 'properties.bootstrap.servers'")
    }
    // remaining consumer properties pass through under Spark's kafka. prefix
    opts.collect {
      case (k, v) if k.startsWith("properties.") &&
          k != "properties.bootstrap.servers" && k != "properties.group.id" =>
        out += s"kafka.${k.stripPrefix("properties.")}" -> v
    }
    opts.get("properties.group.id").foreach(g => out += "kafka.group.id" -> g)
    opts.get("scan.startup.mode").getOrElse("group-offsets") match {
      case "earliest-offset" => out += "startingOffsets" -> "earliest"
      case "latest-offset"   => out += "startingOffsets" -> "latest"
      case "group-offsets" =>
        // Flink's default; Spark tracks its own offsets in the checkpoint,
        // so the equivalent posture is "resume from checkpoint, else latest"
        out += "startingOffsets" -> "latest"
      case "timestamp" =>
        out += "startingTimestamp" -> opts.getOrElse("scan.startup.timestamp-millis",
          fail("'scan.startup.mode' = 'timestamp' requires 'scan.startup.timestamp-millis'"))
      case "specific-offsets" =>
        val topic = opts.getOrElse("topic", fail("specific-offsets requires 'topic'"))
        val specs = opts.getOrElse("scan.startup.specific-offsets",
          fail("'scan.startup.mode' = 'specific-offsets' requires 'scan.startup.specific-offsets'"))
        // 'partition:0,offset:42;partition:1,offset:300' →
        // {"topic":{"0":42,"1":300}}
        val kvRe = raw"partition\s*:\s*(\d+)\s*,\s*offset\s*:\s*(\d+)".r
        val pairs = specs.split(";").toSeq.map { s =>
          kvRe.findFirstMatchIn(s.trim).map(m => (m.group(1), m.group(2)))
            .getOrElse(fail(s"malformed specific-offsets entry `$s`"))
        }
        val body = pairs.map { case (p, o) => s""""$p": $o""" }.mkString(", ")
        out += "startingOffsets" -> s"""{"$topic": {$body}}"""
      case other => fail(s"unsupported 'scan.startup.mode' = '$other'")
    }
    opts.get("scan.bounded.mode").foreach {
      case "latest-offset" => out += "endingOffsets" -> "latest"
      case other => fail(s"unsupported 'scan.bounded.mode' = '$other'")
    }
    out.result()
  }

  private val cdcFormats = Set("debezium-json", "canal-json", "maxwell-json", "ogg-json")

  /** Sink-side option translation (Spark's kafka writer takes the topic
    * as an option plus `kafka.`-prefixed producer properties).
    */
  def translateSink(opts: Map[String, String]): Map[String, String] = {
    val topic = opts.getOrElse("topic", fail("a kafka sink requires 'topic'"))
    if (topic.contains(";")) fail("a kafka SINK takes exactly one topic")
    Map("topic" -> topic,
      "kafka.bootstrap.servers" -> opts.getOrElse("properties.bootstrap.servers",
        fail("requires 'properties.bootstrap.servers'"))) ++
      opts.collect {
        case (k, v) if k.startsWith("properties.") && k != "properties.bootstrap.servers" =>
          s"kafka.${k.stripPrefix("properties.")}" -> v
      }
  }

  /** Encode rows carrying the declared `schema` columns into Spark's
    * kafka sink shape (`key` / `value` BINARY) — the inverse of
    * [[decode]] for json/csv. upsert-kafka writes the PRIMARY KEY as the
    * message key and emits TOMBSTONES (NULL value) for `-D`/`-U` rows
    * when the input carries a row_kind column (the changelog-stream
    * convention); without one every row is an upsert.
    */
  def encode(df: DataFrame, opts: Map[String, String], schema: StructType,
      primaryKey: Seq[String]): DataFrame = {
    val connector = opts.getOrElse("connector", "kafka")
    val valueFmt = opts.get("value.format").orElse(opts.get("format"))
      .getOrElse(fail("requires 'format' or 'value.format'"))
    if (cdcFormats.contains(valueFmt))
      fail(s"kafka sink encode supports json/csv/raw/avro, not '$valueFmt' " +
        "(CDC formats are source-side decodes)")
    if (valueFmt == "avro") {
      // plain value path only, mirroring decode
      if (connector == "upsert-kafka" ||
          opts.get("key.fields").exists(_.nonEmpty))
        fail("avro encode supports the plain value path " +
          "(no key.fields / upsert-kafka) — use json for keyed shapes")
      return AvroFormat
        .encodeAvro(df.select(schema.fields.toSeq.map(f => col(s"`${f.name}`")): _*),
          AvroFormat.avroJson(schema))
        .select(lit(null).cast("binary").as("key"), col("avro").as("value"))
    }
    val keyFields: Seq[String] =
      if (connector == "upsert-kafka") {
        if (primaryKey.isEmpty) fail("upsert-kafka requires a PRIMARY KEY")
        primaryKey
      } else opts.get("key.fields").map(_.split(";").toSeq.map(_.trim)).getOrElse(Seq.empty)
    // Flink default is ALL for kafka AND upsert-kafka ('value.fields-include');
    // for upsert rows the message KEY stays authoritative for the pk fields
    val exceptKey =
      opts.getOrElse("value.fields-include", "ALL").equalsIgnoreCase("EXCEPT_KEY")
    val valueSchema =
      if (exceptKey && keyFields.nonEmpty)
        StructType(schema.fields.filterNot(f => keyFields.contains(f.name)))
      else schema
    def ser(fmtName: String, fields: StructType, side: String) = {
      val s0 = struct(fields.fields.toSeq.map(f => col(s"`${f.name}`")): _*)
      fmtName match {
        case "json" => to_json(s0)
        case "csv"  => to_csv(s0, new java.util.HashMap[String, String] {
          put("sep", opts.getOrElse("csv.field-delimiter", ","))
        })
        case "raw" =>
          // Flink's raw format: the single column's bytes ARE the message
          // (UTF-8 for STRING); the caller's cast("binary") finishes it
          col(s"`${rawField(fields, opts, side).name}`")
        case other => fail(s"unsupported encode format '$other' (supported: json, csv, raw)")
      }
    }
    val keySchema = StructType(schema.fields.filter(f => keyFields.contains(f.name)))
    val keyCol =
      if (keyFields.isEmpty) lit(null).cast("binary")
      else ser(opts.getOrElse("key.format", valueFmt), keySchema, "key").cast("binary")
    val valueEnc = ser(valueFmt, valueSchema, "value").cast("binary")
    val valueCol =
      if (connector == "upsert-kafka" && df.columns.contains("row_kind"))
        when(col("row_kind").isin("-D", "-U"), lit(null).cast("binary"))
          .otherwise(valueEnc)
      else valueEnc
    df.select(keyCol.as("key"), valueCol.as("value"))
  }

  /** Decode a Kafka-shaped frame ([[scanSchema]], as Spark's kafka
    * source serves it) into rows of the declared `schema`. For
    * `upsert-kafka` the output carries the row_kind convention
    * (`+U` upserts, `-D` tombstones); CDC value formats likewise.
    * `meta` appends the declared METADATA columns — (name, spark type
    * DDL, kafka metadata key) — computed from the scan columns via
    * [[metadataExpr]]; CDC value formats cannot carry them (their
    * decoders explode one message into several rows through a dedicated
    * pipeline) and fail clearly.
    */
  def decode(df: DataFrame, opts: Map[String, String], schema: StructType,
      primaryKey: Seq[String],
      meta: Seq[(String, String, String)] = Seq.empty): DataFrame = {
    val metaCols: Seq[org.apache.spark.sql.Column] =
      meta.map { case (n, t, k) => metadataExpr(k).cast(t).as(n) }
    val metaNames = meta.map(_._1)
    val connector = opts.getOrElse("connector", "kafka")
    val valueFmt = opts.get("value.format").orElse(opts.get("format"))
      .getOrElse(fail("requires 'format' or 'value.format'"))
    val keyFields: Seq[String] =
      if (connector == "upsert-kafka") {
        if (primaryKey.isEmpty) fail("upsert-kafka requires a PRIMARY KEY")
        primaryKey
      } else opts.get("key.fields").map(_.split(";").toSeq.map(_.trim)).getOrElse(Seq.empty)
    // Flink default is ALL for kafka AND upsert-kafka ('value.fields-include');
    // for upsert rows the message KEY stays authoritative for the pk fields
    val exceptKey =
      opts.getOrElse("value.fields-include", "ALL").equalsIgnoreCase("EXCEPT_KEY")
    val valueSchema =
      if (exceptKey && keyFields.nonEmpty)
        StructType(schema.fields.filterNot(f => keyFields.contains(f.name)))
      else schema
    val keySchema = StructType(schema.fields.filter(f => keyFields.contains(f.name)))
    def parse(colName: String, target: StructType) =
      opts.get("key.format").filter(_ => colName == "key").getOrElse(valueFmt) match {
        case "json" => from_json(col(colName).cast("string"), target)
        case "csv"  => from_csv(col(colName).cast("string"), target,
          Map("sep" -> opts.getOrElse("csv.field-delimiter", ",")))
        case "raw" =>
          // Flink's raw format ([U] flink-formats/flink-raw): message
          // bytes land in the single declared column — BINARY as-is,
          // STRING via UTF-8
          val f = rawField(target, opts, colName)
          val c = f.dataType match {
            case org.apache.spark.sql.types.BinaryType => col(colName)
            case _ => col(colName).cast("string")
          }
          struct(c.as(f.name))
        case other =>
          // avro and the CDC formats are handled before this match — and
          // only on the VALUE side — so the key-side message must not
          // name them as supported
          val sup = if (colName == "key") "json, csv, raw"
            else "json, csv, raw, avro, debezium-json, canal-json, maxwell-json, ogg-json"
          fail(s"unsupported $colName decode format '$other' (supported: $sup)")
      }
    if (valueFmt == "avro") {
      // binary Avro records via the from-scratch AvroFormat codec (the
      // record schema derives from the table schema, Flink's own rule);
      // supported on the PLAIN value path — keyed/upsert avro shapes
      // need per-row null handling the codec doesn't model
      if (keyFields.nonEmpty || connector == "upsert-kafka")
        fail("avro decode supports the plain value path " +
          "(no key.fields / upsert-kafka) — use json for keyed shapes")
      // decodeAvro preserves the non-binary input columns, so the
      // metadata expressions ride through the codec untouched
      return AvroFormat
        .decodeAvro(df.select(col("value") +: metaCols: _*), "value",
          AvroFormat.avroJson(schema))
        .select(schema.fields.toSeq.map(f => col(s"`${f.name}`")) ++
          metaNames.map(n => col(s"`$n`")): _*)
    }
    if (cdcFormats.contains(valueFmt)) {
      if (connector == "upsert-kafka") fail("upsert-kafka takes a plain value format")
      if (meta.nonEmpty)
        fail(s"METADATA columns are not supported over the '$valueFmt' value " +
          "format (CDC decoders explode one message into several rows)")
      val raw = df.select(col("value").cast("string").as("__json"))
      val dec: (DataFrame, String, String) => DataFrame = valueFmt match {
        case "debezium-json" => graft.operators.Changelog.fromDebeziumJson
        case "canal-json"    => graft.operators.Changelog.fromCanalJson
        case "maxwell-json"  => graft.operators.Changelog.fromMaxwellJson
        case "ogg-json"      => graft.operators.Changelog.fromOggJson
      }
      return dec(raw, "__json", schema.toDDL)
    }
    if (connector == "upsert-kafka") {
      // NULL value = tombstone: -D of the key fields; else +U of the value
      // (Flink's upsert-kafka changelog shape), on the row_kind convention
      val keyed = df
        .withColumn("__k", parse("key", keySchema))
        .withColumn("__v", parse("value", valueSchema))
      val cols = schema.fields.toSeq.map { f =>
        if (keyFields.contains(f.name)) col(s"__k.`${f.name}`").as(f.name)
        else when(col("value").isNull, lit(null).cast(f.dataType))
          .otherwise(col(s"__v.`${f.name}`")).as(f.name)
      }
      return keyed.select(
        (when(col("value").isNull, "-D").otherwise("+U").as("row_kind") +: cols) ++
          metaCols: _*)
    }
    if (exceptKey && keyFields.nonEmpty) {
      val stitched = df
        .withColumn("__k", parse("key", keySchema))
        .withColumn("__v", parse("value", valueSchema))
      stitched.select(schema.fields.toSeq.map { f =>
        if (keyFields.contains(f.name)) col(s"__k.`${f.name}`").as(f.name)
        else col(s"__v.`${f.name}`").as(f.name)
      } ++ metaCols: _*)
    } else
      df.select(parse("value", schema).as("__v") +: metaCols: _*)
        .select(col("__v.*") +: metaNames.map(n => col(s"`$n`")): _*)
  }
}
