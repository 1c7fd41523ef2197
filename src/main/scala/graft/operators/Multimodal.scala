package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column convention (north_star): image/audio/video payloads
  * travel as opaque `binary` columns with a typed metadata struct beside
  * them — the layout a 100 TB training-data pipeline needs (payload stays
  * columnar/compressed, metadata is filterable without touching bytes,
  * partition pruning works on metadata).
  *
  * Schema convention:
  *   content:  BINARY                      — raw encoded bytes
  *   meta:     STRUCT<modality: STRING, format: STRING, width: INT,
  *                    height: INT, n_bytes: BIGINT, sha1: STRING>
  *
  * The real decoders (image/audio libs) are NOT in this container — the
  * decode step is STUBBED with a deterministic fake (parses dimensions
  * from the payload hash) so the Spark-side plumbing — schema, batch
  * shape, partitioning, pushdown — is real and tested while the kernel is
  * swappable.
  */
object Multimodal {

  val metaType: StructType = StructType.fromDDL(
    "modality STRING, format STRING, width INT, height INT, n_bytes BIGINT, sha1 STRING")

  /** Wrap a binary column into the convention (metadata computed from the
    * payload itself; width/height filled by [[fakeDecode]] downstream).
    */
  def attachMeta(df: DataFrame, contentCol: String, modality: String, format: String): DataFrame =
    df.withColumn("meta", struct(
      lit(modality).as("modality"),
      lit(format).as("format"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"),
      length(col(contentCol)).cast("long").as("n_bytes"),
      sha1(col(contentCol)).as("sha1")))

  /** STUB decode kernel: deterministically derives (width, height) from the
    * payload bytes — stands in for a real image decode (???). The
    * surrounding plan (projection of meta fields, filter pushdown on
    * metadata, per-partition batching) is exactly what a real decoder
    * sees; swap the two expressions for the real kernel.
    */
  def fakeDecode(df: DataFrame, contentCol: String): DataFrame = {
    val h = xxhash64(col(contentCol))
    df.withColumn("meta", col("meta")
      .withField("width", (pmod(h, lit(1920L)) + 1).cast("int"))
      .withField("height", (pmod(shiftright(h, 16), lit(1080L)) + 1).cast("int")))
  }

  /** Feature-extraction stub over the convention: fixed-size float vector
    * per payload, derived deterministically — the shape of an embedding
    * model output (swap for the real model).
    */
  def fakeEmbed(content: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => pmod(xxhash64(content, i), lit(1000L)).cast("double") / 500.0 - 1.0)

  /** Per-partition batched decode — the Scala analog of a Pandas-UDF /
    * mapInPandas kernel: rows stream through in partition-sized batches,
    * the decoder amortizes model/library setup once per partition, and
    * output is one row per input with decoded fields appended. The decode
    * itself is the deterministic stub (payload-hash dimensions); swap the
    * body for a real library call — the batching contract is what's real.
    */
  def decodePartitions(df: DataFrame, contentCol: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(df.schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("dec_width", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("dec_height", org.apache.spark.sql.types.IntegerType)))
    val idx = df.schema.fieldIndex(contentCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      // per-partition setup would happen here (decoder/model init)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        var h = 1125899906842597L // deterministic FNV-ish fold
        bytes.foreach(b => h = h * 31 + b)
        val w = (math.floorMod(h, 1920L) + 1).toInt
        val ht = (math.floorMod(h >> 16, 1080L) + 1).toInt
        org.apache.spark.sql.Row.fromSeq(r.toSeq ++ Seq(w, ht))
      }
    }(enc)
  }

  /** Frame/chunk sampling stub for video/audio payloads: split the byte
    * stream into `n` equal chunks, one row each — the partition-friendly
    * fan-out a frame sampler produces.
    */
  def sampleChunks(df: DataFrame, contentCol: String, n: Int): DataFrame =
    df.withColumn("chunk_id", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("chunk", {
        val sz = greatest((length(col(contentCol)) / n).cast("int"), lit(1))
        col(contentCol).substr(col("chunk_id") * sz + 1, sz)
      })
}
