package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Confluent-framed Avro changelog payloads → the engine's canonical
  * envelope.
  *
  * Kafka CDC topics serialized by Debezium + Schema Registry carry
  * `0x00 | int32 schemaId (big-endian) | avro binary body` (the
  * Confluent wire format, publicly documented). This adapter decodes
  * that frame with the Avro runtime already on Spark's classpath and
  * re-emits the body as JSON TEXT (Avro's canonical JSON rendering),
  * then delegates to [[DebeziumAdapter.fromJson]] — one envelope
  * mapping, one corrupt policy, one downstream contract for the
  * JSON and Avro wire forms.
  *
  * The schema map is a REGISTRY SNAPSHOT (id → schema JSON) supplied
  * from config: the sandbox has no live registry, and pinning schemas
  * in config is also what a reproducible 100 TB replay wants (a
  * registry lookup mid-backfill is a hidden mutable dependency).
  *
  * Scale shape: decoding is a scan-stage scalar UDF — per-partition,
  * zero shuffle; decoder/schema objects build once per executor via
  * the lazy cache below, not per row. A Catalyst expression would
  * save the UDF boundary but cannot: the Avro runtime API is object-
  * oriented and per-schema, exactly the "genuinely imperative" case.
  *
  * Decode failures (bad magic, unknown schema id, truncated body)
  * surface as a `__avro_corrupt__:<hex>` payload string that fails
  * JSON parsing downstream, so the fail/skip/mark policy treats a
  * corrupt Avro frame exactly like a corrupt JSON line — `mark`
  * keeps the hex frame in `before["raw"]` for DLQ forensics.
  */
object AvroEnvelope {

  /** Decode one Confluent frame to the body's JSON text, or None. */
  private[sources] def decodeFrame(bytes: Array[Byte],
      schemas: Map[Int, String]): Option[String] = {
    if (bytes == null || bytes.length < 5 || bytes(0) != 0x00) return None
    val id = ((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
      ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
    schemas.get(id).flatMap { schemaJson =>
      try {
        val schema = SchemaCache.parsed(schemaJson)
        val reader =
          new org.apache.avro.generic.GenericDatumReader[AnyRef](schema)
        val dec = org.apache.avro.io.DecoderFactory.get()
          .binaryDecoder(bytes, 5, bytes.length - 5, null)
        val rec = reader.read(null, dec)
        // a frame with trailing garbage is torn, not a record
        if (!dec.isEnd) None else Option(rec).map(_.toString)
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** Per-executor parsed-schema cache (Schema.Parser is not cheap and
    * Schema is not serializable-friendly across the UDF closure). */
  private object SchemaCache {
    private lazy val cache =
      new java.util.concurrent.ConcurrentHashMap[String, org.apache.avro.Schema]()
    def parsed(json: String): org.apache.avro.Schema =
      cache.computeIfAbsent(json,
        j => new org.apache.avro.Schema.Parser().parse(j))
  }

  /** Binary Confluent-framed Avro column → canonical envelope.
    *
    * @param schemaById registry snapshot: schema id → Avro schema JSON
    * @param seq        monotone sequence expression (Kafka offset /
    *                   line number), same contract as DebeziumAdapter
    */
  def fromAvro(df: DataFrame, binCol: String, seq: Column,
      schemaById: Map[Int, String], onCorrupt: String = "fail"): DataFrame = {
    val schemas = schemaById // stable closure capture
    val decode = udf((b: Array[Byte]) => decodeFrame(b, schemas).orNull)
    val withJson = df.withColumn("__avro_json",
      coalesce(decode(col(binCol)),
        concat(lit("__avro_corrupt__:"), hex(col(binCol)))))
    DebeziumAdapter.fromJson(withJson, "__avro_json", seq, onCorrupt)
      .drop("__avro_json")
  }
}
