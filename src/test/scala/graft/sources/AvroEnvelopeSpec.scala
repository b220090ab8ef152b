package graft.sources

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Drives AvroEnvelope with REAL Confluent-framed Avro bytes built by
  * the Avro runtime itself — the encode side this engine never ships
  * but a Debezium+Registry producer runs. */
class AvroEnvelopeSpec extends SparkSpec {
  import spark.implicits._

  private val schemaJson =
    """{"type":"record","name":"Envelope","fields":[
      |{"name":"before","type":["null",{"type":"map","values":"string"}],"default":null},
      |{"name":"after","type":["null",{"type":"map","values":"string"}],"default":null},
      |{"name":"source","type":{"type":"record","name":"Source","fields":[
      |  {"name":"db","type":"string"},{"name":"table","type":"string"},
      |  {"name":"gtid","type":["null","string"],"default":null},
      |  {"name":"ts_ms","type":"long"}]}},
      |{"name":"op","type":"string"},
      |{"name":"ts_ms","type":["null","long"],"default":null}]}""".stripMargin

  private val schema = new Schema.Parser().parse(schemaJson)
  private val schemas = Map(7 -> schemaJson)

  private def envelope(op: String, gtid: String, tsMs: Long,
      before: Map[String, String], after: Map[String, String]): Array[Byte] = {
    val rec = new GenericData.Record(schema)
    rec.put("before", if (before == null) null else before.asJava)
    rec.put("after", if (after == null) null else after.asJava)
    val src = new GenericData.Record(schema.getField("source").schema())
    src.put("db", "shop"); src.put("table", "items")
    src.put("gtid", gtid); src.put("ts_ms", tsMs - 1)
    rec.put("source", src)
    rec.put("op", op); rec.put("ts_ms", tsMs)
    val bos = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(bos, null)
    new GenericDatumWriter[GenericData.Record](schema).write(rec, enc)
    enc.flush()
    frame(7, bos.toByteArray)
  }

  private def frame(id: Int, body: Array[Byte]): Array[Byte] =
    Array[Byte](0, (id >> 24).toByte, (id >> 16).toByte, (id >> 8).toByte,
      id.toByte) ++ body

  private val frames = Seq(
    envelope("c", "uuid:1", 1001L, null, Map("id" -> "1", "qty" -> "10")),
    envelope("u", "uuid:2", 2001L, Map("id" -> "1", "qty" -> "10"),
      Map("id" -> "1", "qty" -> "11")),
    envelope("d", "uuid:3", 3001L, Map("id" -> "1", "qty" -> "11"), null))

  private def adapt(fs: Seq[Array[Byte]], mode: String = "fail") =
    AvroEnvelope.fromAvro(fs.zipWithIndex.toDF("value", "offset"),
      "value", col("offset"), schemas, mode)

  test("decodes framed Avro onto the canonical envelope") {
    val rows = adapt(frames).orderBy("seq").collect()
    assert(rows.map(_.getAs[String]("op")).toSeq ==
      Seq("insert", "update", "delete"))
    assert(rows.forall(r => r.getAs[String]("db") == "shop" &&
      r.getAs[String]("table") == "items"))
    assert(rows(0).getAs[Map[String, String]]("after") ==
      Map("id" -> "1", "qty" -> "10"))
    assert(rows(1).getAs[Map[String, String]]("before")("qty") == "10")
    assert(rows(2).getAs[Map[String, String]]("after") == null)
    assert(rows(0).getAs[String]("pos") == "uuid:1")
    assert(rows(0).getAs[java.sql.Timestamp]("ts").getTime == 1001L)
  }

  test("same downstream contract as the JSON form: compaction runs unchanged") {
    val compacted = graft.operators.Compactor.lastEventPerKeyAgg(
      Seq("table"), "seq")(adapt(frames))
    val r = compacted.collect().head
    assert(r.getAs[String]("op") == "delete" && r.getAs[Long]("seq") == 2L)
  }

  test("corrupt frames: bad magic, unknown id, torn body, trailing garbage") {
    val good = frames.head
    val badMagic = good.clone(); badMagic(0) = 1
    val unknownId = frame(99, good.drop(5))
    val torn = good.dropRight(1)
    val trailing = good ++ Array[Byte](1, 2, 3)
    val mixed = Seq(good, badMagic, unknownId, torn, trailing)

    // fail (default) raises on the first bad frame
    val e = intercept[Exception] { adapt(mixed).collect() }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("corrupt")), chain(e).mkString(" | "))
    // skip keeps only the good frame
    assert(adapt(mixed, "skip").count() == 1)
    // mark DLQs the bad ones with the hex frame in before["raw"]
    val marked = adapt(mixed, "mark").orderBy("seq").collect()
    assert(marked.length == 5)
    assert(marked.count(_.getAs[String]("op") == "__corrupt__") == 4)
    val raw = marked(1).getAs[Map[String, String]]("before")("raw")
    assert(raw.startsWith("__avro_corrupt__:01"))
  }
}
