package graft.sinks

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.meta.{ColumnDef, TableDef}

class KafkaSinkSpec extends SparkSpec {
  import spark.implicits._

  private val target = TableDef("app", "users", Seq(
    ColumnDef("id", "bigint", isPrimaryKey = true),
    ColumnDef("name", "varchar(32)")))

  // a routed/typed/compacted batch as Pipeline.routed emits it:
  // data columns + op/seq/pos/ts metadata
  private def batch = Seq(
    (1L, "ann", "insert", 10L, "gtid:1", Timestamp.valueOf("2024-01-01 00:00:01")),
    (2L, "bob", "delete", 11L, "gtid:2", Timestamp.valueOf("2024-01-01 00:00:02")),
    (3L, "cy", "insert", 12L, "gtid:3", Timestamp.valueOf("2024-01-01 00:00:03")))
    .toDF("id", "name", "op", "seq", "pos", "ts")

  test("records: topic/partition/key/value assembled, partitions bounded") {
    val sink = new KafkaSink("broker:9092", numPartitions = 4)
    val recs = sink.records(batch, target).collect()
    assert(recs.length == 3)
    recs.foreach { r =>
      assert(r.getAs[String]("topic") == "app.users")
      val p = r.getAs[Int]("partition")
      assert(p >= 0 && p < 4, s"partition $p out of range")
      // key = decimal string of the pk hash (consumer-side dedup key)
      assert(r.getAs[String]("key").forall(_.isDigit))
    }
    val v1 = recs.find(_.getAs[String]("value").contains("\"ann\"")).get
      .getAs[String]("value")
    assert(v1.contains("\"database\":\"app\"") && v1.contains("\"table\":\"users\""))
    assert(v1.contains("\"type\":\"insert\""))
    assert(v1.contains("\"data\":{\"id\":\"1\",\"name\":\"ann\"}"))
    val v2 = recs.find(_.getAs[String]("value").contains("\"type\":\"delete\"")).get
      .getAs[String]("value")
    assert(v2.contains("\"id\":\"2\""))
  }

  test("records: same pk always lands on the same partition and key") {
    val sink = new KafkaSink("broker:9092", numPartitions = 8)
    val a = sink.records(batch, target)
      .select("key", "partition").collect().toSet
    val b = sink.records(batch.orderBy(col("seq").desc), target)
      .select("key", "partition").collect().toSet
    assert(a == b, "pk→(key,partition) must be deterministic")
  }

  test("canal format rides the same transport frame") {
    val sink = new KafkaSink("broker:9092", format = "canal")
    val recs = sink.records(batch, target).collect()
    val v = recs.head.getAs[String]("value")
    assert(v.contains("\"pkNames\":[\"id\"]"))
    assert(v.contains("\"mysqlType\":{\"id\":\"bigint\",\"name\":\"varchar\"}"))
  }

  test("delivery/transport failure fails the batch LOUDLY, naming the route") {
    // no kafka connector jar in this environment (and no broker):
    // the write must raise — a sink that cannot deliver must never
    // report a batch as consumed (≙ outputs/kafka/kafka.go:79-94)
    val sink = new KafkaSink("broker:9092")
    val e = intercept[IllegalStateException] {
      sink.write(batch, target, batchId = 7L)
    }
    assert(e.getMessage.contains("kafka delivery failed"))
    assert(e.getMessage.contains("app.users") && e.getMessage.contains("batch 7"))
    assert(e.getCause != null, "original transport error must be chained")
  }

  test("pk-less table is refused with a routing hint, not a plan error") {
    val noPk = TableDef("app", "logs", Seq(ColumnDef("line", "text")))
    val e = intercept[IllegalArgumentException] {
      new KafkaSink("b:9092").records(batch, noPk)
    }
    assert(e.getMessage.contains("requires a primary key"))
    // and through write(): still the config error, NOT re-labeled as
    // a delivery failure (assembly happens outside the transport catch)
    val e2 = intercept[IllegalArgumentException] {
      new KafkaSink("b:9092").write(batch, noPk, 1L)
    }
    assert(e2.getMessage.contains("requires a primary key"))
  }

  test("registry assembles the kafka sink from TOML-style conf") {
    val sink = graft.streaming.Registry.sink("kafka", Map(
      "brokers" -> "b:9092", "topic" -> "cdc-{table}",
      "partitions" -> "16", "format" -> "json",
      "kafka.acks" -> "all"))
    assert(sink.isInstanceOf[KafkaSink])
    assert(sink.asInstanceOf[KafkaSink].topicFor(target) == "cdc-users")
  }
}
