package graft.sinks

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, PreparedStatement, SQLException}

import scala.collection.mutable

import graft.SparkSpec
import graft.meta.{ColumnDef, TableDef}

/** Fake JDBC layer whose executeUpdate REJECTS any statement binding
  * the marker value "POISON" against the target table (DLQ inserts
  * always succeed) — a deterministic per-row failure, the shape a
  * constraint violation or oversized value produces. Static so the
  * serializable connection factory reaches it in local mode. */
object PoisonDb {
  val executed = mutable.ArrayBuffer.empty[(String, Seq[Any])]

  def reset(): Unit = synchronized { executed.clear() }

  private def default(t: Class[_]): AnyRef = t match {
    case java.lang.Boolean.TYPE => java.lang.Boolean.FALSE
    case java.lang.Integer.TYPE => Integer.valueOf(0)
    case java.lang.Long.TYPE => java.lang.Long.valueOf(0L)
    case _ => null
  }

  private def ps(sql: String): PreparedStatement = {
    val binds = mutable.Map.empty[Int, Any]
    Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[PreparedStatement]),
      new InvocationHandler {
        override def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
          m.getName match {
            case "setObject" =>
              binds(args(0).asInstanceOf[Integer].intValue()) = args(1); null
            case "executeUpdate" =>
              val vs = binds.toSeq.sortBy(_._1).map(_._2)
              if (!sql.startsWith("INSERT INTO dlq") &&
                  vs.exists(v => "POISON" == v)) {
                throw new SQLException("CHECK constraint violated")
              }
              PoisonDb.synchronized { executed += ((sql, vs)) }
              Integer.valueOf(1)
            case "close" => null
            case _ => default(m.getReturnType)
          }
      }).asInstanceOf[PreparedStatement]
  }

  def connect(): Connection =
    Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[Connection]),
      new InvocationHandler {
        override def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
          m.getName match {
            case "prepareStatement" => ps(args(0).asInstanceOf[String])
            case "close" => null
            case _ => default(m.getReturnType)
          }
      }).asInstanceOf[Connection]
}

class QuarantineSpec extends SparkSpec {
  import spark.implicits._

  private val t = TableDef("db1", "t1", Seq(
    ColumnDef("id", "bigint", isPrimaryKey = true),
    ColumnDef("c", "varchar(120)")))

  private def sink(q: Option[String]) = new JdbcUpsertSink(
    () => PoisonDb.connect(), retries = 1, retryBackoffMs = 0,
    quarantineTable = q)

  private def dlqRows = PoisonDb.synchronized {
    PoisonDb.executed.filter(_._1.startsWith("INSERT INTO dlq")).map(_._2)
  }
  private def landedIds = PoisonDb.synchronized {
    PoisonDb.executed.filter(_._1.startsWith("INSERT INTO `db1`"))
      .flatMap(_._2.grouped(2).map(_.head))
  }

  test("poison rows are bisected into the DLQ; healthy rows land") {
    PoisonDb.reset()
    val batch = (1L to 8L).map(i =>
      (i, if (i == 3L || i == 6L) "POISON" else s"v$i", "insert"))
      .toDF("id", "c", "op").repartition(1)
    sink(Some("dlq")).write(batch, t, batchId = 42L)
    assert(landedIds.toSet == Set(1L, 2L, 4L, 5L, 7L, 8L))
    val q = dlqRows
    assert(q.length == 2)
    q.foreach { binds =>
      assert(binds(0) == "db1.t1")
      assert(binds(1) == "upsert")
      assert(binds(2) == 42L)
      assert(binds(3).toString.contains("\"c\":\"POISON\""))
      assert(binds(4).toString.contains("CHECK constraint"))
    }
    assert(q.map(_(3).toString).exists(_.contains("\"id\":3")))
    assert(q.map(_(3).toString).exists(_.contains("\"id\":6")))
  }

  test("an all-poison chunk quarantines every row without failing") {
    PoisonDb.reset()
    val batch = Seq((1L, "POISON", "insert"), (2L, "POISON", "insert"))
      .toDF("id", "c", "op").repartition(1)
    sink(Some("dlq")).write(batch, t, 0L)
    assert(landedIds.isEmpty)
    assert(dlqRows.length == 2)
  }

  test("without a quarantine table the batch fails (exactly-once default)") {
    PoisonDb.reset()
    val batch = Seq((1L, "ok", "insert"), (2L, "POISON", "insert"))
      .toDF("id", "c", "op").repartition(1)
    val e = intercept[org.apache.spark.SparkException] {
      sink(None).write(batch, t, 0L)
    }
    assert(e.getCause.getMessage.contains("CHECK constraint") ||
      e.getMessage.contains("CHECK constraint"))
  }

  test("a poison delete quarantines with op=delete") {
    PoisonDb.reset()
    val batch = Seq(("POISON", "x", "delete")).toDF("id", "c", "op")
      .repartition(1)
    val byStringPk = TableDef("db1", "t1", Seq(
      ColumnDef("id", "varchar(20)", isPrimaryKey = true),
      ColumnDef("c", "varchar(120)")))
    sink(Some("dlq")).write(batch, byStringPk, 7L)
    val q = dlqRows
    assert(q.length == 1 && q.head(1) == "delete" && q.head(2) == 7L)
  }

  test("rowJson renders sorted keys, escapes, and typed values") {
    val j = JdbcUpsertSink.rowJson(Map(
      "b" -> 2L, "a" -> "x\"y\\z\n", "c" -> null, "d" -> true))
    assert(j ==
      "{\"a\":\"x\\\"y\\\\z\\u000a\",\"b\":2,\"c\":null,\"d\":true}")
  }
}
