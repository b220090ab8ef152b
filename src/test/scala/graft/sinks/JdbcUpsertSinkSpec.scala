package graft.sinks

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, PreparedStatement, SQLException}

import scala.collection.mutable

import graft.SparkSpec
import graft.meta.{ColumnDef, TableDef}

/** Recording fake JDBC layer: Proxy-based Connection/PreparedStatement
  * that capture every (sql, binds) executed. Static object so the
  * serializable `() => Connection` factory the sink ships to executors
  * can reach it in local mode. */
object FakeDb {
  // appends/reads guarded by FakeDb.synchronized
  val executed = mutable.ArrayBuffer.empty[(String, Seq[Any])]
  @volatile var failuresRemaining = 0

  def reset(failures: Int = 0): Unit = synchronized {
    executed.clear(); failuresRemaining = failures
  }

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
              FakeDb.synchronized {
                executed += ((sql, binds.toSeq.sortBy(_._1).map(_._2)))
              }
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
            case "prepareStatement" =>
              FakeDb.synchronized {
                if (failuresRemaining > 0) {
                  failuresRemaining -= 1
                  throw new SQLException("transient: connection reset")
                }
              }
              ps(args(0).asInstanceOf[String])
            case "close" => null
            case _ => default(m.getReturnType)
          }
      }).asInstanceOf[Connection]
}

class JdbcUpsertSinkSpec extends SparkSpec {
  import spark.implicits._

  private val t = TableDef("db1", "t1", Seq(
    ColumnDef("id", "bigint", isPrimaryKey = true),
    ColumnDef("k", "int"),
    ColumnDef("c", "varchar(120)")))

  private val multiPk = TableDef("db1", "t2", Seq(
    ColumnDef("a", "bigint", isPrimaryKey = true),
    ColumnDef("b", "bigint", isPrimaryKey = true),
    ColumnDef("v", "varchar(10)")))

  private def sink = new JdbcUpsertSink(() => FakeDb.connect(),
    retryBackoffMs = 1)

  test("upserts execute one multi-row INSERT…ON DUPLICATE KEY UPDATE") {
    FakeDb.reset()
    val batch = Seq((1L, 10, "a", "insert"), (2L, 20, "b", "update"))
      .toDF("id", "k", "c", "op").repartition(1)
    sink.write(batch, t, batchId = 0L)
    val (sql, binds) = FakeDb.executed.head
    assert(sql.startsWith("INSERT INTO `db1`.`t1` (`id`,`k`,`c`) VALUES"))
    assert(sql.contains("ON DUPLICATE KEY UPDATE `k`=VALUES(`k`), `c`=VALUES(`c`)"))
    assert(binds.grouped(3).map(_.head).toSet == Set(1L, 2L))
  }

  test("single-PK deletes execute a bulk IN; values bound") {
    FakeDb.reset()
    val batch = Seq((7L, 70, "x", "delete"), (8L, 80, "y", "delete"))
      .toDF("id", "k", "c", "op").repartition(1)
    sink.write(batch, t, 0L)
    val (sql, binds) = FakeDb.executed.head
    assert(sql == "DELETE FROM `db1`.`t1` WHERE `id` IN (?,?)")
    assert(binds.toSet == Set(7L, 8L))
  }

  test("multi-PK deletes bind REAL pk tuples (reference nil-bind bug fixed)") {
    FakeDb.reset()
    val batch = Seq((1L, 2L, "x", "delete"), (3L, 4L, "y", "delete"))
      .toDF("a", "b", "v", "op").repartition(1)
    sink.write(batch, multiPk, 0L)
    val (sql, binds) = FakeDb.executed.head
    assert(sql.contains("(`a`=? AND `b`=?) OR (`a`=? AND `b`=?)"))
    assert(binds.grouped(2).map(g => (g(0), g(1))).toSet ==
      Set((1L, 2L), (3L, 4L)))
  }

  test("mixed batch splits into upsert + delete statements") {
    FakeDb.reset()
    val batch = Seq((1L, 10, "a", "insert"), (2L, 20, "b", "delete"))
      .toDF("id", "k", "c", "op").repartition(1)
    sink.write(batch, t, 0L)
    val sqls = FakeDb.executed.map(_._1)
    assert(sqls.exists(_.startsWith("INSERT INTO")) &&
      sqls.exists(_.startsWith("DELETE FROM")))
  }

  test("transient failure is retried with backoff (≙ executeSQL 3 tries)") {
    FakeDb.reset(failures = 2) // first two prepares fail, third succeeds
    val batch = Seq((1L, 10, "a", "insert")).toDF("id", "k", "c", "op")
      .repartition(1)
    sink.write(batch, t, 0L)
    assert(FakeDb.executed.size == 1)
  }

  test("exhausted retries propagate the failure") {
    FakeDb.reset(failures = 3)
    val batch = Seq((1L, 10, "a", "insert")).toDF("id", "k", "c", "op")
      .repartition(1)
    intercept[org.apache.spark.SparkException] {
      sink.write(batch, t, 0L)
    }
  }

  test("uncompacted batch with seq is compacted defensively (last event wins)") {
    FakeDb.reset()
    // delete-then-insert on the same key, out of order in the frame:
    // without compaction the upsert-before-delete chunk order would
    // leave the row deleted; with seq-compaction the final insert wins
    val batch = Seq(
      (1L, 99, "stale", "delete", 5L),
      (1L, 10, "fresh", "insert", 9L),
      (2L, 20, "gone", "delete", 7L))
      .toDF("id", "k", "c", "op", "seq").repartition(1)
    sink.write(batch, t, 0L)
    val (inserts, deletes) = FakeDb.synchronized {
      (FakeDb.executed.filter(_._1.startsWith("INSERT")).toVector,
        FakeDb.executed.filter(_._1.startsWith("DELETE")).toVector)
    }
    assert(inserts.flatMap(_._2.grouped(3).map(_.head)) == Vector(1L),
      s"key 1 must survive as its final insert: $inserts")
    assert(deletes.flatMap(_._2) == Vector(2L),
      s"only key 2's final state is a delete: $deletes")
  }

  test("uncompacted batch WITHOUT seq fails loudly instead of reordering") {
    FakeDb.reset()
    val batch = Seq((1L, 1, "x", "delete"), (1L, 2, "y", "insert"))
      .toDF("id", "k", "c", "op").repartition(1)
    val e = intercept[IllegalArgumentException] {
      sink.write(batch, t, 0L)
    }
    assert(e.getMessage.contains("multiple events per key"))
  }

  test("pk-less table rejected loudly (≙ mysql.go:130-132)") {
    val noPk = TableDef("db1", "t3", Seq(ColumnDef("x", "int")))
    intercept[IllegalArgumentException] {
      sink.write(Seq((1, "insert")).toDF("x", "op"), noPk, 0L)
    }
  }
}
