package graft.ops

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end continuous verification against a LIVE target
  * database: change batches apply to in-process Derby, the checksum
  * ledger accumulates each batch's incremental deltas, and `verify`
  * proves the target equals exactly what the pipeline shipped — one
  * scan of the target, zero rescans of history. A direct out-of-band
  * tamper of the target (the failure mode checksums exist for)
  * surfaces as a named divergent chunk, and so does a LOST batch
  * (applied to the ledger but not the target — the at-most-once
  * failure). The apply transport is plain JDBC here: the
  * verification layer is transport-agnostic by design (checksums
  * prove state, not who wrote it; the MySQL-dialect sink path is
  * covered by JdbcUpsertSinkSpec/QuarantineSpec).
  */
class ChecksumE2eSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:cksumdb;create=true"

  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  private def exec(sqls: String*): Unit = withConn { c =>
    val st = c.createStatement()
    try sqls.foreach(st.execute) finally st.close()
  }

  private def freshChecksums: DataFrame = {
    val target = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", "app.acct")
      .option("driver", "org.apache.derby.iapi.jdbc.AutoloadedDriver")
      .load()
      .select(col("ID").as("id"), col("V").as("v"))
    TableChecksum.chunkChecksums(target, col("id"),
      Seq(col("id").cast("string"), col("v")), 10L)
      .select(col("chunk"), col("n_rows"), col("checksum"))
  }

  private def deltas(
      rows: Seq[(String, Long, String, Long, String)]): DataFrame =
    TableChecksum.incrementalChecksums(
      rows.toDF("op", "a_pk", "a_v", "b_pk", "b_v"), col("op"),
      col("a_pk"), Seq(col("a_pk").cast("string"), col("a_v")),
      col("b_pk"), Seq(col("b_pk").cast("string"), col("b_v")), 10L)

  test("applied batches verify against live Derby; tampers and lost " +
    "batches are caught by chunk") {
    try exec("CREATE SCHEMA app") catch { case _: Exception => }
    try exec("DROP TABLE app.acct") catch { case _: Exception => }
    exec("CREATE TABLE app.acct (id BIGINT PRIMARY KEY, v VARCHAR(50))")
    val dir = Files.createTempDirectory("cksum-e2e").toString + "/ledger"

    // batch 0: three inserts
    exec("INSERT INTO app.acct VALUES (1, 'a')",
      "INSERT INTO app.acct VALUES (2, 'b')",
      "INSERT INTO app.acct VALUES (12, 'c')")
    ChecksumLedger.record(spark, deltas(Seq(
      ("insert", 1L, "a", 0L, null),
      ("insert", 2L, "b", 0L, null),
      ("insert", 12L, "c", 0L, null))), dir, 0L)

    // batch 1: update 1 -> a2, delete 12
    exec("UPDATE app.acct SET v = 'a2' WHERE id = 1",
      "DELETE FROM app.acct WHERE id = 12")
    ChecksumLedger.record(spark, deltas(Seq(
      ("update", 1L, "a2", 1L, "a"),
      ("delete", 0L, null, 12L, "c"))), dir, 1L)

    // the target holds exactly what the pipeline shipped
    assert(ChecksumLedger.verify(spark, dir, freshChecksums).count() == 0)

    // an out-of-band tamper surfaces as its chunk, by status
    exec("UPDATE app.acct SET v = 'evil' WHERE id = 2")
    val bad = ChecksumLedger.verify(spark, dir, freshChecksums)
      .select($"chunk", $"status").as[(Long, String)].collect().toSeq
    assert(bad == Seq((0L, "checksum")))
    exec("UPDATE app.acct SET v = 'b' WHERE id = 2") // restore

    // a batch the ledger saw but the target never applied (lost
    // write) shows as a row_count divergence in its chunk
    ChecksumLedger.record(spark, deltas(Seq(
      ("insert", 25L, "e", 0L, null))), dir, 2L)
    val lost = ChecksumLedger.verify(spark, dir, freshChecksums)
      .select($"chunk", $"status").as[(Long, String)].collect().toSeq
    assert(lost == Seq((2L, "missing_in_target")))
  }
}
