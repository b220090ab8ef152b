package graft

import java.nio.file.{Files, Paths}

/** The CLI daemon (≙ cmd/qin_cdc.go) end-to-end: TOML config + DDL
  * schema script + changelog dir → graft.Main --available-now →
  * upserted sink state. This is the full "a reference user switches
  * engines" path: nothing but the config file drives the assembly. */
class MainSpec extends SparkSpec {
  import spark.implicits._

  test("--config ... --available-now drains the log into the sink") {
    val dir = Files.createTempDirectory("main-e2e")
    val logDir = dir.resolve("log"); Files.createDirectories(logDir)
    val sinkDir = dir.resolve("sink").toString
    val ckpt = dir.resolve("ckpt").toString

    def line(seq: Long, op: String, id: Int, v: Int): String =
      s"""{"db":"shop","table":"items","op":"$op","ts":${1700000000000L + seq},""" +
        s""""pos":"g:$seq","seq":$seq,"tableVersion":0,""" +
        s""""after":{"id":"$id","v":"$v"},"before":null}"""
    Files.write(logDir.resolve("s.jsonl"), Seq(
      line(0, "insert", 1, 10), line(1, "insert", 2, 20),
      line(2, "update", 1, 11), line(3, "delete", 2, 0)
    ).mkString("\n").getBytes("UTF-8"))

    // multi-statement script: the routed table is the SECOND
    // statement — regression for applyScript (applySql parses only
    // the first statement of a script)
    val ddl = dir.resolve("schema.sql")
    Files.write(ddl,
      ("CREATE TABLE shop.audit (aid bigint primary key, note varchar(10));\n" +
        "CREATE TABLE shop.items (id bigint primary key, v int);")
        .getBytes("UTF-8"))

    val toml = dir.resolve("pipeline.toml")
    Files.write(toml,
      s"""[input]
         |type = "changelog"
         |path = "$logDir"
         |
         |[output]
         |type = "parquet-upsert"
         |dir = "$sinkDir"
         |
         |[meta]
         |ddl-file = "$ddl"
         |default-db = "shop"
         |
         |[[routers]]
         |source-schema = "shop"
         |source-table = "items"
         |""".stripMargin.getBytes("UTF-8"))

    Main.main(Array(
      "--config", toml.toString,
      "--checkpoint", ckpt,
      "--metrics-port", "0",
      "--available-now"))

    val state = spark.read.parquet(s"$sinkDir/shop.items")
      .select($"id", $"v").as[(Long, Int)].collect().sortBy(_._1)
    assert(state.toSeq == Seq((1L, 11)),
      "update wins for id 1, delete removes id 2")
  }
}
