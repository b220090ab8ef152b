package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[TarEntries]] and [[WarcRecords]] — the corpus-container
  * walks. Hand-assembled golden cases (offsets computed in the test
  * text, independent of the fixture builders), WebDataset end-to-end
  * composition with the codec kernels, gzip transport, reject paths. */
class ContainerSpec extends SparkSpec {
  import spark.implicits._

  graft.GraftExtensions.ensure(spark)

  // ---- tar ----

  /** Hand-rolled single-member tar, checksum computed by the rules
    * in the test text (not TarFixture's code). */
  private def handTar(name: String, data: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](512 + (data.length + 511) / 512 * 512 + 1024)
    val nb = name.getBytes("US-ASCII")
    System.arraycopy(nb, 0, out, 0, nb.length)
    def field(off: Int, s: String): Unit =
      System.arraycopy(s.getBytes("US-ASCII"), 0, out, off, s.length)
    field(100, "0000644"); field(108, "0000000"); field(116, "0000000")
    field(124, f"${data.length.toLong}%011o")
    field(136, "00000000000")
    java.util.Arrays.fill(out, 148, 156, ' '.toByte)
    out(156) = '0'
    field(257, "ustar"); out(262) = 0; field(263, "00")
    var sum = 0L
    for (i <- 0 until 512) sum += out(i) & 0xffL
    field(148, f"$sum%06o"); out(154) = 0; out(155) = ' '
    System.arraycopy(data, 0, out, 512, data.length)
    out
  }

  private def tarOf(b: Array[Byte]): Seq[Row] = {
    val r = Seq(Tuple1(b)).toDF("blob")
      .select(call_function("tar_entries", $"blob").as("e")).head()
    if (r.isNullAt(0)) null else r.getSeq[Row](0)
  }

  test("tar: hand-assembled golden member") {
    val es = tarOf(handTar("hello.txt", "hi there".getBytes))
    assert(es != null && es.length == 1)
    assert(es.head.getString(0) == "hello.txt")
    assert(es.head.getLong(1) == 8L)
    assert(es.head.getLong(2) == 512L)
  }

  test("tar: WebDataset shard end-to-end — entries slice back into " +
    "the codec kernels") {
    val n = 4
    val df = Seq((3L, n)).toDF("id", "n")
      .select(call_function("tar_fixture", $"id", $"n").as("shard"))
      .select($"shard", explode(call_function("tar_entries", $"shard"))
        .as("e"))
      .select($"shard", $"e.name".as("name"), $"e.size".as("size"),
        $"e.offset".as("offset"))
      .withColumn("payload",
        expr("substring(shard, offset + 1, size)"))
      .withColumn("key", substring_index(col("name"), ".", 1))
      .withColumn("ext", substring_index(col("name"), ".", -1))
    val rows = df.collect()
    // 3 members per sample + pax 'x' skipped + dir skipped
    assert(rows.length == 3 * n)
    // the png members decode via png_stats to the generator sums
    val pngs = df.filter($"ext" === "png")
      .select($"key", call_function("png_stats", $"payload").as("st"))
      .orderBy($"key").collect()
    assert(pngs.length == n)
    for ((r, i) <- pngs.zipWithIndex) {
      assert(r.getString(0) == f"$i%06d")
      val st = r.getStruct(1)
      assert(st != null, s"member $i png must decode")
      assert(st.getInt(0) == i % 5 + 3 && st.getInt(1) == i % 4 + 3)
    }
    // the txt members carry the expected text
    val txts = df.filter($"ext" === "txt")
      .select($"key", $"payload".cast("string")).orderBy($"key")
      .as[(String, String)].collect()
    for (((k, t), i) <- txts.zipWithIndex)
      assert(k == f"$i%06d" && t == s"sample $i of shard 3", s"$k=$t")
    // WebDataset grouping: every sample key has exactly 3 extensions
    val grouped = df.groupBy($"key")
      .agg(sort_array(collect_list($"ext")).as("exts"))
      .select($"exts").as[Seq[String]].collect()
    assert(grouped.length == n)
    grouped.foreach(e => assert(e == Seq("cls", "png", "txt")))
  }

  test("tar reject paths") {
    val good = TarFixture.build(1L, 2)
    assert(tarOf(good) != null)
    // truncation: torn header, torn member, torn terminator (a cut
    // inside the FIRST NUL block; one complete NUL block + EOF is
    // accepted by documented design, so cuts in the second are valid)
    for (cut <- Seq(100, 600, good.length - 1025, good.length - 513))
      assert(tarOf(good.take(cut)) == null, s"cut $cut")
    // corrupt checksum
    val bad = good.clone(); bad(148) = '7'
    assert(tarOf(bad) == null)
    // non-octal size
    val sz = good.clone(); sz(124) = 'Z'
    assert(tarOf(sz) == null)
    // empty archive (just terminator) is VALID and empty
    assert(tarOf(new Array[Byte](1024)).isEmpty)
  }

  // ---- warc ----

  private def warcOf(b: Array[Byte]): Seq[Row] = {
    val r = Seq(Tuple1(b)).toDF("blob")
      .select(call_function("warc_records", $"blob").as("e")).head()
    if (r.isNullAt(0)) null else r.getSeq[Row](0)
  }

  test("warc: hand-assembled record") {
    val payload = "<html>x</html>"
    val rec = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Target-URI: https://h/x\r\n" +
      "Content-Type: text/html\r\n" +
      s"Content-Length: ${payload.length}\r\n" +
      "\r\n" + payload + "\r\n\r\n").getBytes("US-ASCII")
    val rs = warcOf(rec)
    assert(rs != null && rs.length == 1)
    assert(rs.head.getString(0) == "response")
    assert(rs.head.getString(1) == "https://h/x")
    assert(rs.head.getString(2) == "text/html")
    assert(rs.head.getLong(3) == payload.length.toLong)
    assert(new String(rs.head.getAs[Array[Byte]](4)) == payload)
  }

  test("warc fixture roundtrip, plain AND per-record-gzip transport") {
    for (id <- Seq(2L /* plain */, 3L /* gz */ )) {
      val n = 5
      val rs = warcOf(WarcFixture.build(id, n))
      assert(rs != null, s"id=$id")
      // request+response per page, metadata on i%3==0 (i=0,3)
      assert(rs.length == 2 * n + 2, s"id=$id count")
      val responses = rs.filter(_.getString(0) == "response")
      assert(responses.length == n)
      for ((r, i) <- responses.zipWithIndex) {
        assert(r.getString(1) == WarcFixture.uri(id, i), s"id=$id uri")
        val html = new String(r.getAs[Array[Byte]](4), "UTF-8")
        assert(html == WarcFixture.html(id, i), s"id=$id html $i")
      }
    }
  }

  test("warc: html extraction composes in SQL (the Common Crawl " +
    "text-mining shape)") {
    val df = Seq((7L, 4)).toDF("id", "n")
      .select(explode(call_function("warc_records",
        call_function("warc_fixture", $"id", $"n"))).as("r"))
      .filter($"r.rec_type" === "response")
      .select($"r.target_uri".as("uri"),
        regexp_extract($"r.payload".cast("string"),
          "<title>([^<]*)</title>", 1).as("title"))
      .orderBy($"uri")
    val rows = df.as[(String, String)].collect()
    assert(rows.length == 4)
    rows.zipWithIndex.foreach { case ((uri, title), i) =>
      assert(uri == WarcFixture.uri(7L, i) && title == s"doc 7-$i")
    }
  }

  test("warc reject paths") {
    val good = WarcFixture.build(4L, 3)
    assert(warcOf(good) != null)
    for (cut <- Seq(3, 40, good.length / 2, good.length - 1))
      assert(warcOf(good.take(cut)) == null, s"cut $cut")
    // bad version line
    val bad = good.clone(); bad(0) = 'X'
    assert(warcOf(bad) == null)
    // lying content-length (shorter than actual → separator misses)
    val gz = WarcFixture.build(5L, 2) // gz transport
    val torn = gz.take(gz.length - 3)
    assert(warcOf(torn) == null)
    assert(warcOf("not a warc".getBytes) == null)
  }
}
