package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TableChecksumSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (0L, "a", 10L), (1L, "b", 20L), (2L, "c", 30L),
    (10L, "d", 40L), (11L, "e", 50L), (12L, "f", 60L),
    (20L, "g", 70L), (21L, null.asInstanceOf[String], 80L)
  ).toDF("pk", "s", "v")

  private def side(df: org.apache.spark.sql.DataFrame) =
    TableChecksum.chunkChecksums(df, col("pk"),
      Seq(col("pk"), col("s"), col("v")), chunkSize = 10L)

  test("identical sides produce an empty diff") {
    assert(TableChecksum.diff(side(base), side(base)).count() == 0)
  }

  test("checksums are order- and partitioning-independent") {
    val a = side(base).orderBy($"chunk").collect().toSeq
    val b = side(base.repartition(7, $"v").sortWithinPartitions($"s"))
      .orderBy($"chunk").collect().toSeq
    assert(a == b)
  }

  test("a single value change flags exactly its chunk as checksum") {
    val drifted = base.withColumn("v",
      when($"pk" === 11L, lit(51L)).otherwise($"v"))
    val d = TableChecksum.diff(side(base), side(drifted))
      .select($"chunk", $"status").as[(Long, String)].collect().toSeq
    assert(d == Seq((1L, "checksum")))
  }

  test("a deleted row flags its chunk as row_count") {
    val d = TableChecksum.diff(side(base), side(base.filter($"pk" =!= 2L)))
      .select($"chunk", $"status").as[(Long, String)].collect().toSeq
    assert(d == Seq((0L, "row_count")))
  }

  test("a fully absent chunk reports missing_in_target / _source") {
    val t = base.filter($"pk" < 20L)
    val mt = TableChecksum.diff(side(base), side(t))
      .select($"chunk", $"status").as[(Long, String)].collect().toSeq
    assert(mt == Seq((2L, "missing_in_target")))
    val ms = TableChecksum.diff(side(t), side(base))
      .select($"chunk", $"status").as[(Long, String)].collect().toSeq
    assert(ms == Seq((2L, "missing_in_source")))
  }

  test("null and empty-string rows do not collide") {
    // ("", x) vs (null, x): the NUL sentinel keeps the digests apart
    val withEmpty = base.withColumn("s",
      when($"pk" === 21L, lit("")).otherwise($"s"))
    val d = TableChecksum.diff(side(base), side(withEmpty))
      .select($"chunk", $"status").as[(Long, String)].collect().toSeq
    assert(d == Seq((2L, "checksum")))
  }

  test("field boundaries are sealed: (ab, c) vs (a, bc) differ") {
    val two = Seq((1L, "ab", "c")).toDF("pk", "x", "y")
    val other = Seq((1L, "a", "bc")).toDF("pk", "x", "y")
    def cs(df: org.apache.spark.sql.DataFrame) =
      TableChecksum.chunkChecksums(df, col("pk"),
        Seq(col("x"), col("y")), 10L)
    assert(TableChecksum.diff(cs(two), cs(other)).count() == 1)
  }

  test("chunk ids and pk ranges are arithmetic on the pk") {
    val r = side(base).orderBy($"chunk")
      .select($"chunk", $"n_rows", $"pk_min", $"pk_max")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((0L, 3L, 0L, 2L), (1L, 3L, 10L, 12L),
      (2L, 2L, 20L, 21L)))
  }

  // ---- incremental maintenance ----

  private def incSide(ch: org.apache.spark.sql.DataFrame) =
    TableChecksum.incrementalChecksums(ch, col("op"),
      col("a_pk"), Seq(col("a_pk"), col("a_s"), col("a_v")),
      col("b_pk"), Seq(col("b_pk"), col("b_s"), col("b_v")),
      chunkSize = 10L)

  test("deltas from an empty table equal the final state's checksums") {
    // scripted changelog: inserts, value updates, a delete, and a
    // pk-moving update (5 -> 25 crosses chunks)
    val ch = Seq(
      ("insert", 1L, "a", 10L, null.asInstanceOf[java.lang.Long], null, null),
      ("insert", 5L, "b", 20L, null.asInstanceOf[java.lang.Long], null, null),
      ("insert", 12L, "c", 30L, null.asInstanceOf[java.lang.Long], null, null),
      ("update", 1L, "a2", 11L, java.lang.Long.valueOf(1L), "a", "10"),
      ("update", 25L, "b", 20L, java.lang.Long.valueOf(5L), "b", "20"),
      ("insert", 13L, "d", 40L, null.asInstanceOf[java.lang.Long], null, null),
      ("delete", -1L, null, -1L, java.lang.Long.valueOf(13L), "d", "40")
    ).map { case (op, apk, as_, av, bpk, bs, bv) =>
      (op, apk, as_, av, bpk,
        bs, Option(bv).map(_.toLong).map(java.lang.Long.valueOf(_)).orNull)
    }.toDF("op", "a_pk", "a_s", "a_v", "b_pk", "b_s", "b_v")
    // final state: 1->(a2,11), 25->(b,20), 12->(c,30)
    val state = Seq((1L, "a2", 11L), (25L, "b", 20L), (12L, "c", 30L))
      .toDF("pk", "s", "v")
    val fresh = TableChecksum.chunkChecksums(state, col("pk"),
      Seq(col("pk"), col("s"), col("v")), 10L)
      .select($"chunk", $"n_rows", $"checksum")
      .as[(Long, Long, BigDecimal)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val inc = incSide(ch).as[(Long, Long, BigDecimal)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // every chunk with residue must equal fresh; zero-residue chunks
    // may be absent from fresh
    val chunks = (fresh.keySet ++ inc.keySet)
    chunks.foreach { c =>
      val (fr, fs) = fresh.getOrElse(c, (0L, BigDecimal(0)))
      val (ir, is) = inc.getOrElse(c, (0L, BigDecimal(0)))
      assert(ir == fr, s"chunk $c rows: inc $ir vs fresh $fr")
      assert(is == fs, s"chunk $c sum: inc $is vs fresh $fs")
    }
  }

  test("a replayed update leaves non-zero residue (detection works)") {
    val once = Seq(
      ("insert", 1L, "a", 10L, null.asInstanceOf[java.lang.Long],
        null.asInstanceOf[String], null.asInstanceOf[java.lang.Long]),
      ("update", 1L, "b", 20L, java.lang.Long.valueOf(1L), "a",
        java.lang.Long.valueOf(10L))
    ).toDF("op", "a_pk", "a_s", "a_v", "b_pk", "b_s", "b_v")
    val twice = once.union(once.filter($"op" === "update"))
    val a = incSide(once).orderBy($"chunk")
      .as[(Long, Long, BigDecimal)].collect().toSeq
    val b = incSide(twice).orderBy($"chunk")
      .as[(Long, Long, BigDecimal)].collect().toSeq
    assert(a != b)
  }

  test("unsupported ops fail loudly instead of skewing the sums") {
    val ch = Seq(("replace", 1L, "a", 10L,
      null.asInstanceOf[java.lang.Long], null.asInstanceOf[String],
      null.asInstanceOf[java.lang.Long]))
      .toDF("op", "a_pk", "a_s", "a_v", "b_pk", "b_s", "b_v")
    val e = intercept[Exception] { incSide(ch).collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("unsupported op")))
  }


  test("incremental aggregate runs as a streaming update (complete mode)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long, String, Long, Long, String, Long)]
    // data lands BEFORE the AvailableNow start (offset snapshot)
    mem.addData(("insert", 1L, "a", 10L, 0L, null, 0L),
      ("insert", 12L, "c", 30L, 0L, null, 0L))
    mem.addData(("update", 1L, "b", 20L, 1L, "a", 10L))
    val ch = mem.toDF().toDF("op", "a_pk", "a_s", "a_v", "b_pk", "b_s",
      "b_v")
    val q = incSide(ch).writeStream.format("memory")
      .queryName("cksum_stream").outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "checksum stream did not finish")
    val streamed = spark.table("cksum_stream")
      .as[(Long, Long, BigDecimal)].collect().toSeq.sortBy(_._1)
    val batch = incSide(Seq(
      ("insert", 1L, "a", 10L, 0L, null.asInstanceOf[String], 0L),
      ("insert", 12L, "c", 30L, 0L, null.asInstanceOf[String], 0L),
      ("update", 1L, "b", 20L, 1L, "a", 10L))
      .toDF("op", "a_pk", "a_s", "a_v", "b_pk", "b_s", "b_v"))
      .as[(Long, Long, BigDecimal)].collect().toSeq.sortBy(_._1)
    assert(streamed == batch)
  }


  test("rollup sums exactly and localizes divergence top-down") {
    val wide = (0L until 40L).map(i => (i, s"s$i", i * 3)).toDF("pk", "s", "v")
    val l0 = TableChecksum.chunkChecksums(wide, col("pk"),
      Seq(col("pk"), col("s"), col("v")), 2L)         // 20 chunks
    val l1 = TableChecksum.rollup(l0, 5L)              // 4 parents
    val l2 = TableChecksum.rollup(l1, 4L)              // 1 root
    val root = l2.as[(Long, Long, BigDecimal, Long, Long)].collect()
    assert(root.length == 1)
    assert(root.head._2 == 40L && root.head._4 == 0L && root.head._5 == 39L)
    // root checksum equals the single-chunk checksum of the table
    val direct = TableChecksum.chunkChecksums(wide, col("pk"),
      Seq(col("pk"), col("s"), col("v")), 1000L)
      .as[(Long, Long, BigDecimal, Long, Long)].collect().head
    assert(root.head._3 == direct._3)
    // one drifted row: the divergence shows at every level, and only
    // in the ancestors of its chunk
    val drift = wide.withColumn("v",
      when($"pk" === 17L, lit(999L)).otherwise($"v"))
    def lvls(df: org.apache.spark.sql.DataFrame) = {
      val d0 = TableChecksum.chunkChecksums(df, col("pk"),
        Seq(col("pk"), col("s"), col("v")), 2L)
      (d0, TableChecksum.rollup(d0, 5L))
    }
    val (d0, d1) = lvls(drift)
    val diff1 = TableChecksum.diff(l1, d1)
      .select($"chunk").as[Long].collect().toSeq
    assert(diff1 == Seq(1L))                           // parent of chunk 8
    val diff0 = TableChecksum.diff(l0.filter($"chunk".between(5, 9)),
      d0.filter($"chunk".between(5, 9)))
      .select($"chunk").as[Long].collect().toSeq
    assert(diff0 == Seq(8L))                           // pk 17 -> chunk 8
  }


  test("fastRowHash path: same invariants, bounded range, both sides " +
    "must agree on the hash") {
    val fast = TableChecksum.chunkChecksums(base, col("pk"),
      Seq(col("pk"), col("s"), col("v")), 10L, TableChecksum.fastRowHash)
    // identical sides -> empty diff; order-independent
    val fast2 = TableChecksum.chunkChecksums(
      base.repartition(5, $"v"), col("pk"),
      Seq(col("pk"), col("s"), col("v")), 10L, TableChecksum.fastRowHash)
    assert(TableChecksum.diff(fast, fast2).count() == 0)
    // hashes stay in [0, 2^60): a chunk sum of k rows < k * 2^60
    val sums = fast.select($"checksum").as[BigDecimal].collect()
    assert(sums.forall(s0 => s0 >= 0 &&
      s0 < BigDecimal(2).pow(60) * base.count()))
    // incremental with the fast hash reconciles against a fresh fast
    // checksum of the final state (hashFn threads through both)
    val ch = Seq(("insert", 1L, "a", 10L, 0L,
      null.asInstanceOf[String], 0L))
      .toDF("op", "a_pk", "a_s", "a_v", "b_pk", "b_s", "b_v")
    val inc = TableChecksum.incrementalChecksums(ch, col("op"),
      col("a_pk"), Seq(col("a_pk"), col("a_s"), col("a_v")),
      col("b_pk"), Seq(col("b_pk"), col("b_s"), col("b_v")), 10L,
      TableChecksum.fastRowHash)
      .select($"chunk", $"d_rows".as("n_rows"), $"d_sum".as("checksum"))
    val fresh = TableChecksum.chunkChecksums(
      Seq((1L, "a", 10L)).toDF("pk", "s", "v"), col("pk"),
      Seq(col("pk"), col("s"), col("v")), 10L, TableChecksum.fastRowHash)
      .select($"chunk", $"n_rows", $"checksum")
    assert(TableChecksum.diff(fresh, inc).count() == 0)
    // mixing hash functions across sides diverges on every chunk
    val md5Side = side(base)
    assert(TableChecksum.diff(md5Side, fast).count() == 3)
  }

}
