package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  /** Reference single-machine BPE trainer — the textbook algorithm,
    * independent of the Spark dataflow. */
  private def referenceBpe(wc: Map[String, Long],
      k: Int): Seq[(String, String)] = {
    var words: Map[Vector[String], Long] =
      wc.map { case (w, c) => w.split("").toVector -> c }
    val out = Seq.newBuilder[(String, String)]
    var i = 0
    var stop = false
    while (i < k && !stop) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- words; j <- 0 until syms.length - 1)
        counts((syms(j), syms(j + 1))) =
          counts.getOrElse((syms(j), syms(j + 1)), 0L) + c
      if (counts.isEmpty || counts.values.max < 2) stop = true
      else {
        val (l, r) = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head._1
        out += ((l, r))
        def merge(s: Vector[String]): Vector[String] = {
          val b = Vector.newBuilder[String]
          var j = 0
          while (j < s.length) {
            if (j < s.length - 1 && s(j) == l && s(j + 1) == r) {
              b += (l + r); j += 2
            } else { b += s(j); j += 1 }
          }
          b.result()
        }
        words = words.groupBy { case (s, _) => merge(s) }
          .map { case (s, m) => s -> m.values.sum }
        i += 1
      }
    }
    out.result()
  }

  private def trainOn(wc: Map[String, Long], k: Int,
      parts: Int = 1): Seq[(String, String)] =
    BpeTrain.train(
      wc.toSeq.toDF("word", "cnt").repartition(parts), k)
      .orderBy($"rank").select($"left", $"right")
      .as[(String, String)].collect().toSeq

  test("textbook merge order on the classic aaab-style corpus") {
    // 'aaab' x10, 'aab' x5: (a,a) dominates (15), then merged 'aa'
    // pairs with 'a'/'b'
    val wc = Map("aaab" -> 10L, "aab" -> 5L)
    val got = trainOn(wc, 3)
    assert(got == referenceBpe(wc, 3), s"got $got")
    assert(got.head == (("a", "a")))
  }

  test("left-to-right non-overlap: 'aaa' + (a,a) merges once") {
    val merged = Seq(Seq("a", "a", "a")).toDF("syms")
      .select(BpeTrain.mergePair($"syms", "a", "a").as("m"))
      .as[Seq[String]].head()
    assert(merged == Seq("aa", "a"))
  }

  test("randomized equivalence with the reference implementation") {
    val rng = new scala.util.Random(13)
    val alpha = "abcde"
    for (trial <- 1 to 5) {
      val wc = (1 to 20).map { _ =>
        val w = (1 to (2 + rng.nextInt(6)))
          .map(_ => alpha(rng.nextInt(alpha.length))).mkString
        w -> (1L + rng.nextInt(9))
      }.groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).sum }
      val exp = referenceBpe(wc, 6)
      val got = trainOn(wc, 6)
      assert(got == exp, s"trial $trial: wc=$wc got=$got exp=$exp")
    }
  }

  test("partitioning-invariant merge table") {
    val wc = Map("spark" -> 7L, "sparse" -> 4L, "parse" -> 6L,
      "park" -> 3L, "stark" -> 2L)
    assert(trainOn(wc, 5, parts = 1) == trainOn(wc, 5, parts = 7))
  }

  test("applyMerges encodes like the reference, in rank order") {
    def refEncode(w: String, rules: Seq[(String, String)]): Seq[String] =
      rules.foldLeft(w.split("").toVector) { case (s, (l, r)) =>
        val b = Vector.newBuilder[String]
        var j = 0
        while (j < s.length) {
          if (j < s.length - 1 && s(j) == l && s(j + 1) == r) {
            b += (l + r); j += 2
          } else { b += s(j); j += 1 }
        }
        b.result()
      }
    val wc = Map("spark" -> 7L, "sparse" -> 4L, "parse" -> 6L)
    val rules = trainOn(wc, 4)
    val words = Seq("sparks", "parsed", "xyz", "s")
    val got = words.toDF("w")
      .select(BpeTrain.applyMerges($"w", rules).as("e"))
      .as[Seq[String]].collect().toSeq
    words.zip(got).foreach { case (w, e) =>
      assert(e == refEncode(w, rules), s"word=$w got=$e")
    }
  }

  test("all three trainers agree: local delta == distributed delta == " +
      "full recount, on randomized unicode corpora") {
    val rng = new scala.util.Random(29)
    val alpha = Vector("a", "b", "c", "é", "😀")
    for (trial <- 1 to 4) {
      val wc = (1 to 25).map { _ =>
        val w = (1 to (2 + rng.nextInt(6)))
          .map(_ => alpha(rng.nextInt(alpha.length))).mkString
        w -> (1L + rng.nextInt(9))
      }.groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).sum }
      val df = wc.toSeq.toDF("word", "cnt").repartition(3)
      def table(d: org.apache.spark.sql.DataFrame) =
        d.orderBy($"rank").select($"rank", $"left", $"right", $"freq")
          .as[(Int, String, String, Long)].collect().toSeq
      val recount = table(BpeTrain.trainRecount(df, 6))
      val delta = table(BpeTrain.trainDelta(df, 6))
      val local = BpeTrain.trainLocalRows(
        wc.toArray.sortBy(_._1), 6)
        .map { case (rk, l, r, _, f) => (rk, l, r, f) }
      assert(delta == recount, s"trial $trial: delta=$delta recount=$recount")
      assert(local == recount, s"trial $trial: local=$local recount=$recount")
    }
  }

  test("trainDelta runs a BOUNDED number of jobs per merge — no " +
      "corpus-width recount each round") {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    val wc = Map("aaab" -> 10L, "aab" -> 5L, "abab" -> 4L,
      "bbaa" -> 3L, "abba" -> 2L)
    val df = wc.toSeq.toDF("word", "cnt")
    // listener events are async: poll the counter until stable
    def settle(): Int = {
      var last = -1
      var cur = jobs.get()
      var waited = 0
      while (cur != last && waited < 5000) {
        last = cur; Thread.sleep(250); waited += 250; cur = jobs.get()
      }
      cur
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      settle()
      jobs.set(0)
      val rules = BpeTrain.trainDelta(df, 5).collect()
      settle()
      val merges = rules.length
      assert(merges >= 3, s"expected several merges, got $merges")
      val perMerge = (jobs.get() - 4).toDouble / merges // setup jobs
      info(s"jobs=${jobs.get()} merges=$merges perMerge=$perMerge")
      // 3 jobs/merge by design (top-1 read + 2 checkpoints);
      // measured 4.8 with AQE/incremental-collect internals — pin at
      // 6 so any regression to a convergence loop or per-round
      // multi-pass recount fails here
      assert(perMerge <= 6.0,
        s"jobs per merge regressed: ${jobs.get()} jobs / $merges merges")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("a 1K-merge vocabulary trains at interactive wall time via the " +
      "local path and round-trips through the native encoder") {
    // enough repeated structure to sustain >1000 productive merges:
    // composite words over a small alphabet with heavy reuse
    val rng = new scala.util.Random(97)
    val wc = (1 to 4000).map { i =>
      val w = (0 until (3 + rng.nextInt(10)))
        .map(_ => "abcdefgh"(rng.nextInt(8))).mkString
      w -> (1L + rng.nextInt(50))
    }.groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).sum }
    val t0 = System.nanoTime()
    val rules = BpeTrain.train(wc.toSeq.toDF("word", "cnt"), 1200)
      .orderBy($"rank").select($"left", $"right")
      .as[(String, String)].collect().toSeq
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"trained ${rules.size} merges in $secs%.2f s")
    assert(rules.size >= 1000, s"corpus sustained only ${rules.size} merges")
    // encode a sample through the kernel with the FULL table; agree
    // with the driver-side sequential reference
    val words = wc.keys.take(30).toSeq
    val got = words.toDF("w")
      .select(BpeTrain.encodeNative($"w", rules).as("e"))
      .as[Seq[String]].collect().toSeq
    def refEncode(w: String): Seq[String] = {
      var syms = w.split("").toVector
      rules.foreach { case (l, r) =>
        val b = Vector.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
            b += (l + r); j += 2
          } else { b += syms(j); j += 1 }
        }
        syms = b.result()
      }
      syms
    }
    words.zip(got).foreach { case (w, e) =>
      assert(e == refEncode(w), s"word=$w")
    }
  }

  test("stops early when no pair repeats; wordCounts feeds train") {
    val docs = Seq("ab cd", "ef gh").toDF("text")
    val rules = BpeTrain.train(BpeTrain.wordCounts(docs, "text"), 10)
    assert(rules.count() == 0, "all pairs unique -> no rule earns merging")
    val docs2 = Seq("aa aa", "aa bb").toDF("text")
    val r2 = BpeTrain.train(BpeTrain.wordCounts(docs2, "text"), 10)
      .select($"left", $"right", $"freq").as[(String, String, Long)]
      .collect().toSeq
    assert(r2.head == (("a", "a", 3L)), s"got $r2") // 'aa' occurs 3x
  }
}
