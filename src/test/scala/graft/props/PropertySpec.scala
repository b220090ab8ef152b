package graft.props

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

// top-level so Spark can synthesize an Encoder without an outer scope
case class Ev(id: Long, seq: Long, op: String, v: Int)
case class CapRow(key: String, h: Option[Long], id: Long)
case class AsOfL(id: Long, k: Long, ts: Long)
case class AsOfR(k: Long, rts: Long, pv: Int)

import graft.SparkSpec
import graft.meta.SchemaRegistry
import graft.operators.Compactor

/** Property tests (SURVEY §5.1): random changelog sequences vs the
  * naive sequential-replay model, and random DDL programs vs a
  * column-list model. Raw ScalaCheck generators sampled with fixed
  * seeds (the scalatest bridge isn't in the offline cache). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def forAllSamples[T](gen: Gen[T], n: Int)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      gen(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  private val evGen: Gen[List[Ev]] = for {
    n <- Gen.choose(1, 60)
    evs <- Gen.listOfN(n, for {
      id <- Gen.choose(1L, 6L)
      op <- Gen.oneOf("insert", "update", "delete")
      v <- Gen.choose(0, 100)
    } yield (id, op, v))
  } yield evs.zipWithIndex.map { case ((id, op, v), i) =>
    Ev(id, i.toLong, op, v)
  }

  test("compaction ≡ naive sequential replay (random changelogs)") {
    forAllSamples(evGen, 15) { evs =>
      // model: replay in seq order, last state per key, drop deleted
      val model = evs.sortBy(_.seq).foldLeft(Map.empty[Long, Ev]) {
        (m, e) => m + (e.id -> e)
      }.filter(_._2.op != "delete").view.mapValues(e => (e.seq, e.v)).toMap

      val df = evs.toDF()
      val engine = Compactor.dropDeleted()(
        Compactor.lastEventPerKeyAgg(Seq("id"), "seq")(df))
        .select($"id", $"seq", $"v").as[(Long, Long, Int)]
        .collect().map(r => r._1 -> (r._2, r._3)).toMap
      assert(engine == model)

      // window implementation agrees with agg implementation
      val win = Compactor.dropDeleted()(
        Compactor.lastEventPerKey(Seq("id"), $"seq")(df))
        .select($"id", $"seq", $"v").as[(Long, Long, Int)]
        .collect().map(r => r._1 -> (r._2, r._3)).toMap
      assert(win == model)

      // idempotent under replay (at-least-once duplication)
      val dup = Compactor.dropDeleted()(
        Compactor.lastEventPerKeyAgg(Seq("id"), "seq")(df.union(df)))
        .select($"id", $"seq", $"v").as[(Long, Long, Int)]
        .collect().map(r => r._1 -> (r._2, r._3)).toMap
      assert(dup == model)
    }
  }

  private sealed trait Op
  private case class Add(name: String, after: Option[String]) extends Op
  private case class Drop(name: String) extends Op
  private case class Rename(from: String, to: String) extends Op

  test("asOf ≡ broadcastAsOf ≡ naive point-in-time model (random)") {
    // rights deduped to one row per (k, ts): with duplicates the
    // winner is tiebreak-defined (covered by the deterministic-ties
    // tests); equivalence of the two PLANS is what this property pins
    val gen = for {
      nl <- Gen.choose(1, 40)
      nr <- Gen.choose(0, 30)
      ls <- Gen.listOfN(nl, for {
        k <- Gen.choose(1L, 5L); ts <- Gen.choose(0L, 50L)
      } yield (k, ts))
      rs <- Gen.listOfN(nr, for {
        k <- Gen.choose(1L, 5L); ts <- Gen.choose(0L, 50L)
        v <- Gen.choose(0, 100)
      } yield (k, ts, v))
    } yield (
      ls.zipWithIndex.map { case ((k, ts), i) => AsOfL(i.toLong, k, ts) },
      rs.groupBy(r => (r._1, r._2)).map(_._2.head)
        .map { case (k, ts, v) => AsOfR(k, ts, v) }.toList)
    forAllSamples(gen, 12) { case (ls, rs) =>
      val model: Map[Long, Option[Int]] = ls.map { l =>
        l.id -> rs.filter(r => r.k == l.k && r.rts <= l.ts)
          .sortBy(_.rts).lastOption.map(_.pv)
      }.toMap
      def run(f: => org.apache.spark.sql.DataFrame): Map[Long, Option[Int]] =
        f.select($"id", $"pv")
          .as[(Long, Option[Int])].collect().toMap
      val viaSort = run(graft.ops.AsOfJoin.asOf(
        ls.toDF(), rs.toDF(), Seq("k"), "ts", "rts", Seq("pv")))
      val viaBroadcast = run(graft.ops.AsOfJoin.broadcastAsOf(
        ls.toDF(), rs.toDF(), Seq("k"), "ts", "rts", Seq("pv")))
      assert(viaSort == model)
      assert(viaBroadcast == model)
    }
  }

  test("star CC ≡ min-label CC ≡ union-find model (random graphs)") {
    val graphGen: Gen[List[(Long, Long)]] = for {
      nV <- Gen.choose(2, 30)
      nE <- Gen.choose(1, 50)
      es <- Gen.listOfN(nE, for {
        a <- Gen.choose(0L, nV.toLong - 1)
        b <- Gen.choose(0L, nV.toLong - 1)
      } yield (a, b))
    } yield es
    forAllSamples(graphGen, 12) { es =>
      // model: sequential union-find over the same edges
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // normalize every component label to its minimum member
      val verts = es.flatMap(e => Seq(e._1, e._2)).distinct
      val model = verts.groupBy(find).flatMap { case (_, vs) =>
        val m = vs.min; vs.map(_ -> m)
      }
      val df = es.toDF("a", "b")
      val minLabel = graft.ops.Components.connectedComponents(df, "a", "b")
        .as[(Long, Long)].collect().toMap
      val star = graft.ops.Components.connectedComponentsStar(df, "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(minLabel == model, s"min-label vs model on $es")
      assert(star == model, s"star vs model on $es")
    }
  }

  test("topk_largest ≡ sort-desc-take-k (random groups and k)") {
    val gen: Gen[(Int, List[(String, Double)])] = for {
      k <- Gen.choose(1, 8)
      n <- Gen.choose(0, 80)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf("a", "b", "c")
        // duplicates on purpose: top-k is a multiset
        v <- Gen.choose(0, 20).map(_.toDouble)
      } yield (g, v))
    } yield (k, rows)
    forAllSamples(gen, 12) { case (k, rows) =>
      val model = rows.groupBy(_._1).view.mapValues(
        _.map(_._2).sorted(Ordering[Double].reverse).take(k).toSeq).toMap
      val got =
        if (rows.isEmpty) Map.empty[String, Seq[Double]]
        else rows.toDF("g", "v").repartition(5)
          .groupBy($"g").agg(org.apache.spark.sql.functions
            .expr(s"topk_largest(v, $k)").as("top"))
          .as[(String, Seq[Double])].collect().toMap
      assert(got == model, s"k=$k rows=$rows")
    }
  }

  test("perKeyCap ≡ window rank model (random ties/clusters/nulls)") {
    // the declarative doubling-exponent math (f·cap·hashRange ≥
    // hash·|key| ⟺ the row passes the factor-f threshold, exponent =
    // bit length) is the trickiest arithmetic in the sampler —
    // randomized equivalence against the plain window-rank model,
    // with adversarial ingredients mixed in: hash ties (never split),
    // top-clustered hashes (force many doublings), null hashes
    // (rank first), keys under/at/over the cap.
    val gen: Gen[(Int, List[CapRow])] = for {
      cap <- Gen.choose(1, 4)
      n <- Gen.choose(0, 60)
      rows <- Gen.listOfN(n, for {
        k <- Gen.oneOf("a", "b", "c")
        h <- Gen.frequency(
          6 -> Gen.choose(0L, 99L).map(Option(_)),   // ties likely
          3 -> Gen.choose(95L, 99L).map(Option(_)),  // top cluster
          1 -> Gen.const(Option.empty[Long]))        // null hash
      } yield (k, h))
    } yield (cap, rows.zipWithIndex.map { case ((k, h), i) =>
      CapRow(k, h, i.toLong) })
    forAllSamples(gen, 12) { case (cap, rows) =>
      val model = rows.groupBy(_.key).view.mapValues(
        _.sortBy(r => (r.h.isDefined, r.h.getOrElse(-1L), r.id))
          .take(cap).map(r => (r.h, r.id)).toSet)
        .toMap.filter(_._2.nonEmpty)
      val got =
        if (rows.isEmpty) Map.empty[String, Set[(Option[Long], Long)]]
        else graft.ops.CappedSample.perKeyCap(
            rows.toDF("key", "h", "id").repartition(5),
            Seq("key"), $"h", $"id", cap, hashRange = 100L)
          .as[CapRow].collect().groupBy(_.key).view
          .mapValues(_.map(r => (r.h, r.id)).toSet).toMap
      assert(got == model, s"cap=$cap rows=$rows")
    }
  }

  test("binned range join ≡ naive range join (random intervals/widths)") {
    val gen: Gen[(Double, List[(Long, Double, Double)], List[(Long, Double)])] =
      for {
        w <- Gen.oneOf(1.0, 3.0, 7.5, 100.0)
        nI <- Gen.choose(1, 12)
        ivs <- Gen.listOfN(nI, for {
          lo <- Gen.choose(-50, 50).map(_.toDouble)
          len <- Gen.choose(0, 30).map(_.toDouble)
        } yield (lo, lo + len))
        nP <- Gen.choose(0, 40)
        ps <- Gen.listOfN(nP, Gen.choose(-60, 80).map(_ / 1.5))
      } yield (w,
        ivs.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) },
        ps.zipWithIndex.map { case (p, i) => (i.toLong, p) })
    forAllSamples(gen, 10) { case (w, ivs, ps) =>
      val model = for {
        (pid, p) <- ps
        (iid, lo, hi) <- ivs
        if p >= lo && p < hi
      } yield (pid, iid)
      val got =
        if (ps.isEmpty) Nil
        else graft.ops.BinnedRangeJoin.join(
          ps.toDF("p_id", "p"), "p",
          ivs.toDF("iv_id", "lo", "hi"), "lo", "hi", w)
          .select($"p_id", $"iv_id").as[(Long, Long)].collect().toSeq
      assert(got.sorted == model.sorted, s"w=$w ivs=$ivs ps=$ps")
    }
  }

  test("random DDL programs ≡ column-list model") {
    val names = (0 until 12).map(i => s"c$i")
    val opGen: Gen[Op] = Gen.oneOf(
      for {
        n <- Gen.oneOf(names); a <- Gen.option(Gen.oneOf(names))
      } yield Add(n, a),
      Gen.oneOf(names).map(Drop(_)),
      for { f <- Gen.oneOf(names); t <- Gen.oneOf(names) } yield Rename(f, t))

    forAllSamples(Gen.listOfN(25, opGen), 30) { ops =>
      val reg = new SchemaRegistry
      reg.applySql("CREATE TABLE t (id INT PRIMARY KEY)", "db")
      var model = Vector("id")
      ops.foreach {
        case Add(n, after) if !model.contains(n) =>
          // mirror engine semantics: AFTER an absent col appends
          val pos = after match {
            case Some(a) if model.contains(a) => model.indexOf(a) + 1
            case Some(_) => model.size
            case None => model.size
          }
          model = (model.take(pos) :+ n) ++ model.drop(pos)
          val posSql = after.map(a => s" AFTER $a").getOrElse("")
          reg.applySql(s"ALTER TABLE t ADD COLUMN $n INT$posSql", "db")
        case Add(_, _) => // engine dedups same-name adds; skip in model
        case Drop(n) if model.contains(n) && n != "id" =>
          model = model.filterNot(_ == n)
          reg.applySql(s"ALTER TABLE t DROP COLUMN $n", "db")
        case Drop(_) =>
        case Rename(f, t)
          if model.contains(f) && !model.contains(t) && f != "id" =>
          model = model.map(c => if (c == f) t else c)
          reg.applySql(s"ALTER TABLE t RENAME COLUMN $f TO $t", "db")
        case Rename(_, _) =>
      }
      assert(reg.current("db", "t").get.columnNames == model)
    }
  }
}
