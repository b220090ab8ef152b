package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Binlog.{Type => T}
import graft.sources.BinlogWriter._

/** Property tests for the binlog wire decoder: random schemas and
  * row values round-trip through the test-side encoder, and ANY
  * byte-truncation of a file either decodes a clean whole-event
  * prefix or fails loudly — never silently yields wrong rows. */
class BinlogPropSpec extends AnyFunSuite {

  private def forAllSamples[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen(Gen.Parameters.default, Seed(1234L + i)).foreach(body)
    }

  // a supported column type + a generator of (wire bytes, expected string)
  private case class ColGen(col: Col, value: Gen[(Array[Byte], String)])

  private val colGens: Seq[ColGen] = Seq(
    ColGen(Col(T.Tiny, 0), Gen.choose(-128, 127).map(v =>
      (new Buf().u8(v & 0xff).result, v.toString))),
    ColGen(Col(T.Short, 0), Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt).map(v =>
      (new Buf().u16(v & 0xffff).result, v.toString))),
    ColGen(Col(T.Int24, 0), Gen.choose(-(1 << 23), (1 << 23) - 1).map(v =>
      (new Buf().u24(v & 0xffffff).result, v.toString))),
    ColGen(Col(T.Long, 0), Gen.choose(Int.MinValue, Int.MaxValue).map(v =>
      (new Buf().u32(v.toLong & 0xffffffffL).result, v.toString))),
    ColGen(Col(T.LongLong, 0), Gen.choose(Long.MinValue, Long.MaxValue).map(v =>
      (new Buf().u64(v).result, v.toString))),
    ColGen(Col(T.Double, 8), Gen.choose(-1e12, 1e12).map { v =>
      (new Buf().u64(java.lang.Double.doubleToLongBits(v)).result, v.toString)
    }),
    ColGen(Col(T.NewDecimal, (15 << 8) | 4), for {
      i <- Gen.choose(-99999999999L, 99999999999L)
      f <- Gen.choose(0, 9999)
    } yield {
      val s = f"$i%d.$f%04d"
      (decimal(s, 15, 4), s)
    }),
    ColGen(Col(T.Varchar, 40), Gen.alphaNumStr.map(_.take(40)).map { s =>
      (new Buf().u8(s.getBytes(UTF_8).length).raw(s.getBytes(UTF_8)).result, s)
    }),
    ColGen(Col(T.Varchar, 1000), Gen.listOfN(300, Gen.alphaNumChar).map(_.mkString).map { s =>
      (new Buf().u16(s.getBytes(UTF_8).length).raw(s.getBytes(UTF_8)).result, s)
    }),
    ColGen(Col(T.Blob, 2), Gen.alphaStr.map(_.take(100)).map { s =>
      (new Buf().u16(s.getBytes(UTF_8).length).raw(s.getBytes(UTF_8)).result, s)
    }),
    ColGen(Col(T.Date, 0), for {
      y <- Gen.choose(1970, 2100); m <- Gen.choose(1, 12); d <- Gen.choose(1, 28)
    } yield (new Buf().u24((y << 9) | (m << 5) | d).result, f"$y%04d-$m%02d-$d%02d")),
    ColGen(Col(T.Datetime2, 0), for {
      y <- Gen.choose(1970, 2100); mo <- Gen.choose(1, 12); d <- Gen.choose(1, 28)
      h <- Gen.choose(0, 23); mi <- Gen.choose(0, 59); s <- Gen.choose(0, 59)
    } yield (datetime2(y, mo, d, h, mi, s),
      f"$y%04d-$mo%02d-$d%02d $h%02d:$mi%02d:$s%02d")))

  private case class Fixture(cols: Seq[Col], names: Seq[String],
      rows: Seq[Seq[(Option[(Array[Byte], String)])]])

  private val fixtureGen: Gen[Fixture] = for {
    nCols <- Gen.choose(1, 8)
    picks <- Gen.listOfN(nCols, Gen.oneOf(colGens))
    nRows <- Gen.choose(1, 12)
    rows <- Gen.listOfN(nRows, Gen.sequence[List[Option[(Array[Byte], String)]], Option[(Array[Byte], String)]](
      picks.map(cg => Gen.option(cg.value))))
  } yield Fixture(picks.map(_.col), picks.indices.map(i => s"c$i"), rows)

  test("random schemas and rows round-trip (values, NULLs, multi-row events)") {
    forAllSamples(fixtureGen, 40) { fx =>
      val imgs = fx.rows.map(_.map {
        case Some((bytes, _)) => V(bytes)
        case None => Null
      })
      val f = file(Seq(
        Binlog.TableMapEvent -> tableMap(3, "d", "t", fx.cols),
        Binlog.WriteRowsV2 -> rows(Binlog.WriteRowsV2, 3, fx.cols.length, imgs)))
      val evs = Binlog.changeEvents(f, Map(("d", "t") -> fx.names))
      assert(evs.length == fx.rows.length)
      evs.zip(fx.rows).foreach { case (ev, row) =>
        val expected = fx.names.zip(row).collect {
          case (n, Some((_, s))) => n -> s
        }.toMap
        assert(ev.after == expected, s"cols=${fx.cols.map(_.typ)}")
      }
    }
  }

  test("any truncation decodes a clean whole-event prefix or fails loudly") {
    val fx = fixtureGen(Gen.Parameters.default, Seed(7L)).get
    val imgs = fx.rows.map(_.map {
      case Some((bytes, _)) => V(bytes); case None => Null
    })
    val full = file(Seq(
      Binlog.GtidEvent -> gtid(Array.tabulate(16)(_.toByte), 1),
      Binlog.TableMapEvent -> tableMap(3, "d", "t", fx.cols),
      Binlog.WriteRowsV2 -> rows(Binlog.WriteRowsV2, 3, fx.cols.length, imgs),
      Binlog.XidEvent -> xid(1)))
    val wholeDecode = Binlog.changeEvents(full, Map(("d", "t") -> fx.names))

    // the stream reader's clamp: for EVERY cut point, the clamped
    // prefix decodes to a prefix of the full decode
    (0 to full.length).foreach { cut =>
      val torn = full.take(cut)
      val end = if (torn.length < 4) 0 else {
        var off = 4
        var done = false
        while (!done && off + 19 <= torn.length) {
          val size = new Binlog.Cursor(torn, off + 9).u32().toInt
          if (size < 19 || off + size > torn.length) done = true else off += size
        }
        off
      }
      if (end >= 4) {
        val evs = Binlog.changeEvents(torn.take(end), Map(("d", "t") -> fx.names))
        assert(evs == wholeDecode.take(evs.length),
          s"cut=$cut end=$end must be a prefix of the full decode")
      }
    }
    // and un-clamped torn files fail loudly rather than mis-decode
    val tornMid = full.take(full.length - 3)
    assert(intercept[Exception](Binlog.rawEvents(tornMid)) != null)
  }
}
