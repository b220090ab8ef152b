package graft.functions

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Multimodal

/** Differential spec for the native [[PpmStats]] kernel against the
  * round-8 HOF form it replaced (`Multimodal.ppmStatsHof`): the two
  * must agree ROW-FOR-ROW on crafted valid/invalid PPMs and on
  * randomized blobs, so the 250×-faster kernel provably computes the
  * same function the green r8 oracle checked. */
class PpmStatsSpec extends SparkSpec {
  import spark.implicits._

  private def ppm(header: String, raster: Array[Byte]): Array[Byte] =
    header.getBytes("ISO-8859-1") ++ raster

  private def both(blobs: Seq[Array[Byte]]): Seq[(Row, Row)] = {
    val df = blobs.zipWithIndex.map { case (b, i) => (i, b) }
      .toDF("i", "blob")
    df.select($"i", Multimodal.ppmStats($"blob").as("nat"),
        Multimodal.ppmStatsHof($"blob").as("hof"))
      .orderBy($"i").collect()
      .map(r => (if (r.isNullAt(1)) null else r.getStruct(1),
        if (r.isNullAt(2)) null else r.getStruct(2))).toSeq
  }

  private def assertAgree(blobs: Seq[Array[Byte]]): Unit =
    both(blobs).zipWithIndex.foreach { case ((nat, hof), i) =>
      assert(nat == hof, s"blob $i: native=$nat hof=$hof")
    }

  test("valid PPMs: native equals HOF and the hand-computed sums") {
    val r1 = (1 to 12).map(_.toByte).toArray // 2x2
    val blobs = Seq(
      ppm("P6\n2 2\n255\n", r1),
      // variable-width dims crossing the digit-count boundary
      ppm("P6\n12 3\n255\n", Array.fill(12 * 3 * 3)(7.toByte)),
      ppm("P6 1 1 255 ", Array[Byte](10, 20, 30)),
      // CR/TAB whitespace, multi-ws runs between fields
      ppm("P6\r7 4\t255\n", Array.fill(7 * 4 * 3)(200.toByte)),
      // trailing bytes beyond the raster are ignored
      ppm("P6\n1 1\n255\n", Array[Byte](1, 2, 3, 99, 98)))
    val rows = both(blobs)
    assertAgree(blobs)
    val first = rows.head._1
    assert(first.getInt(0) == 2 && first.getInt(1) == 2 &&
      first.getLong(2) == 4L)
    // channels of 1..12: r=1+4+7+10, g=2+5+8+11, b=3+6+9+12
    assert(first.getLong(3) == 22L && first.getLong(4) == 26L &&
      first.getLong(5) == 30L)
    val ws = rows(3)._1
    assert(ws.getInt(0) == 7 && ws.getInt(1) == 4 &&
      ws.getLong(3) == 200L * 7 * 4)
  }

  test("reject cases: native equals HOF (all NULL)") {
    val blobs = Seq(
      Array[Byte](), Array[Byte]('P'), "P5\n1 1\n255\n".getBytes,
      "JUNK".getBytes,
      ppm("P6\n# c\n1 1\n255\n", Array[Byte](9, 9, 9)), // comment
      ppm("P6\n1 1\n65535\n", Array.fill(6)(9.toByte)), // 2-byte samples
      ppm("P6\n2 2\n255\n", Array[Byte](1, 2, 3)), // truncated raster
      ppm("P6\n0 4\n255\n", Array[Byte]()), // zero dim
      ppm("P6\n123456 123456\n255\n", Array[Byte](1)), // header > 24B
      ppm("P6\n9999 9999\n255\n", Array.fill(64)(1.toByte)), // > 16M pix
      "P6\n2 2\n255".getBytes, // header never commits maxval
      ppm("P6\n1 1\n255\n", Array[Byte](1, 2))) // one byte short
    both(blobs).foreach { case (nat, hof) =>
      assert(nat == null && hof == null, s"native=$nat hof=$hof")
    }
    assertAgree(blobs)
  }

  test("randomized blobs: native and HOF agree on 400 cases") {
    val rnd = new Random(42)
    val blobs = (0 until 400).map { i =>
      i % 4 match {
        case 0 => // random bytes (usually rejected)
          val b = new Array[Byte](rnd.nextInt(64)); rnd.nextBytes(b); b
        case 1 => // valid PPM, random dims and raster
          val w = 1 + rnd.nextInt(9); val h = 1 + rnd.nextInt(9)
          val r = new Array[Byte](w * h * 3); rnd.nextBytes(r)
          ppm(s"P6\n$w $h\n255\n", r)
        case 2 => // P6 prefix + random tail (exercises the header FSM)
          val b = new Array[Byte](rnd.nextInt(48)); rnd.nextBytes(b)
          "P6".getBytes ++ b
        case _ => // near-valid with a mutation somewhere
          val w = 1 + rnd.nextInt(5); val h = 1 + rnd.nextInt(5)
          val r = new Array[Byte](w * h * 3); rnd.nextBytes(r)
          val full = ppm(s"P6\n$w $h\n255\n", r)
          if (full.nonEmpty) full(rnd.nextInt(full.length)) =
            rnd.nextInt(256).toByte
          full
      }
    }
    assertAgree(blobs)
  }

  test("null blob and non-binary input are handled") {
    val df = Seq((1, Some(Array[Byte](1, 2))), (2, None))
      .toDF("i", "blob")
    val out = df.select(call_function("ppm_stats", $"blob").as("s"))
      .collect()
    assert(out.forall(_.isNullAt(0)))
    val err = intercept[Exception] {
      spark.range(1).select(call_function("ppm_stats", $"id")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("binary") ||
      err.getMessage.contains("ppm_stats"))
  }
}
