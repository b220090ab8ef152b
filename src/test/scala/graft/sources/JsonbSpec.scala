package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

/** JSONB decoder spec with a test-side encoder (same public format
  * doc, independent code path), anchored by hand-assembled golden
  * bytes for the header/offset layout. */
object JsonbWriter {
  sealed trait J
  case object JNull extends J
  final case class JBool(v: Boolean) extends J
  final case class JI16(v: Int) extends J
  final case class JI32(v: Int) extends J
  final case class JI64(v: Long) extends J
  final case class JU64(v: Long) extends J
  final case class JD(v: Double) extends J
  final case class JS(v: String) extends J
  final case class JDec(s: String, precision: Int, scale: Int) extends J
  final case class JArr(vs: Seq[J], large: Boolean = false) extends J
  final case class JObj(fs: Seq[(String, J)], large: Boolean = false) extends J

  private def le(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >> (8 * i)) & 0xff).toByte)

  private def varint(n: Int): Array[Byte] = {
    val out = new ArrayBuffer[Byte]()
    var v = n
    while ({
      val b = v & 0x7f; v >>= 7
      out += (if (v != 0) (b | 0x80) else b).toByte
      v != 0
    }) ()
    out.toArray
  }

  /** (type byte, standalone payload). Inlining decided by container. */
  private def enc(j: J): (Int, Array[Byte]) = j match {
    case JNull => (0x04, Array(0.toByte))
    case JBool(b) => (0x04, Array(if (b) 1.toByte else 2.toByte))
    case JI16(v) => (0x05, le(v.toLong, 2))
    case JI32(v) => (0x07, le(v.toLong, 4))
    case JI64(v) => (0x09, le(v, 8))
    case JU64(v) => (0x0a, le(v, 8))
    case JD(v) => (0x0b, le(java.lang.Double.doubleToLongBits(v), 8))
    case JS(s) =>
      val b = s.getBytes(UTF_8)
      (0x0c, varint(b.length) ++ b)
    case JDec(s, p, sc) =>
      val d = BinlogWriter.decimal(s, p, sc)
      (0x0f, Array(Binlog.Type.NewDecimal.toByte) ++ varint(d.length + 2) ++
        Array(p.toByte, sc.toByte) ++ d)
    case JArr(vs, large) => (if (large) 0x03 else 0x02, cont(None, vs, large))
    case JObj(fs, large) => (if (large) 0x01 else 0x00, cont(Some(fs.map(_._1)), fs.map(_._2), large))
  }

  private def inlineable(typ: Int, large: Boolean): Boolean =
    typ == 0x04 || typ == 0x05 || typ == 0x06 || (large && (typ == 0x07 || typ == 0x08))

  private def cont(keys: Option[Seq[String]], vs: Seq[J], large: Boolean): Array[Byte] = {
    val w = if (large) 4 else 2
    val n = vs.length
    val encd = vs.map(enc)
    val keyBytes = keys.getOrElse(Nil).map(_.getBytes(UTF_8))
    val headerLen = 2 * w + keys.map(_ => n * (w + 2)).getOrElse(0) + n * (1 + w)
    var dataOff = headerLen + keyBytes.map(_.length).sum
    val keyEntries = new ArrayBuffer[Byte]()
    var ko = headerLen
    keyBytes.foreach { kb =>
      keyEntries ++= le(ko.toLong, w) ++ le(kb.length.toLong, 2)
      ko += kb.length
    }
    val valEntries = new ArrayBuffer[Byte]()
    val data = new ArrayBuffer[Byte]()
    encd.foreach { case (typ, payload) =>
      valEntries += typ.toByte
      if (inlineable(typ, large)) valEntries ++= payload.padTo(w, 0.toByte)
      else {
        valEntries ++= le(dataOff.toLong, w)
        data ++= payload
        dataOff += payload.length
      }
    }
    val size = headerLen + keyBytes.map(_.length).sum + data.length
    (le(n.toLong, w) ++ le(size.toLong, w)) ++ keyEntries ++ valEntries ++
      keyBytes.flatten ++ data
  }

  def blob(j: J): Array[Byte] = {
    val (t, p) = enc(j)
    Array(t.toByte) ++ p
  }
}

class JsonbSpec extends AnyFunSuite {
  import JsonbWriter._

  test("golden: {\"a\":1} hand-assembled header/offset layout") {
    val bytes = Array(0x00, 0x01, 0x00, 0x0c, 0x00, 0x0b, 0x00, 0x01, 0x00,
      0x05, 0x01, 0x00, 'a'.toInt).map(_.toByte)
    assert(Jsonb.decode(bytes) == """{"a":1}""")
    assert(blob(JObj(Seq("a" -> JI16(1)))).toSeq == bytes.toSeq)
  }

  test("small object with every scalar shape") {
    val j = JObj(Seq(
      "n" -> JNull, "t" -> JBool(true), "f" -> JBool(false),
      "i" -> JI16(-7), "big" -> JI64(9007199254740993L),
      "u" -> JU64(-1L), "d" -> JD(1.5), "s" -> JS("héllo\"quote\n")))
    assert(Jsonb.decode(blob(j)) ==
      """{"n":null,"t":true,"f":false,"i":-7,"big":9007199254740993,""" +
        """"u":18446744073709551615,"d":1.5,"s":"héllo\"quote\n"}""")
  }

  test("nested arrays and objects; large variants inline int32") {
    val j = JArr(Seq(
      JI16(1),
      JArr(Seq(JI32(100000), JS("x")), large = true),
      JObj(Seq("k" -> JArr(Seq(JNull))))))
    assert(Jsonb.decode(blob(j)) == """[1,[100000,"x"],{"k":[null]}]""")
  }

  test("multi-byte varint string length (len > 127)") {
    val s = "y" * 200
    assert(Jsonb.decode(blob(JS(s))) == "\"" + s + "\"")
  }

  test("opaque NEWDECIMAL renders as bare decimal") {
    assert(Jsonb.decode(blob(JDec("-12345.67", 10, 2))) == "-12345.67")
    assert(Jsonb.decode(blob(JArr(Seq(JDec("0.5", 3, 1))))) == "[0.5]")
  }

  test("unknown type bytes and bad literals fail loudly") {
    assert(intercept[UnsupportedOperationException](
      Jsonb.decode(Array(0x0d.toByte, 0))).getMessage.contains("unsupported"))
    val e = intercept[IllegalArgumentException](
      Jsonb.decode(Array(0x04.toByte, 9.toByte)))
    assert(e.getMessage.contains("literal"))
    assert(intercept[IllegalArgumentException](
      Jsonb.decode(Array.emptyByteArray)).getMessage.contains("empty"))
  }
}
