package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** REAL tar (POSIX ustar) walk — the container format multimodal
  * training data actually ships in: a WebDataset shard is exactly a
  * tar whose member names share a sample key before the first dot
  * ("000017.jpg" + "000017.txt" + "000017.json" = one sample). Layout
  * from the public POSIX.1-1988/ustar spec: 512-byte headers, octal
  * size fields, typeflags, name+prefix split, NUL-block terminator.
  *
  * `tar_entries(blob)` returns
  *
  *   array<struct<name, size, offset, typeflag>>
  *
  * one row per REGULAR FILE member (directories and other typeflags
  * are walked over but not emitted), where `offset`/`size` let the
  * caller slice the payload with plain `substring(blob, offset+1,
  * size)` — extraction composes with every codec kernel without a
  * second parser. GNU './PaxHeaders'-style extension records ('x',
  * 'g', 'L') are skipped by size like any member (long names beyond
  * ustar's 100+155 split are out of scope — WebDataset keys are
  * short). NULL for: headers whose checksum field fails the
  * unsigned-sum check, non-octal size fields, members overrunning
  * the blob, or a missing terminator (truncated archive) — a torn
  * shard must fail loudly, not ingest half.
  *
  * Scale shape: shards are the parallelism unit (one blob = one task
  * via binaryFile), the walk is O(members), payloads stay inside the
  * blob until a downstream projection slices exactly the members it
  * needs.
  */
case class TarEntries(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(TarEntries.entrySchema)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"tar_entries expects a binary arg, got ${t.simpleString}")
    }

  override def nullSafeEval(blob: Any): Any =
    TarEntries.entries(blob.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |${ev.value} = graft.functions.TarEntries.entries($b);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TarEntries =
    copy(child = newChild)
}

object TarEntries {

  val entrySchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("typeflag", IntegerType, nullable = false)))

  private def octal(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = off
    val end = off + len
    var seen = false
    while (i < end) {
      val c = b(i) & 0xff
      if (c == 0 || c == ' ') {
        if (seen) return v // NUL/space terminates
      } else if (c >= '0' && c <= '7') {
        v = (v << 3) | (c - '0')
        seen = true
        if (v < 0L) return -1L
      } else return -1L
      i += 1
    }
    if (seen) v else -1L
  }

  private def cstr(b: Array[Byte], off: Int, len: Int): String = {
    var n = 0
    while (n < len && b(off + n) != 0) n += 1
    new String(b, off, n, "US-ASCII")
  }

  def entries(b: Array[Byte]): GenericArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    var at = 0L
    var terminated = false
    while (!terminated) {
      if (at + 512 > b.length) return null // torn header / no terminator
      val base = at.toInt
      // all-NUL block: terminator (spec wants two; accept one + EOF)
      var allZero = true
      var i = 0
      while (allZero && i < 512) { if (b(base + i) != 0) allZero = false; i += 1 }
      if (allZero) {
        terminated = true
      } else {
        val size = octal(b, base + 124, 12)
        if (size < 0L) return null
        // header checksum: unsigned byte sum with the checksum field
        // itself read as spaces
        val declared = octal(b, base + 148, 8)
        var sum = 0L
        i = 0
        while (i < 512) {
          sum += (if (i >= 148 && i < 156) ' '.toLong
            else (b(base + i) & 0xffL))
          i += 1
        }
        if (declared != sum) return null
        val typeflag = b(base + 156) & 0xff
        val dataOff = at + 512L
        val padded = (size + 511L) / 512L * 512L
        if (dataOff + size > b.length) return null // torn member
        // regular file: '0' or NUL (old tar)
        if (typeflag == '0' || typeflag == 0) {
          val name = {
            val prefix = cstr(b, base + 345, 155)
            val n = cstr(b, base, 100)
            if (prefix.nonEmpty) prefix + "/" + n else n
          }
          out += new GenericInternalRow(Array[Any](
            UTF8String.fromString(name), size, dataOff, typeflag))
        }
        at = dataOff + padded
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** Deterministic WebDataset-shard fixture — `tar_fixture(id,
  * n_samples)`: a REAL ustar archive (correct checksums, octal
  * fields, 512-alignment, double-NUL terminator) holding n_samples
  * training samples; sample i carries
  *
  *  - `{i padded to 6}.png` — a real [[PngFixture]] image
  *    (id·31+i, dims (i%5+3)×(i%4+3))
  *  - `{i}.txt` — "sample {i} of shard {id}"
  *  - `{i}.cls` — the label, (id + i) % 10, as ASCII
  *
  * plus a leading `meta/` DIRECTORY entry and a skipped
  * `x`-typeflag pax header, so the walk proves it filters by
  * typeflag rather than position. */
case class TarFixture(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"tar_fixture expects (bigint, int) args, got $t")
    }

  override def nullSafeEval(id: Any, n: Any): Any =
    TarFixture.build(id.asInstanceOf[Long], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (id, n) => {
      s"""
         |${ev.value} = graft.functions.TarFixture.build($id, $n);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): TarFixture = copy(l, r)
}

object TarFixture {

  private def header(name: String, size: Long, typeflag: Char):
      Array[Byte] = {
    val h = new Array[Byte](512)
    val nb = name.getBytes("US-ASCII")
    require(nb.length <= 100, s"fixture name too long: $name")
    System.arraycopy(nb, 0, h, 0, nb.length)
    def oct(off: Int, len: Int, v: Long): Unit = {
      val s = java.lang.Long.toOctalString(v)
      val padded = ("0" * (len - 1 - s.length)) + s
      System.arraycopy(padded.getBytes("US-ASCII"), 0, h, off, len - 1)
      h(off + len - 1) = 0
    }
    oct(100, 8, 420L)   // mode 0644
    oct(108, 8, 0L); oct(116, 8, 0L) // uid/gid
    oct(124, 12, size)
    oct(136, 12, 0L)    // mtime
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // checksum spaces
    h(156) = typeflag.toByte
    System.arraycopy("ustar\u0000".getBytes("US-ASCII"), 0, h, 257, 6)
    h(263) = '0'; h(264) = '0' // version
    var sum = 0L
    var i = 0
    while (i < 512) { sum += h(i) & 0xffL; i += 1 }
    val cs = java.lang.Long.toOctalString(sum)
    val csp = ("0" * (6 - cs.length)) + cs
    System.arraycopy(csp.getBytes("US-ASCII"), 0, h, 148, 6)
    h(154) = 0; h(155) = ' '
    h
  }

  private def member(out: java.io.ByteArrayOutputStream, name: String,
      data: Array[Byte], typeflag: Char = '0'): Unit = {
    out.write(header(name, data.length.toLong, typeflag), 0, 512)
    out.write(data, 0, data.length)
    val pad = (512 - data.length % 512) % 512
    (0 until pad).foreach(_ => out.write(0))
  }

  def key(i: Int): String = f"$i%06d"

  def build(id: Long, nSamples: Int): Array[Byte] = {
    if (nSamples <= 0 || nSamples > 10000) return null
    val out = new java.io.ByteArrayOutputStream(nSamples * 2048)
    // directory entry (typeflag '5', size 0): walked over, not emitted
    out.write(header("meta/", 0L, '5'), 0, 512)
    // pax-style extended header (typeflag 'x'): skipped by size
    member(out, "meta/pax", "29 path=ignored-extension\n".getBytes, 'x')
    var i = 0
    while (i < nSamples) {
      val png = PngFixture.build(id * 31L + i, i % 5 + 3, i % 4 + 3)
      member(out, s"${key(i)}.png", png)
      member(out, s"${key(i)}.txt",
        s"sample $i of shard $id".getBytes("UTF-8"))
      member(out, s"${key(i)}.cls",
        java.lang.Long.toString(java.lang.Math.floorMod(id + i, 10L))
          .getBytes("US-ASCII"))
      i += 1
    }
    out.write(new Array[Byte](1024), 0, 1024) // double-NUL terminator
    out.toByteArray
  }
}
