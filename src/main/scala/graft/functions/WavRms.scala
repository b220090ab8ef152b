package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** RMS amplitude of a WAV blob, in [0, 1] (full-scale sine ≈ 0.707) —
  * REAL per-sample feature extraction over `BinaryType`, not a stub:
  * one fused loop over the data chunk, whole-stage-codegen'd, zero
  * codec dependencies.
  *
  * This is the audio analog of [[graft.ops.Multimodal.headerDecode]]:
  * where that parses metadata, this consumes the PAYLOAD (every
  * sample), demonstrating the mapInPandas-class "decode + feature"
  * step as a native columnar kernel. Blobs still never shuffle — the
  * expression reduces each blob to one double in the scan stage.
  *
  * Round 11: the canonical-44-byte-only restriction is gone — the
  * kernel now walks the RIFF chunk list for real (16/18/40-byte fmt,
  * `fact`/`LIST`/other chunks before `data`, word-aligned chunk
  * padding), and DECODES G.711 companded audio: formats 6 (A-law)
  * and 7 (μ-law), the 8-bit telephony codecs, expand through the
  * CCITT G.711 segment tables (a public ITU spec) to 16-bit linear
  * before the RMS fold — pinned in WavRmsSpec against the JDK's
  * independent javax.sound ULAW/ALAW codecs over all 256 byte values.
  *
  * Supported: format 1 (PCM, 16-bit) and formats 6/7 (8-bit G.711).
  * NULL for: non-WAV signatures, walks that never find both a ≥16-byte
  * `fmt ` and a `data` chunk, other format codes, or bit widths other
  * than the format's canonical one. The data-chunk length is clamped
  * to the payload actually present, so truncated blobs yield the RMS
  * of what is there rather than reading past the buffer.
  *
  * Registered as SQL function `wav_rms` by [[graft.GraftExtensions]].
  */
case class WavRms(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"wav_rms expects a binary arg, got ${t.simpleString}")
    }

  override def nullSafeEval(blob: Any): Any = {
    val b = blob.asInstanceOf[Array[Byte]]
    WavRms.rms(b) match {
      case Double.NegativeInfinity => null
      case v => v
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val v = ctx.freshName("rmsv")
      s"""
         |double $v = graft.functions.WavRms.rms($b);
         |if ($v == Double.NEGATIVE_INFINITY) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $v;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WavRms =
    copy(child = newChild)
}

object WavRms {

  /** G.711 μ-law byte → 16-bit linear (CCITT segment expansion:
    * complement, BIAS=0x84 mantissa offset, 3-bit segment shift). */
  val UlawTable: Array[Short] = Array.tabulate(256) { v =>
    val u = ~v & 0xff
    var t = ((u & 0x0f) << 3) + 0x84
    t <<= (u & 0x70) >> 4
    (if ((u & 0x80) != 0) 0x84 - t else t - 0x84).toShort
  }

  /** G.711 A-law byte → 16-bit linear (0x55 toggle, per-segment
    * mantissa offset, shift for segments ≥ 2). */
  val AlawTable: Array[Short] = Array.tabulate(256) { v =>
    val a = v ^ 0x55
    var t = (a & 0x0f) << 4
    val seg = (a & 0x70) >> 4
    if (seg == 0) t += 8
    else if (seg == 1) t += 0x108
    else { t += 0x108; t <<= seg - 1 }
    (if ((a & 0x80) != 0) t else -t).toShort
  }

  @inline private def leU16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  @inline private def leU32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  /** Shared kernel for the interpreted and codegen paths (one static
    * call from generated Java keeps the two bit-identical).
    * Returns NEGATIVE_INFINITY as the in-band "null" marker. */
  def rms(b: Array[Byte]): Double = {
    if (b.length < 12 ||
      b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
      b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E')
      return Double.NegativeInfinity
    // RIFF chunk walk: find the first `fmt ` (≥ 16 bytes) and the
    // first `data`. Long cursor — a hostile u32 size must not wrap.
    var at = 12L
    var audioFormat = -1
    var bitsPerSample = -1
    var dataOff = -1L
    var dataLen = 0L
    while (at + 8 <= b.length && (audioFormat < 0 || dataOff < 0)) {
      val off = at.toInt
      val size = leU32(b, off + 4)
      val pOff = off + 8
      if (b(off) == 'f' && b(off + 1) == 'm' && b(off + 2) == 't' &&
        b(off + 3) == ' ') {
        if (audioFormat < 0) {
          if (size < 16L || pOff + 16 > b.length)
            return Double.NegativeInfinity // torn/short fmt: refuse
          audioFormat = leU16(b, pOff)
          bitsPerSample = leU16(b, pOff + 14)
        }
      } else if (b(off) == 'd' && b(off + 1) == 'a' &&
        b(off + 2) == 't' && b(off + 3) == 'a') {
        if (dataOff < 0L) { dataOff = pOff.toLong; dataLen = size }
      }
      at += 8L + size + (size & 1L) // chunks are word-aligned
    }
    if (audioFormat < 0 || dataOff < 0L) return Double.NegativeInfinity
    // clamp to the payload actually present; whole samples only
    val avail = math.min(dataLen, b.length.toLong - dataOff)
    if (avail < 0L) return Double.NegativeInfinity
    val base = dataOff.toInt
    audioFormat match {
      case 1 => // 16-bit linear PCM
        if (bitsPerSample != 16) return Double.NegativeInfinity
        val n = (avail / 2).toInt
        if (n == 0) return 0.0
        var acc = 0.0
        var i = 0
        while (i < n) {
          val off = base + 2 * i
          val s = ((b(off) & 0xff) | (b(off + 1) << 8)).toShort
          val x = s / 32768.0
          acc += x * x
          i += 1
        }
        math.sqrt(acc / n)
      case 6 | 7 => // G.711 A-law / μ-law, 8-bit companded
        if (bitsPerSample != 8) return Double.NegativeInfinity
        val table = if (audioFormat == 6) AlawTable else UlawTable
        val n = avail.toInt
        if (n == 0) return 0.0
        var acc = 0.0
        var i = 0
        while (i < n) {
          val x = table(b(base + i) & 0xff) / 32768.0
          acc += x * x
          i += 1
        }
        math.sqrt(acc / n)
      case _ => Double.NegativeInfinity
    }
  }
}
