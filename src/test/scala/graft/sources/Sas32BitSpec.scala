package graft.sources

import java.io.FileOutputStream
import java.nio.file.Files

import graft.SparkSpec
import graft.sources.readstat.sas.Sas

/** Hand-crafted 32-bit little-endian sas7bdat: 16-byte page bit offset,
  * 4-byte subheader integers, 4-byte signatures.
  */
class Sas32BitSpec extends SparkSpec {

  private def build(): Array[Byte] = {
    val headerLen = 1024
    val pageLen = 4096
    val rowLen = 16 // num(8) + str(8)
    val nRows = 3

    def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def putU32(b: Array[Byte], off: Int, v: Long): Unit =
      (0 until 4).foreach(i => b(off + i) = ((v >> (8 * i)) & 0xff).toByte)
    def putF64(b: Array[Byte], off: Int, d: Double): Unit = {
      val bits = java.lang.Double.doubleToRawLongBits(d)
      (0 until 8).foreach(i => b(off + i) = ((bits >> (8 * i)) & 0xff).toByte)
    }
    def putStr(b: Array[Byte], off: Int, s: String, len: Int): Unit = {
      java.util.Arrays.fill(b, off, off + len, ' '.toByte)
      val x = s.getBytes("ASCII")
      System.arraycopy(x, 0, b, off, x.length)
    }

    val header = new Array[Byte](headerLen)
    System.arraycopy(Sas.Magic, 0, header, 0, 32)
    header(32) = '2' // 32-bit
    header(35) = '2' // align1 = 0
    header(37) = 0x01 // LE
    header(39) = '1'
    header(70) = 20 // UTF-8
    putU32(header, 196, headerLen.toLong)
    putU32(header, 200, pageLen.toLong)
    putU32(header, 204, 2L) // meta + data page

    // ---- meta page ----
    val meta = new Array[Byte](pageLen)
    val bitOff = 16
    putU16(meta, bitOff, 0) // META
    val ptrBase = bitOff + 8
    val ptrSize = 12
    var top = pageLen
    var nSub = 0
    def addSub(bytes: Array[Byte]): Unit = {
      top -= bytes.length
      System.arraycopy(bytes, 0, meta, top, bytes.length)
      val p = ptrBase + nSub * ptrSize
      putU32(meta, p, top.toLong)
      putU32(meta, p + 4, bytes.length.toLong)
      meta(p + 8) = 0; meta(p + 9) = 0
      nSub += 1
    }
    // ROW_SIZE: fields at +5*4 rowLen, +6*4 rowCount, +9/10*4 colcounts, +15*4 mix
    val rowSize = new Array[Byte](480)
    putU32(rowSize, 0, 0xF7F7F7F7L)
    putU32(rowSize, 5 * 4, rowLen.toLong)
    putU32(rowSize, 6 * 4, nRows.toLong)
    putU32(rowSize, 9 * 4, 2L)
    putU32(rowSize, 10 * 4, 0L)
    putU32(rowSize, 15 * 4, 0L)
    addSub(rowSize)
    // COLUMN_SIZE
    val colSize = new Array[Byte](12)
    putU32(colSize, 0, 0xF6F6F6F6L)
    putU32(colSize, 4, 2L)
    addSub(colSize)
    // COLUMN_TEXT: sig + payload (u16 remainder + names)
    val textPayload = new Array[Byte](2 + 8)
    putStr(textPayload, 2, "num", 3)
    putStr(textPayload, 5, "st", 2)
    val colText = new Array[Byte](4 + textPayload.length)
    putU32(colText, 0, 0xFFFFFFFDL) // LE bytes FD FF FF FF
    System.arraycopy(textPayload, 0, colText, 4, textPayload.length)
    addSub(colText)
    // COLUMN_NAME: entries at +12 (intSize+8), 8B each; len = 20 + 8n
    val n = 2
    val colName = new Array[Byte](20 + 8 * n)
    putU32(colName, 0, 0xFFFFFFFFL)
    // entry 0: textIdx 0, off 2, len 3  (offsets into payload incl. remainder)
    putU16(colName, 12, 0); putU16(colName, 14, 2); putU16(colName, 16, 3)
    putU16(colName, 20, 0); putU16(colName, 22, 5); putU16(colName, 24, 2)
    addSub(colName)
    // COLUMN_ATTRS: entries at +12, step 12: u32 off, u32 len, type at +10
    val colAttrs = new Array[Byte](16 + 12 * n)
    putU32(colAttrs, 0, 0xFFFFFFFCL) // LE bytes FC FF FF FF
    putU32(colAttrs, 12, 0L); putU32(colAttrs, 16, 8L); colAttrs(12 + 10) = 1 // numeric
    putU32(colAttrs, 24, 8L); putU32(colAttrs, 28, 8L); colAttrs(24 + 10) = 2 // char
    addSub(colAttrs)
    putU16(meta, bitOff + 2, nSub)
    putU16(meta, bitOff + 4, nSub)

    // ---- data page ----
    val data = new Array[Byte](pageLen)
    putU16(data, bitOff, 256)
    putU16(data, bitOff + 2, nRows)
    putU16(data, bitOff + 4, 0)
    var off = bitOff + 8
    def row(d: Double, s: String): Unit = {
      putF64(data, off, d); putStr(data, off + 8, s, 8); off += rowLen
    }
    row(7.25, "aa")
    row(-1e6, "bbbb")
    // missing numeric: NaN bits
    putU32(data, off + 4, 0x7ff00000L); putStr(data, off + 8, "", 8); off += rowLen

    header ++ meta ++ data
  }

  test("32-bit sas7bdat parses pages, subheaders and rows") {
    val path = Files.createTempDirectory("graft_32").resolve("t32.sas7bdat").toString
    val fos = new FileOutputStream(path)
    fos.write(build()); fos.close()
    val df = spark.read.format("readstat").load(path)
    assert(df.columns.toSeq === Seq("num", "st"))
    val rows = df.collect().map(_.toSeq)
    assert(rows(0) === Seq(7.25, "aa"))
    assert(rows(1) === Seq(-1e6, "bbbb"))
    assert(rows(2) === Seq(null, null))
  }
}
