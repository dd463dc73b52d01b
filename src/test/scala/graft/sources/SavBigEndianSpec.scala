package graft.sources

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.file.Files

import graft.SparkSpec

/** Hand-crafted big-endian uncompressed .sav (the reader detects byte order
  * from the layout code at offset 64).
  */
class SavBigEndianSpec extends SparkSpec {

  private def buildBigEndianSav(): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w32(v: Int): Unit = (3 to 0 by -1).foreach(i => w8(v >> (8 * i)))
    def wf64(d: Double): Unit = {
      val bits = java.lang.Double.doubleToRawLongBits(d)
      (7 to 0 by -1).foreach(i => w8((bits >> (8 * i)).toInt))
    }
    def wfixed(s: String, len: Int, pad: Byte): Unit = {
      val b = s.getBytes("ASCII")
      out.write(b, 0, math.min(b.length, len))
      (b.length until len).foreach(_ => w8(pad))
    }
    // 176-byte header
    wfixed("$FL2", 4, ' ')
    wfixed("@(#) graft BE", 60, ' ')      // product, up to offset 64
    w32(2)                                 // layout code (BE)
    w32(2)                                 // nominal case size (2 segments)
    w32(0)                                 // compression 0
    w32(0)                                 // weight index
    w32(3)                                 // row count
    wf64(100.0)                            // bias
    wfixed("01 Jan 26", 9, ' ')
    wfixed("00:00:00", 8, ' ')
    wfixed("", 64, ' ')                    // file label
    wfixed("", 3, 0)                       // padding → 176
    // variable records: NUM (numeric), STR8 (string len 8)
    w32(2); w32(0); w32(0); w32(0); w32(0); w32(0); wfixed("NUM", 8, ' ')
    w32(2); w32(8); w32(0); w32(0); w32(0); w32(0); wfixed("STR8", 8, ' ')
    // dict termination
    w32(999); w32(0)
    // data: 3 rows × (8B double + 8B string)
    wf64(1.5); wfixed("alpha", 8, ' ')
    wf64(-2.25); wfixed("beta", 8, ' ')
    // sysmiss + blank
    (0 until 8).foreach(i => w8(Seq(0xFF, 0xEF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF)(i)))
    wfixed("", 8, ' ')
    out.toByteArray
  }

  test("big-endian sav decodes numerics, strings and sysmiss") {
    val path = Files.createTempDirectory("graft_be").resolve("be.sav").toString
    val fos = new FileOutputStream(path)
    fos.write(buildBigEndianSav()); fos.close()
    val df = spark.read.format("readstat").load(path)
    assert(df.columns.toSeq === Seq("NUM", "STR8"))
    val rows = df.collect().map(_.toSeq)
    assert(rows(0) === Seq(1.5, "alpha"))
    assert(rows(1) === Seq(-2.25, "beta"))
    assert(rows(2) === Seq(null, null))
  }
}
