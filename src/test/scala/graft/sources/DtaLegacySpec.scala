package graft.sources

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.file.Files

import graft.SparkSpec

/** Hand-crafted legacy `.dta` files (binary layouts, versions < 117) — the
  * version/layout matrix of FIXTURES.md §3 `dta_compat_vNNN`, both endians.
  */
class DtaLegacySpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory("graft_legacy").resolve(name).toString

  /** Build a legacy dta with columns (b:int8, i:int16, l:int32, f:float,
    * d:double, s:str6) and 3 rows; last row all missing.
    */
  private def buildLegacy(version: Int, le: Boolean): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit =
      if (le) { w8(v); w8(v >> 8) } else { w8(v >> 8); w8(v) }
    def w32(v: Long): Unit =
      if (le) (0 until 4).foreach(i => w8((v >> (8 * i)).toInt))
      else (3 to 0 by -1).foreach(i => w8((v >> (8 * i)).toInt))
    def wf32(f: Float): Unit = w32(java.lang.Float.floatToIntBits(f).toLong & 0xffffffffL)
    def wf64(d: Double): Unit = {
      val bits = java.lang.Double.doubleToLongBits(d)
      if (le) (0 until 8).foreach(i => w8((bits >> (8 * i)).toInt))
      else (7 to 0 by -1).foreach(i => w8((bits >> (8 * i)).toInt))
    }
    def wfixed(s: String, len: Int): Unit = {
      val b = s.getBytes("ASCII")
      out.write(b, 0, math.min(b.length, len))
      (b.length until len).foreach(_ => w8(0))
    }

    val nvars = 6
    val nobs = 3
    // header
    w8(version); w8(if (le) 0x02 else 0x01); w8(0x01); w8(0x00)
    w16(nvars)
    if (version == 102) w16(nobs) else w32(nobs.toLong)
    // data label + timestamp
    val dataLabelLen = if (version < 108) 32 else 81
    wfixed("", dataLabelLen)
    if (version >= 105) wfixed("", 18)
    // typlist (1 byte per var)
    if (version >= 111) { w8(0xFB); w8(0xFC); w8(0xFD); w8(0xFE); w8(0xFF); w8(6) }
    else { w8('b'); w8('i'); w8('l'); w8('f'); w8('d'); w8(0x7F + 6) }
    // varnames
    val nameLen = if (version < 110) 9 else 33
    Seq("b", "i", "l", "f", "d", "s").foreach(wfixed(_, nameLen))
    // sortlist
    (0 to nvars).foreach(_ => w16(0))
    // fmtlist
    val fmtLen = if (version < 105) 7 else if (version < 114) 12 else 49
    (0 until nvars).foreach(_ => wfixed("", fmtLen))
    // lbllist
    val lblLen = if (version < 110) 9 else 33
    (0 until nvars).foreach(_ => wfixed("", lblLen))
    // variable labels
    val varLabelLen = if (version < 108) 32 else 81
    (0 until nvars).foreach(_ => wfixed("", varLabelLen))
    // expansion fields terminator
    if (version >= 110) { w8(0); w32(0L) }
    else if (version >= 105) { w8(0); w16(0) }
    // data rows
    def row(b: Int, i: Int, l: Long, f: Float, d: Double, s: String): Unit = {
      w8(b); w16(i); w32(l); wf32(f); wf64(d); wfixed(s, 6)
    }
    row(5, 300, 70000L, 1.5f, 2.25, "abc")
    row(-7, -300, -70000L, -0.5f, -2.5, "xyzxyz")
    // missing row: sentinels for v113+, above-max for older
    if (version >= 113) {
      w8(0x65); w16(0x7fe5); w32(0x7fffffe5L)
    } else {
      w8(0x7f); w16(0x7fff); w32(0x7fffffffL)
    }
    w32(0x7f000000L) // float missing bits
    // double missing 0x7fe0000000000000
    if (le) { (0 until 6).foreach(_ => w8(0)); w8(0xe0); w8(0x7f) }
    else { w8(0x7f); w8(0xe0); (0 until 6).foreach(_ => w8(0)) }
    wfixed("", 6)
    out.toByteArray
  }

  private def check(version: Int, le: Boolean): Unit = {
    val path = tmp(s"v${version}_${if (le) "le" else "be"}.dta")
    val fos = new FileOutputStream(path)
    fos.write(buildLegacy(version, le)); fos.close()
    val df = spark.read.format("readstat").load(path)
    import org.apache.spark.sql.types._
    assert(df.schema.map(_.dataType) ===
      Seq(ByteType, ShortType, IntegerType, FloatType, DoubleType, StringType))
    val rows = df.collect().map(_.toSeq)
    assert(rows(0) === Seq(5.toByte, 300.toShort, 70000, 1.5f, 2.25, "abc"))
    assert(rows(1) === Seq((-7).toByte, (-300).toShort, -70000, -0.5f, -2.5, "xyzxyz"))
    assert(rows(2) === Seq(null, null, null, null, null, null))
  }

  test("dta v102 (u16 row count, no timestamp, 7-byte formats)") { check(102, le = true) }
  test("dta v103 little-endian") { check(103, le = true) }
  test("dta v105 (2-byte expansion lengths)") { check(105, le = true) }
  test("dta v108 little-endian (legacy 9-char names, b/i/l/f/d typlist)") { check(108, le = true) }
  test("dta v110 little-endian") { check(110, le = true) }
  test("dta v111 typed typlist (0xFB..0xFF)") { check(111, le = true) }
  test("dta v113 sentinel missings") { check(113, le = true) }
  test("dta v114 49-byte formats") { check(114, le = true) }
  test("dta v115 little-endian") { check(115, le = true) }
  test("dta v114 big-endian") { check(114, le = false) }
  test("dta v108 big-endian") { check(108, le = false) }

  test("pre-118 strings decode as windows-1252") {
    // v114 file with a str6 column containing 0xE9 ('é' in cp1252)
    val path = tmp("cp1252.dta")
    val bytes = buildLegacy(114, le = true)
    // patch the first row's string cell: last 6 bytes of row 1 are "abc\0\0\0"
    // rows start after metadata; find "abc" and replace with caf<0xE9>
    val idx = {
      var i = -1
      var k = 0
      while (i < 0 && k + 3 <= bytes.length) {
        if (bytes(k) == 'a' && bytes(k + 1) == 'b' && bytes(k + 2) == 'c') i = k
        k += 1
      }
      i
    }
    assert(idx > 0)
    bytes(idx) = 'c'; bytes(idx + 1) = 'a'; bytes(idx + 2) = 'f'
    bytes(idx + 3) = 0xE9.toByte
    val fos = new FileOutputStream(path)
    fos.write(bytes); fos.close()
    val df = spark.read.format("readstat").load(path)
    assert(df.collect()(0).getString(5) === "caf\u00e9")
  }
}
