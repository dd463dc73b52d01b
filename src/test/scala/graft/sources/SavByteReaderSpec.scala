package graft.sources

import java.io.ByteArrayInputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.readstat.spss.Sav

/** Regression: `ByteReader.skip` must advance `pos` (r2 verdict "what's
  * wrong" #1 — `pos0 += 0` silently corrupted any future skip-then-read).
  */
class SavByteReaderSpec extends AnyFunSuite {

  test("skip advances pos and the next read sees the right bytes") {
    val data = (0 until 64).map(_.toByte).toArray
    val r = Sav.ByteReader(new ByteArrayInputStream(data))
    r.readFully(4)
    assert(r.pos === 4L)
    r.skip(10)
    assert(r.pos === 14L)
    val next = r.readFully(2)
    assert(next.toSeq === Seq(14.toByte, 15.toByte))
    assert(r.pos === 16L)
  }

  test("skip past a stream that cannot skip still advances pos") {
    // a stream whose skip() always returns 0 forces the readFully fallback
    val in = new ByteArrayInputStream((0 until 32).map(_.toByte).toArray) {
      override def skip(n: Long): Long = 0L
    }
    val r = Sav.ByteReader(in)
    r.skip(7)
    assert(r.pos === 7L)
    assert(r.readFully(1).head === 7.toByte)
  }
}
