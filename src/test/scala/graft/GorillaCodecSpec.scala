package graft

import graft.compress.{BitReader, BitWriter, GorillaCodec}
import org.scalatest.funsuite.AnyFunSuite

/** Property-style round-trip tests (seeded PRNG; reproducible).
  * Coverage per FIXTURES.md §3: monotone ts with jitter, constant /
  * slowly-varying / random values, NaN payloads, ±0, ±Inf, counter resets.
  */
class GorillaCodecSpec extends AnyFunSuite {

  private def assertRoundTrip(ts: Array[Long], vs: Array[Double], tag: String): Unit = {
    val page = GorillaCodec.encode(ts, vs)
    val (ts2, vs2) = GorillaCodec.decode(page)
    assert(ts2.sameElements(ts), s"$tag: timestamps")
    assert(vs2.length == vs.length, s"$tag: length")
    vs.indices.foreach { i =>
      assert(java.lang.Double.doubleToRawLongBits(vs2(i)) ==
        java.lang.Double.doubleToRawLongBits(vs(i)), s"$tag: value $i")
    }
  }

  test("bitstream round-trips arbitrary bit runs") {
    val w = new BitWriter()
    val fields = Seq((0x5L, 3), (0L, 1), (0xdeadbeefL, 32), (-1L, 64), (1L, 1), (0x7fL, 7))
    fields.foreach { case (v, n) => w.writeBits(v, n) }
    val r = new BitReader(w.toByteArray)
    fields.foreach { case (v, n) =>
      val mask = if (n == 64) -1L else (1L << n) - 1
      assert(r.readBits(n) == (v & mask), s"field ($v,$n)")
    }
  }

  test("empty page") {
    val (ts, vs) = GorillaCodec.decode(GorillaCodec.encode(Array.empty, Array.empty))
    assert(ts.isEmpty && vs.isEmpty)
  }

  test("special values survive bit-for-bit (NaN payloads, -0.0, ±Inf)") {
    val specials = Array(Double.NaN,
      java.lang.Double.longBitsToDouble(0x7ff8000000000042L), // NaN with payload
      -0.0, 0.0, Double.PositiveInfinity, Double.NegativeInfinity,
      Double.MinPositiveValue, Double.MaxValue, -Double.MaxValue)
    assertRoundTrip(Array.tabulate(specials.length)(i => 1000L + i * 15), specials, "specials")
    specials.foreach(v => assertRoundTrip(Array(123456789L), Array(v), s"single $v"))
  }

  test("constant-value regular-interval page compresses near 2 bits/point") {
    val n = 1000
    val ts = Array.tabulate(n)(i => 1700000000L + i * 60L)
    val vs = Array.fill(n)(42.5)
    val page = GorillaCodec.encode(ts, vs)
    // header 4 + n 4 + first point 16 bytes; rest ~2 bits/point
    assert(page.length < 24 + 16 + n / 4, s"page too big: ${page.length} bytes")
    assertRoundTrip(ts, vs, "constant")
  }

  test("property: 300 seeded random pages round-trip bit-for-bit") {
    val rnd = new scala.util.Random(42)
    (0 until 300).foreach { trial =>
      val n = rnd.nextInt(200)
      var t = 1700000000000L
      val ts = Array.fill(n) { t += rnd.nextInt(100000) - 10; t }
      val vs = Array.fill(n) {
        rnd.nextInt(4) match {
          case 0 => rnd.nextDouble() * 2e12 - 1e12
          case 1 => Array(0.0, -0.0, 1.0, Double.NaN, Double.PositiveInfinity,
            Double.NegativeInfinity)(rnd.nextInt(6))
          case 2 => java.lang.Double.longBitsToDouble(rnd.nextLong()) // any bit pattern
          case _ => (rnd.nextInt(1000) * 10).toDouble // slowly-varying / repeated
        }
      }
      assertRoundTrip(ts, vs, s"trial $trial")
    }
  }

  test("property: extreme i64 timestamps hit the raw-64 dod escape") {
    val rnd = new scala.util.Random(7)
    (0 until 50).foreach { trial =>
      val ts = Array.fill(20)(rnd.nextLong() / 4)
      assertRoundTrip(ts, Array.fill(20)(1.0), s"extreme $trial")
    }
  }

  test("counter-reset shaped series round-trips") {
    val ts = Array.tabulate(100)(i => 1000L + i * 15)
    val vs = Array.tabulate(100)(i => if (i % 37 == 0) 0.0 else (i % 37) * 13.7)
    assertRoundTrip(ts, vs, "counter-reset")
  }
}
