package graft.compress

/** Gorilla-style time-series page codec: delta-of-delta timestamps + XOR
  * float compression, interleaved per point into one bit stream.
  *
  * Public basis: Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory
  * Time Series Database" (VLDB'15) §4.1 (timestamps) and §4.2 (values).
  * The reference repo has no analog (BASELINE.json north_rule requirement;
  * SURVEY.md §2.9) — nearest hook is its snappy request compression at
  * /root/reference/src/sinks/prometheus_remote_write.rs:203-207.
  *
  * Wire format (after the BitWriter 4-byte bit-length header):
  *   [32b n_points]
  *   if n>0: [64b first_ts][64b first_value_raw_bits]
  *   per subsequent point: [dod bits][xor bits]
  *
  * Delta-of-delta buckets (zigzag-free, signed ranges as in the paper but
  * widened with a 64-bit escape so arbitrary i64 timestamps round-trip):
  *   '0'                      dod == 0
  *   '10'   + 7b              dod in [-63, 64]
  *   '110'  + 9b              dod in [-255, 256]
  *   '1110' + 12b             dod in [-2047, 2048]
  *   '11110'+ 32b             dod in [Int.MinValue+1, Int.MaxValue] (offset-free raw 32)
  *   '11111'+ 64b             raw 64-bit dod
  *
  * XOR value scheme (paper §4.2):
  *   '0'            value identical to previous (xor == 0)
  *   '10'           meaningful bits fit previous (leading, sigbits) window
  *   '11' + 5b leading + 6b sigbits(64→0) + sigbits
  *
  * Values round-trip bit-for-bit, including NaN payloads and -0.0
  * (doubleToRawLongBits both sides).
  */
object GorillaCodec {

  def encode(ts: Array[Long], values: Array[Double]): Array[Byte] = {
    require(ts.length == values.length, "ts/values length mismatch")
    val n = ts.length
    val w = new BitWriter(16 + n) // rough: ~2 words per point worst case grows anyway
    w.writeBits(n.toLong, 32)
    if (n > 0) {
      w.writeBits(ts(0), 64)
      w.writeBits(java.lang.Double.doubleToRawLongBits(values(0)), 64)
      var prevTs = ts(0)
      var prevDelta = 0L
      var prevBits = java.lang.Double.doubleToRawLongBits(values(0))
      var prevLeading = -1
      var prevSig = 0
      var i = 1
      while (i < n) {
        // --- timestamp: delta of delta ---
        val delta = ts(i) - prevTs
        val dod = delta - prevDelta
        if (dod == 0L) w.writeBit(false)
        else if (dod >= -63 && dod <= 64) { w.writeBits(0x2, 2); w.writeBits(dod + 63, 7) }
        else if (dod >= -255 && dod <= 256) { w.writeBits(0x6, 3); w.writeBits(dod + 255, 9) }
        else if (dod >= -2047 && dod <= 2048) { w.writeBits(0xe, 4); w.writeBits(dod + 2047, 12) }
        else if (dod >= Int.MinValue.toLong + 1 && dod <= Int.MaxValue.toLong) {
          w.writeBits(0x1e, 5); w.writeBits(dod + Int.MaxValue.toLong, 32)
        } else { w.writeBits(0x1f, 5); w.writeBits(dod, 64) }
        prevDelta = delta
        prevTs = ts(i)
        // --- value: XOR ---
        val bits = java.lang.Double.doubleToRawLongBits(values(i))
        val xor = bits ^ prevBits
        if (xor == 0L) w.writeBit(false)
        else {
          val leading = math.min(java.lang.Long.numberOfLeadingZeros(xor), 31)
          val trailing = java.lang.Long.numberOfTrailingZeros(xor)
          val sig = 64 - leading - trailing
          if (prevLeading >= 0 && leading >= prevLeading &&
              trailing >= (64 - prevLeading - prevSig)) {
            // fits the previous window
            w.writeBits(0x2, 2)
            w.writeBits(xor >>> (64 - prevLeading - prevSig), prevSig)
          } else {
            w.writeBits(0x3, 2)
            w.writeBits(leading.toLong, 5)
            w.writeBits(sig.toLong & 0x3f, 6) // 64 encodes as 0
            w.writeBits(xor >>> trailing, sig)
            prevLeading = leading
            prevSig = sig
          }
        }
        prevBits = bits
        i += 1
      }
    }
    w.toByteArray
  }

  /** Decode a page. Returns (timestamps, values) with values bit-exact. */
  def decode(page: Array[Byte]): (Array[Long], Array[Double]) = {
    val r = new BitReader(page)
    val n = r.readBits(32).toInt
    val ts = new Array[Long](n)
    val values = new Array[Double](n)
    if (n > 0) {
      ts(0) = r.readBits(64)
      var prevBits = r.readBits(64)
      values(0) = java.lang.Double.longBitsToDouble(prevBits)
      var prevTs = ts(0)
      var prevDelta = 0L
      var prevLeading = 0
      var prevSig = 0
      var i = 1
      while (i < n) {
        // --- timestamp ---
        val dod: Long =
          if (!r.readBit()) 0L
          else if (!r.readBit()) r.readBits(7) - 63
          else if (!r.readBit()) r.readBits(9) - 255
          else if (!r.readBit()) r.readBits(12) - 2047
          else if (!r.readBit()) r.readBits(32) - Int.MaxValue.toLong
          else r.readBits(64)
        prevDelta += dod
        prevTs += prevDelta
        ts(i) = prevTs
        // --- value ---
        if (!r.readBit()) values(i) = java.lang.Double.longBitsToDouble(prevBits)
        else {
          if (!r.readBit()) {
            val xor = r.readBits(prevSig) << (64 - prevLeading - prevSig)
            prevBits ^= xor
          } else {
            val leading = r.readBits(5).toInt
            var sig = r.readBits(6).toInt
            if (sig == 0) sig = 64
            val xor = r.readBits(sig) << (64 - leading - sig)
            prevBits ^= xor
            prevLeading = leading
            prevSig = sig
          }
          values(i) = java.lang.Double.longBitsToDouble(prevBits)
        }
        i += 1
      }
    }
    (ts, values)
  }
}
