package graft.ops

/** Key equality for the per-key replay loops (GCRA throttle, LRU dedup),
  * matching how Spark GROUPS keys in a shuffle/sort: Catalyst normalizes
  * floating-point keys before hashing and ordering (NormalizeFloatingNumbers:
  * -0.0 → 0.0, every NaN → one canonical NaN), so rows carrying -0.0 and 0.0
  * — or two different NaN bit patterns — land in the same partition and sort
  * adjacently as ONE key run. The replay loops read the UN-normalized column
  * values back from the row, so their equality must apply the same rule:
  * plain `Object.equals` would split ±0.0 into two runs (resetting GCRA
  * state mid-run), and Scala's cooperative `==` would split NaNs (an LRU
  * that never dedups NaN keys). Everything non-float falls through to
  * `equals`.
  */
private[ops] object ReplayKeys {
  def eq(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (null, _) | (_, null) => false
    case (x: java.lang.Double, y: java.lang.Double) =>
      val dx = x.doubleValue; val dy = y.doubleValue
      dx == dy || (dx != dx && dy != dy)
    case (x: java.lang.Float, y: java.lang.Float) =>
      val fx = x.floatValue; val fy = y.floatValue
      fx == fy || (fx != fx && fy != fy)
    case _ => a.equals(b)
  }

  /** Hash consistent with [[eq]]: floats hashed through the same
    * normalization (±0.0 → +0.0, any NaN → the canonical NaN).
    */
  def hash(a: Any): Int = a match {
    case null => 0
    case d: java.lang.Double =>
      val dv = d.doubleValue
      java.lang.Double.hashCode(
        if (dv != dv) Double.NaN else if (dv == 0.0) 0.0 else dv)
    case f: java.lang.Float =>
      val fv = f.floatValue
      java.lang.Float.hashCode(
        if (fv != fv) Float.NaN else if (fv == 0.0f) 0.0f else fv)
    case x => x.hashCode()
  }

  /** Array-backed composite key with [[eq]]/[[hash]] element semantics — the
    * LRU map key (ArraySeq equality would use cooperative `==`, splitting
    * NaN keys into never-matching entries).
    */
  final class GroupKey(val a: Array[Any]) {
    override def equals(o: Any): Boolean = o match {
      case g: GroupKey =>
        val b = g.a
        if (b.length != a.length) false
        else {
          var i = 0
          while (i < a.length && ReplayKeys.eq(a(i), b(i))) i += 1
          i == a.length
        }
      case _ => false
    }
    override def hashCode(): Int = {
      var h = 1
      var i = 0
      while (i < a.length) { h = 31 * h + ReplayKeys.hash(a(i)); i += 1 }
      h
    }
  }
}
