package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native form of TagOps.canonicalTags (round 6 — same extension rung as
  * [[SketchExprs]]): the HOF composition
  * `array_join(transform(array_sort(map_entries(tags)), e → concat(esc(k),
  * "=", esc(v))), ",")` is four interpreted higher-order functions per row —
  * the per-row cost of every tag-model groupBy key (q38/q45/q47) and of
  * q40's per-sample series census. This expression does one pass over the
  * MapData: sort entry indices by key bytes (UTF8String binary order —
  * identical to array_sort's struct comparison, keys are unique), skip
  * entries whose value is null (concat→null elements are ignored by
  * array_join), escape '\', '=', ',' with a backslash byte-wise (all ASCII,
  * safe inside UTF-8), and emit one string. Bit-parity with the HOF form is
  * pinned by TagOpsSpec.
  */
object TagExprs {

  case class CanonicalTags(child: Expression) extends UnaryExpression {

    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_canonical_tags"

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case MapType(StringType, StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires map<string,string>, got ${other.catalogString}")
    }

    override def nullSafeEval(input: Any): Any =
      kernel(input.asInstanceOf[MapData])

    private def writeEsc(out: java.io.ByteArrayOutputStream, s: UTF8String): Unit = {
      val b = s.getBytes
      var i = 0
      while (i < b.length) {
        val c = b(i)
        if (c == '\\' || c == '=' || c == ',') out.write('\\')
        out.write(c)
        i += 1
      }
    }

    def kernel(m: MapData): UTF8String = {
      val n = m.numElements()
      val keys = m.keyArray()
      val vals = m.valueArray()
      val idx = Array.range(0, n)
      // insertion sort on (key, value) bytes — array_sort's struct order.
      // Map keys are unique from every Spark constructor (dedup policy
      // EXCEPTION), so the value tiebreak is unreachable there; it is kept
      // so even exotic MapData with duplicate keys sorts identically to the
      // HOF form. Small maps: no boxed comparator needed.
      def less(a: Int, b: Int): Boolean = {
        val c = keys.getUTF8String(a).compareTo(keys.getUTF8String(b))
        if (c != 0) c < 0
        else {
          // nulls-first for values, Spark's default ordering
          val an = vals.isNullAt(a); val bn = vals.isNullAt(b)
          if (an || bn) an && !bn
          else vals.getUTF8String(a).compareTo(vals.getUTF8String(b)) < 0
        }
      }
      var i = 1
      while (i < n) {
        val x = idx(i)
        var j = i - 1
        while (j >= 0 && less(x, idx(j))) {
          idx(j + 1) = idx(j); j -= 1
        }
        idx(j + 1) = x
        i += 1
      }
      val out = new java.io.ByteArrayOutputStream(32)
      var first = true
      i = 0
      while (i < n) {
        val e = idx(i)
        if (!vals.isNullAt(e)) { // null value ⇒ null element ⇒ join skips it
          if (!first) out.write(',')
          first = false
          writeEsc(out, keys.getUTF8String(e))
          out.write('=')
          writeEsc(out, vals.getUTF8String(e))
        }
        i += 1
      }
      UTF8String.fromBytes(out.toByteArray)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("graftCanonTags", this, classOf[CanonicalTags].getName)
      nullSafeCodeGen(ctx, ev, m => s"${ev.value} = $ref.kernel($m);")
    }

    override protected def withNewChildInternal(newChild: Expression): CanonicalTags =
      copy(child = newChild)
  }
}
