package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the embedding hot paths (builder-prompt
  * extension ladder, tier (b): "a native Catalyst `Expression` (with
  * `doGenCode`) beats a Scala UDF beats anything else").
  *
  * The interpreted `aggregate`/`zip_with` higher-order functions these
  * replace are CodegenFallback: every element evaluation crosses a lambda
  * closure with boxing, and a 64-dim dot product costs ~130 interpreted
  * `Expression.eval` calls. [[DotF]] and [[SignSig]] generate the tight
  * fused loop instead, stay inside whole-stage codegen, and preserve the
  * HOF semantics BIT-FOR-BIT — same sequential IEEE add order (the q51/q56
  * oracle exactness contract, see Similarity.cosSeq), same null/length
  * behavior — so swapping them under `Similarity.dot`/`lshBucket` cannot
  * move a single oracled value (VectorExprsSpec pins the parity on random,
  * adversarial and edge inputs).
  *
  * Registration: [[VectorExprs.ensure]] registers both functions
  * idempotently on a live session (the engine's own entry points call it),
  * and [[GraftExtensions]] is the `spark.sql.extensions`-style injector for
  * spark-submit deployments.
  */
object VectorExprs {

  private def elemGetter(dt: DataType): (ArrayData, Int) => Double = dt match {
    case ArrayType(FloatType, _) => (a, i) => a.getFloat(i).toDouble
    case ArrayType(DoubleType, _) => (a, i) => a.getDouble(i)
    case other => throw new IllegalStateException(s"unsupported array type $other")
  }

  private def elemJava(dt: DataType, arr: String, i: String): String = dt match {
    case ArrayType(FloatType, _) => s"(double) $arr.getFloat($i)"
    case ArrayType(DoubleType, _) => s"$arr.getDouble($i)"
    case other => throw new IllegalStateException(s"unsupported array type $other")
  }

  private def arrayTypeOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  /** Σᵢ aᵢ·bᵢ in double precision over array<float|double> columns — the
    * codegen'd twin of `aggregate(zip_with(a, b, (x, y) => x.cast(double) *
    * y.cast(double)), 0.0, (acc, x) => acc + x)`. Parity contract (pinned by
    * VectorExprsSpec against the HOF form):
    *   - either input NULL → NULL (null-intolerant binary expression);
    *   - length mismatch → NULL (zip_with pads with null, null product
    *     poisons the fold);
    *   - any NULL element → NULL (same poisoning);
    *   - empty arrays → 0.0 (the fold's init);
    *   - accumulation strictly left-to-right in ascending index order —
    *     IEEE-identical to the HOF fold and DuckDB's positional-unnest sum.
    */
  case class DotF(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_dot"

    override def checkInputDataTypes(): TypeCheckResult =
      if (arrayTypeOk(left.dataType) && arrayTypeOk(right.dataType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

    @transient private lazy val getL = elemGetter(left.dataType)
    @transient private lazy val getR = elemGetter(right.dataType)

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n != b.numElements()) null
      else {
        var acc = 0.0
        var i = 0
        var poisoned = false
        while (i < n && !poisoned) {
          if (a.isNullAt(i) || b.isNullAt(i)) poisoned = true
          else { acc += getL(a, i) * getR(b, i); i += 1 }
        }
        if (poisoned) null else acc
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
           |final int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $acc = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |    $acc += ${elemJava(left.dataType, a, i)} * ${elemJava(right.dataType, b, i)};
           |  }
           |  if (!${ev.isNull}) ${ev.value} = $acc;
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotF =
      copy(left = newLeft, right = newRight)
  }

  /** The full sign-LSH signature in ONE codegen'd loop: bit b of the result
    * is set iff Σⱼ planes(b)(j)·vec(j) > 0 (Charikar STOC'02 hyperplane
    * signs). Replaces the nBits-fold composition `when(dot(emb, plane_b) >
    * 0, 1L << b).otherwise(0)` reduced with bitwiseOR — nBits × dim
    * interpreted lambda evals per row collapse into one fused
    * multiply-accumulate nest. Parity contract (VectorExprsSpec):
    *   - per-plane accumulation in ascending j, products plane·vec in double
    *     (multiplication is IEEE-commutative with the HOF's vec·plane);
    *   - NULL vector, length ≠ dim, or any NULL element → signature 0L
    *     (the HOF dot goes null, `when(null > 0)` falls to otherwise(0) for
    *     every plane) — the expression is therefore never null itself.
    */
  case class SignSig(child: Expression, planes: Seq[Seq[Double]])
      extends UnaryExpression {
    require(planes.nonEmpty && planes.size <= 63,
      s"sign signature needs 1..63 planes, got ${planes.size}")
    require(planes.forall(_.size == planes.head.size),
      "all hyperplanes must share one dimensionality")

    private val nBits = planes.size
    private val dim = planes.head.size
    @transient private lazy val flat: Array[Double] = planes.flatten.toArray

    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    override def prettyName: String = "graft_sign_sig"

    override def checkInputDataTypes(): TypeCheckResult =
      if (arrayTypeOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<float|double> vector, got " +
          child.dataType.catalogString)

    @transient private lazy val getV = elemGetter(child.dataType)

    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) 0L
      else {
        val a = v.asInstanceOf[ArrayData]
        val n = a.numElements()
        var ok = n == dim
        var i = 0
        while (ok && i < n) { if (a.isNullAt(i)) ok = false; i += 1 }
        if (!ok) 0L
        else {
          var sig = 0L
          var b = 0
          while (b < nBits) {
            var acc = 0.0
            var j = 0
            val off = b * dim
            while (j < dim) { acc += flat(off + j) * getV(a, j); j += 1 }
            if (acc > 0) sig |= 1L << b
            b += 1
          }
          sig
        }
      }
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val childGen = child.genCode(ctx)
      val p = ctx.addReferenceObj("graftPlanes", flat, "double[]")
      val a = ctx.freshName("vec")
      val n = ctx.freshName("n")
      val ok = ctx.freshName("ok")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val off = ctx.freshName("off")
      val javaType = CodeGenerator.javaType(dataType)
      ev.copy(code = code"""
        ${childGen.code}
        $javaType ${ev.value} = 0L;
        if (!${childGen.isNull}) {
          ArrayData $a = ${childGen.value};
          final int $n = $a.numElements();
          boolean $ok = ($n == $dim);
          if ($ok) {
            for (int $i = 0; $i < $n; $i++) {
              if ($a.isNullAt($i)) { $ok = false; break; }
            }
          }
          if ($ok) {
            for (int $b = 0; $b < $nBits; $b++) {
              double $acc = 0.0;
              final int $off = $b * $dim;
              for (int $j = 0; $j < $dim; $j++) {
                $acc += $p[$off + $j] * ${elemJava(child.dataType, a, j)};
              }
              if ($acc > 0) ${ev.value} |= (1L << $b);
            }
          }
        }
      """, isNull = FalseLiteral)
    }

    override protected def withNewChildInternal(newChild: Expression): SignSig =
      copy(child = newChild)
  }

  /** Extract a compile-time Seq[Seq[Double]] from the foldable
    * array<array<double>> literal the SQL surface passes as argument 2
    * (`typedlit(planes)` from the Scala surface).
    */
  private def planesFromExpr(p: Expression): Seq[Seq[Double]] = {
    val typeOk = p.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    require(p.foldable && typeOk,
      s"graft_sign_sig argument 2 must be a foldable array<array<double>> " +
        s"literal, got ${p.dataType.catalogString}")
    val outer = p.eval().asInstanceOf[ArrayData]
    (0 until outer.numElements())
      .map(i => outer.getArray(i).toDoubleArray().toSeq)
  }

  /** (identifier, info, builder) triples shared by [[ensure]] and
    * [[GraftExtensions]] so the two registration surfaces cannot drift.
    */
  val entries: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotF].getName, "graft_dot"),
      {
        case Seq(a, b) => DotF(a, b)
        case other => throw new IllegalArgumentException(
          s"graft_dot takes 2 arguments, got ${other.size}")
      }),
    (FunctionIdentifier("graft_sign_sig"),
      new ExpressionInfo(classOf[SignSig].getName, "graft_sign_sig"),
      {
        case Seq(v, p) => SignSig(v, planesFromExpr(p))
        case other => throw new IllegalArgumentException(
          s"graft_sign_sig takes 2 arguments, got ${other.size}")
      }))

  /** Idempotently register the graft functions on a live session (any
    * session — including one the caller built without [[GraftExtensions]],
    * e.g. the correctness driver's). Called by every engine entry point
    * that builds a plan over them.
    */
  def ensure(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    (entries ++ SketchExprs.entries).foreach { case (id, info, builder) =>
      if (!reg.functionExists(id)) reg.registerFunction(id, info, builder)
    }
  }
}

/** `spark.sql.extensions=graft.expressions.GraftExtensions` injector for
  * spark-submit deployments: registers the graft vector functions at session
  * build, so SQL users get `graft_dot`/`graft_sign_sig` without touching
  * engine entry points.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    (VectorExprs.entries ++ SketchExprs.entries).foreach(ext.injectFunction)
}
