package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statement-level VTL programs (reference:
  * lib/vtl/src/compiler/statement.rs:13-80 — `If / For / Continue / Break /
  * Assign / Call / Return`), compiled Spark-first: a program folds over an
  * SSA environment of named Columns, so the WHOLE multi-statement program
  * lowers to ONE `Project` over the input — Catalyst then constant-folds and
  * prunes it exactly like vtl's own compile-time folding
  * (lib/vtl/src/compiler/binary.rs:130-170). Nothing here is row-at-a-time:
  * an N-statement program costs the same scan as a single `select`.
  *
  * Mirrored semantics, and the honest divergences:
  *  - `if` takes a boolean condition and runs one block
  *    (if_statement.rs:22-43); both blocks compile from the SAME pre-branch
  *    environment and their assignments merge per-field with
  *    `when(cond, thenVal).otherwise(elseVal)`. A field assigned in only one
  *    branch reads as null in the other (vtl: undefined resolves to null).
  *    A NULL condition takes the else block (Spark CASE semantics; vtl makes
  *    a non-boolean condition a compile/runtime error — null never reaches a
  *    healthy vtl condition, so the shapes agree on real programs).
  *  - `for k, v in <map>` iterates entries in sorted-key order (vtl objects
  *    are BTreeMaps — for_statement.rs:44-56). `continue` skips an entry,
  *    `break` ends the iteration at the first entry whose predicate fires
  *    (well-defined because the order is sorted). The supported body shape
  *    is the reference's dominant loop idiom `.target[kExpr] = vExpr`
  *    (building/rewriting a map), compiled declaratively:
  *    sort → break-prefix (`slice`) → continue-filter → entry transform →
  *    `map_from_entries`. Arbitrary cross-field writes from inside a loop
  *    body would be per-row imperative state and are NOT supported — chain
  *    statements instead.
  *  - `del(.field)` (the mutating `Call`, statement.rs:58-62) removes the
  *    field from the program environment; INSIDE a branch it nulls the field
  *    instead (a Spark schema is static per-plan where a vtl event is
  *    dynamic per-row — documented divergence).
  *  - `return` (statement.rs:64-78) must be the FINAL statement and selects
  *    the returned fields; without it the full environment (".") is
  *    returned, like vtl's implicit return. Early return inside a branch is
  *    vtl's abort/emit idiom — routing/filtering whole events is
  *    [[graft.plans.Topology]]'s job, not an expression program's.
  */
object VtlProgram {

  /** Ordered SSA environment: field name -> the Column computing it. */
  type Env = Seq[(String, Column)]

  sealed trait Stmt

  /** `field = expr` (assignment.rs); `expr` sees every prior assignment. */
  final case class Assign(field: String, expr: Env => Column) extends Stmt

  /** `if cond { … } else { … }` (if_statement.rs). */
  final case class If(cond: Env => Column, thenBlock: Seq[Stmt],
      elseBlock: Seq[Stmt] = Nil) extends Stmt

  /** `del(.field)` — the mutating function-call statement. */
  final case class Del(field: String) extends Stmt

  /** `for k, v in iter { … }` over a map, body = the map-building idiom. */
  final case class ForKV(target: String, iter: Env => Column,
      body: ForBody) extends Stmt

  /** `return { f1, f2, … }` — must be the program's final statement. */
  final case class Return(fields: Seq[String]) extends Stmt

  /** Per-entry loop body. `continueWhen(k, v)` skips the entry;
    * `breakWhen(k, v)` ends iteration BEFORE the firing entry (sorted-key
    * order, like the reference's BTreeMap); the kept entries are rewritten
    * to `(yieldKey(k, v), yieldValue(k, v))` and collected into the target
    * map.
    */
  final case class ForBody(
      continueWhen: Option[(Column, Column) => Column] = None,
      breakWhen: Option[(Column, Column) => Column] = None,
      yieldKey: (Column, Column) => Column = (k, _) => k,
      yieldValue: (Column, Column) => Column = (_, v) => v)

  /** Read a field from the program environment — a path query `.f` in vtl
    * terms; an undefined field resolves to null, as in vtl.
    */
  def ref(env: Env, f: String): Column =
    env.collectFirst { case (n, c) if n == f => c }.getOrElse(lit(null))

  private def get(env: Env, f: String): Column = ref(env, f)

  private def set(env: Env, f: String, c: Column): Env =
    if (env.exists(_._1 == f))
      env.map { case (n, old) => if (n == f) (n, c) else (n, old) }
    else env :+ (f -> c)

  private def step(env: Env, st: Stmt): Env = st match {
    case Assign(f, e) => set(env, f, e(env))
    case Del(f)       => env.filterNot(_._1 == f)

    case If(cond, tb, eb) =>
      val c = cond(env)
      val tEnv = tb.foldLeft(env)(step)
      val eEnv = eb.foldLeft(env)(step)
      val names = (env.map(_._1) ++ tEnv.map(_._1) ++ eEnv.map(_._1)).distinct
      names.map { n =>
        val tOpt = tEnv.collectFirst { case (m, v) if m == n => v }
        val eOpt = eEnv.collectFirst { case (m, v) if m == n => v }
        (tOpt, eOpt) match {
          // untouched by both blocks (same Column instance survives the
          // folds): keep the field as-is, no CASE wrapper
          case (Some(tv), Some(ev)) if tv eq ev => n -> tv
          case _ =>
            n -> when(c, tOpt.getOrElse(lit(null)))
              .otherwise(eOpt.getOrElse(lit(null)))
        }
      }

    case ForKV(target, iter, body) =>
      val iterCol = iter(env)
      staticEntries(iterCol) match {
        case Some(kvs) => set(env, target, lowerForKVStatic(kvs, body))
        case None => set(env, target, lowerForKVDynamic(iterCol, body))
      }

    case r: Return =>
      throw new IllegalArgumentException(
        s"return must be the program's final statement, found mid-block: $r")
  }

  /** The map literal's (key, value) pairs when the loop target is a
    * compile-time CreateMap with foldable, distinct, non-null string keys —
    * the vtl map-literal idiom. Anything else (map columns, map_concat,
    * empty maps) keeps the general dynamic lowering.
    */
  private def staticEntries(c: Column): Option[Seq[(String, Column)]] = {
    import org.apache.spark.sql.catalyst.expressions.CreateMap
    org.apache.spark.sql.GraftColumnBridge.expression(c) match {
      case cm: CreateMap
          if cm.keys.nonEmpty &&
            cm.keys.forall(k => k.foldable &&
              k.dataType == org.apache.spark.sql.types.StringType) =>
        val keys = cm.keys.map(_.eval())
        if (keys.contains(null) || keys.distinct.size != keys.size) None
        else Some(keys.map(_.toString).zip(
          cm.values.map(org.apache.spark.sql.GraftColumnBridge.column)))
      case _ => None
    }
  }

  /** Compile-time ForKV lowering (round 6 — the vtl compiler's own
    * constant-folding idea, lib/vtl/src/compiler/binary.rs:130-170, applied
    * to the loop): with literal keys the BTreeMap iteration order is known
    * at COMPILE time, so the sort happens here (UTF8String binary order —
    * identical to array_sort's struct comparison on distinct keys), the
    * break prefix is a running OR over the ordered entries, and the
    * continue cut is a per-entry conditional — every remaining expression
    * is codegen-friendly (`when`/`concat`/`map_from_entries`), replacing
    * the four interpreted higher-order functions of the dynamic form
    * (array_sort, transform×2, filter). Kept-entry list and the final
    * map_from_entries (including its duplicate-key behavior) are identical
    * to the dynamic lowering — VtlProgramSpec pins the parity.
    */
  private def lowerForKVStatic(kvs: Seq[(String, Column)], body: ForBody): Column = {
    import org.apache.spark.unsafe.types.UTF8String
    val sorted = kvs.sortWith { case ((a, _), (b, _)) =>
      UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) < 0
    }
    var brk: Column = lit(false)
    val parts = sorted.map { case (k, v) =>
      val kC = lit(k)
      body.breakWhen.foreach(bw => brk = brk || coalesce(bw(kC, v), lit(false)))
      val keep = body.continueWhen match {
        case Some(cw) => !brk && !coalesce(cw(kC, v), lit(false))
        case None => !brk
      }
      // no otherwise branch: a cut entry is a NULL element whose yield
      // expressions are NEVER evaluated (when() branches are lazy) — the
      // dynamic lowering filters before transforming, so a yield that would
      // throw on a cut entry (e.g. an ANSI cast) must not run here either;
      // array_compact drops the nulls before the map builds
      when(keep, struct(body.yieldKey(kC, v).as("key"),
        body.yieldValue(kC, v).as("value")))
    }
    map_from_entries(array_compact(array(parts: _*)))
  }

  /** The general (runtime-map) ForKV lowering — unchanged round-5 shape. */
  private def lowerForKVDynamic(iterCol: Column, body: ForBody): Column = {
    val sorted = array_sort(map_entries(iterCol)) // BTreeMap key order
    val prefixed = body.breakWhen match {
      case None => sorted
      case Some(bw) =>
        val flags = transform(sorted, e => bw(e("key"), e("value")))
        val pos = array_position(flags, true) // 0 when it never fires
        slice(sorted, lit(1), when(pos === 0, size(sorted)).otherwise(pos - 1))
    }
    val kept = body.continueWhen match {
      case None => prefixed
      // coalesce(…, false): a NULL continue-predicate must KEEP the entry
      // (vtl's `if cond { continue }` does not fire on null/falsy), and a
      // bare !cw would evaluate to NULL, which filter() drops — the same
      // falsy rule breakWhen already gets for free (array_position skips
      // nulls) and Topology.Route applies to its port predicates
      case Some(cw) =>
        filter(prefixed, e => !coalesce(cw(e("key"), e("value")), lit(false)))
    }
    map_from_entries(transform(kept, e =>
      struct(body.yieldKey(e("key"), e("value")).as("key"),
        body.yieldValue(e("key"), e("value")).as("value"))))
  }

  /** Compile and apply a program: one `select` (one Project node) over df. */
  def compile(df: DataFrame, program: Seq[Stmt]): DataFrame = {
    require(program.nonEmpty, "empty vtl program")
    require(program.init.forall(!_.isInstanceOf[Return]),
      "return must be the program's final statement")
    val init: Env = df.columns.toSeq.map(n => n -> col(n))
    program.last match {
      case Return(fields) =>
        val env = program.init.foldLeft(init)(step)
        df.select(fields.map(f => get(env, f).as(f)): _*)
      case _ =>
        val env = program.foldLeft(init)(step)
        df.select(env.map { case (n, c) => c.as(n) }: _*)
    }
  }
}
