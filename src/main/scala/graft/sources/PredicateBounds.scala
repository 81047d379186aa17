package graft.sources

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{NumericType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Conservative predicate analysis for FILE-LEVEL scan scoping: the
  * range constraints every matching row provably satisfies, extracted
  * from a predicate's top-level conjuncts. Row-level DML (DELETE WHERE,
  * UPDATE WHERE) must first SCAN to classify matching rows — at 100 TB
  * a predicate touching 1% of a table's key space must not open 100%
  * of its files, so the classification scan is pruned against the
  * format's per-file statistics (Delta `add.stats`, Iceberg manifest
  * bounds) with exactly the contract the read-side skipping uses:
  * a file is dropped ONLY when its recorded [min, max] provably
  * excludes every possible match. Anything not a conjunction of
  * `<column> <cmp> <literal>` shapes contributes no constraint —
  * pruning is never allowed to change an answer:
  *
  *  - OR / NOT / function calls / subqueries → no constraint;
  *  - casts are NOT unwrapped (`cast(s AS INT) < 5` constrains the
  *    CAST value, and comparing raw string stats numerically would
  *    prune files that hold matches);
  *  - only numeric and string literals translate (date/timestamp
  *    literals carry internal representations the stats comparators
  *    don't share);
  *  - strict inequalities loosen to inclusive bounds (extra admitted
  *    files are scanned and match nothing — harmless).
  */
object PredicateBounds {

  /** Inclusive [lo, hi] constraint on one column (None = unbounded). */
  final case class Bounds(lo: Option[Any], hi: Option[Any])

  def rangeConstraints(e: Expression): Map[String, Bounds] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Bounds]
    // first constraint per side wins: with `k > 3 AND k > 5` keeping
    // lo=3 admits a superset of lo=5's files — conservative either way,
    // and it avoids needing a generic Any ordering to intersect
    def add(name: String, lo: Option[Any], hi: Option[Any]): Unit = {
      val cur = out.getOrElse(name, Bounds(None, None))
      out(name) = Bounds(cur.lo.orElse(lo), cur.hi.orElse(hi))
    }
    def nameOf(a: Expression): Option[String] = a match {
      case u: UnresolvedAttribute => Some(u.nameParts.last)
      case ar: AttributeReference => Some(ar.name)
      case _ => None
    }
    def scalarOf(l: Literal): Option[Any] = l.dataType match {
      case _: NumericType => l.value match {
        case null => None
        case d: org.apache.spark.sql.types.Decimal => Some(d.toJavaBigDecimal)
        case v => Some(v) // Byte/Short/Int/Long/Float/Double boxed
      }
      case StringType => l.value match {
        case u: UTF8String => Some(u.toString)
        case _ => None
      }
      case _ => None
    }
    // DSL-built predicates arrive as UnresolvedFunction("and"/">="/...)
    // nodes (the post-Connect ColumnNode conversion); SQL-parsed ones as
    // the catalyst binary comparisons. Normalize the former shape.
    def norm(x: Expression): Expression = x match {
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if f.nameParts.length == 1 && f.arguments.length == 2 =>
        val a = norm(f.arguments.head); val b = norm(f.arguments(1))
        f.nameParts.head.toLowerCase match {
          case "and" => And(a, b)
          case ">" => GreaterThan(a, b)
          case ">=" => GreaterThanOrEqual(a, b)
          case "<" => LessThan(a, b)
          case "<=" => LessThanOrEqual(a, b)
          case "=" | "==" => EqualTo(a, b)
          case _ => x
        }
      case _ => x
    }
    def conj(x0: Expression): Unit = norm(x0) match {
      case And(l, r) => conj(l); conj(r)
      case GreaterThan(a, l: Literal) =>
        for (n <- nameOf(a); v <- scalarOf(l)) add(n, Some(v), None)
      case GreaterThanOrEqual(a, l: Literal) =>
        for (n <- nameOf(a); v <- scalarOf(l)) add(n, Some(v), None)
      case LessThan(a, l: Literal) =>
        for (n <- nameOf(a); v <- scalarOf(l)) add(n, None, Some(v))
      case LessThanOrEqual(a, l: Literal) =>
        for (n <- nameOf(a); v <- scalarOf(l)) add(n, None, Some(v))
      case EqualTo(a, l: Literal) =>
        for (n <- nameOf(a); v <- scalarOf(l)) add(n, Some(v), Some(v))
      // literal-on-the-left mirrors
      case GreaterThan(l: Literal, a) =>
        for (n <- nameOf(a); v <- scalarOf(l)) add(n, None, Some(v))
      case GreaterThanOrEqual(l: Literal, a) =>
        for (n <- nameOf(a); v <- scalarOf(l)) add(n, None, Some(v))
      case LessThan(l: Literal, a) =>
        for (n <- nameOf(a); v <- scalarOf(l)) add(n, Some(v), None)
      case LessThanOrEqual(l: Literal, a) =>
        for (n <- nameOf(a); v <- scalarOf(l)) add(n, Some(v), None)
      case EqualTo(l: Literal, a) =>
        for (n <- nameOf(a); v <- scalarOf(l)) add(n, Some(v), Some(v))
      case _ => () // no constraint derivable from this conjunct
    }
    conj(e)
    out.toMap
  }
}
