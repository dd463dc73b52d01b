package graft.sources.readstat

import org.apache.spark.sql.sources._
import org.apache.spark.unsafe.types.UTF8String

/** Optional filter pushdown into the readstat scan (SURVEY.md §2.2 P4 EXT):
  * the reference never pushes predicates; we skip decoding the REST of a
  * fixed-width row when a cheap filter-column test fails. Spark still
  * applies every filter above the scan (they are all returned as residual),
  * so unsupported predicates or semantic corner cases can never change
  * results — the pushdown is purely a decode-skipping hint.
  */
object RowFilter {

  /** Column names a filter tree references, or None if any node is
    * unsupported (we then ignore the whole filter).
    */
  def referenced(f: Filter): Option[Seq[String]] = f match {
    case EqualTo(a, _) => Some(Seq(a))
    case GreaterThan(a, _) => Some(Seq(a))
    case GreaterThanOrEqual(a, _) => Some(Seq(a))
    case LessThan(a, _) => Some(Seq(a))
    case LessThanOrEqual(a, _) => Some(Seq(a))
    case In(a, _) => Some(Seq(a))
    case IsNull(a) => Some(Seq(a))
    case IsNotNull(a) => Some(Seq(a))
    case And(l, r) => for { a <- referenced(l); b <- referenced(r) } yield a ++ b
    case Or(l, r) => for { a <- referenced(l); b <- referenced(r) } yield a ++ b
    case Not(c) => referenced(c)
    case _ => None
  }

  /** Evaluate a filter against decoded Catalyst values (UTF8String for
    * strings, boxed primitives for the rest).
    *
    * Null column values make comparison predicates false (SQL semantics —
    * Spark's residual filter drops those rows too, so skipping is safe).
    * A literal TYPE we don't understand makes the predicate true: the row
    * is kept and Spark's residual filter decides.
    */
  def eval(f: Filter, value: String => Any): Boolean = f match {
    case EqualTo(a, v) => test(value(a), v, _ == 0)
    case GreaterThan(a, v) => test(value(a), v, _ > 0)
    case GreaterThanOrEqual(a, v) => test(value(a), v, _ >= 0)
    case LessThan(a, v) => test(value(a), v, _ < 0)
    case LessThanOrEqual(a, v) => test(value(a), v, _ <= 0)
    case In(a, vs) =>
      val x = value(a)
      if (x == null) false else vs.exists(v => test(x, v, _ == 0))
    case IsNull(a) => value(a) == null
    case IsNotNull(a) => value(a) != null
    case And(l, r) => eval(l, value) && eval(r, value)
    case Or(l, r) => eval(l, value) || eval(r, value)
    case Not(c) => !eval(c, value)
    case _ => true
  }

  private def test(decoded: Any, lit: Any, pred: Int => Boolean): Boolean = {
    if (decoded == null) return false
    cmp(decoded, lit) match {
      case Some(c) => pred(c)
      case None => true // unknown literal type: keep, Spark decides
    }
  }

  /** Three-way compare of a non-null decoded value vs a literal;
    * None = unsupported literal type.
    */
  private def cmp(decoded: Any, lit: Any): Option[Int] = decoded match {
    case null => None
    case u: UTF8String => lit match {
      case s: String => Some(u.toString.compareTo(s))
      case u2: UTF8String => Some(u.compareTo(u2))
      case _ => None
    }
    case n: java.lang.Number => lit match {
      case l: java.lang.Number => Some(java.lang.Double.compare(n.doubleValue(), l.doubleValue()))
      case d: java.sql.Date => Some(java.lang.Double.compare(n.doubleValue(), d.toLocalDate.toEpochDay.toDouble))
      case t: java.time.LocalDate => Some(java.lang.Double.compare(n.doubleValue(), t.toEpochDay.toDouble))
      case _ => None
    }
    case b: java.lang.Boolean => lit match {
      case l: java.lang.Boolean => Some(b.compareTo(l))
      case _ => None
    }
    case _ => None
  }
}
