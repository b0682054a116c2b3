package graft.plans

import java.time.{LocalDate, LocalDateTime, ZoneId, ZoneOffset}

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Optimizer rule: comparisons of `year(col)` against an integer literal
  * become sargable range predicates on the underlying column.
  *
  *   year(c) =  1997   →  c >= '1997-01-01' AND c < '1998-01-01'
  *   year(c) >= 1997   →  c >= '1997-01-01'        (and the other
  *   year(c) <  1997   →  c <  '1997-01-01'         comparison shapes,
  *                                                   both operand orders)
  *
  * `year(c) = lit` evaluates per row and pushes nothing to the scan; the
  * rewritten range lands in the parquet scan's `PushedFilters`, where
  * row-group statistics prune I/O — at 100 TB the difference between
  * reading one year and reading the whole table. Semantics are identical
  * including nulls (null in → null out on both forms).
  *
  * Scoped conservatively: only inside `Filter` conditions, only when the
  * argument is a plain column (an `Attribute` — possibly under the
  * implicit `cast(ts as date)` the analyzer inserts for `year`), and only
  * for date / timestamp / timestamp_ntz columns. Timestamp boundaries are
  * computed in the session time zone — the same zone `year()` itself
  * uses. Registered via [[graft.GraftExtensions]].
  */
object YearPredicateToRange extends Rule[LogicalPlan] {

  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case _                            => None
    }
  }

  /** `year(c)` as the analyzer leaves it: Year over a date attribute, or
    * Year over the implicit to-date cast of a timestamp attribute.
    */
  private object YearOf {
    def unapply(e: Expression): Option[Attribute] = e match {
      case Year(a: Attribute) if a.dataType == DateType => Some(a)
      case Year(Cast(a: Attribute, DateType, _, _))
          if a.dataType == TimestampType || a.dataType == TimestampNTZType =>
        Some(a)
      case _ => None
    }
  }

  /** Literal for Jan 1st 00:00 of `year` in the column's type, in the
    * session zone for zoned timestamps; None if unrepresentable. Years
    * outside [1, 9999] are refused outright: near the extremes of the
    * date/timestamp domains the epoch arithmetic below would overflow
    * SILENTLY (toInt truncation, long multiply) into a wrong literal —
    * leaving the original year() predicate in place is always correct.
    */
  private def jan1(dt: DataType, year: Int): Option[Literal] =
    if (year < 1 || year > 9999) None
    else try dt match {
      case DateType =>
        Some(Literal(LocalDate.of(year, 1, 1).toEpochDay.toInt, DateType))
      case TimestampNTZType =>
        val ldt = LocalDateTime.of(year, 1, 1, 0, 0)
        Some(Literal(
          ldt.toEpochSecond(ZoneOffset.UTC) * 1000000L, TimestampNTZType))
      case TimestampType =>
        val zone = ZoneId.of(SQLConf.get.sessionLocalTimeZone)
        val ldt = LocalDateTime.of(year, 1, 1, 0, 0)
        // A DST transition crossing New Year midnight makes the local
        // boundary ambiguous (overlap) or nonexistent (gap); atZone would
        // silently shift it and misclassify in-gap timestamps relative to
        // per-row year(). Refuse the rewrite unless the offset is unique.
        if (zone.getRules.getValidOffsets(ldt).size != 1) None
        else {
          val inst = ldt.atZone(zone).toInstant
          Some(Literal(
            inst.getEpochSecond * 1000000L + inst.getNano / 1000L, TimestampType))
        }
      case _ => None
    } catch { case _: RuntimeException => None }

  private def between(c: Attribute, y: Int): Option[Expression] =
    for { lo <- jan1(c.dataType, y); hi <- jan1(c.dataType, y + 1) }
      yield And(GreaterThanOrEqual(c, lo), LessThan(c, hi))
  private def atLeast(c: Attribute, y: Int): Option[Expression] =
    jan1(c.dataType, y).map(GreaterThanOrEqual(c, _))
  private def below(c: Attribute, y: Int): Option[Expression] =
    jan1(c.dataType, y).map(LessThan(c, _))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      f.copy(condition = cond.transformUp {
        case e @ EqualTo(YearOf(c), IntLit(y)) => between(c, y).getOrElse(e)
        case e @ EqualTo(IntLit(y), YearOf(c)) => between(c, y).getOrElse(e)
        case e @ GreaterThanOrEqual(YearOf(c), IntLit(y)) => atLeast(c, y).getOrElse(e)
        case e @ GreaterThan(YearOf(c), IntLit(y))        => atLeast(c, y + 1).getOrElse(e)
        case e @ LessThan(YearOf(c), IntLit(y))           => below(c, y).getOrElse(e)
        case e @ LessThanOrEqual(YearOf(c), IntLit(y))    => below(c, y + 1).getOrElse(e)
        // flipped operand order: lit <cmp> year(c)
        case e @ GreaterThanOrEqual(IntLit(y), YearOf(c)) => below(c, y + 1).getOrElse(e)
        case e @ GreaterThan(IntLit(y), YearOf(c))        => below(c, y).getOrElse(e)
        case e @ LessThan(IntLit(y), YearOf(c))           => atLeast(c, y + 1).getOrElse(e)
        case e @ LessThanOrEqual(IntLit(y), YearOf(c))    => atLeast(c, y).getOrElse(e)
        // IN list of integer years → OR of ranges (null semantics match:
        // null input yields null under both forms when no value matches)
        case e @ In(YearOf(c), list)
            if list.nonEmpty && list.forall(IntLit.unapply(_).isDefined) =>
          val ranges = list.map { case IntLit(y) => between(c, y) }
          if (ranges.forall(_.isDefined)) ranges.flatten.reduce(Or) else e
      })
  }
}
