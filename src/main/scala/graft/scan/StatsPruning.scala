package graft.scan

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.unsafe.types.UTF8String
import graft.meta.{ColStats, SegmentMeta, StatVal}

/** Sound file-pruning by interval abstract interpretation of Catalyst
  * expressions over per-file column stats.
  *
  * Port of the reference's TimePred compiler + interval evaluator
  * (timeseries-table-datafusion/src/ts_table_provider/time_predicate.rs:15-68,
  * pruning.rs:6-103), generalized from the single time column to every
  * column with recorded min/max — the north rule's (source, n_tok, doc_id)
  * clustering stats prune the same way the reference's [ts_min, ts_max] do.
  *
  * Three-valued semantics, identical to the reference:
  *  - a file is dropped iff the predicate is AlwaysFalse over its stats
  *    (AlwaysTrue still keeps the file; execution re-filters — pruning is
  *    an optimization, never a correctness dependency);
  *  - in AND, Unknown is neutral (doesn't erase usable constraints);
  *  - in OR, Unknown poisons to Unknown;
  *  - NOT(Unknown) = Unknown.
  */
object StatsPruning {

  sealed trait Tri
  case object AlwaysTrue  extends Tri
  case object AlwaysFalse extends Tri
  case object Unknown     extends Tri

  private def and(a: Tri, b: Tri): Tri = (a, b) match {
    case (AlwaysFalse, _) | (_, AlwaysFalse) => AlwaysFalse
    case (AlwaysTrue, AlwaysTrue)            => AlwaysTrue
    case _                                   => Unknown
  }
  private def or(a: Tri, b: Tri): Tri = (a, b) match {
    case (AlwaysTrue, _) | (_, AlwaysTrue) => AlwaysTrue
    case (AlwaysFalse, AlwaysFalse)        => AlwaysFalse
    case _                                 => Unknown
  }
  private def not(a: Tri): Tri = a match {
    case AlwaysTrue  => AlwaysFalse
    case AlwaysFalse => AlwaysTrue
    case Unknown     => Unknown
  }

  private def litVal(l: Literal): Option[StatVal] = l.value match {
    case null              => None
    case u: UTF8String     => Some(StatVal.S(u.toString))
    case other             => StatVal.fromAny(other)
  }

  /** Unwrap aliases/casts the way the reference unwraps Alias/Cast
    * (time_predicate.rs:164-171). Casting can change comparison semantics,
    * so only identity-safe unwraps are taken; anything else → column
    * unresolvable → Unknown. */
  private def columnOf(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case Alias(c, _)           => columnOf(c)
    case _                     => None
  }

  /** Evaluate one Catalyst predicate against one file's stats. */
  def eval(expr: Expression, stats: Map[String, ColStats], rowCount: Long): Tri = expr match {
    case And(l, r) => and(eval(l, stats, rowCount), eval(r, stats, rowCount))
    case Or(l, r)  => or(eval(l, stats, rowCount), eval(r, stats, rowCount))
    case Not(c)    => not(eval(c, stats, rowCount))
    case Literal(true, _)  => AlwaysTrue
    case Literal(false, _) => AlwaysFalse

    case In(v, list) if list.nonEmpty && list.forall(_.isInstanceOf[Literal]) =>
      list.map(l => eval(EqualTo(v, l), stats, rowCount)).reduce(or)
    case In(_, list) if list.isEmpty => AlwaysFalse
    case InSet(v, set) if set.nonEmpty =>
      set.toSeq.map(x => eval(EqualTo(v, Literal.create(x, v.dataType)), stats, rowCount)).reduce(or)

    case IsNull(c) => columnOf(c).flatMap(stats.get) match {
      case Some(cs) if cs.nullCount == 0 && rowCount > 0 => AlwaysFalse
      case Some(cs) if rowCount > 0 && cs.nullCount >= rowCount => AlwaysTrue
      case _ => Unknown
    }
    case IsNotNull(c) => not(eval(IsNull(c), stats, rowCount))

    case b: BinaryComparison =>
      val (colE, litE, flipped) = (b.left, b.right) match {
        case (c, l: Literal) => (c, Some(l), false)
        case (l: Literal, c) => (c, Some(l), true)
        case _               => (b.left, None, false)
      }
      (columnOf(colE), litE.flatMap(litVal)) match {
        case (Some(col), Some(k)) =>
          stats.get(col) match {
            case Some(cs) => evalCmp(b, flipped, cs, rowCount, k)
            case None     => Unknown
          }
        case _ =>
          litE.map(l => transformCmp(b, flipped, colE, l, stats, rowCount)).getOrElse(Unknown)
      }

    case e: StartsWith => (e.left, e.right) match {
      case (c, Literal(p: UTF8String, _)) =>
        (columnOf(c).flatMap(stats.get)) match {
          case Some(ColStats(Some(StatVal.S(mn)), Some(StatVal.S(mx)), _)) =>
            val prefix = p.toString
            // s.startsWith(prefix) ⇒ prefix ≤ s AND s.take(len) == prefix.
            // AlwaysFalse iff the whole [min,max] range misses the prefix band:
            if (mx < prefix) AlwaysFalse                       // all values below the band
            else if (mn.take(prefix.length) > prefix) AlwaysFalse // all values above it
            else Unknown
          case _ => Unknown
        }
      case _ => Unknown
    }

    case _ => Unknown // unrecognized predicate never prunes (sound)
  }

  // ---------------------------------------------------------------------
  // Transform-aware pruning: `f(ts) OP literal` rewritten into raw-ts
  // bounds evaluated against file stats — the port of the reference's
  // timestamp-transform compiler (time_predicate.rs:554-604, 876-1106:
  // to_date / date_trunc / ts ± interval). UTC/sessions-default only;
  // explicit non-UTC zones conservatively yield Unknown (the reference's
  // Olson/DST widening is out of scope for v1 — soundness is preserved
  // because Unknown never prunes).
  // ---------------------------------------------------------------------

  private val MicrosPerDay = 86400L * 1000000L

  private def truncUnitMicros(fmt: String): Option[Long] = fmt.toLowerCase match {
    case "second" => Some(1000000L)
    case "minute" => Some(60L * 1000000L)
    case "hour"   => Some(3600L * 1000000L)
    case "day"    => Some(MicrosPerDay)
    case _        => None // week/month/year: calendar-aware, skip (sound)
  }

  private def utcOk(tz: Option[String]): Boolean =
    tz.forall(z => z == "UTC" || z == "Etc/UTC" || z == "+00:00" || z == "Z")

  /** Evaluate `colExpr OP k` where colExpr is a recognized transform of a
    * stats column. Reduces to plain ts-micros bound predicates and
    * re-enters eval(). */
  private def transformCmp(b: BinaryComparison, flipped: Boolean, colE: Expression,
                           k: Literal, stats: Map[String, ColStats], rows: Long): Tri = {
    import org.apache.spark.sql.types._
    def tsBound(col: String, mk: (Expression, Expression) => Expression, micros: Long): Tri = {
      val attr = AttributeReference(col, TimestampType)()
      eval(mk(attr, Literal(micros, TimestampType)), stats, rows)
    }
    def opIsLt = (if (flipped) b.isInstanceOf[GreaterThan] else b.isInstanceOf[LessThan])
    def opIsLe = (if (flipped) b.isInstanceOf[GreaterThanOrEqual] else b.isInstanceOf[LessThanOrEqual])
    def opIsGt = (if (flipped) b.isInstanceOf[LessThan] else b.isInstanceOf[GreaterThan])
    def opIsGe = (if (flipped) b.isInstanceOf[LessThanOrEqual] else b.isInstanceOf[GreaterThanOrEqual])

    colE match {
      // to_date(ts) / CAST(ts AS DATE): k is a DateType literal (days)
      case Cast(inner, DateType, tz, _) if columnOf(inner).isDefined && utcOk(tz) &&
          k.dataType == DateType && k.value != null =>
        val col = columnOf(inner).get
        val dayStart = k.value.asInstanceOf[Int].toLong * MicrosPerDay
        val nextDay = dayStart + MicrosPerDay
        if (b.isInstanceOf[EqualTo])
          and(tsBound(col, GreaterThanOrEqual, dayStart), tsBound(col, LessThan, nextDay))
        else if (opIsLt) tsBound(col, LessThan, dayStart)
        else if (opIsLe) tsBound(col, LessThan, nextDay)
        else if (opIsGt) tsBound(col, GreaterThanOrEqual, nextDay)
        else if (opIsGe) tsBound(col, GreaterThanOrEqual, dayStart)
        else Unknown

      // date_trunc(unit, ts): k is a TimestampType literal (micros)
      case TruncTimestamp(Literal(fmt: UTF8String, _), inner, tz) if columnOf(inner).isDefined &&
          utcOk(tz) && k.dataType == TimestampType && k.value != null =>
        truncUnitMicros(fmt.toString) match {
          case None => Unknown
          case Some(u) =>
            val col = columnOf(inner).get
            val kv = k.value.asInstanceOf[Long]
            val aligned = Math.floorDiv(kv, u) * u
            val isAligned = aligned == kv
            if (b.isInstanceOf[EqualTo]) {
              if (!isAligned) AlwaysFalse // Eq on unaligned literal is never true
              else and(tsBound(col, GreaterThanOrEqual, kv), tsBound(col, LessThan, kv + u))
            }
            else if (opIsLt) tsBound(col, LessThan, if (isAligned) kv else aligned + u)
            else if (opIsLe) tsBound(col, LessThan, aligned + u)
            else if (opIsGt) tsBound(col, GreaterThanOrEqual, aligned + u)
            else if (opIsGe) tsBound(col, GreaterThanOrEqual, if (isAligned) kv else aligned + u)
            else Unknown
        }

      // ts ± INTERVAL (fixed-duration only): (ts + iv) OP k  ≡  ts OP (k - iv)
      // iv arrives as CalendarInterval (legacy) or DayTimeIntervalType
      // micros. The CalendarInterval DAY component is added calendar-aware
      // (a day spanning a DST transition is not 86400 s), so days != 0 is
      // only rewritable under UTC — gate on the expression's timeZoneId;
      // pure-micros intervals are zone-independent.
      case TimestampAddInterval(inner, Literal(ivVal, ivType), tz)
          if columnOf(inner).isDefined && k.dataType == TimestampType && k.value != null &&
             (ivVal match {
               case ci: org.apache.spark.unsafe.types.CalendarInterval =>
                 ci.months == 0 && (ci.days == 0 || utcOk(tz))
               case _: java.lang.Long => ivType.isInstanceOf[org.apache.spark.sql.types.DayTimeIntervalType]
               case _ => false
             }) =>
        val shift = ivVal match {
          case ci: org.apache.spark.unsafe.types.CalendarInterval =>
            ci.days.toLong * MicrosPerDay + ci.microseconds
          case l: java.lang.Long => l.longValue()
        }
        val col = columnOf(inner).get
        val attr = AttributeReference(col, TimestampType)()
        val shifted = Literal(k.value.asInstanceOf[Long] - shift, TimestampType)
        val rewritten = if (flipped) b.withNewChildren(Seq(shifted, attr))
                        else b.withNewChildren(Seq(attr, shifted))
        eval(rewritten, stats, rows)

      case _ => Unknown
    }
  }

  /** reference pruning.rs:6-71 table, generalized. cMin/cMax = cmp(stat, k). */
  private def evalCmp(b: BinaryComparison, flipped: Boolean, cs: ColStats,
                      rows: Long, k: StatVal): Tri = {
    val (mnO, mxO) = (cs.min, cs.max)
    (mnO, mxO) match {
      case (Some(mn), Some(mx)) =>
        val cMinO = StatVal.cmp(mn, k); val cMaxO = StatVal.cmp(mx, k)
        if (cMinO.isEmpty || cMaxO.isEmpty) return Unknown
        val cMin = cMinO.get; val cMax = cMaxO.get
        if (rows > 0 && cs.nullCount >= rows) return AlwaysFalse // all null
        val t = b match {
          case _: LessThan =>
            if (flipped) gtTri(cMin, cMax)          // k < col ≡ col > k
            else ltTri(cMin, cMax)
          case _: LessThanOrEqual =>
            if (flipped) geTri(cMin, cMax) else leTri(cMin, cMax)
          case _: GreaterThan =>
            if (flipped) ltTri(cMin, cMax) else gtTri(cMin, cMax)
          case _: GreaterThanOrEqual =>
            if (flipped) leTri(cMin, cMax) else geTri(cMin, cMax)
          case _: EqualTo =>
            if (cMax < 0 || cMin > 0) AlwaysFalse
            else if (cMin == 0 && cMax == 0) AlwaysTrue // degenerate single-point file
            else Unknown
          case _: EqualNullSafe =>
            if (cMax < 0 || cMin > 0) { if (cs.nullCount > 0) Unknown else AlwaysFalse }
            else Unknown
          case _ => Unknown
        }
        // nulls make "always true" unsound for non-null-safe comparisons
        if (t == AlwaysTrue && cs.nullCount > 0) Unknown else t
      case _ => Unknown
    }
  }

  // col < k: AlwaysTrue iff max < k; AlwaysFalse iff min >= k
  private def ltTri(cMin: Int, cMax: Int): Tri =
    if (cMax < 0) AlwaysTrue else if (cMin >= 0) AlwaysFalse else Unknown
  private def leTri(cMin: Int, cMax: Int): Tri =
    if (cMax <= 0) AlwaysTrue else if (cMin > 0) AlwaysFalse else Unknown
  private def gtTri(cMin: Int, cMax: Int): Tri =
    if (cMin > 0) AlwaysTrue else if (cMax <= 0) AlwaysFalse else Unknown
  private def geTri(cMin: Int, cMax: Int): Tri =
    if (cMin >= 0) AlwaysTrue else if (cMax < 0) AlwaysFalse else Unknown

  /** Keep a segment unless the conjunction of filters is AlwaysFalse
    * (reference prune_segments_by_time, ts_table_provider.rs:183-214). */
  def pruneSegments(segments: Seq[SegmentMeta], filters: Seq[Expression]): Seq[SegmentMeta] =
    if (filters.isEmpty) segments
    else segments.filter { seg =>
      filters.forall(f => eval(f, seg.stats, seg.rowCount) != AlwaysFalse)
    }
}
