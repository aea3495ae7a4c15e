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
            // s.startsWith(prefix) ⇒ prefix ≤ s AND s's byte-prefix == the
            // prefix bytes. AlwaysFalse iff the whole [min,max] range
            // misses the prefix band — in the footer-stats UNSIGNED
            // UTF-8 byte order (UTF-16 compareTo disagrees for
            // supplementary chars). Byte-lexicographic truncation is
            // monotone, so mn's byte-prefix above the prefix bytes puts
            // every s ≥ mn above the band.
            val pb = prefix.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            val mnb = mn.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            def abovePrefixBand: Boolean = {
              val k = math.min(mnb.length, pb.length)
              var i = 0
              while (i < k) {
                val c = (mnb(i) & 0xff) - (pb(i) & 0xff)
                if (c != 0) return c > 0
                i += 1
              }
              false // equal through k: mn is inside or below the band
            }
            if (StatVal.utf8Cmp(mx, prefix) < 0) AlwaysFalse // all values below the band
            else if (abovePrefixBand) AlwaysFalse            // all values above it
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
  // to_date / date_trunc / to_unixtime / ts ± interval). Olson zones are
  // handled by computing the literal's bucket boundaries with zoned
  // java.time arithmetic (the reference's DST widening,
  // time_predicate.rs:623-758, 889-1015); non-fixed-offset zones get a
  // ±1 h safety pad so engine-specific DST gap/overlap resolution can
  // never make pruning unsound. Month-bearing intervals rewrite through
  // sound [28-day, 31-day] shift bounds.
  // ---------------------------------------------------------------------

  private val MicrosPerDay  = 86400L * 1000000L
  private val MicrosPerHour = 3600L * 1000000L
  /** Safety margin for non-fixed-offset (Olson) zones on BUCKET-BOUNDARY
    * paths, where boundaries are computed with real zoned java.time
    * arithmetic against the same TZDB Spark uses — the pad only has to
    * absorb gap/overlap resolution differences (DST transitions are ≤ 2 h:
    * most 1 h, Antarctica/Troll 2 h, Lord Howe 0.5 h), with margin. */
  private val DstPadMicros  = 4L * MicrosPerHour

  /** Safety margin for CALENDAR-INTERVAL SHIFTS (`ts + INTERVAL n
    * DAYS/MONTHS`) under non-fixed zones, where no zoned arithmetic runs —
    * the bound must absorb the largest possible offset change a zone can
    * make between two instants. Dateline redefinitions skip or repeat a
    * whole calendar day (Pacific/Apia 2011-12-30, Pacific/Kiritimati
    * 1994-12-31: 24 h jumps); UTC offsets span [-12, +14], bounding any
    * single-zone change at 26 h. */
  private val ZoneShiftPadMicros = 26L * MicrosPerHour

  private def utcOk(tz: Option[String]): Boolean =
    tz.forall(z => z == "UTC" || z == "Etc/UTC" || z == "+00:00" || z == "Z")

  private def zoneOf(tz: Option[String]): Option[java.time.ZoneId] =
    try Some(tz.map(java.time.ZoneId.of).getOrElse(java.time.ZoneOffset.UTC))
    catch { case _: Exception => None }

  /** Resolve a timestamp-valued operand to its stats column: a raw
    * attribute, or an NTZ attribute cast to TIMESTAMP under UTC — that cast
    * is value-preserving against our epoch-micros footer stats (Catalyst
    * inserts it whenever an NTZ column meets a TIMESTAMP function). */
  private def tsColumnOf(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case Alias(c, _)           => tsColumnOf(c)
    case Cast(a: AttributeReference, org.apache.spark.sql.types.TimestampType, tz, _)
        if a.dataType == org.apache.spark.sql.types.TimestampNTZType && utcOk(tz) => Some(a.name)
    case _ => None
  }

  private def zdtMicros(zdt: java.time.ZonedDateTime): Option[Long] =
    try {
      val i = zdt.toInstant
      Some(Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L))
    } catch { case _: ArithmeticException => None }

  /** The bucket [lo, hi) that `date_trunc(unit, ts) == k` confines ts to,
    * in `zone`, plus whether the bounds are exact (fixed-offset zone) and
    * whether k is bucket-aligned. Exact for fixed-offset zones (UTC,
    * +05:30, …); Olson zones compute real zoned boundaries (23/25-hour
    * days, gap-shifted midnights) and the caller pads ±1 h. None for
    * unrecognized units. */
  private def truncBucket(unit: String, kMicros: Long, zid: java.time.ZoneId)
      : Option[(Boolean, Boolean, Long, Long)] = {
    import java.time.{DayOfWeek, Instant, LocalDate, ZonedDateTime}
    import java.time.temporal.{ChronoUnit, TemporalAdjusters}
    val inst = Instant.ofEpochSecond(Math.floorDiv(kMicros, 1000000L),
      Math.floorMod(kMicros, 1000000L) * 1000L)
    val zdt = inst.atZone(zid)
    def day(d: LocalDate): ZonedDateTime = d.atStartOfDay(zid)
    val bucket: Option[(ZonedDateTime, ZonedDateTime)] = unit.toLowerCase match {
      case "microsecond" => Some((zdt, zdt.plusNanos(1000)))
      case "millisecond" =>
        val a = zdt.truncatedTo(ChronoUnit.MILLIS); Some((a, a.plusNanos(1000000)))
      case "second" => val a = zdt.truncatedTo(ChronoUnit.SECONDS); Some((a, a.plusSeconds(1)))
      case "minute" => val a = zdt.truncatedTo(ChronoUnit.MINUTES); Some((a, a.plusMinutes(1)))
      case "hour"   => val a = zdt.truncatedTo(ChronoUnit.HOURS);   Some((a, a.plusHours(1)))
      case "day" | "dd" =>
        val d = zdt.toLocalDate; Some((day(d), day(d.plusDays(1))))
      case "week" =>
        val m = zdt.toLocalDate.`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))
        Some((day(m), day(m.plusDays(7))))
      case "month" | "mon" | "mm" =>
        val f = zdt.toLocalDate.withDayOfMonth(1); Some((day(f), day(f.plusMonths(1))))
      case "quarter" =>
        val f0 = zdt.toLocalDate.withDayOfMonth(1)
        val f = f0.withMonth((f0.getMonthValue - 1) / 3 * 3 + 1)
        Some((day(f), day(f.plusMonths(3))))
      case "year" | "yyyy" | "yy" =>
        val f = zdt.toLocalDate.withDayOfYear(1); Some((day(f), day(f.plusYears(1))))
      case _ => None
    }
    bucket.flatMap { case (a, n) =>
      for (lo <- zdtMicros(a); hi <- zdtMicros(n)) yield {
        val exact = zid.getRules.isFixedOffset
        (exact, exact && lo == kMicros, lo, hi)
      }
    }
  }

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

    /** A padded/widened ts-bound is only a NECESSARY condition for
      * `f OP k` (one-way implication): its AlwaysFalse soundly prunes, but
      * its AlwaysTrue must NOT surface — Not()/!= would flip it into an
      * unsound prune. Exact (two-way) rewrites keep AlwaysTrue. */
    def necessaryOnly(t: Tri): Tri = if (t == AlwaysTrue) Unknown else t

    /** Map f OP k onto ts-range predicates given f's exact/padded bucket
      * [lo, hi) for k. `aligned` is only meaningful when `exact`; padded
      * (non-fixed-zone) bounds use the weakest sound form of each op. */
    def bucketCmp(col: String, exact: Boolean, aligned: Boolean,
                  lo: Long, hi: Long, pad: Long): Tri = {
      val t =
        if (b.isInstanceOf[EqualTo]) {
          if (exact && !aligned) AlwaysFalse // Eq on a non-bucket-start literal is never true
          else and(tsBound(col, GreaterThanOrEqual, lo - pad), tsBound(col, LessThan, hi + pad))
        }
        // f < k  ⇔ ts < (lo if k aligned else hi); unknown alignment → hi (weaker)
        else if (opIsLt) tsBound(col, LessThan, (if (exact && aligned) lo else hi) + pad)
        // f ≤ k  ⇔ ts < hi (alignment-independent)
        else if (opIsLe) tsBound(col, LessThan, hi + pad)
        // f > k  ⇔ ts ≥ hi (alignment-independent)
        else if (opIsGt) tsBound(col, GreaterThanOrEqual, hi - pad)
        // f ≥ k  ⇔ ts ≥ (lo if k aligned else hi); unknown alignment → lo (weaker)
        else if (opIsGe) tsBound(col, GreaterThanOrEqual,
          (if (exact) { if (aligned) lo else hi } else lo) - pad)
        else Unknown
      if (pad == 0L && exact) t else necessaryOnly(t)
    }

    /** unix_*(ts) = floorDiv(tsMicros, unit) compared to k (in units). */
    def epochCmp(col: String, kUnits: Long, unit: Long): Tri =
      try {
        val lo = Math.multiplyExact(kUnits, unit)
        val hi = Math.addExact(lo, unit)
        bucketCmp(col, exact = true, aligned = true, lo, hi, 0L)
      } catch { case _: ArithmeticException => Unknown }

    /** (ts + s) OP k with s ∈ [sLo, sHi]: exact rewrite when the shift is
      * fixed, else the weakest sound ts-bound per op. */
    def shiftedCmp(col: String, kv: Long, sLo: Long, sHi: Long): Tri =
      if (sLo == sHi) { // exact: (ts + s) OP k ≡ ts OP (k − s)
        val attr = AttributeReference(col, org.apache.spark.sql.types.TimestampType)()
        val shifted = Literal(kv - sLo, org.apache.spark.sql.types.TimestampType)
        val rewritten = if (flipped) b.withNewChildren(Seq(shifted, attr))
                        else b.withNewChildren(Seq(attr, shifted))
        eval(rewritten, stats, rows)
      } else { // widened: f(ts) ∈ [ts + sLo, ts + sHi] — one-way, clamp AlwaysTrue
        necessaryOnly(
          if (b.isInstanceOf[EqualTo])
            and(tsBound(col, GreaterThanOrEqual, kv - sHi),
                tsBound(col, LessThanOrEqual, kv - sLo))
          else if (opIsLt) tsBound(col, LessThan, kv - sLo)
          else if (opIsLe) tsBound(col, LessThanOrEqual, kv - sLo)
          else if (opIsGt) tsBound(col, GreaterThan, kv - sHi)
          else if (opIsGe) tsBound(col, GreaterThanOrEqual, kv - sHi)
          else Unknown)
      }

    // epoch conversions are zone-free on TIMESTAMP columns; on NTZ columns
    // they go through the session zone, so require UTC there
    def epochZoneOk(inner: Expression, tz: Option[String]): Boolean =
      inner.dataType == TimestampType ||
        (inner.dataType == TimestampNTZType && utcOk(tz))
    def longK: Option[Long] = k.dataType match {
      case LongType if k.value != null => Some(k.value.asInstanceOf[Long])
      case IntegerType if k.value != null => Some(k.value.asInstanceOf[Int].toLong)
      case _ => None
    }

    /** A recognized epoch-number transform of a ts column: the column and
      * its unit in micros (floorDiv semantics in all of Spark's unix_*
      * family). Shared by the custom-binning patterns below. */
    def epochUnitOf(e: Expression): Option[(String, Long)] = e match {
      case UnixMicros(inner) => tsColumnOf(inner).map((_, 1L))
      case UnixMillis(inner) => tsColumnOf(inner).map((_, 1000L))
      case UnixSeconds(inner) => tsColumnOf(inner).map((_, 1000000L))
      case UnixTimestamp(inner, _, tz, _) if epochZoneOk(inner, tz) =>
        tsColumnOf(inner).map((_, 1000000L))
      case ToUnixTimestamp(inner, _, tz, _) if epochZoneOk(inner, tz) =>
        tsColumnOf(inner).map((_, 1000000L))
      case _ => None
    }

    /** The TimeWindowing rewrite of `window(ts, w).start`:
      * PTC(PTC(ts) − floorMod(PTC(ts) − startTime, slide) ± consts) where
      * floorMod is the generated CASE WHEN over %, exact floor semantics
      * for every ts including pre-epoch. Returns (column, startTime,
      * slide, constOffset). This is the Spark analog of the reference's
      * date_bin pruning (time_predicate.rs:513-551, 1017-1104). */
    def windowBase(e: Expression): Option[(String, Long, Long, Long)] = {
      def ptcCol(t: Expression): Option[String] = t match {
        case PreciseTimestampConversion(inner, TimestampType, LongType) => tsColumnOf(inner)
        case _ => None
      }
      def floorModArgs(cw: CaseWhen, t: Expression): Option[(Long, Long)] = cw match {
        case CaseWhen(Seq((LessThan(r1, Literal(0L, LongType)), Add(r2, Literal(s1: Long, LongType), _))),
                      Some(r3)) =>
          r1 match {
            case Remainder(Subtract(t2, Literal(start: Long, LongType), _),
                           Literal(slide: Long, LongType), _)
                if slide > 0 && slide == s1 && t2.semanticEquals(t) &&
                   r2.semanticEquals(r1) && r3.semanticEquals(r1) => Some((start, slide))
            case _ => None
          }
        case _ => None
      }
      e match {
        case Subtract(inner, Literal(c: Long, LongType), _) =>
          inner match {
            case Subtract(t, cw: CaseWhen, _) => // the core, with trailing const
              for { col <- ptcCol(t); (st, sl) <- floorModArgs(cw, t) } yield (col, st, sl, -c)
            case _ => windowBase(inner).map { case (col, st, sl, acc) => (col, st, sl, acc - c) }
          }
        case Add(inner, Literal(c: Long, LongType), _) =>
          windowBase(inner).map { case (col, st, sl, acc) => (col, st, sl, acc + c) }
        case Add(Literal(c: Long, LongType), inner, _) =>
          windowBase(inner).map { case (col, st, sl, acc) => (col, st, sl, acc + c) }
        case Subtract(t, cw: CaseWhen, _) =>
          for { col <- ptcCol(t); (st, sl) <- floorModArgs(cw, t) } yield (col, st, sl, 0L)
        case _ => None
      }
    }

    colE match {
      // analysis wrapper around the TimeWindowing rewrite — transparent
      case KnownNullable(c) => transformCmp(b, flipped, c, k, stats, rows)

      // window(ts, w).start/.end OP k — exact stride bucketing: the value
      // is start-grid-aligned with value ≤ ts < value + slide (+ const)
      case PreciseTimestampConversion(x, LongType, TimestampType)
          if (k.dataType == TimestampType || k.dataType == TimestampNTZType) && k.value != null =>
        windowBase(x) match {
          case Some((col, start, slide, c)) =>
            try {
              val kAdj = Math.subtractExact(k.value.asInstanceOf[Long], c)
              val lo = Math.subtractExact(kAdj,
                Math.floorMod(Math.subtractExact(kAdj, start), slide))
              bucketCmp(col, exact = true, aligned = lo == kAdj,
                lo, Math.addExact(lo, slide), 0L)
            } catch { case _: ArithmeticException => Unknown }
          case None => Unknown
        }

      // date_bin(stride, ts, origin) OP k — the name-level analog of the
      // reference's date_bin pruning (time_predicate.rs:513-551): the
      // value is origin-anchored stride-grid-aligned with
      // value ≤ ts < value + stride; pure micros arithmetic, zone-free on
      // both timestamp flavors (the NTZ literal's micros share the
      // column's NTZ domain)
      case graft.functions.DateBin(
            Literal(s: Long, org.apache.spark.sql.types.DayTimeIntervalType(_, _)), inner,
            Literal(o: Long, ot))
          if s > 0 && tsColumnOf(inner).isDefined &&
             (ot == TimestampType || ot == TimestampNTZType) &&
             (k.dataType == TimestampType || k.dataType == TimestampNTZType) && k.value != null =>
        try {
          val kv = k.value.asInstanceOf[Long]
          // the SAME kernel the runtime expression evaluates — pruning
          // bounds must stay bit-identical to what date_bin() computes
          val lo = graft.functions.TimeKernels.dateBin(s, kv, o)
          bucketCmp(tsColumnOf(inner).get, exact = true, aligned = lo == kv,
            lo, Math.addExact(lo, s), 0L)
        } catch { case _: ArithmeticException => Unknown }

      // custom binning: unix_*(ts) div S — Spark div truncates toward
      // zero, so bucket k spans [kS, kS+S) for k>0, (-S, S) for k=0,
      // (kS-S, kS] for k<0; floorDiv epochs compose exactly with ×unit
      case IntegralDivide(inner, Literal(s: Long, LongType), _)
          if s > 0 && longK.isDefined && epochUnitOf(inner).isDefined =>
        val (col, u) = epochUnitOf(inner).get
        try {
          val kv = longK.get
          val kS = Math.multiplyExact(kv, s)
          val loS = if (kv > 0) kS else Math.addExact(kS, 1L - s)
          val hiS = if (kv >= 0) Math.addExact(kS, s) else Math.addExact(kS, 1L)
          bucketCmp(col, exact = true, aligned = true,
            Math.multiplyExact(loS, u), Math.multiplyExact(hiS, u), 0L)
        } catch { case _: ArithmeticException => Unknown }

      // custom binning through doubles: floor(unix_*(ts) / S). Double
      // division rounds, so the computed floor can be off by one near
      // bucket boundaries — widen one bucket each side and clamp to a
      // necessary-only condition (exact=false)
      case Floor(Divide(Cast(inner, DoubleType, _, _), Literal(sD: Double, DoubleType), _))
          if sD > 0 && java.lang.Double.isFinite(sD) && longK.isDefined &&
             epochUnitOf(inner).isDefined =>
        val (col, u) = epochUnitOf(inner).get
        val kv = longK.get.toDouble
        val loD = (kv - 1.0) * sD * u
        val hiD = (kv + 2.0) * sD * u
        if (!java.lang.Double.isFinite(loD) || !java.lang.Double.isFinite(hiD) ||
            loD < -4.6e18 || hiD > 4.6e18) Unknown
        else bucketCmp(col, exact = false, aligned = false,
          math.floor(loD).toLong, math.ceil(hiD).toLong, 0L)

      // to_date(ts) / CAST(ts AS DATE): k is a DateType literal (days).
      // NTZ casts are zone-free; TIMESTAMP casts bucket by the zone's real
      // local day with a ±DstPad pad for Olson zones.
      case Cast(inner, DateType, tz, _) if tsColumnOf(inner).isDefined &&
          k.dataType == DateType && k.value != null =>
        val col = tsColumnOf(inner).get
        val zone = if (inner.dataType == TimestampNTZType) Some(java.time.ZoneOffset.UTC: java.time.ZoneId)
                   else zoneOf(tz)
        zone match {
          case None => Unknown
          case Some(z) =>
            val d = java.time.LocalDate.ofEpochDay(k.value.asInstanceOf[Int].toLong)
            (zdtMicros(d.atStartOfDay(z)), zdtMicros(d.plusDays(1).atStartOfDay(z))) match {
              case (Some(lo), Some(hi)) =>
                val pad = if (z.getRules.isFixedOffset) 0L else DstPadMicros
                // every date literal is bucket-aligned by construction
                bucketCmp(col, exact = pad == 0L, aligned = true, lo, hi, pad)
              case _ => Unknown
            }
        }

      // date_trunc(unit, ts): k is a TIMESTAMP(_NTZ) literal (micros);
      // bucket boundaries from zoned calendar arithmetic (week/month/
      // quarter/year included), padded ±1 h for non-fixed-offset zones
      case TruncTimestamp(Literal(fmt: UTF8String, _), inner, tz) if tsColumnOf(inner).isDefined &&
          (k.dataType == TimestampType || k.dataType == TimestampNTZType) && k.value != null =>
        val zone = if (k.dataType == TimestampNTZType || inner.dataType == TimestampNTZType)
                     Some(java.time.ZoneOffset.UTC: java.time.ZoneId) // NTZ trunc is zone-free
                   else zoneOf(tz)
        zone.flatMap(z => truncBucket(fmt.toString, k.value.asInstanceOf[Long], z)
          .map { case (exact, aligned, lo, hi) =>
            bucketCmp(tsColumnOf(inner).get, exact, aligned, lo, hi,
              if (exact) 0L else DstPadMicros)
          }).getOrElse(Unknown)

      // unix epoch family: to_unixtime/unix_timestamp (seconds) and the
      // unix_seconds/millis/micros triplet — floor-division bucketing
      case UnixMicros(inner) if tsColumnOf(inner).isDefined && longK.isDefined =>
        epochCmp(tsColumnOf(inner).get, longK.get, 1L)
      case UnixMillis(inner) if tsColumnOf(inner).isDefined && longK.isDefined =>
        epochCmp(tsColumnOf(inner).get, longK.get, 1000L)
      case UnixSeconds(inner) if tsColumnOf(inner).isDefined && longK.isDefined =>
        epochCmp(tsColumnOf(inner).get, longK.get, 1000000L)
      case UnixTimestamp(inner, _, tz, _) if tsColumnOf(inner).isDefined &&
          epochZoneOk(inner, tz) && longK.isDefined =>
        epochCmp(tsColumnOf(inner).get, longK.get, 1000000L)
      case ToUnixTimestamp(inner, _, tz, _) if tsColumnOf(inner).isDefined &&
          epochZoneOk(inner, tz) && longK.isDefined =>
        epochCmp(tsColumnOf(inner).get, longK.get, 1000000L)

      // ts ± INTERVAL: (ts + s) OP k with the shift bounded s ∈ [sLo, sHi].
      // Fixed-duration intervals have sLo == sHi (exact rewrite); calendar
      // components widen soundly — months to [28, 31] days, and ±DstPad on
      // month/day components under non-fixed zones (DST changes the
      // absolute length of calendar units); exact under UTC/NTZ.
      case TimestampAddInterval(inner, Literal(ivVal, ivType), tz)
          if tsColumnOf(inner).isDefined &&
             (k.dataType == TimestampType || k.dataType == TimestampNTZType) &&
             k.value != null =>
        // calendar components are zone-sensitive: under a non-fixed zone a
        // zone transition shifts the absolute duration of a calendar month
        // or day by the transition size — up to a full skipped/repeated day
        // (Pacific/Apia 2011), so the bounds carry ±ZoneShiftPad there
        val zoneExact = utcOk(tz) || inner.dataType == TimestampNTZType
        val zPad = if (zoneExact) 0L else ZoneShiftPadMicros
        val boundsOpt: Option[(Long, Long)] = ivVal match {
          case ci: org.apache.spark.unsafe.types.CalendarInterval =>
            val mLo = math.min(ci.months.toLong * 28, ci.months.toLong * 31) * MicrosPerDay
            val mHi = math.max(ci.months.toLong * 28, ci.months.toLong * 31) * MicrosPerDay
            val monthPad = if (ci.months == 0) 0L else zPad
            val dayPad = if (ci.days == 0) 0L else zPad
            val d = ci.days.toLong * MicrosPerDay
            Some((mLo - monthPad + d - dayPad + ci.microseconds,
                  mHi + monthPad + d + dayPad + ci.microseconds))
          case l: java.lang.Long if ivType.isInstanceOf[org.apache.spark.sql.types.DayTimeIntervalType] =>
            Some((l.longValue(), l.longValue())) // exact duration, zone-free
          case _ => None
        }
        boundsOpt match {
          case None => Unknown
          case Some((sLo, sHi)) =>
            shiftedCmp(tsColumnOf(inner).get, k.value.asInstanceOf[Long], sLo, sHi)
        }

      // ts ± year-month INTERVAL (ANSI): distinct Catalyst node; months
      // widen to [28, 31] days each, ±DstPad under non-fixed zones (a DST
      // transition inside the month shifts its absolute duration)
      case TimestampAddYMInterval(inner, Literal(months: Int, _: YearMonthIntervalType), tz)
          if tsColumnOf(inner).isDefined &&
             (k.dataType == TimestampType || k.dataType == TimestampNTZType) &&
             k.value != null =>
        val m = months.toLong
        val ymPad = if (utcOk(tz) || inner.dataType == TimestampNTZType) 0L else ZoneShiftPadMicros
        val sLo = math.min(m * 28, m * 31) * MicrosPerDay - ymPad
        val sHi = math.max(m * 28, m * 31) * MicrosPerDay + ymPad
        shiftedCmp(tsColumnOf(inner).get, k.value.asInstanceOf[Long], sLo, sHi)

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
