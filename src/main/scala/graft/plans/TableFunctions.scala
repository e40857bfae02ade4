package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Expression,
  FunctionTableSubqueryArgumentExpression,
  Literal
}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{BooleanType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL TABLE-function surface for the custom joins, so pure-SQL users can
  * reach them without the DataFrame entry points:
  *
  * {{{
  *   SELECT * FROM graft_asof_join(
  *     TABLE(clicks), TABLE(views), 'user_id', 'v_user', 'ts', 'vts')
  *
  *   SELECT * FROM graft_interval_join(
  *     TABLE(events), TABLE(sessions), 'user_id', 's_user',
  *     'us', 's_start', 's_end')
  * }}}
  *
  * Optional trailing arguments: as-of takes a tie-break column CSV and an
  * `outer` boolean; interval takes an `outer` boolean. Multi-key joins
  * pass comma-separated column lists. The analyzer hands TABLE(...)
  * arguments to the builder as fully-RESOLVED plans (verified — this is
  * what makes immediate name resolution possible), so both functions
  * delegate to the same `planFor` cores as the DataFrame API: identical
  * resolution, ambiguity checks, type validation, and self-join
  * re-aliasing. Registered via `GraftExtensions` (injectTableFunction)
  * and imperatively by `GraftExtensions.register`.
  */
object TableFunctions {

  private def tableArg(fn: String, args: Seq[Expression], pos: Int): LogicalPlan =
    args(pos) match {
      case t: FunctionTableSubqueryArgumentExpression if t.plan.resolved => t.plan
      case _: FunctionTableSubqueryArgumentExpression =>
        throw new IllegalArgumentException(s"$fn: TABLE argument ${pos + 1} is unresolved")
      case other =>
        throw new IllegalArgumentException(
          s"$fn: argument ${pos + 1} must be TABLE(...), got $other"
        )
    }

  private def strArg(fn: String, args: Seq[Expression], pos: Int): String =
    args(pos) match {
      case Literal(s: UTF8String, StringType) if s != null => s.toString
      case other =>
        throw new IllegalArgumentException(
          s"$fn: argument ${pos + 1} must be a string literal, got $other"
        )
    }

  private def csvArg(fn: String, args: Seq[Expression], pos: Int): Seq[String] =
    strArg(fn, args, pos).split(",").map(_.trim).filter(_.nonEmpty).toSeq

  private def boolArg(fn: String, args: Seq[Expression], pos: Int, default: Boolean): Boolean =
    if (args.length <= pos) default
    else
      args(pos) match {
        case Literal(b: Boolean, BooleanType) => b
        case other =>
          throw new IllegalArgumentException(
            s"$fn: argument ${pos + 1} must be a boolean literal, got $other"
          )
      }

  /** `graft_asof_join(TABLE l, TABLE r, lKeys, rKeys, lTime, rTime
    * [, tieBreaks] [, outer])` — the two optional trailing arguments
    * dispatch on literal type, so `(..., 'rt', true)` requests an outer
    * join without forcing an empty-string tie-break placeholder.
    */
  val asof: Seq[Expression] => LogicalPlan = { args =>
    val fn = "graft_asof_join"
    if (args.length < 6 || args.length > 8)
      throw new IllegalArgumentException(
        s"$fn takes 6-8 arguments (TABLE left, TABLE right, leftKeys, rightKeys," +
          s" leftTime, rightTime[, tieBreaks][, outer]), got ${args.length}"
      )
    // the trailing mode is `true`/`false` (outer/inner, the original
    // boolean form), one of 'inner' | 'outer' | 'semi' | 'anti' |
    // 'exists', or the BACKWARD (next-event) variants 'next' |
    // 'next_outer' | 'next_semi' | 'next_anti' | 'next_exists' — the
    // full AsOfJoinMode × direction lattice; a lone trailing string that
    // isn't a mode is the tie-break list. 'exists' emits every left row
    // plus a boolean `matched` column (the flagged EXISTS form);
    // 'exists=<col>' / 'next_exists=<col>' renames the flag — the SQL
    // twin of the DataFrame API's existsCol knob, needed when the left
    // table already has a column named `matched` (otherwise SELECT *
    // yields a duplicate name and every downstream reference is
    // ambiguous). The flag name keeps the caller's case; only the mode
    // word is case-normalized.
    def existsMode(flag: String): AsOfJoinMode = AsOfJoinMode.Existence(
      org.apache.spark.sql.catalyst.expressions.AttributeReference(
        flag, org.apache.spark.sql.types.BooleanType, nullable = false)())
    def modeOf(raw: Any): Option[(AsOfJoinMode, Boolean)] = raw match {
      case b: Boolean => Some((if (b) AsOfJoinMode.Outer else AsOfJoinMode.Inner, true))
      case s: String =>
        // Locale.ROOT: mode literals must parse identically under every
        // default locale (tr/az lowercase 'I' to a dotless ı)
        val (word, flag) = s.split("=", 2) match {
          case Array(m, c) if c.trim.nonEmpty =>
            (m.trim.toLowerCase(java.util.Locale.ROOT), c.trim)
          case _ => (s.toLowerCase(java.util.Locale.ROOT), "matched")
        }
        word match {
          case "inner" | "outer" | "semi" | "anti" | "next" | "next_outer" |
              "next_semi" | "next_anti" if flag != "matched" =>
            None // '=' rename is meaningful only for the exists forms
          case "inner"       => Some((AsOfJoinMode.Inner, true))
          case "outer"       => Some((AsOfJoinMode.Outer, true))
          case "semi"        => Some((AsOfJoinMode.Semi, true))
          case "anti"        => Some((AsOfJoinMode.Anti, true))
          case "exists"      => Some((existsMode(flag), true))
          case "next"        => Some((AsOfJoinMode.Inner, false))
          case "next_outer"  => Some((AsOfJoinMode.Outer, false))
          case "next_semi"   => Some((AsOfJoinMode.Semi, false))
          case "next_anti"   => Some((AsOfJoinMode.Anti, false))
          case "next_exists" => Some((existsMode(flag), false))
          case _             => None
        }
      case _ => None
    }
    // a lone 7th string is ambiguous between a tie-break list and a mode
    // name: it reads as a MODE only when it parses as one AND does not
    // resolve as a right-side column (a tie-break column literally named
    // 'next'/'semi'/… keeps its pre-mode-string meaning)
    def isRightColumn(name: String): Boolean = {
      val resolver = SQLConf.get.resolver
      tableArg(fn, args, 1).output.exists(a => resolver(a.name, name))
    }
    val trailing = args.drop(6)
    val (tieBreaks, (mode, forward)) = trailing match {
      case Seq() => (Nil, (AsOfJoinMode.Inner: AsOfJoinMode, true))
      case Seq(Literal(b: Boolean, BooleanType)) =>
        (Nil, (if (b) AsOfJoinMode.Outer else AsOfJoinMode.Inner, true))
      case Seq(Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType))
          if modeOf(s.toString).isDefined && !isRightColumn(s.toString) =>
        (Nil, modeOf(s.toString).get)
      case Seq(_) => (csvArg(fn, args, 6), (AsOfJoinMode.Inner: AsOfJoinMode, true))
      case Seq(_, last) =>
        val m = last match {
          case Literal(b: Boolean, BooleanType) => modeOf(b)
          case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) =>
            modeOf(s.toString)
          case _ => None
        }
        (csvArg(fn, args, 6), m.getOrElse(throw new IllegalArgumentException(
          s"$fn: argument 8 must be a boolean or one of " +
            s"'inner'|'outer'|'semi'|'anti'|'exists'|'next'|'next_outer'|" +
            s"'next_semi'|'next_anti'|'next_exists', got $last")))
    }
    AsOf.planFor(
      tableArg(fn, args, 0),
      tableArg(fn, args, 1),
      csvArg(fn, args, 2),
      csvArg(fn, args, 3),
      strArg(fn, args, 4),
      strArg(fn, args, 5),
      tieBreaks,
      mode,
      SQLConf.get.resolver,
      forward
    )
  }

  /** `graft_interval_join(TABLE l, TABLE r, lKeys, rKeys, lTime, rStart,
    * rEnd [, mode])` — `mode` is `true`/`false` (outer/inner, the original
    * boolean form) or one of `'inner' | 'outer' | 'semi' | 'anti' |
    * 'full'`.
    */
  val interval: Seq[Expression] => LogicalPlan = { args =>
    val fn = "graft_interval_join"
    if (args.length < 7 || args.length > 8)
      throw new IllegalArgumentException(
        s"$fn takes 7-8 arguments (TABLE left, TABLE right, leftKeys, rightKeys," +
          s" leftTime, rightStart, rightEnd[, mode]), got ${args.length}"
      )
    val mode =
      if (args.length <= 7) IntervalJoinMode.Inner
      else
        args(7) match {
          case Literal(b: Boolean, BooleanType) =>
            if (b) IntervalJoinMode.Outer else IntervalJoinMode.Inner
          case Literal(s: UTF8String, StringType) if s != null =>
            // 'exists=<col>' renames the flag column (the SQL twin of
            // intervalExistsJoin's existsCol — see the as-of TVF's note);
            // the flag keeps the caller's case, the mode word normalizes
            val (word, flag) = s.toString.trim.split("=", 2) match {
              case Array(m, c) if c.trim.nonEmpty =>
                (m.trim.toLowerCase(java.util.Locale.ROOT), c.trim)
              case _ => (s.toString.trim.toLowerCase(java.util.Locale.ROOT), "matched")
            }
            word match {
              case "inner" if flag == "matched"        => IntervalJoinMode.Inner
              case "outer" if flag == "matched"        => IntervalJoinMode.Outer
              case "semi" if flag == "matched"         => IntervalJoinMode.Semi
              case "anti" if flag == "matched"         => IntervalJoinMode.Anti
              case "full" | "fullouter" | "full_outer" if flag == "matched" =>
                IntervalJoinMode.FullOuter
              case "exists" => // flagged EXISTS: every point + boolean flag
                IntervalJoinMode.Existence(
                  org.apache.spark.sql.catalyst.expressions.AttributeReference(
                    flag, org.apache.spark.sql.types.BooleanType, nullable = false)())
              case other =>
                throw new IllegalArgumentException(
                  s"$fn: mode must be one of inner/outer/semi/anti/full/exists" +
                    s"/'exists=<col>', got '$other'")
            }
          case other =>
            throw new IllegalArgumentException(
              s"$fn: argument 8 must be a boolean or mode-string literal, got $other")
        }
    Interval.planFor(
      tableArg(fn, args, 0),
      tableArg(fn, args, 1),
      csvArg(fn, args, 2),
      csvArg(fn, args, 3),
      strArg(fn, args, 4),
      strArg(fn, args, 5),
      strArg(fn, args, 6),
      mode,
      SQLConf.get.resolver
    )
  }

  /** Registry entries shared by the extensions-config and imperative
    * registration paths.
    */
  val all: Seq[(String, Seq[Expression] => LogicalPlan)] = Seq(
    "graft_asof_join" -> asof,
    "graft_interval_join" -> interval
  )
}
