package graft

import org.apache.spark.sql.functions._
import graft.plans.{AsOf, Interval}

/** SQL TABLE-function surface ([[graft.plans.TableFunctions]]):
  * `graft_asof_join` / `graft_interval_join` must produce bit-identical
  * results to the DataFrame entry points (they share the `planFor`
  * cores), accept the optional tie-break/outer arguments, plan to the
  * native execs, and fail loudly on bad arguments.
  */
class TableFunctionSpec extends SparkSpec {

  graft.GraftExtensions.register(spark)

  private val sf = "/root/testdata/sf0.001"

  private def registerEventViews(): Unit = {
    val ev = graft.ops.Tables
      .events(spark, sf)
      .filter(col("event_type").isin("view", "click"))
    ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
      .createOrReplaceTempView("tvf_clicks")
    ev.filter(col("event_type") === "view")
      .select(
        col("event_id").as("view_id"),
        col("user_id").as("v_user"),
        col("ts").as("vts"),
        col("value").as("view_value")
      )
      .createOrReplaceTempView("tvf_views")
  }

  test("graft_asof_join TVF equals the DataFrame API (incl. tie-break and outer)") {
    registerEventViews()
    val viaSql = spark
      .sql(
        """SELECT * FROM graft_asof_join(
          |  TABLE(tvf_clicks), TABLE(tvf_views),
          |  'user_id', 'v_user', 'ts', 'vts', 'view_id', true)""".stripMargin
      )
    assert(
      viaSql.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      s"TVF did not plan to the native exec:\n${viaSql.queryExecution.executedPlan}"
    )
    val viaApi = AsOf.asofJoin(
      spark.table("tvf_clicks"),
      spark.table("tvf_views"),
      Seq("user_id"),
      Seq("v_user"),
      "ts",
      "vts",
      rightTieBreak = Seq("view_id"),
      outer = true
    )
    val s = viaSql.collect().map(_.toSeq).toSet
    val a = viaApi.collect().map(_.toSeq).toSet
    assert(s == a, s"TVF minus API: ${(s -- a).take(3)}; API minus TVF: ${(a -- s).take(3)}")
    assert(s.nonEmpty)
  }

  test("graft_asof_join TVF mode strings: 'semi'/'anti'/'next'/'next_semi' equal the API") {
    registerEventViews()
    // semi: left columns only
    val semiSql = spark.sql(
      """SELECT * FROM graft_asof_join(
        |  TABLE(tvf_clicks), TABLE(tvf_views),
        |  'user_id', 'v_user', 'ts', 'vts', 'semi')""".stripMargin)
    val semiApi = AsOf.asofSemiJoin(
      spark.table("tvf_clicks"), spark.table("tvf_views"),
      Seq("user_id"), Seq("v_user"), "ts", "vts")
    assert(semiSql.columns.toSeq == Seq("event_id", "user_id", "ts"))
    assert(semiSql.collect().map(_.toSeq).toSet == semiApi.collect().map(_.toSeq).toSet)
    // anti is the complement
    val antiSql = spark.sql(
      """SELECT * FROM graft_asof_join(
        |  TABLE(tvf_clicks), TABLE(tvf_views),
        |  'user_id', 'v_user', 'ts', 'vts', 'anti')""".stripMargin)
    assert(semiSql.count() + antiSql.count() == spark.table("tvf_clicks").count())
    // next (backward): earliest at-or-after view per click
    val nextSql = spark.sql(
      """SELECT * FROM graft_asof_join(
        |  TABLE(tvf_clicks), TABLE(tvf_views),
        |  'user_id', 'v_user', 'ts', 'vts', 'view_id', 'next')""".stripMargin)
    assert(nextSql.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    val nextApi = AsOf.asofNextJoin(
      spark.table("tvf_clicks"), spark.table("tvf_views"),
      Seq("user_id"), Seq("v_user"), "ts", "vts", rightTieBreak = Seq("view_id"))
    val (ns, na) = (nextSql.collect().map(_.toSeq).toSet, nextApi.collect().map(_.toSeq).toSet)
    assert(ns == na && ns.nonEmpty, s"next TVF != API: ${(ns -- na).take(3)} / ${(na -- ns).take(3)}")
    // next_semi: has a view at or AFTER the click
    val nextSemiSql = spark.sql(
      """SELECT * FROM graft_asof_join(
        |  TABLE(tvf_clicks), TABLE(tvf_views),
        |  'user_id', 'v_user', 'ts', 'vts', 'next_semi')""".stripMargin)
    // differential vs the EXISTS formulation (rewrite may or may not
    // fire at this size; semantics must agree either way)
    val existsRef = spark.sql(
      """SELECT * FROM tvf_clicks c WHERE EXISTS (
        |  SELECT 1 FROM tvf_views v WHERE v.v_user = c.user_id AND v.vts >= c.ts)""".stripMargin)
    assert(nextSemiSql.collect().map(_.toSeq).toSet == existsRef.collect().map(_.toSeq).toSet)
    // next_semi TVF == the API's forward=false semi; next_anti is the
    // complement and equals the API too — the full backward existence
    // family, reachable from BOTH surfaces
    val nextSemiApi = AsOf.asofSemiJoin(
      spark.table("tvf_clicks"), spark.table("tvf_views"),
      Seq("user_id"), Seq("v_user"), "ts", "vts", forward = false)
    assert(nextSemiSql.collect().map(_.toSeq).toSet ==
      nextSemiApi.collect().map(_.toSeq).toSet)
    val nextAntiSql = spark.sql(
      """SELECT * FROM graft_asof_join(
        |  TABLE(tvf_clicks), TABLE(tvf_views),
        |  'user_id', 'v_user', 'ts', 'vts', 'next_anti')""".stripMargin)
    val nextAntiApi = AsOf.asofAntiJoin(
      spark.table("tvf_clicks"), spark.table("tvf_views"),
      Seq("user_id"), Seq("v_user"), "ts", "vts", forward = false)
    assert(nextAntiSql.collect().map(_.toSeq).toSet ==
      nextAntiApi.collect().map(_.toSeq).toSet)
    assert(nextSemiSql.count() + nextAntiSql.count() == spark.table("tvf_clicks").count())
  }

  test("TVF 'exists'/'next_exists' modes: flagged EXISTS equals the API and splits into semi/anti") {
    registerEventViews()
    val clicks = spark.table("tvf_clicks")
    // forward: every click once + boolean `matched`
    val exSql = spark.sql(
      """SELECT * FROM graft_asof_join(
        |  TABLE(tvf_clicks), TABLE(tvf_views),
        |  'user_id', 'v_user', 'ts', 'vts', 'exists')""".stripMargin)
    assert(exSql.columns.toSeq == Seq("event_id", "user_id", "ts", "matched"))
    assert(exSql.count() == clicks.count(), "exists mode must preserve every left row once")
    assert(exSql.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    val exApi = graft.plans.AsOf.asofExistsJoin(
      clicks, spark.table("tvf_views"), Seq("user_id"), Seq("v_user"), "ts", "vts")
    assert(exSql.collect().map(_.toSeq).toSet == exApi.collect().map(_.toSeq).toSet)
    // matched==true projects to exactly the semi set; false to the anti set
    val semi = spark.sql(
      """SELECT * FROM graft_asof_join(TABLE(tvf_clicks), TABLE(tvf_views),
        |  'user_id', 'v_user', 'ts', 'vts', 'semi')""".stripMargin)
    assert(exSql.filter(col("matched")).drop("matched").collect().map(_.toSeq).toSet ==
      semi.collect().map(_.toSeq).toSet)
    val anti = spark.sql(
      """SELECT * FROM graft_asof_join(TABLE(tvf_clicks), TABLE(tvf_views),
        |  'user_id', 'v_user', 'ts', 'vts', 'anti')""".stripMargin)
    assert(exSql.filter(!col("matched")).drop("matched").collect().map(_.toSeq).toSet ==
      anti.collect().map(_.toSeq).toSet)
    // backward: 'next_exists' == API forward=false; same split invariant
    val nexSql = spark.sql(
      """SELECT * FROM graft_asof_join(
        |  TABLE(tvf_clicks), TABLE(tvf_views),
        |  'user_id', 'v_user', 'ts', 'vts', 'next_exists')""".stripMargin)
    assert(nexSql.count() == clicks.count())
    val nexApi = graft.plans.AsOf.asofExistsJoin(
      clicks, spark.table("tvf_views"), Seq("user_id"), Seq("v_user"), "ts", "vts",
      forward = false)
    assert(nexSql.collect().map(_.toSeq).toSet == nexApi.collect().map(_.toSeq).toSet)
    val nextSemi = spark.sql(
      """SELECT * FROM graft_asof_join(TABLE(tvf_clicks), TABLE(tvf_views),
        |  'user_id', 'v_user', 'ts', 'vts', 'next_semi')""".stripMargin)
    assert(nexSql.filter(col("matched")).drop("matched").collect().map(_.toSeq).toSet ==
      nextSemi.collect().map(_.toSeq).toSet)
    // custom flag-column name through the API
    val named = graft.plans.AsOf.asofExistsJoin(
      clicks, spark.table("tvf_views"), Seq("user_id"), Seq("v_user"), "ts", "vts",
      existsCol = "has_view")
    assert(named.columns.last == "has_view")
    // …and through the TVF mode literal ('exists=<col>' — the SQL twin;
    // needed when the left table already carries a `matched` column)
    val namedSql = spark.sql(
      """SELECT * FROM graft_asof_join(TABLE(tvf_clicks), TABLE(tvf_views),
        |  'user_id', 'v_user', 'ts', 'vts', 'exists=has_view')""".stripMargin)
    assert(namedSql.columns.last == "has_view")
    assert(namedSql.collect().map(_.toSeq).toSet == named.collect().map(_.toSeq).toSet)
    // the '=' rename is exists-only: a renamed non-exists mode is not a
    // mode literal (falls through to the tie-break/mode error path)
    val badMode = intercept[IllegalArgumentException] {
      spark.sql(
        """SELECT * FROM graft_asof_join(TABLE(tvf_clicks), TABLE(tvf_views),
          |  'user_id', 'v_user', 'ts', 'vts', '', 'semi=x')""".stripMargin).collect()
    }
    assert(badMode.getMessage.contains("argument 8"), badMode.getMessage)
  }

  test("graft_interval_join 'exists' mode: flagged coverage equals the API and splits into semi/anti") {
    import spark.implicits._
    (1L to 60L).map(i => (i % 5, i)).toDF("k", "t").createOrReplaceTempView("tvx_points")
    Seq((0L, 10L, 20L), (1L, 5L, 8L), (2L, 100L, 200L))
      .toDF("ik", "lo", "hi").createOrReplaceTempView("tvx_iv")
    val exSql = spark.sql(
      """SELECT * FROM graft_interval_join(
        |  TABLE(tvx_points), TABLE(tvx_iv), 'k', 'ik', 't', 'lo', 'hi', 'exists')""".stripMargin)
    assert(exSql.columns.toSeq == Seq("k", "t", "matched"))
    assert(exSql.count() == 60L, "interval exists mode must preserve every point once")
    val exApi = Interval.intervalExistsJoin(
      spark.table("tvx_points"), spark.table("tvx_iv"),
      Seq("k"), Seq("ik"), "t", "lo", "hi")
    assert(exSql.collect().map(_.toSeq).toSet == exApi.collect().map(_.toSeq).toSet)
    val semi = spark.sql(
      """SELECT * FROM graft_interval_join(
        |  TABLE(tvx_points), TABLE(tvx_iv), 'k', 'ik', 't', 'lo', 'hi', 'semi')""".stripMargin)
    assert(exSql.filter(col("matched")).drop("matched").collect().map(_.toSeq).toSet ==
      semi.collect().map(_.toSeq).toSet)
    val anti = spark.sql(
      """SELECT * FROM graft_interval_join(
        |  TABLE(tvx_points), TABLE(tvx_iv), 'k', 'ik', 't', 'lo', 'hi', 'anti')""".stripMargin)
    assert(exSql.filter(!col("matched")).drop("matched").collect().map(_.toSeq).toSet ==
      anti.collect().map(_.toSeq).toSet)
    // ground truth on the tiny frame: k=0 points covered iff t ∈ [10,20]
    val covered = exSql.filter(col("k") === 0L && col("matched")).select("t")
      .collect().map(_.getLong(0)).toSet
    assert(covered == (10L to 20L).filter(_ % 5 == 0).toSet)
    // flag rename through the mode literal (SQL twin of existsCol)
    val namedSql = spark.sql(
      """SELECT * FROM graft_interval_join(
        |  TABLE(tvx_points), TABLE(tvx_iv), 'k', 'ik', 't', 'lo', 'hi',
        |  'exists=covered')""".stripMargin)
    assert(namedSql.columns.toSeq == Seq("k", "t", "covered"))
    assert(namedSql.collect().map(_.toSeq).toSet == exSql.collect().map(_.toSeq).toSet)
  }

  test("graft_interval_join TVF equals the DataFrame API") {
    import spark.implicits._
    (1L to 60L).map(i => (i % 5, i)).toDF("k", "t").createOrReplaceTempView("tvf_points")
    (1L to 25L).map(i => (i % 5, i, i + 9)).toDF("rk", "s", "e").createOrReplaceTempView("tvf_ivals")
    val viaSql = spark.sql(
      """SELECT * FROM graft_interval_join(
        |  TABLE(tvf_points), TABLE(tvf_ivals), 'k', 'rk', 't', 's', 'e')""".stripMargin
    )
    assert(viaSql.queryExecution.executedPlan.toString.contains("IntervalJoin"))
    val viaApi = Interval.intervalJoin(
      spark.table("tvf_points"),
      spark.table("tvf_ivals"),
      Seq("k"),
      Seq("rk"),
      "t",
      "s",
      "e"
    )
    val s = viaSql.collect().map(_.toSeq).toSet
    assert(s == viaApi.collect().map(_.toSeq).toSet && s.nonEmpty)
  }

  test("graft_interval_join: outer flag null-extends uncovered points") {
    import spark.implicits._
    Seq((1L, 5L), (1L, 100L)).toDF("k", "t").createOrReplaceTempView("tvf_op")
    Seq((1L, 1L, 10L)).toDF("rk", "s", "e").createOrReplaceTempView("tvf_oi")
    val rows = spark.sql(
      """SELECT * FROM graft_interval_join(
        |  TABLE(tvf_op), TABLE(tvf_oi), 'k', 'rk', 't', 's', 'e', true)""".stripMargin
    ).collect()
    assert(rows.length == 2)
    val uncovered = rows.find(_.getLong(1) == 100L).get
    assert(uncovered.isNullAt(2) && uncovered.isNullAt(3) && uncovered.isNullAt(4))
    val covered = rows.find(_.getLong(1) == 5L).get
    assert(covered.getLong(2) == 1L && covered.getLong(3) == 1L && covered.getLong(4) == 10L)
  }

  test("TVF self-join: the same view on both sides works (right side re-aliased)") {
    import spark.implicits._
    (1L to 30L).map(i => (i % 3, i, i)).toDF("k", "t", "x").createOrReplaceTempView("tvf_self")
    val df = spark.sql(
      """SELECT * FROM graft_asof_join(
        |  TABLE(tvf_self), TABLE(tvf_self), 'k', 'k', 't', 't')""".stripMargin
    )
    // every row as-of-matches itself (inclusive bound): t == matched t
    val rows = df.collect()
    assert(rows.length == 30 && rows.forall(r => r.getLong(1) == r.getLong(4)))
  }

  test("graft_asof_join: trailing boolean without a tie-break means outer") {
    registerEventViews()
    val viaSql = spark.sql(
      """SELECT * FROM graft_asof_join(
        |  TABLE(tvf_clicks), TABLE(tvf_views), 'user_id', 'v_user', 'ts', 'vts', true)""".stripMargin
    )
    val viaApi = AsOf.asofJoin(
      spark.table("tvf_clicks"), spark.table("tvf_views"),
      Seq("user_id"), Seq("v_user"), "ts", "vts", outer = true)
    val s = viaSql.collect().map(_.toSeq).toSet
    assert(s == viaApi.collect().map(_.toSeq).toSet && s.nonEmpty)
    // outer must actually null-extend: some clicks have no prior view
    assert(viaSql.filter(col("view_id").isNull).count() > 0L)
  }

  test("graft_interval_join: mode strings semi/anti equal the DataFrame API") {
    import spark.implicits._
    (1L to 60L).map(i => (i % 5, i, i * 10)).toDF("k", "t", "pid")
      .createOrReplaceTempView("tvf_pts")
    (1L to 25L).map(i => (i % 5, i, i + 8, i * 3)).toDF("rk", "s", "e", "rid")
      .createOrReplaceTempView("tvf_ivs")
    def tvf(m: String) = spark.sql(
      s"""SELECT * FROM graft_interval_join(TABLE(tvf_pts), TABLE(tvf_ivs),
         |  'k', 'rk', 't', 's', 'e', '$m')""".stripMargin)
    val semi = tvf("semi")
    assert(semi.columns.toSeq == Seq("k", "t", "pid"), "semi emits left columns only")
    val semiApi = Interval.intervalSemiJoin(
      spark.table("tvf_pts"), spark.table("tvf_ivs"), Seq("k"), Seq("rk"), "t", "s", "e")
    assert(semi.collect().map(_.toSeq).toSet == semiApi.collect().map(_.toSeq).toSet)
    val anti = tvf("anti")
    val antiApi = Interval.intervalAntiJoin(
      spark.table("tvf_pts"), spark.table("tvf_ivs"), Seq("k"), Seq("rk"), "t", "s", "e")
    assert(anti.collect().map(_.toSeq).toSet == antiApi.collect().map(_.toSeq).toSet)
    assert(semi.count() > 0 && anti.count() > 0, "vacuous fixture")
    assert(semi.count() + anti.count() == 60L, "semi+anti must partition the points")
    // 'outer' string == legacy boolean true
    assert(tvf("outer").collect().map(_.toSeq).toSet ==
      spark.sql(
        """SELECT * FROM graft_interval_join(TABLE(tvf_pts), TABLE(tvf_ivs),
          |  'k', 'rk', 't', 's', 'e', true)""".stripMargin).collect().map(_.toSeq).toSet)
  }

  test("TVF trailing-argument dispatch rejects non-literal and mistyped arguments loudly") {
    registerEventViews()
    // as-of 7th argument must be a literal: a column/expression can't
    // dispatch between (tieBreaks) and (outer) and must say so
    val nonLit = intercept[Exception] {
      spark.sql(
        """SELECT * FROM graft_asof_join(
          |  TABLE(tvf_clicks), TABLE(tvf_views), 'user_id', 'v_user', 'ts', 'vts',
          |  upper('view_id'))""".stripMargin).collect()
    }
    assert(nonLit.getMessage.contains("must be a string literal"), s"got: ${nonLit.getMessage}")
    // (bool, bool): the 7-th slot is the tie-break CSV once two trailing
    // args exist — a boolean there must be rejected, not silently treated
    // as the outer flag
    val boolAsTieBreak = intercept[Exception] {
      spark.sql(
        """SELECT * FROM graft_asof_join(
          |  TABLE(tvf_clicks), TABLE(tvf_views), 'user_id', 'v_user', 'ts', 'vts',
          |  true, true)""".stripMargin).collect()
    }
    assert(boolAsTieBreak.getMessage.contains("must be a string literal"),
      s"got: ${boolAsTieBreak.getMessage}")
    // (tieBreaks, 'yes'): the 8th slot must be a boolean or a mode string
    val badOuter = intercept[Exception] {
      spark.sql(
        """SELECT * FROM graft_asof_join(
          |  TABLE(tvf_clicks), TABLE(tvf_views), 'user_id', 'v_user', 'ts', 'vts',
          |  'view_id', 'yes')""".stripMargin).collect()
    }
    assert(badOuter.getMessage.contains("'inner'|'outer'|'semi'|'anti'"),
      s"got: ${badOuter.getMessage}")
    // interval mode: unknown strings and non-literals name the contract
    val badMode = intercept[Exception] {
      spark.sql(
        """SELECT * FROM graft_interval_join(
          |  TABLE(tvf_clicks), TABLE(tvf_views), 'user_id', 'v_user', 'ts', 'ts', 'ts',
          |  'sideways')""".stripMargin).collect()
    }
    assert(badMode.getMessage.contains("inner/outer/semi/anti"), s"got: ${badMode.getMessage}")
    val nonLitMode = intercept[Exception] {
      spark.sql(
        """SELECT * FROM graft_interval_join(
          |  TABLE(tvf_clicks), TABLE(tvf_views), 'user_id', 'v_user', 'ts', 'ts', 'ts',
          |  1 = 1)""".stripMargin).collect()
    }
    assert(nonLitMode.getMessage.contains("boolean or mode-string literal"),
      s"got: ${nonLitMode.getMessage}")
  }

  test("TVF argument errors are loud and name the problem") {
    registerEventViews()
    val noCol = intercept[Exception] {
      spark
        .sql(
          """SELECT * FROM graft_asof_join(
            |  TABLE(tvf_clicks), TABLE(tvf_views), 'nope', 'v_user', 'ts', 'vts')""".stripMargin
        )
        .collect()
    }
    assert(noCol.getMessage.contains("no column 'nope'"), s"got: ${noCol.getMessage}")
    val badArity = intercept[Exception] {
      spark.sql("SELECT * FROM graft_interval_join(TABLE(tvf_clicks), TABLE(tvf_views), 'a')").collect()
    }
    assert(badArity.getMessage.contains("7-8 arguments"), s"got: ${badArity.getMessage}")
    val notTable = intercept[Exception] {
      spark.sql("SELECT * FROM graft_asof_join(1, TABLE(tvf_views), 'a', 'b', 'c', 'd')").collect()
    }
    assert(notTable.getMessage.contains("must be TABLE"), s"got: ${notTable.getMessage}")
  }
}
