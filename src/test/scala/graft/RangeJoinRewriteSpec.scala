package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.RangeJoinRewrite

/** [[graft.plans.RangeJoinRewrite]]: plain equi+BETWEEN inner joins plan
  * to the native sweep-line interval exec — and every guard that must
  * stop the rewrite (strict bounds, outer joins, broadcast-sized sides,
  * the kill switch) actually stops it.
  */
class RangeJoinRewriteSpec extends SparkSpec {

  graft.GraftExtensions.register(spark)

  import spark.implicits._

  private def points = (1L to 400L).map(i => (i % 7, i, i * 2)).toDF("k", "t", "pv")
  private def ivals = (1L to 200L).map(i => (i % 7, i, i + 12, i * 3)).toDF("rk", "s", "e", "rv")

  private def hasIntervalExec(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("IntervalJoin")

  /** Run `body` with the broadcast guard disabled so local-relation stats
    * (always tiny) don't mask the rewrite under test.
    */
  private def noBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private def rewriteOff[A](body: => A): A = {
    spark.conf.set(RangeJoinRewrite.EnabledKey, "false")
    try body
    finally spark.conf.set(RangeJoinRewrite.EnabledKey, "true")
  }

  test("equi+BETWEEN inner join rewrites to the interval exec with identical results") {
    noBroadcast {
      val joined = points.join(
        ivals,
        col("k") === col("rk") && col("t").between(col("s"), col("e"))
      )
      assert(hasIntervalExec(joined), s"rewrite did not fire:\n${joined.queryExecution.executedPlan}")
      val got = joined.collect().map(_.toSeq).toSet
      val expected = rewriteOff {
        val plain = points.join(
          ivals,
          col("k") === col("rk") && col("t").between(col("s"), col("e"))
        )
        assert(!hasIntervalExec(plain), "kill switch ignored")
        plain.collect().map(_.toSeq).toSet
      }
      assert(got == expected && expected.nonEmpty)
    }
  }

  test("SQL surface: the same shape written as spark.sql rewrites too") {
    noBroadcast {
      points.createOrReplaceTempView("rjr_points")
      ivals.createOrReplaceTempView("rjr_ivals")
      val q = spark.sql(
        """SELECT pv, rv FROM rjr_points JOIN rjr_ivals
          |ON k = rk AND t BETWEEN s AND e AND pv + rv > 20""".stripMargin
      )
      assert(hasIntervalExec(q), s"SQL rewrite did not fire:\n${q.queryExecution.executedPlan}")
      // the non-range conjunct survives as a residual filter: results must
      // equal the un-rewritten join
      val expected = rewriteOff {
        spark.sql(
          """SELECT pv, rv FROM rjr_points JOIN rjr_ivals
            |ON k = rk AND t BETWEEN s AND e AND pv + rv > 20""".stripMargin
        ).collect().map(_.toSeq).toSet
      }
      assert(q.collect().map(_.toSeq).toSet == expected && expected.nonEmpty)
    }
  }

  test("flipped orientation (intervals on the left) rewrites and preserves column order") {
    noBroadcast {
      val joined = ivals.join(
        points,
        col("k") === col("rk") && col("t").between(col("s"), col("e"))
      )
      assert(hasIntervalExec(joined), s"flipped rewrite did not fire:\n${joined.queryExecution.executedPlan}")
      assert(joined.columns.toSeq == Seq("rk", "s", "e", "rv", "k", "t", "pv"))
      val expected = rewriteOff {
        ivals.join(points, col("k") === col("rk") && col("t").between(col("s"), col("e")))
          .collect().map(_.toSeq).toSet
      }
      assert(joined.collect().map(_.toSeq).toSet == expected && expected.nonEmpty)
    }
  }

  test("composition: a filter above a plain range join flows through rewrite then pushdown") {
    noBroadcast {
      val joined = points
        .join(ivals, col("k") === col("rk") && col("t").between(col("s"), col("e")))
        .filter(col("pv") > 100L && col("rv") % 2 === 0L && col("t") <= 150L)
      // RangeJoinRewrite turns the join into IntervalJoinPlan, then
      // CustomJoinOptimization must push/transfer every conjunct — no
      // Filter may remain above the custom node in the optimized plan
      val opt = joined.queryExecution.optimizedPlan
      assert(opt.toString.contains("IntervalJoin"), s"rewrite did not fire:\n$opt")
      val filterAbove = opt.exists {
        case org.apache.spark.sql.catalyst.plans.logical.Filter(_, _: graft.plans.IntervalJoinPlan) => true
        case _ => false
      }
      assert(!filterAbove, s"conjuncts not pushed through the rewritten node:\n$opt")
      val expected = rewriteOff {
        points
          .join(ivals, col("k") === col("rk") && col("t").between(col("s"), col("e")))
          .filter(col("pv") > 100L && col("rv") % 2 === 0L && col("t") <= 150L)
          .collect().map(_.toSeq).toSet
      }
      assert(joined.collect().map(_.toSeq).toSet == expected && expected.nonEmpty)
    }
  }

  test("randomized differential incl. NULLs: rewrite on == rewrite off") {
    noBroadcast {
      (1 to 4).foreach { round =>
        // NULL keys, times and bounds included: the rewrite must preserve
        // SQL's null-never-matches join semantics exactly
        val pts = spark
          .range(round * 137L, round * 137L + 300L)
          .selectExpr(
            "IF(id % 11 = 0, NULL, id % 7) AS k",
            "IF(id % 13 = 0, NULL, id % 97) AS t",
            "id AS pv"
          )
        val ivs = spark
          .range(round * 31L, round * 31L + 120L)
          .selectExpr(
            "IF(id % 9 = 0, NULL, id % 7) AS rk",
            "IF(id % 17 = 0, NULL, id % 80) AS s",
            "IF(id % 19 = 0, NULL, id % 80 + 15) AS e",
            "id AS rv"
          )
        def q = pts.join(
          ivs,
          col("k") === col("rk") && col("t").between(col("s"), col("e")) &&
            (col("pv") + col("rv")) % 5 =!= 0 // residual mixed conjunct
        )
        assert(hasIntervalExec(q), s"rewrite did not fire (round $round)")
        val on = q.collect().map(_.toSeq).toSet
        val off = rewriteOff {
          assert(!hasIntervalExec(q), "kill switch ignored")
          q.collect().map(_.toSeq).toSet
        }
        assert(
          on == off,
          s"round $round diverged: on-only=${(on -- off).take(3)} off-only=${(off -- on).take(3)}"
        )
        assert(on.nonEmpty, s"round $round produced no rows — vacuous")
      }
    }
  }

  test("LeftOuter equi+BETWEEN rewrites to the Outer mode (right-only residual pushes)") {
    noBroadcast {
      def q(extra: org.apache.spark.sql.Column) = points.join(
        ivals,
        col("k") === col("rk") && col("t").between(col("s"), col("e")) && extra,
        "left")
      // plain shape and a right-only ON residual both rewrite
      Seq(lit(true), col("rv") % 2 === 0).foreach { extra =>
        val joined = q(extra)
        assert(hasIntervalExec(joined),
          s"left-outer rewrite did not fire:\n${joined.queryExecution.executedPlan}")
        val got = joined.collect().map(_.toSeq).toSet
        val expected = rewriteOff {
          val plain = q(extra)
          assert(!hasIntervalExec(plain), "kill switch ignored")
          plain.collect().map(_.toSeq).toSet
        }
        assert(got == expected && expected.nonEmpty, s"left-outer differential diverged ($extra)")
        // outer must actually null-extend under the rewrite
        assert(got.exists(_.last == null), s"no null-extended rows ($extra) — fixture vacuous")
      }
    }
  }

  test("RightOuter with the points on the right swap-rewrites to the Outer mode") {
    noBroadcast {
      def q(extra: org.apache.spark.sql.Column) = ivals.join(
        points,
        col("k") === col("rk") && col("t").between(col("s"), col("e")) && extra,
        "right")
      // plain shape and an interval-side ON residual both rewrite
      Seq(lit(true), col("rv") % 2 === 0).foreach { extra =>
        val joined = q(extra)
        assert(hasIntervalExec(joined),
          s"right-outer rewrite did not fire:\n${joined.queryExecution.executedPlan}")
        assert(joined.columns.toSeq == Seq("rk", "s", "e", "rv", "k", "t", "pv"),
          "swap must restore the original column order")
        // multiset compare — outer joins can carry duplicate tuples
        val got = joined.collect().map(_.toSeq.toString).sorted.toSeq
        val expected = rewriteOff {
          val plain = q(extra)
          assert(!hasIntervalExec(plain), "kill switch ignored")
          plain.collect().map(_.toSeq.toString).sorted.toSeq
        }
        assert(got == expected && got.nonEmpty, s"right-outer differential diverged ($extra)")
        assert(joined.collect().exists(_.isNullAt(0)),
          s"no null-extended rows ($extra) — fixture vacuous")
      }
      // a points-side residual cannot leave the condition (a point failing
      // it must still null-extend) — must not rewrite
      val ptsResidual = ivals.join(points,
        col("k") === col("rk") && col("t").between(col("s"), col("e")) && col("pv") % 2 === 0,
        "right")
      assert(!ptsResidual.queryExecution.optimizedPlan.toString.contains("IntervalJoin"),
        "right-outer with a points-side ON residual must not rewrite")
    }
  }

  test("EXISTS in a disjunction (ExistenceJoin) rewrites to the Existence mode") {
    noBroadcast {
      points.createOrReplaceTempView("rjr_points")
      ivals.createOrReplaceTempView("rjr_ivals")
      // WHERE p OR EXISTS(…): RewritePredicateSubquery plans an
      // ExistenceJoin (neither semi nor anti applies under a disjunction)
      // emitting every point plus a coverage flag
      def q(resid: String) = spark.sql(
        s"""SELECT k, t, pv FROM rjr_points p
           |WHERE pv % 10 = 0 OR EXISTS (
           |  SELECT 1 FROM rjr_ivals i
           |  WHERE i.rk = p.k AND p.t BETWEEN i.s AND i.e$resid)""".stripMargin)
      // plain and right-only-residual EXISTS bodies both rewrite
      Seq("", " AND i.rv % 2 = 0").foreach { resid =>
        val on = q(resid)
        assert(hasIntervalExec(on),
          s"existence rewrite did not fire ($resid):\n${on.queryExecution.executedPlan}")
        val got = on.collect().map(_.toSeq).toSet
        val exp = rewriteOff {
          val plain = q(resid)
          assert(!hasIntervalExec(plain), "kill switch ignored")
          plain.collect().map(_.toSeq).toSet
        }
        assert(got == exp && got.nonEmpty, s"existence differential diverged ($resid)")
      }
      // the flag must feed BOTH disjuncts: some rows admitted only by the
      // left disjunct (uncovered), and every covered row admitted
      val kept = q("").collect().map(_.toSeq).toSet
      val covered = spark.sql(
        """SELECT k, t, pv FROM rjr_points p WHERE EXISTS (
          |  SELECT 1 FROM rjr_ivals i WHERE i.rk = p.k AND p.t BETWEEN i.s AND i.e)""".stripMargin)
        .collect().map(_.toSeq).toSet
      assert((kept -- covered).nonEmpty, "no rows admitted by the left disjunct alone — vacuous")
      assert((covered -- kept).isEmpty, "a covered row went missing")
      // a LEFT-only residual inside the EXISTS body blocks the rewrite:
      // every left row is preserved (no Filter above discharges it), so
      // c_l cannot factor out of `exists = ∃r: c_l ∧ m`
      val leftRes = spark.sql(
        """SELECT k, t, pv FROM rjr_points p
          |WHERE pv % 10 = 0 OR EXISTS (
          |  SELECT 1 FROM rjr_ivals i
          |  WHERE i.rk = p.k AND p.t BETWEEN i.s AND i.e AND p.pv % 3 = 0)""".stripMargin)
      assert(!leftRes.queryExecution.optimizedPlan.toString.contains("IntervalJoin"),
        "existence with a left-only residual must not rewrite")
      // …and must still be CORRECT through the non-rewritten path
      val expLeftRes = rewriteOff(leftRes.collect().map(_.toSeq).toSet)
      assert(leftRes.collect().map(_.toSeq).toSet == expLeftRes && expLeftRes.nonEmpty)
    }
  }

  test("LeftSemi/LeftAnti EXISTS-BETWEEN shapes rewrite to the existence modes") {
    noBroadcast {
      points.createOrReplaceTempView("rjr_points")
      ivals.createOrReplaceTempView("rjr_ivals")
      val semi = spark.sql(
        """SELECT * FROM rjr_points p WHERE EXISTS (
          |  SELECT 1 FROM rjr_ivals i WHERE p.k = i.rk AND p.t BETWEEN i.s AND i.e)""".stripMargin)
      assert(hasIntervalExec(semi), s"semi rewrite did not fire:\n${semi.queryExecution.executedPlan}")
      val anti = spark.sql(
        """SELECT * FROM rjr_points p WHERE NOT EXISTS (
          |  SELECT 1 FROM rjr_ivals i WHERE p.k = i.rk AND p.t BETWEEN i.s AND i.e)""".stripMargin)
      assert(hasIntervalExec(anti), s"anti rewrite did not fire:\n${anti.queryExecution.executedPlan}")
      val (semiGot, antiGot) = (semi.collect().map(_.toSeq).toSet, anti.collect().map(_.toSeq).toSet)
      val (semiExp, antiExp) = rewriteOff {
        val s = spark.sql(
          """SELECT * FROM rjr_points p WHERE EXISTS (
            |  SELECT 1 FROM rjr_ivals i WHERE p.k = i.rk AND p.t BETWEEN i.s AND i.e)""".stripMargin)
        assert(!hasIntervalExec(s), "kill switch ignored for semi")
        val a = spark.sql(
          """SELECT * FROM rjr_points p WHERE NOT EXISTS (
            |  SELECT 1 FROM rjr_ivals i WHERE p.k = i.rk AND p.t BETWEEN i.s AND i.e)""".stripMargin)
        (s.collect().map(_.toSeq).toSet, a.collect().map(_.toSeq).toSet)
      }
      assert(semiGot == semiExp && semiExp.nonEmpty, "semi differential diverged")
      assert(antiGot == antiExp && antiExp.nonEmpty, "anti differential diverged")
      // semi + anti partition the points
      assert(semiGot.size + antiGot.size == points.count())
    }
  }

  test("semi/anti residual rules: right residual pushes, anti left residual blocks") {
    noBroadcast {
      points.createOrReplaceTempView("rjr_points")
      ivals.createOrReplaceTempView("rjr_ivals")
      // right-only residual (rv % 2 = 0) restricts the EXISTS domain —
      // pushes into the right child, rewrite still fires, for both modes
      def withRightResidual(not: String) = spark.sql(
        s"""SELECT * FROM rjr_points p WHERE $not EXISTS (
           |  SELECT 1 FROM rjr_ivals i
           |  WHERE p.k = i.rk AND p.t BETWEEN i.s AND i.e AND i.rv % 2 = 0)""".stripMargin)
      Seq("", "NOT").foreach { not =>
        val q = withRightResidual(not)
        assert(hasIntervalExec(q), s"[$not] right-residual rewrite did not fire")
        val expected = rewriteOff(withRightResidual(not).collect().map(_.toSeq).toSet)
        assert(q.collect().map(_.toSeq).toSet == expected && expected.nonEmpty,
          s"[$not] right-residual differential diverged")
      }
      // left-only residual inside NOT EXISTS does NOT factor out —
      // the rewrite must stand down (semantics would differ for rows
      // failing the residual); Spark's plain anti join handles it
      val antiLeftRes = spark.sql(
        """SELECT * FROM rjr_points p WHERE NOT EXISTS (
          |  SELECT 1 FROM rjr_ivals i
          |  WHERE p.k = i.rk AND p.t BETWEEN i.s AND i.e AND p.pv % 2 = 0)""".stripMargin)
      assert(!hasIntervalExec(antiLeftRes),
        s"anti with a left residual must not rewrite:\n${antiLeftRes.queryExecution.optimizedPlan}")
      // ...but the same residual inside EXISTS factors out and rewrites
      val semiLeftRes = spark.sql(
        """SELECT * FROM rjr_points p WHERE EXISTS (
          |  SELECT 1 FROM rjr_ivals i
          |  WHERE p.k = i.rk AND p.t BETWEEN i.s AND i.e AND p.pv % 2 = 0)""".stripMargin)
      assert(hasIntervalExec(semiLeftRes), "semi with a left residual should rewrite")
      val semiExp = rewriteOff {
        spark.sql(
          """SELECT * FROM rjr_points p WHERE EXISTS (
            |  SELECT 1 FROM rjr_ivals i
            |  WHERE p.k = i.rk AND p.t BETWEEN i.s AND i.e AND p.pv % 2 = 0)""".stripMargin)
          .collect().map(_.toSeq).toSet
      }
      assert(semiLeftRes.collect().map(_.toSeq).toSet == semiExp && semiExp.nonEmpty)
      // left-residual anti must still be CORRECT through the non-rewritten path
      val expectedAnti = rewriteOff(antiLeftRes.collect().map(_.toSeq).toSet)
      assert(antiLeftRes.collect().map(_.toSeq).toSet == expectedAnti && expectedAnti.nonEmpty)
    }
  }

  test("single-bound EXISTS/NOT EXISTS (rt <= t, no upper bound) rewrites to the as-of existence modes") {
    noBroadcast {
      points.createOrReplaceTempView("rjr_points")
      // drop two keys from the right side so the anti leg is non-vacuous
      ivals.filter(col("rk") < 5).createOrReplaceTempView("rjr_aivals")
      def hasAsOfExec(df: DataFrame): Boolean =
        df.queryExecution.executedPlan.toString.contains("AsOfJoin")
      // "has a prior version": ∃ right row with the same key at or before t
      val semi = spark.sql(
        """SELECT * FROM rjr_points p WHERE EXISTS (
          |  SELECT 1 FROM rjr_aivals i WHERE p.k = i.rk AND i.s <= p.t)""".stripMargin)
      assert(hasAsOfExec(semi), s"as-of semi rewrite did not fire:\n${semi.queryExecution.executedPlan}")
      // staleness/orphan: NO same-key right row at or before t
      val anti = spark.sql(
        """SELECT * FROM rjr_points p WHERE NOT EXISTS (
          |  SELECT 1 FROM rjr_aivals i WHERE p.k = i.rk AND i.s <= p.t)""".stripMargin)
      assert(hasAsOfExec(anti), s"as-of anti rewrite did not fire:\n${anti.queryExecution.executedPlan}")
      val (semiGot, antiGot) = (semi.collect().map(_.toSeq).toSet, anti.collect().map(_.toSeq).toSet)
      val (semiExp, antiExp) = rewriteOff {
        val s = spark.sql(
          """SELECT * FROM rjr_points p WHERE EXISTS (
            |  SELECT 1 FROM rjr_aivals i WHERE p.k = i.rk AND i.s <= p.t)""".stripMargin)
        assert(!hasAsOfExec(s), "kill switch ignored for the as-of semi arm")
        val a = spark.sql(
          """SELECT * FROM rjr_points p WHERE NOT EXISTS (
            |  SELECT 1 FROM rjr_aivals i WHERE p.k = i.rk AND i.s <= p.t)""".stripMargin)
        (s.collect().map(_.toSeq).toSet, a.collect().map(_.toSeq).toSet)
      }
      assert(semiGot == semiExp && semiExp.nonEmpty, "as-of semi differential diverged")
      assert(antiGot == antiExp && antiExp.nonEmpty, "as-of anti differential diverged")
      assert(semiGot.size + antiGot.size == points.count())
      // the >= mirror (written with the bound flipped) is the same shape
      val mirrored = spark.sql(
        """SELECT * FROM rjr_points p WHERE EXISTS (
          |  SELECT 1 FROM rjr_aivals i WHERE p.k = i.rk AND p.t >= i.s)""".stripMargin)
      assert(hasAsOfExec(mirrored), "mirrored bound did not rewrite")
      assert(mirrored.collect().map(_.toSeq).toSet == semiGot)
      // a STRICT bound does not rewrite (as-of is inclusive)
      val strict = spark.sql(
        """SELECT * FROM rjr_points p WHERE EXISTS (
          |  SELECT 1 FROM rjr_aivals i WHERE p.k = i.rk AND i.s < p.t)""".stripMargin)
      assert(!hasAsOfExec(strict) && !hasIntervalExec(strict),
        s"strict single bound must not rewrite:\n${strict.queryExecution.executedPlan}")
      // EXISTS-at-or-AFTER (∃ rt >= t) rewrites to the BACKWARD merge
      // (descending-time runs, earliest rt >= t) — differential vs the
      // un-rewritten subquery plan
      val after = spark.sql(
        """SELECT * FROM rjr_points p WHERE EXISTS (
          |  SELECT 1 FROM rjr_aivals i WHERE p.k = i.rk AND i.s >= p.t)""".stripMargin)
      assert(hasAsOfExec(after),
        s"at-or-after bound did not rewrite to the backward as-of:\n${after.queryExecution.executedPlan}")
      val afterGot = after.collect().map(_.toSeq).toSet
      val afterExp = rewriteOff {
        spark.sql(
          """SELECT * FROM rjr_points p WHERE EXISTS (
            |  SELECT 1 FROM rjr_aivals i WHERE p.k = i.rk AND i.s >= p.t)""".stripMargin)
          .collect().map(_.toSeq).toSet
      }
      assert(afterGot == afterExp && afterExp.nonEmpty, "backward as-of semi differential diverged")
      // backward NOT EXISTS too (points past every same-key interval start)
      val afterAnti = spark.sql(
        """SELECT * FROM rjr_points p WHERE NOT EXISTS (
          |  SELECT 1 FROM rjr_aivals i WHERE p.k = i.rk AND i.s >= p.t)""".stripMargin)
      assert(hasAsOfExec(afterAnti), "backward anti did not rewrite")
      val afterAntiGot = afterAnti.collect().map(_.toSeq).toSet
      val afterAntiExp = rewriteOff {
        spark.sql(
          """SELECT * FROM rjr_points p WHERE NOT EXISTS (
            |  SELECT 1 FROM rjr_aivals i WHERE p.k = i.rk AND i.s >= p.t)""".stripMargin)
          .collect().map(_.toSeq).toSet
      }
      assert(afterAntiGot == afterAntiExp, "backward as-of anti differential diverged")
      assert(afterGot.size + afterAntiGot.size == points.count())
      // flagged EXISTS in a disjunction → as-of Existence mode
      val exist = spark.sql(
        """SELECT k, t, pv FROM rjr_points p
          |WHERE pv % 10 = 0 OR EXISTS (
          |  SELECT 1 FROM rjr_aivals i WHERE p.k = i.rk AND i.s <= p.t)""".stripMargin)
      assert(hasAsOfExec(exist), s"as-of existence rewrite did not fire:\n${exist.queryExecution.executedPlan}")
      val existGot = exist.collect().map(_.toSeq).toSet
      val existExp = rewriteOff {
        spark.sql(
          """SELECT k, t, pv FROM rjr_points p
            |WHERE pv % 10 = 0 OR EXISTS (
            |  SELECT 1 FROM rjr_aivals i WHERE p.k = i.rk AND i.s <= p.t)""".stripMargin)
          .collect().map(_.toSeq).toSet
      }
      assert(existGot == existExp && existExp.nonEmpty, "as-of existence differential diverged")
      // backward flagged EXISTS (disjunction + rt >= t) → as-of Existence
      // with forward = false
      val afterExist = spark.sql(
        """SELECT k, t, pv FROM rjr_points p
          |WHERE pv % 10 = 0 OR EXISTS (
          |  SELECT 1 FROM rjr_aivals i WHERE p.k = i.rk AND i.s >= p.t)""".stripMargin)
      assert(hasAsOfExec(afterExist),
        s"backward flagged EXISTS did not rewrite:\n${afterExist.queryExecution.executedPlan}")
      val afterExistGot = afterExist.collect().map(_.toSeq).toSet
      val afterExistExp = rewriteOff {
        spark.sql(
          """SELECT k, t, pv FROM rjr_points p
            |WHERE pv % 10 = 0 OR EXISTS (
            |  SELECT 1 FROM rjr_aivals i WHERE p.k = i.rk AND i.s >= p.t)""".stripMargin)
          .collect().map(_.toSeq).toSet
      }
      assert(afterExistGot == afterExistExp && afterExistExp.nonEmpty,
        "backward existence differential diverged")
      // residual rules: right-only residual pushes (rewrites); a left-only
      // residual inside NOT EXISTS blocks
      val rightRes = spark.sql(
        """SELECT * FROM rjr_points p WHERE NOT EXISTS (
          |  SELECT 1 FROM rjr_aivals i WHERE p.k = i.rk AND i.s <= p.t AND i.rv % 2 = 0)""".stripMargin)
      assert(hasAsOfExec(rightRes), "right-only residual should push and rewrite")
      assert(rightRes.collect().map(_.toSeq).toSet ==
        rewriteOff(spark.sql(
          """SELECT * FROM rjr_points p WHERE NOT EXISTS (
            |  SELECT 1 FROM rjr_aivals i WHERE p.k = i.rk AND i.s <= p.t AND i.rv % 2 = 0)""".stripMargin)
          .collect().map(_.toSeq).toSet))
      val leftResAnti = spark.sql(
        """SELECT * FROM rjr_points p WHERE NOT EXISTS (
          |  SELECT 1 FROM rjr_aivals i WHERE p.k = i.rk AND i.s <= p.t AND p.pv % 2 = 0)""".stripMargin)
      assert(!hasAsOfExec(leftResAnti), "anti with a left-only residual must not rewrite")
    }
  }

  test("single-bound as-of semi/anti null-inclusive randomized differential") {
    noBroadcast {
      (1 to 3).foreach { round =>
        val pts = spark
          .range(round * 101L, round * 101L + 250L)
          .selectExpr(
            "IF(id % 11 = 0, NULL, id % 6) AS k",
            "IF(id % 13 = 0, NULL, id % 90) AS t",
            "id AS pv")
        val ivs = spark
          .range(round * 37L, round * 37L + 110L)
          .selectExpr(
            "IF(id % 9 = 0, NULL, id % 6) AS rk",
            "IF(id % 17 = 0, NULL, id % 75) AS s",
            "id AS rv")
        pts.createOrReplaceTempView("rjr_apts")
        ivs.createOrReplaceTempView("rjr_aivs")
        def q(not: String) = spark.sql(
          s"""SELECT * FROM rjr_apts p WHERE $not EXISTS (
             |  SELECT 1 FROM rjr_aivs i WHERE p.k = i.rk AND i.s <= p.t)""".stripMargin)
        Seq("", "NOT").foreach { not =>
          val on = q(not)
          assert(on.queryExecution.executedPlan.toString.contains("AsOfJoin"),
            s"round $round [$not]: as-of rewrite did not fire")
          val got = on.collect().map(_.toSeq).toSet
          val exp = rewriteOff(q(not).collect().map(_.toSeq).toSet)
          assert(got == exp, s"round $round [$not] diverged: " +
            s"on-only=${(got -- exp).take(3)} off-only=${(exp -- got).take(3)}")
          assert(got.nonEmpty, s"round $round [$not] vacuous")
        }
      }
    }
  }

  test("semi/anti null-inclusive randomized differential") {
    noBroadcast {
      (1 to 3).foreach { round =>
        val pts = spark
          .range(round * 101L, round * 101L + 250L)
          .selectExpr(
            "IF(id % 11 = 0, NULL, id % 6) AS k",
            "IF(id % 13 = 0, NULL, id % 90) AS t",
            "id AS pv")
        val ivs = spark
          .range(round * 37L, round * 37L + 110L)
          .selectExpr(
            "IF(id % 9 = 0, NULL, id % 6) AS rk",
            "IF(id % 17 = 0, NULL, id % 75) AS s",
            "IF(id % 19 = 0, NULL, id % 75 + 12) AS e",
            "id AS rv")
        pts.createOrReplaceTempView("rjr_npts")
        ivs.createOrReplaceTempView("rjr_nivs")
        def q(not: String) = spark.sql(
          s"""SELECT * FROM rjr_npts p WHERE $not EXISTS (
             |  SELECT 1 FROM rjr_nivs i WHERE p.k = i.rk AND p.t BETWEEN i.s AND i.e)""".stripMargin)
        Seq("", "NOT").foreach { not =>
          val on = q(not)
          assert(hasIntervalExec(on), s"round $round [$not]: rewrite did not fire")
          val got = on.collect().map(_.toSeq).toSet
          val exp = rewriteOff(q(not).collect().map(_.toSeq).toSet)
          assert(got == exp, s"round $round [$not] diverged: " +
            s"on-only=${(got -- exp).take(3)} off-only=${(exp -- got).take(3)}")
          assert(got.nonEmpty, s"round $round [$not] vacuous")
        }
        // left-outer through the same NULL-laden inputs: NULL-keyed/timed
        // left rows must null-extend (never match), exactly as Spark's
        // LeftOuter does — multiset compare (duplicates matter)
        def qo = spark.sql(
          """SELECT * FROM rjr_npts p LEFT JOIN rjr_nivs i
            |ON p.k = i.rk AND p.t BETWEEN i.s AND i.e""".stripMargin)
        assert(hasIntervalExec(qo), s"round $round: left-outer rewrite did not fire")
        val gotO = qo.collect().map(_.toSeq.toString).sorted.toSeq
        val expO = rewriteOff(qo.collect().map(_.toSeq.toString).sorted.toSeq)
        assert(gotO == expO && gotO.nonEmpty, s"round $round left-outer diverged")
        // right-outer (points on the right) through the same inputs —
        // the swap path's null handling
        def qr = spark.sql(
          """SELECT * FROM rjr_nivs i RIGHT JOIN rjr_npts p
            |ON p.k = i.rk AND p.t BETWEEN i.s AND i.e""".stripMargin)
        assert(hasIntervalExec(qr), s"round $round: right-outer rewrite did not fire")
        val gotR = qr.collect().map(_.toSeq.toString).sorted.toSeq
        val expR = rewriteOff(qr.collect().map(_.toSeq.toString).sorted.toSeq)
        assert(gotR == expR && gotR.nonEmpty, s"round $round right-outer diverged")
        // existence through the same inputs: NULL-keyed/timed points get a
        // FALSE flag (EXISTS over an always-false condition) but are kept
        // when the left disjunct admits them
        def qe = spark.sql(
          """SELECT * FROM rjr_npts p
            |WHERE p.pv % 4 = 0 OR EXISTS (
            |  SELECT 1 FROM rjr_nivs i WHERE p.k = i.rk AND p.t BETWEEN i.s AND i.e)""".stripMargin)
        assert(hasIntervalExec(qe), s"round $round: existence rewrite did not fire")
        val gotE = qe.collect().map(_.toSeq).toSet
        val expE = rewriteOff(qe.collect().map(_.toSeq).toSet)
        assert(gotE == expE && gotE.nonEmpty, s"round $round existence diverged: " +
          s"on-only=${(gotE -- expE).take(3)} off-only=${(expE -- gotE).take(3)}")
      }
    }
  }

  test("FullOuter equi+BETWEEN rewrites to the FullOuter mode, both orientations") {
    noBroadcast {
      // the shared fixture covers every interval (point t=i sits in
      // [i, i+12] on key i%7), so graft unmatched-interval rows onto it:
      // key 99 has no points, and [900, 950] lies past every point time
      val ivals = this.ivals.union(
        Seq((99L, 1L, 50L, -1L), (3L, 900L, 950L, -2L)).toDF("rk", "s", "e", "rv"))
      // points-left orientation: direct
      val fo = points.join(ivals,
        col("k") === col("rk") && col("t").between(col("s"), col("e")), "full")
      assert(hasIntervalExec(fo), s"full-outer rewrite did not fire:\n${fo.queryExecution.executedPlan}")
      val got = fo.collect().map(_.toSeq).toSet
      val expected = rewriteOff {
        val plain = points.join(ivals,
          col("k") === col("rk") && col("t").between(col("s"), col("e")), "full")
        assert(!hasIntervalExec(plain), "kill switch ignored")
        plain.collect().map(_.toSeq).toSet
      }
      assert(got == expected && expected.nonEmpty)
      // both orphan classes must be present or the fixture proves nothing
      assert(expected.exists(r => r.head == null), "no unmatched intervals in fixture")
      assert(expected.exists(r => r.last == null), "no unmatched points in fixture")

      // points-right orientation: swap + Project restores column order
      val flipped = ivals.join(points,
        col("k") === col("rk") && col("t").between(col("s"), col("e")), "full")
      assert(hasIntervalExec(flipped),
        s"flipped full-outer rewrite did not fire:\n${flipped.queryExecution.executedPlan}")
      assert(flipped.columns.toSeq == Seq("rk", "s", "e", "rv", "k", "t", "pv"))
      val gotF = flipped.collect().map(_.toSeq).toSet
      val expF = rewriteOff {
        ivals.join(points,
          col("k") === col("rk") && col("t").between(col("s"), col("e")), "full")
          .collect().map(_.toSeq).toSet
      }
      assert(gotF == expF && expF.nonEmpty)
    }
  }

  test("FullOuter rewrites even below the broadcast threshold (no broadcast plan exists for it)") {
    // the cost guard stands down for broadcast-sized sides expecting
    // BroadcastHashJoin to win — but JoinSelection can never broadcast a
    // FULL OUTER equi join (no build side preserves both), so standing
    // down would hand the query to the key-only SMJ this rewrite replaces;
    // note: NO noBroadcast wrapper here, local-relation stats are tiny
    val fo = points.join(ivals,
      col("k") === col("rk") && col("t").between(col("s"), col("e")), "full")
    assert(hasIntervalExec(fo),
      s"broadcast-sized full outer did not rewrite:\n${fo.queryExecution.executedPlan}")
    val got = fo.collect().map(_.toSeq).toSet
    val exp = rewriteOff {
      points.join(ivals,
        col("k") === col("rk") && col("t").between(col("s"), col("e")), "full")
        .collect().map(_.toSeq).toSet
    }
    assert(got == exp && exp.nonEmpty)
  }

  test("q254 (plain-SQL NOT EXISTS + single bound) plans through the as-of Anti merge on real data") {
    import graft.plans.{AsOfJoinMode, AsOfJoinPlan}
    // above the broadcast threshold the arm must fire (at sf0.001 sizes
    // the guard correctly defers to a broadcast anti join — that path is
    // covered by the oracle gate; THIS pin proves the big-data plan)
    noBroadcast {
      val df = graft.ops.QueryRegistry.byName("q254_asof_anti_unattributed")
        .fn(spark, "/root/testdata/sf0.001")
      val modes = df.queryExecution.optimizedPlan.collect { case j: AsOfJoinPlan => j.mode }
      assert(modes == Seq(AsOfJoinMode.Anti),
        s"q254 did not rewrite to the as-of Anti merge: $modes\n${df.queryExecution.optimizedPlan}")
      assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"))
      assert(df.count() > 0)
    }
  }

  test("q260 (plain-SQL bounded-as-of window idiom) plans through the as-of Outer merge on real data") {
    import graft.plans.{AsOfJoinMode, AsOfJoinPlan}
    val df = graft.ops.QueryRegistry.byName("q260_bounded_asof_sql")
      .fn(spark, "/root/testdata/sf0.001")
    val nodes = df.queryExecution.optimizedPlan.collect { case j: AsOfJoinPlan => j }
    assert(nodes.map(_.mode) == Seq(AsOfJoinMode.Outer) && nodes.head.forward,
      s"q260 did not reduce to the forward as-of Outer merge:\n${df.queryExecution.optimizedPlan}")
    // the horizon rides as the null-out projection ABOVE the node, the
    // window stays as the ≤|left|-row arbiter
    assert(df.queryExecution.optimizedPlan.toString.contains("windowspecdefinition"),
      "the arbiter window must remain above the reduction")
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    assert(df.count() > 0)
  }

  test("q261 (plain-SQL backward bounded-as-of) plans through the backward as-of Outer merge") {
    import graft.plans.{AsOfJoinMode, AsOfJoinPlan}
    val df = graft.ops.QueryRegistry.byName("q261_bounded_next_sql")
      .fn(spark, "/root/testdata/sf0.001")
    val nodes = df.queryExecution.optimizedPlan.collect { case j: AsOfJoinPlan => j }
    assert(nodes.map(_.mode) == Seq(AsOfJoinMode.Outer) && !nodes.head.forward,
      s"q261 did not reduce to the backward as-of Outer merge:\n${df.queryExecution.optimizedPlan}")
    assert(df.count() > 0)
  }

  test("q249 (plain-SQL FULL JOIN reconcile) plans through the FullOuter sweep on real data") {
    import graft.plans.{IntervalJoinMode, IntervalJoinPlan}
    val df = graft.ops.QueryRegistry.byName("q249_incident_exposure")
      .fn(spark, "/root/testdata/sf0.001")
    val modes = df.queryExecution.optimizedPlan.collect { case j: IntervalJoinPlan => j.mode }
    assert(modes == Seq(IntervalJoinMode.FullOuter),
      s"q249 did not rewrite to the FullOuter sweep: $modes\n${df.queryExecution.optimizedPlan}")
    assert(df.queryExecution.executedPlan.toString.contains("IntervalJoin"))
    assert(df.count() > 0)
  }

  test("q252 (full-outer + null-intolerant filter) plans as the DEMOTED Outer sweep, filter pushed") {
    import graft.plans.{IntervalJoinMode, IntervalJoinPlan}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    val df = graft.ops.QueryRegistry.byName("q252_click_exposure_rate")
      .fn(spark, "/root/testdata/sf0.001")
    val modes = df.queryExecution.optimizedPlan.collect { case j: IntervalJoinPlan => j.mode }
    assert(modes == Seq(IntervalJoinMode.Outer),
      s"q252 not demoted to the Outer sweep: $modes\n${df.queryExecution.optimizedPlan}")
    // ...and the demoting predicate did not park above the join — the
    // Outer rules pushed it below (into the clicks side)
    val filterAbove = df.queryExecution.optimizedPlan.exists {
      case LFilter(_, _: IntervalJoinPlan) => true
      case _                               => false
    }
    assert(!filterAbove, s"demoted filter not pushed:\n${df.queryExecution.optimizedPlan}")
    assert(df.count() > 0)
  }

  test("full-outer null-inclusive randomized differential") {
    noBroadcast {
      val rnd = new scala.util.Random(31337)
      for (trial <- 1 to 3) {
        val pts = Seq.tabulate(250) { i =>
          (if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(4).toLong),
           if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(120).toLong),
           i.toLong)
        }.toDF("k", "t", "pid")
        val ivs = Seq.tabulate(120) { i =>
          val s = rnd.nextInt(100).toLong
          (if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(4).toLong),
           if (rnd.nextInt(12) == 0) None else Some(s),
           if (rnd.nextInt(12) == 0) None else Some(s + rnd.nextInt(20) - 4L),
           (1000 + i).toLong)
        }.toDF("rk", "s", "e", "rid")
        val cond = col("k") === col("rk") && col("t").between(col("s"), col("e"))
        val q = pts.join(ivs, cond, "full").select(col("pid"), col("rid"))
        assert(hasIntervalExec(q), s"trial $trial did not rewrite")
        val got = q.collect()
          .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
                     if (r.isNullAt(1)) -1L else r.getLong(1))).sorted.toSeq
        val exp = rewriteOff {
          pts.join(ivs, cond, "full").select(col("pid"), col("rid")).collect()
            .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
                       if (r.isNullAt(1)) -1L else r.getLong(1))).sorted.toSeq
        }
        assert(got == exp, s"full-outer trial $trial diverged: ${got.size} vs ${exp.size}")
        assert(exp.exists(_._1 == -1L) && exp.exists(_._2 == -1L), s"trial $trial vacuous")

        // same trial through the dropped-buffer OVERFLOW path: a heap cap
        // of 4 forces the skipped-interval buffer through the spillable
        // array swap on this null-laden random data (the dedicated
        // overflow test uses a crafted gap fixture; this pins the
        // machinery under arbitrary interleavings)
        val prevCap = spark.conf.getOption("spark.sql.windowExec.buffer.in.memory.threshold")
        spark.conf.set("spark.sql.windowExec.buffer.in.memory.threshold", "4")
        try {
          val gotCapped = pts.join(ivs, cond, "full").select(col("pid"), col("rid"))
            .collect()
            .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
                       if (r.isNullAt(1)) -1L else r.getLong(1))).sorted.toSeq
          assert(gotCapped == exp, s"overflow-path trial $trial diverged")
        } finally {
          spark.conf.unset("spark.sql.windowExec.buffer.in.memory.threshold")
          prevCap.foreach(spark.conf.set("spark.sql.windowExec.buffer.in.memory.threshold", _))
        }

        // demotion differential: a filter above the full-outer join — the
        // rewrite-on side exercises CustomJoinOptimization's mode
        // demotion (null-intolerant shapes) or the pushdown barrier
        // (null-tolerant shapes); the rewrite-off side exercises Spark's
        // own EliminateOuterJoin on the plain Join. Both must agree.
        val preds = Seq(
          col("pid") % 3 === 0,                    // left null-intolerant → Outer
          col("rid") % 2 === 0,                    // right null-intolerant → (stays Full)
          col("pid") % 3 === 0 && col("rid") % 2 === 0, // both → Inner
          col("rid").isNull,                       // null-tolerant → barrier
          coalesce(col("pid"), lit(0L)) >= 0L      // null-tolerant left → barrier
        )
        for ((p, pi) <- preds.zipWithIndex) {
          val fq = pts.join(ivs, cond, "full").filter(p)
            .select(col("pid"), col("rid")).collect()
            .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
                       if (r.isNullAt(1)) -1L else r.getLong(1))).sorted.toSeq
          val fexp = rewriteOff {
            pts.join(ivs, cond, "full").filter(p)
              .select(col("pid"), col("rid")).collect()
              .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
                         if (r.isNullAt(1)) -1L else r.getLong(1))).sorted.toSeq
          }
          assert(fq == fexp,
            s"demotion trial $trial pred $pi diverged: ${fq.size} vs ${fexp.size}")
        }
      }
    }
  }

  test("broadcast guard is side-aware: a small side Spark cannot BUILD does not stand the rewrite down") {
    // LeftSemi can only broadcast-build the RIGHT side. With the left
    // tiny (under threshold) and the right above it, BroadcastHashJoin
    // cannot serve the query — standing down would hand it to the
    // key-only SMJ, so the rewrite must fire. (A side-blind guard stood
    // down whenever EITHER side was small.)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64")
    try {
      val tinyPts = Seq((1L, 5L, 0L)).toDF("k", "t", "pv")
      val semi = tinyPts.join(ivals,
        col("k") === col("rk") && col("t").between(col("s"), col("e")), "left_semi")
      assert(hasIntervalExec(semi),
        s"small unbuildable left stood the semi rewrite down:\n${semi.queryExecution.executedPlan}")
      val got = semi.collect().map(_.toSeq).toSet
      val exp = rewriteOff {
        tinyPts.join(ivals,
          col("k") === col("rk") && col("t").between(col("s"), col("e")), "left_semi")
          .collect().map(_.toSeq).toSet
      }
      assert(got == exp && exp.nonEmpty)
      // control: INNER with the same tiny left CAN build left — the
      // guard correctly stands down and leaves it to broadcast
      val inner = tinyPts.join(ivals,
        col("k") === col("rk") && col("t").between(col("s"), col("e")))
      assert(!hasIntervalExec(inner),
        s"buildable small side must stand down:\n${inner.queryExecution.executedPlan}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("guards: an explicit join-strategy hint outranks the rewrite") {
    noBroadcast {
      // hint-beats-stats is Spark's contract: a user who wrote
      // /*+ MERGE */ (or BROADCAST) asked for a specific physical join,
      // so the rewrite must stand down — on either side
      val hintedRight = points.join(
        ivals.hint("merge"),
        col("k") === col("rk") && col("t").between(col("s"), col("e"))
      )
      assert(!hasIntervalExec(hintedRight),
        s"rewrite overrode a right-side MERGE hint:\n${hintedRight.queryExecution.executedPlan}")
      val hintedLeft = points.hint("broadcast").join(
        ivals,
        col("k") === col("rk") && col("t").between(col("s"), col("e"))
      )
      assert(!hasIntervalExec(hintedLeft),
        s"rewrite overrode a left-side BROADCAST hint:\n${hintedLeft.queryExecution.executedPlan}")
      assert(hintedLeft.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "the BROADCAST hint should have produced a broadcast join")
      // a non-strategy hint (e.g. a COALESCE/REBALANCE-class hint on a
      // parent, or none at all) leaves the rewrite free to fire
      val unhinted = points.join(
        ivals, col("k") === col("rk") && col("t").between(col("s"), col("e")))
      assert(hasIntervalExec(unhinted), "unhinted join should still rewrite")
    }
  }

  test("guards: strict bounds, outer joins, and broadcast-sized sides do not rewrite") {
    noBroadcast {
      val strict = points.join(ivals, col("k") === col("rk") && col("t") > col("s") && col("t") <= col("e"))
      assert(!strict.queryExecution.optimizedPlan.toString.contains("IntervalJoin"),
        "strict lower bound must not rewrite (exec is inclusive-only)")
      val rightOuter = points.join(ivals,
        col("k") === col("rk") && col("t").between(col("s"), col("e")), "right")
      assert(!rightOuter.queryExecution.optimizedPlan.toString.contains("IntervalJoin"),
        "right-outer with the points on the LEFT preserves INTERVALS — not the points-outer operator, must not rewrite")
      // full-outer WITH a residual conjunct: both sides are preserved, so
      // the residual can move nowhere (failing rows must still
      // null-extend) — must not rewrite (the pure shape does; see the
      // dedicated full-outer test)
      val fullResidual = points.join(ivals,
        col("k") === col("rk") && col("t").between(col("s"), col("e")) && col("pv") % 2 === 0,
        "full")
      assert(!fullResidual.queryExecution.optimizedPlan.toString.contains("IntervalJoin"),
        "full-outer with any residual conjunct must not rewrite")
      // left-outer with a LEFT-only ON-condition residual: a left row
      // failing it must still null-extend, which no Filter placement
      // expresses — must not rewrite
      val leftResidual = points.join(ivals,
        col("k") === col("rk") && col("t").between(col("s"), col("e")) && col("pv") % 2 === 0,
        "left")
      assert(!leftResidual.queryExecution.optimizedPlan.toString.contains("IntervalJoin"),
        "left-outer with a left-only ON residual must not rewrite")
      val noEqui = points.join(ivals, col("t").between(col("s"), col("e")))
      assert(!noEqui.queryExecution.optimizedPlan.toString.contains("IntervalJoin"),
        "range-only join without an equi key must not rewrite")
    }
    // default 10 MB threshold: tiny local relations stay with Spark's
    // broadcast join
    val small = points.join(ivals, col("k") === col("rk") && col("t").between(col("s"), col("e")))
    assert(!small.queryExecution.optimizedPlan.toString.contains("IntervalJoin"),
      "broadcast-sized side must stay with BroadcastHashJoin")
    assert(small.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  // ---- the window-top-1 ("latest/next within a horizon") idiom ----

  private def clicksT = (1L to 300L).map(i => (i, i % 9, i * 10)).toDF("event_id", "u", "t")
  private def viewsT =
    (1L to 500L).map(i => (i % 9, 1000L + i, i * 6 + (i % 4), (i % 50) + 1.0))
      .toDF("vu", "view_id", "vt", "vv")

  private def hasAsOf(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("AsOfJoin")

  test("window-top-1 over a bounded LEFT JOIN (the hand-written bounded-as-of SQL) reduces through the as-of merge") {
    noBroadcast {
      clicksT.createOrReplaceTempView("wt_clicks")
      viewsT.createOrReplaceTempView("wt_views")
      // the q258 oracle shape: latest same-key right row within a horizon,
      // outer, ties to the largest view_id
      def sql() = spark.sql(
        """SELECT event_id, u, view_id, vv FROM (
          |  SELECT c.event_id, c.u, v.view_id, v.vv,
          |    row_number() OVER (PARTITION BY c.event_id
          |                       ORDER BY v.vt DESC, v.view_id DESC) AS rk
          |  FROM wt_clicks c LEFT JOIN wt_views v
          |    ON v.vu = c.u AND v.vt <= c.t AND v.vt >= c.t - 40) x
          |WHERE rk = 1""".stripMargin)
      val q = sql()
      assert(hasAsOf(q), s"window-top-1 rewrite did not fire:\n${q.queryExecution.optimizedPlan}")
      val got = q.collect().map(_.toSeq).toSet
      val expected = rewriteOff {
        val plain = sql()
        assert(!hasAsOf(plain), "kill switch ignored for the window-top-1 arm")
        plain.collect().map(_.toSeq).toSet
      }
      assert(got == expected && expected.nonEmpty)
      // outer: lefts with no in-horizon match surface null-extended
      assert(got.exists(r => r(2) == null), "horizon-miss rows lost their null extension")
    }
  }

  test("window-top-1 backward (ASC order, lookahead horizon) and INNER variants reduce too") {
    noBroadcast {
      clicksT.createOrReplaceTempView("wt_clicks")
      viewsT.createOrReplaceTempView("wt_views")
      def sql(join: String) = spark.sql(
        s"""SELECT event_id, u, view_id, vv FROM (
           |  SELECT c.event_id, c.u, v.view_id, v.vv,
           |    row_number() OVER (PARTITION BY c.event_id
           |                       ORDER BY v.vt ASC, v.view_id ASC) AS rk
           |  FROM wt_clicks c $join wt_views v
           |    ON v.vu = c.u AND v.vt >= c.t AND v.vt <= c.t + 25) x
           |WHERE rk = 1""".stripMargin)
      Seq("JOIN", "LEFT JOIN").foreach { join =>
        val q = sql(join)
        assert(hasAsOf(q), s"$join backward rewrite did not fire:\n${q.queryExecution.optimizedPlan}")
        val expected = rewriteOff(sql(join).collect().map(_.toSeq).toSet)
        assert(q.collect().map(_.toSeq).toSet == expected && expected.nonEmpty, s"$join mismatch")
      }
    }
  }

  test("window-top-1 randomized differential: nulls, duplicate lefts, coarse partitions, horizon edges") {
    // Adversarial shapes for the reduction's soundness claims:
    //  - tie-break values that are NULL (default null placement must
    //    agree between the kept window and the as-of pick)
    //  - duplicate left rows (per-left-row reduction emits each; the
    //    window collapses them exactly as the original did)
    //  - partitions COARSER than the left row (the group max must
    //    survive the per-row reduction)
    //  - horizon hits exactly on both inclusive edges
    noBroadcast {
      val rnd = new scala.util.Random(1319)
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val lSchema = StructType(Seq(
        StructField("lid", LongType), StructField("k", LongType), StructField("t", LongType)))
      val rSchema = StructType(Seq(
        StructField("k", LongType), StructField("rt", LongType),
        StructField("tb", LongType, nullable = true), StructField("pay", LongType)))
      val lefts = (1 to 160).map { i =>
        Row(i.toLong % 150, rnd.nextInt(5).toLong, rnd.nextInt(60).toLong) // lid%150 => dup lefts
      }
      val rights = (1 to 400).map { i =>
        Row(rnd.nextInt(5).toLong, rnd.nextInt(60).toLong,
          if (rnd.nextInt(4) == 0) null else rnd.nextInt(3).toLong, // heavy tb ties + nulls
          i.toLong)
      }
      val l = spark.createDataFrame(spark.sparkContext.parallelize(lefts), lSchema)
      val r = spark.createDataFrame(spark.sparkContext.parallelize(rights), rSchema)
      l.createOrReplaceTempView("wtr_l"); r.createOrReplaceTempView("wtr_r")
      for {
        join <- Seq("JOIN", "LEFT JOIN")
        (order, bound) <- Seq(
          ("rt DESC, tb DESC, pay DESC", "r.rt <= l.t AND r.rt >= l.t - 7"), // forward, full tiebreak
          ("rt ASC, tb ASC, pay ASC", "r.rt >= l.t AND r.rt <= l.t + 7"),    // backward
          ("rt DESC, tb DESC, pay DESC", "r.rt <= l.t"),                      // unbounded forward
          // COMPUTED tie-break expression (not a bare column) — the node's
          // rightTieBreak must evaluate arbitrary expressions
          ("rt DESC, pay % 7 DESC, pay DESC", "r.rt <= l.t AND r.rt >= l.t - 7")
        )
        partition <- Seq("l.lid, l.k, l.t", "l.k") // exact and COARSE groups
      } {
        def sql() = spark.sql(
          s"""SELECT * FROM (
             |  SELECT l.lid, l.k, l.t, r.rt, r.tb, r.pay,
             |    row_number() OVER (PARTITION BY $partition ORDER BY $order) AS rk
             |  FROM wtr_l l $join wtr_r r ON r.k = l.k AND $bound) x
             |WHERE rk = 1""".stripMargin)
        val q = sql()
        assert(hasAsOf(q),
          s"rewrite did not fire for ($join, $order, $bound, $partition):\n${q.queryExecution.optimizedPlan}")
        val got = q.collect().map(_.toSeq).toSet
        val expected = rewriteOff(sql().collect().map(_.toSeq).toSet)
        assert(got == expected,
          s"differential mismatch for ($join, $order, $bound, $partition): " +
            s"got-only=${(got -- expected).take(3)} exp-only=${(expected -- got).take(3)}")
        assert(expected.nonEmpty)
      }
    }
  }

  test("window-top-1 swapped orientation: anchor on the join's RIGHT rewrites with column order restored") {
    // the same idiom with the FROM order flipped — matches first, anchor
    // second — and RIGHT JOIN as the anchor-preserving outer variant
    noBroadcast {
      clicksT.createOrReplaceTempView("wt_clicks")
      viewsT.createOrReplaceTempView("wt_views")
      def sql(join: String) = spark.sql(
        s"""SELECT event_id, u, view_id, vv FROM (
           |  SELECT c.event_id, c.u, v.view_id, v.vv,
           |    row_number() OVER (PARTITION BY c.event_id
           |                       ORDER BY v.vt DESC, v.view_id DESC) AS rk
           |  FROM wt_views v $join wt_clicks c
           |    ON v.vu = c.u AND v.vt <= c.t AND v.vt >= c.t - 40) x
           |WHERE rk = 1""".stripMargin)
      Seq("JOIN", "RIGHT JOIN").foreach { join =>
        val q = sql(join)
        assert(hasAsOf(q), s"swapped $join rewrite did not fire:\n${q.queryExecution.optimizedPlan}")
        val expected = rewriteOff {
          val plain = sql(join)
          assert(!hasAsOf(plain), "kill switch ignored for the swapped arm")
          plain.collect().map(_.toSeq).toSet
        }
        assert(q.collect().map(_.toSeq).toSet == expected && expected.nonEmpty, s"$join mismatch")
      }
      // LEFT JOIN with the anchor on the right null-extends MATCHES — a
      // different operator; must not rewrite
      assert(!hasAsOf(sql("LEFT JOIN")), "match-preserving outer must not rewrite")
    }
  }

  test("window-top-1 guards: rank bound, mixed directions, right-side partition, left residual all block") {
    noBroadcast {
      clicksT.createOrReplaceTempView("wt_clicks")
      viewsT.createOrReplaceTempView("wt_views")
      def sql(partition: String, order: String, where: String, extra: String = "") = spark.sql(
        s"""SELECT event_id, u, view_id FROM (
           |  SELECT c.event_id, c.u, v.view_id,
           |    row_number() OVER (PARTITION BY $partition ORDER BY $order) AS rk
           |  FROM wt_clicks c LEFT JOIN wt_views v
           |    ON v.vu = c.u AND v.vt <= c.t AND v.vt >= c.t - 40$extra) x
           |WHERE $where""".stripMargin)
      // rk <= 2 keeps rank-2 rows the reduction would destroy
      assert(!hasAsOf(sql("c.event_id", "v.vt DESC", "rk <= 2")),
        "a non-top-1 rank bound must not rewrite")
      // mixed sort directions have no single as-of pick
      assert(!hasAsOf(sql("c.event_id", "v.vt DESC, v.view_id ASC", "rk = 1")),
        "mixed sort directions must not rewrite")
      // a right-side partition column slices groups by match values
      assert(!hasAsOf(sql("v.view_id", "v.vt DESC", "rk = 1")),
        "right-side partition must not rewrite")
      // a LEFT-side residual conjunct cannot leave an outer condition
      assert(!hasAsOf(sql("c.event_id", "v.vt DESC", "rk = 1", " AND c.u > 2")),
        "left residual under LeftOuter must not rewrite")
      // but the top-1 shape with a RIGHT-side residual still fires
      assert(hasAsOf(sql("c.event_id", "v.vt DESC", "rk = 1", " AND v.vv > 5")),
        "right-side residual should push into the right child and rewrite")
    }
  }
}
