package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Divide, Expression, ExpressionInfo, Literal, Multiply, Sqrt}
import graft.functions._

/** SparkSessionExtensions module: makes the engine's native functions
  * available to SQL users (`spark.sql.extensions=graft.GraftExtensions`).
  * For an already-running session use `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // SQL TABLE-function surface for the custom joins:
    // SELECT * FROM graft_asof_join(TABLE(l), TABLE(r), 'k', 'rk', 't', 'rt')
    graft.plans.TableFunctions.all.foreach { case (name, builder) =>
      ext.injectTableFunction(
        (FunctionIdentifier(name), new ExpressionInfo(builder.getClass.getName, name), builder)
      )
    }
    // optimizer surface: transparent kernel substitution — plain-SQL HOF
    // idioms rewritten to the native codegen'd expressions where the two
    // are provably bit-equivalent (see KernelFusion's soundness guards)
    ext.injectOptimizerRule(_ => graft.plans.KernelFusion)
    // predicate pushdown + column pruning through the custom join nodes —
    // Catalyst's own rules don't pattern-match them (soundness arguments
    // in CustomJoinOptimization's scaladoc)
    ext.injectOptimizerRule(_ => graft.plans.CustomJoinOptimization)
    // equi+BETWEEN inner joins rewrite to the native sweep-line interval
    // join (stats-guarded — broadcast-sized sides stay with Spark's BHJ)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    // STREAMING arm of the window-top-1 idiom: must run during ANALYSIS
    // (UnsupportedOperationChecker rejects the streaming window at
    // start(), before any optimizer rule fires) — builder-time extensions
    // only; see StreamingTop1Rewrite's scaladoc
    ext.injectPostHocResolutionRule(_ => graft.plans.StreamingTop1Rewrite)
    // planner surface: the native sort-merge as-of join (whole-operator
    // semantics Spark's built-ins can't express without a union+window
    // re-encoding — SURVEY §2.9 preference (c))
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.IntervalJoinStrategy)
  }
}

object GraftExtensions {

  private def arity(name: String, n: Int)(f: Seq[Expression] => Expression): Seq[Expression] => Expression =
    children => {
      if (children.length != n)
        throw new IllegalArgumentException(s"$name requires exactly $n arguments, got ${children.length}")
      f(children)
    }

  private def arity2(name: String)(f: (Expression, Expression) => Expression): Seq[Expression] => Expression =
    arity(name, 2)(c => f(c(0), c(1)))

  /** Constant-int parameters (n-gram width, band bits, hash count) must be
    * literal in SQL — they parameterize codegen, not per-row data.
    */
  private def intArg(name: String, e: Expression): Int = e match {
    case Literal(i: Int, _)  => i
    case Literal(l: Long, _) => l.toInt
    case other =>
      throw new IllegalArgumentException(s"$name expects a literal integer parameter, got $other")
  }

  private def entry(
      name: String,
      cls: Class[_],
      builder: Seq[Expression] => Expression
  ): (String, ExpressionInfo, Seq[Expression] => Expression) =
    (name, new ExpressionInfo(cls.getName, name), builder)

  /** The full native-expression surface, registered by the SQL names below
    * so `spark.sql` users get the same codegen'd operators (and therefore
    * bit-identical results) as the Column/DataFrame API. Expressions whose
    * parameters are not SQL-literal-friendly (the hyperplane matrix of
    * HyperplaneSigns, KeywordHits' keyword sets) stay Column-API-only.
    */
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    entry("graft_dot", classOf[DotProduct], arity2("graft_dot")(DotProduct(_, _))),
    // cosine similarity composed from the native dot product — same
    // sequential folds as the Column API, so SQL users get bit-identical
    // values to DataFrame users
    entry(
      "graft_cosine",
      classOf[DotProduct],
      arity2("graft_cosine")((a, b) =>
        Divide(DotProduct(a, b), Multiply(Sqrt(DotProduct(a, a)), Sqrt(DotProduct(b, b))))
      )
    ),
    entry(
      "graft_top_ngram",
      classOf[TopNGram],
      arity("graft_top_ngram", 2)(c => TopNGram(c(0), intArg("graft_top_ngram", c(1))))
    ),
    entry(
      "graft_ngrams",
      classOf[NGrams],
      arity("graft_ngrams", 2)(c => NGrams(c(0), intArg("graft_ngrams", c(1))))
    ),
    entry(
      "graft_rolling_fingerprint",
      classOf[RollingFingerprint],
      arity("graft_rolling_fingerprint", 1)(c => RollingFingerprint(c(0)))
    ),
    entry(
      "graft_top_token_ngram",
      classOf[TopTokenNGram],
      arity("graft_top_token_ngram", 2)(c => TopTokenNGram(c(0), intArg("graft_top_token_ngram", c(1))))
    ),
    entry(
      "graft_simhash",
      classOf[SimHashBits],
      arity("graft_simhash", 3)(c =>
        SimHashBits(c(0), intArg("graft_simhash", c(1)), intArg("graft_simhash", c(2)))
      )
    ),
    entry(
      "graft_minhash_sig",
      classOf[MinHashSig],
      arity("graft_minhash_sig", 2)(c => MinHashSig(c(0), intArg("graft_minhash_sig", c(1))))
    ),
    entry(
      "graft_winnow",
      classOf[WinnowKeys],
      arity("graft_winnow", 3)(c =>
        WinnowKeys(c(0), intArg("graft_winnow", c(1)), intArg("graft_winnow", c(2)))
      )
    ),
    entry(
      "graft_band_keys",
      classOf[BandKeys],
      arity("graft_band_keys", 2)(c => BandKeys(c(0), intArg("graft_band_keys", c(1))))
    ),
    entry(
      "graft_first_equal_band",
      classOf[FirstEqualBand],
      arity("graft_first_equal_band", 3)(c =>
        FirstEqualBand(c(0), c(1), intArg("graft_first_equal_band", c(2)))
      )
    ),
    entry(
      "graft_scaled_sq_dist",
      classOf[ScaledSqDist],
      arity("graft_scaled_sq_dist", 3)(c => ScaledSqDist(c(0), c(1), c(2)))
    ),
    entry(
      "graft_quantized_dot",
      classOf[QuantizedDot],
      arity("graft_quantized_dot", 3)(c =>
        QuantizedDot(c(0), c(1), intArg("graft_quantized_dot", c(2)))
      )
    ),
    // aggregate function: the analyzer wraps a bare AggregateFunction in
    // an AggregateExpression during UnresolvedFunction resolution, so the
    // builder returns the function itself
    entry(
      "graft_top_k",
      classOf[GroupTopK],
      arity("graft_top_k", 3)(c => GroupTopK(c(0), c(1), intArg("graft_top_k", c(2))))
    ),
    entry(
      "graft_cdc_cuts",
      classOf[CdcCuts],
      arity("graft_cdc_cuts", 1)(c => CdcCuts(c(0)))
    ),
    // like graft_redact_pii below: the merge table parameterizes codegen
    // and is not SQL-literal-friendly, so the SQL name bakes the engine's
    // own rank-ordered merge program (TextOps.bpeMerges × BpePasses)
    entry(
      "graft_bpe_segment",
      classOf[BpeSegment],
      arity("graft_bpe_segment", 1)(c =>
        BpeSegment(c(0), graft.ops.TextOps.bpeMerges, graft.ops.TextOps.bpePasses)
      )
    ),
    // composed (not a single native class): the PII scrub regexp chain —
    // built from the SAME pattern list as the Column API (TextOps
    // .piiPatterns), folded as catalyst RegExpReplace nodes directly
    // (Column-node unlifting stays unresolved inside a function builder)
    entry(
      "graft_redact_pii",
      classOf[org.apache.spark.sql.catalyst.expressions.RegExpReplace],
      arity("graft_redact_pii", 1)(c =>
        graft.ops.TextOps.piiPatterns.foldLeft(c(0)) { case (e, (re, rep)) =>
          org.apache.spark.sql.catalyst.expressions.RegExpReplace(
            e,
            Literal(org.apache.spark.unsafe.types.UTF8String.fromString(re), org.apache.spark.sql.types.StringType),
            Literal(org.apache.spark.unsafe.types.UTF8String.fromString(rep), org.apache.spark.sql.types.StringType)
          )
        }
      )
    )
  )

  /** Imperative registration on a live session: the SQL functions plus the
    * KernelFusion optimizer rule (idempotent — the rule is added once).
    * NOTE: the streaming window-top-1 arm (StreamingTop1Rewrite) is an
    * ANALYZER rule and cannot be added to a live session — sessions that
    * need it must be built with `spark.sql.extensions=graft.GraftExtensions`
    * (or `builder.withExtensions(new GraftExtensions()(_))`).
    */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (name, _, builder) =>
      org.apache.spark.sql.GraftColumns.registerFunction(spark, name, builder)
    }
    graft.plans.TableFunctions.all.foreach { case (name, builder) =>
      org.apache.spark.sql.GraftColumns.registerTableFunction(spark, name, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(graft.plans.KernelFusion))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.KernelFusion
    if (!spark.experimental.extraOptimizations.contains(graft.plans.CustomJoinOptimization))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.CustomJoinOptimization
    if (!spark.experimental.extraOptimizations.contains(graft.plans.RangeJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RangeJoinRewrite
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    if (!spark.experimental.extraStrategies.contains(graft.plans.IntervalJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.IntervalJoinStrategy
  }
}
