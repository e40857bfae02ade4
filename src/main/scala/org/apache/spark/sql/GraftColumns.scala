package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between custom Catalyst `Expression`s and the public `Column`
  * API (Spark 4 wraps Columns in ColumnNodes; the converters live in
  * `org.apache.spark.sql.classic` with private[sql] visibility, hence this
  * one-file shim in the sql package — the standard extension-library
  * pattern).
  */
object GraftColumns {
  def lift(e: Expression): Column = ExpressionUtils.column(e)
  def unlift(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a (resolved) custom LogicalPlan as a DataFrame — the bridge a
    * custom operator's Column-level API needs (`Dataset.ofRows` is
    * private[sql]).
    */
  def ofRows(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      plan
    )

  /** Clone a session with conf overrides — the per-query conf-binding
    * primitive (`SparkSession.cloneSession` is private[sql], hence here).
    * A streaming query clones the session state of the DataFrame it starts
    * from, so a plan rebased onto the returned session carries the
    * overrides for ITS query only; the caller's session is untouched.
    */
  def cloneWithConf(spark: SparkSession, confs: (String, String)*): SparkSession = {
    val cloned = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()
    confs.foreach { case (k, v) => cloned.conf.set(k, v) }
    cloned
  }

  /** Imperative SQL-function registration on an existing session (the
    * extensions-config path is `graft.GraftExtensions`).
    */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression
  ): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Imperative TABLE-function registration (the extensions-config path is
    * `injectTableFunction` in `graft.GraftExtensions`).
    */
  def registerTableFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  ): Unit =
    spark.sessionState.tableFunctionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
