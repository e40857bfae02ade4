package graft

/** SQL users get the native functions: graft_dot registered via
  * GraftExtensions (config path or imperative).
  */
class ExtensionsSpec extends SparkSpec {

  test("graft_dot is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark
      .sql("SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .first()
      .getDouble(0)
    assert(r == 32.0)
  }

  test("graft_cosine is callable from SQL and bounded") {
    GraftExtensions.register(spark)
    val r = spark
      .sql("SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c, " +
        "graft_cosine(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS o")
      .first()
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0)
  }

  test("wrong arity is rejected with a named error, not an index crash") {
    GraftExtensions.register(spark)
    val ex = intercept[Exception] {
      spark.sql("SELECT graft_cosine(array(1.0d))").collect()
    }
    assert(ex.getMessage.contains("graft_cosine"), s"unhelpful error: ${ex.getMessage}")
  }

  test("graft_dot agrees with the HOF formulation on real embeddings") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    val e = graft.ops.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("embedding").cast("array<double>").as("v"))
      .limit(50)
    val both = e.select(
      expr("graft_dot(v, v)").as("native"),
      aggregate(zip_with(col("v"), col("v"), (x, y) => x * y), lit(0.0), (a, x) => a + x).as("hof")
    )
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }
}
