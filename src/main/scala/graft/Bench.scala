package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.maxFields", "256")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/session warmup so the first measured query doesn't absorb
    // class-loading + codegen startup (no query results are precomputed:
    // each table gets one footer read + trivial count, nothing
    // query-shaped). Without the per-table pass, q01 (alphabetically
    // first) absorbed ~2 s of one-time parquet-footer/codegen cost.
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("lineitem", "orders", "customer", "part", "supplier", "nation",
      "region", "events", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    }
    // optional arg: comma-separated query-name filter (local profiling;
    // the driver always runs the full registry)
    val only: Option[Set[String]] =
      if (args.nonEmpty) Some(args(0).split(",").toSet) else None
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        // noop-format write, NOT count(): count() lets Catalyst prune any
        // output column the row count doesn't need, silently skipping the
        // final (often most expensive) projections — a map-only expression
        // query would bench as a bare scan. The noop sink materializes
        // every output column and discards it.
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
            false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.filter(!_._3).map(_._1)
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    // per-query wall-time budget: anything > 4× the suite median is
    // flagged in the report, so a single regressed query fails loudly
    // instead of hiding in the tail of a 100+-query total. Median over
    // PASSING queries only — failed queries report ~0 s, which would
    // deflate the baseline and flag healthy queries instead of the
    // regression.
    val times = results.filter(_._3).map(_._2).sorted
    val median =
      if (times.isEmpty) 0.0
      else if (times.size % 2 == 1) times(times.size / 2)
      else (times(times.size / 2 - 1) + times(times.size / 2)) / 2.0
    val slow = results.filter { case (_, v, ok) => ok && median > 0 && v > 4.0 * median }
    val slowJson = slow
      .map { case (k, v, _) => s"""{"query":"$k","sec":$v,"x_median":${v / median}}""" }
      .mkString("[", ",", "]")
    // "failed" makes a broken query visible in the one-line report instead
    // of letting its ~0s timing masquerade as a speedup
    // "action" documents the measurement method: noop-write materializes
    // every output column (count() would let pruning skip final projections,
    // understating map-heavy queries — rounds 1-2 measured with count()).
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","action":"noop-write","failed":${failed.size},"failed_queries":$failedJson,"median":$median,"slow_budget_x":4.0,"slow_queries":$slowJson}"""
    )
    spark.stop()
  }
}
