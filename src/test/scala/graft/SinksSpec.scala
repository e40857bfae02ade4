package graft

import java.nio.file.Files
import graft.sinks.Sinks

/** Idempotent + routed sinks: a retried batch replaces its own output. */
class SinksSpec extends SparkSpec {

  import spark.implicits._

  test("idempotentParquet makes a re-run of the same batch a no-op") {
    val root = Files.createTempDirectory("graft-sink").toString
    val df = (1 to 10).toDF("v")
    Sinks.idempotentParquet(df, root, batchId = 7)
    Sinks.idempotentParquet(df, root, batchId = 7) // retry of the same batch
    val back = spark.read.parquet(s"$root/batch_id=7")
    assert(back.count() == 10) // not 20: overwrite, not append
  }

  test("routedParquet fans out by batcher column") {
    val root = Files.createTempDirectory("graft-routes").toString
    val df = Seq((1, "a"), (2, "b"), (3, "a")).toDF("v", "batcher")
    Sinks.routedParquet(df, Seq("a", "b"), r => s"$root/$r", batchId = 0)
    assert(spark.read.parquet(s"$root/a/batch_id=0").count() == 2)
    assert(spark.read.parquet(s"$root/b/batch_id=0").count() == 1)
  }

  test("compactParquet collapses a many-tiny-file directory, preserving the data") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/data"
    // simulate many trigger-sized writes: 64 partitions → 64 tiny files
    spark.range(10000).repartition(64).write.parquet(dir)
    def files = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    val before = files
    assert(before >= 32, s"expected many small files, got $before")
    val sumBefore = spark.read.parquet(dir).agg(org.apache.spark.sql.functions.sum("id"))
      .head().getLong(0)
    Sinks.compactParquet(spark, dir, targetBytes = 8L * 1024 * 1024)
    val after = files
    assert(after < before / 4, s"compaction did not shrink file count: $before -> $after")
    val sumAfter = spark.read.parquet(dir).agg(org.apache.spark.sql.functions.sum("id"))
      .head().getLong(0)
    assert(sumAfter == sumBefore, "compaction changed the data")
  }
}
