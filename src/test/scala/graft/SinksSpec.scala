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
}
