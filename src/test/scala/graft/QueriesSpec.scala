package graft

import graft.ops.QueryRegistry

/** Every registered operator runs end-to-end at sf0.001 (smoke: executes,
  * sane schema; value correctness is gated by the DuckDB oracle at sf0.01 —
  * see tools/check.py).
  */
class QueriesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  QueryRegistry.all.foreach { q =>
    test(s"${q.name} executes at sf0.001") {
      val df = q.fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      val n = df.count()
      assert(n >= 0)
    }
  }

  test("registry names are unique and every oracle key has a query") {
    val names = QueryRegistry.all.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("config validation rejects bad configs") {
    import graft.config._
    assert(PipelineConfig[Int](name = "").validate().isLeft)
    assert(
      PipelineConfig[Int](
        name = "x",
        batchers = Seq(BatcherConfig[Int]("a"), BatcherConfig[Int]("a"))
      ).validate().isLeft
    )
    assert(
      PipelineConfig[Int](
        name = "x",
        batchers = Seq(BatcherConfig[Int]("a", batchSize = 0))
      ).validate().isLeft
    )
    assert(
      PipelineConfig[Int](name = "x", rateLimiting = Some(RateLimiting(0, 100))).validate().isLeft
    )
    assert(PipelineConfig[Int](name = "ok").validate().isRight)
  }
}
