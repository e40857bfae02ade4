package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's stdout line must stay parseable inside the driver's 2 KB
  * tail window (r12's "parsed": null was the streaming durations_ms maps
  * outgrowing it) — the compaction that guarantees it is pure string work,
  * tested here without a SparkSession.
  */
class BenchSpec extends AnyFunSuite {

  test("compactStreamingJson strips durations/counters, keeps headline numbers, stays balanced") {
    val full =
      """{"rows":200000,"state_provider":"HDFSBackedStateStoreProvider",""" +
        """"burst":{"sec":2.367,"rows_per_sec":84500,"processed":200000,"micro_batches":9,"durations_ms":{"addBatch":1800,"commitOffsets":120,"walCommit":80}},""" +
        """"drain":{"drain_sec":2.412,"rows_per_sec":82900,"processed":200000,"durations_ms":{"addBatch":2100}},""" +
        """"interval_join":{"sec":23.3,"rows_per_sec":8600,"matched":-1,"state_rows_max":51700,"state_mem_mb":14,"durations_ms":{"addBatch":21000,"stateCommit":900}},"micro_batches":41}"""
    val compact = Bench.compactStreamingJson(full)
    assert(!compact.contains("durations_ms"))
    assert(!compact.contains("micro_batches"))
    assert(!compact.contains("processed"))
    assert(!compact.contains("\"matched\""))
    assert(compact.contains("\"rows_per_sec\":84500"))
    // state_rows_max is stripped too since r14 (the asof_bounded triple
    // joined the default block; mem stays, rows ride in BENCH_DETAIL)
    assert(!compact.contains("state_rows_max"))
    assert(compact.contains("\"state_mem_mb\":14"))
    assert(compact.contains("\"drain_sec\":2.412"))
    // still structurally valid JSON: balanced braces, no dangling commas
    assert(compact.count(_ == '{') == compact.count(_ == '}'))
    assert(!compact.contains(",}") && !compact.contains("{,"))
    // the whole point: an order-of-magnitude shrink per scenario
    assert(compact.length < full.length)
  }

  test("statePartitionsForVolume: floor at small state, linear in bytes beyond it") {
    import graft.streaming.EventTime.statePartitionsForVolume
    assert(statePartitionsForVolume(0L) == 8) // the measured small-state optimum
    assert(statePartitionsForVolume(20L * 1024 * 1024) == 8) // bench-scale state stays at the floor
    assert(statePartitionsForVolume(1024L * 1024 * 1024) == 32) // 1 GB / 32 MB
    assert(statePartitionsForVolume(1024L * 1024 * 1024 + 1) == 33) // ceil, not floor
    assert(statePartitionsForVolume(100L << 30, targetBytesPerPartition = 64L << 20) == 1600)
    assert(statePartitionsForVolume(0L, minPartitions = 4) == 4)
    intercept[IllegalArgumentException](statePartitionsForVolume(-1L))
  }

  test("compactStreamingJson passes error and null blocks through unchanged") {
    assert(Bench.compactStreamingJson("""{"error":"TimeoutException"}""") ==
      """{"error":"TimeoutException"}""")
    assert(Bench.compactStreamingJson("null") == "null")
  }
}
