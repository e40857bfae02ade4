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

  test("shingles of short documents are empty, not bogus") {
    import org.apache.spark.sql.functions._
    import graft.ops.DedupOps
    val df = spark
      .createDataFrame(Seq((1L, "one two"), (2L, ""), (3L, "a b c d")))
      .toDF("doc_id", "text")
      .select(col("doc_id"), DedupOps.shingles(split(trim(col("text")), "\\s+")).as("s"))
      .orderBy(col("doc_id"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1))
    assert(rows(0)._2.isEmpty, "2-token doc must have no shingles")
    assert(rows(1)._2.isEmpty, "empty doc must have no shingles")
    assert(rows(2)._2 == Seq("a b c", "b c d"))
  }

  test("spark.sql over registered views matches the DataFrame API") {
    import graft.ops.Tables
    Tables.registerViews(spark, sfDir)
    GraftExtensions.register(spark)
    // a star join and a native-function query, both as literal SQL text —
    // the SQL-first entry point a reference user would reach for
    val sqlStar = spark.sql(
      """SELECT c_mktsegment, round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
    ).collect().toSeq
    val dfStar = {
      import org.apache.spark.sql.functions._
      Tables.orders(spark, sfDir)
        .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(round(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy(col("c_mktsegment"))
        .collect().toSeq
    }
    assert(sqlStar == dfStar)
    val sqlVec = spark.sql(
      """SELECT vec_id, graft_quantized_dot(cast(embedding AS array<double>),
        |                                   cast(embedding AS array<double>), 64) AS qnorm
        |FROM embeddings ORDER BY vec_id LIMIT 5""".stripMargin
    ).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(sqlVec.size == 5 && sqlVec.forall(_._2 >= 0L))
  }

  test("registry names are unique and every oracle key has a query") {
    val names = QueryRegistry.all.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("connected components collapse transitive chains and leave islands alone") {
    import org.apache.spark.sql.functions._
    import graft.ops.DedupOps
    // chain 1-2, 2-3, 3-4 (diameter 3 forces multiple propagation rounds);
    // separate pair 10-11; edges given in one direction only
    val pairs = spark
      .createDataFrame(Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L)))
      .toDF("doc_a", "doc_b")
    val labels = DedupOps
      .connectedComponents(pairs)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
    graft.ops.Caches.invalidate()
  }

  test("connected components fall back to star rounds when propagation exhausts maxRounds") {
    import graft.ops.DedupOps
    // a diameter-4 chain cannot converge in 1 propagation round —
    // partially-propagated labels must never be returned silently; the
    // O(log n) star fallback must produce the CORRECT labels instead
    val pairs = spark
      .createDataFrame(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
      .toDF("doc_a", "doc_b")
    val labels = DedupOps
      .connectedComponents(pairs, maxRounds = 1)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(labels == (1L to 5L).map(_ -> 1L).toMap)
    graft.ops.Caches.invalidate()
  }

  test("star components label a 1000-node path in O(log n) rounds") {
    import graft.ops.DedupOps
    // min-label propagation needs 999 rounds on this graph; the
    // large-star/small-star alternation must finish within a logarithmic
    // budget (2·log2(1000) ≈ 20 — give it 24 incl. the confirming round)
    val pairs = spark
      .createDataFrame((1L until 1000L).map(i => (i, i + 1L)))
      .toDF("src", "dst")
    val labels = DedupOps
      .starComponents(pairs, maxRounds = 24)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(labels == (1L to 1000L).map(_ -> 1L).toMap)
    graft.ops.Caches.invalidate()
  }

  test("star components agree with propagation on random graphs and keep singletons") {
    import graft.ops.DedupOps
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(42)
    val edges = Seq
      .fill(80)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(e => e._1 != e._2) :+ (99L, 99L)
    val pairs = spark.createDataFrame(edges).toDF("a", "b")
    val star = DedupOps.starComponents(pairs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prop = DedupOps
      .connectedComponents(pairs.filter(col("a") =!= col("b")))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    // the self-loop-only node 99 keeps a singleton label in the star path
    assert(star(99L) == 99L)
    assert(star - 99L == prop, s"star=$star\nprop=$prop")
    graft.ops.Caches.invalidate()
  }

  test("connected components fixpoint metrics ride the checkpoint job (no fallback re-aggregate)") {
    import graft.ops.DedupOps
    // r18 fusion: the per-round sum(lbl) convergence check is observe()d
    // on the localCheckpoint materialization instead of running as its
    // own aggregate job. The fusion only pays off if the observed
    // metrics actually arrive (the defensive fallback re-aggregates —
    // correct, but exactly the pre-fusion second job): assert zero
    // fallbacks across a multi-round propagation AND a star-fallback run.
    // (Raw job counts are not asserted: AQE materializes every exchange
    // as its own job, so they don't map 1:1 to loop iterations.)
    val before = DedupOps.observedFallbacks.get()
    val pairs = spark
      .createDataFrame(Seq((2L, 1L), (2L, 3L), (3L, 4L)))
      .toDF("doc_a", "doc_b")
    val labels = DedupOps
      .connectedComponents(pairs)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    // star path too (diameter-4 chain with maxRounds=1 forces it)
    val starPairs = spark
      .createDataFrame(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
      .toDF("doc_a", "doc_b")
    val starLabels = DedupOps
      .connectedComponents(starPairs, maxRounds = 1)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(starLabels == (1L to 5L).map(_ -> 1L).toMap)
    assert(DedupOps.observedFallbacks.get() == before,
      "observed metrics missed the listener bus and the loop re-aggregated")
    graft.ops.Caches.invalidate()
  }

  test("connected components of an empty pair set are empty") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(graft.ops.DedupOps.connectedComponents(empty).isEmpty)
    graft.ops.Caches.invalidate()
  }

  test("q145's correlation algebra: sign convention, perfect anticorrelation, floor on negatives") {
    // the synthetic corpus only produces POSITIVE correlations, so the
    // negative branch of the sign-carried integer division — where Spark
    // `div` (truncate) and DuckDB `//` (floor) would disagree if the
    // quotient went negative — is pinned here against exact hand algebra
    import graft.ops.QualityOps
    import org.apache.spark.sql.functions.lit
    def moments(xs: Seq[Long], ys: Seq[Long]): (Long, Long, Long) = {
      val n = xs.length.toLong
      val (sx, sy) = (xs.sum, ys.sum)
      val cov = n * xs.zip(ys).map { case (a, b) => a * b }.sum - sx * sy
      val vx = n * xs.map(a => a * a).sum - sx * sx
      val vy = n * ys.map(b => b * b).sum - sy * sy
      (cov, vx, vy)
    }
    def run(xs: Seq[Long], ys: Seq[Long]): Long = {
      val (cov, vx, vy) = moments(xs, ys)
      spark
        .range(1)
        .select(lit(cov).as("c"), lit(vx).as("vx"), lit(vy).as("vy"))
        .select(QualityOps.corrBpExpr("c", "vx", "vy").as("bp"))
        .head()
        .getLong(0)
    }
    // n = 2 makes the variance numerator (a−b)² — a perfect square, so
    // the floor(sqrt) magnitude is exact and perfect (anti)correlation
    // lands on exactly ±10000 (for non-square variances the magnitude
    // overshoots by up to ~2/√var — negligible at corpus-scale sums,
    // pinned exactly below)
    assert(run(Seq(1L, 3L), Seq(3L, 1L)) === -10000L)
    assert(run(Seq(2L, 7L), Seq(2L, 7L)) === 10000L)
    // constant y against itself-varying x: cov = 0 → 0, no sign
    assert(run(Seq(1L, 5L, 9L), Seq(4L, 4L, 4L)) === 0L)
    // noisy anticorrelated case: |quotient| floors (toward zero on the
    // MAGNITUDE, which equals DuckDB's floor of the negative value only
    // because the sign multiplies AFTER the division — the convention
    // under test)
    val xs = Seq(1L, 2L, 3L, 4L, 5L)
    val ys = Seq(9L, 7L, 8L, 3L, 1L)
    val (cov, vx, vy) = moments(xs, ys)
    val expected = -1L * (math.abs(cov) * 10000L /
      (math.floor(math.sqrt(vx.toDouble)).toLong * math.floor(math.sqrt(vy.toDouble)).toLong))
    assert(cov < 0, "test vectors must anticorrelate")
    assert(run(xs, ys) === expected)
    assert(run(xs, ys) < -8000L, "strong anticorrelation expected")
    // non-perfect-square variances: the engine must reproduce the SAME
    // floor(sqrt) overshoot the hand formula gives (convention, not ideal
    // math, is the cross-engine contract)
    val (c2, v2x, v2y) = moments(Seq(1L, 2L, 3L, 4L), Seq(4L, 3L, 2L, 1L))
    val e2 = -1L * (math.abs(c2) * 10000L /
      (math.floor(math.sqrt(v2x.toDouble)).toLong * math.floor(math.sqrt(v2y.toDouble)).toLong))
    assert(run(Seq(1L, 2L, 3L, 4L), Seq(4L, 3L, 2L, 1L)) === e2)
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
    assert(
      PipelineConfig[Int](
        name = "x",
        batchers = Seq(BatcherConfig[Int]("a", concurrency = 0))
      ).validate().isLeft
    )
    assert(PipelineConfig[Int](name = "ok").validate().isRight)
  }
}
