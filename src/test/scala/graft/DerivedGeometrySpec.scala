package graft

import org.apache.spark.sql.functions._
import graft.ops.SimilarityOps

/** Size-derived embedding-LSH band geometry (the round-11 scale-default
  * fix): the shipped default used to be the oracle's exact-recall 320×8
  * tuning, whose candidate multiset is quadratic in corpus size; the
  * default is now derived from a metadata-only corpus count so the path
  * users actually take stays ~linear, while the q42/q47 oracle call sites
  * pin the exact-recall geometry explicitly.
  */
class DerivedGeometrySpec extends SparkSpec {

  private val p09 = 1.0 - math.acos(0.9) / math.Pi

  test("derived geometry: multiset stays ~linear and >=0.9 recall bound holds at every size") {
    val sizes = Seq(1L, 100L, 1000L, 2000L, 20000L, 60000L, 200000L, 2000000L,
      20000000L, 200000000L, 2000000000L)
    sizes.foreach { n =>
      val (bands, bits) = SimilarityOps.derivedGeometry(n)
      // widths are {8, 16}: BandKeys slices whole 64-bit signature words
      assert(bands >= 8 && (bits == 8 || bits == 16), s"n=$n got ($bands, $bits)")
      // whole words only: a partially-padded word is a universal bucket
      assert(bands * bits % 64 == 0, s"n=$n ($bands x $bits) straddles a word")
      // recall bound: a true >=0.9-cosine pair is missed with prob <= 1e-3
      val miss = math.pow(1.0 - math.pow(p09, bits), bands)
      assert(miss <= 1e-3 + 1e-12, s"n=$n ($bands x $bits): miss=$miss")
      // multiset bound: expected random collisions <= c*n up to the 16-bit
      // width cap (~1e5 vectors; beyond it the documented remediation is
      // IVF coarse partitioning, not a wider flat band table)
      if (n <= 100000L) {
        val perN = bands.toDouble * n / math.pow(2.0, bits)
        assert(perN <= 128.0 + 1e-9, s"n=$n ($bands x $bits): multiset/n=$perN")
      }
    }
  }

  test("derived geometry is monotone: corpus growth never narrows the bands") {
    val bitsAt = Seq(100L, 1000L, 10000L, 100000L, 1000000L, 10000000L, 1000000000L)
      .map(n => SimilarityOps.derivedGeometry(n)._2)
    assert(bitsAt == bitsAt.sorted, s"band bits not monotone in n: $bitsAt")
  }

  test("anchor points: oracle corpora stay narrow, stress corpora widen") {
    // sf0.001/sf0.01 (~150-300 vectors): narrowest band, generous recall
    assert(SimilarityOps.derivedGeometry(200L)._2 == 8)
    // the 30x ScaleStress corpus (60k vectors) lands on 16-bit bands —
    // the same regime as the hand-tuned 64x16 production geometry
    val (b60k, bits60k) = SimilarityOps.derivedGeometry(60000L)
    assert(bits60k == 16, s"60k vecs got ($b60k, $bits60k)")
    assert(b60k >= 64 && b60k <= 128, s"60k vecs band count out of family: $b60k")
  }

  test("a conf width that straddles signature words fails loud, naming the key") {
    spark.conf.set(SimilarityOps.NumBandsKey, "100")
    spark.conf.set(SimilarityOps.BandBitsKey, "12")
    try {
      val ex = intercept[IllegalArgumentException] {
        SimilarityOps.embeddingNeardupPairs(spark, "/root/testdata/sf0.001")
      }
      assert(ex.getMessage.contains(SimilarityOps.BandBitsKey) &&
        ex.getMessage.contains("divide 64"), ex.getMessage)
    } finally {
      spark.conf.unset(SimilarityOps.NumBandsKey)
      spark.conf.unset(SimilarityOps.BandBitsKey)
    }
  }

  test("malformed band confs fail loud naming the offending key") {
    val dir = "/root/testdata/sf0.001"
    spark.conf.set(SimilarityOps.NumBandsKey, "not-a-number")
    spark.conf.set(SimilarityOps.BandBitsKey, "8")
    try {
      val ex = intercept[IllegalArgumentException] {
        SimilarityOps.embeddingNeardupPairs(spark, dir)
      }
      assert(ex.getMessage.contains(SimilarityOps.NumBandsKey) &&
        ex.getMessage.contains("not-a-number"), ex.getMessage)
    } finally {
      spark.conf.unset(SimilarityOps.NumBandsKey)
      spark.conf.unset(SimilarityOps.BandBitsKey)
    }
    // setting only one of the pair is also a config error, named
    spark.conf.set(SimilarityOps.BandBitsKey, "16")
    try {
      val ex = intercept[IllegalArgumentException] {
        SimilarityOps.embeddingNeardupPairs(spark, dir)
      }
      assert(ex.getMessage.contains(SimilarityOps.NumBandsKey), ex.getMessage)
    } finally spark.conf.unset(SimilarityOps.BandBitsKey)
  }

  test("corpus count memo invalidates when the table is rewritten in place") {
    import spark.implicits._
    val dir = "/tmp/graft_corpus_count_spec"
    def write(n: Int): Unit =
      spark.range(n).map(i => (i, Seq.fill(64)(0.1f), 0))
        .toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    write(100)
    assert(SimilarityOps.corpusCount(spark, dir) == 100L)
    // in-place rewrite (append/regeneration in a long-lived session) must
    // re-derive — a stale count silently keeps a too-narrow band width
    Thread.sleep(5) // ensure the directory mtime stamp moves
    write(300)
    assert(SimilarityOps.corpusCount(spark, dir) == 300L,
      "stale memoized corpus count survived an in-place rewrite")
  }

  test("default (derived) pipeline recalls every planted >=0.9-cosine pair") {
    import spark.implicits._
    val dir = "/tmp/graft_derived_geom_spec"
    // 400 vectors in 40 clusters of 10: intra-cluster cosine ~1 (planted
    // near-dups), cross-cluster ~0 (zero-centered directions) — the same
    // construction ScaleStress uses, small enough for a brute-force oracle
    spark.range(400).as[Long].map { id =>
      val cluster = id / 10
      var s = cluster * 0x9E3779B97F4A7C15L + 17
      val arr = new Array[Float](64)
      var i = 0
      while (i < 64) {
        s = s * 6364136223846793005L + 1442695040888963407L
        val base = (((s >>> 40).toInt % 1000) - 500) / 500.0f
        val noise = (((id * 31 + i) * 6364136223846793005L >>> 45).toInt % 100) / 2000.0f
        arr(i) = base + noise
        i += 1
      }
      (id, arr.toSeq, (id % 32).toInt)
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def dp(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val exactHi = (for {
      i <- vecs.indices.iterator
      j <- (i + 1) until vecs.length
      cos = dp(vecs(i)._2, vecs(j)._2) /
        (math.sqrt(dp(vecs(i)._2, vecs(i)._2)) * math.sqrt(dp(vecs(j)._2, vecs(j)._2)))
      if cos >= 0.9
    } yield (vecs(i)._1, vecs(j)._1)).toSet
    assert(exactHi.size >= 100, s"corpus planted only ${exactHi.size} >=0.9 pairs — vacuous")

    val got = SimilarityOps.embeddingNeardupPairs(spark, dir)
      .filter(col("cosine") >= 0.9)
      .select(col("vec_a"), col("vec_b"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val missed = exactHi -- got
    assert(missed.isEmpty, s"derived geometry missed ${missed.size} of ${exactHi.size}: ${missed.take(5)}")
    graft.ops.Caches.invalidate()
  }
}
