package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.VectorFunctions
import graft.ops.{Caches, SimilarityOps}

/** Native packed-signature expressions backing the banded-LSH candidate
  * path (HyperplaneSignsPacked / BandKeys / FirstEqualBand), plus the
  * cache-registry release hook.
  */
class VectorExprSpec extends SparkSpec {

  test("packed hyperplane signs agree bit-for-bit with the string formulation") {
    val n = SimilarityOps.NumBands * SimilarityOps.BandBits
    val rows = graft.ops.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .limit(64)
      .select(
        SimilarityOps.signBits(col("v"), n).as("bits"),
        SimilarityOps.packedSig(col("v")).as("sig")
      )
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bits = r.getString(0)
      val unpacked = r.getSeq[Long](1)
        .map(w => ("0" * 64 + java.lang.Long.toBinaryString(w)).takeRight(64))
        .mkString
      assert(unpacked.length == n && unpacked == bits)
    }
  }

  test("band keys encode (band << bits) | nibble, MSB-first") {
    val keys = spark.range(1)
      .select(VectorFunctions.bandKeys(array(lit(0x0123456789abcdefL)), 4).as("k"))
      .first()
      .getSeq[Int](0)
    // nibbles of the word MSB-first are 0,1,2,...,15 so key b = b*16 + b
    assert(keys == (0 until 16).map(b => 17 * b))
  }

  test("first-equal-band finds the lowest agreeing band across words") {
    val a0 = 0xdeadbeefdeadbeefL
    val r = spark.range(1).select(
      // nibbles 0-3 and 15 flipped: first equal band is 4
      VectorFunctions.firstEqualBand(
        array(lit(a0)), array(lit(a0 ^ 0xffff00000000000fL)), 4).as("mid"),
      // every nibble of word 0 differs; word 1 equal: first equal band is 16
      VectorFunctions.firstEqualBand(
        array(lit(a0), lit(5L)), array(lit(a0 ^ 0x1111111111111111L), lit(5L)), 4).as("w1"),
      // identical signatures: band 0
      VectorFunctions.firstEqualBand(array(lit(a0)), array(lit(a0)), 4).as("zero"),
      // every nibble differs everywhere: -1
      VectorFunctions.firstEqualBand(
        array(lit(a0)), array(lit(a0 ^ 0x1111111111111111L)), 4).as("none")
    ).first()
    assert(r.getInt(0) == 4 && r.getInt(1) == 16 && r.getInt(2) == 0 && r.getInt(3) == -1)
  }

  test("candidate pair dedup: the verified pair listing carries no duplicates") {
    val pairs = SimilarityOps
      .embeddingNeardupPairs(spark, "/root/testdata/sf0.001")
      .select(col("vec_a"), col("vec_b"))
    val total = pairs.count()
    val unique = pairs.distinct().count()
    assert(total == unique, s"$total emitted rows vs $unique unique pairs")
  }

  test("scaled squared distance agrees with the HOF formulation") {
    val rows = graft.ops.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .selectExpr("transform(cast(embedding as array<double>), x -> cast(floor(x * 1000d) as bigint)) AS qv")
      .limit(40)
      .selectExpr("qv", "slice(qv, 1, 64) AS csum", "cast(7 as bigint) AS ccnt")
      .select(
        VectorFunctions.scaledSqDist(col("qv"), col("csum"), col("ccnt")).as("native"),
        expr(
          "cast(aggregate(zip_with(qv, csum, (x, sm) -> (ccnt * x - sm) * (ccnt * x - sm)), " +
            "cast(0 as bigint), (acc, y) -> acc + y) as double) / cast(ccnt * ccnt as double)"
        ).as("hof")
      )
    assert(rows.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("quantized dot agrees with the HOF formulation and is symmetric") {
    val rows = graft.ops.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .selectExpr("cast(embedding as array<double>) AS v")
      .limit(40)
      .selectExpr("v", "reverse(v) AS w")
      .select(
        VectorFunctions.quantizedDot(col("v"), col("w"), 64).as("native"),
        expr(
          "aggregate(zip_with(v, w, (x, y) -> cast(floor(x * 64d) as bigint) * cast(floor(y * 64d) as bigint)), " +
            "cast(0 as bigint), (acc, p) -> acc + p)"
        ).as("hof"),
        (VectorFunctions.quantizedDot(col("v"), col("w"), 64)
          === VectorFunctions.quantizedDot(col("w"), col("v"), 64)).as("sym")
      )
    assert(rows.filter(col("native") =!= col("hof") || not(col("sym"))).count() == 0)
  }

  test("pq encode agrees with a reference argmin and breaks ties to the smallest index") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val numSub = 4; val numCent = 3; val subDim = 2
    // centroid 2 duplicates centroid 0 in every subspace → a vector AT
    // centroid 0 ties (j=0, j=2) and must code to the smaller index
    val cb0 = Seq.fill(numSub * numCent * subDim)(rnd.nextInt(200).toLong - 100)
    val cb = (0 until numSub).flatMap { m =>
      val base = m * numCent * subDim
      cb0.slice(base, base + 2 * subDim) ++ cb0.slice(base, base + subDim)
    }
    def refEncode(v: Seq[Long]): Seq[Long] =
      (0 until numSub).map { m =>
        (0 until numCent).minBy { j =>
          val d = (0 until subDim).map { i =>
            val diff = v(m * subDim + i) - cb((m * numCent + j) * subDim + i)
            diff * diff
          }.sum
          (d, j.toLong) // minBy is stable on first minimum → smallest j
        }.toLong
      }
    val atCentroid0: Seq[Long] =
      (0 until numSub).flatMap { m =>
        val base = m * numCent * subDim
        cb.slice(base, base + subDim)
      }
    val vecs = Seq.fill(50)(Seq.fill(numSub * subDim)(rnd.nextInt(200).toLong - 100)) :+
      atCentroid0
    val got = vecs.toDF("qv")
      .select(
        col("qv"),
        VectorFunctions.pqEncode(col("qv"), cb, numSub, numCent, subDim).as("codes")
      )
      .collect()
      .map(r => (r.getSeq[Long](0), r.getSeq[Long](1)))
    got.foreach { case (v, codes) =>
      assert(codes == refEncode(v), s"v=$v native=$codes ref=${refEncode(v)}")
    }
  }

  test("scaled squared distance fails loud on int64 overflow instead of wrapping") {
    import spark.implicits._
    // cnt*q - sum ≈ 2^32 per dim; squared ≈ 2^64 — must raise, not wrap
    val big = Seq((Array(1L << 31), Array(0L), 2L)).toDF("qv", "csum", "ccnt")
    val ex = intercept[Exception] {
      big.select(VectorFunctions.scaledSqDist(col("qv"), col("csum"), col("ccnt"))).collect()
    }
    def causes(t: Throwable): Iterator[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
    assert(
      causes(ex).exists(_.isInstanceOf[ArithmeticException]),
      s"expected ArithmeticException in cause chain, got $ex"
    )
  }

  test("Caches.invalidate releases the library's persisted frames") {
    val df = SimilarityOps.embeddingNeardupPairs(spark, "/root/testdata/sf0.001")
    df.count()
    assert(df.storageLevel != StorageLevel.NONE, "neardup result should be persisted")
    Caches.invalidate()
    assert(df.storageLevel == StorageLevel.NONE, "invalidate should unpersist tracked frames")
  }

  test("Caches dedups re-registrations of the same plan and stays bounded") {
    Caches.invalidate()
    val n0 = Caches.trackedCount
    // building the same query repeatedly must not grow the registry
    (1 to 5).foreach { _ =>
      SimilarityOps.embeddingNeardupPairs(spark, "/root/testdata/sf0.001")
    }
    val n1 = Caches.trackedCount
    assert(n1 - n0 <= 2, s"registry grew from $n0 to $n1 across identical rebuilds")
    Caches.invalidate()
  }
}
