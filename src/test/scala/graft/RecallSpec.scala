package graft

import org.apache.spark.sql.functions._
import graft.ops.{DedupOps, SimilarityOps, TextOps}

/** Candidate-generation RECALL guards: the LSH passes (MinHash banding for
  * q32, random-hyperplane banding for q42) are approximations whose
  * divergence bound is documented in their Scaladoc; these tests pin the
  * MEASURED ground truth — on the test corpus the candidate sets recall
  * every qualifying pair, so the oracle-hash-matched outputs are not
  * "accidentally equal" but exhaustively equal. A banding-parameter change
  * that silently costs recall fails here, not in a downstream
  * hash-mismatch three rounds later.
  *
  * Ground truth is computed DRIVER-SIDE by brute force (sf0.001: 500 docs
  * → 124 750 pairs — trivial in memory). That is the point: the spec's
  * oracle is a different EXECUTION PATH (plain Scala loops), not another
  * Spark plan that could share a bug with the implementation.
  */
class RecallSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("q32 MinHash-LSH candidates recall every Jaccard>=0.8 shingle pair (brute force)") {
    val docs = graft.ops.Tables
      .documents(spark, sfDir)
      .select(col("doc_id"), DedupOps.shingles(TextOps.tokens(col("text"))).as("s"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toSet))
    val exact = (for {
      i <- docs.indices.iterator
      j <- (i + 1) until docs.length
      (ida, sa) = docs(i)
      (idb, sb) = docs(j)
      if sa.nonEmpty || sb.nonEmpty
      inter = sa.intersect(sb).size.toDouble
      union = (sa.size + sb.size - inter)
      if union > 0 && inter / union >= 0.8
    } yield {
      val (lo, hi) = if (ida < idb) (ida, idb) else (idb, ida)
      (lo, hi)
    }).toSet
    val lsh = DedupOps
      .lshPairs(spark, sfDir, 0.8)
      .select(col("doc_a"), col("doc_b"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    // lshPairs verifies candidates with EXACT Jaccard, so emitted ⊆ exact;
    // recall is the substantive direction: exact ⊆ candidates-that-survived
    assert(exact == lsh, s"missed=${exact -- lsh} spurious=${lsh -- exact}")
    assert(exact.nonEmpty, "corpus has no qualifying pairs — recall test is vacuous")
  }

  test("q130 prefix-filter join is exhaustively exact and prunes vs share-any-gram (brute force)") {
    // Unlike the LSH passes, prefix filtering is exact BY THEOREM (see
    // DedupOps.prefixCandidates) — this pins the implementation of the
    // theorem (global-order construction, integer prefix length) against
    // an independent execution path, plus the pruning claim that justifies
    // the extra shuffle.
    val docs = graft.ops.Tables
      .documents(spark, sfDir)
      .select(col("doc_id"), DedupOps.ngrams(TextOps.tokens(col("text")), 5).as("s"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toSet))
    val exact = (for {
      i <- docs.indices.iterator
      j <- (i + 1) until docs.length
      (ida, sa) = docs(i)
      (idb, sb) = docs(j)
      inter = sa.intersect(sb).size.toDouble
      union = sa.size + sb.size - inter
      // mirror the pipeline's round-to-4-then-compare gate
      if union > 0 &&
        BigDecimal(inter / union).setScale(4, BigDecimal.RoundingMode.HALF_UP) >= BigDecimal("0.5")
    } yield (math.min(ida, idb), math.max(ida, idb))).toSet
    val emitted = graft.ops.QueryRegistry
      .byName("q130_prefix_join")
      .fn(spark, sfDir)
      .select(col("doc_a"), col("doc_b"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(exact == emitted, s"missed=${exact -- emitted} spurious=${emitted -- exact}")
    assert(exact.nonEmpty, "corpus has no qualifying pairs — exactness test is vacuous")

    val prefixCand = DedupOps.prefixCandidates(spark, sfDir).count()
    val anyGramCand = {
      val ex = graft.ops.Tables
        .documents(spark, sfDir)
        .select(col("doc_id"), explode(DedupOps.ngrams(TextOps.tokens(col("text")), 5)).as("g"))
      ex.as("a")
        .join(ex.as("b"), col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id"))
        .distinct()
        .count()
    }
    assert(
      prefixCand < anyGramCand,
      s"prefix filter proposed $prefixCand candidates vs $anyGramCand share-any-gram — no pruning"
    )
  }

  test("q42 hyperplane-LSH candidates recall every cosine>=0.45 embedding pair (brute force)") {
    val vecs = graft.ops.Tables
      .embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val exact = (for {
      i <- vecs.indices.iterator
      j <- (i + 1) until vecs.length
      (ida, va) = vecs(i)
      (idb, vb) = vecs(j)
      cos = dot(va, vb) / (math.sqrt(dot(va, va)) * math.sqrt(dot(vb, vb)))
      // the q42 gate rounds to 6 decimals BEFORE comparing — mirror it so
      // a pair sitting exactly on the boundary agrees with the pipeline
      if BigDecimal(cos).setScale(6, BigDecimal.RoundingMode.HALF_UP) >= BigDecimal("0.45")
    } yield {
      val (lo, hi) = if (ida < idb) (ida, idb) else (idb, ida)
      (lo, hi)
    }).toSet
    val lsh = SimilarityOps
      // the oracle geometry is what q42 pins — this test proves exactly
      // that configuration recalls every qualifying pair
      .embeddingNeardupPairs(spark, sfDir, Some(SimilarityOps.OracleGeometry))
      .select(col("vec_a"), col("vec_b"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(exact == lsh, s"missed=${exact -- lsh} spurious=${lsh -- exact}")
    assert(exact.nonEmpty, "corpus has no qualifying pairs — recall test is vacuous")
  }
}
