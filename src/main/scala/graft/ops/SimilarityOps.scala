package graft.ops

import java.security.MessageDigest
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (SURVEY.md §2.9 E14):
  * brute-force cosine top-k as the correctness baseline, and a
  * random-hyperplane LSH bucketing as the scale path (bucket equi-join
  * instead of the O(n·m) cross join).
  *
  * Scale design: at 100 TB the query side is broadcast (queries ≪ corpus)
  * so the brute-force scan is a map-only pass — no shuffle of the corpus;
  * the LSH variant turns ANN into a shuffle-join keyed by bucket, trading
  * recall for a ~2^bits reduction in compared pairs.
  *
  * All arithmetic is double-precision with deterministic left-to-right
  * folds so the DuckDB oracle (sequential list_sum/list_dot_product over
  * double lists) reproduces the values bit-for-bit before rounding.
  */
object SimilarityOps {

  import Tables._

  /** Element-wise dot product — the native codegen expression
    * (graft.functions.DotProduct). Same sequential fold as the
    * `aggregate(zip_with(...))` HOF formulation and DuckDB's
    * list_dot_product, so values are bit-identical; ~10× faster because it
    * stays inside whole-stage codegen.
    */
  def dot(a: Column, b: Column): Column = graft.functions.VectorFunctions.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def emb(c: Column): Column = c.cast("array<double>")

  // ---- Random-hyperplane LSH ------------------------------------------
  // Plane coefficients are md5-derived so both engines can re-derive them:
  // coef(p, j) = hex_to_int(md5("p,j")[0,8)) / 2^31 - 1  ∈ [-1, 1).
  // The Spark side bakes them in as literal arrays (computed once on the
  // driver — no per-row hashing at scale); the oracle recomputes per row.

  val NumPlanes = 8
  val Dim = 64

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  def planeCoef(p: Int, j: Int): Double =
    java.lang.Long.parseLong(md5Hex(s"$p,$j").substring(0, 8), 16).toDouble / (1L << 31) - 1.0

  def planes: Seq[Array[Double]] =
    (0 until NumPlanes).map(p => Array.tabulate(Dim)(j => planeCoef(p, j)))

  // ---- Banded LSH for the near-dup candidate pass ----------------------
  // 320 bands × 8 sign bits (2560 hyperplanes) — the ORACLE geometry,
  // pinned at the q42/q47 call sites; the runtime default is size-derived
  // (see derivedGeometry below). Banding trades one long
  // signature (high precision, low recall) for many short ones: a pair is a
  // candidate if it agrees on ALL bits of ANY band.
  //
  // Band WIDTH is the selectivity lever: 4-bit bands give only 16 buckets
  // per band, so every band bucket holds ~n/16 vectors and the candidate
  // multiset grows as bands·n²/32 — measured 12.4M collision rows at
  // sf0.1 (n=2000) to verify just 144 true pairs. 8-bit bands (256
  // buckets) cut that quadratic term 16× per band; with 320 bands the
  // measured multiset is 3.0M (4.2× smaller) with MORE recall headroom.
  //
  // Recall margin (the divergence bound vs the exact all-pairs oracle): at
  // the q42 gate threshold (cosine ≥ 0.45, per-plane agreement
  // p = 1 − arccos(0.45)/π ≈ 0.6486) the per-band hit rate is p⁸ ≈ 0.031
  // and the per-pair miss probability (1 − p⁸)³²⁰ ≈ 3.7e-5 — and that is
  // the worst case, for a pair sitting exactly ON the threshold; this
  // corpus's qualifying pairs span cosine 0.45–0.60. Measured recall on
  // the deterministic md5-derived planes is 100% at sf0.001, sf0.01 and
  // sf0.1 (empirically re-verified for these exact parameters). At
  // production near-dup thresholds (≥ 0.85, p ≥ 0.82; per-band hit
  // p⁸ ≈ 0.21) a fraction of the bands already saturate recall while
  // pruning far harder — the band count is sized for this corpus's
  // unusually low 0.45 gate.

  val BandBits = 8
  val NumBands = 320

  /** Flattened row-major plane matrix for the native signs expression.
    * Memoized: planeCoef is an MD5 per coefficient, and the banded config
    * needs NumBands×BandBits×Dim of them (~164k hashes ≈ 1 s of driver
    * time) — paying that once per JVM instead of once per query build
    * also means every expression instance shares ONE coefficient Seq.
    */
  private val planeCache = new java.util.concurrent.ConcurrentHashMap[Int, Seq[Double]]()
  private def flatPlanes(numPlanes: Int): Seq[Double] =
    planeCache.computeIfAbsent(
      numPlanes,
      n => (0 until n).flatMap(p => (0 until Dim).map(j => planeCoef(p, j)))
    )

  /** All sign bits against the first n hyperplanes as one '1'/'0' string —
    * a single codegen'd expression (graft.functions.HyperplaneSigns).
    */
  def signBits(embedding: Column, numPlanes: Int): Column =
    graft.functions.VectorFunctions.hyperplaneSigns(embedding, flatPlanes(numPlanes), Dim)

  /** LSH bucket id: one sign bit per hyperplane, as a bit string. */
  def bucketExpr(embedding: Column): Column = signBits(embedding, NumPlanes)

  /** DuckDB: hex→int via digit positions (no hex-cast dependence). */
  private def sqlHexToInt(h: String): String =
    (1 to 8)
      .map(i => s"(strpos('0123456789abcdef', substr($h, $i, 1)) - 1) * ${math.pow(16, 8 - i).toLong}")
      .mkString("(", " + ", ")")

  private val sqlEmbD = "list_transform(embedding, x -> CAST(x AS DOUBLE))"

  private def sqlBucket(embCol: String): String =
    (0 until NumPlanes).map { p =>
      val coef = s"CAST(${sqlHexToInt(s"md5(CAST($p AS VARCHAR) || ',' || CAST(i - 1 AS VARCHAR))")} AS DOUBLE) / 2147483648.0 - 1.0"
      s"""CASE WHEN list_sum(list_transform(range(1, ${Dim + 1}),
         |  i -> ($coef) * $embCol[i])) >= 0 THEN '1' ELSE '0' END""".stripMargin
    }.mkString(" || ")

  /** LSH-bucketed 1-NN graph (q127's candidate discipline, shared with
    * q203's hubness audit): per vector, the highest-cosine neighbor
    * within its hyperplane bucket, ties to the lowest id. Pair volume is
    * Σ per-bucket n² — never the corpus cross product — and the argmax is
    * one map-side-combinable max_by, no window.
    */
  def annGraphNN(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
      .select(col("vec_id"), emb(col("embedding")).as("v"))
      .withColumn("bucket", bucketExpr(col("v")))
      .withColumn("nv", norm(col("v")))
    val a = e.select(col("bucket"), col("vec_id"), col("v"), col("nv"))
    val b = e.select(
      col("bucket"),
      col("vec_id").as("nn_id"),
      col("v").as("vb"),
      col("nv").as("nb")
    )
    a.join(b, Seq("bucket"))
      .filter(col("vec_id") =!= col("nn_id"))
      .select(
        col("vec_id"),
        col("nn_id"),
        round(dot(col("v"), col("vb")) / (col("nv") * col("nb")), 6).as("cosine")
      )
      .groupBy(col("vec_id"))
      .agg(
        max_by(
          struct(col("nn_id"), col("cosine")),
          struct(col("cosine"), negate(col("nn_id")))
        ).as("best")
      )
      .select(col("vec_id"), col("best.nn_id").as("nn_id"), col("best.cosine").as("cosine"))
  }

  /** Packed sign signature (array<long>, 64 planes per word) for the
    * banded candidate pass — one codegen'd evaluation of all
    * NumBands×BandBits planes per row.
    */
  def packedSig(embedding: Column): Column = packedSig(embedding, NumBands * BandBits)

  def packedSig(embedding: Column, numPlanes: Int): Column =
    graft.functions.VectorFunctions.hyperplaneSignsPacked(
      embedding,
      flatPlanes(numPlanes),
      Dim
    )

  /** Band-geometry resolution, in precedence order:
    *
    *  1. an EXPLICIT geometry at the call site (the q42/q47 oracle gate
    *     pins `OracleGeometry` — correctness queries must not change
    *     answers under session tuning);
    *  2. the session confs (`spark.graft.embeddingLsh.numBands`/`.bandBits`)
    *     when BOTH are set;
    *  3. a SIZE-DERIVED default (`derivedGeometry`) from a metadata-only
    *     count of the corpus.
    *
    * Why the default is size-derived: the random-collision multiset the
    * candidate join shuffles grows as `numBands × n² / 2^bandBits`, so any
    * FIXED geometry turns superlinear as the corpus grows — the old
    * 320×8-bit default (exact-recall tuning for the 0.45 oracle gate) was
    * measured ≈ n² by ScaleStress (3× vectors → 6× wall). Width is the
    * scale knob, count is the recall knob: `derivedGeometry` picks the
    * narrowest band width whose expected random multiset stays ≈ c·n,
    * then sizes the band count so a true near-dup pair (cosine ≥ 0.9,
    * per-plane agreement p ≈ 0.856) is missed with probability ≤ 1e-3.
    */
  val BandBitsKey = "spark.graft.embeddingLsh.bandBits"
  val NumBandsKey = "spark.graft.embeddingLsh.numBands"

  /** Exact-recall geometry for the 0.45 oracle gate (320 bands × 8 bits):
    * per-band hit p⁸ ≈ 0.031 at the threshold, per-pair miss
    * (1 − p⁸)³²⁰ ≈ 3.7e-5 — measured 100% recall at sf0.001/0.01/0.1.
    * Quadratic-prone by design (the multiset term above); only oracle
    * call sites and small corpora should pin it.
    */
  val OracleGeometry: (Int, Int) = (NumBands, BandBits)

  /** Production recall target for the size-derived default: pairs at
    * cosine ≥ 0.9 (the near-dup regime — per-plane agreement
    * p = 1 − arccos(0.9)/π ≈ 0.856) are missed with probability ≤ 1e-3.
    */
  private val DerivedRecallPlaneP = 1.0 - math.acos(0.9) / math.Pi
  private val DerivedMissTarget = 1e-3

  /** Target random-collision multiset ≈ DerivedMultisetC × n rows. */
  private val DerivedMultisetC = 128.0

  /** Size-derived band geometry: the smallest band width whose expected
    * random-collision multiset `bands(bits) · n² / 2^bits` stays ≤ c·n,
    * where `bands(bits)` is the minimal band count holding the
    * ≥ 0.9-cosine miss probability under `DerivedMissTarget`
    * ((1 − p^bits)^bands ≤ target). Monotone in n: bigger corpora get
    * wider bands.
    *
    * Widths are restricted to {8, 16}: the packed-signature band extract
    * (BandKeys) slices whole 64-bit words, so a width must divide 64, and
    * 32-bit bands are out of reach — holding the ≥ 0.9 miss target at
    * p^32 ≈ 0.0067 needs ~10³ bands AND the `(band << bits) | nib` int
    * key encoding has no headroom left. Consequence, stated honestly:
    * past n ≈ c·2^16/bands ≈ 10⁵ vectors the width caps at 16 and the
    * multiset grows as bands·n²/65536 — ~10⁹ candidate rows at n = 10⁶
    * (a shuffle a cluster absorbs; a single node feels it). Corpora
    * beyond that should coarse-partition first (the q46 IVF path: cluster
    * assignment, then LSH within cells) rather than stretch one flat
    * band table across 10⁷+ vectors.
    */
  private[graft] def derivedGeometry(n: Long): (Int, Int) = {
    def bandsFor(bits: Int): Int = {
      val hit = math.pow(DerivedRecallPlaneP, bits)
      val minBands = math.max(8, math.ceil(math.log(DerivedMissTarget) / math.log1p(-hit)).toInt)
      // round UP to fill whole 64-bit signature words: a partially-padded
      // word's zero bits are identical for EVERY vector, so a band built
      // on padding is one universal collision bucket — the 30× stress
      // measured 65 s vs 4 s for 79 vs 80 bands at 16 bits before this
      val perWord = 64 / bits
      ((minBands + perWord - 1) / perWord) * perWord
    }
    val bits = Seq(8, 16)
      .find { b =>
        bandsFor(b).toDouble * math.max(n, 1L) / math.pow(2.0, b) <= DerivedMultisetC
      }
      .getOrElse(16)
    (bandsFor(bits), bits)
  }

  /** Memoized metadata-only corpus count per table dir (parquet count()
    * reads footers, not rows). The memo key includes the table
    * directory's modification stamp, so a corpus that is appended to or
    * rewritten in-place in a long-lived session derives FRESH geometry —
    * a stale count would silently keep a narrow band width while n
    * grows, the quadratic cliff the derived default exists to prevent.
    * Bounded: cleared past 256 entries (repeated rewrites of one dir).
    */
  private val corpusCounts = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private[graft] def corpusCount(s: SparkSession, dir: String): Long = {
    // Resolve the stamp through the Hadoop FileSystem API, not
    // java.io.File: lastModified() on a non-local URI (hdfs://, s3a://)
    // returns 0, so every rewrite would share one stale memo entry — the
    // quadratic cliff this memo's invalidation exists to prevent. The key
    // also folds in file count + total bytes from one getContentSummary
    // metadata call, so a same-second in-place rewrite (mtime granularity
    // is 1 s on some filesystems) still misses the memo when content
    // actually changed. Stamp failures (path not yet written) fall through
    // to a never-matching key, i.e. a fresh count.
    val stamp =
      try {
        val p = new org.apache.hadoop.fs.Path(s"$dir/embeddings.parquet")
        val fs = p.getFileSystem(s.sessionState.newHadoopConf())
        val cs = fs.getContentSummary(p)
        s"${fs.getFileStatus(p).getModificationTime}:${cs.getFileCount}:${cs.getLength}"
      } catch { case _: java.io.IOException => s"unstat-${System.nanoTime()}" }
    if (corpusCounts.size > 256) corpusCounts.clear()
    corpusCounts.computeIfAbsent(s"$dir@$stamp", _ => embeddings(s, dir).count())
  }

  private def confInt(s: SparkSession, key: String): Option[Int] =
    s.conf.getOption(key).map { raw =>
      try raw.toInt
      catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"$key must be an integer, got '$raw'")
      }
    }

  private def bandGeometry(s: SparkSession, dir: String): (Int, Int) = {
    val conf = (confInt(s, NumBandsKey), confInt(s, BandBitsKey)) match {
      case (Some(bands), Some(bits)) => Some((bands, bits))
      case (None, None)              => None
      case (bands, bits) =>
        throw new IllegalArgumentException(
          s"$NumBandsKey and $BandBitsKey must be set together " +
            s"(got numBands=${bands.getOrElse("unset")}, bandBits=${bits.getOrElse("unset")})")
    }
    val (bands, bits) = conf.getOrElse(derivedGeometry(corpusCount(s, dir)))
    require(bands > 0 && bits > 0 && bits <= 28,
      s"$NumBandsKey/$BandBitsKey must be positive (bits <= 28), got $bands/$bits")
    // the packed band extract slices whole 64-bit signature words —
    // validate here so a bad conf names its keys instead of surfacing
    // from BandKeys mid-plan
    require(64 % bits == 0,
      s"$BandBitsKey must divide 64 (bands never straddle signature words), got $bits")
    (bands, bits)
  }

  /** Verified high-similarity pairs (cosine ≥ 0.45), unordered — the
    * banded-LSH candidate pipeline shared by q42 (pair listing) and q47
    * (kept-set). The (vec, norm) projection is persisted — candidate
    * generation and both verify legs read one materialized pass of the
    * parquet scan, and the plan cache shares it across queries.
    *
    * Candidate generation is an equi-join on small int band keys. Each
    * `BandKeys` element already encodes its band index (`(band <<
    * bandBits) | bits`), so posting rows are the narrowest possible —
    * (vec_id, bk), 12 bytes — and nothing else travels through the
    * posting shuffle. A pair colliding on k bands emits k join rows; the
    * `distinct()` that collapses them shuffles only (vec_a, vec_b) long
    * pairs WITH map-side partial aggregation, and it runs BEFORE the
    * verify joins, so the exact-cosine legs each touch every unique
    * candidate exactly once. (An earlier design instead carried the full
    * packed signature on both posting legs and filtered
    * `FirstEqualBand(sigA, sigB) === band` inside the join for
    * exactly-once emission — measured slower: the signature payload per
    * posting costs more than a narrow pair dedup, and the collision
    * multiset, not the dedup, is the true scale term. The multiset is
    * controlled by band WIDTH — see the BandBits comment above.) No
    * corpus broadcast and no nested-loop join anywhere in the plan.
    */
  def embeddingNeardupPairs(s: SparkSession, d: String): DataFrame =
    embeddingNeardupPairs(s, d, geometry = None)

  /** As above with the band geometry pinned at the call site — `geometry`
    * beats the session confs beats the size-derived default. The oracle
    * queries pin `OracleGeometry` so their answers never move under
    * session tuning; everything else should pass None and let the
    * size-derived default keep the candidate join linear.
    */
  def embeddingNeardupPairs(
      s: SparkSession,
      d: String,
      geometry: Option[(Int, Int)]
  ): DataFrame = Caches.buildScope("embedding_neardup_pairs") {
    // The narrow (id, vec, norm) projection is hash-repartitioned before
    // caching: the 2560-plane signature evaluation downstream is the
    // pipeline's compute-heavy map stage, and a small corpus can arrive
    // as a single input split (one task = one core for the whole sign
    // pass). The shuffle moves only this 3-column projection, once, into
    // a cache that three consumers (candidate gen + both verify legs)
    // read; at 100 TB the scan already has thousands of splits and the
    // repartition simply keeps the cached layout balanced.
    // Only the POSTINGS are persisted — 320 narrow (vec_id, bk) rows per
    // vector is ~12 bytes each, so the cache costs a few MB per million
    // vectors and buys the 2560-plane signature evaluation exactly ONCE
    // (both collision-join legs read the materialized postings). The
    // (vec, norm) projection deliberately is NOT cached: the verify legs
    // below re-scan the 2-column parquet projection instead, because an
    // extra cache means an extra materialization barrier (a whole
    // scheduling + codegen round trip per query-stage dominates this
    // pipeline's cold time — the per-row work is trivial), and the two
    // verify legs are built STRUCTURALLY IDENTICAL so Catalyst's
    // ReuseExchange collapses them into one shared broadcast build.
    val (bands, bits) = geometry.getOrElse(bandGeometry(s, d))
    // every geometry path (explicit, conf, derived) must fill whole
    // signature words: padded sign bits are 0 for EVERY vector, so a band
    // overlapping the padding becomes one universal collision bucket —
    // a silent quadratic cliff, not a correctness bug (verification is
    // exact), which is why it fails loud here instead
    require(bands * bits % 64 == 0,
      s"band geometry ${bands}x$bits leaves a partially-padded signature word " +
        s"(bands x bits must be a multiple of 64); a padding band collides every vector")
    val posts = Caches.persisted(
      embeddings(s, d)
        .select(col("vec_id"), emb(col("embedding")).as("v"))
        // a small corpus can arrive as ONE parquet split; spreading rows
        // before the sign pass keeps the compute-heavy map stage on all
        // cores (at 100 TB the scan already has thousands of splits and
        // this keeps the cached layout balanced)
        .repartition(col("vec_id"))
        .select(
          col("vec_id"),
          explode(
            graft.functions.VectorFunctions.bandKeys(packedSig(col("v"), bands * bits), bits)
          ).as("bk")
        )
    )
    val cand = posts.as("a")
      .join(posts.as("b"), col("a.bk") === col("b.bk") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
    // Verify the collision MULTISET directly and dedup only the
    // survivors. A pair colliding on k bands is verified k times, but the
    // verify legs are map-side lookups against the (tiny relative to the
    // multiset) per-vector table — Catalyst broadcasts them here, AQE
    // picks SMJ at scale — and the duplicate-pair distinct() this
    // replaces was the pipeline's widest shuffle: at a low gate threshold
    // the candidate set degenerates toward all-pairs (measured at sf0.1:
    // 1.38M distinct candidates from a 3.0M multiset = 69% of ALL pairs),
    // so deduping BEFORE verification shuffles ~half the pair space while
    // deduping AFTER shuffles only verified survivors × band
    // multiplicity (~10-20× smaller than the candidate set even at
    // production thresholds, where collisions ≈ true pairs).
    val ref = embeddings(s, d)
      .select(col("vec_id"), emb(col("embedding")).as("v"))
      .withColumn("nv", norm(col("v")))
    cand
      .join(ref.as("ea"), col("vec_a") === col("ea.vec_id"))
      .join(ref.as("eb"), col("vec_b") === col("eb.vec_id"))
      .select(
        col("vec_a"),
        col("vec_b"),
        round(dot(col("ea.v"), col("eb.v")) / (col("ea.nv") * col("eb.nv")), 6).as("cosine")
      )
      .filter(col("cosine") >= 0.45)
      .distinct()
      // the verified pairs are tiny; persisting them lets q47 skip the
      // whole candidate join instead of just its cached inputs
      .transform(Caches.persisted)
  }

  /** Exact all-pairs oracle CTE ending in `pairs(vec_a, vec_b, cosine)`. */
  private val sqlNeardupCte: String =
    s"""WITH e AS (SELECT vec_id, $sqlEmbD AS v FROM embeddings),
       |pairs AS (
       |  SELECT vec_a, vec_b, cosine FROM (
       |    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |      round(list_dot_product(a.v, b.v)
       |        / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
       |    FROM e a JOIN e b ON a.vec_id < b.vec_id) t
       |  WHERE cosine >= 0.45)""".stripMargin

  val queries: Seq[Q] = Seq(

    // Hard-negative mining: for each anchor vector, the nearest neighbors
    // with a DIFFERENT label — the contrastive-training sample selector
    // (a semantically-close wrong-label example teaches the boundary;
    // a random negative teaches nothing). q90's exact quantized-dot
    // discipline (int64, no float summation-order caveats) with the label
    // disequality pushed into the broadcast join, so only wrong-label
    // pairs are ever scored; 5 anchors broadcast against the corpus (the
    // whitelisted scalar-BNLJ shape), top-3 per anchor.
    Q(
      "q184_hard_negatives",
      (s, d) => {
        val e = embeddings(s, d).select(col("vec_id"), emb(col("embedding")).as("v"), col("label"))
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("v").as("qv"), col("label").as("q_label"))
        val scored = e.join(broadcast(q), col("label") =!= col("q_label"))
          .select(
            col("query_id"),
            col("q_label"),
            col("vec_id").as("neighbor_id"),
            col("label").as("n_label"),
            graft.functions.VectorFunctions.quantizedDot(col("qv"), col("v"), 64).as("qscore")
          )
        val w = Window.partitionBy(col("query_id")).orderBy(col("qscore").desc, col("neighbor_id"))
        scored
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 3)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH e AS (SELECT vec_id, $sqlEmbD AS v, label FROM embeddings),
              |q AS (SELECT vec_id AS query_id, v AS qv, label AS q_label
              |      FROM e WHERE vec_id < 5),
              |scored AS (
              |  SELECT query_id, q_label, e.vec_id AS neighbor_id, e.label AS n_label,
              |    CAST(list_sum(list_transform(range(1, ${Dim + 1}),
              |      i -> CAST(floor(qv[i] * 64) AS BIGINT)
              |         * CAST(floor(v[i] * 64) AS BIGINT))) AS BIGINT) AS qscore
              |  FROM e CROSS JOIN q WHERE e.label <> q.q_label)
              |SELECT query_id, q_label, neighbor_id, n_label, qscore, rank FROM (
              |  SELECT *, row_number() OVER (PARTITION BY query_id
              |             ORDER BY qscore DESC, neighbor_id) AS rank
              |  FROM scored) t
              |WHERE rank <= 3
              |ORDER BY query_id, rank""".stripMargin)
    ),
    // Brute-force cosine top-k (the exact baseline): 5 query vectors
    // against the whole corpus; ranking on the rounded value keeps the
    // ordering engine-independent.
    Q(
      "q40_cosine_topk",
      (s, d) => {
        // Norms are computed once per row BEFORE the join (identical doubles
        // to computing them per pair — same inputs, same fold — but O(n)
        // instead of O(n·q) square roots).
        val e = embeddings(s, d)
          .select(col("vec_id"), emb(col("embedding")).as("v"))
          .withColumn("nv", norm(col("v")))
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nv").as("nq"))
        val scored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
          .select(
            col("query_id"),
            col("vec_id").as("neighbor_id"),
            round(dot(col("qv"), col("v")) / (col("nq") * col("nv")), 6).as("cosine")
          )
        val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
        scored
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 5)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH e AS (SELECT vec_id, $sqlEmbD AS v FROM embeddings),
              |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
              |scored AS (
              |  SELECT query_id, e.vec_id AS neighbor_id,
              |    round(list_dot_product(qv, v)
              |      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6) AS cosine
              |  FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id)
              |SELECT query_id, neighbor_id, cosine, rank FROM (
              |  SELECT *, row_number() OVER (PARTITION BY query_id
              |             ORDER BY cosine DESC, neighbor_id) AS rank
              |  FROM scored) t
              |WHERE rank <= 5
              |ORDER BY query_id, rank""".stripMargin)
    ),

    // Vector norm statistics per label.
    Q(
      "q41_embedding_norms",
      (s, d) =>
        embeddings(s, d)
          .select(col("label"), norm(emb(col("embedding"))).as("nrm"))
          .groupBy(col("label"))
          .agg(
            count(lit(1)).as("cnt"),
            round(avg(col("nrm")), 4).as("avg_norm"),
            round(min(col("nrm")), 4).as("min_norm"),
            round(max(col("nrm")), 4).as("max_norm")
          )
          .orderBy(col("label")),
      Some(s"""SELECT label, count(*) AS cnt,
              |  round(avg(nrm), 4) AS avg_norm,
              |  round(min(nrm), 4) AS min_norm,
              |  round(max(nrm), 4) AS max_norm
              |FROM (SELECT label, sqrt(list_dot_product($sqlEmbD, $sqlEmbD)) AS nrm
              |      FROM embeddings) t
              |GROUP BY label
              |ORDER BY label""".stripMargin)
    ),

    // Embedding high-similarity pairs: cosine ≥ 0.45, found by banded-LSH
    // candidate generation (explode packed band keys → narrow-posting
    // shuffle equi-join → map-side-combined pair dedup) + exact cosine
    // verification on the candidates. No corpus broadcast and no
    // nested-loop join anywhere in the plan — the two ways the naive
    // all-pairs form dies at 100 TB. The (vec, norm) projection is
    // persisted so candidate generation and both verify legs read one
    // materialized pass of the parquet scan instead of three.
    // Recall: 100% measured at all three SFs, with a ~3.7e-5 worst-case
    // per-pair miss bound (see the banding constants above); the oracle
    // stays the exact all-pairs SQL, so any missed pair fails the gate.
    // 0.45 because the synthetic corpus has no planted vector dups — max
    // pairwise cosine is ~0.51, so this keeps the result non-trivial.
    Q(
      "q42_embedding_neardup",
      (s, d) =>
        // geometry PINNED: the exact all-pairs oracle demands 100% recall
        // at the 0.45 gate, which only the wide 320×8 banding guarantees —
        // session tuning must not move a correctness query's answer
        embeddingNeardupPairs(s, d, Some(OracleGeometry)).orderBy(col("vec_a"), col("vec_b")),
      Some(s"""$sqlNeardupCte
              |SELECT vec_a, vec_b, cosine FROM pairs
              |ORDER BY vec_a, vec_b""".stripMargin)
    ),

    // End-to-end embedding dedup: vectors surviving near-dup removal (drop
    // the higher vec_id of every verified pair), per label — the vector-
    // side twin of q34's document kept-set; shares q42's persisted
    // candidate pipeline via the plan cache.
    Q(
      "q47_embedding_kept",
      (s, d) => {
        val dropIds = embeddingNeardupPairs(s, d, Some(OracleGeometry))
          .select(col("vec_b").as("vec_id")).distinct()
        embeddings(s, d)
          .join(dropIds, Seq("vec_id"), "left_anti")
          .groupBy(col("label"))
          .agg(count(lit(1)).as("kept"))
          .orderBy(col("label"))
      },
      Some(s"""$sqlNeardupCte
              |SELECT label, count(*) AS kept
              |FROM embeddings
              |WHERE vec_id NOT IN (SELECT vec_b FROM pairs)
              |GROUP BY label
              |ORDER BY label""".stripMargin)
    ),

    // LSH bucket histogram: sign bits against 8 md5-derived hyperplanes.
    Q(
      "q43_lsh_buckets",
      (s, d) =>
        embeddings(s, d)
          .select(bucketExpr(emb(col("embedding"))).as("bucket"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("bucket")),
      Some(s"""SELECT bucket, count(*) AS cnt
              |FROM (SELECT ${sqlBucket("v")} AS bucket
              |      FROM (SELECT $sqlEmbD AS v FROM embeddings) e) t
              |GROUP BY bucket
              |ORDER BY bucket""".stripMargin)
    ),

    // Hybrid search: metadata/text filter + vector ranking in one plan —
    // the retrieval shape of a training-data curation pipeline (filter by
    // lang, rank by cosine to a query vector). doc_id joins vec_id 1:1.
    Q(
      "q45_hybrid_search",
      (s, d) => {
        val e = embeddings(s, d)
          .select(col("vec_id"), emb(col("embedding")).as("v"))
          .withColumn("nv", norm(col("v")))
        val docs = documents(s, d)
          .filter(col("lang") === "en")
          .select(col("doc_id"), col("source"))
        val qv = e.filter(col("vec_id") === 0)
          .select(col("v").as("qv"), col("nv").as("nq"))
        docs
          .join(e, col("doc_id") === col("vec_id"))
          .join(broadcast(qv))
          .filter(col("doc_id") =!= 0)
          .select(
            col("doc_id"),
            col("source"),
            round(dot(col("qv"), col("v")) / (col("nq") * col("nv")), 6).as("cosine")
          )
          .orderBy(col("cosine").desc, col("doc_id"))
          .limit(10)
      },
      Some(s"""WITH e AS (SELECT vec_id, $sqlEmbD AS v FROM embeddings),
              |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
              |SELECT doc_id, source,
              |  round(list_dot_product(qv, v)
              |    / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6) AS cosine
              |FROM documents JOIN e ON doc_id = vec_id CROSS JOIN q
              |WHERE lang = 'en' AND doc_id <> 0
              |ORDER BY cosine DESC, doc_id
              |LIMIT 10""".stripMargin)
    ),

    // IVF-style ANN: the inverted-file scale path. Corpus vectors are
    // assigned to their nearest centroid (min_by over a broadcast centroid
    // list — the standard corpus×centroids assignment pass, map-side
    // combinable); queries probe their nprobe=2 nearest centroids and rank
    // only vectors in those cells. Centroids here are 8 deterministic seed
    // vectors (vec_id < 8) — a production deployment would refine them with
    // k-means iterations of exactly this assignment pass. At 100 TB: the
    // centroid list stays driver-small, assignment is one linear pass, and
    // the probe join is an equi-join on cent_id — no all-pairs anywhere.
    Q(
      "q46_ivf_ann",
      (s, d) => {
        val e = embeddings(s, d)
          .select(col("vec_id"), emb(col("embedding")).as("v"))
          .withColumn("nv", norm(col("v")))
        val cents = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("nv").as("ncv"))
        // round(…, 6) before every argmin/row_number ordering (q90/q127
        // exactness discipline): a bitwise summation difference between
        // Spark and DuckDB near a tie would otherwise flip an assignment
        // data-dependently
        val cellCos = round(dot(col("v"), col("cv")) / (col("nv") * col("ncv")), 6)
        // nearest-centroid assignment: highest cosine, centroid id tie-break
        val assign = e.join(broadcast(cents))
          .groupBy(col("vec_id"))
          .agg(min_by(col("cent_id"), struct((-cellCos).as("nc"), col("cent_id"))).as("cent_id"))
        val q = e.filter(col("vec_id").isin(10L, 11L, 12L))
          .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nv").as("nq"))
        val wProbe = Window.partitionBy(col("query_id")).orderBy(col("pcos").desc, col("cent_id"))
        val probes = q.join(broadcast(cents))
          .select(col("query_id"), col("qv"), col("nq"), col("cent_id"),
            round(dot(col("qv"), col("cv")) / (col("nq") * col("ncv")), 6).as("pcos"))
          .withColumn("prk", row_number().over(wProbe))
          .filter(col("prk") <= 2)
          .select(col("query_id"), col("qv"), col("nq"), col("cent_id"))
        val scored = assign.join(broadcast(probes), Seq("cent_id"))
          .join(e, Seq("vec_id"))
          .filter(col("vec_id") =!= col("query_id"))
          .select(
            col("query_id"),
            col("vec_id").as("neighbor_id"),
            round(dot(col("qv"), col("v")) / (col("nq") * col("nv")), 6).as("cosine")
          )
        val wRank = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
        scored
          .withColumn("rank", row_number().over(wRank).cast("long"))
          .filter(col("rank") <= 3)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH e AS (SELECT vec_id, $sqlEmbD AS v FROM embeddings),
              |c AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < 8),
              |asg AS (SELECT vec_id, cent_id FROM (
              |  SELECT e.vec_id, c.cent_id, row_number() OVER (PARTITION BY e.vec_id
              |    ORDER BY round(list_dot_product(e.v, c.cv)
              |      / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))), 6) DESC,
              |      c.cent_id) AS rk
              |  FROM e CROSS JOIN c) t WHERE rk = 1),
              |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN (10, 11, 12)),
              |probes AS (SELECT query_id, qv, cent_id FROM (
              |  SELECT q.query_id, q.qv, c.cent_id, row_number() OVER (PARTITION BY q.query_id
              |    ORDER BY round(list_dot_product(q.qv, c.cv)
              |      / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cv, c.cv))), 6) DESC,
              |      c.cent_id) AS prk
              |  FROM q CROSS JOIN c) t WHERE prk <= 2),
              |scored AS (
              |  SELECT query_id, e.vec_id AS neighbor_id,
              |    round(list_dot_product(qv, e.v)
              |      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(e.v, e.v))), 6) AS cosine
              |  FROM probes JOIN asg USING (cent_id) JOIN e ON e.vec_id = asg.vec_id
              |  WHERE e.vec_id <> query_id)
              |SELECT query_id, neighbor_id, cosine, rank FROM (
              |  SELECT *, row_number() OVER (PARTITION BY query_id
              |             ORDER BY cosine DESC, neighbor_id) AS rank
              |  FROM scored) t
              |WHERE rank <= 3
              |ORDER BY query_id, rank""".stripMargin)
    ),

    // Bucketed ANN: same top-k query restricted to the query's LSH bucket —
    // the equi-join scale path (bucket key join instead of cross join).
    Q(
      "q44_ann_lsh_topk",
      (s, d) => {
        val e = embeddings(s, d)
          .select(col("vec_id"), emb(col("embedding")).as("v"))
          .withColumn("bucket", bucketExpr(col("v")))
          .withColumn("nv", norm(col("v")))
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("v").as("qv"), col("bucket"), col("nv").as("nq"))
        val scored = e.join(broadcast(q), Seq("bucket"))
          .filter(col("vec_id") =!= col("query_id"))
          .select(
            col("query_id"),
            col("vec_id").as("neighbor_id"),
            round(dot(col("qv"), col("v")) / (col("nq") * col("nv")), 6).as("cosine")
          )
        val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
        scored
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 3)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH e AS (SELECT vec_id, v, ${sqlBucket("v")} AS bucket
              |          FROM (SELECT vec_id, $sqlEmbD AS v FROM embeddings) e0),
              |q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM e WHERE vec_id < 5),
              |scored AS (
              |  SELECT query_id, e.vec_id AS neighbor_id,
              |    round(list_dot_product(qv, e.v)
              |      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(e.v, e.v))), 6) AS cosine
              |  FROM e JOIN q ON e.bucket = q.bucket AND e.vec_id <> q.query_id)
              |SELECT query_id, neighbor_id, cosine, rank FROM (
              |  SELECT *, row_number() OVER (PARTITION BY query_id
              |             ORDER BY cosine DESC, neighbor_id) AS rank
              |  FROM scored) t
              |WHERE rank <= 3
              |ORDER BY query_id, rank""".stripMargin)
    ),

    // K-means refinement of the IVF centroids (q46 seeds them with raw
    // vectors; production IVF runs Lloyd iterations of exactly q46's
    // assignment pass — this query IS those iterations). Two full
    // assign→update rounds from the 8 seed vectors, then a final
    // assignment, reporting cluster sizes and mean scaled distance.
    //
    // Determinism across engines is the hard part: centroid means are
    // averages of doubles, whose summation order differs between engines.
    // So the pipeline rides EXACT integer arithmetic up to the last step:
    // embeddings quantize to floor(x·1000) (identical IEEE mult + floor on
    // both engines), a centroid is its (per-dim integer sum, count) pair —
    // never divided — and |cnt·x − sum|² is an exact int64 (magnitudes
    // < 2^62: |q|≤~5e3, cnt≤corpus, 64 dims). The comparable distance to
    // the MEAN is that integer divided by cnt² — one double division of
    // two exact int64s, which IEEE-rounds identically on both engines, so
    // the argmin (tie-broken by cent_id) is still deterministic. (Skipping
    // the division would bias assignment toward small clusters: the cnt²
    // factor differs per centroid.) DuckDB folds the int sum with
    // list_reduce (BIGINT-preserving; list_sum widens to DOUBLE and would
    // lose exactness past 2^53).
    //
    // Scale shape: each iteration is one broadcast of 8 (sum, cnt) pairs +
    // a map-side min_by assignment + a (cent, dim)-keyed partial-agg sum —
    // the textbook distributed Lloyd step; nothing is ever collected.
    Q(
      "q48_kmeans_refine",
      (s, d) => {
        val e = embeddings(s, d).select(
          col("vec_id"),
          expr("transform(cast(embedding as array<double>), x -> cast(floor(x * 1000d) as bigint))")
            .as("qv")
        )
        // native codegen'd distance — HOFs are CodegenFallback and this is
        // the corpus×centroids hot path (same exact int64/IEEE algebra)
        val distExpr =
          graft.functions.VectorFunctions.scaledSqDist(col("qv"), col("csum"), col("ccnt"))
        var cents = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cent_id"), col("qv").as("csum"), lit(1L).as("ccnt"))
        for (_ <- 1 to 2) {
          val assigned = e.join(broadcast(cents))
            .withColumn("dist", distExpr)
            .groupBy(col("vec_id"))
            .agg(min_by(struct(col("cent_id"), col("qv")), struct(col("dist"), col("cent_id"))).as("m"))
            .select(col("m.cent_id").as("cent_id"), col("m.qv").as("qv"))
          cents = assigned
            .select(col("cent_id"), posexplode(col("qv")).as(Seq("dim", "x")))
            .groupBy(col("cent_id"), col("dim"))
            .agg(sum(col("x")).as("sx"), count(lit(1)).as("c"))
            .groupBy(col("cent_id"))
            .agg(
              expr("transform(array_sort(collect_list(struct(dim, sx))), p -> p.sx)").as("csum"),
              max(col("c")).as("ccnt")
            )
        }
        e.join(broadcast(cents))
          .withColumn("dist", distExpr)
          .groupBy(col("vec_id"))
          .agg(min_by(struct(col("cent_id"), col("dist")), struct(col("dist"), col("cent_id"))).as("m"))
          .select(col("m.cent_id").as("cent_id"), floor(col("m.dist")).cast("long").as("sd"))
          .groupBy(col("cent_id"))
          .agg(
            count(lit(1)).as("csize"),
            floor(sum(col("sd")).cast("double") / count(lit(1))).cast("long").as("avg_dist_scaled")
          )
          .orderBy(col("cent_id"))
      },
      Some(sqlKmeansRefine)
    ),

    // MMR (maximal marginal relevance) diversity re-rank: for each query
    // vector, take the top-10 cosine candidates, then greedily select 5
    // maximizing λ·relevance − (1−λ)·max-similarity-to-already-selected
    // (λ = 0.7) — the standard diversity pass a retrieval/curation stack
    // runs after ANN. Greedy selection is inherently sequential in k, so
    // it unrolls as 4 tiny per-query join+argmax rounds over the ALREADY
    // top-k-bounded candidate set — the O(N²) pair matrix is 10×10 per
    // query, bounded by construction, and every step is an equi-join on
    // query_id (thousands of concurrent queries would vectorize across
    // the same plan). Cross-engine determinism: rel and sim are the same
    // sequential-fold cosines both engines compute bit-identically, the
    // λ-algebra is two IEEE mults and a subtract, and every argmax
    // tie-breaks on cand_id.
    Q(
      "q49_mmr_rerank",
      (s, d) => {
        val e = embeddings(s, d)
          .select(col("vec_id"), emb(col("embedding")).as("v"))
          .withColumn("nv", norm(col("v")))
        val q = e.filter(col("vec_id").isin(10L, 11L, 12L))
          .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nv").as("nq"))
        val wTop = Window.partitionBy(col("query_id")).orderBy(col("rel").desc, col("cand_id"))
        val cands = Caches.persisted(
          e.join(broadcast(q), col("vec_id") =!= col("query_id"))
            .select(
              col("query_id"),
              col("vec_id").as("cand_id"),
              (dot(col("qv"), col("v")) / (col("nq") * col("nv"))).as("rel"),
              col("v"),
              col("nv")
            )
            .withColumn("rk", row_number().over(wTop))
            .filter(col("rk") <= 10)
            .select(col("query_id"), col("cand_id"), col("rel"), col("v"), col("nv"))
        )
        val sims = Caches.persisted(
          cands.as("x")
            .join(cands.as("y"), Seq("query_id"))
            .filter(col("x.cand_id") =!= col("y.cand_id"))
            .select(
              col("query_id"),
              col("x.cand_id").as("a_id"),
              col("y.cand_id").as("b_id"),
              (dot(col("x.v"), col("y.v")) / (col("x.nv") * col("y.nv"))).as("sim")
            )
        )
        // The greedy selection runs as ONE fold expression per query, not
        // k unrolled DataFrame rounds: the candidate set is top-k-bounded
        // (≤10 structs + a ≤90-entry sim map per query), so the sequential
        // part of MMR collapses into an `aggregate` HOF whose accumulator
        // is the selected array. A first cut unrolled 4 join+argmax rounds
        // instead — the plan embedded each prior round 3×, and analysis +
        // codegen compounded to 12 s at sf0.1 vs ~1.5 s for this shape
        // (the data work is identical and trivial either way).
        // Selection algebra (must mirror the oracle exactly): seed = max
        // (rel, -cand_id); each round appends argmax over unselected c of
        // 0.7·rel(c) − 0.3·max_{s∈selected} sim(c,s), ties to the lowest
        // cand_id via the same (-cand_id) trick.
        val clist = cands
          .groupBy(col("query_id"))
          .agg(collect_list(struct(col("cand_id"), col("rel"))).as("cl"))
        val smap = sims
          .groupBy(col("query_id"))
          .agg(
            map_from_entries(
              collect_list(struct(concat(col("a_id"), lit(":"), col("b_id")), col("sim")))
            ).as("sm")
          )
        clist
          .join(smap, Seq("query_id"))
          .select(
            col("query_id"),
            expr(
              """aggregate(
                |  sequence(2, 5),
                |  array(array_max(transform(cl,
                |    c -> struct(c.rel AS score, -c.cand_id AS tie, c.cand_id AS cand_id)))),
                |  (sel, t) -> array_append(sel,
                |    array_max(transform(
                |      filter(cl, c -> NOT exists(sel, s -> s.cand_id = c.cand_id)),
                |      c -> struct(
                |        0.7d * c.rel - 0.3d * array_max(transform(sel,
                |          s -> element_at(sm, concat(c.cand_id, ':', s.cand_id)))) AS score,
                |        -c.cand_id AS tie,
                |        c.cand_id AS cand_id)))))""".stripMargin
            ).as("sel")
          )
          .select(col("query_id"), posexplode(col("sel")).as(Seq("pos", "p")))
          .select(
            col("query_id"),
            (col("pos") + 1).cast("long").as("rank"),
            col("p.cand_id").as("vec_id"),
            round(col("p.score"), 6).as("score")
          )
          .orderBy(col("query_id"), col("rank"))
      },
      Some(sqlMmrRerank)
    ),

    // Quantized top-k: brute-force search over floor(x·64)-quantized
    // vectors (int8 range for unit-normalized embeddings) — the memory/
    // bandwidth scale path: a quantized corpus is ~4× smaller than float32
    // in scan, cache and shuffle, which is what makes a 100 TB brute-force
    // rerank tier affordable. Scoring is EXACT int64 arithmetic (native
    // expression graft.functions.QuantizedDot fuses quantization into the
    // multiply-accumulate, so quantized arrays are never materialized) —
    // no float-summation-order caveats anywhere, the ranking is
    // bit-identical across engines by construction.
    Q(
      "q90_quantized_topk",
      (s, d) => {
        val e = embeddings(s, d).select(col("vec_id"), emb(col("embedding")).as("v"))
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("v").as("qv"))
        val scored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
          .select(
            col("query_id"),
            col("vec_id").as("neighbor_id"),
            graft.functions.VectorFunctions.quantizedDot(col("qv"), col("v"), 64).as("qscore")
          )
        val w = Window.partitionBy(col("query_id")).orderBy(col("qscore").desc, col("neighbor_id"))
        scored
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 5)
          .orderBy(col("query_id"), col("rank"))
      },
      Some(s"""WITH e AS (SELECT vec_id, $sqlEmbD AS v FROM embeddings),
              |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
              |scored AS (
              |  SELECT query_id, e.vec_id AS neighbor_id,
              |    CAST(list_sum(list_transform(range(1, ${Dim + 1}),
              |      i -> CAST(floor(qv[i] * 64) AS BIGINT)
              |         * CAST(floor(v[i] * 64) AS BIGINT))) AS BIGINT) AS qscore
              |  FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id)
              |SELECT query_id, neighbor_id, qscore, rank FROM (
              |  SELECT *, row_number() OVER (PARTITION BY query_id
              |             ORDER BY qscore DESC, neighbor_id) AS rank
              |  FROM scored) t
              |WHERE rank <= 5
              |ORDER BY query_id, rank""".stripMargin)
    ),

    // Supervised centroid evaluation: per-label mean embedding (the class
    // centroid) + nearest-centroid assignment accuracy — the label-quality
    // / cluster-coherence probe a curation pipeline runs over tagged
    // embeddings. Rides q48's integer-exact centroid algebra: a centroid is
    // its (per-dim int64 sum, count) pair, never divided; the comparable
    // distance to the MEAN divides the exact int64 numerator by cnt² in
    // one IEEE double division (bit-identical across engines); argmin
    // tie-breaks on label. Scale shape: centroids are label-count-small
    // (broadcast), assignment is one map pass over the corpus with a
    // map-side-combinable min_by — no shuffle of the embedding payload.
    Q(
      "q95_label_centroids",
      (s, d) => {
        val e = embeddings(s, d).select(
          col("vec_id"),
          col("label"),
          expr("transform(cast(embedding as array<double>), x -> cast(floor(x * 1000d) as bigint))")
            .as("qv")
        )
        val cents = e
          .select(col("label").as("cent_label"), posexplode(col("qv")).as(Seq("dim", "x")))
          .groupBy(col("cent_label"), col("dim"))
          .agg(sum(col("x")).as("sx"), count(lit(1)).as("c"))
          .groupBy(col("cent_label"))
          .agg(
            expr("transform(array_sort(collect_list(struct(dim, sx))), p -> p.sx)").as("csum"),
            max(col("c")).as("ccnt")
          )
        val dist =
          graft.functions.VectorFunctions.scaledSqDist(col("qv"), col("csum"), col("ccnt"))
        e.join(broadcast(cents))
          .withColumn("dist", dist)
          .groupBy(col("vec_id"), col("label"))
          .agg(min_by(col("cent_label"), struct(col("dist"), col("cent_label"))).as("pred"))
          .groupBy(col("label"))
          .agg(
            count(lit(1)).as("n"),
            sum(when(col("label") === col("pred"), 1L).otherwise(0L)).as("correct")
          )
          .withColumn(
            "acc_bp",
            floor(col("correct").cast("double") * 10000 / col("n")).cast("long")
          )
          .orderBy(col("label"))
      },
      Some {
        val dist =
          s"(CAST(list_reduce(list_transform(range(1, ${Dim + 1}), " +
            "i -> (c.ccnt * e.qv[i] - c.csum[i]) * (c.ccnt * e.qv[i] - c.csum[i])), (acc, y) -> acc + y) AS DOUBLE)" +
            " / CAST(c.ccnt * c.ccnt AS DOUBLE))"
        s"""WITH e AS (
           |  SELECT vec_id, label,
           |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
           |  FROM embeddings),
           |c AS (
           |  SELECT cent_label, array_agg(sx ORDER BY dim) AS csum, max(cc) AS ccnt FROM (
           |    SELECT label AS cent_label, i AS dim, CAST(sum(qv[i]) AS BIGINT) AS sx, count(*) AS cc
           |    FROM e, range(1, ${Dim + 1}) r(i)
           |    GROUP BY 1, 2) t
           |  GROUP BY 1),
           |asg AS (
           |  SELECT vec_id, label, cent_label AS pred FROM (
           |    SELECT e.vec_id, e.label, c.cent_label,
           |      row_number() OVER (PARTITION BY e.vec_id ORDER BY $dist, c.cent_label) AS rk
           |    FROM e CROSS JOIN c) t
           |  WHERE rk = 1)
           |SELECT label, count(*) AS n,
           |  CAST(sum(CASE WHEN label = pred THEN 1 ELSE 0 END) AS BIGINT) AS correct,
           |  CAST(floor(CAST(sum(CASE WHEN label = pred THEN 1 ELSE 0 END) AS BIGINT) * 10000.0
           |    / count(*)) AS BIGINT) AS acc_bp
           |FROM asg
           |GROUP BY label
           |ORDER BY label""".stripMargin
      }
    ),

    // Farthest-point (k-center) seeding for k-means — the deterministic
    // alternative to random/k-means++ sampling when reproducibility is the
    // contract: start from the lowest vec_id, then repeatedly pick the
    // point whose distance to its nearest already-chosen seed is maximal
    // (ties → lowest vec_id), k=4. Complements q48 (Lloyd refinement from
    // a fixed seed set) with the seeding stage itself. Each round is one
    // corpus×seeds broadcast pass over the persisted quantized frame plus
    // a global argmax — a tree-reduced SINGLE-ROW aggregate the driver
    // reads back (k·Dim longs of metadata, the q91 offset idiom; NOT a
    // data collect), so every round's plan stays flat instead of nesting
    // the previous round's DAG — lazily chaining the rounds re-ran the
    // whole prefix per round and tripled the runtime. All distances are
    // exact int64 (ScaledSqDist with ccnt=1), so seed selection is
    // bit-identical across engines and cluster topologies — the
    // reproducible-init property that matters when a 100 TB embedding
    // partition job must be re-runnable.
    Q(
      "q108_kmeans_fp_init",
      (s, d) => {
        import s.implicits._
        val e = Caches.persisted(
          embeddings(s, d).select(
            col("vec_id"),
            expr("transform(cast(embedding as array<double>), x -> cast(floor(x * 1000d) as bigint))")
              .as("qv")
          )
        )
        val dist = graft.functions.VectorFunctions.scaledSqDist(col("qv"), col("cqv"), lit(1L))
        val first = e.orderBy(col("vec_id")).limit(1).select(col("vec_id"), col("qv")).head()
        var seeds = Vector((first.getLong(0), first.getSeq[Long](1)))
        for (_ <- 1 to 3) {
          val chosen = seeds.toDF("cent_id", "cqv")
          val next = e
            .join(broadcast(chosen.select(col("cent_id"))), col("vec_id") === col("cent_id"), "left_anti")
            .join(broadcast(chosen))
            .withColumn("dist", dist)
            .groupBy(col("vec_id"))
            .agg(min(col("dist")).as("md"), org.apache.spark.sql.functions.first(col("qv")).as("qv"))
            .agg(
              max_by(
                struct(col("vec_id").as("cent_id"), col("qv").as("cqv")),
                struct(col("md"), negate(col("vec_id")))
              ).as("m")
            )
            .select(col("m.cent_id").as("cent_id"), col("m.cqv").as("cqv"))
            .head()
          seeds = seeds :+ ((next.getLong(0), next.getSeq[Long](1)))
        }
        e.join(broadcast(seeds.toDF("cent_id", "cqv")))
          .withColumn("dist", dist)
          .groupBy(col("vec_id"))
          .agg(min_by(struct(col("cent_id"), col("dist")), struct(col("dist"), col("cent_id"))).as("m"))
          .select(col("m.cent_id").as("cent_id"), floor(col("m.dist")).cast("long").as("sd"))
          .groupBy(col("cent_id"))
          .agg(
            count(lit(1)).as("csize"),
            floor(sum(col("sd")).cast("double") / count(lit(1))).cast("long").as("avg_dist_scaled")
          )
          .orderBy(col("cent_id"))
      },
      Some(sqlKmeansFpInit)
    ),

    // Embedding dimension-health stats — the QA pass an embedding pipeline
    // runs before indexing 100 TB of vectors: per dimension, the count,
    // sum, and n·Σx²−(Σx)² variance numerator over the quantized values.
    // Dead dimensions (var_num = 0) and mean drift surface immediately,
    // and every number is exact int64 (quantized values are ≤1e3 in
    // magnitude, squares ≤1e6, summed over ≤2^32 rows — no overflow, no
    // float summation-order drift, so the oracle hash-matches without any
    // rounding convention). Plan shape: one corpus pass, posexplode to
    // (dim, x), then a 64-key aggregate — map-side partial combine
    // collapses each task to 64 rows before the only shuffle.
    Q(
      "q111_embedding_dimstats",
      (s, d) =>
        embeddings(s, d)
          .select(
            posexplode(
              expr("transform(cast(embedding as array<double>), x -> cast(floor(x * 1000d) as bigint))")
            ).as(Seq("dim0", "x"))
          )
          .select((col("dim0") + 1L).cast("long").as("dim"), col("x"))
          .groupBy(col("dim"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("x")).as("sx"),
            (count(lit(1)) * sum(col("x") * col("x")) - sum(col("x")) * sum(col("x")))
              .as("var_num")
          )
          .orderBy(col("dim")),
      Some(s"""SELECT CAST(i AS BIGINT) AS dim, count(*) AS n,
              |  CAST(sum(qv[i]) AS BIGINT) AS sx,
              |  CAST(count(*) * sum(qv[i] * qv[i]) - sum(qv[i]) * sum(qv[i]) AS BIGINT) AS var_num
              |FROM (
              |  SELECT list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
              |  FROM embeddings) e, range(1, ${Dim + 1}) r(i)
              |GROUP BY i
              |ORDER BY dim""".stripMargin)
    ),

    // SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup =
    // partition the embedding space into clusters, then search for
    // near-dups ONLY within each cluster — the pruning that makes
    // embedding-level dedup feasible at 100 TB: the quadratic pair search
    // shrinks from O(n²) over the corpus to Σ|cluster|², bounded by the
    // largest cluster (a production run caps cluster width by splitting
    // oversized cells — the same skew discipline as AQE skew-join). The
    // pair stage is an EQUI-join on cluster id (PlanSpec holds it to
    // that), so it shuffles once on a key both sides share. Deterministic
    // contract: centroids are the 4 lowest vec_ids (the reproducible-seed
    // convention of q48/q108 — production feeds q108's farthest-point
    // seeds through q48's Lloyd refinement; the dedup semantics are
    // unchanged). All scoring is exact int64 over floor(x·1000)
    // quantization — QuantizedDot fuses the quantize into the
    // multiply-accumulate, assignment distance is ‖a‖²−2a·c+‖c‖² in the
    // same algebra, and the cosine≥0.45 gate is dot>0 ∧ 400·dot² ≥
    // 81·‖a‖²·‖b‖² (0.45² = 81/400 exactly) — so cluster assignment and
    // dup verdicts are bit-identical across engines. Keep-lowest-id: a
    // vector is a dup if any same-cluster partner with smaller vec_id
    // clears the gate.
    Q(
      "q114_semdedup",
      (s, d) => {
        def qd(a: Column, b: Column): Column =
          graft.functions.VectorFunctions.quantizedDot(a, b, 1000)
        val e = Caches.persisted(
          embeddings(s, d)
            .select(col("vec_id"), emb(col("embedding")).as("v"))
            .withColumn("n2", qd(col("v"), col("v")))
        )
        val cents = e.filter(col("vec_id") < 4)
          .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("n2").as("cn2"))
        val asg = Caches.persisted(
          e.join(broadcast(cents))
            .withColumn("dist", col("n2") - lit(2L) * qd(col("v"), col("cv")) + col("cn2"))
            .groupBy(col("vec_id"))
            .agg(
              min_by(col("cent_id"), struct(col("dist"), col("cent_id"))).as("cent_id"),
              first(col("v")).as("v"),
              first(col("n2")).as("n2")
            )
        )
        val a = asg.select(col("cent_id"), col("vec_id").as("va"), col("v").as("xa"), col("n2").as("na2"))
        val b = asg.select(col("cent_id"), col("vec_id").as("vb"), col("v").as("xb"), col("n2").as("nb2"))
        val dupset = a
          .join(b, Seq("cent_id"))
          .filter(col("va") < col("vb"))
          .withColumn("dp", qd(col("xa"), col("xb")))
          .filter(
            col("dp") > 0L &&
              lit(400L) * col("dp") * col("dp") >= lit(81L) * col("na2") * col("nb2")
          )
          .select(col("cent_id"), col("vb"))
          .distinct()
        asg
          .groupBy(col("cent_id"))
          .agg(count(lit(1)).as("csize"))
          .join(dupset.groupBy(col("cent_id")).agg(count(lit(1)).as("dups")), Seq("cent_id"), "left")
          .select(
            col("cent_id"),
            col("csize"),
            coalesce(col("dups"), lit(0L)).as("dups"),
            (col("csize") - coalesce(col("dups"), lit(0L))).as("kept")
          )
          .orderBy(col("cent_id"))
      },
      Some(sqlSemdedup)
    ),

    // ANN-graph construction (the seed step of NN-descent / graph-based
    // index builds): every vector's best neighbor among its LSH
    // bucket-mates — bucket co-membership proposes, exact cosine decides.
    // Plan shape: the (vec, bucket, norm) projection is computed once per
    // side of a bucket equi-join (map work), pair volume is Σ|bucket|²
    // instead of n² (the q114 cluster-scoping argument with hash buckets
    // in place of centroids), and the per-vector argmax is ONE map-side-
    // combinable max_by aggregate — no window sort over the pair stream.
    // Vectors alone in their bucket get no edge (at scale: multi-probe
    // neighboring buckets, or a second hash family, recovers them — the
    // recall/cost dial). Tie-break on equal rounded cosine: lowest
    // neighbor id (max_by on (cosine, -nn_id)).
    Q(
      "q127_ann_graph",
      (s, d) => annGraphNN(s, d).orderBy(col("vec_id")),
      Some(s"""WITH e AS (SELECT vec_id, $sqlEmbD AS v FROM embeddings),
              |b AS (SELECT vec_id, v, ${sqlBucket("v")} AS bucket,
              |        sqrt(list_dot_product(v, v)) AS nv
              |      FROM e),
              |p AS (
              |  SELECT a.vec_id AS vec_id, c.vec_id AS nn_id,
              |    round(list_dot_product(a.v, c.v) / (a.nv * c.nv), 6) AS cosine
              |  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id <> c.vec_id)
              |SELECT vec_id, nn_id, cosine FROM (
              |  SELECT *, row_number() OVER (PARTITION BY vec_id
              |            ORDER BY cosine DESC, nn_id) AS rk
              |  FROM p) t
              |WHERE rk = 1
              |ORDER BY vec_id""".stripMargin)
    ),

    // IVF recall-vs-nprobe curve — q205's tuning artifact for the OTHER
    // index family: sweeping how many inverted lists (nearest centroid
    // cells) a query probes, report exact-top-10 recall against candidate
    // volume at nprobe = 1..4. Every candidate keeps the probe rank at
    // which its cell enters (min prk), so the tiers telescope from ONE
    // assignment pass + one probe-ranked join — the sweep never re-runs
    // assignment. Ground truth is the integer-quantized exact top-10
    // (q90's discipline). Scale shape: centroids broadcast (8 rows),
    // assignment is the one corpus-linear pass, candidates come from an
    // equi-join on cent_id.
    Q(
      "q208_ivf_recall_curve",
      (s, d) => {
        val e = embeddings(s, d)
          .select(col("vec_id"), emb(col("embedding")).as("v"))
          .withColumn("nv", norm(col("v")))
        val cents = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cent_id"), col("v").as("cv"), col("nv").as("ncv"))
        // round(…, 6) before the argmin ordering (q90/q127 exactness
        // discipline, same as q46): a bitwise summation difference near a
        // tie would otherwise flip an assignment data-dependently
        val cellCos = round(dot(col("v"), col("cv")) / (col("nv") * col("ncv")), 6)
        val assign = e.join(broadcast(cents))
          .groupBy(col("vec_id"))
          .agg(min_by(col("cent_id"), struct((-cellCos).as("nc"), col("cent_id"))).as("cent_id"))
        val q = e.filter(col("vec_id").isin(10L, 11L, 12L))
          .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nv").as("nq"))
        val wProbe = Window.partitionBy(col("query_id")).orderBy(col("pcos").desc, col("cent_id"))
        val probes = q.join(broadcast(cents))
          .select(
            col("query_id"),
            col("cent_id"),
            round(dot(col("qv"), col("cv")) / (col("nq") * col("ncv")), 6).as("pcos")
          )
          .withColumn("prk", row_number().over(wProbe).cast("long"))
          .select(col("query_id"), col("cent_id"), col("prk"))
        val truth = e
          .join(broadcast(q.select(col("query_id"), col("qv"))), col("vec_id") =!= col("query_id"))
          .select(
            col("query_id"),
            col("vec_id").as("neighbor_id"),
            graft.functions.VectorFunctions.quantizedDot(col("qv"), col("v"), 64).as("qs")
          )
          .withColumn(
            "rk",
            row_number().over(
              Window.partitionBy(col("query_id")).orderBy(col("qs").desc, col("neighbor_id"))
            )
          )
          .filter(col("rk") <= 10)
          .select(col("query_id").as("t_query"), col("neighbor_id"))
        val cand = assign
          .join(broadcast(probes), Seq("cent_id"))
          .filter(col("vec_id") =!= col("query_id"))
          .groupBy(col("query_id"), col("vec_id").as("cand_id"))
          .agg(min(col("prk")).as("p"))
        cand
          .join(
            truth,
            col("query_id") === col("t_query") && col("cand_id") === col("neighbor_id"),
            "left"
          )
          .select(
            col("query_id"),
            col("p"),
            when(col("neighbor_id").isNotNull, 1L).otherwise(0L).as("hit")
          )
          .select(
            col("query_id"),
            col("p"),
            col("hit"),
            explode(array(lit(1L), lit(2L), lit(3L), lit(4L))).as("nprobe")
          )
          .filter(col("p") <= col("nprobe"))
          .groupBy(col("query_id"), col("nprobe"))
          .agg(count(lit(1)).as("n_candidates"), sum(col("hit")).as("hits"))
          .withColumn("recall_bp", col("hits") * 1000L)
          .orderBy(col("query_id"), col("nprobe"))
      },
      Some(s"""WITH e AS (SELECT vec_id, $sqlEmbD AS v FROM embeddings),
              |c AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < 8),
              |asg AS (SELECT vec_id, cent_id FROM (
              |  SELECT e.vec_id, c.cent_id, row_number() OVER (PARTITION BY e.vec_id
              |    ORDER BY round(list_dot_product(e.v, c.cv)
              |      / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))), 6) DESC,
              |      c.cent_id) AS rk
              |  FROM e CROSS JOIN c) t WHERE rk = 1),
              |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN (10, 11, 12)),
              |probes AS (SELECT query_id, cent_id, CAST(prk AS BIGINT) AS prk FROM (
              |  SELECT q.query_id, c.cent_id, row_number() OVER (PARTITION BY q.query_id
              |    ORDER BY round(list_dot_product(q.qv, c.cv)
              |      / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.cv, c.cv))), 6) DESC,
              |      c.cent_id) AS prk
              |  FROM q CROSS JOIN c) t),
              |sc AS (
              |  SELECT q.query_id, e.vec_id AS neighbor_id,
              |    CAST(list_sum(list_transform(range(1, ${Dim + 1}),
              |      i -> CAST(floor(qv[i] * 64) AS BIGINT)
              |         * CAST(floor(v[i] * 64) AS BIGINT))) AS BIGINT) AS qs
              |  FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id),
              |truth AS (SELECT query_id AS t_query, neighbor_id FROM (
              |  SELECT *, row_number() OVER (PARTITION BY query_id
              |            ORDER BY qs DESC, neighbor_id) AS rk
              |  FROM sc) t WHERE rk <= 10),
              |cand AS (
              |  SELECT probes.query_id, asg.vec_id AS cand_id, min(prk) AS p
              |  FROM asg JOIN probes USING (cent_id)
              |  WHERE asg.vec_id <> probes.query_id
              |  GROUP BY 1, 2),
              |hx AS (
              |  SELECT cand.query_id, cand.p,
              |    CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS hit
              |  FROM cand LEFT JOIN truth t
              |    ON t.t_query = cand.query_id AND t.neighbor_id = cand.cand_id),
              |lv AS (SELECT unnest([1, 2, 3, 4]) AS nprobe)
              |SELECT query_id, CAST(lv.nprobe AS BIGINT) AS nprobe,
              |  count(*) AS n_candidates,
              |  CAST(sum(hit) AS BIGINT) AS hits,
              |  CAST(sum(hit) * 1000 AS BIGINT) AS recall_bp
              |FROM hx CROSS JOIN lv
              |WHERE hx.p <= lv.nprobe
              |GROUP BY 1, 2
              |ORDER BY 1, 2""".stripMargin)
    ),

    // Multi-probe LSH recall curve (Lv et al.): how much of the exact
    // top-10 the bucketed index retrieves when probing the query's own
    // bucket (radius 0), all 8 one-bit-flip buckets (radius 1) and all 28
    // two-bit-flip buckets (radius 2) — against how many candidates each
    // tier costs. THE tuning artifact for an LSH index: recall rises with
    // probe radius while candidate volume (the verify-tier cost) grows,
    // and the curve says where to stop. Ground truth is q90's exact
    // integer-quantized top-10 (5 anchor queries, tiny broadcast);
    // probing is a literal 37-combo explode per anchor (no join against
    // a combos table — keeps the plan equi-join only), candidates come
    // from ONE bucket equi-join, and each candidate keeps its MINIMUM
    // radius so tiers telescope. Scale shape: probe volume is
    // anchors × 37 rows; the candidate join is bucket-keyed; the exact
    // top-10 is the only corpus-linear pass.
    Q(
      "q205_multiprobe_recall",
      (s, d) => {
        val e = embeddings(s, d)
          .select(col("vec_id"), emb(col("embedding")).as("v"))
          .withColumn("bucket", bucketExpr(col("v")))
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("v").as("qv"), col("bucket").as("qb"))
        val scored = e
          .join(broadcast(q.select(col("query_id"), col("qv"))), col("vec_id") =!= col("query_id"))
          .select(
            col("query_id"),
            col("vec_id").as("neighbor_id"),
            graft.functions.VectorFunctions.quantizedDot(col("qv"), col("v"), 64).as("qs")
          )
        val w = Window.partitionBy(col("query_id")).orderBy(col("qs").desc, col("neighbor_id"))
        val truth = scored
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 10)
          .select(col("query_id").as("t_query"), col("neighbor_id"))
        val combos =
          Seq((0, 0)) ++ (1 to NumPlanes).map(i => (i, 0)) ++
            (for { i <- 1 to NumPlanes; j <- i + 1 to NumPlanes } yield (i, j))
        val comboArr = array(combos.map { case (i, j) =>
          struct(lit(i).as("i"), lit(j).as("j"))
        }: _*)
        val pb = q
          .select(col("query_id"), col("qb"), explode(comboArr).as("c"))
          .select(col("query_id"), col("qb"), col("c.i").as("i"), col("c.j").as("j"))
          .withColumn(
            "radius",
            when(col("i") === 0, 0L).when(col("j") === 0, 1L).otherwise(2L)
          )
          .withColumn(
            "f1",
            expr(
              """CASE WHEN i = 0 THEN qb
                | ELSE concat(substring(qb, 1, i - 1),
                |   CASE WHEN substring(qb, i, 1) = '1' THEN '0' ELSE '1' END,
                |   substring(qb, i + 1)) END""".stripMargin
            )
          )
          .withColumn(
            "probe",
            expr(
              """CASE WHEN j = 0 THEN f1
                | ELSE concat(substring(f1, 1, j - 1),
                |   CASE WHEN substring(f1, j, 1) = '1' THEN '0' ELSE '1' END,
                |   substring(f1, j + 1)) END""".stripMargin
            )
          )
        val cand = pb
          .join(e.select(col("bucket").as("probe"), col("vec_id").as("cand_id")), "probe")
          .filter(col("cand_id") =!= col("query_id"))
          .groupBy(col("query_id"), col("cand_id"))
          .agg(min(col("radius")).as("r"))
        cand
          .join(
            truth,
            col("query_id") === col("t_query") && col("cand_id") === col("neighbor_id"),
            "left"
          )
          .select(
            col("query_id"),
            col("r"),
            when(col("neighbor_id").isNotNull, 1L).otherwise(0L).as("hit")
          )
          .select(
            col("query_id"),
            col("r"),
            col("hit"),
            explode(array(lit(0L), lit(1L), lit(2L))).as("radius")
          )
          .filter(col("r") <= col("radius"))
          .groupBy(col("query_id"), col("radius"))
          .agg(count(lit(1)).as("n_candidates"), sum(col("hit")).as("hits"))
          .withColumn("recall_bp", col("hits") * 1000L)
          .orderBy(col("query_id"), col("radius"))
      },
      Some(s"""WITH e AS (SELECT vec_id, $sqlEmbD AS v FROM embeddings),
              |b AS (SELECT vec_id, v, ${sqlBucket("v")} AS bucket FROM e),
              |q AS (SELECT vec_id AS query_id, v AS qv, bucket AS qb
              |      FROM b WHERE vec_id < 5),
              |sc AS (
              |  SELECT q.query_id, b.vec_id AS neighbor_id,
              |    CAST(list_sum(list_transform(range(1, ${Dim + 1}),
              |      i -> CAST(floor(qv[i] * 64) AS BIGINT)
              |         * CAST(floor(v[i] * 64) AS BIGINT))) AS BIGINT) AS qs
              |  FROM b CROSS JOIN q WHERE b.vec_id <> q.query_id),
              |truth AS (SELECT query_id AS t_query, neighbor_id FROM (
              |  SELECT *, row_number() OVER (PARTITION BY query_id
              |            ORDER BY qs DESC, neighbor_id) AS rk
              |  FROM sc) t WHERE rk <= 10),
              |co AS (SELECT t.i, u.j
              |       FROM range(0, ${NumPlanes + 1}) t(i)
              |       CROSS JOIN range(0, ${NumPlanes + 1}) u(j)
              |       WHERE (t.i = 0 AND u.j = 0) OR (t.i > 0 AND u.j = 0)
              |          OR (t.i > 0 AND u.j > t.i)),
              |p1 AS (
              |  SELECT query_id, i, j,
              |    CASE WHEN i = 0 THEN 0 WHEN j = 0 THEN 1 ELSE 2 END AS radius,
              |    CASE WHEN i = 0 THEN qb
              |      ELSE substr(qb, 1, CAST(i - 1 AS INTEGER))
              |        || (CASE WHEN substr(qb, CAST(i AS INTEGER), 1) = '1'
              |              THEN '0' ELSE '1' END)
              |        || substr(qb, CAST(i + 1 AS INTEGER)) END AS f1
              |  FROM q CROSS JOIN co),
              |pb AS (
              |  SELECT query_id, radius,
              |    CASE WHEN j = 0 THEN f1
              |      ELSE substr(f1, 1, CAST(j - 1 AS INTEGER))
              |        || (CASE WHEN substr(f1, CAST(j AS INTEGER), 1) = '1'
              |              THEN '0' ELSE '1' END)
              |        || substr(f1, CAST(j + 1 AS INTEGER)) END AS probe
              |  FROM p1),
              |cand AS (
              |  SELECT query_id, b.vec_id AS cand_id, min(radius) AS r
              |  FROM pb JOIN b ON b.bucket = pb.probe AND b.vec_id <> pb.query_id
              |  GROUP BY 1, 2),
              |hx AS (
              |  SELECT cand.query_id, cand.r,
              |    CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS hit
              |  FROM cand LEFT JOIN truth t
              |    ON t.t_query = cand.query_id AND t.neighbor_id = cand.cand_id),
              |lv AS (SELECT unnest([0, 1, 2]) AS radius)
              |SELECT query_id, CAST(lv.radius AS BIGINT) AS radius,
              |  count(*) AS n_candidates,
              |  CAST(sum(hit) AS BIGINT) AS hits,
              |  CAST(sum(hit) * 1000 AS BIGINT) AS recall_bp
              |FROM hx CROSS JOIN lv
              |WHERE hx.r <= lv.radius
              |GROUP BY 1, 2
              |ORDER BY 1, 2""".stripMargin)
    ),

    // Hubness audit over the ANN graph — the k-occurrence distribution
    // (Radovanović et al.): how many vectors chose each vector as THEIR
    // nearest neighbor. High-dimensional embedding spaces concentrate
    // nearest-neighbor votes onto a few "hub" points, which silently
    // dominate retrieval results and distort ANN-based dedup/mining;
    // antihubs (in-degree 0) are the unreachable tail ANN recall metrics
    // never see. The histogram of in-degrees is the standard one-glance
    // diagnosis (a heavy right tail = hubness problem; compare against
    // the Poisson-ish shape a well-behaved space gives). Rides q127's
    // bucketed 1-NN graph (shared helper — Σ per-bucket n² candidate
    // cost, never all-pairs); everything after is graph-metadata-sized:
    // one in-degree aggregate, a left join to bring antihubs in, one
    // histogram rollup.
    Q(
      "q203_hubness",
      (s, d) => {
        val nn = annGraphNN(s, d)
        val indeg = nn.groupBy(col("nn_id")).agg(count(lit(1)).as("indeg"))
        embeddings(s, d)
          .select(col("vec_id"))
          .join(indeg.withColumnRenamed("nn_id", "vec_id"), Seq("vec_id"), "left")
          .select(coalesce(col("indeg"), lit(0L)).as("indeg"))
          .groupBy(col("indeg"))
          .agg(count(lit(1)).as("n_vectors"))
          .orderBy(col("indeg"))
      },
      Some(s"""WITH e AS (SELECT vec_id, $sqlEmbD AS v FROM embeddings),
              |b AS (SELECT vec_id, v, ${sqlBucket("v")} AS bucket,
              |        sqrt(list_dot_product(v, v)) AS nv
              |      FROM e),
              |p AS (
              |  SELECT a.vec_id AS vec_id, c.vec_id AS nn_id,
              |    round(list_dot_product(a.v, c.v) / (a.nv * c.nv), 6) AS cosine
              |  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id <> c.vec_id),
              |nn AS (SELECT vec_id, nn_id FROM (
              |  SELECT *, row_number() OVER (PARTITION BY vec_id
              |            ORDER BY cosine DESC, nn_id) AS rk
              |  FROM p) t WHERE rk = 1),
              |ind AS (
              |  SELECT e.vec_id,
              |    CAST(coalesce(c.cnt, 0) AS BIGINT) AS indeg
              |  FROM e LEFT JOIN (SELECT nn_id, count(*) AS cnt FROM nn GROUP BY 1) c
              |    ON c.nn_id = e.vec_id)
              |SELECT indeg, count(*) AS n_vectors
              |FROM ind
              |GROUP BY indeg
              |ORDER BY indeg""".stripMargin)
    ),

    // Similarity-graph centrality (bounded PageRank): two damped power-
    // iteration rounds over the co-bucket graph (edges = LSH bucket-mates,
    // q127's candidate structure) — the "representativeness" signal a
    // curation pipeline uses to pick canonical examples from dense
    // similarity neighborhoods. All arithmetic is positive int64 in 1e-4
    // units with floor division (Spark `div` == DuckDB `//` on positive
    // BIGINTs), so both engines are bit-identical: pr0 = 10000,
    // pr' = 1500 + 85·Σ_in (pr/deg) div 100. Iteration discipline: rounds
    // are UNROLLED (2, the q48 convention) into one linear DAG — no
    // driver loop, no growing lineage; the persisted edge list feeds both
    // rounds and the degree table. Each round is one equi-join + one
    // map-side-combinable sum per dst. The final top-20 is
    // orderBy+limit — Spark plans TakeOrderedAndProject (distributed
    // top-k, per-partition heaps + one 20-row merge), never a global
    // sort; the rank window then orders 20 rows.
    Q(
      "q128_graph_rank",
      (s, d) => {
        val nodes = embeddings(s, d)
          .select(col("vec_id"), bucketExpr(emb(col("embedding"))).as("bucket"))
        val edges = Caches.persisted(
          nodes.select(col("vec_id").as("src"), col("bucket"))
            .join(nodes.select(col("vec_id").as("dst"), col("bucket")), Seq("bucket"))
            .filter(col("src") =!= col("dst"))
            .select(col("src"), col("dst"))
        )
        val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        val ids = nodes.select(col("vec_id"))
        def iterate(pr: DataFrame): DataFrame = {
          val contrib = edges
            .join(pr.withColumnRenamed("vec_id", "src"), Seq("src"))
            .join(deg, Seq("src"))
            .select(col("dst"), expr("pr div deg").as("c"))
            .groupBy(col("dst"))
            .agg(sum(col("c")).as("s"))
          ids
            .join(contrib.withColumnRenamed("dst", "vec_id"), Seq("vec_id"), "left")
            .select(
              col("vec_id"),
              (lit(1500L) + expr("(85 * coalesce(s, 0L)) div 100")).as("pr")
            )
        }
        val p0 = ids.select(col("vec_id"), lit(10000L).as("pr"))
        val p2 = iterate(iterate(p0))
        val top = p2.orderBy(col("pr").desc, col("vec_id")).limit(20)
        top
          .withColumn(
            "rank",
            row_number().over(Window.orderBy(col("pr").desc, col("vec_id"))).cast("long")
          )
          .orderBy(col("rank"))
      },
      Some(sqlGraphRank)
    ),

    // Product quantization + asymmetric-distance scoring (Jégou et al.,
    // "Product Quantization for Nearest Neighbor Search", TPAMI 2011) —
    // the IVF-PQ building block: split each vector into 8 subvectors,
    // code each against an 8-centroid per-subspace codebook, and rank
    // neighbors by the sum of query-to-centroid lookup-table entries
    // instead of full-vector distances. Deterministic contract: vectors
    // are int64-quantized (floor(x·1000), the q108/q111 convention — all
    // distances exact, no float summation drift), the codebook is the
    // subvectors of the 8 lowest vec_ids (the reproducible-seed
    // convention; production trains per-subspace k-means via q48/q108 and
    // feeds the centroids here), queries are the 3 lowest, and ties break
    // to the smallest centroid index / vec_id.
    // Scale shape: the codebook and the 3×8×8 ADC tables are driver
    // CONSTANTS baked into the expressions (64 rows read once — the
    // q86/q108 driver-scalar idiom), so encode + scoring is ONE map-only
    // pass over the corpus with no join and no shuffle at all; the only
    // aggregation is the fixed-state graft_top_k (5-pair partials per
    // query). That is the whole point of PQ at 100 TB: the corpus is
    // scanned once, codes are 8 small ints per vector, and scoring is
    // table lookups. The oracle recomputes codebook, codes, and tables
    // relationally from scratch — nothing data-derived is embedded in it.
    Q(
      "q139_pq_adc",
      (s, d) => pqAdcTop5(s, d).orderBy(col("query_id"), col("rank")),
      Some(s"""$sqlPqCte
              |SELECT query_id, rank, vec_id, adc_dist FROM r WHERE rank <= 5
              |ORDER BY query_id, rank""".stripMargin)
    ),

    // PQ recall@5 — the evaluation harness every lossy-ANN deployment
    // needs before trusting it: how many of each query's EXACT top-5
    // neighbors (full 64-dim int64 squared distance) the ADC ranking
    // recovered. Shares q139's persisted ADC top-5 via the plan cache;
    // the exact side is one map-only pass (3 broadcast query vectors ×
    // corpus, native ScaledSqDist) into the same fixed-state top-k
    // aggregate, then a 15-row join. Recall in basis points, integral.
    Q(
      "q140_pq_recall",
      (s, d) => {
        // one pqContext for both sides: the seed collection is a
        // TakeOrdered over the corpus — paying it twice is a redundant
        // pass at scale
        val (e, seeds) = pqContext(s, d)
        val adc5 =
          pqAdcTop5From(s, e, seeds).select(col("query_id"), col("vec_id"), lit(1L).as("hit"))
        val seedIds = seeds.map(_._1)
        import s.implicits._
        val qdf = seeds.take(3).toSeq.toDF("query_id", "cqv")
        val exact5 = e
          .filter(!col("vec_id").isin(seedIds: _*))
          .join(broadcast(qdf))
          .withColumn(
            "d2",
            floor(graft.functions.VectorFunctions.scaledSqDist(col("qv"), col("cqv"), lit(1L)))
              .cast("long")
          )
          .groupBy(col("query_id"))
          .agg(graft.functions.AggFunctions.topK(negate(col("d2")), col("vec_id"), 5).as("top"))
          .select(col("query_id"), explode(col("top")).as("p"))
          .select(col("query_id"), col("p.id").as("vec_id"))
        exact5
          .join(adc5, Seq("query_id", "vec_id"), "left")
          .groupBy(col("query_id"))
          .agg(
            sum(coalesce(col("hit"), lit(0L))).as("exact_in_adc"),
            expr("sum(coalesce(hit, 0)) * 10000 div 5").as("recall_bp")
          )
          .orderBy(col("query_id"))
      },
      Some(s"""$sqlPqCte,
              |q3 AS (SELECT sid AS query_id, qv FROM cent WHERE j < 3),
              |ex AS (
              |  SELECT q3.query_id, v.vec_id,
              |    CAST(list_sum(list_transform(range(1, 65),
              |      i -> (v.qv[i] - q3.qv[i]) * (v.qv[i] - q3.qv[i]))) AS BIGINT) AS d2
              |  FROM e v CROSS JOIN q3
              |  WHERE v.vec_id NOT IN (SELECT sid FROM cent)),
              |er AS (
              |  SELECT query_id, vec_id,
              |    row_number() OVER (PARTITION BY query_id ORDER BY d2, vec_id) AS rk
              |  FROM ex)
              |SELECT er.query_id, CAST(count(ar.vec_id) AS BIGINT) AS exact_in_adc,
              |  CAST(count(ar.vec_id) * 10000 // 5 AS BIGINT) AS recall_bp
              |FROM er
              |LEFT JOIN (SELECT query_id, vec_id FROM r WHERE rank <= 5) ar
              |  ON ar.query_id = er.query_id AND ar.vec_id = er.vec_id
              |WHERE er.rk <= 5
              |GROUP BY 1
              |ORDER BY 1""".stripMargin)
    ),

    // Embedding centroid-outlier audit: the vectors farthest from the
    // corpus mean — the standard screen for broken encoder outputs
    // (all-zero rows, scale blow-ups, wrong-modality strays) before the
    // embedding table feeds dedup/ANN. Distance is computed in integer
    // algebra around the exact rational mean: with q = floor(x·1e3) and
    // per-dimension sums s_j = Σ q_j over n rows, the reported statistic
    // is Σ_j (q_j·n − s_j)² = n²·‖q − mean‖² — the same ordering as true
    // squared distance from the centroid, with no float division
    // anywhere, so both engines agree bit-for-bit.
    //
    // Scale shape: the centroid is one map-side partial aggregation to
    // 64 (dim, sum) metadata rows, collected driver-side (the q86 bloom
    // idiom — scalars, not data) and re-broadcast as a literal; the
    // distance pass is then map-only with a codegen'd fold, and top-10
    // is TakeOrderedAndProject. Bounds: |q|·n ≤ 6e2·n, so the summand
    // stays under 2^63 up to n ≈ 2e5 rows per shard at this value range;
    // bigger corpora renormalize per shard before comparing.
    Q(
      "q144_embedding_outliers",
      (s, d) => {
        val e = Caches.persisted(
          embeddings(s, d).select(
            col("vec_id"),
            transform(
              emb(col("embedding")),
              x => floor(x * 1000).cast("long")
            ).as("qv")
          )
        )
        val sums = e
          .select(posexplode(col("qv")).as(Seq("j", "q")))
          .groupBy(col("j"))
          .agg(sum(col("q")).as("sj"))
          .orderBy(col("j"))
          .collect()
          .map(_.getAs[Long]("sj"))
        val n = e.count()
        // empty corpus: the oracle yields zero rows; mirror that instead
        // of folding against a zero-length sums literal
        if (n == 0L) e.select(col("vec_id"), lit(0L).as("d2n2")).limit(0)
        else
          e.select(
            col("vec_id"),
            aggregate(
              zip_with(
                col("qv"),
                typedLit(sums.toSeq),
                (q, sj) => (q * n - sj) * (q * n - sj)
              ),
              lit(0L),
              (acc, x) => acc + x
            ).as("d2n2")
          ).orderBy(col("d2n2").desc, col("vec_id"))
            .limit(10)
      },
      Some(s"""WITH e AS (
              |  SELECT vec_id,
              |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
              |  FROM embeddings),
              |tot AS (SELECT count(*) AS n FROM e),
              |s AS (
              |  SELECT i, sum(qv[i]) AS sj
              |  FROM e, range(1, ${Dim + 1}) r(i)
              |  GROUP BY i),
              |sa AS (SELECT list(sj ORDER BY i) AS sl FROM s)
              |SELECT vec_id,
              |  CAST(list_sum(list_transform(range(1, ${Dim + 1}),
              |    i -> (qv[i] * n - sl[i]) * (qv[i] * n - sl[i]))) AS BIGINT) AS d2n2
              |FROM e, tot, sa
              |ORDER BY d2n2 DESC, vec_id
              |LIMIT 10""".stripMargin)
    ),

    // Embedding-space drift monitor — q117's distribution-drift question
    // asked of the EMBEDDINGS: per label, how far did the quantized
    // centroid move between two ingest epochs (vec_id parity is the
    // deterministic epoch split)? Exact int64 end-to-end: per (label,
    // dim, epoch) the count and coordinate sum aggregate in ONE
    // conditional pass (no self-join — the q117 shape), the per-dim
    // centroid difference clears denominators as sx0·n1 − sx1·n0, and
    // the label's drift is the L1 sum of those numerators (plus a
    // milli-unit normalized form behind a zero-epoch guard). One corpus
    // pass, a 64×-row narrow explode, two map-side-combinable hash
    // aggregates — linear at any scale; the alert that catches an
    // encoder change or upstream content shift before it skews SemDeDup
    // thresholds and ANN recall.
    Q(
      "q152_embedding_drift",
      (s, d) => {
        val q = embeddings(s, d)
          .select(
            col("label"),
            (col("vec_id") % 2).cast("long").as("epoch"),
            posexplode(
              expr("transform(cast(embedding as array<double>), x -> cast(floor(x * 1000d) as bigint))")
            ).as(Seq("dim0", "x"))
          )
          .groupBy(col("label"), col("dim0"))
          .agg(
            sum(when(col("epoch") === 0L, 1L).otherwise(0L)).as("n0"),
            sum(when(col("epoch") === 0L, col("x")).otherwise(0L)).as("sx0"),
            sum(when(col("epoch") === 1L, 1L).otherwise(0L)).as("n1"),
            sum(when(col("epoch") === 1L, col("x")).otherwise(0L)).as("sx1")
          )
        q.groupBy(col("label"))
          .agg(
            max(col("n0")).as("n0"),
            max(col("n1")).as("n1"),
            sum(abs(col("sx0") * col("n1") - col("sx1") * col("n0"))).as("l1_drift_num")
          )
          .select(
            col("label"),
            col("n0"),
            col("n1"),
            col("l1_drift_num"),
            when(col("n0") * col("n1") === 0L, 0L)
              .otherwise(expr("l1_drift_num div (n0 * n1)"))
              .as("drift_milli")
          )
          .orderBy(col("label"))
      },
      Some(s"""WITH e AS (
              |  SELECT label, vec_id % 2 AS epoch,
              |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
              |  FROM embeddings),
              |pd AS (
              |  SELECT label, i AS dim,
              |    CAST(sum(CASE WHEN epoch = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
              |    CAST(sum(CASE WHEN epoch = 0 THEN qv[i] ELSE 0 END) AS BIGINT) AS sx0,
              |    CAST(sum(CASE WHEN epoch = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
              |    CAST(sum(CASE WHEN epoch = 1 THEN qv[i] ELSE 0 END) AS BIGINT) AS sx1
              |  FROM e, range(1, ${Dim + 1}) r(i)
              |  GROUP BY 1, 2)
              |SELECT label, max(n0) AS n0, max(n1) AS n1,
              |  CAST(sum(abs(sx0 * n1 - sx1 * n0)) AS BIGINT) AS l1_drift_num,
              |  CASE WHEN max(n0) * max(n1) = 0 THEN 0
              |       ELSE CAST(sum(abs(sx0 * n1 - sx1 * n0)) // (max(n0) * max(n1)) AS BIGINT)
              |  END AS drift_milli
              |FROM pd
              |GROUP BY label
              |ORDER BY label""".stripMargin)
    ),

    // Class-separability matrix: for every label pair, the squared
    // distance between the two class centroids next to each class's
    // intra-class scatter — the audit that says whether labels are
    // actually separable in embedding space BEFORE anyone trains a
    // classifier head on them (a pair whose centroid gap sits below
    // either side's intra-class variance is a label taxonomy problem,
    // not a model problem; q95 scores assignment accuracy, this explains
    // WHICH pairs cause it). Exactness: one corpus pass builds per-label
    // (count, per-dim sum, per-dim sum-of-squares); the intra scatter
    // uses the moment identity Σ‖x−μ‖² = Σ_i(n·Σx² − (Σx)²)/n with an
    // exact int64 numerator, and the pair separation cross-multiplies
    // the centroid sums (Σ_i(sa_i·n_b − sb_i·n_a)², exact int64 — safe
    // to ~10³ per-class counts at this quantization; shard or rescale
    // beyond, q145's envelope note). Reported values are positive floor
    // divisions, identical on both engines. Scale shape: the corpus
    // reduces to |labels| metadata rows; the pair join is a broadcast
    // of ≤10 centroid rows against ≤10 rows (whitelisted scalar-
    // broadcast nested loop on METADATA — never a corpus row); the
    // 64-element HOF runs on ≤45 pair rows, post-aggregate.
    Q(
      "q166_class_separability",
      (s, d) => {
        val e = embeddings(s, d).select(
          col("label"),
          expr("transform(cast(embedding as array<double>), x -> cast(floor(x * 1000d) as bigint))")
            .as("qv")
        )
        val perLabel = e
          .select(col("label"), posexplode(col("qv")).as(Seq("dim", "x")))
          .groupBy(col("label"), col("dim"))
          .agg(
            count(lit(1)).as("c"),
            sum(col("x")).as("sx"),
            sum(col("x") * col("x")).as("sxx")
          )
          .groupBy(col("label"))
          .agg(
            max(col("c")).as("n"),
            expr("transform(array_sort(collect_list(struct(dim, sx))), p -> p.sx)").as("csum"),
            sum(col("c") * col("sxx") - col("sx") * col("sx")).as("intra_num")
          )
        val a = perLabel.select(
          col("label").as("label_a"),
          col("n").as("n_a"),
          col("csum").as("csum_a"),
          col("intra_num").as("intra_a_num")
        )
        val b = perLabel.select(
          col("label").as("label_b"),
          col("n").as("n_b"),
          col("csum").as("csum_b"),
          col("intra_num").as("intra_b_num")
        )
        a.join(broadcast(b), col("label_a") < col("label_b"))
          .select(
            col("label_a"),
            col("label_b"),
            col("n_a"),
            col("n_b"),
            expr(
              """aggregate(zip_with(csum_a, csum_b,
                |  (x, y) -> (x * n_b - y * n_a) * (x * n_b - y * n_a)),
                |  0L, (acc, v) -> acc + v)""".stripMargin
            ).as("sep_num"),
            expr("intra_a_num div (n_a * n_a)").as("intra_a_scaled"),
            expr("intra_b_num div (n_b * n_b)").as("intra_b_scaled")
          )
          .withColumn("sep_scaled", expr("sep_num div (n_a * n_b * n_a * n_b)"))
          .select(
            col("label_a"),
            col("label_b"),
            col("n_a"),
            col("n_b"),
            col("sep_scaled"),
            col("intra_a_scaled"),
            col("intra_b_scaled"),
            (col("sep_scaled") * 2L > col("intra_a_scaled") + col("intra_b_scaled"))
              .as("separable")
          )
          .orderBy(col("label_a"), col("label_b"))
      },
      Some(s"""WITH e AS (
              |  SELECT label,
              |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
              |  FROM embeddings),
              |pd AS (
              |  SELECT label, i AS dim, CAST(count(*) AS BIGINT) AS c,
              |    CAST(sum(qv[i]) AS BIGINT) AS sx,
              |    CAST(sum(qv[i] * qv[i]) AS BIGINT) AS sxx
              |  FROM e, range(1, ${Dim + 1}) r(i)
              |  GROUP BY 1, 2),
              |pl AS (
              |  SELECT label, max(c) AS n, array_agg(sx ORDER BY dim) AS csum,
              |    CAST(sum(c * sxx - sx * sx) AS BIGINT) AS intra_num
              |  FROM pd GROUP BY label)
              |SELECT a.label AS label_a, b.label AS label_b,
              |  a.n AS n_a, b.n AS n_b,
              |  CAST(list_reduce(list_transform(range(1, ${Dim + 1}),
              |      i -> (a.csum[i] * b.n - b.csum[i] * a.n)
              |         * (a.csum[i] * b.n - b.csum[i] * a.n)),
              |      (acc, v) -> acc + v)
              |    // (a.n * b.n * a.n * b.n) AS BIGINT) AS sep_scaled,
              |  CAST(a.intra_num // (a.n * a.n) AS BIGINT) AS intra_a_scaled,
              |  CAST(b.intra_num // (b.n * b.n) AS BIGINT) AS intra_b_scaled,
              |  (CAST(list_reduce(list_transform(range(1, ${Dim + 1}),
              |      i -> (a.csum[i] * b.n - b.csum[i] * a.n)
              |         * (a.csum[i] * b.n - b.csum[i] * a.n)),
              |      (acc, v) -> acc + v)
              |    // (a.n * b.n * a.n * b.n) AS BIGINT) * 2
              |   > CAST(a.intra_num // (a.n * a.n) AS BIGINT)
              |   + CAST(b.intra_num // (b.n * b.n) AS BIGINT)) AS separable
              |FROM pl a JOIN pl b ON a.label < b.label
              |ORDER BY label_a, label_b""".stripMargin)
    ),

    // Hybrid retrieval fusion — Reciprocal Rank Fusion (Cormack/Clarke/
    // Buettcher 2009) of the lexical BM25 ranking (q129's scorer, shared
    // helper) and a semantic embedding ranking: the standard two-tower
    // mining recipe where keyword search and ANN search each miss
    // different relevant documents and rrf(d) = Σ 1/(60 + rank_sys(d))
    // over the systems that ranked d recovers both. Doc 0 plays the
    // pseudo-query (its embedding is the query vector; it is excluded
    // from both candidate lists). Integer-exact: contributions are
    // 10⁶ div (60 + rank) — positive, so Spark div == DuckDB // — and
    // absent ranks contribute 0 (the standard seen-sets RRF).
    // Scale shape: each system's ranking ends in orderBy+limit
    // (TakeOrderedAndProject per-partition heaps); only two ≤20-row rank
    // lists meet in the full-outer fuse, so the fusion itself costs
    // nothing at any corpus size. The BM25 side rides q129's persisted
    // projection; the semantic side is one broadcast-1-row map pass.
    Q(
      "q209_hybrid_rrf",
      (s, d) => {
        val lexTop = TextOps
          .bm25Scored(s, d)
          .filter(col("doc_id") =!= 0L)
          .orderBy(col("score").desc, col("doc_id"))
          .limit(20)
          .withColumn(
            "lex_rank",
            row_number().over(Window.orderBy(col("score").desc, col("doc_id"))).cast("long")
          )
          .select(col("doc_id"), col("lex_rank"))
        val e = embeddings(s, d).select(col("vec_id"), emb(col("embedding")).as("v"))
        val qv = e.filter(col("vec_id") === 0L).select(col("v").as("qv"))
        val semTop = e
          .filter(col("vec_id") =!= 0L)
          .join(broadcast(qv))
          .select(
            col("vec_id").as("doc_id"),
            graft.functions.VectorFunctions.quantizedDot(col("qv"), col("v"), 64).as("qscore")
          )
          .orderBy(col("qscore").desc, col("doc_id"))
          .limit(20)
          .withColumn(
            "sem_rank",
            row_number().over(Window.orderBy(col("qscore").desc, col("doc_id"))).cast("long")
          )
          .select(col("doc_id"), col("sem_rank"))
        lexTop
          .join(semTop, Seq("doc_id"), "full_outer")
          .select(
            col("doc_id"),
            (coalesce(expr("1000000L div (60L + lex_rank)"), lit(0L)) +
              coalesce(expr("1000000L div (60L + sem_rank)"), lit(0L))).as("rrf"),
            coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
            coalesce(col("sem_rank"), lit(0L)).as("sem_rank")
          )
          .orderBy(col("rrf").desc, col("doc_id"))
          .limit(10)
          .withColumn(
            "rank",
            row_number().over(Window.orderBy(col("rrf").desc, col("doc_id"))).cast("long")
          )
          .orderBy(col("rank"))
      },
      Some(s"""WITH ${TextOps.sqlBm25Cte},
              |lex AS (
              |  SELECT doc_id, CAST(r AS BIGINT) AS lex_rank FROM (
              |    SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
              |    FROM sc WHERE doc_id <> 0) t
              |  WHERE r <= 20),
              |e2 AS (SELECT vec_id, $sqlEmbD AS v FROM embeddings),
              |qv AS (SELECT v AS qv FROM e2 WHERE vec_id = 0),
              |semsc AS (
              |  SELECT vec_id AS doc_id,
              |    CAST(list_sum(list_transform(range(1, ${Dim + 1}),
              |      i -> CAST(floor(qv[i] * 64) AS BIGINT)
              |         * CAST(floor(v[i] * 64) AS BIGINT))) AS BIGINT) AS qscore
              |  FROM e2 CROSS JOIN qv WHERE vec_id <> 0),
              |sem AS (
              |  SELECT doc_id, CAST(r AS BIGINT) AS sem_rank FROM (
              |    SELECT doc_id, row_number() OVER (ORDER BY qscore DESC, doc_id) AS r
              |    FROM semsc) t
              |  WHERE r <= 20),
              |f AS (
              |  SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
              |    CAST(coalesce(1000000 // (60 + lex_rank), 0)
              |       + coalesce(1000000 // (60 + sem_rank), 0) AS BIGINT) AS rrf,
              |    CAST(coalesce(lex_rank, 0) AS BIGINT) AS lex_rank,
              |    CAST(coalesce(sem_rank, 0) AS BIGINT) AS sem_rank
              |  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id)
              |SELECT doc_id, rrf, lex_rank, sem_rank, CAST(rank AS BIGINT) AS rank FROM (
              |  SELECT *, row_number() OVER (ORDER BY rrf DESC, doc_id) AS rank FROM f) t
              |WHERE rank <= 10
              |ORDER BY rank""".stripMargin)
    ),

    // Per-source embedding dispersion — mean pairwise squared L2 distance
    // within each source, via the centroid identity
    //   Σᵢⱼ ‖xᵢ−xⱼ‖² = 2n·Σᵢ‖xᵢ‖² − 2·Σ_d(Σᵢ xᵢ,d)²
    // so the n² pairwise sum folds into ONE linear pass (per-row squared
    // norms from the native quantizedDot + per-dim sums), never a
    // self-join. Low dispersion = semantically homogeneous source
    // (redundant crawl, SemDeDup fodder); high = topically diverse. The
    // semantic twin of q134's lexical diversity index. Integer-exact on
    // 10³-quantized vectors; the numerator is ≥ 0 by Cauchy–Schwarz so
    // Spark div == DuckDB //. Overflow envelope: 2n·Σ‖x‖² ≈ n²·dim·10⁶
    // — int64-safe to ~10⁷ vectors per source at dim 64; shard or
    // DECIMAL(38,0) beyond (the q145 rule). Scale shape: one equi-join
    // to attach source, one hash aggregate for (n, Σssq), one
    // posexplode rollup to sources×64 per-dim sums — all map-side
    // combinable, output is |sources| rows.
    Q(
      "q210_source_dispersion",
      (s, d) => {
        // persisted: the (n, Σssq) aggregate and the per-dim rollup both
        // read this join — unpersisted, the corpus join executes twice
        val j = Caches.persisted(
          embeddings(s, d)
            .select(
              col("vec_id"),
              expr("transform(cast(embedding as array<double>), x -> cast(floor(x * 1000d) as bigint))")
                .as("qv"),
              graft.functions.VectorFunctions
                .quantizedDot(emb(col("embedding")), emb(col("embedding")), 1000)
                .as("ssq")
            )
            .join(
              documents(s, d).select(col("doc_id").as("vec_id"), col("source")),
              "vec_id"
            )
        )
        val st = j.groupBy(col("source"))
          .agg(count(lit(1)).as("n"), sum(col("ssq")).as("ssq_sum"))
        val s2 = j
          .select(col("source"), posexplode(col("qv")).as(Seq("dim", "x")))
          .groupBy(col("source"), col("dim"))
          .agg(sum(col("x")).as("sd"))
          .groupBy(col("source"))
          .agg(sum(col("sd") * col("sd")).as("s2"))
        st.join(s2, "source")
          .filter(col("n") >= 2L)
          .select(
            col("source"),
            col("n").as("n_vecs"),
            expr("(2L * n * ssq_sum - 2L * s2) div (n * (n - 1L))").as("dispersion")
          )
          .orderBy(col("source"))
      },
      Some(s"""WITH e AS (
              |  SELECT vec_id,
              |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
              |  FROM embeddings),
              |j AS (SELECT d.source, e.qv
              |      FROM e JOIN documents d ON d.doc_id = e.vec_id),
              |st AS (
              |  SELECT source, CAST(count(*) AS BIGINT) AS n,
              |    CAST(sum(CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT)) AS BIGINT)
              |      AS ssq_sum
              |  FROM j GROUP BY 1),
              |ds AS (
              |  SELECT source, i AS dim, CAST(sum(qv[i]) AS BIGINT) AS sd
              |  FROM j, range(1, ${Dim + 1}) r(i)
              |  GROUP BY 1, 2),
              |s2 AS (SELECT source, CAST(sum(sd * sd) AS BIGINT) AS s2 FROM ds GROUP BY 1)
              |SELECT st.source, st.n AS n_vecs,
              |  (2 * st.n * st.ssq_sum - 2 * s2.s2) // (st.n * (st.n - 1)) AS dispersion
              |FROM st JOIN s2 USING (source)
              |WHERE st.n >= 2
              |ORDER BY source""".stripMargin)
    ),

    // Reciprocal (mutual) k-NN pairs — the high-precision near-dup /
    // same-concept signal the one-directional ANN graph (q127) can't
    // give: A listing B among its top-3 while B doesn't reciprocate is
    // usually hubness (q203); A and B each ranking the OTHER in their
    // top-3 is the classic reciprocal-NN criterion for merge candidates.
    // Candidates are the q127 LSH-bucket discipline (Σ per-bucket n²,
    // never the corpus cross product); per-vector top-3 is a window
    // PARTITIONED by vec_id (bucket-bounded input, never global); the
    // reciprocity check is one self equi-join of the top-3 edge list on
    // the reversed pair. Cosines are rounded to 1e-6 BEFORE ranking
    // (q127's exactness convention) so rank order is bit-identical
    // cross-engine, and same-label agreement rides along as the
    // label-quality audit (mutual pairs that disagree on label are the
    // vectors to re-embed first).
    Q(
      "q233_mutual_knn",
      (s, d) => {
        val e = Caches.persisted(
          embeddings(s, d)
            .select(col("vec_id"), col("label"), emb(col("embedding")).as("v"))
            .withColumn("bucket", bucketExpr(col("v")))
            .withColumn("nv", norm(col("v")))
        )
        val a = e.select(col("bucket"), col("vec_id"), col("label"), col("v"), col("nv"))
        val b = e.select(
          col("bucket"),
          col("vec_id").as("nn_id"),
          col("label").as("nn_label"),
          col("v").as("vb"),
          col("nv").as("nb")
        )
        val wVec = Window
          .partitionBy(col("vec_id"))
          .orderBy(col("cosine").desc, col("nn_id"))
        val top3 = a
          .join(b, Seq("bucket"))
          .filter(col("vec_id") =!= col("nn_id"))
          .select(
            col("vec_id"),
            col("label"),
            col("nn_id"),
            col("nn_label"),
            round(dot(col("v"), col("vb")) / (col("nv") * col("nb")), 6).as("cosine")
          )
          .withColumn("rk", row_number().over(wVec))
          .filter(col("rk") <= 3)
        top3
          .filter(col("vec_id") < col("nn_id"))
          .join(
            top3
              .filter(col("vec_id") > col("nn_id"))
              .select(
                col("nn_id").as("vec_id"),
                col("vec_id").as("nn_id"),
                col("rk").as("rk_back")
              ),
            Seq("vec_id", "nn_id")
          )
          .select(
            col("vec_id").as("vec_a"),
            col("nn_id").as("vec_b"),
            col("cosine"),
            col("rk").as("rank_ab"),
            col("rk_back").as("rank_ba"),
            (col("label") === col("nn_label")).cast("long").as("same_label")
          )
          .orderBy(col("vec_a"), col("vec_b"))
      },
      Some(s"""WITH e AS (SELECT vec_id, label, $sqlEmbD AS v FROM embeddings),
              |b AS (SELECT vec_id, label, v, ${sqlBucket("v")} AS bucket,
              |        sqrt(list_dot_product(v, v)) AS nv
              |      FROM e),
              |p AS (
              |  SELECT a.vec_id, a.label, c.vec_id AS nn_id, c.label AS nn_label,
              |    round(list_dot_product(a.v, c.v) / (a.nv * c.nv), 6) AS cosine
              |  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id <> c.vec_id),
              |t AS (SELECT *, CAST(row_number() OVER (PARTITION BY vec_id
              |        ORDER BY cosine DESC, nn_id) AS INTEGER) AS rk
              |      FROM p
              |      QUALIFY rk <= 3)
              |SELECT f.vec_id AS vec_a, f.nn_id AS vec_b, f.cosine,
              |  f.rk AS rank_ab, r.rk AS rank_ba,
              |  CAST(f.label = f.nn_label AS BIGINT) AS same_label
              |FROM t f JOIN t r ON f.vec_id = r.nn_id AND f.nn_id = r.vec_id
              |WHERE f.vec_id < f.nn_id
              |ORDER BY vec_a, vec_b""".stripMargin)
    )
  )

  /** Int64-quantized vectors + the 8 deterministic seed rows (codebook
    * source) — shared by the PQ encode (q139) and recall (q140) paths.
    */
  private def pqContext(s: SparkSession, d: String): (DataFrame, Array[(Long, Seq[Long])]) = {
    val e = embeddings(s, d).select(
      col("vec_id"),
      expr("transform(cast(embedding as array<double>), x -> cast(floor(x * 1000d) as bigint))")
        .as("qv")
    )
    val seeds =
      e.orderBy(col("vec_id")).limit(8).collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    (e, seeds)
  }

  /** ADC top-5 per query (query_id, rank, vec_id, adc_dist) — the q139
    * pipeline, persisted so q140's recall audit reuses the whole DAG via
    * the plan cache.
    */
  private def pqAdcTop5(s: SparkSession, d: String): DataFrame = {
    val (e, seeds) = pqContext(s, d)
    pqAdcTop5From(s, e, seeds)
  }

  private def pqAdcTop5From(
      s: SparkSession,
      e: DataFrame,
      seeds: Array[(Long, Seq[Long])]
  ): DataFrame = {
    // cent(m)(j)(i): subspace m, centroid j (seed rank), dim i
    val cent = Array.tabulate(8, 8, 8)((m, j, i) => seeds(j)._2(m * 8 + i))
    // flat [(m·8 + j)·8 + i] layout for the native encoder
    val flatCb: Seq[Long] =
      for (m <- 0 until 8; j <- 0 until 8; i <- 0 until 8) yield cent(m)(j)(i)
    val queries3 = seeds.take(3)
    def sq(a: Long): Long = a * a
    // ADC lookup tables t(q)(m)(j): exact int64, computed driver-side
    // from the same seed constants
    val tbl = Array.tabulate(3, 8, 8)((q, m, j) =>
      (0 until 8).map(i => sq(queries3(q)._2(m * 8 + i) - cent(m)(j)(i))).sum
    )
    val seedIds = seeds.map(_._1)
    val coded = e
      .filter(!col("vec_id").isin(seedIds: _*))
      .select(
        col("vec_id"),
        graft.functions.VectorFunctions.pqEncode(col("qv"), flatCb, 8, 8, 8).as("codes")
      )
      .select(col("vec_id") +: (0 until 8).map(m => col("codes").getItem(m).as(s"c$m")): _*)
    val scored = coded
      .select(
        col("vec_id"),
        explode(array((0 until 3).map { q =>
          val adc = (0 until 8)
            .map(m =>
              element_at(
                array((0 until 8).map(j => lit(tbl(q)(m)(j))): _*),
                col(s"c$m").cast("int") + 1
              )
            )
            .reduce(_ + _)
          struct(lit(queries3(q)._1).as("query_id"), adc.as("adc_dist"))
        }: _*)).as("qs")
      )
      .select(col("vec_id"), col("qs.query_id").as("query_id"), col("qs.adc_dist").as("adc_dist"))
    scored
      .groupBy(col("query_id"))
      .agg(graft.functions.AggFunctions.topK(negate(col("adc_dist")), col("vec_id"), 5).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(
        col("query_id"),
        (col("pos") + 1L).cast("long").as("rank"),
        col("p.id").as("vec_id"),
        negate(col("p.score")).as("adc_dist")
      )
      .transform(Caches.persisted)
  }

  /** Shared PQ oracle CTE chain ending in `r(query_id, vec_id, adc_dist,
    * rank)` — recomputes codebook, codes, and ADC tables relationally.
    * (`def`, not `val`: referenced from `queries`, which initializes
    * first — the sqlGraphRank convention.)
    */
  private def sqlPqCte: String =
    """WITH e AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
      |  FROM embeddings),
      |cent AS (
      |  SELECT vec_id AS sid, qv, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS j
      |  FROM e ORDER BY vec_id LIMIT 8),
      |d AS (
      |  SELECT v.vec_id, m.m, c.j,
      |    CAST(list_sum(list_transform(range(1, 9),
      |      i -> (v.qv[m.m*8 + i] - c.qv[m.m*8 + i]) * (v.qv[m.m*8 + i] - c.qv[m.m*8 + i])))
      |      AS BIGINT) AS d2
      |  FROM e v
      |  CROSS JOIN (SELECT unnest(range(8)) AS m) m
      |  CROSS JOIN cent c),
      |enc AS (
      |  SELECT vec_id, m, j FROM (
      |    SELECT vec_id, m, j, row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, j) AS rk
      |    FROM d) t
      |  WHERE rk = 1),
      |qd AS (
      |  SELECT cq.sid AS query_id, d.m, d.j AS cj, d.d2
      |  FROM d JOIN cent cq ON d.vec_id = cq.sid
      |  WHERE cq.j < 3),
      |adc AS (
      |  SELECT qd.query_id, enc.vec_id, CAST(sum(qd.d2) AS BIGINT) AS adc_dist
      |  FROM enc JOIN qd ON qd.m = enc.m AND qd.cj = enc.j
      |  WHERE enc.vec_id NOT IN (SELECT sid FROM cent)
      |  GROUP BY 1, 2),
      |r AS (
      |  SELECT query_id, vec_id, adc_dist,
      |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY adc_dist, vec_id) AS BIGINT)
      |      AS rank
      |  FROM adc)""".stripMargin

  /** Oracle for q128: the same two unrolled damped rounds in DuckDB —
    * generated so both rounds stay textually identical.
    */
  private def sqlGraphRank: String = {
    def round(pin: String, pout: String): String =
      s"""s_$pout AS (
         |  SELECT ed.dst, CAST(sum($pin.pr // dg.deg) AS BIGINT) AS s
         |  FROM ed JOIN $pin ON $pin.vec_id = ed.src JOIN dg ON dg.src = ed.src
         |  GROUP BY 1),
         |$pout AS (
         |  SELECT b.vec_id,
         |    CAST(1500 + (85 * coalesce(s.s, 0)) // 100 AS BIGINT) AS pr
         |  FROM b LEFT JOIN s_$pout s ON s.dst = b.vec_id)""".stripMargin
    s"""WITH e AS (SELECT vec_id, $sqlEmbD AS v FROM embeddings),
       |b AS (SELECT vec_id, ${sqlBucket("v")} AS bucket FROM e),
       |ed AS (SELECT a.vec_id AS src, c.vec_id AS dst
       |       FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id <> c.vec_id),
       |dg AS (SELECT src, count(*) AS deg FROM ed GROUP BY 1),
       |p0 AS (SELECT vec_id, CAST(10000 AS BIGINT) AS pr FROM b),
       |${round("p0", "p1")},
       |${round("p1", "p2")}
       |SELECT vec_id, pr, rank FROM (
       |  SELECT vec_id, pr,
       |    row_number() OVER (ORDER BY pr DESC, vec_id) AS rank
       |  FROM p2) t
       |WHERE rank <= 20
       |ORDER BY rank""".stripMargin
  }

  /** Oracle for q114: the same quantized assignment + within-cluster gate
    * in DuckDB — every distance/dot is BIGINT list algebra (list_reduce
    * preserves BIGINT), matching QuantizedDot's int64 accumulator.
    */
  private def sqlSemdedup: String = {
    def dotSql(x: String, y: String) =
      s"list_reduce(list_transform(range(1, ${Dim + 1}), i -> $x.qv[i] * $y.qv[i]), (acc, z) -> acc + z)"
    s"""WITH e AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, qv,
       |    list_reduce(list_transform(range(1, ${Dim + 1}), i -> qv[i] * qv[i]), (acc, z) -> acc + z) AS n2
       |  FROM e),
       |c AS (SELECT vec_id AS cent_id, qv, n2 FROM n WHERE vec_id < 4),
       |asg AS (
       |  SELECT vec_id, cent_id, qv, n2 FROM (
       |    SELECT n.vec_id, c.cent_id, n.qv, n.n2,
       |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
       |        n.n2 - 2 * ${dotSql("n", "c")} + c.n2, c.cent_id) AS rk
       |    FROM n CROSS JOIN c) t
       |  WHERE rk = 1),
       |pairs AS (
       |  SELECT a.cent_id, b.vec_id AS vb, ${dotSql("a", "b")} AS dp,
       |    a.n2 AS na2, b.n2 AS nb2
       |  FROM asg a JOIN asg b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id),
       |dupset AS (
       |  SELECT DISTINCT cent_id, vb FROM pairs
       |  WHERE dp > 0 AND 400 * dp * dp >= 81 * na2 * nb2),
       |sizes AS (SELECT cent_id, count(*) AS csize FROM asg GROUP BY 1),
       |dc AS (SELECT cent_id, count(*) AS dups FROM dupset GROUP BY 1)
       |SELECT s.cent_id, s.csize,
       |  CAST(coalesce(d.dups, 0) AS BIGINT) AS dups,
       |  CAST(s.csize - coalesce(d.dups, 0) AS BIGINT) AS kept
       |FROM sizes s LEFT JOIN dc d USING (cent_id)
       |ORDER BY cent_id""".stripMargin
  }

  /** Oracle for q108: the same farthest-point rounds in DuckDB, generated
    * so each pick round is textually identical. Distances are BIGINT
    * (list_reduce over BIGINT preserves the type) — exactly the int64
    * algebra ScaledSqDist computes with ccnt = 1.
    */
  private def sqlKmeansFpInit: String = {
    val dist =
      s"list_reduce(list_transform(range(1, ${Dim + 1}), " +
        "i -> (e.qv[i] - c.cqv[i]) * (e.qv[i] - c.cqv[i])), (acc, y) -> acc + y)"
    val distE2 = dist.replace("e.qv", "e2.qv")
    def pick(cin: String, pout: String): String =
      s"""$pout AS (
         |  SELECT vec_id AS cent_id, qv AS cqv FROM (
         |    SELECT m.vec_id, e3.qv,
         |      row_number() OVER (ORDER BY m.md DESC, m.vec_id) AS rk
         |    FROM (
         |      SELECT e2.vec_id, min($distE2) AS md
         |      FROM e e2 CROSS JOIN $cin c
         |      WHERE e2.vec_id NOT IN (SELECT cent_id FROM $cin)
         |      GROUP BY e2.vec_id) m
         |    JOIN e e3 ON e3.vec_id = m.vec_id) t
         |  WHERE rk = 1)""".stripMargin
    s"""WITH e AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
       |  FROM embeddings),
       |c0 AS (SELECT vec_id AS cent_id, qv AS cqv FROM e
       |       WHERE vec_id = (SELECT min(vec_id) FROM e)),
       |${pick("c0", "p1")},
       |c1 AS (SELECT * FROM c0 UNION ALL SELECT * FROM p1),
       |${pick("c1", "p2")},
       |c2 AS (SELECT * FROM c1 UNION ALL SELECT * FROM p2),
       |${pick("c2", "p3")},
       |c3 AS (SELECT * FROM c2 UNION ALL SELECT * FROM p3),
       |fin AS (
       |  SELECT vec_id, cent_id, sd FROM (
       |    SELECT e.vec_id, c.cent_id, CAST($dist AS BIGINT) AS sd,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY $dist, c.cent_id) AS rk
       |    FROM e CROSS JOIN c3 c) t
       |  WHERE rk = 1)
       |SELECT cent_id, count(*) AS csize,
       |  CAST(floor(CAST(sum(sd) AS DOUBLE) / count(*)) AS BIGINT) AS avg_dist_scaled
       |FROM fin
       |GROUP BY cent_id
       |ORDER BY cent_id""".stripMargin
  }

  /** Oracle for q49: the same unrolled greedy MMR in DuckDB. Generated so
    * each selection round is textually identical.
    */
  private def sqlMmrRerank: String = {
    def step(t: Int, selUnion: String): String =
      s"""p$t AS (
         |  SELECT query_id, cand_id AS sel_id, CAST($t AS BIGINT) AS step, score FROM (
         |    SELECT m.query_id, m.cand_id, 0.7 * c.rel - 0.3 * m.ms AS score,
         |      row_number() OVER (PARTITION BY m.query_id
         |                         ORDER BY (0.7 * c.rel - 0.3 * m.ms) DESC, m.cand_id) AS rk
         |    FROM (
         |      SELECT si.query_id, si.a_id AS cand_id, max(si.sim) AS ms
         |      FROM sims si
         |      JOIN ($selUnion) s ON si.query_id = s.query_id AND si.b_id = s.sel_id
         |      LEFT JOIN ($selUnion) z ON z.query_id = si.query_id AND z.sel_id = si.a_id
         |      WHERE z.sel_id IS NULL
         |      GROUP BY 1, 2) m
         |    JOIN cands c ON c.query_id = m.query_id AND c.cand_id = m.cand_id) t
         |  WHERE rk = 1)""".stripMargin
    def selUpTo(t: Int): String =
      (1 to t).map(i => s"SELECT query_id, sel_id FROM p$i").mkString(" UNION ALL ")
    s"""WITH e AS (SELECT vec_id, $sqlEmbD AS v FROM embeddings),
       |qs AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN (10, 11, 12)),
       |cands AS (
       |  SELECT query_id, cand_id, rel, v FROM (
       |    SELECT query_id, e.vec_id AS cand_id,
       |      list_dot_product(qv, v)
       |        / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS rel,
       |      e.v,
       |      row_number() OVER (PARTITION BY query_id ORDER BY
       |        list_dot_product(qv, v)
       |          / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) DESC,
       |        e.vec_id) AS rk
       |    FROM e CROSS JOIN qs WHERE e.vec_id <> qs.query_id) t
       |  WHERE rk <= 10),
       |sims AS (
       |  SELECT x.query_id, x.cand_id AS a_id, y.cand_id AS b_id,
       |    list_dot_product(x.v, y.v)
       |      / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))) AS sim
       |  FROM cands x JOIN cands y ON x.query_id = y.query_id AND x.cand_id <> y.cand_id),
       |p1 AS (
       |  SELECT query_id, cand_id AS sel_id, CAST(1 AS BIGINT) AS step, rel AS score FROM (
       |    SELECT query_id, cand_id, rel,
       |      row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, cand_id) AS rk
       |    FROM cands) t
       |  WHERE rk = 1),
       |${step(2, selUpTo(1))},
       |${step(3, selUpTo(2))},
       |${step(4, selUpTo(3))},
       |${step(5, selUpTo(4))}
       |SELECT query_id, step AS rank, sel_id AS vec_id, round(score, 6) AS score
       |FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2 UNION ALL SELECT * FROM p3
       |      UNION ALL SELECT * FROM p4 UNION ALL SELECT * FROM p5) u
       |ORDER BY query_id, rank""".stripMargin
  }

  /** Oracle for q48: the same two unrolled Lloyd iterations in DuckDB.
    * Generated so assignment/update CTEs stay textually identical per
    * round.
    */
  private def sqlKmeansRefine: String = {
    val dist =
      s"(CAST(list_reduce(list_transform(range(1, ${Dim + 1}), " +
        "i -> (c.ccnt * e.qv[i] - c.csum[i]) * (c.ccnt * e.qv[i] - c.csum[i])), (acc, y) -> acc + y) AS DOUBLE)" +
        " / CAST(c.ccnt * c.ccnt AS DOUBLE))"
    def assign(cin: String, aout: String): String =
      s"""$aout AS (
         |  SELECT vec_id, cent_id, qv FROM (
         |    SELECT e.vec_id, c.cent_id, e.qv,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY $dist, c.cent_id) AS rk
         |    FROM e CROSS JOIN $cin c) t
         |  WHERE rk = 1)""".stripMargin
    def update(ain: String, cout: String): String =
      s"""$cout AS (
         |  SELECT cent_id, array_agg(sx ORDER BY dim) AS csum, max(c) AS ccnt FROM (
         |    SELECT cent_id, i AS dim, CAST(sum(qv[i]) AS BIGINT) AS sx, count(*) AS c
         |    FROM $ain, range(1, ${Dim + 1}) r(i)
         |    GROUP BY 1, 2) t
         |  GROUP BY 1)""".stripMargin
    s"""WITH e AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
       |  FROM embeddings),
       |c0 AS (SELECT vec_id AS cent_id, qv AS csum, CAST(1 AS BIGINT) AS ccnt FROM e WHERE vec_id < 8),
       |${assign("c0", "a1")},
       |${update("a1", "c1")},
       |${assign("c1", "a2")},
       |${update("a2", "c2")},
       |fin AS (
       |  SELECT vec_id, cent_id, sd FROM (
       |    SELECT e.vec_id, c.cent_id, CAST(floor($dist) AS BIGINT) AS sd,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY $dist, c.cent_id) AS rk
       |    FROM e CROSS JOIN c2 c) t
       |  WHERE rk = 1)
       |SELECT cent_id, count(*) AS csize,
       |  CAST(floor(CAST(sum(sd) AS DOUBLE) / count(*)) AS BIGINT) AS avg_dist_scaled
       |FROM fin
       |GROUP BY cent_id
       |ORDER BY cent_id""".stripMargin
  }
}
