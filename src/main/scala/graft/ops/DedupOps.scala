package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators (SURVEY.md §2.9 E13): exact (content-hash
  * groupBy), MinHash+LSH near-dup (shingle → minhash → band → bucket join →
  * verify), SimHash signatures, and the end-to-end "kept documents" pass.
  *
  * Scale design:
  *  - the LSH path never computes O(n²) pairs — candidates come from an
  *    equi-join on (band, band-signature), a shuffle join keyed by bucket
  *    whose key space grows with the corpus, so it stays balanced at 100 TB;
  *  - signatures are per-row native expressions (graft.functions.MinHashSig
  *    / SimHashBits): map-only, no shuffle before the band join — one
  *    digest yields four 32-bit hash functions (8-hex-char windows), so
  *    the md5 count is shingles × 2 for 8 hash functions;
  *  - the verify join touches only candidate pairs.
  *
  * All hashes are md5-derived so the DuckDB oracle reproduces them
  * bit-for-bit (minhash compares 8-hex-char windows lexicographically —
  * order-isomorphic to comparing the 32-bit numeric hash).
  */
object DedupOps {

  import Tables._

  /** MinHash-LSH banding: 6 bands × 3 rows over 18 hashes — a MEASURED
    * re-tuning (round 12) of the original 4 bands × 2 rows. ScaleStress's
    * candidate-volume curve disconfirmed the old default at scale:
    * candidates/doc at 4×2 grew 0.21 → 0.89 → 2.28 across the 1×/10×/30×
    * decades (total candidate multiset ∝ n^1.8 — the moderate-Jaccard
    * mass of a templated corpus caught by a band whose S-curve midpoint
    * (1/4)^(1/2) = 0.50 sits far below the 0.8 verification gate), while
    * 6×3 stays flat at ≈ 0.15/doc (= c·n) because sub-gate mass is
    * suppressed as J³ instead of J². Recall at the gate IMPROVES
    * (per-pair miss at J = 0.84: (1−0.84³)⁶ ≈ 0.5% vs (1−0.84²)⁴ ≈ 0.8%;
    * 30× stress verified 21 371 vs 21 322 pairs) and end-to-end verified-
    * pair wall time drops 3.2× at 30×. Cost: 18 hashes ≈ 5 md5 calls per
    * shingle vs 2 — map-only, dominated by the candidate-volume win. The
    * DuckDB oracle CTEs are generated from these constants, so both
    * engines move together.
    */
  val NumHashes = 18 // 6 bands × 3 rows (LSH banding)
  val NumBands = 6
  val RowsPerBand = 3

  /** Text MinHash-LSH band geometry (numBands, rowsPerBand) — an explicit
    * knob + session confs, ORACLE-DEFAULTED, deliberately NOT size-derived
    * the way embedding-LSH's is. The physics differ: an embedding band key
    * is `bits` projected sign bits, so unrelated vectors collide at
    * 2^-bits and the multiset carries a pure GEOMETRY term
    * bands·n²/2^bits that grows with n no matter what the data is — width
    * must be derived from n. A text band signature is rowsPerBand
    * CONCATENATED 32-bit minhashes: the random term is bands·n²/2^(32·r),
    * < 1 collision even at n = 10⁹ with r = 2 — already zero. Every
    * remaining collision is similarity-driven, Σ_pairs bands·J(x,y)^r, a
    * property of the corpus's Jaccard distribution that a row count
    * cannot see. So there is nothing for n to derive; the honest default
    * is the threshold-matched recall geometry chosen by MEASURING the
    * candidate-volume curve across decades (ScaleStress `lsh_cand_*`
    * lines — how the shipped 6×3 displaced the original 4×2, see
    * [[NumHashes]]), and corpora whose moderate-J mass still grows
    * superlinearly get the knob: raise rowsPerBand (suppresses J < t
    * mass as J^r) and re-size numBands for recall ((1−t^r)^bands ≤
    * target). q226's band calibration curve measures the estimator
    * in-engine.
    */
  val TextNumBandsKey = "spark.graft.textLsh.numBands"
  val TextRowsPerBandKey = "spark.graft.textLsh.rowsPerBand"

  /** The geometry every oracle query pins implicitly (it is the default):
    * [[NumBands]] bands × [[RowsPerBand]] rows, mirrored verbatim by the
    * DuckDB CTE prefix ([[sqlPairsCte]]).
    */
  val OracleTextGeometry: (Int, Int) = (NumBands, RowsPerBand)
  require(NumBands * RowsPerBand == NumHashes,
    s"LSH banding constants disagree: $NumBands bands × $RowsPerBand rows != $NumHashes hashes")

  private def confInt(s: SparkSession, key: String): Option[Int] =
    s.conf.getOption(key).map { raw =>
      try raw.toInt
      catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(s"$key must be an integer, got '$raw'")
      }
    }

  private[graft] def textGeometry(
      s: SparkSession,
      geometry: Option[(Int, Int)]
  ): (Int, Int) = {
    val conf = (confInt(s, TextNumBandsKey), confInt(s, TextRowsPerBandKey)) match {
      case (Some(b), Some(r)) => Some((b, r))
      case (None, None)       => None
      case (b, r) =>
        throw new IllegalArgumentException(
          s"$TextNumBandsKey and $TextRowsPerBandKey must be set together " +
            s"(got numBands=${b.getOrElse("unset")}, rowsPerBand=${r.getOrElse("unset")})")
    }
    val (bands, rows) = geometry.orElse(conf).getOrElse(OracleTextGeometry)
    require(bands > 0 && rows > 0 && bands * rows <= 256,
      s"$TextNumBandsKey/$TextRowsPerBandKey must be positive with ≤ 256 total hashes " +
        s"(signature cost is linear in bands×rows), got $bands×$rows")
    (bands, rows)
  }

  /** Whitespace tokens (shared with TextOps). */
  private def toks: Column = split(trim(col("text")), "\\s+")

  /** Distinct word-ngram shingles of a token array. Documents with fewer
    * than n tokens yield an empty set — a bare sequence(0, size-n) would
    * DESCEND for short docs (e.g. sequence(0,-2) = [0,-1,-2]) and call
    * element_at with index 0/negative, where the oracle's range() is
    * simply empty.
    */
  def ngrams(tokens: Column, n: Int): Column =
    // native codegen'd gram builder (graft.functions.NGrams) — identical
    // output to array_distinct(transform(sequence(...), concat_ws(...)))
    // incl. first-occurrence order and the short-array guard, but one
    // compiled loop instead of interpreted HOF lambdas; gram construction
    // is the dominant map work of q31/q32/q35/q37
    graft.functions.TextFunctions.nGrams(tokens, n)

  /** Word-3gram shingles (the MinHash/LSH unit). */
  def shingles(tokens: Column): Column = ngrams(tokens, 3)

  /** (doc_id, tok: array<string>) with the token array MATERIALIZED: the
    * `repartition(doc_id)` is a deliberate barrier — without it,
    * CollapseProject inlines the split() into every element_at of every
    * shingle lambda (~3×shingles regex splits of the full text per doc).
    * It also hash-pre-partitions on doc_id, which the downstream signature
    * aggregation reuses (single shuffle total), and spreads the
    * single-file parquet scan across cores.
    */
  private def tokenized(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), toks.as("tok"))
      .repartition(col("doc_id"))

  /** (doc_id, s: array<string>) — the shingle sets (for verification). */
  private def shingleSets(s: SparkSession, d: String): DataFrame =
    tokenized(s, d).select(col("doc_id"), shingles(col("tok")).as("s"))

  /** (doc_id, s, h): shingle sets plus their xxhash64 images, computed
    * once at cache-materialization time. ONE cached pass serves both
    * consumers: the signature/band legs select only `s`, the verify join
    * selects only `h` — Spark's in-memory cache is columnar and prunes to
    * the selected columns, so each leg deserializes only what it reads.
    * `h` is what makes the verify join's shuffle payload hash-sized
    * instead of string-sized (see [[jaccardHashed]] for the collision
    * bound that keeps it oracle-exact).
    */
  private def shingleSetsHashed(s: SparkSession, d: String): DataFrame =
    shingleSets(s, d).withColumn("h", expr("transform(s, x -> xxhash64(x))"))

  /** (doc_id, sid, p0, p1): maximal duplicated token regions — positional
    * (non-distinct, 1-based) 8-grams held by ≥ 2 distinct docs, per-doc
    * hit positions merged at pos-gap ≤ 8: positions p < q cover token
    * windows [p, p+7] / [q, q+7], which overlap or touch exactly when
    * q − p ≤ 8, so each merged region covers exactly p1 − p0 + 8 tokens
    * and regions are disjoint. Persisted — q246 (the audit) and q247
    * (the scrubber) share the gram-join materialization, which is the
    * expensive part (the spans frame itself is region-sized).
    */
  private def duplicatedSpans(s: SparkSession, d: String): DataFrame =
    Caches.buildScope("duplicated_spans") {
    import org.apache.spark.sql.expressions.Window
    val grams = tokenized(s, d)
      .filter(size(col("tok")) >= 8)
      .select(
        col("doc_id"),
        posexplode(
          expr("transform(sequence(1, size(tok) - 7), i -> array_join(slice(tok, i, 8), ' '))")
        ).as(Seq("p", "gram"))
      )
      .select(col("doc_id"), (col("p") + 1).as("pos"), col("gram"))
    val dup = grams
      .groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("gram"))
    // DISTINCT: the same gram can recur within one doc at many positions
    // AND collide with several docs — one hit per position
    val hits = grams
      .join(dup, Seq("gram"), "left_semi")
      .select(col("doc_id"), col("pos"))
      .distinct()
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val sp = hits
      .withColumn(
        "brk",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) <= 8, 0L).otherwise(1L)
      )
      .withColumn(
        "sid",
        sum(col("brk")).over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      )
    Caches.persisted(
      sp.groupBy(col("doc_id"), col("sid"))
        .agg(min(col("pos")).as("p0"), max(col("pos")).as("p1"))
    )
  }

  /** (doc_id, n, s) — distinct word-5gram sets, persisted. Shared by the
    * inverted-index join (q35) and the prefix-filter join (q130): the two
    * plans canonicalize to the same cache entry, so within a session the
    * gram materialization is paid once.
    */
  private def gram5Sets(s: SparkSession, d: String): DataFrame =
    Caches.buildScope("gram5_sets") {
      tokenized(s, d)
        .select(col("doc_id"), ngrams(col("tok"), 5).as("s"))
        .select(col("doc_id"), size(col("s")).as("n"), col("s"))
        .transform(Caches.persisted)
    }

  /** Prefix-filtering candidate pairs (Chaudhuri/Bayardo/Xiao AllPairs-
    * PPJoin family) for Jaccard ≥ 0.5 over word-5gram sets — the EXACT
    * set-similarity-join refinement of q35's share-any-gram inverted
    * index. Under a global token order (here: document frequency
    * ascending, rarest first, ties lexicographic), two sets with
    * J(x,y) ≥ t must share a token within their first
    * |x| − ⌈t·|x|⌉ + 1 tokens: J ≥ t implies |x∩y| ≥ ⌈t·|x|⌉ (from
    * J = O/(|x|+|y|−O) ≥ t and |y| ≥ O), and omitting fewer than
    * ⌈t·|x|⌉ − 1 + 1 elements cannot avoid every one of ≥⌈t·|x|⌉ shared
    * elements. So the equi-join of PREFIXES recalls every qualifying
    * pair (RecallSpec pins this against driver-side brute force) while
    * proposing a fraction of q35's candidates: frequent grams — the
    * Σ count² hot spots of the postings join — sort to the END of the
    * global order and mostly fall OUT of prefixes. That is the knob q35's
    * Scaladoc reserves for hot-gram corpora, worth one extra doc_id
    * shuffle (the rank window) + a tiny gram-df aggregate.
    * Returns (doc_a, doc_b) candidates, doc_a < doc_b.
    */
  def prefixCandidates(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g5 = gram5Sets(s, d)
    val post = g5.select(col("doc_id"), col("n"), explode(col("s")).as("gram"))
    val gdf = post.groupBy(col("gram")).agg(count(lit(1)).as("gdf"))
    val prefixes = post
      .join(gdf, Seq("gram"))
      .withColumn(
        "rk",
        row_number().over(Window.partitionBy(col("doc_id")).orderBy(col("gdf"), col("gram")))
      )
      // prefix length |x| − ⌈0.5·|x|⌉ + 1 in pure integer algebra
      .filter(col("rk") <= col("n") - expr("(n + 1) div 2") + 1)
      .select(col("doc_id"), col("gram"))
      // both self-join legs read the prefix postings — persisted, the
      // df-join + rank window run once instead of once per leg
      .transform(Caches.persisted)
    prefixes.as("a")
      .join(prefixes.as("b"), col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** MinHash signatures mh0..mh{n-1} (per-row native MinHashSig).
    * Hash k is the 8-hex-char window `1 + 8*(k%4) .. +8` of
    * md5("<k/4>:" + shingle) — identical to the oracle's list formulation.
    */
  def minhashSignatures(s: SparkSession, d: String, numHashes: Int): DataFrame =
    // the HASHED frame: when the lshPairs chain has it cached this rides
    // the same CacheManager entry (plan-keyed); when not cached, column
    // pruning deletes the unused `h` projection, so it costs nothing
    minhashFromShingles(shingleSetsHashed(s, d), numHashes)

  /** Signature aggregation over an existing (doc_id, s) shingle-set DF —
    * separated so callers can compute signatures from a persisted shingle
    * pass instead of re-deriving tokenize→shingle from the source scan.
    */
  def minhashFromShingles(shingleDf: DataFrame, numHashes: Int): DataFrame = {
    // per-document native signature (graft.functions.MinHashSig): map-only;
    // the explode → md5 → min-aggregate form shuffled every shingle row to
    // aggregate what each document holds locally (identical 8-hex-window
    // min, incl. NULL columns for shingle-less short docs)
    val sig = graft.functions.TextFunctions.minHashSig(col("s"), numHashes)
    shingleDf.select(
      col("doc_id") +: (0 until numHashes).map(k => element_at(sig, k + 1).as(s"mh$k")): _*
    )
  }

  /** DuckDB SQL fragments mirroring the Spark expressions above. */
  private val sqlTok = "string_split_regex(trim(text), '\\s+')"
  private val sqlShingles =
    "list_distinct(list_transform(range(1, len(tok)-1), i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2]))"
  private def sqlMinhash(k: Int) =
    s"list_min(list_transform(s, x -> substr(md5('${k / 4}:' || x), ${1 + 8 * (k % 4)}, 8)))"

  /** Exact word-3gram Jaccard between two distinct shingle-set columns. */
  def jaccard(a: Column, b: Column): Column =
    round(size(array_intersect(a, b)).cast("double") / size(array_union(a, b)), 4)

  /** Jaccard over 64-bit HASHED shingle sets — same formula, ~2.5×
    * lighter verify-join payload (a ~250-shingle doc ships ~2 KB of
    * longs instead of ~5 KB of strings, and long equality beats string
    * equality inside intersect/union). Exactness: equals the string
    * Jaccard unless two DISTINCT shingles inside one pair's union collide
    * in xxhash64 — P ≤ u²/2⁶⁵ per pair (u = |union|; u ≈ 500 ⇒ ~7·10⁻¹⁵),
    * and a single collision shifts the ratio by ≤ 1/u, under the 4-decimal
    * rounding for u > 10⁴'s reciprocal. The oracle family (q32/q34/q35/
    * q101/…) gates the equality at sf0.01 and sf0.1 — same stance as
    * q226_minhash_error's estimator calibration.
    */
  def jaccardHashed(a: Column, b: Column): Column = jaccard(a, b)

  /** MinHash-LSH candidate-pair pipeline: returns (doc_a, doc_b, jaccard)
    * for verified near-dup pairs at the given threshold.
    */
  /** (doc_id, source, fp [, carry...]) for every 64-token stride-32 window
    * of a documents-shaped frame — pure Column algebra (sequence → explode
    * → slice → md5), so the SAME projection runs on a batch table (q106)
    * or an unbounded stream (window-granular streaming dedup: follow with
    * `EventTime.dedupStream` on `fp` and state stays watermark-bounded).
    * `carry` names extra columns to thread through (e.g. the event-time
    * column a streaming consumer watermarks on).
    */
  def windowFingerprints(docs: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val carried = carry.map(col)
    docs
      .select(Seq(col("doc_id"), col("source"), TextOps.tokens(col("text")).as("toks")) ++ carried: _*)
      .withColumn("n", size(col("toks")).cast("long"))
      .filter(col("n") >= 1)
      .withColumn("start", explode(expr("sequence(1L, n, 32L)")))
      .select(
        Seq(
          col("doc_id"),
          col("source"),
          md5(concat_ws(" ", expr("slice(toks, start, 64)"))).as("fp")
        ) ++ carried: _*
      )
  }

  def lshPairs(
      s: SparkSession,
      d: String,
      threshold: Double,
      geometry: Option[(Int, Int)] = None
  ): DataFrame =
    Caches.buildScope("lsh_pairs") {
    val (numBands, rowsPerBand) = textGeometry(s, geometry)
    // The shingle pass is persisted (memory-and-disk): the band join's two
    // legs and the verification joins all re-derive from it — unpersisted,
    // each leg re-ran tokenize→shingle from the source scan (4 parquet
    // scans of `documents` in the round-1 executed plan). At 100 TB the
    // materialization is corpus-sized but disk-backed, and one
    // materialized pass beats four recomputed ones. Spark's CacheManager
    // keys cache entries by canonicalized plan, so q32 and q34 (which
    // rebuilds this DAG) share the same materialized data within a session.
    // Caches are session-scoped; `Caches.invalidate()` releases them
    // between workloads (a long-lived service would materialize signatures
    // as a table instead).
    val sh = Caches.persisted(shingleSetsHashed(s, d))
    val cand = candidatesFrom(sh, numBands, rowsPerBand)
    // Verification joins the HASHED shingle sets: the join itself only
    // materializes candidate rows, and each side ships ~2 KB of longs per
    // doc instead of ~5 KB of strings — the one measured 100× residual of
    // this chain (replicating ~250-element string sets per candidate
    // pair). jaccardHashed documents the collision bound that keeps the
    // hashed ratio oracle-exact. (A semi-join prune of the shingle side
    // by candidate ids helps when candidates ≪ corpus AND the candidate
    // DAG is cached — without caching it recomputes the signature subtree
    // and measures slower at this scale; revisit with a persisted
    // candidate set if the corpus/candidate ratio grows.)
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("h").as("ha")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("h").as("hb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), jaccardHashed(col("ha"), col("hb")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      // verified pairs are tiny; persisting them lets the kept-set query
      // (q34) skip the band join + verify instead of just their inputs
      .transform(Caches.persisted)
  }

  /** Unverified banded candidates for a table dir — the measurement
    * entrypoint for ScaleStress's candidates-per-doc curve (the claim the
    * oracle-defaulted geometry rests on: this corpus family's candidate
    * multiset stays ≈ c·n across decades).
    */
  private[graft] def lshCandidates(
      s: SparkSession,
      d: String,
      geometry: Option[(Int, Int)] = None
  ): DataFrame = {
    val (numBands, rowsPerBand) = textGeometry(s, geometry)
    // same augmented frame as lshPairs so the two share one CacheManager
    // entry (plan-keyed) when measured in the same session
    candidatesFrom(Caches.persisted(shingleSetsHashed(s, d)), numBands, rowsPerBand)
  }

  /** Unverified banded candidates (doc_a < doc_b, distinct) from a
    * (doc_id, s) shingle frame at an explicit geometry — the pre-verify
    * stage of [[lshPairs]], factored so ScaleStress can measure the
    * candidate MULTISET (the Σ|bucket|² term the geometry controls)
    * separately from verification cost.
    */
  private[graft] def candidatesFrom(
      sh: DataFrame,
      numBands: Int,
      rowsPerBand: Int
  ): DataFrame = {
    // signatures are NOT persisted: since MinHashSig they are a cheap
    // map-only projection of the cached shingle pass — re-deriving them
    // for the band join's two legs beats encoding the hash columns into
    // the cache (same persist-vs-recompute call as the LSH postings)
    val sigs = minhashFromShingles(sh, numBands * rowsPerBand)
    // a band signature is rowsPerBand concatenated 8-hex-char minhashes;
    // shingle-less docs carry NULL hashes → NULL bsig → never equi-match
    val bands = sigs.select(
      col("doc_id"),
      explode(
        array((0 until numBands).map { b =>
          struct(
            lit(b).as("band"),
            concat((0 until rowsPerBand).map(j => col(s"mh${rowsPerBand * b + j}")): _*).as("bsig")
          )
        }: _*)
      ).as("bk")
    ).select(col("doc_id"), col("bk.band").as("band"), col("bk.bsig").as("bsig"))
    bands.as("a")
      .join(bands.as("b"), Seq("band", "bsig"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Shared oracle CTE prefix: tokens → shingles → signatures → bands →
    * verified pairs at the given threshold. `recursive = true` emits
    * `WITH RECURSIVE` so callers can append a recursive CTE (DuckDB scopes
    * the RECURSIVE keyword to the whole WITH clause).
    */
  /** The band-signature concatenation over [[RowsPerBand]] 1-based sig
    * slots — generated from the constants so the oracle CTE can never
    * drift from the engine's banding.
    */
  private def sqlBsig: String =
    (1 to RowsPerBand).map(j => s"sig[$RowsPerBand*b + $j]").mkString(" || ")

  private[ops] def sqlPairsCte(threshold: Double, recursive: Boolean = false): String = {
    val sigList = (0 until NumHashes).map(sqlMinhash).mkString("[", ", ", "]")
    s"""WITH ${if (recursive) "RECURSIVE " else ""}t AS (SELECT doc_id, $sqlTok AS tok FROM documents),
       |sh AS (SELECT doc_id, $sqlShingles AS s FROM t),
       |mh AS (SELECT doc_id, s, $sigList AS sig FROM sh),
       |bands AS (SELECT doc_id, b AS band, $sqlBsig AS bsig
       |          FROM mh CROSS JOIN (SELECT unnest(range($NumBands)) AS b) r),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM bands a JOIN bands b
       |           ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
       |pairs AS (SELECT doc_a, doc_b, jaccard FROM (
       |  SELECT doc_a, doc_b,
       |    round(CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
       |          / len(list_distinct(list_concat(x.s, y.s))), 4) AS jaccard
       |  FROM cand JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b) v
       |  WHERE jaccard >= $threshold)""".stripMargin
  }

  /** Shared oracle CTE prefix for the winnowing family (q175 density,
    * q181 candidate pairs): tokens -> positioned 4-gram hashes (the
    * hash*2^24 + pos combined key) -> per-position sliding-window-of-5
    * minima. Window starts are valid for i <= m - 4; `t` carries source
    * and the token list for downstream CTEs. One definition keeps the
    * density audit and the candidate generator selecting the SAME
    * fingerprints.
    */
  private def sqlWinnowCte: String =
    s"""WITH t AS (SELECT doc_id, source, $sqlTok AS ts FROM documents),
       |g AS (
       |  SELECT doc_id, source, ts,
       |    CAST(len(ts) AS BIGINT) - 3 AS m,
       |    unnest(range(1, greatest(CAST(len(ts) AS INTEGER) - 2, 1))) AS i
       |  FROM t),
       |h AS (
       |  SELECT doc_id, source, i, m,
       |    ${TextOps.sqlHex8("md5(array_to_string(ts[i:i+3], ' '))")} * 16777216
       |      + (i - 1) AS hk
       |  FROM g),
       |sel AS (
       |  SELECT doc_id, i, m,
       |    min(hk) OVER (PARTITION BY doc_id ORDER BY i
       |      ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS key
       |  FROM h)""".stripMargin

  /** Winnow fingerprint pair spans, shared by q198 (localization) and q201
    * (salvage): decode the packed hash·2²⁴+pos keys, posting-list
    * equi-join on the hash with doc_a < doc_b, per-pair aggregate of
    * matched distinct fingerprints and positional spans (max(pos) −
    * min(pos) + 8, the gram reach), gated at ≥ 3 shared fingerprints.
    * One definition keeps both audits agreeing on which pairs overlap and
    * how wide the shared region is. Spans are RAW here (can exceed the
    * doc's token count by up to gram−1 = 4 on full-document matches) —
    * consumers clamp with least(span, n) before any per-length ratio.
    */
  private def winnowPairSpans(s: SparkSession, d: String): DataFrame = {
    val k = documents(s, d)
      .select(
        col("doc_id"),
        explode(
          graft.functions.TextFunctions.winnowKeys(TextOps.tokens(col("text")), 4, 5)
        ).as("key")
      )
      .select(
        col("doc_id"),
        shiftright(col("key"), 24).as("f"),
        col("key").bitwiseAND(lit(16777215L)).as("pos")
      )
    k.as("a")
      .join(k.as("b"), col("a.f") === col("b.f") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(
        countDistinct(col("a.f")).as("matched"),
        (max(col("a.pos")) - min(col("a.pos")) + 8L).as("span_a"),
        (max(col("b.pos")) - min(col("b.pos")) + 8L).as("span_b")
      )
      .filter(col("matched") >= 3L)
  }

  /** SQL twin of [[winnowPairSpans]]: extends [[sqlWinnowCte]] with the
    * decoded posting list `k` and the gated pair-span CTE `pr`
    * (doc_a, doc_b, matched, span_a, span_b — spans raw, see above).
    */
  private def sqlWinnowPairCte: String =
    s"""$sqlWinnowCte,
       |k AS (SELECT DISTINCT doc_id, key // 16777216 AS f,
       |        key % 16777216 AS pos
       |      FROM sel WHERE i <= m - 4),
       |pr AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(count(DISTINCT a.f) AS BIGINT) AS matched,
       |    CAST(max(a.pos) - min(a.pos) + 8 AS BIGINT) AS span_a,
       |    CAST(max(b.pos) - min(b.pos) + 8 AS BIGINT) AS span_b
       |  FROM k a JOIN k b ON a.f = b.f AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |  HAVING count(DISTINCT a.f) >= 3)""".stripMargin

  /** Connected components by iterative min-label propagation over an
    * undirected edge list: every node's label converges to the smallest
    * node id reachable from it, i.e. clusters of transitively-connected
    * near-duplicates (a verified pair (a,b) plus (b,c) must collapse to
    * ONE canonical doc — the pairwise kept-set of q34 can't see the
    * transitive link).
    *
    * Scale design: each round is one shuffle of the EDGE list (near-dup
    * pairs — orders of magnitude smaller than the corpus) joined to the
    * label table, and converges in O(component diameter) rounds. Near-dup
    * components are band-join candidates verified at high Jaccard, so they
    * are dense and shallow (diameter a handful of hops even when the
    * corpus grows 1000×) — rounds stay single-digit at 100 TB. Labels are
    * `localCheckpoint`ed each round: analysis/codegen cost compounds with
    * plan depth on iterative DataFrames (see q48/q49 history). NOTE
    * localCheckpoint is NOT fault-tolerant — it truncates lineage, so
    * losing an executor that holds checkpointed label blocks fails the
    * job (Spark reruns it from the start; the persisted edge list makes
    * the rerun cheap but does not resume the iteration). A run that
    * cannot afford job-level retry should swap in reliable
    * `checkpoint()` against a durable checkpoint dir — same call shape,
    * one extra write per round. Superseded rounds' blocks are freed by
    * the ContextCleaner once the prior Dataset is unreferenced, i.e.
    * lazily; peak block footprint is ~2 rounds of the label table (tiny
    * relative to the corpus). Convergence is detected by the label-sum
    * fixpoint: labels only ever decrease, so an unchanged sum means no
    * label moved. If `maxRounds` elapses before the fixpoint, the labels
    * are only partially propagated — that is a WRONG answer, so the
    * routine switches to [[starComponents]] (alternating large-star/
    * small-star, O(log n) rounds) instead of returning it: adversarial
    * long-chain graphs get the logarithmic algorithm, while the common
    * near-dup workload keeps the cheaper one-join-per-round loop.
    *
    * Input columns: (src, dst) directed both ways or either way — the
    * routine symmetrizes. Output: (node, lbl) with lbl = min node id of
    * the component.
    */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 50): DataFrame =
    Caches.buildScope("connected_components") {
    val edges = pairs
      .toDF("src", "dst")
      .union(pairs.toDF("dst", "src").select(col("src"), col("dst")))
      .distinct()
      .transform(Caches.persisted)
    // Fixpoint metrics ride the checkpoint job (guide §2.6: driver-bound
    // fixed costs): each round used to run TWO jobs — the localCheckpoint
    // materialization and a separate sum(lbl) aggregate over the fresh
    // checkpoint (plus, before the loop, an isEmpty probe and the initial
    // sum — two more). observe() folds the fixpoint aggregate into the
    // SAME job that materializes the labels (CollectMetricsExec
    // accumulates while the checkpoint consumes the rows), halving
    // per-round job count. The per-round JOIN plan — the edge shuffle
    // that dominates at 100 TB — is unchanged; only the convergence
    // bookkeeping moved.
    val fixpointMetrics = Seq(coalesce(sum(col("lbl")), lit(0L)), count(lit(1)))
    var (labels, init) = checkpointObserved(
      edges
        .select(col("src").as("node"))
        .distinct()
        .withColumn("lbl", col("node")),
      fixpointMetrics)
    if (init(1) > 0L) {
      var prevSum = init.head
      var rounds = 0
      var converged = false
      while (!converged && rounds < maxRounds) {
        val byDst = labels.select(col("node").as("dst"), col("lbl").as("dlbl"))
        val prop = edges
          .join(byDst, "dst")
          .groupBy(col("src").as("node"))
          .agg(min(col("dlbl")).as("plbl"))
        val (next, m) = checkpointObserved(
          labels
            .join(prop, Seq("node"), "left")
            .select(
              col("node"),
              least(col("lbl"), coalesce(col("plbl"), col("lbl"))).as("lbl")
            ),
          fixpointMetrics)
        labels = next
        val sumNow = m.head
        converged = sumNow == prevSum
        prevSum = sumNow
        rounds += 1
      }
      if (!converged) {
        // a long-chain graph exhausted the O(diameter) budget — rerun
        // with the O(log n) star alternation rather than returning the
        // partially-propagated (wrong) labels or failing a job the star
        // algorithm can finish
        labels = starComponents(edges)
      }
    }
    labels
  }

  /** `localCheckpoint()` + long-typed aggregate metrics in ONE job: the
    * metrics are attached with `observe()` below the checkpoint, so
    * CollectMetricsExec accumulates them while the checkpoint action
    * consumes the rows — no second pass over the just-materialized frame
    * for an iterative loop's convergence check. Metric values arrive on
    * the (asynchronous) listener bus right after the action returns; the
    * bounded poll covers bus delivery, and the direct-aggregate fallback
    * keeps convergence detection correct even if delivery never happens
    * (one extra job in that pathological case — exactly the pre-fusion
    * behavior). Every metric expression must be a LongType aggregate.
    */
  /** Times the one-job fusion missed the listener bus and re-aggregated
    * (test observability: the fusion is pointless if this path runs).
    */
  private[graft] val observedFallbacks = new java.util.concurrent.atomic.AtomicLong()

  private def checkpointObserved(
      df: DataFrame,
      metrics: Seq[org.apache.spark.sql.Column]
  ): (DataFrame, Seq[Long]) = {
    val named = metrics.zipWithIndex.map { case (c, i) => c.as(s"m$i") }
    val obs = org.apache.spark.sql.Observation()
    val out = df.observe(obs, named.head, named.tail: _*).localCheckpoint()
    val row =
      try Some(scala.concurrent.Await.result(
        obs.future, scala.concurrent.duration.Duration(10, "seconds")))
      catch { case _: java.util.concurrent.TimeoutException => None }
    val vals = row match {
      case Some(r) => metrics.indices.map(i => r.getAs[Long](s"m$i"))
      case None =>
        observedFallbacks.incrementAndGet()
        val r = out.agg(metrics.head, metrics.tail: _*).head()
        metrics.indices.map(r.getLong)
    }
    (out, vals)
  }

  /** Connected components by alternating large-star/small-star (Kiveris
    * et al., "Connected Components in MapReduce and Beyond", SoCC'14):
    * converges in O(log n) rounds on ANY graph — including paths and
    * other long chains, where min-label propagation needs O(diameter)
    * rounds — while touching only the edge list.
    *
    * Round shape: large-star connects every neighbor larger than u to
    * u's minimum neighborhood label (one groupBy-min over the symmetric
    * adjacency + one equi-join back); small-star does the same for the
    * smaller neighbors over the resulting downward edges. Both halves
    * are edge-list-only shuffles, same scale envelope as the propagation
    * loop. Edges keep the (hi > lo) canonical orientation throughout;
    * the fixpoint is a star forest rooted at each component's minimum,
    * read off directly as the label table. Convergence is detected by an
    * edge-set fingerprint (count + two xxhash64 XOR folds, observed on
    * the checkpoint job itself); `localCheckpoint` per round truncates
    * the iterative lineage exactly like the propagation loop (same
    * fault-tolerance caveat documented there).
    *
    * Input columns: (src, dst) in either orientation; self-loops are
    * dropped but their nodes keep a singleton label. Output: (node, lbl)
    * with lbl = min node id of the component.
    */
  def starComponents(pairs: DataFrame, maxRounds: Int = 50): DataFrame =
    Caches.buildScope("star_components") {
    val raw = pairs.toDF("u", "v")
    val nodes = raw
      .select(col("u").as("node"))
      .union(raw.select(col("v").as("node")))
      .distinct()
      .localCheckpoint()
    // edge-set fingerprint: count + two order-independent XOR folds of
    // per-edge hashes (XOR, unlike sum, cannot overflow under ANSI
    // arithmetic; two hash seeds make a coincidental collision
    // negligible). Edges are distinct, so XOR cancellation of repeated
    // rows cannot occur. The fingerprint rides each round's checkpoint
    // job via checkpointObserved — same one-job-per-round fusion as the
    // propagation loop.
    val fingerprintMetrics = Seq(
      count(lit(1)),
      coalesce(bit_xor(xxhash64(col("hi"), col("lo"))), lit(0L)),
      coalesce(bit_xor(xxhash64(col("lo"), col("hi"))), lit(0L))
    )
    var (edges, prev) = checkpointObserved(
      raw
        .filter(col("u") =!= col("v"))
        .select(greatest(col("u"), col("v")).as("hi"), least(col("u"), col("v")).as("lo"))
        .distinct(),
      fingerprintMetrics)
    var rounds = 0
    var converged = prev.head == 0L
    while (!converged && rounds < maxRounds) {
      // large-star: for each node a, m = min(N(a) ∪ {a}); every neighbor
      // b > a re-attaches to m
      val sym = edges
        .select(col("hi").as("a"), col("lo").as("b"))
        .union(edges.select(col("lo").as("a"), col("hi").as("b")))
      val lmin = sym
        .groupBy(col("a"))
        .agg(min(col("b")).as("mn"))
        .select(col("a"), least(col("a"), col("mn")).as("m"))
      val ls = sym
        .join(lmin, "a")
        .filter(col("b") > col("a"))
        .select(col("b").as("hi"), col("m").as("lo"))
        .filter(col("hi") =!= col("lo"))
        .distinct()
      // small-star: over downward edges (hi → lo), every lo re-attaches
      // to min(N⁻(hi)), and hi itself attaches there too
      val smin = ls.groupBy(col("hi")).agg(min(col("lo")).as("mn"))
      val (next, now) = checkpointObserved(
        ls
          .join(smin, "hi")
          .select(col("lo").as("n"), col("mn"))
          .union(smin.select(col("hi").as("n"), col("mn")))
          .filter(col("n") =!= col("mn"))
          .distinct()
          .select(col("n").as("hi"), col("mn").as("lo")),
        fingerprintMetrics)
      edges = next
      converged = now == prev
      prev = now
      rounds += 1
    }
    require(
      converged,
      s"starComponents did not converge after $maxRounds rounds - " +
        "O(log n) rounds should never exceed this budget; the edge list " +
        "is changing every round (data issue or maxRounds set too low)"
    )
    // the star forest reads off as the label table; nodes that lost all
    // edges (self-loop-only inputs) label themselves
    val labeled = edges
      .select(col("hi").as("node"), col("lo").as("lbl"))
      .union(edges.select(col("lo").as("node"), col("lo").as("lbl")))
      .distinct()
    labeled.union(
      nodes
        .join(labeled.select(col("node")), Seq("node"), "left_anti")
        .select(col("node"), col("node").as("lbl"))
    )
  }

  /** Near-dup cluster map for the corpus: (node, lbl) over the verified
    * LSH pairs at the given threshold.
    */
  def dedupClusters(
      s: SparkSession,
      d: String,
      threshold: Double,
      geometry: Option[(Int, Int)] = None
  ): DataFrame =
    connectedComponents(lshPairs(s, d, threshold, geometry).select(col("doc_a"), col("doc_b")))

  /** Oracle fragment: recursive min-reachable-label over the pairs CTE —
    * `reach` enumerates every (node, reachable node) and the GROUP BY
    * takes the min, the declarative twin of label propagation.
    */
  private val sqlComponentsCte: String =
    """edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
      |          UNION SELECT doc_b, doc_a FROM pairs),
      |reach(node, lbl) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT e.src, r.lbl FROM reach r JOIN edges e ON e.dst = r.node),
      |lab AS (SELECT node, min(lbl) AS lbl FROM reach GROUP BY node)""".stripMargin

  /** 16-bit SimHash via explode + one scalar md5 per token: bit p is the
    * sign of the sum over tokens of ±1 by the parity of hex digit p of
    * md5(token). Duplicate tokens weight naturally.
    */
  def simhashSignatures(s: SparkSession, d: String): DataFrame =
    // per-document native expression (graft.functions.SimHashBits, 16
    // nibble-parity bits): map-only, replacing explode → md5 per row →
    // 16-sum aggregate — a corpus shuffle for a per-row answer
    documents(s, d)
      .select(
        col("doc_id"),
        graft.functions.TextFunctions.simHashBits(toks, 16, 1).as("simhash")
      )

  private val sqlSimhash: String =
    (1 to 16).map { p =>
      s"""CASE WHEN list_sum(list_transform(tok,
         |  t -> 2 * ((strpos('0123456789abcdef', substr(md5(t), $p, 1)) - 1) % 2) - 1)) >= 0
         |THEN '1' ELSE '0' END""".stripMargin
    }.mkString(" || ")

  /** 64-bit SimHash: bit p is the sign of the token-sum of ±1 by bit
    * ((p−1) mod 4) of hex digit ((p−1)/4 + 1) of md5(token). 64 bits (vs
    * the 16-bit profile of q33) so that random collisions vanish and a
    * small hamming radius isolates true near-duplicates.
    */
  def simhash64(s: SparkSession, d: String): DataFrame =
    // per-document native expression (graft.functions.SimHashBits, 16
    // nibbles × 4 bit-lanes = 64 bits): map-only. The previous
    // explode + lane-packed wide aggregate (16 packed sums in 16-bit
    // lanes of longs, to stay inside codegen buffer limits) paid a corpus
    // shuffle and most of its wall-clock in generated-aggregate compile;
    // a per-row loop needs neither. Bit p is '1' iff 2·ones ≥ n — the
    // same majority algebra the oracle mirrors.
    documents(s, d)
      .select(
        col("doc_id"),
        graft.functions.TextFunctions.simHashBits(toks, 16, 4).as("sh")
      )

  private val sqlSimhash64: String =
    (1 to 64).map { p =>
      s"""CASE WHEN list_sum(list_transform(tok,
         |  t -> 2 * (((strpos('0123456789abcdef', substr(md5(t), ${(p - 1) / 4 + 1}, 1)) - 1) // ${1 << ((p - 1) % 4)}) % 2) - 1)) >= 0
         |THEN '1' ELSE '0' END""".stripMargin
    }.mkString(" || ")

  val queries: Seq[Q] = Seq(
    // Exact dedup: content-hash groups with kept (min) id.
    Q(
      "q30_exact_dedup",
      (s, d) =>
        documents(s, d)
          .groupBy(md5(lower(trim(col("text")))).as("fingerprint"))
          .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keep_id"))
          .orderBy(col("fingerprint")),
      Some("""SELECT md5(lower(trim(text))) AS fingerprint,
             |  count(*) AS cnt, min(doc_id) AS keep_id
             |FROM documents
             |GROUP BY 1
             |ORDER BY fingerprint""".stripMargin)
    ),

    // MinHash signatures (first 4 hash functions).
    Q(
      "q31_minhash_sig",
      (s, d) =>
        minhashSignatures(s, d, 4)
          .select(col("doc_id"), col("mh0"), col("mh1"), col("mh2"), col("mh3"))
          .orderBy(col("doc_id")),
      Some(s"""WITH t AS (SELECT doc_id, $sqlTok AS tok FROM documents),
              |sh AS (SELECT doc_id, $sqlShingles AS s FROM t)
              |SELECT doc_id, ${(0 until 4).map(k => s"${sqlMinhash(k)} AS mh$k").mkString(", ")}
              |FROM sh
              |ORDER BY doc_id""".stripMargin)
    ),

    // MinHash-LSH near-dup pairs, band-join candidates verified by exact
    // 3-gram Jaccard ≥ 0.8.
    Q(
      "q32_minhash_lsh_pairs",
      (s, d) => lshPairs(s, d, 0.8).orderBy(col("doc_a"), col("doc_b")),
      Some(s"""${sqlPairsCte(0.8)}
              |SELECT doc_a, doc_b, jaccard FROM pairs
              |ORDER BY doc_a, doc_b""".stripMargin)
    ),

    // SimHash signatures.
    Q(
      "q33_simhash",
      (s, d) => simhashSignatures(s, d).orderBy(col("doc_id")),
      Some(s"""WITH t AS (SELECT doc_id, $sqlTok AS tok FROM documents)
              |SELECT doc_id, $sqlSimhash AS simhash
              |FROM t
              |ORDER BY doc_id""".stripMargin)
    ),

    // SimHash near-dup pairs: 64-bit signatures, candidates from a band
    // equi-join on 4×16-bit slices, verified by exact hamming distance ≤ 3.
    // The banding is EXACT here by pigeonhole: ≤3 differing bits can touch
    // at most 3 of the 4 bands, so every qualifying pair shares at least
    // one band verbatim — no recall loss, unlike probability-bounded
    // MinHash/cosine banding. Candidate volume is real dups + ~2⁻¹⁶-rate
    // random band collisions: negligible. The oracle stays the exact
    // all-pairs formulation.
    Q(
      "q36_simhash_neardup",
      (s, d) => {
        // The 64-bit signature rides as four 16-bit INTS: band join keys
        // are ints (not strings) and the hamming verify is xor+bit_count —
        // all codegen, no per-character work, and the verify fuses into the
        // candidate join with no join-back stages (unlike the text-LSH
        // path, whose shingle sets are too wide to replicate per band).
        val sims = Caches.buildScope("simhash64")(Caches.persisted(simhash64(s, d)))
        val words = (0 until 4).map(b => conv(substring(col("sh"), b * 16 + 1, 16), 2, 10).cast("int").as(s"w$b"))
        val bands = sims
          .select(col("doc_id") +: words: _*)
          .select(
            col("doc_id") +: (0 until 4).map(b => col(s"w$b")) :+
              posexplode(array((0 until 4).map(b => col(s"w$b")): _*)).as(Seq("band", "bkey")): _*
          )
        val hamming = (0 until 4)
          .map(b => bit_count(col(s"a.w$b").bitwiseXOR(col(s"b.w$b"))))
          .reduce(_ + _)
          .cast("long")
        bands.as("a")
          .join(
            bands.as("b"),
            col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
              col("a.doc_id") < col("b.doc_id")
          )
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), hamming.as("hamming"))
          .filter(col("hamming") <= 3)
          .distinct()
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $sqlTok AS tok FROM documents),
              |s AS (SELECT doc_id, $sqlSimhash64 AS sh FROM t)
              |SELECT doc_a, doc_b, hamming FROM (
              |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |    CAST(list_sum(list_transform(range(1, 65),
              |      i -> CASE WHEN substr(a.sh, i, 1) <> substr(b.sh, i, 1) THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
              |  FROM s a JOIN s b ON a.doc_id < b.doc_id) v
              |WHERE hamming <= 3
              |ORDER BY doc_a, doc_b""".stripMargin)
    ),

    // n-gram Jaccard similarity join: EXACT set-similarity via an inverted
    // index — explode distinct word-5grams, equi-join postings on the gram
    // (pairs sharing ≥1 gram, which is every pair with jaccard > 0), count
    // shared grams per pair, then jaccard = |∩| / (|a|+|b|−|∩|). No
    // all-pairs scan anywhere: work is Σ_gram count², which rare 5-grams
    // keep near-linear (measured 278k candidate rows on the sf0.1 corpus
    // vs 12.5M all-pairs). The classic prefix-filtering refinement bounds
    // the hot-gram worst case if a corpus needs it.
    Q(
      "q35_ngram_jaccard",
      (s, d) => {
        val g5 = gram5Sets(s, d) // postings + both size-lookup legs read one pass
        val ex = g5.select(col("doc_id"), explode(col("s")).as("gram"))
        val shared = ex.as("a")
          .join(ex.as("b"), col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .groupBy(col("doc_a"), col("doc_b"))
          .agg(count(lit(1)).as("shared"))
        shared
          .join(g5.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
          .join(g5.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
          .select(
            col("doc_a"),
            col("doc_b"),
            round(col("shared").cast("double") / (col("na") + col("nb") - col("shared")), 4).as("jaccard")
          )
          .filter(col("jaccard") >= 0.5)
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some(sqlJaccard5Oracle)
    ),

    // End-to-end dedup: documents surviving near-dup removal (keep the
    // lower doc_id of every verified pair) — anti-join against pair RHS.
    Q(
      "q34_dedup_kept",
      (s, d) => {
        val dropIds = lshPairs(s, d, 0.8).select(col("doc_b").as("doc_id")).distinct()
        documents(s, d)
          .join(dropIds, Seq("doc_id"), "left_anti")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("kept_docs"))
          .orderBy(col("source"))
      },
      Some(s"""${sqlPairsCte(0.8)}
              |SELECT source, count(*) AS kept_docs
              |FROM documents
              |WHERE doc_id NOT IN (SELECT doc_b FROM pairs)
              |GROUP BY source
              |ORDER BY source""".stripMargin)
    ),

    // Benchmark decontamination: flag corpus documents sharing any token
    // 8-gram with a benchmark/eval set (here: doc_id < 20 stands in for
    // the held-out benchmark). THE pre-training hygiene pass — train/test
    // contamination is checked exactly this way (n-gram collision against
    // eval suites). Scale shape: the benchmark gram set is always tiny
    // relative to the corpus, so it broadcasts and the check is a map-side
    // semi-join per gram — one linear corpus pass, no shuffle of corpus
    // grams beyond the per-doc count aggregation.
    Q(
      "q37_contamination",
      (s, d) => {
        val g8 = tokenized(s, d).select(col("doc_id"), explode(ngrams(col("tok"), 8)).as("g"))
        val bench = g8.filter(col("doc_id") < 20).select(col("g")).distinct()
        val corpus = g8.filter(col("doc_id") >= 20)
        val totals = corpus.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
        val hits = corpus
          .join(broadcast(bench), Seq("g"), "left_semi")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("hit_grams"))
        totals
          .join(hits, Seq("doc_id"))
          .select(
            col("doc_id"),
            col("n_grams"),
            col("hit_grams"),
            floor(col("hit_grams") * lit(10000.0) / col("n_grams")).cast("long").as("cont_units")
          )
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $sqlTok AS tok FROM documents),
              |g AS (SELECT doc_id, unnest(CASE WHEN len(tok) >= 8
              |        THEN list_distinct(list_transform(
              |          range(1, greatest(len(tok) - 6, 1)),
              |          i -> list_aggregate(tok[i:i+7], 'string_agg', ' ')))
              |        ELSE [] END) AS gram
              |      FROM t),
              |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id < 20),
              |corpus AS (SELECT doc_id, gram FROM g WHERE doc_id >= 20),
              |totals AS (SELECT doc_id, count(*) AS n_grams FROM corpus GROUP BY 1),
              |hits AS (SELECT doc_id, count(*) AS hit_grams
              |         FROM corpus SEMI JOIN bench USING (gram) GROUP BY 1)
              |SELECT doc_id, n_grams, hit_grams,
              |  CAST(floor(hit_grams * 10000.0 / n_grams) AS BIGINT) AS cont_units
              |FROM totals JOIN hits USING (doc_id)
              |ORDER BY doc_id""".stripMargin)
    ),

    // Near-dup CLUSTERS: connected components over the verified pair
    // graph — the transitive closure q34's pairwise drop can't express.
    // One row per cluster: canonical (min) doc_id, size, sorted member
    // list (serialized — array columns break the driver comparator).
    Q(
      "q69_dedup_clusters",
      (s, d) =>
        dedupClusters(s, d, 0.8)
          .groupBy(col("lbl").as("cluster_rep"))
          .agg(
            count(lit(1)).as("sz"),
            array_join(
              transform(sort_array(collect_list(col("node"))), _.cast("string")),
              ","
            ).as("members")
          )
          .orderBy(col("cluster_rep")),
      Some(s"""${sqlPairsCte(0.8, recursive = true)},
              |$sqlComponentsCte
              |SELECT lbl AS cluster_rep, CAST(count(*) AS BIGINT) AS sz,
              |  list_aggr(list_transform(list_sort(list(node)), x -> CAST(x AS VARCHAR)),
              |            'string_agg', ',') AS members
              |FROM lab
              |GROUP BY lbl
              |ORDER BY cluster_rep""".stripMargin)
    ),

    // Cluster-canonical kept-set: keep ONE representative per near-dup
    // component (its min doc_id) plus every unpaired document. Differs
    // from q34 exactly when pairs chain (a–b, b–c: q34 keeps a and drops
    // b,c only if both appear as doc_b; clusters always keep just a).
    Q(
      "q71_cluster_kept",
      (s, d) => {
        val dropped = dedupClusters(s, d, 0.8)
          .filter(col("lbl") =!= col("node"))
          .select(col("node").as("doc_id"))
        documents(s, d)
          .join(dropped, Seq("doc_id"), "left_anti")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("kept_docs"))
          .orderBy(col("source"))
      },
      Some(s"""${sqlPairsCte(0.8, recursive = true)},
              |$sqlComponentsCte
              |SELECT source, count(*) AS kept_docs
              |FROM documents
              |WHERE doc_id NOT IN (SELECT node FROM lab WHERE lbl <> node)
              |GROUP BY source
              |ORDER BY source""".stripMargin)
    ),

    // Train/validation split leakage audit: assign every document to a
    // deterministic md5-hash 90/10 split, then bucket the verified
    // near-dup pairs by whether they CROSS the split — a near-duplicate
    // of a training document sitting in the validation set is evaluation
    // leakage (the eval-set cousin of q37's benchmark decontamination).
    // Reuses the persisted lshPairs pipeline (same threshold as q32 →
    // CacheManager shares the materialization); the split assignment is a
    // map-only hash, and the bucket rollup joins the tiny pair list to a
    // two-column split table — nothing new shuffles at scale.
    Q(
      "q101_split_leakage",
      (s, d) => {
        val split = when(
          expr(
            "cast(conv(substring(md5(concat('split:', cast(doc_id as string))), 1, 4), 16, 10) as bigint) % 10 < 9"
          ),
          "train"
        ).otherwise("val")
        val splits = documents(s, d).select(col("doc_id"), split.as("split"))
        lshPairs(s, d, 0.8)
          .join(splits.select(col("doc_id").as("doc_a"), col("split").as("split_a")), "doc_a")
          .join(splits.select(col("doc_id").as("doc_b"), col("split").as("split_b")), "doc_b")
          .select(
            when(col("split_a") === col("split_b"), col("split_a"))
              .otherwise(lit("cross"))
              .as("bucket")
          )
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("pairs"))
          .orderBy(col("bucket"))
      },
      Some {
        val h = "md5('split:' || CAST(doc_id AS VARCHAR))"
        val hex4 = (1 to 4)
          .map(i => s"(strpos('0123456789abcdef', substr($h, $i, 1)) - 1) * ${math.pow(16, 4 - i).toLong}")
          .mkString("(", " + ", ")")
        s"""${sqlPairsCte(0.8)},
           |sp AS (
           |  SELECT doc_id,
           |    CASE WHEN $hex4 % 10 < 9 THEN 'train' ELSE 'val' END AS split
           |  FROM documents)
           |SELECT CASE WHEN a.split = b.split THEN a.split ELSE 'cross' END AS bucket,
           |  count(*) AS pairs
           |FROM pairs
           |JOIN sp a ON a.doc_id = doc_a
           |JOIN sp b ON b.doc_id = doc_b
           |GROUP BY 1 ORDER BY 1""".stripMargin
      }
    ),

    // Edit-distance verification tier: exact Levenshtein over the LSH
    // candidate pairs — the character-level confirmation pass a dedup
    // pipeline runs when shingle Jaccard is ambiguous (near-identical
    // token sets, different ordering/spacing). Levenshtein is O(len²)
    // per pair, which is exactly why it sits BEHIND the candidate
    // pruning: at 100 TB you run it on the verified-pair list (tiny),
    // never the corpus. The metric is an integer on both engines, and
    // the normalized similarity rides one int/int double division +
    // floor (bit-identical cross-engine).
    Q(
      "q105_edit_distance",
      (s, d) => {
        val docs = documents(s, d).select(col("doc_id"), col("text"))
        lshPairs(s, d, 0.8)
          .select(col("doc_a"), col("doc_b"))
          .join(docs.select(col("doc_id").as("doc_a"), col("text").as("ta")), "doc_a")
          .join(docs.select(col("doc_id").as("doc_b"), col("text").as("tb")), "doc_b")
          .select(
            col("doc_a"),
            col("doc_b"),
            levenshtein(col("ta"), col("tb")).cast("long").as("edit_dist"),
            floor(
              (lit(1.0) - levenshtein(col("ta"), col("tb")).cast("double") /
                greatest(length(col("ta")), length(col("tb"))).cast("double")) * 10000
            ).cast("long").as("sim_bp")
          )
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some(s"""${sqlPairsCte(0.8)}
              |SELECT doc_a, doc_b,
              |  CAST(levenshtein(x.text, y.text) AS BIGINT) AS edit_dist,
              |  CAST(floor((1.0 - CAST(levenshtein(x.text, y.text) AS DOUBLE)
              |    / CAST(greatest(len(x.text), len(y.text)) AS DOUBLE)) * 10000) AS BIGINT) AS sim_bp
              |FROM pairs
              |JOIN documents x ON x.doc_id = doc_a
              |JOIN documents y ON y.doc_id = doc_b
              |ORDER BY doc_a, doc_b""".stripMargin)
    ),

    // Exact substring (chunk-window) dedup profile — the Lee et al.
    // "Deduplicating Training Data Makes Language Models Better" pass at
    // window granularity: hash every 64-token stride-32 window (the q96
    // chunker), attribute each window to its first-seen document
    // (min doc_id over the window hash), and report per source how much
    // window mass is a repeat of an earlier document. Catches partial /
    // embedded duplication that whole-document fingerprints (q30) miss.
    // Scale shape: one documents pass explodes to ~n_tokens/32 window
    // rows, one shuffle on the window hash for the owner aggregate, one
    // fp-keyed equi-join back — all linear; a viral boilerplate window
    // concentrates its fp partition, which AQE skew-split handles because
    // the owner side is pre-aggregated to one row per fp.
    Q(
      "q106_window_dedup",
      (s, d) => {
        val wins = Caches.buildScope("window_fps")(Caches.persisted(windowFingerprints(documents(s, d))))
        val owner = wins.groupBy(col("fp")).agg(min(col("doc_id")).as("owner"))
        wins
          .join(owner, "fp")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("windows"),
            sum(when(col("owner") < col("doc_id"), 1L).otherwise(0L)).as("dup_windows"),
            countDistinct(when(col("owner") < col("doc_id"), col("doc_id"))).as("dup_docs")
          )
          .orderBy(col("source"))
      },
      Some("""WITH t AS (
             |  SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS toks,
             |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
             |  FROM documents),
             |w AS (
             |  SELECT doc_id, source,
             |    md5(array_to_string(list_slice(toks, start, start + 63), ' ')) AS fp
             |  FROM (SELECT doc_id, source, toks,
             |          unnest(range(1, CAST(n AS INTEGER) + 1, 32)) AS start
             |        FROM t WHERE n >= 1) z),
             |o AS (SELECT fp, min(doc_id) AS owner FROM w GROUP BY fp)
             |SELECT source, count(*) AS windows,
             |  CAST(sum(CASE WHEN owner < doc_id THEN 1 ELSE 0 END) AS BIGINT) AS dup_windows,
             |  count(DISTINCT CASE WHEN owner < doc_id THEN doc_id END) AS dup_docs
             |FROM w JOIN o USING (fp)
             |GROUP BY source
             |ORDER BY source""".stripMargin)
    ),

    // Policy-driven canonical selection: q71 keeps each cluster's MIN
    // doc_id; a production corpus keeps the copy from the most-trusted
    // SOURCE (curated > standard > web tiers; id only breaks ties) — the
    // cross-source dedup policy that decides which near-duplicate survives
    // when the same content arrives via multiple pipelines. Tier here is
    // the deterministic src_num % 3. Rides q69's persisted cluster labels
    // (CacheManager shares the materialization); everything added is a
    // tiny member-keyed join + one aggregate per cluster — the policy swap
    // costs nothing at scale, which is the point: canonical choice is a
    // pluggable argmin over (tier, id), not a new pipeline.
    Q(
      "q118_canonical_policy",
      (s, d) => {
        val lab = dedupClusters(s, d, 0.8)
        val docs = documents(s, d).select(
          col("doc_id"),
          col("source"),
          expr("CAST(substring(source, 4, 10) AS INT) % 3").cast("long").as("tier")
        )
        val members = lab.join(docs, col("node") === col("doc_id"))
        val canon = members
          .groupBy(col("lbl"))
          .agg(min_by(col("node"), struct(col("tier"), col("node"))).as("canon_id"))
        members
          .join(canon, Seq("lbl"))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("members"),
            sum(when(col("node") === col("canon_id"), 1L).otherwise(0L)).as("canonical"),
            sum(when(col("node") =!= col("canon_id"), 1L).otherwise(0L)).as("demoted")
          )
          .orderBy(col("source"))
      },
      Some(s"""${sqlPairsCte(0.8, recursive = true)},
              |$sqlComponentsCte,
              |mem AS (
              |  SELECT lab.node, lab.lbl, d.source,
              |    CAST(substr(d.source, 4, 10) AS INT) % 3 AS tier
              |  FROM lab JOIN documents d ON d.doc_id = lab.node),
              |can AS (
              |  SELECT lbl, node AS canon_id FROM (
              |    SELECT lbl, node,
              |      row_number() OVER (PARTITION BY lbl ORDER BY tier, node) AS rk
              |    FROM mem) t
              |  WHERE rk = 1)
              |SELECT source, count(*) AS members,
              |  CAST(sum(CASE WHEN node = canon_id THEN 1 ELSE 0 END) AS BIGINT) AS canonical,
              |  CAST(sum(CASE WHEN node <> canon_id THEN 1 ELSE 0 END) AS BIGINT) AS demoted
              |FROM mem JOIN can USING (lbl)
              |GROUP BY source
              |ORDER BY source""".stripMargin)
    ),

    // Incremental-ingest dedup admission: the daily-batch-vs-historical-
    // corpus gate. History (doc_id < 400) never re-shuffles: its distinct
    // 8-gram set folds into ONE ~KB bloom filter the driver materializes
    // (the q86 runtime-filter idiom — a scalar aggregate, not a data
    // collect), and only the incoming slice's bloom-POSITIVE grams enter
    // the exact gram-keyed semi-join that removes false positives, so the
    // result is byte-identical to the exact overlap the oracle computes.
    // At 100 TB the history side is the whole corpus — the bloom is what
    // keeps the increment's cost proportional to the increment, not the
    // archive (grams that miss the bloom — the overwhelming majority of a
    // genuinely-new document — never leave the map stage). A document is
    // rejected when ≥50% of its distinct 8-grams already occur in history
    // (hit*2 >= n), the q37 contamination algebra pointed at ingestion.
    Q(
      "q113_incremental_admission",
      (s, d) => {
        import org.apache.spark.sql.GraftColumns
        import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, XxHash64}
        import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
        import org.apache.spark.sql.catalyst.expressions.Literal
        val g8 = tokenized(s, d).select(col("doc_id"), explode(ngrams(col("tok"), 8)).as("g"))
        // Both sides persist: `hist` is the gram index a production system
        // keeps materialized (read twice here — bloom build + exact
        // semi-join — and by far the expensive side to recompute), `inc`
        // is proportional to the increment by definition (read twice:
        // per-doc totals + hit counting). Without these, the history
        // tokenize+distinct shuffle ran twice and the increment explode
        // ran twice — 4 heavy passes where 2 suffice.
        val hist = Caches.persisted(
          g8.filter(col("doc_id") < 400).select(col("g")).distinct())
        val bloomAgg = GraftColumns.lift(
          new BloomFilterAggregate(
            new XxHash64(Seq(GraftColumns.unlift(col("g")))),
            Literal(200000L),
            Literal(1600000L)
          ).toAggregateExpression()
        )
        val bloom = hist.agg(bloomAgg.as("bf")).head().getAs[Array[Byte]]("bf")
        val mightContain = GraftColumns.lift(
          BloomFilterMightContain(
            Literal(bloom),
            new XxHash64(Seq(GraftColumns.unlift(col("g"))))
          )
        )
        val inc = g8.filter(col("doc_id") >= 400)
        val totals = inc.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
        val hits = inc
          .filter(mightContain)
          .join(hist, Seq("g"), "left_semi")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("hit_grams"))
        totals
          .join(hits, Seq("doc_id"), "left")
          .select(
            col("doc_id"),
            col("n_grams"),
            coalesce(col("hit_grams"), lit(0L)).as("hit_grams")
          )
          .withColumn("admitted", col("hit_grams") * 2 < col("n_grams"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $sqlTok AS tok FROM documents),
              |gr AS (SELECT doc_id, unnest(CASE WHEN len(tok) >= 8
              |        THEN list_distinct(list_transform(
              |          range(1, greatest(len(tok) - 6, 1)),
              |          i -> list_aggregate(tok[i:i+7], 'string_agg', ' ')))
              |        ELSE [] END) AS g
              |      FROM t),
              |hist AS (SELECT DISTINCT g FROM gr WHERE doc_id < 400),
              |inc AS (SELECT doc_id, g FROM gr WHERE doc_id >= 400),
              |totals AS (SELECT doc_id, count(*) AS n_grams FROM inc GROUP BY 1),
              |hits AS (SELECT doc_id, count(*) AS hit_grams
              |         FROM inc SEMI JOIN hist USING (g) GROUP BY 1)
              |SELECT t.doc_id, t.n_grams,
              |  CAST(coalesce(h.hit_grams, 0) AS BIGINT) AS hit_grams,
              |  (CAST(coalesce(h.hit_grams, 0) AS BIGINT) * 2 < t.n_grams) AS admitted
              |FROM totals t LEFT JOIN hits h USING (doc_id)
              |ORDER BY doc_id""".stripMargin)
    ),

    // Prefix-filtering exact set-similarity join (see [[prefixCandidates]]
    // for the theorem + scale argument): same logical operator as q35 —
    // every pair with word-5gram Jaccard ≥ 0.5 — through a different
    // physical algorithm, so the SAME definitional oracle grades both.
    // q35 proposes every pair sharing ANY gram (Σ_gram count² work,
    // hot-gram-quadratic in the worst case); here candidates must share a
    // PREFIX gram under the rarest-first global order, which deflates
    // exactly the hot-gram buckets. Verification computes exact Jaccard
    // on candidate pairs only, from the same persisted gram materialization
    // q35 uses (one cache entry serves both).
    Q(
      "q130_prefix_join",
      (s, d) => {
        val g5 = gram5Sets(s, d)
        prefixCandidates(s, d)
          .join(g5.select(col("doc_id").as("doc_a"), col("s").as("sa"), col("n").as("na")), "doc_a")
          .join(g5.select(col("doc_id").as("doc_b"), col("s").as("sb"), col("n").as("nb")), "doc_b")
          .withColumn("shared", size(array_intersect(col("sa"), col("sb"))))
          .select(
            col("doc_a"),
            col("doc_b"),
            round(col("shared").cast("double") / (col("na") + col("nb") - col("shared")), 4)
              .as("jaccard")
          )
          .filter(col("jaccard") >= 0.5)
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some(sqlJaccard5Oracle)
    ),

    // Duplicate-cluster size distribution: the headline a dedup report
    // leads with — how much of the corpus sits in 2-doc pairs vs viral
    // boilerplate clusters (the size histogram decides whether canonical
    // selection is worth a policy at all, and a fat tail is the early
    // warning that one template is flooding ingest). Every document joins
    // the cluster map (left), singletons label as themselves, and the two
    // tiny aggregates that follow see one row per cluster / one row per
    // size — metadata. Rides q69's persisted cluster labels, so after the
    // dedup pass this report is two shuffles over cluster metadata, free
    // at any scale.
    Q(
      "q146_cluster_sizes",
      (s, d) => {
        val lab = dedupClusters(s, d, 0.8)
        documents(s, d)
          .select(col("doc_id"))
          .join(lab, col("doc_id") === col("node"), "left")
          .select(coalesce(col("lbl"), col("doc_id")).as("lbl"))
          .groupBy(col("lbl"))
          .agg(count(lit(1)).as("sz"))
          .groupBy(col("sz"))
          .agg(count(lit(1)).as("clusters"))
          .orderBy(col("sz"))
      },
      Some(s"""${sqlPairsCte(0.8, recursive = true)},
              |$sqlComponentsCte,
              |m AS (
              |  SELECT coalesce(lab.lbl, d.doc_id) AS lbl
              |  FROM documents d LEFT JOIN lab ON lab.node = d.doc_id),
              |sz AS (SELECT lbl, count(*) AS sz FROM m GROUP BY lbl)
              |SELECT CAST(sz AS BIGINT) AS sz, count(*) AS clusters
              |FROM sz GROUP BY sz ORDER BY sz""".stripMargin)
    ),

    // Cross-source duplication matrix: the verified near-dup pairs rolled
    // up by WHICH PIPELINES collide — the report that tells an ingest
    // operator "source_07 is mostly re-serving source_03" (fix the
    // upstream feed) vs "duplication is intra-source" (fix the crawler's
    // revisit policy). The pair endpoints' sources are normalized
    // (least, greatest) so each unordered source pair is one row. Rides
    // the persisted lshPairs materialization — the rollup itself joins
    // the tiny pair list to the 2-column doc→source table twice and
    // aggregates source-pair metadata; nothing new shuffles at scale.
    Q(
      "q151_source_overlap",
      (s, d) => {
        val src = documents(s, d).select(col("doc_id"), col("source"))
        lshPairs(s, d, 0.8)
          .select(col("doc_a"), col("doc_b"))
          .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
          .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
          .select(
            least(col("sa"), col("sb")).as("source_lo"),
            greatest(col("sa"), col("sb")).as("source_hi")
          )
          .groupBy(col("source_lo"), col("source_hi"))
          .agg(count(lit(1)).as("pairs"))
          .orderBy(col("source_lo"), col("source_hi"))
      },
      Some(s"""${sqlPairsCte(0.8)}
              |SELECT least(x.source, y.source) AS source_lo,
              |  greatest(x.source, y.source) AS source_hi,
              |  count(*) AS pairs
              |FROM pairs
              |JOIN documents x ON x.doc_id = doc_a
              |JOIN documents y ON y.doc_id = doc_b
              |GROUP BY 1, 2
              |ORDER BY 1, 2""".stripMargin)
    ),

    // Directed syndication flow: q151's cross-source pair matrix with the
    // DIRECTION restored — in every verified near-dup pair the lower
    // doc_id is the earlier arrival (ingest order), so (source of the
    // earlier) → (source of the later) counts who ORIGINATES content and
    // who re-serves it. Asymmetric rows (A→B ≫ B→A) identify mirror/
    // aggregator sources whose whole intake is derivative — candidates
    // for source-level down-weighting (q177) rather than per-doc dedup.
    // Same metadata-sized post-join as q151, one extra inequality filter.
    Q(
      "q190_syndication_flow",
      (s, d) => {
        val src = documents(s, d).select(col("doc_id"), col("source"))
        lshPairs(s, d, 0.8)
          .select(col("doc_a"), col("doc_b"))
          .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
          .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
          .filter(col("sa") =!= col("sb"))
          .groupBy(col("sa").as("origin_source"), col("sb").as("derived_source"))
          .agg(count(lit(1)).as("pairs"))
          .orderBy(col("origin_source"), col("derived_source"))
      },
      Some(s"""${sqlPairsCte(0.8)}
              |SELECT x.source AS origin_source, y.source AS derived_source,
              |  count(*) AS pairs
              |FROM pairs
              |JOIN documents x ON x.doc_id = doc_a
              |JOIN documents y ON y.doc_id = doc_b
              |WHERE x.source <> y.source
              |GROUP BY 1, 2
              |ORDER BY 1, 2""".stripMargin)
    ),

    // Lexical-embedding consistency audit: do the TEXT near-dup pairs
    // (verified 3-gram Jaccard ≥ 0.8) actually sit close in EMBEDDING
    // space, against a deterministic control pairing (vec i ↔ vec i+137)?
    // A small separation means the embedding model is blind to the
    // duplication the lexical pipeline sees — SemDeDup (q114) and ANN
    // dedup (q42) would silently miss what MinHash catches. All integer:
    // quantized int64 dots, floor(√·) norms (IEEE-exact), and sign-safe
    // division at both the per-pair cosine and the means. (Both engines
    // truncate integer division toward zero — verified: DuckDB -7//2 =
    // -3 — so the sign-carrying CASE is belt-and-braces, not load-
    // bearing; it stays because it also documents where negatives can
    // appear.) Dup side rides the persisted verified pairs; control is
    // one self-equi-join on a shifted id.
    Q(
      "q191_lexical_embedding_consistency",
      (s, d) => {
        val e = embeddings(s, d)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
          .withColumn(
            "n2",
            graft.functions.VectorFunctions.quantizedDot(col("v"), col("v"), 64)
          )
          .withColumn("isq", expr("CAST(floor(sqrt(CAST(n2 AS DOUBLE))) AS BIGINT)"))
          .filter(col("isq") > 0L)
          .select(col("vec_id"), col("v"), col("isq"))
        def pairStats(pairs: DataFrame, nName: String, mName: String) = {
          // floor(√n2) UNDERestimates the true norms, so the quotient can
          // exceed 10⁴ for near-identical vectors (n2 = 8 → isq = 2 reads
          // as 20000) — clamp to the cosine range in BOTH engines
          val scored = pairs
            .select(
              greatest(
                least(
                  when(col("dot") < 0L, -1L).otherwise(lit(1L)) *
                    expr("(abs(dot) * 10000L) div (isq_a * isq_b)"),
                  lit(10000L)
                ),
                lit(-10000L)
              ).as("cos_bp")
            )
          scored.agg(
            count(lit(1)).as(nName),
            sum(col("cos_bp")).as("ssum")
          ).withColumn(
            mName,
            when(
              col(nName) > 0L,
              when(col("ssum") < 0L, -1L).otherwise(lit(1L)) *
                expr(s"abs(ssum) div $nName")
            )
          ).drop("ssum")
        }
        val dup = pairStats(
          lshPairs(s, d, 0.8)
            .join(e.select(col("vec_id").as("doc_a"), col("v").as("va"), col("isq").as("isq_a")), "doc_a")
            .join(e.select(col("vec_id").as("doc_b"), col("v").as("vb"), col("isq").as("isq_b")), "doc_b")
            .withColumn("dot", graft.functions.VectorFunctions.quantizedDot(col("va"), col("vb"), 64)),
          "dup_pairs",
          "dup_mean_cos_bp"
        )
        val ctrl = pairStats(
          e.as("a")
            .join(e.as("b"), col("b.vec_id") === col("a.vec_id") + 137L)
            .select(
              graft.functions.VectorFunctions
                .quantizedDot(col("a.v"), col("b.v"), 64)
                .as("dot"),
              col("a.isq").as("isq_a"),
              col("b.isq").as("isq_b")
            ),
          "ctrl_pairs",
          "ctrl_mean_cos_bp"
        )
        dup
          .crossJoin(broadcast(ctrl))
          .withColumn("separation_bp", col("dup_mean_cos_bp") - col("ctrl_mean_cos_bp"))
      },
      Some(s"""${sqlPairsCte(0.8)},
              |e AS (
              |  SELECT vec_id,
              |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 64) AS BIGINT)) AS qv
              |  FROM embeddings),
              |nn AS (
              |  SELECT vec_id, qv,
              |    CAST(floor(sqrt(CAST(list_sum(list_transform(qv, x -> x * x)) AS DOUBLE)))
              |      AS BIGINT) AS isq
              |  FROM e),
              |nz AS (SELECT * FROM nn WHERE isq > 0),
              |dsc AS (
              |  SELECT greatest(least((CASE WHEN dot < 0 THEN -1 ELSE 1 END)
              |      * (abs(dot) * 10000 // (isq_a * isq_b)), 10000), -10000) AS cos_bp
              |  FROM (
              |    SELECT CAST(list_sum(list_transform(range(1, len(a.qv) + 1),
              |        i -> a.qv[i] * b.qv[i])) AS BIGINT) AS dot,
              |      a.isq AS isq_a, b.isq AS isq_b
              |    FROM pairs JOIN nz a ON a.vec_id = doc_a JOIN nz b ON b.vec_id = doc_b) t),
              |dp AS (
              |  SELECT CAST(count(*) AS BIGINT) AS dup_pairs,
              |    CASE WHEN count(*) > 0 THEN
              |      CAST((CASE WHEN sum(cos_bp) < 0 THEN -1 ELSE 1 END)
              |        * (abs(CAST(sum(cos_bp) AS BIGINT)) // count(*)) AS BIGINT)
              |    END AS dup_mean_cos_bp
              |  FROM dsc),
              |csc AS (
              |  SELECT greatest(least((CASE WHEN dot < 0 THEN -1 ELSE 1 END)
              |      * (abs(dot) * 10000 // (isq_a * isq_b)), 10000), -10000) AS cos_bp
              |  FROM (
              |    SELECT CAST(list_sum(list_transform(range(1, len(a.qv) + 1),
              |        i -> a.qv[i] * b.qv[i])) AS BIGINT) AS dot,
              |      a.isq AS isq_a, b.isq AS isq_b
              |    FROM nz a JOIN nz b ON b.vec_id = a.vec_id + 137) t),
              |cp AS (
              |  SELECT CAST(count(*) AS BIGINT) AS ctrl_pairs,
              |    CASE WHEN count(*) > 0 THEN
              |      CAST((CASE WHEN sum(cos_bp) < 0 THEN -1 ELSE 1 END)
              |        * (abs(CAST(sum(cos_bp) AS BIGINT)) // count(*)) AS BIGINT)
              |    END AS ctrl_mean_cos_bp
              |  FROM csc)
              |SELECT dup_pairs, dup_mean_cos_bp, ctrl_pairs, ctrl_mean_cos_bp,
              |  dup_mean_cos_bp - ctrl_mean_cos_bp AS separation_bp
              |FROM dp CROSS JOIN cp""".stripMargin)
    ),

    // Duplicate arrival-gap histogram: how far apart (in ingest order,
    // doc_id distance) the two sides of each verified near-dup pair
    // arrived, bucketed by power of two (floor(log₂ gap) + 1 via binary
    // string length — no libm). Mass in the low buckets = recrawl bursts
    // (same content re-fetched immediately → a small dedup window
    // suffices); mass in the high buckets = archive re-serves (content
    // resurfacing much later → admission needs the FULL history, q113's
    // growing-bloom shape, not a sliding window). Metadata-sized: one
    // projection over the persisted pairs, |buckets| output rows.
    Q(
      "q192_dup_gap_histogram",
      (s, d) => {
        val src = documents(s, d).select(col("doc_id"), col("source"))
        lshPairs(s, d, 0.8)
          .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
          .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
          .select(
            length(bin(col("doc_b") - col("doc_a"))).cast("long").as("bucket"),
            (col("doc_b") - col("doc_a")).as("gap"),
            when(col("sa") === col("sb"), 1L).otherwise(0L).as("same_src")
          )
          .groupBy(col("bucket"))
          .agg(
            count(lit(1)).as("pairs"),
            min(col("gap")).as("min_gap"),
            max(col("gap")).as("max_gap"),
            sum(col("same_src")).as("same_source_pairs")
          )
          .orderBy(col("bucket"))
      },
      Some(s"""${sqlPairsCte(0.8)}
              |SELECT CAST(length(bin(doc_b - doc_a)) AS BIGINT) AS bucket,
              |  count(*) AS pairs,
              |  CAST(min(doc_b - doc_a) AS BIGINT) AS min_gap,
              |  CAST(max(doc_b - doc_a) AS BIGINT) AS max_gap,
              |  CAST(sum(CASE WHEN x.source = y.source THEN 1 ELSE 0 END) AS BIGINT)
              |    AS same_source_pairs
              |FROM pairs
              |JOIN documents x ON x.doc_id = doc_a
              |JOIN documents y ON y.doc_id = doc_b
              |GROUP BY 1
              |ORDER BY 1""".stripMargin)
    ),

    // Duplicate-graph triangle census: the structural audit of the
    // near-dup pair graph itself. Verified LSH pairs should form dense,
    // clique-like clusters (a template re-served many times yields all
    // pairwise edges); a graph that is mostly OPEN wedges (paths a–b–c
    // with no a–c edge) means the threshold sits on a similarity cliff —
    // transitive closure (q69) is then merging documents that are NOT
    // pairwise similar, and the canonical policy is over-dropping. The
    // headline is the global clustering coefficient 3·triangles/wedges.
    // Scale shape: every operand is the PAIR list (orders of magnitude
    // smaller than the corpus). Triangles come from the standard
    // ordered-edge join — edges kept as a<b, so each triangle a<b<c is
    // counted exactly once by joining e1.b = e2.a (giving the a<b<c
    // wedge) against the closing edge (a, c) — two equi-joins on edge
    // metadata, never a corpus row. Wedges are Σ deg·(deg−1)/2 over the
    // symmetrized degree table. The four scalars are driver-held
    // pair-metadata reads (the q147 idiom) so the single-row report
    // needs no scalar cross-join.
    Q(
      "q153_dup_graph_triangles",
      (s, d) => {
        val e = Caches.persisted(
          lshPairs(s, d, 0.8).select(col("doc_a").as("a"), col("doc_b").as("b"))
        )
        val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
        val degRow = sym
          .groupBy(col("a"))
          .agg(count(lit(1)).as("dg"))
          .agg(
            count(lit(1)).as("n_nodes"),
            coalesce(sum(expr("dg * (dg - 1) div 2")), lit(0L)).as("wedges")
          )
          .head()
        val nNodes = degRow.getLong(0)
        val wedges = degRow.getLong(1)
        val nEdges = e.count()
        val triangles = e
          .as("e1")
          .join(e.as("e2"), col("e1.b") === col("e2.a"))
          .join(
            e.as("e3"),
            col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b")
          )
          .count()
        s.range(1)
          .select(
            lit(nNodes).as("n_nodes"),
            lit(nEdges).as("n_edges"),
            lit(wedges).as("wedges"),
            lit(triangles).as("triangles"),
            lit(if (wedges == 0L) 0L else 3L * triangles * 10000L / wedges)
              .as("global_cc_bp")
          )
      },
      Some(s"""${sqlPairsCte(0.8)},
              |e AS (SELECT doc_a AS a, doc_b AS b FROM pairs),
              |sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
              |deg AS (SELECT a AS node, count(*) AS dg FROM sym GROUP BY 1),
              |w AS (SELECT count(*) AS n_nodes,
              |        coalesce(CAST(sum(dg * (dg - 1) // 2) AS BIGINT), 0) AS wedges
              |      FROM deg),
              |tri AS (SELECT count(*) AS t
              |        FROM e e1 JOIN e e2 ON e2.a = e1.b
              |          JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
              |SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
              |  (SELECT count(*) FROM e) AS n_edges,
              |  wedges,
              |  CAST(t AS BIGINT) AS triangles,
              |  CASE WHEN wedges = 0 THEN 0
              |       ELSE CAST(3 * t * 10000 // wedges AS BIGINT) END AS global_cc_bp
              |FROM w, tri""".stripMargin)
    ),

    // Dedup token-inflation accounting: how many tokens each source
    // CLAIMS to contribute vs how many survive cluster-canonical dedup —
    // the number that converts "we crawled 12 TB" into "you bought 7 TB
    // of training signal", per source, so acquisition budgets track
    // effective (deduplicated) tokens rather than raw bytes. Every doc
    // left-joins the cluster map (singletons are their own canonical);
    // a source's effective tokens are those of the canonicals it OWNS —
    // a source whose docs all lose canonical election to another feed
    // contributes zero and shows inflation NULL (∞). Rides q69's
    // persisted labels; beyond the dedup pass this is one corpus-scan
    // token count plus metadata joins.
    Q(
      "q154_dedup_inflation",
      (s, d) => {
        val lab = dedupClusters(s, d, 0.8)
        documents(s, d)
          .select(
            col("doc_id"),
            col("source"),
            size(split(trim(col("text")), "\\s+")).cast("long").as("nt")
          )
          .join(lab, col("doc_id") === col("node"), "left")
          .select(
            col("source"),
            col("nt"),
            (coalesce(col("lbl"), col("doc_id")) === col("doc_id")).as("canon")
          )
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("docs"),
            sum(col("nt")).as("raw_tokens"),
            sum(when(col("canon"), 1L).otherwise(0L)).as("canon_docs"),
            sum(when(col("canon"), col("nt")).otherwise(0L)).as("effective_tokens")
          )
          .select(
            col("source"),
            col("docs"),
            col("raw_tokens"),
            col("canon_docs"),
            col("effective_tokens"),
            when(
              col("effective_tokens") > 0L,
              expr("raw_tokens * 10000 div effective_tokens")
            ).cast("long").as("inflation_bp")
          )
          .orderBy(col("source"))
      },
      Some(s"""${sqlPairsCte(0.8, recursive = true)},
              |$sqlComponentsCte,
              |m AS (
              |  SELECT d.source,
              |    CAST(len($sqlTok) AS BIGINT) AS nt,
              |    coalesce(lab.lbl, d.doc_id) = d.doc_id AS canon
              |  FROM documents d LEFT JOIN lab ON lab.node = d.doc_id)
              |SELECT source, count(*) AS docs,
              |  CAST(sum(nt) AS BIGINT) AS raw_tokens,
              |  CAST(sum(CASE WHEN canon THEN 1 ELSE 0 END) AS BIGINT) AS canon_docs,
              |  CAST(sum(CASE WHEN canon THEN nt ELSE 0 END) AS BIGINT) AS effective_tokens,
              |  CASE WHEN sum(CASE WHEN canon THEN nt ELSE 0 END) > 0
              |       THEN CAST(sum(nt) * 10000
              |         // sum(CASE WHEN canon THEN nt ELSE 0 END) AS BIGINT)
              |       ELSE NULL END AS inflation_bp
              |FROM m
              |GROUP BY source
              |ORDER BY source""".stripMargin)
    ),

    // Document-boundary overlap: pairs where one document's trailing
    // 3-gram IS another's leading 3-gram — the signature of a corpus
    // builder that SPLIT one upstream page into two records (or
    // concatenated two with a shared seam). Neither MinHash (q31) nor
    // the window dedup (q106) flags these: the overlap region is a tiny
    // fraction of either doc, so Jaccard sits far below any gate — the
    // seam itself is the evidence. Scale shape: two map-only boundary
    // projections per doc (first/last k tokens), then ONE equi-join on
    // the boundary string — shuffle keyed by 3-gram, never all-pairs. A
    // production run would df-filter boilerplate boundaries first (a hot
    // opening phrase makes a hot key — the q87 salting escape applies);
    // the seam report stays pair-sized.
    Q(
      "q158_boundary_overlap",
      (s, d) => {
        val t = documents(s, d)
          .select(col("doc_id"), toks.as("tok"))
          .filter(size(col("tok")) >= 3)
        val b = t.select(
          col("doc_id"),
          array_join(slice(col("tok"), 1, 3), " ").as("pre"),
          array_join(slice(col("tok"), -3, 3), " ").as("suf")
        )
        b.select(col("doc_id").as("doc_a"), col("suf").as("boundary"))
          .join(
            b.select(col("doc_id").as("doc_b"), col("pre").as("boundary")),
            "boundary"
          )
          .filter(col("doc_a") =!= col("doc_b"))
          .select(col("doc_a"), col("doc_b"), col("boundary"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $sqlTok AS tok FROM documents),
              |b AS (SELECT doc_id,
              |        list_aggregate(tok[1:3], 'string_agg', ' ') AS pre,
              |        list_aggregate(tok[-3:], 'string_agg', ' ') AS suf
              |      FROM t WHERE len(tok) >= 3)
              |SELECT a.doc_id AS doc_a, c.doc_id AS doc_b, a.suf AS boundary
              |FROM b a JOIN b c ON a.suf = c.pre AND a.doc_id <> c.doc_id
              |ORDER BY doc_a, doc_b""".stripMargin)
    ),

    // Threshold-sensitivity curve: the verified near-dup pairs bucketed
    // by similarity band (2.5%-wide Jaccard bins above the 0.8 gate) —
    // the report that says whether the dedup gate sits on a cliff. A
    // mass of pairs hugging the threshold means a ±0.05 gate move (or
    // ordinary MinHash estimation noise) swings the kept-set by that
    // mass; pairs piled at 1.0 mean the corpus's duplication is mostly
    // verbatim and the gate is insensitive. Rides the persisted lshPairs
    // list; the rollup is one map + hash aggregate over PAIR metadata.
    // The bucket key is integer basis points (round(j·10⁴) — j is
    // already a 4-decimal round, so the scaled value sits next to an
    // integer and both engines land on it) — no float comparisons in
    // the bucketing.
    Q(
      "q163_pair_similarity_hist",
      (s, d) =>
        lshPairs(s, d, 0.8)
          .select(
            expr("CAST(round(jaccard * 10000) AS BIGINT) div 250").as("bucket")
          )
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("pairs"))
          .select(
            col("bucket"),
            (col("bucket") * 250L).as("lo_bp"),
            (col("bucket") * 250L + 249L).as("hi_bp"),
            col("pairs")
          )
          .orderBy(col("bucket")),
      Some(s"""${sqlPairsCte(0.8)}
              |SELECT bucket, CAST(bucket * 250 AS BIGINT) AS lo_bp,
              |  CAST(bucket * 250 + 249 AS BIGINT) AS hi_bp,
              |  count(*) AS pairs
              |FROM (SELECT CAST(round(jaccard * 10000) AS BIGINT) // 250 AS bucket
              |      FROM pairs) b
              |GROUP BY bucket
              |ORDER BY bucket""".stripMargin)
    ),

    // Transitive-merge evidence audit: per duplicate cluster, how many of
    // its member pairs were DIRECTLY verified vs merely implied by
    // transitivity — the per-cluster drill-down of q153's global
    // clustering coefficient. A cluster of size s asserts s·(s−1)/2
    // equivalences on the strength of its verified edges; coverage far
    // below 10⁴ bp on a big cluster means connected components chained
    // weakly-linked documents into one canonical and the dedup is
    // over-dropping there (the actionable unit: THIS cluster needs a
    // second look, where q153 only says "somewhere"). Scale shape:
    // verified pairs join the cluster-label map twice (tiny frames), and
    // both aggregates are over CLUSTER metadata; edges always land in
    // exactly one cluster (endpoints of a verified pair are connected by
    // construction).
    Q(
      "q167_cluster_evidence",
      (s, d) => {
        val lab = dedupClusters(s, d, 0.8)
        val sizes = lab.groupBy(col("lbl")).agg(count(lit(1)).as("sz"))
        val edges = lshPairs(s, d, 0.8)
          .join(
            lab.select(col("node").as("doc_a"), col("lbl")),
            "doc_a"
          )
          .groupBy(col("lbl"))
          .agg(count(lit(1)).as("verified"))
        sizes
          .join(edges, Seq("lbl"), "left")
          .select(
            col("lbl").as("cluster_rep"),
            col("sz"),
            expr("sz * (sz - 1) div 2").as("implied_pairs"),
            coalesce(col("verified"), lit(0L)).as("verified_pairs"),
            expr(
              "coalesce(verified, 0) * 10000 div (sz * (sz - 1) div 2)"
            ).as("coverage_bp")
          )
          .orderBy(col("cluster_rep"))
      },
      Some(s"""${sqlPairsCte(0.8, recursive = true)},
              |$sqlComponentsCte,
              |sz AS (SELECT lbl, CAST(count(*) AS BIGINT) AS sz FROM lab GROUP BY 1),
              |ev AS (SELECT lab.lbl, CAST(count(*) AS BIGINT) AS verified
              |       FROM pairs JOIN lab ON lab.node = pairs.doc_a
              |       GROUP BY 1)
              |SELECT sz.lbl AS cluster_rep, sz.sz AS sz,
              |  sz.sz * (sz.sz - 1) // 2 AS implied_pairs,
              |  coalesce(verified, 0) AS verified_pairs,
              |  CAST(coalesce(verified, 0) * 10000
              |    // (sz.sz * (sz.sz - 1) // 2) AS BIGINT) AS coverage_bp
              |FROM sz LEFT JOIN ev USING (lbl)
              |ORDER BY cluster_rep""".stripMargin)
    ),

    // Directional derivative-content rate: per source, the share of ITS
    // documents that have a verified near-dup in a DIFFERENT source —
    // q151 counts pairs per source PAIR (symmetric); this normalizes per
    // source, which is the number a feed contract cares about ("38% of
    // what this vendor ships already arrives via someone else"). A doc
    // with near-dups in several sources counts once (distinct doc set).
    // Rides the persisted lshPairs; beyond the dedup pass it is two
    // metadata joins, one distinct over the cross-pair endpoint set, and
    // a per-source rollup.
    Q(
      "q168_derivative_rate",
      (s, d) => {
        val src = documents(s, d).select(col("doc_id"), col("source"))
        val p = lshPairs(s, d, 0.8)
          .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
          .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
          .filter(col("sa") =!= col("sb"))
        val derivative = p
          .select(col("doc_a").as("doc_id"), col("sa").as("source"))
          .union(p.select(col("doc_b").as("doc_id"), col("sb").as("source")))
          .distinct()
          .groupBy(col("source"))
          .agg(count(lit(1)).as("derivative_docs"))
        src
          .groupBy(col("source"))
          .agg(count(lit(1)).as("docs"))
          .join(derivative, Seq("source"), "left")
          .select(
            col("source"),
            col("docs"),
            coalesce(col("derivative_docs"), lit(0L)).as("derivative_docs"),
            expr("coalesce(derivative_docs, 0) * 10000 div docs").as("derivative_bp")
          )
          .orderBy(col("source"))
      },
      Some(s"""${sqlPairsCte(0.8)},
              |x AS (
              |  SELECT doc_a, doc_b, a.source AS sa, b.source AS sb
              |  FROM pairs
              |  JOIN documents a ON a.doc_id = doc_a
              |  JOIN documents b ON b.doc_id = doc_b
              |  WHERE a.source <> b.source),
              |dv AS (
              |  SELECT source, CAST(count(*) AS BIGINT) AS derivative_docs FROM (
              |    SELECT DISTINCT doc_id, source FROM (
              |      SELECT doc_a AS doc_id, sa AS source FROM x
              |      UNION ALL
              |      SELECT doc_b, sb FROM x) u) v
              |  GROUP BY source)
              |SELECT d.source AS source, CAST(count(*) AS BIGINT) AS docs,
              |  coalesce(max(derivative_docs), 0) AS derivative_docs,
              |  CAST(coalesce(max(derivative_docs), 0) * 10000
              |    // count(*) AS BIGINT) AS derivative_bp
              |FROM documents d LEFT JOIN dv ON dv.source = d.source
              |GROUP BY d.source
              |ORDER BY source""".stripMargin)
    ),

    // Cluster source-purity profile: duplicate clusters bucketed by how
    // many DISTINCT sources they span — the one-line answer to "is our
    // duplication a crawler revisiting (single-source clusters) or a
    // syndication web (many-source clusters)?" that q151's pair matrix
    // and q168's per-source rates imply but don't state. Pure metadata
    // after the dedup pass: the cluster map joins the 2-column doc→source
    // table, then two tiny aggregates (per-cluster distinct sources →
    // per-spread counts).
    Q(
      "q170_cluster_purity",
      (s, d) => {
        val lab = dedupClusters(s, d, 0.8)
        lab
          .join(
            documents(s, d).select(col("doc_id").as("node"), col("source")),
            "node"
          )
          .groupBy(col("lbl"))
          .agg(
            count(lit(1)).as("docs"),
            size(collect_set(col("source"))).cast("long").as("n_sources")
          )
          .groupBy(col("n_sources"))
          .agg(
            count(lit(1)).as("clusters"),
            sum(col("docs")).as("docs")
          )
          .orderBy(col("n_sources"))
      },
      Some(s"""${sqlPairsCte(0.8, recursive = true)},
              |$sqlComponentsCte,
              |cs AS (
              |  SELECT lbl, CAST(count(*) AS BIGINT) AS docs,
              |    CAST(count(DISTINCT d.source) AS BIGINT) AS n_sources
              |  FROM lab JOIN documents d ON d.doc_id = lab.node
              |  GROUP BY lbl)
              |SELECT n_sources, count(*) AS clusters,
              |  CAST(sum(docs) AS BIGINT) AS docs
              |FROM cs
              |GROUP BY n_sources
              |ORDER BY n_sources""".stripMargin)
    ),

    // Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, the MOSS
    // scheme): every window of w=5 consecutive token-4-gram hashes selects
    // its minimum, giving GUARANTEED detection of any shared run of
    // k+w-1 = 8 tokens while storing only ~2/(w+1) of the grams — the
    // principled sampling the modulo-sampled shingle loses (mod-p keeps
    // no coverage guarantee: a long overlap can contain zero sampled
    // grams). One codegen'd loop per row (graft.functions.WinnowKeys),
    // map-only up to the per-source metadata aggregate; the headline is
    // the storage-density audit: selected fingerprints per gram in basis
    // points, which winnowing theory pins near 3333 (= 2/(w+1)).
    Q(
      "q175_winnowing",
      (s, d) => {
        val toks = TextOps.tokens(col("text"))
        documents(s, d)
          .select(
            col("source"),
            greatest(size(toks) - lit(3), lit(0)).cast("long").as("grams"),
            size(graft.functions.TextFunctions.winnowKeys(toks, 4, 5))
              .cast("long")
              .as("fps")
          )
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("docs"),
            sum(col("grams")).as("total_grams"),
            sum(col("fps")).as("total_fps")
          )
          .withColumn("density_bp", expr("(total_fps * 10000L) div total_grams"))
          .orderBy(col("source"))
      },
      Some(s"""$sqlWinnowCte,
              |fp AS (
              |  SELECT doc_id, CAST(count(DISTINCT key) AS BIGINT) AS fps
              |  FROM sel WHERE i <= m - 4 GROUP BY doc_id),
              |base AS (
              |  SELECT doc_id, source,
              |    greatest(CAST(len(ts) AS BIGINT) - 3, 0) AS grams
              |  FROM t)
              |SELECT source, count(*) AS docs,
              |  CAST(sum(grams) AS BIGINT) AS total_grams,
              |  CAST(sum(coalesce(fps, 0)) AS BIGINT) AS total_fps,
              |  CAST(sum(coalesce(fps, 0)) * 10000 // sum(grams) AS BIGINT)
              |    AS density_bp
              |FROM base LEFT JOIN fp USING (doc_id)
              |GROUP BY source
              |ORDER BY source""".stripMargin)
    ),

    // Duplicate-aware training weights: instead of DROPPING near-dup
    // cluster members (q71's kept-set), keep every document and weight it
    // 1/cluster_size — the soft-dedup loss-weighting used when duplicates
    // carry distribution signal you don't want to erase. Σ weights over a
    // cluster ≈ 1 doc, so total weight mass ≈ effective (deduplicated)
    // corpus size. Rides the persisted cluster labels (q69's CC pass);
    // everything after is metadata-sized: cluster sizes, a tiny weight
    // table LEFT-joined back (clustered docs only — the corpus never
    // shuffles), singletons default to full weight.
    Q(
      "q177_dup_weights",
      (s, d) => {
        val lab = dedupClusters(s, d, 0.8)
        val szs = lab.groupBy(col("lbl")).agg(count(lit(1)).as("sz"))
        val wts = lab
          .join(szs, "lbl")
          .select(col("node").as("doc_id"), expr("10000L div sz").as("wt_bp"))
        documents(s, d)
          .join(broadcast(wts), Seq("doc_id"), "left")
          .withColumn("wt_bp", coalesce(col("wt_bp"), lit(10000L)))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("docs"),
            sum(col("wt_bp")).as("weight_mass_bp"),
            sum(when(col("wt_bp") < 10000L, 1L).otherwise(0L)).as("downweighted_docs")
          )
          .orderBy(col("source"))
      },
      Some(s"""${sqlPairsCte(0.8, recursive = true)},
              |$sqlComponentsCte,
              |sz AS (SELECT lbl, CAST(count(*) AS BIGINT) AS sz FROM lab GROUP BY lbl),
              |wt AS (SELECT node AS doc_id, CAST(10000 // sz AS BIGINT) AS wt_bp
              |       FROM lab JOIN sz USING (lbl))
              |SELECT source, count(*) AS docs,
              |  CAST(sum(coalesce(wt_bp, 10000)) AS BIGINT) AS weight_mass_bp,
              |  CAST(sum(CASE WHEN coalesce(wt_bp, 10000) < 10000 THEN 1 ELSE 0 END)
              |    AS BIGINT) AS downweighted_docs
              |FROM documents d LEFT JOIN wt USING (doc_id)
              |GROUP BY source
              |ORDER BY source""".stripMargin)
    ),

    // Winnowing as a CANDIDATE GENERATOR (the second half of the MOSS
    // pipeline q175's density audit sets up): docs sharing any selected
    // fingerprint (the position-free hash component — positions differ
    // across docs, so candidates join on key >> 24) are candidate pairs,
    // then exact distinct-4-gram Jaccard verifies at 0.5. The guarantee
    // LSH banding can't give: any pair sharing a contiguous run of
    // k+w-1 = 8 tokens SHARES a fingerprint (TextExprSpec pins it), with
    // only ~2/(w+1) of the grams ever posted — a 3× smaller inverted
    // index than q35's every-gram postings for the same verify tier.
    // Same scale shape as q35: Σ_fingerprint count² bounded by fingerprint
    // rarity, never all-pairs.
    Q(
      "q181_winnow_pairs",
      (s, d) => {
        val docs = documents(s, d)
          .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        val fp = docs.select(
          col("doc_id"),
          explode(
            array_distinct(
              transform(
                graft.functions.TextFunctions.winnowKeys(col("toks"), 4, 5),
                x => shiftright(x, 24)
              )
            )
          ).as("f")
        )
        val cand = fp.as("a")
          .join(fp.as("b"), col("a.f") === col("b.f") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct()
        val g4 = docs.select(
          col("doc_id"),
          graft.functions.TextFunctions.nGrams(col("toks"), 4).as("s")
        )
        cand
          .join(g4.select(col("doc_id").as("doc_a"), col("s").as("sa")), "doc_a")
          .join(g4.select(col("doc_id").as("doc_b"), col("s").as("sb")), "doc_b")
          .select(col("doc_a"), col("doc_b"), jaccard(col("sa"), col("sb")).as("jaccard"))
          .filter(col("jaccard") >= 0.5)
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some(s"""$sqlWinnowCte,
              |fp AS (SELECT DISTINCT doc_id, key // 16777216 AS f
              |       FROM sel WHERE i <= m - 4),
              |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              |         FROM fp a JOIN fp b ON a.f = b.f AND a.doc_id < b.doc_id),
              |s4 AS (SELECT doc_id, list_distinct(list_transform(
              |         range(1, greatest(len(ts) - 2, 1)),
              |         i -> list_aggregate(ts[i:i+3], 'string_agg', ' '))) AS s
              |       FROM t)
              |SELECT doc_a, doc_b, jaccard FROM (
              |  SELECT doc_a, doc_b,
              |    round(CAST(len(list_intersect(x.s, y.s)) AS DOUBLE)
              |          / len(list_distinct(list_concat(x.s, y.s))), 4) AS jaccard
              |  FROM cand JOIN s4 x ON x.doc_id = doc_a JOIN s4 y ON y.doc_id = doc_b) v
              |WHERE jaccard >= 0.5
              |ORDER BY doc_a, doc_b""".stripMargin)
    ),

    // Overlap-span LOCALIZATION — the step after detection (q181 says
    // WHICH pairs overlap; this says WHERE and HOW MUCH of each document
    // the overlap covers). Winnowing keys carry their gram position in
    // the low 20 bits, so the matched fingerprints of a candidate pair
    // bound the shared region on each side for free: span = max(pos) −
    // min(pos) + k+w−1 tokens (every fingerprint witnesses a full 8-token
    // window). Coverage in bp of each doc's token length separates
    // full-document duplicates (cov ≈ 10⁴ both sides) from partial
    // overlaps — a quote, a shared boilerplate header — which a plain
    // Jaccard score conflates. ≥3 matched fingerprints gates out
    // single-hash coincidences. Scale shape: the identical posting-list
    // equi-join as q181 (never all-pairs), then pair-level metadata
    // aggregates and two broadcast-sized length joins.
    Q(
      "q198_overlap_span",
      (s, d) => {
        val lens = documents(s, d)
          .select(col("doc_id"), size(TextOps.tokens(col("text"))).cast("long").as("n"))
        winnowPairSpans(s, d)
          .join(lens.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
          .join(lens.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
          // clamp: a full-document match's raw span reaches n + gram − 1,
          // so an unclamped ratio would exceed 10⁴ bp (100% coverage)
          .withColumn("span_a", least(col("span_a"), col("na")))
          .withColumn("span_b", least(col("span_b"), col("nb")))
          .select(
            col("doc_a"),
            col("doc_b"),
            col("matched"),
            col("span_a"),
            col("span_b"),
            expr("span_a * 10000L div na").as("cov_a_bp"),
            expr("span_b * 10000L div nb").as("cov_b_bp")
          )
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some(s"""$sqlWinnowPairCte,
              |ln AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n FROM t)
              |SELECT doc_a, doc_b, matched,
              |  least(span_a, la.n) AS span_a, least(span_b, lb.n) AS span_b,
              |  least(span_a, la.n) * 10000 // la.n AS cov_a_bp,
              |  least(span_b, lb.n) * 10000 // lb.n AS cov_b_bp
              |FROM pr JOIN ln la ON la.doc_id = doc_a
              |        JOIN ln lb ON lb.doc_id = doc_b
              |ORDER BY doc_a, doc_b""".stripMargin)
    ),

    // Degree assortativity of the duplicate graph — do heavily-duplicated
    // documents link to other heavily-duplicated documents (assortative,
    // r > 0: mirror/aggregator cliques re-serving each other) or to
    // one-off copies (disassortative, r < 0: hub-and-spoke — one canonical
    // wire story quoted by many singletons)? The Newman degree-correlation
    // coefficient over directed edge endpoints (each undirected verified
    // pair counted both ways, so the x/y marginals coincide and one
    // denominator serves both). Integer-exact: r's numerator m·Σxy−(Σx)²
    // and denominator m·Σx²−(Σx)² stay in int64 (m ≈ 10³ pairs, deg ≤
    // 10² ⇒ m·Σxy ≲ 10¹⁰; re-shard beyond ~10⁶·deg² — the q145 envelope),
    // sign carried outside the division so Spark div and DuckDB // agree.
    // Scale shape: rides the persisted pairs; degrees are one rollup,
    // edge-stat moments one more — all edge-list-sized.
    Q(
      "q204_degree_assortativity",
      (s, d) => {
        val e = lshPairs(s, d, 0.8).select(col("doc_a").as("a"), col("doc_b").as("b"))
        val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
        val deg = sym.groupBy(col("a").as("node")).agg(count(lit(1)).as("dg"))
        sym
          .join(deg.select(col("node").as("a"), col("dg").as("dx")), "a")
          .join(deg.select(col("node").as("b"), col("dg").as("dy")), "b")
          .agg(
            count(lit(1)).as("m"),
            sum(col("dx")).as("sx"),
            sum(col("dx") * col("dy")).as("sxy"),
            sum(col("dx") * col("dx")).as("sx2")
          )
          .select(
            col("m"),
            col("sx"),
            col("sxy"),
            col("sx2"),
            expr("m * sxy - sx * sx").as("num"),
            expr("m * sx2 - sx * sx").as("den"),
            // den = m·Σx²−(Σx)² is a scaled variance: ≥ 0 always, so the
            // sign of r is the sign of num alone. Both Spark `div` and
            // DuckDB `//` truncate toward zero on all operands (DuckDB
            // -7//2 = -3), so the sign-carrying CASE is belt-and-braces
            // clarity, not a cross-engine necessity.
            expr(
              """CASE WHEN m * sx2 - sx * sx = 0 THEN 0L
                | WHEN m * sxy - sx * sx < 0
                |   THEN -(((sx * sx - m * sxy) * 10000L) div (m * sx2 - sx * sx))
                | ELSE ((m * sxy - sx * sx) * 10000L) div (m * sx2 - sx * sx) END"""
                .stripMargin
            ).as("assort_bp")
          )
      },
      Some(s"""${sqlPairsCte(0.8)},
              |e AS (SELECT doc_a AS a, doc_b AS b FROM pairs),
              |sym AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
              |deg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS dg
              |        FROM sym GROUP BY 1),
              |st AS (
              |  SELECT CAST(count(*) AS BIGINT) AS m,
              |    CAST(sum(dx.dg) AS BIGINT) AS sx,
              |    CAST(sum(dx.dg * dy.dg) AS BIGINT) AS sxy,
              |    CAST(sum(dx.dg * dx.dg) AS BIGINT) AS sx2
              |  FROM sym JOIN deg dx ON dx.node = sym.a
              |           JOIN deg dy ON dy.node = sym.b)
              |SELECT m, sx, sxy, sx2,
              |  m * sxy - sx * sx AS num,
              |  m * sx2 - sx * sx AS den,
              |  CASE WHEN m * sx2 - sx * sx = 0 THEN 0
              |    WHEN m * sxy - sx * sx < 0
              |      THEN -(((sx * sx - m * sxy) * 10000) // (m * sx2 - sx * sx))
              |    ELSE ((m * sxy - sx * sx) * 10000) // (m * sx2 - sx * sx) END
              |    AS assort_bp
              |FROM st""".stripMargin)
    ),

    // Dedup-threshold sensitivity of the KEPT MIXTURE — the knob audit:
    // sweeping the near-dup verify threshold (0.7 / 0.8 / 0.9) shifts not
    // just the kept count but the SOURCE COMPOSITION of what survives
    // (syndication-heavy feeds lose share fastest), and mixture shift is
    // what actually moves a training run. One pair pass at the loosest
    // gate (verified ≥ 0.7 ⊇ every tighter tier), per-doc max jaccard,
    // then a 3-literal tier explode — the three thresholds never re-run
    // candidate generation. Per (threshold, source): population, dropped,
    // kept, and the kept-mixture share in bp (per-threshold totals are a
    // 3-row broadcast). Comparisons ride round(j·10⁴) integers — the
    // jaccard column is already 4-dp-rounded on both engines.
    Q(
      "q206_threshold_mixture",
      (s, d) => {
        val src = documents(s, d).select(col("doc_id"), col("source"))
        val maxJ = lshPairs(s, d, 0.7)
          .groupBy(col("doc_b").as("doc_id"))
          .agg(max(col("jaccard")).as("mj"))
        val tiers = src
          .join(maxJ, Seq("doc_id"), "left")
          .select(
            col("source"),
            expr("CAST(round(coalesce(mj, 0.0) * 10000) AS BIGINT)").as("j_bp"),
            explode(array(lit(7000L), lit(8000L), lit(9000L))).as("thr_bp")
          )
          .groupBy(col("thr_bp"), col("source"))
          .agg(
            count(lit(1)).as("docs"),
            sum(when(col("j_bp") >= col("thr_bp"), 1L).otherwise(0L)).as("dropped_docs")
          )
          .withColumn("kept_docs", col("docs") - col("dropped_docs"))
        val totals = tiers
          .groupBy(col("thr_bp"))
          .agg(sum(col("kept_docs")).as("kept_total"))
        tiers
          .join(broadcast(totals), Seq("thr_bp"))
          .withColumn("mix_bp", expr("kept_docs * 10000L div kept_total"))
          .select(
            col("thr_bp"),
            col("source"),
            col("docs"),
            col("dropped_docs"),
            col("kept_docs"),
            col("mix_bp")
          )
          .orderBy(col("thr_bp"), col("source"))
      },
      Some(s"""${sqlPairsCte(0.7)},
              |mj AS (SELECT doc_b AS doc_id,
              |         CAST(round(max(jaccard) * 10000) AS BIGINT) AS j_bp
              |       FROM pairs GROUP BY 1),
              |tiers AS (
              |  SELECT thr_bp, source, count(*) AS docs,
              |    CAST(sum(CASE WHEN coalesce(j_bp, 0) >= thr_bp THEN 1 ELSE 0 END)
              |      AS BIGINT) AS dropped_docs
              |  FROM documents d
              |  LEFT JOIN mj USING (doc_id)
              |  CROSS JOIN (SELECT unnest([7000, 8000, 9000]) AS thr_bp) t
              |  GROUP BY 1, 2),
              |tot AS (SELECT thr_bp,
              |          CAST(sum(docs - dropped_docs) AS BIGINT) AS kept_total
              |        FROM tiers GROUP BY 1)
              |SELECT CAST(tiers.thr_bp AS BIGINT) AS thr_bp, source, docs,
              |  dropped_docs,
              |  CAST(docs - dropped_docs AS BIGINT) AS kept_docs,
              |  CAST((docs - dropped_docs) * 10000 // kept_total AS BIGINT) AS mix_bp
              |FROM tiers JOIN tot USING (thr_bp)
              |ORDER BY thr_bp, source""".stripMargin)
    ),

    // Gate/dedup ORDERING audit — the pipeline-composition pitfall: "gate
    // then dedup" and "dedup then gate" keep DIFFERENT documents whenever
    // a duplicate pair straddles the gate (the canonical doc_a fails the
    // quality gate, its copy doc_b passes: dedup-first drops doc_b and
    // the gate then drops doc_a — the content vanishes entirely; gate-
    // first never sees the failed canonical, so doc_b survives). Reports
    // per source: gate passers, kept under each ordering, and the
    // divergence (gate-first keeps ⊇ dedup-first keeps, pair-based drop
    // rule). Rides the persisted pairs; both orderings are CASE algebra
    // over the same pair-endpoint flags — the corpus is scanned once.
    Q(
      "q207_pipeline_order",
      (s, d) => {
        val toks = TextOps.tokens(col("text"))
        val docs = documents(s, d)
          .select(
            col("doc_id"),
            col("source"),
            (TextOps.qualityScore10k(toks) >= 7900.0).as("pass")
          )
        val flags = docs.select(col("doc_id"), col("pass"))
        val pe = lshPairs(s, d, 0.8)
          .join(flags.select(col("doc_id").as("doc_a"), col("pass").as("pass_a")), "doc_a")
          .join(flags.select(col("doc_id").as("doc_b"), col("pass").as("pass_b")), "doc_b")
        val dropAll = pe.select(col("doc_b").as("doc_id")).distinct().withColumn("d_all", lit(1L))
        val dropGf = pe
          .filter(col("pass_a") && col("pass_b"))
          .select(col("doc_b").as("doc_id"))
          .distinct()
          .withColumn("d_gf", lit(1L))
        docs
          .filter(col("pass"))
          .join(broadcast(dropAll), Seq("doc_id"), "left")
          .join(broadcast(dropGf), Seq("doc_id"), "left")
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("gate_pass"),
            sum(when(col("d_all").isNull, 1L).otherwise(0L)).as("kept_dedup_first"),
            sum(when(col("d_gf").isNull, 1L).otherwise(0L)).as("kept_gate_first")
          )
          .withColumn("divergence", col("kept_gate_first") - col("kept_dedup_first"))
          .orderBy(col("source"))
      },
      Some(s"""${sqlPairsCte(0.8)},
              |g AS (
              |  SELECT doc_id, source,
              |    (${TextOps.sqlQuality10k("string_split_regex(trim(text), '\\s+')")}
              |      >= 7900) AS pass
              |  FROM documents),
              |pe AS (
              |  SELECT pairs.doc_b, ga.pass AS pass_a, gb.pass AS pass_b
              |  FROM pairs JOIN g ga ON ga.doc_id = pairs.doc_a
              |             JOIN g gb ON gb.doc_id = pairs.doc_b),
              |d_all AS (SELECT DISTINCT doc_b AS doc_id FROM pe),
              |d_gf AS (SELECT DISTINCT doc_b AS doc_id FROM pe
              |         WHERE pass_a AND pass_b)
              |SELECT source, count(*) AS gate_pass,
              |  CAST(sum(CASE WHEN g.doc_id IN (SELECT doc_id FROM d_all)
              |               THEN 0 ELSE 1 END) AS BIGINT) AS kept_dedup_first,
              |  CAST(sum(CASE WHEN g.doc_id IN (SELECT doc_id FROM d_gf)
              |               THEN 0 ELSE 1 END) AS BIGINT) AS kept_gate_first,
              |  CAST(sum(CASE WHEN g.doc_id IN (SELECT doc_id FROM d_gf)
              |               THEN 0 ELSE 1 END)
              |    - sum(CASE WHEN g.doc_id IN (SELECT doc_id FROM d_all)
              |               THEN 0 ELSE 1 END) AS BIGINT) AS divergence
              |FROM g
              |WHERE pass
              |GROUP BY source
              |ORDER BY source""".stripMargin)
    ),

    // Partial-dedup SALVAGE accounting — what whole-doc dropping wastes.
    // q198 localizes each pair's shared region; this prices the two
    // possible actions per affected doc (the later doc_id of each pair):
    // overlap covering ≥90% of the doc → drop it (it IS the duplicate);
    // below → trim the shared span and keep the remainder — the
    // quote/boilerplate case where dropping would throw away mostly-novel
    // text. Per-doc worst-case maxima over its pairs (largest coverage,
    // largest span) make the accounting conservative and well-defined
    // when a doc appears in several pairs. Per source: docs and token
    // mass dropped, trimmed span mass, and the salvaged tokens a
    // drop-only policy would have destroyed. Scale shape: q198's
    // posting-list equi-join, then doc- and source-level metadata rolls.
    Q(
      "q201_overlap_salvage",
      (s, d) => {
        val lens = documents(s, d)
          .select(
            col("doc_id"),
            col("source"),
            size(TextOps.tokens(col("text"))).cast("long").as("n")
          )
        val perDoc = winnowPairSpans(s, d)
          .groupBy(col("doc_b").as("doc_id"))
          .agg(max(col("span_b")).as("worst_span"))
        perDoc
          .join(lens, "doc_id")
          .withColumn("worst_span", least(col("worst_span"), col("n")))
          .withColumn("cov_bp", expr("worst_span * 10000L div n"))
          .groupBy(col("source"))
          .agg(
            sum(when(col("cov_bp") >= 9000L, 1L).otherwise(0L)).as("docs_dropped"),
            sum(when(col("cov_bp") >= 9000L, col("n")).otherwise(0L)).as("tokens_dropped"),
            sum(when(col("cov_bp") < 9000L, 1L).otherwise(0L)).as("docs_trimmed"),
            sum(when(col("cov_bp") < 9000L, col("worst_span")).otherwise(0L)).as("tokens_trimmed"),
            sum(when(col("cov_bp") < 9000L, col("n") - col("worst_span")).otherwise(0L))
              .as("tokens_salvaged")
          )
          .orderBy(col("source"))
      },
      Some(s"""$sqlWinnowPairCte,
              |pd AS (SELECT doc_b AS doc_id, max(span_b) AS worst_span
              |       FROM pr GROUP BY 1),
              |sc AS (
              |  SELECT t.source, least(pd.worst_span, len(t.ts)) AS worst_span,
              |    CAST(len(t.ts) AS BIGINT) AS n,
              |    least(pd.worst_span, len(t.ts)) * 10000 // len(t.ts) AS cov_bp
              |  FROM pd JOIN t ON t.doc_id = pd.doc_id)
              |SELECT source,
              |  CAST(sum(CASE WHEN cov_bp >= 9000 THEN 1 ELSE 0 END) AS BIGINT) AS docs_dropped,
              |  CAST(sum(CASE WHEN cov_bp >= 9000 THEN n ELSE 0 END) AS BIGINT) AS tokens_dropped,
              |  CAST(sum(CASE WHEN cov_bp < 9000 THEN 1 ELSE 0 END) AS BIGINT) AS docs_trimmed,
              |  CAST(sum(CASE WHEN cov_bp < 9000 THEN worst_span ELSE 0 END) AS BIGINT)
              |    AS tokens_trimmed,
              |  CAST(sum(CASE WHEN cov_bp < 9000 THEN n - worst_span ELSE 0 END) AS BIGINT)
              |    AS tokens_salvaged
              |FROM sc
              |GROUP BY source
              |ORDER BY source""".stripMargin)
    ),

    // Dedup survivorship-bias audit: does near-dup removal systematically
    // drop BETTER or WORSE documents than it keeps? Compares the kept vs
    // dropped cohorts (q34's drop rule: doc_b of any verified pair) on
    // mean quality and mean length — a dedup pass that preferentially
    // eats high-quality docs (e.g. canonical wire stories syndicated
    // everywhere) silently shifts the training distribution, and nothing
    // in the dedup metrics themselves (pair counts, cluster sizes) can
    // see it. Integer means via floor(sum/count) — exact cross-engine.
    // Scale shape: the drop-id set is pair-bounded (broadcast), the
    // corpus makes ONE pass, and the output is two rows.
    Q(
      "q200_dedup_quality_bias",
      (s, d) => {
        val drops = lshPairs(s, d, 0.8)
          .select(col("doc_b").as("doc_id"))
          .distinct()
          .withColumn("hit", lit(1L))
        val toks = TextOps.tokens(col("text"))
        documents(s, d)
          .join(broadcast(drops), Seq("doc_id"), "left")
          .select(
            when(col("hit").isNotNull, "dropped").otherwise("kept").as("cohort"),
            TextOps.qualityScore10k(toks).cast("long").as("q10k"),
            size(toks).cast("long").as("n")
          )
          .groupBy(col("cohort"))
          .agg(
            count(lit(1)).as("docs"),
            expr("sum(q10k) div count(1)").as("mean_q_units"),
            expr("sum(n) div count(1)").as("mean_tokens")
          )
          .orderBy(col("cohort"))
      },
      Some(s"""${sqlPairsCte(0.8)},
              |sc AS (
              |  SELECT doc_id,
              |    CAST(${TextOps.sqlQuality10k("string_split_regex(trim(text), '\\s+')")}
              |      AS BIGINT) AS q10k,
              |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n
              |  FROM documents)
              |SELECT CASE WHEN doc_id IN (SELECT doc_b FROM pairs)
              |         THEN 'dropped' ELSE 'kept' END AS cohort,
              |  count(*) AS docs,
              |  CAST(sum(q10k) // count(*) AS BIGINT) AS mean_q_units,
              |  CAST(sum(n) // count(*) AS BIGINT) AS mean_tokens
              |FROM sc
              |GROUP BY 1
              |ORDER BY 1""".stripMargin)
    ),

    // Duplication-affinity lift: how much MORE likely a verified near-dup
    // pair is to sit inside one source than independence predicts —
    // observed same-source pair share over the share of same-source pairs
    // in the Σn_s(n_s−1)/N(N−1) pair space, in basis points. Lift ≫ 10⁴ =
    // crawler revisiting its own source; lift ≈ 10⁴ = syndication spread
    // evenly — the single-number verdict behind q151's matrix and q170's
    // purity histogram. Rides the persisted verified pairs; both stats
    // frames are 1-row scalars (whitelisted broadcast cross).
    Q(
      "q189_dup_affinity",
      (s, d) => {
        val src = documents(s, d).select(col("doc_id"), col("source"))
        val ps = lshPairs(s, d, 0.8)
          .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
          .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
          .agg(
            count(lit(1)).as("pairs"),
            sum(when(col("sa") === col("sb"), 1L).otherwise(0L)).as("same_pairs")
          )
        val ds = src
          .groupBy(col("source"))
          .agg(count(lit(1)).as("c"))
          .agg(
            sum(col("c") * (col("c") - 1L)).as("same_space"),
            sum(col("c")).as("n")
          )
        ps.crossJoin(broadcast(ds))
          .withColumn(
            "obs_same_bp",
            when(col("pairs") > 0L, expr("(same_pairs * 10000L) div pairs"))
          )
          .withColumn("expected_same_bp", expr("(same_space * 10000L) div (n * (n - 1L))"))
          .withColumn(
            "lift_bp",
            when(
              col("pairs") > 0L && col("expected_same_bp") > 0L,
              expr("(obs_same_bp * 10000L) div expected_same_bp")
            )
          )
          .select(
            col("pairs"),
            col("same_pairs"),
            col("obs_same_bp"),
            col("expected_same_bp"),
            col("lift_bp")
          )
      },
      Some(s"""${sqlPairsCte(0.8)},
              |ps AS (
              |  SELECT CAST(count(*) AS BIGINT) AS pairs,
              |    CAST(sum(CASE WHEN da.source = db.source THEN 1 ELSE 0 END)
              |      AS BIGINT) AS same_pairs
              |  FROM pairs JOIN documents da ON da.doc_id = doc_a
              |             JOIN documents db ON db.doc_id = doc_b),
              |ds AS (
              |  SELECT CAST(sum(c * (c - 1)) AS BIGINT) AS same_space,
              |    CAST(sum(c) AS BIGINT) AS n
              |  FROM (SELECT CAST(count(*) AS BIGINT) AS c
              |        FROM documents GROUP BY source) g)
              |SELECT pairs, same_pairs,
              |  CASE WHEN pairs > 0 THEN same_pairs * 10000 // pairs END AS obs_same_bp,
              |  same_space * 10000 // (n * (n - 1)) AS expected_same_bp,
              |  CASE WHEN pairs > 0 AND same_space * 10000 // (n * (n - 1)) > 0
              |       THEN (same_pairs * 10000 // pairs) * 10000
              |         // (same_space * 10000 // (n * (n - 1)))
              |  END AS lift_bp
              |FROM ps CROSS JOIN ds""".stripMargin)
    ),

    // MinHash estimator calibration — the missing member of the
    // sketch-audit family (q99 HLL 3σ, q212 quantile rank bound, q219
    // bloom FPR, q109 CMS ε·N): before trusting signature agreement as a
    // Jaccard proxy anywhere (band thresholds, streaming admission), audit
    // how the k=18-component estimate tracks EXACT Jaccard across the
    // similarity range. Per LSH candidate pair: est_bp = matching
    // signature components · ⌊10⁴/k⌋ (granularity 555 bp at k=18) vs
    // exact_bp = ⌊10⁴·|A∩B|/|A∪B|⌋, rolled up per exact-Jaccard decile as
    // a calibration curve (pairs, avg est vs avg exact, mean/max abs
    // error) — all int64, no libm, no statistical-bound boolean (a
    // per-pair 3σ assertion at k=18 would gamble on the corpus; the curve
    // itself is the audit artifact and the cross-engine hash proves both
    // engines compute the identical signatures). Deliberately measured ON
    // THE CANDIDATE SET, where the estimator is actually consulted — so
    // the low-Jaccard deciles exhibit the collision-conditioning bias
    // (colliding on a band forces ≥ 3 matching components, est_bp ≥ 1665
    // however dissimilar the pair), which is exactly the effect a band
    // threshold tuner needs to see. Scale shape: candidates from the band
    // equi-join (never all-pairs), signatures ride the cached shingle
    // pass map-only, the rollup is 10 metadata rows.
    Q(
      "q226_minhash_error",
      (s, d) => {
        // the HASHED shingle frame, NOT the plain one: lshPairs/
        // bandedCandidates persist shingleSetsHashed, and the CacheManager
        // keys on the canonicalized plan — persisting the plain frame here
        // would materialize the heavy string shingle arrays a SECOND time
        // (~5 KB/doc each) instead of sharing the one entry
        val sh = Caches.buildScope("shingle_sets")(Caches.persisted(shingleSetsHashed(s, d)))
        val sig = graft.functions.TextFunctions.minHashSig(col("s"), NumHashes)
        val sigsets = sh.select(
          col("doc_id") +: col("s").as("s") +:
            (0 until NumHashes).map(k => element_at(sig, k + 1).as(s"mh$k")): _*
        )
        val bands = sigsets.select(
          col("doc_id"),
          explode(
            array((0 until NumBands).map { b =>
              struct(
                lit(b).as("band"),
                concat((0 until RowsPerBand).map(j => col(s"mh${RowsPerBand * b + j}")): _*)
                  .as("bsig")
              )
            }: _*)
          ).as("bk")
        ).select(col("doc_id"), col("bk.band").as("band"), col("bk.bsig").as("bsig"))
        val cand = bands.as("a")
          .join(bands.as("b"), Seq("band", "bsig"))
          .filter(col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct()
        val aSide = sigsets.select(
          col("doc_id").as("doc_a") +: col("s").as("sa") +:
            (0 until NumHashes).map(k => col(s"mh$k").as(s"a_mh$k")): _*
        )
        val bSide = sigsets.select(
          col("doc_id").as("doc_b") +: col("s").as("sb") +:
            (0 until NumHashes).map(k => col(s"mh$k").as(s"b_mh$k")): _*
        )
        val matches = (0 until NumHashes)
          .map(k => when(col(s"a_mh$k") === col(s"b_mh$k"), 1L).otherwise(0L))
          .reduce(_ + _)
        cand
          .join(aSide, "doc_a")
          .join(bSide, "doc_b")
          .select(
            (matches * lit(10000L / NumHashes)).as("est_bp"),
            expr("(10000 * size(array_intersect(sa, sb))) div size(array_union(sa, sb))")
              .as("exact_bp")
          )
          .select(
            least(expr("exact_bp div 1000"), lit(9L)).as("decile"),
            col("est_bp"),
            col("exact_bp"),
            abs(col("est_bp") - col("exact_bp")).as("ae")
          )
          .groupBy(col("decile"))
          .agg(
            count(lit(1)).as("pairs"),
            expr("sum(exact_bp) div count(1)").as("avg_exact_bp"),
            expr("sum(est_bp) div count(1)").as("avg_est_bp"),
            expr("sum(ae) div count(1)").as("mean_abs_err_bp"),
            max(col("ae")).as("max_abs_err_bp")
          )
          .orderBy(col("decile"))
      },
      Some {
        val sigList = (0 until NumHashes).map(sqlMinhash).mkString("[", ", ", "]")
        s"""WITH t AS (SELECT doc_id, $sqlTok AS tok FROM documents),
           |sh AS (SELECT doc_id, $sqlShingles AS s FROM t),
           |mh AS (SELECT doc_id, s, $sigList AS sig FROM sh),
           |bands AS (SELECT doc_id, b AS band, $sqlBsig AS bsig
           |          FROM mh CROSS JOIN (SELECT unnest(range($NumBands)) AS b) r),
           |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |         FROM bands a JOIN bands b
           |           ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
           |pr AS (
           |  SELECT
           |    CAST(list_sum(list_transform(range(1, ${NumHashes + 1}),
           |      i -> CASE WHEN x.sig[i] = y.sig[i] THEN 1 ELSE 0 END)) AS BIGINT)
           |      * ${10000 / NumHashes} AS est_bp,
           |    (10000 * CAST(len(list_intersect(x.s, y.s)) AS BIGINT))
           |      // CAST(len(list_distinct(list_concat(x.s, y.s))) AS BIGINT) AS exact_bp
           |  FROM cand JOIN mh x ON x.doc_id = doc_a JOIN mh y ON y.doc_id = doc_b),
           |e AS (SELECT least(exact_bp // 1000, 9) AS decile, est_bp, exact_bp,
           |        abs(est_bp - exact_bp) AS ae
           |      FROM pr)
           |SELECT decile, CAST(count(*) AS BIGINT) AS pairs,
           |  CAST(sum(exact_bp) // count(*) AS BIGINT) AS avg_exact_bp,
           |  CAST(sum(est_bp) // count(*) AS BIGINT) AS avg_est_bp,
           |  CAST(sum(ae) // count(*) AS BIGINT) AS mean_abs_err_bp,
           |  CAST(max(ae) AS BIGINT) AS max_abs_err_bp
           |FROM e
           |GROUP BY decile
           |ORDER BY decile""".stripMargin
      }
    ),

    // Cluster-aware train/val/test split — the CONSTRUCTIVE twin of
    // q101's split-leakage audit: q101 measures how many near-dup pairs
    // straddle a naive per-document split; this query assigns the split
    // by the md5 gate (q38's deterministic idiom, 80/10/10) keyed on the
    // DEDUP-CLUSTER label instead of the doc_id, so every member of a
    // near-dup component lands in the same split and cross-split leakage
    // is zero BY CONSTRUCTION — the hash-checked cross_pairs column
    // proves it, while naive_cross_pairs (same gate keyed on doc_id)
    // shows the leakage the cluster keying removed. Scale shape: the
    // assignment is one map pass over (doc_id, label) — labels ride the
    // shared CC materialization three sibling queries reuse — and the
    // leak counts join the (tiny) verified-pair table to a 3-column
    // assignment frame; nothing wider than the pair list shuffles.
    Q(
      "q227_cluster_split",
      (s, d) => {
        val pairs = lshPairs(s, d, 0.8).select(col("doc_a"), col("doc_b"))
        val labels = dedupClusters(s, d, 0.8).select(col("node").as("doc_id"), col("lbl"))
        def gate(c: String) =
          expr(s"cast(conv(substring(md5(cast($c as string)), 1, 4), 16, 10) as bigint) % 10")
        def splitOf(c: String) =
          when(gate(c) < 8, "train").when(gate(c) === 8, "val").otherwise("test")
        val assigned = Caches.buildScope("q227_split_assign")(Caches.persisted(
          documents(s, d)
            .select(col("doc_id"))
            .join(labels, Seq("doc_id"), "left")
            .select(col("doc_id"), coalesce(col("lbl"), col("doc_id")).as("ckey"))
            .select(
              col("doc_id"),
              col("ckey"),
              splitOf("ckey").as("split"),
              splitOf("doc_id").as("naive_split")
            )
        ))
        val stats = assigned
          .groupBy(col("split"))
          .agg(count(lit(1)).as("docs"), countDistinct(col("ckey")).as("clusters"))
        // ONE pair↔assignment join carrying BOTH split columns per
        // endpoint (was: two joins per leak metric = 4 total); the two
        // leak rollups aggregate the same persisted pair-sized frame
        val joinedPairs = Caches.buildScope("q227_pair_splits")(Caches.persisted(
          pairs
            .join(
              assigned.select(
                col("doc_id").as("doc_a"),
                col("split").as("sa"),
                col("naive_split").as("na")
              ),
              "doc_a"
            )
            .join(
              assigned.select(
                col("doc_id").as("doc_b"),
                col("split").as("sb"),
                col("naive_split").as("nb")
              ),
              "doc_b"
            )
        ))
        def leakOf(a: String, b: String, out: String) =
          joinedPairs
            .filter(col(a) =!= col(b))
            .groupBy(col(a).as("split"))
            .agg(count(lit(1)).as(out))
        stats
          .join(leakOf("sa", "sb", "cross_pairs"), Seq("split"), "left")
          .join(leakOf("na", "nb", "naive_cross_pairs"), Seq("split"), "left")
          .select(
            col("split"),
            col("docs"),
            col("clusters"),
            coalesce(col("cross_pairs"), lit(0L)).as("cross_pairs"),
            coalesce(col("naive_cross_pairs"), lit(0L)).as("naive_cross_pairs")
          )
          .orderBy(col("split"))
      },
      Some {
        def hex4(c: String) = (1 to 4)
          .map(i =>
            s"(strpos('0123456789abcdef', substr(md5(CAST($c AS VARCHAR)), $i, 1)) - 1) * ${math.pow(16, 4 - i).toLong}"
          )
          .mkString("(", " + ", ")")
        def splitOf(c: String) =
          s"CASE WHEN CAST(${hex4(c)} AS BIGINT) % 10 < 8 THEN 'train' " +
            s"WHEN CAST(${hex4(c)} AS BIGINT) % 10 = 8 THEN 'val' ELSE 'test' END"
        s"""${sqlPairsCte(0.8, recursive = true)},
           |$sqlComponentsCte,
           |base AS (SELECT d.doc_id, coalesce(lab.lbl, d.doc_id) AS ckey
           |         FROM documents d LEFT JOIN lab ON lab.node = d.doc_id),
           |a AS (SELECT doc_id, ckey,
           |        ${splitOf("ckey")} AS split,
           |        ${splitOf("doc_id")} AS naive_split
           |      FROM base),
           |st AS (SELECT split, CAST(count(*) AS BIGINT) AS docs,
           |         CAST(count(DISTINCT ckey) AS BIGINT) AS clusters
           |       FROM a GROUP BY 1),
           |lk AS (SELECT x.split AS split, CAST(count(*) AS BIGINT) AS c
           |       FROM pairs p JOIN a x ON x.doc_id = p.doc_a
           |                    JOIN a y ON y.doc_id = p.doc_b
           |       WHERE x.split <> y.split GROUP BY 1),
           |nk AS (SELECT x.naive_split AS split, CAST(count(*) AS BIGINT) AS c
           |       FROM pairs p JOIN a x ON x.doc_id = p.doc_a
           |                    JOIN a y ON y.doc_id = p.doc_b
           |       WHERE x.naive_split <> y.naive_split GROUP BY 1)
           |SELECT st.split, st.docs, st.clusters,
           |  coalesce(lk.c, 0) AS cross_pairs,
           |  coalesce(nk.c, 0) AS naive_cross_pairs
           |FROM st LEFT JOIN lk ON lk.split = st.split
           |        LEFT JOIN nk ON nk.split = st.split
           |ORDER BY st.split""".stripMargin
      }
    ),

    // Exact duplicated-SPAN extraction — the substring-granular dedup
    // audit the gram/fingerprint family can't express: q37 counts
    // colliding grams and winnowing samples them, but neither says WHERE
    // in a document the verbatim duplication sits nor how many tokens it
    // covers. The exact-substring pass of the "Deduplicating Training
    // Data Makes Language Models Better" recipe, at 8-token granularity:
    // positional 8-grams (doc_id, pos, gram) → grams held by ≥ 2
    // distinct docs → per-doc hit positions merged into MAXIMAL
    // duplicated regions. The merge rule is pos-gap ≤ 8: two hit
    // positions p < q cover token intervals [p, p+7] and [q, q+7], which
    // overlap or touch exactly when q − p ≤ 8, so chaining those gives
    // each merged span token size (p1 − p0 + 8) and their sum is the
    // EXACT size of the union of all duplicated windows — no
    // double-count, no gap inflation. Per doc: span count, duplicated
    // token coverage, and coverage share in bp — the per-document signal
    // a span-level scrubber (drop/trim the region, keep the doc) acts
    // on, where q34's pair dedup can only drop whole documents. Scale
    // shape: one corpus explode (linear in tokens), two gram-keyed
    // shuffles (the ≥2-docs rollup and the semi join back), then
    // per-doc windows; at 100 TB the gram string shrinks to a 64-bit
    // fingerprint for shuffle width and the ≥2 rollup to a count-
    // distinct sketch gate — structure unchanged.
    Q(
      "q246_duplicated_spans",
      (s, d) => {
        val docs = tokenized(s, d)
        val agg = duplicatedSpans(s, d)
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_spans"),
            sum(col("p1") - col("p0") + 8).cast("long").as("dup_tokens")
          )
        docs
          .select(col("doc_id"), size(col("tok")).cast("long").as("total_tokens"))
          .join(agg, Seq("doc_id"), "left")
          .select(
            col("doc_id"),
            coalesce(col("n_spans"), lit(0L)).as("n_spans"),
            coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
            col("total_tokens"),
            expr("coalesce(dup_tokens, 0L) * 10000 div greatest(total_tokens, 1L)").as("dup_bp")
          )
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $sqlTok AS tok FROM documents),
              |p AS (SELECT doc_id, tok, unnest(range(1, len(tok) - 6)) AS pos
              |      FROM t WHERE len(tok) >= 8),
              |g AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
              |        list_aggregate(tok[pos:pos+7], 'string_agg', ' ') AS gram
              |      FROM p),
              |dup AS (SELECT gram FROM g GROUP BY gram
              |        HAVING count(DISTINCT doc_id) >= 2),
              |hits AS (SELECT DISTINCT doc_id, pos FROM g SEMI JOIN dup USING (gram)),
              |isl AS (SELECT doc_id, pos,
              |          CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
              |               THEN 0 ELSE 1 END AS brk
              |        FROM hits),
              |sp AS (SELECT doc_id, pos,
              |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
              |                        ROWS UNBOUNDED PRECEDING) AS sid
              |       FROM isl),
              |spans AS (SELECT doc_id, sid, min(pos) AS p0, max(pos) AS p1
              |          FROM sp GROUP BY 1, 2),
              |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
              |          CAST(sum(p1 - p0 + 8) AS BIGINT) AS dup_tokens
              |        FROM spans GROUP BY 1)
              |SELECT t.doc_id, coalesce(a.n_spans, 0) AS n_spans,
              |  coalesce(a.dup_tokens, 0) AS dup_tokens,
              |  CAST(len(t.tok) AS BIGINT) AS total_tokens,
              |  coalesce(a.dup_tokens, 0) * 10000
              |    // greatest(CAST(len(t.tok) AS BIGINT), 1) AS dup_bp
              |FROM t LEFT JOIN agg a USING (doc_id)
              |ORDER BY t.doc_id""".stripMargin)
    ),

    // Span-level SCRUB — the constructive twin of q246's audit, and the
    // action step of the exact-substring dedup recipe: remove every
    // token covered by a duplicated region (all occurrences — the
    // cross-doc repeated boilerplate/template content) while KEEPING the
    // document, where q34's pair policy can only drop documents whole.
    // Output is the scrub manifest: per doc the kept-token count and an
    // md5 of the scrubbed text (reconstructed from kept tokens in
    // position order on both engines — whitespace-normalized, so the
    // digests compare exactly). Scale shape: spans ride the persisted
    // q246 materialization; the scrub itself is one token explode
    // anti-joined against exploded span positions (both linear, keyed
    // by (doc, pos)) and one per-doc ordered reassembly.
    Q(
      "q247_span_scrub",
      (s, d) => {
        val docs = tokenized(s, d)
        val covered = duplicatedSpans(s, d)
          .select(col("doc_id"), explode(sequence(col("p0"), col("p1") + 7)).as("pos"))
        val toksPos = docs
          .select(col("doc_id"), posexplode(col("tok")).as(Seq("p", "tkn")))
          .select(col("doc_id"), (col("p") + 1).cast("long").as("pos"), col("tkn"))
        val kept = toksPos.join(covered, Seq("doc_id", "pos"), "left_anti")
        val scrub = kept
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("kept_tokens"),
            array_join(
              transform(
                array_sort(collect_list(struct(col("pos"), col("tkn")))),
                _.getField("tkn")
              ),
              " "
            ).as("st")
          )
        docs
          .select(col("doc_id"), size(col("tok")).cast("long").as("total_tokens"))
          .join(scrub, Seq("doc_id"), "left")
          .select(
            col("doc_id"),
            col("total_tokens"),
            // a doc absent from `kept` had EVERY token scrubbed
            coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
            md5(coalesce(col("st"), lit(""))).as("scrub_md5")
          )
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $sqlTok AS tok FROM documents),
              |p AS (SELECT doc_id, tok, unnest(range(1, len(tok) - 6)) AS pos
              |      FROM t WHERE len(tok) >= 8),
              |g AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
              |        list_aggregate(tok[pos:pos+7], 'string_agg', ' ') AS gram
              |      FROM p),
              |dup AS (SELECT gram FROM g GROUP BY gram
              |        HAVING count(DISTINCT doc_id) >= 2),
              |hits AS (SELECT DISTINCT doc_id, pos FROM g SEMI JOIN dup USING (gram)),
              |isl AS (SELECT doc_id, pos,
              |          CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
              |               THEN 0 ELSE 1 END AS brk
              |        FROM hits),
              |sp AS (SELECT doc_id, pos,
              |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
              |                        ROWS UNBOUNDED PRECEDING) AS sid
              |       FROM isl),
              |spans AS (SELECT doc_id, sid, min(pos) AS p0, max(pos) AS p1
              |          FROM sp GROUP BY 1, 2),
              |cov AS (SELECT doc_id, CAST(unnest(range(p0, p1 + 8)) AS BIGINT) AS pos
              |        FROM spans),
              |tokpos AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos, tok[pos] AS tkn
              |           FROM (SELECT doc_id, tok,
              |                   unnest(range(1, len(tok) + 1)) AS pos FROM t)),
              |kept AS (SELECT tp.doc_id, tp.pos, tp.tkn FROM tokpos tp
              |         ANTI JOIN cov ON cov.doc_id = tp.doc_id AND cov.pos = tp.pos),
              |scrub AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS kept_tokens,
              |            string_agg(tkn, ' ' ORDER BY pos) AS st
              |          FROM kept GROUP BY 1)
              |SELECT t.doc_id, CAST(len(t.tok) AS BIGINT) AS total_tokens,
              |  coalesce(s2.kept_tokens, 0) AS kept_tokens,
              |  md5(coalesce(s2.st, '')) AS scrub_md5
              |FROM t LEFT JOIN scrub s2 USING (doc_id)
              |ORDER BY t.doc_id""".stripMargin)
    )
  )

  /** Definitional oracle shared by q35 and q130 (two physical algorithms,
    * one logical operator): every pair with word-5gram Jaccard ≥ 0.5,
    * computed in DuckDB via the plain inverted-index join.
    */
  private def sqlJaccard5Oracle: String =
    s"""WITH t AS (SELECT doc_id, $sqlTok AS tok FROM documents),
       |g AS (SELECT doc_id, len(s) AS n, s FROM (
       |  SELECT doc_id, list_distinct(list_transform(
       |    range(1, greatest(len(tok) - 3, 1)),
       |    i -> list_aggregate(tok[i:i+4], 'string_agg', ' '))) AS s
       |  FROM t) z),
       |ex AS (SELECT doc_id, unnest(s) AS gram FROM g),
       |sh AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
       |       FROM ex a JOIN ex b ON a.gram = b.gram AND a.doc_id < b.doc_id
       |       GROUP BY 1, 2)
       |SELECT doc_a, doc_b, jaccard FROM (
       |  SELECT doc_a, doc_b,
       |    round(CAST(shared AS DOUBLE) / (x.n + y.n - shared), 4) AS jaccard
       |  FROM sh JOIN g x ON x.doc_id = doc_a JOIN g y ON y.doc_id = doc_b) v
       |WHERE jaccard >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin
}
