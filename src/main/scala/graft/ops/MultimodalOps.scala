package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2.9 E16): opaque `binary`
  * payloads with typed metadata structs, chunking, and a feature-extraction
  * stage over `mapPartitions` with a STUBBED decoder (image/audio codecs are
  * not in this container — the Spark-side schema, partitioning and batch
  * shape are the real, tested part).
  *
  * The testdata has no true binary column, so the `documents.text` bytes
  * stand in as the payload; the schema below is what a real image/audio
  * table would carry at 100 TB (payload kept opaque so Parquet stores it
  * column-separated and scans that don't touch `content` never read it).
  */
object MultimodalOps {

  import Tables._

  /** Canonical multimodal schema: opaque bytes + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("source", StringType, nullable = true)
    )), nullable = false)
  ))

  /** Lift the documents table into the multimodal shape. */
  def asMedia(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("content"),
      struct(
        lit("text/plain").as("mime"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        col("source").as("source")
      ).as("meta")
    )

  final case class MediaFeatures(media_id: Long, width: Int, height: Int, featNorm: Double)

  /** Pluggable codec seam: the decode step of [[extractFeatures]].
    * Implementations are FACTORIES — serializable, shipped to executors
    * once; `open()` is called once per PARTITION on the executor and
    * returns that partition's [[MediaDecoder.Session]] (codec contexts,
    * native handles, scratch buffers). A fresh session per partition is
    * what makes codec state safe without locking: concurrent tasks in
    * one executor JVM never share a session, so a non-thread-safe codec
    * context (the normal kind) needs no synchronization. `Session.close`
    * runs after the partition's last row.
    *
    * The offline default is [[StubDecoder]] (this container has no
    * image/audio codec libraries); a cluster with codecs present plugs a
    * real implementation into the SAME mapPartitions contract — schema,
    * partitioning, and batch shape identical, so q50–q54's plumbing
    * covers the real path's Spark side.
    */
  trait MediaDecoder extends Serializable {
    def open(): MediaDecoder.Session
  }
  object MediaDecoder {
    trait Session {
      def decode(mediaId: Long, bytes: Array[Byte]): MediaFeatures
      def close(): Unit = ()
    }
  }

  /** STUB decoder: a real deployment would decode image/audio bytes
    * (e.g. JPEG → HxWxC tensor); the container has no codec libs, so the
    * "decode" is a deterministic fake derived from the md5 of the bytes —
    * the partitioning, batch shape and output schema are the real
    * contract, and the per-session md5 instance plays the per-partition
    * codec context (created in `open`, reused across the partition's
    * rows, never shared between tasks).
    */
  object StubDecoder extends MediaDecoder {
    override def open(): MediaDecoder.Session = new MediaDecoder.Session {
      private val md = java.security.MessageDigest.getInstance("MD5")
      override def decode(id: Long, bytes: Array[Byte]): MediaFeatures = {
        val h = md.digest(bytes).map("%02x".format(_)).mkString
        val w = java.lang.Long.parseLong(h.substring(0, 4), 16).toInt % 640
        val hh = java.lang.Long.parseLong(h.substring(4, 8), 16).toInt % 480
        MediaFeatures(id, w, hh, (w.toLong * hh).toDouble)
      }
    }
  }

  /** Feature extraction over `mapPartitions` with a pluggable decoder —
    * [[StubDecoder]] offline, a real codec on clusters that have one.
    * `open()` runs once per partition before the first decode; the
    * session's `close()` runs after the last row (exactly-once per
    * partition under normal iteration — Spark fully consumes
    * mapPartitions iterators).
    */
  def extractFeatures(
      media: DataFrame,
      decoder: MediaDecoder = StubDecoder
  ): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val session = decoder.open() // per-partition codec setup, once
        var closed = false
        def closeOnce(): Unit = if (!closed) { closed = true; session.close() }
        // close() must fire even when the consumer stops pulling before
        // exhaustion — limit/take and failed tasks abandon the iterator
        // with hasNext never returning false, and a native codec context
        // leaked per task accumulates in a long-lived executor (the real
        // deployment this seam exists for). The task-completion listener
        // is the guaranteed hook (runs on success, failure, and
        // cancellation); the exhaustion close stays for promptness, the
        // flag makes the pair idempotent.
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
        new Iterator[MediaFeatures] {
          def hasNext: Boolean = {
            val h = it.hasNext
            if (!h) closeOnce()
            h
          }
          def next(): MediaFeatures = {
            val (id, bytes) = it.next()
            session.decode(id, bytes)
          }
        }
      }
  }

  /** The offline default path, kept by name for the oracle queries. */
  def extractFeaturesStub(media: DataFrame): Dataset[MediaFeatures] =
    extractFeatures(media, StubDecoder)

  /** One content-defined chunk of a binary payload. */
  final case class CdcChunk(media_id: Long, chunk_idx: Int, offset: Int, len: Int, hash: String)

  /** Content-defined chunking (Rabin-style): a chunk boundary falls where
    * the WINDOWED rolling hash of the last `Win` bytes matches a bit mask,
    * subject to min/max chunk lengths. Because the boundary decision
    * depends only on a sliding window — never on the chunk start — an
    * insertion or edit desynchronizes chunking for at most ~one window
    * past the edit, after which boundaries (and therefore chunk hashes)
    * re-align with the original stream. That resync property is what makes
    * chunk-hash dedup robust to edits, where fixed-stride chunking (q51)
    * loses every chunk after the first shifted byte. This is the storage/
    * multimodal dedup architecture (LBFS/restic/borg lineage, all public).
    *
    * Byte-level loops belong in partition-level imperative code, not
    * Column algebra — same justification as the codec stub above; state is
    * O(window) per row, the pass is map-only and linear at 100 TB.
    */
  def cdcChunks(
      media: DataFrame,
      maskBits: Int = 5,
      minLen: Int = 16,
      maxLen: Int = 128
  ): Dataset[CdcChunk] = {
    import media.sparkSession.implicits._
    val mask = (1L << maskBits) - 1L
    media
      .select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val Win = 16
        val P = 1000003L
        // p^Win for the outgoing byte, precomputed once per partition
        val pw = { var x = 1L; var i = 0; while (i < Win) { x *= P; i += 1 }; x }
        it.flatMap { case (id, bytes) =>
          val out = Vector.newBuilder[CdcChunk]
          var start = 0
          var h = 0L
          var idx = 0
          var i = 0
          while (i < bytes.length) {
            h = h * P + (bytes(i) & 0xffL)
            if (i - start >= Win) h -= (bytes(i - Win) & 0xffL) * pw
            val len = i - start + 1
            if ((len >= minLen && (h & mask) == mask) || len == maxLen || i == bytes.length - 1) {
              val chunk = java.util.Arrays.copyOfRange(bytes, start, i + 1)
              out += CdcChunk(id, idx, start, len, md.digest(chunk).map("%02x".format(_)).mkString)
              idx += 1
              start = i + 1
              h = 0L
            }
            i += 1
          }
          out.result()
        }
      }
  }

  val queries: Seq[Q] = Seq(
    // Binary metadata pass: byte length + content hash (columnar; the scan
    // only reads the projected columns).
    Q(
      "q50_blob_meta",
      (s, d) =>
        asMedia(s, d)
          .select(
            col("media_id"),
            col("meta.n_bytes").as("n_bytes"),
            sha2(col("content"), 256).as("sha")
          )
          .orderBy(col("media_id")),
      Some("""SELECT doc_id AS media_id,
             |  octet_length(encode(text)) AS n_bytes,
             |  sha256(text) AS sha
             |FROM documents
             |ORDER BY media_id""".stripMargin)
    ),

    // Chunking plumbing: fixed 64-byte chunks per blob, totals per source.
    Q(
      "q51_blob_chunks",
      (s, d) =>
        asMedia(s, d)
          .select(
            col("meta.source").as("source"),
            col("meta.n_bytes").as("n_bytes"),
            ceil(col("meta.n_bytes") / lit(64.0)).cast("long").as("n_chunks")
          )
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("blobs"),
            sum(col("n_bytes")).as("total_bytes"),
            sum(col("n_chunks")).as("total_chunks")
          )
          .orderBy(col("source")),
      Some("""SELECT source, count(*) AS blobs,
             |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
             |  CAST(sum(CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT)) AS BIGINT) AS total_chunks
             |FROM documents
             |GROUP BY source
             |ORDER BY source""".stripMargin)
    ),

    // Frame sampling: every 4th fixed-size chunk of the payload (the video
    // frame-sample shape: decode-free stride sampling over an opaque blob),
    // per-media sampled-frame count + a fingerprint of the sampled bytes.
    // Pure columnar expressions — at 100 TB this is a map-only pass.
    Q(
      "q53_frame_sample",
      (s, d) => {
        val nChunks = ceil(length(col("text")) / lit(64.0)).cast("int")
        val chunks = when(
          length(col("text")) > 0,
          transform(sequence(lit(0), nChunks - 1), i => substring(col("text"), i * 64 + 1, lit(64)))
        ).otherwise(array().cast("array<string>"))
        val frames = filter(chunks, (_, i) => i % 4 === 0)
        documents(s, d)
          .select(
            col("doc_id").as("media_id"),
            size(frames).cast("long").as("n_frames"),
            md5(concat_ws("", frames)).as("sample_fp")
          )
          .orderBy(col("media_id"))
      },
      Some("""SELECT doc_id AS media_id, len(frames) AS n_frames,
             |  md5(coalesce(list_aggregate(frames, 'string_agg', ''), '')) AS sample_fp
             |FROM (SELECT doc_id,
             |    list_filter(
             |      list_transform(range(0, CAST(ceil(length(text) / 64.0) AS INT)),
             |                     i -> substr(text, i * 64 + 1, 64)),
             |      (c, i) -> (i - 1) % 4 = 0) AS frames
             |  FROM documents) t
             |ORDER BY media_id""".stripMargin)
    ),

    // Chunk-level dedup ratio: fixed 64-byte chunks hashed and counted per
    // source — the content-dedup measurement a multimodal store runs before
    // chunk-deduplicated storage. Map-only explode + one countDistinct
    // shuffle keyed by source; linear at 100 TB. The ratio is floor-
    // truncated from integer counts, so it is engine-stable.
    Q(
      "q54_chunk_dedup",
      (s, d) => {
        val nChunks = ceil(length(col("text")) / lit(64.0)).cast("int")
        val chunks = when(
          length(col("text")) > 0,
          transform(sequence(lit(0), nChunks - 1), i => substring(col("text"), i * 64 + 1, lit(64)))
        ).otherwise(array().cast("array<string>"))
        documents(s, d)
          .select(col("source"), explode(chunks).as("chunk"))
          .select(col("source"), md5(col("chunk")).as("h"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("total_chunks"), countDistinct(col("h")).as("uniq_chunks"))
          .withColumn(
            "dup_ratio",
            floor((lit(1.0) - col("uniq_chunks").cast("double") / col("total_chunks")) * 10000) / 10000.0
          )
          .orderBy(col("source"))
      },
      Some("""SELECT source, count(*) AS total_chunks,
             |  count(DISTINCT h) AS uniq_chunks,
             |  floor((1.0 - CAST(count(DISTINCT h) AS DOUBLE) / count(*)) * 10000) / 10000.0 AS dup_ratio
             |FROM (SELECT source, md5(c) AS h FROM (
             |    SELECT source,
             |      unnest(list_transform(range(0, CAST(ceil(length(text) / 64.0) AS INT)),
             |                            i -> substr(text, i * 64 + 1, 64))) AS c
             |    FROM documents) u) t
             |GROUP BY source
             |ORDER BY source""".stripMargin)
    ),

    // Stub feature extraction: deterministic fake decode (md5-derived
    // dimensions), aggregated per source. The columnar twin of
    // `extractFeaturesStub` so the oracle can check the same math.
    Q(
      "q52_stub_features",
      (s, d) => {
        val h = md5(col("text"))
        documents(s, d)
          .select(
            col("source"),
            (conv(substring(h, 1, 4), 16, 10).cast("long") % 640).cast("int").as("width"),
            (conv(substring(h, 5, 4), 16, 10).cast("long") % 480).cast("int").as("height")
          )
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n"),
            round(avg(col("width")), 4).as("avg_w"),
            round(avg(col("height")), 4).as("avg_h")
          )
          .orderBy(col("source"))
      },
      Some(s"""SELECT source, count(*) AS n,
              |  round(avg(width), 4) AS avg_w,
              |  round(avg(height), 4) AS avg_h
              |FROM (SELECT source,
              |    CAST(${hexToIntSql("substr(md5(text), 1, 4)", 4)} % 640 AS INT) AS width,
              |    CAST(${hexToIntSql("substr(md5(text), 5, 4)", 4)} % 480 AS INT) AS height
              |  FROM documents) t
              |GROUP BY source
              |ORDER BY source""".stripMargin)
    ),

    // Content-defined chunking as an ORACLE-CHECKED query — the
    // relational core of `cdcChunks` (whose min/max-length clamps force
    // sequential state and live in mapPartitions): with pure local
    // boundaries — position i ends a chunk iff the 16-byte window hash
    // matches a 6-bit mask (expected chunk ≈ 64+15 bytes) — the WHOLE
    // chunking is window algebra: boundary positions from one explode,
    // chunk spans from a per-doc lag(), chunk bytes by substring
    // re-slice. Because a boundary depends only on its window, an edit
    // re-syncs after ≤ one window — the LBFS/restic robustness property
    // fixed-stride q51 lacks — and the corpus-wide chunk-hash dedup rate
    // is the storage-dedup headline per source. Scale shape: boundary
    // detection is ONE codegen'd native per row ([[graft.functions
    // .CdcCuts]], pinned by TextExprSpec to the window-explode + md5-mask
    // formulation it replaced) — the explode emits only the ~1/64 cut
    // rows instead of a 16-char substring + struct per byte position
    // (~24× the corpus volume as intermediates); spans re-join
    // doc-keyed, rollup is per-source metadata.
    Q(
      "q224_cdc_chunks",
      (s, d) => {
        val t = documents(s, d)
          .select(col("doc_id"), col("source"), col("text"), length(col("text")).cast("long").as("n"))
        val cuts = t
          .filter(col("n") >= 16L)
          .select(
            col("doc_id"),
            explode(graft.functions.TextFunctions.cdcCuts(col("text"))).as("cut")
          )
          .union(t.select(col("doc_id"), col("n").as("cut")))
          .distinct()
        val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("cut"))
        val spans = cuts
          .withColumn("prev", coalesce(lag(col("cut"), 1).over(wDoc), lit(0L)))
        spans
          .join(t.select(col("doc_id"), col("source"), col("text")), "doc_id")
          .select(
            col("source"),
            (col("cut") - col("prev")).as("clen"),
            md5(expr("substring(text, cast(prev + 1 as int), cast(cut - prev as int))")).as("h")
          )
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("chunks"),
            countDistinct(col("h")).as("distinct_chunks"),
            expr("CAST(sum(clen) div count(1) AS BIGINT)").as("mean_len"),
            expr("((count(1) - count(DISTINCT h)) * 10000L) div count(1)").as("dup_bp")
          )
          .orderBy(col("source"))
      },
      Some(s"""WITH t AS (SELECT doc_id, source, text, CAST(len(text) AS BIGINT) AS n
              |           FROM documents),
              |g AS (SELECT doc_id, n, text,
              |        unnest(range(1, greatest(CAST(n AS INTEGER) - 14, 1))) AS i
              |      FROM t),
              |b AS (SELECT doc_id, i + 15 AS cut FROM g
              |      WHERE ${hexToIntSql("substr(md5(substr(text, CAST(i AS INTEGER), 16)), 1, 4)", 4)} % 64 = 0),
              |cuts AS (SELECT doc_id, CAST(cut AS BIGINT) AS cut FROM b
              |         UNION SELECT doc_id, n FROM t),
              |sp AS (SELECT doc_id, cut,
              |         coalesce(lag(cut) OVER (PARTITION BY doc_id ORDER BY cut), 0) AS prev
              |       FROM cuts),
              |ck AS (SELECT t.source, sp.cut - sp.prev AS clen,
              |         md5(substr(t.text, CAST(sp.prev + 1 AS INTEGER),
              |                    CAST(sp.cut - sp.prev AS INTEGER))) AS h
              |       FROM sp JOIN t USING (doc_id))
              |SELECT source, CAST(count(*) AS BIGINT) AS chunks,
              |  CAST(count(DISTINCT h) AS BIGINT) AS distinct_chunks,
              |  CAST(sum(clen) AS BIGINT) // count(*) AS mean_len,
              |  (CAST(count(*) AS BIGINT) - count(DISTINCT h)) * 10000 // count(*) AS dup_bp
              |FROM ck
              |GROUP BY source
              |ORDER BY source""".stripMargin)
    ),

    // Clip / re-encode detection across blobs: two media files that share
    // a run of content (a clipped video, a re-muxed audio track, a
    // boilerplate-wrapped scan) share their interior CONTENT-DEFINED
    // chunks even when byte offsets shifted — exactly why CDC (q224)
    // beats fixed-grid chunking (q51) for cross-blob dedup. Per blob
    // pair: shared distinct chunks and the containment ratio
    // shared/min(|A|,|B|) in basis points; ≥2500 bp flags containment
    // candidates (one quarter of the smaller blob's content appears in
    // the larger). Scale discipline: candidates come ONLY from the
    // chunk-hash equi-join (Σ per-hash n² — never all blob pairs), and
    // "stop chunks" (a hash in >64 blobs: container headers, shared
    // boilerplate) are dropped BEFORE pairing — the PPJoin/q32 viral-key
    // guard that keeps one ubiquitous chunk from exploding quadratically;
    // both the shared counts and the per-blob denominators live in the
    // same non-viral universe so the ratio stays internally consistent.
    Q(
      "q230_chunk_containment",
      (s, d) => {
        val t = documents(s, d)
          .select(col("doc_id"), col("text"), length(col("text")).cast("long").as("n"))
        val cuts = t
          .filter(col("n") >= 16L)
          .select(
            col("doc_id"),
            explode(graft.functions.TextFunctions.cdcCuts(col("text"))).as("cut")
          )
          .union(t.select(col("doc_id"), col("n").as("cut")))
          .distinct()
        val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("cut"))
        val chunkHashes = cuts
          .withColumn("prev", coalesce(lag(col("cut"), 1).over(wDoc), lit(0L)))
          .join(t.select(col("doc_id"), col("text")), "doc_id")
          .select(
            col("doc_id"),
            md5(expr("substring(text, cast(prev + 1 as int), cast(cut - prev as int))")).as("h")
          )
          .distinct()
        val nonViral = Caches.persisted(
          chunkHashes
            .withColumn("freq", count(lit(1)).over(Window.partitionBy(col("h"))))
            .filter(col("freq") <= 64L)
            .select(col("doc_id"), col("h"))
        )
        val sizes = nonViral.groupBy(col("doc_id")).agg(count(lit(1)).as("nc"))
        val pairs = nonViral
          .select(col("doc_id").as("doc_a"), col("h"))
          .join(nonViral.select(col("doc_id").as("doc_b"), col("h")), Seq("h"))
          .filter(col("doc_a") < col("doc_b"))
          .groupBy(col("doc_a"), col("doc_b"))
          .agg(count(lit(1)).as("shared"))
        pairs
          .join(sizes.select(col("doc_id").as("doc_a"), col("nc").as("ca")), Seq("doc_a"))
          .join(sizes.select(col("doc_id").as("doc_b"), col("nc").as("cb")), Seq("doc_b"))
          .withColumn("containment_bp", expr("(shared * 10000L) div least(ca, cb)"))
          .filter(col("containment_bp") >= 2500L)
          .select(col("doc_a"), col("doc_b"), col("shared"), col("ca"), col("cb"), col("containment_bp"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some(s"""WITH t AS (SELECT doc_id, text, CAST(len(text) AS BIGINT) AS n
              |           FROM documents),
              |g AS (SELECT doc_id, n, text,
              |        unnest(range(1, greatest(CAST(n AS INTEGER) - 14, 1))) AS i
              |      FROM t),
              |b AS (SELECT doc_id, i + 15 AS cut FROM g
              |      WHERE ${hexToIntSql("substr(md5(substr(text, CAST(i AS INTEGER), 16)), 1, 4)", 4)} % 64 = 0),
              |cuts AS (SELECT doc_id, CAST(cut AS BIGINT) AS cut FROM b
              |         UNION SELECT doc_id, n FROM t),
              |sp AS (SELECT doc_id, cut,
              |         coalesce(lag(cut) OVER (PARTITION BY doc_id ORDER BY cut), 0) AS prev
              |       FROM cuts),
              |ck AS (SELECT DISTINCT sp.doc_id,
              |         md5(substr(t.text, CAST(sp.prev + 1 AS INTEGER),
              |                    CAST(sp.cut - sp.prev AS INTEGER))) AS h
              |       FROM sp JOIN t USING (doc_id)),
              |nv AS (SELECT doc_id, h FROM ck
              |       WHERE h IN (SELECT h FROM ck GROUP BY h HAVING count(*) <= 64)),
              |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nc FROM nv GROUP BY doc_id),
              |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |        CAST(count(*) AS BIGINT) AS shared
              |      FROM nv a JOIN nv b ON a.h = b.h AND a.doc_id < b.doc_id
              |      GROUP BY 1, 2)
              |SELECT doc_a, doc_b, shared, sa.nc AS ca, sb.nc AS cb,
              |  (shared * 10000) // least(sa.nc, sb.nc) AS containment_bp
              |FROM p JOIN sz sa ON p.doc_a = sa.doc_id
              |       JOIN sz sb ON p.doc_b = sb.doc_id
              |WHERE (shared * 10000) // least(sa.nc, sb.nc) >= 2500
              |ORDER BY doc_a, doc_b""".stripMargin)
    )
  )

  /** DuckDB hex→int without relying on hex casts. */
  private def hexToIntSql(h: String, digits: Int): String =
    (1 to digits)
      .map(i => s"(strpos('0123456789abcdef', substr($h, $i, 1)) - 1) * ${math.pow(16, digits - i).toLong}")
      .mkString("(", " + ", ")")
}
