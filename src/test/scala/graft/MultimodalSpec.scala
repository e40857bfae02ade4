package graft

import graft.ops.MultimodalOps

/** The mapPartitions stub decoder (the real multimodal plumbing) agrees
  * with its columnar twin (q52's md5-derived fake dimensions).
  */
class MultimodalSpec extends SparkSpec {

  test("extractFeaturesStub matches the columnar fake-decode math") {
    val sfDir = "/root/testdata/sf0.001"
    val media = MultimodalOps.asMedia(spark, sfDir)
    val feats = MultimodalOps.extractFeaturesStub(media).collect().map(f => f.media_id -> f).toMap

    import org.apache.spark.sql.functions._
    val columnar = graft.ops.Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        conv(substring(md5(col("text")), 1, 4), 16, 10).cast("long").%(640).cast("int").as("w"),
        conv(substring(md5(col("text")), 5, 4), 16, 10).cast("long").%(480).cast("int").as("h")
      )
      .collect()

    assert(columnar.nonEmpty)
    columnar.foreach { row =>
      val id = row.getLong(0)
      val f = feats(id)
      assert(f.width == row.getInt(1), s"width mismatch for doc $id")
      assert(f.height == row.getInt(2), s"height mismatch for doc $id")
    }
  }

  test("media schema keeps payload opaque binary with typed metadata") {
    val media = MultimodalOps.asMedia(spark, "/root/testdata/sf0.001")
    val schema = media.schema
    assert(schema("content").dataType.typeName == "binary")
    val meta = schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSet == Set("mime", "n_bytes", "source"))
  }

  test("content-defined chunking resyncs after an edit; fixed stride does not") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val text = graft.ops.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .orderBy(length(col("text")).desc, col("doc_id"))
      .select("text")
      .head()
      .getString(0)
    val original = text.getBytes("UTF-8")
    assert(original.length > 400, "need a non-trivial payload")
    // one byte inserted near the front: the worst case for fixed stride
    val edited = (original.take(10) :+ 'X'.toByte) ++ original.drop(10)

    val media = Seq((1L, original), (2L, edited)).toDF("media_id", "content")
    val chunks = MultimodalOps
      .cdcChunks(media)
      .collect()
      .groupBy(_.media_id)
      .view
      .mapValues(_.map(_.hash).toSeq)
      .toMap
    def sharedFrac(a: Seq[String], b: Seq[String]): Double = {
      val bCount = b.groupBy(identity).view.mapValues(_.size).toMap
      val shared = a
        .groupBy(identity)
        .map { case (h, xs) => math.min(xs.size, bCount.getOrElse(h, 0)) }
        .sum
      shared.toDouble / a.size
    }
    val cdcShared = sharedFrac(chunks(1L), chunks(2L))

    // fixed-stride control over the same payloads
    def fixed(bytes: Array[Byte]): Seq[String] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      bytes.grouped(64).map(c => md.digest(c).map("%02x".format(_)).mkString).toSeq
    }
    val fixedShared = sharedFrac(fixed(original), fixed(edited))

    // CDC loses only the chunks the edit touches; fixed stride loses
    // everything after the insertion point
    assert(cdcShared > 0.7, s"CDC resync failed: shared=$cdcShared")
    assert(fixedShared < 0.2, s"fixed-stride control unexpectedly robust: $fixedShared")
    assert(cdcShared > fixedShared)

    // determinism + coverage: chunk lengths partition each payload exactly
    val byId = MultimodalOps.cdcChunks(media).collect().groupBy(_.media_id)
    assert(byId(1L).sortBy(_.chunk_idx).map(_.len).sum == original.length)
    assert(byId(2L).sortBy(_.chunk_idx).map(_.len).sum == edited.length)
  }

  test("MediaDecoder seam: custom decoder rides the same mapPartitions contract with per-partition lifecycle") {
    // The pluggable-codec contract a cluster WITH codec libs exercises:
    // open() once per non-empty partition before the first decode, every
    // payload decoded exactly once, close() after the partition's last
    // row — counted via accumulators because the decoder runs on
    // executor threads.
    val sfDir = "/root/testdata/sf0.001"
    val media = MultimodalOps.asMedia(spark, sfDir).repartition(4)
    val opens = spark.sparkContext.longAccumulator("opens")
    val closes = spark.sparkContext.longAccumulator("closes")
    val decodes = spark.sparkContext.longAccumulator("decodes")
    class CountingDecoder extends MultimodalOps.MediaDecoder {
      override def open(): MultimodalOps.MediaDecoder.Session = {
        opens.add(1)
        new MultimodalOps.MediaDecoder.Session {
          override def decode(id: Long, bytes: Array[Byte]): MultimodalOps.MediaFeatures = {
            decodes.add(1)
            MultimodalOps.MediaFeatures(id, bytes.length, 1, bytes.length.toDouble)
          }
          override def close(): Unit = closes.add(1)
        }
      }
    }
    val out = MultimodalOps.extractFeatures(media, new CountingDecoder).collect()
    val n = media.count()
    assert(out.length == n.toInt)
    assert(decodes.value == n, s"decode ran ${decodes.value} times for $n payloads")
    assert(opens.value == 4, s"open() should run once per partition, ran ${opens.value}")
    assert(closes.value == opens.value,
      s"close() (${closes.value}) must pair with open() (${opens.value})")
    // EARLY TERMINATION: limit() stops pulling before exhaustion, so the
    // iterator's own end-of-input close never fires — the task-completion
    // listener must close every opened session anyway (a real codec
    // context leaked per task accumulates in a long-lived executor)
    opens.reset(); closes.reset(); decodes.reset()
    val few = MultimodalOps.extractFeatures(media, new CountingDecoder).limit(2).collect()
    assert(few.length == 2)
    assert(opens.value >= 1, "limit(2) should still open at least one partition's session")
    assert(closes.value == opens.value,
      s"early-terminated consumer leaked sessions: ${opens.value} opened, ${closes.value} closed")
    // the custom decoder's output flowed through (not the stub's)
    val one = out.head
    assert(one.height == 1 && one.featNorm == one.width.toDouble)
    // and the stub default still matches its columnar twin (schema stable)
    assert(MultimodalOps.extractFeatures(media).schema ==
      MultimodalOps.extractFeaturesStub(media).schema)
  }
}
