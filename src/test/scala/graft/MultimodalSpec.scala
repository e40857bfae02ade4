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
}
