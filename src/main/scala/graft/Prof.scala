package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc cold/warm profiler for a single registry query (dev tool). */
object Prof {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.maxFields", "256")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    if (name == "q27parts") {
      val docs = ops.Tables.documents(spark, sfDir)
      time("scan only") { docs.select(col("doc_id")).count() }
      time("scan text") { docs.select(length(col("text")).as("len")).selectExpr("sum(len)").count() }
      val top = docs.select(col("doc_id"), graft.functions.TextFunctions.topNGram(col("text"), 3).as("top"))
      time("topNGram") { top.count() }
      time("topNGram again") { top.count() }
      val filt = top.filter(col("top").isNotNull)
      time("top+filter") { filt.count() }
      val proj = filt.select(col("doc_id"), col("top.gram").as("gram"), col("top.cnt").as("cnt"))
      time("top+filter+proj") { proj.count() }
      time("top+filter+proj+sort") { proj.orderBy(col("doc_id")).count() }
      val full = ops.QueryRegistry.byName("q27_top_trigram").fn(spark, sfDir)
      time("full q27") { full.count() }
      time("full q27 again") { full.count() }
      full.collect()
      println(full.queryExecution.executedPlan.toString.take(1500))
    } else if (name == "q42parts") {
      import ops.SimilarityOps._
      val e = ops.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      time("packedSig only") {
        e.select(packedSig(col("v")).as("sig")).selectExpr("sum(sig[0])").count()
      }
      val sigs = e.select(col("vec_id"), packedSig(col("v")).as("sig"))
        .select(col("vec_id"), col("sig"),
          posexplode(graft.functions.VectorFunctions.bandKeys(col("sig"), BandBits)).as(Seq("band", "bk")))
        .persist()
      time("postings materialize") { sigs.count() }
      val candNoFirst = sigs.as("a").join(sigs.as("b"),
        col("a.bk") === col("b.bk") && col("a.vec_id") < col("b.vec_id"))
      time("cand join (no firstband filter)") { candNoFirst.count() }
      val cand = sigs.as("a").join(sigs.as("b"),
        col("a.bk") === col("b.bk") && col("a.vec_id") < col("b.vec_id") &&
          graft.functions.VectorFunctions.firstEqualBand(col("a.sig"), col("b.sig"), BandBits) === col("a.band"))
      time("cand join (with firstband)") { cand.count() }
      time("cand join again (warm)") { cand.count() }
    } else {
      val fn = ops.QueryRegistry.byName(name).fn
      for (i <- 1 to 3) {
        ops.Caches.invalidate()
        spark.sharedState.cacheManager.clearCache()
        time(s"run$i") { fn(spark, sfDir).count() }
      }
    }
    spark.stop()
  }
}
