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
      .config("spark.sql.session.timeZone", "UTC")
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
    } else if (name == "q42fused") {
      import ops.SimilarityOps._
      val e = ops.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("nv", sqrt(graft.functions.VectorFunctions.dot(col("v"), col("v"))))
        .persist()
      e.count()
      // current shape: candidates then two join-backs to fetch vectors
      val sigsSlim = e.select(col("vec_id"), packedSig(col("v")).as("sig"))
        .select(col("vec_id"), col("sig"),
          posexplode(graft.functions.VectorFunctions.bandKeys(col("sig"), BandBits)).as(Seq("band", "bk")))
      val cand = sigsSlim.as("a").join(sigsSlim.as("b"),
        col("a.bk") === col("b.bk") && col("a.vec_id") < col("b.vec_id") &&
          graft.functions.VectorFunctions.firstEqualBand(col("a.sig"), col("b.sig"), BandBits) === col("a.band"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      val joined = cand
        .join(e.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nv").as("na")), "vec_a")
        .join(e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nv").as("nb")), "vec_b")
        .select(col("vec_a"), col("vec_b"),
          round(graft.functions.VectorFunctions.dot(col("va"), col("vb")) / (col("na") * col("nb")), 6).as("cosine"))
        .filter(col("cosine") >= 0.45)
      time("joinback verify cold") { joined.count() }
      time("joinback verify warm") { joined.count() }
      // fused shape: postings carry (v, nv); verify inside the candidate join
      val sigsWide = e.select(col("vec_id"), col("v"), col("nv"), packedSig(col("v")).as("sig"))
        .select(col("vec_id"), col("v"), col("nv"), col("sig"),
          posexplode(graft.functions.VectorFunctions.bandKeys(col("sig"), BandBits)).as(Seq("band", "bk")))
      val fused = sigsWide.as("a").join(sigsWide.as("b"),
        col("a.bk") === col("b.bk") && col("a.vec_id") < col("b.vec_id") &&
          graft.functions.VectorFunctions.firstEqualBand(col("a.sig"), col("b.sig"), BandBits) === col("a.band"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          round(graft.functions.VectorFunctions.dot(col("a.v"), col("b.v")) / (col("a.nv") * col("b.nv")), 6).as("cosine"))
        .filter(col("cosine") >= 0.45)
      time("fused verify cold") { fused.count() }
      time("fused verify warm") { fused.count() }
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      println("[prof] joinback plan joins: " + "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)".r.findAllIn(plan).toList.mkString(","))
      // dot-only: how much of verify is the arithmetic itself?
      val dotsOnly = cand
        .join(e.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nv").as("na")), "vec_a")
        .join(e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nv").as("nb")), "vec_b")
        .select((graft.functions.VectorFunctions.dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("c"))
        .agg(sum(col("c")))
      time("joins+dot only (no round/filter)") { dotsOnly.count() }
      val joinsOnly = cand
        .join(e.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nv").as("na")), "vec_a")
        .join(e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nv").as("nb")), "vec_b")
        .agg(sum(col("na") * col("nb")))
      time("joins only (no dot)") { joinsOnly.count() }
      val candOnly = cand.agg(count(lit(1)))
      time("cand only") { candOnly.count() }
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
