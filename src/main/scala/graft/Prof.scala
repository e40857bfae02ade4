package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc cold/warm profiler for a single registry query (dev tool). */
object Prof {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.maxFields", "256")
    // ad-hoc session confs for A/B runs, e.g.
    // SPARK_GRAFT_PROF_CONF=spark.sql.codegen.cache.maxEntries=2000
    sys.env.get("SPARK_GRAFT_PROF_CONF").foreach {
      _.split(",").filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      }
    }
    val spark = builder.getOrCreate()
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
    } else if (name == "q136parts") {
      // persist-vs-recompute + join-restructure measurement for the q136
      // collapsed (doc, source, gram, c_doc) frame (VERDICT r16 item 1b)
      import org.apache.spark.sql.DataFrame
      val docs = ops.Tables.documents(spark, sfDir)
      def perDocF(): DataFrame = docs
        .select(col("doc_id"), col("source"), ops.TextOps.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(
          col("doc_id"), col("source"),
          explode(expr(
            "transform(sequence(0, size(toks)-2), i -> concat(toks[i], ' ', toks[i+1]))")).as("gram"))
        .groupBy(col("doc_id"), col("source"), col("gram"))
        .agg(count(lit(1)).as("c_doc"))
      def rollup(scored: DataFrame): DataFrame = scored
        .groupBy(col("doc_id"), col("source"))
        .agg(expr("sum(c_doc * like_pm) div sum(c_doc)").as("score_pm"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("docs"),
          expr("sum(score_pm) div count(*)").as("avg_like_pm"),
          min(col("score_pm")).as("min_like_pm"),
          max(col("score_pm")).as("max_like_pm"))
        .orderBy(col("source"))
      // current shape: two corpus-side joins (gram then pfx)
      def current(perDoc: DataFrame): DataFrame = {
        val cAb = perDoc.groupBy(col("gram")).agg(sum(col("c_doc")).as("c_ab"))
        val cA = cAb.withColumn("pfx", split(col("gram"), " ").getItem(0))
          .groupBy(col("pfx")).agg(sum(col("c_ab")).as("c_a"))
        rollup(perDoc.join(cAb, Seq("gram"))
          .withColumn("pfx", split(col("gram"), " ").getItem(0))
          .join(cA, Seq("pfx"))
          .withColumn("like_pm", expr("(c_ab * 1000) div c_a")))
      }
      // restructured: like_pm computed per distinct gram (vocab-scale),
      // ONE corpus-side join
      def restructured(perDoc: DataFrame): DataFrame = {
        val cAb = perDoc.groupBy(col("gram")).agg(sum(col("c_doc")).as("c_ab"))
        val withPfx = cAb.withColumn("pfx", split(col("gram"), " ").getItem(0))
        val cA = withPfx.groupBy(col("pfx")).agg(sum(col("c_ab")).as("c_a"))
        val gramScore = withPfx.join(cA, Seq("pfx"))
          .select(col("gram"), expr("(c_ab * 1000) div c_a").as("like_pm"))
        rollup(perDoc.join(gramScore, Seq("gram")))
      }
      def noop(df: DataFrame): Long = {
        df.write.mode("overwrite").format("noop").save(); 0L
      }
      def variant(tag: String, persist: Boolean, shape: DataFrame => DataFrame): Unit = {
        for (i <- 1 to 3) {
          ops.Caches.invalidate()
          spark.sharedState.cacheManager.clearCache()
          val pd = if (persist) ops.Caches.persisted(perDocF()) else perDocF()
          time(s"$tag run$i")(noop(shape(pd)))
        }
      }
      variant("current/recompute", persist = false, current)
      variant("current/persist", persist = true, current)
      variant("restruct/recompute", persist = false, restructured)
      variant("restruct/persist", persist = true, restructured)
    } else if (name == "minisuite") {
      // fixed 12-query mini-suite run bench-style (Caches.invalidate
      // between queries) — the attribution harness for JVM-wide knobs like
      // spark.sql.codegen.cache.maxEntries (pass it via SPARK_GRAFT_PROF_CONF)
      val qs = Seq(
        "q101_split_leakage", "q118_canonical_policy", "q136_bigram_likelihood",
        "q146_cluster_sizes", "q151_source_overlap", "q152_embedding_drift",
        "q153_dup_graph_triangles", "q34_dedup_kept", "q35_ngram_jaccard",
        "q42_embedding_neardup", "q69_dedup_clusters", "q236_encoding_planner")
      def compileNs(): Long =
        org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.compileTime
      (1 to 2).foreach { pass =>
        val cg0 = compileNs()
        val t0 = System.nanoTime()
        qs.foreach { q =>
          ops.Caches.invalidate()
          val fn = ops.QueryRegistry.byName(q).fn
          val tq = System.nanoTime()
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          println(f"[prof] pass$pass $q: ${(System.nanoTime() - tq) / 1e9}%.2f s")
        }
        ops.Caches.invalidate()
        println(f"[prof] pass$pass TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
          s"janino ${(compileNs() - cg0) / 1000000L} ms")
      }
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
