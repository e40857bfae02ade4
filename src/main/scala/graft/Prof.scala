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
    } else if (name == "ccloop") {
      // constructs the CC label table (the loop RUNS during construction:
      // per-round localCheckpoint + fixpoint check) 5× with caches cold,
      // then times one warm noop — isolates the r18 job-fusion delta from
      // run-order/JIT noise that swamps the full-bench cold numbers.
      // Also counts scheduler JOBS during construction: wall time is
      // noise-bound at this scale, the job count is exact.
      val jobs = new java.util.concurrent.atomic.AtomicInteger()
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      })
      for (i <- 1 to 5) {
        ops.Caches.invalidate()
        val j0 = jobs.get()
        val t0 = System.nanoTime()
        val df = ops.DedupOps.dedupClusters(spark, sfDir, 0.8)
        val constructMs = (System.nanoTime() - t0) / 1000000L
        Thread.sleep(200) // bounded listener-bus drain
        val constructJobs = jobs.get() - j0
        val t1 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        println(s"[prof] ccloop run$i construct_ms=$constructMs construct_jobs=$constructJobs " +
          s"warm_ms=${(System.nanoTime() - t1) / 1000000L}")
      }
    } else if (name == "janino") {
      // VERDICT r17 #3 measurement: of the ~50 s/suite of residual
      // first-compile Janino CPU, how much is source that is (a) exactly
      // repeated within one suite run (cache misses — should be ~0 at the
      // 4000-entry cache) or (b) identical after stripping comments and
      // whitespace (the "differs only in attribute-id noise" ceiling a
      // plan-normalization pass could reclaim)? Captures every compiled
      // source via an in-process log4j2 appender on CodeGenerator's DEBUG
      // stream (doCompile logs the formatted source per actual
      // compilation), runs the fixed 12-query minisuite bench-style, and
      // reports the duplicate fractions. If the normalized-dup fraction
      // is under ~30%, fragment-level reuse is measured OUT (the residual
      // is genuinely distinct code) per the verdict's stop rule.
      import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
      import org.apache.logging.log4j.core.appender.AbstractAppender
      import org.apache.logging.log4j.core.config.AppenderRef
      import org.apache.logging.log4j.core.config.LoggerConfig
      import org.apache.logging.log4j.Level
      val sources = java.util.Collections.synchronizedList(
        new java.util.ArrayList[(String, String, Long)]())
      val appender = new AbstractAppender("graft-janino-capture", null, null, false, null) {
        override def append(e: LogEvent): Unit = {
          val m = e.getMessage.getFormattedMessage
          // doCompile's source dump is the only multi-line DEBUG message
          // starting with a newline + the /* 001 */ line-numbered format
          if (m.contains("/* 001 */")) {
            sources.add((m, e.getThreadName, e.getTimeMillis)); ()
          }
        }
      }
      appender.start()
      val ctx = LoggerContext.getContext(false)
      val cfg = ctx.getConfiguration
      val loggerName = "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator"
      val lc = new LoggerConfig(loggerName, Level.DEBUG, false)
      lc.addAppender(appender, Level.DEBUG, null)
      cfg.addLogger(loggerName, lc)
      ctx.updateLoggers()
      val qs = Seq(
        "q101_split_leakage", "q118_canonical_policy", "q136_bigram_likelihood",
        "q146_cluster_sizes", "q151_source_overlap", "q152_embedding_drift",
        "q153_dup_graph_triangles", "q34_dedup_kept", "q35_ngram_jaccard",
        "q42_embedding_neardup", "q69_dedup_clusters", "q236_encoding_planner")
      def compileNs(): Long =
        org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.compileTime
      // real-compilation counter (incremented in doCompile only — the
      // captured DEBUG stream may also carry pre-cache create()-time
      // dumps, i.e. cache HITS; the delta here disambiguates)
      def compileCount(): Long =
        org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME.getCount
      val cg0 = compileNs()
      val cc0 = compileCount()
      qs.foreach { q =>
        ops.Caches.invalidate()
        ops.QueryRegistry.byName(q).fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      }
      ops.Caches.invalidate()
      val janinoMs = (compileNs() - cg0) / 1000000L
      val realCompiles = compileCount() - cc0
      import scala.jdk.CollectionConverters._
      val captured = sources.asScala.toVector
      val srcs = captured.map(_._1)
      // duplicate-group metadata: are duplicate compiles concurrent (task
      // threads racing distinct cache keys for the same text) or
      // sequential cross-query repeats?
      captured.groupBy(_._1).toSeq.filter(_._2.size > 1).sortBy(-_._2.size).take(8)
        .foreach { case (src, grp) =>
          val head = src.linesIterator.find(_.contains("class")).getOrElse("").trim.take(80)
          val times = grp.map(_._3)
          println(s"[prof] dup x${grp.size} chars=${src.length} spreadMs=${times.max - times.min} " +
            s"threads=${grp.map(_._2).distinct.size} first='$head'")
        }
      def norm(s: String): String = s.linesIterator
        .map(_.replaceAll("^/\\* \\d+ \\*/", "")) // line-number gutter
        .map(_.replaceAll("/\\*.*?\\*/", "").trim) // inline comments
        .filter(l => l.nonEmpty && !l.startsWith("//"))
        .mkString("\n")
      // CodeFormatter truncates the DEBUG dump at codegen.logging.maxLines
      // (default 1000): two DIFFERENT long sources with an identical first
      // 1000 lines would fake a duplicate — count truncated dumps and
      // report dup stats over complete dumps separately
      val truncated = srcs.count(_.contains("[truncated"))
      val complete = srcs.filterNot(_.contains("[truncated"))
      val exact = srcs.groupBy(identity)
      val normed = srcs.groupBy(norm)
      val exactComplete = complete.groupBy(identity)
      def dupStats(g: Map[String, Vector[String]]): (Int, Long) = {
        val dups = g.valuesIterator.map(_.size - 1).sum
        val dupChars = g.collect { case (k, v) if v.size > 1 => k.length.toLong * (v.size - 1) }.sum
        (dups, dupChars)
      }
      val (exactDups, exactDupChars) = dupStats(exact.map { case (k, v) => k -> v })
      val (normDups, normDupChars) = dupStats(normed)
      val totalChars = srcs.map(_.length.toLong).sum
      println(s"[prof] janino logged_sources=${srcs.size} real_compiles=$realCompiles " +
        s"janino_ms=$janinoMs total_source_chars=$totalChars")
      println(s"[prof] exact duplicate compiles=$exactDups dup_chars=$exactDupChars " +
        f"(${if (totalChars == 0) 0.0 else exactDupChars * 100.0 / totalChars}%.1f%% of source volume)")
      println(s"[prof] normalized duplicate compiles=$normDups dup_chars=$normDupChars " +
        f"(${if (totalChars == 0) 0.0 else normDupChars * 100.0 / totalChars}%.1f%% of source volume)")
      val (cDups, cDupChars) = dupStats(exactComplete)
      val cChars = complete.map(_.length.toLong).sum
      println(s"[prof] truncated_dumps=$truncated; over COMPLETE dumps only: " +
        s"compiles=${complete.size} exact_dups=$cDups dup_chars=$cDupChars " +
        f"(${if (cChars == 0) 0.0 else cDupChars * 100.0 / cChars}%.1f%% of complete volume)")
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
