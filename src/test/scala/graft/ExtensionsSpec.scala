package graft

/** SQL users get the native functions: graft_dot registered via
  * GraftExtensions (config path or imperative).
  */
class ExtensionsSpec extends SparkSpec {

  test("graft_dot is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark
      .sql("SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .first()
      .getDouble(0)
    assert(r == 32.0)
  }

  test("graft_cosine is callable from SQL and bounded") {
    GraftExtensions.register(spark)
    val r = spark
      .sql("SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c, " +
        "graft_cosine(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS o")
      .first()
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0)
  }

  test("wrong arity is rejected with a named error, not an index crash") {
    GraftExtensions.register(spark)
    val ex = intercept[Exception] {
      spark.sql("SELECT graft_cosine(array(1.0d))").collect()
    }
    assert(ex.getMessage.contains("graft_cosine"), s"unhelpful error: ${ex.getMessage}")
  }

  test("every SQL-registered text function matches its Column-API twin on real docs") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions
    val docs = graft.ops.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"), graft.ops.TextOps.tokens(col("text")).as("toks"))
      .limit(100)
    val cmp = docs.select(
      (expr("graft_top_ngram(text, 3)") === TextFunctions.topNGram(col("text"), 3)).as("a"),
      (expr("graft_ngrams(toks, 5)") === TextFunctions.nGrams(col("toks"), 5)).as("b"),
      (expr("graft_rolling_fingerprint(toks)") === TextFunctions.rollingFingerprint(col("toks"))).as("c"),
      (expr("graft_top_token_ngram(toks, 2)") === TextFunctions.topTokenNGram(col("toks"), 2)).as("d"),
      (expr("graft_simhash(toks, 16, 1)") === TextFunctions.simHashBits(col("toks"), 16, 1)).as("e"),
      (expr("graft_minhash_sig(graft_ngrams(toks, 5), 16)")
        === TextFunctions.minHashSig(TextFunctions.nGrams(col("toks"), 5), 16)).as("f"),
      (expr("graft_winnow(toks, 4, 5)") === TextFunctions.winnowKeys(col("toks"), 4, 5)).as("g"),
      (expr("graft_bpe_segment(text)") === graft.ops.TextOps.bpeSegment(col("text"))).as("h"),
      (expr("graft_cdc_cuts(text)") === TextFunctions.cdcCuts(col("text"))).as("i")
    )
    assert(
      cmp
        .filter(
          not(
            col("a") && col("b") && col("c") && col("d") && col("e") && col("f") && col("g") &&
              col("h") && col("i")
          )
        )
        .count() == 0
    )
  }

  test("every SQL-registered vector function matches its Column-API twin") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions
    val e = graft.ops.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .limit(50)
      .withColumn("sig", graft.ops.SimilarityOps.packedSig(col("v")))
      .withColumn("qv", expr("transform(v, x -> cast(floor(x * 1000d) as bigint))"))
    val bb = graft.ops.SimilarityOps.BandBits
    val cmp = e.select(
      (expr(s"graft_band_keys(sig, $bb)") === VectorFunctions.bandKeys(col("sig"), bb)).as("a"),
      (expr(s"graft_first_equal_band(sig, sig, $bb)")
        === VectorFunctions.firstEqualBand(col("sig"), col("sig"), bb)).as("b"),
      (expr("graft_scaled_sq_dist(qv, qv, 1L)")
        === VectorFunctions.scaledSqDist(col("qv"), col("qv"), lit(1L))).as("c"),
      (expr("graft_quantized_dot(v, v, 64)")
        === VectorFunctions.quantizedDot(col("v"), col("v"), 64)).as("d")
    )
    assert(cmp.filter(not(col("a") && col("b") && col("c") && col("d"))).count() == 0)
  }

  test("graft_redact_pii in SQL equals the Column-API scrub") {
    GraftExtensions.register(spark)
    val r = spark
      .sql("SELECT graft_redact_pii('mail bob@x.io from 10.0.0.1') AS s")
      .head()
      .getString(0)
    assert(r == "mail <EMAIL> from <IP>", s"got $r")
    import org.apache.spark.sql.functions._
    val both = spark
      .sql("SELECT text FROM parquet.`/root/testdata/sf0.001/documents.parquet`")
      .select(
        (expr("graft_redact_pii(text)") === graft.ops.TextOps.redactPii(col("text"))).as("eq")
      )
    assert(both.filter(not(col("eq"))).count() == 0)
  }

  test("graft_top_k aggregate in SQL equals the Column-API twin and the rank window") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    val ev = graft.ops.Tables
      .events(spark, "/root/testdata/sf0.001")
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
    ev.createOrReplaceTempView("per_user")
    // canonical form: (−score, id) sorted ascending == (score DESC, id ASC);
    // topK's emitted order must equal its own canonical sort (order pin)
    def canon(top: org.apache.spark.sql.Column) =
      to_json(sort_array(transform(top, x =>
        struct((-x.getField("score")).as("ns"), x.getField("id").as("id")))))
    val viaSql = spark
      .sql("SELECT event_type, graft_top_k(cnt, user_id, 3) AS top FROM per_user GROUP BY event_type")
      .select(col("event_type"), to_json(col("top")).as("raw"), canon(col("top")).as("c"))
      .collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2)))
      .toMap
    val viaCol = ev
      .groupBy(col("event_type"))
      .agg(graft.functions.AggFunctions.topK(col("cnt"), col("user_id"), 3).as("top"))
      .select(col("event_type"), to_json(col("top")).as("raw"), canon(col("top")).as("c"))
      .collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2)))
      .toMap
    assert(viaSql == viaCol)
    // and both equal the definitional rank window (canonical form)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("cnt").desc, col("user_id"))
    val viaWindow = ev
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct((-col("cnt")).as("ns"), col("user_id").as("id")))).as("c"))
      .select(col("event_type"), to_json(col("c")).as("c"))
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
      .toMap
    assert(viaCol.view.mapValues(_._2).toMap == viaWindow)
    // the aggregate's emitted order is itself (score DESC, id ASC): the raw
    // json must list scores non-increasing
    viaCol.foreach { case (_, (raw, _)) =>
      val scores = """"score":(-?\d+)""".r.findAllMatchIn(raw).map(_.group(1).toLong).toSeq
      assert(scores == scores.sorted.reverse, s"unsorted topK output: $raw")
    }
  }

  test("graft_top_k as a WINDOW aggregate: eval is non-destructive across frames") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // a running-frame window evaluates the SAME live buffer after every
    // row — a destructive eval (draining the heap) would return the full
    // array for the first frame and empty/truncated arrays afterwards
    Seq((1L, 10L), (2L, 30L), (3L, 20L), (4L, 40L)).toDF("id", "s")
      .createOrReplaceTempView("wtopk")
    val rows = spark
      .sql(
        """SELECT id, graft_top_k(s, id, 2) OVER
          |  (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS top
          |FROM wtopk ORDER BY id""".stripMargin
      )
      .select(col("id"), to_json(col("top")).as("top"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    assert(rows(1L) == """[{"score":10,"id":1}]""")
    assert(rows(2L) == """[{"score":30,"id":2},{"score":10,"id":1}]""")
    assert(rows(3L) == """[{"score":30,"id":2},{"score":20,"id":3}]""")
    assert(rows(4L) == """[{"score":40,"id":4},{"score":30,"id":2}]""")
  }

  test("non-literal int parameter is rejected with a clear message") {
    GraftExtensions.register(spark)
    val ex = intercept[Exception] {
      spark.sql("SELECT graft_ngrams(array('a','b'), cast(rand() * 3 as int))").collect()
    }
    assert(ex.getMessage.contains("literal integer"), s"unhelpful error: ${ex.getMessage}")
  }

  test("KernelFusion rewrites the self-dot HOF idiom to the native kernel — and only when sound") {
    GraftExtensions.register(spark)
    // array() of non-nullable double children → array<double> with
    // containsNull = false, the schema shape the soundness guard
    // requires; built over range() so ConvertToLocalRelation can't fold
    // the whole projection into a LocalRelation before the plan check
    val ds = spark
      .range(3)
      .selectExpr(
        "id",
        "array(cast(id as double), cast(id + 1 as double), 2.0d) AS v",
        "array(1.0d, 2.0d) AS w"
      )
    val fused = ds.selectExpr(
      "id",
      "aggregate(zip_with(v, v, (x, y) -> x * y), 0D, (acc, e) -> acc + e) AS nrm"
    )
    assert(
      fused.queryExecution.optimizedPlan.toString.contains("graft_dot"),
      s"self-dot not fused:\n${fused.queryExecution.optimizedPlan}"
    )
    val got = fused.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert((0L to 2L).forall(i => got(i) == i * i + (i + 1) * (i + 1) + 4.0))
    // two DIFFERENT arrays: zip_with null-pads on ragged inputs, so the
    // rewrite would be unsound — the rule must NOT fire
    val unfused = ds.selectExpr(
      "aggregate(zip_with(v, w, (x, y) -> x * y), 0D, (acc, e) -> acc + e) AS d"
    )
    assert(
      !unfused.queryExecution.optimizedPlan.toString.contains("graft_dot"),
      "cross-dot was fused despite the ragged-length hazard"
    )
    // a fold that is NOT a plain product (x * y + 1) must not fuse either
    val notDot = ds.selectExpr(
      "aggregate(zip_with(v, v, (x, y) -> x * y + 1.0d), 0D, (acc, e) -> acc + e) AS d"
    )
    assert(!notDot.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    // parquet-sourced arrays carry containsNull = true — a null element
    // makes the HOF fold NULL where the dense kernel would read garbage,
    // so the guard must keep the rule OFF for that schema shape
    val emb = graft.ops.Tables
      .embeddings(spark, "/root/testdata/sf0.001")
      .selectExpr("cast(embedding as array<double>) AS e")
    assume(emb.schema("e").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].containsNull)
    val nullableSelf = emb.selectExpr(
      "aggregate(zip_with(e, e, (x, y) -> x * y), 0D, (acc, v2) -> acc + v2) AS nrm"
    )
    assert(
      !nullableSelf.queryExecution.optimizedPlan.toString.contains("graft_dot"),
      "self-dot fused on a containsNull=true array schema"
    )
  }

  test("graft_dot agrees with the HOF formulation on real embeddings") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    val e = graft.ops.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("embedding").cast("array<double>").as("v"))
      .limit(50)
    val both = e.select(
      expr("graft_dot(v, v)").as("native"),
      aggregate(zip_with(col("v"), col("v"), (x, y) => x * y), lit(0.0), (a, x) => a + x).as("hof")
    )
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }
}
