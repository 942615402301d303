package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for slow queries (builder tooling). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    import graft.extra.{Dedup, Text}
    import graft.model.Tables
    if (args.length > 1 && args(1) == "ngram") {
      val docs = Tables.load(spark, dir, "documents")
      docs.count() // warm IO
      (1 to 3).foreach { i =>
        time(s"ngram_jaccard #$i")(
          Dedup.ngramJaccard(docs, "doc_id", "text").count())
        time(s"neardup_minhash #$i")(
          Dedup.nearDupMinhash(docs, "doc_id", "text").count())
        spark.sharedState.cacheManager.clearCache()
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "bfs") {
      // stage-by-stage profile of the Scala-driven BFS loop
      val li = Tables.load(spark, dir, "lineitem")
      li.count() // warm IO
      (1 to 2).foreach { i =>
        val edges = li.select(explode(array(
            struct((col("l_suppkey") * 2).as("src"),
              (col("l_partkey") * 2 + 1).as("dst")),
            struct((col("l_partkey") * 2 + 1).as("src"),
              (col("l_suppkey") * 2).as("dst")))).as("e"))
          .select(col("e.src").as("src"), col("e.dst").as("dst"))
        time(s"#$i edges scan")(edges.count())
        var visited = Dedup.materialize(
          spark.range(1).select(lit(2L).as("id"),
            lit(0).cast("int").as("dist")))
        var frontier = visited.select("id")
        (1 to 3).foreach { lvl =>
          val t0 = System.nanoTime()
          val next = edges
            .join(frontier.withColumnRenamed("id", "src"), "src")
            .select(col("dst").as("id")).distinct()
            .join(visited.select("id"), Seq("id"), "left_anti")
            .select(col("id"), lit(lvl).cast("int").as("dist"))
          val mat = Dedup.materialize(next)
          println(f"[prof] #$i level $lvl%d materialize " +
            f"${(System.nanoTime() - t0) / 1e9}%8.2fs")
          time(s"#$i level $lvl isEmpty")(if (mat.isEmpty) 0L else 1L)
          visited = visited.unionAll(mat)
          frontier = mat.select("id")
        }
        time(s"#$i final agg")(visited.groupBy("dist").count().count())
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "classify") {
      // stage-by-stage cost of the streaming classifier chain, batch
      // form: 450k synthetic wire docs through parse → gates → typed
      // classify (the streaming block's per-batch work without the
      // harness)
      import org.apache.spark.sql.functions.{to_json, struct,
        unix_millis, current_timestamp}
      val n = 450000L
      val wire = Dedup.materialize(spark.range(n).select(to_json(struct(
        col("id").as("doc_id"),
        graft.gen.SyntheticDocs.plantedText(col("id")).as("text"),
        (col("id") * 7L + 1000000L).as("event_time_ms"))).as("value")))
      val model = graft.extra.Classifier.trainNaiveBayes(
        graft.gen.SyntheticDocs.labeledSeed(spark), "label", "text")
      import graft.streaming.CurationStream
      (1 to 3).foreach { i =>
        time(s"#$i parse+gates")(
          CurationStream.gatedOnly(wire).count())
        time(s"#$i +classifyTyped")(
          graft.extra.Classifier.classifyTyped(
            CurationStream.gatedOnly(wire), "text", model).count())
        time(s"#$i classifyTyped alone")(
          graft.extra.Classifier.classifyTyped(
            Dedup.materialize(CurationStream.gatedOnly(wire)),
            "text", model).count())
      }
      spark.stop(); return
    }
    if (args.length > 2 && args(1) == "query") {
      // generic one-query timing: Profile <sfDir> query <name> [reps]
      val name = args(2)
      val reps = args.lift(3).map(_.toInt).getOrElse(3)
      val q = SparkEntry.queries(name)
      (1 to reps).foreach { i =>
        time(s"#$i $name")(q(spark, dir).count())
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "kn") {
      // stage-by-stage cost of the streaming perplexity gate, batch
      // form: synthetic wire docs through parse → gates → frozen-KN
      // scoring joins (the PerplexityGate per-batch work without the
      // harness)
      import org.apache.spark.sql.functions.{to_json, struct}
      val n = 450000L
      val wire = Dedup.materialize(spark.range(n).select(to_json(struct(
        col("id").as("doc_id"),
        graft.gen.SyntheticDocs.plantedText(col("id")).as("text"),
        (col("id") * 7L + 1000000L).as("event_time_ms"))).as("value")))
      val model = graft.extra.KnLm.fit(
        graft.gen.SyntheticDocs.labeledSeed(spark), "text")
      import graft.streaming.CurationStream
      (1 to 3).foreach { i =>
        time(s"#$i parse+gates")(
          CurationStream.gatedOnly(wire).count())
        time(s"#$i +knScore")(
          graft.extra.KnLm.score(
            CurationStream.gatedOnly(wire).select("doc_id", "text"),
            "doc_id", "text", model).count())
        val batch = Dedup.materialize(CurationStream.gatedOnly(wire)
          .select("doc_id", "text"))
        time(s"#$i knScore alone")(
          graft.extra.KnLm.score(batch, "doc_id", "text", model)
            .count())
        time(s"#$i knScoreProbed alone")(
          graft.extra.KnLm.scoreProbed(batch, "doc_id", "text", model)
            .count())
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "cc") {
      // connected-components timing on the Q1-1995 graph
      val orders = Tables.load(spark, dir, "orders")
        .where(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
        .select(col("o_orderkey").as("ok"))
      val li = Tables.load(spark, dir, "lineitem")
      val op = li.join(broadcast(orders), li("l_orderkey") === orders("ok"))
        .select(col("l_orderkey").as("ok2"), col("l_partkey").as("p"))
        .distinct()
      val a = op.select(col("ok2"), col("p").as("pa"))
      val b = op.select(col("ok2"), col("p").as("pb"))
      val edges = a.join(b, Seq("ok2")).where(col("pa") < col("pb"))
        .select(col("pa").as("src"), col("pb").as("dst"))
      (1 to 3).foreach { pass =>
        time(s"#$pass edges (gen+dedup)")(edges.count())
        time(s"#$pass sym materialize") {
          val e0 = edges.select(col("src"), col("dst"))
          graft.extra.Dedup.materialize(
            e0.unionAll(e0.select(col("dst").as("src"),
              col("src").as("dst"))).distinct()).count()
        }
        time(s"#$pass connectedComponents")(
          graft.extra.Graph.connectedComponents(edges, "src", "dst")
            .count())
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "ann") {
      // stage-by-stage cost of the streaming ANN-ingest arm, batch-mode
      import graft.streaming.AnnIngest
      val n = args.lift(2).map(_.toLong).getOrElse(200000L)
      val docs = spark.range(n).select(col("id").as("doc_id"),
        graft.gen.SyntheticDocs.textFor(col("id")).as("text"))
        .transform(Dedup.materialize)
      val idxDir = java.nio.file.Files
        .createTempDirectory("prof_ann_idx").toString
      val seed = spark.range(20000).select(
        (col("id") + 1000000000L).as("doc_id"),
        AnnIngest.embedStub(
          graft.gen.SyntheticDocs.textFor(col("id") + 1000000000L), 64)
          .as("embedding"))
      graft.extra.AnnIndex.buildAndWriteIvfPq(seed, "doc_id", "embedding",
        idxDir, numCentroids = 32)
      val cb = graft.extra.AnnIndex.readCodebooks(spark, idxDir)
      (1 to 2).foreach { i =>
        time(s"#$i docs scan")(docs.count())
        val emb = docs.select(col("doc_id"),
          AnnIngest.embedStub(col("text"), 64).as("embedding"))
        time(s"#$i embed")(emb.count())
        val enc = graft.extra.Similarity.encodeIvfPq(emb, "doc_id",
          "embedding", cb.coarse, cb.pq, cb.m, cb.sub, cb.residual)
        time(s"#$i embed+encode")(enc.count())
        time(s"#$i append (write)")({
          graft.extra.AnnIndex.appendIvfPq(spark, idxDir, emb, "doc_id",
            "embedding", codebooks = Some(cb), singleFileBatch = true)
          0L
        })
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "bm25idx") {
      // stage-by-stage profile of the persisted-BM25 sparse arm against
      // the hybrid smoke's staged layout (run HybridSmoke first)
      val base = args.lift(2).getOrElse("/tmp/graft_hybrid_smoke_index")
      import spark.implicits._
      val docsS = spark.read.parquet(s"$base/stage/docs")
      val queries = docsS.filter(col("doc_id") < 8)
        .select(col("doc_id").as("query_id"), col("text").as("query_text"))
      val qterms = queries.select(col("query_id"),
        explode(Text.tokens(col("query_text"))).as("term")).distinct()
      val termSeq = qterms.select("term").distinct()
        .as[String].collect().toSeq
      println(s"[prof] query terms: ${termSeq.size}")
      val tf = spark.read.parquet(s"$base/bm25/tf/*")
      time("tf full scan")(tf.count())
      time("tf IN-filtered")(
        tf.filter(col("term").isin(termSeq: _*)).count())
      time("tf IN+join qterms")(
        tf.filter(col("term").isin(termSeq: _*))
          .join(broadcast(qterms), "term").count())
      time("dl scan")(spark.read.parquet(s"$base/bm25/dl").count())
      time("qterms alone")(qterms.count())
      (1 to 2).foreach { i =>
        time(s"searchAll #$i")(graft.extra.Bm25Index.searchAll(spark,
          s"$base/bm25", queries, "query_id", "query_text",
          idCol = "doc_id", topK = 20).count())
      }
      spark.stop(); return
    }
    val docs = Tables.load(spark, dir, "documents")
    time("docs scan")(docs.count())
    val toks = docs.select(col("doc_id"), Text.tokens(col("text")).as("t"))
    time("tokens")(toks.count())
    time("tokens.force")(toks.select(explode(col("t"))).count())
    val sets = docs.select(col("doc_id"), Text.shingles(col("text"), 3).as("shingles"))
    time("shingles.force")(sets.select(explode(col("shingles"))).count())
    val inv = sets.select(col("doc_id"), size(col("shingles")).as("n"),
      explode(col("shingles")).as("shingle"))
    time("inv+md5")(inv.select(md5(col("shingle"))).count())
    val docFreq = inv.groupBy("shingle").agg(count(lit(1)).as("df"))
    time("docFreq")(docFreq.count())
    val full = Dedup.ngramJaccard(docs, "doc_id", "text")
    time("ngram_jaccard full")(full.count())
    time("fingerprint")(Text.withFingerprint(docs, "text").count())
    val mh = Dedup.minhash(docs, "doc_id", "text", 16, 3)
    time("minhash wide")(mh.count())
    time("neardup_minhash full")(Dedup.nearDupMinhash(docs, "doc_id", "text").count())
    val ev = Tables.load(spark, dir, "events")
    time("events scan")(ev.count())
    val payload = graft.ops.TickParse.toJsonPayload(ev.select(
      col("event_type").as("symbol"), col("value").as("price"),
      unix_millis(col("ts")).as("event_time_ms")))
    time("to_json")(payload.count())
    time("to+from_json")(graft.ops.TickParse.parseRaw(payload).count())
    time("parse_ticks full")(
      graft.queries.CoreQueries.parseTicks(spark, dir).count())
    spark.stop()
  }
}
