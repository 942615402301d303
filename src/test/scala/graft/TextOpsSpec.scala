package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Hand-checked cases for the decontamination and repetition queries
  * (the oracle gate checks them at corpus scale; these pin the
  * semantics on inputs small enough to verify by eye).
  */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Write a tiny documents table and run a registered query over it. */
  private def runOn(docs: Seq[(Long, String)], query: String) = {
    val dir = Files.createTempDirectory("textops").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    graft.queries.Registry.byName(query).run(spark, dir)
  }

  test("decontaminate flags exactly the docs sharing a 5-gram with " +
      "the benchmark set") {
    val bench = "alpha beta gamma delta epsilon zeta" // doc 0: benchmark
    val out = runOn(Seq(
      0L -> bench,
      1L -> ("unrelated words here nothing shared at all " +
        "and still nothing shared"),
      2L -> ("prefix alpha beta gamma delta epsilon suffix"), // shares 5-gram
      3L -> "alpha beta gamma delta different tail"), // only 4-gram: clean
      "decontaminate")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == Map(0L -> true, 1L -> false, 2L -> true, 3L -> false))
  }

  test("Text.decontaminate accepts an arbitrary benchmark frame " +
      "(eval suite as its own table, different text column name)") {
    val corpus = Seq(
      10L -> "the quick brown fox jumps over the lazy dog",
      11L -> "completely different content with no overlap whatsoever here",
      12L -> "prefix quick brown fox jumps over suffix")
      .toDF("doc_id", "text")
    // planted contamination: the eval prompt embeds the 5-gram
    // "quick brown fox jumps over" that docs 10 and 12 share
    val benchmark = Seq("question quick brown fox jumps over what answer")
      .toDF("prompt")
    val out = graft.extra.Text.decontaminate(corpus, benchmark,
      "doc_id", "text", "prompt", n = 5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == Map(10L -> true, 11L -> false, 12L -> true))
  }

  test("decontaminateSpans cuts the benchmark-overlapping run and " +
      "keeps the rest of the doc; minSpanTokens spares short shared " +
      "phrases; clean docs untouched") {
    // the eval prompt embeds an 8-token run; doc 20 carries it
    // mid-document (only the run is cut), doc 21 shares just a
    // 5-token phrase (below the threshold — survives), doc 22 clean
    val corpus = Seq(
      20L -> ("intro words q1 w1 e1 r1 t1 y1 u1 i1 closing remarks " +
        "continue here"),
      21L -> "p1 p2 q1 w1 e1 r1 t1 tail words here now",
      22L -> "nothing shared with the benchmark at all in this one")
      .toDF("doc_id", "text")
    val benchmark = Seq(
      "prompt q1 w1 e1 r1 t1 y1 u1 i1 answer",
      "another eval question entirely").toDF("prompt")
    val out = graft.extra.Text.decontaminateSpans(corpus, benchmark,
        "doc_id", "text", "prompt", k = 5, minSpanTokens = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(out == Seq(
      (20L, "intro words closing remarks continue here", 1L, 8L),
      (21L, "p1 p2 q1 w1 e1 r1 t1 tail words here now", 0L, 0L),
      (22L, "nothing shared with the benchmark at all in this one",
        0L, 0L)))
    // threshold off: the short phrase is cut too
    val all = graft.extra.Text.decontaminateSpans(corpus, benchmark,
        "doc_id", "text", "prompt", k = 5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(all == Seq((20L, 8L), (21L, 5L), (22L, 0L)))
  }

  test("unigramScore: uniform corpus distribution gives every doc " +
      "cross-entropy ln(1/p) of its tokens' shared probability") {
    // corpus tokens: a,a,b,b → p(a)=p(b)=0.5 → every token surprisal
    // ln 2 ≈ 0.693147, so both docs score exactly 0.693147
    val df = Seq(1L -> "a a b", 2L -> "b").toDF("doc_id", "text")
    val out = graft.extra.Text.unigramScore(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("n_tokens")).toSeq == Seq(3L, 1L))
    assert(out.map(_.getAs[Double]("cross_entropy")).toSeq ==
      Seq(0.693147, 0.693147))
  }

  test("dsirWeights: hand-checked add-one-smoothed log importance ratio") {
    // target doc "x x", raw extra doc "y y": c_r(x)=c_r(y)=2, c_t(x)=2,
    // c_t(y)=0, n_r=4, n_t=2, V=2.
    //   delta_x = ln(3/4) - ln(3/6) = ln 1.5 → 0.405465 (6dp)
    //   delta_y = ln(1/4) - ln(3/6) = ln 0.5 → -0.693147
    // d1 = 2·0.405465 = 0.810930, d2 = 2·(-0.693147) = -1.386294
    val df = Seq((1L, "x x", true), (2L, "y y", false))
      .toDF("doc_id", "text", "tgt")
    val m = graft.extra.Text.dsirWeights(df, "doc_id", "text", col("tgt"))
      .collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_tokens"),
        r.getAs[Double]("log_weight"))).toMap
    assert(m(1L) == (2L, 0.81093))
    assert(m(2L) == (2L, -1.386294))
  }

  test("dsirWeights: target-like docs outrank target-unlike docs, and " +
      "the score is invariant to input partitioning") {
    val df = Seq(
      (1L, "spark shuffle join window agg", true),
      (2L, "spark shuffle join window scan", true),
      (3L, "spark shuffle agg window join", false), // target-like raw doc
      (4L, "llama curry paddle stone river", false))
      .toDF("doc_id", "text", "tgt")
    def weights(d: org.apache.spark.sql.DataFrame) =
      graft.extra.Text.dsirWeights(d, "doc_id", "text", col("tgt"))
        .collect().map(r => r.getLong(0) -> r.getAs[Double]("log_weight"))
        .toMap
    val m = weights(df)
    assert(m(3L) > m(4L)) // target-vocabulary doc scores higher
    assert(weights(df.repartition(7)) == m)
  }

  test("unigramScore: rare-token docs score higher than common-token docs") {
    val df = Seq(
      1L -> "common common common common common common common",
      2L -> "rare")
      .toDF("doc_id", "text")
    val m = graft.extra.Text.unigramScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("cross_entropy"))
      .toMap
    assert(m(2L) > m(1L))
  }

  test("bigramScore: hand-checked add-one smoothing; scrambled word " +
      "order scores worse than fluent order; <2-token docs drop") {
    // corpus tokens: a,b (x2), b,a, x -> vocab V=3 (the single-token
    // doc contributes no bigrams but DOES widen the vocabulary)
    // bigrams: "a b" c=2, "b a" c=1; ctx(a)=2, ctx(b)=1
    // surprisal("a b") = -ln((2+1)/(2+3)) = ln(5/3) ≈ 0.510826
    // surprisal("b a") = -ln((1+1)/(1+3)) = ln 2   ≈ 0.693147
    val df = Seq(1L -> "a b", 2L -> "a b", 3L -> "b a", 4L -> "x")
      .toDF("doc_id", "text")
    val out = graft.extra.Text.bigramScore(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 4 has one token -> no bigrams -> dropped
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(out.map(_.getAs[Long]("n_bigrams")).toSeq == Seq(1L, 1L, 1L))
    assert(out.map(_.getAs[Double]("cross_entropy")).toSeq ==
      Seq(0.510826, 0.510826, 0.693147))
    // the frequent transition scores better (lower cross-entropy)
    assert(out(0).getAs[Double]("cross_entropy") <
      out(2).getAs[Double]("cross_entropy"))
  }

  test("kneserNeyScore: hand-checked interpolated KN trigram math; " +
      "<3-token docs drop") {
    // corpus: doc1 "a b c", doc2 "a b c a b c", doc3 "x y" (drops)
    // trigrams: "a b c" c=3, "b c a" c=1, "c a b" c=1
    // ctx(a,b)=3 nf1=1; ctx(b,c)=1 nf1=1; ctx(c,a)=1 nf1=1
    // cont counts all 1 (each (w2,w3) has one distinct w1);
    // mid: every w2 has midtot=1, nf2=1; uni: every w3 pc=1; bt=3
    // P_uni = 1/3 everywhere; P_bi = (1-.75 + .75*1*(1/3))/1 = 0.5
    // P("a b c") = (3-.75 + .75*1*.5)/3 = 2.625/3 = 0.875
    //   → surprisal 0.133531
    // P("b c a") = P("c a b") = (1-.75 + .375)/1 = 0.625 → 0.470004
    // doc1: ce = 0.133531
    // doc2: (2*0.133531 + 2*0.470004)/4 = 1.20707/4 → 0.301768
    val df = Seq(1L -> "a b c", 2L -> "a b c a b c", 3L -> "x y")
      .toDF("doc_id", "text")
    val out = graft.extra.Text.kneserNeyScore(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out.map(_.getAs[Long]("n_trigrams")).toSeq == Seq(1L, 4L))
    assert(out.map(_.getAs[Double]("cross_entropy")).toSeq ==
      Seq(0.133531, 0.301768))
    // the thrice-seen trigram is less surprising than the once-seen
    assert(out(0).getAs[Double]("cross_entropy") <
      out(1).getAs[Double]("cross_entropy"))
    // discount bounds enforced
    intercept[IllegalArgumentException] {
      graft.extra.Text.kneserNeyScore(df, "doc_id", "text", discount = 1.0)
    }
  }

  test("kneserNeyScore is invariant to input partitioning and ranks " +
      "repetitive gibberish above fluent text") {
    val fluent = (1L to 20L).map(i =>
      i -> "the cat sat on the mat and the dog sat on the rug")
    val soup = Seq(100L -> "mat the on sat rug cat dog and the on the")
    val df = (fluent ++ soup).toDF("doc_id", "text")
    val a = graft.extra.Text.kneserNeyScore(df, "doc_id", "text")
      .collect().map(_.toString).sorted.toSeq
    val b = graft.extra.Text.kneserNeyScore(df.repartition(13),
      "doc_id", "text").collect().map(_.toString).sorted.toSeq
    assert(a == b)
    val m = graft.extra.Text.kneserNeyScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("cross_entropy"))
      .toMap
    assert(m(100L) > m(1L)) // scrambled order = higher cross-entropy
  }

  test("kneserNeyScore byCol: grouped output is BIT-identical to " +
      "running the plain form on each group alone (per-language LMs " +
      "in one pass; statistics never mix)") {
    val rnd = new scala.util.Random(59)
    val langs = Seq("en", "de", "zh")
    // shared surface vocabulary ACROSS languages — the adversarial
    // case: the same trigram string occurs in two languages and must
    // hit each language's own statistics
    val words = (0 until 12).map(i => s"w$i")
    val df = (1L to 120L).map { i =>
      val lang = langs(rnd.nextInt(3))
      val n = 1 + rnd.nextInt(10)
      (i, lang, (0 until n).map(_ => words(rnd.nextInt(12)))
        .mkString(" "))
    }.toDF("doc_id", "lang", "text").repartition(7)
    val grouped = graft.extra.Text
      .kneserNeyScore(df, "doc_id", "text", byCol = Some("lang"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet
    val perLang = langs.flatMap { l =>
      graft.extra.Text
        .kneserNeyScore(df.where(col("lang") === l), "doc_id", "text")
        .collect().map(r => (r.getLong(0), l, r.getLong(1),
          r.getDouble(2)))
    }.toSet
    assert(grouped == perLang)
  }

  test("perplexityBuckets: per-language ANSI terciles with head/tail " +
      "labels; deterministic tie order") {
    // 7 en docs with distinct cross-entropies -> ntile(3) = 3,2,2;
    // 2 de docs -> ANSI ntile(3) over 2 rows yields buckets 1 and 2
    // (head and middle — a language with fewer docs than nBuckets
    // NEVER emits 'tail'; the documented contract)
    val en = Seq(
      1L -> "a a a a a a", 2L -> "a a a a a b", 3L -> "a a a b a b",
      4L -> "a b b a b b", 5L -> "b b a a b a", 6L -> "a b a b a b",
      7L -> "b a b a b a").map { case (i, t) => (i, "en", t) }
    val de = Seq((10L, "de", "x y z x y z"), (11L, "de", "z y x z z z"))
    val out = graft.extra.Text.perplexityBuckets(
      (en ++ de).toDF("doc_id", "lang", "text"),
      "doc_id", "text", "lang")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(4), r.getString(5))).toMap
    val enB = out.filter(_._1 < 10L).values.map(_._1).toSeq.sorted
    assert(enB == Seq(1L, 1L, 1L, 2L, 2L, 3L, 3L)) // 3+2+2 ANSI split
    assert(out.filter(_._1 >= 10L).values.map(_._1).toSeq.sorted ==
      Seq(1L, 2L)) // ntile(3) over 2 rows -> buckets 1, 2
    // labels: bucket 1 = head, bucket 3 = tail, else middle
    out.values.foreach { case (b, l) =>
      assert(l == (if (b == 1) "head" else if (b == 3) "tail"
        else "middle"))
    }
    intercept[IllegalArgumentException] {
      graft.extra.Text.perplexityBuckets(
        en.toDF("doc_id", "lang", "text"), "doc_id", "text", "lang",
        nBuckets = 1)
    }
  }

  test("chunkBpeTokens: chunks measured in SUBWORDS, ragged tail, " +
      "token-free docs emit nothing, totals match bpeTokenCount") {
    val merges = Seq(("a", "b"))
    // "ab ab c" -> subwords [ab, ab, c]; chunkSize 2 -> [ab ab], [c]
    val df = Seq(1L -> "ab ab c", 2L -> "", 3L -> "a b")
      .toDF("doc_id", "text")
    val out = graft.extra.Text
      .chunkBpeTokens(df, "doc_id", "text", merges, chunkSize = 2)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // doc 3 "a b": separate WORDS a, b — no merge across the word
    // boundary -> subwords [a, b] -> one chunk "a b"
    assert(out.toSeq == Seq(
      (1L, 0L, "ab ab", 2L), (1L, 1L, "c", 1L), (3L, 0L, "a b", 2L)))
    // per-doc Σ chunk_n_tokens == the exact subword count
    val sums = out.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    val counts = df.select(col("doc_id"),
        graft.extra.Text.bpeTokenCount(col("text"), merges).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sums == counts.filter(_._2 > 0))
    intercept[IllegalArgumentException] {
      graft.extra.Text.chunkBpeTokens(df, "doc_id", "text", merges, 0)
    }
  }

  test("bigramScore is invariant to input partitioning") {
    val df = (1L to 40L)
      .map(i => i -> s"tok${i % 5} tok${(i + 1) % 5} tok${(i * 3) % 7}")
      .toDF("doc_id", "text")
    val a = graft.extra.Text.bigramScore(df, "doc_id", "text")
      .collect().map(_.toString).sorted.toSeq
    val b = graft.extra.Text.bigramScore(df.repartition(13), "doc_id",
      "text").collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("vocabCoverage: top-K ties break by token asc; misses count zero") {
    // counts: a=2, b=2, c=1 → top-1 is 'a' (tie with b, token asc)
    val df = Seq(1L -> "a a b", 2L -> "b c").toDF("doc_id", "text")
    val out = graft.extra.Text.vocabCoverage(df, "doc_id", "text", topK = 1)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("in_vocab")).toSeq == Seq(2L, 0L))
    assert(out.map(_.getAs[Double]("vocab_coverage")).toSeq ==
      Seq(0.666667, 0.0))
  }

  test("chunkTokens: 5 tokens at size 2 → chunks of 2,2,1 in order; " +
      "empty text emits no rows") {
    val df = Seq(1L -> "a b c d e", 2L -> " ").toDF("doc_id", "text")
    val out = graft.extra.Text.chunkTokens(df, "doc_id", "text", 2)
      .orderBy("doc_id", "chunk_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getString(2),
      r.getLong(3))).toSeq == Seq(
      (1L, 0L, "a b", 2L), (1L, 1L, "c d", 2L), (1L, 2L, "e", 1L)))
  }

  test("chunkTokens round-trips: concatenated chunks rebuild the " +
      "tokenized doc, and every chunk but the last is full") {
    val df = Seq(1L -> ("x " * 100).trim).toDF("doc_id", "text")
    val out = graft.extra.Text.chunkTokens(df, "doc_id", "text", 32)
      .orderBy("chunk_id").collect()
    assert(out.map(_.getLong(3)).toSeq == Seq(32L, 32L, 32L, 4L))
    assert(out.map(_.getString(2)).mkString(" ") == ("x " * 100).trim)
  }

  test("doc_repetition computes top-bigram and dup-token fractions") {
    val out = runOn(Seq(
      // bigrams: "a b","b a","a b","b c" -> top "a b" 2/4; tokens
      // 5 with 3 distinct -> dup 0.4
      1L -> "a b a b c"),
      "doc_repetition").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_bigrams") == 4)
    assert(r.getAs[Long]("top_bigram_n") == 2)
    assert(r.getAs[Double]("top_bigram_frac") == 0.5)
    assert(r.getAs[Double]("dup_token_frac") == 0.4)
  }

  test("redactPii masks email, IP, SSN and phone with the default " +
      "rules, in rule order") {
    val df = Seq(
      (1L, "contact jane.doe+x@corp.example.com or 192.168.0.1 now"),
      (2L, "ssn 123-45-6789 phone +1 (555) 123-4567 end"),
      (3L, "nothing sensitive here"))
      .toDF("doc_id", "text")
    val out = graft.extra.Text.withPiiRedaction(df, "text")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("redacted") ==
      "contact <EMAIL> or <IP> now")
    assert(out(1).getAs[String]("redacted") == "ssn <SSN> phone <PHONE> end")
    assert(out(2).getAs[String]("redacted") == "nothing sensitive here")
    assert(out.map(_.getAs[Long]("n_pii")).toSeq == Seq(2L, 2L, 0L))
  }

  test("redactPii applies email before digit rules so addresses are " +
      "consumed whole, and custom rules are honored") {
    val df = Seq((1L, "a1@b.co then 1234")).toDF("doc_id", "text")
    val custom = graft.extra.Text.DefaultPiiRules :+
      ("\\d{4,}", "<NUM>")
    val out = graft.extra.Text.withPiiRedaction(df, "text", custom)
      .collect().head
    assert(out.getAs[String]("redacted") == "<EMAIL> then <NUM>")
    assert(out.getAs[Long]("n_pii") == 2L)
  }

  test("trainBpe: hand-checked greedy merges — most frequent pair wins " +
      "each round (count desc, pair asc ties), applied with the same " +
      "single-pass replace the encoder uses") {
    import graft.extra.Text
    // corpus: "abab" ×3, "ab" ×2, "cd" ×1 → pair counts round 1:
    // (a,b)=6+2=8, (b,a)=3, (c,d)=1 → merge (a,b);
    // round 2: "abab"→" ab ab " gives (ab,ab)=3, (c,d)=1 → merge (ab,ab)
    val docs = Seq((0L, "abab abab abab ab ab cd")).toDF("doc_id", "text")
    val merges = Text.trainBpe(docs, "text", numMerges = 3)
    assert(merges == Seq(("a", "b"), ("ab", "ab"), ("c", "d")))
    // encoder agreement: the trained list segments exactly as training
    // left the dict — abab→[abab]=1 symbol, ab→[ab]=1, cd→[cd]=1
    val counted = Text.withBpeTokens(docs, "text", merges)
      .select("n_tokens", "n_bpe_tokens").head()
    assert(counted.getLong(0) == 6L && counted.getLong(1) == 6L)
    // determinism: retraining yields the identical list
    assert(Text.trainBpe(docs, "text", numMerges = 3) == merges)
  }

  test("bpeTokenCount: merges never cross word boundaries, untouched " +
      "words count one symbol per char, empty text counts zero") {
    import graft.extra.Text
    val merges = Seq(("a", "b"))
    val df = Seq(
      (0L, "ab"),        // merged: 1 symbol
      (1L, "a b"),       // two WORDS: the boundary blocks the merge -> 2
      (2L, "xyz"),       // untouched: 3 chars = 3 symbols
      (3L, "abab"),      // adjacent pairs: pass1 merges the first (the
                         // shared delimiter hides the second), the
                         // straggler re-scan folds it -> [ab, ab]
      (4L, ""))          // empty -> 0
      .toDF("doc_id", "text")
    val out = Text.withBpeTokens(df, "text", merges)
      .select("doc_id", "n_bpe_tokens").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 2L), (4L, 0L)))
  }

  test("typed-tier BPE (r15 verdict #2): bpeTokenCountsTyped is " +
      "bit-identical to the expression form on a seeded randomized " +
      "differential — adjacent repeats, stragglers, multi-char " +
      "merges, case folding, empties, null text") {
    import graft.extra.Text
    val rnd = new scala.util.Random(1616)
    val alpha = "abcd"
    def word() = (0 until 1 + rnd.nextInt(8))
      .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val docs = ((0 until 120).map { i =>
      (i.toLong, (0 until 1 + rnd.nextInt(12)).map(_ => word())
        .mkString(" "))
    } ++ Seq(
      (200L, "aaaaa ababab ABAB"), // self-overlap runs + case fold
      (201L, ""),                  // empty
      (202L, "   "),               // separators only
      (203L, null.asInstanceOf[String]))) // null text
      .toDF("doc_id", "text")
    // a trained list over the same distribution: multi-char merges,
    // chained rules, rules that never apply
    val merges = Text.trainBpe(docs, "text", numMerges = 40) ++
      Seq(("zz", "qq")) // never matches
    val expr = docs.withColumn("n",
        Text.bpeTokenCount(col("text"), merges))
      .select("doc_id", "n").orderBy("doc_id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    val typed = Text.bpeTokenCountsTyped(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    assert(typed == expr)
    // null text → null count in both forms
    assert(typed.find(_._1 == 203L).get._2 == -1L)
    // the auto selector: above the expression ceiling it computes the
    // typed counts in the same row (one pass, no id contract)
    val auto = Text.withBpeTokensAuto(docs, "text",
        merges ++ (0 until Text.BpeExprMaxMerges)
          .map(i => (s"__x$i", s"__y$i")))
      .select("doc_id", "n_bpe_tokens").orderBy("doc_id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    assert(auto == expr)
    // row-preserving typed tier under DUPLICATE ids (review r16: the
    // old keyed join-back fanned rows out): cardinality 1:1, every
    // row carries ITS OWN text's counts, n_tokens matches tokens()
    val dups = Seq((5L, "aa bb"), (5L, "cc"), (6L, null))
      .toDF("doc_id", "text")
    val tw = Text.withBpeTokensTyped(dups, "text", merges)
      .select("doc_id", "text", "n_tokens", "n_bpe_tokens")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse(""),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq.sorted
    assert(tw.size == 3)
    val exprDup = dups
      .transform(d => Text.withBpeTokens(d, "text", merges))
      .select("doc_id", "text", "n_tokens", "n_bpe_tokens")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse(""),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq.sorted
    assert(tw == exprDup)
  }

  test("typed-tier BPE symbols (r16): withBpeSymbolsTyped emits the " +
      "EXACT symbol sequence of bpeSymbols on a seeded randomized " +
      "differential — order, stragglers, case folding, empty, " +
      "whitespace-only, null text") {
    import graft.extra.Text
    val rnd = new scala.util.Random(1717)
    val alpha = "abcd"
    def word() = (0 until 1 + rnd.nextInt(8))
      .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val docs = ((0 until 100).map { i =>
      (i.toLong, (0 until 1 + rnd.nextInt(12)).map(_ => word())
        .mkString(" "))
    } ++ Seq(
      (200L, "aaaaa ababab ABAB"),
      (201L, ""),
      (202L, "   "),
      (203L, null.asInstanceOf[String])))
      .toDF("doc_id", "text")
    val merges = Text.trainBpe(docs, "text", numMerges = 40) ++
      Seq(("zz", "qq"))
    def arr(r: org.apache.spark.sql.Row): Seq[String] =
      if (r.isNullAt(1)) null else r.getSeq[String](1)
    val expr = docs.select(col("doc_id"),
        Text.bpeSymbols(col("text"), merges).as("syms"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), arr(r))).toSeq
    val typed = Text.withBpeSymbolsTyped(docs, "text", merges)
      .select("doc_id", "syms")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), arr(r))).toSeq
    assert(typed == expr)
    // the edges explicitly: empty + whitespace-only -> empty array,
    // null -> null, in BOTH forms
    assert(typed.find(_._1 == 201L).get._2 == Seq.empty)
    assert(typed.find(_._1 == 202L).get._2 == Seq.empty)
    assert(typed.find(_._1 == 203L).get._2 == null)
  }

  test("packGreedy budgets by EXACT subword counts: a BPE count column " +
      "drives packing directly (r14 verdict #4 integration)") {
    import graft.extra.{Packing, Text}
    val merges = Seq(("a", "b"), ("ab", "c"))
    // abc=1 subword, ab=1, xy=2, q=1
    val docs = Seq((0L, "abc abc abc"), (1L, "xy q"), (2L, "ab"))
      .toDF("doc_id", "text")
    val withCounts = docs.withColumn("n_bpe",
      Text.bpeTokenCount(col("text"), merges))
    val bpeCounts = withCounts.select("doc_id", "n_bpe").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(bpeCounts == Seq((0L, 3L), (1L, 3L), (2L, 1L)))
    val packed = Packing.packGreedy(withCounts, "doc_id",
      col("n_bpe"), budget = 4L, shards = 1)
    // greedy by id within the shard: doc0 (3) + doc1 (3) overflows 4,
    // so doc1 starts seq 1; doc2 (1) fits with doc1 (3+1=4)
    val seqs = packed.select("doc_id", "seq_id").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(seqs.map(_._1) == Seq(0L, 1L, 2L))
    assert(seqs(0)._2 != seqs(1)._2, "doc1 must overflow into a new seq")
    assert(seqs(1)._2 == seqs(2)._2, "doc2 fits doc1's remaining budget")
  }

  test("dupNgramCoverage counts shingles shared across docs, not " +
      "within one doc, and keeps shingle-less docs") {
    val out = graft.extra.Text.dupNgramCoverage(Seq(
      // docs 1 and 2 share the 3-gram "x y z"; doc 1 has 3 shingles
      1L -> "a b x y z",      // shingles: "a b x","b x y","x y z"
      2L -> "x y z q",        // shingles: "x y z","y z q"
      // doc 3 repeats ITS OWN shingle only -> distinct per doc, no dup
      3L -> "m n o m n o",
      4L -> "a b")            // < 3 tokens: no shingles
      .toDF("doc_id", "text"), "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
    def row(i: Int) = (out(i).getLong(1), out(i).getLong(2))
    assert(row(0) == (3L, 1L))
    assert(out(0).getAs[Double]("dup_fraction") ==
      math.rint(1.0 / 3.0 * 1e6) / 1e6)
    assert(row(1) == (2L, 1L))
    // doc 3: shingles "m n o","n o m","o m n","m n o" -> distinct 3, dup 0
    assert(row(2) == (3L, 0L))
    assert(row(3) == (0L, 0L))
    assert(out(3).isNullAt(3))
  }
}
