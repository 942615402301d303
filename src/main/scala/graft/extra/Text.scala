package graft.extra

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization, quality scoring, language ID, token counting, document
  * fingerprinting. All expression-native (whole-stage codegen) — no UDFs,
  * no driver-side loops; every operator is a per-row projection or a
  * single aggregation, so it scales linearly and partitions freely.
  */
object Text {

  /** Whitespace tokenizer with empty-token filtering (robust to repeated
    * separators). Lowercasing keeps downstream hashes case-insensitive.
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), " "), t => t =!= "")

  /** Distinct word n-gram shingles via zip_with over shifted slices.
    *
    * PERFORMANCE NOTE (the O(tokens²) trap): Catalyst does not eliminate
    * common subexpressions referenced from inside higher-order-function
    * lambda bodies — `transform(seq, i => ...slice(t, i, n)...)` with an
    * outer expression `t` re-evaluates the whole tokenizer once per
    * element (and CollapseProject will happily inline a materialized
    * token column right back into the lambda). The zip_with formulation
    * sidesteps this: COLLECTION arguments are evaluated once per row,
    * and the lambdas below only touch their own lambda variables.
    * zip_with pads the shorter (shifted) side with null, and concat
    * propagates null — so the < n-token tail (and the whole row when the
    * text has fewer than n tokens) drops out in the final filter.
    */
  def shinglesFromTokens(t: Column, n: Int): Column = {
    val joined = (2 to n).foldLeft(t)((cur, j) =>
      zip_with(cur, slice(t, lit(j), size(t)), (p, c) => concat(p, lit(" "), c)))
    array_distinct(filter(joined, x => x.isNotNull))
  }

  /** Adds a shingle-array column. */
  def withShingles(df: DataFrame, textCol: String, n: Int,
      out: String = "shingles"): DataFrame =
    df.withColumn(out, shingles(col(textCol), n))

  /** Shingles straight from a text column (safe inline: per-row cost is
    * ~2n tokenizer evaluations, never per-element — see
    * [[shinglesFromTokens]]).
    */
  def shingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(text), n)

  /** Per-language stopword seed lists for the n-gram/stopword language
    * heuristic. Tiny on purpose: broadcast as literals into codegen.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "on"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los"),
    "de" -> Seq("der", "die", "und", "den", "von", "zu", "das", "mit"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "une", "est"))

  /** Language order for deterministic argmax tie-breaking. */
  val langOrder: Seq[String] = Seq("en", "es", "de", "fr")

  /** Tokens-in-list count (with multiplicity) — the per-language score. */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  /** Language-ID heuristic: score = stopword hits per language, predict
    * the argmax (ties resolve in [[langOrder]] order). Adds columns
    * score_<lang>... and predicted_lang.
    */
  def withLanguageId(df: DataFrame, textCol: String): DataFrame = {
    val toks = col("__toks")
    val scored = langOrder.foldLeft(
      df.withColumn("__toks", tokens(col(textCol))))((d, l) =>
      d.withColumn(s"score_$l", stopwordHits(toks, stopwords(l))))
    val predicted = langOrder.init.zipWithIndex.foldRight(
      lit(langOrder.last): Column) { case ((l, i), els) =>
      val geAll = langOrder.drop(i + 1)
        .map(o => col(s"score_$l") >= col(s"score_$o"))
        .reduce(_ && _)
      when(geAll, lit(l)).otherwise(els)
    }
    scored.withColumn("predicted_lang", predicted).drop("__toks")
  }

  /** Quality metrics per document: token counts, type-token ratio,
    * stopword ratio, mean token length, and a composite [0,1] score.
    * The score formula is arbitrary but fixed; what matters is that it
    * is deterministic and cheap (pure projection).
    */
  def withQuality(df: DataFrame, textCol: String): DataFrame = {
    val t = col("__toks")
    df.withColumn("__toks", tokens(col(textCol)))
      .withColumn("n_tokens", size(t).cast("long"))
      .withColumn("n_distinct_tokens", size(array_distinct(t)).cast("long"))
      .withColumn("n_chars", length(col(textCol)).cast("long"))
      .withColumn("avg_token_len",
        round(aggregate(t, lit(0L), (acc, x) => acc + length(x))
          .cast("double") / size(t), 6))
      .withColumn("type_token_ratio",
        round(size(array_distinct(t)).cast("double") / size(t), 6))
      .withColumn("stopword_ratio",
        round(stopwordHits(t, stopwords("en")).cast("double") / size(t), 6))
      .withColumn("quality_score",
        round(
          size(array_distinct(t)).cast("double") / size(t) * 0.5 +
            least(stopwordHits(t, stopwords("en")).cast("double") / size(t) * 5.0,
              lit(1.0)) * 0.3 +
            least(size(t).cast("double") / 100.0, lit(1.0)) * 0.2, 6))
      .drop("__toks")
  }

  /** Token-count estimate: exact whitespace tokens plus a BPE-ish
    * subword estimate (ceil(len/4) pieces per word — the classic
    * ~4-chars-per-token rule applied per word). For EXACT subword
    * counts under a trained merge list see [[withBpeTokens]] /
    * [[trainBpe]].
    */
  def withTokenCounts(df: DataFrame, textCol: String): DataFrame = {
    val t = col("__toks")
    df.withColumn("__toks", tokens(col(textCol)))
      .withColumn("n_tokens", size(t).cast("long"))
      .withColumn("n_chars", length(col(textCol)).cast("long"))
      .withColumn("bpe_tokens",
        aggregate(t, lit(0L), (acc, x) => acc + ceil(length(x) / 4.0).cast("long")))
      .drop("__toks")
  }

  // ---- real subword BPE (r14 verdict #4) ----------------------------

  /** Word-boundary marker for the doc-level BPE symbol string: its own
    * space-delimited symbol between words, so no merge rule (whose
    * sides are word-character strings) can ever match across a word
    * boundary. Tokens come from [[tokens]] (split on ' '), so the
    * marker can never appear inside one on sane corpora; it is also
    * excluded from the final symbol count.
    */
  private val BpeBoundary = "¶" // ¶

  /** The initial BPE symbol string of a text: every character its own
    * space-delimited symbol, words separated by the [[BpeBoundary]]
    * symbol, one leading/trailing space — " a b ¶ c d " for "ab cd".
    * Pure projection (tokenize + join + one regexp pass).
    */
  def bpeInit(text: Column): Column =
    concat(lit(" "),
      regexp_replace(array_join(tokens(text), BpeBoundary), "(.)", "$1 "))

  /** Apply a FIXED merge list to the symbol string: TWO plain-string
    * `replace(" a b ", " ab ")` passes per merge rule, in rule order.
    * Each pass is a left-to-right non-overlapping scan — the portable
    * primitive every engine implements identically (Java
    * `String.replace`, DuckDB `replace`) — which is what makes the
    * operator ORACLE-EXPRESSIBLE: the oracle replays the same fixed
    * list as nested REPLACE calls and hash-matches. The SECOND pass is
    * load-bearing: a single scan consumes the shared delimiter space
    * between adjacent occurrences (" a b a b " → " ab a b "), leaving
    * every other occurrence unmerged; the re-scan folds the stragglers
    * (" ab ab "), matching classic BPE's element-wise pass everywhere
    * except the arrangement inside self-overlapping runs of one symbol
    * (" a a a a a " → [aa, a, aa] here vs BPE's [aa, aa, a] — same
    * symbol count, deterministic, and shared bit-for-bit by the
    * trainer, this encoder, and the oracle). [[trainBpe]] applies
    * merges with the same two-pass primitive, so trained merges and
    * encoded corpora always agree on segmentation. Fully codegen:
    * 2·M nested StringReplace expressions, no lambda, no UDF.
    */
  def bpeApply(symbols: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(symbols) { case (s, (a, b)) =>
      val once = replace(s, lit(s" $a $b "), lit(s" $a$b "))
      replace(once, lit(s" $a $b "), lit(s" $a$b "))
    }

  /** The SUBWORD SYMBOL ARRAY of a text under a fixed merge list, in
    * reading order with word boundaries excluded — the token stream a
    * trainer-facing materialization maps to vocabulary ids
    * ([[Packing.packExamples]]). Empty/whitespace-only text yields an
    * empty array (the split of "" would otherwise contribute a [""]
    * phantom symbol); null text yields null, like every other
    * projection here. Same fully-codegen replace chain as
    * [[bpeTokenCount]] — this IS its array form.
    */
  def bpeSymbols(text: Column, merges: Seq[(String, String)]): Column =
    when(size(tokens(text)) === 0,
      array().cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, containsNull = false)))
      .otherwise(filter(
        split(trim(bpeApply(bpeInit(text), merges)), " "),
        x => x =!= BpeBoundary))

  /** Exact subword token count per row under a fixed merge list:
    * symbols remaining after all merges, word boundaries excluded.
    */
  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column =
    size(bpeSymbols(text, merges)).cast("long")

  /** Adds `n_tokens` (whitespace) and `n_bpe_tokens` (exact subword
    * count under `merges`) — the real-tokenizer replacement for
    * [[withTokenCounts]]'s ceil(len/4) estimate. Every token budget
    * downstream ([[Packing.packGreedy]], `select_budget`, chunking)
    * accepts this column directly.
    */
  def withBpeTokens(df: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    df.withColumn("n_tokens", size(tokens(col(textCol))).cast("long"))
      .withColumn("n_bpe_tokens", bpeTokenCount(col(textCol), merges))

  /** Expression-form viability ceiling: 2·M nested `StringReplace`s
    * stay comfortably inside janino/codegen limits to a few hundred
    * merges; a production 30-50k-merge vocabulary does not survive the
    * expression tree (r15 verdict #2). [[withBpeTokensAuto]] switches
    * to the typed tier above this.
    */
  val BpeExprMaxMerges: Int = 256

  /** One left-to-right NON-OVERLAPPING merge pass over a word's symbol
    * array — the exact array form of one `replace(" a b ", " ab ")`
    * string pass ([[bpeApply]]): a match consumes BOTH surrounding
    * delimiters, so the element right after a merged pair can never
    * START a match in the same pass (" a b a b " → " ab a b ", the
    * straggler the second pass folds).
    */
  private def bpeMergePass(syms: Array[String], a: String,
      b: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    val n = syms.length
    var changed = false
    while (i < n) {
      if (i + 1 < n && syms(i) == a && syms(i + 1) == b) {
        out += (a + b)
        if (i + 2 < n) out += syms(i + 2)
        i += 3
        changed = true
      } else {
        out += syms(i)
        i += 1
      }
    }
    if (changed) out.result() else syms
  }

  /** Encode ONE word under the merge list — BIT-IDENTICAL segmentation
    * to [[bpeApply]] restricted to that word (the [[BpeBoundary]]
    * symbol blocks every cross-word match, so the doc-level expression
    * form IS per-word application; BpeSpec pins the equivalence on a
    * randomized differential). Sequence-order semantics, replicated
    * exactly: rules apply in RANK order, each applied rule runs TWO
    * non-overlapping passes, and a rule once passed is never revisited
    * — so the next rule to apply is the minimum-rank pair PRESENT with
    * rank above the last applied (scanning the ≤L−1 adjacent pairs per
    * step, O(L²) worst for an L-char word — trivial at word length).
    * Unlike the expression form, cost is independent of the merge-list
    * SIZE for non-matching rules: only pairs present in the word are
    * ever looked up, which is what makes a 50k-merge vocabulary
    * tractable.
    */
  private[graft] def bpeEncodeWord(word: String,
      rules: Array[(String, String)],
      rank: scala.collection.Map[(String, String), Int])
      : Array[String] = {
    var syms: Array[String] = word.toCharArray.map(_.toString)
    var last = -1
    var continue = true
    while (continue && syms.length > 1) {
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r > last && r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) continue = false
      else {
        val (a, b) = rules(best)
        syms = bpeMergePass(bpeMergePass(syms, a, b), a, b)
        last = best
      }
    }
    syms
  }

  /** Per-partition (n_tokens, n_bpe_tokens) counter over a broadcast
    * rule array: the rank map is built once per partition and symbol
    * counts are memoized PER DISTINCT WORD (size-capped so an
    * adversarial all-unique-words partition cannot hold the whole
    * partition's text), so a Zipf-shaped corpus pays the merge loop
    * only on its vocabulary, not its running tokens. Tokenization is
    * EXACTLY [[tokens]] (lowercase, split on single spaces, drop
    * empties — tabs/newlines stay inside tokens there too; matching
    * the expression form is the contract).
    */
  private def bpeTextCounter(rs: Array[(String, String)])
      : String => (Long, Long) = {
    val rank = new scala.collection.mutable.HashMap[(String, String), Int]
    var i = 0
    while (i < rs.length) {
      // FIRST occurrence wins, as in rank maps everywhere — a
      // duplicated rule's later copy can never apply in sequence
      // order anyway (its pair was merged away or passed)
      if (!rank.contains(rs(i))) rank.update(rs(i), i)
      i += 1
    }
    val memo = new scala.collection.mutable.HashMap[String, Long]
    (text: String) => {
      var nTok = 0L
      var nBpe = 0L
      // Locale.ROOT, not the JVM default: a Turkish-locale executor
      // would dotless-i-diverge from the expression form's
      // locale-independent `lower` (the classifyTyped lesson)
      text.toLowerCase(java.util.Locale.ROOT).split(" ", -1).foreach { w =>
        if (w.nonEmpty) {
          nTok += 1L
          val cnt = memo.getOrElse(w, -1L)
          if (cnt >= 0L) nBpe += cnt
          else {
            val c = bpeEncodeWord(w, rs, rank)
              .count(_ != BpeBoundary).toLong
            if (memo.size < 262144) memo.update(w, c)
            nBpe += c
          }
        }
      }
      (nTok, nBpe)
    }
  }

  /** TYPED-TIER [[withBpeTokens]] for PRODUCTION-SIZE merge lists
    * (r15 verdict #2): adds `n_tokens` + `n_bpe_tokens` to every row
    * in ONE `mapPartitions` pass — no id contract, no join, one
    * corpus scan (the documented [[Packing]]/[[Multimodal]] tier: the
    * merge ranks ship once per executor as a broadcast; a 50k-merge
    * list inlined into a plan is janino-fatal). Bit-identical counts
    * to the expression form under the same merges (spec-pinned; the
    * contract inherited from [[bpeInit]]: the [[BpeBoundary]]
    * character does not occur inside words); null text → null counts,
    * as there.
    */
  def withBpeTokensTyped(df: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(merges.toArray)
    val idx = df.schema.fieldIndex(textCol)
    val outSchema = df.schema
      .add("n_tokens", org.apache.spark.sql.types.LongType)
      .add("n_bpe_tokens", org.apache.spark.sql.types.LongType)
    df.mapPartitions { it =>
      val count = bpeTextCounter(bc.value)
      it.map { r =>
        val appended: Seq[Any] =
          if (r.isNullAt(idx)) Seq(null, null)
          else {
            val (nt, nb) = count(r.getString(idx))
            Seq(nt, nb)
          }
        org.apache.spark.sql.Row.fromSeq(r.toSeq ++ appended)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** TYPED-TIER [[bpeSymbols]]: adds the subword SYMBOL ARRAY column
    * `outCol` in ONE `mapPartitions` pass — the symbol-stream form of
    * [[withBpeTokensTyped]], for consumers that need the sequence
    * itself (the streaming packer's id mapping), not just its length.
    * Encoding is [[bpeEncodeWord]] memoized PER DISTINCT WORD (same
    * size-capped memo discipline as [[bpeTextCounter]]; a Zipf corpus
    * pays the merge loop only on its vocabulary) and the doc stream is
    * the concatenation of per-word encodes in reading order — which IS
    * [[bpeSymbols]]'s value, because [[BpeBoundary]] blocks every
    * cross-word merge in the expression form (bit-equivalence
    * spec-pinned by a seeded differential; the [[bpeInit]] contract —
    * BpeBoundary does not occur inside words — is shared, and stray
    * boundary symbols are filtered like the counter filters them).
    * Null text → null array; empty/whitespace-only → empty array,
    * both as in the expression form.
    */
  def withBpeSymbolsTyped(df: DataFrame, textCol: String,
      merges: Seq[(String, String)], outCol: String = "syms"): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(merges.toArray)
    val idx = df.schema.fieldIndex(textCol)
    val outSchema = df.schema.add(outCol,
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, containsNull = false))
    df.mapPartitions { it =>
      val rs = bc.value
      val rank = new scala.collection.mutable.HashMap[(String, String), Int]
      var i = 0
      while (i < rs.length) {
        if (!rank.contains(rs(i))) rank.update(rs(i), i)
        i += 1
      }
      val memo = new scala.collection.mutable.HashMap[String, Array[String]]
      it.map { r =>
        val appended: Any =
          if (r.isNullAt(idx)) null
          else {
            val out = Seq.newBuilder[String]
            r.getString(idx).toLowerCase(java.util.Locale.ROOT)
              .split(" ", -1).foreach { w =>
              if (w.nonEmpty) {
                val cached = memo.getOrElse(w, null)
                val enc =
                  if (cached != null) cached
                  else {
                    val e = bpeEncodeWord(w, rs, rank)
                      .filter(_ != BpeBoundary)
                    if (memo.size < 262144) memo.update(w, e)
                    e
                  }
                out ++= enc
              }
            }
            out.result()
          }
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ appended)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Keyed typed-tier counts — (idCol, n_bpe_tokens), for callers that
    * want a count FRAME to join on their own terms rather than the
    * row-preserving [[withBpeTokensTyped]]. `idCol` must be
    * long-castable; join-back semantics are the caller's (duplicate
    * ids fan out like any keyed join). Null ids/text pass through as
    * null counts.
    */
  def bpeTokenCountsTyped(docs: DataFrame, idCol: String,
      textCol: String, merges: Seq[(String, String)]): DataFrame =
    withBpeTokensTyped(
      docs.select(col(idCol).cast("long").as(idCol),
        col(textCol).cast("string").as(textCol)),
      textCol, merges)
      .select(col(idCol), col("n_bpe_tokens"))

  /** [[withBpeTokens]] with the tier SELECTED by merge-list size
    * (r15 verdict #2): at or below [[BpeExprMaxMerges]] the
    * oracle-replayable expression form; above it the one-pass
    * row-preserving typed tier ([[withBpeTokensTyped]]).
    */
  def withBpeTokensAuto(df: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    if (merges.size <= BpeExprMaxMerges) withBpeTokens(df, textCol, merges)
    else withBpeTokensTyped(df, textCol, merges)

  /** Train a BPE merge list on a corpus — deterministic greedy
    * pair-merging (Sennrich et al. 2016, arXiv:1508.07909) over the
    * corpus WORD-FREQUENCY dictionary:
    *
    *   1. ONE distributed aggregation: word → count (the only pass
    *      over corpus text), truncated to the `maxWords` most frequent
    *      words (count desc, word asc — deterministic), collected.
    *      The dict is Zipf-bounded — top-50k words cover ≈97% of
    *      running English text — so this is the [[Similarity
    *      .kmeansCodebook]] shape: bounded model state trains on the
    *      driver, the corpus is never re-scanned per round. (The
    *      alternative — one distributed pair-count job per merge
    *      round — pays M shuffles over corpus tokens to train the
    *      same merges the weighted dict yields; word-dict training is
    *      how production BPE trainers work for exactly this reason.)
    *   2. M driver rounds over the dict: count adjacent symbol pairs
    *      weighted by word frequency, merge the most frequent pair
    *      (count desc, then pair asc — fully deterministic), apply it
    *      to every dict word with the SAME two-pass `replace`
    *      primitive [[bpeApply]] uses.
    *
    * Returns the merges in application order. Training cost:
    * O(maxWords · wordLen · numMerges) driver work over ≤ maxWords
    * collected rows.
    */
  def trainBpe(docs: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 10000): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    require(maxWords > 0, s"maxWords must be > 0, got $maxWords")
    val spark = docs.sparkSession
    import spark.implicits._
    val dict: Array[(String, Long)] = docs
      .select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(maxWords)
      .as[(String, Long)].collect()
    // INCREMENTAL trainer over the collected dict (r16 — the naive
    // full-recount loop paid O(dict · wordLen) PER ROUND, 211 s for a
    // 5k-merge train; this is the standard production shape): exact
    // pair counts and a (count desc, pair asc)-ordered queue are
    // maintained by DELTA — each round touches only the words whose
    // segmentation contains the merged pair, decrementing their old
    // adjacent-pair counts and incrementing the new. The pick each
    // round is IDENTICAL to the recount form's
    // `minBy (-count, a, b)` (counts are exact by construction), so
    // the trained list is bit-identical — TextOpsSpec's hand-checked
    // and determinism arms pin it. Merges apply with the same
    // two-pass primitive [[bpeApply]]/[[bpeEncodeWord]] use.
    val seg: Array[Array[String]] =
      dict.map { case (w, _) => w.toCharArray.map(_.toString) }
    val freq: Array[Long] = dict.map(_._2)
    val counts = scala.collection.mutable.HashMap
      .empty[(String, String), Long]
    val byPair = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.Set[Int]]
    def pairsOf(syms: Array[String]): Iterator[(String, String)] =
      if (syms.length < 2) Iterator.empty
      else (0 until syms.length - 1).iterator
        .map(i => (syms(i), syms(i + 1)))
    seg.indices.foreach { w =>
      pairsOf(seg(w)).foreach { p =>
        counts.update(p, counts.getOrElse(p, 0L) + freq(w))
        byPair.getOrElseUpdate(p,
          scala.collection.mutable.Set.empty) += w
      }
    }
    // (count, a, b) under (-count, a, b): head is the round's pick;
    // entries are removed+reinserted on every count change, so the
    // set never holds a stale count
    val ord: Ordering[(Long, String, String)] =
      Ordering.by[(Long, String, String), (Long, String, String)](
        e => (-e._1, e._2, e._3))(
        Ordering.Tuple3(Ordering.Long, Ordering.String, Ordering.String))
    val queue =
      scala.collection.mutable.TreeSet.empty[(Long, String, String)](ord)
    counts.foreach { case ((a, b), n) => queue += ((n, a, b)) }
    def adjust(p: (String, String), delta: Long, w: Int): Unit = {
      val c0 = counts.getOrElse(p, 0L)
      val c1 = c0 + delta
      if (c0 > 0L) queue -= ((c0, p._1, p._2))
      if (c1 > 0L) {
        counts.update(p, c1)
        queue += ((c1, p._1, p._2))
      } else {
        counts.remove(p)
        byPair.remove(p)
      }
      if (delta > 0L && c1 > 0L)
        byPair.getOrElseUpdate(p,
          scala.collection.mutable.Set.empty) += w
    }
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    while (round < numMerges && queue.nonEmpty) {
      val (_, a, b) = queue.head
      merges += ((a, b))
      val touched = byPair.get((a, b))
        .map(_.toArray).getOrElse(Array.empty)
      touched.foreach { w =>
        val before = seg(w)
        val after = bpeMergePass(bpeMergePass(before, a, b), a, b)
        if (!(after eq before)) {
          // exact per-word delta: multiplicity-weighted old pairs out,
          // new pairs in (byPair keeps stale word entries for pairs
          // the word no longer holds — harmless: the round's touch
          // re-derives from seg(w), and counts stay exact)
          pairsOf(before).foreach(p => adjust(p, -freq(w), w))
          seg(w) = after
          pairsOf(after).foreach(p => adjust(p, freq(w), w))
        }
      }
      // the merged pair may survive self-overlapping runs with a
      // REDUCED exact count (both forms share the two-pass semantics);
      // if it is gone, its queue entry went with the last decrement
      round += 1
    }
    merges.result()
  }

  /** Document fingerprint: min-over-shingles of md5(shingle) — a
    * winnowing-style content fingerprint that is stable under word
    * reordering outside any shingle and cheap to compare/join on.
    */
  def withFingerprint(df: DataFrame, textCol: String, n: Int = 3): DataFrame =
    withShingles(df, textCol, n, out = "__sh")
      .withColumn("n_shingles", size(col("__sh")).cast("long"))
      .withColumn("fingerprint",
        array_min(transform(col("__sh"), s => md5(s))))
      .drop("__sh")

  /** Benchmark decontamination as a first-class operator: flag every
    * corpus document sharing ANY n-token shingle with `benchmark` — an
    * ARBITRARY frame of eval-suite documents (the production shape:
    * eval suites live in their own small table, KB–MB, separate from
    * the corpus). Returns `(idCol, contaminated: boolean)` over the
    * full corpus.
    *
    * Plan shape for 100 TB: the benchmark shingle set is tiny by
    * construction, so it is BROADCAST and the corpus side is one
    * explode + left-semi join — no corpus shuffle, no pair
    * materialization. Reference provenance: the reference has no
    * decontamination surface; this is a north-star training-pipeline
    * operator (SURVEY.md §2 extensions).
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, benchTextCol: String,
      n: Int = 5): DataFrame = {
    val corpusSh = withShingles(corpus, textCol, n, out = "__sh")
      .select(col(idCol), explode(col("__sh")).as("shingle"))
    val benchSh = withShingles(benchmark, benchTextCol, n, out = "__sh")
      .select(explode(col("__sh")).as("shingle")).distinct()
    val hits = corpusSh.join(broadcast(benchSh), Seq("shingle"), "left_semi")
      .select(idCol).distinct()
      .withColumn("contaminated", lit(true))
    corpus.select(idCol).join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("contaminated"), lit(false)).as("contaminated"))
  }

  /** SPAN-level decontamination — the REMOVAL half of
    * [[decontaminate]] (the ExactSubstr-against-eval-suites deployment
    * of Lee et al. 2022: cut the overlapping run, keep the rest of the
    * document instead of dropping it whole): every corpus position
    * whose k-gram occurs ANYWHERE in the benchmark is flagged, flagged
    * starts merge into maximal spans (gap ≤ k — the
    * [[Dedup.exactSubstrSpans]] machinery), spans shorter than
    * `minSpanTokens` survive (a short common phrase is language, not
    * leakage), and covered tokens are cut with the text rebuilt.
    * Returns [[Dedup.removeDupSpans]]'s exact shape: (idCol, `text`,
    * `n_spans_removed`, `n_tokens_removed`) over the full corpus.
    *
    * Plan shape for 100 TB: the benchmark gram set is tiny by
    * construction and BROADCASTS into a left-semi join against the
    * corpus' positioned grams (one explode, no corpus shuffle for the
    * probe); span merge + cut are per-document windows bounded by doc
    * length. No pair space anywhere.
    */
  def decontaminateSpans(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, benchTextCol: String,
      k: Int = 5, minSpanTokens: Int = 0): DataFrame = {
    val grams = Dedup.positionedGrams(corpus, idCol, textCol, k,
      hashed = false)
    val benchSh = withShingles(benchmark, benchTextCol, k, out = "__sh")
      .select(explode(col("__sh")).as("__g")).distinct()
    val flagged = grams
      .join(broadcast(benchSh), Seq("__g"), "left_semi")
      .select(col(idCol), col("pos"))
    val base = corpus.select(col(idCol), tokens(col(textCol)).as("__toks"))
    // no canonical protection here: the benchmark is the canon, and it
    // lives in its own table — every corpus occurrence is a cut
    Dedup.cutFlaggedSpans(base, flagged, flagged.limit(0), idCol, k,
      minSpanTokens)
  }

  /** SEMANTIC decontamination — the embedding-space member of the
    * decontamination family ([[decontaminate]] flags n-gram overlap,
    * [[decontaminateSpans]] cuts it; this catches PARAPHRASED leakage
    * that shares no n-gram with the eval suite): a corpus document is
    * contaminated when its embedding's max cosine against ANY
    * benchmark embedding reaches `threshold`. Returns one row per
    * corpus document: (idCol, `contaminated`, `max_cosine` — rounded
    * 6 dp, the cross-engine comparison discipline).
    *
    * Plan shape for 100 TB: eval suites are KB–MB by construction, so
    * the benchmark embeddings COLLECT to the driver (hard-capped at
    * `maxBench` — past it, fail loudly rather than ship an unbounded
    * task binary) and the corpus side is ONE loop-codegen projection
    * ([[graft.functions.MaxCosine]] — constant-size generated code, no
    * join, no shuffle, the [[Similarity.assignClusters]] discipline).
    * Contrast the n-gram family's broadcast semi-join: both keep the
    * corpus scan shuffle-free; here even the join disappears.
    *
    * Contract: vectors non-zero ([[Similarity.searchIvfPqVectors]]'s
    * rule — a zero vector has no direction); zero-norm and NULL
    * BENCHMARK rows are dropped with that reasoning (they can match
    * nothing), an all-zero benchmark flags nothing. A CORPUS vector
    * whose dimension differs from the benchmark's is a different
    * model's output — its `max_cosine` (and so `contaminated`) comes
    * back NULL rather than a truncated-arithmetic wrong verdict
    * ([[graft.functions.MaxCosine]]'s dim-mismatch rule).
    */
  def decontaminateSemantic(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, vecCol: String, benchVecCol: String,
      threshold: Double, maxBench: Int = 4096): DataFrame = {
    import graft.functions.GraftFunctions.max_cosine
    val rows = benchmark.select(col(benchVecCol).cast("array<double>"))
      .limit(maxBench + 1).collect()
    require(rows.length <= maxBench,
      s"benchmark exceeds maxBench=$maxBench embeddings — semantic " +
        "decontamination broadcasts the benchmark side by contract; " +
        "split the suite or raise the cap deliberately")
    val vecs = rows.iterator
      // NULL benchmark embeddings match nothing — dropped with the
      // same reasoning as the zero-norm filter below (a bare NPE from
      // getSeq would point at nothing)
      .filter(!_.isNullAt(0))
      .map(_.getSeq[java.lang.Double](0))
      // a NULL ELEMENT inside a benchmark vector is rejected loudly
      // (ADVICE r15): the corpus side maps element-nulls to a NULL
      // verdict ([[graft.functions.MaxCosine]]), but a benchmark
      // vector is a REFERENCE — silently dropping or zeroing a
      // component would quietly weaken every verdict, and the
      // previous toArray unboxing NPE'd with no pointer at the cause
      .map { s =>
        require(s.forall(_ != null),
          "benchmark embedding contains a null element — fix or drop " +
            "the row (corpus-side nulls yield a NULL verdict; a " +
            "reference vector must be fully defined)")
        s.map(_.doubleValue).toArray
      }
      .map(v => (v, v.foldLeft(0d)((a, x) => a + x * x)))
      .filter(_._2 > 0d)
      .toSeq
    if (vecs.isEmpty)
      return corpus.select(col(idCol), lit(false).as("contaminated"),
        lit(null).cast("double").as("max_cosine"))
    val dim = vecs.head._1.length
    require(vecs.forall(_._1.length == dim),
      s"benchmark embeddings must share one dimension (found " +
        s"${vecs.map(_._1.length).distinct.sorted.mkString(",")})")
    val flat = new Array[Double](vecs.size * dim)
    for (j <- vecs.indices; i <- 0 until dim) flat(j * dim + i) = vecs(j)._1(i)
    corpus
      .withColumn("max_cosine",
        max_cosine(col(vecCol), flat, vecs.map(_._2).toArray, dim))
      .select(col(idCol),
        (col("max_cosine") >= threshold).as("contaminated"),
        col("max_cosine"))
  }

  /** Self-trained unigram language-model score — the KenLM-perplexity
    * stand-in for quality filtering: per document, the mean surprisal
    * (−ln p(token), nats) under the corpus's own unigram distribution.
    * Low cross-entropy ⇒ the doc is made of common corpus words;
    * unusually high ⇒ rare-token soup — the standard LM-quality signal
    * when a real LM is unavailable.
    *
    * Two distributed passes, both linear: (1) ONE token aggregation
    * builds the unigram table — vocab-sized, bounded by the tokenizer,
    * so it BROADCASTS (an open vocab at 100 TB would swap the broadcast
    * for a shuffle join; the plan is otherwise unchanged); (2) explode +
    * broadcast-join token→surprisal + per-doc agg with map-side partial
    * aggregation.
    *
    * Determinism: surprisal is computed once per DISTINCT token, rounded
    * to 6 dp, and summed as DECIMAL(18,6) — exact, order-independent —
    * then the mean divides once in double. Results are identical on any
    * partitioning and reproducible in the SQL oracle.
    */
  def unigramScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val tok = df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
    val vocab = tok.groupBy("token").agg(count("*").as("c"))
    val total = vocab.agg(sum("c").as("n"))
    val table = vocab.crossJoin(broadcast(total))
      .select(col("token"),
        round(-log(col("c").cast("double") / col("n")), 6)
          .cast(DecimalType(18, 6)).as("surprisal"))
    tok.join(broadcast(table), Seq("token"))
      .groupBy(col(idCol))
      .agg(count("*").as("n_tokens"),
        round(sum(col("surprisal")).cast("double") / count("*"), 6)
          .as("cross_entropy"))
  }

  /** Per-document bigram-LM cross-entropy — one rung above
    * [[unigramScore]] on the text-quality ladder: repetitive or
    * scrambled text that fools unigram statistics (right words, wrong
    * order) scores poorly against the corpus's own bigram
    * distribution. Add-one smoothing over the corpus vocabulary:
    * `P(w2|w1) = (c(w1 w2) + 1) / (ctx(w1) + V)` with `ctx(w1)` the
    * count of w1-as-context (= Σ_w2 c(w1,w2), re-aggregated from the
    * bigram counts — the raw text is scanned once) and `V` the corpus
    * vocabulary size (one scalar).
    *
    * Shapes for 100 TB: bigram extraction is a pure guarded
    * projection over the token array (the `size >= 2` guard matters —
    * `sequence(1, 0)` is the DESCENDING `[1, 0]`); bigram counts are
    * one keyed agg; the context re-agg reads the already-reduced
    * bigram frame; the surprisal lookup joins doc-bigram rows to the
    * count frame KEYED on bigram (a bigram table outgrows broadcast
    * long before the vocabulary does — unlike [[unigramScore]]'s
    * broadcast token table); ctx + V ride broadcasts (vocab-sized /
    * scalar).
    *
    * Determinism: surprisal computed once per DISTINCT bigram,
    * rounded to 6 dp, summed as DECIMAL(18,6) (order-independent),
    * one double division for the mean. Docs with fewer than two
    * tokens have no bigrams and drop from the output (inner join) —
    * documented contract.
    *
    * Output: idCol, `n_bigrams`, `cross_entropy`.
    */
  def bigramScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // raw text parsed ONCE: the tokenized-array frame is persisted and
    // every consumer (bigram counts, the final doc join, the vocab
    // scalar) derives from the cached arrays — same discipline the
    // bm25/tfidf plan locks pin ("corpus tokenized once"). House
    // cache-lifecycle rule: eagerly materialize the output, then
    // unpersist in finally.
    val tokArr = df.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .persist()
    try {
      val bgArr = when(size(col("__toks")) >= 2,
        transform(sequence(lit(1), size(col("__toks")) - 1),
          i => concat_ws(" ", element_at(col("__toks"), i),
            element_at(col("__toks"), i + 1))))
        .otherwise(array().cast("array<string>"))
      val bg = tokArr.select(col(idCol), explode(bgArr).as("bigram"))
      val bc = bg.groupBy("bigram").agg(count(lit(1)).as("c"))
      val ctx = bc.groupBy(split(col("bigram"), " ").getItem(0).as("w1"))
        .agg(sum(col("c")).as("ctx"))
      val vocab = tokArr.select(explode(col("__toks")).as("token"))
        .agg(count_distinct(col("token")).as("v"))
      val table = bc
        .join(broadcast(ctx),
          split(col("bigram"), " ").getItem(0) === col("w1"))
        .crossJoin(broadcast(vocab))
        .select(col("bigram"),
          round(-log((col("c").cast("double") + lit(1.0)) /
            (col("ctx").cast("double") + col("v").cast("double"))), 6)
            .cast(DecimalType(18, 6)).as("surprisal"))
      Dedup.materialize(
        bg.join(table, Seq("bigram"))
          .groupBy(col(idCol))
          .agg(count(lit(1)).as("n_bigrams"),
            round(sum(col("surprisal")).cast("double") / count(lit(1)), 6)
              .as("cross_entropy")))
    } finally tokArr.unpersist(blocking = false)
  }

  /** Per-document INTERPOLATED KNESER–NEY trigram cross-entropy — the
    * CCNet/KenLM quality-filter shape (Wenzek et al. 2020 filter
    * Common Crawl on exactly this signal; Kneser & Ney 1995; Chen &
    * Goodman 1999 eq. 4.25): the top rung of the LM ladder above
    * [[unigramScore]]/[[bigramScore]]. Fixed absolute discount `D`
    * (KenLM's simplest configuration) with continuation-count lower
    * orders:
    *
    *   P(w3|w1 w2) = (max(c(w1w2w3)−D, 0) + D·N1+(w1w2•)·P(w3|w2))
    *                   / c(w1w2•)
    *   P(w3|w2)    = (max(N1+(•w2w3)−D, 0) + D·N1+(w2•)·P(w3))
    *                   / N1+(•w2•)
    *   P(w3)       = N1+(•w3) / N1+(••)
    *
    * where N1+ are DISTINCT-context counts ("how many different
    * contexts has this n-gram followed") — the Kneser–Ney insight that
    * a word seen often but only ever in one context ("Francisco")
    * should back off weakly. Self-trained like its siblings: the
    * corpus is its own model, so every scored trigram is in-model and
    * smoothing only redistributes mass (no OOV path needed).
    *
    * Scale shape: the raw text is scanned ONCE (trigram extraction is
    * a guarded projection over the token arrays); the DISTINCT-trigram
    * count frame is materialized once and EVERY statistic above
    * re-aggregates it (context totals, follow counts, continuation
    * counts, the two vocab-sized backoff frames, one scalar) — at
    * 100 TB the model-side cost is trigram-TYPE-bounded (Heaps-law
    * sublinear), never a second corpus pass. The probability table
    * joins keyed on (w1,w2) / (w2,w3) (trigram/bigram-type-sized,
    * outgrow broadcast long before the vocabulary does), while the
    * w2/w3 backoff frames broadcast (the bigram-type count N1+(••)
    * rides the w3 frame as a window total — vocab-sized input, and
    * the exact form the SQL oracle replays); the final doc score is
    * one keyed join on trigram + one agg with map-side partials.
    *
    * Determinism: every statistic is an exact integer; D is a dyadic
    * literal (0.75 is exact in binary), so the probability is a fixed
    * IEEE expression tree over exact inputs, computed once per
    * DISTINCT trigram, rounded to 6 dp, summed as DECIMAL(18,6) —
    * order-independent and replayable by the SQL oracle with the same
    * parenthesization. Docs with < 3 tokens have no trigrams and drop
    * (the [[bigramScore]] contract).
    *
    * Output: idCol, `n_trigrams`, `cross_entropy` (mean surprisal,
    * nats, rounded 6 dp).
    */
  def kneserNeyScore(df: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75, byCol: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(discount > 0.0 && discount < 1.0,
      s"discount must be in (0, 1), got $discount")
    // `byCol` trains one INDEPENDENT model per group (CCNet trains a
    // per-language LM) in the SAME single corpus pass: the group key
    // rides every aggregation and join key below, so statistics never
    // mix across groups — grouped output ≡ running the plain form on
    // each group alone (spec-pinned differential). Cost is unchanged:
    // the aggregations just grow a key column.
    val by = byCol.toSeq
    val byC = by.map(col)
    def keyed(ks: String*): Seq[String] = by ++ ks
    // trigram extraction and the five KN statistics are THE shared
    // builders ([[KnLm.trigramsFromToks]]/[[KnLm.stats]] — one
    // definition for the self-scoring and the serve paths; the
    // seen-path bit-parity contract is load-bearing, so the
    // expressions must not fork). The COMPACT per-doc token arrays
    // are what pins (one tokenize pass; the exploded occurrence
    // stream is re-derived per consumer as a cheap projection —
    // persisting the exploded stream itself measured ~1 s slower per
    // query at sf0.1).
    val tokArr = df.select(
        (col(idCol) +: byC :+ tokens(col(textCol)).as("__toks")): _*)
      .persist()
    try {
      val tgd = KnLm.trigramsFromToks(tokArr, idCol +: by)
      val (c3, ctx2, cont, mid, uni) = KnLm.stats(tgd, by)
      val dD = lit(discount)
      val pUni = col("pc").cast("double") / col("bt").cast("double")
      val pBi = (greatest(col("cc").cast("double") - dD, lit(0.0)) +
        dD * col("nf2").cast("double") * pUni) /
        col("midtot").cast("double")
      val pTri = (greatest(col("c").cast("double") - dD, lit(0.0)) +
        dD * col("nf1").cast("double") * pBi) /
        col("ctx").cast("double")
      val table = c3
        .join(ctx2, keyed("w1", "w2"))
        .join(cont, keyed("w2", "w3"))
        .join(broadcast(mid), keyed("w2"))
        .join(broadcast(uni), keyed("w3"))
        .select((keyed("trigram").map(col) :+
          round(-log(pTri), 6).cast(DecimalType(18, 6)).as("surprisal")): _*)
      Dedup.materialize(
        tgd.select((col(idCol) +: byC :+ col("trigram")): _*)
          .join(table, keyed("trigram"))
          .groupBy((col(idCol) +: byC): _*)
          .agg(count(lit(1)).as("n_trigrams"),
            round(sum(col("surprisal")).cast("double") / count(lit(1)), 6)
              .as("cross_entropy")))
    } finally tokArr.unpersist(blocking = false)
  }

  /** CCNet perplexity bucketing (Wenzek et al. 2020 §4.4): per
    * LANGUAGE, split the corpus into `nBuckets` quantile buckets of LM
    * cross-entropy under that language's OWN model
    * ([[kneserNeyScore]] with `byCol` — all languages train in one
    * corpus pass) — bucket 1 = "head" (the most-fluent slice CCNet
    * keeps outright), the last = "tail" (dropped or down-sampled),
    * the rest "middle". NTILE over the total order (cross_entropy
    * asc, id asc) — ANSI tile semantics (first n mod b buckets get
    * the extra row) shared by Spark and the oracle, so bucket
    * boundaries are engine-exact. Docs with < 3 tokens have no
    * trigrams and drop (the [[kneserNeyScore]] contract).
    *
    * The tile is computed by [[graft.ops.Ranks.withGroupedNtile]]'s
    * two-pass range shuffle, NOT `ntile().over(Window.partitionBy
    * (lang))`: a per-language window partition routes every row of a
    * language through ONE task, and CCNet's corpus shape (~half the
    * web is one language) makes that the single-task plan that can
    * never survive 100 TB. Same ANSI semantics, bit-identical
    * buckets; the sort key (cross_entropy, id) is unique per row, so
    * the assignment is deterministic. EAGER at call time (the grouped
    * rank runs its sizing + offset jobs when called — which executes
    * the upstream KN scoring chain): call where the frame is about to
    * be consumed.
    *
    * Small-language caveat (ANSI NTILE fills buckets from 1): a
    * language with fewer docs than `nBuckets` occupies only the
    * LEADING buckets — it never emits a "tail" label — so a consumer
    * that drops tail keeps every doc of every tiny language. That is
    * usually the right default (no statistics to judge them by), but
    * a gate that must be conservative should ALSO threshold on
    * cross_entropy or minimum per-language support, not on the label
    * alone.
    *
    * Output: idCol, langCol, n_trigrams, cross_entropy, bucket (1-
    * based), bucket_label.
    */
  def perplexityBuckets(df: DataFrame, idCol: String, textCol: String,
      langCol: String, nBuckets: Int = 3,
      discount: Double = 0.75): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    // the score frame is PINNED before the grouped ntile: the rank's
    // three consumers of its input (the HLL regime check, pass 1, and
    // pass 2's shuffle build) would otherwise each re-run the whole KN
    // scoring chain; the pinned frame is doc-count-sized and compact
    // (id, lang, two numbers)
    val ce = Dedup.materialize(
      kneserNeyScore(df, idCol, textCol, discount, Some(langCol)))
    graft.ops.Ranks.withGroupedNtile(ce, Seq(langCol),
        Seq(col("cross_entropy"), col(idCol)), nBuckets, "__tile")
      .withColumn("bucket", col("__tile").cast("long")).drop("__tile")
      .withColumn("bucket_label",
        when(col("bucket") === 1, lit("head"))
          .when(col("bucket") === nBuckets, lit("tail"))
          .otherwise(lit("middle")))
      .select(col(idCol), col(langCol), col("n_trigrams"),
        col("cross_entropy"), col("bucket"), col("bucket_label"))
  }

  /** DSIR-style importance weights for data selection (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * per document, the log importance ratio
    *
    *   log w(doc) = Σ_tok [ ln p_target(tok) − ln p_raw(tok) ]
    *
    * under add-one-smoothed unigram models trained on (a) the TARGET
    * subset (`isTarget` rows — the domain you want more of) and (b) the
    * whole raw corpus. High log-weight docs "look like" the target
    * domain; resampling the raw corpus ∝ w approximates sampling from
    * the target distribution — the standard cheap-LM data-selection
    * recipe when a trained quality model is unavailable. Smoothing is
    * over the RAW vocabulary (target ⊆ raw, so every scored token has
    * both probabilities; an unseen-in-target token contributes its
    * 1/(n_t+V) penalty instead of −∞).
    *
    * Scale shape (identical to [[unigramScore]]): ONE token aggregation
    * computes both models' counts (`c_raw`, `c_target` via conditional
    * sum — the target model costs no second pass); totals and the
    * per-token delta table are vocab-sized and broadcast; the per-doc
    * score is explode + broadcast join + one keyed agg with map-side
    * partials. Nothing is doc-count-proportional on the driver.
    *
    * Determinism: the delta is computed once per DISTINCT token as
    * `round(ln p_t − ln p_r, 6)` DECIMAL(18,6), summed exactly
    * (order-independent), one final cast — engine-identical, oracle-able.
    *
    * Output: idCol, `n_tokens`, `log_weight` (rounded-6dp double; docs
    * with zero tokens drop — same contract as [[unigramScore]]).
    */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val tok = df.select(col(idCol), isTarget.as("__tgt"),
      explode(tokens(col(textCol))).as("token"))
    val vocab = tok.groupBy("token").agg(
      count(lit(1)).as("c_r"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("c_t"))
    val totals = vocab.agg(sum("c_r").as("n_r"), sum("c_t").as("n_t"),
      count(lit(1)).as("v"))
    val table = vocab.crossJoin(broadcast(totals))
      .select(col("token"),
        round(
          log((col("c_t").cast("double") + lit(1.0)) /
            (col("n_t").cast("double") + col("v").cast("double"))) -
          log((col("c_r").cast("double") + lit(1.0)) /
            (col("n_r").cast("double") + col("v").cast("double"))), 6)
          .cast(DecimalType(18, 6)).as("delta"))
    tok.join(broadcast(table), Seq("token"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("delta")).cast("double"), 6).as("log_weight"))
  }

  /** Per-document coverage of the corpus's top-K vocabulary: the
    * fraction of a doc's tokens that fall inside the K most frequent
    * corpus tokens (ties broken by token asc — engine-independent).
    * A coverage collapse flags non-linguistic content (code dumps,
    * boilerplate, wrong-language docs) against the corpus's own norm.
    *
    * The top-K table is a bounded TakeOrdered (per-partition top-K +
    * K-row merge, never a global sort) and broadcasts; the corpus side
    * is explode + broadcast left join + integer-only per-doc agg.
    */
  def vocabCoverage(df: DataFrame, idCol: String, textCol: String,
      topK: Int): DataFrame = {
    val tok = df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
    val top = tok.groupBy("token").agg(count("*").as("c"))
      .orderBy(col("c").desc, col("token")).limit(topK)
      .select(col("token"), lit(1L).as("__in"))
    tok.join(broadcast(top), Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(count("*").as("n_tokens"),
        sum(coalesce(col("__in"), lit(0L))).as("in_vocab"))
      .withColumn("vocab_coverage",
        round(col("in_vocab").cast("double") / col("n_tokens"), 6))
  }

  /** PII redaction rules: (regex, replacement-tag), applied IN ORDER —
    * order matters (emails before generic digit runs, so `a1@b.co`
    * never half-matches). Patterns stay inside the RE2 ∩ java.util.regex
    * common subset (no backrefs, no lookaround) so the exact same rule
    * list is portable to RE2-based engines and SQL oracles.
    */
  val DefaultPiiRules: Seq[(String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("\\+?\\d[\\d().\\s-]{6,}\\d", "<PHONE>"))

  /** Masks PII spans in `text` by applying each rule's regexp_replace in
    * order. Pure projection (whole-stage codegen regex), no shuffle —
    * redacting 100 TB is embarrassingly parallel.
    */
  def redactPii(text: Column,
      rules: Seq[(String, String)] = DefaultPiiRules): Column =
    rules.foldLeft(text) { case (c, (pat, tag)) =>
      regexp_replace(c, pat, tag)
    }

  /** Adds `redacted` and `n_pii` columns; `n_pii` counts spans rule by
    * rule on the progressively-redacted text, so a span consumed by an
    * earlier rule is never double-counted by a later one (mirrors
    * [[redactPii]]'s sequencing).
    */
  def withPiiRedaction(df: DataFrame, textCol: String,
      rules: Seq[(String, String)] = DefaultPiiRules): DataFrame = {
    val stages = rules.scanLeft(col(textCol)) { case (c, (pat, tag)) =>
      regexp_replace(c, pat, tag)
    }
    val counts = rules.zip(stages.init).map { case ((pat, _), stage) =>
      size(regexp_extract_all(stage, lit(pat), lit(0))).cast("long")
    }
    df.withColumn("redacted", stages.last)
      .withColumn("n_pii", counts.reduce(_ + _))
  }

  /** Duplicated-n-gram coverage (the exact-substring-dedup signal of
    * Lee et al., "Deduplicating Training Data Makes Language Models
    * Better", 2022, at n-gram granularity): for each document, the
    * fraction of its DISTINCT n-token shingles that occur in at least
    * one OTHER document. High coverage ⇒ the doc is largely assembled
    * from corpus-repeated spans (boilerplate, templates, mirrored
    * content) even when no single whole-doc near-dup exists — the case
    * MinHash-over-whole-docs misses.
    *
    * Plan: one explode → shingle-keyed count (shuffle 1, map-side
    * partial) → the duplicated-shingle set joins BACK to the exploded
    * frame on the same key (the exchange is reusable) → per-doc agg
    * (shuffle 2) → left join onto the doc spine so shingle-less (< n
    * tokens) docs survive with n_shingles = 0. No pair materialization
    * anywhere — cost is linear in total shingles, never quadratic in
    * docs, so the 100 TB shape is two keyed shuffles.
    *
    * A shingle duplicated within ONE doc only does not count
    * ([[shinglesFromTokens]] emits distinct shingles per doc, so the
    * per-shingle count is a document frequency).
    *
    * Output: idCol, n_shingles, n_dup_shingles, dup_fraction (NULL when
    * the doc has no shingles).
    */
  def dupNgramCoverage(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val sh = df.select(col(idCol),
      explode(shingles(col(textCol), n)).as("__sh"))
    val dup = sh.groupBy("__sh").agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= 2)
      .select(col("__sh"), lit(1L).as("__dup"))
    val perDoc = sh.join(dup, Seq("__sh"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__dup"), lit(0L))).as("n_dup_shingles"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_dup_shingles"), lit(0L)).as("n_dup_shingles"),
        round(col("n_dup_shingles").cast("double") / col("n_shingles"), 6)
          .as("dup_fraction"))
  }

  /** Fixed-size token chunking — context-window preparation: each doc
    * becomes ceil(n_tokens / chunkSize) rows of `chunkSize` tokens
    * (last chunk short). Output: (idCol, chunk_id 0-based, chunk_text,
    * chunk_n_tokens).
    *
    * Pure projection + one generator — NO shuffle, no state: the chunk
    * list is built per row with `transform(sequence(…))` over the token
    * array and exploded in place, so chunking 100 TB is embarrassingly
    * parallel and chunk windows never cross partition boundaries (a doc
    * is chunked where it is read). Empty-token docs emit no rows (the
    * `sequence` guard — sequence(0, -1) would count DOWN).
    */
  /** Fixed-size SUBWORD chunking — [[chunkTokens]] measured in the
    * tokenizer's own units: a training context window is `chunkSize`
    * BPE tokens, not words, so the slicer must run over the subword
    * sequence the budget counts ([[bpeTokenCount]]'s exact chain —
    * boundary symbols dropped). Expression-form encode, so the whole
    * operator is oracle-replayable at ≤ [[BpeExprMaxMerges]] merges;
    * same contracts as [[chunkTokens]] (token-free docs emit no
    * chunks, chunk ids ordered, last chunk ragged).
    */
  def chunkBpeTokens(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], chunkSize: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    val t = col("__subs")
    // r16: encode via the TYPED tier ([[withBpeSymbolsTyped]] — merge
    // ranks broadcast once, per-word memoized greedy loop), which is
    // bit-identical to the 2·M-nested-replace expression chain
    // (spec-pinned differential) and measured ~2.5× faster at the
    // 32-rule bench list — the expression form re-scans the whole
    // symbol string once per rule. The materialize barrier below is
    // still load-bearing: the encoded array is consumed by four
    // expressions (filter, sequence bound, per-chunk slice lambda,
    // ragged-tail size) and CollapseProject would otherwise inline the
    // encode into every consumer — encode once, slice many (also the
    // 100 TB shape).
    // filter AFTER the barrier: a predicate on the alias re-inlines
    // the chain into the pushed filter, doubling the pre-barrier work
    val enc = Dedup.materialize(
      withBpeSymbolsTyped(df.select(col(idCol), col(textCol)), textCol,
        merges, "__subs")
        .select(col(idCol), t))
    enc
      .filter(size(t) > 0)
      .withColumn("__chunks", transform(
        sequence(lit(0), ceil(size(t) / lit(chunkSize.toDouble)).cast("int") - 1),
        i => array_join(slice(t, i * chunkSize + 1, lit(chunkSize)), " ")))
      .select(col(idCol), col("__subs"),
        posexplode(col("__chunks")).as(Seq("chunk_id", "chunk_text")))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        col("chunk_text"),
        least(lit(chunkSize.toLong),
          size(col("__subs")).cast("long") - col("chunk_id") * chunkSize)
          .as("chunk_n_tokens"))
  }

  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    val t = col("__toks")
    df.withColumn("__toks", tokens(col(textCol)))
      .filter(size(t) > 0)
      .withColumn("__chunks", transform(
        sequence(lit(0), ceil(size(t) / lit(chunkSize.toDouble)).cast("int") - 1),
        i => array_join(slice(t, i * chunkSize + 1, lit(chunkSize)), " ")))
      .select(col(idCol), col("__toks"),
        posexplode(col("__chunks")).as(Seq("chunk_id", "chunk_text")))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        col("chunk_text"),
        least(lit(chunkSize.toLong),
          size(col("__toks")).cast("long") - col("chunk_id") * chunkSize)
          .as("chunk_n_tokens"))
  }
}
