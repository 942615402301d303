package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.extra.Text
import graft.model.Tables

/** Text-analysis queries over the `documents` table (north-star X5 +
  * the training-data-pipeline text operators).
  *
  * DuckDB oracle building blocks mirroring [[graft.extra.Text]]:
  * toks  = list_filter(string_split(lower(text),' '), t -> t <> '')
  * hits  = len(list_filter(toks, t -> list_contains([...], t)))
  */
object TextQueriesImpl {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  private val toksSql =
    "list_filter(string_split(lower(text), ' '), t -> t <> '')"

  private def hitsSql(lang: String): String = {
    val lst = Text.stopwords(lang).map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter(toks, t -> list_contains($lst, t)))"
  }

  // ---- text_quality -------------------------------------------------

  def textQuality(s: SparkSession, dir: String): DataFrame =
    Text.withQuality(docs(s, dir), "text")
      .select("doc_id", "lang", "n_tokens", "n_distinct_tokens", "n_chars",
        "avg_token_len", "type_token_ratio", "stopword_ratio", "quality_score")
      .orderBy("doc_id")

  private val textQualityOracle =
    s"""WITH t AS (SELECT doc_id, lang, text, $toksSql AS toks FROM documents)
       |SELECT doc_id, lang,
       |  CAST(len(toks) AS BIGINT) AS n_tokens,
       |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
       |  CAST(length(text) AS BIGINT) AS n_chars,
       |  round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
       |        / len(toks), 6) AS avg_token_len,
       |  round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6)
       |    AS type_token_ratio,
       |  round(CAST(${hitsSql("en")} AS DOUBLE) / len(toks), 6)
       |    AS stopword_ratio,
       |  round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) * 0.5
       |        + least(CAST(${hitsSql("en")} AS DOUBLE) / len(toks) * 5.0, 1.0) * 0.3
       |        + least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.2, 6)
       |    AS quality_score
       |FROM t
       |ORDER BY doc_id""".stripMargin

  // ---- lang_id ------------------------------------------------------

  def langId(s: SparkSession, dir: String): DataFrame =
    Text.withLanguageId(docs(s, dir), "text")
      .select("doc_id", "lang", "score_en", "score_es", "score_de",
        "score_fr", "predicted_lang")
      .orderBy("doc_id")

  private val langIdOracle = {
    val scores = Text.langOrder
      .map(l => s"  ${hitsSql(l)} AS score_$l").mkString(",\n")
    // argmax with tie-break in langOrder — same CASE shape as the Spark side
    val pred =
      """CASE
        |    WHEN score_en >= score_es AND score_en >= score_de AND score_en >= score_fr THEN 'en'
        |    WHEN score_es >= score_de AND score_es >= score_fr THEN 'es'
        |    WHEN score_de >= score_fr THEN 'de'
        |    ELSE 'fr' END""".stripMargin
    s"""WITH t AS (SELECT doc_id, lang, $toksSql AS toks FROM documents),
       |s AS (SELECT doc_id, lang,
       |$scores
       |FROM t)
       |SELECT doc_id, lang, score_en, score_es, score_de, score_fr,
       |  $pred AS predicted_lang
       |FROM s
       |ORDER BY doc_id""".stripMargin
  }

  // ---- token_counts -------------------------------------------------

  def tokenCounts(s: SparkSession, dir: String): DataFrame =
    Text.withTokenCounts(docs(s, dir), "text")
      .select("doc_id", "n_tokens", "n_chars", "bpe_tokens")
      .orderBy("doc_id")

  private val tokenCountsOracle =
    s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents)
       |SELECT doc_id,
       |  CAST(len(toks) AS BIGINT) AS n_tokens,
       |  CAST(length(text) AS BIGINT) AS n_chars,
       |  CAST(list_sum(list_transform(toks,
       |       x -> CAST(ceil(length(x) / 4.0) AS BIGINT))) AS BIGINT) AS bpe_tokens
       |FROM t
       |ORDER BY doc_id""".stripMargin

  // ---- token_counts_bpe (real subword BPE, fixed merge list) --------

  /** The FIXED demo merge list — trained once by `graft.BpeSmoke` on
    * the sf0.001 documents corpus via [[Text.trainBpe]] (32 greedy
    * merges, count-desc/pair-asc ties). FIXED because the oracle must
    * replay the identical list as nested REPLACEs; production retrains
    * with [[Text.trainBpe]] and versions the list with the corpus like
    * any quantizer (the `sim_topk_pq_trained` discipline). TextOpsSpec
    * pins trainer↔encoder segmentation agreement.
    */
  private val bpeMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"), ("s", "t"),
    ("l", "u"), ("a", "r"), ("p", "ar"), ("m", "er"), ("a", "t"),
    ("a", "n"), ("c", "an"), ("s", "can"), ("c", "o"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("d", "ow"), ("in", "dow"),
    ("w", "indow"), ("d", "er"), ("or", "der"), ("or", "t"),
    ("s", "ort"), ("par", "t"), ("u", "p"), ("a", "g"), ("ag", "g"),
    ("a", "lu"), ("alu", "e"), ("v", "alue"), ("in", "e"))

  /** Exact subword token counts under the fixed merge list — the real
    * tokenizer the repo's token budgets estimate with ceil(len/4)
    * ([[Text.withBpeTokens]]; fully codegen — M nested string
    * replaces, no lambda, no UDF).
    */
  def tokenCountsBpe(s: SparkSession, dir: String): DataFrame =
    Text.withBpeTokens(docs(s, dir), "text", bpeMerges)
      .select("doc_id", "n_tokens", "n_bpe_tokens")
      .orderBy("doc_id")

  /** The engine's exact encode chain in DuckDB SQL: chars spaced (word
    * boundaries as ¶ symbols), then TWO plain-string REPLACEs per merge
    * in rule order (the straggler re-scan — Text.bpeApply scaladoc).
    * Parameterized on the token-array expression so consumers that
    * cannot stage a `toks` alias (the recursive packing CTE) inline it.
    */
  private def bpeChainSqlOn(toksExpr: String): String = bpeMerges.foldLeft(
    s"' ' || regexp_replace(array_to_string($toksExpr, '¶'), '(.)', '\\1 ', 'g')"
  ) { case (s, (a, b)) =>
    s"replace(replace($s, ' $a $b ', ' $a$b '), ' $a $b ', ' $a$b ')"
  }

  private val bpeChainSql: String = bpeChainSqlOn("toks")

  private val tokenCountsBpeOracle = {
    val chain = bpeChainSql
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |m AS (SELECT doc_id, toks, $chain AS s FROM t)
       |SELECT doc_id,
       |  CAST(len(toks) AS BIGINT) AS n_tokens,
       |  CASE WHEN len(toks) = 0 THEN 0 ELSE
       |    CAST(len(list_filter(string_split(trim(s), ' '),
       |      x -> x <> '¶')) AS BIGINT) END AS n_bpe_tokens
       |FROM m
       |ORDER BY doc_id""".stripMargin
  }

  /** The PERSISTED-TOKENIZER serving form of [[tokenCountsBpe]] (the
    * `nb_lang_id_indexed` split applied to the tokenizer): the fixed
    * merge list is committed ONCE as a versioned
    * [[graft.extra.BpeModel]] ([[IndexedCorpus.bpeDir]] — the
    * tokenizer-registry artifact), every call loads it (memoized per
    * head signature, no Spark job on a warm JVM) and counts via the
    * TYPED merge loop — so the hash gate proves the persistence round
    * trip AND the typed tier against the SAME nested-REPLACE oracle.
    */
  def tokenCountsBpeIndexed(s: SparkSession, dir: String): DataFrame = {
    val merges = graft.extra.BpeModel.load(s,
      IndexedCorpus.bpeDir(s, bpeMerges))
    Text.withBpeTokensTyped(
        docs(s, dir).select("doc_id", "text"), "text", merges)
      .select("doc_id", "n_tokens", "n_bpe_tokens")
      .orderBy("doc_id")
  }

  // ---- doc_fingerprint ---------------------------------------------

  def fingerprint(s: SparkSession, dir: String): DataFrame =
    Text.withFingerprint(docs(s, dir), "text", n = 3)
      .select("doc_id", "n_shingles", "fingerprint")
      .orderBy("doc_id")

  private val fingerprintOracle =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |sh AS (SELECT doc_id,
       |  list_distinct(CASE WHEN len(toks) >= 3 THEN
       |    list_transform(range(1, len(toks) - 1),
       |      i -> array_to_string(toks[i:i+2], ' '))
       |    ELSE [] END) AS shingles
       |FROM t)
       |SELECT doc_id,
       |  CAST(len(shingles) AS BIGINT) AS n_shingles,
       |  list_min(list_transform(shingles, x -> md5(x))) AS fingerprint
       |FROM sh
       |ORDER BY doc_id""".stripMargin

  // ---- corpus_stats -------------------------------------------------

  /** Single-row corpus sizing summary — the first number a training-data
    * owner asks for: docs, whitespace + BPE-ish token totals, mean
    * quality (DECIMAL-summed so partial-agg order can't shift bits),
    * language count.
    */
  def corpusStats(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    Text.withTokenCounts(Text.withQuality(docs(s, dir), "text"), "text")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        sum("bpe_tokens").as("total_bpe_tokens"),
        round(sum(col("quality_score").cast(DecimalType(18, 6)))
          .cast("double") / count(col("quality_score")), 6).as("avg_quality"),
        countDistinct("lang").as("n_langs"))
  }

  private val corpusStatsOracle =
    s"""WITH t AS (SELECT doc_id, lang, text, $toksSql AS toks FROM documents),
       |m AS (SELECT doc_id, lang,
       |  CAST(len(toks) AS BIGINT) AS n_tokens,
       |  CAST(list_sum(list_transform(toks,
       |       x -> CAST(ceil(length(x) / 4.0) AS BIGINT))) AS BIGINT) AS bpe_tokens,
       |  round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) * 0.5
       |        + least(CAST(${hitsSql("en")} AS DOUBLE) / len(toks) * 5.0, 1.0) * 0.3
       |        + least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.2, 6)
       |    AS quality_score
       |FROM t)
       |SELECT count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |  CAST(sum(bpe_tokens) AS BIGINT) AS total_bpe_tokens,
       |  round(CAST(sum(CAST(quality_score AS DECIMAL(18,6))) AS DOUBLE)
       |        / count(quality_score), 6) AS avg_quality,
       |  count(DISTINCT lang) AS n_langs
       |FROM m""".stripMargin

  // ---- word_freq ----------------------------------------------------

  /** Corpus-wide top-50 tokens. Scale shape: explode → partial-agg →
    * shuffle by token → final agg → global top-k (TakeOrderedAndProject,
    * no full sort).
    */
  def wordFreq(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(explode(Text.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(50)

  private val wordFreqOracle =
    s"""SELECT token, count(*) AS n
       |FROM (SELECT unnest($toksSql) AS token FROM documents)
       |GROUP BY token
       |ORDER BY n DESC, token
       |LIMIT 50""".stripMargin

  // ---- heavy_hitters -------------------------------------------------

  /** Tokens above 0.5% corpus frequency via Misra-Gries
    * sketch-then-verify ([[graft.functions.MisraGries]]): pass 1 folds
    * each partition into ≤ k counters (O(k) state, NO shuffle of the
    * token stream — the aggregate moves partitions·k counters, not
    * 100 TB of tokens), pass 2 exact-counts only candidate-matching
    * rows. The verify pass makes the output deterministic and
    * identical to the oracle's direct GROUP BY ... HAVING — the
    * sketch's job is only to bound what the second pass shuffles.
    */
  def heavyHitters(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir)
      .select(explode(Text.tokens(col("text"))).as("token"))
    graft.functions.MisraGries
      .exactHeavyHitters(toks, "token", minShare = 0.005)
      .orderBy(col("n").desc, col("token"))
  }

  private val heavyHittersOracle =
    s"""WITH toks AS (SELECT unnest($toksSql) AS token FROM documents)
       |SELECT token, count(*) AS n
       |FROM toks
       |GROUP BY token
       |HAVING count(*) > 0.005 * (SELECT count(*) FROM toks)
       |ORDER BY n DESC, token""".stripMargin

  // ---- decontaminate -----------------------------------------------

  /** Benchmark decontamination via [[Text.decontaminate]] — the
    * operator takes an ARBITRARY benchmark frame; here `doc_id % 97 ==
    * 0` models the eval suite as its own small table (production
    * shape). Benchmark docs trivially flag themselves (kept: the
    * report shows the full contaminated set).
    */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val benchmark = d.filter(col("doc_id") % 97 === 0).select("text")
    Text.decontaminate(d, benchmark, "doc_id", "text", "text", n = 5)
      .orderBy("doc_id")
  }

  private val decontaminateOracle =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |sh AS (SELECT doc_id,
       |  CASE WHEN len(toks) >= 5 THEN
       |    list_distinct(list_transform(range(1, len(toks) - 3),
       |      i -> array_to_string(toks[i:i+4], ' ')))
       |  ELSE [] END AS shingles
       |FROM t),
       |b AS (SELECT DISTINCT unnest(shingles) AS shingle
       |      FROM sh WHERE doc_id % 97 = 0),
       |e AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
       |hits AS (SELECT DISTINCT e.doc_id FROM e JOIN b USING (shingle))
       |SELECT t.doc_id, (h.doc_id IS NOT NULL) AS contaminated
       |FROM t LEFT JOIN hits h ON t.doc_id = h.doc_id
       |ORDER BY t.doc_id""".stripMargin

  // ---- decontaminate_spans -----------------------------------------

  /** SPAN-level decontamination ([[Text.decontaminateSpans]] — the
    * removal half of [[decontaminate]]): corpus = docs outside the
    * benchmark (`doc_id % 7 != 0` — production keeps corpus and eval
    * suite disjoint), every benchmark-overlapping run of ≥ 8 tokens
    * is cut from the corpus text (shorter shared phrases survive —
    * language, not leakage). At sf0.01 this cuts 9 long planted
    * overlaps (to 93 tokens) and leaves 3 short ones in place.
    */
  def decontaminateSpans(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val benchmark = d.filter(col("doc_id") % 7 === 0).select("text")
    val corpus = d.filter(col("doc_id") % 7 =!= 0)
    Text.decontaminateSpans(corpus, benchmark, "doc_id", "text",
        "text", k = 5, minSpanTokens = 8)
      .orderBy("doc_id")
  }

  private val decontaminateSpansOracle =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |c AS (SELECT doc_id, toks FROM t WHERE doc_id % 7 <> 0),
       |g AS (SELECT doc_id, toks,
       |    unnest(range(1, len(toks) - 3)) AS pos
       |  FROM c WHERE len(toks) >= 5),
       |s AS (SELECT doc_id, pos,
       |    array_to_string(toks[pos:pos+4], ' ') AS sh
       |  FROM g),
       |bg AS (SELECT doc_id, toks,
       |    unnest(range(1, len(toks) - 3)) AS pos
       |  FROM t WHERE doc_id % 7 = 0 AND len(toks) >= 5),
       |b AS (SELECT DISTINCT array_to_string(toks[pos:pos+4], ' ')
       |    AS sh FROM bg),
       |f AS (SELECT s.doc_id, s.pos FROM s JOIN b USING (sh)),
       |br AS (SELECT doc_id, pos,
       |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
       |      ORDER BY pos) <= 5 THEN 0 ELSE 1 END AS brk
       |  FROM f),
       |sp AS (SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id
       |    ORDER BY pos) AS span FROM br),
       |sl AS (SELECT doc_id, span, min(pos) AS st, max(pos) + 4 AS en
       |  FROM sp GROUP BY 1, 2
       |  HAVING max(pos) + 4 - min(pos) + 1 >= 8),
       |sa AS (SELECT doc_id,
       |    list(struct_pack(st := st, en := en) ORDER BY st) AS spans,
       |    count(*) AS nsp
       |  FROM sl GROUP BY 1),
       |fin AS (SELECT c.doc_id, c.toks,
       |    CASE WHEN sa.doc_id IS NULL THEN c.toks
       |      ELSE list_filter(c.toks, (x, i) ->
       |        len(list_filter(sa.spans,
       |          q -> i >= q.st AND i <= q.en)) = 0)
       |    END AS kept,
       |    coalesce(sa.nsp, 0) AS nsp
       |  FROM c LEFT JOIN sa USING (doc_id))
       |SELECT doc_id,
       |  coalesce(array_to_string(kept, ' '), '') AS text,
       |  CAST(nsp AS BIGINT) AS n_spans_removed,
       |  CAST(len(toks) - len(kept) AS BIGINT) AS n_tokens_removed
       |FROM fin
       |ORDER BY doc_id""".stripMargin

  // ---- doc_repetition ----------------------------------------------

  /** Gopher-style repetition signals: top-bigram fraction (most frequent
    * bigram's share of all bigrams) and duplicate-token fraction. The
    * bigram list is built with `zip_with` over the token array and its
    * shifted slice — collection arguments evaluate once per row, so the
    * tokenizer never re-runs per element (the lambda-CSE trap). Two
    * keyed aggregations, no joins.
    */
  def docRepetition(s: SparkSession, dir: String): DataFrame = {
    val toks = Text.tokens(col("text"))
    val base = docs(s, dir).select(col("doc_id"),
      toks.as("toks"),
      size(toks).cast("long").as("n_toks"),
      size(array_distinct(toks)).cast("long").as("n_dtoks"))
    val bigrams = base.select(col("doc_id"), col("n_toks"), col("n_dtoks"),
      explode(filter(
        zip_with(col("toks"), slice(col("toks"), lit(2), size(col("toks"))),
          (a, b) => concat(a, lit(" "), b)),
        x => x.isNotNull)).as("bigram"))
    bigrams
      .groupBy("doc_id", "bigram")
      .agg(count(lit(1)).as("c"), min("n_toks").as("n_toks"),
        min("n_dtoks").as("n_dtoks"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_bigrams"), max("c").as("top_bigram_n"),
        min("n_toks").as("n_toks"), min("n_dtoks").as("n_dtoks"))
      .select(col("doc_id"),
        col("n_bigrams").cast("long").as("n_bigrams"),
        col("top_bigram_n").cast("long").as("top_bigram_n"),
        round(col("top_bigram_n").cast("double") / col("n_bigrams"), 6)
          .as("top_bigram_frac"),
        round(lit(1.0) - col("n_dtoks").cast("double") / col("n_toks"), 6)
          .as("dup_token_frac"))
      .orderBy("doc_id")
  }

  private val docRepetitionOracle =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |bg AS (SELECT doc_id,
       |    CAST(len(toks) AS BIGINT) AS n_toks,
       |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_dtoks,
       |    unnest(list_transform(range(1, len(toks)),
       |      i -> toks[i] || ' ' || toks[i+1])) AS bigram
       |  FROM t),
       |c AS (SELECT doc_id, bigram, count(*) AS c,
       |    min(n_toks) AS n_toks, min(n_dtoks) AS n_dtoks
       |  FROM bg GROUP BY 1, 2)
       |SELECT doc_id,
       |  CAST(sum(c) AS BIGINT) AS n_bigrams,
       |  CAST(max(c) AS BIGINT) AS top_bigram_n,
       |  round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_bigram_frac,
       |  round(1.0 - CAST(min(n_dtoks) AS DOUBLE) / min(n_toks), 6)
       |    AS dup_token_frac
       |FROM c
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  // ---- pack_sequences / pack_stats ---------------------------------

  /** Greedy sequence packing (budget 512 tokens, 8 content-hash shards)
    * — one shuffle on the shard key, then a single sorted streaming
    * pass per shard ([[graft.extra.Packing]]). The oracle replays the
    * greedy fill as a recursive CTE walking each shard in doc order, so
    * a hash match proves the distributed pass is exactly the sequential
    * algorithm.
    */
  def packSequences(s: SparkSession, dir: String): DataFrame =
    graft.extra.Packing.packGreedy(docs(s, dir), "doc_id",
        size(Text.tokens(col("text"))).cast("long"),
        budget = 512L, shards = 8)
      .orderBy("doc_id")

  private def packRecSql: String =
    packRecSqlWith(s"CAST(len($toksSql) AS BIGINT)")

  /** The greedy-fill replay parameterized on the token-count
    * expression — word counts for `pack_sequences`, the exact BPE
    * subword count for `pack_sequences_bpe` (same fill walk either
    * way; the unit is the only difference).
    */
  private def packRecSqlWith(nTokensSql: String): String =
    s"""WITH RECURSIVE t AS (
       |  SELECT doc_id,
       |    CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
       |      AS BIGINT) % 8 AS INTEGER) AS shard,
       |    $nTokensSql AS n_tokens
       |  FROM documents),
       |o AS (SELECT *, row_number()
       |        OVER (PARTITION BY shard ORDER BY doc_id) AS rn FROM t),
       |rec AS (
       |  SELECT doc_id, shard, n_tokens, rn,
       |    CAST(0 AS BIGINT) AS seq_id, CAST(0 AS BIGINT) AS seq_pos,
       |    n_tokens AS fill
       |  FROM o WHERE rn = 1
       |  UNION ALL
       |  SELECT o.doc_id, o.shard, o.n_tokens, o.rn,
       |    CASE WHEN r.fill + o.n_tokens > 512 AND r.fill > 0
       |      THEN r.seq_id + 1 ELSE r.seq_id END,
       |    CASE WHEN r.fill + o.n_tokens > 512 AND r.fill > 0
       |      THEN CAST(0 AS BIGINT) ELSE r.seq_pos + 1 END,
       |    CASE WHEN r.fill + o.n_tokens > 512 AND r.fill > 0
       |      THEN o.n_tokens ELSE r.fill + o.n_tokens END
       |  FROM rec r JOIN o ON o.shard = r.shard AND o.rn = r.rn + 1)""".stripMargin

  private val packSequencesOracle =
    s"""$packRecSql
       |SELECT doc_id, shard, seq_id, seq_pos, n_tokens
       |FROM rec
       |ORDER BY doc_id""".stripMargin

  /** [[packSequences]] with the budget measured in the TOKENIZER's own
    * units — exact BPE subword counts under the fixed merge list
    * instead of whitespace words (the [[chunkDocsBpe]] symmetry: a
    * training sequence budget is N subword tokens). Same one-shuffle
    * greedy fill; the oracle replays the encode chain inside the
    * recursive walk, so the hash gate proves count + fill end to end.
    */
  def packSequencesBpe(s: SparkSession, dir: String): DataFrame =
    // r16: typed-tier subword counts (broadcast merge ranks, per-word
    // memo — bit-identical to the expression chain, spec-pinned)
    // instead of the 64-nested-replace projection: the encode was this
    // query's whole cost (~2 s of the 2.3 s median at sf0.1).
    // r17 (guide §6, VERDICT r16 #2): pre-select (doc_id, text) — the
    // Row-typed encoder is opaque to column pruning, so passing the
    // full docs frame widened ReadSchema to all 5 columns.
    graft.extra.Packing.packGreedy(
        Text.withBpeTokensTyped(docs(s, dir).select("doc_id", "text"),
          "text", bpeMerges),
        "doc_id", col("n_bpe_tokens"), budget = 512L, shards = 8)
      .orderBy("doc_id")

  private val packSequencesBpeOracle = {
    val bpeCount =
      s"""CASE WHEN len($toksSql) = 0 THEN CAST(0 AS BIGINT)
         |    ELSE CAST(len(list_filter(string_split(
         |      trim(${bpeChainSqlOn(toksSql)}), ' '),
         |      x -> x <> '¶')) AS BIGINT) END""".stripMargin
    s"""${packRecSqlWith(bpeCount)}
       |SELECT doc_id, shard, seq_id, seq_pos, n_tokens
       |FROM rec
       |ORDER BY doc_id""".stripMargin
  }

  /** Trainer-ready packed sequences: the [[packSequencesBpe]] greedy
    * fill MATERIALIZED as token-id streams — one row per sequence,
    * ids = byte-order rank in the corpus-derived symbol vocabulary,
    * EOS id 0 after every document and counted against the budget
    * (each doc costs its subword count + 1). The oracle replays
    * encode → vocab → id mapping → greedy fill → ordered
    * concatenation, so the hash gate covers the ARTIFACT a trainer
    * consumes, not just the doc→sequence assignment.
    */
  def packExamplesQ(s: SparkSession, dir: String): DataFrame =
    // r16: typed-tier symbol arrays (bit-identical to the expression
    // encode, spec-pinned) — the nested-replace chain ran TWICE here
    // (vocab job + id projection) and was ~4.5 s of the 5.9 s median.
    // r17 (guide §6, VERDICT r16 #2): pre-select (doc_id, text) so the
    // opaque typed encoder doesn't defeat column pruning at the scan.
    graft.extra.Packing.packExamples(
        Text.withBpeSymbolsTyped(docs(s, dir).select("doc_id", "text"),
          "text", bpeMerges, "__syms"),
        "doc_id", col("__syms"), budget = 512L, shards = 8)
      .orderBy("shard", "seq_id")

  private val packExamplesOracle = {
    // a doc's packing cost is its subword count + 1 (the EOS id)
    val bpeCountPlus1 =
      s"""(CASE WHEN len($toksSql) = 0 THEN CAST(0 AS BIGINT)
         |     ELSE CAST(len(list_filter(string_split(
         |       trim(${bpeChainSqlOn(toksSql)}), ' '),
         |       x -> x <> '¶')) AS BIGINT) END + 1)""".stripMargin
    // the `x <> ''` leg only fires for empty docs, where the split of
    // the empty encode yields a [''] phantom the engine's size guard
    // never produces
    s"""${packRecSqlWith(bpeCountPlus1)},
       |enc AS (SELECT doc_id, list_filter(string_split(
       |    trim(${bpeChainSqlOn(toksSql)}), ' '),
       |    x -> x <> '¶' AND x <> '') AS syms FROM documents),
       |vocab AS (SELECT sym, row_number() OVER (ORDER BY sym) AS vid
       |  FROM (SELECT DISTINCT unnest(syms) AS sym FROM enc)),
       |tok AS (SELECT doc_id, unnest(syms) AS sym,
       |    unnest(range(1, len(syms) + 1)) AS ord FROM enc),
       |docstr AS (SELECT t.doc_id,
       |    string_agg(CAST(v.vid AS VARCHAR), ',' ORDER BY t.ord) AS ids
       |  FROM tok t JOIN vocab v USING (sym) GROUP BY t.doc_id),
       |ds AS (SELECT e.doc_id,
       |    CASE WHEN d.ids IS NULL THEN '0'
       |         ELSE d.ids || ',0' END AS docstr
       |  FROM enc e LEFT JOIN docstr d USING (doc_id))
       |SELECT r.shard, r.seq_id,
       |  count(*) AS n_docs,
       |  CAST(sum(r.n_tokens) AS BIGINT) AS n_tokens,
       |  string_agg(ds.docstr, ',' ORDER BY r.seq_pos) AS token_ids
       |FROM rec r JOIN ds USING (doc_id)
       |GROUP BY r.shard, r.seq_id
       |ORDER BY r.shard, r.seq_id""".stripMargin
  }

  /** Packing utilization: docs and token fill per output sequence. */
  def packStatsQ(s: SparkSession, dir: String): DataFrame =
    graft.extra.Packing.packStats(
        graft.extra.Packing.packGreedy(docs(s, dir), "doc_id",
          size(Text.tokens(col("text"))).cast("long"),
          budget = 512L, shards = 8),
        "n_tokens", budget = 512L)
      .orderBy("shard", "seq_id")

  private val packStatsOracle =
    s"""$packRecSql
       |SELECT shard, seq_id,
       |  count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
       |  round(CAST(least(sum(n_tokens), 512) AS DOUBLE) / 512, 6)
       |    AS fill_ratio
       |FROM rec
       |GROUP BY shard, seq_id
       |ORDER BY shard, seq_id""".stripMargin

  // ---- tfidf_top_terms ---------------------------------------------

  /** Per-document top-3 terms by tf-idf. Shapes for 100 TB: two keyed
    * aggregations (term frequency per (doc, term), then document
    * frequency per term — the second reads the first's already-reduced
    * output, so the corpus is tokenized and shuffled ONCE: the tf frame
    * is PERSISTED, because without it Catalyst plans the df branch as a
    * second full scan + tokenize + aggregation — plan-locked), one
    * equijoin on `term` (AQE broadcasts when the vocabulary is small;
    * sort-merge otherwise — both keyed, never a cross product), and a
    * rank window partitioned by doc (group-limited top-k, no global
    * sort). N is a one-scalar count — metadata-size, not a data
    * collect. Ranking is on the ROUNDED tf-idf with term tie-break, so
    * order is engine-independent for the oracle.
    */
  def tfidfTopTerms(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    // corpus size rides the plan as a broadcast one-row frame (r17):
    // the old d.count() was a separate action + planning round trip;
    // the cross-joined count is the same exact long, cast to double in
    // the same expression, so tfidf doubles are bit-identical
    val nDocs = d.agg(count(lit(1)).as("__ndocs"))
    val tf = d.select(col("doc_id"),
        explode(Text.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .persist()
    // house cache-lifecycle rule (SCALE.md): eagerly materialize the
    // (linear-size) output, then unpersist — nothing stays in the
    // session cache manager past the call
    try {
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val scored = tf.join(df, "term")
        .crossJoin(broadcast(nDocs))
        .withColumn("tfidf",
          round(col("tf") * log(col("__ndocs").cast("double") / col("df")), 6))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
      graft.extra.Dedup.materialize(
        scored.withColumn("term_rank", row_number().over(w))
          .filter(col("term_rank") <= 3)
          .select(col("doc_id"), col("term_rank"), col("term"),
            col("tf").cast("long").as("tf"),
            col("df").cast("long").as("df"), col("tfidf"))
          .orderBy("doc_id", "term_rank"))
    } finally tf.unpersist(blocking = false)
  }

  private val tfidfTopTermsOracle =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |x AS (SELECT doc_id, unnest(toks) AS term FROM t),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM x GROUP BY 1, 2),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(*) AS n FROM documents),
       |sc AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
       |    round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS tfidf
       |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n),
       |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
       |    ORDER BY tfidf DESC, term) AS term_rank FROM sc)
       |SELECT doc_id, term_rank, term, CAST(tf AS BIGINT) AS tf,
       |  CAST(df AS BIGINT) AS df, tfidf
       |FROM r WHERE term_rank <= 3
       |ORDER BY doc_id, term_rank""".stripMargin

  // ---- select_budget -----------------------------------------------

  /** Token-budget corpus selection: take the highest-quality documents
    * until the running token total crosses the budget — the standard
    * "best N tokens" curation cut. The running sum is
    * [[graft.ops.Ranks.withGlobalPrefixSum]] (range shuffle +
    * per-partition offsets), NOT `SUM() OVER (ORDER BY …)` — the
    * single-partition global window is the one shape that cannot
    * survive 100 TB. Order is (rounded quality desc, doc_id), so the
    * cut is deterministic on any engine.
    */
  def selectBudget(s: SparkSession, dir: String): DataFrame = {
    val q = Text.withQuality(docs(s, dir), "text")
      .select(col("doc_id"), col("quality_score"), col("n_tokens"))
    graft.ops.Ranks.withGlobalPrefixSum(q,
        Seq(col("quality_score").desc, col("doc_id")),
        col("n_tokens"), "cum_tokens")
      .filter(col("cum_tokens") <= 10000L)
      .select("doc_id", "n_tokens", "cum_tokens")
      .orderBy("doc_id")
  }

  /** Per-DOMAIN token-budget selection — [[selectBudget]]'s cut
    * applied independently inside every `source`: each domain keeps
    * its own highest-quality docs until ITS running token total
    * crosses the per-domain budget (the FineWeb-style per-source cap
    * a mixture applies so no domain exceeds a token share, at token —
    * not document — granularity). The running sum is
    * [[graft.ops.Ranks.withGroupedPrefixSum]]'s grouped two-pass
    * range shuffle: a `SUM() OVER (PARTITION BY source)` window puts
    * the whole largest domain through one task.
    */
  def selectBudgetByDomain(s: SparkSession, dir: String): DataFrame = {
    val q = Text.withQuality(docs(s, dir), "text")
      .select(col("doc_id"), col("source"), col("quality_score"),
        col("n_tokens"))
    graft.ops.Ranks.withGroupedPrefixSum(q, Seq("source"),
        Seq(col("quality_score").desc, col("doc_id")),
        col("n_tokens"), "cum_tokens")
      .filter(col("cum_tokens") <= 800L)
      .select("doc_id", "source", "n_tokens", "cum_tokens")
      .orderBy("doc_id")
  }

  private val selectBudgetByDomainOracle =
    s"""WITH t AS (SELECT doc_id, source, $toksSql AS toks FROM documents),
       |q AS (SELECT doc_id, source,
       |  CAST(len(toks) AS BIGINT) AS n_tokens,
       |  round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) * 0.5
       |        + least(CAST(${hitsSql("en")} AS DOUBLE) / len(toks) * 5.0, 1.0) * 0.3
       |        + least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.2, 6)
       |    AS quality_score
       |  FROM t),
       |c AS (SELECT doc_id, source, n_tokens,
       |    CAST(sum(n_tokens) OVER (PARTITION BY source
       |      ORDER BY quality_score DESC, doc_id) AS BIGINT) AS cum_tokens
       |  FROM q)
       |SELECT doc_id, source, n_tokens, cum_tokens
       |FROM c WHERE cum_tokens <= 800
       |ORDER BY doc_id""".stripMargin

  private val selectBudgetOracle =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |q AS (SELECT doc_id,
       |  CAST(len(toks) AS BIGINT) AS n_tokens,
       |  round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) * 0.5
       |        + least(CAST(${hitsSql("en")} AS DOUBLE) / len(toks) * 5.0, 1.0) * 0.3
       |        + least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.2, 6)
       |    AS quality_score
       |  FROM t),
       |c AS (SELECT doc_id, n_tokens,
       |    CAST(sum(n_tokens) OVER (ORDER BY quality_score DESC, doc_id)
       |      AS BIGINT) AS cum_tokens
       |  FROM q)
       |SELECT doc_id, n_tokens, cum_tokens
       |FROM c WHERE cum_tokens <= 10000
       |ORDER BY doc_id""".stripMargin

  // ---- dsir_weights ------------------------------------------------

  /** DSIR importance resampling weights (Xie et al. 2023) toward the
    * `src0` domain: every doc scored by its log importance ratio under
    * add-one-smoothed unigram LMs of (target = src0 docs) vs (raw =
    * whole corpus), top-50 most target-like docs. See
    * [[graft.extra.Text.dsirWeights]] — one token pass trains BOTH
    * models; ties break by doc_id so the cut is total.
    */
  def dsirWeightsQ(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Text.dsirWeights(d, "doc_id", "text", col("source") === "src0")
      .join(d.select(col("doc_id"), col("source")), Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("log_weight"))
      .orderBy(col("log_weight").desc, col("doc_id"))
      .limit(50)
  }

  private val dsirWeightsOracle =
    s"""WITH t AS (SELECT doc_id, source, $toksSql AS toks FROM documents),
       |x AS (SELECT doc_id, (source = 'src0') AS tgt, unnest(toks) AS token
       |  FROM t),
       |v AS (SELECT token, count(*) AS c_r,
       |    CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS c_t
       |  FROM x GROUP BY 1),
       |n AS (SELECT CAST(sum(c_r) AS BIGINT) AS n_r,
       |    CAST(sum(c_t) AS BIGINT) AS n_t, count(*) AS v FROM v),
       |tab AS (SELECT token, CAST(round(
       |    ln((CAST(c_t AS DOUBLE) + 1.0) /
       |       (CAST(n_t AS DOUBLE) + CAST(v AS DOUBLE))) -
       |    ln((CAST(c_r AS DOUBLE) + 1.0) /
       |       (CAST(n_r AS DOUBLE) + CAST(v AS DOUBLE))), 6)
       |    AS DECIMAL(18,6)) AS delta
       |  FROM v CROSS JOIN n),
       |s AS (SELECT x.doc_id, count(*) AS n_tokens,
       |    round(CAST(sum(tab.delta) AS DOUBLE), 6) AS log_weight
       |  FROM x JOIN tab ON x.token = tab.token GROUP BY 1)
       |SELECT s.doc_id, d.source, s.n_tokens, s.log_weight
       |FROM s JOIN documents d ON s.doc_id = d.doc_id
       |ORDER BY log_weight DESC, s.doc_id LIMIT 50""".stripMargin

  // ---- unigram_logprob ---------------------------------------------

  /** Self-trained unigram LM cross-entropy per doc (mean −ln p(token),
    * nats) — the perplexity-proxy quality signal. Surprisal is rounded
    * per DISTINCT token and summed as DECIMAL(18,6), so the mean is
    * exact and engine/partitioning-independent.
    */
  def unigramLogprob(s: SparkSession, dir: String): DataFrame =
    Text.unigramScore(docs(s, dir), "doc_id", "text")
      .orderBy("doc_id")

  private val unigramLogprobOracle =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |x AS (SELECT doc_id, unnest(toks) AS token FROM t),
       |v AS (SELECT token, count(*) AS c FROM x GROUP BY 1),
       |n AS (SELECT sum(c) AS n FROM v),
       |tab AS (SELECT token,
       |    CAST(round(-ln(CAST(c AS DOUBLE) / n), 6) AS DECIMAL(18,6))
       |      AS surprisal
       |  FROM v CROSS JOIN n)
       |SELECT x.doc_id, count(*) AS n_tokens,
       |  round(CAST(sum(tab.surprisal) AS DOUBLE) / count(*), 6)
       |    AS cross_entropy
       |FROM x JOIN tab ON x.token = tab.token
       |GROUP BY x.doc_id
       |ORDER BY x.doc_id""".stripMargin

  // ---- bigram_logprob ----------------------------------------------

  /** Self-trained bigram LM cross-entropy per doc (add-one smoothing
    * over the corpus vocabulary) — catches scrambled/repetitive text
    * unigram stats miss. See [[graft.extra.Text.bigramScore]]; docs
    * with < 2 tokens have no bigrams and drop (documented contract).
    */
  def bigramLogprob(s: SparkSession, dir: String): DataFrame =
    Text.bigramScore(docs(s, dir), "doc_id", "text")
      .orderBy("doc_id")

  private val bigramLogprobOracle =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |bg AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2 THEN
       |    list_transform(range(1, len(toks)),
       |      i -> toks[i] || ' ' || toks[i+1])
       |  ELSE [] END) AS bigram FROM t),
       |bc AS (SELECT bigram, count(*) AS c FROM bg GROUP BY 1),
       |ctx AS (SELECT split_part(bigram, ' ', 1) AS w1, sum(c) AS ctx
       |  FROM bc GROUP BY 1),
       |v AS (SELECT count(DISTINCT token) AS v FROM
       |  (SELECT unnest(toks) AS token FROM t)),
       |tab AS (SELECT bigram,
       |    CAST(round(-ln((CAST(c AS DOUBLE) + 1.0) /
       |      (CAST(ctx AS DOUBLE) + CAST(v AS DOUBLE))), 6)
       |      AS DECIMAL(18,6)) AS surprisal
       |  FROM bc JOIN ctx ON split_part(bc.bigram, ' ', 1) = ctx.w1
       |  CROSS JOIN v)
       |SELECT bg.doc_id, count(*) AS n_bigrams,
       |  round(CAST(sum(tab.surprisal) AS DOUBLE) / count(*), 6)
       |    AS cross_entropy
       |FROM bg JOIN tab ON bg.bigram = tab.bigram
       |GROUP BY bg.doc_id
       |ORDER BY bg.doc_id""".stripMargin

  // ---- chunk_docs_bpe --------------------------------------------------

  /** 32-SUBWORD chunking under the fixed merge list — the training
    * context window measured in the tokenizer's own units
    * ([[graft.extra.Text.chunkBpeTokens]]).
    */
  def chunkDocsBpe(s: SparkSession, dir: String): DataFrame =
    Text.chunkBpeTokens(docs(s, dir), "doc_id", "text", bpeMerges,
        chunkSize = 32)
      .orderBy("doc_id", "chunk_id")

  private val chunkDocsBpeOracle =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |m AS (SELECT doc_id, CASE WHEN len(toks) = 0
       |    THEN CAST([] AS VARCHAR[])
       |    ELSE list_filter(string_split(trim($bpeChainSql), ' '),
       |      x -> x <> '¶') END AS subs FROM t),
       |i AS (SELECT doc_id, subs,
       |    unnest(range(0, CAST(ceil(len(subs) / 32.0) AS BIGINT))) AS i
       |  FROM m WHERE len(subs) > 0)
       |SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
       |  array_to_string(subs[i*32+1 : i*32+32], ' ') AS chunk_text,
       |  CAST(least(32, len(subs) - i*32) AS BIGINT) AS chunk_n_tokens
       |FROM i
       |ORDER BY doc_id, chunk_id""".stripMargin

  // ---- kn_trigram_logprob --------------------------------------------

  /** Interpolated Kneser–Ney trigram cross-entropy per doc (fixed
    * discount 0.75, continuation-count lower orders) — the CCNet/KenLM
    * quality-filter signal. See [[graft.extra.Text.kneserNeyScore]];
    * docs with < 3 tokens have no trigrams and drop.
    */
  def knTrigramLogprob(s: SparkSession, dir: String): DataFrame =
    Text.kneserNeyScore(docs(s, dir), "doc_id", "text")
      .orderBy("doc_id")

  private val knTrigramLogprobOracle =
    // the SAME IEEE expression tree as the engine (parenthesization
    // matters: (D·nf)·P, additions before the division) over the same
    // exact integer statistics — 0.75 is dyadic, so every term up to
    // the ln is exact or identically rounded in both engines.
    // N1+(••) rides `uni` as a window total (Σ_w3 pc = |cont| — an
    // exact integer either way): a separate 1-row `tot` CTE hung
    // DuckDB both as a CROSS JOIN (join-reorder catastrophe) and as a
    // scalar subquery (the dependent CTE chain re-inlined per row)
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |tg AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 3 THEN
       |    list_transform(range(1, len(toks) - 1),
       |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
       |  ELSE [] END) AS trigram FROM t),
       |c3 AS (SELECT trigram, count(*) AS c FROM tg GROUP BY 1),
       |s3 AS (SELECT trigram, c,
       |    split_part(trigram, ' ', 1) AS w1,
       |    split_part(trigram, ' ', 2) AS w2,
       |    split_part(trigram, ' ', 3) AS w3 FROM c3),
       |ctx AS (SELECT w1, w2, sum(c) AS ctx, count(*) AS nf1
       |  FROM s3 GROUP BY 1, 2),
       |cont AS (SELECT w2, w3, count(*) AS cc FROM s3 GROUP BY 1, 2),
       |mid AS (SELECT w2, sum(cc) AS midtot, count(*) AS nf2
       |  FROM cont GROUP BY 1),
       |uni AS (SELECT w3, count(*) AS pc,
       |    sum(count(*)) OVER () AS bt FROM cont GROUP BY 1),
       |tab AS (SELECT s3.trigram,
       |    CAST(round(-ln(
       |      (greatest(CAST(s3.c AS DOUBLE) - 0.75, 0.0) +
       |       0.75 * CAST(ctx.nf1 AS DOUBLE) *
       |       ((greatest(CAST(cont.cc AS DOUBLE) - 0.75, 0.0) +
       |         0.75 * CAST(mid.nf2 AS DOUBLE) *
       |         (CAST(uni.pc AS DOUBLE) / CAST(uni.bt AS DOUBLE))) /
       |        CAST(mid.midtot AS DOUBLE))) /
       |      CAST(ctx.ctx AS DOUBLE)), 6) AS DECIMAL(18,6)) AS surprisal
       |  FROM s3
       |  JOIN ctx ON s3.w1 = ctx.w1 AND s3.w2 = ctx.w2
       |  JOIN cont ON s3.w2 = cont.w2 AND s3.w3 = cont.w3
       |  JOIN mid ON s3.w2 = mid.w2
       |  JOIN uni ON s3.w3 = uni.w3)
       |SELECT tg.doc_id, count(*) AS n_trigrams,
       |  round(CAST(sum(tab.surprisal) AS DOUBLE) / count(*), 6)
       |    AS cross_entropy
       |FROM tg JOIN tab ON tg.trigram = tab.trigram
       |GROUP BY tg.doc_id
       |ORDER BY tg.doc_id""".stripMargin

  // ---- ccnet_buckets -------------------------------------------------

  /** CCNet perplexity bucketing (Wenzek et al. 2020 §4.4): one KN
    * trigram LM per LANGUAGE trained in a single corpus pass
    * ([[graft.extra.Text.kneserNeyScore]] `byCol`), then per-language
    * head/middle/tail terciles of cross-entropy — the gate CCNet
    * filters Common Crawl with.
    */
  def ccnetBuckets(s: SparkSession, dir: String): DataFrame =
    Text.perplexityBuckets(docs(s, dir), "doc_id", "text", "lang")
      .orderBy("doc_id")

  private val ccnetBucketsOracle =
    // the per-language KN replay: every CTE of the kn_trigram_logprob
    // oracle gains the lang key (statistics never mix across
    // languages), then ANSI NTILE over (cross_entropy, doc_id)
    s"""WITH t AS (SELECT doc_id, lang, $toksSql AS toks FROM documents),
       |tg AS (SELECT doc_id, lang, unnest(CASE WHEN len(toks) >= 3 THEN
       |    list_transform(range(1, len(toks) - 1),
       |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
       |  ELSE [] END) AS trigram FROM t),
       |c3 AS (SELECT lang, trigram, count(*) AS c FROM tg GROUP BY 1, 2),
       |s3 AS (SELECT lang, trigram, c,
       |    split_part(trigram, ' ', 1) AS w1,
       |    split_part(trigram, ' ', 2) AS w2,
       |    split_part(trigram, ' ', 3) AS w3 FROM c3),
       |ctx AS (SELECT lang, w1, w2, sum(c) AS ctx, count(*) AS nf1
       |  FROM s3 GROUP BY 1, 2, 3),
       |cont AS (SELECT lang, w2, w3, count(*) AS cc FROM s3
       |  GROUP BY 1, 2, 3),
       |mid AS (SELECT lang, w2, sum(cc) AS midtot, count(*) AS nf2
       |  FROM cont GROUP BY 1, 2),
       |uni AS (SELECT lang, w3, count(*) AS pc,
       |    sum(count(*)) OVER (PARTITION BY lang) AS bt
       |  FROM cont GROUP BY 1, 2),
       |tab AS (SELECT s3.lang, s3.trigram,
       |    CAST(round(-ln(
       |      (greatest(CAST(s3.c AS DOUBLE) - 0.75, 0.0) +
       |       0.75 * CAST(ctx.nf1 AS DOUBLE) *
       |       ((greatest(CAST(cont.cc AS DOUBLE) - 0.75, 0.0) +
       |         0.75 * CAST(mid.nf2 AS DOUBLE) *
       |         (CAST(uni.pc AS DOUBLE) / CAST(uni.bt AS DOUBLE))) /
       |        CAST(mid.midtot AS DOUBLE))) /
       |      CAST(ctx.ctx AS DOUBLE)), 6) AS DECIMAL(18,6)) AS surprisal
       |  FROM s3
       |  JOIN ctx ON s3.lang = ctx.lang AND s3.w1 = ctx.w1
       |    AND s3.w2 = ctx.w2
       |  JOIN cont ON s3.lang = cont.lang AND s3.w2 = cont.w2
       |    AND s3.w3 = cont.w3
       |  JOIN mid ON s3.lang = mid.lang AND s3.w2 = mid.w2
       |  JOIN uni ON s3.lang = uni.lang AND s3.w3 = uni.w3),
       |sc AS (SELECT tg.doc_id, tg.lang, count(*) AS n_trigrams,
       |    round(CAST(sum(tab.surprisal) AS DOUBLE) / count(*), 6)
       |      AS cross_entropy
       |  FROM tg JOIN tab ON tg.lang = tab.lang
       |    AND tg.trigram = tab.trigram
       |  GROUP BY 1, 2),
       |b AS (SELECT doc_id, lang,
       |    CAST(n_trigrams AS BIGINT) AS n_trigrams, cross_entropy,
       |    CAST(ntile(3) OVER (PARTITION BY lang
       |      ORDER BY cross_entropy, doc_id) AS BIGINT) AS bucket
       |  FROM sc)
       |SELECT doc_id, lang, n_trigrams, cross_entropy, bucket,
       |  CASE WHEN bucket = 1 THEN 'head' WHEN bucket = 3 THEN 'tail'
       |    ELSE 'middle' END AS bucket_label
       |FROM b
       |ORDER BY doc_id""".stripMargin

  // ---- kn_perplexity_serve / kn_perplexity_indexed --------------------

  /** The SERVE split of the KN LM ([[graft.extra.KnLm]]): the model
    * fits on 90% of the corpus (doc_id % 10 != 0), the held-out 10%
    * scores against it through the full OOV backoff cascade — held-out
    * docs genuinely contain trigrams, contexts, and words the model
    * never saw, so every cascade branch is live inside the hash gate.
    */
  def knPerplexityServe(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val m = graft.extra.KnLm.fit(d.where(col("doc_id") % 10 =!= 0), "text")
    graft.extra.KnLm.score(
        d.where(col("doc_id") % 10 === 0), "doc_id", "text", m)
      .orderBy("doc_id")
  }

  /** [[knPerplexityServe]] through the PERSISTED registry model: the
    * 90% split trains + saves once per corpus content
    * ([[IndexedCorpus.knModelDir]]), every call loads the committed
    * version (memoized) and pays only the scoring joins — SAME oracle.
    */
  def knPerplexityIndexed(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val m = graft.extra.KnLm.load(s,
      IndexedCorpus.knModelDir(d.where(col("doc_id") % 10 =!= 0), "text"))
    graft.extra.KnLm.score(
        d.where(col("doc_id") % 10 === 0), "doc_id", "text", m)
      .orderBy("doc_id")
  }

  private val knServeOracle = {
    val unnestTg = """unnest(CASE WHEN len(toks) >= 3 THEN
      |    list_transform(range(1, len(toks) - 1),
      |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      |  ELSE [] END)""".stripMargin
    // P(w3|w2), written once here and spliced into both CASE branches —
    // mirroring the Spark tree, where `pBi` appears in both when()
    // branches of pTri
    val pUni = """(CASE WHEN uni.pc IS NOT NULL
      |    THEN CAST(uni.pc AS DOUBLE) / CAST(bts.bt AS DOUBLE)
      |    ELSE 1.0 / CAST(bts.bt AS DOUBLE) END)""".stripMargin
    val pBi = s"""(CASE WHEN mid.midtot IS NOT NULL THEN
      |    (greatest(CAST(coalesce(cont.cc, 0) AS DOUBLE) - 0.75, 0.0) +
      |     0.75 * CAST(mid.nf2 AS DOUBLE) * $pUni) /
      |    CAST(mid.midtot AS DOUBLE)
      |  ELSE $pUni END)""".stripMargin
    s"""WITH t AS MATERIALIZED (SELECT doc_id, $toksSql AS toks
       |  FROM documents WHERE doc_id % 10 <> 0),
       |tg AS MATERIALIZED (SELECT doc_id, $unnestTg AS trigram FROM t),
       |c3 AS (SELECT trigram, count(*) AS c FROM tg GROUP BY 1),
       |s3 AS MATERIALIZED (SELECT trigram, c,
       |    split_part(trigram, ' ', 1) AS w1,
       |    split_part(trigram, ' ', 2) AS w2,
       |    split_part(trigram, ' ', 3) AS w3 FROM c3),
       |ctx AS (SELECT w1, w2, sum(c) AS ctx, count(*) AS nf1
       |  FROM s3 GROUP BY 1, 2),
       |cont AS MATERIALIZED (SELECT w2, w3, count(*) AS cc FROM s3
       |  GROUP BY 1, 2),
       |mid AS (SELECT w2, sum(cc) AS midtot, count(*) AS nf2
       |  FROM cont GROUP BY 1),
       |uni AS MATERIALIZED (SELECT w3, count(*) AS pc,
       |    sum(count(*)) OVER () AS bt FROM cont GROUP BY 1),
       |bts AS MATERIALIZED (SELECT max(bt) AS bt FROM uni),
       |sd AS (SELECT doc_id, $toksSql AS toks FROM documents
       |  WHERE doc_id % 10 = 0),
       |stg AS MATERIALIZED (SELECT doc_id, $unnestTg AS trigram FROM sd),
       |sps AS MATERIALIZED (SELECT doc_id, trigram,
       |    split_part(trigram, ' ', 1) AS w1,
       |    split_part(trigram, ' ', 2) AS w2,
       |    split_part(trigram, ' ', 3) AS w3 FROM stg),
       |j AS (SELECT sps.doc_id,
       |    CAST(round(-ln(
       |      CASE WHEN ctx.ctx IS NOT NULL THEN
       |        (greatest(CAST(coalesce(s3.c, 0) AS DOUBLE) - 0.75, 0.0) +
       |         0.75 * CAST(ctx.nf1 AS DOUBLE) * $pBi) /
       |        CAST(ctx.ctx AS DOUBLE)
       |      ELSE $pBi END), 6) AS DECIMAL(18,6)) AS surprisal
       |  FROM sps
       |  LEFT JOIN s3 ON sps.trigram = s3.trigram
       |  LEFT JOIN ctx ON sps.w1 = ctx.w1 AND sps.w2 = ctx.w2
       |  LEFT JOIN cont ON sps.w2 = cont.w2 AND sps.w3 = cont.w3
       |  LEFT JOIN mid ON sps.w2 = mid.w2
       |  LEFT JOIN uni ON sps.w3 = uni.w3
       |  CROSS JOIN bts)
       |SELECT doc_id, count(*) AS n_trigrams,
       |  round(CAST(sum(surprisal) AS DOUBLE) / count(*), 6)
       |    AS cross_entropy
       |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // ---- vocab_coverage ----------------------------------------------

  /** Fraction of each doc's tokens inside the corpus top-16 vocabulary
    * (count desc, token asc tie-break). Integer-only counting — the
    * only double is the final rounded ratio.
    */
  def vocabCoverageQ(s: SparkSession, dir: String): DataFrame =
    Text.vocabCoverage(docs(s, dir), "doc_id", "text", topK = 16)
      .orderBy("doc_id")

  private val vocabCoverageOracle =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |x AS (SELECT doc_id, unnest(toks) AS token FROM t),
       |top AS (SELECT token FROM x GROUP BY token
       |        ORDER BY count(*) DESC, token LIMIT 16)
       |SELECT x.doc_id, count(*) AS n_tokens,
       |  CAST(sum(CASE WHEN top.token IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS in_vocab,
       |  round(CAST(sum(CASE WHEN top.token IS NOT NULL THEN 1 ELSE 0 END)
       |      AS DOUBLE) / count(*), 6) AS vocab_coverage
       |FROM x LEFT JOIN top ON x.token = top.token
       |GROUP BY x.doc_id
       |ORDER BY x.doc_id""".stripMargin

  // ---- chunk_docs / chunk_stats ------------------------------------

  /** 32-token chunking: shuffle-free projection + generator; each doc
    * yields ceil(n/32) ordered chunk rows.
    */
  def chunkDocs(s: SparkSession, dir: String): DataFrame =
    Text.chunkTokens(docs(s, dir), "doc_id", "text", chunkSize = 32)
      .orderBy("doc_id", "chunk_id")

  private val chunkCte =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |i AS (SELECT doc_id, toks,
       |    unnest(range(0, CAST(ceil(len(toks) / 32.0) AS BIGINT))) AS i
       |  FROM t WHERE len(toks) > 0),
       |c AS (SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
       |    array_to_string(toks[i*32+1 : i*32+32], ' ') AS chunk_text,
       |    least(32, len(toks) - i*32) AS chunk_n_tokens
       |  FROM i)""".stripMargin

  private val chunkDocsOracle =
    s"""$chunkCte
       |SELECT doc_id, chunk_id, chunk_text,
       |  CAST(chunk_n_tokens AS BIGINT) AS chunk_n_tokens
       |FROM c
       |ORDER BY doc_id, chunk_id""".stripMargin

  /** One-row chunking utilization summary over the same 32-token
    * chunking (docs, chunks, full vs tail chunks, mean fill).
    */
  def chunkStats(s: SparkSession, dir: String): DataFrame = {
    val c = Text.chunkTokens(docs(s, dir), "doc_id", "text", chunkSize = 32)
    c.agg(
      countDistinct(col("doc_id")).as("n_docs"),
      count(lit(1)).as("n_chunks"),
      sum(col("chunk_n_tokens")).as("total_tokens"),
      sum(when(col("chunk_n_tokens") === 32, 1L).otherwise(0L))
        .as("full_chunks"),
      round(sum(col("chunk_n_tokens")).cast("double") /
        (count(lit(1)) * 32), 6).as("fill_ratio"))
  }

  private val chunkStatsOracle =
    s"""$chunkCte
       |SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |  count(*) AS n_chunks,
       |  CAST(sum(chunk_n_tokens) AS BIGINT) AS total_tokens,
       |  CAST(sum(CASE WHEN chunk_n_tokens = 32 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS full_chunks,
       |  round(CAST(sum(chunk_n_tokens) AS DOUBLE) / (count(*) * 32), 6)
       |    AS fill_ratio
       |FROM c""".stripMargin

  // ---- nb_lang_id / quality_classifier ------------------------------

  /** Shared DuckDB replay of the multinomial-NB train→score chain
    * ([[graft.extra.Classifier]]): seed labels from `labelExpr`
    * (rows with NULL labels score but don't train), add-one-smoothed
    * per-(label, token) log-probs rounded to 6 decimals as
    * DECIMAL(18,6) (the unigram-LM determinism discipline — exact,
    * order-independent sums), per-doc evidence over distinct-token
    * counts restricted to the training vocabulary, priors-only rows for
    * (doc, class) pairs with no in-vocab evidence.
    */
  private def nbSqlCte(labelExpr: String,
      innerCols: String = "doc_id, text"): String =
    s"""WITH t AS (SELECT doc_id, $labelExpr AS label, toks FROM
       |    (SELECT $innerCols, $toksSql AS toks FROM documents)),
       |x AS (SELECT label, unnest(toks) AS token FROM t
       |      WHERE label IS NOT NULL),
       |tc AS (SELECT label, token, count(*) AS c FROM x GROUP BY 1, 2),
       |ct AS (SELECT label, sum(c) AS tot FROM tc GROUP BY 1),
       |v AS (SELECT count(DISTINCT token) AS v FROM x),
       |dc AS (SELECT label, count(*) AS n_docs FROM t
       |       WHERE label IS NOT NULL GROUP BY 1),
       |nn AS (SELECT count(*) AS n FROM t WHERE label IS NOT NULL),
       |cs AS (SELECT dc.label,
       |    CAST(round(ln(CAST(dc.n_docs AS DOUBLE) / nn.n), 6)
       |      AS DECIMAL(18,6)) AS log_prior,
       |    CAST(CASE WHEN coalesce(ct.tot, 0) + v.v = 0 THEN 0.0
       |      ELSE round(ln(1.0 / (coalesce(ct.tot, 0) + v.v)), 6) END
       |      AS DECIMAL(18,6)) AS default_lp
       |  FROM dc LEFT JOIN ct USING (label) CROSS JOIN nn CROSS JOIN v),
       |lp AS (SELECT tc.label, tc.token,
       |    CAST(round(ln((CAST(tc.c AS DOUBLE) + 1.0) / (ct.tot + v.v)),
       |      6) AS DECIMAL(18,6)) AS lp
       |  FROM tc JOIN ct USING (label) CROSS JOIN v),
       |dt AS (SELECT doc_id, token, count(*) AS cnt
       |  FROM (SELECT doc_id, unnest(toks) AS token FROM t)
       |  GROUP BY 1, 2),
       |iv AS (SELECT * FROM dt
       |  WHERE token IN (SELECT DISTINCT token FROM lp)),
       |ev AS (SELECT iv.doc_id, cs.label,
       |    sum(coalesce(lp.lp, cs.default_lp) * iv.cnt) AS evidence,
       |    sum(iv.cnt) AS n_scored
       |  FROM iv CROSS JOIN cs
       |  LEFT JOIN lp ON lp.label = cs.label AND lp.token = iv.token
       |  GROUP BY 1, 2),
       |sc AS (SELECT d.doc_id, cs.label,
       |    cs.log_prior + coalesce(ev.evidence, 0) AS score
       |  FROM (SELECT DISTINCT doc_id FROM t) d CROSS JOIN cs
       |  LEFT JOIN ev ON ev.doc_id = d.doc_id AND ev.label = cs.label)"""
      .stripMargin

  /** Language identification as a TRAINED classifier: multinomial NB
    * fitted on the corpus's own `lang` labels, every doc re-scored and
    * argmax-classified — the fastText-langid shape, upgrading the
    * stopword-heuristic `lang_id`. Train + score + predict are all
    * counting + exact decimal sums, so the ENTIRE chain (training
    * included) is hash-matched against the oracle.
    */
  def nbLangId(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val model = graft.extra.Classifier.trainNaiveBayes(d, "lang", "text")
    graft.extra.Classifier.predictNaiveBayes(d, "doc_id", "text", model)
      .join(d.select("doc_id", "lang"), Seq("doc_id"))
      .select("doc_id", "lang", "predicted", "score")
      .orderBy("doc_id")
  }

  private val nbLangIdOracle =
    s"""${nbSqlCte("lang", innerCols = "doc_id, text, lang")}
       |SELECT p.doc_id, d.lang, p.label AS predicted,
       |  round(CAST(p.score AS DOUBLE), 6) AS score
       |FROM sc p JOIN documents d ON p.doc_id = d.doc_id
       |QUALIFY row_number() OVER (PARTITION BY p.doc_id
       |  ORDER BY p.score DESC, p.label) = 1
       |ORDER BY p.doc_id""".stripMargin

  /** The PERSISTED-MODEL serving form of [[nbLangId]] (the
    * `bm25_indexed` split applied to the classifier): train + save once
    * per corpus content ([[IndexedCorpus.nbModelDir]]), every call
    * loads the committed model and classifies via the typed projection
    * tier ([[graft.extra.Classifier.classifyTyped]] — broadcast
    * micros-table mapPartitions, no explode/aggregation). SAME oracle
    * as `nb_lang_id`: the typed tier is bit-identical to the batch
    * argmax by construction (micros sums ARE the decimal sums).
    */
  def nbLangIdIndexed(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val model = graft.extra.Classifier.load(s,
      IndexedCorpus.nbModelDir(d, "lang", "text"))
    graft.extra.Classifier
      .classifyTyped(d.select("doc_id", "lang", "text"), "text", model)
      .select("doc_id", "lang", "predicted", "score")
      .orderBy("doc_id")
  }

  /** Classifier-based quality filtering — the CCNet/GPT-3 curation
    * bootstrap: seed binary labels from the [[Text.withQuality]]
    * heuristic (hi = round-6 composite score ≥ 0.45, the corpus
    * median), train NB on the seeds, keep docs whose EXACT decimal
    * log-odds favor `hi`. Output: per-doc seed label, round-6 class
    * scores and log-odds, and the keep verdict (log_odds > 0 on the
    * exact decimals — ties drop).
    */
  def qualityClassifier(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val seeded = Text.withQuality(d, "text")
      .withColumn("label",
        when(col("quality_score") >= 0.45, "hi").otherwise("lo"))
    val model = graft.extra.Classifier.trainNaiveBayes(seeded, "label", "text")
    val scores = graft.extra.Classifier
      .scoreNaiveBayes(d, "doc_id", "text", model)
    scores.groupBy("doc_id")
      .agg(
        max(when(col("label") === "hi", col("score"))).as("hi_d"),
        max(when(col("label") === "lo", col("score"))).as("lo_d"))
      .join(seeded.select(col("doc_id"), col("label").as("seed_label")),
        Seq("doc_id"))
      .select(col("doc_id"), col("seed_label"),
        round(col("hi_d").cast("double"), 6).as("score_hi"),
        round(col("lo_d").cast("double"), 6).as("score_lo"),
        round((col("hi_d") - col("lo_d")).cast("double"), 6).as("log_odds"),
        (col("hi_d") - col("lo_d") > 0).as("kept"))
      .orderBy("doc_id")
  }

  private val qualityLabelSql =
    """(CASE WHEN round(CAST(len(list_distinct(toks)) AS DOUBLE)
      |      / len(toks) * 0.5
      |    + least(CAST(len(list_filter(toks, t -> list_contains(STOP, t)))
      |      AS DOUBLE) / len(toks) * 5.0, 1.0) * 0.3
      |    + least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.2, 6) >= 0.45
      |  THEN 'hi' ELSE 'lo' END)""".stripMargin

  private val qualityClassifierOracle = {
    val stop = Text.stopwords("en").map(w => s"'$w'")
      .mkString("[", ", ", "]")
    s"""${nbSqlCte(qualityLabelSql.replace("STOP", stop))}
       |SELECT p.doc_id, t.label AS seed_label,
       |  round(CAST(max(CASE WHEN p.label = 'hi' THEN p.score END)
       |    AS DOUBLE), 6) AS score_hi,
       |  round(CAST(max(CASE WHEN p.label = 'lo' THEN p.score END)
       |    AS DOUBLE), 6) AS score_lo,
       |  round(CAST(max(CASE WHEN p.label = 'hi' THEN p.score END)
       |    - max(CASE WHEN p.label = 'lo' THEN p.score END)
       |    AS DOUBLE), 6) AS log_odds,
       |  (max(CASE WHEN p.label = 'hi' THEN p.score END)
       |    - max(CASE WHEN p.label = 'lo' THEN p.score END)) > 0 AS kept
       |FROM sc p JOIN t ON p.doc_id = t.doc_id
       |GROUP BY p.doc_id, t.label
       |ORDER BY p.doc_id""".stripMargin
  }

  // ---- pii_redact ---------------------------------------------------

  /** PII redaction over the events props payload. The synthetic props
    * only carry digit runs, so the query uses a digit-run rule (the
    * operator's default email/IP/SSN/phone rules are exercised on
    * planted fixtures in TextOpsSpec); the POINT here is engine parity
    * of the sequenced regexp_replace + count pipeline.
    */
  def piiRedact(s: SparkSession, dir: String): DataFrame =
    Text.withPiiRedaction(
      events(s, dir).select("event_id", "props"), "props",
      rules = Seq(("[0-9]+", "<NUM>")))
      .orderBy("event_id")

  private val piiRedactOracle =
    """SELECT event_id, props,
      |  regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS redacted,
      |  CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS n_pii
      |FROM events ORDER BY event_id""".stripMargin

  // ---- dup_ngrams ---------------------------------------------------

  /** Duplicated-3-gram coverage per document (Lee et al. 2022 signal at
    * shingle granularity — see [[Text.dupNgramCoverage]]).
    */
  def dupNgrams(s: SparkSession, dir: String): DataFrame =
    Text.dupNgramCoverage(docs(s, dir), "doc_id", "text", n = 3)
      .orderBy("doc_id")

  private val dupNgramsOracle =
    """WITH t AS (SELECT doc_id,
      |  list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      |  FROM documents),
      |s AS (SELECT doc_id,
      |  unnest(list_distinct(CASE WHEN len(toks) >= 3 THEN
      |    list_transform(range(1, len(toks) - 1),
      |      i -> array_to_string(toks[i:i+2], ' '))
      |    ELSE [] END)) AS sh
      |  FROM t),
      |dup AS (SELECT sh FROM s GROUP BY sh HAVING count(*) >= 2),
      |p AS (SELECT s.doc_id, count(*) AS n_shingles,
      |  CAST(sum(CASE WHEN dup.sh IS NOT NULL THEN 1 ELSE 0 END)
      |       AS BIGINT) AS n_dup_shingles
      |  FROM s LEFT JOIN dup ON s.sh = dup.sh
      |  GROUP BY s.doc_id)
      |SELECT d.doc_id,
      |  coalesce(p.n_shingles, 0) AS n_shingles,
      |  coalesce(p.n_dup_shingles, 0) AS n_dup_shingles,
      |  round(CAST(p.n_dup_shingles AS DOUBLE) / p.n_shingles, 6)
      |    AS dup_fraction
      |FROM documents d LEFT JOIN p ON d.doc_id = p.doc_id
      |ORDER BY d.doc_id""".stripMargin

  // ---- dup_spans ----------------------------------------------------

  /** Maximal duplicated-substring SPANS per doc at 5-gram resolution
    * ([[graft.extra.Dedup.exactSubstrSpans]] — the span-level Lee et
    * al. ExactSubstr form; dup_ngrams above is only the coverage
    * fraction). Registered with string gram keys so the oracle can
    * reproduce the grouping; `hashed = true` is the 8-byte-key
    * production form, spec-pinned equivalent in DedupSpec.
    */
  def dupSpans(s: SparkSession, dir: String): DataFrame =
    graft.extra.Dedup.exactSubstrSpans(docs(s, dir), "doc_id", "text",
        k = 5)
      .orderBy("doc_id")

  private val dupSpansOracle =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |g AS (SELECT doc_id, toks,
       |    unnest(range(1, len(toks) - 3)) AS pos
       |  FROM t WHERE len(toks) >= 5),
       |s AS (SELECT doc_id, pos,
       |    array_to_string(toks[pos:pos+4], ' ') AS sh
       |  FROM g),
       |dup AS (SELECT sh FROM s GROUP BY sh HAVING count(*) >= 2),
       |f AS (SELECT s.doc_id, s.pos FROM s JOIN dup USING (sh)),
       |b AS (SELECT doc_id, pos,
       |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
       |      ORDER BY pos) <= 5 THEN 0 ELSE 1 END AS brk
       |  FROM f),
       |sp AS (SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id
       |    ORDER BY pos) AS span FROM b),
       |ln AS (SELECT doc_id, span, max(pos) - min(pos) + 5 AS len
       |  FROM sp GROUP BY 1, 2),
       |p AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       |    CAST(sum(len) AS BIGINT) AS dup_tokens,
       |    CAST(max(len) AS BIGINT) AS max_span
       |  FROM ln GROUP BY 1)
       |SELECT t.doc_id,
       |  coalesce(p.n_spans, 0) AS n_spans,
       |  coalesce(p.dup_tokens, 0) AS dup_tokens,
       |  coalesce(p.max_span, 0) AS max_span,
       |  CASE WHEN p.n_spans IS NULL OR len(t.toks) = 0 THEN 0.0
       |    ELSE round(CAST(p.dup_tokens AS DOUBLE) / len(t.toks), 6)
       |  END AS dup_span_frac
       |FROM t LEFT JOIN p USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // ---- dedup_substr ------------------------------------------------

  /** The removal half of ExactSubstr dedup
    * ([[graft.extra.Dedup.removeDupSpans]]): duplicated spans'
    * non-canonical occurrences cut from the text (canonical = minimal
    * (doc_id, pos) across the corpus), rebuilt per row, with the two
    * production guards: `minSpanTokens = 10` leaves short common
    * phrases in place (the Lee-et-al long-run discipline scaled to
    * this corpus' ~54-token docs — 23 of 36 non-canonical spans at
    * sf0.01 are ≥ 10 tokens and get cut, 13 short ones survive), and
    * canonical-occurrence positions are EXCLUDED from the cut so at
    * least one copy of every duplicated run always survives. The
    * oracle replays canonical selection as a per-gram (doc_id, pos)
    * rank, the span-length filter as a HAVING on the merged span, and
    * the protected cut as an indexed list_filter against both lists.
    */
  def dedupSubstr(s: SparkSession, dir: String): DataFrame =
    graft.extra.Dedup.removeDupSpans(docs(s, dir), "doc_id", "text",
        k = 5, minSpanTokens = 10)
      .orderBy("doc_id")

  /** Shared CTE chain for the ExactSubstr removal oracles: flags,
    * canonical positions, span merge (>= 10-token filter), protected
    * indexed cut — ending in `fin` (doc_id, toks, kept, nsp) over the
    * WHOLE documents table. `dedup_substr` selects every row;
    * `dedup_substr_incremental` restricts to the batch half (its flags
    * are identical by the posting-summary equivalence SubstrIndexSpec
    * pins).
    */
  private val dedupSubstrCte =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |g AS (SELECT doc_id, toks,
       |    unnest(range(1, len(toks) - 3)) AS pos
       |  FROM t WHERE len(toks) >= 5),
       |s AS (SELECT doc_id, pos,
       |    array_to_string(toks[pos:pos+4], ' ') AS sh
       |  FROM g),
       |o AS (SELECT doc_id, pos,
       |    row_number() OVER (PARTITION BY sh ORDER BY doc_id, pos)
       |      AS rn,
       |    count(*) OVER (PARTITION BY sh) AS n
       |  FROM s),
       |f AS (SELECT doc_id, pos FROM o WHERE n >= 2 AND rn > 1),
       |c AS (SELECT doc_id, pos FROM o WHERE n >= 2 AND rn = 1),
       |ca AS (SELECT doc_id, list(pos ORDER BY pos) AS cpos
       |  FROM c GROUP BY 1),
       |b AS (SELECT doc_id, pos,
       |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
       |      ORDER BY pos) <= 5 THEN 0 ELSE 1 END AS brk
       |  FROM f),
       |sp AS (SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id
       |    ORDER BY pos) AS span FROM b),
       |sl AS (SELECT doc_id, span, min(pos) AS st, max(pos) + 4 AS en
       |  FROM sp GROUP BY 1, 2
       |  HAVING max(pos) + 4 - min(pos) + 1 >= 10),
       |sa AS (SELECT doc_id,
       |    list(struct_pack(st := st, en := en) ORDER BY st) AS spans,
       |    count(*) AS nsp
       |  FROM sl GROUP BY 1),
       |fin AS (SELECT t.doc_id, t.toks,
       |    CASE WHEN sa.doc_id IS NULL THEN t.toks
       |      ELSE list_filter(t.toks, (x, i) ->
       |        len(list_filter(sa.spans,
       |          q -> i >= q.st AND i <= q.en)) = 0
       |        OR len(list_filter(coalesce(ca.cpos, []),
       |          p -> i >= p AND i <= p + 4)) > 0)
       |    END AS kept,
       |    coalesce(sa.nsp, 0) AS nsp
       |  FROM t LEFT JOIN sa USING (doc_id)
       |  LEFT JOIN ca USING (doc_id))""".stripMargin

  private val dedupSubstrOracle =
    s"""$dedupSubstrCte
       |SELECT doc_id,
       |  -- array_to_string([]) is NULL in DuckDB; Spark's array_join
       |  -- of an empty array is '' — canonicalize the fully-removed
       |  coalesce(array_to_string(kept, ' '), '') AS text,
       |  CAST(nsp AS BIGINT) AS n_spans_removed,
       |  CAST(len(toks) - len(kept) AS BIGINT) AS n_tokens_removed
       |FROM fin
       |ORDER BY doc_id""".stripMargin

  // ---- dedup_substr_incremental ------------------------------------

  /** The INCREMENTAL arm ([[graft.extra.SubstrIndex.dedupBatch]]):
    * the lower-id half of the corpus is the standing indexed corpus
    * (build-if-absent, content-keyed — [[IndexedCorpus.substrDir]]),
    * the upper half is the incoming crawl batch, span-deduped against
    * corpus + batch-mates via posting lookups without rescanning
    * corpus text. The oracle replays the batch-side anchoring as the
    * GLOBAL cut restricted to batch rows — exactly the equivalence
    * the operator guarantees (flags depend only on per-gram total
    * count and global canonical minimum, which the postings carry).
    */
  def dedupSubstrIncremental(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val cut = d.agg(max(col("doc_id"))).head().getLong(0) / 2
    val corpus = d.filter(col("doc_id") < cut)
    val batch = d.filter(col("doc_id") >= cut)
    val idx = IndexedCorpus.substrDir(corpus, "doc_id", "text")
    graft.extra.SubstrIndex.dedupBatch(s, idx, batch, "doc_id", "text",
        minSpanTokens = 10)
      .orderBy("doc_id")
  }

  private val dedupSubstrIncrementalOracle =
    s"""$dedupSubstrCte
       |SELECT doc_id,
       |  coalesce(array_to_string(kept, ' '), '') AS text,
       |  CAST(nsp AS BIGINT) AS n_spans_removed,
       |  CAST(len(toks) - len(kept) AS BIGINT) AS n_tokens_removed
       |FROM fin
       |WHERE doc_id >= (SELECT max(doc_id) // 2 FROM documents)
       |ORDER BY doc_id""".stripMargin

  // ---- bm25_search --------------------------------------------------

  /** BM25 top-20 for a fixed three-term query over the corpus (see
    * [[graft.extra.Retrieval.bm25Search]] — exact long tf/dl/df, 12-dp
    * rounded per-term contributions summed in DECIMAL, ties by doc_id).
    */
  def bm25Search(s: SparkSession, dir: String): DataFrame =
    graft.extra.Retrieval.bm25Search(docs(s, dir), "doc_id", "text",
      Seq("spark", "shuffle", "join"), k1 = 1.2, b = 0.75, topK = 20)

  private val bm25Oracle =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf
       |  FROM (SELECT doc_id, unnest(toks) AS term FROM t) GROUP BY 1, 2),
       |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
       |consts AS (SELECT
       |  CAST((SELECT count(*) FROM documents) AS DOUBLE) AS n,
       |  CAST((SELECT sum(dl) FROM dl) AS DOUBLE)
       |    / CAST((SELECT count(*) FROM documents) AS DOUBLE) AS avgdl),
       |tfq AS (SELECT * FROM tf
       |  WHERE term IN ('spark', 'shuffle', 'join')),
       |idf AS (SELECT term,
       |  ln(((SELECT n FROM consts) - CAST(count(*) AS DOUBLE) + 0.5)
       |     / (CAST(count(*) AS DOUBLE) + 0.5) + 1.0) AS idf
       |  FROM tfq GROUP BY term),
       |sc AS (SELECT tfq.doc_id,
       |  CAST(round(idf.idf * ((CAST(tfq.tf AS DOUBLE) * (1.2 + 1.0))
       |    / (CAST(tfq.tf AS DOUBLE) + 1.2 * ((1.0 - 0.75)
       |       + 0.75 * (CAST(dl.dl AS DOUBLE)
       |                 / (SELECT avgdl FROM consts))))), 12)
       |       AS DECIMAL(30,12)) AS c
       |  FROM tfq JOIN idf USING (term) JOIN dl USING (doc_id))
       |SELECT doc_id, count(*) AS n_hits,
       |  round(CAST(sum(c) AS DOUBLE), 6) AS score
       |FROM sc GROUP BY 1
       |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin

  // ---- bm25_indexed -------------------------------------------------

  /** The same BM25 search served from a PERSISTED index
    * ([[graft.extra.Bm25Index]]): tf/dl/df/meta are built once and
    * written; the search reads term-pruned index files and never
    * re-tokenizes (or even sees) the documents table. Scoring is
    * bit-identical to [[bm25Search]], so the two queries share one
    * oracle. The build is BUILD-IF-ABSENT, keyed on corpus content
    * ([[IndexedCorpus]]): the first call on a corpus pays it (the
    * amortized once-per-corpus step), every later call pays only the
    * index reads — so the bench median measures the serving cost,
    * which is what a build-once index is for.
    */
  def bm25Indexed(s: SparkSession, dir: String): DataFrame = {
    val idxDir = IndexedCorpus.bm25Dir(docs(s, dir), "doc_id", "text")
    graft.extra.Bm25Index.search(s, idxDir,
      Seq("spark", "shuffle", "join"), idCol = "doc_id", topK = 20)
  }

  // ---- bm25_multi ---------------------------------------------------

  /** Multi-query BM25 against an arbitrary query frame (three queries,
    * top-5 each) — see [[graft.extra.Retrieval.bm25SearchAll]].
    */
  def bm25Multi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val queries = Seq(
      ("q1", "spark shuffle join"),
      ("q2", "window sort"),
      ("q3", "hash table")).toDF("query_id", "query_text")
    graft.extra.Retrieval.bm25SearchAll(docs(s, dir), "doc_id", "text",
        queries, "query_id", "query_text", topK = 5)
      .orderBy(col("query_id"), col("score").desc, col("doc_id"))
  }

  /** Shared CTE prefix: the 3-query BM25 scoring chain, ending in `r`
    * = per-query scored docs with deterministic rank `rk` (score desc,
    * doc_id). Reused verbatim by `bm25_multi` (top-5 serving cut) and
    * `retrieval_metrics` (top-10 eval cut) so the eval oracle judges
    * EXACTLY the ranking the serving oracle proves.
    */
  private val bm25MultiCte =
    s"""WITH q(query_id, query_text) AS (VALUES
       |  ('q1', 'spark shuffle join'), ('q2', 'window sort'),
       |  ('q3', 'hash table')),
       |t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf
       |  FROM (SELECT doc_id, unnest(toks) AS term FROM t) GROUP BY 1, 2),
       |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
       |consts AS (SELECT
       |  CAST((SELECT count(*) FROM documents) AS DOUBLE) AS n,
       |  CAST((SELECT sum(dl) FROM dl) AS DOUBLE)
       |    / CAST((SELECT count(*) FROM documents) AS DOUBLE) AS avgdl),
       |qt AS (SELECT DISTINCT query_id, term FROM (
       |  SELECT query_id, unnest(list_filter(string_split(
       |    lower(query_text), ' '), x -> x <> '')) AS term FROM q)),
       |tfq AS (SELECT tf.* FROM tf
       |  WHERE term IN (SELECT DISTINCT term FROM qt)),
       |idf AS (SELECT term,
       |  ln(((SELECT n FROM consts) - CAST(count(*) AS DOUBLE) + 0.5)
       |     / (CAST(count(*) AS DOUBLE) + 0.5) + 1.0) AS idf
       |  FROM tfq GROUP BY term),
       |sc AS (SELECT qt.query_id, tfq.doc_id,
       |  count(*) AS n_hits,
       |  round(CAST(sum(CAST(round(idf.idf
       |    * ((CAST(tfq.tf AS DOUBLE) * (1.2 + 1.0))
       |    / (CAST(tfq.tf AS DOUBLE) + 1.2 * ((1.0 - 0.75)
       |       + 0.75 * (CAST(dl.dl AS DOUBLE)
       |                 / (SELECT avgdl FROM consts))))), 12)
       |       AS DECIMAL(30,12))) AS DOUBLE), 6) AS score
       |  FROM tfq JOIN qt USING (term) JOIN idf USING (term)
       |  JOIN dl USING (doc_id)
       |  GROUP BY 1, 2),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |  ORDER BY score DESC, doc_id) AS rk FROM sc)""".stripMargin

  private val bm25MultiOracle =
    s"""$bm25MultiCte
       |SELECT query_id, doc_id, n_hits, score FROM r WHERE rk <= 5
       |ORDER BY query_id, score DESC, doc_id""".stripMargin

  // ---- retrieval_metrics --------------------------------------------

  /** Ranking-quality eval over the bm25_multi run at k=10
    * ([[graft.extra.Retrieval.evalMetrics]]): binary qrels = documents
    * containing EVERY term of the query (derived from the corpus
    * itself, so the judgment set is deterministic and
    * oracle-reproducible), metrics per query = precision/recall@10,
    * MRR, nDCG with 9-dp DECIMAL-summed DCG terms.
    */
  def retrievalMetrics(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = docs(s, dir)
    val queries = Seq(
      ("q1", "spark shuffle join"),
      ("q2", "window sort"),
      ("q3", "hash table")).toDF("query_id", "query_text")
    // r16: ONE tokenization — the run and the corpus-derived qrels both
    // read the pinned tf frame (the qrels' distinct (doc, term) pairs
    // ARE tf's keys, exactly as the oracle's `dterm` CTE reads its own
    // tf), and the run + eval execute as one final plan instead of
    // [count, sum-collect, run checkpoint, eval] sequential actions.
    // r17: the corpus scalars ride that plan too (broadcast one-row
    // frame) — the whole query is ONE action.
    val tf = graft.extra.Retrieval.bm25Tf(d, "doc_id", "text").persist()
    try {
      val run = graft.extra.Retrieval.bm25ScoredAll(tf, "doc_id",
        graft.extra.Retrieval.bm25ConstsFrame(d, "text"),
        queries, "query_id", "query_text", k1 = 1.2, b = 0.75,
        topK = 10)
      val qterms = queries.select(col("query_id"),
        explode(Text.tokens(col("query_text"))).as("term")).distinct()
      val nq = qterms.groupBy("query_id").agg(count(lit(1)).as("__nq"))
      val docTerms = tf.select(col("doc_id"), col("term"))
      val qrels = qterms.join(docTerms, "term")
        .groupBy("query_id", "doc_id").agg(count(lit(1)).as("__m"))
        .join(nq, "query_id")
        .filter(col("__m") === col("__nq"))
        .select("query_id", "doc_id")
      graft.extra.Dedup.materialize(
        graft.extra.Retrieval.evalMetrics(run, "query_id", "doc_id",
          "score", qrels, k = 10))
    } finally tf.unpersist(blocking = false)
  }

  private val retrievalMetricsOracle =
    s"""$bm25MultiCte,
       |nq AS (SELECT query_id, count(*) AS nq FROM qt GROUP BY 1),
       |dterm AS (SELECT DISTINCT doc_id, term FROM tf),
       |drel AS (SELECT qt.query_id, dterm.doc_id
       |  FROM qt JOIN dterm USING (term)
       |  JOIN nq ON nq.query_id = qt.query_id
       |  GROUP BY qt.query_id, dterm.doc_id, nq.nq
       |  HAVING count(*) = nq.nq),
       |j AS (SELECT r.query_id, r.rk,
       |    CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END AS rel
       |  FROM r LEFT JOIN drel d
       |    ON r.query_id = d.query_id AND r.doc_id = d.doc_id
       |  WHERE r.rk <= 10),
       |nrel AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel
       |  FROM drel GROUP BY 1),
       |m AS (SELECT query_id,
       |    CAST(count(*) AS BIGINT) AS n_ret,
       |    CAST(sum(rel) AS BIGINT) AS hits,
       |    min(CASE WHEN rel = 1 THEN rk END) AS frr,
       |    sum(CASE WHEN rel = 1
       |      THEN CAST(round(1.0 / log2(rk + 1), 9) AS DECIMAL(20,9))
       |      ELSE CAST(0 AS DECIMAL(20,9)) END) AS dcg
       |  FROM j GROUP BY 1),
       |ii AS (SELECT query_id, unnest(range(1, least(n_rel, 10) + 1)) AS i
       |  FROM nrel WHERE n_rel >= 1),
       |ideal AS (SELECT query_id,
       |    sum(CAST(round(1.0 / log2(i + 1), 9) AS DECIMAL(20,9)))
       |      AS idcg
       |  FROM ii GROUP BY 1)
       |SELECT m.query_id,
       |  coalesce(nrel.n_rel, 0) AS n_rel, m.n_ret, m.hits,
       |  round(CAST(m.hits AS DOUBLE) / 10.0, 6) AS precision_at_k,
       |  CASE WHEN coalesce(nrel.n_rel, 0) = 0 THEN 0.0
       |    ELSE round(CAST(m.hits AS DOUBLE) / nrel.n_rel, 6)
       |  END AS recall_at_k,
       |  CASE WHEN m.frr IS NULL THEN 0.0
       |    ELSE round(1.0 / m.frr, 6) END AS mrr,
       |  CASE WHEN ideal.idcg IS NULL THEN 0.0
       |    ELSE round(CAST(m.dcg AS DOUBLE) / CAST(ideal.idcg AS DOUBLE),
       |      6) END AS ndcg
       |FROM m LEFT JOIN nrel USING (query_id)
       |LEFT JOIN ideal USING (query_id)
       |ORDER BY query_id""".stripMargin

  // ---- retrieval_metrics_graded -------------------------------------

  /** GRADED-relevance eval over the same bm25_multi run at k=10
    * ([[graft.extra.Retrieval.evalMetricsGraded]]): qrels gain = the
    * number of DISTINCT query terms the doc contains (1..|terms| —
    * a corpus-derived graded judgment set, deterministic and
    * oracle-reproducible; the binary `retrieval_metrics` qrels are
    * exactly the gain = |terms| top tier). Adds graded nDCG
    * ((2^gain − 1)/log2(rank+1), 9-dp DECIMAL terms) and per-query
    * average precision (MAP's per-query component) to the binary
    * metrics.
    */
  def retrievalMetricsGraded(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = docs(s, dir)
    val queries = Seq(
      ("q1", "spark shuffle join"),
      ("q2", "window sort"),
      ("q3", "hash table")).toDF("query_id", "query_text")
    // r16: one tokenization for run + graded qrels (see
    // retrievalMetrics above); r17: corpus scalars fold into the one
    // plan as a broadcast one-row frame — no separate consts action
    val tf = graft.extra.Retrieval.bm25Tf(d, "doc_id", "text").persist()
    try {
      val run = graft.extra.Retrieval.bm25ScoredAll(tf, "doc_id",
        graft.extra.Retrieval.bm25ConstsFrame(d, "text"),
        queries, "query_id", "query_text", k1 = 1.2, b = 0.75,
        topK = 10)
      val qterms = queries.select(col("query_id"),
        explode(Text.tokens(col("query_text"))).as("term")).distinct()
      val docTerms = tf.select(col("doc_id"), col("term"))
      val qrels = qterms.join(docTerms, "term")
        .groupBy("query_id", "doc_id").agg(count(lit(1)).as("gain"))
      graft.extra.Dedup.materialize(
        graft.extra.Retrieval.evalMetricsGraded(run, "query_id",
          "doc_id", "score", qrels, "gain", k = 10))
    } finally tf.unpersist(blocking = false)
  }

  private val retrievalMetricsGradedOracle =
    s"""$bm25MultiCte,
       |dterm AS (SELECT DISTINCT doc_id, term FROM tf),
       |grel AS (SELECT qt.query_id, dterm.doc_id,
       |    CAST(count(*) AS BIGINT) AS gain
       |  FROM qt JOIN dterm USING (term) GROUP BY 1, 2),
       |j AS (SELECT r.query_id, r.rk, coalesce(g.gain, 0) AS gain,
       |    CASE WHEN coalesce(g.gain, 0) > 0 THEN 1 ELSE 0 END AS rel
       |  FROM r LEFT JOIN grel g
       |    ON r.query_id = g.query_id AND r.doc_id = g.doc_id
       |  WHERE r.rk <= 10),
       |cj AS (SELECT *, sum(rel) OVER (PARTITION BY query_id
       |    ORDER BY rk) AS cum FROM j),
       |nrel AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel
       |  FROM grel WHERE gain > 0 GROUP BY 1),
       |m AS (SELECT query_id,
       |    CAST(count(*) AS BIGINT) AS n_ret,
       |    CAST(sum(rel) AS BIGINT) AS hits,
       |    min(CASE WHEN rel = 1 THEN rk END) AS frr,
       |    sum(CASE WHEN rel = 1
       |      THEN CAST(round((power(2, gain) - 1) / log2(rk + 1), 9)
       |        AS DECIMAL(20,9))
       |      ELSE CAST(0 AS DECIMAL(20,9)) END) AS dcg,
       |    sum(CASE WHEN rel = 1
       |      THEN CAST(round(CAST(cum AS DOUBLE) / rk, 9)
       |        AS DECIMAL(20,9))
       |      ELSE CAST(0 AS DECIMAL(20,9)) END) AS apsum
       |  FROM cj GROUP BY 1),
       |gr AS (SELECT query_id, gain, row_number() OVER (PARTITION BY
       |    query_id ORDER BY gain DESC, doc_id) AS i
       |  FROM grel WHERE gain > 0),
       |ideal AS (SELECT query_id,
       |    sum(CAST(round((power(2, gain) - 1) / log2(i + 1), 9)
       |      AS DECIMAL(20,9))) AS idcg
       |  FROM gr WHERE i <= 10 GROUP BY 1)
       |SELECT m.query_id,
       |  coalesce(nrel.n_rel, 0) AS n_rel, m.n_ret, m.hits,
       |  round(CAST(m.hits AS DOUBLE) / 10.0, 6) AS precision_at_k,
       |  CASE WHEN coalesce(nrel.n_rel, 0) = 0 THEN 0.0
       |    ELSE round(CAST(m.hits AS DOUBLE) / nrel.n_rel, 6)
       |  END AS recall_at_k,
       |  CASE WHEN m.frr IS NULL THEN 0.0
       |    ELSE round(1.0 / m.frr, 6) END AS mrr,
       |  CASE WHEN coalesce(nrel.n_rel, 0) = 0 THEN 0.0
       |    ELSE round(CAST(m.apsum AS DOUBLE) / nrel.n_rel, 6)
       |  END AS avg_precision,
       |  CASE WHEN ideal.idcg IS NULL OR ideal.idcg = 0 THEN 0.0
       |    ELSE round(CAST(m.dcg AS DOUBLE) / CAST(ideal.idcg AS DOUBLE),
       |      6) END AS ndcg_graded
       |FROM m LEFT JOIN nrel USING (query_id)
       |LEFT JOIN ideal USING (query_id)
       |ORDER BY query_id""".stripMargin

  // ---- hybrid_topk --------------------------------------------------

  /** Hybrid retrieval: reciprocal-rank fusion of the sparse arm (BM25
    * more-like-this, query text = the query documents' own text) and
    * the dense arm (exact cosine top-k over the embeddings table, same
    * id space) for query docs 0-2 — see
    * [[graft.extra.Retrieval.rrfFuse]]. Integer rank arithmetic makes
    * the fusion engine-exact even though both arms score in floats.
    */
  def hybridTopK(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs(s, dir)
    val queries = d.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"), col("text").as("query_text"))
    val ws = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    // r17: the sparse arm runs as the LAZY scoring core over a locally
    // pinned tf frame (the retrieval_metrics discipline) instead of
    // bm25SearchAll's materialized form — arm + fusion execute as ONE
    // plan/action, dropping a checkpoint plus a driver round trip
    val tf = graft.extra.Retrieval.bm25Tf(d, "doc_id", "text").persist()
    try {
      val sparse = graft.extra.Retrieval.bm25ScoredAll(tf, "doc_id",
          graft.extra.Retrieval.bm25ConstsFrame(d, "text"),
          queries, "query_id", "query_text", k1 = 1.2, b = 0.75,
          topK = 20)
        .withColumn("rank", row_number().over(ws))
      val dense = graft.extra.Similarity.topKBruteForce(
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          queryPred = col("id") < 3, k = 20)
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          col("rank"))
      graft.extra.Dedup.materialize(
        graft.extra.Retrieval.rrfFuse(sparse, dense, "query_id",
            "doc_id", rrfK = 60, topK = 10)
          .orderBy("query_id", "rank"))
    } finally tf.unpersist(blocking = false)
  }

  private val hybridTopKOracle =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf
       |  FROM (SELECT doc_id, unnest(toks) AS term FROM t) GROUP BY 1, 2),
       |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
       |consts AS (SELECT
       |  CAST((SELECT count(*) FROM documents) AS DOUBLE) AS n,
       |  CAST((SELECT sum(dl) FROM dl) AS DOUBLE)
       |    / CAST((SELECT count(*) FROM documents) AS DOUBLE) AS avgdl),
       |q AS (SELECT doc_id AS query_id, text AS query_text
       |  FROM documents WHERE doc_id < 3),
       |qt AS (SELECT DISTINCT query_id, term FROM (
       |  SELECT query_id, unnest(list_filter(string_split(
       |    lower(query_text), ' '), x -> x <> '')) AS term FROM q)),
       |tfq AS (SELECT tf.* FROM tf
       |  WHERE term IN (SELECT DISTINCT term FROM qt)),
       |idf AS (SELECT term,
       |  ln(((SELECT n FROM consts) - CAST(count(*) AS DOUBLE) + 0.5)
       |     / (CAST(count(*) AS DOUBLE) + 0.5) + 1.0) AS idf
       |  FROM tfq GROUP BY term),
       |sc AS (SELECT qt.query_id, tfq.doc_id,
       |  round(CAST(sum(CAST(round(idf.idf
       |    * ((CAST(tfq.tf AS DOUBLE) * (1.2 + 1.0))
       |    / (CAST(tfq.tf AS DOUBLE) + 1.2 * ((1.0 - 0.75)
       |       + 0.75 * (CAST(dl.dl AS DOUBLE)
       |                 / (SELECT avgdl FROM consts))))), 12)
       |       AS DECIMAL(30,12))) AS DOUBLE), 6) AS score
       |  FROM tfq JOIN qt USING (term) JOIN idf USING (term)
       |  JOIN dl USING (doc_id)
       |  GROUP BY 1, 2),
       |sa AS (SELECT query_id, doc_id, srank FROM (
       |  SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
       |    ORDER BY score DESC, doc_id) AS srank FROM sc)
       |  WHERE srank <= 20),
       |e AS (SELECT vec_id, embedding,
       |  list_sum(list_transform(range(0, len(embedding)),
       |    i -> CAST(embedding[i+1] AS DOUBLE)
       |         * CAST(embedding[i+1] AS DOUBLE))) AS nrm
       |  FROM embeddings),
       |dsc AS (
       |  SELECT qe.vec_id AS query_id, c.vec_id AS doc_id,
       |    round(list_sum(list_transform(range(0, len(c.embedding)),
       |      i -> CAST(c.embedding[i+1] AS DOUBLE)
       |           * CAST(qe.embedding[i+1] AS DOUBLE)))
       |      / (sqrt(c.nrm) * sqrt(qe.nrm)), 6) AS cosine
       |  FROM e c JOIN e qe ON qe.vec_id < 3 AND c.vec_id <> qe.vec_id),
       |da AS (SELECT query_id, doc_id, drank FROM (
       |  SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, doc_id) AS drank FROM dsc)
       |  WHERE drank <= 20),
       |f AS (SELECT
       |  coalesce(sa.query_id, da.query_id) AS query_id,
       |  coalesce(sa.doc_id, da.doc_id) AS doc_id,
       |  sa.srank AS sparse_rank, da.drank AS dense_rank,
       |  round(coalesce(CAST(1.0 AS DOUBLE) / (60 + sa.srank),
       |          CAST(0.0 AS DOUBLE))
       |    + coalesce(CAST(1.0 AS DOUBLE) / (60 + da.drank),
       |          CAST(0.0 AS DOUBLE)), 6) AS rrf_score
       |  FROM sa FULL OUTER JOIN da
       |    ON sa.query_id = da.query_id AND sa.doc_id = da.doc_id),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |  ORDER BY rrf_score DESC, doc_id) AS rank FROM f)
       |SELECT query_id, rank, doc_id, rrf_score, sparse_rank, dense_rank
       |FROM r WHERE rank <= 10
       |ORDER BY query_id, rank""".stripMargin

  // ---- hybrid_topk_indexed ------------------------------------------

  /** The PRODUCTION hybrid-retrieval composition: the same RRF fusion
    * as [[hybridTopK]], but both arms served from PERSISTED indexes —
    * sparse from a [[graft.extra.Bm25Index]] (term-pruned posting
    * reads, never a corpus re-tokenization), dense from a persisted
    * [[graft.extra.AnnIndex]] IVF-PQ layout (search partition-prunes
    * to the probed posting lists at file-listing time). This is the
    * serving shape a 100 TB retrieval stack runs: both builds are the
    * amortized once-per-corpus step (build-if-absent, content-keyed —
    * [[IndexedCorpus]], like [[bm25Indexed]]); a query batch pays
    * index reads only.
    *
    * Oracle parity: the ANN arm runs in EXACT mode — every coarse list
    * probed (nprobe = numCentroids) and the ADC shortlist wide enough
    * to hold the whole corpus — which makes the exact-cosine re-rank's
    * top-k bit-identical to [[Similarity.topKBruteForce]]'s, so the
    * query shares [[hybridTopK]]'s oracle (HybridIndexedSpec pins the
    * full-result parity). Production flips nprobe/candFactor down and
    * reads nprobe partitions instead of the corpus — HybridSmoke times
    * that config at 1M-vector scale.
    */
  def hybridTopKIndexed(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs(s, dir)
    val queries = d.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"), col("text").as("query_text"))
    val bm25 = IndexedCorpus.bm25Dir(d, "doc_id", "text")
    val ws = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    val sparse = graft.extra.Bm25Index.searchAll(s, bm25, queries,
        "query_id", "query_text", idCol = "doc_id", topK = 20)
      .withColumn("rank", row_number().over(ws))
    val emb = Tables.load(s, dir, "embeddings")
    val idx = IndexedCorpus.annIndex(s, emb, "vec_id", "embedding")
    // exact mode: candFactor sized so k·candFactor covers the corpus —
    // nothing leaves the ADC shortlist, the re-rank sees every
    // candidate, and the arm degenerates (by design) to brute force
    val exactCand = ((emb.count() + 19L) / 20L).toInt + 1
    val dense = graft.extra.Similarity.searchIvfPq(idx, col("id") < 3,
        k = 20, nprobe = 32, candFactor = exactCand)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    graft.extra.Retrieval.rrfFuse(sparse, dense, "query_id", "doc_id",
        rrfK = 60, topK = 10)
      .orderBy("query_id", "rank")
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("hybrid_topk",
      "hybrid retrieval: RRF fusion of BM25 and dense cosine arms",
      hybridTopK, Some(hybridTopKOracle)),
    QueryDef("hybrid_topk_indexed",
      "hybrid RRF served from persisted BM25 + IVF-PQ indexes (exact mode)",
      hybridTopKIndexed, Some(hybridTopKOracle)),
    QueryDef("bm25_multi",
      "multi-query BM25 from an arbitrary query frame (top-5/query)",
      bm25Multi, Some(bm25MultiOracle)),
    QueryDef("retrieval_metrics",
      "retrieval eval harness: precision/recall@10, MRR, nDCG per " +
        "query (9-dp DECIMAL DCG terms) vs corpus-derived qrels",
      retrievalMetrics, Some(retrievalMetricsOracle)),
    QueryDef("retrieval_metrics_graded",
      "graded-relevance eval: exponential-gain nDCG + per-query " +
        "average precision vs term-count graded qrels",
      retrievalMetricsGraded, Some(retrievalMetricsGradedOracle)),
    QueryDef("bm25_search",
      "BM25 top-20 lexical retrieval (exact counts, decimal score sums)",
      bm25Search, Some(bm25Oracle)),
    QueryDef("bm25_indexed",
      "BM25 top-20 served from the persisted tf/dl/df index (no corpus scan)",
      bm25Indexed, Some(bm25Oracle)),
    QueryDef("pii_redact",
      "sequenced regex PII redaction + span count (digit-run rule)",
      piiRedact, Some(piiRedactOracle)),
    QueryDef("dup_ngrams",
      "duplicated-3-gram coverage per doc (exact-substring dedup signal)",
      dupNgrams, Some(dupNgramsOracle)),
    QueryDef("dup_spans",
      "maximal duplicated-substring spans per doc (Lee et al. " +
        "ExactSubstr at 5-gram resolution: anchor + span merge)",
      dupSpans, Some(dupSpansOracle)),
    QueryDef("dedup_substr",
      "ExactSubstr removal: non-canonical duplicated spans >= 10 " +
        "tokens cut, canonical (min (doc,pos)) positions protected",
      dedupSubstr, Some(dedupSubstrOracle)),
    QueryDef("dedup_substr_incremental",
      "incremental ExactSubstr: batch span-deduped against the " +
        "persisted gram-posting index (no corpus text rescan)",
      dedupSubstrIncremental, Some(dedupSubstrIncrementalOracle)),
    QueryDef("tfidf_top_terms",
      "per-doc top-3 tf-idf terms: two keyed aggs, one term equijoin",
      tfidfTopTerms, Some(tfidfTopTermsOracle)),
    QueryDef("select_budget",
      "token-budget corpus cut by quality order (distributed prefix sum)",
      selectBudget, Some(selectBudgetOracle)),
    QueryDef("select_budget_by_domain",
      "per-domain token budgets by quality order - the FineWeb-style " +
        "per-source cap via the grouped distributed prefix sum",
      selectBudgetByDomain, Some(selectBudgetByDomainOracle)),
    QueryDef("decontaminate",
      "flag docs sharing any 5-gram with the benchmark set (broadcast semi-join)",
      decontaminate, Some(decontaminateOracle)),
    QueryDef("decontaminate_spans",
      "span-level decontamination: benchmark-overlapping runs >= 8 " +
        "tokens cut from the text, shorter shared phrases survive",
      decontaminateSpans, Some(decontaminateSpansOracle)),
    QueryDef("doc_repetition",
      "Gopher-style repetition: top-bigram and duplicate-token fractions",
      docRepetition, Some(docRepetitionOracle)),
    QueryDef("pack_sequences",
      "greedy fixed-token-budget sequence packing per content-hash shard",
      packSequences, Some(packSequencesOracle)),
    QueryDef("pack_sequences_bpe",
      "sequence packing budgeted in exact BPE subword tokens - the " +
        "training-window unit, not whitespace words",
      packSequencesBpe, Some(packSequencesBpeOracle)),
    QueryDef("pack_stats",
      "per-sequence packing utilization (docs, tokens, fill ratio)",
      packStatsQ, Some(packStatsOracle)),
    QueryDef("pack_examples",
      "trainer-ready packed sequences: concatenated token-id streams " +
        "(corpus-vocab ids, EOS=0) per greedy-filled 512-subword bin",
      packExamplesQ, Some(packExamplesOracle)),
    QueryDef("text_quality",
      "per-doc quality metrics: TTR, stopword ratio, composite score",
      textQuality, Some(textQualityOracle)),
    QueryDef("lang_id",
      "stopword-scoring language ID heuristic with deterministic argmax",
      langId, Some(langIdOracle)),
    QueryDef("token_counts",
      "whitespace + BPE-ish (ceil(len/4) per word) token counting",
      tokenCounts, Some(tokenCountsOracle)),
    QueryDef("token_counts_bpe",
      "EXACT subword counts under a trained 32-rule BPE merge list " +
        "(greedy pair merging, codegen replace chain)",
      tokenCountsBpe, Some(tokenCountsBpeOracle)),
    QueryDef("token_counts_bpe_indexed",
      "persisted-tokenizer serving: the merge list committed as a " +
        "versioned BpeModel, loaded memoized, counted via the typed " +
        "merge loop — same nested-REPLACE oracle",
      tokenCountsBpeIndexed, Some(tokenCountsBpeOracle)),
    QueryDef("chunk_docs_bpe",
      "32-SUBWORD chunking under the trained merge list - context " +
        "windows measured in tokenizer tokens, not words",
      chunkDocsBpe, Some(chunkDocsBpeOracle)),
    QueryDef("doc_fingerprint",
      "min-md5-over-shingles winnowing-style content fingerprint",
      fingerprint, Some(fingerprintOracle)),
    QueryDef("word_freq",
      "corpus top-50 token frequencies",
      wordFreq, Some(wordFreqOracle)),
    QueryDef("heavy_hitters",
      "tokens above 0.5% corpus share via mergeable Misra-Gries " +
        "sketch + exact verify pass (O(k) state, no token shuffle)",
      heavyHitters, Some(heavyHittersOracle)),
    QueryDef("corpus_stats",
      "one-row corpus sizing summary: docs, token totals, mean quality",
      corpusStats, Some(corpusStatsOracle)),
    QueryDef("dsir_weights",
      "DSIR importance log-weights toward the src0 domain, top-50 docs",
      dsirWeightsQ, Some(dsirWeightsOracle)),
    QueryDef("unigram_logprob",
      "self-trained unigram LM cross-entropy per doc (perplexity proxy)",
      unigramLogprob, Some(unigramLogprobOracle)),
    QueryDef("bigram_logprob",
      "self-trained bigram LM cross-entropy per doc (add-one smoothing)",
      bigramLogprob, Some(bigramLogprobOracle)),
    QueryDef("kn_trigram_logprob",
      "interpolated Kneser-Ney trigram cross-entropy per doc " +
        "(fixed discount, continuation-count backoff - the " +
        "CCNet/KenLM quality-filter signal)",
      knTrigramLogprob, Some(knTrigramLogprobOracle)),
    QueryDef("ccnet_buckets",
      "CCNet perplexity gate: per-language KN trigram LMs trained in " +
        "one corpus pass, head/middle/tail cross-entropy terciles",
      ccnetBuckets, Some(ccnetBucketsOracle)),
    QueryDef("kn_perplexity_serve",
      "KN LM fit on a 90% split, held-out 10% scored through the " +
        "full OOV backoff cascade (the KenLM serving semantics)",
      knPerplexityServe, Some(knServeOracle)),
    QueryDef("kn_perplexity_indexed",
      "the persisted-registry form: 90%-split model saved once " +
        "(versioned KnLm under the manifest layer), loaded memoized, " +
        "same scoring joins and oracle",
      knPerplexityIndexed, Some(knServeOracle)),
    QueryDef("vocab_coverage",
      "per-doc fraction of tokens inside the corpus top-16 vocabulary",
      vocabCoverageQ, Some(vocabCoverageOracle)),
    QueryDef("chunk_docs",
      "shuffle-free 32-token context-window chunking with ordinality",
      chunkDocs, Some(chunkDocsOracle)),
    QueryDef("chunk_stats",
      "one-row chunking utilization: chunks, full vs tail, fill ratio",
      chunkStats, Some(chunkStatsOracle)),
    QueryDef("nb_lang_id",
      "TRAINED language id: multinomial NB fitted on the corpus's own " +
        "lang labels, argmax re-classification — training included in " +
        "the hash gate",
      nbLangId, Some(nbLangIdOracle)),
    QueryDef("quality_classifier",
      "classifier-based quality filtering (CCNet bootstrap): NB " +
        "trained on heuristic seed labels, exact-decimal log-odds " +
        "keep verdicts",
      qualityClassifier, Some(qualityClassifierOracle)),
    QueryDef("nb_lang_id_indexed",
      "persisted-model serving: content-keyed train+save once, " +
        "load + typed-projection classify per call — same oracle as " +
        "nb_lang_id",
      nbLangIdIndexed, Some(nbLangIdOracle)))
}
