package graft.extra

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two tiers:
  *   - [[topKBruteForce]]: exact top-k by cosine — the correctness
  *     baseline. Query side is broadcast (it is small by construction);
  *     the corpus is scanned once, fully parallel, and per-query top-k is
  *     a rank-window (no global sort).
  *   - [[topKLsh]]: sign-random-projection LSH — corpus is bucketed by a
  *     hyperplane sign signature; each query only scans its own bucket.
  *     At 100 TB this turns a full-corpus scan into a bucket lookup;
  *     recall is tunable via number of hyperplanes (fewer bits → bigger
  *     buckets → higher recall, more compute).
  *
  * The hyperplanes are pseudo-random but engine-independent: component i
  * of plane p is `((i*31 + p*17) mod 7) - 3` — a fixed integer lattice
  * that any SQL engine reproduces exactly (needed for the DuckDB oracle;
  * a seeded Gaussian would be equally valid in production).
  */
object Similarity {

  /** Sum of element-wise products, left-to-right in double — the custom
    * codegen expression (graft.functions.DotProduct): bit-identical to
    * the higher-order-function fold, ~20× faster on pair joins.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.dot_product(a, b)

  def norm2(v: Column): Column = dot(v, v)

  /** Corpus prepared with squared norms (vectors stay float; the dot
    * expression widens each element exactly).
    */
  def prepare(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", norm2(col("v")))

  /** Exact top-k neighbors for each query id (queries = rows of the same
    * corpus selected by `queryPred`). Ranking key is cosine rounded to
    * 6 dp with id tie-break, so ordering is engine-independent.
    */
  def topKBruteForce(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int): DataFrame = {
    val e = prepare(emb, idCol, vecCol)
    val q = e.filter(queryPred)
      .select(col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = e.join(broadcast(q), col("id") =!= col("query_id"))
      .withColumn("cosine",
        round(dot(col("v"), col("qv")) / (sqrt(col("nrm")) * sqrt(col("qn"))), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"),
        col("cosine"))
  }

  val NumPlanes = 8

  /** Sign-random-projection bucket signature (single table: q = p). */
  def lshBucket(v: Column, dim: Int = MaxDim): Column =
    lshBucketFor(v, 0, NumPlanes, dim)

  /** Fallback dimensionality when the corpus can't be probed; the codegen
    * dot loops over min(len(v), len(plane)), so planes longer than the
    * vectors are correct — just wastefully large task payloads.
    */
  val MaxDim = 4096

  /** Actual embedding dimensionality, probed from the first corpus row
    * (one `CollectLimit 1` job — no scan). Plane literals sized to the
    * data instead of MaxDim keep the serialized task binaries ~dim/4096
    * of the worst case (4096-double planes were 1.6 MiB per task).
    * Assumes fixed-dimension vectors, which every embedding corpus has.
    */
  def probeDim(emb: DataFrame, vecCol: String): Int =
    emb.select(size(col(vecCol)).as("d")).head(1) match {
      case Array(r) if !r.isNullAt(0) && r.getInt(0) > 0 => r.getInt(0)
      case _ => MaxDim
    }

  /** Plane q as a literal double vector: component i =
    * ((i*31 + q*17) mod 7) - 3 — identical to the SQL-oracle formula
    * (which iterates range(0, len(embedding)), so any dim >= the actual
    * vector length produces identical buckets).
    */
  private def planeLit(q: Int, dim: Int): Column =
    lit((0 until dim).map(i => ((i * 31 + q * 17) % 7 - 3).toDouble).toArray)

  /** Bucket signature for table `tbl` using `bits` hyperplanes: plane
    * index q = tbl*bits + p. Each plane dot runs through the codegen
    * DotProduct against a literal plane vector (the interpreted
    * zip_with form was the per-row hot spot).
    */
  def lshBucketFor(v: Column, tbl: Int, bits: Int, dim: Int = MaxDim): Column = {
    val planeDots = (0 until bits).map { p =>
      val q = tbl * bits + p
      when(dot(v, planeLit(q, dim)) >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    planeDots.reduce(_ + _)
  }

  /** INT8 scalar quantization of a [[prepare]]d corpus: per-vector
    * symmetric scale = max(|x|)/127, element q = floor(x/scale + 0.5)
    * (explicit half-up — `round` semantics differ across engines on
    * negative halves). Adds `qv` (integer-valued doubles, so the codegen
    * [[dot]] applies and sums stay EXACT: |Σ q_i·q_j| ≤ dim·127² ≪ 2⁵³)
    * and keeps the float vector for exact re-ranking.
    *
    * At 100 TB this is the standard 4× memory/IO cut: the int8 corpus
    * (plus one scale per vector) is what the scan reads; full-precision
    * vectors are only fetched for the top re-rank candidates.
    *
    * Expression shape (HOF-CSE trap): the per-row scale is passed as the
    * `array_repeat` COLLECTION argument of `zip_with` — collection args
    * evaluate once per row, so the max-abs fold never re-runs per
    * element, and the lambda references only its own variables.
    */
  def quantizeInt8(prepared: DataFrame): DataFrame = {
    val scale = greatest(
      aggregate(col("v"), lit(0d), (a, x) => greatest(a, abs(x.cast("double")))),
      lit(1e-12)) / 127.0
    prepared.withColumn("qv",
      zip_with(col("v"), array_repeat(scale, size(col("v"))),
        (x, s) => floor(x.cast("double") / s + lit(0.5)).cast("double")))
  }

  /** Quantized top-k: score ALL pairs with the exact integer dot over
    * int8 codes (the cheap 4×-smaller scan), keep `k·candFactor`
    * candidates per query, then re-rank just those with the exact float
    * cosine. Candidate selection is engine-exact (integer scores, id
    * tie-break), so recall vs [[topKBruteForce]] is a pure property of
    * the quantization, and the DuckDB oracle reproduces the result
    * bit-for-bit.
    *
    * Cost model (when to use which scan — from the executed plan, which
    * is one corpus scan + a BroadcastNestedLoopJoin against the Q-row
    * broadcast query side + a WindowGroupLimit top-k; see the
    * `sim_topk_int8` plan lock): the quantized scan does N·Q integer
    * dots over a 4×-smaller corpus and the re-rank touches only
    * Q·k·candFactor float rows, so wall ≈ linear in N regardless of k.
    * It beats [[topKBruteForce]] by the IO/memory factor but can never
    * beat sub-linear candidate generation: once the corpus outgrows
    * "scan everything per query batch" — N·Q dots per batch above
    * roughly 10⁹–10¹⁰ on a cluster, i.e. N in the hundreds of millions
    * for tens of queries — use [[topKIvf]] (scans ~N/C per probed
    * centroid) or [[topKLshMulti]] (scans L buckets), optionally
    * quantizing INSIDE the shortlist. The guards below reject parameter
    * combinations where the "shortlist" would approach the corpus scan
    * itself — the caller wanted IVF and would silently pay double.
    */
  def topKInt8(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, candFactor: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(candFactor >= 1, s"candFactor must be >= 1, got $candFactor")
    // k·candFactor is the per-query exact-re-rank set. Past ~100k rows
    // per query the re-rank stops being "a shortlist" and the quantized
    // pre-pass stops paying for itself — that regime belongs to
    // IVF/LSH candidate generation, not a bigger re-rank buffer.
    require(k.toLong * candFactor <= 100000L,
      s"k*candFactor = ${k.toLong * candFactor} exceeds 100k: the exact " +
        "re-rank would dominate the quantized scan it is meant to avoid; " +
        "use topKIvf/topKLshMulti for sub-linear candidates instead")
    val e = quantizeInt8(prepare(emb, idCol, vecCol))
    val q = e.filter(queryPred).select(col("id").as("query_id"),
      col("v").as("q_v"), col("nrm").as("q_nrm"), col("qv").as("q_qv"))
    val scored = e.join(broadcast(q), col("id") =!= col("query_id"))
      .withColumn("qdot", dot(col("qv"), col("q_qv")).cast("long"))
    val wQ = Window.partitionBy(col("query_id"))
      .orderBy(col("qdot").desc, col("id"))
    val cand = scored.withColumn("qrank", row_number().over(wQ))
      .filter(col("qrank") <= k * candFactor)
      .withColumn("cosine",
        round(dot(col("v"), col("q_v")) /
          (sqrt(col("nrm")) * sqrt(col("q_nrm"))), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"),
        col("cosine"), col("qdot"))
  }

  /** Product-quantized top-k (PQ with asymmetric distance computation —
    * the memory tier BELOW int8: dim floats collapse to `m` one-byte
    * codes, a 4·dim/m× cut, 32× here at dim 64 / m 8).
    *
    * Index build: the vector is split into `m` subspaces; each subspace
    * gets a `numCentroids`-entry codebook and every corpus vector
    * stores only its nearest-centroid index per subspace. The codebook
    * here is the same deterministic hash-ordered sample as
    * [[sampleCodebook]] (centroid j of subspace s = dims [s·d/m,
    * (s+1)·d/m) of the j-th sample vector), so the DuckDB oracle
    * reproduces the whole index bit-for-bit; swap in per-subspace
    * k-means for the production build exactly as [[kmeansCodebook]]
    * does for IVF.
    *
    * Search (ADC): the query computes ONE m×k table of rounded
    * subspace distances to the codebook — then scoring a corpus row is
    * `m` table lookups summed, never a dim-length float scan. Both
    * assignment and the table are pure projections against literal
    * centroids (codegen, no join, no shuffle); scoring joins the
    * broadcast query side and ranks by (rounded ADC distance asc, id),
    * so candidate selection is engine-deterministic; the final `k` come
    * from an exact float-cosine re-rank of `k·candFactor` candidates,
    * [[topKInt8]]-style. Lookup lambdas reference only ATTRIBUTES
    * (codes, dtable) — nothing expensive re-evaluates per element
    * (HOF-CSE trap).
    *
    * At 100 TB: the PQ codes are what the scan reads (dim 1024 floats
    * → 4 KB/vector becomes m=64 bytes); compose with IVF posting lists
    * (assignment is already [[nearestCid]]'s shape) for sub-linear
    * scan-and-lookup — this operator is the lookup half.
    */
  def topKPq(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, m: Int = 8, numCentroids: Int = 16,
      candFactor: Int = 3, codebook: Option[Seq[Centroid]] = None): DataFrame = {
    require(k >= 1 && candFactor >= 1 && m >= 1,
      s"k=$k, candFactor=$candFactor, m=$m must all be >= 1")
    val dim = probeDim(emb, vecCol)
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val sub = dim / m
    requireCodebookDim(codebook, dim, "pq")
    val cents = codebook.getOrElse(
      sampleCodebook(emb, idCol, vecCol, numCentroids))
    if (cents.isEmpty)
      return topKBruteForce(emb, idCol, vecCol, queryPred, k)
        .withColumn("adc_d2", lit(null).cast("double"))
    val kC = cents.size
    val e = prepare(emb, idCol, vecCol)
    val coded = e.withColumn("codes", pqCodes(cents, m, sub))
    // query dtable computed DRIVER-side and broadcast as DATA — the
    // expression form (pqDTable literals fused into the scan stage)
    // pushed the generated method past janino's compile limit; the
    // failure is not cached, so EVERY pass paid a multi-second compile
    // attempt plus interpreted execution (bench: 7.3s/pass at sf0.1,
    // tight spread). With the table as data the corpus stage carries
    // only the codes projection + m element_at lookups.
    val spark = e.sparkSession
    import spark.implicits._
    val qs = collectQueries(e, queryPred)
    val q = qs.toSeq.map { case (qid, qv, qn) =>
      (qid, driverDTable(qv, cents, m, sub), qv.map(_.toFloat), qn)
    }.toDF("query_id", "dtable", "q_v", "q_nrm")
    // drop the m×k dtable (and codes) BEFORE the rank exchange — they
    // are per-pair dead weight once adc_d2 is computed (the 1M-vector
    // smoke measured the fat-row variant at GBs of shuffle); v/q_v stay
    // for the in-place shortlist re-rank, keeping this a 2-scan plan
    val scored = coded.select("id", "v", "nrm", "codes")
      .join(broadcast(q), col("id") =!= col("query_id"))
      .withColumn("adc_d2", pqAdc(m, kC))
      .select("query_id", "id", "v", "nrm", "q_v", "q_nrm", "adc_d2")
    val wCand = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_d2"), col("id"))
    val cand = scored.withColumn("crk", row_number().over(wCand))
      .filter(col("crk") <= k * candFactor)
      .withColumn("cosine",
        round(dot(col("v"), col("q_v")) /
          (sqrt(col("nrm")) * sqrt(col("q_nrm"))), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"),
        col("cosine"), col("adc_d2"))
  }

  /** Geometry guard for caller-supplied codebooks: every centroid must
    * have the probed corpus dimensionality.
    */
  private def requireCodebookDim(cb: Option[Seq[Centroid]], dim: Int,
      label: String): Unit =
    cb.foreach(cs => cs.headOption.foreach { c =>
      require(c.v.length == dim,
        s"$label codebook dim ${c.v.length} does not match corpus dim $dim")
    })

  /** Half-up 6-dp rounding — bit-identical to the SQL `round(x, 6)`
    * both engines apply, so driver-computed distances interleave with
    * expression-computed ones without divergence.
    */
  private def rnd6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Collect the (bounded, broadcast-sized) query rows of a
    * [[prepare]]d frame to the driver: (id, vector widened to double,
    * squared norm). O(Q·dim) — the same constant-size precedent as the
    * codebook collect.
    */
  private def collectQueries(frame: DataFrame,
      queryPred: Column): Array[(Long, Array[Double], Double)] = {
    val rows = frame.filter(queryPred).select("id", "v", "nrm").collect()
    require(rows.length <= 100000,
      s"${rows.length} query rows: the query side is broadcast and " +
        "driver-computed; batch queries beyond 100k instead")
    rows.map { r =>
      (r.getLong(0),
        r.getSeq[Number](1).map(_.doubleValue()).toArray,
        r.getDouble(2))
    }
  }

  /** Driver-computed flattened m×k ADC table (entry s·k + j): d2
    * summed left-to-right then rounded — bit-identical to the
    * [[graft.functions.PqEncode]] arithmetic and the oracle.
    */
  private def driverDTable(qv: Array[Double], cents: Seq[Centroid],
      m: Int, sub: Int): Array[Double] =
    (for (s <- 0 until m; j <- cents.indices) yield {
      var d2 = 0d
      var d = 0
      while (d < sub) {
        val x = qv(s * sub + d) - cents(j).v(s * sub + d)
        d2 += x * x
        d += 1
      }
      rnd6(d2)
    }).toArray

  /** Per-subspace argmin codes: (rounded d2 asc, j asc) tie-break,
    * matching the oracle's row_number(ORDER BY d2, j). Runs through the
    * custom [[graft.functions.PqEncode]] expression — the composed
    * struct-least form unrolled O(m·k·sub) Java statements and blew
    * janino's 64 KB method limit (uncached failure + interpreted
    * fallback, re-paid EVERY execution); the expression emits
    * constant-size loops, so any codebook geometry compiles.
    */
  private def pqCodes(cents: Seq[Centroid], m: Int, sub: Int): Column = {
    val dim = m * sub
    val flat = new Array[Double](cents.size * dim)
    for (j <- cents.indices; i <- 0 until dim)
      flat(j * dim + i) = cents(j).v(i)
    graft.functions.GraftFunctions.pq_encode(col("v"), flat, cents.size,
      m, sub)
  }

  /** ADC score from `codes` (corpus side) and `dtable` (query side):
    * m table lookups summed. UNROLLED over the statically-known m —
    * higher-order functions run interpreted per row, and this sits on
    * the hottest path of the scan (measured 1M×10 pairs: the
    * `aggregate` fold was a large chunk of search wall); the unrolled
    * element_at chain stays inside whole-stage codegen. Left-to-right
    * reduce keeps the fold's exact addition order (oracle-identical).
    */
  private def pqAdc(m: Int, kC: Int): Column = round(
    (0 until m).map(s =>
      element_at(col("dtable"),
        element_at(col("codes"), s + 1) + (s * kC + 1)))
      .reduce(_ + _), 6)

  /** IVF-PQ — the full 100 TB ANN shape: a coarse quantizer restricts
    * each query to `nprobe` posting lists (sub-linear scan), and WITHIN
    * the probed lists scoring runs over PQ byte codes via ADC lookups
    * (memory-resident codes), with the exact float re-rank only on the
    * shortlist. [[topKIvf]]'s list structure + [[topKPq]]'s scoring —
    * both codebooks are the deterministic hash-ordered sample, so the
    * composed index is still DuckDB-reproducible end to end.
    *
    * Plan shape: coarse assignment and PQ codes are projections against
    * literal centroids; the only join is the keyed equijoin on
    * `list_id` against the broadcast probe side; top-k is a
    * group-limited rank window.
    */
  /** A built IVF-PQ index: both codebooks plus the coded corpus
    * (id, v, nrm, list_id, codes). In production `coded` is what you
    * MATERIALIZE — write it partitioned by `list_id` (the floats ride
    * along here for the in-place re-rank; a storage-tiered deployment
    * would keep them in a separate table fetched per shortlist) — and
    * the build cost (the expensive per-row code assignment) is paid
    * once, not per query batch. [[AnnSmoke]] measures exactly this
    * split.
    */
  final case class IvfPqIndex(coarse: Seq[Centroid], pq: Seq[Centroid],
      m: Int, sub: Int, coded: DataFrame, residual: Boolean = false)

  /** Build the IVF-PQ index frame: coarse list assignment + PQ codes,
    * both pure projections against literal codebooks.
    *
    * `residual = true` is the RECOMMENDED DEFAULT for clustered
    * corpora — the realistic embedding regime: raw-vector codes see
    * only the dominant centroid component and collapse every member
    * of a tight cluster to the same bytes (AnnSmoke measured overlap
    * 0.013 at 1M clustered vectors — random-pick floor), while
    * residual codes quantize `v − coarse[list(v)]` and span exactly
    * the within-list geometry ADC ranks (Jégou et al. §IV.B; FAISS
    * IndexIVFPQ default). It stays `false` by default here only for
    * compatibility with raw-mode oracles and persisted indexes;
    * `ResidualPqSpec` pins the recall rescue, the persisted round
    * trip, and append semantics.
    */
  def buildIvfPq(emb: DataFrame, idCol: String, vecCol: String,
      numCentroids: Int = 32, m: Int = 8,
      pqCentroids: Int = 16,
      coarseCodebook: Option[Seq[Centroid]] = None,
      pqCodebook: Option[Seq[Centroid]] = None,
      residual: Boolean = false): Option[IvfPqIndex] = {
    require(m >= 1, s"m=$m must be >= 1")
    val dim = probeDim(emb, vecCol)
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val sub = dim / m
    // fail fast on caller-supplied codebooks of the wrong geometry —
    // mirrors appendIvfPq's dim check: a shorter centroid would throw an
    // opaque ArrayIndexOutOfBounds deep in pqCodes/nearestCid, a longer
    // one would silently truncate and degrade every list assignment
    requireCodebookDim(coarseCodebook, dim, "coarse")
    requireCodebookDim(pqCodebook, dim, "pq")
    val coarse0 = coarseCodebook.getOrElse(
      sampleCodebook(emb, idCol, vecCol, numCentroids))
    // residual mode re-keys coarse cids to POSITIONS (0..C-1): the
    // encode expression indexes the flat coarse array by list_id
    // directly, and the persisted layout round-trips positions via
    // `pos` anyway. Raw mode keeps sample-row ids (oracle parity).
    val coarse = if (residual)
      coarse0.zipWithIndex.map { case (c, i) => c.copy(cid = i.toLong) }
    else coarse0
    val pqCents = pqCodebook.getOrElse(
      if (residual) sampleResidualCodebook(emb, idCol, vecCol,
        pqCentroids, coarse)
      else sampleCodebook(emb, idCol, vecCol, pqCentroids))
    if (coarse.isEmpty || pqCents.isEmpty) None
    else Some(IvfPqIndex(coarse, pqCents, m, sub,
      encodeIvfPq(emb, idCol, vecCol, coarse, pqCents, m, sub, residual),
      residual))
  }

  /** Residual-space sample codebook: the same deterministic hash-order
    * sample as [[sampleCodebook]], with each sample replaced by its
    * offset from its own nearest coarse centroid. Raw-vector PQ
    * centroids are the WRONG scale for residual codes (residual norm ≪
    * corpus norm on clustered data — every residual would collapse to
    * the centroid nearest the origin); sampling in residual space puts
    * the codebook where the codes live. Driver-side: C·dim work over
    * `numCentroids` collected rows.
    */
  private def sampleResidualCodebook(emb: DataFrame, idCol: String,
      vecCol: String, numCentroids: Int,
      coarse: Seq[Centroid]): Seq[Centroid] = {
    if (coarse.isEmpty) return Seq.empty
    // over-sample past the coarse rows: the hash-order sample is
    // DETERMINISTIC, so the first `coarse.size` rows ARE the default
    // coarse centroids — their residuals are exactly zero (each row's
    // nearest centroid is itself), and a zero codebook collapses every
    // vector to one code (the original raw-mode failure, re-created).
    // Dropping zero-norm residuals also covers a caller-supplied
    // coarse codebook that happens to contain sample rows.
    val all = sampleCodebook(emb, idCol, vecCol,
      coarse.size + numCentroids).map { c =>
      val near = nearestCoarseDriver(c.v, c.nrm, coarse)
      val r = Array.tabulate(c.v.length)(i => c.v(i) - near.v(i))
      Centroid(c.cid, r, r.foldLeft(0d)((a, x) => a + x * x))
    }
    val nonZero = all.filter(_.nrm > 0).take(numCentroids)
    // degenerate corpus (every row is a centroid): keep the zero
    // codebook rather than none — search still works via the exact
    // re-rank, codes just carry no signal
    if (nonZero.nonEmpty) nonZero else all.take(numCentroids)
  }

  /** Driver-side mirror of [[nearestCid]]'s assignment (rounded cosine
    * desc, cid asc tie-break) for the handful of collected sample /
    * query rows residual mode handles on the driver.
    */
  private def nearestCoarseDriver(v: Array[Double], nrm: Double,
      coarse: Seq[Centroid]): Centroid = {
    val sq = math.sqrt(nrm)
    coarse.map { c =>
      var dp = 0d
      var i = 0
      val n = math.min(v.length, c.v.length)
      while (i < n) { dp += v(i) * c.v(i); i += 1 }
      (rnd6(dp / (sq * math.sqrt(c.nrm))), c)
    }.minBy { case (cos, c) => (-cos, c.cid) }._2
  }

  /** The index-build projection on its own: coarse list assignment +
    * PQ codes against GIVEN (frozen) codebooks — what an incremental
    * ingest runs on new vectors to extend an existing index without
    * retraining ([[AnnIndex.appendIvfPq]]). Pure projections, no join,
    * no shuffle.
    */
  def encodeIvfPq(emb: DataFrame, idCol: String, vecCol: String,
      coarse: Seq[Centroid], pqCents: Seq[Centroid], m: Int,
      sub: Int, residual: Boolean = false): DataFrame = {
    val assigned = prepare(emb, idCol, vecCol)
      .withColumn("list_id", nearestCid(coarse, col("v"), col("nrm")))
    if (!residual) assigned.withColumn("codes", pqCodes(pqCents, m, sub))
    else {
      // residual codes index the flat coarse array by list_id — the
      // position re-keying buildIvfPq applies is a hard precondition
      require(coarse.zipWithIndex.forall { case (c, i) => c.cid == i },
        "residual encoding requires coarse cids re-keyed to positions " +
          "(build the index with residual = true)")
      val dim = m * sub
      def flat(cs: Seq[Centroid]): Array[Double] = {
        val a = new Array[Double](cs.size * dim)
        for (j <- cs.indices; i <- 0 until dim) a(j * dim + i) = cs(j).v(i)
        a
      }
      assigned.withColumn("codes",
        graft.functions.GraftFunctions.pq_encode_residual(col("v"),
          col("list_id"), flat(coarse), flat(pqCents), pqCents.size, m,
          sub))
    }
  }

  /** Search a built index: probes + ADC scoring + exact re-rank. The
    * query side re-derives its distance table from the index's own
    * rows (queries are corpus members selected by `queryPred`).
    *
    * Shuffle discipline (the measured 1M-vector lesson, see
    * [[AnnSmoke]]): the candidate-rank exchange carries ONLY
    * (query_id, id, adc_d2) — the first cut of this plan dragged the
    * 128-double query table and both float vectors through the shuffle
    * per scored PAIR, which at 1M×10 pairs was ~1.3 GB of exchange for
    * 8 bytes of useful score. Float vectors are joined back for the
    * k·candFactor shortlist only (keyed equijoins; the unused `codes`/
    * `list_id` projections prune out of the fetch subtree), exactly
    * the "codes scanned, floats fetched per shortlist row" layout the
    * index ships at 100 TB.
    */
  def searchIvfPq(idx: IvfPqIndex, queryPred: Column, k: Int,
      nprobe: Int = 3, candFactor: Int = 3): DataFrame =
    searchIvfPqCore(idx, collectQueries(idx.coded, queryPred), k,
      nprobe, candFactor, excludeSelf = true)

  /** Query-by-VECTOR search over a built index — the serving shape a
    * retrieval stack actually calls (the query embedding comes from a
    * model, not from the corpus): same probes/ADC/re-rank machinery as
    * [[searchIvfPq]] with the caller-supplied (query_id, vector)
    * pairs standing in for the collected corpus rows. No
    * self-exclusion — external query ids live in their own space, and
    * excluding a corpus id that happens to collide would silently
    * drop a true neighbor. Output shape identical.
    */
  def searchIvfPqVectors(idx: IvfPqIndex,
      queries: Seq[(Long, Array[Double])], k: Int,
      nprobe: Int = 3, candFactor: Int = 3): DataFrame = {
    require(queries.nonEmpty, "queries must be non-empty")
    val dim = idx.m * idx.sub
    val qs = queries.map { case (qid, v) =>
      require(v.length == dim,
        s"query $qid dim ${v.length} does not match index dim $dim")
      val nrm = v.foldLeft(0d)((a, x) => a + x * x)
      // a zero vector has no direction: every cosine is NaN and the
      // ranking degenerates silently — fail loudly instead
      require(nrm > 0d, s"query $qid is the zero vector")
      (qid, v, nrm)
    }.toArray
    searchIvfPqCore(idx, qs, k, nprobe, candFactor,
      excludeSelf = false)
  }

  private def searchIvfPqCore(idx: IvfPqIndex,
      qs: Array[(Long, Array[Double], Double)], k: Int,
      nprobe: Int, candFactor: Int, excludeSelf: Boolean): DataFrame = {
    require(k >= 1 && candFactor >= 1 && nprobe >= 1,
      s"k=$k, candFactor=$candFactor, nprobe=$nprobe must be >= 1")
    // The search path must contain NO literal-codebook expressions:
    // the first cut inlined them into the probe/scan stages and
    // measured 4-8× SLOWER than brute force at 1M×10 — the generated
    // methods blew past janino's compile limit ("Failed to compile …
    // processNext()"), costing seconds of driver compile time and
    // silently dropping hot stages to interpreted execution. Queries
    // are FEW by construction (they broadcast), so probe lists and the
    // per-query ADC distance table are computed driver-side from the
    // collected query rows — O(Q·dim) to the driver, the same
    // constant-size precedent as the codebook collect itself — and ship
    // back as DATA in tiny broadcast frames. The scan-side ADC is then
    // just m element_at lookups into the joined dtable column (a small
    // expression that codegens at any m·k), the fused join+project
    // never materializes the table per pair, and only (query_id, id,
    // adc_d2) enters the candidate-rank exchange. Measured at 1M×100
    // (AnnSmoke): 1.6× brute force on an in-memory dim-64 corpus —
    // the regime where brute is STRONGEST; on disk-resident corpora
    // the 32× IO cut is the dominant term.
    val spark = idx.coded.sparkSession
    import spark.implicits._
    // coarse probes: rounded cosine desc, cid asc — identical to the
    // centStructs/oracle ranking
    val probeRows = qs.flatMap { case (qid, qv, qn) =>
      idx.coarse.map { c =>
        val cos = rnd6(
          qv.lazyZip(c.v).foldLeft(0d)((a, p) => a + p._1 * p._2) /
            (math.sqrt(qn) * math.sqrt(c.nrm)))
        (qid, c.cid, cos)
      }.sortBy { case (_, cid, cos) => (-cos, cid) }
        .take(nprobe).map { case (qid2, cid, _) => (qid2, cid) }
    }.toSeq
    // flattened m×k ADC table per query (entry s·k + j): rides the
    // broadcast probe frame as DATA, so the scan-side ADC is just m
    // element_at lookups (a tiny expression that stays in codegen), and
    // the fused join+project never materializes the table per pair —
    // the alternative explode-and-equijoin shape was measured 8× the
    // row volume through an extra exchange for nothing.
    val probeFrame = (if (idx.residual) {
      // residual ADC: the table is per (query, LIST) — distances of
      // (q − coarse[list]) to the residual codebook, so ADC approximates
      // ‖q − (coarse[list] + r̂_x)‖² for rows of that list. The probe
      // frame already carries one row per (query, list); the table just
      // stops being constant across a query's probes. Driver cost grows
      // nprobe× (still O(Q·nprobe·m·k·sub), trivially driver-sized).
      val coarseByCid = idx.coarse.map(c => c.cid -> c.v).toMap
      val qvById = qs.map { case (qid, qv, _) => qid -> qv }.toMap
      probeRows.map { case (qid, lid) =>
        val qv = qvById(qid); val cv = coarseByCid(lid)
        val r = Array.tabulate(qv.length)(i => qv(i) - cv(i))
        (qid, lid, driverDTable(r, idx.pq, idx.m, idx.sub))
      }
    } else {
      val dtableByQ = qs.map { case (qid, qv, _) =>
        qid -> driverDTable(qv, idx.pq, idx.m, idx.sub)
      }.toMap
      probeRows.map { case (qid, lid) => (qid, lid, dtableByQ(qid)) }
    }).toDF("query_id", "list_id", "dtable")
    // STATIC posting-list pruning: the probed list ids are already
    // driver-side, so the scan carries an explicit `list_id IN (…)`
    // filter. Semantically redundant with the equijoin (the join only
    // matches probed lists anyway), but against a PERSISTED index laid
    // out by list_id ([[AnnIndex.writeIvfPq]]) this is what turns "scan
    // the corpus, join drops the rest" into "read nprobe·Q partitions,
    // never list the corpus" — partition pruning fires at planning
    // time, no DPP needed. The float fetch-back prunes with the same
    // set (every shortlist row lives in a probed list by construction).
    val probedLists = probeRows.map(_._2).distinct
    val probedCoded = idx.coded.filter(col("list_id").isin(probedLists: _*))
    val scored0 = probedCoded.select("id", "list_id", "codes")
      .join(broadcast(probeFrame), Seq("list_id"))
    val scored = (if (excludeSelf)
        scored0.filter(col("id") =!= col("query_id"))
      else scored0)
      .withColumn("adc_d2", pqAdc(idx.m, idx.pq.size))
      .select("query_id", "id", "adc_d2")
    val wCand = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_d2"), col("id"))
    val cand = scored.withColumn("crk", row_number().over(wCand))
      .filter(col("crk") <= k * candFactor)
    val qv = qs.toSeq.map { case (qid, v, nrm) =>
      (qid, v.map(_.toFloat), nrm)
    }.toDF("query_id", "q_v", "q_nrm")
    val rer = cand
      .join(probedCoded.select("id", "v", "nrm"), Seq("id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("cosine",
        round(dot(col("v"), col("q_v")) /
          (sqrt(col("nrm")) * sqrt(col("q_nrm"))), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id"))
    rer.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"),
        col("cosine"), col("adc_d2"))
  }

  def topKIvfPq(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, numCentroids: Int = 32, nprobe: Int = 3,
      m: Int = 8, pqCentroids: Int = 16, candFactor: Int = 3,
      residual: Boolean = false): DataFrame =
    buildIvfPq(emb, idCol, vecCol, numCentroids, m, pqCentroids,
        residual = residual) match {
      case None =>
        require(k >= 1 && candFactor >= 1 && nprobe >= 1,
          s"k=$k, candFactor=$candFactor, nprobe=$nprobe must be >= 1")
        topKBruteForce(emb, idCol, vecCol, queryPred, k)
          .withColumn("adc_d2", lit(null).cast("double"))
      case Some(idx) =>
        // build-then-search even in the convenience form: the coded
        // frame is persisted so the expensive code-assignment build
        // evaluates once, not once per downstream job (the search
        // collects queries, scans for candidates, and joins floats
        // back — three consumers of the same build). House cache rule:
        // the (Q·k-row) result is eagerly materialized and the build
        // cache released in finally — nothing outlives the call.
        val coded = idx.coded.persist()
        try Dedup.materialize(
          searchIvfPq(idx.copy(coded = coded), queryPred, k, nprobe,
            candFactor))
        finally coded.unpersist(blocking = false)
    }

  /** Multi-table LSH top-k — the production recall fix: L independent
    * hash tables with FEWER bits each; a candidate only needs to collide
    * with the query in ANY table. Recall ≈ 1-(1-p^bits)^L vs p^bits for
    * one long signature, at the cost of scanning L buckets. Candidate
    * generation stays equijoin-shaped (explode per table, join on
    * (table, bucket)) — never an OR-join nested loop.
    */
  def topKLshMulti(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, tables: Int = 4, bits: Int = 4): DataFrame = {
    val dim = probeDim(emb, vecCol)
    val e = prepare(emb, idCol, vecCol)
      .withColumn("buckets",
        array((0 until tables).map(l => lshBucketFor(col("v"), l, bits, dim)): _*))
    val corpusB = e.select(col("id"),
      posexplode(col("buckets")).as(Seq("tbl", "bucket")))
    val queryB = e.filter(queryPred).select(col("id").as("query_id"),
      posexplode(col("buckets")).as(Seq("tbl", "bucket")))
    val cand = corpusB.join(broadcast(queryB), Seq("tbl", "bucket"))
      .filter(col("id") =!= col("query_id"))
      .select("query_id", "id").distinct()
    val scored = cand
      .join(e.select(col("id"), col("v"), col("nrm")), "id")
      .join(broadcast(e.filter(queryPred).select(col("id").as("query_id"),
        col("v").as("qv"), col("nrm").as("qn"))), "query_id")
      .withColumn("cosine",
        round(dot(col("v"), col("qv")) / (sqrt(col("nrm")) * sqrt(col("qn"))), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"),
        col("cosine"))
  }

  /** IVF (inverted-file) approximate top-k — the coarse-quantizer scale
    * path: the corpus is partitioned into posting lists by nearest
    * centroid; a query scores only the `nprobe` lists whose centroids
    * are closest to it.
    *
    * Centroid selection is a FIXED-size deterministic sample: the
    * `numCentroids` corpus vectors whose id-hash orders first
    * (`ORDER BY md5(id), id LIMIT C` — a TakeOrderedAndProject, i.e.
    * per-partition top-C then a C-row merge, never a global sort).
    * C is constant in corpus size, so assignment is O(N·C) dot products
    * against the collected, plan-inlined codebook — unlike a
    * step-subsample, whose centroid count grows with N and makes
    * assignment quadratic. A production build would run k-means and persist the
    * codebook + list assignment once, after which every query is
    * posting-list-local (at 100 TB: lists are the partition key of the
    * materialized index table — a query reads nprobe partitions, never
    * the corpus).
    */
  /** A collected IVF codebook entry: list id, centroid vector, squared
    * norm. Constant-size driver-held metadata (like any k-means model).
    */
  final case class Centroid(cid: Long, v: Array[Double], nrm: Double)

  /** (cosine, -cid) struct per centroid: struct max / descending sort
    * give cosine-desc with cid-asc tie-break, matching the oracle's
    * row_number(ORDER BY ccos DESC, cid). Codegen'd literal dots.
    */
  private def centStructs(cents: Seq[Centroid], vc: Column,
      nc: Column): Seq[Column] = cents.map { c =>
    struct(
      round(dot(vc, lit(c.v)) / (sqrt(nc) * sqrt(lit(c.nrm))), 6).as("ccos"),
      lit(-c.cid).as("negcid"))
  }

  /** Nearest-centroid id as a pure projection (no join, no shuffle).
    * Runs through the custom loop-codegen
    * [[graft.functions.NearestCentroid]] — the `greatest` chain over C
    * centroid structs was the second janino 64 KB casualty (the IVF-PQ
    * build dropped to interpreted execution, 25× slower at 1M rows);
    * arithmetic and tie-breaks are identical to [[centStructs]]'
    * struct-max, which remains for the per-QUERY probe ranking where Q
    * is small.
    */
  private def nearestCid(cents: Seq[Centroid], vc: Column, nc: Column): Column = {
    val dim = cents.head.v.length
    val flat = new Array[Double](cents.size * dim)
    for (j <- cents.indices; i <- 0 until dim)
      flat(j * dim + i) = cents(j).v(i)
    graft.functions.GraftFunctions.nearest_centroid(vc, flat,
      cents.map(_.nrm).toArray, cents.map(_.cid).toArray, dim)
  }

  /** IVF search against a collected codebook: assignment is a projection
    * (C codegen dots per row), probing a keyed broadcast hash join —
    * no nested-loop/cartesian node anywhere, task binaries carry C·dim
    * doubles, constant in N.
    */
  private def ivfSearch(e: DataFrame, queryPred: Column, k: Int,
      nprobe: Int, cents: Seq[Centroid]): DataFrame = {
    val assigned = e.withColumn("list_id",
      nearestCid(cents, col("v"), col("nrm")))
    // probes: nprobe nearest centroids per query — top-nprobe of the same
    // struct array, again expression-only
    val probes = e.filter(queryPred)
      .withColumn("pc", explode(slice(
        reverse(array_sort(array(centStructs(cents, col("v"), col("nrm")): _*))),
        1, nprobe)))
      .select(col("id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), (-col("pc.negcid")).as("list_id"))
    // scan only the probed posting lists: keyed equijoin, broadcast the
    // (small by construction) query side
    val scored = assigned.join(broadcast(probes), Seq("list_id"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cosine",
        round(dot(col("v"), col("qv")) / (sqrt(col("nrm")) * sqrt(col("qn"))), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"),
        col("cosine"))
  }

  /** Deterministic sample codebook: the `numCentroids` corpus vectors
    * whose id-hash orders first (`ORDER BY md5(id), id LIMIT C` — a
    * TakeOrderedAndProject, i.e. per-partition top-C then a C-row merge,
    * never a global sort). Engine-independent, so the DuckDB oracle
    * reproduces it exactly.
    */
  def sampleCodebook(emb: DataFrame, idCol: String, vecCol: String,
      numCentroids: Int): Seq[Centroid] =
    prepare(emb, idCol, vecCol)
      .orderBy(md5(col("id").cast("string")), col("id"))
      .limit(numCentroids)
      .select(col("id").cast("long"), col("v"), col("nrm"))
      .collect().toSeq
      .map(r => Centroid(r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray, r.getDouble(2)))

  /** [[prepare]]d frame plus a `cluster_id` column: nearest centroid of
    * the collected codebook, as a pure loop-codegen projection (no join,
    * no shuffle — the same assignment [[topKIvf]]/[[buildIvfPq]] use).
    * Tie-break is rounded-cosine desc then cid asc, identical to the
    * oracle's `row_number(ORDER BY ccos DESC, cid)`. Public so
    * cluster-shaped operators (e.g. [[Dedup.semDedup]]) can share the
    * quantizer without re-deriving it.
    */
  def assignClusters(emb: DataFrame, idCol: String, vecCol: String,
      cents: Seq[Centroid]): DataFrame =
    prepare(emb, idCol, vecCol)
      .withColumn("cluster_id", nearestCid(cents, col("v"), col("nrm")))

  def topKIvf(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, numCentroids: Int = 32,
      nprobe: Int = 3): DataFrame = {
    // The codebook is collected once — C rows, constant in corpus size
    // (exactly what a k-means IVF build materializes; see
    // [[kmeansCodebook]] for the trained variant).
    val cents = sampleCodebook(emb, idCol, vecCol, numCentroids)
    if (cents.isEmpty)
      return topKBruteForce(emb, idCol, vecCol, queryPred, k)
    ivfSearch(prepare(emb, idCol, vecCol), queryPred, k, nprobe, cents)
  }

  /** Spherical k-means (Lloyd) codebook — the production IVF build path.
    * Each iteration is ONE distributed pass: assignment is the inlined
    * argmax projection (no join), and the centroid update aggregates the
    * vectors ELEMENT-WISE on primitive double buffers (`aggregateByKey`:
    * one vector add per row, map-side combine collapses each task to ≤C
    * buffers of dim+1 doubles), so shuffle volume per iteration is
    * O(tasks·C·dim), independent of corpus row count — and the plan is
    * constant-size in `dim` (the previous per-dimension `element_at`
    * sums created dim aggregate expressions, blowing up plan/codegen at
    * dim ≳ 1k). Cosine is scale-invariant, so the mean update IS the
    * spherical k-means update.
    *
    * Determinism: init is farthest-first over a hash-ordered sample
    * (engine-independent); subsequent iterations sum across partitions
    * in float, so codebooks are
    * reproducible only per partitioning — fine for an index build (the
    * codebook is materialized once and shipped with the index), not for
    * cross-engine oracles, which is why the registered `sim_topk_ivf`
    * query keeps the sample codebook.
    *
    * Empty clusters keep their previous centroid (standard Lloyd
    * fallback).
    */
  /** Farthest-first (k-means++-style) seed selection on a small sample,
    * driver-side: start from the first hash-ordered vector, repeatedly
    * add the sample vector whose best cosine to the chosen set is worst.
    * Deterministic (hash order breaks ties); avoids the classic Lloyd
    * failure of two seeds landing in one cluster, which a plain sample
    * init cannot recover from.
    */
  private def farthestFirstInit(sample: Seq[Centroid], k: Int): Seq[Centroid] = {
    if (sample.isEmpty) return Nil
    def cos(a: Centroid, b: Centroid): Double = {
      val denom = math.sqrt(a.nrm * b.nrm)
      if (denom == 0) 0.0
      else a.v.lazyZip(b.v).map(_ * _).sum / denom
    }
    val chosen = collection.mutable.ArrayBuffer(sample.head)
    var rest = sample.tail
    while (chosen.size < k && rest.nonEmpty) {
      val next = rest.minBy(c => chosen.map(cos(c, _)).max)
      chosen += next
      rest = rest.filterNot(_.cid == next.cid)
    }
    chosen.toSeq.zipWithIndex.map { case (c, i) => c.copy(cid = i.toLong) }
  }

  def kmeansCodebook(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): Seq[Centroid] = {
    require(k > 0 && iters >= 0, s"need k>0, iters>=0; got k=$k iters=$iters")
    val dim = probeDim(emb, vecCol)
    val e = prepare(emb, idCol, vecCol)
    // seeds: farthest-first over an 8k-point hash-ordered sample (one
    // TakeOrderedAndProject job + driver-side greedy), re-keyed 0..C-1
    var cents = farthestFirstInit(
      sampleCodebook(emb, idCol, vecCol, math.max(8 * k, k)), k)
    if (cents.isEmpty) return cents
    for (_ <- 1 to iters) {
      // slot dim holds the row count; slots 0..dim-1 the element sums
      val agg = e
        .withColumn("list_id", nearestCid(cents, col("v"), col("nrm")))
        .select(col("list_id").cast("long"), col("v"))
        .rdd
        .map(r => (r.getLong(0), r.getSeq[Float](1)))
        .aggregateByKey(new Array[Double](dim + 1))(
          (acc, v) => {
            val n = math.min(dim, v.length)
            var j = 0
            while (j < n) { acc(j) += v(j); j += 1 }
            acc(dim) += 1.0
            acc
          },
          (a, b) => {
            var j = 0
            while (j <= dim) { a(j) += b(j); j += 1 }
            a
          })
        .collect()
      val updated = agg.map { case (cid, s) =>
        val n = s(dim)
        val v = Array.tabulate(dim)(j => s(j) / n)
        cid -> Centroid(cid, v, v.map(x => x * x).sum)
      }.toMap
      cents = cents.map(c => updated.getOrElse(c.cid, c))
    }
    cents
  }

  /** Per-subspace k-means (Lloyd) PQ codebook — the production PQ
    * build path ([[sampleCodebook]] is the oracle-parity default; a
    * trained codebook cuts quantization error, which is what ADC
    * candidate quality — and therefore recall at fixed candFactor —
    * depends on at production scale).
    *
    * Returns the STITCHED flat form every PQ consumer
    * ([[topKPq]]/[[buildIvfPq]] via `codebook`/`pqCodebook`) already
    * reads: entry j is a full-dim vector whose subspace-s slice
    * `[s·sub, (s+1)·sub)` is centroid j of subspace s's independent
    * codebook — the m codebooks ride one `Seq[Centroid]` with no new
    * index type.
    *
    * Cost shape: each iteration is ONE `treeAggregate` pass over the
    * corpus; per row the closure does m argmin scans against the
    * broadcast codebook (m·kC·sub flops — identical work to the
    * [[graft.functions.PqEncode]] projection) and accumulates into a
    * per-partition `m·kC·(sub+1)` primitive double buffer (element
    * sums + count), so shuffle volume per iteration is
    * O(tasks·dim·kC) doubles, independent of corpus row count — the
    * same budget as [[kmeansCodebook]].
    *
    * Determinism: init is [[farthestFirstInit]] over the hash-ordered
    * sample — the same seeding as [[kmeansCodebook]], and load-bearing
    * here too: a plain first-C sample of a skewed corpus seeds every
    * centroid inside the dominant blob, and Lloyd can never split a
    * far cluster once one centroid has absorbed it (the classic local
    * minimum; measured on the KmeansSpec skewed fixture — sample-init
    * recall never improved). Iterations sum across partitions in
    * double, so trained codebooks are reproducible per partitioning —
    * fine for an index build, not for cross-engine oracles (why the
    * registered `sim_topk_pq` / `sim_topk_ivfpq` queries stay on the
    * sample codebook). Argmin tie-break is strict-less (lowest j
    * wins), identical to PqEncode's `ORDER BY d2, j`. Empty codes
    * keep their previous centroid (standard Lloyd fallback).
    */
  def kmeansPqCodebook(emb: DataFrame, idCol: String, vecCol: String,
      m: Int, numCentroids: Int, iters: Int): Seq[Centroid] = {
    require(m >= 1 && numCentroids > 0 && iters >= 0,
      s"need m>=1, numCentroids>0, iters>=0; got m=$m " +
        s"numCentroids=$numCentroids iters=$iters")
    val dim = probeDim(emb, vecCol)
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val sub = dim / m
    val init = farthestFirstInit(
      sampleCodebook(emb, idCol, vecCol,
        math.max(8 * numCentroids, numCentroids)), numCentroids)
    if (init.isEmpty) return Nil
    val kC = init.size
    // flat(s)(j*sub + d) = component d of centroid j in subspace s
    var flat: Array[Array[Double]] = Array.tabulate(m)(s =>
      Array.tabulate(kC * sub)(i => init(i / sub).v(s * sub + i % sub)))
    if (iters > 0) {
      // corpus widened to double ONCE and reused across iterations;
      // rows shorter than dim (never the case for a real embedding
      // table) zero-pad via the min guard below
      val rows = prepare(emb, idCol, vecCol).select("v").rdd
        .map { r =>
          val s = r.getSeq[Number](0)
          val v = new Array[Double](dim)
          val n = math.min(dim, s.length)
          var i = 0
          while (i < n) { v(i) = s(i).doubleValue(); i += 1 }
          v
        }
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        for (_ <- 1 to iters) {
          val sc = emb.sparkSession.sparkContext
          val bc = sc.broadcast(flat)
          // buffer layout: block (s*kC + j) holds sub element sums
          // then the assigned-row count at offset sub
          val agg = rows.treeAggregate(
            new Array[Double](m * kC * (sub + 1)))(
            (acc, v) => {
              val cb = bc.value
              var s = 0
              while (s < m) {
                val cbS = cb(s)
                var best = 0
                var bestD = Double.MaxValue
                var j = 0
                while (j < kC) {
                  var d2 = 0d
                  var d = 0
                  while (d < sub) {
                    val x = v(s * sub + d) - cbS(j * sub + d)
                    d2 += x * x
                    d += 1
                  }
                  if (d2 < bestD) { bestD = d2; best = j }
                  j += 1
                }
                val base = (s * kC + best) * (sub + 1)
                var d = 0
                while (d < sub) { acc(base + d) += v(s * sub + d); d += 1 }
                acc(base + sub) += 1.0
                s += 1
              }
              acc
            },
            (a, b) => {
              var i = 0
              while (i < a.length) { a(i) += b(i); i += 1 }
              a
            })
          bc.destroy()
          flat = Array.tabulate(m) { s =>
            val prev = flat(s)
            Array.tabulate(kC * sub) { i =>
              val j = i / sub
              val d = i % sub
              val base = (s * kC + j) * (sub + 1)
              val n = agg(base + sub)
              if (n > 0) agg(base + d) / n else prev(i)
            }
          }
        }
      } finally rows.unpersist(blocking = false)
    }
    (0 until kC).map { j =>
      val v = Array.tabulate(dim)(i => flat(i / sub)(j * sub + i % sub))
      Centroid(j.toLong, v, v.map(x => x * x).sum)
    }
  }

  /** IVF search against a k-means-trained codebook (see
    * [[kmeansCodebook]] for determinism scope).
    */
  def topKIvfKmeans(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, numCentroids: Int = 32, iters: Int = 5,
      nprobe: Int = 3): DataFrame = {
    val cents = kmeansCodebook(emb, idCol, vecCol, numCentroids, iters)
    if (cents.isEmpty)
      return topKBruteForce(emb, idCol, vecCol, queryPred, k)
    ivfSearch(prepare(emb, idCol, vecCol), queryPred, k, nprobe, cents)
  }

  /** Approximate top-k: only corpus vectors in the query's LSH bucket are
    * scored. Same output shape as [[topKBruteForce]].
    */
  def topKLsh(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int): DataFrame = {
    val e = prepare(emb, idCol, vecCol)
      .withColumn("bucket", lshBucket(col("v"), probeDim(emb, vecCol)))
    val q = e.filter(queryPred)
      .select(col("id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("bucket"))
    val scored = e.join(broadcast(q), Seq("bucket"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cosine",
        round(dot(col("v"), col("qv")) / (sqrt(col("nrm")) * sqrt(col("qn"))), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id").as("neighbor_id"),
        col("cosine"))
  }
}
