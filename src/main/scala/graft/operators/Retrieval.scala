package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse + dense text retrieval over the document corpus — the search-side
  * counterpart of the dedup/ANN family: BM25 (Robertson/Sparck Jones) lexical
  * top-k, dense rerank of a sparse candidate set, and reciprocal-rank fusion
  * of two rankings (Cormack et al. 2009). North-star scope: candidate
  * generation and retrieval-based filtering for training-data pipelines
  * (e.g. pulling benchmark-adjacent documents for inspection, RAG corpus
  * construction).
  *
  * Scale shape: corpus statistics (N, total doc length, per-term document
  * frequencies) are ONE full-scan aggregation producing a single narrow row
  * that rides back in as a broadcast; scoring is then map-side (per-row
  * arithmetic over the doc's own token array — no explode, no per-token
  * shuffle), and selection is sort+limit which Spark compiles to
  * TakeOrderedAndProject (per-partition top-N + bounded merge). The only
  * full pass at 100 TB is the two scans (stats, score); nothing shuffles on
  * a per-token key.
  *
  * Determinism/cross-engine notes: token counts, document lengths and
  * document frequencies are exact integers; `avgdl` is one exact-integer
  * division; per-term IDF is the only transcendental (`ln`) and is rounded
  * to 6 decimals immediately so at most |terms| values (not |corpus| scores)
  * sit near a rounding boundary; the per-document score is a fixed
  * left-to-right sum over the literal term list, bit-stable across engines.
  */
object Retrieval {

  /** Exact BM25 top-k for a literal query-term list. Returns
    * `(doc_id, bm25, rank)`, rank dense on (score desc, id asc), only
    * documents containing at least one query term (standard retrieval
    * semantics — a zero-overlap document is not a result).
    *
    * k1/b are the classic defaults. IDF is the Lucene-style non-negative
    * variant `ln(1 + (N - df + 0.5)/(df + 0.5))`.
    */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25TopK: need at least one query term")
    require(terms.distinct.size == terms.size, "bm25TopK: query terms must be distinct")
    val tok = docs.select(col(idCol).as("doc_id"),
      filter(split(coalesce(col(textCol), lit("")), " "), t => length(t) > lit(0)).as("w"))
      .withColumn("dl", size(col("w")).cast("long"))
    // one full-scan aggregation → a single narrow stats row (N, Σdl, df_i…)
    val aggCols = Seq(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl")) ++
      terms.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(col("w"), t), 1L).otherwise(0L)).as(s"df_$i")
      }
    val stats = tok.agg(aggCols.head, aggCols.tail: _*)
    val termsArr = array(terms.map(lit): _*)
    val cand = tok.where(arrays_overlap(col("w"), termsArr))
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs").cast("double"))
    // fixed left-to-right sum over the literal term list — deterministic
    val score = terms.zipWithIndex.foldLeft(lit(0.0)) { case (acc, (t, i)) =>
      val tf = size(filter(col("w"), x => x === lit(t))).cast("double")
      val dfT = col(s"df_$i").cast("double")
      val idf = round(
        log(lit(1.0) + (col("n_docs").cast("double") - dfT + lit(0.5)) / (dfT + lit(0.5))), 6)
      val tfNorm = tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))
      acc + idf * tfNorm
    }
    val scored = cand.select(col("doc_id"), round(score, 6).as("bm25"))
    // sort+limit → TakeOrderedAndProject; rank attached after the bounded merge
    val top = scored.orderBy(col("bm25").desc, col("doc_id").asc).limit(k)
    top.withColumn("rank",
      row_number().over(Window.orderBy(col("bm25").desc, col("doc_id").asc)).cast("int"))
  }

  /** Dense rerank of a sparse candidate set: cosine similarity between one
    * query vector (`queries` filtered to a single row) and each candidate's
    * embedding, top `k` by (sim desc, id). The candidate set is the output
    * of a bounded first stage (e.g. [[bm25TopK]]), so the embedding join
    * probes with a tiny broadcastable side — at 100 TB the dense pass never
    * touches vectors outside the candidate list.
    */
  def denseRerank(
      candidates: DataFrame,   // must carry doc_id
      embeddings: DataFrame,
      vecIdCol: String,
      vecCol: String,
      queryVecId: Long,
      k: Int): DataFrame = {
    val qv = embeddings.where(col(vecIdCol) === queryVecId)
      .select(col(vecCol).cast("array<double>").as("qv"))
    val cand = candidates.select(col("doc_id"))
      .join(embeddings.select(col(vecIdCol).as("doc_id"),
        col(vecCol).cast("array<double>").as("cv")), Seq("doc_id"))
      .where(col("doc_id") =!= queryVecId)
      .crossJoin(broadcast(qv))
      .select(col("doc_id"), round(Similarity.cosine(col("qv"), col("cv")), 6).as("sim"))
    val top = cand.orderBy(col("sim").desc, col("doc_id").asc).limit(k)
    top.withColumn("rank",
      row_number().over(Window.orderBy(col("sim").desc, col("doc_id").asc)).cast("int"))
  }

  /** Feature set for the hashed embeddings: the word itself plus a `p:`
    * 3-char-prefix feature, so morphological variants share mass and each
    * token lights up to two buckets — enough structure for late interaction
    * to be non-trivial while staying exactly SQL-statable (`substr` + `md5`
    * arithmetic) for the oracle.
    */
  private def hashFeatures(words: Column): Column =
    flatten(transform(words, w => array(w, concat(lit("p:"), substring(w, 1, 3)))))

  /** Signed feature hashing (Weinberger et al. 2009): bucket = md5 first 7
    * hex digits mod `dim`, sign = md5 8th hex digit parity. Pure map-side
    * HOF expression — the "embedding model" of the maxSim operator, chosen
    * because it is deterministic and byte-identical cross-engine. Swap in
    * real model vectors at the same schema (`array<double>`) for production.
    */
  def hashedEmbedding(words: Column, dim: Int): Column = {
    val fs = hashFeatures(words)
    // hash each feature ONCE (md5 is the expensive leaf): materialize the
    // digest per feature, then derive (bucket, ±1) from the hex string, and
    // only then scatter over the dim positions. The original single-pass
    // formulation re-evaluated md5 inside the per-dimension aggregate —
    // 2·dim digests per feature instead of 1 (r04 measured 7x slower).
    val hx = transform(fs, f => md5(f))
    val bs = transform(hx, h => struct(
      (conv(substring(h, 1, 7), 16, 10).cast("long") % dim).as("b"),
      when(conv(substring(h, 8, 1), 16, 10).cast("long") % 2 === 0, lit(1.0))
        .otherwise(lit(-1.0)).as("s")))
    transform(sequence(lit(0), lit(dim - 1)), j =>
      aggregate(bs, lit(0.0), (acc, e) =>
        acc + when(e.getField("b") === j, e.getField("s")).otherwise(lit(0.0))))
  }

  private[graft] def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The driver-side twin of [[hashedEmbedding]] for a single query token —
    * the query side of MaxSim is a handful of literals, never a scan.
    */
  private[graft] def hashedQueryVec(token: String, dim: Int): Array[Double] = {
    val v = Array.fill(dim)(0.0)
    for (f <- Seq(token, "p:" + token.take(3))) {
      val h = md5Hex(f)
      val b = (java.lang.Long.parseLong(h.substring(0, 7), 16) % dim).toInt
      v(b) += (if (Integer.parseInt(h.substring(7, 8), 16) % 2 == 0) 1.0 else -1.0)
    }
    v
  }

  /** Cosine with an explicit zero-norm guard (a hashed vector whose signs
    * fully cancel is legitimately zero): 0.0 instead of NaN, so rankings
    * stay total and cross-engine.
    */
  private def simSafe(a: Column, b: Column): Column = {
    val vf = graft.functions.VectorFunctions
    when(vf.dotProduct(a, a) === 0.0 || vf.dotProduct(b, b) === 0.0, lit(0.0))
      .otherwise(round(vf.cosineSim(a, b), 6))
  }

  /** ColBERT-style late interaction (Khattab & Zaharia 2020): score(doc) =
    * Σ_q max over the doc's CHUNK embeddings of cos(q, chunk); top-k docs
    * by (score desc, id). Documents are re-chunked every `chunkWords` words
    * and each chunk hashed-embedded map-side, so the whole scoring pass is
    * ONE projection over the corpus (no explode-shuffle, no per-chunk
    * join); selection is sort+limit → TakeOrderedAndProject. At 100 TB the
    * chunk vectors would come precomputed from a model — the operator's
    * plan shape (per-row max-of-sims fold, bounded top-k) is unchanged.
    */
  def maxSimTopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTokens: Seq[String],
      k: Int,
      chunkWords: Int = 32,
      dim: Int = 16): DataFrame = {
    require(queryTokens.nonEmpty, "maxSimTopK: need at least one query token")
    require(queryTokens.distinct.size == queryTokens.size, "maxSimTopK: tokens must be distinct")
    // the whole scoring loop is ONE codegen'd kernel pass per row
    // (MaxSimScoreExpr) — the interpreted HOF formulation
    // ([[maxSimScoreHof]], kept for the parity spec) is the identical
    // arithmetic at ~10x the cost and was the whole of r04's 14 s
    val qFlat = queryTokens.toArray.flatMap(t => hashedQueryVec(t, dim))
    val score = graft.functions.ShingleFunctions.maxSimScore(
      coalesce(col(textCol), lit("")), qFlat, dim, chunkWords)
    val scored = docs.select(col(idCol).as("doc_id"), round(score, 6).as("maxsim"))
    val top = scored.orderBy(col("maxsim").desc, col("doc_id").asc).limit(k)
    top.withColumn("rank",
      row_number().over(Window.orderBy(col("maxsim").desc, col("doc_id").asc)).cast("int"))
  }

  /** The interpreted HOF formulation of the MaxSim score — the arithmetic
    * specification [[graft.functions.MaxSimScoreExpr]] must reproduce
    * bit-for-bit (asserted in RetrievalSpec). Chunk embeddings via
    * [[hashedEmbedding]], per-token best-chunk sim via `array_max`,
    * zero-norm-guarded rounded cosine, fixed left-to-right token sum.
    */
  private[graft] def maxSimScoreHof(
      textCol: Column, queryTokens: Seq[String], chunkWords: Int, dim: Int): Column = {
    val w = filter(split(coalesce(textCol, lit("")), " ", -1), t => length(t) > lit(0))
    val nChunks = floor((size(w) + lit(chunkWords - 1)) / lit(chunkWords)).cast("int")
    val chunkVecs = when(size(w) > lit(0),
      transform(sequence(lit(0), nChunks - lit(1)), i =>
        hashedEmbedding(slice(w, i * lit(chunkWords) + lit(1), lit(chunkWords)), dim)))
      .otherwise(array().cast("array<array<double>>"))
    queryTokens.foldLeft(lit(0.0)) { (acc, t) =>
      val qv = array(hashedQueryVec(t, dim).map(lit): _*)
      acc + coalesce(array_max(transform(chunkVecs, cv => simSafe(qv, cv))), lit(0.0))
    }
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009): fuse two rankings
    * `(doc_id, rank)` with `score = Σ 1/(c + rank)` over the systems the
    * document appears in, top `k` by (fused desc, id). Pure rational
    * arithmetic — exactly reproducible cross-engine. Inputs are top-k lists
    * (bounded), so the outer join is broadcast-small at any corpus scale.
    */
  /** Pseudo-relevance-feedback expansion (Rocchio 1971 / RM3 shape): run
    * [[bm25TopK]] for the literal query, harvest the `expand` most
    * frequent non-query terms from the top `fbK` feedback documents
    * (count desc, term asc — an integer, fully deterministic pick), and
    * rescore with the expanded weighted query (original terms weight 1,
    * expansion terms weight `beta`). The classic lexical-gap fix: "spark
    * shuffle" pulls in documents that only say "exchange".
    *
    * Everything stays IN-PLAN — the expansion terms are a 2-row frame
    * joined back, never collected — so the whole two-pass retrieval is one
    * Catalyst plan. Because the second pass's terms are dynamic, scoring
    * can't be a literal fold like [[bm25TopK]]; instead per-(doc, term)
    * contributions meet in joins and each document's score is an ORDERED
    * fold over its term-sorted contribution list (collect → sort → fold) —
    * the [[graft.operators.TrainingPipeline.temperatureMixture]] float
    * discipline, making the dynamic-term sum bit-identical cross-engine.
    *
    * Scale shape: the only corpus-wide passes are the stats aggregation
    * and one explode immediately thinned by the broadcast term join; df
    * and expansion frames are term-sized; final selection is top-k merge.
    */
  def prfTopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k: Int,
      fbK: Int = 10,
      expand: Int = 2,
      beta: Double = 0.5,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(expand >= 1, "prfTopK: need at least one expansion term")
    val spark = docs.sparkSession
    import spark.implicits._
    val tok = docs.select(col(idCol).as("doc_id"),
      filter(split(coalesce(col(textCol), lit("")), " "), t => length(t) > lit(0)).as("w"))
      .withColumn("dl", size(col("w")).cast("long"))
    // stage 1: literal-term BM25 feedback set
    val fb = bm25TopK(docs, idCol, textCol, terms, fbK).select("doc_id")
    // stage 2: top expansion terms by total frequency in the feedback docs
    val expTerms = tok.join(fb, Seq("doc_id"))
      .select(explode(col("w")).as("term"))
      .where(!col("term").isin(terms: _*))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc).limit(expand)
    val qt = terms.toDF("term").withColumn("wt", lit(1.0))
      .union(expTerms.select(col("term"), lit(beta).as("wt")))
    // stage 3: dynamic-term BM25 — per-(doc, term) tf via the thinned
    // explode, term df from it, contributions folded in term order
    val stats = tok.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = tok.select(col("doc_id"), col("dl"), explode(col("w")).as("term"))
      .join(broadcast(qt), Seq("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"), col("wt"))
      .agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
    val scoredTerms = tf.join(broadcast(dfT), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs").cast("double"))
      .withColumn("idf", round(log(lit(1.0) +
        (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))), 6))
      .withColumn("c", col("wt") * col("idf") *
        (col("tf").cast("double") * lit(k1 + 1.0) /
          (col("tf").cast("double") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))))
    val scored = scoredTerms.groupBy("doc_id")
      .agg(round(aggregate(
        array_sort(collect_list(struct(col("term"), col("c")))),
        lit(0.0), (acc, x) => acc + x.getField("c")), 6).as("prf"))
    val top = scored.orderBy(col("prf").desc, col("doc_id").asc).limit(k)
    top.withColumn("rank",
      row_number().over(Window.orderBy(col("prf").desc, col("doc_id").asc)).cast("int"))
  }

  def rrfFuse(
      a: DataFrame,
      bRanks: DataFrame,
      k: Int,
      c: Int = 60): DataFrame = {
    val left = a.select(col("doc_id"), col("rank").as("rank_a"))
    val right = bRanks.select(col("doc_id"), col("rank").as("rank_b"))
    val fused = left.join(right, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        round(
          coalesce(lit(1.0) / (lit(c.toDouble) + col("rank_a").cast("double")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c.toDouble) + col("rank_b").cast("double")), lit(0.0)),
          6).as("rrf"))
    val top = fused.orderBy(col("rrf").desc, col("doc_id").asc).limit(k)
    top.withColumn("rank",
      row_number().over(Window.orderBy(col("rrf").desc, col("doc_id").asc)).cast("int"))
  }

  /** Ideal-DCG rank weights `1/log₂(r+1)` for ranks 1..k, computed ONCE on
    * the driver — both the Spark plan and any cross-engine oracle must see
    * the SAME double bits (engines' log2 differ in the last ulp), so the
    * weights travel as literals, never as per-engine transcendentals.
    * Render with `java.lang.Double.toString` (shortest round-trip repr):
    * any IEEE engine parses it back to the identical double.
    */
  def log2Weights(k: Int): Seq[(Int, Double)] =
    (1 to k).map(r => r -> 1.0 / (math.log(r + 1.0) / math.log(2.0)))

  /** Ranking-quality evaluation — nDCG@k, MRR, hit counts — for a system
    * ranking against graded relevance judgments: the measurement half of
    * the retrieval family (r01–r05 produce rankings; this scores them, the
    * way a RAG/recall pipeline is tuned).
    *
    * Inputs: `ranked(queryCol, idCol, rank)` (rank 1-based per query) and
    * `qrels(queryCol, idCol, rel)` (graded relevance; rel ≤ 30 keeps the
    * 2^rel gain in range). Returns one row per ranked query:
    * `(queryCol, n_rel, n_rel_at_k, mrr_scaled, dcg_s, idcg_s, ndcg)`.
    *
    * Cross-engine exactness: gains `2^rel − 1` are integers (shiftleft);
    * rank weights are shared literals ([[log2Weights]]); each contribution
    * `gain·w` is ONE IEEE multiply snapped to the 1e-6 grid, and the
    * per-query DCG/IDCG are SUMS OF BIGINTS — order-independent, so the
    * aggregate cannot hash-diverge the way a double sum would. `ndcg` is
    * one division of those exact integers; `mrr_scaled` = 1e6 // first
    * relevant rank (exact integer division).
    *
    * Scale shape: the system side touches only top-k rows per query; the
    * qrels side is one window sort per query (ideal ordering) + narrow
    * aggregates; the weights table broadcasts. Nothing corpus-sized
    * shuffles more than once.
    */
  def evalRanking(
      ranked: DataFrame,
      qrels: DataFrame,
      queryCol: String,
      idCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"evalRanking: k must be positive, got $k")
    val spark = ranked.sparkSession
    import spark.implicits._
    val w = broadcast(log2Weights(k).toDF("__r", "__w"))
    val micro = (x: Column) => floor(x * lit(1000000.0) + lit(0.5)).cast("bigint")
    val gainS = micro((expr("shiftleft(1L, cast(rel as int))") - lit(1L))
      .cast("double") * col("__w"))
    val q = qrels.select(col(queryCol).as("q"), col(idCol).as("id"),
        col("rel").cast("long").as("rel"))
      .where(col("rel") > 0)
    val top = ranked.select(col(queryCol).as("q"), col(idCol).as("id"),
        col("rank").cast("int").as("rank"))
      .where(col("rank") <= k)
    val sys = top.join(q, Seq("q", "id"), "left").na.fill(0L, Seq("rel"))
      .join(w, col("rank") === col("__r"))
      .groupBy("q").agg(
        sum(gainS).as("dcg_s"),
        sum(when(col("rel") > 0, 1L).otherwise(0L)).as("n_rel_at_k"),
        min(when(col("rel") > 0, col("rank"))).as("__first"))
      .withColumn("mrr_scaled",
        coalesce(lit(1000000L) / col("__first").cast("bigint"), lit(0L)).cast("bigint"))
      .drop("__first")
    val ideal = q.withColumn("__rn", row_number().over(
        Window.partitionBy("q").orderBy(col("rel").desc, col("id"))))
      .where(col("__rn") <= k)
      .join(w, col("__rn") === col("__r"))
      .groupBy("q").agg(sum(gainS).as("idcg_s"))
    val totals = q.groupBy("q").agg(count(lit(1)).as("n_rel"))
    sys.join(ideal, Seq("q"), "left").join(totals, Seq("q"), "left")
      .na.fill(0L, Seq("n_rel"))
      .select(col("q").as(queryCol), col("n_rel"), col("n_rel_at_k"),
        col("mrr_scaled"), col("dcg_s"), col("idcg_s"),
        // a query with zero relevant documents has no ideal ranking: NULL
        (col("dcg_s").cast("double") / col("idcg_s").cast("double")).as("ndcg"))
  }
}
