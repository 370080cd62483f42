package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavior spec for the retrieval family (r01–r03): BM25 scoring against a
  * hand-built local reimplementation on a tiny corpus, rerank candidate
  * containment, RRF exact rational arithmetic.
  */
class RetrievalSpec extends SparkSpec {

  private def docs3 = {
    import spark.implicits._
    Seq((1L, "a a b"), (2L, "b c"), (3L, "d")).toDF("doc_id", "text")
  }

  /** Local mirror of the BM25 formula (same op order as the Column tree). */
  private def bm25Local(tf: Double, dfT: Double, n: Double, dl: Double, avgdl: Double,
      k1: Double = 1.2, b: Double = 0.75): Double = {
    val idf = BigDecimal(math.log(1.0 + (n - dfT + 0.5) / (dfT + 0.5)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    idf * (tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + b * dl / avgdl)))
  }

  test("bm25TopK: scores match the formula, zero-overlap docs excluded, rank dense") {
    val res = Retrieval.bm25TopK(docs3, "doc_id", "text", Seq("a", "c"), k = 10)
      .orderBy("rank").collect()
    assert(res.map(_.getLong(0)).toSeq == Seq(1L, 2L)) // doc 3 has no query term
    val n = 3.0; val avgdl = 6.0 / 3.0
    val exp1 = BigDecimal(0.0 + bm25Local(2, 1, n, 3, avgdl) + bm25Local(0, 1, n, 3, avgdl))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp2 = BigDecimal(0.0 + bm25Local(0, 1, n, 2, avgdl) + bm25Local(1, 1, n, 2, avgdl))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(res(0).getDouble(1) == exp1, s"${res(0)} vs $exp1")
    assert(res(1).getDouble(1) == exp2, s"${res(1)} vs $exp2")
    assert(res.map(_.getInt(2)).toSeq == Seq(1, 2))
  }

  test("bm25TopK: rare terms outrank common ones (IDF discrimination)") {
    graft.Tables.register(spark, "/root/testdata/sf0.001")
    val top = Retrieval.bm25TopK(spark.table("documents"), "doc_id", "text",
      Seq("dup", "table"), k = 5).collect()
    assert(top.length == 5)
    // every top-5 doc must contain the rare term: its IDF dwarfs 'table''s
    val topIds = top.map(_.getLong(0)).toSet
    val withDup = spark.table("documents")
      .where(array_contains(split(col("text"), " "), "dup"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(topIds.subsetOf(withDup), s"$topIds not all in dup-docs $withDup")
  }

  test("denseRerank: only candidates appear, ordered by cosine desc") {
    graft.Tables.register(spark, "/root/testdata/sf0.001")
    import spark.implicits._
    val cands = Seq(3L, 5L, 7L, 9L, 11L).toDF("doc_id")
    val res = Retrieval.denseRerank(cands, spark.table("embeddings"),
      "vec_id", "embedding", queryVecId = 0L, k = 3).orderBy("rank").collect()
    assert(res.length == 3)
    assert(res.map(_.getLong(0)).toSet.subsetOf(Set(3L, 5L, 7L, 9L, 11L)))
    val sims = res.map(_.getDouble(1)).toSeq
    assert(sims == sims.sorted.reverse, s"not desc: $sims")
  }

  test("maxSimTopK: exact-token chunks hit cosine 1, empty docs score 0, stable under repartition") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark"),                         // chunk vec == query vec -> cos 1
      (2L, "alpha beta gamma delta"),        // unrelated
      (3L, ""),                              // no chunks -> 0
      (4L, null.asInstanceOf[String])        // null text -> 0
    ).toDF("doc_id", "text")
    val res = Retrieval.maxSimTopK(docs, "doc_id", "text", Seq("spark"), k = 4)
      .orderBy("rank").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(res.head == (1L, 1.0), res.toString)
    assert(res.filter(r => r._1 == 3L || r._1 == 4L).forall(_._2 == 0.0), res.toString)
    // fragmenting the input must not change scores or order
    val res2 = Retrieval.maxSimTopK(docs.repartition(5), "doc_id", "text", Seq("spark"), k = 4)
      .orderBy("rank").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(res2 == res)
  }

  test("maxSimTopK: score sums per-token bests and is bounded by the token count") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark vector"),   // both tokens exact somewhere in the single chunk
      (2L, "spark"),          // one exact
      (3L, "unrelated words here")).toDF("doc_id", "text")
    val res = Retrieval.maxSimTopK(docs, "doc_id", "text", Seq("spark", "vector"), k = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(res.values.forall(_ <= 2.0 + 1e-9))
    assert(res(1L) > res(2L), s"two hits must beat one: $res")
    assert(res(2L) > res(3L), res.toString)
  }

  test("hashedEmbedding and hashedQueryVec are exact twins") {
    import spark.implicits._
    for (tok <- Seq("spark", "dup", "vector", "merge", "zz")) {
      val fromCol = Seq(Tuple1(Seq(tok))).toDF("w")
        .select(Retrieval.hashedEmbedding(col("w"), 16).as("v"))
        .collect().head.getSeq[Double](0)
      assert(fromCol == Retrieval.hashedQueryVec(tok, 16).toSeq, s"mismatch for $tok")
    }
  }

  test("maxSim codegen kernel is bit-identical to the HOF formulation") {
    import spark.implicits._
    // varied shapes: multi-chunk, exactly one chunk, shorter than a chunk,
    // empty, single word, repeated tokens — plus pseudo-random word soup
    val rnd = new scala.util.Random(11)
    val vocab = Vector("spark", "dup", "vector", "merge", "alpha", "beta", "gamma", "zz9")
    val docs = (Seq(
      "",
      "spark",
      "spark dup vector merge",
      ("w " * 40).trim
    ) ++ (1 to 50).map(_ =>
      (1 to (1 + rnd.nextInt(80))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    val toks = Seq("spark", "dup", "vector", "merge")
    for (chunkWords <- Seq(3, 32)) {
      val qFlat = toks.toArray.flatMap(t => Retrieval.hashedQueryVec(t, 16))
      val both = df.select(col("doc_id"),
        graft.functions.ShingleFunctions.maxSimScore(
          coalesce(col("text"), lit("")), qFlat, 16, chunkWords).as("kernel"),
        Retrieval.maxSimScoreHof(col("text"), toks, chunkWords, 16).as("hof"))
        .collect()
      both.foreach { r =>
        assert(r.getDouble(1) == r.getDouble(2),
          s"doc ${r.getLong(0)} chunkWords=$chunkWords: kernel ${r.getDouble(1)} != hof ${r.getDouble(2)}")
      }
    }
  }

  test("prfTopK: expansion pulls in zero-overlap docs; weights and term pick are deterministic") {
    import spark.implicits._
    // query term 'q' appears in docs 1-2 alongside 'exp'; doc 3 contains
    // ONLY 'exp' — invisible to plain BM25, reachable after expansion.
    // 'noise' is frequent in feedback docs too, but 'exp' (count 4) beats
    // 'noise' (count 2): with expand=1 exactly 'exp' joins the query.
    val docs = Seq(
      (1L, "q exp exp noise"),
      (2L, "q exp exp noise"),
      (3L, "exp only here"),
      (4L, "nothing relevant")).toDF("doc_id", "text")
    val plain = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("q"), k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(plain == Set(1L, 2L))
    val prf = Retrieval.prfTopK(docs, "doc_id", "text", Seq("q"), k = 10,
      fbK = 10, expand = 1, beta = 0.5)
      .orderBy("rank").collect()
    val ids = prf.map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 3L), s"expansion should reach doc 3: ${prf.toSeq}")
    // doc 3 scores purely from the beta-weighted expansion term: halving
    // beta must halve its score exactly (its fold has a single term)
    val prfQuarter = Retrieval.prfTopK(docs, "doc_id", "text", Seq("q"), k = 10,
      fbK = 10, expand = 1, beta = 0.25)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val d3 = prf.find(_.getLong(0) == 3L).get.getDouble(1)
    assert(math.abs(prfQuarter(3L) - d3 / 2) < 2e-6, s"$d3 vs ${prfQuarter(3L)}")
    // deterministic across re-evaluation (no unordered float folds)
    val again = Retrieval.prfTopK(docs, "doc_id", "text", Seq("q"), k = 10,
      fbK = 10, expand = 1, beta = 0.5).orderBy("rank").collect()
    assert(again.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      prf.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }

  test("rrfFuse: exact rational fusion, outer semantics for one-sided docs") {
    import spark.implicits._
    val a = Seq((1L, 1), (2L, 2)).toDF("doc_id", "rank")
    val b = Seq((2L, 1), (3L, 2)).toDF("doc_id", "rank")
    val res = Retrieval.rrfFuse(a, b, k = 10).orderBy("rank").collect()
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = Seq(
      (2L, r6(1.0 / 62.0 + 1.0 / 61.0)), // in both lists
      (1L, r6(1.0 / 61.0)),
      (3L, r6(1.0 / 62.0)))
    assert(res.map(r => (r.getLong(0), r.getDouble(1))).toSeq == expected)
  }

  test("evalRanking: hand-computed nDCG@k / MRR / hits on a tiny ranking") {
    import spark.implicits._
    val ranked = Seq(("q1", 10L, 1), ("q1", 11L, 2), ("q1", 12L, 3),
      ("q2", 20L, 1), ("q2", 21L, 2)).toDF("query", "doc_id", "rank")
    val qrels = Seq(("q1", 11L, 3L), ("q1", 12L, 1L), ("q1", 99L, 2L),
      ("q2", 77L, 1L)).toDF("query", "doc_id", "rel")
    val res = Retrieval.evalRanking(ranked, qrels, "query", "doc_id", k = 3)
      .orderBy("query").collect()
    val w = Retrieval.log2Weights(3).toMap
    def c(g: Long, r: Int): Long =
      math.floor(((1L << g) - 1).toDouble * w(r) * 1e6 + 0.5).toLong
    // q1 system: ranks 1..3 carry rel 0,3,1; ideal: rel 3,2,1
    val dcg1 = c(0, 1) + c(3, 2) + c(1, 3)
    val idcg1 = c(3, 1) + c(2, 2) + c(1, 3)
    val r1 = res(0)
    assert(r1.getLong(1) == 3L && r1.getLong(2) == 2L) // n_rel, n_rel_at_k
    assert(r1.getLong(3) == 500000L)                   // first relevant at rank 2
    assert(r1.getLong(4) == dcg1 && r1.getLong(5) == idcg1)
    assert(r1.getDouble(6) == dcg1.toDouble / idcg1.toDouble)
    // q2: its one relevant doc was not retrieved — zero dcg/mrr, nonzero ideal
    val r2 = res(1)
    assert(r2.getLong(1) == 1L && r2.getLong(2) == 0L && r2.getLong(3) == 0L)
    assert(r2.getLong(4) == 0L && r2.getLong(5) == c(1, 1))
    assert(r2.getDouble(6) == 0.0)
  }

  test("evalRanking: perfect ranking scores ndcg 1.0; rel beyond k ignored in DCG") {
    import spark.implicits._
    val ranked = Seq(("q", 1L, 1), ("q", 2L, 2)).toDF("query", "doc_id", "rank")
    val qrels = Seq(("q", 1L, 2L), ("q", 2L, 1L), ("q", 3L, 1L)).toDF("query", "doc_id", "rel")
    val res = Retrieval.evalRanking(ranked, qrels, "query", "doc_id", k = 2).collect()
    assert(res(0).getDouble(6) == 1.0) // doc3's rel can't enter the top-2 ideal
    assert(res(0).getLong(1) == 3L)    // but it counts in n_rel
  }
}
