package graft

import org.apache.spark.sql.functions._
import graft.operators.Retrieval

/** Retrieval-quality metrics: hand-computed recall@k / MRR / nDCG@k,
  * boundary behavior, and the BM25-composition smoke check. */
class RankMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def disc(r: Int): Long =
    math.round(1e6 / (math.log(r + 1.0) / math.log(2.0)))

  test("hand-computed example at k=3") {
    val run = Seq(
      ("q", 1L, 50.0), ("q", 2L, 40.0), ("q", 3L, 30.0),
      ("q", 4L, 20.0), ("q", 5L, 10.0)
    ).toDF("query", "doc_id", "score")
    // relevant: doc 2 (g1) at rank 2, doc 3 (g2) at rank 3, doc 9 unranked
    val qrels = Seq(("q", 2L, 1L), ("q", 3L, 2L), ("q", 9L, 1L))
      .toDF("query", "doc_id", "grade")
    val r = Retrieval.rankMetrics(run, qrels,
      "query", "doc_id", "score", "grade", k = 3).collect().head
    assert(r.getAs[Long]("n_rel") == 3L)
    assert(r.getAs[Long]("hits_at_k") == 2L)
    assert(r.getAs[Double]("recall_at_k") ==
      BigDecimal(2.0 / 3).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Double]("mrr") == 0.5)
    val dcg = 1L * disc(2) + 3L * disc(3)
    val idcg = 3L * disc(1) + 1L * disc(2) + 1L * disc(3)
    assert(r.getAs[Double]("ndcg_at_k") ==
      BigDecimal(dcg.toDouble / idcg)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("perfect ranking scores ndcg 1 and recall 1") {
    val run = Seq(("q", 1L, 3.0), ("q", 2L, 2.0), ("q", 3L, 1.0))
      .toDF("query", "doc_id", "score")
    val qrels = Seq(("q", 1L, 2L), ("q", 2L, 1L))
      .toDF("query", "doc_id", "grade")
    val r = Retrieval.rankMetrics(run, qrels,
      "query", "doc_id", "score", "grade", k = 3).collect().head
    assert(r.getAs[Double]("ndcg_at_k") == 1.0)
    assert(r.getAs[Double]("recall_at_k") == 1.0)
    assert(r.getAs[Double]("mrr") == 1.0)
  }

  test("a query with no relevant docs reports zeros, not nulls") {
    val run = Seq(("q", 1L, 1.0)).toDF("query", "doc_id", "score")
    val qrels = Seq(("other", 1L, 1L)).toDF("query", "doc_id", "grade")
    val r = Retrieval.rankMetrics(run, qrels,
      "query", "doc_id", "score", "grade", k = 3).collect().head
    assert(r.getAs[Long]("n_rel") == 0L)
    assert(r.getAs[Double]("recall_at_k") == 0.0)
    assert(r.getAs[Double]("mrr") == 0.0)
    assert(r.getAs[Double]("ndcg_at_k") == 0.0)
  }

  test("grade 0 judgments are non-relevant") {
    val run = Seq(("q", 1L, 2.0), ("q", 2L, 1.0))
      .toDF("query", "doc_id", "score")
    val qrels = Seq(("q", 1L, 0L), ("q", 2L, 1L))
      .toDF("query", "doc_id", "grade")
    val r = Retrieval.rankMetrics(run, qrels,
      "query", "doc_id", "score", "grade", k = 2).collect().head
    assert(r.getAs[Long]("n_rel") == 1L)
    assert(r.getAs[Double]("mrr") == 0.5)
  }

  test("composes with the BM25 serving tier") {
    val docs = Seq(
      (1L, "spark scan agg window"), (2L, "agg agg agg filter"),
      (3L, "window window sort"), (4L, "filter join sort"),
      (5L, "agg window scan")
    ).toDF("doc_id", "text")
    val run = Seq("agg", "window").map { tm =>
      Retrieval.bm25(docs, "doc_id", "text", Seq(tm))
        .withColumn("query", lit(tm))
    }.reduce(_ unionByName _)
    // judge exactly the docs containing the term: BM25 must rank all of
    // them (it only scores tf > 0), so recall@5 = 1 for both queries
    val qrels = Seq(
      ("agg", 1L, 1L), ("agg", 2L, 2L), ("agg", 5L, 1L),
      ("window", 1L, 1L), ("window", 3L, 2L), ("window", 5L, 1L)
    ).toDF("query", "doc_id", "grade")
    val r = Retrieval.rankMetrics(run, qrels,
      "query", "doc_id", "score", "grade", k = 5)
      .collect().map(x => x.getAs[String]("query") ->
        (x.getAs[Double]("recall_at_k"), x.getAs[Double]("ndcg_at_k"))).toMap
    assert(r("agg")._1 == 1.0 && r("window")._1 == 1.0)
    assert(r.values.forall(v => v._2 > 0.0 && v._2 <= 1.0))
  }
}
