package graft

import org.apache.spark.sql.functions._
import graft.operators.ContextOrder

/** Greedy in-context ordering: chain correctness, determinism,
  * bucket independence. */
class ContextOrderSpec extends SparkSpec {
  import spark.implicits._

  // one plane that puts everything in bucket 1 (all-positive vectors)
  private val onePlane = Seq(Array.fill(4)(1.0))

  test("hand-computed chain: min id starts, nearest-unvisited follows") {
    // id 1 at angle 0, id 2 at ~60deg, id 3 at ~30deg (all unit-ish):
    // start 1 -> nearest is 3 (30deg) -> then 2
    val docs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.1f, 0.1f)),
      (2L, Seq(0.5f, 0.866f, 0.1f, 0.1f)),
      (3L, Seq(0.866f, 0.5f, 0.1f, 0.1f))
    ).toDF("id", "vec")
    val r = ContextOrder.orderWithinBuckets(docs, "id", "vec", onePlane)
      .orderBy("seq_ix").select("id").as[Long].collect().toSeq
    assert(r == Seq(1L, 3L, 2L))
  }

  test("identical vectors tie-break to ascending ids") {
    val docs = Seq(7L, 3L, 5L).map(i => (i, Seq(1.0f, 1.0f, 0.0f, 0.0f)))
      .toDF("id", "vec")
    val r = ContextOrder.orderWithinBuckets(docs, "id", "vec", onePlane)
      .orderBy("seq_ix").select("id").as[Long].collect().toSeq
    assert(r == Seq(3L, 5L, 7L))
  }

  test("buckets chain independently and report their sizes") {
    // plane [1,0,..] separates positive-x from negative-x
    val plane = Seq(Array(1.0, 0.0, 0.0, 0.0))
    val docs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
      (10L, Seq(-1.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("id", "vec")
    val r = ContextOrder.orderWithinBuckets(docs, "id", "vec", plane)
      .collect().map(x => x.getAs[Long]("id") ->
        (x.getAs[Long]("bucket"), x.getAs[Long]("n_bucket"))).toMap
    assert(r(1L)._1 == r(2L)._1 && r(1L)._1 != r(10L)._1)
    assert(r(1L)._2 == 2L && r(10L)._2 == 1L)
  }

  test("zero vectors chain last, not NaN-first") {
    val docs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.1f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),   // zero norm
      (3L, Seq(0.9f, 0.1f, 0.1f, 0.0f))
    ).toDF("id", "vec")
    val r = ContextOrder.orderWithinBuckets(docs, "id", "vec", onePlane)
      .orderBy("seq_ix").select("id").as[Long].collect().toSeq
    assert(r == Seq(1L, 3L, 2L))
  }

  test("deterministic under repartition") {
    val docs = (0L until 40L)
      .map(i => (i, Seq.tabulate(4)(j => ((i * 7 + j * 3) % 11).toFloat - 5f)))
      .toDF("id", "vec")
    val a = ContextOrder.orderWithinBuckets(docs, "id", "vec", 4, 2, 11L)
    val b = ContextOrder.orderWithinBuckets(docs.repartition(7), "id", "vec", 4, 2, 11L)
    assert(canon(a) == canon(b))
  }

  test("mixed embedding dimensions in one bucket fail loudly") {
    // both vectors mismatch the plane dim (4) so both sketch to bucket 0
    // and the chain kernel must compare them
    val docs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.1f)),
      (2L, Seq(0.5f, 0.866f)) // shorter still — a data defect
    ).toDF("id", "vec")
    val e = intercept[org.apache.spark.SparkException] {
      ContextOrder.orderWithinBuckets(docs, "id", "vec", onePlane).collect()
    }
    assert(e.getMessage.contains("dimension mismatch") ||
      Option(e.getCause).exists(_.getMessage.contains("dimension mismatch")),
      s"expected a loud dimension-mismatch failure, got: ${e.getMessage}")
  }
}
