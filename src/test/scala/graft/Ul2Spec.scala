package graft

import org.apache.spark.sql.functions._
import graft.operators.Masking

/** UL2 mixture-of-denoisers planning: one denoiser per doc, each
  * branch's span geometry, short-doc exemption. */
class Ul2Spec extends SparkSpec {
  import spark.implicits._

  private def mkDocs(n: Int, words: Int) =
    (0 until n).map(i => (i.toLong, Seq.fill(words)("w").zipWithIndex
      .map { case (w, j) => s"$w$j" }.mkString(" "))).toDF("id", "text")

  test("each document plans under exactly one denoiser") {
    val plan = Masking.ul2Plan(mkDocs(60, 50), "id", "text")
    val perDoc = plan.groupBy("id")
      .agg(countDistinct("denoiser").as("nd")).collect()
    assert(perDoc.nonEmpty && perDoc.forall(_.getLong(1) == 1L))
    // with 60 hash-assigned docs all three modes should appear
    val modes = plan.select("denoiser").distinct()
      .as[String].collect().toSet
    assert(modes == Set("R", "X", "S"), modes.toString)
  }

  test("R and X spans sit inside their own blocks at their own geometry") {
    val plan = Masking.ul2Plan(mkDocs(60, 50), "id", "text")
    val r = plan.filter(col("denoiser") === "R").collect()
    assert(r.forall { x =>
      val ix = x.getAs[Long]("sentinel_ix"); val st = x.getAs[Long]("span_start")
      st >= ix * 20 && st + x.getAs[Int]("span_len") <= ix * 20 + 20 &&
        x.getAs[Int]("span_len") == 3
    })
    val xs = plan.filter(col("denoiser") === "X").collect()
    assert(xs.forall { x =>
      val ix = x.getAs[Long]("sentinel_ix"); val st = x.getAs[Long]("span_start")
      st >= ix * 24 && st + x.getAs[Int]("span_len") <= ix * 24 + 24 &&
        x.getAs[Int]("span_len") == 12
    })
  }

  test("S emits one middle-half split covering the suffix") {
    val n = 40L
    val plan = Masking.ul2Plan(mkDocs(60, n.toInt), "id", "text")
    val s = plan.filter(col("denoiser") === "S").collect()
    assert(s.nonEmpty)
    assert(s.forall { x =>
      val st = x.getAs[Long]("span_start")
      x.getAs[Long]("sentinel_ix") == 0L &&
        st >= n / 4 && st < n / 4 + n / 2 &&
        x.getAs[Int]("span_len") == (n - st).toInt
    })
  }

  test("documents too short for their denoiser emit nothing") {
    // 3 words: below every block size and below the S minimum of 4
    val plan = Masking.ul2Plan(mkDocs(30, 3), "id", "text")
    assert(plan.count() == 0L)
  }

  test("deterministic across runs") {
    val docs = mkDocs(40, 30)
    val a = Masking.ul2Plan(docs, "id", "text")
    val b = Masking.ul2Plan(docs, "id", "text")
    assert(canon(a) == canon(b))
  }
}
