package graft

import org.apache.spark.sql.functions._
import graft.operators.Retrieval

/** Margin-based bitext mining: planted translations win, decoys lose,
  * threshold excludes, mutual mode enforces bidirectional best. */
class BitextSpec extends SparkSpec {
  import spark.implicits._

  private val src = Seq(
    (1L, Array(1f, 0f, 0f, 0f)),
    (2L, Array(0f, 1f, 0f, 0f)),
    (3L, Array(0.95f, 0.05f, 0f, 0f)) // hub rider: closest tgt is t10
  ).toDF("src_id", "src_emb")

  private val tgt = Seq(
    (10L, Array(1f, 0f, 0f, 0f)),   // s1's translation
    (20L, Array(0f, 1f, 0f, 0f)),   // s2's translation
    (30L, Array(0.9f, 0.1f, 0f, 0f)), // decoy near s1
    (40L, Array(0f, 0f, 1f, 0f))    // noise
  ).toDF("tgt_id", "tgt_emb")

  private val candidates =
    src.select("src_id").crossJoin(tgt.select("tgt_id"))

  test("true pairs win the margin; the decoy does not") {
    val got = Retrieval.mineBitext(src, "src_id", "src_emb",
        tgt, "tgt_id", "tgt_emb", candidates, k = 2, marginThreshold = 1.0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 10L, s"s1 must pair with its copy, got $got")
    assert(got(2L) == 20L)
    // every emitted pair clears the margin threshold
    val margins = Retrieval.mineBitext(src, "src_id", "src_emb",
        tgt, "tgt_id", "tgt_emb", candidates, k = 2, marginThreshold = 1.0)
      .collect().map(_.getDouble(3))
    assert(margins.forall(_ >= 1.0))
  }

  test("a high threshold yields no pairs") {
    assert(Retrieval.mineBitext(src, "src_id", "src_emb",
      tgt, "tgt_id", "tgt_emb", candidates, k = 2,
      marginThreshold = 10.0).isEmpty)
  }

  test("mutual mode drops a pair whose target prefers another source") {
    val plain = Retrieval.mineBitext(src, "src_id", "src_emb",
        tgt, "tgt_id", "tgt_emb", candidates, k = 2, marginThreshold = 1.0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mut = Retrieval.mineBitext(src, "src_id", "src_emb",
        tgt, "tgt_id", "tgt_emb", candidates, k = 2, marginThreshold = 1.0,
        mutual = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // s1 and s2 are mutual bests either way
    assert(mut(1L) == 10L && mut(2L) == 20L)
    // if s3's best target is claimed harder by another source, mutual
    // mode must drop s3 while plain mode keeps it
    if (plain.contains(3L)) {
      val t3 = plain(3L)
      val claimedBy = plain.collect { case (s, t) if t == t3 && s != 3L => s }
      if (claimedBy.nonEmpty) assert(!mut.contains(3L),
        s"mutual must drop s3 (its target $t3 is also ${claimedBy}'s)")
    }
  }

  test("duplicated candidate pairs change nothing") {
    val a = Retrieval.mineBitext(src, "src_id", "src_emb",
      tgt, "tgt_id", "tgt_emb", candidates, k = 2, marginThreshold = 1.0)
    val b = Retrieval.mineBitext(src, "src_id", "src_emb",
      tgt, "tgt_id", "tgt_emb",
      candidates.unionAll(candidates).unionAll(candidates.limit(3)),
      k = 2, marginThreshold = 1.0)
    assert(canon(a) == canon(b))
  }

  test("partitioning-invariant") {
    val a = Retrieval.mineBitext(src, "src_id", "src_emb",
      tgt, "tgt_id", "tgt_emb", candidates, k = 2, marginThreshold = 1.0)
    val b = Retrieval.mineBitext(src.repartition(5), "src_id", "src_emb",
      tgt.repartition(3), "tgt_id", "tgt_emb", candidates.repartition(4),
      k = 2, marginThreshold = 1.0)
    assert(canon(a) == canon(b))
  }
}
