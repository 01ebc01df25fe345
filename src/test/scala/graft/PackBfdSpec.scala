package graft

import org.apache.spark.sql.functions._
import graft.operators.Pack

/** Best-fit-decreasing packing: placement rule, overflow, bounded
  * open-bin state, and the fewer-bins win over first-fit greedy. */
class PackBfdSpec extends SparkSpec {
  import spark.implicits._

  private def pack(rows: Seq[(Long, Long)], budget: Long,
      maxOpen: Int = 1024) =
    Pack.packBestFitDecreasing(rows.toDF("id", "tokens"), "id", "tokens",
        budget, numShards = 1, maxOpenBins = maxOpen)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("bin")).toMap

  test("hand-computed placements: big anchors, small backfills tightest") {
    // desc order: 70(id1), 60(id2), 40(id3), 30(id4) at budget 100
    // 70 -> bin0; 60 doesn't fit bin0 -> bin1; 40 fits only bin1
    // (60+40=100) best-fit bin1; 30 fits bin0 (70+30=100) -> bin0
    val r = pack(Seq((1L, 70L), (2L, 60L), (3L, 40L), (4L, 30L)), 100L)
    assert(r == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 0L), r.toString)
  }

  test("best-fit prefers the FULLEST fitting bin, ties to lowest index") {
    // 50, 50, 50 -> bins 0,1,2 (none fit together at budget 90);
    // then 40 fits all three equally (fill 50) -> lowest index bin0
    val r = pack(Seq((1L, 50L), (2L, 50L), (3L, 50L), (4L, 40L)), 90L)
    assert(r(4L) == 0L, r.toString)
  }

  test("an oversized doc lands alone and later docs ignore its bin") {
    val r = pack(Seq((1L, 200L), (2L, 80L), (3L, 10L)), 100L)
    assert(r(1L) == 0L && r(2L) == 1L && r(3L) == 1L, r.toString)
  }

  test("beats first-fit greedy on the classic fixture (fewer bins)") {
    // ascending-id arrival order chosen so greedy wastes space:
    // greedy packs [90],[10,80... no: 10+80=90 ok] — use Ding-style mix
    val docs = Seq((1L, 55L), (2L, 60L), (3L, 45L), (4L, 40L), (5L, 50L),
      (6L, 50L)).toDF("id", "tokens")
    val greedyBins = Pack.packGreedy(docs, "id", "tokens", 100L, 1)
      .agg(max("bin")).head().getLong(0) + 1
    val bfdBins = Pack.packBestFitDecreasing(docs, "id", "tokens", 100L, 1)
      .agg(max("bin")).head().getLong(0) + 1
    assert(bfdBins < greedyBins, s"bfd=$bfdBins greedy=$greedyBins")
    assert(bfdBins == 3L)
  }

  test("maxOpenBins bounds state: closing the fullest keeps packing legal") {
    // budget 10; docs sized so many bins open; with maxOpen=2 the
    // result must still never overfill a bin
    val docs = (1L to 30L).map(i => (i, 4L + (i % 5)))
    val out = Pack.packBestFitDecreasing(docs.toDF("id", "tokens"),
      "id", "tokens", 10L, numShards = 1, maxOpenBins = 2).collect()
    val byBin = out.groupBy(r => r.getAs[Long]("bin"))
      .view.mapValues(_.map(_.getAs[Long]("tokens")).sum).toMap
    assert(byBin.values.forall(_ <= 10L), byBin.toString)
    // and uses more bins than unbounded (closing costs opportunity)
    val unbounded = Pack.packBestFitDecreasing(docs.toDF("id", "tokens"),
      "id", "tokens", 10L, numShards = 1).agg(max("bin")).head().getLong(0)
    assert(byBin.keySet.max >= unbounded)
  }

  test("shards pack independently and deterministically") {
    val docs = (1L to 100L).map(i => (i, 10L + (i * 7) % 90))
    val a = Pack.packBestFitDecreasing(docs.toDF("id", "tokens"),
      "id", "tokens", 128L, numShards = 4)
    val b = Pack.packBestFitDecreasing(
      docs.toDF("id", "tokens").repartition(13),
      "id", "tokens", 128L, numShards = 4)
    assert(canon(a) == canon(b))
  }
}
