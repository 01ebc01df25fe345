package graft

import org.apache.spark.sql.functions._
import graft.api.Graft

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0), (4L, "b", 40.0),
    (5L, "c", 50.0)
  ).toDF("id", "p", "v")

  private def freshTable(): String = {
    val dir = tmpDir("merge_spec")
    Graft.writePartitionedTable(base, dir, Seq("p"))
    dir
  }

  private def files(dir: String, rel: String): Set[String] = {
    val d = new java.io.File(dir, rel)
    if (!d.exists()) Set.empty
    else d.listFiles().filter(f => f.isFile && !f.getName.startsWith("_") &&
      !f.getName.startsWith(".")).map(_.getName).toSet
  }

  test("upsert + insert + delete; untouched partitions keep their files") {
    val dir = freshTable()
    val before = files(dir, "p=b")
    assert(before.nonEmpty)
    val delta = Seq(
      (1L, "a", 11.0, false),  // update
      (6L, "a", 60.0, false),  // insert into existing partition
      (7L, "d", 70.0, false),  // insert into NEW partition
      (5L, "c", 0.0, true)     // delete the only row of p=c
    ).toDF("id", "p", "v", "del")
    val stats = Graft.mergePartitionedTable(spark, dir, delta,
      keyCols = Seq("p", "id"), partitionCols = Seq("p"),
      deleteCol = Some("del"))
    assert(stats.partitionsAffected == 3 && stats.partitionsDeleted == 1)
    // p=b untouched: exact same physical files
    assert(files(dir, "p=b") == before)
    assert(files(dir, "p=c").isEmpty) // partition removed entirely
    val got = Graft.readPartitionedTable(spark, dir)
      .select(col("id").cast("long"), col("p"), col("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1L, "a", 11.0), (2L, "a", 20.0), (6L, "a", 60.0),
      (3L, "b", 30.0), (4L, "b", 40.0), (7L, "d", 70.0)))
  }

  test("merge is idempotent: re-running the same delta converges") {
    val dir = freshTable()
    val delta = Seq((1L, "a", 99.0, false), (3L, "b", 0.0, true))
      .toDF("id", "p", "v", "del")
    def run() = Graft.mergePartitionedTable(spark, dir, delta,
      Seq("p", "id"), Seq("p"), deleteCol = Some("del"))
    run(); run()
    val got = Graft.readPartitionedTable(spark, dir)
      .select(col("id").cast("long"), col("p"), col("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1L, "a", 99.0), (2L, "a", 20.0), (4L, "b", 40.0),
      (5L, "c", 50.0)))
  }

  test("key must contain partition columns; null partition values refused") {
    val dir = freshTable()
    val delta = Seq((1L, "a", 1.0)).toDF("id", "p", "v")
    intercept[IllegalArgumentException] {
      Graft.mergePartitionedTable(spark, dir, delta, Seq("id"), Seq("p"))
    }
    val nullDelta = Seq((1L, null.asInstanceOf[String], 1.0))
      .toDF("id", "p", "v")
    intercept[IllegalArgumentException] {
      Graft.mergePartitionedTable(spark, dir, nullDelta, Seq("p", "id"), Seq("p"))
    }
  }

  test("pure-insert merge into an empty (all-new-partition) target") {
    val dir = tmpDir("merge_spec_new")
    Graft.writePartitionedTable(base.filter(col("p") === "a"), dir, Seq("p"))
    val delta = Seq((8L, "z", 80.0)).toDF("id", "p", "v")
    val stats = Graft.mergePartitionedTable(spark, dir, delta,
      Seq("p", "id"), Seq("p"))
    assert(stats.partitionsAffected == 1)
    assert(Graft.readPartitionedTable(spark, dir).count() == 3)
  }
}
