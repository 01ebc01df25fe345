package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.core.TaggedAppend

/** Randomized composition of the three-way ingest protocol: tagged append
  * (staged rename under deterministic names), crash + replay (sweep by
  * prefix, converge to one copy), and compaction (narrow rewrites,
  * move-in-before-delete). Each piece is individually specced; this
  * property interleaves them adversarially and asserts the table's ROW SET
  * always equals the model — the composition is where a protocol bug
  * (sweep missing a renamed file, compaction eating an in-flight batch,
  * replay doubling a batch) would hide.
  *
  * Two contracts the generator respects, because the protocol requires
  * them (both documented at TaggedAppend / ivfCompact):
  *  - compaction runs QUIESCED: every crashed append is replayed or
  *    aborted first;
  *  - compaction SEALS committed tags: the rewrite strips the tag prefix,
  *    so a sealed tag can never again be swept — clients use a fresh tag
  *    (unique batch id) for every logical batch, modeled here as a
  *    per-slot generation bump at each compact. (Building this spec
  *    without the seal rule reproduces the documented hazard: a same-tag
  *    append after compact double-commits because abort cannot see the
  *    compacted copy.) The streaming layer's commit markers
  *    (appendIngestBatch) make even that replay safe one level up. */
class IngestProtocolSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic property driver (scalatestplus is not in the offline
    * cache, so ScalaCheck generators are sampled by hand). */
  private def forAllSeeded[A](gen: Gen[A], n: Int)(check: A => Unit): Unit = {
    var seed = Seed(1234L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(check)
      seed = seed.next
      i += 1
    }
  }

  private sealed trait Op
  private case class Append(slot: Int) extends Op
  private case class Crash(slot: Int, keepEvery: Int) extends Op
  private case class Abort(slot: Int) extends Op
  private case object Compact extends Op

  private val genOp: Gen[Op] = Gen.frequency(
    5 -> Gen.choose(0, 3).map(Append(_)),
    3 -> Gen.zip(Gen.choose(0, 3), Gen.choose(2, 3)).map { case (t, k) => Crash(t, k) },
    2 -> Gen.choose(0, 3).map(Abort(_)),
    2 -> Gen.const(Compact))

  private val genOps: Gen[List[Op]] = Gen.listOfN(10, genOp)

  /** Batch rows for one (slot, generation): disjoint id range PER
    * GENERATION — a double-committed batch must surface as extra rows,
    * which identical content in a set comparison would hide. */
  private def batchRows(slot: Int, gen: Int): Set[(Long, String, String)] =
    (0 until 12).map { i =>
      (slot * 100000L + gen * 1000L + i, s"p${i % 3}", s"v$slot-$gen-$i")
    }.toSet

  private def batchDf(slot: Int, gen: Int) =
    batchRows(slot, gen).toSeq.sorted.toDF("id", "p", "v")

  private def readRows(path: String): Set[(Long, String, String)] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(path))) Set.empty
    else spark.read.parquet(path)
      .select(col("id"), col("p"), col("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
  }

  test("append/crash-replay/abort/compact interleavings preserve the row set") {
    var run = 0
    forAllSeeded(genOps, n = 6) { ops =>
      run += 1
      val path = tmpDir(s"ingest_protocol") + s"/t$run"
      val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
      val gen = Array(0, 0, 0, 0)
      var committed = Set.empty[(Int, Int)]
      var pending = Set.empty[Int]

      def tag(slot: Int) = s"t${slot}g${gen(slot)}"
      def model: Set[(Long, String, String)] =
        committed.flatMap { case (s, g) => batchRows(s, g) }

      def doAppend(slot: Int): Unit = {
        TaggedAppend.append(batchDf(slot, gen(slot)), path, tag(slot), Seq("p"))
        committed += ((slot, gen(slot))); pending -= slot
      }
      // the row-set invariant only holds QUIESCED: while any crashed
      // append's partial files are on disk, reads legitimately see them
      // (listing-based reads are at-least-once under failure — the
      // documented contract)
      def checkIfQuiesced(label: String): Unit =
        if (pending.isEmpty)
          assert(readRows(path) == model, s"after $label in run $run: $ops")
      def resolve(): Unit = {
        pending.foreach { slot =>
          // replay even slots, abort odd ones — both legal resolutions
          if (slot % 2 == 0) doAppend(slot)
          else {
            TaggedAppend.abort(fs, path, tag(slot))
            committed -= ((slot, gen(slot))); pending -= slot
          }
        }
        checkIfQuiesced("resolve")
      }

      ops.foreach {
        case Append(slot) =>
          doAppend(slot)
          checkIfQuiesced(s"append ${tag(slot)}")
        case Crash(slot, keepEvery) =>
          // a real append, then simulate a crash mid-rename: delete all
          // but every keepEvery-th committed file AND plant a leftover
          // staging dir with junk — the two artifacts a crash can leave
          TaggedAppend.append(batchDf(slot, gen(slot)), path, tag(slot), Seq("p"))
          val prefix = TaggedAppend.filePrefix(tag(slot))
          val files = fs.listStatus(new Path(path)).toSeq
            .filter(_.isDirectory).flatMap(d => fs.listStatus(d.getPath))
            .filter(st => st.isFile && st.getPath.getName.startsWith(prefix))
            .sortBy(_.getPath.toString)
          files.zipWithIndex.foreach { case (st, i) =>
            if (i % keepEvery != 0) fs.delete(st.getPath, false)
          }
          val staging = new Path(path, s".graft_ingest_staging_${tag(slot)}/junk")
          val out = fs.create(staging, true)
          try out.write("junk".getBytes) finally out.close()
          committed -= ((slot, gen(slot))); pending += slot
        case Abort(slot) =>
          TaggedAppend.abort(fs, path, tag(slot))
          committed -= ((slot, gen(slot))); pending -= slot
          checkIfQuiesced(s"abort ${tag(slot)}")
        case Compact =>
          resolve() // protocol: compaction runs quiesced
          if (committed.nonEmpty) {
            graft.api.Graft.compactPartitionedTable(spark, path,
              targetFileBytes = 1L << 30)
            checkIfQuiesced("compact")
          }
          // compaction seals every committed tag (the rewrite strips tag
          // prefixes); clients move to fresh batch ids — bump generations
          for (slot <- 0 to 3 if committed.contains((slot, gen(slot))))
            gen(slot) += 1
      }
      resolve()
      assert(pending.isEmpty)
      assert(readRows(path) == model, s"end of run $run: $ops")
    }
  }

  test("routed enforcement: exhaustive split, replay-idempotent, verdict collision refused") {
    import spark.implicits._
    val base = tmpDir("enforce_route")
    val clean = s"$base/clean"; val quar = s"$base/quar"
    val df = Seq((1, Some(5.0)), (2, Some(-1.0)), (3, Some(10.0)),
        (4, Option.empty[Double]))
      .toDF("k", "v")
      // null v: the predicate evaluates null → violation (audit convention)
    val checks = Seq("v_pos" -> (col("v") > 0), "k_lt_4" -> (col("k") < 4))
    val (nOk, nBad) = graft.operators.Enforce.writeRouted(
      df, checks, clean, quar, tag = "t1")
    assert(nOk >= 1 && nBad >= 1)
    val cleanRows = spark.read.parquet(clean).select("k").as[Int].collect().sorted
    val quarRows = spark.read.parquet(quar)
      .select("k", "gr_reasons").as[(Int, String)].collect().sortBy(_._1)
    assert(cleanRows.toSeq == Seq(1, 3))
    assert(quarRows.toSeq == Seq((2, "v_pos"), (4, "v_pos,k_lt_4")))
    // nothing dropped, nothing doubled
    assert(cleanRows.length + quarRows.length == 4)
    // replaying the SAME tag converges (no duplication in either table)
    graft.operators.Enforce.writeRouted(df, checks, clean, quar, tag = "t1")
    assert(spark.read.parquet(clean).count() == 2)
    assert(spark.read.parquet(quar).count() == 2)
    // a DIFFERENT tag appends alongside (batch semantics)
    graft.operators.Enforce.writeRouted(
      df.filter(col("k") === 1), checks, clean, quar, tag = "t2")
    assert(spark.read.parquet(clean).count() == 3)
    // verdict-column collision is refused loudly
    val e = intercept[IllegalArgumentException] {
      graft.operators.Enforce.tag(
        df.withColumn("gr_ok", lit("x")), checks)
    }
    assert(e.getMessage.contains("gr_ok"))
    // an all-clean batch still leaves a READABLE (schema-only) quarantine
    val base2 = tmpDir("enforce_allclean")
    val (o2, b2) = graft.operators.Enforce.writeRouted(
      df.filter(col("k") === 1), Seq("always" -> lit(true)),
      s"$base2/clean", s"$base2/quar", tag = "t9")
    assert(o2 == 1 && b2 == 0)
    assert(spark.read.parquet(s"$base2/quar").count() == 0)
    assert(spark.read.parquet(s"$base2/quar").columns.contains("gr_reasons"))
  }
}
