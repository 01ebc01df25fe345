package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col

import graft.api.{Graft, GraftEmptyResultException}
import graft.core._

/** End-to-end scan-path tests reproducing the reference's golden layouts
  * (FIXTURES.md §A; behavioral source: /root/reference/tests/). */
class ReadPathSpec extends SparkSpec {

  private def writeFile(path: String, content: String): Unit = {
    val p = Paths.get(path)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
  }

  private val csv = "c1,c2\n0,hello\n1,world\n"

  test("A1: flat single file, no partitions") {
    val dir = tmpDir("a1")
    writeFile(s"$dir/f1.csv", csv)
    val df = Graft.readPartitionedTable(spark, dir)
    assert(df.columns.toSet == Set("c1", "c2"))
    assert(df.count() == 2)
  }

  test("A2: hive-style partitions auto-parsed as strings") {
    val dir = tmpDir("a2")
    writeFile(s"$dir/c3=42/c4=test/f1.csv", csv)
    val df = Graft.readPartitionedTable(spark, dir)
    assert(df.columns.toSet == Set("c1", "c2", "c3", "c4"))
    val r = df.select("c3", "c4").distinct().collect()
    assert(r.length == 1 && r(0).getString(0) == "42" && r(0).getString(1) == "test")
    assert(df.schema("c3").dataType.typeName == "string") // never inferred to int
  }

  test("A3: value-only partitions + filename column via FixedColumnsParser") {
    val dir = tmpDir("a3")
    writeFile(s"$dir/42/test/f1.csv", csv)
    val df = Graft.readPartitionedTable(spark, dir,
      parser = FixedColumnsParser.fromStr("a1/a2/fname"))
    assert(df.columns.toSet == Set("c1", "c2", "a1", "a2", "fname"))
    val r = df.select("a1", "a2", "fname").distinct().collect()
    assert(r.length == 1 && r(0).getString(0) == "42" && r(0).getString(1) == "test"
      && r(0).getString(2) == "f1.csv")
  }

  test("A4: grammar pruning + generation skips listing of pinned levels") {
    val dir = tmpDir("a4")
    writeFile(s"$dir/col1=4/col2=5/colX=a/f1.json", """{"c1":0,"c2":"hello"}""" + "\n")
    writeFile(s"$dir/col1=4/col2=6/colX=b/f2.json", """{"c1":1,"c2":"world"}""" + "\n")
    writeFile(s"$dir/col1=9/col2=6/colX=b/f3.json", """{"c1":2,"c2":"!"}""" + "\n")

    Discovery.resetListingCounter()
    val df = Graft.readPartitionedTable(spark, dir,
      parser = AutoParser.fromStr("col1=4/col2=[5,6]/colX"))
    assert(df.count() == 2)
    assert(df.select("col1").distinct().collect().map(_.getString(0)).toSet == Set("4"))
    // col1 and col2 levels are generated (no ls); we list only the 2 colX
    // level dirs + 2 terminal file dirs
    assert(Discovery.listingCalls.get() == 4)

    // wildcard level + pinned later level
    val df2 = Graft.readPartitionedTable(spark, dir,
      parser = AutoParser.fromStr("col1/col2=[6]/colX"))
    assert(df2.count() == 2)
    assert(df2.select("col2").distinct().collect().map(_.getString(0)).toSet == Set("6"))
  }

  test("A4b: atomic query over parsed columns") {
    val dir = tmpDir("a4b")
    writeFile(s"$dir/col1=4/col2=5/f1.json", """{"c1":0}""" + "\n")
    writeFile(s"$dir/col1=9/col2=6/f2.json", """{"c1":1}""" + "\n")
    val q = Q.and(Q.eq("col1", "9"), Q.atomic(Set("col2"))(m => m("col2").toInt % 2 == 0))
    val df = Graft.readPartitionedTable(spark, dir,
      query = q, parser = AutoParser.fromStr("col1/col2"))
    assert(df.select("col1").distinct().collect().map(_.getString(0)).toSeq == Seq("9"))
  }

  test("A5: numeric atomic + OR combination (reference core matrix)") {
    val dir = tmpDir("a5")
    for (k1 <- 1 to 3; k2 <- 1 to 4)
      writeFile(s"$dir/partK1=$k1/partK2=$k2/d.json", s"""{"val":${k1 * 10 + k2}}""" + "\n")
    val q = Q.or(
      Q.and(Q.eq("partK1", "1"), Q.atomic(Set("partK2"))(m => m("partK2").toInt <= 2)),
      Q.eq("partK1", "3"))
    val df = Graft.readPartitionedTable(spark, dir, query = q)
    val got = df.select("val").collect().map(_.getLong(0)).toSet
    assert(got == Set(11, 12, 31, 32, 33, 34))
  }

  test("A6: lex range over partition tree") {
    val dir = tmpDir("a6")
    var k = 0
    for (c1 <- Seq("a", "b", "c", "d", "e"); c3 <- Seq("a", "b", "c", "d")) {
      writeFile(s"$dir/c1=$c1/c2=z/c3=$c3/f.csv", s"k\n$k\n")
      k += 1
    }
    val q = QLexRange(Seq(
      ColumnRange("c1", "b", "d"), ColumnRange.wild("c2"), ColumnRange("c3", "c", "d")))
    val df = Graft.readPartitionedTable(spark, dir, query = q)
    // accepted: all (c1,c3) with (c1,c3) >= (b,c) and < (d,d), c2 wildcard
    val got = df.select("c1", "c3").distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val expected = (for {
      c1 <- Seq("a", "b", "c", "d", "e"); c3 <- Seq("a", "b", "c", "d")
      if Ordering[(String, String)].gteq((c1, c3), ("b", "c"))
      if Ordering[(String, String)].lt((c1, c3), ("d", "d"))
    } yield (c1, c3)).toSet
    assert(got == expected)
  }

  test("A7: date range query == date range generator results") {
    val dir = tmpDir("a7")
    val days = Seq(("2022", "4", "30"), ("2022", "5", "1"), ("2022", "5", "2"))
    for (((y, m, d), i) <- days.zipWithIndex)
      writeFile(s"$dir/year=$y/month=$m/day=$d/f.csv", s"v\n$i\n")

    val viaQuery = Graft.readPartitionedTable(spark, dir,
      query = QDateRange("2022/4/30", "2022/5/2"))
    val viaGen = Graft.readPartitionedTable(spark, dir,
      parser = DateRangeGenerator.build("2022/4/30", "2022/5/2"))
    assert(canon(viaQuery) == canon(viaGen))
    assert(viaQuery.select("v").collect().map(_.getInt(0)).toSet == Set(0, 1))

    // value-only ymd form
    val dir2 = tmpDir("a7b")
    for (((y, m, d), i) <- days.zipWithIndex)
      writeFile(s"$dir2/$y/$m/$d/f.csv", s"v\n$i\n")
    val viaGen2 = Graft.readPartitionedTable(spark, dir2,
      parser = DateRangeGenerator.build("2022/4/30", "2022/5/2",
        includeColumnInPath = false))
    assert(viaGen2.select("v").collect().map(_.getInt(0)).toSet == Set(0, 1))
  }

  test("A8: grammar shorter than tree raises 'no partitions remaining'") {
    val dir = tmpDir("a8")
    writeFile(s"$dir/v1/v2/f1.csv", csv)
    val ex = intercept[Exception] {
      Graft.readPartitionedTable(spark, dir, parser = FixedColumnsParser.fromStr("c1/fname"))
    }
    assert(ex.getMessage.contains("no partitions remaining"))
  }

  test("A8b: empty result raises (reference contract)") {
    val dir = tmpDir("a8b")
    writeFile(s"$dir/c1=a/f1.csv", csv)
    intercept[GraftEmptyResultException] {
      Graft.readPartitionedTable(spark, dir, query = Q.eq("c1", "nope"))
    }
  }

  test("A8c: lazy errors collect per-file failures, good files still load") {
    val dir = tmpDir("a8c")
    writeFile(s"$dir/p=1/good.json", """{"c1":0,"c2":"hello"}""" + "\n")
    writeFile(s"$dir/p=2/bad.json", "whopsie dupsie parsing oopsie\n")
    val rich = Graft.readPartitionedTableRich(spark, dir)
    assert(rich.failures.length == 1)
    assert(rich.failures.head.partition.url.endsWith("bad.json"))
    assert(rich.data.count() == 1)
    // eager mode raises instead
    intercept[Exception] {
      Graft.readPartitionedTable(spark, dir).collect()
    }
  }

  test("A8d: lazy errors probe the file itself even with a user schema") {
    val dir = tmpDir("a8d")
    // good parquet staged by Spark, then placed into the tree
    val stage = tmpDir("a8d-stage")
    spark.range(3).selectExpr("id AS c1").coalesce(1).write.mode("overwrite").parquet(stage)
    val part = Files.list(Paths.get(stage)).iterator()
    var src: java.nio.file.Path = null
    while (part.hasNext) { val p = part.next(); if (p.toString.endsWith(".parquet")) src = p }
    Files.createDirectories(Paths.get(s"$dir/p=1"))
    Files.copy(src, Paths.get(s"$dir/p=1/good.parquet"))
    writeFile(s"$dir/p=2/bad.parquet", "definitely not a parquet footer")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("c1", org.apache.spark.sql.types.LongType)))
    // with a user schema the probe must still open the footer — the corrupt
    // file lands in failures instead of blowing up the whole FAILFAST scan
    val rich = Graft.readPartitionedTableRich(spark, dir, schema = Some(schema))
    assert(rich.failures.length == 1)
    assert(rich.failures.head.partition.url.endsWith("bad.parquet"))
    assert(rich.data.filter(col("p") === "1").count() == 3)
  }

  test("A8e: probe of a 1000-file parquet tree is metadata-speed (no Spark jobs)") {
    val dir = tmpDir("a8e")
    val stage = tmpDir("a8e-stage")
    spark.range(5).selectExpr("id AS c1").coalesce(1).write.mode("overwrite").parquet(stage)
    val src = Files.list(Paths.get(stage)).iterator()
    var pq: java.nio.file.Path = null
    while (src.hasNext) { val p = src.next(); if (p.toString.endsWith(".parquet")) pq = p }
    for (i <- 0 until 1000) {
      Files.createDirectories(Paths.get(s"$dir/p=$i"))
      Files.copy(pq, Paths.get(s"$dir/p=$i/f.parquet"))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("c1", org.apache.spark.sql.types.LongType)))
    val jobsBefore = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val t0 = System.nanoTime()
    val rich = Graft.readPartitionedTableRich(spark, dir, schema = Some(schema))
    val probeMs = (System.nanoTime() - t0) / 1e6
    assert(rich.failures.isEmpty)
    // the probe itself must run zero Spark jobs (pure footer reads) ...
    assert(spark.sparkContext.statusTracker.getJobIdsForGroup(null).length == jobsBefore,
      "parquet probe must not launch Spark jobs")
    // ... and be metadata-speed: ~1 ms/footer on 32 threads (generous bound
    // for CI noise; a per-file DataFrameReader resolution takes minutes)
    assert(probeMs < 3000, s"probe took ${probeMs}ms for 1000 files")
    assert(rich.data.count() == 5000)
  }

  test("A8f: csv probe with a user schema reads only the header line") {
    val dir = tmpDir("a8f")
    writeFile(s"$dir/p=1/good.csv", "c1,c2\n1,hello\n")
    writeFile(s"$dir/p=2/empty.csv", "")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("c1", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("c2", org.apache.spark.sql.types.StringType)))
    val jobsBefore = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val rich = Graft.readPartitionedTableRich(spark, dir, schema = Some(schema),
      columns = Seq("c2"))
    assert(spark.sparkContext.statusTracker.getJobIdsForGroup(null).length == jobsBefore,
      "csv probe with user schema must not launch Spark jobs")
    assert(rich.failures.length == 1 && rich.failures.head.partition.url.endsWith("empty.csv"))
    assert(rich.data.count() == 1)
    // a header missing a requested column is a probe failure, not a scan blowup
    val rich2 = Graft.readPartitionedTableRich(spark, dir, schema = Some(schema),
      columns = Seq("c9"))
    assert(rich2.failures.length == 2)
  }

  test("A8g: csv probe WITHOUT a user schema is header-line only (O(1) jobs, not O(files))") {
    val dir = tmpDir("a8g")
    for (i <- 0 until 50) writeFile(s"$dir/p=$i/f.csv", s"c1,c2\n$i,hello\n")
    writeFile(s"$dir/p=x/empty.csv", "")
    val jobsBefore = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val rich = Graft.readPartitionedTableRich(spark, dir)
    val jobsRun = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length - jobsBefore
    // the probe itself is pure header reads; only the ATTACH may run first-file
    // schema inference (a constant couple of jobs, regardless of file count —
    // per-file inference would be 50+)
    assert(jobsRun <= 3, s"schema-less csv probe ran $jobsRun jobs for 51 files")
    assert(rich.failures.length == 1 && rich.failures.head.partition.url.endsWith("empty.csv"))
    assert(rich.data.count() == 50)
  }

  test("A8h: csv header probe honors quoted cells containing the separator") {
    import graft.api.Graft
    assert(Graft.splitCsvHeader("\"last,first\",age", ",") == Seq("last,first", "age"))
    assert(Graft.splitCsvHeader("a,\"b\"\"c\",d", ",") == Seq("a", "b\"c", "d"))
    assert(Graft.splitCsvHeader("x;y;z", ";") == Seq("x", "y", "z"))
    assert(Graft.splitCsvHeader(" a , b ", ",") == Seq("a", "b"))
    // multi-char separators split on the full string, not its first char
    assert(Graft.splitCsvHeader("a||b||c", "||") == Seq("a", "b", "c"))
    assert(Graft.splitCsvHeader("a|b||c", "||") == Seq("a|b", "c"))
    assert(Graft.splitCsvHeader("\"a||b\"||c", "||") == Seq("a||b", "c"))
    // a separator that BEGINS with a double quote splits rather than
    // opening a quoted cell (separator match precedes quote-open)
    assert(Graft.splitCsvHeader("a\"|b\"|c", "\"|") == Seq("a", "b", "c"))
    val dir = tmpDir("a8h")
    writeFile(s"$dir/p=1/f.csv", "\"last,first\",age\n\"doe,jane\",40\n")
    // a requested quoted column must be SEEN by the probe, not mis-split
    val rich = Graft.readPartitionedTableRich(spark, dir,
      options = Map("header" -> "true"), columns = Seq("last,first"))
    assert(rich.failures.isEmpty, rich.failures.mkString(";"))
  }

  test("projection pushdown: columns option prunes data columns, keeps partitions") {
    val dir = tmpDir("proj")
    writeFile(s"$dir/p=1/f.csv", csv)
    val df = Graft.readPartitionedTable(spark, dir, columns = Seq("c2"))
    assert(df.columns.toSet == Set("c2", "p"))
  }

  test("mixed-format tree: union attach and broadcast attach agree") {
    // single-format trees ride GraftFileIndex; a mixed csv+json tree takes
    // the union path (or broadcast path over the threshold) — both must
    // produce identical frames
    val dir = tmpDir("mixed")
    for (i <- 0 until 4) writeFile(s"$dir/p=c$i/f.csv", s"c1\n$i\n")
    for (i <- 0 until 4) writeFile(s"$dir/p=j$i/f.json", s"""{"c1":${i + 10}}""" + "\n")
    val old = Graft.unionAttachThreshold
    try {
      val viaUnion = Graft.readPartitionedTable(spark, dir)
      assert(viaUnion.count() == 8)
      assert(viaUnion.select("p").distinct().count() == 8)
      Graft.unionAttachThreshold = 2
      // 4 partition groups per format > threshold 2 => broadcast attach,
      // applied per format then unioned — must equal the union-attach result
      val viaBroadcast = Graft.readPartitionedTable(spark, dir)
      assert(canon(viaBroadcast) == canon(viaUnion))
    } finally Graft.unionAttachThreshold = old
  }

  test("post-hoc partition filters prune files through GraftFileIndex") {
    val dir = tmpDir("prune")
    for (y <- 2020 to 2023; f <- Seq("a", "b"))
      writeFile(s"$dir/y=$y/$f.csv", s"v\n${y - 2020}\n")
    // read EVERYTHING (Q.True), filter afterwards on the partition column —
    // pruning must happen at the FileIndex, not per-row
    val df = Graft.readPartitionedTable(spark, dir).filter(col("y") === "2022")
    assert(df.select("v").collect().map(_.getInt(0)).toSeq == Seq(2, 2))
    val scan = df.queryExecution.executedPlan.toString
    val loc = scan.split("\n").find(_.contains("PartitionFilters")).getOrElse("")
    assert(loc.contains("y"), s"expected partition filter in plan: $loc")
    // the scan must read only the 2 matching files
    val scanned = df.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
          .map(_.files.size).sum }.sum
    assert(scanned == 2, s"expected 2 files after pruning, got $scanned")
    // value-only layout prunes the same way (Spark itself cannot parse this)
    val dir2 = tmpDir("prune2")
    for (y <- 2020 to 2023)
      writeFile(s"$dir2/$y/data.csv", s"v\n${y - 2020}\n")
    val df2 = Graft.readPartitionedTable(spark, dir2,
        parser = FixedColumnsParser.fromStr("yr/fname"))
      .filter(col("yr") === "2021")
    assert(df2.select("v").collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("identity listing returns files + partition values without reading") {
    val dir = tmpDir("ident")
    writeFile(s"$dir/k=1/f1.csv", csv)
    writeFile(s"$dir/k=2/f2.csv", csv)
    val df = Graft.listPartitionedTable(spark, dir)
    val rows = df.collect()
    assert(rows.length == 2)
    assert(df.columns.toSet == Set("path", "k"))
  }

  test("grammar-less AutoParser reads files at every depth (reference quirk)") {
    val dir = tmpDir("quirk")
    writeFile(s"$dir/root.csv", "c1,c2\n9,rootlevel\n")
    writeFile(s"$dir/k=1/deep.csv", csv)
    val df = Graft.readPartitionedTable(spark, dir)
    // both depths load; the shallow file has a null partition value
    assert(df.count() == 3)
    assert(df.filter(col("k").isNull).count() == 1)
    assert(df.filter(col("k") === "1").count() == 2)
  }

  test("AUTO format detection fails on unknown suffix; forced format reads") {
    val dir = tmpDir("forced")
    // csv content in a .json file: auto json read fails fast on eager path
    writeFile(s"$dir/f1.json", csv)
    intercept[Exception] {
      Graft.readPartitionedTable(spark, dir).collect()
    }
    val forced = Graft.readPartitionedTable(spark, dir, format = "csv")
    assert(forced.count() == 2 && forced.columns.toSet == Set("c1", "c2"))
    // unknown suffix
    writeFile(s"$dir/f2.unknownext", "x")
    intercept[IllegalArgumentException] {
      Graft.readPartitionedTable(spark, dir)
    }
  }

  test("corrupt xlsx fails eagerly with a clear parse error") {
    // (round-1 contract was "xlsx unsupported"; the reader is now real, so
    // garbage bytes must fail the zip/worksheet parse with a useful message —
    // the lazyErrors leg of this behavior is pinned in the S9x scan test)
    val dir = tmpDir("xlsx")
    writeFile(s"$dir/wb.xlsx", "not really xlsx")
    val ex = intercept[IllegalArgumentException] {
      Graft.readPartitionedTable(spark, dir).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("xlsx") ||
      ex.getMessage.toLowerCase.contains("zip"))
  }

  test("winnowing fingerprint is stable under small mid-document edits") {
    import spark.implicits._
    import graft.functions.TextFunctions
    val base = ("x" * 40) + "abcdefghijklmnopqrstuvwxyz0123456789" + ("y" * 40)
    val edited = base.replace("mnop", "mnXp") // one local edit
    val df = Seq((1L, base), (2L, edited), (3L, "completely different content here"))
      .toDF("id", "text")
      .select(col("id"), TextFunctions.winnowFingerprint(col("text"), k = 8).as("fp"))
    val fps = df.as[(Long, Long)].collect().toMap
    // min-hash-of-kgrams usually survives a single local edit (the minimum
    // k-gram is unlikely to straddle it); unrelated text differs
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("wide-tree discovery: pruning and generation bound the listing cost") {
    val dir = tmpDir("wide")
    for (i <- 0 until 300) writeFile(s"$dir/k=$i/f.csv", s"c1\n$i\n")
    Discovery.resetListingCounter()
    val all = Graft.discover(spark, dir)
    assert(all.size == 300)
    assert(Discovery.listingCalls.get() == 301) // root + each dir, in parallel
    // equality pruning: only the matching subtree is listed after the root
    Discovery.resetListingCounter()
    val pruned = Graft.discover(spark, dir, Q.eq("k", "42"))
    assert(pruned.size == 1 && Discovery.listingCalls.get() == 2)
    // grammar generation: the root is never listed at all
    Discovery.resetListingCounter()
    val gen = Graft.discover(spark, dir, parser = AutoParser.fromStr("k=[42,43]"))
    assert(gen.size == 2 && Discovery.listingCalls.get() == 2)
    // discovery's listing already captured every file's size/mtime — a full
    // read must add ZERO per-file stat calls (at millions of files a serial
    // driver stat loop would dominate the scan path)
    assert(all.forall(_.meta.exists(_.size > 0)), "listing must capture file meta")
    graft.index.GraftFileIndex.fallbackListCalls.set(0)
    Discovery.resetListingCounter()
    val df = Graft.readPartitionedTable(spark, dir, Q.eq("k", "7"))
    assert(df.count() == 1)
    assert(Discovery.listingCalls.get() == 2) // root + the one matching dir
    assert(graft.index.GraftFileIndex.fallbackListCalls.get() == 0,
      "index must reuse discovery-time file statuses, not re-stat")
  }

  test("discovery pays ONE rpc per directory: no exists/stat probes, overshoot tolerated") {
    val dir = tmpDir("noexists")
    for (i <- Seq(42, 43)) writeFile(s"$dir/k=$i/f.csv", s"c1\n$i\n")
    val conf = new org.apache.hadoop.conf.Configuration()
    val probes = new java.util.concurrent.atomic.AtomicLong()
    val counting = new org.apache.hadoop.fs.FilterFileSystem(
      org.apache.hadoop.fs.FileSystem.getLocal(conf)) {
      override def exists(p: org.apache.hadoop.fs.Path): Boolean = {
        probes.incrementAndGet(); super.exists(p)
      }
      override def getFileStatus(p: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.FileStatus = {
        probes.incrementAndGet(); super.getFileStatus(p)
      }
    }
    Discovery.resetListingCounter()
    // generated grammar that OVERSHOOTS: k=999 has no directory on disk — the
    // miss must be absorbed by the single listStatus call, not a pre-probe
    val parts = Discovery.discoverPartitions(
      Q.True, AutoParser.fromStr("k=[42,43,999]"),
      graft.core.Partition.root(dir + "/"), counting)
    assert(parts.size == 2)
    assert(Discovery.listingCalls.get() == 3) // the 3 generated dirs; root never listed
    assert(probes.get() == 0, "discovery must not exists/stat-probe directories")
  }

  test("S9x: xlsx writer/reader round-trip, sparse cells, escaping, col letters") {
    import graft.sources.Xlsx
    val bos = new java.io.ByteArrayOutputStream()
    Xlsx.write(bos, Seq("id", "name", "score"),
      Seq(Seq(1L, "alice & <bob>", 9.5), Seq(2L, null, 7), Seq(3L, "carol", null)))
    val (hdr, rows) = Xlsx.read(new java.io.ByteArrayInputStream(bos.toByteArray))
    assert(hdr == Seq("id", "name", "score"))
    assert(rows == Seq(
      Seq("1", "alice & <bob>", "9.5"),
      Seq("2", null, "7"),
      Seq("3", "carol", null)))
    assert(Xlsx.colIndex("A1") == 0 && Xlsx.colIndex("Z9") == 25
      && Xlsx.colIndex("AA3") == 26 && Xlsx.colIndex("BC12") == 54)
  }

  test("S9x: xlsx scan attaches partition columns and applies the user schema") {
    import graft.sources.Xlsx
    val dir = tmpDir("xlsx_scan")
    for (p <- Seq("a", "b")) {
      Files.createDirectories(Paths.get(s"$dir/p=$p"))
      val out = new java.io.FileOutputStream(s"$dir/p=$p/data.xlsx")
      try Xlsx.write(out, Seq("k", "v"), Seq(Seq(1, s"$p-one"), Seq(2, s"$p-two")))
      finally out.close()
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))
    val df = Graft.readPartitionedTable(spark, dir, schema = Some(schema))
    assert(df.schema("k").dataType == org.apache.spark.sql.types.LongType)
    assert(df.count() == 4)
    assert(df.filter(col("p") === "b" && col("k") === 2).select("v")
      .head().getString(0) == "b-two")
    // lazy errors: a corrupt xlsx lands in failures, good files load
    writeFile(s"$dir/p=c/broken.xlsx", "this is not a zip file")
    val rich = Graft.readPartitionedTableRich(spark, dir, schema = Some(schema))
    assert(rich.failures.length == 1
      && rich.failures.head.partition.url.endsWith("broken.xlsx"))
    assert(rich.data.count() == 4)
  }

  test("S9x: xlsx parse is executor-side — only the first file touches the driver") {
    import graft.sources.Xlsx
    val dir = tmpDir("xlsx_lazy")
    Files.createDirectories(Paths.get(s"$dir/p=a"))
    val out = new java.io.FileOutputStream(s"$dir/p=a/good.xlsx")
    try Xlsx.write(out, Seq("k", "v"), Seq(Seq(1, "one")))
    finally out.close()
    // a corrupt NON-first file: building the frame must succeed (the driver
    // parses only the first file, for the header — rows stay on executors),
    // and the parse error surfaces lazily at action time on the task
    writeFile(s"$dir/p=z/bad.xlsx", "garbage, not a zip")
    val df = Graft.readPartitionedTable(spark, dir)
    val ex = intercept[Exception] { df.collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.toLowerCase.contains("xlsx")))
    // good files alone: full distributed read works and stays correct
    val ok = Graft.readPartitionedTable(spark, s"$dir/p=a")
    assert(ok.select("k", "v").collect().map(r => (r.getString(0), r.getString(1))).toSeq
      == Seq(("1", "one")))
  }

  test("mergeSchema widens divergent parquet schemas across partitions") {
    import spark.implicits._
    val dir = tmpDir("merge")
    Seq((1, "a")).toDF("c1", "c2").write.parquet(s"$dir/p=1")
    Seq((2, "b", 9.5)).toDF("c1", "c2", "c3").write.parquet(s"$dir/p=2")
    // default: first-file schema wins (c3 dropped or present depending on
    // listing order — assert only non-merge succeeds)
    assert(Graft.readPartitionedTable(spark, dir).count() == 2)
    val merged = Graft.readPartitionedTable(spark, dir,
      options = Map("mergeSchema" -> "true"))
    assert(merged.columns.toSet == Set("c1", "c2", "c3", "p"))
    assert(merged.filter(col("p") === "1").select("c3").head().isNullAt(0))
  }

  test("writeObject single-file round trips parquet/csv/json + raw bytes") {
    val dir = tmpDir("wo")
    import spark.implicits._
    val df = Seq((1, "a"), (2, "b")).toDF("k", "s")
    for (fmt <- Seq("parquet", "csv", "json")) {
      val target = s"$dir/out.$fmt"
      Graft.writeObject(df, target)
      assert(Files.isRegularFile(Paths.get(target)), s"$fmt single object")
      val back = Graft.readPartitionedTable(spark, dir,
        query = Q.True, parser = AutoParser.auto, format = fmt,
        options = Map.empty, schema = Some(df.schema))
      assert(back.count() >= 2)
      Files.delete(Paths.get(target))
    }
    Graft.writeRaw(spark, s"$dir/raw.bin", "ahoj".getBytes)
    assert(Files.readString(Paths.get(s"$dir/raw.bin")) == "ahoj")
  }

  test("writeObject json orient=records/columns (reference pandas to_json shapes)") {
    val dir = tmpDir("orient")
    import spark.implicits._
    val df = Seq((1, "a\"quote"), (2, null: String)).toDF("k", "s")
    Graft.writeObject(df, s"$dir/rec.json", options = Map("orient" -> "records"))
    assert(Files.readString(Paths.get(s"$dir/rec.json"))
      == """[{"k":1,"s":"a\"quote"},{"k":2,"s":null}]""")
    // records arrays round-trip through Spark's multiLine json reader
    val back = spark.read.option("multiLine", "true").json(s"$dir/rec.json")
    assert(back.count() == 2 && back.columns.toSet == Set("k", "s"))
    Graft.writeObject(df, s"$dir/col.json", options = Map("orient" -> "columns"))
    assert(Files.readString(Paths.get(s"$dir/col.json"))
      == """{"k":{"0":1,"1":2},"s":{"0":"a\"quote","1":null}}""")
    intercept[IllegalArgumentException] {
      Graft.writeObject(df, s"$dir/x.json", options = Map("orient" -> "split"))
    }
    // NaN is not a JSON token — encode as null (pandas to_json behavior)
    val nan = Seq((1, Double.NaN), (2, 1.5)).toDF("k", "x")
    Graft.writeObject(nan, s"$dir/nan.json", options = Map("orient" -> "records"))
    assert(Files.readString(Paths.get(s"$dir/nan.json"))
      == """[{"k":1,"x":null},{"k":2,"x":1.5}]""")
  }

  test("openPartitionedFile / consumePartitionedTable (reference consume affordance)") {
    val dir = tmpDir("consume")
    writeFile(s"$dir/k=1/f.csv", "c1\nalpha\n")
    writeFile(s"$dir/k=2/f.csv", "c1\nbeta\n")
    val firstLine: java.io.InputStream => String = in =>
      new java.io.BufferedReader(new java.io.InputStreamReader(in, "UTF-8")).readLine()
    // single-file open on a discovered url
    val one = Graft.discover(spark, dir, Q.eq("k", "2")).head
    assert(Graft.openPartitionedFile(spark, one.url)(firstLine) == "c1")
    // iterator variant: deterministic order, partition values attached
    val all = Graft.consumePartitionedTable(spark, dir)(in => {
      val r = new java.io.BufferedReader(new java.io.InputStreamReader(in, "UTF-8"))
      r.readLine(); r.readLine()
    })
    assert(all.map { case (p, line) => (p.columns("k"), line) }
      == Seq(("1", "alpha"), ("2", "beta")))
  }

  test("bloom sidecar: prunes files, exact answers, stale-fails-closed, string keys") {
    import spark.implicits._
    import graft.index.BloomSidecar
    val out = tmpDir("bloom_tbl")
    // 4 range-clustered files over disjoint key ranges
    (0 until 400).map(i => (i.toLong, s"name_$i")).toDF("id", "name")
      .repartitionByRange(4, col("id")).write.mode("overwrite").parquet(out)
    assert(BloomSidecar.write(spark, out, "id", fpp = 0.01,
      expectedPerFile = 1000) == 4)
    // a single-range key set must hit a strict file subset
    val cand = BloomSidecar.candidateFiles(spark, out, "id", Seq(7L, 9L))
    assert(cand.nonEmpty && cand.size < 4, cand.toString)
    // pruned read == full-scan filter, including a key that doesn't exist
    val keys: Seq[Any] = Seq(7L, 9L, 399L, 12345L)
    val pruned = BloomSidecar.readWithSkip(spark, out, "id", keys)
      .select("id").as[Long].collect().sorted
    assert(pruned.toSeq == Seq(7L, 9L, 399L))
    // string-key sidecar round-trips through UTF-8 bytes
    assert(BloomSidecar.write(spark, out, "name", fpp = 0.01,
      expectedPerFile = 1000) == 4)
    val byName = BloomSidecar.readWithSkip(spark, out, "name",
        Seq("name_42", "nope"))
      .select("id").as[Long].collect()
    assert(byName.toSeq == Seq(42L))
    // appending a file AFTER the build must fail the lookup closed
    Seq((9999L, "late")).toDF("id", "name")
      .write.mode("append").parquet(out)
    val e = intercept[IllegalArgumentException] {
      BloomSidecar.candidateFiles(spark, out, "id", Seq(9999L))
    }
    assert(e.getMessage.contains("STALE"))
    // rebuild heals it
    BloomSidecar.write(spark, out, "id", fpp = 0.01, expectedPerFile = 1000)
    assert(BloomSidecar.readWithSkip(spark, out, "id", Seq(9999L))
      .count() == 1)
    // a ZERO-ROW part file (schema-only append) is covered with an empty
    // bloom: no false STALE, and lookups skip it naturally
    spark.range(0).selectExpr("id", "concat('n', id) AS name")
      .coalesce(1).write.mode("append").parquet(out)
    val n = BloomSidecar.write(spark, out, "id",
      fpp = 0.01, expectedPerFile = 1000)
    assert(n == spark.read.parquet(out).inputFiles.length,
      "sidecar must cover every file incl. empty ones")
    assert(BloomSidecar.readWithSkip(spark, out, "id", Seq(7L))
      .count() == 1)
  }
}
