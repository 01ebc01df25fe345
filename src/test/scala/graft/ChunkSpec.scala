package graft

import org.apache.spark.sql.functions._

import graft.operators.Chunk

/** Boundary and reconstruction contracts for the chunking operators (the
  * gate queries t18/t18b pin the arithmetic against DuckDB; these pin the
  * edges and the plan shape). */
class ChunkSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

  test("chunkChars boundaries: empty, exact-fit, one-over") {
    val out = Chunk.chunkChars(docs(
        (1L, ""),                 // empty -> one empty chunk
        (2L, "a" * 10),           // len == chunkSize -> one chunk
        (3L, "a" * 11),           // one past -> two chunks
        (4L, "a" * 2 ),           // shorter than overlap -> still one
        (5L, "abcdefghijKLMNOPQRST")), // len 20, size 10, ov 2 -> chunks at 0,8,16
      "doc_id", "text", chunkSize = 10, overlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byDoc = out.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(byDoc(1L).map(_._3).toSeq == Seq(""))
    assert(byDoc(2L).map(_._3).toSeq == Seq("a" * 10))
    assert(byDoc(3L).map(_._3).toSeq == Seq("a" * 10, "a" * 3))
    assert(byDoc(4L).map(_._3).toSeq == Seq("aa"))
    assert(byDoc(5L).map(_._3).toSeq ==
      Seq("abcdefghij", "ijKLMNOPQR", "QRST"))
    // n_chunks column agrees with the actual fan-out for every doc
    byDoc.foreach { case (id, rows) =>
      assert(rows.forall(_._4 == rows.size), s"doc $id n_chunks mismatch")
    }
  }

  test("chunkChars reconstruction: dropping each chunk's overlap prefix rebuilds the text") {
    val texts = Seq(
      (1L, "The quick brown fox jumps over the lazy dog repeatedly and often."),
      (2L, "short"),
      (3L, "x" * 137))
    val out = Chunk.chunkChars(docs(texts: _*), "doc_id", "text",
        chunkSize = 20, overlap = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    texts.foreach { case (id, text) =>
      val rebuilt = out(id).head + out(id).tail.map(_.drop(5)).mkString
      assert(rebuilt == text, s"doc $id")
    }
  }

  test("chunkWords windows share exactly `overlap` words and cover all words") {
    val text = (1 to 25).map(i => s"w$i").mkString(" ")
    val out = Chunk.chunkWords(docs((7L, text)), "doc_id", "text",
        chunkSize = 10, overlap = 3)
      .orderBy("chunk_ix")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    // 25 words, step 7 -> ceil(22/7) = 4 chunks at word offsets 0,7,14,21
    assert(out.length == 4 && out.forall(_._4 == 4L) && out.forall(_._3 == 25L))
    val words = out.map(_._2.split(" ").toSeq)
    assert(words(0) == (1 to 10).map("w" + _))
    assert(words(1) == (8 to 17).map("w" + _))
    assert(words(2) == (15 to 24).map("w" + _))
    assert(words(3) == (22 to 25).map("w" + _))
    // empty doc: one empty chunk, zero words
    val empty = Chunk.chunkWords(docs((8L, "")), "doc_id", "text", 10, 3)
      .collect().map(r => (r.getString(2), r.getLong(3), r.getLong(4)))
    assert(empty.toSeq == Seq(("", 0L, 1L)))
  }

  test("content-defined chunking: reconstruction, shift-resistance, short-text identity") {
    // pseudo-random ASCII, deterministic; divisor 16 -> dense boundaries
    def blob(seed: Int, n: Int): String = {
      val r = new scala.util.Random(seed)
      (1 to n).map(_ => (33 + r.nextInt(94)).toChar).mkString
    }
    val shared = blob(7, 400)
    val t1 = blob(11, 60) + shared
    val t2 = blob(13, 37) + shared // different-length prefix: fixed windows
                                   // would shift EVERY later boundary
    def chunksOf(text: String): Seq[String] =
      graft.operators.Chunk.chunkContentDefined(
          docs((1L, text)), "doc_id", "text", window = 16, divisor = 16)
        .orderBy("chunk_ix").collect().map(_.getString(2)).toSeq
    val c1 = chunksOf(t1)
    val c2 = chunksOf(t2)
    // chunks reconstruct exactly
    assert(c1.mkString == t1 && c2.mkString == t2)
    // shift-resistance: boundaries are content-local, so once both texts
    // are inside the shared suffix the splits coincide — the tails match
    val common = c1.reverse.zip(c2.reverse).takeWhile { case (a, b) => a == b }
    assert(common.size >= 3,
      s"CDC must re-align after an edit; common tail ${common.size} of " +
        s"${c1.size}/${c2.size} chunks")
    // short/empty text is one chunk, identity preserved
    assert(chunksOf("") == Seq(""))
    assert(chunksOf("tiny") == Seq("tiny"))
  }

  test("chunking is map-side only: no exchange in the plan") {
    val df = Chunk.chunkChars(docs((1L, "abc")), "doc_id", "text", 2, 1)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
    assert(df.queryExecution.executedPlan.toString.contains("Generate"),
      "expected a generator (posexplode), not a join")
    intercept[IllegalArgumentException](
      Chunk.chunkChars(docs((1L, "x")), "doc_id", "text", 5, 5))
  }
}
