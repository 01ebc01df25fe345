package graft

import org.apache.spark.sql.functions._
import graft.functions.PdfImpl
import graft.operators.{Dedup, Frontier, Retrieval}

/** Round-19 regression lock-ins for the round-18 advice items: the
  * null-hash 200 guard in recordOutcomes, the intra-batch duplicate-URL
  * refusal in outcomeIngestBatch, the arithmetic-free keep-best
  * tie-break (string ids, null-score refusal), the anchored
  * `/Subtype /Image` PDF classification (Form XObjects with
  * `/ProcSet [/PDF /ImageB]` are text, not images), and the
  * rounded-key candidate cut in hardNegatives/bm25Join. */
class Round19FixSpec extends SparkSpec {
  import spark.implicits._

  private def histDf(rows: Seq[(String, Long, String, String, java.lang.Long)]) =
    rows.toDF("url", "ts", "h", "etag", "lm")

  test("recordOutcomes refuses a 200 with a null content hash loudly") {
    val h = histDf(Seq(("u", 0L, "a", "e1", 50L)))
    // a null-hash 200 would write a null-hash history row, and every
    // later backoffWalk comparison against it null-propagates to
    // "unchanged" — the guard turns that silent freeze into a raise
    val bad = Seq(("u", 20L, null.asInstanceOf[String],
        null.asInstanceOf[String], null.asInstanceOf[java.lang.Long], 200))
      .toDF("url", "ts", "h", "etag", "lm", "status")
    val ex = intercept[Exception] {
      Frontier.recordOutcomes(h, bad, "url", "ts", "h", "etag", "lm",
        "status").collect()
    }
    assert(ex.getMessage.contains("null content hash"), ex.getMessage)
    // a never-seen URL's 200 with a real hash still records fine
    val ok = Frontier.recordOutcomes(h,
        Seq(("w", 20L, "x", null.asInstanceOf[String],
          null.asInstanceOf[java.lang.Long], 200))
          .toDF("url", "ts", "h", "etag", "lm", "status"),
        "url", "ts", "h", "etag", "lm", "status").collect()
    assert(ok.length == 1 && ok.head.getString(2) == "x")
  }

  test("outcomeIngestBatch refuses two outcomes for one URL in a batch") {
    import graft.streaming.Streams
    val base = tmpDir("r19_dup_outcomes")
    val hist = base + "/hist"
    val cp = base + "/cp"
    def w(rows: Seq[(String, Long, String, String, java.lang.Long, Int)]) =
      rows.toDF("url", "ts", "h", "etag", "lm", "status")
    assert(Streams.outcomeIngestBatch(
      w(Seq(("u", 100L, "a", "e1", null, 200))), 0L, hist, cp))
    // a 200 and its follow-up 304 in ONE wave: the 304 would fold
    // against the PRE-batch history (stale hash/validators) — refused
    val ex = intercept[Exception] {
      Streams.outcomeIngestBatch(
        w(Seq(("u", 200L, "b", "e2", null, 200),
          ("u", 300L, null, null, null, 304))), 1L, hist, cp)
    }
    assert(ex.getMessage.contains("duplicate outcomes"), ex.getMessage)
    // distinct URLs in one wave stay fine
    assert(Streams.outcomeIngestBatch(
      w(Seq(("u", 200L, null, null, null, 304),
        ("v", 200L, "y", null, null, 200))), 2L, hist, cp))
    val snap = Frontier.fetchHistory(spark, hist).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(snap == Set(("u", 100L, "a"), ("u", 200L, "a"),
      ("v", 200L, "y")), snap.toString)
  }

  test("dropNearDuplicatesKeepBest: string ids tie-break deterministically") {
    // under the old `id * -1` tie-break a string id cast to null and
    // the argmax was silently nondeterministic; the two-stage argmax
    // (max score, then MIN id among ties) is arithmetic-free
    val docs = Seq(("b", 10L), ("a", 10L), ("c", 10L), ("z", 1L))
      .toDF("id", "score")
    val pairs = Seq(("b", "a"), ("a", "c")).toDF("id_a", "id_b")
    val kept = Dedup.dropNearDuplicatesKeepBest(docs, "id", pairs, "score")
      .select("id").as[String].collect().sorted.toSeq
    assert(kept == Seq("a", "z"), kept.toString)
    // the non-tie case still keeps the max score, not the min id
    val docs2 = Seq(("b", 10L), ("a", 5L), ("z", 1L)).toDF("id", "score")
    val kept2 = Dedup.dropNearDuplicatesKeepBest(docs2, "id",
        Seq(("a", "b")).toDF("id_a", "id_b"), "score")
      .select("id").as[String].collect().sorted.toSeq
    assert(kept2 == Seq("b", "z"), kept2.toString)
  }

  test("dropNearDuplicatesKeepBest refuses a null score on a paired doc") {
    val docs = Seq(("a", java.lang.Long.valueOf(10L)),
      ("b", null.asInstanceOf[java.lang.Long])).toDF("id", "score")
    val pairs = Seq(("a", "b")).toDF("id_a", "id_b")
    val ex = intercept[Exception] {
      Dedup.dropNearDuplicatesKeepBest(docs, "id", pairs, "score").collect()
    }
    assert(ex.getMessage.contains("null score"), ex.getMessage)
    // an UNPAIRED null-score doc is untouched (never enters the argmax)
    val docs2 = Seq(("a", java.lang.Long.valueOf(10L)),
      ("b", java.lang.Long.valueOf(3L)),
      ("zz", null.asInstanceOf[java.lang.Long])).toDF("id", "score")
    val kept = Dedup.dropNearDuplicatesKeepBest(docs2, "id", pairs, "score")
      .select("id").as[String].collect().sorted.toSeq
    assert(kept == Seq("a", "zz"), kept.toString)
  }

  test("PDF Form XObject with /ProcSet [/PDF /ImageB] is text, not an image") {
    // a Form XObject whose dict carries image-ish substrings but is
    // NOT /Subtype /Image: the old two-substring test emitted a bogus
    // image row AND silently skipped its text-bearing content stream
    val content = "BT /F1 12 Tf 72 720 Td (formtext) Tj ET"
    val s = s"%PDF-1.4\n1 0 obj << /Type /XObject /Subtype /Form " +
      s"/ProcSet [/PDF /ImageB] /ImageMask false " +
      s"/Length ${content.length} >> stream\n" +
      s"$content\nendstream endobj\ntrailer\n%%EOF\n"
    val pdf = s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(PdfImpl.images(pdf).isEmpty,
      "Form XObject must not classify as an image")
    assert(PdfImpl.extract(pdf).toString == "formtext",
      "Form XObject content must still extract as text")
    // a real image XObject still classifies (builder round trip) and
    // its pixel stream is still excluded from text extraction
    val px = Array.fill[Byte](4 * 2 * 3)(65) // 'A'-filled 4x2 RGB
    val withImg = PdfImpl.build(
      org.apache.spark.unsafe.types.UTF8String.fromString("body"),
      compress = false,
      Seq(PdfImpl.ImageSpec(4, 2, 3, px, dct = false)))
    val imgs = PdfImpl.images(withImg)
    assert(imgs.length == 1 && imgs.head.width == 4 && imgs.head.height == 2)
    assert(PdfImpl.extract(withImg).toString == "body")
  }

  test("Retry-After: IMF-fixdate parses to epoch, malformed dates are null") {
    import graft.functions.TextFunctions
    val rows = Seq(
      "Thu, 01 Jan 1970 02:00:00 GMT",   // epoch 7200
      " Sun, 06 Nov 1994 08:49:37 GMT ", // RFC 9110's own example
      "Fri, 31 Dec 1999 23:59:59 GMT",
      "Mon, 06 Nov 1994 08:49:37 GMT",   // WRONG day name: strict -> null
      "06 Nov 1994 08:49:37 GMT",        // missing day-name token
      "Thu, 01 Jan 1970 02:00:00",       // missing zone
      "tomorrow", "", "120")             // garbage / delta form is not a date
      .toDF("h")
    val got = rows.select(
      TextFunctions.retryAfterDateEpoch(col("h")).as("e")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    assert(got == Seq(Some(7200L), Some(784111777L), Some(946684799L),
      None, None, None, None, None, None), got.toString)
    // composition: a 503 with a date embargoes at the ABSOLUTE instant
    // (never ts + anything); delta keeps ts-relative semantics
    val log = Seq(
      ("http://a.com/1", 100L, 503, "Thu, 01 Jan 1970 02:00:00 GMT"),
      ("http://b.com/1", 100L, 429, "50")).toDF("url", "ts", "st", "ra")
    val r = graft.operators.Frontier.retryAfterEmbargo(log, "url", "ts",
        "st", "ra", nowSec = 1000L).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getBoolean(2)))).toMap
    assert(r("a.com") == ((7200L, true)) && r("b.com") == ((150L, false)),
      r.toString)
  }

  test("crafted lengths near Int.MaxValue cannot crash PNG/PDF walks") {
    // PNG chunk length 0x7FFFFFFF: the IHDR walk's bounds compare must
    // not overflow into a negative copy
    val png = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A,
      0x1A, 0x0A) ++ Array[Byte](0x7f, -1, -1, -1) ++
      "IDAT".getBytes("US-ASCII") ++ Array.fill[Byte](40)(0)
    assert(graft.operators.Multimodal.pngDHash(png).isEmpty)
    // PDF /Length just under Int.MaxValue: the old Int bounds compare
    // overflowed to a NEGATIVE stream end and the range copy threw;
    // the Long compare falls back to the endstream scan instead
    val pdf = ("%PDF-1.4\n1 0 obj << /Length 2147483640 >> stream\n" +
      "BT (x) Tj ET\nendstream endobj\ntrailer\n%%EOF\n")
      .getBytes("ISO-8859-1")
    assert(graft.functions.PdfImpl.extract(pdf).toString == "x")
    assert(graft.functions.PdfImpl.images(pdf).isEmpty)
  }

  test("hardNegatives: finite candidateK bounds the pool on the rounded key") {
    // three docs match the query with strictly decreasing score
    // (tf 3 > 2 > 1 at equal dl); candidateK=2 keeps {d1,d2}, the
    // positive d1 is anti-joined out, so d3 must NOT back-fill — the
    // candidate cut happened before the anti-join, on the rounded key
    val docs = Seq(
      (1L, "x x x p q r"), (2L, "x x p q r s"), (3L, "x p q r s t"))
      .toDF("doc_id", "text")
    val queries = Seq((0L, Seq("x"))).toDF("query_id", "terms")
    val positives = Seq((0L, 1L)).toDF("query_id", "doc_id")
    val r = Retrieval.hardNegatives(queries, docs, positives,
        "query_id", "terms", "doc_id", "text", k = 2, candidateK = 2)
      .collect()
    assert(r.length == 1 && r.head.getLong(1) == 2L &&
      r.head.getInt(3) == 1, r.mkString(","))
    // equal-score candidates (identical text) tie to the smaller id in
    // BOTH cuts — the rounded key degenerates to (same, id) exactly
    val tied = Seq((7L, "x a b"), (5L, "x a b"), (9L, "x a b"))
      .toDF("doc_id", "text")
    val r2 = Retrieval.hardNegatives(queries, tied,
        Seq((0L, -1L)).toDF("query_id", "doc_id"),
        "query_id", "terms", "doc_id", "text", k = 2, candidateK = 2)
      .collect().sortBy(_.getInt(3)).map(_.getLong(1)).toSeq
    assert(r2 == Seq(5L, 7L), r2.toString)
  }
}
