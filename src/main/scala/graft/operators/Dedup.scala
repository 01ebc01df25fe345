package graft.operators

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deduplication operators for 100 TB-scale corpora. Design notes:
  *
  *  - Exact dedup is a single hash-aggregate (one shuffle on the content
  *    hash; map-side partial aggregation kicks in automatically).
  *  - MinHash/SimHash/embedding near-dup all follow the LSH pattern:
  *    per-row signature (narrow, codegen'd, no shuffle) → explode to
  *    (bucket, id) → self-equi-join on bucket (the only shuffle, keyed on
  *    bucket so it scales out) → exact verification on the candidate pairs
  *    only. Candidate verification carries fixed-width hash signatures, not
  *    raw text, so shuffle volume is bounded by O(rows × signature), never
  *    O(rows × document).
  *  - All hash families are deterministically seeded — results are stable
  *    across runs and cluster sizes.
  */
object Dedup {

  /** Exact dedup: keep the smallest id per identical content. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  // ------------------------------------------------------------- minhash

  private val HashDomain = (1L << 31) - 1 // Mersenne prime 2^31-1

  /** k affine hash functions h_i(x) = (a_i*x + b_i) mod p over a base
    * xxhash64 reduced to a 31-bit domain: with a,b,x < 2^31 the product
    * stays under 2^62, so the arithmetic never overflows a long (Spark 4
    * runs ANSI mode by default — silent wraparound would throw). Seeded,
    * so signatures are reproducible anywhere. */
  private def hashFamily(numHashes: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new Random(seed)
    // mask, not math.abs: abs(Long.MinValue) is negative, which would break
    // the <2^62 no-overflow bound that keeps ANSI mode from throwing
    Seq.fill(numHashes)(((rnd.nextLong() & Long.MaxValue) % (HashDomain - 1) + 1,
      (rnd.nextLong() & Long.MaxValue) % HashDomain))
  }

  /** array<long> minhash signature from an ALREADY-MATERIALIZED column of
    * shingle hashes (reduced to the 31-bit domain). Taking the hash column
    * rather than raw text matters: the signature references its input 64
    * times, and Catalyst will not collapse a multi-referenced non-cheap
    * projection — so the text→shingle→hash pipeline runs once per row, not
    * once per hash function. */
  def minhashSignatureFromHashes(hashes: Column, numHashes: Int = 64,
      seed: Long = 42L): Column = {
    val sig = hashFamily(numHashes, seed).map { case (a, b) =>
      array_min(transform(hashes, x => pmod(x * a + b, lit(HashDomain))))
    }
    array(sig: _*)
  }

  /** Column: shingle hashes of a text column in the 31-bit domain.
    * (Lambda-capture caveat applies — hot paths should use shingleSets.) */
  def shingleHashes31(text: Column, shingleSize: Int): Column =
    transform(TextFunctions.shingleHashes(text, shingleSize),
      x => pmod(x, lit(HashDomain)))

  /** (id, shingle_set) with projections staged so each lambda only captures
    * attributes: text → words → shingle hashes → distinct set. One tokenizer
    * pass per row instead of one per shingle. */
  def shingleSets(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int): DataFrame =
    df.select(col(idCol).as("id"), TextFunctions.words(col(textCol)).as("__words"))
      .select(col("id"), array_distinct(
        transform(TextFunctions.shingleHashesFromWords(col("__words"), shingleSize),
          x => pmod(x, lit(HashDomain)))).as("shingle_set"))

  /** Column: array<long> minhash signature of a text column (convenience;
    * for hot paths prefer materializing shingleHashes31 first). */
  def minhashSignature(text: Column, shingleSize: Int = 3, numHashes: Int = 64,
      seed: Long = 42L): Column =
    minhashSignatureFromHashes(shingleHashes31(text, shingleSize), numHashes, seed)

  /** LSH banding: numHashes/rowsPerBand band keys per row. Band key is a
    * string "bandIndex:joined-slice" so different bands never collide. */
  private def bandKeys(sig: Column, numHashes: Int, rowsPerBand: Int): Column = {
    val numBands = numHashes / rowsPerBand
    array((0 until numBands).map { b =>
      concat_ws(":", lit(b.toString),
        concat_ws(",", slice(sig, b * rowsPerBand + 1, rowsPerBand)))
    }: _*)
  }

  /** Candidate near-duplicate pairs via MinHash + LSH, verified with exact
    * Jaccard over shingle-hash sets. Returns (idA, idB, jaccard), idA < idB.
    */
  def minhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      rowsPerBand: Int = 4,
      threshold: Double = 0.7,
      seed: Long = 42L): DataFrame = {
    // hashes materialized once; signature derives from the hash column.
    // persist: this frame is consumed three times (signature/bucket branch +
    // both sides of the verification attach) — without it the full
    // text→shingle→hash pipeline re-runs per consumer. MEMORY_AND_DISK so a
    // 100 TB corpus spills instead of recomputing or OOMing.
    val withHashes = shingleSets(df, idCol, textCol, shingleSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val withSig = withHashes.select(col("id"), col("shingle_set"),
      minhashSignatureFromHashes(col("shingle_set"), numHashes, seed).as("sig"))

    // candidate generation carries IDs ONLY (16 bytes/pair through the
    // bucket self-join); shingle sets attach after pair-dedup, bounding
    // shuffle volume by distinct candidates, not bucket-collision count
    val buckets = withSig
      .select(col("id"), explode(bandKeys(col("sig"), numHashes, rowsPerBand)).as("bucket"))
    val l = buckets.select(col("bucket"), col("id").as("id_a"))
    val r = buckets.select(col("bucket"), col("id").as("id_b"))
    val candidates = l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")

    val sets = withHashes
    val verified = candidates
      .join(sets.select(col("id").as("id_a"), col("shingle_set").as("set_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("shingle_set").as("set_b")), Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("set_a"), col("set_b"))).cast("double") /
          size(array_union(col("set_a"), col("set_b"))))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")

    // materialize the (small) verified-pair list so the shingle cache can be
    // released before returning — a long-lived session calling minhashPairs
    // repeatedly must not accumulate cached shingle frames. The checkpoint
    // blocks are bounded by the pair-list size, not the corpus.
    val result = verified.localCheckpoint(true)
    withHashes.unpersist(false)
    result
  }

  /** Greedy dedup from a pair list: drop every id that pairs with a smaller
    * surviving id (single pass; standard LSH-dedup policy — not full
    * connected components, which would need an iterative join). */
  def dropNearDuplicates(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val toDrop = pairs.select(col("id_b").as(idCol)).distinct()
    df.join(toDrop, Seq(idCol), "left_anti")
  }

  // ------------------------------------------------------------- simhash

  /** 64-bit SimHash over word-level shingle hashes: bit i of the result is
    * the sign of sum over tokens of (bit i set ? +1 : -1). Pure higher-order
    * expressions (zip_with/aggregate) — codegen-friendly, no UDF. */
  /** Per-bit vote counts over the token hashes (array<int> of length 64). */
  def simhashCounts(hashes: Column): Column = {
    // bit positions are static Scala ints so shifts stay compile-time
    val perHashBits = transform(hashes, h =>
      array((0 until 64).map(i =>
        when(shiftright(h, i).bitwiseAND(1) === 1, 1).otherwise(-1)): _*))
    aggregate(
      perHashBits,
      array_repeat(lit(0), 64),
      (acc, bits) => zip_with(acc, bits, (a, b) => a + b))
  }

  /** Fold the vote counts into the 64-bit hash. `counts` should be a
    * materialized column — it is referenced 64 times. */
  def simhashFromCounts(counts: Column): Column =
    (0 until 64).map { i =>
      when(element_at(counts, i + 1) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Convenience single-Column form (tests / small inputs; hot paths stage
    * words → hashes → counts → hash as simhashPairs does). */
  def simhash64(text: Column, shingleSize: Int = 2): Column =
    simhashFromCounts(simhashCounts(TextFunctions.shingleHashes(text, shingleSize)))

  /** Near-dup pairs by SimHash: LSH on the 4 16-bit chunks (a pair within
    * Hamming distance <= 3 of a 64-bit hash must agree on at least one of 4
    * chunks — pigeonhole), verified with exact bit_count(xor). */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      shingleSize: Int = 2): DataFrame = {
    val withSig = df
      .select(col(idCol).as("id"), TextFunctions.words(col(textCol)).as("__words"))
      .select(col("id"),
        TextFunctions.shingleHashesFromWords(col("__words"), shingleSize).as("__hashes"))
      .select(col("id"), simhashCounts(col("__hashes")).as("__counts"))
      .select(col("id"), simhashFromCounts(col("__counts")).as("sim"))
    val chunked = withSig.select(col("id"), col("sim"),
      explode(array((0 until 4).map { c =>
        concat_ws(":", lit(c.toString),
          shiftright(col("sim"), c * 16).bitwiseAND(0xFFFFL).cast("string"))
      }: _*)).as("bucket"))
    val l = chunked.select(col("bucket"), col("id").as("id_a"), col("sim").as("sim_a"))
    val r = chunked.select(col("bucket"), col("id").as("id_b"), col("sim").as("sim_b"))
    l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  // --------------------------------------------------- embedding near-dup

  /** Near-duplicate pairs over an embedding column via random-hyperplane
    * LSH (seeded) + exact cosine verification. `vecCol` is array<float>. */
  def embeddingPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      numPlanes: Int = 16,
      threshold: Double = 0.95,
      seed: Long = 42L): DataFrame = {
    val sketch = Ann.hyperplaneSketch(col(vecCol), dim, numPlanes, seed)
    val withB = df.select(col(idCol).as("id"), col(vecCol).as("vec"), sketch.as("bucket"))
    val l = withB.select(col("bucket"), col("id").as("id_a"), col("vec").as("vec_a"))
    val r = withB.select(col("bucket"), col("id").as("id_b"), col("vec").as("vec_b"))
    l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", Ann.cosine(col("vec_a"), col("vec_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
