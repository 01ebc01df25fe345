package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding storage/compression utilities for 100 TB-scale vector corpora.
  *
  * Symmetric int8 quantization: q_i = floor(127·x_i/max|x| + 0.5), stored
  * with the per-vector scale = max|x|/127, cutting storage (and shuffle
  * width on every downstream join) 4× vs float32 at ~0.5% cosine error for
  * typical embedding distributions. `floor(z + 0.5)` is used instead of
  * round() because its semantics are identical across engines (SQL oracles
  * reproduce it bit-for-bit), and no clipping is needed: |127·x/max|x|| ≤
  * 127 by construction.
  *
  * Everything is pure Column expressions over array<float> — no UDFs, no
  * shuffle; quantization parallelizes with the scan. NOTE on evaluation
  * mode: the per-element transforms/folds here are Catalyst higher-order
  * functions, which are INTERPRETED (no whole-stage codegen) — acceptable
  * for these single-pass shapes, but the repeated-traversal hot paths
  * (cosine, hyperplane sketch) use fused codegen'd kernels instead
  * ([[graft.functions.CosineSimilarity]],
  * [[graft.functions.HyperplaneSketchExpr]]).
  */
object Embeddings {

  /** Per-dimension standardization model: `z_i = (x_i − mean_i)/std_i`
    * (population std); constant dimensions (std 0) standardize to 0 —
    * they carry no signal and a division guard beats a NaN column. */
  final case class StandardizeModel(n: Long, mean: Array[Double],
      std: Array[Double]) {
    def dim: Int = mean.length
  }

  /** Fit per-dimension mean/std in ONE pass over the corpus, via the same
    * native partial aggregate PCA uses ([[graft.functions.VectorCovAgg]]:
    * the shuffle carries O(dim²) doubles per partition, never a row; the
    * diagonal of the second moment is the variance source). The model is
    * driver-sized (2·dim doubles) and ships as literals into
    * [[standardizeApply]] — the e4/PCA driver-model contract, including
    * its determinism story (fixed input partitioning ⇒ identical partial
    * merge order ⇒ identical doubles). */
  def standardizeFit(df: DataFrame, vecCol: String): StandardizeModel = {
    val row = df.agg(
        graft.functions.VectorCovAgg.vectorCov(col(vecCol)).as("s"))
      .selectExpr("s.n", "s.sums", "s.prods")
      .collect()(0)
    require(!row.isNullAt(0) && row.getLong(0) > 1,
      "standardizeFit: need at least 2 non-null vectors")
    val n = row.getLong(0)
    val sums = row.getSeq[Double](1).toArray
    val prods = row.getSeq[Double](2).toArray
    val dim = sums.length
    val mean = sums.map(_ / n)
    // prods is the upper triangle row-major; (i,i) sits at i·dim − i(i−1)/2
    val std = Array.tabulate(dim) { i =>
      val diag = prods(i * dim - i * (i - 1) / 2)
      math.sqrt(math.max(0.0, diag / n - mean(i) * mean(i)))
    }
    StandardizeModel(n, mean, std)
  }

  /** Apply a [[StandardizeModel]], long format `(idCol, pos, z)` — the
    * whitening step before PQ/IVF training or distance work on
    * heterogeneous-scale dimensions. Wrong-dimension vectors RAISE (the
    * loud-failure convention, as [[graft.operators.Pca.projectLong]]).
    * Every z is one subtract + one divide on the literal model — any SQL
    * engine replays it bit-for-bit from the persisted model. */
  def standardizeApply(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      model: StandardizeModel): DataFrame = {
    val zs = array(model.mean.indices.map { i =>
      val x = element_at(col(vecCol), i + 1).cast("double")
      if (model.std(i) == 0.0) lit(0.0)
      else (x - lit(model.mean(i))) / lit(model.std(i))
    }: _*)
    df.filter(assert_true(size(col(vecCol)) === model.dim,
        lit(s"standardize: expected dimension ${model.dim}")).isNull)
      .select(col(idCol), posexplode(zs).as(Seq("pos", "z")))
  }

  /** max |x_i| of a vector column, as double (order-independent fold). */
  def maxAbs(vec: Column): Column =
    aggregate(vec, lit(0.0), (a, x) => greatest(a, abs(x.cast("double"))))

  /** int8 codes for `vec` given a STAGED max-abs column (must be a prior
    * projection's attribute — a captured aggregate would re-run per element,
    * see the lambda-capture note on TextFunctions.shingles). Zero vectors
    * quantize to all-zero codes. */
  def quantizeCodes(vec: Column, mxCol: Column): Column =
    transform(vec, x =>
      when(mxCol === 0, lit(0))
        .otherwise(floor(x.cast("double") * 127.0 / mxCol + 0.5)).cast("int"))

  /** Quantize a whole frame: (idCol, scale, qvec) with the max-abs staged
    * through an intermediate projection. */
  def quantize(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), col(vecCol), maxAbs(col(vecCol)).as("__mx"))
      .select(col(idCol), (col("__mx") / 127.0).as("scale"),
        quantizeCodes(col(vecCol), col("__mx")).as("qvec"))

  /** Reconstructed (dequantized) vector: q_i · scale, as array<double>. */
  def dequantize(qvecCol: Column, scaleCol: Column): Column =
    transform(qvecCol, q => q.cast("double") * scaleCol)

  /** Cosine between two quantized vectors — scales cancel in cosine, so
    * this is cosine over the integer codes directly: the fused kernel
    * accepts int arrays natively (no interpreted cast-transform, no
    * dequantization materialized). */
  def quantizedCosine(qa: Column, qb: Column): Column =
    graft.functions.CosineSimilarity(qa, qb)

  /** L2 norm of a vector column, as a SEQUENTIAL left fold of squares —
    * the same evaluation order as DuckDB's list_reduce, so sqrt and the
    * per-element divisions below are bit-comparable cross-engine. */
  def l2norm(vec: Column): Column =
    sqrt(aggregate(vec, lit(0.0),
      (a, x) => a + x.cast("double") * x.cast("double")))

  /** Elementwise mean-pooling per group (chunk embeddings → document
    * embedding): one hash shuffle of BOUNDED buffers — the
    * [[graft.functions.VectorAvgAgg]] TypedImperativeAggregate rides
    * partial aggregation, so each map task contributes (dim doubles +
    * count) per group, never the exploded O(rows × dim) a
    * posexplode→groupBy(pos) plan would shuffle. Returns
    * (groupCol, mean_vec array<double>); dimension mismatches raise. */
  def meanPool(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.groupBy(groupCol)
      .agg(graft.functions.VectorAvgAgg.vectorAvg(col(vecCol)).as("mean_vec"))

  /** L2-normalize a vector frame: (idCol, norm, nvec) with the norm staged
    * through a projection (lambda-capture rule: the transform below must
    * reference an ATTRIBUTE, or the fold re-runs per element). Zero
    * vectors normalize to zero vectors, norm 0. */
  def l2normalize(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), col(vecCol), l2norm(col(vecCol)).as("__n"))
      .select(col(idCol), col("__n").as("norm"),
        when(col("__n") === 0.0,
          transform(col(vecCol), _ => lit(0.0)))
          .otherwise(transform(col(vecCol), x => x.cast("double") / col("__n")))
          .as("nvec"))

  /** Deterministic STAND-IN text embedder — the multimodal stub policy
    * applied to text encoding: component `j = u_j·2 − 1` with `u_j` the
    * md5 uniform of `(text, salt, j)` — pure codegen, replayable by any
    * md5-capable engine, so the PLUMBING around an embedding model
    * (chunking, pooling, indexing, serving joins) is testable end-to-end
    * with hash gates. A real encoder swaps in at exactly this seam (a
    * mapInPandas/ONNX batch call producing the same `array<double>`
    * column); everything downstream is untouched. NOT a semantic
    * embedding — similarity over these vectors is meaningless by design
    * (distinct texts are ~orthogonal), which is precisely what makes the
    * pipeline tests honest: nothing can accidentally rely on model
    * behavior. */
  def hashEmbed(text: Column, dim: Int, salt: String = "emb"): Column = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    array((0 until dim).map { j =>
      conv(substring(md5(concat(text, lit(s"_${salt}_$j"))), 1, 8), 16, 10)
        .cast("double") / lit(4294967296.0) * 2.0 - 1.0
    }: _*)
  }

  /** Binary (sign-bit) quantization: bit `i` of word `⌊i/64⌋` is 1 iff
    * `vec[i] > 0` — 32× narrower than float32 (a 64-dim embedding becomes
    * ONE long), and the Hamming distance between two codes is a monotone
    * proxy for angular distance (Charikar's SimHash bound applied to the
    * identity hyperplanes). The serving pattern is scan-on-codes →
    * exact re-rank of a short list ([[graft.operators.Ann.binaryTopK]]).
    *
    * The packing is a pure per-row expression (no shuffle): word `w` folds
    * positions `w·64 … w·64+63` with `try_element_at` so the last partial
    * word of a non-multiple-of-64 dim pads with zeros — replayable in
    * ANSI SQL, which is how the e6 gate's oracle checks it from the raw
    * floats. Sign convention: strictly positive → 1 (zeros and NaNs → 0;
    * NaN > 0 is false in both engines). */
  def signWords(vecCol: String): Column =
    expr(s"""transform(
      sequence(0, cast((size($vecCol) - 1) div 64 as int)),
      w -> aggregate(sequence(0, 63), 0L, (acc, i) ->
        acc + IF(try_element_at($vecCol, w*64 + i + 1) > CAST(0.0 AS FLOAT),
                 shiftleft(1L, i), 0L)))""")

  /** Table form of [[signWords]]: `(id, bits)` with `bits: array<long>`. */
  def binarize(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), signWords(vecCol).as("bits"))

  /** Driver-side packing of one query vector under the IDENTICAL sign
    * convention (for building query literals against a binarized table). */
  def signWordsLocal(vec: Array[Float]): Array[Long] = {
    // max(1, …): the SQL form maps an empty vector to one all-zero word
    // (`sequence(0, -1 div 64)` = [0]); the packings must stay identical
    // on every input, including the degenerate one
    val words = new Array[Long](math.max(1, (vec.length + 63) / 64))
    var i = 0
    while (i < vec.length) {
      if (vec(i) > 0f) words(i / 64) |= (1L << (i % 64))
      i += 1
    }
    words
  }
}
