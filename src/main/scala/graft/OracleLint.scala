package graft

/** Registration-time lint over `SparkEntry.oracleSql` closing the
  * round-16 t69/t71 defect CLASS: an INTEGER `sum(...)` left uncast in a
  * DuckDB oracle is typed HUGEINT, which a pandas-materializing checker
  * renders as float64 ("701.0" vs Spark's "701") — rows and schema match,
  * the hash silently diverges. The oracle-side twin of the round-14 t57
  * lesson (unhashable complex FINAL columns), closed the same way: refuse
  * at registration, not at driver-compare time.
  *
  * Rule: every `sum(` in an oracle string must sit inside a `cast(...)`
  * somewhere up its paren stack, or the gate must be explicitly
  * allowlisted below with the reason the sum cannot leak a HUGEINT into
  * the final projection (double-typed summand, or an intermediate that a
  * later CAST/derivation scalar-izes). A NEW gate with an uncast sum
  * fails `graft.Verify` loudly for that gate (stale output cleaned, so
  * the driver sees red, never stale-green) and fails OracleLintSpec.
  */
object OracleLint {

  /** Offsets+context of `sum(` calls not enclosed by any `cast(`.
    * Single-quoted SQL literals are skipped so parens inside string
    * constants (regex patterns etc.) cannot desync the paren stack. */
  def uncastSums(sql: String): Seq[String] = {
    val s = sql.toLowerCase
    val viol = scala.collection.mutable.ListBuffer.empty[String]
    val stack = scala.collection.mutable.Stack.empty[String]
    var i = 0
    var inLit = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inLit) {
        if (c == '\'') inLit = false
      } else c match {
        case '\'' => inLit = true
        case '(' =>
          // identifier (possibly whitespace-separated) preceding the paren
          var j = i - 1
          while (j >= 0 && s.charAt(j).isWhitespace) j -= 1
          val end = j + 1
          while (j >= 0 && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '_')) j -= 1
          val fn = s.substring(j + 1, end)
          if (fn == "sum" && !stack.contains("cast"))
            viol += s.substring(math.max(0, i - 30), math.min(s.length, i + 25))
              .replace('\n', ' ')
          stack.push(fn)
        case ')' => if (stack.nonEmpty) { stack.pop(); () }
        case _ =>
      }
      i += 1
    }
    viol.toList
  }

  /** Gates whose uncast sums are PROVEN benign, with the reason. Adding a
    * new gate here requires the same argument: either the summand is
    * DOUBLE (DuckDB sum(DOUBLE) = DOUBLE — no HUGEINT) or the sum is an
    * intermediate whose every path to the final SELECT passes a CAST or a
    * double-producing operation. Anything else: CAST the sum in the SQL. */
  val allowed: Map[String, String] = Map(
    "q51_anomaly"          -> "w_sum/w_sumsq feed a DOUBLE z-score expression (division) before the final SELECT",
    "ml2_logreg"           -> "sum over sigmoid residuals — DOUBLE summand",
    "t78_quality_filter"   -> "sum over sigmoid residuals — DOUBLE summand (the composed ml2 trainer)",
    "ml3_naive_bayes"      -> "sum(c.x) of DOUBLE log-probs inside round(...,6)",
    "g1_pagerank"          -> "sum of DOUBLE rank shares (pr.r is DOUBLE)",
    "g7_trustrank"         -> "g1's rank-share sums, cast at the final projection",
    "t102_crawl_trust"     -> "g7's rank-share sums, cast at the final projection",
    "d23_dsir_select"      -> "sum(r.lr) of DOUBLE log-ratios inside round(...,6)",
    "t75_training_run"     -> "sum(r.lr) of DOUBLE log-ratios inside round(...,6) — the composed d23 stage; the packing window sum IS cast",
    "t3b_tokens_bpe"       -> "sum(ntok) intermediate; final column derived via CAST in the outer SELECT",
    "t34_tokenize_pack"    -> "sum(ntok) intermediate; final column derived via CAST in the outer SELECT",
    "t20_backoff_lm"       -> "sum(l)/count(*) — division yields DOUBLE before the final SELECT",
    "t11_perplexity"       -> "sum(l)/count(*) — division yields DOUBLE before the final SELECT",
    "t12b_bm25"            -> "sum(c) of DOUBLE bm25 terms inside round(...,6)",
    "t29_kl_drift"         -> "n_a/n_b intermediates feed DOUBLE ratio arithmetic only",
    "t24_pmi"              -> "corpus totals feed DOUBLE ratio arithmetic only",
    "t12c_bm25_join"       -> "sum of DOUBLE ln() terms",
    "t101_hard_negatives"  -> "sum of DOUBLE ln() terms (t12c's scoring)",
    "t12d_bm25_weighted"   -> "sum of DOUBLE weighted ln() terms",
    "t12e_bm25_join_salted"-> "sum of DOUBLE ln() terms",
    "h1_hybrid_join"       -> "sums of DOUBLE ln()/rrf terms",
    "m16_interleave"       -> "sum(tokens) intermediate drives recursive pack comparison; final columns are row_number/CAST-derived",
    "m16b_interleave_media"-> "sum(tokens) intermediate drives recursive pack comparison; final columns are row_number/CAST-derived",
    "t10b_mix_temperature" -> "sum(pow(n,0.5)) DOUBLE; sum(n) feeds DOUBLE ratio arithmetic only",
    "st2_session"          -> "windowed sum(ns) is a session ordinal consumed by a CAST in the outer SELECT"
  )

  /** Violations that are NOT allowlisted: (gate, contexts). Empty = green. */
  def violations(oracles: Map[String, String]): Map[String, Seq[String]] =
    oracles.collect {
      case (name, sql) if !allowed.contains(name) =>
        name -> uncastSums(sql)
    }.filter(_._2.nonEmpty)

  /** Allowlist entries that no longer match a violating gate — dead
    * entries must be pruned so the list documents only live exceptions. */
  def staleAllowed(oracles: Map[String, String]): Set[String] =
    allowed.keySet.filter(n =>
      !oracles.contains(n) || uncastSums(oracles(n)).isEmpty)
}
