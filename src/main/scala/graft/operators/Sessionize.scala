package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based batch sessionization over an event log — the offline
  * counterpart of Structured Streaming's `session_window` (which
  * [[graft.streaming.Streams]] uses for the live path): consecutive events
  * of the same key belong to one session while the inter-event gap stays
  * within `gapSeconds`; a longer silence closes the session and the next
  * event opens a new one. This is the classic clickstream/telemetry
  * building block (user visits, device sessions, job runs) that feeds
  * funnel, retention, and engagement rollups.
  */
object Sessionize {

  /** Assign a session ordinal to every event and roll each session up to
    * one row: `(key, session_seq, session_start, session_end, n_events,
    * sum_<m>...)`.
    *
    * Semantics (exactly replayable in ANSI SQL, which the gate's oracle
    * does): events of one key are ordered by timestamp; an event opens a
    * new session iff it is the key's first or its gap to the previous
    * event EXCEEDS `gapSeconds` (a gap of exactly `gapSeconds` stays in
    * the session — the same closed-boundary contract as
    * `session_window`'s gap duration). `session_seq` is the 1-based
    * ordinal of the session within its key. Gap arithmetic is integer
    * microseconds end to end (`unix_micros`), so the boundary decision is
    * bit-exact and independent of float environment. Events with equal
    * timestamps have mutual gap 0 and always share a session, so the
    * assignment needs no tie-break column to be deterministic.
    *
    * Each `(name, col)` in `measures` adds a `sum_<name>` total summed as
    * DECIMAL(20, 2) (exact for 2-decimal-place measures, this corpus's
    * money/metric convention) and returned as double — deterministic
    * under any aggregation order, so a hash gate can pin it.
    *
    * Spark shape, sized for a 100 TB event log: ONE hash shuffle on the
    * session key feeds both windows (lag + running count — same
    * partitioning, same ordering, so they share a single sort) and the
    * final per-session aggregation, which Catalyst plans WITHOUT a second
    * exchange (the groupBy key set extends the window partition key).
    * State per key is O(1) during the scan — no session buffering, unlike
    * a mapGroups formulation, and spill-safe because it is just a sort.
    * Skew: one hot key serializes its own sort but nothing else; a key
    * hot enough to matter at 100 TB (a bot account) is a data-quality
    * kill-list case, not a planner case — see SCALING.md.
    */
  def sessionize(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      gapSeconds: Long,
      measures: Seq[(String, String)] = Nil): DataFrame = {
    require(gapSeconds >= 0, s"gapSeconds must be >= 0, got $gapSeconds")
    val w = Window.partitionBy(keyCol).orderBy(col("__us"))
    val gapUs = gapSeconds * 1000000L
    val aggs =
      min(col(tsCol)).as("session_start") ::
      max(col(tsCol)).as("session_end") ::
      count(lit(1)).as("n_events") ::
      measures.toList.map { case (name, c) =>
        sum(col(c).cast("decimal(20,2)")).cast("double").as(s"sum_$name")
      }
    events
      .select(col(keyCol) +: col(tsCol) +: unix_micros(col(tsCol)).as("__us") +:
        measures.map(m => col(m._2)): _*)
      .withColumn("__new",
        when(col("__us") - lag(col("__us"), 1).over(w) <= gapUs, 0L)
          .otherwise(1L))
      .withColumn("session_seq",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("session_seq"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Leading-edge debounce: keep only the events that OPEN a session
    * under [[sessionize]]'s gap rule (the key's first event, and any
    * event more than `gapSeconds` after its predecessor) — the standard
    * burst-collapse for alert streams and retry storms, where one event
    * per burst is signal and the rest are echo. Same one-shuffle lag
    * window, same integer-microsecond boundary arithmetic; all input
    * columns pass through. (This is the stateless leading-edge form: a
    * trailing-edge debounce needs the burst's LAST event, i.e. a full
    * sessionize + max.)
    *
    * Unlike [[sessionize]] — whose per-session AGGREGATES are tie-proof —
    * debounce emits a specific ROW per burst, so equal-timestamp events
    * need `tieCols` (a unique id) to pin WHICH row opens the burst;
    * without it, ties make the keep choice partitioning-dependent. */
  def debounce(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      gapSeconds: Long,
      tieCols: Seq[String] = Nil): DataFrame = {
    require(gapSeconds >= 0, s"gapSeconds must be >= 0, got $gapSeconds")
    val w = Window.partitionBy(keyCol)
      .orderBy(unix_micros(col(tsCol)) +: tieCols.map(col): _*)
    val gapUs = gapSeconds * 1000000L
    events
      .withColumn("__keep",
        when(unix_micros(col(tsCol)) -
          lag(unix_micros(col(tsCol)), 1).over(w) <= gapUs, false)
          .otherwise(true))
      .filter(col("__keep"))
      .drop("__keep")
  }
}
