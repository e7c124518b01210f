package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Streaming twins of the batch event operators (graft.ops.Events): the
  * batch forms are oracle-checkable SQL; these run the same semantics
  * continuously under Structured Streaming.
  *
  * Scale notes: both operators shuffle once on their grouping keys; state
  * store size is bounded by the watermark (windowed agg) or the explicit
  * timeout (sessionization) — without those bounds a 100 TB/day stream
  * grows state forever.
  */
object Windowed {

  /** Watermarked tumbling-window aggregation over an event stream with
    * columns (ts: timestamp, event_type: string, value: double).
    * Late data beyond `watermark` is dropped and its window state evicted.
    */
  def tumblingCounts(events: DataFrame, windowDur: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Streaming hot-key monitor — the continuous twin of q131's heavy-hitter
    * diagnostic: per tumbling window, emit every key whose event count
    * reaches `threshold` — the alarm a pipeline watches to engage q49/q62
    * salting (or rate-limiting) BEFORE a hot key melts a downstream
    * shuffle. One watermarked keyed aggregation; state is one count per
    * (window, key) live within the watermark, evicted with the window, and
    * the emitted stream is only the (few) keys over threshold. Input needs
    * (ts: timestamp, user_id: long) columns.
    */
  def hotKeyMonitorStream(events: DataFrame, windowDur: String,
                          watermark: String, threshold: Long): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
      .select(col("window.start").as("window_start"), col("user_id"), col("n"))

  /** Streaming distinct-rate monitor: per tumbling window, a mergeable KMV
    * sketch of the key ([[graft.functions.Sketches.KmvAggregator]]) plus
    * its distinct ESTIMATE — cardinality monitoring with state bounded at
    * k longs per window instead of a per-key distinct set, which is the
    * only form that survives an unbounded key space. The batch twin is
    * q153 (`Queries.kmvDaily`); same hash family, same estimator, so a
    * replayed batch over the same window reproduces the stream's numbers
    * exactly. Input needs (ts: timestamp, user_id: long).
    */
  def distinctEstimateStream(events: DataFrame, windowDur: String,
                             watermark: String): DataFrame = {
    import graft.functions.Sketches
    events
      .withWatermark("ts", watermark)
      .withColumn("h", Sketches.kmvHash48(col("user_id")))
      .groupBy(window(col("ts"), windowDur))
      .agg(Sketches.kmvSketch(col("h")).as("sk"))
      .select(col("window.start").as("window_start"),
        size(col("sk")).cast("long").as("n_sketch"),
        Sketches.kmvEstimate("sk").as("est_distinct"))
  }

  /** Streaming exact dedup by content fingerprint — the continuous twin of
    * [[graft.functions.Dedup.exactDuplicateGroups]]: keep the first document
    * per normalized-text fingerprint, drop every later duplicate.
    * `dropDuplicates` on the fingerprint keys the state store by a 32-char
    * hash (the text itself never enters state), and
    * `dropDuplicatesWithinWatermark` evicts fingerprints older than the
    * watermark: duplicates separated by more than `watermark` may reappear —
    * the standard trade for bounded state on an unbounded stream; the batch
    * operator sweeps residuals exactly.
    * Input needs (ts: timestamp, text: string) columns.
    */
  def dedupStream(docs: DataFrame, watermark: String): DataFrame =
    docs
      .withWatermark("ts", watermark)
      .withColumn("fp", graft.functions.Text.fingerprint(col("text")))
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp")

  /** Streaming curation gate: watermarked exact dedup + the Gopher quality
    * rules applied to documents as they arrive — the continuous front of
    * the batch funnel (q85). The quality flags are pure projections so the
    * gate adds NO state beyond dedup's fingerprint store; rejected rows are
    * counted via `observe` (visible in each progress event), never silently
    * dropped.
    */
  def curationGateStream(docs: DataFrame, watermark: String): DataFrame = {
    val pass = graft.functions.Text.gopherFlags(col("text"))
      .map(_._2).reduce(_ * _) === 1L
    dedupStream(docs, watermark)
      .withColumn("__pass", pass)
      .observe("graft.curation_gate",
        count(lit(1)).as("n_after_dedup"),
        count(when(!col("__pass"), 1)).as("n_quality_rejected"))
      .filter(col("__pass"))
      .drop("__pass")
  }

  /** Model-based spam gate on a stream: score each arriving document with
    * a trained [[graft.functions.Classifier]] model exported to a
    * stateless expression ([[graft.functions.Classifier.scoreExpr]]) and
    * drop positive (spam) scores — the streaming twin of the q103 batch
    * scorer, and the continuous deployment shape of a quality filter:
    * train offline, export the fixed-size model into the stream job, gate
    * per-row with NO state store. Rejects are counted via `observe`,
    * never silently dropped.
    */
  def classifierGateStream(docs: DataFrame, model: Map[Long, Long]): DataFrame =
    docs
      .withColumn("score",
        graft.functions.Classifier.scoreExpr(model, col("text")))
      .observe("graft.classifier_gate",
        count(lit(1)).as("n_scored"),
        count(when(col("score") > 0L, 1)).as("n_spam_rejected"))
      .filter(col("score") <= 0L)

  /** Watermarked stream-stream interval join: attribute each purchase to the
    * same user's clicks in the preceding `maxDelay` (the continuous twin of
    * the batch as-of/range joins, `graft.ops.AsOf` / `graft.ops.RangeJoin`).
    * Inner-join results emit as soon as both sides arrive; the watermarks
    * plus the time-bound join condition let Spark evict buffered rows older
    * than `watermark + maxDelay`, which is what keeps join state bounded on
    * an unbounded stream — without the time bound the state store grows
    * forever. One shuffle per side on user_id.
    *
    * Input contracts: clicks (user_id, click_ts, ...), purchases
    * (user_id, purchase_ts, ...).
    */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame,
                      watermark: String, maxDelay: String,
                      joinType: String = "inner"): DataFrame = {
    val c = clicks.withWatermark("click_ts", watermark)
    val p = purchases.withColumnRenamed("user_id", "p_user_id")
      .withWatermark("purchase_ts", watermark)
    c.join(p,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $maxDelay"),
        joinType)
      .drop("p_user_id")
  }

  /** Streaming point-in-time SCD2 enrichment: each micro-batch of facts
    * joins the dimension VERSION in effect at the fact's event time
    * ([[graft.pipeline.Pipeline.lookupAsOf]] over the full version
    * chain), through foreachBatch — the as-of join needs a window over
    * the unioned timeline, which continuous mode can't express, and the
    * micro-batch seam is exactly where a lakehouse runs it. The dim is
    * re-read per batch, so a version closed between batches takes effect
    * on the next batch — the same freshness contract as stream-static
    * equi joins. Late facts still match their OWN time's version: that
    * is the point of as-of (a plain equi join would enrich them with
    * today's dim).
    *
    * Exactly-once: foreachBatch delivers at-least-once (the
    * [[ArrivalJob.writeBatch]] contract), so the output is stamped with
    * the batch id and written via DYNAMIC partition overwrite scoped to
    * that batch's own `job_run_id=` partition — a replayed epoch replaces
    * exactly what its first attempt wrote instead of appending a
    * duplicate copy (the r13 ADVICE fix; a plain mode("append") here
    * duplicated rows on crash-replay).
    *
    * When `auditPath` is set, each micro-batch also appends the standard
    * DQ audit rows ([[graft.dq.Checks]]) the batch stages log at every
    * seam — count preserved through the join, fact columns unchanged
    * (the as-of lookup is 1:1), no duplicate output rows, key/time never
    * null — the streaming leg of the reference's per-stage PASS/FAIL
    * trail (`KafkaDemo.sh:133-143`). Audit rows are batch-stamped and
    * dynamically overwritten too, so replays do not double-log.
    */
  def startAsOfEnrich(facts: DataFrame, dim: () => DataFrame,
                      businessKey: String, factTime: String,
                      dimCols: Seq[String], outPath: String,
                      checkpoint: String,
                      auditPath: Option[String] = None): StreamingQuery =
    facts.writeStream
      .queryName("graft_asof_enrich")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val enriched = graft.pipeline.Pipeline
          .lookupAsOf(batch, dim(), businessKey, factTime, dimCols)
        // the write plus the four audit checks would each re-execute the
        // as-of join (and re-read the dim) — persist for the batch's scope
        if (auditPath.isDefined) enriched.persist()
        try {
          writeBatchIdempotent(enriched, batchId, outPath)
          auditPath.foreach { ap =>
            import graft.dq.Checks
            val factCols = batch.columns.toIndexedSeq.map(col)
            val audit = Seq(
              Checks.countMatch(batch, enriched, "asof_enrich", "STREAM_ASOF"),
              Checks.dataMatch(batch, enriched.select(factCols: _*),
                "asof_enrich", "STREAM_ASOF"),
              Checks.duplicateCheck(enriched, "asof_enrich", "STREAM_ASOF"),
              Checks.nullCheck(enriched, "asof_enrich", "STREAM_ASOF",
                columns = Seq(businessKey, factTime)))
            import batch.sparkSession.implicits._
            writeBatchIdempotent(audit.toDS().toDF(), batchId, ap)
          }
        } finally if (auditPath.isDefined) enriched.unpersist()
      }
      .start()

  /** Batch-stamped idempotent parquet write — the shared foreachBatch
    * discipline ([[ArrivalJob.writeBatch]]): stamp `job_run_id` =
    * batchId, dynamic-partition-overwrite only that run's partition.
    * At-least-once delivery + self-replacing writes = exactly-once files.
    */
  private def writeBatchIdempotent(df: DataFrame, batchId: Long,
                                   path: String): Unit =
    df.withColumn("job_run_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("job_run_id")
      .parquet(path)

  /** Generic audited streaming sink: write any streaming transform's
    * output (e.g. [[dedupStream]], [[curationGateStream]]) to parquet
    * with the batch-stamped idempotent discipline, appending per-batch DQ
    * audit rows — duplicate check (post-dedup batches must be dup-free)
    * and null audit over `notNullCols` — to `auditPath`. This is the
    * streaming twin of the batch stages' per-seam ValidationResult trail:
    * the same [[graft.dq.Checks]] rows, keyed by `job_run_id`, queryable
    * next to the data they describe.
    */
  def startAuditedSink(out: DataFrame, outPath: String, checkpoint: String,
                       auditPath: String, sourceName: String, stage: String,
                       notNullCols: Seq[String]): StreamingQuery =
    out.writeStream
      .queryName(s"graft_audited_$sourceName")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatchIdempotent(batch, batchId, outPath)
        import graft.dq.Checks
        val audit = Seq(
          Checks.duplicateCheck(batch, sourceName, stage),
          Checks.nullCheck(batch, sourceName, stage, columns = notNullCols))
        import batch.sparkSession.implicits._
        writeBatchIdempotent(audit.toDS().toDF(), batchId, auditPath)
      }
      .start()

  final case class EwmaIn(event_type: String, ts: Timestamp)

  /** Semantic version stamped into every flatMapGroupsWithState state
    * envelope below. The state-store encoder schema is part of a streaming
    * job's ON-DISK contract: r14's `lateDrops` addition changed
    * [[EwmaState]]'s schema and forced a fresh checkpoint. The envelope
    * makes the NEXT addition structural instead: each state class carries
    * this version discriminator plus fixed reserved slots (`reservedA`/
    * `reservedB` longs, `reservedS` string) that a future field CLAIMS
    * without changing the stored schema — Spark's state schema check
    * compares types, not names, so a bumped version repurposing a slot
    * restores old checkpoints cleanly (old states carry the slot's
    * neutral default; the new logic interprets by `version`).
    * WindowedStreamingSpec pins the restore path with a live checkpoint.
    */
  val StateVersion: Int = 2

  final case class EwmaState(version: Int, day: Long, n: Long, ewma: Long,
                             hasEwma: Boolean, lateDrops: Long = 0L,
                             reservedA: Long = 0L, reservedB: Long = 0L,
                             reservedS: String = "")
  final case class EwmaOut(event_type: String, day: Long, n: Long,
                           ewma_prev_micro: Long, is_anomaly: Int,
                           n_late_dropped: Long = 0L)

  /** Streaming twin of the q184 integer-EWMA anomaly monitor: per event
    * type, a day's count is scored against the exponentially weighted mean
    * of all CLOSED days before it the moment the day closes (an event of a
    * later day arrives). Identical arithmetic to the batch query —
    * E_t = E_{t−1} + sgn-DIV(x_t·1e6 − E_{t−1}, 8), first closed day
    * scored against its own total — so for in-order streams the emitted
    * rows match q184's closed-day prefix row-for-row. State is ONE
    * (day, count, ewma) triple per event type regardless of stream
    * length: the bounded-state form of anomaly tracking on an unbounded
    * stream. The open day never emits (its count may still grow).
    *
    * Out-of-order guard (the r13 ADVICE fix): within a batch events apply
    * in event-time order, but ACROSS batches an event whose day precedes
    * the open day cannot be folded in — the naive `else` branch would
    * close the open day with a partial count (a wrong anomaly row) and
    * re-open the past day, so Append output carried duplicate and
    * incorrect day rows. Such stragglers are DROPPED and counted: every
    * emitted row carries the cumulative `n_late_dropped` for its key, the
    * side-channel a monitor alarms on (a nonzero rate means the source
    * needs the batch q184 sweep, whose full-sort semantics are exact).
    *
    * CHECKPOINT COMPATIBILITY: state rides the versioned envelope (see
    * [[StateVersion]]) — the r14 `lateDrops` addition and the envelope
    * introduction itself each required a fresh checkpoint, but every
    * FUTURE field addition claims a reserved slot under a bumped version
    * with the stored schema unchanged, so deployed streams restart from
    * their existing checkpoints.
    */
  def ewmaAnomalyStream(events: Dataset[EwmaIn]): Dataset[EwmaOut] = {
    import events.sparkSession.implicits._
    def sgnDiv8(d: Long): Long = if (d >= 0) d / 8 else -((-d) / 8)
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[EwmaState, EwmaOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (key, it, state) =>
          var st = state.getOption
            .getOrElse(EwmaState(StateVersion, -1L, 0L, 0L, hasEwma = false))
          val out = scala.collection.mutable.Buffer.empty[EwmaOut]
          it.toSeq.sortBy(_.ts.getTime).foreach { e =>
            val day = e.ts.getTime / 86400000L
            if (st.day < 0) st = EwmaState(StateVersion, day, 1L, 0L, hasEwma = false)
            else if (day == st.day) st = st.copy(n = st.n + 1)
            else if (day < st.day) st = st.copy(lateDrops = st.lateDrops + 1)
            else {
              // close st.day
              val x = st.n * 1000000L
              val ePrev = if (st.hasEwma) st.ewma else x
              out += EwmaOut(key, st.day, st.n, ePrev,
                if (math.abs(x - ePrev) * 2 > ePrev) 1 else 0, st.lateDrops)
              val eNew = if (st.hasEwma) st.ewma + sgnDiv8(x - st.ewma) else x
              st = st.copy(day = day, n = 1L, ewma = eNew, hasEwma = true)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  final case class FunnelInput(user_id: Long, event_type: String, ts: Timestamp)
  // t1/t2/t3: 0 = stage not reached; versioned envelope per [[StateVersion]]
  final case class FunnelState(version: Int, t1: Long, t2: Long, t3: Long,
                               reservedA: Long = 0L, reservedB: Long = 0L,
                               reservedS: String = "")
  final case class FunnelOut(user_id: Long, step: Int, stage: String, at_ms: Long)

  /** Streaming twin of the q115 ordered funnel: a fixed-size per-user state
    * machine advances signup → click-after-signup → purchase-after-click,
    * emitting one row the moment a user completes a NEW stage. State is
    * three epoch-ms longs per user regardless of stream length — the
    * bounded-state form of funnel tracking on an unbounded stream. Within
    * a batch, events apply in event-time order; with in-order delivery the
    * emitted stages match the batch funnel's first-completion gating.
    */
  def funnelStages(events: Dataset[FunnelInput]): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[FunnelInput], state: GroupState[FunnelState]) =>
          var s = state.getOption.getOrElse(FunnelState(StateVersion, 0L, 0L, 0L))
          val out = scala.collection.mutable.ListBuffer.empty[FunnelOut]
          rows.toSeq.sortBy(_.ts.getTime).foreach { r =>
            val t = r.ts.getTime
            r.event_type match {
              case "signup" if s.t1 == 0L =>
                s = s.copy(t1 = t); out += FunnelOut(uid, 1, "signup", t)
              case "click" if s.t1 != 0L && s.t2 == 0L && t >= s.t1 =>
                s = s.copy(t2 = t); out += FunnelOut(uid, 2, "signup>click", t)
              case "purchase" if s.t2 != 0L && s.t3 == 0L && t >= s.t2 =>
                s = s.copy(t3 = t)
                out += FunnelOut(uid, 3, "signup>click>purchase", t)
              case _ =>
            }
          }
          state.update(s)
          out.iterator
      }
  }

  final case class SessionInput(user_id: Long, ts: Timestamp, value: Double)
  // versioned envelope per [[StateVersion]]
  final case class SessionState(version: Int, start: Long, last: Long,
                                n: Long, total: Double,
                                reservedA: Long = 0L, reservedB: Long = 0L,
                                reservedS: String = "")
  final case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long,
                              n_events: Long, total_value: Double)

  /** Stream–static dimension enrichment: a streaming fact joined to a
    * BATCH dimension table. Structured Streaming re-plans the static side
    * per micro-batch, which is the operational point: a dim table that
    * lives in parquet/Delta and gets overwritten nightly (the SCD Type-1
    * path, `Pipeline.applyScd`) is picked up by the running stream on its
    * next batch with NO restart — the streaming twin of q06's dimEnrich.
    * Broadcast-sized dims broadcast; bigger dims shuffle only the batch's
    * slice of the stream. Left join keeps facts with no dim row (the
    * q16-style null audit applies downstream).
    */
  def enrichStream(facts: DataFrame, dim: DataFrame, key: String): DataFrame =
    facts.join(dim, Seq(key), "left")

  /** Declarative gap sessions via the BUILT-IN `session_window` — the
    * (a)-level twin of [[sessionize]] below: when the semantics fit
    * (gap-close, standard aggregates) the built-in operator gets
    * watermark-driven state cleanup, session merging, and codegen from
    * Catalyst for free, and is what production should reach for FIRST;
    * the flatMapGroupsWithState machine is the escape hatch for semantics
    * it can't express. Input needs (ts: timestamp, user_id, value).
    */
  def sessionWindowStats(events: DataFrame, gap: String,
                         watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))

  /** Custom sessionization state machine via flatMapGroupsWithState — the
    * (c)-level path for semantics `session_window` can't express (e.g.
    * emitting only on session close, carrying custom accumulators). A
    * session closes after `gapMs` of inactivity (processing-time timeout in
    * production; pass `GroupStateTimeout.NoTimeout` for synchronous tests,
    * where only event-time gaps inside a batch close sessions); exactly one
    * output row per closed session.
    */
  def sessionize(events: Dataset[SessionInput], gapMs: Long,
                 timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout())
      : Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val useTimeout = timeout != GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), timeout) {
        (userId: Long, rows: Iterator[SessionInput], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, s.start, s.last, s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { r =>
              val t = r.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(s.copy(last = t, n = s.n + 1, total = s.total + r.value))
                case Some(s) =>
                  closed ::= SessionOut(userId, s.start, s.last, s.n, s.total)
                  cur = Some(SessionState(StateVersion, t, t, 1L, r.value))
                case None =>
                  cur = Some(SessionState(StateVersion, t, t, 1L, r.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (useTimeout) state.setTimeoutDuration(gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
