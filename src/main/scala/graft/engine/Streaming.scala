package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2.10 — absent in the batch
  * reference; required of the engine): file-source streams over the events
  * table, windowed aggregation with watermark, and custom session state via
  * flatMapGroupsWithState. `runToCompletion` drives a file-backed stream
  * synchronously so batch oracles can verify streaming results. */
object Streaming {

  /** Tumbling 1-hour counts/sums per event type, as a streaming query over
    * the parquet events table; returns the materialized complete-mode
    * result. Batch-equivalent: Queries q06 (without HAVING). */
  def hourlyByType(spark: SparkSession, eventsPath: String): DataFrame = {
    val schema = spark.read.parquet(eventsPath).schema
    val stream = streamOf(spark, eventsPath, schema)
    val agg = stream
      .withColumn("hour_epoch", (unix_timestamp(col("ts")) / 3600L).cast("long") * 3600L)
      .groupBy("event_type", "hour_epoch")
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
    val qn = s"stream_hourly_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = agg.writeStream.format("memory").queryName(qn).outputMode("complete").start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(qn).orderBy("event_type", "hour_epoch")
  }

  /** File-source streams need a directory: stream the parent dir with a
    * glob filter when given a single parquet file. */
  private def streamOf(
      spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val f = new java.io.File(path)
    if (f.isDirectory) spark.readStream.schema(schema).parquet(path)
    else spark.readStream.schema(schema)
      .option("pathGlobFilter", f.getName)
      .parquet(f.getParent)
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionAgg(user_id: Long, n_sessions: Long, n_events: Long)
  final case class SessState(lastTs: Long, sessions: Long, events: Long)

  /** Stateful streaming sessionization: gaps > 1800s open a new session
    * (the streaming twin of q05). Event-time ordering is guaranteed here by
    * sorting within the grouped iterator (file source delivers a single
    * batch in tests; production would use watermarked event-time state). */
  def sessionize(events: Dataset[Event]): Dataset[SessionAgg] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionAgg](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos))
          var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L, 0L))
          sorted.foreach { e =>
            val t = e.ts.getTime / 1000L
            val newSession = st.lastTs == Long.MinValue || (t - st.lastTs) > 1800L
            st = SessState(t, st.sessions + (if (newSession) 1 else 0), st.events + 1)
          }
          state.update(st)
          Iterator(SessionAgg(userId, st.sessions, st.events))
      }
  }

  /** Drive sessionize as a real streaming query over the events table. */
  def sessionizeStream(spark: SparkSession, eventsPath: String): DataFrame = {
    import spark.implicits._
    val schema = spark.read.parquet(eventsPath).schema
    val stream = streamOf(spark, eventsPath, schema)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val out = sessionize(stream)
    val qn = s"stream_sessions_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = out.toDF().writeStream.format("memory").queryName(qn)
      .outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(qn).orderBy("user_id")
  }
}
