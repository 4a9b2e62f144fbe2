package graft.queries

import graft.{Q, QueryPack}
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Driver-gated Structured Streaming evidence: a gate query that runs a
  * REAL streaming job (readStream source → watermarked windowed
  * aggregation → sink) inside the verify contract, not just a spec.
  *
  * `Trigger.AvailableNow` drains everything already in the source in
  * rate-limited micro-batches and stops — the replay mode that makes a
  * stream's output comparable against a static oracle: the exact same
  * plan deployed with a continuous trigger is the production stream.
  */
object StreamQ extends QueryPack {

  /** Hourly tumbling-window counts/sums per event type through
    * [[EventStreams.tumblingAgg]] (the same transform StreamingSpec
    * drives incrementally), collected via a complete-mode memory sink.
    * The oracle is the static GROUP BY the stream must converge to —
    * window(ts, '1 hour').start ≡ date_trunc('hour', ts).
    */
  val qStreamWindow: Q = Q(
    "q_stream_window",
    Some("""SELECT date_trunc('hour', ts) AS bucket, event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   round(sum(value) * 100) / 100 AS sum_value
            FROM events GROUP BY 1, 2 ORDER BY 1, 2"""),
    (s, dir) => {
      // nanos-typed parquet: same long-read + micros conversion as the
      // batch loader (Tables.loadEvents) — streaming sources need the
      // schema up front
      val rawSchema = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType)))
      // the file-stream source ingests DIRECTORIES (files appear, get
      // processed, watermarked out — the production drop-zone shape);
      // stage the single test parquet behind a symlink
      val stage = java.nio.file.Files.createTempDirectory("stream_events")
      java.nio.file.Files.createSymbolicLink(
        stage.resolve("events.parquet"), java.nio.file.Paths.get(s"$dir/events.parquet"))
      val ev = s.readStream.schema(rawSchema)
        .parquet(stage.toString)
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      val agg = EventStreams.tumblingAgg(ev, windowLen = "1 hour")
      val sink = s"stream_window_${java.util.UUID.randomUUID().toString.takeWhile(_ != '-')}"
      val query = agg.writeStream
        .format("memory")
        .queryName(sink)
        .outputMode(OutputMode.Complete())
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
      s.table(sink)
        .select(
          col("bucket"), col("event_type"), col("n").cast("long").as("n"),
          (round(col("sum_value") * 100) / 100).as("sum_value"))
        .orderBy(col("bucket"), col("event_type"))
    })

  override def queries: Seq[Q] = Seq(qStreamWindow)
}
