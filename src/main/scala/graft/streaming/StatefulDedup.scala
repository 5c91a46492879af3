package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming dedup: first-seen doc_id wins across micro-batches,
  * later occurrences are emitted as uniqueness violations — the streaming
  * counterpart of [[graft.engine.Uniqueness]], built on
  * `flatMapGroupsWithState` (KeyValueGroupedDataset custom state). State
  * per key is one count record.
  *
  * State-size bounding at 10¹²-doc scale: production deployments add an
  * EventTimeTimeout + watermark so doc_ids seen once fall out of state
  * after the dedup horizon. (ProcessingTimeTimeout is deliberately NOT
  * used: it makes the micro-batch engine schedule continuous no-data
  * batches to fire timeouts, which starves `processAllAvailable` —
  * unusable in synchronous tests and wasteful in production.)
  */
object StatefulDedup {

  case class KeyState(count: Long)
  case class DupEvent(doc_id: String, n_seen: Long)

  /** input: any streaming DataFrame with a `doc_id` column; output:
    * one DupEvent per duplicate arrival (append mode). Unbounded state
    * — for exploratory / bounded-keyspace streams; the scale path is
    * [[duplicatesWithHorizon]]. */
  def duplicates(stream: DataFrame): Dataset[DupEvent] = {
    implicit val encS = Encoders.product[KeyState]
    implicit val encO = Encoders.product[DupEvent]
    stream.select(col("doc_id").cast("string").as("doc_id"))
      .as[String](Encoders.STRING)
      .groupByKey(identity)(Encoders.STRING)
      .flatMapGroupsWithState[KeyState, DupEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[String], state: GroupState[KeyState]) =>
          val prev = state.getOption.map(_.count).getOrElse(0L)
          val total = prev + rows.size.toLong
          state.update(KeyState(total))
          // every occurrence with ordinal >= 2 is a duplicate event;
          // this batch contributed ordinals prev+1 .. total
          val from = math.max(prev + 1, 2L)
          if (total >= from)
            (from to total).map(ord => DupEvent(key, ord)).iterator
          else Iterator.empty
      }
  }

  /** State-BOUNDED dedup for 10¹²-key streams: watermark on `tsCol`
    * plus EventTimeTimeout — a key seen once falls out of state
    * `horizon` after its last event time passes the watermark, so
    * state size is O(keys within the horizon), not O(all keys ever).
    * Duplicates separated by more than the horizon are (by design) not
    * reported — the standard streaming-dedup trade
    * (`dropDuplicatesWithinWatermark` makes the same one). */
  def duplicatesWithHorizon(stream: DataFrame, tsCol: String,
                            horizon: String): Dataset[DupEvent] = {
    implicit val encS = Encoders.product[KeyState]
    implicit val encO = Encoders.product[DupEvent]
    stream
      .select(col("doc_id").cast("string").as("doc_id"),
        col(tsCol).cast("timestamp").as("ts"))
      // watermark AFTER the cast projection: projecting a watermarked
      // column through a cast would drop the event-time tag
      .withWatermark("ts", horizon)
      .as[(String, java.sql.Timestamp)](
        Encoders.tuple(Encoders.STRING,
          org.apache.spark.sql.Encoders.TIMESTAMP))
      .groupByKey(_._1)(Encoders.STRING)
      .flatMapGroupsWithState[KeyState, DupEvent](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[(String, java.sql.Timestamp)],
         state: GroupState[KeyState]) =>
          if (state.hasTimedOut) {
            state.remove() // key idle past the horizon: drop its state
            Iterator.empty
          } else {
            val batch = rows.toSeq
            val prev = state.getOption.map(_.count).getOrElse(0L)
            val total = prev + batch.size.toLong
            state.update(KeyState(total))
            val maxTs = batch.map(_._2.getTime).max
            // expire once the watermark passes last-seen + horizon
            state.setTimeoutTimestamp(maxTs, horizon)
            val from = math.max(prev + 1, 2L)
            if (total >= from)
              (from to total).map(ord => DupEvent(key, ord)).iterator
            else Iterator.empty
          }
      }
  }
}
