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
    * one DupEvent per duplicate arrival (append mode). */
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
}
