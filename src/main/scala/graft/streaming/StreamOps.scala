package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming operators over journal streams
  * (SURVEY.md §2 B17/B20) via `flatMapGroupsWithState` — arbitrary
  * per-key state beyond what watermarked window aggregation expresses.
  * State lives in the state store (checkpointed, per-key partitioned):
  * the shape that scales to 10^8 keys on a real cluster.
  */
object StreamOps {

  final case class EventRow(user_id: Long, event_id: Long, value: Double)
  final case class UserStats(user_id: Long, n_events: Long, total_value: Double)
  // public: Catalyst's generated state encoder needs constructor access
  final case class UserState(n: Long, total: Double, seenMax: Long)

  /** Running per-user totals across micro-batches, with monotonic
    * event-id dedup inside each user's state (journal re-delivery
    * tolerance): events with id <= the highest already-processed id for
    * that user are dropped. Emits one updated row per user per batch. */
  def runningUserStats(spark: SparkSession, events: Dataset[EventRow]): Dataset[UserStats] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[EventRow], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0, Long.MinValue))
          var n = prev.n
          var total = prev.total
          var seenMax = prev.seenMax
          rows.toSeq.sortBy(_.event_id).foreach { r =>
            if (r.event_id > seenMax) {
              n += 1
              total += r.value
              seenMax = r.event_id
            }
          }
          state.update(UserState(n, total, seenMax))
          Iterator(UserStats(uid, n, total))
      }
  }
}
