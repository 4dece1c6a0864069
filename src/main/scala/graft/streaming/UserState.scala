package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state over the event stream — the
  * `mapGroupsWithState` surface for semantics the built-in windows can't
  * express: a per-user lifetime profile (event count, value sum, first/
  * last seen) that survives across micro-batches.
  *
  * Scale design: state is one small record per user (bounded by
  * |users|, not stream length), partitioned by the group key into the
  * state store; each micro-batch shuffles only its delta. A TTL via
  * `GroupStateTimeout.ProcessingTimeTimeout` would bound state for
  * unbounded key spaces — not enabled here because user ids recur.
  */
object UserState {

  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class UserProfile(
      user_id: Long, n_events: Long, sum_value: Double,
      first_seen: java.sql.Timestamp, last_seen: java.sql.Timestamp)

  def updateProfile(userId: Long, events: Iterator[UserEvent],
      state: GroupState[UserProfile]): UserProfile = {
    val batch = events.toSeq
    val prev = state.getOption
    val n = prev.map(_.n_events).getOrElse(0L) + batch.size
    val sum = prev.map(_.sum_value).getOrElse(0.0) + batch.map(_.value).sum
    val firstSeen = (prev.map(_.first_seen) ++ batch.map(_.ts))
      .minBy(_.getTime)
    val lastSeen = (prev.map(_.last_seen) ++ batch.map(_.ts))
      .maxBy(_.getTime)
    val updated = UserProfile(userId, n, sum, firstSeen, lastSeen)
    state.update(updated)
    updated
  }

  /** Streaming per-user profiles: emits the updated profile of every
    * user seen in each micro-batch (OutputMode.Update sinks).
    */
  def userProfiles(events: DataFrame): Dataset[UserProfile] = {
    implicit val eventEnc = Encoders.product[UserEvent]
    implicit val profileEnc = Encoders.product[UserProfile]
    implicit val keyEnc = Encoders.scalaLong
    events.select(col("user_id"), col("ts"), col("value")).as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateProfile)
  }

  val outputMode: OutputMode = OutputMode.Update()
}
