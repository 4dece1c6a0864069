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

  // --- flatMapGroupsWithState: 0..n outputs per group per batch ---------

  final case class SpendAlert(user_id: Long, n_events: Long, sum_value: Double)

  /** Alert emission — the `flatMapGroupsWithState` half of the arbitrary-
    * state surface: unlike `mapGroupsWithState` (exactly one output per
    * group per batch), a group emits ZERO or more records — here, one
    * alert each time a user's lifetime value sum crosses another
    * multiple of `step`, and silence otherwise. The state record stays
    * O(1) per user; emission volume tracks alerts, not stream volume —
    * the shape of anomaly/threshold detectors over unbounded streams.
    */
  def spendAlerts(userId: Long, events: Iterator[UserEvent],
      state: GroupState[UserProfile], step: Double): Iterator[SpendAlert] = {
    val batch = events.toSeq
    if (batch.isEmpty) return Iterator.empty
    val prev = state.getOption
    val prevSum = prev.map(_.sum_value).getOrElse(0.0)
    val n = prev.map(_.n_events).getOrElse(0L) + batch.size
    val sum = prevSum + batch.map(_.value).sum
    val firstSeen = (prev.map(_.first_seen) ++ batch.map(_.ts)).minBy(_.getTime)
    val lastSeen = (prev.map(_.last_seen) ++ batch.map(_.ts)).maxBy(_.getTime)
    state.update(UserProfile(userId, n, sum, firstSeen, lastSeen))
    val crossed = math.floor(sum / step).toLong - math.floor(prevSum / step).toLong
    if (crossed > 0) Iterator.single(SpendAlert(userId, n, sum)) else Iterator.empty
  }

  /** Streaming alert feed (Append sinks): one row per threshold crossing. */
  def userAlerts(events: DataFrame, step: Double = 500.0): Dataset[SpendAlert] = {
    implicit val eventEnc = Encoders.product[UserEvent]
    implicit val profileEnc = Encoders.product[UserProfile]
    implicit val alertEnc = Encoders.product[SpendAlert]
    implicit val keyEnc = Encoders.scalaLong
    events.select(col("user_id"), col("ts"), col("value")).as[UserEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (k: Long, it: Iterator[UserEvent], s: GroupState[UserProfile]) =>
          spendAlerts(k, it, s, step))
  }
}
