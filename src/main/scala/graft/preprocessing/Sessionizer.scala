package graft.preprocessing

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Gap-based sessionization (reference: replay/preprocessing/sessionizer.py:174-263).
  *
  * A new session starts when the gap to the previous event of the same user
  * is >= `sessionGapSec`. Per-user session index = running sum of the
  * new-session flags; a globally unique id is derived as
  * (user_id, session_seq) — kept as two columns rather than the reference's
  * cumulative-user-count offset trick, which needs an extra global window.
  *
  * Optional min/max events per session and sessions-per-user post-filters
  * (sessionizer.py:246-263). Streaming analogue: `session_window(ts, gap)`
  * (see graft.streaming.StreamingOps).
  */
final case class Sessionizer(
    sessionGapSec: Long,
    userCol: String = "query_id",
    tsCol: String = "timestamp",
    tieCol: Option[String] = None,
    minSessionEvents: Option[Long] = None,
    maxSessionEvents: Option[Long] = None,
    minUserSessions: Option[Long] = None,
    maxUserSessions: Option[Long] = None,
) {
  def transform(df0: DataFrame): DataFrame = {
    // NTZ-proof the gap arithmetic: unix_micros rejects TIMESTAMP_NTZ
    val df = graft.core.Ops.ensureTimestamp(df0, tsCol)
    val order = Seq(F.col(tsCol).asc) ++ tieCol.map(F.col(_).asc).toSeq
    val w = Window.partitionBy(userCol).orderBy(order: _*)
    val flagged = df
      .withColumn("_prev_ts", F.lag(tsCol, 1).over(w))
      .withColumn("_new_session",
        F.when(F.col("_prev_ts").isNull, F.lit(1))
          .when(F.unix_micros(F.col(tsCol)) - F.unix_micros(F.col("_prev_ts"))
            >= sessionGapSec * 1000000L, F.lit(1))
          .otherwise(F.lit(0)))
      .withColumn("session_seq",
        F.sum("_new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_prev_ts", "_new_session")

    var out = flagged
    if (minSessionEvents.isDefined || maxSessionEvents.isDefined) {
      val ws = Window.partitionBy(userCol, "session_seq")
      out = out.withColumn("_n", F.count(F.lit(1)).over(ws))
      minSessionEvents.foreach(v => out = out.filter(F.col("_n") >= v))
      maxSessionEvents.foreach(v => out = out.filter(F.col("_n") <= v))
      out = out.drop("_n")
    }
    if (minUserSessions.isDefined || maxUserSessions.isDefined) {
      val wu = Window.partitionBy(userCol)
      out = out.withColumn("_ns", F.size(F.collect_set("session_seq").over(wu)))
      minUserSessions.foreach(v => out = out.filter(F.col("_ns") >= v))
      maxUserSessions.foreach(v => out = out.filter(F.col("_ns") <= v))
      out = out.drop("_ns")
    }
    out
  }
}
