package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Time-respecting reachability [Holme & Saramäki, "Temporal networks",
  * Physics Reports 2012; Kempe-Kleinberg-Kumar's time-respecting paths]:
  * over a graph whose edges carry timestamps, v is reachable from u only
  * via paths whose edge times are NON-DECREASING — the semantics of
  * influence/contagion/data-lineage flow, which static reachability
  * (q58 BFS) gets wrong (a path through an edge that fired BEFORE you
  * arrived is not a path). Computed as earliest-arrival iteration:
  * arr(v) ← min(arr(v), min{t : (u, v, t) ∈ E, t ≥ arr(u)}) — the
  * temporal analogue of Bellman-Ford relaxation (q146), with min over
  * TIMESTAMPS as the semiring.
  *
  * Edge model: "handoff" edges — within each (event_type, day) stream
  * ordered by (ts, event_id), consecutive events of different users
  * link prior → next at the next event's time. Linear in the event
  * count, and the lag window partitions by (type, day) — day-sized
  * cells, never a per-type global sort (the q45 discipline).
  *
  * Scale shape per round: one arrival⋈edges join keyed on the source
  * user + one per-user min — both partial-aggregate; lineage truncated
  * per round (the q57/q146 iterative discipline). Rounds are FIXED (4)
  * so the oracle can unroll them; the spec pins the fixed-point claim
  * on a hand graph.
  */
object TemporalReach {

  /** (src, dst, t): src's event hands off to dst's next event at time t
    * within the (event_type, day) stream. Self-handoffs dropped.
    */
  def handoffEdges(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type"), to_date(col("ts")))
      .orderBy(col("ts"), col("event_id"))
    events.filter(col("user_id").isNotNull)
      .select(col("event_type"), col("ts"), col("event_id"), col("user_id"))
      .withColumn("src", lag(col("user_id"), 1).over(w))
      .filter(col("src").isNotNull && col("src") =!= col("user_id"))
      .select(col("src"), col("user_id").as("dst"), col("ts").as("t"))
  }

  /** Earliest time-respecting arrival from `seeds` (u, t) after exactly
    * `rounds` relaxation rounds: (u, t) per reached user.
    */
  def earliestArrival(edges: DataFrame, seeds: DataFrame,
                      rounds: Int): DataFrame = {
    var arr = seeds.localCheckpoint()
    (1 to rounds).foreach { _ =>
      arr = arr.unionByName(
          edges.join(arr.withColumnRenamed("u", "src")
              .withColumnRenamed("t", "at"), Seq("src"))
            .filter(col("t") >= col("at"))
            .select(col("dst").as("u"), col("t")))
        .groupBy(col("u")).agg(min(col("t")).as("t"))
        .localCheckpoint()
    }
    arr
  }

  /** q182: earliest time-respecting arrival from the corpus's first
    * event (by (ts, event_id)) through 4 handoff rounds.
    */
  def temporalReachQuery(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val seed = ev.filter(col("user_id").isNotNull)
      .orderBy(col("ts"), col("event_id")).limit(1)
      .select(col("user_id").as("u"), col("ts").as("t"))
    earliestArrival(handoffEdges(ev), seed, rounds = 4)
      .select(col("u").as("user_id"), col("t").as("arrival"))
      .orderBy(col("user_id"))
  }
}
