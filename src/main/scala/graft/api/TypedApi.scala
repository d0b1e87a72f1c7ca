package graft.api

import graft.Tables
import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed records for the engine's core tables. */
case class Event(event_id: Long, user_id: Long, event_type: String,
    value: Double, ts_sec: Long)

case class Doc(doc_id: Long, text: String, lang: String, source: String,
    n_chars: Long)

/** Typed `Dataset[T]` facade over the core tables and per-entity state ops,
  * for callers who want compile-time row types (the ODIN store structs,
  * e.g. odin_goesr/src/lib.rs:250 GoesrHotspotStore entries, as case
  * classes). The typed ops compile to the same partial-aggregate shapes as
  * the DataFrame layer: `reduceGroups` keeps the merge associative and
  * map-side combined, so "latest per entity" is one shuffle of one row per
  * (entity, map partition) — the 100 TB-safe form of a state-store fold.
  */
object Typed {

  def events(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    Tables.events(spark, dir)
      .selectExpr("event_id", "user_id", "event_type", "value", "ts_sec")
      .as[Event]
  }

  def docs(spark: SparkSession, dir: String): Dataset[Doc] = {
    import spark.implicits._
    Tables.t(spark, dir, "documents").as[Doc]
  }

  /** Latest event per entity via an associative typed reduce (the
    * GoesrHotspotStore / aircraft-state update fold).
    */
  def latestPerUser(ds: Dataset[Event]): Dataset[Event] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .reduceGroups { (a, b) =>
        if (a.ts_sec > b.ts_sec
          || (a.ts_sec == b.ts_sec && a.event_id > b.event_id)) a else b
      }
      .map(_._2)
  }

  /** Per-entity extreme reading (max value, id tiebreak) — same shape. */
  def peakPerUser(ds: Dataset[Event]): Dataset[Event] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .reduceGroups { (a, b) =>
        if (a.value > b.value
          || (a.value == b.value && a.event_id < b.event_id)) a else b
      }
      .map(_._2)
  }
}
