package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Mirrors the reference's environment defaults (Flink 1.19 TableEnvironment:
  * UTC session time zone, ANSI/error-on-overflow casts — see SURVEY.md §2.8
  * "Casts") on top of Spark 4.1. Tuned for local[32] testing but every knob
  * here is what we'd ship to a 1000-executor cluster: AQE on (runtime
  * re-planning, skew-join handling), shuffle partitions sized to the lane
  * count rather than Spark's default 200.
  */
object GraftSession {

  /** Apply graft's standard configuration to any builder. */
  def configure(b: SparkSession.Builder, shufflePartitions: Int = 32): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      // events.parquet carries INT64 TIMESTAMP(NANOS) — Spark has no nanos
      // timestamp type; read as long and convert in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // transformWithState (KeyedProcess operators) requires the RocksDB
      // state store; it is also the at-scale choice (SURVEY.md §2.10).
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  /** Local session for tests / bench. */
  def local(threads: Int = 32, appName: String = "graft"): SparkSession = {
    val s = configure(SparkSession.builder().master(s"local[$threads]").appName(appName))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Runtime-settable confs a driver-provided session may be missing.
    * Query functions call this defensively so they work under any session.
    */
  def ensureRuntimeConfs(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () } // non-runtime in some builds; Tables copes
  }
}
