package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended configuration — the
  * knobs that matter at 100 TB, set once (callers may override any of
  * them before `getOrCreate`).
  *
  * - AQE on (runtime coalescing, skew-join splitting, plan re-opt).
  * - `maxPartitionBytes` 160 MB: the reference's empirically-chosen
  *   split size for tick parquet (ref: `Data Preprocessing and
  *   Cleaning/spark_session_window_tick_cleaner.py:36`); keeps scan
  *   tasks big enough to amortize open costs, small enough to fit
  *   executor memory alongside a shuffle.
  * - shuffle partitions sized to the machine locally; on a cluster set
  *   it to ~2-3× total cores (AQE coalesces the excess).
  * - UTC session timezone: tick timestamps are exchange-local UTC; a
  *   machine-local timezone silently shifts every session window.
  */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (160L * 1024 * 1024).toString)
      // Whole-stage-codegen class cache (static conf, default 100
      // entries). The engine's registry runs hundreds of distinct
      // queries per session that share generated fragments (the
      // common scan projections, exchanges, window shapes); at the
      // default size the cache thrashes and shared fragments —
      // and every repeat execution — pay janino recompilation.
      // Generated classes are small; 4096 entries is a few hundred
      // MB of metaspace at worst and is workload-independent (a
      // cluster driver compiles per-executor anyway: this cache is
      // per-JVM and the same reasoning applies at any scale).
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4096"))
      // file: scheme without per-file process forks (see
      // graft.hadoop.FastLocalFileSystem — absent the native Hadoop
      // library, every local file create forks `chmod`). Behavior
      // identical; cluster schemes (hdfs:, s3a:) untouched.
      .config("spark.hadoop.fs.file.impl",
        classOf[graft.hadoop.FastLocalFileSystem].getName)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  /** Local session for the driver-contract mains. */
  def local(cores: String): SparkSession = {
    val s = builder(s"local[$cores]",
      cores.toIntOption.getOrElse(Runtime.getRuntime.availableProcessors()))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
