package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the configuration this engine assumes.
  *
  * Local mode is the test harness; the settings are chosen so the same
  * logical plans scale to a real cluster: AQE handles runtime
  * coalescing/skew, and all timestamps are pinned to UTC for oracle
  * parity. NOTE: `.master(local[n])` and the shuffle-partition count
  * are EXPLICIT here and take precedence over spark-submit --conf /
  * spark-defaults — a cluster deployment should build its own session
  * and apply only the semantic settings below (ANSI off, UTC,
  * nanosAsLong, AQE) rather than reuse this local-mode builder.
  */
object GraftSession {
  def builder(appName: String = "graft", cores: String = "32"): SparkSession.Builder =
    SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      // custom expressions (erf, md5-hex64, dot) on the SQL surface of
      // EVERY engine session — Verify/Bench build via this builder, so
      // registering only in getOrCreate would drift their config from
      // the tested one; clusters can equivalently set
      // spark.sql.extensions=graft.functions.GraftExtensions
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // Reference semantics are non-throwing: invalid numeric casts
      // become null-and-drop (SURVEY.md §2.2 F4) and zero-variance corr
      // yields NaN-and-drop (§2.6 C4); ANSI mode would raise instead.
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Generated methods beyond HotSpot's JIT limits run interpreted
      // or stall C2; falling back to Volcano beyond this size is far
      // more predictable on this box (see BENCH notes).
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      // several operators pin eager localCheckpoint blocks (Spearman
      // pair subtree, MinHash/SimHash signatures); the ContextCleaner
      // only reclaims them after a driver GC and its default forced-GC
      // interval is 30min — long multi-query sessions (Bench: ~90
      // query executions in one JVM) otherwise accumulate dead blocks
      // and degrade later queries
      .config("spark.cleaner.periodicGC.interval", sys.env.getOrElse("SPARK_GRAFT_GC_INTERVAL", "1min"))
      .config("spark.ui.enabled", "false")

  def getOrCreate(appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = builder(appName, cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
