package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Session factory for the engine.
  *
  * Settings are chosen for correctness parity with the DuckDB oracle (UTC
  * session time zone) and for local[32] bench runs (32 shuffle partitions —
  * matching core count, not the 200 default that over-schedules tiny
  * shuffles). On a real cluster the same builder is used with
  * `spark.sql.shuffle.partitions` sized to ~2-3× total cores and AQE left on
  * to coalesce / skew-split at runtime.
  */
object Graft {
  /** RAM-backed local scratch (optimization r17, guide §6 I/O layout):
    * Spark's local dirs (shuffle files, block-manager disk store,
    * broadcast spill) and the JVM temp dir (streaming temp checkpoints,
    * [[Scratch]] staging parquet) are EPHEMERAL by construction here —
    * every piece is per-run state that a JVM-exit sweeper or Spark itself
    * deletes — so on hosts with a writable tmpfs they belong on it, not
    * on the data disk where WAL/offset-log fsyncs pay rotational latency.
    * Parameterized for other deployments: SPARK_GRAFT_LOCAL_DIR=<path>
    * overrides the root (a cluster sets its NVMe scratch), =0 disables
    * (fall back to java.io.tmpdir). NOT result caching: only transient
    * run state moves; every query still computes from the parquet inputs.
    */
  def fastLocalDir(): Option[String] = {
    val env = sys.env.get("SPARK_GRAFT_LOCAL_DIR")
    val root = env match {
      case Some("0") | Some("false") | Some("off") | Some("no") => return None
      case Some(p) => p
      case None => "/dev/shm"
    }
    try {
      val base = java.nio.file.Paths.get(root)
      if (!java.nio.file.Files.isWritable(base)) return None
      val d = base.resolve("graft-local")
      java.nio.file.Files.createDirectories(d)
      Some(d.toString)
    } catch { case _: Throwable => None }
  }

  /** Point the JVM temp dir at the fast local root too, so streaming temp
    * checkpoints and [[Scratch]] directories follow. Must run before the
    * first temp-file creation (the JDK caches the property on first use);
    * both mains call [[session]]/this before touching Spark.
    */
  def redirectTmpDir(): Unit =
    fastLocalDir().foreach { d =>
      try {
        val t = java.nio.file.Paths.get(d, "tmp")
        java.nio.file.Files.createDirectories(t)
        System.setProperty("java.io.tmpdir", t.toString)
      } catch { case _: Throwable => () }
    }

  def session(master: String = "local[*]", appName: String = "graft"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    redirectTmpDir()
    val builder = SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .withExtensions(new plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    fastLocalDir().foreach(d => builder.config("spark.local.dir", d))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Resolve a committed-artifact path against the git toplevel (ADVICE
    * r16 #2): the bench/scale mains write BENCH_*.json where the round
    * commits from, so a run launched from a subdirectory must not strand
    * the artifact in cwd where it reads as missing/stale. Absolute paths
    * (env overrides) pass through; an undeterminable git state falls back
    * to cwd — the behavior before this helper existed.
    */
  def repoFile(name: String): java.nio.file.Path = {
    val p = java.nio.file.Paths.get(name)
    if (p.isAbsolute) return p
    try {
      val proc = new ProcessBuilder("git", "rev-parse", "--show-toplevel").start()
      val root = new String(proc.getInputStream.readAllBytes, "UTF-8").trim
      if (proc.waitFor() == 0 && root.nonEmpty)
        java.nio.file.Paths.get(root).resolve(p)
      else p
    } catch { case _: Throwable => p }
  }
}

/** Loader for the driver-generated fixture tables (TESTDATA.md).
  *
  * Every operator takes `(SparkSession, sfDir)` and reads through here so a
  * cluster deployment only has to change the path scheme (e.g. s3://…). The
  * dimension tables (`region`, `nation`, `supplier`, `part`, `customer`) are
  * small at every scale factor relative to the facts (`lineitem`, `orders`,
  * `events`) — join code broadcasts them explicitly.
  */
object Tables {
  val fact = Seq("orders", "lineitem", "events", "documents", "embeddings")
  val dims = Seq("region", "nation", "customer", "supplier", "part")
  val all: Seq[String] = dims ++ fact

  /** Relation memo (optimization r18, guide §6 listing cost): every
    * `spark.read.parquet` call re-lists the path and re-reads the footer
    * schema on the driver — ~20-60 ms of per-query ceremony that a real
    * deployment pays ONCE per table via its catalog/metastore. Memoizing
    * the resolved DataFrame per (session, dir, table) is exactly that
    * catalog behavior: only the relation METADATA (schema + file index)
    * is reused — execution still scans the parquet input every time, so
    * no result or data caching is involved. Keyed on the session instance
    * so a new session (fresh catalog state) re-resolves from scratch.
    */
  private val relMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    relMemo.computeIfAbsent((spark, dir, name),
      _ => spark.read.parquet(s"$dir/$name.parquet"))

  /** Same relation memo for IMMUTABLE staging parquet paths (the
    * memoized corpus-snapshot tables: graph edges, CC labels, band-index
    * signatures, sketch partials — each written exactly once per fixture
    * key and never overwritten). Mutable scratch dirs (e.g. the reused
    * delta-closure output) must keep calling spark.read.parquet directly:
    * a memoized relation would serve a stale file listing after an
    * overwrite.
    */
  def loadPath(spark: SparkSession, path: String): DataFrame =
    relMemo.computeIfAbsent((spark, path, "#path"),
      _ => spark.read.parquet(path))

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` has shipped as two different parquet types across fixture
    * generations: TIMESTAMP(NANOS) — which Spark's vectorized reader only
    * accepts as long nanos via the legacy conf, truncated here to µs with
    * exact integer division (the same truncation DuckDB applies) — and
    * plain µs TIMESTAMP without UTC adjustment, which Spark reads as
    * TIMESTAMP_NTZ. Both are normalized to a session-zone TIMESTAMP at µs
    * precision (the session zone is pinned to UTC engine-wide), matching
    * DuckDB's naive µs TIMESTAMP, so oracle parity holds regardless of
    * fixture vintage.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every fixture table as a temp view (for spark.sql queries).
    * Goes through the typed accessors so `events` gets its nanos→µs
    * timestamp handling regardless of query order.
    */
  def registerViews(spark: SparkSession, dir: String): Unit =
    all.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}

/** A declared operator: a Spark implementation plus (when SQL-expressible)
  * a DuckDB oracle over the same parquet tables. The driver hash-compares
  * the two at sf0.01, so every query must be *deterministic*: totally
  * ordered output, doubles rounded, timestamps rendered as strings.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryModule {
  def defs: Seq[QueryDef]
}
