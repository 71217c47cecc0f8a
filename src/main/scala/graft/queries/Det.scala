package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Determinism helpers for oracle-comparable aggregates.
  *
  * The driver hash-compares each query's parquet output against DuckDB
  * running `SparkEntry.oracleSql` on the same tables. Floating-point sums
  * are order-dependent, and Spark's partial aggregation visits rows in a
  * different order than DuckDB's scan — so any `sum(double)` over
  * non-integer values is a hash-mismatch waiting to happen.
  *
  * Discipline used by every oracle-checked query:
  *   - Per-row arithmetic stays in doubles (same IEEE expression tree on
  *     both engines → bit-identical per-row values).
  *   - Before summing, cast the per-row double to DECIMAL(18,6): decimal
  *     addition is exact and associative, so the aggregate is
  *     order-independent and engine-independent.
  *   - Cast the final decimal back to DOUBLE (single deterministic
  *     conversion) so both engines report the same schema.
  *   - Averages are `exactSum / count` — one IEEE division on identical
  *     operands.
  *   - Integer sums are cast to BIGINT explicitly (DuckDB's sum(int) is
  *     HUGEINT, Spark's is LongType).
  *   - Every output row set carries a total ORDER BY with a unique
  *     tiebreaker.
  *
  * This costs nothing at scale: decimal sum is still a single hash
  * aggregate with map-side partials; the cast is codegen'd per row.
  */
object Det {
  /** Exact, order-independent sum of a per-row double expression. */
  def exactSum(c: Column): Column =
    sum(c.cast(DecimalType(18, 6))).cast(DoubleType)

  /** SQL fragment mirroring [[exactSum]] for the DuckDB oracle. */
  def exactSumSql(expr: String): String =
    s"CAST(sum(CAST(($expr) AS DECIMAL(18,6))) AS DOUBLE)"

  /** Deterministic average: exact decimal sum, one double division. */
  def exactAvg(c: Column): Column = exactSum(c) / count(lit(1))

  def exactAvgSql(expr: String): String = s"${exactSumSql(expr)} / count(*)"

  /** Long count/sum with explicit BIGINT type on both engines. */
  def longSum(c: Column): Column = sum(c).cast(LongType)
  def longSumSql(expr: String): String = s"CAST(sum($expr) AS BIGINT)"

  /** Per-(tag, dataset, JVM) scratch directory for queries that persist
    * an index or table inside the timed region: repeated runs in one
    * session overwrite rather than accumulate, while two processes
    * working on the same dataset concurrently (bench + verify) never
    * race on one directory. The single shared implementation — the
    * collision-avoidance recipe must not fork per call site.
    *
    * Every path handed out is deleted by a JVM shutdown hook: without
    * it, each bench/verify process strands full parquet copies
    * (q60/q65/q67-q75 write whole datasets) under java.io.tmpdir.
    * Only THIS JVM's dirs are swept — a concurrent process's scratch
    * (different jvmTag) is never touched.
    */
  def scratchPath(tag: String, dir: String): String = {
    val jvmTag = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getName.hashCode & 0x7fffffff
    val p = sys.props("java.io.tmpdir") +
      s"/graft_${tag}_${dir.hashCode & 0x7fffffff}_$jvmTag"
    registerScratchCleanup(p)
    p
  }

  private val scratchDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val cleanupHooked = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def registerScratchCleanup(path: String): Unit = {
    scratchDirs.add(path)
    if (cleanupHooked.compareAndSet(false, true)) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def delete(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(delete))
          f.delete(): Unit
        }
        scratchDirs.forEach(p => delete(new java.io.File(p)))
      }, "graft-scratch-cleanup"))
    }
  }
}
