package graft

import java.util.Locale

/** Shared measurement-telemetry primitives for Bench/BenchSubset.
  *
  * Three pollution signatures show up on the shared driver machine, and
  * each needs its own field because each is blind to the others:
  *   - foreign load (la): 1-min loadavg >> the bench's own thread count;
  *   - inconsistent reps (spread): deterministic work timed >1.5x apart;
  *   - CPU STEAL (cw): the hypervisor deschedules the whole VM, so wall
  *     grows while the process accrues no CPU — loadavg stays LOW (the
  *     runqueue is empty, the machine just isn't running) and reps agree
  *     (the steal is sustained), which is exactly the r17 x_rollup case
  *     (16x slow, la=1.3, spread=1.08) the first two fields missed.
  *     cw = process-CPU-time / wall of the quoted (min) rep: any Spark
  *     query through the noop sink keeps >= 1 core busy end-to-end, so a
  *     healthy local-mode rep has cw >= ~1; cw << 1 means the process
  *     spent most of the wall not scheduled at all.
  * Run-level /proc/stat steal+iowait deltas corroborate machine-wide.
  */
object BenchTelemetry {
  def la1(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString
      .split(" ")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** Cumulative CPU nanos of THIS JVM (all threads — in local[n] mode the
    * executor pool is in-process, so this covers the actual query work). */
  def procCpuNanos(): Long =
    try java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
      case _ => -1L
    } catch { case _: Throwable => -1L }

  /** Machine-wide (steal, iowait, total) jiffies from /proc/stat line 1:
    * cpu user nice system idle iowait irq softirq steal guest guest_nice.
    * Total sums only user..steal (first 8 fields): the kernel already
    * folds guest/guest_nice into user, so summing all fields would
    * double-count guest time and understate steal%/iowait% on hosts
    * running nested guests. */
  def cpuJiffies(): Option[(Long, Long, Long)] =
    try {
      val f = scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu ")).get.trim.split("\\s+").drop(1).map(_.toLong)
      Some((f.lift(7).getOrElse(0L), f.lift(4).getOrElse(0L), f.take(8).sum))
    } catch { case _: Throwable => None }

  /** steal%/iowait% of total machine jiffies between two cpuJiffies()
    * samples; (-1,-1) when /proc/stat is unreadable. */
  def stealIowaitPct(start: Option[(Long, Long, Long)],
                     end: Option[(Long, Long, Long)]): (Double, Double) =
    (start, end) match {
      case (Some((s0, w0, t0)), Some((s1, w1, t1))) if t1 > t0 =>
        (100.0 * (s1 - s0) / (t1 - t0), 100.0 * (w1 - w0) / (t1 - t0))
      case _ => (-1.0, -1.0)
    }

  /** Locale-pinned decimal formatting: the f-interpolator uses the JVM
    * default locale, which under a comma-decimal locale would emit
    * invalid JSON (1,234 instead of 1.234). */
  def fmt(v: Double, places: Int): String =
    String.format(Locale.ROOT, s"%.${places}f", Double.box(v))
}
