package graft

import java.security.MessageDigest
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.{Success => TaskSuccess, TaskContext}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}

/** Task-retry determinism probe: proves byte-identical query output when
  * tasks FAIL AND RECOMPUTE — the routine 100-TB events (speculative
  * execution, executor loss, fetch failure) that a single clean local[32]
  * run never exercises. flakehunt proves determinism across CPU counts;
  * this proves it across the retry path, which is a different claim: a
  * retried task re-runs its partition against possibly-reordered upstream
  * iterators, so any order-sensitive float reduction or seed-from-
  * partition-attempt leak shows up here and nowhere else.
  *
  * Two failure modes, both asserting (a) result hash identical to the
  * clean run and (b) >= 1 task failure actually RECORDED by the listener
  * (an injection that never fired proves nothing):
  *
  *   - default: fail-first-attempt — the query result is wrapped in a
  *     mapPartitions that throws on (attemptNumber == 0, even partition),
  *     so every run retries half its result-stage tasks. Needs task
  *     retries enabled in local mode: the session master is
  *     `local[cpus, 4]` (the ", 4" IS maxFailures — plain local[n] fails
  *     the job on first task failure).
  *   - SPARK_GRAFT_KILL_EXEC=1 (requires SPARK_GRAFT_MASTER=
  *     local-cluster[...]): a killer thread SIGKILLs one live executor
  *     JVM mid-query. Executor loss without an external shuffle service
  *     also loses its shuffle outputs, so this exercises UPSTREAM STAGE
  *     RERUN + fetch-failure recovery, not just result-stage recompute.
  *   - SPARK_GRAFT_SPECULATE=1: SPECULATIVE EXECUTION — the third
  *     routine 100-TB event, distinct from both above because the
  *     original and the clone run CONCURRENTLY and either may win. The
  *     chaos wrapper makes every 8th partition's FIRST attempt sleep
  *     past the speculation threshold (quantile 0.1, multiplier 1.0),
  *     so the scheduler launches a speculative copy (attempt 1, no
  *     sleep) that finishes first and WINS — the emitted rows come from
  *     a re-executed attempt. Asserts >= 1 task with
  *     taskInfo.speculative actually launched, not just configured.
  *
  *     IN-SANDBOX LIMITATION, adjudicated from the scheduler source:
  *     TaskSetManager.dequeueSpeculativeTask refuses any host that
  *     already runs an attempt of the task (`!hasAttemptOnHost`), and
  *     under local-cluster EVERY executor reports the same host
  *     (localhost) — so a speculative clone can never be SCHEDULED on a
  *     one-box topology, no matter the configs (verified empirically:
  *     8-task stage, one 8 s straggler, clone never launched). The mode
  *     therefore only produces evidence on a true multi-host cluster.
  *     The determinism property speculation needs in-sandbox is still
  *     covered, by equivalence: a speculative clone is exactly a second
  *     attempt of the same deterministic partition racing the original
  *     with one commit winner — and "re-attempt of the same partition
  *     produces identical bytes" is what the fail-first-attempt mode
  *     proves directly.
  *
  * Usage:
  *   sbt "runMain graft.RetryProbe x_weighted_sample x_strat_sample ..."
  *   SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  *     SPARK_GRAFT_MASTER=local-cluster[4,8,4096] SPARK_GRAFT_KILL_EXEC=1 \
  *     sbt "runMain graft.RetryProbe x_setsim_join"
  * Exits non-zero on any hash mismatch or on zero recorded failures. */
object RetryProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass query names")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val killMode = sys.env.contains("SPARK_GRAFT_KILL_EXEC")
    require(!killMode || sys.env.get("SPARK_GRAFT_MASTER")
      .exists(_.startsWith("local-cluster")),
      "SPARK_GRAFT_KILL_EXEC needs SPARK_GRAFT_MASTER=local-cluster[...] " +
        "(local-mode executors are the driver; killing them kills the probe)")
    require(!sys.env.contains("SPARK_GRAFT_SPECULATE") ||
      sys.env.get("SPARK_GRAFT_MASTER")
        .exists(_.startsWith("local-cluster")),
      "SPARK_GRAFT_SPECULATE needs SPARK_GRAFT_MASTER=local-cluster[...] " +
        "— TaskSchedulerImpl hard-disables speculation in local mode " +
        "(!isLocal gate), so a local run would silently test nothing")
    val speculate = sys.env.contains("SPARK_GRAFT_SPECULATE")
    val builder0 =
      if (sys.env.contains("SPARK_GRAFT_MASTER"))
        MasterConfig(SparkSession.builder(), cpus)
      else SparkSession.builder().master(s"local[$cpus, 4]")
    // aggressive speculation so the probe's slow-partition bait reliably
    // draws a clone: speculate once 10% of tasks finish, threshold 1.0x
    // the median (production would never run this hot — the point is to
    // FORCE the event, then prove the output doesn't care who won)
    val builder = if (!speculate) builder0 else builder0
      .config("spark.speculation", "true")
      .config("spark.speculation.interval", "100ms")
      .config("spark.speculation.quantile", "0.1")
      .config("spark.speculation.multiplier", "1.0")
      // AQE coalesces the small result stages to 1-4 tasks — BELOW the
      // quantile machinery's reach (a 1-task stage has no median to
      // compare against). The absolute single-task threshold covers
      // exactly that: any task past 1 s in a fewer-tasks-than-slots
      // stage draws a clone. The bait sleeps 3 s.
      .config("spark.speculation.task.duration.threshold", "1s")
      // the 3.4+ efficiency gate only speculates tasks whose data rate
      // lags the average — a SLEEPING task processes no data, so the
      // gate must be off for the duration threshold to act alone
      .config("spark.speculation.efficiency.enabled", "false")
    val spark = builder
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Speculation is UNSCHEDULABLE on a one-host topology:
    // TaskSetManager.dequeueSpeculativeTask refuses any host that already
    // runs a live attempt of the task, and every local-cluster executor
    // reports the same host — so running the bait query would only ever
    // end in NO-SPECULATION-RECORDED after paying the full query. Detect
    // the topology up front (a tiny job forces executor registration) and
    // fail fast with the scheduler-source explanation instead.
    if (speculate) {
      spark.range(1000).count() // forces all executors to register
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      def infos() = spark.sparkContext.statusTracker.getExecutorInfos
      while (infos().length < 2 && System.nanoTime() < deadline)
        Thread.sleep(200)
      val hosts = infos().map(_.host()).toSet
      if (hosts.size <= 1) {
        System.err.println(
          s"[retry] SPECULATION-UNSCHEDULABLE: all ${infos().length} " +
            s"executors report one host (${hosts.mkString}). " +
            "TaskSetManager.dequeueSpeculativeTask refuses hosts with a " +
            "live attempt of the task, so a speculative clone can never " +
            "be scheduled on a single-box topology — run this mode on a " +
            "real multi-host cluster. The determinism property it would " +
            "prove is covered in-sandbox by the fail-first-attempt mode " +
            "(a clone is a second attempt of the same deterministic " +
            "partition with one commit winner).")
        spark.stop()
        sys.exit(1)
      }
    }

    val taskFailures = new AtomicInteger
    val speculativeLaunches = new AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.reason != TaskSuccess) taskFailures.incrementAndGet()
      override def onTaskStart(
          ts: org.apache.spark.scheduler.SparkListenerTaskStart): Unit =
        if (ts.taskInfo.speculative) speculativeLaunches.incrementAndGet()
    })

    // canonical result hash: sorted stringified rows — the flakehunt
    // convention (byte-equal strings, not approximate compare)
    def hashOf(df: DataFrame): (String, Long) = {
      val rows = df.collect().map(_.toString).sorted
      val md = MessageDigest.getInstance("MD5")
      rows.foreach(r => md.update(r.getBytes("UTF-8")))
      (md.digest().map("%02x".format(_)).mkString, rows.length.toLong)
    }

    def withInjectedFailures(df: DataFrame): DataFrame =
      df.mapPartitions { it =>
        val tc = TaskContext.get()
        if (tc != null && tc.attemptNumber() == 0 && tc.partitionId() % 2 == 0)
          throw new RuntimeException(
            "RetryProbe: injected first-attempt failure")
        it
      }(Encoders.row(df.schema))

    // speculation bait: first attempts of every 8th partition stall past
    // the threshold; the speculative clone (attempt >= 1) skips the sleep,
    // finishes first, and its output is what the query emits. The hash
    // repartition (DETERMINISTIC — by the first column, never round-robin,
    // which is the classic retry-nondeterminism hazard this probe exists
    // to catch) gives the chaos stage real parallelism: AQE coalesces
    // these small result stages to one task, and a 1-task TaskSet is
    // excluded from the median speculation path entirely.
    def withSlowFirstAttempts(df: DataFrame): DataFrame = {
      val parted = df.repartition(8,
        org.apache.spark.sql.functions.col(df.columns.head))
      parted.mapPartitions { it =>
        val tc = TaskContext.get()
        if (tc != null && tc.attemptNumber() == 0 && tc.partitionId() % 8 == 0)
          Thread.sleep(3000)
        it
      }(Encoders.row(df.schema))
    }

    // kill-mode: SIGKILL one CoarseGrainedExecutorBackend child a beat
    // into the chaos run; the standalone master replaces it, tasks and
    // lost shuffle outputs reschedule/rerun on the survivors. The pgrep
    // is scoped to THIS probe's executors via the applicationId that the
    // backend carries on its command line (--app-id app-...) — an
    // unscoped match could SIGKILL an executor of an unrelated concurrent
    // Spark job on the same machine.
    def killOneExecutor(delayMs: Long, signal: String = "-9"): Thread = {
      val appId = spark.sparkContext.applicationId
      val t = new Thread(() => {
        Thread.sleep(delayMs)
        val pids = scala.sys.process.Process(
          Seq("pgrep", "-f", s"CoarseGrainedExecutorBackend.*$appId")).!!
          .split("\n").filter(_.nonEmpty)
        pids.headOption.foreach { pid =>
          System.err.println(s"[retry] sending $signal to executor pid $pid" +
            s" (app $appId)")
          scala.sys.process.Process(Seq("kill", signal, pid)).!
        }
      })
      t.setDaemon(true); t.start(); t
    }

    var bad = 0
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val (cleanHash, cleanRows) = hashOf(fn(spark, sfDir))
      spark.catalog.clearCache() // a cache would mask the recompute path
      taskFailures.set(0); speculativeLaunches.set(0)
      val (chaosHash, chaosRows) =
        if (killMode) { killOneExecutor(2000); hashOf(fn(spark, sfDir)) }
        else if (speculate) hashOf(withSlowFirstAttempts(fn(spark, sfDir)))
        else hashOf(withInjectedFailures(fn(spark, sfDir)))
      spark.catalog.clearCache()
      // the event that must have HAPPENED, not just been configured
      val events = if (speculate) speculativeLaunches.get else taskFailures.get
      val ok = cleanHash == chaosHash && events >= 1
      if (!ok) bad += 1
      println(s"[retry] $name rows=$cleanRows clean=$cleanHash " +
        s"chaos=$chaosHash failures=${taskFailures.get} " +
        s"speculative=${speculativeLaunches.get} " +
        (if (ok) "OK"
         else if (events == 0)
           (if (speculate) "NO-SPECULATION-RECORDED" else "NO-RETRY-RECORDED")
         else "HASH-MISMATCH"))
    }
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
