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
    val builder =
      if (sys.env.contains("SPARK_GRAFT_MASTER"))
        MasterConfig(SparkSession.builder(), cpus)
      else SparkSession.builder().master(s"local[$cpus, 4]")
    val spark = builder
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val taskFailures = new AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.reason != TaskSuccess) taskFailures.incrementAndGet()
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

    // kill-mode: SIGKILL one CoarseGrainedExecutorBackend child a beat
    // into the chaos run; the standalone master replaces it, tasks and
    // lost shuffle outputs reschedule/rerun on the survivors
    def killOneExecutor(delayMs: Long): Thread = {
      val t = new Thread(() => {
        Thread.sleep(delayMs)
        val pids = scala.sys.process.Process(
          Seq("pgrep", "-f", "CoarseGrainedExecutorBackend")).!!
          .split("\n").filter(_.nonEmpty)
        pids.headOption.foreach { pid =>
          System.err.println(s"[retry] killing executor pid $pid")
          scala.sys.process.Process(Seq("kill", "-9", pid)).!
        }
      })
      t.setDaemon(true); t.start(); t
    }

    var bad = 0
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val (cleanHash, cleanRows) = hashOf(fn(spark, sfDir))
      spark.catalog.clearCache() // a cache would mask the recompute path
      taskFailures.set(0)
      val (chaosHash, chaosRows) =
        if (killMode) { killOneExecutor(2000); hashOf(fn(spark, sfDir)) }
        else hashOf(withInjectedFailures(fn(spark, sfDir)))
      spark.catalog.clearCache()
      val ok = cleanHash == chaosHash && taskFailures.get >= 1
      if (!ok) bad += 1
      println(s"[retry] $name rows=$cleanRows clean=$cleanHash " +
        s"chaos=$chaosHash failures=${taskFailures.get} " +
        (if (ok) "OK"
         else if (taskFailures.get == 0) "NO-RETRY-RECORDED"
         else "HASH-MISMATCH"))
    }
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
