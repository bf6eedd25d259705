package graft

import org.apache.spark.sql.SparkSession

/** SPARK_GRAFT_MASTER override for the probe mains — the lever that turns
  * any of them into MULTI-EXECUTOR evidence. `local[n]` (the default) is
  * one JVM with zero serialization boundaries: every custom Expression,
  * Aggregator buffer, broadcast, and state-store instance lives on the
  * fast path where a Kryo/Java serialization bug is invisible by
  * construction. `local-cluster[w,c,m]` (w workers x c cores, m MB each)
  * launches REAL separate executor JVMs, so task binaries, Aggregator
  * buffers, broadcast TRANSPORT, and shuffle all cross process
  * boundaries — the closest in-sandbox approximation of a 1000-executor
  * cluster. Usage:
  *
  *   SPARK_HOME=/opt/spark SPARK_GRAFT_MASTER=local-cluster[4,8,4096] \
  *     sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/out"
  *
  * SPARK_HOME must point at the distribution (the Worker launches
  * executor JVMs through its scripts). The executor processes do not
  * inherit the sbt fork's classpath or JDK-17 module options, so both are
  * forwarded explicitly: the full driver classpath (app classes +
  * /opt/spark/jars) and the launcher's own default module options. */
object MasterConfig {
  def master(cpus: String): String =
    sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")

  def apply(b: SparkSession.Builder, cpus: String): SparkSession.Builder = {
    val m = master(cpus)
    val withMaster = b.master(m)
    if (m.startsWith("local-cluster")) {
      withMaster
        .config("spark.executor.extraClassPath", sys.props("java.class.path"))
        .config("spark.executor.extraJavaOptions",
          org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions())
        // one executor fills each worker: executor memory = the worker
        // memory from the master string (local-cluster[w,c,MB]) unless
        // overridden — a fixed default either under-uses the worker or
        // fails launch ("requested N MiB/executor > worker")
        .config("spark.executor.memory",
          sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM",
            m.replaceAll("""^local-cluster\[\s*\d+\s*,\s*\d+\s*,\s*(\d+)\s*\]$""",
              "$1") + "m"))
    } else withMaster
  }
}
