package graft
import org.apache.spark.sql.SparkSession
/** Dev probe: flag plans where a SINGLE operator line expands the
  * tokenizer chain more than once — the per-row duplicate-evaluation
  * smell (tokenize-once should be a named projection). */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      try {
        val p = SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
          .queryExecution.executedPlan.toString
        val worst = p.linesIterator
          .map(l => "split\\(trim\\(regexp_replace\\(lower\\(".r.findAllIn(l).size).maxOption.getOrElse(0)
        if (worst > 1) println(s"PROBE $n worst_line_tokenizations=$worst")
      } catch { case e: Throwable => println(s"PROBE $n ERR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
