package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev tool: dump `.explain("formatted")` for named SparkEntry queries to
  * files — the plan-evidence artifacts under plans/rNN/ (the judge checks
  * plan claims against these; see OPTIMIZATION_r16.md).
  *
  * Usage: PlanDump <outDir> <suffix> <queryName...>
  * Writes <outDir>/<queryName>_<suffix>.txt. Uses the same session confs
  * as Bench so the dumped plan is the benched plan. Building a streaming
  * query's DataFrame runs its stream first — batch queries dump in
  * milliseconds, streaming ones at their run cost.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"),
        df.queryExecution.explainString(FormattedMode).getBytes("UTF-8"))
      System.err.println(s"[plandump] wrote $outDir/${n}_$suffix.txt")
    }
    spark.stop()
    sys.exit(0)
  }
}
