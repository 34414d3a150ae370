package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: dump `.explain("formatted")` for named SparkEntry queries to
  * files (plans/<tag>/<query>_<suffix>.txt). Not part of the driver
  * contract.
  *
  * usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> <query...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
          plan.getBytes("UTF-8"))
        println(s"PLANDUMP $name ok (${plan.length} bytes)")
      } catch { case e: Throwable =>
        println(s"PLANDUMP $name FAILED: $e")
      }
    }
    spark.stop()
  }
}
