package graft
import org.apache.spark.sql.SparkSession
object PlanDbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    for (q <- Seq("decontaminate_bloom", "assoc_rules", "dedup_substring_pairs"); i <- 1 to 3) {
      val t0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
      SparkEntry.queries(q)(spark, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save()
      println(f"$q pass $i wall ${(System.nanoTime()-t0)/1e9}%.2f s cpu ${(osBean.getProcessCpuTime-c0)/1e9}%.2f s")
      CacheScope.releaseAll()
    }
    spark.stop()
  }
}
