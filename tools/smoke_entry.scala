// Driver t1 smoke stand-in: builds a plain session (no graft-specific
// configs) and checks SparkEntry.entry(spark) returns rows — mirrors how
// the driver invokes the flagship query.
import org.apache.spark.sql.SparkSession

object SmokeEntry {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"SMOKE entry rows=$n")
    spark.stop()
  }
}
