package graft.tools

import org.apache.spark.sql.SparkSession

/** Drives the driver-contract flagship exactly as the harness would. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    println("ENTRY rows=" + df.count())
    df.show(5, truncate = false)
    spark.stop()
  }
}
