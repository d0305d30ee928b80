package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke: runs SparkEntry.entry on a vanilla session exactly like the
  * driver's t1 gate (no graft extensions pre-registered). */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    df.show(20, false)
    println("ENTRY_ROWS=" + df.count())
    spark.stop()
  }
}
