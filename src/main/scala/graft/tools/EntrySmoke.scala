package graft.tools
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"ENTRY rows=$n schema=${df.columns.mkString(",")}")
    spark.stop()
    assert(n > 0)
  }
}
