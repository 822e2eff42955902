package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: print the executed plan of one or more gate queries.
  * {{{ sbt "runMain graft.Explain sf0.01 q8_market_share text_bm25" }}}
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = s"/root/testdata/${args.headOption.getOrElse("sf0.001")}"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString())
    }
    spark.stop()
  }
}
