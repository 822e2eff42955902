package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-inspection helper: run one gate query at a given SF dir and
  * print its AQE-final executed plan plus every BroadcastExchange the
  * ScaleProbe walker finds (with dataSize) — the tool for adjudicating
  * a probe-flagged broadcast.
  *
  * Usage: runMain graft.tools.ExplainOne <query> <sfDir>
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir) = args.take(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.count()
    val plan = df.queryExecution.executedPlan
    println(plan.toString)
    val sizes = ScaleProbe.broadcastSizes(plan)
    println(s"BROADCASTS n=${sizes.size} sizes=${sizes.sorted.reverse}")
    graft.CachedFrames.releaseAll()
    spark.stop()
  }
}
