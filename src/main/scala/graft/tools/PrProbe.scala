package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnosis harness for dedup_pagerank cost at a given SF:
  * sizes of the candidate graph and per-phase wall times.
  * Usage: runMain graft.tools.PrProbe <sfDir>
  */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-prprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PRPROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = graft.Tables.documents(spark, sfDir)
    val sh = graft.dedup.Shingling.shingles(docs)
    val bands = graft.dedup.DedupQueries.minhashBands(sh)
    val cand = bands.select(col("doc_id").as("doc_a"), col("band"),
        col("band_key"))
      .join(bands.select(col("doc_id").as("doc_b"), col("band"),
        col("band_key")), Seq("band", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    val c = graft.CachedFrames.persist(cand)
    timed("cand count")(println("PRPROBE n_edges=" + c.count()))
    timed("nodes")(println("PRPROBE n_nodes=" +
      c.select(col("doc_a")).union(c.select(col("doc_b"))).distinct().count()))
    timed("one iteration shape") {
      val edges = c.union(c.select(col("doc_b"), col("doc_a")))
        .toDF("src", "dst")
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val ed = graft.CachedFrames.persist(edges.join(deg, Seq("src")))
      val ranks = graft.CachedFrames.persist(
        deg.select(col("src").as("node"), lit(1000000L).as("r")))
      val contrib = ed.join(ranks, col("src") === col("node"))
        .select(col("dst").as("node2"), expr("r div deg").as("c"))
      val next = contrib.groupBy(col("node2"))
        .agg(expr("150000 + 85 * sum(c) div 100").as("r"))
      println("PRPROBE iter1 rows=" + next.count())
    }
    timed("full pagerank")(
      println("PRPROBE pr rows=" +
        graft.dedup.DedupQueries.dedupPagerank(spark, sfDir).count()))
    spark.stop()
  }
}
