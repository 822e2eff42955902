package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.01"

  test("data_split partitions every doc exactly once, ~80/10/10") {
    val rows = PipelineQueries.dataSplit(spark, dir).collect()
    val bySplit = rows.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(bySplit.values.sum === 500L)
    // md5 buckets: binomial(500, 0.8) — loose 3σ-ish bounds
    assert(bySplit("train") > 350 && bySplit("train") < 450)
    assert(bySplit.keySet === Set("train", "validation", "test"))
  }

  test("data_split is deterministic (same assignment on re-run)") {
    val a = PipelineQueries.dataSplit(spark, dir).collect().toSeq
    val b = PipelineQueries.dataSplit(spark, dir).collect().toSeq
    assert(a === b)
  }

  test("filter chain attributes first failed rule; keep = no rule fired") {
    val rows = PipelineQueries.textFilterChain(spark, dir).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val (toks, keep, reason) = (r.getInt(1), r.getBoolean(4), r.getString(5))
      assert(keep === (reason == "kept"))
      if (toks < 15) assert(reason === "too_short") // rule 1 wins
    }
    val reasons = rows.map(_.getString(5)).toSet
    assert(reasons.contains("kept"))
    assert((reasons - "kept").nonEmpty, "no rule fired at all — thresholds dead")
  }

  test("decontam flags only train docs and only above the threshold") {
    val rows = PipelineQueries.textDecontam(spark, dir).collect()
    assert(rows.nonEmpty, "no contamination found — planted overlap missed")
    rows.foreach { r =>
      assert(r.getLong(0) % 20 != 0L, "benchmark doc leaked into output")
      assert(r.getDouble(3) >= 0.2)
      assert(r.getLong(2) <= r.getLong(1)) // overlap ≤ own shingles
    }
  }

  test("decontam plan broadcasts the benchmark shingle set") {
    val plan = PipelineQueries.textDecontam(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark join not broadcast:\n$plan")
  }
}
