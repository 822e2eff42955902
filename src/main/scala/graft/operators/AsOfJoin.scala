package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Backward as-of join: for each left row, the single latest right row
  * of the same key with `rightTime <= leftTime` (left rows with no
  * match keep null right columns).
  *
  * Spark lacks this operator; the composable form (equi-join on the key
  * + `row_number` window, see AnalyticsQueries.qAsofJoin) explodes each
  * left row by its full per-key right history before ranking — fine for
  * small histories, quadratic at 100 TB. This implementation is the
  * scalable merge: tag both sides, one shuffle by key, one
  * sort-within-partitions on (key, time, tag), then a single streaming
  * pass that carries the last-seen right row per key. Cost: shuffle of
  * |L|+|R| rows, no blow-up, no driver involvement.
  *
  * (Preference-order note: a full custom SparkPlan would also work, but
  * the union+sort+mapPartitions form already yields the exact physical
  * shape — Exchange → Sort → single pass — with far less machinery.)
  */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String): DataFrame = {
    val leftSchema = left.schema
    val rightSchema = right.schema
    val outSchema = StructType(
      leftSchema.fields ++ rightSchema.fields.map(_.copy(nullable = true)))

    val leftStruct = struct(leftSchema.fieldNames.map(left(_)).toSeq: _*)
    val rightStruct = struct(rightSchema.fieldNames.map(right(_)).toSeq: _*)
    val l2 = left.select(
      left(leftKey).as("__k"), left(leftTime).as("__t"),
      lit(1).as("__tag"), leftStruct.as("__l"),
      lit(null).cast(StructType(rightSchema.fields)).as("__r"))
    val r2 = right.select(
      right(rightKey).as("__k"), right(rightTime).as("__t"),
      lit(0).as("__tag"), lit(null).cast(StructType(leftSchema.fields)).as("__l"),
      rightStruct.as("__r"))

    val merged = l2.unionByName(r2)
      .repartition(col("__k"))
      .sortWithinPartitions(col("__k"), col("__t"), col("__tag"))

    val nRight = rightSchema.size
    merged.mapPartitions { rows =>
      var currentKey: Any = null
      var haveKey = false
      var lastRight: Row = null
      rows.flatMap { row =>
        val k = row.get(0)
        if (!haveKey || k != currentKey) {
          currentKey = k; haveKey = true; lastRight = null
        }
        if (row.getInt(2) == 0) { // right side: remember, emit nothing
          lastRight = row.getStruct(4)
          Iterator.empty
        } else {
          val lRow = row.getStruct(3)
          val rVals: Seq[Any] =
            if (lastRight == null) Seq.fill[Any](nRight)(null)
            else lastRight.toSeq
          Iterator(Row.fromSeq(lRow.toSeq ++ rVals))
        }
      }
    }(Encoders.row(outSchema))
  }
}
