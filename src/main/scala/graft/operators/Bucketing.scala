package graft.operators

import org.apache.spark.sql.DataFrame

/** Bucketed-table plumbing for repeated fact-fact joins: write both
  * facts bucketed (and sorted) by the join key once, and every
  * subsequent join on that key needs no Exchange and no Sort — the
  * shuffle is prepaid at write time.
  *
  * At 100 TB this converts an every-query O(data) shuffle into a
  * one-time layout decision — the right call whenever a join key is
  * stable (order keys, user ids) and the tables are joined repeatedly.
  * Bucket counts must match (or divide) across the two sides.
  */
object Bucketing {

  /** Save `df` as a bucketed+sorted managed table (parquet). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — plain DataFrame
    * join; the bucketed layout is what removes the Exchanges.
    */
  def bucketedJoin(spark: org.apache.spark.sql.SparkSession,
                   leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))
}
