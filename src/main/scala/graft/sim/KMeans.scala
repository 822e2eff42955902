package graft.sim

import graft.functions.VectorFunctions.{dot, normalize}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic spherical k-means for the IVF codebook (SURVEY S2's
  * trained-codebook path): Lloyd iterations over cosine assignment,
  * seeded from the per-label means so there is no RNG anywhere —
  * centroids are rounded to 6dp each iteration, which also pins the
  * result against partial-aggregation summation order.
  *
  * Each iteration is one broadcast of k centroids + one shuffle
  * (groupBy cluster×dim) — at 100 TB you run a few iterations on a
  * sample, then one full assignment pass; the shapes here are exactly
  * that.
  */
object KMeans {

  /** element-wise mean per key, rounded; input (key, v) → (key, cv) */
  private[sim] def meanByKey(df: DataFrame, key: String): DataFrame =
    df.select(col(key), explode(expr(
      "transform(sequence(1, size(v)), i -> struct(i, element_at(v, i)))"))
      .as("x"))
      .select(col(key), col("x.i").as("i"), col("x.col2").as("xi"))
      .groupBy(col(key), col("i"))
      .agg(round(avg(col("xi")), 6).as("av"))
      .groupBy(col(key))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("av")))),
        x => x.getField("av")).as("cv"))

  /** assign each vector to its max-cosine centroid (ties → lower id).
    *
    * The codebook is bounded (k rows), so it is collected once — the
    * same driver-resident-centroids shape Spark MLlib's KMeans uses
    * between iterations — and the assignment is a single codegen'd
    * `array_max` over per-centroid (ccos, -cluster) structs: no join
    * (the previous form planned an n×k BroadcastNestedLoopJoin), no
    * window, no shuffle.
    */
  def assign(vecs: DataFrame, centroids: DataFrame): DataFrame = {
    val cents = collectCodebook(centroids)
    val best = array_max(array(cents.map { case (c, cv) =>
      struct(
        round(dot(col("__vn"),
          typedLit(graft.functions.VectorFunctions.normalizeSeq(cv))), 6)
          .as("ccos"),
        lit(-c).as("neg_cluster"))
    }: _*))
    vecs.withColumn("__vn", normalize(col("v")))
      .withColumn("__best", best)
      .select(col("vec_id"), col("v"),
        (col("__best.neg_cluster") * lit(-1L)).as("cluster"),
        col("__best.ccos").as("ccos"))
  }

  /** The bounded (≤ k rows) codebook as driver values, id-sorted. */
  def collectCodebook(centroids: DataFrame): Seq[(Long, Seq[Double])] =
    centroids.collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Double](1).toVector: Seq[Double]))
      .sortBy(_._1)

  /** @param vecs (vec_id, v: array<double>, label) — labels seed the
    *             k clusters
    * @return (cluster, cv) codebook after `iterations` Lloyd steps
    */
  def train(vecs: DataFrame, iterations: Int): DataFrame = {
    var cent = meanByKey(
      vecs.select(col("label").cast("long").as("cluster"), col("v")),
      "cluster")
    var i = 0
    while (i < iterations) {
      cent = meanByKey(
        assign(vecs.select(col("vec_id"), col("v")), cent)
          .select(col("cluster"), col("v")), "cluster")
      i += 1
    }
    cent
  }

  /** mean max-cosine of the assignment — the spherical-kmeans
    * objective; higher is tighter.
    */
  def objective(vecs: DataFrame, centroids: DataFrame): Double =
    assign(vecs.select(col("vec_id"), col("v")), centroids)
      .agg(avg(col("ccos"))).collect().head.getDouble(0)
}
