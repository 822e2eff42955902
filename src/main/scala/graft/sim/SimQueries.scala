package graft.sim

import graft.Tables
import graft.functions.VectorFunctions.{dot, normalize}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY §2.4).
  *
  * S1 brute-force cosine top-k is the exactness baseline: O(|Q|·n·d)
  * — at 100 TB you only run it blocked (queries × vector blocks, a
  * GEMM per pair of blocks) or not at all. S2 (IVF) and S3 (LSH) are
  * the scale paths: candidates come from a bucket equi-join (shuffle
  * on bucket id, no cross product), exact scoring touches candidates
  * only. All three have DuckDB oracles running the same arithmetic:
  * cosines via ordered left-fold dot products (bit-compatible with
  * list_dot_product), centroids rounded to 6dp before use so
  * cross-engine summation-order noise cannot flip an assignment,
  * hyperplanes derived from md5 so both engines build identical
  * projections.
  */
object SimQueries {

  val TopK = 5
  val NumQueries = 10 // vec_id < 10 are the query set
  val NumPlanes = 16 // LSH signature bits
  val LshBands = 4 // 4 bands x 4 bits

  private def vecs(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"), col("label"))
      .withColumn("vn", normalize(col("v")))

  private val vecsSql =
    """SELECT vec_id, embedding::DOUBLE[] AS v,
       list_transform(embedding::DOUBLE[], x ->
         x / sqrt(list_dot_product(embedding::DOUBLE[],
                                   embedding::DOUBLE[]))) AS vn,
       label FROM embeddings"""

  /** S1: exact cosine top-k for each query vector. */
  def knnBrute(s: SparkSession, dir: String): DataFrame = {
    val e = vecs(s, dir)
    val q = e.select(col("vec_id").as("q_id"), col("vn").as("qvn"))
      .filter(col("q_id") < NumQueries)
    val scored = q.join(e, col("vec_id") =!= col("q_id"))
      .withColumn("cos", round(dot(col("qvn"), col("vn")), 6))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("vec_id").as("neighbor"), col("cos"),
        col("rank"))
      .orderBy(col("q_id"), col("rank"))
  }

  val knnBruteSql: String = s"""
    WITH e AS ($vecsSql),
    scored AS (
      SELECT q.vec_id AS q_id, e.vec_id AS neighbor,
             round(list_dot_product(q.vn, e.vn), 6) AS cos
      FROM e q JOIN e ON e.vec_id != q.vec_id
      WHERE q.vec_id < $NumQueries),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY q_id
               ORDER BY cos DESC, neighbor) AS rank
      FROM scored)
    SELECT q_id, neighbor, cos, rank FROM ranked
    WHERE rank <= $TopK ORDER BY q_id, rank"""

  /** Per-label mean centroids, rounded for cross-engine determinism. */
  private def centroids(e: DataFrame): DataFrame =
    e.select(col("label"), explode(expr(
      "transform(sequence(1, size(v)), i -> struct(i, element_at(v, i)))"))
      .as("x"))
      .select(col("label"), col("x.i").as("i"), col("x.col2").as("xi"))
      .groupBy(col("label"), col("i"))
      .agg(round(avg(col("xi")), 6).as("av"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("av")))),
        x => x.getField("av")).as("cv"))
      .withColumn("cvn", normalize(col("cv")))

  private val centroidsSql: String = """
    cent AS (
      SELECT label, cv,
             list_transform(cv, x ->
               x / sqrt(list_dot_product(cv, cv))) AS cvn
      FROM (
        SELECT label, list(av ORDER BY i) AS cv
        FROM (SELECT label, i, round(avg(v[i]), 6) AS av
              FROM (SELECT label, v, unnest(range(1, 1 + len(v))) AS i FROM e)
              GROUP BY label, i)
        GROUP BY label))"""

  /** S2: IVF-style ANN — vectors inverted-listed under their nearest
    * centroid (deterministic codebook: the per-label means; production
    * would train k-means offline the same shape), queries probe one
    * list. Candidate generation is an equi-join on the cluster id.
    */
  def knnIvf(s: SparkSession, dir: String): DataFrame = {
    val e = vecs(s, dir)
    val cent = centroids(e)
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("label"))
    val assign = e.drop("label").join(cent)
      .withColumn("ccos", round(dot(col("vn"), col("cvn")), 6))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("vn"), col("label").as("cluster"))
    val q = assign.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("vn").as("qvn"), col("cluster"))
    val scored = q.join(assign, Seq("cluster"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", round(dot(col("qvn"), col("vn")), 6))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("vec_id").as("neighbor"), col("cluster"),
        col("cos"), col("rank"))
      .orderBy(col("q_id"), col("rank"))
  }

  val knnIvfSql: String = s"""
    WITH e AS ($vecsSql),
    $centroidsSql,
    assigned AS (
      SELECT vec_id, vn, cluster FROM (
        SELECT e.vec_id, e.vn, cent.label AS cluster,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 round(list_dot_product(e.vn, cent.cvn), 6) DESC,
                 cent.label) AS rn
        FROM e, cent) WHERE rn = 1),
    scored AS (
      SELECT q.vec_id AS q_id, a.vec_id AS neighbor, a.cluster,
             round(list_dot_product(q.vn, a.vn), 6) AS cos
      FROM assigned q JOIN assigned a USING (cluster)
      WHERE q.vec_id < $NumQueries AND a.vec_id != q.vec_id),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY q_id
               ORDER BY cos DESC, neighbor) AS rank
      FROM scored)
    SELECT q_id, neighbor, cluster, cos, rank FROM ranked
    WHERE rank <= $TopK ORDER BY q_id, rank"""

  /** md5-derived hyperplane component d of plane j, in [-1, 1]. */
  private val planeExpr: String =
    "transform(sequence(0, size(v)-1), d -> " +
      "(cast(conv(substring(md5(concat(cast(j as string), '-', " +
      "cast(d as string))), 1, 7), 16, 10) as bigint) % 2001 - 1000) / 1000.0)"

  /** S3: random-hyperplane LSH — 16 sign bits, banded 4×4; candidates
    * share a band value with the query; exact scoring on candidates.
    */
  def knnLsh(s: SparkSession, dir: String): DataFrame = {
    val e = vecs(s, dir)
    val sigs = e
      .select(col("vec_id"), col("v"),
        explode(sequence(lit(0), lit(NumPlanes - 1))).as("j"))
      .withColumn("dot", expr(
        s"aggregate(zip_with(v, $planeExpr, (x, y) -> x * y), " +
          "cast(0.0 as double), (acc, x) -> acc + x)"))
      .groupBy(col("vec_id"))
      .agg(sum(when(col("dot") >= 0,
        expr("shiftleft(cast(1 as bigint), j)")).otherwise(lit(0L))).as("sig"))
    val bands = sigs.select(col("vec_id"), col("sig"),
      explode(sequence(lit(0), lit(LshBands - 1))).as("band"))
      .withColumn("bkey", expr("shiftright(sig, band * 4) & 15"))
    val qb = bands.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("band"), col("bkey"))
    val cand = qb.join(bands.select(col("vec_id").as("neighbor"),
      col("band"), col("bkey")), Seq("band", "bkey"))
      .filter(col("neighbor") =!= col("q_id"))
      .select(col("q_id"), col("neighbor")).distinct()
    val e2 = vecs(s, dir)
    val scored = cand
      .join(e2.select(col("vec_id").as("q_id"), col("vn").as("qvn")), Seq("q_id"))
      .join(e2.select(col("vec_id").as("neighbor"), col("vn")), Seq("neighbor"))
      .withColumn("cos", round(dot(col("qvn"), col("vn")), 6))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("neighbor"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("neighbor"), col("cos"), col("rank"))
      .orderBy(col("q_id"), col("rank"))
  }

  val knnLshSql: String = s"""
    WITH e AS ($vecsSql),
    dots AS (
      SELECT vec_id, v, j,
             list_dot_product(v, list_transform(range(0, len(v)), d ->
               (('0x' || substring(md5(j::VARCHAR || '-' || d::VARCHAR),
                 1, 7))::BIGINT % 2001 - 1000) / 1000.0)) AS dot
      FROM (SELECT vec_id, v, unnest(range(0, $NumPlanes)) AS j FROM e)),
    sigs AS (
      SELECT vec_id,
             sum(CASE WHEN dot >= 0 THEN (1::BIGINT << j) ELSE 0 END) AS sig
      FROM dots GROUP BY vec_id),
    bands AS (
      SELECT vec_id, sig, band, (sig >> (band * 4)) & 15 AS bkey
      FROM (SELECT vec_id, sig, unnest(range(0, $LshBands)) AS band FROM sigs)),
    cand AS (
      SELECT DISTINCT q.vec_id AS q_id, b.vec_id AS neighbor
      FROM bands q JOIN bands b ON q.band = b.band AND q.bkey = b.bkey
      WHERE q.vec_id < $NumQueries AND b.vec_id != q.vec_id),
    scored AS (
      SELECT c.q_id, c.neighbor,
             round(list_dot_product(q.vn, n.vn), 6) AS cos
      FROM cand c JOIN e q ON q.vec_id = c.q_id
                  JOIN e n ON n.vec_id = c.neighbor),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY q_id
               ORDER BY cos DESC, neighbor) AS rank
      FROM scored)
    SELECT q_id, neighbor, cos, rank FROM ranked
    WHERE rank <= $TopK ORDER BY q_id, rank"""

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_brute" -> (knnBrute _),
    "knn_ivf" -> (knnIvf _),
    "knn_lsh" -> (knnLsh _))

  def oracles: Map[String, String] = Map(
    "knn_brute" -> knnBruteSql,
    "knn_ivf" -> knnIvfSql,
    "knn_lsh" -> knnLshSql)
}
