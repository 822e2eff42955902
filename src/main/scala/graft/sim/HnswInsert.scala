package graft.sim

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.dot

/** R15: incremental maintenance of the S13 layered (HNSW-style) graph
  * — the streaming face of `knn_graph_hnsw`. The batch build
  * reconstructs every layer from scratch; an ingest pipeline instead
  * INSERTS each arriving micro-batch into the live graph:
  *
  *  1. each new vector draws its (deterministic, md5) level — the
  *     same nested-level rule the batch build uses, so a node's layer
  *     membership never depends on arrival time;
  *  2. the batch descends the CURRENT graph from the entry point
  *     (one beam round per upper layer, `HnswBaseRounds` on the base)
  *     exactly like a search — the visited set IS the candidate set,
  *     which is the core HNSW insight (insert = search + connect);
  *  3. new nodes connect to their top-M candidates at every layer up
  *     to their level (batch-internal pairs score too, so
  *     same-trigger arrivals can link); reverse edges attach the new
  *     nodes to the existing graph, and every touched adjacency list
  *     re-prunes to the best M by cosine — the HNSW degree bound that
  *     keeps per-node state constant over any stream length.
  *
  * Edge state is (lvl, src, dst, cos): per layer ≤ M rows per member
  * node — the same cardinality the batch build materializes, held
  * incrementally. Each insert shuffles candidate pairs and the
  * touched adjacency only; frontier broadcasts stay kilobytes. The
  * graph depends (as every HNSW does) on insertion order, so the
  * parity statement is NOT edge-set equality with the batch build:
  * the spec pins determinism (same tape, same packing ⇒ identical
  * graph), the degree bound, reachability of every inserted node, and
  * search recall on the grown graph against brute force.
  */
object HnswInsert {

  /** Live graph: `lv` = (vec_id, vn, lvl) members; `edges` =
    * (lvl, src, dst, cos) directed adjacency, ≤ M per (lvl, src).
    */
  case class GraphState(lv: DataFrame, edges: DataFrame)

  /** Bootstrap from a seed corpus via the batch-build shapes: one
    * co-membership graph per layer (the S13 build), scored so the
    * prune step can compare incumbents against new arrivals.
    */
  def bootstrap(seed: DataFrame, cents: Seq[(Int, Seq[Double])])
  : GraphState = {
    val lv = SimQueries.hnswLevels(seed).localCheckpoint(false)
    val layers = (0 to 2).map { l =>
      scoredEdges(
        SimQueries.symmetrize(
          SimQueries.coMemberGraph(lv.filter(col("lvl") >= l), cents)),
        lv).withColumn("lvl", lit(l))
    }
    GraphState(lv, layers.reduce(_.unionByName(_))
      .select(col("lvl"), col("src"), col("dst"), col("cos"))
      .localCheckpoint(false))
  }

  /** Attach exact cosines to an unscored (src, dst) edge list. */
  private def scoredEdges(e: DataFrame, lv: DataFrame): DataFrame =
    e.join(lv.select(col("vec_id").as("src"), col("vn").as("svn")),
        Seq("src"))
      .join(lv.select(col("vec_id").as("dst"), col("vn").as("dvn")),
        Seq("dst"))
      .select(col("src"), col("dst"),
        round(dot(col("svn"), col("dvn")), 6).as("cos"))

  /** The graph's deterministic entry point: highest layer, lowest id —
    * a bounded one-row plan-time collect (the codebook idiom).
    */
  private def entryOf(lv: DataFrame): Row =
    lv.orderBy(col("lvl").desc, col("vec_id").asc)
      .select(col("vec_id"), col("vn")).head()

  /** Insert a micro-batch of (vec_id, vn) vectors; returns the grown
    * graph. Deterministic for a given (state, batch).
    */
  def insert(state: GraphState, batch: DataFrame): GraphState = {
    val newLv = SimQueries.hnswLevels(batch).localCheckpoint(false)
    val entry = entryOf(state.lv)
    val entryId = entry.getLong(0)
    val entryVn: Seq[Double] = entry.getSeq[Double](1).toVector

    // search descent: new vectors are the queries, current graph the
    // index — visited candidates accumulate exactly as in serving
    val q = newLv.select(col("vec_id").as("q_id"), col("vn").as("qvn"))
    val vecById = state.lv
      .select(col("vec_id").as("cand"), col("vn").as("cvn"))
    def layer(l: Int): DataFrame =
      state.edges.filter(col("lvl") === l).select(col("src"), col("dst"))
    var seen = q.select(col("q_id"), lit(entryId).as("cand"),
        round(dot(col("qvn"), typedLit(entryVn)), 6).as("cos"))
      .localCheckpoint(false)
    Seq(layer(2), layer(1)).foreach { g =>
      seen = SimQueries.expandRound(seen, g, q, vecById,
        SimQueries.HnswBeam).localCheckpoint(false)
    }
    var r = 0
    while (r < SimQueries.HnswBaseRounds) {
      seen = SimQueries.expandRound(seen, layer(0), q, vecById,
        SimQueries.HnswBeam).localCheckpoint(false)
      r += 1
    }

    // batch-internal pairs: same-trigger arrivals must be able to
    // link (triggers are bounded, so this block is |B|² candidates,
    // not corpus-sized)
    val internal = q.join(
        newLv.select(col("vec_id").as("cand"), col("vn").as("cvn")),
        col("q_id") =!= col("cand"))
      .select(col("q_id"), col("cand"),
        round(dot(col("qvn"), col("cvn")), 6).as("cos"))
    val cand = seen.filter(col("cand") =!= col("q_id")).union(internal)
      .localCheckpoint(false)

    // connect: per layer ≤ node's level, top-M candidates drawn from
    // members of that layer (candidate levels join from the grown
    // member table)
    val grownLv = state.lv.unionByName(newLv).localCheckpoint(false)
    val candLv = cand.join(
      grownLv.select(col("vec_id").as("cand"), col("lvl").as("clvl")),
      Seq("cand"))
    val newEdges = (0 to 2).map { l =>
      candLv
        .join(newLv.filter(col("lvl") >= l)
          .select(col("vec_id").as("q_id")), Seq("q_id"))
        .filter(col("clvl") >= l)
        .groupBy(col("q_id"))
        .agg(graft.functions.TopKAgg(col("cos"), col("cand"),
          SimQueries.GraphM).as("top"))
        .select(col("q_id").as("src"), explode(col("top")).as("t"))
        .select(col("src"), col("t.id").as("dst"), col("t.score").as("cos"))
        .withColumn("lvl", lit(l))
    }.reduce(_.unionByName(_))
      .select(col("lvl"), col("src"), col("dst"), col("cos"))

    // symmetrize + prune: reverse edges point the graph at the new
    // nodes; every (lvl, src) adjacency re-selects its best M, so
    // incumbents and arrivals compete and the degree bound holds
    val reversed = newEdges.select(col("lvl"), col("dst").as("src"),
      col("src").as("dst"), col("cos"))
    val pruned = state.edges.unionByName(newEdges).unionByName(reversed)
      .dropDuplicates("lvl", "src", "dst")
      .groupBy(col("lvl"), col("src"))
      .agg(graft.functions.TopKAgg(col("cos"), col("dst"),
        SimQueries.GraphM).as("top"))
      .select(col("lvl"), col("src"), explode(col("top")).as("t"))
      .select(col("lvl"), col("src"), col("t.id").as("dst"),
        col("t.score").as("cos"))
      .localCheckpoint(false)
    GraphState(grownLv, pruned)
  }

  /** Serve top-k over the live graph — the S13 descent, parameterized
    * by the incremental state. Returns (q_id, neighbor, cos, rank).
    */
  def search(state: GraphState, queries: DataFrame): DataFrame = {
    val entry = entryOf(state.lv)
    val entryId = entry.getLong(0)
    val entryVn: Seq[Double] = entry.getSeq[Double](1).toVector
    val q = queries.select(col("q_id"), col("qvn"))
    val vecById = state.lv
      .select(col("vec_id").as("cand"), col("vn").as("cvn"))
    def layer(l: Int): DataFrame =
      state.edges.filter(col("lvl") === l).select(col("src"), col("dst"))
    var seen = q.select(col("q_id"), lit(entryId).as("cand"),
        round(dot(col("qvn"), typedLit(entryVn)), 6).as("cos"))
      .localCheckpoint(false)
    Seq(layer(2), layer(1)).foreach { g =>
      seen = SimQueries.expandRound(seen, g, q, vecById,
        SimQueries.HnswBeam).localCheckpoint(false)
    }
    var r = 0
    while (r < SimQueries.HnswBaseRounds) {
      seen = SimQueries.expandRound(seen, layer(0), q, vecById,
        SimQueries.HnswBeam).localCheckpoint(false)
      r += 1
    }
    SimQueries.rankTopK(seen)
  }
}
