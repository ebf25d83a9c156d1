package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components by iterative min-label propagation —
  * the clustering step of a dedup pipeline: near-dup PAIRS (from
  * MinHash/SimHash/n-gram verification) become CLUSTERS, and one
  * canonical document survives per cluster.
  *
  * Algorithm: every node starts labeled with its own id; each round a
  * node takes the minimum label in its closed neighborhood; converged
  * when no label changes. Rounds are whole-graph joins — no driver-side
  * adjacency, no recursion depth tied to component count — so the same
  * code runs on a 100 TB pair set; round count is bounded by the
  * largest component's diameter (near-dup clusters are shallow: dup
  * groups converge in 2–3 rounds). Each round's labels persist and the
  * previous round unpersists — lineage stays O(1) deep, not O(rounds).
  *
  * Output is deterministic: the component id is the minimum node id in
  * the component, independent of partitioning or join order.
  */
object Graph {

  /** (node, component) for every node appearing in `edges`
    * (src/dst column pair). Edges are undirected (both directions are
    * propagated); self-loops and duplicates are fine. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 50): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    // no distinct: duplicate edges cannot change a min-aggregate, and
    // deduplication would cost a full shuffle of the edge set up front
    val und = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
    und.persist(StorageLevel.MEMORY_AND_DISK)

    // round 1 fused into initialization: a node's first label is the min
    // of its closed neighborhood — one shuffle, and it subsumes the
    // distinct() that a separate identity-label init would need
    var labels = und.groupBy(col("src").as("node"))
      .agg(min(col("dst")).as("mn"))
      .select(col("node"), least(col("mn"), col("node")).as("label"))
    labels.persist(StorageLevel.MEMORY_AND_DISK)
    var persisted = labels

    var iter = 1
    var converged = false
    while (!converged && iter < maxIter) {
      val labelType = labels.schema("label").dataType
      // candidate labels: own + every neighbor's current label; the own
      // branch carries the previous label through the aggregation so the
      // convergence check is a filter on the (persisted) result, not a
      // join back against the previous round
      val viaNeighbors = und
        .join(labels.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), col("label"),
          lit(null).cast(labelType).as("own"))
      val next = labels
        .select(col("node"), col("label"), col("label").as("own"))
        .unionByName(viaNeighbors)
        .groupBy(col("node"))
        .agg(min(col("label")).as("label"), max(col("own")).as("own"))
      next.persist(StorageLevel.MEMORY_AND_DISK)
      // min-aggregated labels only ever decrease; `own` is non-null for
      // every node (each was in the previous round's label set)
      val changed = next.filter(col("label") < col("own")).limit(1).count()
      persisted.unpersist()
      persisted = next
      labels = next.select(col("node"), col("label"))
      converged = changed == 0
      iter += 1
    }
    labels.select(col("node"), col("label").as("component"))
  }

  /** Near-dup survivors: from a corpus and its verified near-dup pairs,
    * keep the minimum-id document of every near-dup cluster (docs in no
    * pair survive untouched) — the final step of dedup at scale. */
  def keepCanonical(docs: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String, bCol: String): DataFrame = {
    val cc = connectedComponents(pairs, aCol, bCol)
    val losers = cc.filter(col("node") =!= col("component"))
      .select(col("node").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }
}
