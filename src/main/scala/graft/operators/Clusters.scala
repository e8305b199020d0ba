package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a verified near-duplicate pair set.
  *
  * The pair generators ([[Dedup.minHashPairs]], [[Dedup.simHashPairs]],
  * [[Dedup.embeddingPairsDistributed]]) emit edges; a training-data pipeline
  * then needs the transitive closure — "these 7 docs are all the same
  * article" — to keep exactly one representative per component rather than
  * dropping one endpoint per pair (pair-wise dropping over-deletes on
  * chains A~B, B~C: dropping B and C keeps only A, which is right, but
  * dropping the higher id of each pair independently can delete every
  * member of a cycle).
  *
  * Algorithm: iterative min-label propagation to fixpoint — each node's
  * label becomes the minimum label in its closed neighborhood, repeated
  * until no label changes. Each iteration is one shuffle of (edges ⋈
  * labels) plus a min-aggregate, so total cost is O(diameter) shuffles over
  * the EDGE set only — never the corpus, and never all-pairs. Near-dup
  * components are near-cliques (every copy of an article pairs with every
  * other), so the diameter is 1-2 and the loop converges in 2-3 rounds;
  * the O(log²n) large-star/small-star scheme (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC'14) only wins on long-chain
  * graphs that near-dup edge sets do not produce, and costs two shuffles
  * per round instead of one. `maxIter` bounds the pathological case and the
  * operator fails loudly rather than returning a non-fixpoint labeling.
  *
  * Lineage: each iteration `localCheckpoint`s its label table — iterative
  * self-joins otherwise stack an Exchange per round into one plan whose
  * analysis cost grows without bound. On a real cluster, executor loss
  * during the (short) loop re-runs the operator; a reliable
  * `spark.sparkContext.setCheckpointDir` + `checkpoint()` swap is the
  * long-job hardening knob.
  */
object Clusters {

  /** Component labels for every id that appears in `pairs`: (id,
    * cluster_id) where cluster_id is the minimum id in the component.
    * Ids absent from `pairs` are singletons — callers attach them with a
    * left join + coalesce(cluster_id, id) (see `dedup_cluster_ids`), which
    * keeps this loop's working set proportional to the EDGES, not the
    * corpus. */
  def connectedComponents(pairs: DataFrame, aCol: String = "id_a",
                          bCol: String = "id_b", maxIter: Int = 25): DataFrame = {
    val fwd = pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
    // symmetric edge list, persisted: it drives every propagation round
    val edges = graft.Caches.persistTracked(
      fwd.union(pairs.select(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst"))))

    // round 0: label(x) = min(x, min neighbor(x))
    var labels = edges.groupBy("src").agg(min("dst").as("lbl"))
      .select(col("src").as("id"), least(col("src"), col("lbl")).as("lbl"))
      .localCheckpoint()
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxIter) {
      // pull the smallest label across each closed neighborhood
      val viaNeighbors = edges.join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("lbl"))
      val next = viaNeighbors.union(labels)
        .groupBy("id").agg(min("lbl").as("lbl"))
        .localCheckpoint()
      // fixpoint probe: any label still shrinking? limit(1) makes this an
      // existence check, not a full count
      converged = next.join(labels.withColumnRenamed("lbl", "prev"), "id")
        .filter(col("lbl") =!= col("prev")).limit(1).count() == 0L
      labels = next
      rounds += 1
    }
    require(converged,
      s"connectedComponents: no fixpoint after $maxIter rounds — raise maxIter " +
        "(component diameter exceeds the bound; near-dup graphs should never do this)")
    labels.select(col("id"), col("lbl").as("cluster_id"))
  }
}
