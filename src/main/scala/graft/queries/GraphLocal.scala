package graft.queries

import scala.collection.mutable

/** Driver-local twins of the graph-family fixpoint loops (r17).
  *
  * Rationale (the Bpe.trainLocal cutover, applied to the co-order
  * graph): every one of these loops already keeps its PER-ROUND state
  * driver-sized — the degree / peel / distance / label / mass tables
  * are node-domain-bounded and are BROADCAST into map-side joins each
  * round, i.e. the driver (and every executor) already holds them. The
  * only data-sized input is the edge list itself, and the loops consume
  * it from an eager localCheckpoint. When that edge list is under an
  * operable bound (JoinQueries.graphLocalMaxEdges — the
  * q_triangle_count broadcast-cutover policy, which ships the FULL edge
  * list to every executor under its own bound), the driver-coordinated
  * Spark rounds are pure fixed job overhead: each round costs 1-3 job
  * round-trips plus a 32-task micro-stage to move node-domain-sized
  * state that fits in an L2 cache. These functions run the IDENTICAL
  * algorithm on the collected edges; past the bound the distributed
  * loops stand unchanged (the 100 TB path). GraphLocalSpec pins
  * local == distributed per query on a fixture.
  *
  * Determinism: every function mirrors its distributed twin's exact
  * integer arithmetic and tie-breaks (documented per function), so the
  * results are bit-identical, not just equivalent.
  */
private[graft] object GraphLocal {

  /** Cutover bound: a query's LOOP runs driver-local only while its
    * checkpointed edge relation has ≤ this many rows. Sized like the
    * r16 Bpe advice taught — against the real driver footprint, not
    * the raw payload: a collected edge is a boxed (Long, Long) tuple,
    * ~60 B of JVM objects, so 2M edges ≈ 120 MB transient (the peel
    * loop's per-round filter copy doubles that worst-case) — safe
    * inside the bench driver heap. At sf0.1 the co-order graph is
    * 1.196M edges (inside) and the support-2 backbone 7.1k directed
    * rows (trivially inside); a 10× replica or any production corpus
    * exceeds it and keeps the distributed loops (the 100 TB path).
    * Override: -Dgraft.graph.localMaxEdges /
    * SPARK_GRAFT_GRAPH_LOCAL_MAX_EDGES. */
  def maxEdges: Long =
    sys.props.get("graft.graph.localMaxEdges")
      .orElse(sys.env.get("SPARK_GRAFT_GRAPH_LOCAL_MAX_EDGES"))
      .map(_.toLong).getOrElse(2000000L)

  /** q_kcore's peel loop: repeatedly remove nodes of degree < k until
    * the edge count reaches a fixpoint; returns the survivors'
    * (node, core degree), unordered. Mirrors the distributed loop
    * exactly: degree counts each undirected edge at both endpoints, a
    * round removes every edge touching a below-k node, and the
    * fixpoint probe is the edge count (bad ≠ ∅ ⟺ the peel removes
    * edges, since a below-k node always owns ≥ 1 edge). */
  def kcorePeel(edges0: Array[(Long, Long)], k: Int): Seq[(Long, Long)] = {
    // index-encode nodes once so each peel round is a primitive-array
    // sweep (the triangleCounts discipline) — the boxed-HashMap form
    // paid ~14M boxed updates over the 6 rounds at sf0.1's 1.2M edges,
    // most of the job the cutover exists to remove
    val idx = mutable.HashMap.empty[Long, Int]
    val ids = mutable.ArrayBuffer.empty[Long]
    def id(x: Long): Int =
      idx.getOrElseUpdate(x, { ids += x; ids.length - 1 })
    val m = edges0.length
    val ea = new Array[Int](m); val eb = new Array[Int](m)
    var i = 0
    while (i < m) {
      ea(i) = id(edges0(i)._1); eb(i) = id(edges0(i)._2); i += 1
    }
    val n = ids.length
    // live edges stay compacted into [0, live)
    var live = m
    var done = false
    while (!done) {
      val deg = new Array[Long](n)
      i = 0
      while (i < live) { deg(ea(i)) += 1L; deg(eb(i)) += 1L; i += 1 }
      // a node is bad when it HAS live edges but fewer than k — matching
      // the distributed peel, where deg only contains edge-owning nodes
      val bad = new Array[Boolean](n)
      var any = false
      var j = 0
      while (j < n) {
        if (deg(j) > 0L && deg(j) < k) { bad(j) = true; any = true }
        j += 1
      }
      if (!any) done = true
      else {
        var w = 0
        i = 0
        while (i < live) {
          if (!bad(ea(i)) && !bad(eb(i))) {
            ea(w) = ea(i); eb(w) = eb(i); w += 1
          }
          i += 1
        }
        if (w == live) done = true
        live = w
      }
    }
    val core = new Array[Long](n)
    i = 0
    while (i < live) { core(ea(i)) += 1L; core(eb(i)) += 1L; i += 1 }
    (0 until n).collect { case j if core(j) > 0L => (ids(j), core(j)) }
  }

  /** q_shortest_path's multi-source Bellman-Ford: sources are the top
    * `nHubs` nodes by out-degree of the DIRECTED edge list (count of
    * rows per u; ties broken by smaller node — the TakeOrdered order),
    * each round min-relaxes every edge from the PREVIOUS round's
    * distance table (synchronous), and the fixpoint probe is the
    * (row count, dist sum) pair of the new table — exactly the
    * distributed loop's witness. Returns (node, dist), unordered. */
  def hubDistances(edges: Array[(Long, Long, Long)],
      nHubs: Int): Seq[(Long, Long)] = {
    val deg = mutable.HashMap.empty[Long, Long]
    edges.foreach { case (u, _, _) =>
      deg.update(u, deg.getOrElse(u, 0L) + 1L)
    }
    val hubs = deg.toSeq.sortBy { case (n, d) => (-d, n) }
      .take(nHubs).map(_._1)
    var dist: Map[Long, Long] = hubs.map(_ -> 0L).toMap
    var probe = (-1L, -1L)
    var done = false
    while (!done) {
      val next = mutable.HashMap[Long, Long](dist.toSeq: _*)
      edges.foreach { case (u, v, w) =>
        dist.get(u) match {
          case Some(du) =>
            val nd = du + w
            if (next.get(v).forall(_ > nd)) next.update(v, nd)
          case None =>
        }
      }
      val p2 = (next.size.toLong, next.values.sum)
      if (p2 == probe) done = true
      else { dist = next.toMap; probe = p2 }
    }
    dist.toSeq
  }

  /** lpa()'s 4-round synchronous label propagation over the DIRECTED
    * (symmetrized) edge list: each node adopts the mode of its
    * neighbors' labels, ties broken by SMALLEST label (the distributed
    * max(struct(c, -lbl)) aggregate). Labels start as the node ids.
    * Returns the final (node, label) map. */
  def lpa(und: Array[(Long, Long)], rounds: Int): Map[Long, Long] = {
    var lab: Map[Long, Long] =
      und.map(_._1).distinct.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      val votes = mutable.HashMap.empty[(Long, Long), Long]
      und.foreach { case (u, v) =>
        val key = (u, lab(v))
        votes.update(key, votes.getOrElse(key, 0L) + 1L)
      }
      val best = mutable.HashMap.empty[Long, (Long, Long)] // u -> (c, lbl)
      votes.foreach { case ((u, l), c) =>
        best.get(u) match {
          case Some((bc, bl)) =>
            if (c > bc || (c == bc && l < bl)) best.update(u, (c, l))
          case None => best.update(u, (c, l))
        }
      }
      lab = best.map { case (u, (_, l)) => u -> l }.toMap
    }
    lab
  }

  /** q_ppr's fixed-round personalized-PageRank spread: sources are the
    * top `nSources` nodes by out-degree (ties → smaller node, the
    * TakeOrdered order); each round every (src, u) mass entry spreads
    * (85·(m div d_u)) div 100 along every edge u→v (floor division on
    * non-negative int64 — identical to Spark's IntegralDivide here),
    * plus the 150 000 restart at (src, src); zero-mass entries are
    * dropped. Returns (src, node, mass), unordered. */
  def ppr(edges: Array[(Long, Long)], nSources: Int,
      rounds: Int): Seq[(Long, Long, Long)] = {
    val deg = mutable.HashMap.empty[Long, Long]
    edges.foreach { case (u, _) =>
      deg.update(u, deg.getOrElse(u, 0L) + 1L)
    }
    val srcs = deg.toSeq.sortBy { case (n, d) => (-d, n) }
      .take(nSources).map(_._1)
    var p: Map[(Long, Long), Long] =
      srcs.map(s => (s, s) -> 1000000L).toMap
    for (_ <- 1 to rounds) {
      // group this round's mass by node so the edge sweep is linear
      val byNode = mutable.HashMap.empty[Long, List[(Long, Long)]]
      p.foreach { case ((src, n), m) =>
        byNode.update(n, (src, m) :: byNode.getOrElse(n, Nil))
      }
      val next = mutable.HashMap.empty[(Long, Long), Long]
      edges.foreach { case (u, v) =>
        byNode.get(u) match {
          case Some(masses) =>
            val d = deg(u)
            masses.foreach { case (src, m) =>
              val c = 85L * (m / d) / 100L
              val key = (src, v)
              next.update(key, next.getOrElse(key, 0L) + c)
            }
          case None =>
        }
      }
      srcs.foreach { s =>
        val key = (s, s)
        next.update(key, next.getOrElse(key, 0L) + 150000L)
      }
      p = next.filter(_._2 > 0L).toMap
    }
    p.toSeq.map { case ((src, n), m) => (src, n, m) }
  }

  /** q_triangle_count's per-node triangle counts over the DISTINCT
    * undirected edge list: the same degree-ordered forward algorithm
    * the distributed plan runs (orient u→v when (deg, id) of u is
    * smaller; every triangle has exactly one rank-ordered orientation,
    * so it is found exactly once), realized as sorted primitive-int
    * adjacency arrays + merge-intersection — no boxing anywhere on the
    * O(Σ d⁺²) hot path (~82M int comparisons at sf0.1's 1.2M-edge
    * graph, well under a second, where the distributed wedge self-join
    * materializes ~41M rows). Nodes are index-encoded in rank order so
    * the rank comparison IS the int comparison. Returns (node,
    * n_triangles) for nodes in ≥1 triangle, unordered — exact
    * combinatorics, so equality with the distributed count needs no
    * arithmetic mirroring. */
  def triangleCounts(edges: Array[(Long, Long)]): Seq[(Long, Long)] = {
    val degM = mutable.HashMap.empty[Long, Long]
    edges.foreach { case (a, b) =>
      degM.update(a, degM.getOrElse(a, 0L) + 1L)
      degM.update(b, degM.getOrElse(b, 0L) + 1L)
    }
    val sorted = degM.keys.toArray.sortBy(n => (degM(n), n))
    val idx = mutable.HashMap.empty[Long, Int]
    var i = 0
    while (i < sorted.length) { idx.update(sorted(i), i); i += 1 }
    val n = sorted.length
    val adjCount = new Array[Int](n)
    edges.foreach { case (a, b) =>
      val ia = idx(a); val ib = idx(b)
      adjCount(if (ia < ib) ia else ib) += 1
    }
    val adj = Array.tabulate(n)(j => new Array[Int](adjCount(j)))
    val fill = new Array[Int](n)
    edges.foreach { case (a, b) =>
      val ia = idx(a); val ib = idx(b)
      val s = if (ia < ib) ia else ib
      val t = if (ia < ib) ib else ia
      adj(s)(fill(s)) = t; fill(s) += 1
    }
    i = 0
    while (i < n) { java.util.Arrays.sort(adj(i)); i += 1 }
    val tri = new Array[Long](n)
    i = 0
    while (i < n) {
      val au = adj(i)
      var j = 0
      while (j < au.length) {
        val v = au(j)
        val av = adj(v)
        // merge-intersect the rank-above-v tail of fwd(u) with fwd(v):
        // every common w closes the rank-ordered triangle (u, v, w)
        var p = j + 1; var q = 0
        while (p < au.length && q < av.length) {
          val x = au(p); val y = av(q)
          if (x == y) {
            tri(i) += 1L; tri(v) += 1L; tri(x) += 1L; p += 1; q += 1
          } else if (x < y) p += 1
          else q += 1
        }
        j += 1
      }
      i += 1
    }
    (0 until n).collect { case j if tri(j) > 0L => (sorted(j), tri(j)) }
  }

  /** ConnectedComponents' result on a collected pair list: components
    * labeled by their MINIMUM member (union-find with min
    * representatives — the same labeling the distributed min-label
    * propagation converges to). Returns (node, component) for every
    * node that appears in a pair, unordered. */
  def connectedComponents(pairs: Array[(Long, Long)]): Seq[(Long, Long)] = {
    val parent = mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) {
        val nxt = parent.getOrElse(c, c); parent.update(c, r); c = nxt
      }
      r
    }
    pairs.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra != rb) {
        // union by MIN root so the representative is the component min
        if (ra < rb) parent.update(rb, ra) else parent.update(ra, rb)
      }
    }
    val nodes = mutable.HashSet.empty[Long]
    pairs.foreach { case (a, b) => nodes += a; nodes += b }
    nodes.toSeq.map(n => n -> find(n))
  }
}
