package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over embeddings (SURVEY.md §2.4 i, Q34).
  *
  * Two plans, same semantics:
  *  - brute-force: scan all vectors, cosine against a broadcast query vector,
  *    global top-k via TakeOrderedAndProject — the exact baseline. At 100 TB
  *    this is one pass over the data with no shuffle (top-k is partial).
  *  - IVF: centroids per cluster (label = the coarse quantizer here),
  *    pick the nearest centroid to the query, then scan ONLY that cluster —
  *    the scale path: the probe turns a full scan into a partition-pruned
  *    scan when the table is partitioned by cluster id.
  *
  * Dot products use the native codegen'd `vec_cosine` expression
  * (functions.VectorExpressions) — same sequential double arithmetic as
  * the DuckDB oracle, but a tight JIT'd loop instead of the interpreted
  * per-element lambda path HigherOrderFunction falls back to.
  */
object SimilarityQueries extends QuerySet {

  /** Cosine similarity between two ARRAY<FLOAT> columns, in double. */
  private def cosine(a: Column, b: Column): Column =
    graft.functions.VecOps.vec_cosine(a, b)

  private def queryVec(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings").filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"))

  val queries: Map[String, Q] = Map(
    // Q34: brute-force cosine top-k against the vec_id=0 query vector.
    "q34_cosine_topk" -> { (s, dir) =>
      t(s, dir, "embeddings").filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(queryVec(s, dir)))
        .select(col("vec_id"),
          r6(cosine(col("embedding"), col("qe"))).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .limit(10)
    },

    // Q34c: k-NN JOIN — top-3 neighbors for EVERY label-0 query vector in
    // one plan: block the corpus by sign-LSH bucket (same key family as
    // the near-dup op), join queries to their bucket only, rank within
    // query. At scale this is the shuffle-partitioned batch-ANN shape: no
    // all-pairs, each query compares against its bucket. bits pinned to 8
    // because the DuckDB oracle hardcodes the 8-bit key (at fixture scale
    // the auto default resolves to 8 anyway); operator callers get the
    // self-scaling default via [[knnJoin]].
    "q34c_knn_join" -> { (s, dir) => knnJoin(s, dir, bits = Some(8)) },

    // Q34b: IVF probe — nearest centroid first, then exact cosine inside
    // that cluster only. Centroids computed in long (label, pos, v) format
    // so the aggregation scales to any dimensionality.
    "q34b_ann_ivf" -> { (s, dir) => ivf(s, dir, probes = 1) },

    // Q34d: MULTI-probe IVF — scan the top-2 centroids' clusters (union via
    // a 2-row broadcast semi-side). Single-probe recall falls off at scale
    // (a query near a Voronoi boundary misses neighbors in the runner-up
    // cell); probing p cells multiplies scanned fraction by ~p/K while
    // recovering most boundary misses — the standard IVF recall knob
    // (SCALE.md §ANN). Same plan shape: probe count only widens the
    // broadcast, never adds a shuffle.
    "q34d_ann_multiprobe" -> { (s, dir) => ivf(s, dir, probes = 2) },

    // Q34e: product-quantized ANN (operators/PqIndex): 8×16 codebooks
    // PINNED as a parquet fixture (trained once on the sf0.01 corpus by
    // tools.MakeFixtures, committed — codebooks are a model, valid at any
    // sf), encode the corpus to 8 4-bit codes + a norm (64 floats → 4
    // packed bytes of codes at scale), score by ADC table lookup (native
    // pq_adc expression), exact-rerank the top-50 ADC survivors with true
    // cosine, report top-10. Because the codebooks are data, the DuckDB
    // oracle re-derives the WHOLE pipeline — code assignment, ADC table,
    // shortlist, exact rerank — as static SQL over the same fixture, so
    // this query gets a full rows+schema+hash CORRECTNESS entry (round-5
    // VERDICT item #1). PqSpec still pins recall/self-retrieval/
    // determinism invariants on a freshly-trained index.
    "q34e_pq_ann" -> { (s, dir) =>
      import graft.operators.PqIndex
      val e = t(s, dir, "embeddings")
      val cb = PqIndex.load(s, graft.Fixtures.pqCodebooks)
      val q = e.filter(col("vec_id") === 0).select(col("embedding"))
        .head().getSeq[Float](0).map(_.toDouble).toArray
      val corpus = e.filter(col("vec_id") =!= 0)
      // ADC shortlist (cheap scan over codes), then exact rerank of the
      // shortlist only — the standard PQ serving shape: full-precision
      // vectors are touched for 50 rows, not the corpus
      val shortlist = PqIndex.query(PqIndex.encode(corpus, cb), cb, q, 50)
        .select(col("vec_id"))
      corpus.join(broadcast(shortlist), Seq("vec_id"))
        .crossJoin(broadcast(queryVec(s, dir)))
        .select(col("vec_id"),
          r6(cosine(col("embedding"), col("qe"))).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .limit(10)
    },

    // Johnson-Lindenstrauss random projection 64 → 16 dims — embedding
    // COMPRESSION for the ANN pre-filter tier (4× less memory/bandwidth
    // per vector; JL: pairwise angles survive a random linear map with
    // additive distortion ~1/sqrt(k)). The matrix is an Achlioptas-style
    // ±1 SIGN matrix (provably JL-equivalent to Gaussian) generated by a
    // DETERMINISTIC quadratic integer hash of the cell index — measured
    // mid-Gaussian-seed quality on the fixture (cos MAE 0.151 vs true
    // Gaussian seeds' 0.170-0.237; a plain LCG cell hash's lattice
    // structure cost 0.36 and was rejected) — so there is NO model
    // artifact to train, ship, or version: any executor on any cluster
    // regenerates the same matrix inside whole-stage codegen. Map-only,
    // zero shuffle at any corpus size. Each projected coordinate is a sum
    // of per-term micro-quantized ±e_i (exact integer math, engine-
    // independent); cos_exact vs cos_proj on every row exposes the
    // preservation the JL bound promises (the ~1/sqrt(16) distortion is
    // visibly there — within-query observability, not a separate eval).
    // Projection + projected-space dot run as the native codegen'd
    // vec_project / vec_dot_long expressions (functions/
    // VectorExpressions.scala) — same integer matrix and fold order as
    // the previous 16×64-term HigherOrderFunction formulation (the
    // round-8 perf-weak flag: ~1024 interpreted lambda evaluations per
    // row), so the oracle SQL below is unchanged.
    "q_embed_project" -> { (s, dir) =>
      import graft.functions.VecOps.{vec_dot_long, vec_project}
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qe"),
          vec_project(col("embedding"), 16).as("qp"))
      e.filter(col("vec_id") =!= 0)
        .withColumn("pp", vec_project(col("embedding"), 16))
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          array_join(col("pp").cast("array<string>"), ",").as("proj_micro"),
          r6(cosine(col("embedding"), col("qe"))).as("cos_exact"),
          r6(vec_dot_long(col("pp"), col("qp")) /
            (sqrt(vec_dot_long(col("pp"), col("pp"))) *
              sqrt(vec_dot_long(col("qp"), col("qp")))))
            .as("cos_proj"))
        .orderBy(col("vec_id"))
    },

    // PCA projection against PINNED components (the PQ-codebook pattern:
    // the model is trained once by tools.MakeFixtures on the sf0.01
    // corpus — operators/Pca.scala's one-pass moments + deterministic
    // sign-normalized power iteration — committed as parquet, so the
    // DuckDB oracle re-derives the projection as static SQL and PCA's
    // MATH gets the rows+schema+hash gate, not just PcaSpec's
    // closed-form fixtures). Centering uses the STORED scalar
    // Σ u_i·mean_i, so the only cross-engine arithmetic is the dot
    // product (the vec_dot / list_sum canon). Scale shape: the
    // component table is model-sized (k rows) and broadcast; the
    // projection is map-only over the corpus — the same
    // stacks-onto-any-scan-for-free property Pca.project documents,
    // here in long (vec_id, m) form so k never widens the schema.
    "q_pca_project" -> { (s, dir) =>
      import graft.functions.VecOps
      val comps = s.read.parquet(graft.Fixtures.pcaComponents)
        .select(col("m"), col("component"), col("center"))
      t(s, dir, "embeddings")
        .crossJoin(broadcast(comps))
        .select(col("vec_id"), col("m"),
          micro(VecOps.vec_dot(col("embedding"), col("component"))
            - col("center")).as("pc_micro"))
        .orderBy(col("vec_id"), col("m"))
    },

    // k-NN CLASSIFIER serving — the label-assignment op on top of the
    // q34c batch k-NN join: every label-0 query vector takes the
    // MAJORITY label of its top-3 bucket neighbors (ties break to the
    // smaller label via the max-struct trick — deterministic on both
    // engines), with the winner's best cosine as the confidence
    // surface. Composes the existing bucketed join (no new shuffle
    // shape: the vote is one neighbor-sized aggregate + a per-query
    // argmax; the label side is model-sized → broadcast).
    "q_knn_classifier" -> { (s, dir) =>
      val nn = knnJoin(s, dir, bits = Some(8))
      val lbl = t(s, dir, "embeddings")
        .select(col("vec_id").as("c_id"), col("label"))
      nn.join(broadcast(lbl), Seq("c_id"))
        .groupBy(col("q_id"), col("label"))
        .agg(count(lit(1)).as("votes"), max(col("cos_sim")).as("best_cos"))
        .groupBy(col("q_id"))
        .agg(max(struct(col("votes"), (-col("label")).as("nl"),
          col("best_cos"))).as("w"))
        .select(col("q_id"),
          (-col("w.nl")).as("pred_label"),
          col("w.votes").as("votes"),
          col("w.best_cos").as("best_cos"))
        .orderBy(col("q_id"))
    },

    // Q34f: int8 SCALAR-quantized ANN (SQ8) — the memory tier between
    // full-precision (4 bytes/dim) and PQ (0.5 byte/dim): per-vector
    // scale = max|v|/127, code_i = round(v_i/scale) ∈ [−127,127], so a
    // 64-dim float32 vector becomes 64 bytes + one float — 4× less scan
    // bandwidth with far better fidelity than PQ's 16-way codebooks.
    // Serving shape (same as q34e): ADC-score the whole corpus over the
    // CODES ONLY (the int dot is exact int64; the scale/norm correction
    // is 3 fp ops in a fixed order), shortlist top-50, exact-rerank with
    // true cosine, report top-10 — full-precision vectors are touched
    // for 50 rows, not the corpus. Unlike PQ there is NO trained model:
    // the quantizer is closed-form per vector, so any executor encodes
    // any shard independently (map-only encode, zero shuffle) and the
    // DuckDB oracle re-derives the whole pipeline as static SQL.
    "q34f_sq8_ann" -> { (s, dir) =>
      val enc = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"),
          (expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))")
            / 127.0).as("scale"),
          graft.functions.VecOps.vec_norm(col("embedding")).as("nrm"))
        // an all-zero vector has scale 0 → 0/0 codes whose NaN/NULL
        // handling differs between engines; it also has no direction,
        // so cosine search excludes it deterministically on both sides
        .filter(col("scale") > 0.0)
        .withColumn("code", expr("transform(embedding, x -> " +
          "CAST(floor(CAST(x AS DOUBLE) / scale + 0.5D) AS BIGINT))"))
      val q = enc.filter(col("vec_id") === 0)
        .select(col("code").as("qc"), col("scale").as("qs"),
          col("nrm").as("qn"), col("embedding").as("qe"))
      val adc = enc.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("embedding"), col("qe"),
          micro(expr("aggregate(zip_with(code, qc, (a, b) -> a * b), " +
            "CAST(0 AS BIGINT), (acc, x) -> acc + x)").cast("double")
            * col("scale") * col("qs") / (col("nrm") * col("qn")))
            .as("sq_cos_micro"))
      adc.orderBy(col("sq_cos_micro").desc, col("vec_id")).limit(50)
        .select(col("vec_id"), col("sq_cos_micro"),
          r6(cosine(col("embedding"), col("qe"))).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .limit(10)
    },

    // EMBEDDING DRIFT per group — "which sources' embedding mass points
    // away from the corpus": cosine between each label's centroid and
    // the GLOBAL centroid. Cosine is scale-invariant, so centroids are
    // never divided by their counts — the comparison runs on the
    // integer SUM vectors directly, and every element is micro-floored
    // to int64 BEFORE summation, making the per-(label, dim) sums exact
    // and summation-order-free on both engines; the three final
    // reductions (dot, |a|², |b|²) run in DECIMAL(38,0) (DuckDB
    // HUGEINT) — exact integers converted to double ONCE in a fixed-
    // order formula. Scale shape: aggregate-first — the only data-sized
    // stage is one (label, dim) hash agg (map-combinable int sums, 64
    // rows per label out); the global centroid derives from that
    // catalog-sized rollup and broadcasts back. The monitoring
    // counterpart of q_dedup_semdedup's cluster geometry.
    "q_embed_drift" -> { (s, dir) =>
      import org.apache.spark.sql.types.DecimalType
      val d38 = DecimalType(38, 0)
      val el = t(s, dir, "embeddings")
        .select(col("label"),
          posexplode(col("embedding")).as(Seq("dim", "v")))
        .select(col("label"), col("dim"),
          floor(col("v").cast("double") * 1000000.0 + 0.5)
            .cast("long").as("vi"))
      val byLabel = el.groupBy(col("label"), col("dim"))
        .agg(sum(col("vi")).as("sv"))
      val global = byLabel.groupBy(col("dim")).agg(sum(col("sv")).as("gv"))
      val stats = byLabel
        .join(broadcast(global), Seq("dim")) // 64-row centroid side
        .groupBy(col("label"))
        .agg(sum(col("sv").cast(d38) * col("gv").cast(d38)).as("dot"),
          sum(col("sv").cast(d38) * col("sv").cast(d38)).as("na2"),
          sum(col("gv").cast(d38) * col("gv").cast(d38)).as("nb2"))
      val nv = t(s, dir, "embeddings").groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"))
      stats.join(nv, Seq("label"))
        .select(col("label"), col("n_vecs"),
          micro(col("dot").cast("double") /
            (sqrt(col("na2").cast("double")) *
              sqrt(col("nb2").cast("double")))).as("cos_global_micro"))
        .orderBy(col("label"))
    }
  )

  /** The q34c plan with a parameterized sign-LSH bucket width — public so
    * operator callers and ScaleBench get the self-scaling default
    * (SignLsh.bitsFor ≈ log2(corpus/32), the SCALE.md §9 measured fix for
    * fixed-width bucket growth); bits=Some(8) IS the oracle-checked
    * q34c_knn_join. */
  def knnJoin(s: SparkSession, dir: String,
      bits: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.SignLsh
    val b = bits.getOrElse(
      SignLsh.autoBits(s"$dir/embeddings", t(s, dir, "embeddings")))
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"),
        SignLsh.bucketExpr(col("embedding"), b).as("bucket"))
    val queries = e.filter(col("label") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
        col("bucket"))
    val corpus = e.filter(col("label") =!= 0)
      .select(col("vec_id").as("c_id"), col("embedding").as("ce"),
        col("bucket"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("c_id"))
    queries.join(corpus, Seq("bucket"))
      .select(col("q_id"), col("c_id"),
        r6(cosine(col("qe"), col("ce"))).as("cos_sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("q_id"), col("rk"), col("c_id"), col("cos_sim"))
      .orderBy(col("q_id"), col("rk"))
  }

  /** IVF ANN: rank centroids by query dot product, scan the top-`probes`
    * clusters only, exact cosine + global top-10 inside the probed set. */
  private def ivf(s: SparkSession, dir: String, probes: Int): DataFrame = {
    val e = t(s, dir, "embeddings")
    val centLong = e
      .select(col("label"), posexplode(col("embedding")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("col").cast("double")).as("cv"))
    val qLong = queryVec(s, dir)
      .select(posexplode(col("qe")))
      .select(col("pos"), col("col").cast("double").as("qv"))
    val probeLabels = centLong.join(broadcast(qLong), Seq("pos"))
      .groupBy(col("label"))
      .agg(sum(col("cv") * col("qv")).as("ip"))
      .orderBy(col("ip").desc, col("label"))
      .limit(probes)
      .select(col("label"))
    e.filter(col("vec_id") =!= 0)
      .join(broadcast(probeLabels), Seq("label"))
      .crossJoin(broadcast(queryVec(s, dir)))
      .select(col("vec_id"), col("label"),
        r6(cosine(col("embedding"), col("qe"))).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(10)
  }

  /** The ONE duck-side copy of the 8-bit-bucket k-NN candidate/rank CTE
    * chain (shared by q34c_knn_join and q_knn_classifier). */
  private val knnCtes: String =
    """WITH e AS (
      |  SELECT vec_id, embedding, label,
      |    (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
      |    + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END)
      |    + (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END)
      |    + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END)
      |    + (CASE WHEN embedding[5] >= 0 THEN 16 ELSE 0 END)
      |    + (CASE WHEN embedding[6] >= 0 THEN 32 ELSE 0 END)
      |    + (CASE WHEN embedding[7] >= 0 THEN 64 ELSE 0 END)
      |    + (CASE WHEN embedding[8] >= 0 THEN 128 ELSE 0 END) AS bucket
      |  FROM embeddings),
      |pairs AS (
      |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
      |    round(list_sum(list_transform(list_zip(q.embedding, c.embedding),
      |            p -> p[1]::DOUBLE * p[2]::DOUBLE))
      |      / (sqrt(list_sum(list_transform(q.embedding, x -> x::DOUBLE * x::DOUBLE)))
      |         * sqrt(list_sum(list_transform(c.embedding, x -> x::DOUBLE * x::DOUBLE)))), 6) AS cos_sim
      |  FROM e q JOIN e c ON q.bucket = c.bucket
      |  WHERE q.label = 0 AND c.label <> 0),
      |ranked AS (
      |  SELECT q_id, c_id, cos_sim,
      |         row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS rk
      |  FROM pairs)""".stripMargin

  private val cosSql =
    """round(list_sum(list_transform(list_zip(e.embedding, q.qe),
      |        p -> p[1]::DOUBLE * p[2]::DOUBLE))
      |  / (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))
      |     * sqrt(list_sum(list_transform(q.qe, x -> x::DOUBLE * x::DOUBLE)))), 6)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q34_cosine_topk" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, $cosSql AS cos_sim
         |FROM embeddings e, q WHERE e.vec_id <> 0
         |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,

    // identical integer matrix + per-term micro floor; the projected-space
    // cosine mirrors cosSql's shape over the int lists
    "q_embed_project" ->
      s"""WITH pr AS (
         |  SELECT vec_id, embedding,
         |    list_transform(range(0, 16), j ->
         |      CAST(list_sum(list_transform(range(1, 65), i ->
         |        CAST(floor(CAST(embedding[i] AS DOUBLE) *
         |          (1 - 2 * ((((j * 64 + i) * (j * 64 + i) * 48271 +
         |            (j * 64 + i) * 2654435761 + 7) % 1000003) % 2))
         |          * 1000000.0 + 0.5) AS BIGINT))) AS BIGINT)) AS pp
         |  FROM embeddings),
         |q AS (SELECT embedding AS qe, pp AS qp FROM pr WHERE vec_id = 0)
         |SELECT e.vec_id,
         |  array_to_string(list_transform(e.pp, x -> CAST(x AS VARCHAR)), ',')
         |    AS proj_micro,
         |  $cosSql AS cos_exact,
         |  round(list_sum(list_transform(list_zip(e.pp, q.qp),
         |          p -> p[1]::DOUBLE * p[2]::DOUBLE))
         |    / (sqrt(list_sum(list_transform(e.pp, x -> x::DOUBLE * x::DOUBLE)))
         |       * sqrt(list_sum(list_transform(q.qp, x -> x::DOUBLE * x::DOUBLE)))), 6)
         |    AS cos_proj
         |FROM pr e, q WHERE e.vec_id <> 0
         |ORDER BY e.vec_id""".stripMargin,

    // the projection re-derived from the pinned component fixture; the
    // stored center is subtracted verbatim (never re-derived), so the
    // only live arithmetic is the list_sum dot — the cosSql canon
    "q_pca_project" ->
      s"""WITH c AS (SELECT m, component, center
         |           FROM read_parquet('${graft.Fixtures.pcaComponents}'))
         |SELECT e.vec_id, c.m,
         |  CAST(floor((list_sum(list_transform(list_zip(e.embedding, c.component),
         |        p -> p[1]::DOUBLE * p[2]::DOUBLE)) - c.center)
         |      * 1000000.0 + 0.5) AS BIGINT) AS pc_micro
         |FROM embeddings e, c
         |ORDER BY e.vec_id, c.m""".stripMargin,

    "q34c_knn_join" ->
      s"""$knnCtes
        |SELECT q_id, rk, c_id, cos_sim FROM ranked WHERE rk <= 3
        |ORDER BY q_id, rk""".stripMargin,

    // the q34c neighbor set → per-(query, label) votes → (votes DESC,
    // label ASC) winner — the same tie rule the Spark max-struct encodes
    "q_knn_classifier" ->
      s"""$knnCtes,
        |nn AS (SELECT q_id, c_id, cos_sim FROM ranked WHERE rk <= 3),
        |v AS (
        |  SELECT nn.q_id, e.label, CAST(count(*) AS BIGINT) AS votes,
        |         max(nn.cos_sim) AS best_cos
        |  FROM nn JOIN e ON e.vec_id = nn.c_id
        |  GROUP BY nn.q_id, e.label),
        |w AS (
        |  SELECT q_id, label, votes, best_cos,
        |         row_number() OVER (PARTITION BY q_id
        |           ORDER BY votes DESC, label ASC) AS wr
        |  FROM v)
        |SELECT q_id, CAST(label AS INT) AS pred_label, votes, best_cos
        |FROM w WHERE wr = 1 ORDER BY q_id""".stripMargin,

    "q34b_ann_ivf" -> ivfSql(1),
    "q34d_ann_multiprobe" -> ivfSql(2),

    // Full PQ pipeline re-derived from the pinned codebook fixture
    // (m=8, subDim=8, d=64): code assignment = argmax(ip - half_nc2) with
    // ties to the higher code id (row_number ... ORDER BY s DESC, ki DESC
    // mirrors the Spark array_max-over-struct tie-break); ADC sum is forced
    // into mi order via list(ip ORDER BY mi) to match the sequential
    // native pq_adc expression bit-for-bit; then the same top-50 shortlist
    // + exact-cosine rerank as the Spark plan.
    "q34e_pq_ann" ->
      s"""WITH cb AS (SELECT mi, ki, centroid, half_nc2
         |           FROM read_parquet('${graft.Fixtures.pqCodebooks}')),
         |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |corp AS (
         |  SELECT vec_id, embedding,
         |         sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
         |  FROM embeddings WHERE vec_id <> 0),
         |scores AS (
         |  SELECT c.vec_id, cb.mi, cb.ki,
         |         list_sum(list_transform(range(1, 9), i ->
         |           c.embedding[cb.mi * 8 + i]::DOUBLE * cb.centroid[i])) - cb.half_nc2 AS s
         |  FROM corp c CROSS JOIN cb),
         |codes AS (
         |  SELECT vec_id, mi, ki AS code FROM (
         |    SELECT vec_id, mi, ki,
         |           row_number() OVER (PARTITION BY vec_id, mi ORDER BY s DESC, ki DESC) AS rk
         |    FROM scores) WHERE rk = 1),
         |adc AS (
         |  SELECT cb.mi, cb.ki,
         |         list_sum(list_transform(range(1, 9), i ->
         |           q.qe[cb.mi * 8 + i]::DOUBLE * cb.centroid[i])) AS ip
         |  FROM cb, q),
         |qn AS (SELECT sqrt(list_sum(list_transform(qe, x -> x::DOUBLE * x::DOUBLE))) AS qn FROM q),
         |scored AS (
         |  SELECT co.vec_id,
         |         round(list_sum(list(a.ip ORDER BY a.mi)) / (qn.qn * corp.nrm), 6) AS pq_sim
         |  FROM codes co
         |  JOIN adc a ON a.mi = co.mi AND a.ki = co.code
         |  JOIN corp ON corp.vec_id = co.vec_id, qn
         |  GROUP BY co.vec_id, qn.qn, corp.nrm),
         |shortlist AS (SELECT vec_id FROM scored ORDER BY pq_sim DESC, vec_id LIMIT 50)
         |SELECT e.vec_id, $cosSql AS cos_sim
         |FROM embeddings e JOIN shortlist USING (vec_id), q
         |WHERE e.vec_id <> 0
         |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,

    // closed-form per-vector quantizer re-derived as static SQL: int64
    // code dot (exact), 3 fixed-order fp ops for the scale/norm
    // correction, shortlist, exact-cosine rerank — same pipeline shape
    // as the Spark plan, term for term
    "q34f_sq8_ann" ->
      """WITH enc AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
        |      / 127.0 AS scale,
        |    sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)))
        |      AS nrm
        |  FROM embeddings),
        |codes AS (
        |  SELECT vec_id, embedding, scale, nrm,
        |    list_transform(embedding, x ->
        |      CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT)) AS code
        |  FROM enc WHERE scale > 0),
        |q AS (SELECT code AS qc, scale AS qs, nrm AS qn, embedding AS qe
        |      FROM codes WHERE vec_id = 0),
        |adc AS (
        |  SELECT c.vec_id, c.embedding, q.qe,
        |    CAST(floor(
        |      CAST(list_sum(list_transform(range(1, 65),
        |        i -> c.code[i] * q.qc[i])) AS DOUBLE)
        |      * c.scale * q.qs / (c.nrm * q.qn) * 1000000.0 + 0.5) AS BIGINT)
        |      AS sq_cos_micro
        |  FROM codes c, q WHERE c.vec_id <> 0),
        |short AS (SELECT * FROM adc
        |          ORDER BY sq_cos_micro DESC, vec_id LIMIT 50)
        |SELECT vec_id, sq_cos_micro,
        |  round(list_sum(list_transform(list_zip(embedding, qe),
        |          p -> p[1]::DOUBLE * p[2]::DOUBLE))
        |    / (sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)))
        |       * sqrt(list_sum(list_transform(qe, x -> x::DOUBLE * x::DOUBLE)))), 6)
        |    AS cos_sim
        |FROM short ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,

    // same micro-floored element integers, HUGEINT (=Spark DECIMAL(38,0))
    // exact reductions, one fixed-order double formula
    "q_embed_drift" ->
      """WITH el AS (
        |  SELECT label, i AS dim,
        |    CAST(floor(embedding[i]::DOUBLE * 1000000.0 + 0.5) AS BIGINT)
        |      AS vi
        |  FROM embeddings, (SELECT unnest(range(1, 65)) AS i) ii),
        |bl AS (SELECT label, dim, CAST(sum(vi) AS BIGINT) AS sv
        |       FROM el GROUP BY label, dim),
        |gl AS (SELECT dim, CAST(sum(sv) AS BIGINT) AS gv
        |       FROM bl GROUP BY dim),
        |st AS (
        |  SELECT label,
        |    sum(CAST(sv AS HUGEINT) * CAST(gv AS HUGEINT)) AS dot,
        |    sum(CAST(sv AS HUGEINT) * CAST(sv AS HUGEINT)) AS na2,
        |    sum(CAST(gv AS HUGEINT) * CAST(gv AS HUGEINT)) AS nb2
        |  FROM bl JOIN gl USING (dim) GROUP BY label),
        |nv AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vecs
        |       FROM embeddings GROUP BY label)
        |SELECT s.label, n.n_vecs,
        |  CAST(floor(CAST(dot AS DOUBLE) /
        |    (sqrt(CAST(na2 AS DOUBLE)) * sqrt(CAST(nb2 AS DOUBLE)))
        |    * 1000000.0 + 0.5) AS BIGINT) AS cos_global_micro
        |FROM st s JOIN nv n ON n.label = s.label
        |ORDER BY s.label""".stripMargin
  )

  private def ivfSql(probes: Int): String =
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |cent AS (
       |  SELECT label, i AS pos, avg(embedding[i]::DOUBLE) AS cv
       |  FROM embeddings, (SELECT unnest(range(1, 65)) AS i) ii
       |  GROUP BY label, i),
       |best AS (
       |  SELECT c.label
       |  FROM cent c JOIN (SELECT i AS pos, qe[i]::DOUBLE AS qv
       |                    FROM q, (SELECT unnest(range(1, 65)) AS i) ii) qq
       |    ON qq.pos = c.pos
       |  GROUP BY c.label
       |  ORDER BY sum(c.cv * qq.qv) DESC, c.label LIMIT $probes)
       |SELECT e.vec_id, e.label, $cosSql AS cos_sim
       |FROM embeddings e JOIN best USING (label), q
       |WHERE e.vec_id <> 0
       |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin
}
