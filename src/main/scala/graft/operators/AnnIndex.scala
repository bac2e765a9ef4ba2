package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent IVF ANN index: trained coarse quantizer + inverted lists
  * materialized as partition directories.
  *
  * Unlike the in-plan IVF queries (q34b/q34d, which reuse the dataset's
  * `label` column as the quantizer for cross-engine oracle parity), the
  * index TRAINS its own spherical k-means centroids — class labels are not
  * geometric clusters, and recall@10 shows it: label-quantized probes reach
  * ~0.14 (1 probe) / ~0.23 (2 probes) at sf0.1, trained centroids several
  * times that (AnnRecallSpec; numbers in SCALE.md §5).
  *
  * Scale shape (the 100 TB grade):
  *  - TRAIN: `iters` Lloyd rounds; each round broadcasts K×dim centroid
  *    literals into a map-only assignment pass, then one groupBy(list)
  *    shuffle for the means. Centroids (K×dim doubles) collect to the
  *    driver — that is the model, the same thing every distributed k-means
  *    collects; never data rows.
  *  - BUILD: corpus written `partitionBy(list)` — one shuffle, each
  *    inverted list a partition directory with bounded files.
  *  - QUERY: centroid ranking is driver math on the tiny centroid table;
  *    the probe becomes `list IN (...)` — STATIC partition pruning, so the
  *    scan touches only p of K directories (AnnPartitionSpec proves it).
  *    The probes knob widens the IN-list, never adds a shuffle.
  */
object AnnIndex {

  /** Inner product of an embedding column with a literal vector — native
    * codegen'd expression (functions.VectorExpressions); float×double
    * element widths handled inside, arithmetic identical to the HOF
    * formulation it replaced. */
  private def ipLit(emb: Column, q: Seq[Double]): Column =
    graft.functions.VecOps.vec_dot(emb, typedLit(q))

  private def dot(x: Column, y: Column): Column =
    graft.functions.VecOps.vec_dot(x, y)

  private def nrm(x: Column): Column =
    graft.functions.VecOps.vec_norm(x)

  private def normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0) v else v.map(_ / n)
  }

  /** Nearest-centroid id by inner product (argmax over K struct literals —
    * map-only, no join; ip ties break toward the higher id, deterministic).
    * Centroids are L2-normalized, so argmax ip == argmax cosine. */
  def assignExpr(cents: Array[Array[Double]], emb: Column): Column = {
    val scored = cents.zipWithIndex.map { case (c, i) =>
      struct(ipLit(emb, c.toSeq).as("ip"), lit(i).as("id"))
    }
    array_max(array(scala.collection.immutable.ArraySeq.unsafeWrapArray(scored): _*)).getField("id")
  }

  /** Nearest-centroid id via a BROADCAST JOIN against a centroid TABLE —
    * the large-K handover from [[assignExpr]] (SCALE.md §9.6 named it):
    * the literal argmax embeds all K·d centroid coefficients in the
    * expression tree — map-only and ideal up to a few hundred centroids,
    * but the plan (and its codegen) grows linearly in K, and at K≈1000+,
    * d=64 it carries ~64k literals. This form keeps centroids as DATA
    * (K rows, broadcast), fans out K scored rows per vector, and takes
    * the per-vector argmax as max(struct(ip, cid)) — the same O(n·K·d)
    * dot cost, bounded codegen, and the shuffle carries corpus-sized
    * (key, best-so-far) PARTIALS, never the corpus×K fan-out (hash-agg
    * partials collapse per map task). Tie-break matches assignExpr
    * (higher cid wins at equal ip — struct comparison is lexicographic),
    * and the score is the same VecOps.dot, so the two paths agree bit
    * for bit (AnnRecallSpec pins the equality on a trained quantizer).
    * Non-key columns ride along via first(): every fan-out row of a key
    * carries identical copies, so the pick is value-deterministic.
    *
    * PRECONDITION: `keyCol` must be UNIQUE in `corpus` (vec_id is, on
    * every caller path). With duplicate keys the groupBy would collapse
    * the copies to one arbitrary row — first() is value-deterministic
    * only because all fan-out rows of a unique key are identical. A
    * caller deduplicates (or synthesizes a unique key) before assigning,
    * exactly as it would before any per-item argmax. */
  def assignJoin(corpus: DataFrame, cents: Array[Array[Double]],
      embCol: String, keyCol: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val s = corpus.sparkSession
    val schema = StructType(Seq(
      StructField("__cid", IntegerType, nullable = false),
      StructField("__cvec", ArrayType(DoubleType, containsNull = false),
        nullable = false)))
    val rows = cents.zipWithIndex.map { case (c, i) =>
      Row(i, c.toSeq) }.toSeq
    val centsDF = s.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
    val others = corpus.columns.filterNot(_ == keyCol).toSeq
    corpus.crossJoin(broadcast(centsDF))
      .withColumn("__ip", dot(col(embCol), col("__cvec")))
      .groupBy(col(keyCol))
      .agg(max(struct(col("__ip"), col("__cid"))).getField("__cid")
        .as("cid"),
        others.map(c => first(col(c)).as(c)): _*)
  }

  /** Spherical k-means coarse quantizer. Deterministic hash-spread init
    * (no global sort), `iters` Lloyd rounds, centroids re-normalized each
    * round. Returns the surviving centroids (an emptied cluster drops out,
    * so the result may have fewer than `k` rows). */
  /** Above this centroid count the literal argmax hands over to
    * [[assignJoin]] — in TRAINING rounds as well as final assignment
    * (review catch: raising semDedupScaled's k clamp without switching
    * the Lloyd rounds would re-embed k·d literals per round, the exact
    * plan/codegen blowup the old 256 clamp existed to avoid). */
  val JoinAssignThreshold = 384

  /** (cluster id, embedding) by whichever argmax path fits k — the one
    * dispatch both training rounds and callers share. */
  private def assignedPairs(e: DataFrame,
      cents: Array[Array[Double]]): DataFrame =
    if (cents.length > JoinAssignThreshold)
      assignJoin(e.select(col("vec_id"), col("embedding")), cents,
        "embedding", "vec_id")
        .select(col("cid").as("list"), col("embedding"))
    else
      e.select(assignExpr(cents, col("embedding")).as("list"),
        col("embedding"))

  def train(e: DataFrame, k: Int = 16, iters: Int = 5): Array[Array[Double]] = {
    val n = e.count()
    require(n >= k, s"need at least $k vectors, got $n")
    // deterministic hash-spread seeds, independent of id density/offsets
    // (a modulo filter would under-seed sparse id spaces): order by a
    // stable hash of the id and take k — TakeOrdered, partial top-k per
    // partition, never a full global sort
    var cents: Array[Array[Double]] = e
      .select(col("vec_id"), col("embedding"))
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(k)
      .collect()
      .map(r => normalize(r.getSeq[Float](1).map(_.toDouble).toArray))
    (1 to iters).foreach { _ =>
      val means = assignedPairs(e, cents)
        .withColumn("d", nrm(col("embedding")))
        .select(col("list"),
          posexplode(transform(col("embedding"),
            v => v.cast("double") / col("d"))))
        .groupBy(col("list"), col("pos")).agg(avg(col("col")).as("m"))
        .groupBy(col("list"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("centroid"))
        .collect()
      cents = means
        .sortBy(_.getInt(0))
        .map(r => normalize(r.getSeq[Double](1).toArray))
    }
    cents
  }

  /** Build the index under `path`: train the quantizer, write the corpus
    * partitioned by inverted list, persist the centroids. */
  def build(e: DataFrame, path: String, k: Int = 16, iters: Int = 5): Unit = {
    val cents = train(e, k, iters)
    e.withColumn("list", assignExpr(cents, col("embedding")))
      // one shuffle by list id: each inverted list is written by one task
      .repartition(col("list"))
      .write.mode("overwrite").partitionBy("list").parquet(s"$path/lists")
    val spark = e.sparkSession
    import spark.implicits._
    cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("list", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Top-`probes` inverted-list ids for a query vector: driver math over
    * the tiny persisted centroid table (index metadata, not data). */
  def probeLists(spark: SparkSession, path: String, q: Array[Float],
      probes: Int): Seq[Int] =
    spark.read.parquet(s"$path/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
      .map { case (id, c) =>
        (id, c.zip(q).map { case (cv, qv) => cv * qv }.sum) }
      .sortBy { case (id, ip) => (-ip, id) }
      .take(probes).map(_._1).toSeq

  /** Exact cosine top-k inside the probed lists only; the `isin` predicate
    * is a literal at planning time, so the scan statically prunes to the
    * probed `list=` partition directories. */
  def query(spark: SparkSession, path: String, q: Array[Float], probes: Int,
      k: Int): DataFrame = {
    val lists = probeLists(spark, path, q, probes)
    val qd = q.map(_.toDouble).toSeq
    val qn = math.sqrt(qd.map(v => v * v).sum)
    spark.read.parquet(s"$path/lists")
      .filter(col("list").isin(lists: _*))
      .select(col("vec_id"), col("list"),
        round(ipLit(col("embedding"), qd) / (nrm(col("embedding")) * lit(qn)),
          6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** IVF-PQ: [[build]] plus product-quantization codes INSIDE the
    * partitioned lists — the composition every production vector store
    * runs (FAISS IVFPQ). The inverted-list partitioning prunes WHICH
    * directories are read; the PQ codes shrink WHAT is read from them:
    * the ADC scan touches only (vec_id, codes, nrm) — at scale a few
    * bytes per row instead of the full vector — and the full-precision
    * `embedding` column is read for the shortlist rows only.
    * IvfPqSpec asserts both prunings on the physical plan. */
  def buildPq(e: DataFrame, path: String, k: Int = 8, iters: Int = 5,
      m: Int = 8, codeBits: Int = 16): Unit = {
    build(e, path, k, iters)
    val cb = PqIndex.train(e, m, codeBits)
    val spark = e.sparkSession
    import spark.implicits._
    // re-read the just-written lists so codes align with the persisted
    // assignment (a re-train of the coarse quantizer could flip a
    // boundary row)
    spark.read.parquet(s"$path/lists")
      .withColumn("codes", PqIndex.codesExpr(cb, col("embedding")))
      .withColumn("nrm", nrm(col("embedding")))
      .repartition(col("list"))
      .write.mode("overwrite").partitionBy("list").parquet(s"$path/pq_lists")
    cb.books.zipWithIndex.flatMap { case (book, mi) =>
      book.zipWithIndex.map { case (c, ki) => (mi, ki, c.toSeq) }
    }.toSeq.toDF("m", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
  }

  /** Rehydrate the persisted PQ codebooks (index metadata, driver-side). */
  def loadCodebooks(spark: SparkSession, path: String): PqIndex.Codebooks = {
    val rows = spark.read.parquet(s"$path/codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val m = rows.map(_._1).max + 1
    val k = rows.map(_._2).max + 1
    val books = Array.tabulate(m) { mi =>
      rows.filter(_._1 == mi).sortBy(_._2).map(_._3)
    }
    PqIndex.Codebooks(m, k, books.head.head.length, books)
  }

  /** IVF-PQ query: probe → partition-pruned ADC scan over codes only →
    * exact-cosine rerank of the `shortlist` best ADC rows. With
    * `shortlist` >= the probed row count the result is exactly the
    * in-list exact top-k (rerank degenerates to exact scoring). */
  def queryPq(spark: SparkSession, path: String, q: Array[Float],
      probes: Int, k: Int, shortlist: Int = 50): DataFrame = {
    val lists = probeLists(spark, path, q, probes)
    val cb = loadCodebooks(spark, path)
    val qd = q.map(_.toDouble)
    val qn = math.sqrt(qd.map(v => v * v).sum)
    val table = PqIndex.adcTable(cb, qd)
    val store = spark.read.parquet(s"$path/pq_lists")
    val short = store
      .filter(col("list").isin(lists: _*))
      .select(col("vec_id"),
        (graft.functions.VecOps.pq_adc(col("codes"), typedLit(table.toSeq)) /
          (lit(qn) * col("nrm"))).as("adc_sim"))
      .orderBy(col("adc_sim").desc, col("vec_id"))
      .limit(shortlist)
    store
      .filter(col("list").isin(lists: _*))
      .join(broadcast(short.select(col("vec_id"))), Seq("vec_id"))
      .select(col("vec_id"), col("list"),
        round(ipLit(col("embedding"), qd.toSeq) /
          (nrm(col("embedding")) * lit(qn)), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Shared batch-ANN core: `listed` is the corpus with its `list`
    * assignment, `cents` the (normalized) centroids. Routing is map-only
    * (sort a K-struct literal array per query, explode the top p), then
    * ONE equi-join on the list id — the bucketed-batch shape that never
    * goes all-pairs. Returns (q_id, rk, c_id, cos_sim). */
  private def batchWithCentroids(listed: DataFrame, queries: DataFrame,
      cents: Array[Array[Double]], probes: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // per-query top-p lists WITHOUT a join or window: negative ip sorts
    // ascending == ip descending; slice keeps the p best
    val scored = array(scala.collection.immutable.ArraySeq.unsafeWrapArray(
      cents.zipWithIndex.map { case (c, i) =>
        struct((lit(0.0) - ipLit(col("embedding"), c.toSeq)).as("nip"),
          lit(i).as("id"))
      }): _*)
    val routed = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"),
        explode(transform(slice(array_sort(scored), 1, probes),
          s => s.getField("id"))).as("list"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("c_id"))
    routed.join(listed, Seq("list"))
      .select(col("q_id"), col("c_id"),
        round(dot(col("qe"), col("ce")) / (nrm(col("qe")) * nrm(col("ce"))), 6)
          .as("cos_sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("c_id"), col("cos_sim"))
  }

  /** Batch ANN over a raw corpus: trains the quantizer inline, then runs
    * the shared core. Used where no persisted index exists (one-shot
    * jobs, the recall spec). */
  def batchQuery(corpus: DataFrame, queries: DataFrame, probes: Int, k: Int,
      clusters: Int = 16, iters: Int = 5): DataFrame = {
    val cents = train(corpus, clusters, iters)
    val listed = corpus.select(col("vec_id").as("c_id"),
      col("embedding").as("ce"),
      assignExpr(cents, col("embedding")).as("list"))
    batchWithCentroids(listed, queries, cents, probes, k)
  }

  /** Batch ANN against a PERSISTED index ([[build]]): centroids load once
    * (tiny), the corpus comes pre-listed from the partitioned store — no
    * training, no assignment pass. This is the serving shape: a stream of
    * query vectors can call this per micro-batch (foreachBatch) and only
    * ever touches the probed inverted lists. */
  def batchQueryIndexed(spark: SparkSession, path: String, queries: DataFrame,
      probes: Int, k: Int): DataFrame = {
    val cents = spark.read.parquet(s"$path/centroids").collect()
      .sortBy(_.getInt(0))
      .map(_.getSeq[Double](1).toArray)
    val listed = spark.read.parquet(s"$path/lists")
      .select(col("vec_id").as("c_id"), col("embedding").as("ce"),
        col("list"))
    batchWithCentroids(listed, queries, cents, probes, k)
  }

  /** Brute-force per-query top-`k` (ground truth for recall). */
  def bruteBatch(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("c_id"))
    queries.select(col("vec_id").as("q_id"), col("embedding").as("qe"))
      .crossJoin(corpus.select(col("vec_id").as("c_id"),
        col("embedding").as("ce")))
      .select(col("q_id"), col("c_id"),
        round(dot(col("qe"), col("ce")) / (nrm(col("qe")) * nrm(col("ce"))), 6)
          .as("cos_sim"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("c_id"), col("cos_sim"))
  }
}
