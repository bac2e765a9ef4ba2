package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VecOps

/** Product quantization (PQ) for embedding compression + approximate
  * scoring — the memory/scan-bandwidth half of a 100 TB ANN story
  * (IVF, operators/AnnIndex, is the partition-pruning half; real systems
  * compose them as IVF-PQ).
  *
  * A D-dim float vector (D=64 → 256 bytes) is split into `m` subvectors;
  * each subvector is replaced by the id of its nearest centroid in a
  * per-subspace codebook of `k` entries. With m=8, k=16 a vector becomes
  * 8 4-bit codes = 4 bytes — 64× less scan payload, and the dominant
  * cost of a full-corpus similarity scan drops with it.
  *
  * Scale shape:
  *  - TRAIN: codebooks fit on the driver by construction (m×k×(D/m)
  *    doubles = the model); training uses a deterministic hash-ordered
  *    sample (orderBy(md5(id)) → TakeOrdered, no full sort) exactly like
  *    every production PQ (FAISS trains on a corpus sample too). Lloyd
  *    runs driver-side on the sample — no per-iteration cluster jobs.
  *  - ENCODE: one map-only pass; the per-subspace argmax is a literal
  *    struct-array expression (codegen, no join, no UDF).
  *  - QUERY (ADC): the query builds an m×k lookup table of
  *    dot(q_sub, centroid) once (driver math); scoring a row is m table
  *    lookups — the native codegen'd `pq_adc` expression
  *    (functions.VectorExpressions) — then top-k. No shuffle except the
  *    final TakeOrdered.
  *
  * Exact cosine ranking needs ||c||, which quantization destroys, so the
  * true norm rides along as one double per row (standard PQ practice) —
  * ADC score = adc_ip / (||q||·||c||), an approximate cosine whose error
  * is the quantization error of the codebooks.
  */
object PqIndex {

  /** Per-subspace codebooks: books(mi)(ki) is an sub-dim centroid. */
  final case class Codebooks(m: Int, k: Int, subDim: Int,
      books: Array[Array[Array[Double]]])

  /** Train codebooks on a deterministic hash-spread sample of the corpus.
    * Assignment tie-break matches [[codesExpr]] (max score, ties to the
    * higher code id) so driver and executor agree everywhere. */
  def train(e: DataFrame, m: Int = 8, k: Int = 16, iters: Int = 10,
      sample: Int = 2048): Codebooks = {
    val vecs = e.select(col("vec_id"), col("embedding"))
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(sample).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    require(vecs.nonEmpty, "pq train: empty corpus")
    val d = vecs.head.length
    require(d % m == 0, s"pq train: dim $d not divisible by m=$m")
    val subDim = d / m
    val books = Array.tabulate(m) { mi =>
      kmeans(vecs.map(v => java.util.Arrays.copyOfRange(v, mi * subDim,
        (mi + 1) * subDim)), k, iters)
    }
    Codebooks(m, k, subDim, books)
  }

  /** Driver-side Lloyd over the (tiny) training sample. Deterministic:
    * seeds are the first k distinct subvectors in sample order, ties in
    * assignment go to the higher code id (mirrors codesExpr), an emptied
    * cluster keeps its previous centroid. */
  private def kmeans(xs: Array[Array[Double]], k: Int,
      iters: Int): Array[Array[Double]] = {
    val distinct = scala.collection.mutable.LinkedHashSet.empty[Seq[Double]]
    xs.foreach { x => if (distinct.size < k) distinct += x.toSeq }
    var cents = distinct.toArray.map(_.toArray)
    require(cents.nonEmpty, "pq kmeans: no training points")
    (1 to iters).foreach { _ =>
      val sums = Array.fill(cents.length)(new Array[Double](xs.head.length))
      val cnts = new Array[Long](cents.length)
      xs.foreach { x =>
        val a = assign(cents, x)
        cnts(a) += 1
        var i = 0
        while (i < x.length) { sums(a)(i) += x(i); i += 1 }
      }
      cents = cents.indices.map { ci =>
        if (cnts(ci) == 0) cents(ci)
        else sums(ci).map(_ / cnts(ci))
      }.toArray
    }
    cents
  }

  /** argmax over codes of ip(x,c) - ||c||²/2 (== argmin L2 distance);
    * ties → higher id, matching array_max over (score, id) structs. */
  private def assign(cents: Array[Array[Double]], x: Array[Double]): Int = {
    var best = 0
    var bestS = Double.NegativeInfinity
    var ci = 0
    while (ci < cents.length) {
      val c = cents(ci)
      var ip = 0.0
      var n2 = 0.0
      var i = 0
      while (i < c.length) { ip += c(i) * x(i); n2 += c(i) * c(i); i += 1 }
      val s = ip - 0.5 * n2
      if (s >= bestS) { best = ci; bestS = s }
      ci += 1
    }
    best
  }

  /** Map-only encode expression: ARRAY<INT> of per-subspace code ids. */
  def codesExpr(cb: Codebooks, emb: Column): Column = {
    val perSub = (0 until cb.m).map { mi =>
      val sub = slice(emb, mi * cb.subDim + 1, cb.subDim)
      val scored = cb.books(mi).zipWithIndex.map { case (c, ki) =>
        val nc2 = c.map(x => x * x).sum
        struct((VecOps.vec_dot(sub, typedLit(c.toSeq)) - lit(0.5 * nc2))
          .as("s"), lit(ki).as("id"))
      }
      array_max(array(scala.collection.immutable.ArraySeq.unsafeWrapArray(scored): _*)).getField("id")
    }
    array(perSub: _*)
  }

  /** Encoded corpus: (vec_id, codes ARRAY<INT>, nrm DOUBLE). */
  def encode(e: DataFrame, cb: Codebooks): DataFrame =
    e.select(col("vec_id"), codesExpr(cb, col("embedding")).as("codes"),
      VecOps.vec_norm(col("embedding")).as("nrm"))

  /** Flattened m×k ADC table for one query: entry m*k + ki is
    * dot(q_sub_m, books(m)(ki)). */
  def adcTable(cb: Codebooks, q: Array[Double]): Array[Double] = {
    val out = new Array[Double](cb.m * cb.k)
    (0 until cb.m).foreach { mi =>
      val book = cb.books(mi)
      book.indices.foreach { ki =>
        var ip = 0.0
        var i = 0
        while (i < cb.subDim) {
          ip += book(ki)(i) * q(mi * cb.subDim + i); i += 1
        }
        out(mi * cb.k + ki) = ip
      }
      // a short codebook (fewer distinct training points than k) keeps
      // table layout k-strided; unused slots stay 0 and are never indexed
      // because codes only reference existing entries
      require(book.length <= cb.k)
    }
    out
  }

  /** Persist codebooks as ONE parquet file at `path`: (mi, ki,
    * centroid DOUBLE[], half_nc2 DOUBLE). half_nc2 is precomputed here with
    * the same sequential sum [[codesExpr]] embeds as a literal, so a SQL
    * oracle reading the fixture scores code assignment with bit-identical
    * constants. Written as a single atomically-swapped file
    * ([[graft.tools.FixtureIO.writeSingleParquet]]) because DuckDB's
    * read_parquet targets a file, not a Spark directory. */
  def save(spark: SparkSession, cb: Codebooks, path: String): Unit = {
    import spark.implicits._
    require(cb.books.forall(_.length == cb.k),
      "pq save: ragged codebooks (fewer distinct training points than k)")
    val rows = for { mi <- 0 until cb.m; ki <- 0 until cb.k } yield {
      val c = cb.books(mi)(ki)
      (mi, ki, c.toSeq, 0.5 * c.map(x => x * x).sum)
    }
    graft.tools.FixtureIO.writeSingleParquet(spark,
      rows.toDF("mi", "ki", "centroid", "half_nc2"), path)
  }

  /** Load codebooks written by [[save]] (model-sized: m*k rows). */
  def load(spark: SparkSession, path: String): Codebooks = {
    val rows = spark.read.parquet(path)
      .select(col("mi"), col("ki"), col("centroid")).collect()
    require(rows.nonEmpty, s"pq load: empty codebook fixture at $path")
    val m = rows.map(_.getInt(0)).max + 1
    val k = rows.map(_.getInt(1)).max + 1
    val books = Array.ofDim[Array[Double]](m, k)
    rows.foreach { r =>
      books(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray
    }
    require(books.forall(_.forall(_ != null)), "pq load: missing (mi,ki) row")
    Codebooks(m, k, books(0)(0).length, books)
  }

  /** Approximate cosine top-k over the encoded corpus via ADC. */
  def query(encoded: DataFrame, cb: Codebooks, q: Array[Double],
      topk: Int): DataFrame = {
    val qn = math.sqrt(q.map(v => v * v).sum)
    val table = adcTable(cb, q)
    encoded.select(col("vec_id"),
      round(VecOps.pq_adc(col("codes"), typedLit(table.toSeq)) /
        (lit(qn) * col("nrm")), 6).as("pq_sim"))
      .orderBy(col("pq_sim").desc, col("vec_id"))
      .limit(topk)
  }
}
