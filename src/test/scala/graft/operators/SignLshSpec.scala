package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The self-scaling sign-LSH bucket width (round-8 VERDICT #1): the
  * operator default must track corpus size (bits ≈ log2(n/32)) while the
  * oracle-pinned 8-bit form stays byte-identical at fixture scale. */
class SignLshSpec extends SparkSpec {

  test("bitsFor reproduces the measured recipe points") {
    // fixture scale (~2k vectors) clamps to the oracle-pinned 8
    assert(SignLsh.bitsFor(2004) == 8)
    // the 50x replica (~100k) lands on the SCALE.md-measured fix: 12 bits
    assert(SignLsh.bitsFor(100200) == 12)
    // growth is logarithmic with the data
    assert(SignLsh.bitsFor(1000000) == 15)
    assert(SignLsh.bitsFor(10000000) == 19)
    // capped: the key reads leading dims and must stay far from dim 64
    assert(SignLsh.bitsFor(Long.MaxValue) == SignLsh.MaxBits)
    // unknown / failed count fails open to the pinned floor
    assert(SignLsh.bitsFor(0) == 8)
    assert(SignLsh.bitsFor(-1) == 8)
  }

  test("bucketExpr packs sign bits of the leading dims") {
    val df = spark.range(1).select(
      expr("array(CAST(1.0 AS FLOAT), CAST(-2.0 AS FLOAT), " +
        "CAST(0.0 AS FLOAT), CAST(-0.5 AS FLOAT))").as("v"))
    // signs: + - 0(>=0) -  → bits 1,3 set → 1 + 4 = 5
    val b = df.select(SignLsh.bucketExpr(col("v"), 4).as("b"))
      .head().getInt(0)
    assert(b == 5)
  }

  test("autoBits counts once per cache key and fails open") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    assert(SignLsh.autoBits(s"$dir/embeddings", emb) == SignLsh.bitsFor(n))
    // second call must hit the cache: hand it a corpus that would THROW
    // if evaluated
    // analyzes clean, but ANSI division-by-zero throws the moment any
    // count() actually evaluates it
    val poison = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(expr("vec_id / 0 = 1"))
    assert(SignLsh.autoBits(s"$dir/embeddings", poison) == SignLsh.bitsFor(n))
    // a failing count on a fresh key falls back to the 8-bit floor...
    val poisonKey = s"poison-${System.nanoTime()}"
    assert(SignLsh.autoBits(poisonKey, poison) == 8)
    // ...but the failure is NOT cached: once the table is readable again
    // (transient blip — compaction swap, momentary storage error), the
    // same key recovers the real corpus-derived width instead of pinning
    // MinBits for the JVM's lifetime
    assert(SignLsh.autoBits(poisonKey, emb) == SignLsh.bitsFor(n))
    // and the recovered count is now cached like any success
    assert(SignLsh.autoBits(poisonKey, poison) == SignLsh.bitsFor(n))
  }

  test("operator default == pinned 8-bit plan at fixture scale") {
    val dir = "/root/testdata/sf0.001"
    val auto = graft.queries.DedupQueries.embeddingDedupPairs(spark, dir)
      .collect().toSeq
    val pinned = graft.queries.DedupQueries
      .embeddingDedupPairs(spark, dir, bits = Some(8)).collect().toSeq
    assert(auto == pinned)
    assert(auto.nonEmpty) // the planted near-dup pairs
  }

  test("bucketExpr offset reads a shifted sign window") {
    val df = spark.range(1).select(
      expr("array(CAST(1.0 AS FLOAT), CAST(-2.0 AS FLOAT), " +
        "CAST(0.0 AS FLOAT), CAST(-0.5 AS FLOAT))").as("v"))
    // window [3,4]: signs 0(>=0), -  → bit 1 set → 1
    val b = df.select(SignLsh.bucketExpr(col("v"), 2, 2).as("b"))
      .head().getInt(0)
    assert(b == 1)
    intercept[IllegalArgumentException] {
      SignLsh.bucketExpr(col("v"), 8, 56) // reaches element 64
    }
  }

  test("multi-table LSH recovers the pair single-table provably splits") {
    val dir = "/root/testdata/sf0.001"
    val mt = graft.queries.DedupQueries
      .embeddingDedupPairsMultiTable(spark, dir, bits = Some(8), tables = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3))
      .toMap
    // the planted ±element-2 pair: true near-dup (cos ≈ 0.929), found by
    // table 1 ONLY — its mask proves table 0 split it
    assert(mt((900005L, 900006L)) == 2L)
    // the element-64 planted pairs agree on every leading sign → both
    // tables find them
    assert(mt((900001L, 900002L)) == 3L)
    assert(mt((900003L, 900004L)) == 3L)
    // and the single-table control (same input incl. the witness rows,
    // table 0 only) indeed MISSES the cross-sign pair
    val st = graft.queries.DedupQueries
      .embeddingDedupPairsMultiTable(spark, dir, bits = Some(8), tables = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!st.contains((900005L, 900006L)))
    assert(st.contains((900001L, 900002L)))
  }
}
