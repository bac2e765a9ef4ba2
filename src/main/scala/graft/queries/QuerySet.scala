package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** One family of oracle-checked queries (SURVEY.md §2.4).
  *
  * Contract (driver-enforced, see the builder prompt):
  *   - `queries(name)(spark, sfDir)` returns a DataFrame whose rows are in a
  *     total deterministic order (every query ends in a unique ORDER BY).
  *   - `oracle(name)` is equivalent DuckDB SQL over the same parquet tables,
  *     with identical column NAMES (driver sorts columns by name, then hashes
  *     values in row order).
  *
  * Cross-engine float policy (FIXTURES.md §C, hardened here):
  *   - big SUMs of monetary/quantity columns are computed in DECIMAL(18,2) —
  *     exact in both engines, so no summation-order flakiness;
  *   - AVG / percentiles / similarity scores stay DOUBLE, wrapped round(_, 6)
  *     (their magnitudes keep fp error orders of magnitude below 1e-6).
  *
  * Output-TYPE policy (round-2 hardening; VERDICT.md round 1 headline):
  *   - the driver's hasher distinguishes decimal precision and DuckDB's
  *     HUGEINT from BIGINT (while tolerating int widths). Spark widens
  *     sum(DECIMAL(p,s)) to p+10; DuckDB widens to 38 — so NO decimal sum
  *     naturally agrees. Exact sums therefore stay decimal INTERNALLY and
  *     are rendered as DOUBLE on output (one final conversion of the same
  *     exact value → bit-identical doubles; see decSum).
  *   - every DuckDB integer aggregate is CAST(... AS BIGINT) in the oracle
  *     SQL, because duck's sum(INTEGER/BIGINT) returns HUGEINT.
  */
trait QuerySet {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracle: Map[String, String]

  /** Exact money/quantity arithmetic: DECIMAL(18,2) on both engines. */
  protected def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact decimal SUM rendered as DOUBLE. The sum itself is exact decimal
    * math (immune to fp summation order); only the final identical value is
    * converted once, and both engines round that same exact decimal to the
    * same nearest double. DOUBLE (not decimal) on output because Spark's
    * sum(DECIMAL(p,s)) widens to p+10 while DuckDB widens to 38, and the
    * driver's hasher renders the precision — there is no decimal output
    * type both planners will naturally emit. Oracle mirror:
    * CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE). */
  protected def decSum(c: Column): Column = sum(dec(c)).cast("double")

  /** Canonical rounding for DOUBLE outputs. */
  protected def r6(c: Column): Column = round(c, 6)

  /** Output-timestamp canonicalization: session TZ is pinned UTC, so
    * casting LTZ→NTZ keeps the UTC wall clock while writing a parquet
    * type DuckDB reads as a naive TIMESTAMP (same as the oracle side). */
  protected def ntz(c: Column): Column = c.cast("timestamp_ntz")

  /** Fixed-point micro-units for a double that is BIT-IDENTICAL on both
    * engines (same arithmetic, same order): floor(x*1e6+0.5) is then
    * deterministic, unlike round(x, 6), whose implementations disagree when
    * x*1e6 lands exactly on a .5 boundary (ratios of small integers do). */
  protected def micro(c: Column): Column =
    floor(c * 1000000.0 + 0.5).cast("long")

  /** True int64 division (Catalyst IntegralDivide — Column./ would compute
    * in DOUBLE and lose exactness past 2^53, which sf1+ sums exceed). */
  protected def intDiv(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    ColumnBridge.column(IntegralDivide(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Exactly-rounded average in micro-units for 2-decimal source data whose
    * SUM ORDER varies across engines (groupBy partials): go through exact
    * integer cents — (sum_cents*10000 + n div 2) div n is pure int64 math,
    * identical everywhere. The oracle mirrors it with DuckDB's `//`. */
  protected def avgMicro(value: Column, cnt: Column): Column =
    intDiv(sum(round(value * 100).cast("long")) * 10000 + intDiv(cnt, lit(2)),
      cnt).cast("long")

  protected def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)
}
