package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.JoinQueries

/** Streaming ASSOCIATION-RULE state — the online twin of q_basket_rules
  * (st39), closing the one first-class r11 family with no online form.
  *
  * Contract: an order arrives WHOLE in one micro-batch as a single
  * (orderkey, parts) basket row — the st36 whole-document posture — so
  * pair generation is MAP-ONLY (the same sorted-set posexplode/slice
  * expansion the batch query runs) and the only stateful operator is
  * one count. The state store IS the rollup (the st18 recipe), keyed by
  * a tagged union so all three quantities the rule arithmetic needs
  * share one exchange and one state store:
  *
  *   ('p', a, b)   → s_ab   co-order pair support
  *   ('i', a, −1)  → s_a    item support
  *   ('o', −1, −1) → N      order count
  *
  * State is pair-domain bounded (catalog², not fact-sized) plus the
  * item domain plus one row; counts merge additively across
  * micro-batches, which is exactly what the complete/update-mode
  * streaming agg does — no custom state machine. [[readout]] then
  * computes support/confidence/lift over the sink with the SAME shared
  * int64 micro arithmetic as q_basket_rules (JoinQueries.confMicro /
  * liftMicro — one definition, so streamed == batch holds bit-for-bit
  * over any arrived prefix).
  *
  * Scale shape: the map side expands each basket to C(n,2)+n+1 rows
  * (order-bounded — the q_triangle_count argument); partial aggregation
  * bounds the shuffle at the touched-key count per partition; the state
  * store rides RocksDB at scale (the st9 posture). The readout is a
  * catalog-sized batch job over the sink, never the stream.
  */
object StreamingBasket {

  /** `baskets`: streaming (o: long, ps: array<long>) — one row per
    * whole order. Returns the tagged (kind, a, b) → c rollup; run it in
    * complete mode into the serving sink. */
  def counts(baskets: DataFrame): DataFrame = {
    val ps = sort_array(array_distinct(col("ps")))
    val pairRows = baskets
      .select(ps.as("ps"))
      .select(col("ps"), posexplode(col("ps")).as(Seq("i", "a")))
      .select(lit("p").as("kind"), col("a"),
        explode(slice(col("ps"), col("i") + lit(2),
          size(col("ps")) - col("i") - lit(1))).as("b"))
    val itemRows = baskets
      .select(ps.as("ps"))
      .select(lit("i").as("kind"), explode(col("ps")).as("a"),
        lit(-1L).as("b"))
    val orderRows = baskets
      .select(lit("o").as("kind"), lit(-1L).as("a"), lit(-1L).as("b"))
    pairRows.unionAll(itemRows).unionAll(orderRows)
      .groupBy(col("kind"), col("a"), col("b"))
      .agg(count(lit(1)).as("c"))
  }

  /** Top-50 rules over the accumulated state — IDENTICAL to
    * q_basket_rules over the arrived prefix: same support-2 floor, same
    * shared confMicro/liftMicro arithmetic, same total order. `state`
    * is the batch view of the sink ((kind, a, b, c) rows). */
  def readout(state: DataFrame): DataFrame = {
    val nOrders = state.filter(col("kind") === "o")
      .select(col("c")).collect().headOption.map(_.getLong(0))
      .getOrElse(0L)
    val items = state.filter(col("kind") === "i")
      .select(col("a").as("p"), col("c").as("s"))
    state.filter(col("kind") === "p" && col("c") >= 2)
      .select(col("a"), col("b"), col("c").as("s_ab"))
      .join(broadcast(items.select(col("p").as("a"), col("s").as("s_a"))),
        Seq("a"))
      .join(broadcast(items.select(col("p").as("b"), col("s").as("s_b"))),
        Seq("b"))
      .select(col("a").as("part_a"), col("b").as("part_b"),
        col("s_ab"), col("s_a"), col("s_b"),
        JoinQueries.confMicro(col("s_ab"), col("s_a")).as("conf_micro"),
        JoinQueries.liftMicro(col("s_ab"), col("s_a"), col("s_b"),
          nOrders).as("lift_micro"))
      .orderBy(col("lift_micro").desc, col("part_a"), col("part_b"))
      .limit(50)
      .orderBy(col("lift_micro").desc, col("part_a"), col("part_b"))
  }
}
