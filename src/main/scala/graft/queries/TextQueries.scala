package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis for a training-data pipeline (SURVEY.md §2.4 i, Q35 +
  * language-ID, quality scoring, token counting, fingerprinting).
  *
  * Everything is per-document arithmetic over split/regexp/higher-order
  * functions — embarrassingly parallel, no shuffle except the final sort;
  * at 100 TB these run as a single map stage over the document scan.
  */
object TextQueries extends QuerySet {

  /** THE document quality score — one definition for every operator that
    * ranks or filters by quality (q_text_quality's report, q_source_cap's
    * per-domain cap, q_dedup_keep_best's cluster representative). Adds
    * `stop_ratio`, `special_ratio`, `quality_micro` (weighted blend of
    * length / stopword ratio / special-char ratio / mean word length,
    * fixed-point micro-units: floor(x*1e6 + 0.5) is bit-identical across
    * engines, unlike round() at exact .5 micro-boundaries — these
    * weighted small-int ratios do land on them). Map-only: per-document
    * arithmetic, no shuffle, so stacking it onto any scan is free at
    * 100 TB. The DuckDB twin is [[qualitySql]].
    */
  def withQuality(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val en = array(stopwords.toMap.apply("en").map(lit): _*)
    docs
      .withColumn("w", split(col("text"), " "))
      .withColumn("n_tok", size(col("w")).cast("double"))
      .withColumn("stop_ratio",
        size(filter(col("w"), tk => array_contains(en, tk)))
          .cast("double") / col("n_tok"))
      .withColumn("special_ratio",
        length(regexp_replace(col("text"), "[a-z ]", "")).cast("double") /
          length(col("text")).cast("double"))
      .withColumn("mean_len",
        expr("aggregate(transform(w, t -> length(t)), 0, (a, x) -> a + x)")
          .cast("double") / col("n_tok"))
      .withColumn("quality_micro",
        floor((least(col("n_tok") / 100.0, lit(1.0)) * 0.3 +
          col("stop_ratio") * 0.3 +
          (lit(1.0) - col("special_ratio")) * 0.2 +
          least(col("mean_len") / 8.0, lit(1.0)) * 0.2) * 1000000.0 + 0.5)
          .cast("long"))
      .drop("w", "n_tok", "mean_len")
  }

  /** DuckDB twin of [[withQuality]]: CTEs `qm` (the ratio metrics) and
    * `q` (doc_id, quality_micro) over `documents` — splice into any
    * oracle's WITH list so the SQL side shares the one formula too. */
  val qualitySql: String =
    """qm AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(w, t -> list_contains(['the','a','of','and'], t))) AS DOUBLE) / n_tok AS stop_ratio,
      |    CAST(length(regexp_replace(text, '[a-z ]', '', 'g')) AS DOUBLE) / length(text) AS special_ratio,
      |    CAST(list_sum(list_transform(w, t -> length(t))) AS DOUBLE) / n_tok AS mean_len,
      |    n_tok
      |  FROM (SELECT doc_id, text, string_split(text, ' ') AS w,
      |               CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok
      |        FROM documents)),
      |q AS (
      |  SELECT doc_id,
      |    CAST(floor((least(n_tok / 100.0, 1.0) * 0.3 + stop_ratio * 0.3
      |      + (1.0 - special_ratio) * 0.2 + least(mean_len / 8.0, 1.0) * 0.2) * 1000000.0 + 0.5) AS BIGINT) AS quality_micro
      |  FROM qm)""".stripMargin

  /** Per-language stopword profiles for the language-ID heuristic. */
  private val stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und"),
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "la", "los", "que"),
    "fr" -> Seq("le", "les", "une", "et"),
    "zh" -> Seq("的", "是", "在", "了"))

  /** The scale-shaped successor-pair generator shared by
    * q_text_levenshtein_blocked and q_text_damerau (r11: damerau first
    * shipped on the plain window-by-source form and measured 8.05× at
    * 10× data — the §9.4 parallelism cap this generator exists to
    * remove). Adjacency decomposes: (1) lead() within (source,
    * doc_id-block) partitions — parallelism scales with data volume
    * (blocks), not source cardinality; (2) boundary pairs from the
    * block-edge subset (~2 rows per populated block) chained by one
    * window over blocks, which also skips empty blocks correctly.
    * Union of the two is exactly the per-source successor relation.
    *
    * pid/nid mark block-FIRST/LAST rows. The boundary branch filters on
    * these WINDOW outputs — deliberately: a filter that depends on the
    * window cannot be pushed below it, so both union branches keep the
    * IDENTICAL raw (source, blk) exchange and the planner reuses it
    * (one text scan, one shuffle — the jaccard-verify ReusedExchange
    * pattern). The first cut aggregated struct min/max per block
    * instead; Catalyst pruned the window from that branch and
    * partial-aggregated below its own exchange — a second full text
    * scan plus a SortAggregate (struct min/max is not hash-able),
    * measured ~1.7× slower at 30× data. Returns (doc_id, tp, nid, ntp)
    * with tp/ntp the 60-char prefixes. */
  private def blockedSuccessorPairs(s: SparkSession,
      dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val blockSize = 4096
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        substring(col("text"), 1, 60).as("tp"),
        floor(col("doc_id") / blockSize).as("blk"))
    val wBlk = Window.partitionBy(col("source"), col("blk"))
      .orderBy(col("doc_id"))
    val dw = d
      .withColumn("pid", lag(col("doc_id"), 1).over(wBlk))
      .withColumn("nid", lead(col("doc_id"), 1).over(wBlk))
      .withColumn("ntp", lead(col("tp"), 1).over(wBlk))
    val within = dw
      .filter(col("nid").isNotNull)
      .select(col("doc_id"), col("tp"), col("nid"), col("ntp"))
    val wSrc = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    val boundary = dw
      .filter(col("nid").isNull || col("pid").isNull)
      .withColumn("bid", lead(col("doc_id"), 1).over(wSrc))
      .withColumn("btp", lead(col("tp"), 1).over(wSrc))
      .filter(col("nid").isNull && col("bid").isNotNull)
      .select(col("doc_id"), col("tp"),
        col("bid").as("nid"), col("btp").as("ntp"))
    within.unionByName(boundary)
  }

  val queries: Map[String, Q] = Map(
    // Q35: token/char statistics + type-token ratio.
    "q35_text_stats" -> { (s, dir) =>
      t(s, dir, "documents")
        .withColumn("w", split(col("text"), " "))
        .select(col("doc_id"), col("lang"),
          size(col("w")).as("n_tokens"),
          length(col("text")).as("len_chars"),
          size(array_distinct(col("w"))).as("n_uniq"),
          micro(expr("aggregate(transform(w, t -> length(t)), 0, (a, x) -> a + x)")
            .cast("double") / size(col("w"))).as("mean_tok_len_micro"),
          micro(size(array_distinct(col("w"))).cast("double") / size(col("w")))
            .as("ttr_micro"))
        .orderBy(col("doc_id"))
    },

    // Language ID: stopword-profile scores + deterministic argmax
    // (first language in de<en<es<fr<zh order wins ties).
    // RANK-BASED AUC EVALUATION HARNESS (Mann-Whitney U / Wilcoxon
    // rank-sum, Hanley & McNeil 1982) — the model-evaluation member the
    // pipeline family was missing: every scorer the engine ships
    // (quality classifier, langid, perplexity...) produces per-doc
    // numbers, and this operator turns any of them plus any binary
    // label into the standard ranking metric, demonstrated on two
    // shipped scorers against the labeled `lang` column. ALL-INTEGER:
    // AUC = U/(n⁺n⁻) with tie-averaged ranks, and 2·Σrank⁺ is computed
    // WITHOUT per-row ranking — group by score value, then
    // Σ pc·(2·cum + cnt + 1) over score-ordered groups (min+max of a
    // tie range = twice its average rank) — so the metric is exact
    // int64 end-to-end, auc_micro = (R2 − n⁺(n⁺+1))·5e5 div (n⁺n⁻)
    // (non-negative numerator → trunc == floor on both engines; bound
    // ~6e18 at 100× corpus, documented). The honest readout on this
    // synthetic corpus: BOTH scorers sit near 0.5 (langid_s_en 0.529,
    // classifier 0.509 at sf0.01) because the generator's text is
    // English-like regardless of the lang label — exactly the finding
    // an eval harness exists to surface before anyone ships the
    // heuristic. Scale shape: two map-only scoring passes (one native
    // classifier_scores call, one stopword filter) → score-DOMAIN-sized
    // hash aggs; the rank window runs over score-domain groups
    // partitioned by evaluator, never raw docs.
    "q_eval_auc" -> { (s, dir) =>
      aucFromGroups(aucGroups(aucScored(t(s, dir, "documents"))))
    },

    // CLASSIFIER EVALUATION — McNemar's paired comparison (McNemar
    // 1947; the PAIRED member of the eval family: AUC/calibration
    // grade one scorer at a time, this asks whether TWO scorers'
    // error sets differ on the SAME documents — the only sound way to
    // compare classifiers evaluated on one corpus): language-ID's
    // argmax-en decision vs the classifier's sign decision (score ≥ 0,
    // the q_text_classifier keep/drop operating point — the same
    // threshold-0 detector q_eval_auc grades continuously), both
    // against the lang == 'en' truth. The readout is the discordant
    // table (b = langid-only right, c = classifier-only right) and the
    // EXACT McNemar statistic (b − c)²·1e6 div (b + c) — a pure
    // integer (int64-safe while |b − c| ≤ 3e6, the q_eval_auc
    // documented-bound posture); the χ² p-value lookup is the
    // caller's table, the statistic itself never touches a float.
    // ONE map-only scoring
    // pass (shared langidPredicted + the native classifier kernel)
    // into a 1-row agg. Honest readout at sf0.01: discordants 101 vs
    // 127 give χ² ≈ 2.96 — UNDER the 3.84 α=0.05 cut, so the two
    // detectors are statistically indistinguishable at the decision
    // level, matching their near-tied AUCs (0.529/0.509): exactly the
    // conclusion a paired test exists to make sound.
    "q_eval_mcnemar" -> { (s, dir) =>
      val d = langidPredicted(t(s, dir, "documents"))
        .withColumn("cs",
          graft.functions.TextOps.classifier_scores(col("text")))
        .withColumn("truth", col("lang") === "en")
        .withColumn("a_right",
          (col("predicted") === "en") === col("truth"))
        .withColumn("b_right",
          (col("cs").getItem(1) + col("cs").getItem(2) >= 0L)
            === col("truth"))
      d.agg(
          count(lit(1)).as("n"),
          sum(when(col("a_right") && col("b_right"), 1L).otherwise(0L))
            .as("both_right"),
          sum(when(!col("a_right") && !col("b_right"), 1L).otherwise(0L))
            .as("both_wrong"),
          sum(when(col("a_right") && !col("b_right"), 1L).otherwise(0L))
            .as("langid_only"),
          sum(when(!col("a_right") && col("b_right"), 1L).otherwise(0L))
            .as("classifier_only"))
        .select(col("n"), col("both_right"), col("both_wrong"),
          col("langid_only"), col("classifier_only"),
          when(col("langid_only") + col("classifier_only") > 0L,
            intDiv((col("langid_only") - col("classifier_only"))
              * (col("langid_only") - col("classifier_only"))
              * lit(1000000L),
              col("langid_only") + col("classifier_only")))
            .otherwise(0L).as("mcnemar_x2_micro"))
    },

    // CLASSIFIER EVALUATION — calibration / reliability diagram
    // (Murphy 1973; Guo et al. 2017's ECE): the SAME two shipped
    // scorers and labels as q_eval_auc (shared aucScored), binned into
    // 10 fixed-width score buckets (clamped to [0,9] — the classifier
    // score is a signed weight average, not a probability; the report
    // reads score-vs-outcome monotonicity either way). Per bin:
    // half-up integer mean score and positive rate, |gap|, and the
    // expected calibration error ECE = Σ n_b·gap_b div N repeated per
    // evaluator row (one schema, no sentinel rows). ALL integer math.
    // Scale shape: map-only scoring → a (evaluator × 10)-bin agg; the
    // state is BIN-domain bounded, which is why st43 streams it with
    // one complete-mode agg (shared definitions).
    "q_eval_calibration" -> { (s, dir) =>
      calibrationReadout(calibrationBins(aucScored(t(s, dir, "documents"))))
    },

    // DISAGGREGATED EVALUATION — the q_eval_auc rank-sum PER INGEST
    // SOURCE (sliced/subgroup evaluation, the Model-Cards/HELM
    // discipline: an aggregate AUC can hide a slice where the scorer
    // is broken or inverted; per-source is the slice a data pipeline
    // owns). ONE shared definition chain with q_eval_auc — the same
    // scorers, groups, and exact tie-averaged integer rank sums, with
    // (evaluator, source) as the key tuple (aucScoredKeyed /
    // aucGroupsKeyed / aucFromGroupsKeyed); degenerate slices (no
    // positives or no negatives — AUC undefined) are dropped, not
    // zero-filled. Scale shape: identical to q_eval_auc — two map-only
    // scoring passes into (evaluator × source × score)-domain hash
    // aggs; the score domain saturates and sources are catalog-sized,
    // so the readout never touches raw docs after the scan.
    "q_eval_subgroup" -> { (s, dir) =>
      aucFromGroupsKeyed(
        aucGroupsKeyed(
          aucScoredKeyed(t(s, dir, "documents"), Seq("source")),
          Seq("evaluator", "source")),
        Seq("evaluator", "source"))
    },

    "q_text_langid" -> { (s, dir) =>
      langidPredicted(t(s, dir, "documents"))
        .select(
          col("doc_id") +: col("labeled") +:
            stopwords.map { case (l, _) => col(s"s_$l") } :+
            col("predicted"): _*)
        .orderBy(col("doc_id"))
    },

    // CLASSIFIER EVALUATION — multiclass confusion readout of the
    // shipped language-ID heuristic against the labeled lang column
    // (shared langidPredicted definition, so the harness grades EXACTLY
    // the classifier q_text_langid ships): per class tp/fp/fn and
    // integer-micro precision / recall / F1 (= 2tp/(2tp+fp+fn), the
    // single-division form), plus the corpus accuracy repeated per row
    // (the ece_micro column recipe — one schema, no sentinel rows).
    // Scale shape: ONE map-only scoring pass → a (labeled × predicted)
    // cell agg (≤ 25 rows at any corpus size) — everything downstream
    // is class-domain sized; the class-domain windows are deliberate
    // output-sized merges.
    "q_eval_confusion" -> { (s, dir) =>
      confusionReadout(
        langidPredicted(t(s, dir, "documents"))
          .groupBy(col("labeled"), col("predicted"))
          .agg(count(lit(1)).as("n")))
    },

    // Quality score: length, stopword ratio, special-char ratio, word length.
    // The score itself lives in [[withQuality]] so quality-RANKED operators
    // (q_source_cap, q_dedup_keep_best) share the one definition.
    "q_text_quality" -> { (s, dir) =>
      withQuality(t(s, dir, "documents"))
        .select(col("doc_id"),
          micro(col("stop_ratio")).as("stop_ratio_micro"),
          micro(col("special_ratio")).as("special_ratio_micro"),
          col("quality_micro"))
        .orderBy(col("doc_id"))
    },

    // Document fingerprint: md5 over the sorted distinct token set —
    // an order-invariant content signature (bag-of-words identity).
    "q_text_fingerprint" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          md5(array_join(array_sort(array_distinct(split(col("text"), " "))),
            " ")).as("fingerprint"))
        .orderBy(col("doc_id"))
    },

    // Edit-distance near-match: Levenshtein over text prefixes for
    // row_number-adjacent documents within the same source (each doc vs its
    // successor in doc_id order — 480 real pairs at sf0.01, vs the previous
    // doc_id+1 pairing that never matched and passed vacuously on 0 rows),
    // keeping only near matches (edit_dist <= 40 over the 60-char prefix).
    // A bounded-candidate demonstration of the edit-distance verifier
    // (candidates would come from LSH at scale; the pair generator is one
    // window pass + an equi-join, never all-pairs).
    "q_text_levenshtein" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          substring(col("text"), 1, 60).as("tp"),
          row_number().over(w).as("rn"))
      val a = d.select(col("doc_id").as("doc_a"), col("source"),
        col("tp").as("ta"), col("rn"))
      val b = d.select(col("doc_id").as("doc_b"), col("source"),
        col("tp").as("tb"), (col("rn") - 1).as("rn"))
      a.join(b, Seq("source", "rn"))
        .select(col("doc_a"), col("doc_b"),
          levenshtein(col("ta"), col("tb")).as("edit_dist"))
        .filter(col("edit_dist") <= 40)
        .orderBy(col("doc_a"))
    },

    // TRANSPOSITION-AWARE edit distance on the same successor pairs —
    // the record-linkage refinement of q_text_levenshtein: a native
    // full Damerau-Levenshtein expression (functions/EditDistance.scala;
    // Lowrance & Wagner 1975, matching DuckDB's damerau_levenshtein
    // integer-for-integer) scores next to the plain metric, and
    // `transpo_gain` = lev − dl surfaces how much of the edit budget was
    // swapped-adjacent-character noise ("hte"→"the" is ONE keystroke).
    // Pairs come from the BLOCKED generator from the start (r11
    // measured: the plain window-by-source form read 8.05× at 10× data
    // — the §9.4 parallelism cap, amplified here because the O(60²) DL
    // kernel is ~4× levenshtein's constant; blocked restores the
    // volume-scaled partitioning and the factor drops to ≈1×). The
    // kernel only ever sees 60-char prefixes of generated successor
    // pairs, never all-pairs; both distances run in ONE
    // whole-stage-codegen projection.
    "q_text_damerau" -> { (s, dir) =>
      import graft.functions.EditDistanceOps.damerau_levenshtein
      blockedSuccessorPairs(s, dir)
        .select(col("doc_id").as("doc_a"), col("nid").as("doc_b"),
          levenshtein(col("tp"), col("ntp")).cast("long").as("lev"),
          damerau_levenshtein(col("tp"), col("ntp")).as("dl"))
        .select(col("doc_a"), col("doc_b"), col("lev"), col("dl"),
          (col("lev") - col("dl")).as("transpo_gain"))
        .filter(col("dl") <= 40)
        .orderBy(col("doc_a"))
    },

    // The SAME successor pairs as q_text_levenshtein, restructured for
    // scale. The plain form's window partitions by `source` alone — with
    // a handful of sources, parallelism is capped at the SOURCE COUNT no
    // matter how big the data gets (measured 5.3× at 10× data, the text
    // family's worst factor, SCALE.md §9). Here adjacency decomposes:
    //  1. lead() within (source, doc_id-block) partitions — parallelism
    //     scales with data volume (blocks), not source cardinality;
    //  2. boundary pairs from a per-(source, block) min/max aggregate
    //     (two rows per block — tiny) chained by one window over blocks,
    //     which also skips empty blocks correctly.
    // Union of the two is exactly the successor relation; same oracle.
    "q_text_levenshtein_blocked" -> { (s, dir) =>
      blockedSuccessorPairs(s, dir)
        .select(col("doc_id").as("doc_a"), col("nid").as("doc_b"),
          levenshtein(col("tp"), col("ntp")).as("edit_dist"))
        .filter(col("edit_dist") <= 40)
        .orderBy(col("doc_a"))
    },

    // Tokenizer comparison: whitespace tokens vs BPE-ish regex tokens
    // (runs of letters / digits / single specials) + est. subword count.
    "q_text_tokens" -> { (s, dir) =>
      t(s, dir, "documents")
        .withColumn("w", split(col("text"), " "))
        .withColumn("rtoks",
          expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
        .select(col("doc_id"),
          size(col("w")).as("n_ws_tokens"),
          size(col("rtoks")).as("n_re_tokens"),
          expr("CAST(aggregate(transform(w, t -> CAST(ceil(length(t) / 4.0) AS BIGINT)), CAST(0 AS BIGINT), (a, x) -> a + x) AS BIGINT)")
            .as("n_bpe_est"),
          element_at(col("rtoks"), 1).as("first_tok"))
        .orderBy(col("doc_id"))
    },

    // Repetition signals (the Gopher/MassiveText quality-filter family):
    // duplicate word-n-gram fraction (n=2,3) and the most-frequent-bigram
    // share per document — high values mark boilerplate/spam/generated
    // text. Single documents scan: positions exploded once, bigram and
    // trigram melted into (doc_id, n, gram) rows, ONE (doc,n,gram) count
    // aggregate, then all per-doc stats + the deterministic top bigram
    // (max count, ties to lexicographically smallest) from one doc_id
    // window pass — two shuffles total, both map-side combined, no
    // interpreted higher-order lambdas in the hot path.
    "q_text_repetition" -> { (s, dir) =>
      // per-document statistic → per-document compute: ONE native
      // codegen'd pass (graft.functions.TextOps.repetitionStats) per
      // row, map-only at any corpus size — replaces a gram-string
      // groupBy + doc-partition window (two shuffles carrying gram TEXT;
      // round-9 BENCH 1.0-1.2 s). Same gram construction (raw split,
      // short-document pseudo-grams), same (count DESC, gram ASC)
      // tie-break, bit-identical outputs.
      t(s, dir, "documents")
        .withColumn("r",
          graft.functions.TextOps.repetition_stats(col("text")))
        .select(col("doc_id"),
          col("r.n2").as("n_bigrams"),
          micro((col("r.n2") - col("r.n2d")).cast("double") /
            col("r.n2").cast("double")).as("dup_bigram_micro"),
          micro((col("r.n3") - col("r.n3d")).cast("double") /
            col("r.n3").cast("double")).as("dup_trigram_micro"),
          col("r.top_bigram").as("top_bigram"),
          col("r.top_cnt").as("top_bigram_cnt"),
          micro(col("r.top_cnt").cast("double") /
            col("r.n2").cast("double")).as("top_bigram_frac_micro"))
        .orderBy(col("doc_id"))
    },

    // PII scrubbing: detect + redact emails and URLs, keep the counts for
    // the audit trail — the pre-training privacy pass. The text is BUILT
    // from customer columns (the synthetic corpus contains no PII), so
    // both engines construct identical inputs and the regex semantics are
    // what is actually compared. Map-only at scale, like all of §Q35.
    "q_text_redact" -> { (s, dir) =>
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val url = "https?://[A-Za-z0-9./-]+"
      t(s, dir, "customer")
        .withColumn("raw", concat(col("c_name"), lit(" contact u"),
          col("c_custkey"), lit("@example.com or https://ex"),
          col("c_custkey") % 7, lit(".org segment "), col("c_mktsegment")))
        .select(col("c_custkey"),
          regexp_count(col("raw"), lit(email)).as("n_emails"),
          regexp_count(col("raw"), lit(url)).as("n_urls"),
          regexp_replace(regexp_replace(col("raw"), email, "<EMAIL>"),
            url, "<URL>").as("redacted"))
        .orderBy(col("c_custkey"))
    },

    // Unigram LM perplexity filter (the CCNet quality gate, with the
    // corpus itself as the LM): every token's log-probability under the
    // corpus unigram distribution, summed per document — documents whose
    // average negative logprob is far above the corpus norm are
    // boilerplate/garbage candidates. Scale shape: the LM is one token
    // hash-aggregate whose result is vocabulary-sized (tiny → broadcast
    // side of the scoring join); scoring is map-only over the token
    // stream; the per-token logprob is QUANTIZED to int64 micro-units
    // before the per-doc sum so the rollup is exact integer math —
    // engine- and order-independent (a double sum would leave the result
    // at the mercy of summation order).
    "q_text_perplexity" -> { (s, dir) =>
      val tok = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      val lm = tok.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      val wAll = Window.orderBy(col("tok"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val scored = lm
        .withColumn("logp_micro",
          micro(log(col("cnt").cast("double") /
            sum(col("cnt")).over(wAll).cast("double"))))
        .select(col("tok"), col("logp_micro"))
      tok.join(broadcast(scored), Seq("tok"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tok"),
          sum(col("logp_micro")).as("sum_logp_micro"))
        .select(col("doc_id"), col("n_tok"),
          col("sum_logp_micro"),
          // negate first so the half-up integer average runs on positive
          // operands only (truncating vs flooring division agree there)
          intDiv(col("sum_logp_micro") * -1 + intDiv(col("n_tok"), lit(2)),
            col("n_tok")).as("avg_neg_logp_micro"))
        .orderBy(col("doc_id"))
    },

    // TF-IDF top terms: the 3 most corpus-distinctive tokens per document
    // (tf × idf, idf = ln(N/df)). The idf table is vocabulary-sized
    // (broadcast); idf is quantized to micro-units so the tf×idf score is
    // integer math and the per-doc top-3 is engine-deterministic (ties
    // broken by token). One doc_id shuffle for tf, one window pass.
    "q_text_tfidf" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val tok = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("tok"))
      val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
      val tf = tok.groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("tf"))
      val idf = tf.groupBy(col("tok"))
        .agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(nDocs)) // 1-row broadcast total, no collect
        .withColumn("idf_micro",
          micro(log(col("n_docs") / col("df").cast("double"))))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("tok"))
      tf.join(broadcast(idf), Seq("tok"))
        .withColumn("score", col("tf") * col("idf_micro"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("rnk"), col("tok"), col("tf"),
          col("idf_micro"), col("score"))
        .orderBy(col("doc_id"), col("rnk"))
    },

    // CORPUS N-GRAM DIVERSITY (the dataset-card repetitiveness readout —
    // the corpus-level complement of q_text_repetition's per-document
    // scores): per source, CROSS-document trigram statistics — total vs
    // distinct occurrences (type-token ratio), hapax share (trigrams seen
    // once — high = diverse, low = templated), and the occurrence share
    // of the source's top-20 trigrams (boilerplate concentration, the
    // self-BLEU-shaped signal). Scale shape: trigram counts are ONE
    // map-combinable hash agg; the shuffle carries xxhash64 trigram
    // hashes, never trigram text — valid because no output column names
    // a trigram, and the top-20 SUM is tie-invariant (rank-20 ties have
    // equal counts), so the hash-order tie-break cannot change any
    // output value. Per-source rollup is catalog-sized.
    "q_ngram_diversity" -> { (s, dir) =>
      val c = t(s, dir, "documents")
        .select(col("source"),
          expr("filter(split(text, ' '), t -> length(t) > 0)").as("w"))
        .filter(size(col("w")) >= 3)
        .select(col("source"), explode(expr(
          "transform(sequence(1, size(w) - 2), " +
          "i -> xxhash64(array_join(slice(w, i, 3), ' ')))")).as("g3"))
        .groupBy(col("source"), col("g3"))
        .agg(count(lit(1)).as("cnt"))
      c.withColumn("rn", row_number().over(
          Window.partitionBy(col("source"))
            .orderBy(col("cnt").desc, col("g3"))))
        .groupBy(col("source"))
        .agg(sum(col("cnt")).as("n3_total"),
          count(lit(1)).as("n3_distinct"),
          sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("n3_hapax"),
          micro(count(lit(1)).cast("double") /
            sum(col("cnt")).cast("double")).as("ttr_micro"),
          micro(sum(when(col("rn") <= 20, col("cnt")).otherwise(0L))
            .cast("double") / sum(col("cnt")).cast("double"))
            .as("top20_share_micro"),
          micro(sum(when(col("cnt") === 1, 1L).otherwise(0L))
            .cast("double") / count(lit(1)).cast("double"))
            .as("hapax_share_micro"))
        .orderBy(col("source"))
    },

    // BM25 RETRIEVAL (Robertson/Spärck Jones probabilistic ranking, the
    // Lucene/Elasticsearch default — public formula): score a fixed set
    // of keyword queries against the whole corpus and return the top-5
    // documents per query. Lucene-form idf
    // ln((N - df + 0.5)/(df + 0.5) + 1), k1 = 1.2, b = 0.75, length
    // normalization dl/avgdl computed as dl*N/sum_dl so every input stays
    // an exact integer until the one fixed-order double formula per
    // (term, doc); each term's contribution is micro-floored THEN summed
    // as BIGINT, so cross-engine float drift cannot accumulate.
    // Scale shape: the query table and its df counts are MODEL-sized →
    // broadcast; tf rows semi-join against the broadcast terms (map-side
    // prune of the corpus-sized tf table); the only corpus shuffles are
    // the tf/dl aggs any index build pays. Top-k is a per-query window
    // over the hit set, not a global sort.
    "q_text_bm25" -> { (s, dir) =>
      val w5 = Window.partitionBy(col("query_id"))
        .orderBy(col("score_micro").desc, col("doc_id"))
      bm25Hits(s, dir)
        .withColumn("rnk", row_number().over(w5).cast("long"))
        .filter(col("rnk") <= 5)
        .select(col("query_id"), col("rnk"), col("doc_id"),
          col("n_terms_hit"), col("score_micro"))
        .orderBy(col("query_id"), col("rnk"))
    },

    // RETRIEVAL EVALUATION — MRR@20 (mean reciprocal rank, the standard
    // first-relevant-hit metric for search/RAG shortlists; Voorhees,
    // TREC-8 1999). Grades EXACTLY the ranking q_text_bm25 ships (shared
    // bm25Hits definition). Relevance is derived from the data with zero
    // randomness: a doc is relevant to a query iff it contains EVERY
    // query term (n_terms_hit == the query's term count — 322/20/284
    // docs per query at sf0.01, non-vacuous). rr_micro = 1e6 div
    // first_rel_rank is exact integer math; the query_id = 0 row is the
    // corpus MRR (half-up mean over the fixed query set). Scale shape:
    // the bm25Hits build is the only corpus-sized work (tf/dl aggs, the
    // index build's own shuffles); ranking is a per-query window over
    // the PRUNED hit set, the readout is query-domain sized.
    "q_eval_mrr" -> { (s, dir) =>
      import s.implicits._
      val nq = bm25QueryTerms.groupBy(_._1).view.mapValues(_.size.toLong)
        .toSeq.sorted.toDF("query_id", "n_terms")
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score_micro").desc, col("doc_id"))
      val per = bm25Hits(s, dir)
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 20)
        .join(broadcast(nq), "query_id")
        .withColumn("rel",
          when(col("n_terms_hit") === col("n_terms"), 1L).otherwise(0L))
        .groupBy(col("query_id").cast("long").as("query_id"))
        .agg(sum(col("rel")).as("n_rel_top20"),
          coalesce(min(when(col("rel") === 1L, col("rnk"))), lit(0L))
            .as("first_rel_rank"))
        .withColumn("rr_micro",
          when(col("first_rel_rank") > 0L,
            intDiv(lit(1000000L), col("first_rel_rank")))
            .otherwise(lit(0L)))
      val overall = per.groupBy().agg(
          sum(col("n_rel_top20")).as("n_rel_top20"),
          count(lit(1)).as("nquery"),
          sum(col("rr_micro")).as("srr"))
        .select(lit(0L).as("query_id"), col("n_rel_top20"),
          lit(0L).as("first_rel_rank"),
          intDiv(col("srr") + intDiv(col("nquery"), lit(2L)),
            col("nquery")).as("rr_micro"))
      per.unionByName(overall).orderBy(col("query_id"))
    },

    // RETRIEVAL EVALUATION — MAP@20 (mean average precision, the
    // TREC-standard order-sensitive metric between MRR's first-hit
    // myopia and NDCG's graded gains): per query, AP = (Σ over
    // relevant docs at rank r ≤ 20 of P@r) / min(n_rel, 20), with the
    // q_eval_mrr relevance labels (all query terms present) and the
    // shared bm25Hits ranking. Exact two-stage integer flooring,
    // mirrored verbatim in the oracle: each P@r micro-floors as
    // relcnt·1e6 div r BEFORE the sum (the BM25 per-term recipe), the
    // AP division floors once at the end; the query_id = 0 row is the
    // half-up corpus MAP. A query with relevant docs but none in its
    // top-20 reads AP = 0 through the left join, not a dropped row.
    // Scale shape: identical to q_eval_mrr — the hit build is the
    // corpus-sized work; rank and cumulative-relevance come from ONE
    // window pass (same partition/order spec), readout query-domain.
    "q_eval_map" -> { (s, dir) =>
      import s.implicits._
      val nq = bm25QueryTerms.groupBy(_._1).view.mapValues(_.size.toLong)
        .toSeq.sorted.toDF("query_id", "n_terms")
      // severed once: feeds the n_rel rollup AND the ranked cut
      val labeled = bm25Hits(s, dir)
        .join(broadcast(nq), "query_id")
        .withColumn("rel",
          when(col("n_terms_hit") === col("n_terms"), 1L).otherwise(0L))
        .select(col("query_id"), col("doc_id"), col("score_micro"),
          col("rel"))
        .localCheckpoint(eager = true)
      val nRel = labeled.groupBy(col("query_id").cast("long").as("query_id"))
        .agg(sum(col("rel")).as("n_rel"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score_micro").desc, col("doc_id"))
      val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val per = labeled
        .withColumn("rnk", row_number().over(w).cast("long"))
        .withColumn("relcnt", sum(col("rel")).over(wCum))
        .filter(col("rnk") <= 20 && col("rel") === 1L)
        .withColumn("term_micro",
          intDiv(col("relcnt") * 1000000L, col("rnk")))
        .groupBy(col("query_id").cast("long").as("query_id"))
        .agg(count(lit(1)).as("n_rel_top20"),
          sum(col("term_micro")).as("sum_prec"))
      val perQ = nRel.join(per, Seq("query_id"), "left")
        .na.fill(0L, Seq("n_rel_top20", "sum_prec"))
        .select(col("query_id"), col("n_rel"), col("n_rel_top20"),
          // a query with ZERO relevant docs reads AP = 0 deterministically
          // instead of dividing by least(0, 20) — engine-dependent NULL/
          // error behavior (ADVICE r13; non-vacuous only because current
          // fixtures guarantee ≥ 1 relevant doc per query)
          when(col("n_rel") > 0L,
            intDiv(col("sum_prec"), least(col("n_rel"), lit(20L))))
            .otherwise(0L).as("ap_micro"))
      val overall = perQ.groupBy().agg(
          sum(col("n_rel")).as("n_rel"),
          sum(col("n_rel_top20")).as("n_rel_top20"),
          count(lit(1)).as("nquery"), sum(col("ap_micro")).as("sap"))
        .select(lit(0L).as("query_id"), col("n_rel"),
          col("n_rel_top20"),
          intDiv(col("sap") + intDiv(col("nquery"), lit(2L)),
            col("nquery")).as("ap_micro"))
      perQ.unionByName(overall).orderBy(col("query_id"))
    },

    // RETRIEVAL EVALUATION — NDCG@10 with GRADED relevance (Järvelin &
    // Kekäläinen 2002), gain = n_terms_hit (0..3 distinct query terms
    // matched — graded by construction, no judgment file needed). The
    // 1/log2(rank+1) discounts are a FIXED integer micro table (10
    // literals, identical on both engines — a live log2 would be the
    // one cross-engine fp hazard in the formula); DCG/IDCG are then
    // pure int64 sums and ndcg_micro = dcg·1e6 div idcg. IDCG ranks the
    // SAME hit set by gain (ideal reordering of what retrieval could
    // have returned). The two rankings share one checkpointed hit set
    // (the round-12 aliased-subtree lesson applied at birth). Scale
    // shape: identical to q_eval_mrr — corpus work is the shared hit
    // build, both windows run per-query over pruned hits.
    "q_eval_ndcg" -> { (s, dir) =>
      val discs = Seq(1000000L, 630930L, 500000L, 430677L, 386853L,
        356207L, 333333L, 315465L, 301030L, 289065L)
      def disc = element_at(array(discs.map(lit): _*), col("rnk").cast("int"))
      // severed once: dcg and idcg branches both window this agg result
      val h = bm25Hits(s, dir)
        .select(col("query_id"), col("doc_id"), col("n_terms_hit"),
          col("score_micro"))
        .localCheckpoint(eager = true)
      val ws = Window.partitionBy(col("query_id"))
        .orderBy(col("score_micro").desc, col("doc_id"))
      val wg = Window.partitionBy(col("query_id"))
        .orderBy(col("n_terms_hit").desc, col("doc_id"))
      val dcg = h.withColumn("rnk", row_number().over(ws).cast("long"))
        .filter(col("rnk") <= 10)
        .groupBy(col("query_id").cast("long").as("query_id"))
        .agg(sum(col("n_terms_hit") * disc).as("dcg_micro"))
      val idcg = h.withColumn("rnk", row_number().over(wg).cast("long"))
        .filter(col("rnk") <= 10)
        .groupBy(col("query_id").cast("long").as("query_id"))
        .agg(sum(col("n_terms_hit") * disc).as("idcg_micro"))
      dcg.join(idcg, "query_id")
        .select(col("query_id"), col("dcg_micro"), col("idcg_micro"),
          intDiv(col("dcg_micro") * lit(1000000L), col("idcg_micro"))
            .as("ndcg_micro"))
        .orderBy(col("query_id"))
    },

    // HASHING-TRICK linear classifier — the fastText-shaped quality
    // filter modern pipelines gate documents with (classifier-based
    // filtering à la GPT-3/LLaMA web-quality models): every word unigram
    // and bigram hashes into one of 4096 feature buckets (char-fold
    // polynomial hash, all integer arithmetic) and the document's score
    // is the sum of the bucket weights. The hashing trick means there is
    // NO vocabulary table at all — not even a broadcast join (contrast
    // q_text_perplexity's broadcast LM): scoring is per-row higher-order-
    // function arithmetic inside whole-stage codegen, ZERO shuffle at any
    // corpus size beyond the oracle's final sort. A trained model would
    // ship its weight array as one broadcast array literal — identical
    // plan shape. Weights here are a fixed integer mix of the bucket id
    // (exact on any engine), so scores hash-match bit-for-bit.
    "q_text_classifier" -> { (s, dir) =>
      // ONE native codegen'd pass over the raw text (tokens + unigram +
      // bigram sums together) — replaces the 4-HigherOrderFunction tower
      // that interpreted ~2·n_tok lambdas and materialized every bigram
      // string per document (round-9 BENCH: 2.2 s, #2 hot spot). Bit-
      // identical arithmetic: graft.functions.TextOps scaladoc.
      t(s, dir, "documents")
        .withColumn("cs",
          graft.functions.TextOps.classifier_scores(col("text")))
        .withColumn("n_tok", col("cs").getItem(0).cast("int"))
        .withColumn("uni_score", col("cs").getItem(1))
        .withColumn("bi_score", col("cs").getItem(2))
        // n_feat = n_tok + n_bigrams; bigrams only exist past 1 token
        .withColumn("n_feat",
          (col("n_tok") + greatest(col("n_tok") - 1, lit(0))).cast("int"))
        .select(col("doc_id"), col("n_tok"), col("n_feat"),
          col("uni_score"), col("bi_score"),
          (col("uni_score") + col("bi_score")).as("score"),
          micro((col("uni_score") + col("bi_score")).cast("double") /
            col("n_feat").cast("double"))
            .as("avg_w_micro"),
          when(col("uni_score") + col("bi_score") >= 0, "keep")
            .otherwise("drop").as("label"))
        .orderBy(col("doc_id"))
    },

    // CONDITIONAL bigram language model with add-1 smoothing — the
    // KenLM-shaped CCNet/RefinedWeb perplexity gate with a real
    // conditional model (q_text_perplexity's unigram LM scores tokens
    // independent of context; fluency filtering needs p(w|prev)). The LM
    // trains on a FIXED reference subset (sources src0-src3 — the
    // Wikipedia analog of CCNet's KenLM) and scores the WHOLE corpus, so
    // the unseen-bigram smoothing path executes for real on out-of-domain
    // documents (n_unseen is observably non-zero for non-train sources).
    // Scale shape: the LM is an aggregate of the REFERENCE corpus, not
    // the corpus being scored — model-sized at 100 TB, broadcast on both
    // probe joins (the n-gram analog of the Bloom/blocklist small sides);
    // scoring is map-only per bigram plus one doc_id aggregate. Per-token
    // log-probs are micro-quantized before the per-doc sum (exact integer
    // rollup, engine- and order-independent); the context counts derive
    // from the bigram counts (cu = Σ_w2 cb) so both probe tables share
    // one aggregation subtree.
    "q_text_lm_bigram" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      // '<s>' sentence-start padding: every (len>0)-token document emits
      // exactly len bigrams, and w1='<s>' carries the start-of-doc
      // distribution (unpadded, the first real token would go unscored)
      def bigrams(df: org.apache.spark.sql.DataFrame) = df
        .withColumn("p", expr(
          "concat(array('<s>'), filter(split(text, ' '), tk -> length(tk) > 0))"))
        .filter(size(col("p")) > 1)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(p) - 1), " +
          "i -> struct(element_at(p, i) AS w1, element_at(p, i + 1) AS w2))"))
          .as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      val train = bigrams(
        docs.filter(col("source").isin("src0", "src1", "src2", "src3")))
      val cb = train.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("cb"))
      val cu = cb.groupBy(col("w1")).agg(sum(col("cb")).as("cu"))
      // V = |{w2}| + 1: the +1 reserves smoothing mass for tokens the
      // reference corpus never emitted (a pure add-1 over the train vocab
      // would assign unseen-w2 bigrams probability (0+1)/(cu+V) exactly
      // like a seen-once one — fine — but V must cover the OOV event so
      // probabilities stay < 1 even for cu=0 contexts)
      val vocab = cb.agg(
        (countDistinct(col("w2")) + 1).cast("double").as("v"))
      bigrams(docs)
        .join(broadcast(cb), Seq("w1", "w2"), "left")
        .join(broadcast(cu), Seq("w1"), "left")
        .crossJoin(broadcast(vocab)) // 1-row broadcast, no collect
        .withColumn("logp_micro", micro(log(
          (coalesce(col("cb"), lit(0L)) + 1).cast("double") /
            (coalesce(col("cu"), lit(0L)).cast("double") + col("v")))))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_big"),
          sum(when(col("cb").isNull, 1L).otherwise(0L)).as("n_unseen"),
          sum(col("logp_micro")).as("sum_logp_micro"))
        .select(col("doc_id"), col("n_big"), col("n_unseen"),
          col("sum_logp_micro"),
          // negate first: half-up integer average on positive operands
          intDiv(col("sum_logp_micro") * -1 + intDiv(col("n_big"), lit(2)),
            col("n_big")).as("avg_neg_logp_micro"))
        .orderBy(col("doc_id"))
    },

    // Token-distribution ENTROPY per document — the Shannon quality
    // signal (low entropy = repetitive/templated text; the Gopher-rule
    // complement to q_text_repetition's explicit n-gram ratios):
    // H = ln n − (Σ c·ln c)/n over the doc's token counts. Determinism
    // via the q_text_perplexity recipe: each c·ln c term is micro-
    // quantized FIRST (one log per distinct token — bit-identical on
    // both engines), so the per-doc sum and the final average are pure
    // int64 — no fp fold order anywhere. One explode + two hash aggs,
    // both partial-aggregated; no window, no join.
    "q_text_entropy" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n"),
          count(lit(1)).as("n_distinct"),
          sum(micro(col("c").cast("double") * log(col("c").cast("double"))))
            .as("sum_clnc_micro"))
        .select(col("doc_id"), col("n"), col("n_distinct"),
          (micro(log(col("n").cast("double")))
            - intDiv(col("sum_clnc_micro") + intDiv(col("n"), lit(2)),
              col("n"))).as("entropy_micro"))
        .orderBy(col("doc_id"))
    },

    // Distributed BPE training under the oracle gate (round-8 VERDICT
    // #6): training is an iterative driver-coordinated loop no static
    // SQL can replay, so it gets the driver-certified-boolean pattern
    // (q_approx_sketches' shape) — structural invariants of the LEARNED
    // merge table, each pinned TRUE by the oracle, so a regression in
    // merge ordering, tie-breaking, count accounting, vocabulary
    // construction, or encoding flips a boolean and fails the driver's
    // hash gate, not just BpeSpec. The invariants:
    //  - counts_monotone: the winning pair count never increases with
    //    rank (a new pair's weight is bounded by the count of the merge
    //    that created its symbol — the classic BPE argmax property; a
    //    broken argmax or stale histogram breaks it immediately);
    //  - tiebreak_round0_crosscheck: round 0's (count DESC, l, r)
    //    argmax recomputed through an INDEPENDENT formulation
    //    (posexplode pairs, not the transform lambda) equals merge 0 —
    //    tie-break or pair-derivation drift shows up here;
    //  - compound_symbols_derivable (+ has_compound_merges to prove the
    //    check is not vacuous): every multi-char symbol referenced by a
    //    merge is the concatenation of an EARLIER merge — the
    //    merge-table prefix property encodeWord's rank replay relies on;
    //  - encode_fixpoint_topwords: re-encoding the 20 most frequent
    //    corpus words with the learned table reconstructs each word and
    //    compresses it (the train==encode fixpoint on real data);
    //  - ranks_dense / min_count_respected: table bookkeeping.
    // Scale: training reads the corpus once (vocabulary-sized histogram
    // thereafter — operators/Bpe.scala); the cross-check is one more
    // histogram aggregate; the output is 7 rows whatever the corpus.
    "q_bpe_invariants" -> { (s, dir) =>
      import graft.operators.Bpe
      import s.implicits._
      val docs = t(s, dir, "documents")
      // ONE corpus aggregation feeds training, the round-0 cross-check
      // AND the top-word list (r16 — the three separate corpus
      // explode+agg passes were the query's whole residual cost after
      // the driver-local training cutover): the histogram row for a word
      // is (its characters, its corpus count), so the word itself is
      // array_join(syms) and top-20-by-count reads off the cache.
      val hist = Bpe.wordHistogram(docs, "text").cache()
      val merges = Bpe.trainOnHistogram(hist, numMerges = 24)
      // independent round-0 argmax: posexplode adjacency instead of the
      // training loop's transform+try_element_at lambda
      val top0 = hist
        .select(col("cnt"), col("syms"), posexplode(col("syms")))
        .toDF("cnt", "syms", "i", "l")
        .filter(col("i") < size(col("syms")) - 1)
        .select(col("l"), element_at(col("syms"), col("i") + 2).as("r"),
          col("cnt"))
        .groupBy(col("l"), col("r")).agg(sum(col("cnt")).as("c"))
        .orderBy(desc("c"), asc("l"), asc("r")).limit(1)
        .collect().head
      val topWords = hist
        .select(array_join(col("syms"), "").as("w"), col("cnt"))
        .orderBy(desc("cnt"), asc("w")).limit(20)
        .collect().map(_.getString(0)).toSeq
      hist.unpersist()
      val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
      val concats = merges.map(m => m.left + m.right).toSet
      def derivable(sym: String, rank: Int): Boolean =
        sym.length == 1 || merges.take(rank)
          .exists(e => e.left + e.right == sym)
      val checks: Seq[(String, Boolean)] = Seq(
        "counts_monotone" ->
          merges.sliding(2).forall(w =>
            w.length < 2 || w(0).cnt >= w(1).cnt),
        "tiebreak_round0_crosscheck" ->
          (merges.nonEmpty &&
            (top0.getString(0), top0.getString(1), top0.getLong(2)) ==
              ((merges.head.left, merges.head.right, merges.head.cnt))),
        "has_compound_merges" ->
          merges.exists(m => m.left.length > 1 || m.right.length > 1),
        "compound_symbols_derivable" ->
          merges.forall(m =>
            derivable(m.left, m.rank) && derivable(m.right, m.rank)),
        "encode_fixpoint_topwords" ->
          topWords.forall { w =>
            val toks = Bpe.encodeWord(w, ranks)
            toks.mkString("") == w && toks.length <= w.length &&
              toks.forall(t => t.length == 1 || concats.contains(t))
          },
        "ranks_dense" -> (merges.map(_.rank) == (0 until merges.length)),
        "min_count_respected" -> merges.forall(_.cnt >= 2L))
      checks.toDF("invariant", "holds").orderBy(col("invariant"))
    },

    // GOPHER-RULE QUALITY FILTER (the MassiveText heuristics, Rae et
    // al. 2021 §A1.1 — the published rule set the ad-hoc
    // q_text_quality blend approximates): per document, word count in
    // [50, 100k], mean word length in [3, 10], ≥2 stop-word hits. The
    // per-word pass (counts, code-point lengths, stopword/short-word
    // hits) is ONE native gopher_stats expression — map-only over the
    // scan, no HigherOrderFunction, no shuffle (the
    // classifier_scores/repetition_stats tier); the micro-unit ratios
    // and the boolean verdict are ordinary codegen'd arithmetic on its
    // struct. At 100 TB this stacks onto any document scan for free and
    // feeds the same keep/drop joins as q_filter_blocklist.
    "q_text_gopher" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.TextOps.gopher_stats(col("text")).as("g"))
        .select(col("doc_id"), col("g.n_words").as("n_words"),
          col("g.sum_wlen").as("sum_wlen"),
          col("g.stop_hits").as("stop_hits"),
          col("g.short_words").as("short_words"))
        .withColumn("mean_wlen_micro",
          intDiv(col("sum_wlen") * lit(1000000L) +
            intDiv(col("n_words"), lit(2L)), col("n_words")))
        .withColumn("short_frac_micro",
          intDiv(col("short_words") * lit(1000000L) +
            intDiv(col("n_words"), lit(2L)), col("n_words")))
        .withColumn("passes_gopher",
          col("n_words").between(50L, 100000L) &&
            col("mean_wlen_micro").between(3000000L, 10000000L) &&
            col("stop_hits") >= 2L)
        .orderBy(col("doc_id"))
    },

    // INVERTED INDEX (posting lists): the retrieval-side artifact the
    // BM25/tf-idf queries presuppose — term → document frequency, total
    // term frequency, and the head of the doc_id-ordered posting list
    // ("page 0", 32 entries — a real index pages postings; df/total_tf
    // stay exact over ALL postings). Terms are word BIGRAMS (the corpus'
    // 31-word unigram vocabulary is degenerate — bigrams give a 916-term
    // domain; the q_bigram_pmi construction). Shape at 100 TB: explode →
    // one hash agg on (term, doc) with map-side combine → one agg on
    // term; posting heads are bounded arrays (32 entries), so no group
    // materializes an unbounded list — the full-postings variant would
    // shard pages by (term, doc_id range) instead.
    "q_inverted_index" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, greatest(size(w) - 1, 1)), " +
            "i -> concat(w[i-1], ' ', w[i]))")).as("term"))
        .filter(col("term").isNotNull)
        .groupBy(col("term"), col("doc_id"))
        .agg(count(lit(1)).as("tf"))
        .groupBy(col("term"))
        .agg(count(lit(1)).as("df"),
          sum(col("tf")).as("total_tf"),
          array_join(slice(transform(
            array_sort(collect_list(struct(col("doc_id"), col("tf")))),
            p => concat_ws(":", p.getField("doc_id"), p.getField("tf"))),
            1, 32), ",").as("postings_head"))
        .orderBy(col("df").desc, col("term"))
    },

    // SHARDED FULL POSTINGS — the q_inverted_index "full-postings
    // variant" shipped (round-10 VERDICT minor trade #3): EVERY posting
    // materializes, paged 32 per (term, page) row, page assignment by
    // doc_id rank so pages are ordered and range-addressable
    // (first_doc/last_doc per page = the page index a term lookup
    // seeks). Scale shape: one (term, doc) hash agg (map-combinable),
    // one per-term rank window, one (term, page) agg whose groups are
    // BOUNDED at 32 entries by construction — a 10^9-posting term is
    // 3×10^7 bounded rows, never one unbounded group; the window
    // partitions by term (the same exchange the page agg reuses).
    "q_inverted_postings" -> { (s, dir) =>
      val tf = t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, greatest(size(w) - 1, 1)), " +
            "i -> concat(w[i-1], ' ', w[i]))")).as("term"))
        .filter(col("term").isNotNull)
        .groupBy(col("term"), col("doc_id"))
        .agg(count(lit(1)).as("tf"))
      tf.withColumn("pg", intDiv(
          (row_number().over(Window.partitionBy(col("term"))
            .orderBy(col("doc_id"))) - 1).cast("long"), lit(32L)))
        .groupBy(col("term"), col("pg"))
        .agg(count(lit(1)).as("n_in_page"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"),
          array_join(transform(
            array_sort(collect_list(struct(col("doc_id"), col("tf")))),
            p => concat_ws(":", p.getField("doc_id"), p.getField("tf"))),
            ",").as("postings"))
        .orderBy(col("term"), col("pg"))
    },

    // RECIPROCAL RANK FUSION (Cormack/Clarke/Buettcher SIGIR'09 — the
    // standard hybrid-retrieval merge): fuse the BM25 ranking with a
    // query-likelihood (Jelinek-Mercer smoothed) ranking of the SAME
    // query set and return the top-5 fused documents per query. The two
    // scorers deliberately disagree (BM25 saturates tf and rewards rare
    // terms; QL length-normalizes against the collection model), which
    // is exactly when RRF earns its keep. rrf = Σ 1/(60 + rank) over
    // the rankings that retrieved the doc in their top 20, each term
    // micro-floored then summed as BIGINT (the BM25 fp discipline —
    // ranks are integers, so both engines fuse bit-identically).
    // Scale shape: ONE shared hits table (tf pruned map-side against
    // the broadcast query terms) feeds both scorers; the rank windows
    // and the fused top-k all partition by query_id — model-sized
    // per-query state, corpus-sized work only in the tf/dl aggs any
    // retrieval run pays once.
    "q_retrieval_rrf" -> { (s, dir) =>
      val wf = Window.partitionBy(col("query_id"))
        .orderBy(col("rrf_micro").desc, col("doc_id"))
      dualRanks(s, dir)
        .withColumn("rrf_micro",
          when(col("rank_bm25") <= 20,
            micro(lit(1.0) / (lit(60.0) + col("rank_bm25").cast("double"))))
            .otherwise(0L) +
          when(col("rank_ql") <= 20,
            micro(lit(1.0) / (lit(60.0) + col("rank_ql").cast("double"))))
            .otherwise(0L))
        .filter(col("rrf_micro") > 0)
        .withColumn("rnk", row_number().over(wf).cast("long"))
        .filter(col("rnk") <= 5)
        .select(col("query_id"), col("rnk"), col("doc_id"),
          col("rrf_micro"), col("rank_bm25"), col("rank_ql"))
        .orderBy(col("query_id"), col("rnk"))
    },

    // RANKER AGREEMENT — Kendall tau between the two rankers fusion
    // fuses (Kendall 1938; the diagnostic that says whether RRF is
    // combining INDEPENDENT evidence or averaging one signal twice):
    // per query, tau-a over the BM25 top-20 shortlist with BOTH
    // rankers' full ranks (the shared dualRanks definition — the
    // metric grades exactly what q_retrieval_rrf fuses; the
    // INTERSECTION of the two top-20s would be the naive universe, and
    // it is EMPTY on this corpus — length normalization pushes QL's
    // top-20 onto different docs entirely — so the shortlist-under-
    // both-ranks form is what stays non-vacuous; it reads moderate
    // agreement (tau 0.37–0.63 at sf0.01) WITHIN the shortlist while
    // the shortlists themselves diverge: exactly the two-sided
    // readout that says RRF fusion is combining genuinely different
    // evidence rather than averaging one signal twice). Row-number
    // ranks are strict, so every pair is concordant or discordant and
    // tau = (C − D)/P with P = pairs; the possibly-negative numerator
    // goes through the positive-shift division ((C − D + P)·1e6 div P
    // − 1e6 with C − D + P = 2C ≥ 0, the q_seasonal_strength recipe)
    // so Spark's truncation equals DuckDB's floor. Scale shape: the
    // corpus-sized work is the shared hit build; the pair self-join is
    // ≤ 190 rows per query BY CONSTRUCTION (the q_dtw bounded-pair
    // posture).
    "q_eval_rankcorr" -> { (s, dir) =>
      // severed once: both pair sides read this ≤ 20-row-per-query cut
      val r = dualRanks(s, dir)
        .filter(col("rank_bm25") <= 20)
        .select(col("query_id"), col("doc_id"),
          col("rank_bm25"), col("rank_ql"))
        .localCheckpoint(eager = true)
      val a = r.select(col("query_id"), col("doc_id").as("da"),
        col("rank_bm25").as("ba"), col("rank_ql").as("qa"))
      val b = r.select(col("query_id"), col("doc_id").as("db"),
        col("rank_bm25").as("bb"), col("rank_ql").as("qb"))
      val nc = r.groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_common"))
      a.join(b, Seq("query_id")).filter(col("da") < col("db"))
        .withColumn("conc",
          (((col("ba") < col("bb")) && (col("qa") < col("qb"))) ||
            ((col("ba") > col("bb")) && (col("qa") > col("qb"))))
            .cast("long"))
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_pairs"), sum(col("conc")).as("concordant"))
        .join(nc, "query_id")
        .select(col("query_id").cast("long").as("query_id"),
          col("n_common"), col("n_pairs"), col("concordant"),
          (col("n_pairs") - col("concordant")).as("discordant"),
          // tau = (C − D)/P = (2C − P)/P; shifted numerator (C − D) + P
          // = 2C is non-negative, so trunc == floor on both engines
          (intDiv(lit(2L) * col("concordant") * 1000000L, col("n_pairs"))
            - lit(1000000L)).as("tau_micro"))
        .orderBy(col("query_id"))
    },

    // CORPUS-COMPOSITION DRIFT — per-source KL divergence of the
    // hashed-bigram distribution against the whole corpus (Kullback &
    // Leibler 1951; the text-side sibling of q_drift_psi's numeric
    // PSI): the monitor an LLM-data pipeline runs per ingest source —
    // "which provider's text stopped looking like the corpus?".
    // KL(P_src ‖ P_corpus) over Laplace-smoothed 8192-bucket
    // hashed-bigram LMs (the q_dsir_select bucket canon: md5 first-8-
    // hex mod 8192, bit-identical on both engines). Cross-engine
    // determinism: each bucket's contribution is quantized to NANO
    // int64 BEFORE the sum (the per-term-micro-then-sum recipe — a raw
    // double sum would be summation-order sensitive), and the
    // (8192 − observed) unobserved-bucket remainder is one closed-form
    // constant per source, so the completed KL is ≥ 0 by construction.
    // Scale shape: ONE fact-sized bigram explode (checkpointed — it
    // feeds the corpus counts and the per-source counts), then
    // everything is bucket-domain × source-domain bounded: the terms
    // relation is ≤ 8192 × n_sources rows BY CONSTRUCTION at any
    // corpus size (the declared bounded cross join), one hash agg to
    // the source-domain readout.
    "q_text_kl_drift" -> { (s, dir) =>
      val bg = t(s, dir, "documents")
        .select(col("source"),
          expr("filter(split(text, ' '), t -> length(t) > 0)").as("w"))
        .filter(size(col("w")) >= 2)
        .select(col("source"),
          explode(expr("transform(sequence(1, size(w) - 1), " +
            "i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"))
            .as("g"))
        .select(col("source"),
          pmod(conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long"),
            lit(8192L)).as("b"))
        .localCheckpoint(eager = true)
      val cs = bg.groupBy(col("b")).agg(count(lit(1)).as("c"))
      val srcCnt = bg.groupBy(col("source"), col("b"))
        .agg(count(lit(1)).as("sc"))
      val tots = srcCnt.groupBy(col("source"))
        .agg(sum(col("sc")).as("n_src"))
      val corp = cs.agg(sum(col("c")).as("ns"), count(lit(1)).as("nb"))
      val ps = (coalesce(col("sc"), lit(0L)) + lit(1.0)) /
        (col("n_src") + lit(8192.0))
      val pc = (col("c") + lit(1.0)) / (col("ns") + lit(8192.0))
      val p0s = lit(1.0) / (col("n_src") + lit(8192.0))
      val p0c = lit(1.0) / (col("ns") + lit(8192.0))
      cs.crossJoin(broadcast(tots)) // bucket-domain × source-domain
        .join(srcCnt, Seq("source", "b"), "left")
        .crossJoin(broadcast(corp)) // 1-row corpus totals, no collect
        .withColumn("term_nano",
          floor(ps * (log(ps) - log(pc)) * 1000000000.0 + 0.5)
            .cast("long"))
        .groupBy(col("source"))
        .agg(sum(col("term_nano")).as("tsum"), max(col("nb")).as("nb"),
          max(col("n_src")).as("n_src"), max(col("ns")).as("ns"))
        .select(col("source"),
          (col("tsum") + (lit(8192L) - col("nb")) *
            floor(p0s * (log(p0s) - log(p0c)) * 1000000000.0 + 0.5)
              .cast("long")).as("kl_nano"),
          col("n_src").as("n_bigrams"))
        .orderBy(col("source"))
    },

    // DIVERSIFIED RETRIEVAL — greedy Maximal Marginal Relevance
    // (Carbonell & Goldstein 1998) over the q_text_bm25 hit pipeline:
    // relevance ranks alone return near-duplicates of the best hit;
    // every production RAG pipeline re-ranks the shortlist so the next
    // pick trades relevance against similarity to what is ALREADY
    // picked (gain = λ·rel − (1−λ)·max-sim-to-selected, λ = 0.7,
    // scaled ×10 to stay integer: 7·rel − 3·maxsim). ALL-INTEGER and
    // fully deterministic: rel = the certified BM25 micro sum for one
    // 5-term query; sim = token-set Jaccard micro between CANDIDATES
    // (|A∩B|·1e6 // |A∪B| over the distinct-token sets tf already
    // holds); ties break by doc_id, so Spark's greedy and the oracle's
    // recursive CTE (one LATERAL argmax per step, the q_pack_sequences
    // bounded-unroll precedent) pick identical docs. Scale shape: the
    // only fact-sized work is the tokenize scan + the (doc, token)
    // hash agg (checkpointed ONCE — it feeds both the query-term
    // scoring and the candidate token sets; at 100 TB it is served by
    // the persisted q_retrieval_index postings instead of recomputed);
    // the candidate pool is top-20 by (rel, doc_id) via a distributed
    // TakeOrdered, the pairwise sim stage is ≤ 190 pairs BY
    // CONSTRUCTION, and the greedy k = 10 loop runs on a documented
    // model-sized driver collect (20 + 190 rows, constant at any
    // corpus size).
    "q_retrieval_mmr" -> { (s, dir) =>
      import s.implicits._
      val terms = Seq("stream", "window", "agg", "hash", "join")
      val qt = terms.toDF("term")
      val tf = t(s, dir, "documents")
        .select(col("doc_id"),
          expr("filter(split(text, ' '), t -> length(t) > 0)").as("w"))
        .select(col("doc_id"), size(col("w")).cast("long").as("dl"),
          explode(col("w")).as("tk"))
        .groupBy(col("doc_id"), col("dl"), col("tk"))
        .agg(count(lit(1)).as("tf"))
        .localCheckpoint(eager = true) // feeds scoring AND token sets
      val corp = tf.groupBy(col("doc_id")).agg(first(col("dl")).as("dl"))
        .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      val tfq = tf.join(broadcast(qt), col("tk") === col("term"))
      val dfx = tfq.groupBy(col("tk")).agg(count(lit(1)).as("df"))
      val idf = log((col("n_docs").cast("double") - col("df").cast("double")
          + 0.5) / (col("df").cast("double") + 0.5) + 1.0)
      val tfc = (col("tf").cast("double") * 2.2) /
        (col("tf").cast("double") + lit(1.2) * (lit(0.25) + lit(0.75) *
          ((col("dl").cast("double") * col("n_docs").cast("double")) /
            col("sum_dl").cast("double"))))
      val cand = tfq
        .join(broadcast(dfx.withColumnRenamed("tk", "dtk")),
          col("tk") === col("dtk"))
        .crossJoin(broadcast(corp)) // 1-row corpus totals, no collect
        .withColumn("c_micro", micro(idf * tfc))
        .groupBy(col("doc_id")).agg(sum(col("c_micro")).as("rel"))
        .orderBy(col("rel").desc, col("doc_id")).limit(20) // TakeOrdered
        .localCheckpoint(eager = true) // feeds sim build + the greedy
      val ctok = tf.join(broadcast(cand.select(col("doc_id"))), "doc_id")
        .select(col("doc_id"), col("tk"))
      val csz = ctok.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val sims = ctok.as("a")
        .join(ctok.as("b"), col("a.tk") === col("b.tk") &&
          col("a.doc_id") =!= col("b.doc_id"))
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .agg(count(lit(1)).as("i"))
        .join(broadcast(csz.select(col("doc_id").as("da"),
          col("sz").as("sa"))), "da")
        .join(broadcast(csz.select(col("doc_id").as("db"),
          col("sz").as("sb"))), "db")
        .select(col("da"), col("db"),
          intDiv(col("i") * 1000000L, col("sa") + col("sb") - col("i"))
            .as("s"))
      // model-sized driver collect: 20 candidates + ≤190 sim pairs,
      // constant at any corpus size (the q_pack_sequences policy)
      val cs = cand.collect().map(r => r.getLong(0) -> r.getLong(1))
        .sortBy { case (id, rel) => (-rel, id) }
      val sm = sims.collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val chosen = scala.collection.mutable.ArrayBuffer.empty[Long]
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long)]
      // emits min(10, |pool|) rows: a pool smaller than k (rare terms —
      // or the ScaleBench word-suffix replica, where the fixed query
      // terms match nothing and the pool is EMPTY) must rank what
      // exists, not crash; the oracle's recursive CTE terminates the
      // same way (no LATERAL row → recursion stops)
      for (rk <- 1 to math.min(10, cs.length)) {
        val (doc, rel, gain) = cs.iterator
          .filterNot { case (id, _) => chosen.contains(id) }
          .map { case (id, rel) =>
            val ms = chosen.iterator
              .map(c => sm.getOrElse((id, c), 0L)).maxOption.getOrElse(0L)
            (id, rel, 7L * rel - 3L * ms)
          }
          .reduceLeft { (x, y) =>
            if (y._3 > x._3 || (y._3 == x._3 && y._1 < x._1)) y else x
          }
        chosen += doc
        out += ((rk.toLong, doc, rel, gain))
      }
      out.toSeq.toDF("rk", "doc_id", "rel_micro", "mmr_gain")
        .orderBy(col("rk"))
    },

    // GRAPH-BASED KEYWORD EXTRACTION — TextRank (Mihalcea & Tarau
    // 2004): rank a source's candidate keywords by their stationary
    // importance in the word co-occurrence graph rather than raw
    // frequency — TF-IDF's blind spot is a mid-frequency term that
    // co-occurs with everything central. Candidates = tokens ≥ 4 chars
    // (the stopword-ish cut); edges join ADJACENT candidates within
    // each document (window 2 over the filtered sequence), undirected,
    // weight = the source's corpus-wide co-occurrence count. Scoring =
    // FOUR fixed synchronous PageRank rounds, damping 17/20, each
    // per-edge contribution quantized as ONE truncating int64 division
    // intDiv(17·w·r, 20·W_u) — int64 sums are order-free, so the
    // rounds are bit-stable and the DuckDB oracle unrolls them exactly
    // (the q_label_prop fixed-round argument; no libm, no doubles
    // anywhere). Scale shape: the only corpus-sized work is the
    // adjacent-pair explode feeding one (source, u, v) hash agg; every
    // round is one node-keyed join + one (source, node) hash agg over
    // VOCAB-sized tables (Heaps-law-bounded, not corpus-bounded),
    // lineage severed per round by localCheckpoint; rounds are FIXED.
    "q_text_textrank" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val ws = filter(split(col("text"), " "),
        w => length(w) >= 4)
      val pairs = t(s, dir, "documents")
        .select(col("source"), ws.as("ws"))
        .select(col("source"), explode(expr(
          "transform(sequence(1, greatest(size(ws) - 1, 1)), " +
            "i -> struct(ws[i-1] AS x, ws[i] AS y))")).as("p"))
        .filter(col("p.x") =!= col("p.y"))
        .select(col("source"), least(col("p.x"), col("p.y")).as("u"),
          greatest(col("p.x"), col("p.y")).as("v"))
      val e = pairs.groupBy(col("source"), col("u"), col("v"))
        .agg(count(lit(1)).as("w"))
      val und = e.unionAll(e.select(col("source"), col("v").as("u"),
        col("u").as("v"), col("w")))
      // (source, u, v, w, wu): the weighted adjacency with each source
      // node's total out-weight attached — vocab-sized, severed once,
      // read by all four rounds
      val undW = und.join(
        und.groupBy(col("source"), col("u")).agg(sum(col("w")).as("wu")),
        Seq("source", "u"))
        .localCheckpoint(eager = true)
      var r = undW.select(col("source"), col("u").as("word"))
        .distinct()
        .withColumn("r", lit(1000000L))
        .localCheckpoint(eager = true)
      for (_ <- 1 to 4) {
        r = undW
          .join(r.withColumnRenamed("word", "u"), Seq("source", "u"))
          .groupBy(col("source"), col("v").as("word"))
          .agg((lit(150000L) + sum(intDiv(lit(17L) * col("w") * col("r"),
            lit(20L) * col("wu")))).as("r"))
          .localCheckpoint(eager = true)
      }
      val wtop = Window.partitionBy(col("source"))
        .orderBy(col("r").desc, col("word"))
      r.withColumn("rnk", row_number().over(wtop).cast("long"))
        .filter(col("rnk") <= 10)
        .select(col("source"), col("rnk"), col("word"),
          col("r").as("rank_micro"))
        .orderBy(col("source"), col("rnk"))
    }
  )

  /** DuckDB mirror of [[wgtExpr]] — the ONE duck-side copy of the
    * classifier token weight, shared by the q_text_classifier,
    * q_pipeline_clean and q_sample_quality oracles (two copies of a
    * canon are one precision fix away from divergence). */
  private[queries] def wgtSqlDuck(v: String): String =
    s"(((list_reduce(list_prepend(CAST(0 AS BIGINT), " +
    s"range(1, length($v) + 1)), " +
    s"(h, i) -> (h * 31 + ascii(substr($v, CAST(i AS INT), 1))) " +
    s"% 1000003) % 4096) * 2654435761) % 1000003) % 2001 - 1000"

  /** Integer weight of one classifier token (q_text_classifier's exact
    * formula): bucket = charfold(v) % 4096, then an integer scramble of
    * the bucket id into [-1000, 1000] — shared with the composite
    * cleaning pipeline (q_pipeline_clean). Since round 10 the hot path
    * runs graft.functions.TextOps.classifierScores (native, one-pass);
    * this HOF form is retained as the pinned canon TextExpressionsSpec
    * verifies the native expression against. */
  private[graft] def wgtExpr(v: String): String =
    s"(((aggregate(sequence(1, length($v)), CAST(0 AS BIGINT), " +
    s"(h, i) -> (h * 31 + ascii(substring($v, i, 1))) % 1000003) " +
    s"% 4096) * 2654435761) % 1000003) % 2001 - 1000"

  /** The full classifier document score (unigrams + bigrams) as ONE
    * Spark SQL expression over a pre-split token-array column — the
    * q_text_classifier decision value, reusable inside other plans.
    * Bigram STRINGS materialize in an inner transform before weighting:
    * wgtExpr's own lambda binds `i` for char positions, so an outer
    * index lambda feeding it directly would be variable-captured. */
  private[graft] def classifierScoreFromTokens(wCol: String): String =
    s"(aggregate(transform($wCol, tk -> ${wgtExpr("tk")}), " +
    s"CAST(0 AS BIGINT), (a, x) -> a + x) + " +
    s"CASE WHEN size($wCol) > 1 THEN " +
    s"aggregate(transform(transform(sequence(1, size($wCol) - 1), " +
    s"i -> concat(element_at($wCol, i), '_', element_at($wCol, i + 1))), " +
    s"tk -> ${wgtExpr("tk")}), CAST(0 AS BIGINT), (a, x) -> a + x) " +
    s"ELSE CAST(0 AS BIGINT) END)"

  /** The fixed keyword-query set for the BM25 retrieval family —
    * (query_id, term); ONE definition shared by q_text_bm25 and the
    * retrieval-evaluation harnesses so the metrics grade exactly the
    * ranking the retrieval query ships. */
  private[graft] val bm25QueryTerms: Seq[(Int, String)] = Seq(
    (1, "hash"), (1, "join"), (2, "dup"), (2, "scan"),
    (3, "stream"), (3, "window"), (3, "agg"))

  /** The BM25 scored hit set — (query_id, doc_id, n_terms_hit,
    * score_micro), one row per (query, matching doc). Lucene-form idf
    * ln((N - df + 0.5)/(df + 0.5) + 1), k1 = 1.2, b = 0.75, length
    * normalization dl·N/sum_dl so every input stays an exact integer
    * until the one fixed-order double formula per (term, doc); each
    * term's contribution is micro-floored THEN summed as BIGINT, so
    * cross-engine float drift cannot accumulate. Scale shape: the query
    * table and its df counts are MODEL-sized → broadcast; tf rows
    * semi-join against the broadcast terms (map-side prune of the
    * corpus-sized tf table); the only corpus shuffles are the tf/dl
    * aggs any index build pays. DuckDB twin: [[bm25HitsSql]]. */
  /** ONE BM25 per-(term, doc) micro-contribution definition — shared by
    * [[bm25Hits]] (the oracle-gated batch ranking) and the engine's
    * persisted-postings GET /search serving path (Engine.searchFrame),
    * so the served ranking cannot drift from the gated formula (the
    * tagSkew/skewReadout no-drift discipline applied to retrieval).
    * Lucene-form idf ln((N − df + 0.5)/(df + 0.5) + 1), k1 = 1.2,
    * b = 0.75, length normalization dl·N/sum_dl; every input is an
    * exact integer, ONE fixed-order double formula, micro-floored
    * half-up per term before any summation. */
  /** ONE tokenizer definition for the engine's retrieval serving family
    * (round-14 VERDICT #3): a token is a maximal run of Unicode letters
    * (\p{L}) or decimal digits (\p{Nd}) after lowercasing — the
    * codepoint-class split, so Cyrillic/Greek/accented words tokenize
    * like ASCII instead of vanishing (the old `[^a-z0-9]+` split made
    * every non-Latin document unfindable via /search). Documented CJK
    * trade: an unsegmented Han/kana run is ONE token — an exact-run
    * query finds it, sub-word recall needs an n-gram analyzer (the
    * Lucene CJKAnalyzer move), out of scope here. Shared VERBATIM by
    * Engine.buildSearchIndex / refreshSearchIndex / the stale-read
    * direct scan, the /search query-term parser, and the DuckDB oracle
    * twin [[searchTokensSql]] — Java regex and DuckDB's RE2 agree on
    * the \p{L}/\p{Nd} categories: the Spark side is pinned on
    * Cyrillic/CJK fixtures in SearchStoreSpec, and the CROSS-ENGINE
    * agreement is oracle-gated by q_search_merge, whose corpus carries
    * a Greek 'Ψ9' token tokenized by searchTokens on the engine side
    * and by [[searchTokensSql]] in the DuckDB oracle. Locale caveat,
    * documented: query-term lowercasing uses Locale.ROOT while Spark's
    * lower() folds per its collation rules — they agree everywhere but
    * a Turkish-default-locale JVM's dotted-I (outside this deployment's
    * posture). */
  private[graft] val tokenSplitRe = "[^\\p{L}\\p{Nd}]+"

  /** Spark side of the shared tokenizer: value -> array of tokens. */
  private[graft] def searchTokens(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    filter(split(lower(c), tokenSplitRe), t => length(t) > 0)

  /** DuckDB twin of [[searchTokens]] over a SQL expression. */
  private[graft] def searchTokensSql(e: String): String =
    s"list_filter(regexp_split_to_array(lower($e), " +
      s"'[^\\p{L}\\p{Nd}]+'), t -> length(t) > 0)"

  private[graft] def bm25Micro(tf: org.apache.spark.sql.Column,
      df: org.apache.spark.sql.Column, dl: org.apache.spark.sql.Column,
      nDocs: org.apache.spark.sql.Column,
      sumDl: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val idf = log((nDocs.cast("double") - df.cast("double") + 0.5) /
      (df.cast("double") + 0.5) + 1.0)
    val tfc = (tf.cast("double") * 2.2) /
      (tf.cast("double") + lit(1.2) * (lit(0.25) + lit(0.75) *
        ((dl.cast("double") * nDocs.cast("double")) /
          sumDl.cast("double"))))
    micro(idf * tfc)
  }

  private[graft] def bm25Hits(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qt = bm25QueryTerms.toDF("query_id", "term")
    val d = t(s, dir, "documents")
      .select(col("doc_id"),
        expr("filter(split(text, ' '), t -> length(t) > 0)").as("w"))
    val dl = d.select(col("doc_id"), size(col("w")).cast("long").as("dl"))
    val corp = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = d.select(col("doc_id"), explode(col("w")).as("tk"))
      .groupBy(col("doc_id"), col("tk"))
      .agg(count(lit(1)).as("tf"))
    // tf pruned to query terms FIRST; df of a term == its row count here
    val tfq = tf.join(broadcast(qt.select(col("term")).distinct()),
      col("tk") === col("term")).drop("term")
    val dfx = tfq.groupBy(col("tk")).agg(count(lit(1)).as("df"))
    tfq
      .join(broadcast(qt), col("tk") === col("term"))
      .join(broadcast(dfx.withColumnRenamed("tk", "dtk")),
        col("tk") === col("dtk"))
      .join(dl, "doc_id")
      .crossJoin(broadcast(corp)) // 1-row corpus totals, no collect
      .withColumn("c_micro", bm25Micro(col("tf"), col("df"), col("dl"),
        col("n_docs"), col("sum_dl")))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_terms_hit"),
        sum(col("c_micro")).as("score_micro"))
  }

  /** DuckDB twin of [[bm25Hits]]: CTE chain ending in
    * `sc(query_id, doc_id, n_terms_hit, score_micro)` (plus `qt`, the
    * query-term table) — splice into any retrieval oracle's WITH list. */
  private[graft] val bm25HitsSql: String =
    """qt AS (
      |  SELECT * FROM (VALUES (1,'hash'),(1,'join'),(2,'dup'),(2,'scan'),
      |                        (3,'stream'),(3,'window'),(3,'agg'))
      |    AS t(query_id, term)),
      |d AS (SELECT doc_id, list_filter(string_split(text,' '),
      |        t -> length(t) > 0) AS w FROM documents),
      |dl AS (SELECT doc_id, len(w) AS dl FROM d),
      |corp AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
      |tok AS (SELECT doc_id, unnest(w) AS tk FROM d),
      |tf AS (SELECT doc_id, tk, count(*) AS tf FROM tok GROUP BY doc_id, tk),
      |df AS (SELECT tk, count(*) AS df FROM tf
      |       WHERE tk IN (SELECT term FROM qt) GROUP BY tk),
      |hits AS (
      |  SELECT q.query_id, f.doc_id, q.term, f.tf, x.df, l.dl,
      |         c.n_docs, c.sum_dl
      |  FROM qt q JOIN tf f ON f.tk = q.term JOIN df x ON x.tk = q.term
      |  JOIN dl l ON l.doc_id = f.doc_id CROSS JOIN corp c),
      |contrib AS (
      |  SELECT query_id, doc_id,
      |    CAST(floor(
      |      ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
      |         / (CAST(df AS DOUBLE) + 0.5) + 1.0) *
      |      ((CAST(tf AS DOUBLE) * 2.2) /
      |       (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
      |        ((CAST(dl AS DOUBLE) * CAST(n_docs AS DOUBLE))
      |         / CAST(sum_dl AS DOUBLE)))))
      |      * 1000000.0 + 0.5) AS BIGINT) AS c_micro
      |  FROM hits),
      |sc AS (SELECT query_id, doc_id,
      |         CAST(count(*) AS BIGINT) AS n_terms_hit,
      |         CAST(sum(c_micro) AS BIGINT) AS score_micro
      |       FROM contrib GROUP BY query_id, doc_id)""".stripMargin

  /** q_eval_auc's three stages as ONE shared definition each (the st39
    * one-definition recipe: the streaming twin st41 reuses them, so
    * streamed == batch AUC holds bit-for-bit by construction).
    * aucScored: map-only scoring — both shipped evaluators per doc.
    * aucGroups: the (evaluator, score-value) tagged count — the ONLY
    * stateful stage (score-domain bounded; complete-mode streaming agg
    * merges it additively). aucFromGroups: the exact tie-averaged
    * integer rank-sum readout over those groups. */
  private[graft] def aucScored(d: DataFrame): DataFrame =
    aucScoredKeyed(d, Nil)

  /** [[aucScored]] with extra passthrough SLICE columns from `d` (e.g.
    * source) — the disaggregated-evaluation entry point. */
  private[graft] def aucScoredKeyed(d: DataFrame,
      extra: Seq[String]): DataFrame = {
    val enArr = array(stopwords.toMap.apply("en").map(lit): _*)
    val ex = extra.map(col)
    val langidScored = d.withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) > 0)
      .select(lit("langid_s_en").as("evaluator") +: ex :+
        micro(size(filter(col("w"), tk => array_contains(enArr, tk)))
          .cast("double") / size(col("w"))).as("sc") :+
        when(col("lang") === "en", 1L).otherwise(0L).as("pos"): _*)
    val clsScored = d
      .withColumn("cs",
        graft.functions.TextOps.classifier_scores(col("text")))
      .withColumn("n_tok", col("cs").getItem(0).cast("long"))
      .withColumn("n_feat",
        col("n_tok") + greatest(col("n_tok") - 1L, lit(0L)))
      .filter(col("n_feat") > 0L)
      .select(lit("classifier_avg_w").as("evaluator") +: ex :+
        micro((col("cs").getItem(1) + col("cs").getItem(2))
          .cast("double") / col("n_feat").cast("double")).as("sc") :+
        when(col("lang") === "en", 1L).otherwise(0L).as("pos"): _*)
    langidScored.unionAll(clsScored)
  }

  private[graft] def aucGroups(scored: DataFrame): DataFrame =
    aucGroupsKeyed(scored, Seq("evaluator"))

  private[graft] def aucGroupsKeyed(scored: DataFrame,
      keys: Seq[String]): DataFrame =
    scored.groupBy((keys.map(col) :+ col("sc")): _*)
      .agg(count(lit(1)).as("cnt"), sum(col("pos")).as("pc"))

  private[graft] def aucFromGroups(g: DataFrame): DataFrame =
    aucFromGroupsKeyed(g, Seq("evaluator"))

  /** The exact tie-averaged rank-sum readout, generalized to any key
    * tuple (evaluator alone = q_eval_auc/st41; evaluator × source =
    * q_eval_subgroup). Degenerate slices (no positives or no
    * negatives — AUC undefined) are DROPPED, not zero-filled: a
    * one-class slice is a data problem the row's absence surfaces. */
  private[graft] def aucFromGroupsKeyed(g: DataFrame,
      keys: Seq[String]): DataFrame = {
    val kc = keys.map(col)
    val wC = Window.partitionBy(kc: _*).orderBy(col("sc"))
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("cum", coalesce(sum(col("cnt")).over(wC), lit(0L)))
      .groupBy(kc: _*)
      .agg(sum(col("pc")).as("np"),
        (sum(col("cnt")) - sum(col("pc"))).as("nn"),
        sum(col("pc") * (lit(2L) * col("cum") + col("cnt") + lit(1L)))
          .as("r2"))
      .filter(col("np") > 0L && col("nn") > 0L)
      .select(kc :+ col("np").as("n_pos") :+ col("nn").as("n_neg") :+
        intDiv((col("r2") - col("np") * (col("np") + lit(1L)))
          * lit(500000L), col("np") * col("nn")).as("auc_micro"): _*)
      .orderBy(kc: _*)
  }

  /** The language-ID scorer + argmax — ONE definition shared by
    * q_text_langid (the per-doc report) and q_eval_confusion (the
    * harness that grades it): per-language stopword-share micro scores
    * `s_<lang>`, `labeled` (the lang column), `predicted` (greatest
    * score, first-declared language wins ties). Map-only. */
  private[graft] def langidPredicted(d: DataFrame): DataFrame = {
    val scored = stopwords.foldLeft(
      d.withColumn("w", split(col("text"), " "))) {
      case (df, (l, words)) =>
        val arr = array(words.map(lit): _*)
        df.withColumn(s"s_$l",
          micro(size(filter(col("w"), tk => array_contains(arr, tk)))
            .cast("double") / size(col("w"))))
    }
    val g = greatest(stopwords.map { case (l, _) => col(s"s_$l") }: _*)
    val predicted = stopwords.foldRight(lit("und")) {
      case ((l, _), acc) => when(col(s"s_$l") === g, lit(l)).otherwise(acc)
    }
    // foldRight gives "first match wins" in declaration order
    scored.withColumn("labeled", col("lang"))
      .withColumn("predicted", predicted)
  }

  /** q_eval_confusion's readout over the (labeled, predicted, n) cell
    * table — class-domain sized (≤ |langs|² cells in, ≤ |langs| rows
    * out), shared so a streaming twin's additive cell state reads out
    * identically. FULL outer join keeps classes that are only ever
    * predicted or only ever labeled; guarded integer divisions. */
  private[graft] def confusionReadout(cells: DataFrame): DataFrame = {
    val byLabel = cells.groupBy(col("labeled").as("class"))
      .agg(sum(col("n")).as("n_labeled"),
        sum(when(col("predicted") === col("labeled"), col("n"))
          .otherwise(0L)).as("tp"))
    val byPred = cells.groupBy(col("predicted").as("class"))
      .agg(sum(col("n")).as("n_predicted"))
    val wAll = Window.partitionBy()
    byLabel.join(byPred, Seq("class"), "full_outer")
      .na.fill(0L, Seq("n_labeled", "tp", "n_predicted"))
      .withColumn("fp", col("n_predicted") - col("tp"))
      .withColumn("fn", col("n_labeled") - col("tp"))
      .withColumn("prec_micro",
        when(col("n_predicted") > 0L,
          intDiv(col("tp") * 1000000L, col("n_predicted"))).otherwise(0L))
      .withColumn("rec_micro",
        when(col("n_labeled") > 0L,
          intDiv(col("tp") * 1000000L, col("n_labeled"))).otherwise(0L))
      .withColumn("f1_micro",
        when(col("n_labeled") + col("n_predicted") > 0L,
          intDiv(col("tp") * 2000000L,
            col("n_labeled") + col("n_predicted"))).otherwise(0L))
      .withColumn("acc_micro",
        intDiv(sum(col("tp")).over(wAll) * 1000000L,
          sum(col("n_labeled")).over(wAll)))
      .select(col("class"), col("n_labeled"), col("n_predicted"),
        col("tp"), col("fp"), col("fn"), col("prec_micro"),
        col("rec_micro"), col("f1_micro"), col("acc_micro"))
      .orderBy(col("class"))
  }

  /** q_eval_calibration's two stages as shared definitions (the st41
    * recipe — the streaming twin st43 reuses them, so streamed == batch
    * holds bit-for-bit). calibrationBins: the ONLY stateful stage — a
    * (evaluator, bin) count/positive/score-sum rollup, bin =
    * clamp(sc div 100 000, 0, 9) (10 fixed-width buckets over the
    * micro score; additive across micro-batches). calibrationReadout:
    * half-up integer means, |gap|, and per-evaluator ECE over the
    * ≤ 2×10-row state. */
  private[graft] def calibrationBins(scored: DataFrame): DataFrame =
    scored.groupBy(col("evaluator"),
        greatest(least(intDiv(col("sc"), lit(100000L)), lit(9L)), lit(0L))
          .as("bin"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"),
        sum(col("sc")).as("ssc"))

  private[graft] def calibrationReadout(bins: DataFrame): DataFrame = {
    val we = Window.partitionBy(col("evaluator"))
    bins
      // POSITIVE-SHIFTED half-up mean (the q_seasonal_strength recipe):
      // sc ∈ [-1e9, 1e9] (classifier weights ∈ ±1000 → micro avg ±1e9),
      // so ssc + n·1e9 ≥ 0 and Spark's truncating IntegralDivide equals
      // DuckDB's flooring //; int64-safe to ~4.6e9 rows per bin.
      .withColumn("mean_sc_micro",
        intDiv(col("ssc") + col("n") * lit(1000000000L)
          + intDiv(col("n"), lit(2L)), col("n")) - lit(1000000000L))
      .withColumn("pos_rate_micro",
        intDiv(col("n_pos") * 1000000L + intDiv(col("n"), lit(2L)),
          col("n")))
      .withColumn("gap_micro",
        abs(col("mean_sc_micro") - col("pos_rate_micro")))
      .withColumn("ece_micro",
        intDiv(sum(col("n") * col("gap_micro")).over(we),
          sum(col("n")).over(we)))
      .select(col("evaluator"), col("bin"), col("n"), col("n_pos"),
        col("mean_sc_micro"), col("pos_rate_micro"), col("gap_micro"),
        col("ece_micro"))
      .orderBy(col("evaluator"), col("bin"))
  }

  /** The dual-ranker hit table — (query_id, doc_id, bm25_micro,
    * ql_score_micro, rank_bm25, rank_ql), one row per (query, matching
    * doc): BM25 (the q_text_bm25 formula) and Jelinek-Mercer query
    * likelihood ln(0.9·tf/dl + 0.1·ctf/sum_dl), each term contribution
    * micro-floored THEN summed; ONE shared definition for
    * q_retrieval_rrf (fusion) and q_eval_rankcorr (agreement), so the
    * correlation grades exactly the rankers fusion fuses. Scale shape:
    * identical to bm25Hits (broadcast query/df sides; tf/dl aggs are
    * the corpus shuffles) plus two per-query rank windows over the
    * PRUNED hit set. */
  private[graft] def dualRanks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qt = bm25QueryTerms.toDF("query_id", "term")
    val d = t(s, dir, "documents")
      .select(col("doc_id"),
        expr("filter(split(text, ' '), t -> length(t) > 0)").as("w"))
    val dl = d.select(col("doc_id"), size(col("w")).cast("long").as("dl"))
    val corp = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = d.select(col("doc_id"), explode(col("w")).as("tk"))
      .groupBy(col("doc_id"), col("tk"))
      .agg(count(lit(1)).as("tf"))
    val tfq = tf.join(broadcast(qt.select(col("term")).distinct()),
      col("tk") === col("term")).drop("term")
    val dfc = tfq.groupBy(col("tk"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("ctf"))
    val idf = log((col("n_docs").cast("double") - col("df").cast("double")
        + 0.5) / (col("df").cast("double") + 0.5) + 1.0)
    val tfc = (col("tf").cast("double") * 2.2) /
      (col("tf").cast("double") + lit(1.2) * (lit(0.25) + lit(0.75) *
        ((col("dl").cast("double") * col("n_docs").cast("double")) /
          col("sum_dl").cast("double"))))
    // Jelinek-Mercer: ln(0.9·tf/dl + 0.1·ctf/sum_dl), one fixed-order
    // double formula per (term, doc), micro-floored before the sum
    val ql = log((lit(0.9) * col("tf").cast("double")) /
        col("dl").cast("double") +
      (lit(0.1) * col("ctf").cast("double")) /
        col("sum_dl").cast("double"))
    val wb = Window.partitionBy(col("query_id"))
      .orderBy(col("bm25_micro").desc, col("doc_id"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("ql_score_micro").desc, col("doc_id"))
    tfq
      .join(broadcast(qt), col("tk") === col("term"))
      .join(broadcast(dfc.withColumnRenamed("tk", "dtk")),
        col("tk") === col("dtk"))
      .join(dl, "doc_id")
      .crossJoin(broadcast(corp)) // 1-row corpus totals, no collect
      .withColumn("bm_micro", micro(idf * tfc))
      .withColumn("ql_micro", micro(ql))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("bm_micro")).as("bm25_micro"),
        sum(col("ql_micro")).as("ql_score_micro"))
      .withColumn("rank_bm25", row_number().over(wb).cast("long"))
      .withColumn("rank_ql", row_number().over(wq).cast("long"))
  }

  /** DuckDB twin of [[dualRanks]]: CTE chain ending in
    * `rk(query_id, doc_id, bm25_micro, ql_score_micro, rank_bm25,
    * rank_ql)` — shared by the q_retrieval_rrf and q_eval_rankcorr
    * oracles. */
  private[graft] val dualRanksSql: String =
    """qt AS (
      |  SELECT * FROM (VALUES (1,'hash'),(1,'join'),(2,'dup'),(2,'scan'),
      |                        (3,'stream'),(3,'window'),(3,'agg'))
      |    AS t(query_id, term)),
      |d AS (SELECT doc_id, list_filter(string_split(text,' '),
      |        t -> length(t) > 0) AS w FROM documents),
      |dl AS (SELECT doc_id, len(w) AS dl FROM d),
      |corp AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
      |tok AS (SELECT doc_id, unnest(w) AS tk FROM d),
      |tf AS (SELECT doc_id, tk, count(*) AS tf FROM tok GROUP BY doc_id, tk),
      |dfc AS (SELECT tk, count(*) AS df, sum(tf) AS ctf FROM tf
      |        WHERE tk IN (SELECT term FROM qt) GROUP BY tk),
      |hits AS (
      |  SELECT q.query_id, f.doc_id, f.tf, x.df, x.ctf, l.dl,
      |         c.n_docs, c.sum_dl
      |  FROM qt q JOIN tf f ON f.tk = q.term JOIN dfc x ON x.tk = q.term
      |  JOIN dl l ON l.doc_id = f.doc_id CROSS JOIN corp c),
      |contrib AS (
      |  SELECT query_id, doc_id,
      |    CAST(floor(
      |      ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
      |         / (CAST(df AS DOUBLE) + 0.5) + 1.0) *
      |      ((CAST(tf AS DOUBLE) * 2.2) /
      |       (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
      |        ((CAST(dl AS DOUBLE) * CAST(n_docs AS DOUBLE))
      |         / CAST(sum_dl AS DOUBLE)))))
      |      * 1000000.0 + 0.5) AS BIGINT) AS bm_micro,
      |    CAST(floor(
      |      ln((0.9 * CAST(tf AS DOUBLE)) / CAST(dl AS DOUBLE) +
      |         (0.1 * CAST(ctf AS DOUBLE)) / CAST(sum_dl AS DOUBLE))
      |      * 1000000.0 + 0.5) AS BIGINT) AS ql_micro
      |  FROM hits),
      |sc AS (SELECT query_id, doc_id,
      |         CAST(sum(bm_micro) AS BIGINT) AS bm25_micro,
      |         CAST(sum(ql_micro) AS BIGINT) AS ql_score_micro
      |       FROM contrib GROUP BY query_id, doc_id),
      |rk AS (SELECT *,
      |         CAST(row_number() OVER (PARTITION BY query_id
      |           ORDER BY bm25_micro DESC, doc_id) AS BIGINT) AS rank_bm25,
      |         CAST(row_number() OVER (PARTITION BY query_id
      |           ORDER BY ql_score_micro DESC, doc_id) AS BIGINT) AS rank_ql
      |       FROM sc)""".stripMargin

  /** DuckDB twin of [[aucScored]]: CTE chain ending in
    * `u(evaluator, sc, pos)` — the tagged per-document scores both
    * evaluation oracles (q_eval_auc, q_eval_calibration) aggregate. */
  private lazy val aucScoredSql: String = {
    def wgtSql(v: String): String = TextQueries.wgtSqlDuck(v)
    val enArr = stopwords.toMap.apply("en")
      .map(w => s"'$w'").mkString("[", ",", "]")
    s"""lraw AS (SELECT lang, source, string_split(text, ' ') AS w
       |              FROM documents),
       |ls AS (SELECT source,
       |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
       |         CAST(floor(CAST(len(list_filter(w,
       |           t -> list_contains($enArr, t))) AS DOUBLE) / len(w)
       |           * 1000000.0 + 0.5) AS BIGINT) AS sc
       |       FROM lraw WHERE len(w) > 0),
       |cd AS (SELECT lang, source, list_filter(string_split(text, ' '),
       |                                tk -> length(tk) > 0) AS w
       |       FROM documents),
       |cb AS (SELECT lang, source, w, list_transform(range(1, len(w)),
       |         i -> w[i] || '_' || w[i + 1]) AS bg FROM cd),
       |cw AS (SELECT lang, source,
       |         COALESCE(CAST(list_sum(list_transform(w,
       |           tk -> ${wgtSql("tk")})) AS BIGINT), 0)
       |         + COALESCE(CAST(list_sum(list_transform(bg,
       |           tk -> ${wgtSql("tk")})) AS BIGINT), 0) AS score,
       |         len(w) + len(bg) AS nf
       |       FROM cb),
       |cls AS (SELECT source,
       |          CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
       |          CAST(floor(CAST(score AS DOUBLE) / CAST(nf AS DOUBLE)
       |            * 1000000.0 + 0.5) AS BIGINT) AS sc
       |        FROM cw WHERE nf > 0),
       |u AS (SELECT 'langid_s_en' AS evaluator, source, sc, pos FROM ls
       |      UNION ALL
       |      SELECT 'classifier_avg_w', source, sc, pos FROM cls)""".stripMargin
  }

  /** DuckDB twin of [[langidPredicted]]: CTE chain ending in
    * `pred(doc_id, labeled, s_de..s_zh, predicted)` — shared by the
    * q_text_langid report and the q_eval_confusion harness. */
  private lazy val langidPredSql: String =
    s"""d AS (SELECT *, string_split(text, ' ') AS w FROM documents),
       |scored AS (
       |  SELECT doc_id, lang AS labeled,
       |    ${stopwords.map { case (l, ws) => langScoreSql(l, ws) }.mkString(",\n    ")}
       |  FROM d),
       |pred AS (
       |  SELECT doc_id, labeled, s_de, s_en, s_es, s_fr, s_zh,
       |    CASE
       |      WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
       |      WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
       |      WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
       |      WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
       |      ELSE 'zh' END AS predicted
       |  FROM scored)""".stripMargin

  private def langScoreSql(l: String, words: Seq[String]): String = {
    val arr = words.map(w => s"'$w'").mkString("[", ",", "]")
    s"CAST(floor(CAST(len(list_filter(w, t -> list_contains($arr, t))) AS DOUBLE) / len(w) * 1000000.0 + 0.5) AS BIGINT) AS s_$l"
  }

  val oracle: Map[String, String] = Map(
    // the driver-certified-boolean gate: the oracle pins every learned-
    // merge-table invariant TRUE; a Spark-side regression emits false →
    // hash mismatch → the driver's gate fails (q_approx_sketches
    // pattern — the booleans ARE the data under test)
    "q_bpe_invariants" ->
      """SELECT * FROM (VALUES
        |  ('compound_symbols_derivable', TRUE),
        |  ('counts_monotone', TRUE),
        |  ('encode_fixpoint_topwords', TRUE),
        |  ('has_compound_merges', TRUE),
        |  ('min_count_respected', TRUE),
        |  ('ranks_dense', TRUE),
        |  ('tiebreak_round0_crosscheck', TRUE))
        |  AS t(invariant, holds)
        |ORDER BY invariant""".stripMargin,

    "q_text_repetition" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id,
        |        [array_to_string(w[i:i+1], ' ') FOR i IN range(1, greatest(len(w) - 1, 1) + 1)] AS g2,
        |        [array_to_string(w[i:i+2], ' ') FOR i IN range(1, greatest(len(w) - 2, 1) + 1)] AS g3
        |      FROM d),
        |base AS (SELECT doc_id, len(g2) AS n2, len(list_distinct(g2)) AS n2d,
        |                len(g3) AS n3, len(list_distinct(g3)) AS n3d
        |         FROM g),
        |cnts AS (SELECT doc_id, bg, count(*) AS cnt
        |         FROM (SELECT doc_id, unnest(g2) AS bg FROM g) GROUP BY doc_id, bg),
        |top AS (SELECT doc_id, bg, cnt FROM (
        |          SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, bg ASC) AS rn
        |          FROM cnts) WHERE rn = 1)
        |SELECT b.doc_id,
        |  CAST(b.n2 AS BIGINT) AS n_bigrams,
        |  CAST(floor(CAST(b.n2 - b.n2d AS DOUBLE) / CAST(b.n2 AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS dup_bigram_micro,
        |  CAST(floor(CAST(b.n3 - b.n3d AS DOUBLE) / CAST(b.n3 AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS dup_trigram_micro,
        |  t.bg AS top_bigram,
        |  CAST(t.cnt AS BIGINT) AS top_bigram_cnt,
        |  CAST(floor(CAST(t.cnt AS DOUBLE) / CAST(b.n2 AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS top_bigram_frac_micro
        |FROM base b JOIN top t USING (doc_id) ORDER BY doc_id""".stripMargin,

    "q35_text_stats" ->
      """WITH d AS (SELECT *, string_split(text, ' ') AS w FROM documents)
        |SELECT doc_id, lang,
        |  CAST(len(w) AS INT) AS n_tokens,
        |  length(text) AS len_chars,
        |  CAST(len(list_distinct(w)) AS INT) AS n_uniq,
        |  CAST(floor(CAST(list_sum(list_transform(w, t -> length(t))) AS DOUBLE) / len(w) * 1000000.0 + 0.5) AS BIGINT) AS mean_tok_len_micro,
        |  CAST(floor(CAST(len(list_distinct(w)) AS DOUBLE) / len(w) * 1000000.0 + 0.5) AS BIGINT) AS ttr_micro
        |FROM d ORDER BY doc_id""".stripMargin,

    // the two scorer CTEs reuse the verified q_text_langid /
    // q_text_classifier arithmetic verbatim; the rank-sum mirrors the
    // Spark side's group-by-score tie-averaged formulation
    "q_eval_auc" -> {
      s"""WITH $aucScoredSql,
         |g AS (SELECT evaluator, sc, CAST(count(*) AS BIGINT) AS cnt,
         |        CAST(sum(pos) AS BIGINT) AS pc
         |      FROM u GROUP BY 1, 2),
         |r AS (SELECT evaluator, cnt, pc,
         |        CAST(coalesce(sum(cnt) OVER (PARTITION BY evaluator
         |          ORDER BY sc ROWS BETWEEN UNBOUNDED PRECEDING AND
         |          1 PRECEDING), 0) AS BIGINT) AS cum
         |      FROM g)
         |SELECT evaluator, CAST(sum(pc) AS BIGINT) AS n_pos,
         |  CAST(sum(cnt) - sum(pc) AS BIGINT) AS n_neg,
         |  CAST((CAST(sum(pc * (2*cum + cnt + 1)) AS BIGINT)
         |        - CAST(sum(pc) AS BIGINT) * (CAST(sum(pc) AS BIGINT) + 1))
         |       * 500000
         |       // (CAST(sum(pc) AS BIGINT)
         |          * CAST(sum(cnt) - sum(pc) AS BIGINT))
         |    AS BIGINT) AS auc_micro
         |FROM r GROUP BY evaluator ORDER BY evaluator""".stripMargin
    },

    "q_text_langid" ->
      s"""WITH $langidPredSql
         |SELECT doc_id, labeled, s_de, s_en, s_es, s_fr, s_zh, predicted
         |FROM pred ORDER BY doc_id""".stripMargin,

    // same scored/argmax CTEs; class-domain rollups mirror
    // confusionReadout's guarded integer divisions (all numerators
    // non-negative, so // == truncation)
    "q_eval_confusion" ->
      s"""WITH $langidPredSql,
         |cells AS (SELECT labeled, predicted, count(*) AS n
         |          FROM pred GROUP BY 1, 2),
         |bl AS (SELECT labeled AS class,
         |         CAST(sum(n) AS BIGINT) AS n_labeled,
         |         CAST(sum(CASE WHEN predicted = labeled THEN n
         |                  ELSE 0 END) AS BIGINT) AS tp
         |       FROM cells GROUP BY 1),
         |bp AS (SELECT predicted AS class,
         |         CAST(sum(n) AS BIGINT) AS n_predicted
         |       FROM cells GROUP BY 1),
         |j AS (SELECT coalesce(bl.class, bp.class) AS class,
         |        coalesce(n_labeled, 0) AS n_labeled,
         |        coalesce(tp, 0) AS tp,
         |        coalesce(n_predicted, 0) AS n_predicted
         |      FROM bl FULL OUTER JOIN bp ON bl.class = bp.class)
         |SELECT class, n_labeled, n_predicted, tp,
         |  n_predicted - tp AS fp, n_labeled - tp AS fn,
         |  CAST(CASE WHEN n_predicted > 0
         |       THEN tp * 1000000 // n_predicted ELSE 0 END
         |    AS BIGINT) AS prec_micro,
         |  CAST(CASE WHEN n_labeled > 0
         |       THEN tp * 1000000 // n_labeled ELSE 0 END
         |    AS BIGINT) AS rec_micro,
         |  CAST(CASE WHEN n_labeled + n_predicted > 0
         |       THEN tp * 2000000 // (n_labeled + n_predicted) ELSE 0 END
         |    AS BIGINT) AS f1_micro,
         |  CAST(sum(tp) OVER () * 1000000 // sum(n_labeled) OVER ()
         |    AS BIGINT) AS acc_micro
         |FROM j ORDER BY class""".stripMargin,

    // same argmax CTEs + the classifier score carried per doc_id; the
    // same discordant counts and all-integer statistic
    "q_eval_mcnemar" -> {
      def wgtSql(v: String): String = TextQueries.wgtSqlDuck(v)
      s"""WITH $langidPredSql,
         |cd2 AS (SELECT doc_id, lang, list_filter(string_split(text, ' '),
         |                tk -> length(tk) > 0) AS w2
         |        FROM documents),
         |cb2 AS (SELECT doc_id, lang, w2,
         |          list_transform(range(1, len(w2)),
         |            i -> w2[i] || '_' || w2[i + 1]) AS bg
         |        FROM cd2),
         |cls2 AS (SELECT doc_id, lang,
         |          COALESCE(CAST(list_sum(list_transform(w2,
         |            tk -> ${wgtSql("tk")})) AS BIGINT), 0)
         |          + COALESCE(CAST(list_sum(list_transform(bg,
         |            tk -> ${wgtSql("tk")})) AS BIGINT), 0) AS score
         |        FROM cb2),
         |j AS (SELECT
         |        ((p.predicted = 'en') = (c.lang = 'en')) AS a_right,
         |        ((c.score >= 0) = (c.lang = 'en')) AS b_right
         |      FROM pred p JOIN cls2 c ON c.doc_id = p.doc_id),
         |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |        CAST(sum(CASE WHEN a_right AND b_right
         |             THEN 1 ELSE 0 END) AS BIGINT) AS both_right,
         |        CAST(sum(CASE WHEN NOT a_right AND NOT b_right
         |             THEN 1 ELSE 0 END) AS BIGINT) AS both_wrong,
         |        CAST(sum(CASE WHEN a_right AND NOT b_right
         |             THEN 1 ELSE 0 END) AS BIGINT) AS langid_only,
         |        CAST(sum(CASE WHEN NOT a_right AND b_right
         |             THEN 1 ELSE 0 END) AS BIGINT) AS classifier_only
         |      FROM j)
         |SELECT n, both_right, both_wrong, langid_only, classifier_only,
         |  CAST(CASE WHEN langid_only + classifier_only > 0 THEN
         |    (langid_only - classifier_only)
         |    * (langid_only - classifier_only) * 1000000
         |    // (langid_only + classifier_only) ELSE 0 END
         |    AS BIGINT) AS mcnemar_x2_micro
         |FROM g""".stripMargin
    },

    // same scored CTEs with the source slice carried through; the same
    // rank-sum readout keyed by (evaluator, source); the same
    // degenerate-slice drop
    "q_eval_subgroup" -> {
      s"""WITH $aucScoredSql,
         |g AS (SELECT evaluator, source, sc,
         |        CAST(count(*) AS BIGINT) AS cnt,
         |        CAST(sum(pos) AS BIGINT) AS pc
         |      FROM u GROUP BY 1, 2, 3),
         |r AS (SELECT evaluator, source, cnt, pc,
         |        CAST(coalesce(sum(cnt) OVER (
         |          PARTITION BY evaluator, source
         |          ORDER BY sc ROWS BETWEEN UNBOUNDED PRECEDING AND
         |          1 PRECEDING), 0) AS BIGINT) AS cum
         |      FROM g),
         |a AS (SELECT evaluator, source,
         |        CAST(sum(pc) AS BIGINT) AS n_pos,
         |        CAST(sum(cnt) - sum(pc) AS BIGINT) AS n_neg,
         |        CAST(sum(pc * (2*cum + cnt + 1)) AS BIGINT) AS r2
         |      FROM r GROUP BY 1, 2)
         |SELECT evaluator, source, n_pos, n_neg,
         |  CAST((r2 - n_pos * (n_pos + 1)) * 500000
         |       // (n_pos * n_neg) AS BIGINT) AS auc_micro
         |FROM a WHERE n_pos > 0 AND n_neg > 0
         |ORDER BY evaluator, source""".stripMargin
    },

    // same scored CTEs (aucScoredSql); the same clamp(sc div 1e5, 0, 9)
    // bin — DuckDB's flooring // differs from Spark's truncation only
    // for negative sc, where BOTH sides clamp to bin 0 — and the same
    // positive-shifted half-up mean (ssc + n·1e9 ≥ 0, so // ==
    // truncation; sc is bounded by ±1e9 since classifier weights are
    // ±1000)
    "q_eval_calibration" ->
      s"""WITH $aucScoredSql,
         |b AS (SELECT evaluator,
         |        greatest(least(sc // 100000, 9), 0) AS bin,
         |        CAST(count(*) AS BIGINT) AS n,
         |        CAST(sum(pos) AS BIGINT) AS n_pos,
         |        CAST(sum(sc) AS BIGINT) AS ssc
         |      FROM u GROUP BY 1, 2),
         |m AS (SELECT evaluator, CAST(bin AS BIGINT) AS bin, n, n_pos,
         |        CAST((ssc + n * 1000000000 + n // 2) // n
         |          - 1000000000 AS BIGINT) AS mean_sc_micro,
         |        CAST((n_pos * 1000000 + n // 2) // n AS BIGINT)
         |          AS pos_rate_micro
         |      FROM b),
         |g AS (SELECT *, abs(mean_sc_micro - pos_rate_micro) AS gap_micro
         |      FROM m)
         |SELECT evaluator, bin, n, n_pos, mean_sc_micro, pos_rate_micro,
         |  CAST(gap_micro AS BIGINT) AS gap_micro,
         |  CAST(sum(n * gap_micro) OVER (PARTITION BY evaluator)
         |       // sum(n) OVER (PARTITION BY evaluator) AS BIGINT)
         |    AS ece_micro
         |FROM g ORDER BY evaluator, bin""".stripMargin,

    "q_text_quality" ->
      s"""WITH $qualitySql
         |SELECT qm.doc_id,
         |  CAST(floor(stop_ratio * 1000000.0 + 0.5) AS BIGINT) AS stop_ratio_micro,
         |  CAST(floor(special_ratio * 1000000.0 + 0.5) AS BIGINT) AS special_ratio_micro,
         |  q.quality_micro
         |FROM qm JOIN q USING (doc_id) ORDER BY doc_id""".stripMargin,

    "q_text_fingerprint" ->
      """SELECT doc_id,
        |  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_text_levenshtein" ->
      """WITH d AS (
        |  SELECT doc_id, source, substr(text, 1, 60) AS tp,
        |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(levenshtein(a.tp, b.tp) AS INT) AS edit_dist
        |FROM d a JOIN d b ON a.source = b.source AND b.rn = a.rn + 1
        |WHERE levenshtein(a.tp, b.tp) <= 40
        |ORDER BY doc_a""".stripMargin,

    // duck's damerau_levenshtein IS the full Lowrance-Wagner metric the
    // native expression implements — integer equality, no tolerance
    "q_text_damerau" ->
      """WITH d AS (
        |  SELECT doc_id, source, substr(text, 1, 60) AS tp,
        |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(levenshtein(a.tp, b.tp) AS BIGINT) AS lev,
        |       CAST(damerau_levenshtein(a.tp, b.tp) AS BIGINT) AS dl,
        |       CAST(levenshtein(a.tp, b.tp) AS BIGINT)
        |         - CAST(damerau_levenshtein(a.tp, b.tp) AS BIGINT)
        |         AS transpo_gain
        |FROM d a JOIN d b ON a.source = b.source AND b.rn = a.rn + 1
        |WHERE damerau_levenshtein(a.tp, b.tp) <= 40
        |ORDER BY doc_a""".stripMargin,

    // identical semantics to q_text_levenshtein — Spark side differs
    // only in how the successor pairs are generated
    "q_text_levenshtein_blocked" ->
      """WITH d AS (
        |  SELECT doc_id, source, substr(text, 1, 60) AS tp,
        |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(levenshtein(a.tp, b.tp) AS INT) AS edit_dist
        |FROM d a JOIN d b ON a.source = b.source AND b.rn = a.rn + 1
        |WHERE levenshtein(a.tp, b.tp) <= 40
        |ORDER BY doc_a""".stripMargin,

    "q_text_tokens" ->
      """WITH d AS (SELECT *, string_split(text, ' ') AS w,
        |                  regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]') AS rtoks
        |           FROM documents)
        |SELECT doc_id,
        |  CAST(len(w) AS INT) AS n_ws_tokens,
        |  CAST(len(rtoks) AS INT) AS n_re_tokens,
        |  CAST(list_sum(list_transform(w, t -> CAST(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT) AS n_bpe_est,
        |  rtoks[1] AS first_tok
        |FROM d ORDER BY doc_id""".stripMargin,

    "q_text_redact" ->
      """WITH c AS (
        |  SELECT c_custkey,
        |         c_name || ' contact u' || CAST(c_custkey AS VARCHAR)
        |           || '@example.com or https://ex'
        |           || CAST(c_custkey % 7 AS VARCHAR) || '.org segment '
        |           || c_mktsegment AS raw
        |  FROM customer)
        |SELECT c_custkey,
        |  CAST(len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(raw, 'https?://[A-Za-z0-9./-]+')) AS INT) AS n_urls,
        |  regexp_replace(
        |    regexp_replace(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    'https?://[A-Za-z0-9./-]+', '<URL>', 'g') AS redacted
        |FROM c ORDER BY c_custkey""".stripMargin,

    "q_text_perplexity" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |             FROM documents),
        |lm AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY tok),
        |sc AS (SELECT tok,
        |         CAST(floor(ln(CAST(cnt AS DOUBLE) /
        |           CAST(sum(cnt) OVER (ORDER BY tok ROWS BETWEEN UNBOUNDED
        |             PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE))
        |           * 1000000.0 + 0.5) AS BIGINT) AS logp_micro
        |       FROM lm)
        |SELECT t.doc_id,
        |  CAST(count(*) AS BIGINT) AS n_tok,
        |  CAST(sum(s.logp_micro) AS BIGINT) AS sum_logp_micro,
        |  CAST((-sum(s.logp_micro) + count(*) // 2) // count(*) AS BIGINT)
        |    AS avg_neg_logp_micro
        |FROM tok t JOIN sc s ON s.tok = t.tok
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,

    "q_text_tfidf" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |             FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY doc_id, tok),
        |nd AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
        |idf AS (SELECT tok,
        |          CAST(floor(ln(n.n_docs / CAST(count(*) AS DOUBLE))
        |            * 1000000.0 + 0.5) AS BIGINT) AS idf_micro
        |        FROM tf, nd n GROUP BY tok, n.n_docs),
        |s AS (SELECT tf.doc_id, tf.tok, tf.tf, idf.idf_micro,
        |             tf.tf * idf.idf_micro AS score
        |      FROM tf JOIN idf USING (tok)),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY score DESC, tok) AS rnk FROM s)
        |SELECT doc_id, CAST(rnk AS INT) AS rnk, tok, CAST(tf AS BIGINT) AS tf,
        |       idf_micro, CAST(score AS BIGINT) AS score
        |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,

    // trigram strings here vs xxhash64 on the Spark side — equivalent
    // because outputs are count aggregates only and the top-20 sum is
    // tie-invariant
    "q_ngram_diversity" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |         list_filter(string_split(text, ' '),
        |                     t -> length(t) > 0) AS w
        |  FROM documents),
        |g AS (SELECT source,
        |        unnest([array_to_string(w[i:i+2], ' ')
        |                FOR i IN range(1, len(w) - 2 + 1)]) AS g3
        |      FROM d WHERE len(w) >= 3),
        |c AS (SELECT source, g3, count(*) AS cnt FROM g GROUP BY source, g3),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source
        |        ORDER BY cnt DESC, g3) AS rn FROM c)
        |SELECT source,
        |  CAST(sum(cnt) AS BIGINT) AS n3_total,
        |  CAST(count(*) AS BIGINT) AS n3_distinct,
        |  CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n3_hapax,
        |  CAST(floor(CAST(count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE)
        |    * 1000000.0 + 0.5) AS BIGINT) AS ttr_micro,
        |  CAST(floor(CAST(sum(CASE WHEN rn <= 20 THEN cnt ELSE 0 END)
        |      AS DOUBLE) / CAST(sum(cnt) AS DOUBLE)
        |    * 1000000.0 + 0.5) AS BIGINT) AS top20_share_micro,
        |  CAST(floor(CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)
        |      AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    * 1000000.0 + 0.5) AS BIGINT) AS hapax_share_micro
        |FROM r GROUP BY source ORDER BY source""".stripMargin,

    // identical fixed-order double formula; per-term micro floors summed
    // as BIGINT so float drift cannot accumulate across terms
    "q_text_bm25" ->
      s"""WITH $bm25HitsSql,
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY score_micro DESC, doc_id) AS rnk FROM sc)
        |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, doc_id, n_terms_hit,
        |       score_micro
        |FROM r WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,

    // identical ranking CTE; relevance = all query terms matched; the
    // same 1e6 // rank integer reciprocal and half-up corpus mean
    "q_eval_mrr" ->
      s"""WITH $bm25HitsSql,
        |nq AS (SELECT query_id, count(*) AS n_terms FROM qt GROUP BY 1),
        |r AS (SELECT sc.query_id, n_terms_hit, score_micro, doc_id,
        |        row_number() OVER (PARTITION BY sc.query_id
        |          ORDER BY score_micro DESC, doc_id) AS rnk
        |      FROM sc),
        |t20 AS (SELECT r.query_id, rnk,
        |          CASE WHEN n_terms_hit = n_terms THEN 1 ELSE 0 END AS rel
        |        FROM r JOIN nq ON nq.query_id = r.query_id
        |        WHERE rnk <= 20),
        |per AS (SELECT CAST(query_id AS BIGINT) AS query_id,
        |          CAST(sum(rel) AS BIGINT) AS n_rel_top20,
        |          CAST(coalesce(min(CASE WHEN rel = 1 THEN rnk END), 0)
        |            AS BIGINT) AS first_rel_rank
        |        FROM t20 GROUP BY 1),
        |perr AS (SELECT query_id, n_rel_top20, first_rel_rank,
        |           CAST(CASE WHEN first_rel_rank > 0
        |                THEN 1000000 // first_rel_rank ELSE 0 END
        |             AS BIGINT) AS rr_micro
        |         FROM per),
        |ov AS (SELECT CAST(0 AS BIGINT) AS query_id,
        |         CAST(sum(n_rel_top20) AS BIGINT) AS n_rel_top20,
        |         CAST(0 AS BIGINT) AS first_rel_rank,
        |         CAST((sum(rr_micro) + count(*) // 2) // count(*)
        |           AS BIGINT) AS rr_micro
        |       FROM perr)
        |SELECT * FROM perr UNION ALL SELECT * FROM ov
        |ORDER BY query_id""".stripMargin,

    // identical hit CTE and relevance labels; the same two-stage
    // flooring (per-P@r micro floor, then the AP floor) and half-up
    // corpus mean; missing-top-20 queries kept at 0 via the left join
    "q_eval_map" ->
      s"""WITH $bm25HitsSql,
        |nq AS (SELECT query_id, count(*) AS n_terms FROM qt GROUP BY 1),
        |lab AS (SELECT sc.query_id, doc_id, score_micro,
        |          CASE WHEN n_terms_hit = n_terms THEN 1 ELSE 0 END
        |            AS rel
        |        FROM sc JOIN nq ON nq.query_id = sc.query_id),
        |nr AS (SELECT CAST(query_id AS BIGINT) AS query_id,
        |         CAST(sum(rel) AS BIGINT) AS n_rel
        |       FROM lab GROUP BY 1),
        |r AS (SELECT query_id, rel,
        |        row_number() OVER (PARTITION BY query_id
        |          ORDER BY score_micro DESC, doc_id) AS rnk,
        |        sum(rel) OVER (PARTITION BY query_id
        |          ORDER BY score_micro DESC, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS relcnt
        |      FROM lab),
        |per AS (SELECT CAST(query_id AS BIGINT) AS query_id,
        |          CAST(count(*) AS BIGINT) AS n_rel_top20,
        |          CAST(sum(relcnt * 1000000 // rnk) AS BIGINT)
        |            AS sum_prec
        |        FROM r WHERE rnk <= 20 AND rel = 1 GROUP BY 1),
        |j AS (SELECT nr.query_id, nr.n_rel,
        |        CAST(coalesce(per.n_rel_top20, 0) AS BIGINT)
        |          AS n_rel_top20,
        |        CAST(CASE WHEN nr.n_rel > 0
        |             THEN coalesce(per.sum_prec, 0) // least(nr.n_rel, 20)
        |             ELSE 0 END AS BIGINT) AS ap_micro
        |      FROM nr LEFT JOIN per ON per.query_id = nr.query_id),
        |ov AS (SELECT CAST(0 AS BIGINT) AS query_id,
        |         CAST(sum(n_rel) AS BIGINT) AS n_rel,
        |         CAST(sum(n_rel_top20) AS BIGINT) AS n_rel_top20,
        |         CAST((sum(ap_micro) + count(*) // 2) // count(*)
        |           AS BIGINT) AS ap_micro
        |       FROM j)
        |SELECT * FROM j UNION ALL SELECT * FROM ov
        |ORDER BY query_id""".stripMargin,

    // identical hit CTE; the same fixed 10-entry integer discount table
    // (1e6/log2(rank+1), half-up) on both engines; ideal ranking by
    // gain DESC, doc_id over the same hit set
    "q_eval_ndcg" ->
      s"""WITH $bm25HitsSql,
        |disc AS (SELECT * FROM (VALUES (1,1000000),(2,630930),(3,500000),
        |           (4,430677),(5,386853),(6,356207),(7,333333),
        |           (8,315465),(9,301030),(10,289065)) AS t(rnk, d)),
        |rs AS (SELECT query_id, n_terms_hit,
        |         row_number() OVER (PARTITION BY query_id
        |           ORDER BY score_micro DESC, doc_id) AS rnk FROM sc),
        |rg AS (SELECT query_id, n_terms_hit,
        |         row_number() OVER (PARTITION BY query_id
        |           ORDER BY n_terms_hit DESC, doc_id) AS rnk FROM sc),
        |dcg AS (SELECT CAST(query_id AS BIGINT) AS query_id,
        |          CAST(sum(n_terms_hit * d) AS BIGINT) AS dcg_micro
        |        FROM rs JOIN disc USING (rnk) WHERE rnk <= 10 GROUP BY 1),
        |idcg AS (SELECT CAST(query_id AS BIGINT) AS query_id,
        |           CAST(sum(n_terms_hit * d) AS BIGINT) AS idcg_micro
        |         FROM rg JOIN disc USING (rnk) WHERE rnk <= 10 GROUP BY 1)
        |SELECT query_id, dcg_micro, idcg_micro,
        |       CAST(dcg_micro * 1000000 // idcg_micro AS BIGINT)
        |         AS ndcg_micro
        |FROM dcg JOIN idcg USING (query_id) ORDER BY query_id""".stripMargin,

    // identical integer arithmetic: char-fold hash via list_reduce (seed
    // prepended — DuckDB's reduce takes the first element as the
    // accumulator), same scramble, same sums
    "q_text_classifier" -> {
      def wgtSql(v: String): String = TextQueries.wgtSqlDuck(v)
      s"""WITH d AS (
         |  SELECT doc_id,
         |         list_filter(string_split(text, ' '),
         |                     tk -> length(tk) > 0) AS w
         |  FROM documents),
         |b AS (
         |  SELECT doc_id, w,
         |         list_transform(range(1, len(w)),
         |                        i -> w[i] || '_' || w[i + 1]) AS bg
         |  FROM d),
         |sc AS (
         |  SELECT doc_id, w, bg,
         |    COALESCE(CAST(list_sum(list_transform(w,
         |      tk -> ${wgtSql("tk")})) AS BIGINT), 0) AS uni_score,
         |    COALESCE(CAST(list_sum(list_transform(bg,
         |      tk -> ${wgtSql("tk")})) AS BIGINT), 0) AS bi_score
         |  FROM b)
         |SELECT doc_id,
         |  CAST(len(w) AS INT) AS n_tok,
         |  CAST(len(w) + len(bg) AS INT) AS n_feat,
         |  uni_score, bi_score,
         |  uni_score + bi_score AS score,
         |  CAST(floor(CAST(uni_score + bi_score AS DOUBLE)
         |    / CAST(len(w) + len(bg) AS DOUBLE) * 1000000.0 + 0.5)
         |    AS BIGINT) AS avg_w_micro,
         |  CASE WHEN uni_score + bi_score >= 0 THEN 'keep' ELSE 'drop' END
         |    AS label
         |FROM sc ORDER BY doc_id""".stripMargin
    },

    // identical arithmetic: same '<s>' padding, same add-1 ratio with the
    // numerator cast to DOUBLE before the divide, same micro floor, then
    // pure integer rollups
    "q_text_lm_bigram" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |         list_prepend('<s>', list_filter(string_split(text, ' '),
        |                      tk -> length(tk) > 0)) AS p
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, source,
        |         unnest(list_transform(range(1, len(p)),
        |           i -> struct_pack(w1 := p[i], w2 := p[i + 1]))) AS b
        |  FROM d WHERE len(p) > 1),
        |g AS (SELECT doc_id, source, b.w1 AS w1, b.w2 AS w2 FROM bg),
        |cb AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb FROM g
        |       WHERE source IN ('src0','src1','src2','src3')
        |       GROUP BY w1, w2),
        |cu AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS cu FROM cb GROUP BY w1),
        |v AS (SELECT CAST(count(DISTINCT w2) + 1 AS DOUBLE) AS v FROM cb),
        |sc AS (
        |  SELECT g.doc_id,
        |    CAST(floor(ln(CAST(COALESCE(cb.cb, 0) + 1 AS DOUBLE) /
        |      (CAST(COALESCE(cu.cu, 0) AS DOUBLE) + v.v)) * 1000000.0 + 0.5)
        |      AS BIGINT) AS logp_micro,
        |    CASE WHEN cb.cb IS NULL THEN 1 ELSE 0 END AS unseen
        |  FROM g
        |  LEFT JOIN cb ON cb.w1 = g.w1 AND cb.w2 = g.w2
        |  LEFT JOIN cu ON cu.w1 = g.w1
        |  CROSS JOIN v)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_big,
        |  CAST(sum(unseen) AS BIGINT) AS n_unseen,
        |  CAST(sum(logp_micro) AS BIGINT) AS sum_logp_micro,
        |  CAST((-sum(logp_micro) + count(*) // 2) // count(*) AS BIGINT)
        |    AS avg_neg_logp_micro
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // per-term micro quantization BEFORE the sum (perplexity recipe):
    // the only fp per term is one c*ln(c), bit-identical on both engines
    "q_text_entropy" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |cnt AS (
        |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
        |  FROM tok GROUP BY doc_id, tok),
        |agg AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS n_distinct,
        |    CAST(sum(CAST(floor(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
        |      * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_clnc_micro
        |  FROM cnt GROUP BY doc_id)
        |SELECT doc_id, n, n_distinct,
        |  CAST(floor(ln(CAST(n AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)
        |    - (sum_clnc_micro + n // 2) // n AS entropy_micro
        |FROM agg ORDER BY doc_id""".stripMargin,

    // the per-word pass as DuckDB list aggregates; half-up integer
    // micro ratios mirror the Spark intDiv arithmetic exactly
    "q_text_gopher" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |st AS (
        |  SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
        |    CAST(list_sum(list_transform(ws, x -> length(x)))
        |      AS BIGINT) AS sum_wlen,
        |    CAST(len(list_filter(ws,
        |      x -> x IN ('the','a','of','to','and','in')))
        |      AS BIGINT) AS stop_hits,
        |    CAST(len(list_filter(ws, x -> length(x) <= 3))
        |      AS BIGINT) AS short_words
        |  FROM w)
        |SELECT doc_id, n_words, sum_wlen, stop_hits, short_words,
        |  CAST((sum_wlen * 1000000 + n_words // 2) // n_words
        |    AS BIGINT) AS mean_wlen_micro,
        |  CAST((short_words * 1000000 + n_words // 2) // n_words
        |    AS BIGINT) AS short_frac_micro,
        |  (n_words BETWEEN 50 AND 100000
        |    AND (sum_wlen * 1000000 + n_words // 2) // n_words
        |      BETWEEN 3000000 AND 10000000
        |    AND stop_hits >= 2) AS passes_gopher
        |FROM st ORDER BY doc_id""".stripMargin,

    // posting heads: list(... ORDER BY doc_id) is already numerically
    // ordered, then sliced — no lexical string sort anywhere
    "q_inverted_index" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |bg AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(ws)),
        |    i -> ws[i] || ' ' || ws[i+1])) AS term
        |  FROM w),
        |tf AS (
        |  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
        |  FROM bg GROUP BY 1, 2)
        |SELECT term, CAST(count(*) AS BIGINT) AS df,
        |  CAST(sum(tf) AS BIGINT) AS total_tf,
        |  array_to_string(
        |    (list(doc_id || ':' || tf ORDER BY doc_id))[1:32], ',')
        |    AS postings_head
        |FROM tf GROUP BY term
        |ORDER BY df DESC, term""".stripMargin,

    "q_inverted_postings" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |bg AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(ws)),
        |    i -> ws[i] || ' ' || ws[i+1])) AS term
        |  FROM w),
        |tf AS (
        |  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
        |  FROM bg GROUP BY 1, 2),
        |pp AS (
        |  SELECT term, doc_id, tf,
        |    (row_number() OVER (PARTITION BY term ORDER BY doc_id) - 1)
        |      // 32 AS pg
        |  FROM tf)
        |SELECT term, CAST(pg AS BIGINT) AS pg,
        |  CAST(count(*) AS BIGINT) AS n_in_page,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
        |  array_to_string(list(doc_id || ':' || tf ORDER BY doc_id), ',')
        |    AS postings
        |FROM pp GROUP BY term, pg
        |ORDER BY term, pg""".stripMargin,

    // identical shared hits table, two fixed-order double formulas, the
    // same micro-floor-then-BIGINT-sum discipline; ranks (integers) fuse
    "q_retrieval_rrf" ->
      s"""WITH $dualRanksSql,
        |fu AS (SELECT query_id, doc_id, rank_bm25, rank_ql,
        |         (CASE WHEN rank_bm25 <= 20 THEN CAST(floor(
        |            1.0 / (60.0 + CAST(rank_bm25 AS DOUBLE))
        |            * 1000000.0 + 0.5) AS BIGINT) ELSE 0 END) +
        |         (CASE WHEN rank_ql <= 20 THEN CAST(floor(
        |            1.0 / (60.0 + CAST(rank_ql AS DOUBLE))
        |            * 1000000.0 + 0.5) AS BIGINT) ELSE 0 END) AS rrf_micro
        |       FROM rk),
        |fin AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |          ORDER BY rrf_micro DESC, doc_id) AS BIGINT) AS rnk
        |        FROM fu WHERE rrf_micro > 0)
        |SELECT query_id, rnk, doc_id, CAST(rrf_micro AS BIGINT) AS rrf_micro,
        |       rank_bm25, rank_ql
        |FROM fin WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,

    // same dual-rank CTEs; the same strict-pair concordance count and
    // positive-shift tau division
    "q_eval_rankcorr" ->
      s"""WITH $dualRanksSql,
        |c20 AS (SELECT query_id, doc_id, rank_bm25, rank_ql FROM rk
        |        WHERE rank_bm25 <= 20),
        |nc AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_common
        |       FROM c20 GROUP BY 1),
        |pr AS (
        |  SELECT a.query_id,
        |    CASE WHEN (a.rank_bm25 < b.rank_bm25 AND a.rank_ql < b.rank_ql)
        |           OR (a.rank_bm25 > b.rank_bm25 AND a.rank_ql > b.rank_ql)
        |         THEN 1 ELSE 0 END AS conc
        |  FROM c20 a JOIN c20 b
        |    ON b.query_id = a.query_id AND a.doc_id < b.doc_id),
        |g AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_pairs,
        |        CAST(sum(conc) AS BIGINT) AS concordant
        |      FROM pr GROUP BY 1)
        |SELECT CAST(g.query_id AS BIGINT) AS query_id, nc.n_common,
        |  g.n_pairs, g.concordant,
        |  g.n_pairs - g.concordant AS discordant,
        |  CAST(2 * g.concordant * 1000000 // g.n_pairs - 1000000
        |    AS BIGINT) AS tau_micro
        |FROM g JOIN nc ON nc.query_id = g.query_id
        |ORDER BY query_id""".stripMargin,

    // per-bucket NANO quantization before the sum + the closed-form
    // unobserved-bucket remainder (validated against an independent
    // Python KL implementation at both oracle SFs)
    "q_text_kl_drift" ->
      """WITH d AS (SELECT doc_id, source, list_filter(string_split(text,' '),
        |             t -> length(t) > 0) AS w FROM documents),
        |bg AS (SELECT doc_id, source,
        |         CAST(('0x' || substr(md5(unnest(list_transform(
        |           range(1, len(w)), i -> w[i] || ' ' || w[i+1]))),1,8))
        |           AS UBIGINT) % 8192 AS b
        |       FROM d WHERE len(w) >= 2),
        |cs AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY b),
        |src AS (SELECT source, b, CAST(count(*) AS BIGINT) AS sc
        |        FROM bg GROUP BY source, b),
        |tots AS (SELECT source, CAST(sum(sc) AS BIGINT) AS n_src FROM src
        |         GROUP BY source),
        |corp AS (SELECT CAST(sum(c) AS BIGINT) AS ns,
        |                CAST(count(*) AS BIGINT) AS nb FROM cs),
        |terms AS (
        |  SELECT t.source, t.n_src, c2.ns, c2.nb,
        |    CAST(floor(
        |      ((coalesce(s.sc, 0) + 1.0) / (t.n_src + 8192.0)) *
        |      (ln((coalesce(s.sc, 0) + 1.0) / (t.n_src + 8192.0))
        |       - ln((cs.c + 1.0) / (c2.ns + 8192.0)))
        |      * 1000000000.0 + 0.5) AS BIGINT) AS term_nano
        |  FROM cs CROSS JOIN tots t
        |  LEFT JOIN src s ON s.b = cs.b AND s.source = t.source
        |  CROSS JOIN corp c2)
        |SELECT source,
        |  CAST((sum(term_nano)
        |    + (8192 - max(nb)) * CAST(floor(
        |        (1.0 / (max(n_src) + 8192.0)) *
        |        (ln(1.0 / (max(n_src) + 8192.0))
        |         - ln(1.0 / (max(ns) + 8192.0)))
        |        * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS kl_nano,
        |  max(n_src) AS n_bigrams
        |FROM terms GROUP BY source ORDER BY source""".stripMargin,

    // greedy MMR as a bounded recursive CTE: one LATERAL argmax per
    // step over the 20-candidate pool (the q_pack_sequences
    // bounded-unroll precedent); all-integer gains make the argmax
    // deterministic on both engines
    "q_retrieval_mmr" ->
      """WITH RECURSIVE
        |qt(term) AS (VALUES ('stream'),('window'),('agg'),('hash'),('join')),
        |d AS (SELECT doc_id, list_filter(string_split(text,' '),
        |        t -> length(t) > 0) AS w FROM documents),
        |dl AS (SELECT doc_id, len(w) AS dl FROM d),
        |corp AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
        |tok AS (SELECT doc_id, unnest(w) AS tk FROM d),
        |tf AS (SELECT doc_id, tk, count(*) AS tf FROM tok GROUP BY doc_id, tk),
        |df AS (SELECT tk, count(*) AS df FROM tf
        |       WHERE tk IN (SELECT term FROM qt) GROUP BY tk),
        |hits AS (
        |  SELECT f.doc_id, q.term, f.tf, x.df, l.dl, c.n_docs, c.sum_dl
        |  FROM qt q JOIN tf f ON f.tk = q.term JOIN df x ON x.tk = q.term
        |  JOIN dl l ON l.doc_id = f.doc_id CROSS JOIN corp c),
        |sc AS (
        |  SELECT doc_id, CAST(sum(CAST(floor(
        |      ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
        |         / (CAST(df AS DOUBLE) + 0.5) + 1.0) *
        |      ((CAST(tf AS DOUBLE) * 2.2) /
        |       (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
        |        ((CAST(dl AS DOUBLE) * CAST(n_docs AS DOUBLE))
        |         / CAST(sum_dl AS DOUBLE)))))
        |      * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS rel
        |  FROM hits GROUP BY doc_id),
        |cand AS (SELECT doc_id, rel FROM sc ORDER BY rel DESC, doc_id LIMIT 20),
        |ctok AS (SELECT DISTINCT t.doc_id, t.tk FROM tok t
        |         WHERE t.doc_id IN (SELECT doc_id FROM cand)),
        |csz AS (SELECT doc_id, count(*) AS sz FROM ctok GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
        |          FROM ctok a JOIN ctok b
        |            ON a.tk = b.tk AND a.doc_id <> b.doc_id
        |          GROUP BY da, db),
        |sim AS (SELECT da, db,
        |          CAST(i*1000000 // (sa.sz + sb.sz - i) AS BIGINT) AS s
        |        FROM inter JOIN csz sa ON sa.doc_id = da
        |        JOIN csz sb ON sb.doc_id = db),
        |sel AS (
        |  SELECT 1 AS rk, c.doc_id AS doc, CAST(7*c.rel AS BIGINT) AS gain,
        |         [c.doc_id] AS chosen, c.rel AS rel
        |  FROM (SELECT doc_id, rel FROM cand
        |        ORDER BY rel DESC, doc_id LIMIT 1) c
        |  UNION ALL
        |  SELECT s.rk + 1, pick.doc_id, pick.gain,
        |         list_append(s.chosen, pick.doc_id), pick.rel
        |  FROM sel s, LATERAL (
        |    SELECT c.doc_id, c.rel,
        |      CAST(7*c.rel - 3*coalesce((SELECT max(m.s) FROM sim m
        |         WHERE m.da = c.doc_id
        |           AND list_contains(s.chosen, m.db)), 0) AS BIGINT) AS gain
        |    FROM cand c
        |    WHERE NOT list_contains(s.chosen, c.doc_id)
        |    ORDER BY gain DESC, c.doc_id
        |    LIMIT 1
        |  ) pick
        |  WHERE s.rk < 10
        |)
        |SELECT CAST(rk AS BIGINT) AS rk, doc AS doc_id,
        |       rel AS rel_micro, gain AS mmr_gain
        |FROM sel ORDER BY rk""".stripMargin,

    "q_text_textrank" -> textrankSql
  )

  /** DuckDB TextRank oracle: 4 UNROLLED synchronous rounds, one
    * generated template per round (the labelPropSql discipline —
    * MATERIALIZED is load-bearing, each round reads its predecessor
    * once per reference), `//` mirroring intDiv's truncation on the
    * same all-int64 damping formula. range(1, n) is exclusive of n, so
    * i spans the adjacent positions 1..len−1; a one-candidate document
    * yields ws[i+1] = NULL and the <> predicate drops it — identical to
    * the Spark side's null-propagating =!= filter. */
  private def textrankSql: String = {
    val rounds = (1 to 4).map { t =>
      s""",r$t AS MATERIALIZED (
         |  SELECT g.source, g.v AS word,
         |    CAST(150000 + sum((17 * g.w * p.r) // (20 * g.wu))
         |      AS BIGINT) AS r
         |  FROM g JOIN r${t - 1} p ON p.source = g.source AND p.word = g.u
         |  GROUP BY g.source, g.v)""".stripMargin
    }.mkString("\n")
    s"""WITH d AS (
       |  SELECT source, list_filter(string_split(text, ' '),
       |    w -> length(w) >= 4) AS ws FROM documents),
       |pr AS (
       |  SELECT source, ws, unnest(range(1, greatest(len(ws), 2))) AS i
       |  FROM d),
       |e AS MATERIALIZED (
       |  SELECT source, least(ws[i], ws[i + 1]) AS u,
       |         greatest(ws[i], ws[i + 1]) AS v,
       |         CAST(count(*) AS BIGINT) AS w
       |  FROM pr WHERE ws[i] <> ws[i + 1]
       |  GROUP BY 1, 2, 3),
       |und AS (SELECT source, u, v, w FROM e
       |        UNION ALL SELECT source, v AS u, u AS v, w FROM e),
       |g AS MATERIALIZED (
       |  SELECT und.source, und.u, und.v, und.w, s.wu
       |  FROM und JOIN (SELECT source, u, CAST(sum(w) AS BIGINT) AS wu
       |                 FROM und GROUP BY 1, 2) s
       |    ON s.source = und.source AND s.u = und.u),
       |r0 AS (SELECT DISTINCT source, u AS word,
       |         CAST(1000000 AS BIGINT) AS r FROM und)
       |$rounds
       |SELECT source, rnk, word, r AS rank_micro FROM (
       |  SELECT source, word, r, CAST(row_number() OVER (
       |    PARTITION BY source ORDER BY r DESC, word) AS BIGINT) AS rnk
       |  FROM r4)
       |WHERE rnk <= 10 ORDER BY source, rnk""".stripMargin
  }
}
