package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators (builder contract §extensions): corpus
  * vocabulary, collocation mining, reproducible splits, class rebalancing.
  *
  * Scale shapes: vocabulary/PMI are explode → hash-agg (partial aggs keep
  * the shuffle at vocabulary size, not token count); the split assignment is
  * a stateless per-row hash (no shuffle at all — any executor computes the
  * same split for the same row, which is what makes it reproducible across
  * reruns and clusters); rebalancing is one window pass per class.
  */
object PipelineQueries extends QuerySet {

  val queries: Map[String, Q] = Map(
    // Corpus vocabulary: global token frequencies + document frequency.
    "q_vocab" -> { (s, dir) =>
      val tok = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      tok.groupBy(col("tok"))
        .agg(count(lit(1)).as("tf"),
          countDistinct(col("doc_id")).as("df"))
        .orderBy(col("tf").desc, col("tok"))
    },

    // SOURCE/DOMAIN BLOCKLIST filter (the RefinedWeb/CCNet URL-filter
    // step, over the documents table's source column): drop every
    // document from a blocklisted source via a broadcast LEFT ANTI join
    // — at 100 TB the blocklist is catalog-sized (thousands to millions
    // of domains, still MBs) → broadcast, so the filter is MAP-ONLY over
    // the corpus; the survivors roll up per source. A NOT IN subquery
    // plans the same anti join but a DataFrame blocklist is the real
    // shape (blocklists live in files, not SQL literals). PlanShapeSpec
    // asserts the BroadcastHashJoin LeftAnti.
    "q_filter_blocklist" -> { (s, dir) =>
      import s.implicits._
      val block = Seq("src3", "src7", "src13").toDF("source")
      t(s, dir, "documents")
        .join(broadcast(block), Seq("source"), "left_anti")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        // NULLS LAST pins row order to DuckDB's default: a NULL-source
        // group survives the anti join on both engines (see oracle), and
        // must then also SORT identically on both
        .orderBy(col("source").asc_nulls_last)
    },

    // PER-SOURCE DOCUMENT CAP (the C4/FineWeb anti-domain-dominance
    // step): no single source may contribute more than K documents, and
    // when a source exceeds the cap it keeps its K BEST documents by the
    // shared quality score (TextQueries.withQuality — one definition
    // across the pipeline), ties broken by doc_id for determinism. One
    // shuffle on the source key + a per-source window rank (the q22
    // top-k-per-group shape: rank, filter — never a global sort). At
    // 100 TB: source cardinality is domain-sized (millions), so the
    // window partitions are small-by-construction EXCEPT the giant
    // domains the cap exists for — those sort only within their own
    // partition, and AQE's skew split does not apply to windows, so a
    // pathological mega-domain would use the two-pass variant (approx
    // per-source quality threshold from a sample, then a map-only
    // filter); at any realistic domain skew the rank-window is the
    // right plan. Output is the per-source audit a curation run reports:
    // docs seen / kept, the quality bar that the cap imposed, and the
    // kept byte mass.
    "q_source_cap" -> { (s, dir) =>
      val K = 15
      val w = Window.partitionBy(col("source"))
        .orderBy(col("quality_micro").desc, col("doc_id"))
      TextQueries.withQuality(t(s, dir, "documents"))
        .withColumn("rk", row_number().over(w))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("rk") <= K, 1L).otherwise(0L)).as("n_kept"),
          min(when(col("rk") <= K, col("quality_micro")))
            .as("cap_quality_micro"),
          sum(when(col("rk") <= K, col("n_chars"))).as("kept_chars"))
        .orderBy(col("source"))
    },

    // Approximate HEAVY HITTERS via count-min sketch — the streaming-
    // friendly top-k the exact q_vocab cannot give at 100 TB (an exact
    // top-k shuffles every distinct token; the CMS is a fixed-size
    // mergeable summary whose partials combine map-side, like the HLL in
    // q_approx_sketches). Driver-visible gate, same pattern as
    // q_approx_sketches: emit the EXACT top-10 counts (hash-compared for
    // real) plus a per-token boolean that the sketch estimate respects
    // the CMS contract (estimate >= true, <= true + eps*N) — the oracle
    // pins the booleans TRUE, so a sketch drifting out of its bound
    // fails the driver's hash gate. Driver-side state is the sketch
    // bytes + 10 rows (model/catalog-sized, per the collect policy).
    "q_approx_topk" -> { (s, dir) =>
      import s.implicits._
      val toks = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
      val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok")).limit(10).collect()
      // ONE pass builds the sketch and the token total together
      val agg = toks.agg(
        expr("count_min_sketch(tok, CAST(0.001 AS DOUBLE), " +
          "CAST(0.99 AS DOUBLE), 42)").as("cms"),
        count(lit(1)).as("n")).head()
      val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(agg.getAs[Array[Byte]](0)))
      val slack = (0.001 * agg.getLong(1)).toLong + 1
      exact.toSeq.map { r =>
        val (tok, cnt) = (r.getString(0), r.getLong(1))
        val est = cms.estimateCount(tok)
        (tok, cnt, est >= cnt && est <= cnt + slack)
      }.toDF("tok", "exact_cnt", "cms_within_bound")
        .orderBy(col("exact_cnt").desc, col("tok"))
    },

    // Collocations: bigram PMI (pointwise mutual information) over word
    // pairs — log(p(ab) / (p(a) p(b))), min support 5.
    "q_bigram_pmi" -> { (s, dir) =>
      val d = t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
      val bigrams = d
        .select(explode(expr(
          "transform(sequence(1, greatest(size(w) - 1, 1)), i -> struct(w[i-1] AS a, w[i] AS b))"))
          .as("bg"))
        .select(col("bg.a").as("a"), col("bg.b").as("b"))
        .filter(col("b").isNotNull)
      // corpus total as a broadcast 1-row frame — no driver-side action
      val total = bigrams.agg(count(lit(1)).cast("double").as("n_total"))
      val pair = bigrams.groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 5)
      val left = bigrams.groupBy(col("a")).agg(count(lit(1)).as("n_a"))
      val right = bigrams.groupBy(col("b")).agg(count(lit(1)).as("n_b"))
      pair.join(left, Seq("a")).join(right, Seq("b"))
        .crossJoin(broadcast(total))
        .select(col("a"), col("b"), col("n_ab"),
          // counts multiplied in DOUBLE: int64 n_a*n_b would wrap for
          // high-frequency tokens at corpus scale (log consumes the
          // quotient, so double precision is all that is needed)
          r6(log((col("n_ab") * col("n_total")) /
            (col("n_a").cast("double") * col("n_b").cast("double"))))
            .as("pmi"))
        .orderBy(col("a"), col("b"))
    },

    // Reproducible train/val/test split: multiplicative int64 hash of the
    // stable key — stateless, shuffle-free, identical on any engine/rerun.
    // The key is reduced mod a prime FIRST so the product stays below
    // 2^63 for any doc_id (Spark would wrap silently, DuckDB would error).
    "q_train_split" -> { (s, dir) =>
      val h = pmod(pmod(col("doc_id"), lit(1000003L)) * 2654435761L, lit(100L))
      val split_ = when(h < 80, "train").when(h < 90, "val").otherwise("test")
      val d = t(s, dir, "documents")
        .select(col("doc_id"), split_.as("split"))
      d.groupBy(col("split")).agg(count(lit(1)).as("n"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy(col("split"))
    },

    // Training-data MIXING: each source gets a sampling weight and every
    // document is repeated floor(w) times plus one more with probability
    // frac(w) — the standard epoch-upsampling mix recipe. The fractional
    // draw is the same stateless multiplicative hash as q_train_split, so
    // the mix is reproducible on any engine/rerun and shuffle-free until
    // the final sort; at 100 TB this is a map-only explode whose output
    // feeds the training shard writer. Weights here cycle 0.5/1.25/2.0/
    // 2.75 by source number (exact in binary, so the integer frac compare
    // is engine-portable).
    "q_sample_mix" -> { (s, dir) =>
      val srcNum = regexp_extract(col("source"), "[0-9]+", 0).cast("int")
      val w = lit(0.5) + (srcNum % 4).cast("double") * lit(0.75)
      val base = floor(w).cast("int")
      val fracPct = ((w - floor(w)) * 100).cast("int")
      val h = pmod(pmod(col("doc_id"), lit(1000003L)) * 2654435761L, lit(100L))
      val n = base + when(h < fracPct, 1).otherwise(0)
      t(s, dir, "documents")
        .select(col("doc_id"), col("source"), n.as("n_epochs"))
        .filter(col("n_epochs") > 0)
        .select(col("doc_id"), col("source"),
          explode(sequence(lit(1), col("n_epochs"))).as("epoch"))
        .orderBy(col("doc_id"), col("epoch"))
    },

    // Sequence PACKING: assign documents to fixed-budget token windows
    // (256 tokens) by next-fit in doc_id order per source — the step that
    // turns a cleaned corpus into dense pretraining sequences. Packing is
    // inherently sequential WITHIN its packing unit (each doc's bin
    // depends on the previous doc's), so this is the one legitimate
    // mapPartitions operator in the query set (extension ladder (d),
    // SURVEY §2.4k): repartition by source co-locates each unit,
    // sortWithinPartitions fixes the scan order (the secondary-sort
    // pattern), and the per-partition pass is a single O(1)-state
    // iterator — no collect, no driver loop. Across units it is
    // embarrassingly parallel; a skewed giant source would be split into
    // deterministic doc_id-range shards as its packing units (packing
    // semantics is per-unit by definition). Oracle: DuckDB recursive CTE
    // threading (seq_id, used) through the same doc order.
    "q_pack_sequences" -> { (s, dir) =>
      import s.implicits._
      val budget = 256L
      val packed = t(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .repartition(col("source"))
        .sortWithinPartitions(col("source"), col("doc_id"))
        .as[(String, Long, Long)]
        .mapPartitions { it =>
          var curSrc: String = null
          var seq = 0L
          var used = 0L
          it.map { case (src, id, n) =>
            if (src != curSrc) { curSrc = src; seq = 0L; used = n }
            else if (used + n <= budget) used += n
            else { seq += 1L; used = n }
            (src, id, n, seq, used - n)
          }
        }
      packed.toDF("source", "doc_id", "n_tok", "seq_id", "tok_offset")
        .orderBy(col("source"), col("doc_id"))
    },

    // Training-shard EXPORT assignment: deterministic pseudo-random global
    // shuffle + sharding — the last step before writing a cleaned corpus
    // out as N training files. The shard is the same stateless
    // multiplicative hash as q_train_split (map-only, reproducible on any
    // engine/cluster/rerun), and the within-shard position orders by the
    // hash itself, so readers stream each shard in a fixed pseudo-random
    // document order (no global sort of the corpus: the only shuffle is
    // the 16-way hash partition + per-shard local sort, exactly how the
    // shard writer would lay files out at 100 TB).
    "q_export_shards" -> { (s, dir) =>
      val h = pmod(pmod(col("doc_id"), lit(1000003L)) * 2654435761L,
        lit(1000000007L))
      val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
      t(s, dir, "documents")
        .select(col("doc_id"), h.as("h"))
        .withColumn("shard", pmod(col("h"), lit(16L)))
        .withColumn("pos", row_number().over(w) - 1)
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy(col("shard"), col("pos"))
    },

    // Multilingual temperature sampling (alpha = 0.5): languages are drawn
    // proportional to p_l^alpha renormalized — the standard lever that
    // up-weights low-resource languages without flattening the mix. One
    // tiny per-language aggregate then a 1-row-broadcast normalization;
    // the per-document sampling this feeds is q_sample_mix's stateless
    // hash draw.
    "q_lang_temperature" -> { (s, dir) =>
      val counts = t(s, dir, "documents")
        .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      // ordered full frame: the float normalizer sums in lang order on
      // every engine/rerun (an unordered whole-partition sum would leave
      // the FP summation order nondeterministic)
      val wAll = Window.orderBy(col("lang"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      counts
        .withColumn("p", col("n").cast("double") /
          sum(col("n")).over(wAll).cast("double"))
        .withColumn("q", sqrt(col("p")) / sum(sqrt(col("p"))).over(wAll))
        .select(col("lang"), col("n"),
          micro(col("p")).as("p_micro"),
          micro(col("q")).as("q_micro"),
          // boost = sampled/natural share: >1 means up-weighted
          micro(col("q") / col("p")).as("boost_micro"))
        .orderBy(col("lang"))
    },

    // RAG-style overlapping chunking: fixed 64-token windows at stride 48
    // (16-token overlap), generated by a per-document sequence explode —
    // map-only, ZERO shuffle at any corpus size (the generator fans out
    // ~n_tok/stride rows per document; no self-join, no window function).
    // chunk_fp (md5 of the window text) is the chunk-level dedup /
    // retrieval key downstream stages join on.
    "q_chunk_windows" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), col("w"),
          size(col("w")).cast("long").as("n_tok"),
          explode(expr("sequence(1L, greatest(cast(size(w) as long), 1L), 48L)"))
            .as("st"))
        .select(col("doc_id"),
          ((col("st") - 1L) / lit(48L)).cast("long").as("chunk_idx"),
          col("st").as("tok_start"),
          size(slice(col("w"), col("st").cast("int"), lit(64))).cast("long")
            .as("n_tokens"),
          md5(array_join(slice(col("w"), col("st").cast("int"), lit(64)), " "))
            .as("chunk_fp"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },

    // EXACT-QUOTA stratified sampling: every source keeps exactly
    // ceil(n/10) documents — the complement of q_sample_mix's Bernoulli
    // draw (whose per-stratum count is only binomially close to the
    // target; audits and ablations want the quota exact). The draw order
    // is md5(doc_id) — stateless and engine-independent, so the SAME
    // documents are selected on any cluster/rerun — and the rank is one
    // window per source partition (the q22 top-k shape; per-partition
    // state is a counter, the quota is computed from the same window's
    // count, no second pass). Output is the per-source audit.
    "q_stratified_sample" -> { (s, dir) =>
      val wRank = Window.partitionBy(col("source"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      val wAll = Window.partitionBy(col("source"))
      t(s, dir, "documents")
        .select(col("source"), col("doc_id"), col("n_chars"))
        .withColumn("rk", row_number().over(wRank))
        .withColumn("n_src", count(lit(1)).over(wAll))
        .withColumn("keep", col("rk") <= intDiv(col("n_src") + 9L, lit(10L)))
        .groupBy(col("source"))
        .agg(max(col("n_src")).as("n_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("keep"), col("n_chars"))).as("kept_chars"),
          max(when(col("keep"), col("doc_id"))).as("max_kept_id"))
        .orderBy(col("source"))
    },

    // Class rebalancing: cap each label at its 30 lowest vec_ids (window
    // top-k per class — deterministic downsampling for skewed labels).
    "q_rebalance" -> { (s, dir) =>
      val w = Window.partitionBy(col("label")).orderBy(col("vec_id"))
      t(s, dir, "embeddings")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 30)
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_kept"), max(col("vec_id")).as("max_kept_id"))
        .orderBy(col("label"))
    },

    // The COMPOSITE corpus-cleaning pipeline in ONE Catalyst plan — the
    // RefinedWeb/CCNet stage chain a real curation run executes, here as
    // a single query so the optimizer sees (and the plan audit covers)
    // the whole flow: source blocklist → classifier quality gate →
    // exact dedup (keep-first among survivors) → n-gram benchmark
    // decontamination → per-source audit counts. Stage attribution is
    // ordered (a doc counts against its FIRST failing stage), which is
    // the number an operator actually wants from a cleaning run. Scale
    // shape: blocklist + quality + bench membership are per-row map
    // work (the classifier score is the q_text_classifier expression —
    // zero shuffle); keep-first dedup shuffles md5 hashes only; the
    // decontamination join shuffles shingles exactly like
    // q_decontaminate (at 100 TB the Bloom pre-filter,
    // q_decontaminate_bloom, runs before it); the final rollup is one
    // catalog-sized aggregate. Benchmark membership follows the
    // q_decontaminate convention (doc_id % 20 == 0) and those docs are
    // reported as their own stage, not cleaned. NULL sources are
    // explicitly NOT blocked (coalesce) so the stage CASE is total.
    "q_pipeline_clean" -> { (s, dir) =>
      import s.implicits._
      val block = Seq("src3", "src7", "src13").toDF("bsource")
      val docs = t(s, dir, "documents")
        // hash ONCE in the shared projection (round-8 VERDICT #3): both
        // the keepers agg and the join-back key reuse this column, so a
        // 100 TB scan branch pays one text-hash pass — not one per
        // consumer expression
        .withColumn("h", md5(col("text")))
        // native one-pass classifier scoring (graft.functions.TextOps) —
        // same integer canon as q_text_classifier, no interpreted lambdas
        .withColumn("cs",
          graft.functions.TextOps.classifier_scores(col("text")))
        .withColumn("quality",
          col("cs").getItem(1) + col("cs").getItem(2))
        .withColumn("is_bench", col("doc_id") % 20 === 0)
        .join(broadcast(block), col("source") === col("bsource"), "left")
        .withColumn("blocked", col("bsource").isNotNull)
      val keepers = docs
        .filter(!col("is_bench") && !col("blocked") && col("quality") >= 0)
        .groupBy(col("h"))
        .agg(min(col("doc_id")).as("keep_id"))
      // word-5-gram shingles, the q_decontaminate construction
      val sh = t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("wt"))
        .select(col("doc_id"),
          explode(expr("sequence(1, greatest(size(wt) - 4, 1))")).as("i"),
          col("wt"))
        .select(col("doc_id"),
          array_join(slice(col("wt"), col("i"), lit(5)), " ").as("sh"))
        .distinct()
      val contam = sh.filter(col("doc_id") % 20 =!= 0)
        .join(sh.filter(col("doc_id") % 20 === 0)
          .select(col("sh")).distinct(), Seq("sh"))
        .select(col("doc_id")).distinct()
        .withColumn("contam", lit(true))
      docs
        .join(keepers, Seq("h"), "left")
        .join(contam, Seq("doc_id"), "left")
        .withColumn("stage",
          when(col("is_bench"), lit("bench"))
            .when(col("blocked"), lit("blocked"))
            .when(col("quality") < 0, lit("low_quality"))
            .when(col("doc_id") =!= col("keep_id"), lit("duplicate"))
            .when(col("contam"), lit("contaminated"))
            .otherwise(lit("kept")))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("stage") === "bench", 1L).otherwise(0L)).as("n_bench"),
          sum(when(col("stage") === "blocked", 1L).otherwise(0L))
            .as("n_blocked"),
          sum(when(col("stage") === "low_quality", 1L).otherwise(0L))
            .as("n_lowq"),
          sum(when(col("stage") === "duplicate", 1L).otherwise(0L))
            .as("n_dup"),
          sum(when(col("stage") === "contaminated", 1L).otherwise(0L))
            .as("n_contam"),
          sum(when(col("stage") === "kept", 1L).otherwise(0L)).as("n_kept"),
          coalesce(sum(when(col("stage") === "kept", col("n_chars"))),
            lit(0L)).as("kept_chars"))
        .orderBy(col("source").asc_nulls_last)
    },

    // COLUMN PROFILING (the pipeline-onboarding "describe my 100 TB"
    // pass, TFDV-style): per column — non-null/null counts, EXACT
    // distinct count, type-quantized min/max (longs as-is, doubles in
    // micro units, timestamps in epoch µs, strings by length) and total
    // string bytes. ONE scan per table: every metric is a map-side
    // partial agg; the n exact distincts plan as one Expand(×n)+two-level
    // hash agg — the documented cost of exactness (at 100 TB swap
    // countDistinct for approx_count_distinct per column and Expand
    // disappears; the oracle pins the exact form). Output is
    // catalog-sized: one row per column, driver-safe at any corpus.
    "q_profile_columns" -> { (s, dir) =>
      // kinds: long | str | double | ts — chooses the min/max quantizer
      def profile(df: org.apache.spark.sql.DataFrame, tbl: String,
          cols: Seq[(String, String)]) = {
        val aggs = cols.flatMap { case (c, kind) =>
          val (mn, mx) = kind match {
            case "long" => (min(col(c)).cast("long"),
              max(col(c)).cast("long"))
            case "str" => (min(length(col(c))).cast("long"),
              max(length(col(c))).cast("long"))
            case "double" => (micro(min(col(c))), micro(max(col(c))))
            case "ts" => (unix_micros(min(col(c))), unix_micros(max(col(c))))
          }
          Seq(count(col(c)).as(s"${c}__n"),
            countDistinct(col(c)).as(s"${c}__d"),
            mn.as(s"${c}__min"), mx.as(s"${c}__max"),
            (if (kind == "str") sum(length(col(c))).cast("long")
             else lit(null).cast("long")).as(s"${c}__len"))
        } :+ count(lit(1)).as("__total")
        df.agg(aggs.head, aggs.tail: _*)
          .select(explode(array(cols.map { case (c, _) =>
            struct(lit(tbl).as("tbl"), lit(c).as("col"),
              col(s"${c}__n").as("n_nonnull"),
              (col("__total") - col(s"${c}__n")).as("n_null"),
              col(s"${c}__d").as("n_distinct"),
              col(s"${c}__min").as("min_q"),
              col(s"${c}__max").as("max_q"),
              col(s"${c}__len").as("sum_len"))
          }: _*)).as("r"))
          .select(col("r.*"))
      }
      profile(t(s, dir, "documents"), "documents",
        Seq("doc_id" -> "long", "text" -> "str", "lang" -> "str",
          "source" -> "str", "n_chars" -> "long"))
        .unionByName(profile(t(s, dir, "events"), "events",
          Seq("event_id" -> "long", "ts" -> "ts", "user_id" -> "long",
            "event_type" -> "str", "value" -> "double")))
        .orderBy(col("tbl"), col("col"))
    },

    // CONCATENATE-AND-CHOP packing — the OTHER training-sequence layout,
    // next to q_pack_sequences' next-fit: there a document never splits
    // (bins carry wasted tail space), here the per-source token stream is
    // chopped into fixed 256-token sequences and documents STRADDLE
    // boundaries (the GPT-style dense layout — zero padding, but
    // cross-document attention unless the trainer masks). Each doc's
    // sequence is prev_cum/B where prev_cum counts the tokens before it;
    // reported per (source, seq): docs starting there, their token mass,
    // and the straddle count (the cross-doc-attention exposure number).
    // Where next-fit is inherently sequential per unit (mapPartitions),
    // chop depends on the cumulative sum ONLY — so it distributes as a
    // DISTRIBUTED PREFIX SUM (the q_concurrency identity): within-block
    // windows on (source, doc_id-block) partitions + block totals +
    // catalog-sized cumulative offsets — never one window partition per
    // source (source cardinality ~20 would cap parallelism at 100 TB
    // exactly like the §9.4 levenshtein window did). Token counts use
    // the established whitespace tokenizer; empty docs pack (tok = 0)
    // but never count as straddling (guards the intDiv-vs-floor-division
    // divergence on prev_cum − 1 at 0).
    "q_pack_chop" -> { (s, dir) =>
      val B = 256L
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(expr("filter(split(text, ' '), w -> length(w) > 0)"))
            .cast("long").as("tok"))
        .withColumn("blk", intDiv(col("doc_id"), lit(1000L)))
      val wIn = Window.partitionBy(col("source"), col("blk"))
        .orderBy(col("doc_id"))
      val within = d.withColumn("cum_in", sum(col("tok")).over(wIn))
      val wOff = Window.partitionBy(col("source")).orderBy(col("blk"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = d.groupBy(col("source"), col("blk"))
        .agg(sum(col("tok")).as("btot"))
        .withColumn("off", coalesce(sum(col("btot")).over(wOff), lit(0L)))
        .select(col("source"), col("blk"), col("off"))
      within.join(offs, Seq("source", "blk"))
        .withColumn("prev_cum", col("off") + col("cum_in") - col("tok"))
        .groupBy(col("source"), intDiv(col("prev_cum"), lit(B)).as("seq_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"),
          sum(when(col("tok") > 0 &&
              intDiv(col("prev_cum") + col("tok") - 1, lit(B)) >
                intDiv(col("prev_cum"), lit(B)), 1L).otherwise(0L))
            .as("n_straddle"),
          min(col("doc_id")).as("first_doc"))
        .orderBy(col("source"), col("seq_id"))
    },

    // SYSTEMATIC WEIGHTED SAMPLING (Madow 1949, the midpoint form) —
    // the DETERMINISTIC probability-proportional-to-size draw the
    // sampling family was missing (q_sample_quality = Bernoulli by
    // score, q_stratified_sample = equal-per-stratum, q_token_budget_mix
    // = budget thresholding; this one selects k docs with inclusion
    // count ∝ weight, EXACTLY k total, no randomness): lay every doc's
    // weight (n_chars) on a line, drop k midpoints (2i+1)·W/(2k), a doc
    // is selected once per midpoint inside its interval. ALL-INTEGER:
    // the hit count has a closed form over exact rationals compared by
    // CROSS-MULTIPLICATION — n_hits = ⌈200·c1/W⌉/2 − ⌈200·c0/W⌉/2
    // (odd-multiple counting; 2k = 200) — no floats, no floor-vs-ceil
    // engine drift; Σ n_hits = k exactly, verified against direct
    // rational enumeration at both oracle SFs. Overflow bound: 200·W
    // needs W ≤ 4.6e16 — petabyte-scale total chars (documented, the
    // q_basket_rules bound discipline). Scale shape: the global prefix
    // sum is the q_pack_chop DISTRIBUTED decomposition (within-block
    // windows on doc_id blocks + a block-offset pass 1000× smaller than
    // the corpus; recurse block-of-blocks past ~1e8 blocks); W is a
    // documented 1-scalar driver collect (the q_zorder_key policy); the
    // hit-count test is map-only after the prefix join.
    "q_sample_systematic" -> { (s, dir) =>
      val k2 = 200L // 2k, k = 100 samples
      // checkpoint the 3-column projection ONCE: the total-weight agg,
      // the within-block window, and the block-offset agg all derive
      // from it — exchange reuse does not unify aliased subtrees (the
      // q_dtw/assortativity lesson), so without this the documents
      // fact is scanned three times
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars").as("w"))
        .withColumn("blk", intDiv(col("doc_id"), lit(1000L)))
        .localCheckpoint(eager = true)
      val tw = d.agg(sum(col("w"))).first().getLong(0)
      val wIn = Window.partitionBy(col("blk")).orderBy(col("doc_id"))
      val within = d.withColumn("cum_in", sum(col("w")).over(wIn))
      val wOff = Window.orderBy(col("blk"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = d.groupBy(col("blk")).agg(sum(col("w")).as("btot"))
        .withColumn("off", coalesce(sum(col("btot")).over(wOff), lit(0L)))
        .select(col("blk"), col("off"))
      def ceilDiv(a: org.apache.spark.sql.Column) =
        intDiv(a + lit(tw - 1L), lit(tw))
      within.join(offs, Seq("blk"))
        .withColumn("c0", col("off") + col("cum_in") - col("w"))
        .withColumn("n_hits",
          intDiv(ceilDiv((col("c0") + col("w")) * k2), lit(2L)) -
            intDiv(ceilDiv(col("c0") * k2), lit(2L)))
        .filter(col("n_hits") > 0L)
        .select(col("doc_id"), col("w"), col("n_hits"))
        .orderBy(col("doc_id"))
    },

    // TOKEN-BUDGET data mixing — the static mixing step of an LLM data
    // recipe (each source gets an equal share of a 50%-of-corpus token
    // budget; oversized sources are downsampled to their share, small
    // sources keep everything): keep fraction per source is an exact
    // integer micro (budget·1e6 // tokens, capped at 1e6) and the draw
    // is the stateless multiplicative doc_id hash against that
    // threshold — reproducible on any engine/cluster/rerun, and unlike
    // q_sample_mix's per-DOC Bernoulli this budgets TOKENS, which is
    // the unit trainers actually provision. Scale shape: one per-source
    // token rollup (catalog-sized), a 1-row global budget broadcast
    // back, and a map-only keep decision — the audit rollup is the only
    // second pass.
    // DATA SELECTION BY IMPORTANCE RESAMPLING (DSIR, Xie et al. 2023)
    // — the distribution-MATCHING member of the selection family
    // (q_sample_quality gates on absolute quality, q_token_budget_mix
    // on volume; this ranks raw docs by how much they LOOK LIKE a
    // target corpus): per doc, log importance weight = Σ over hashed
    // bigram instances of ln(p_target(b)/p_raw(b)) under
    // Laplace-smoothed 8192-bucket hashed-bigram LMs (target = the
    // lang='en' slice standing in for "high-quality reference
    // corpus"). Cross-engine determinism: the bucket hash is the first
    // 8 hex chars of md5 (both engines bit-identical) mod 8192, the
    // log-ratio is computed once per BUCKET from identical integers
    // (identical doubles → identical micro, the BM25 idf posture), and
    // the per-doc score is an int64 micro sum. Scale shape: ONE
    // fact-sized bigram explode (checkpointed — it feeds the raw
    // counts, the target counts, and the per-doc scoring join), two
    // bucket-DOMAIN (8192-row) hash aggs, the log-ratio table
    // broadcast back map-side, one per-doc sum, and a top-20
    // distributed TakeOrdered; the 1-row totals ride a broadcast
    // cross join (no collect).
    "q_dsir_select" -> { (s, dir) =>
      val top = dsirScores(s, dir)
        .orderBy(col("score_micro").desc, col("doc_id")).limit(20)
      // the 20-row rank window is output-sized (deliberate merge)
      val wRk = Window.orderBy(col("score_micro").desc, col("doc_id"))
      top.withColumn("rnk", row_number().over(wRk).cast("long"))
        .select(col("rnk"), col("doc_id"), col("lang"),
          col("score_micro"), col("n_bigrams"))
        .orderBy(col("rnk"))
    },

    // DSIR step 2 — RESAMPLE the raw corpus proportional to importance
    // (Xie et al. 2023 §3: selection is top-k OR weighted sampling;
    // q_dsir_select is the top-k face, this is the sampling face,
    // composed from the SAME scores and the q_sample_systematic Madow
    // machinery): weights are the scores shifted positive
    // (score − min + 1, a 1-scalar driver collect — the q_zorder_key
    // policy), the draw is the deterministic midpoint-systematic PPS
    // with exact-rational cross-multiplied hit counts (Σ n_hits = k
    // exactly, no randomness, reproducible on any cluster). Scale
    // shape: the score frame is checkpointed ONCE (it feeds min, the
    // within-block window, and the block-offset agg — the
    // q_sample_systematic triple-scan lesson applied at birth), the
    // global prefix sum is the distributed block decomposition, the
    // hit test map-only. Overflow bound: 200·W with W ≈ n_docs ×
    // score-range — int64-safe to ~1e9 docs at the measured 1e7 micro
    // score range (the q_sample_systematic bound discipline).
    "q_dsir_resample" -> { (s, dir) =>
      val k2 = 200L // 2k, k = 100 draws
      val scores = dsirScores(s, dir)
        .select(col("doc_id"), col("score_micro"))
        .withColumn("blk", intDiv(col("doc_id"), lit(1000L)))
        .localCheckpoint(eager = true)
      val mn = scores.agg(min(col("score_micro"))).first().getLong(0)
      val d = scores.select(col("doc_id"),
        (col("score_micro") - lit(mn) + lit(1L)).as("w"), col("blk"))
      val tw = d.agg(sum(col("w"))).first().getLong(0)
      val wIn = Window.partitionBy(col("blk")).orderBy(col("doc_id"))
      val within = d.withColumn("cum_in", sum(col("w")).over(wIn))
      val wOff = Window.orderBy(col("blk"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = d.groupBy(col("blk")).agg(sum(col("w")).as("btot"))
        .withColumn("off", coalesce(sum(col("btot")).over(wOff), lit(0L)))
        .select(col("blk"), col("off"))
      def ceilDiv(a: Column) = intDiv(a + lit(tw - 1L), lit(tw))
      within.join(offs, Seq("blk"))
        .withColumn("c0", col("off") + col("cum_in") - col("w"))
        .withColumn("n_hits",
          intDiv(ceilDiv((col("c0") + col("w")) * k2), lit(2L)) -
            intDiv(ceilDiv(col("c0") * k2), lit(2L)))
        .filter(col("n_hits") > 0L)
        .select(col("doc_id"), col("w"), col("n_hits"))
        .orderBy(col("doc_id"))
    },

    // THIRD maintained view through the IncrementalRollup registry
    // (round-14 VERDICT #8): the per-source (docs, tokens) rollup that
    // feeds q_token_budget_mix's allocator — maintained from a persisted
    // partial store plus ONE delta scan, so the budget mix can re-plan
    // without re-tokenizing the corpus (at 100 TB the tokenize scan IS
    // the cost). Same store-⊎-delta ≡ recompute oracle posture as
    // q_ivm_rollup / q_ivm_events; one registry entry is the whole
    // implementation, and GET /views serves this same readout over HTTP.
    "q_ivm_tokens" -> { (s, dir) =>
      graft.operators.IncrementalRollup.refresh(s, dir, "source_tokens")
    },

    "q_token_budget_mix" -> { (s, dir) =>
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(expr("filter(split(text, ' '), w -> length(w) > 0)"))
            .cast("long").as("tok"))
        .withColumn("h",
          pmod(pmod(col("doc_id"), lit(1000003L)) * 2654435761L,
            lit(1000000L)))
      val totals = d.groupBy(col("source"))
        .agg(sum(col("tok")).as("tokens_total"),
          count(lit(1)).as("n_docs"))
      val global = totals.agg(
        intDiv(sum(col("tokens_total")), lit(2)).as("b_total"),
        count(lit(1)).as("n_src"))
      val fracs = totals.crossJoin(broadcast(global))
        .select(col("source"), col("n_docs"), col("tokens_total"),
          least(lit(1000000L),
            intDiv(intDiv(col("b_total"), col("n_src")) * 1000000L,
              col("tokens_total"))).as("keep_frac_micro"))
      d.join(broadcast(fracs), Seq("source"))
        .groupBy(col("source"), col("n_docs"), col("tokens_total"),
          col("keep_frac_micro"))
        .agg(
          sum(when(col("h") < col("keep_frac_micro"), 1L).otherwise(0L))
            .as("n_kept"),
          sum(when(col("h") < col("keep_frac_micro"), col("tok"))
            .otherwise(0L)).as("tokens_kept"))
        .orderBy(col("source"))
    },

    // LABELER AGREEMENT (Cohen's kappa) — the label-noise audit a
    // weak-supervision pipeline runs before trusting any single labeler
    // (Snorkel-style agreement analysis, public statistics): compare the
    // classifier gate (labeler A = hashing-trick score >= 0, the
    // q_text_classifier canon via the native expression) against an
    // independent length rule (labeler B = n_chars >= 300) per source.
    // Exact integer confusion counts (n11/n10/n01/n00) feed ONE
    // fixed-order double formula per group — observed agreement po,
    // chance agreement pe from the marginals, kappa = (po-pe)/(1-pe) —
    // each micro-floored, so results hash bit-identically cross-engine.
    // Scale shape: map-only labeling (both labelers are per-row
    // expressions, zero lookup state) + one catalog-sized rollup; at
    // 100 TB this is a single pass over the scan, the cheapest audit
    // there is.
    "q_label_kappa" -> { (s, dir) =>
      val d = t(s, dir, "documents")
        .withColumn("cs",
          graft.functions.TextOps.classifier_scores(col("text")))
        .withColumn("a",
          col("cs").getItem(1) + col("cs").getItem(2) >= 0)
        .withColumn("b", col("n_chars") >= 300)
      val dbl = (c: org.apache.spark.sql.Column) => c.cast("double")
      d.groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("a") && col("b"), 1L).otherwise(0L)).as("n11"),
          sum(when(col("a") && !col("b"), 1L).otherwise(0L)).as("n10"),
          sum(when(!col("a") && col("b"), 1L).otherwise(0L)).as("n01"),
          sum(when(!col("a") && !col("b"), 1L).otherwise(0L)).as("n00"))
        .withColumn("po", dbl(col("n11") + col("n00")) / dbl(col("n")))
        .withColumn("pa", dbl(col("n11") + col("n10")) / dbl(col("n")))
        .withColumn("pb", dbl(col("n11") + col("n01")) / dbl(col("n")))
        .withColumn("pe", col("pa") * col("pb") +
          (lit(1.0) - col("pa")) * (lit(1.0) - col("pb")))
        .select(col("source"), col("n"), col("n11"), col("n10"),
          col("n01"), col("n00"),
          micro(col("po")).as("po_micro"),
          micro(col("pe")).as("pe_micro"),
          micro((col("po") - col("pe")) / (lit(1.0) - col("pe")))
            .as("kappa_micro"))
        .orderBy(col("source"))
    },

    // QUALITY-WEIGHTED sampling — the curation move after classifier
    // scoring: upsample what the quality gate likes (90% keep above the
    // decision boundary) and keep a calibrated slice of the rest (20% —
    // discarding low-quality text entirely is measurably worse than
    // keeping a slice, per the quality-filtering literature), with the
    // same stateless hash draw. The score is THE q_text_classifier
    // expression (one shared definition); per-(source, bucket) audit
    // counts are the output. Map-only scoring + one rollup — zero extra
    // shuffles over the scan at any corpus size.
    "q_sample_quality" -> { (s, dir) =>
      val d = t(s, dir, "documents")
        // native one-pass classifier scoring (graft.functions.TextOps) —
        // token count rides along in cs[0], so the lambda-built token
        // array disappears from this plan entirely
        .withColumn("cs",
          graft.functions.TextOps.classifier_scores(col("text")))
        .withColumn("score",
          col("cs").getItem(1) + col("cs").getItem(2))
        .withColumn("bucket",
          when(col("score") >= 0, lit("high")).otherwise(lit("low")))
        .withColumn("quota",
          when(col("score") >= 0, lit(90L)).otherwise(lit(20L)))
        .withColumn("h",
          pmod(pmod(col("doc_id"), lit(1000003L)) * 2654435761L, lit(100L)))
        .withColumn("kept", col("h") < col("quota"))
      d.groupBy(col("source"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("kept"), col("cs").getItem(0))
            .otherwise(0L)).as("tokens_kept"))
        .orderBy(col("source"), col("bucket"))
    },

    // CURRICULUM PACING (Bengio et al., ICML 2009; Platanios et al.
    // 2019's competence schedules): order the corpus easiest-first by
    // THE shared quality score (TextQueries.withQuality — the same
    // definition q_dedup_keep_best and q_source_cap rank by) and cut it
    // into 10 equal pacing stages; the readout is the training plan —
    // per stage the doc count, character budget, quality band, and the
    // cumulative budget a competence schedule feeds the sampler.
    // DISTRIBUTED exact ranking without a global sort (the round-12
    // top-k window lesson, applied to full-corpus ranking; the
    // q_pack_chop block prefix-sum decomposition): docs bucket by
    // qb = quality_micro div 1000 — ≤ 1001 buckets BY CONSTRUCTION
    // (the score lives in [0, 1e6]; the raw VALUE domain is nearly
    // doc-unique, measured 473 distinct over 500 docs, so bucketing is
    // what keeps the domain table corpus-independent). A bucket-ordered
    // window over the ≤ 1001-row count table yields each bucket's
    // cumulative offset; each doc's EXACT global rank = its bucket's
    // offset + its row_number within the bucket (partitioned window,
    // ~N/1000 rows per partition). stage = 1 + (rank−1)·10 div N is the
    // deterministic equal-split (both engines compute it identically —
    // no ntile remainder-semantics risk). Scale shape: one map-only
    // scoring pass, one bucket-domain agg, one bucket-partitioned
    // window, one broadcast join of the ≤ 1001-row offsets, one stage
    // agg; the only unpartitioned windows order the bucket domain and
    // the 10-row stage table (deliberate output-sized merges, the
    // skyline precedent).
    "q_curriculum" -> { (s, dir) =>
      // checkpointed once: feeds the domain agg, the total, AND the
      // per-doc rank join (the q_sample_systematic triple-scan lesson)
      val d = TextQueries.withQuality(t(s, dir, "documents"))
        .select(col("doc_id"), col("n_chars"), col("quality_micro"),
          intDiv(col("quality_micro"), lit(1000L)).as("qb"))
        .localCheckpoint(eager = true)
      val wDom = Window.orderBy(col("qb").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = d.groupBy(col("qb"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("cb", coalesce(sum(col("cnt")).over(wDom), lit(0L)))
        .select(col("qb"), col("cb"))
      val total = d.groupBy().agg(count(lit(1)).as("n_total"))
      // easiest-first within the bucket too: quality DESC, doc_id
      val wIn = Window.partitionBy(col("qb"))
        .orderBy(col("quality_micro").desc, col("doc_id"))
      val wStage = Window.orderBy(col("stage"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      d.withColumn("rn", row_number().over(wIn).cast("long"))
        .join(broadcast(cum), "qb")
        .crossJoin(broadcast(total)) // 1-row corpus total, no collect
        .withColumn("stage",
          lit(1L) + intDiv((col("cb") + col("rn") - 1L) * 10L,
            col("n_total")))
        .groupBy(col("stage"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("char_budget"),
          min(col("quality_micro")).as("min_quality_micro"),
          max(col("quality_micro")).as("max_quality_micro"))
        .withColumn("cum_chars", sum(col("char_budget")).over(wStage))
        .orderBy(col("stage"))
    },

    // SHARD MANIFEST — the reproducibility artifact a training run ships
    // next to its exported shards (q_export_shards' layout): per shard,
    // the doc and token counts plus an order-independent md5 over the
    // shard's SORTED doc ids — two exports of the same corpus produce
    // byte-identical manifests, and a single lost/duplicated doc flips
    // the checksum. Scale note: the ids_md5 concatenates the shard's
    // ids, so the manifest pass is bounded by shard size — at 100 TB a
    // manifest would roll up per shard FILE (the writer's natural unit)
    // and md5 the file digests; the per-shard form here is the same
    // algebra one level up.
    "q_shard_manifest" -> { (s, dir) =>
      val h = pmod(pmod(col("doc_id"), lit(1000003L)) * 2654435761L,
        lit(1000000007L))
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(expr("filter(split(text, ' '), w -> length(w) > 0)"))
            .cast("long").as("tok"),
          pmod(h, lit(16L)).as("shard"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"),
          md5(array_join(array_sort(collect_list(col("doc_id")))
            .cast("array<string>"), ",")).as("ids_md5"))
        .orderBy(col("shard"))
    }
  )

  /** One oracle row of q_profile_columns (mirrors the Spark quantizers:
    * longs as-is, strings by length, doubles half-up micro, ts epoch µs). */
  /** DSIR hashed-bigram bucket of one bigram string g: first 8 hex
    * chars of md5 (bit-identical on both engines) mod 8192. */
  private def dsirBucket(g: Column): Column =
    pmod(conv(substring(md5(g), 1, 8), 16, 10).cast("long"), lit(8192L))

  /** Per-bigram-instance (doc_id, lang, bucket) — checkpointed: it
    * feeds the raw counts, target counts, AND the scoring join. */
  private def dsirBg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        expr("filter(split(text, ' '), t -> length(t) > 0)").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), col("lang"),
        explode(expr("transform(sequence(1, size(w) - 1), " +
          "i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"))
          .as("g"))
      .select(col("doc_id"), col("lang"), dsirBucket(col("g")).as("b"))
      .localCheckpoint(eager = true)

  /** The trained model: per observed bucket, micro-quantized
    * ln(p_target(b)/p_raw(b)) under Laplace-smoothed 8192-bucket LMs
    * (target = the lang='en' slice). Bucket-domain-sized (≤ 8192
    * rows); [[graft.streaming.StreamingDsir]] serves it as the FIXED
    * reference model for online scoring. */
  private[graft] def dsirLr(bg: DataFrame): DataFrame = {
    val cs = bg.groupBy(col("b")).agg(count(lit(1)).as("c"))
    val ct = bg.filter(col("lang") === "en")
      .groupBy(col("b")).agg(count(lit(1)).as("tc"))
    val tots = bg.agg(count(lit(1)).as("ns"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("nt"))
    cs.join(ct, Seq("b"), "left")
      .crossJoin(broadcast(tots)) // 1-row totals, no collect
      .select(col("b"), micro(
        log((coalesce(col("tc"), lit(0L)) + lit(1.0)) /
          (col("nt") + lit(8192.0)))
        - log((col("c") + lit(1.0)) / (col("ns") + lit(8192.0))))
        .as("lr_micro"))
  }

  /** The trained model straight from a corpus dir (the streaming
    * twin's entry point — one bg build shared with nothing else). */
  private[graft] def dsirModel(s: SparkSession, dir: String): DataFrame =
    dsirLr(dsirBg(s, dir))

  /** Driver-side model bundle for the streaming scorer: (bucket →
    * lr_micro, unseen-bucket default = the Laplace ratio at zero
    * counts, computed by the SAME ln/micro arithmetic as the bucket
    * rows). Model-sized collect (≤ 8192 rows — the PCA pinned-model
    * policy). */
  private[graft] def dsirModelBundle(s: SparkSession,
      dir: String): (Map[Long, Long], Long) = {
    val bg = dsirBg(s, dir)
    val m = dsirLr(bg).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tr = bg.agg(count(lit(1)).as("ns"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("nt")).first()
    val (ns, nt) = (tr.getLong(0), tr.getLong(1))
    val default = math.floor((math.log(1.0 / (nt + 8192.0))
      - math.log(1.0 / (ns + 8192.0))) * 1000000.0 + 0.5).toLong
    (m, default)
  }

  /** Per-doc DSIR log importance weight (int64 micro sum over bigram
    * instances) — ONE bg build feeds both the model and the scoring
    * join; lang rides the agg (constant per doc) so the ranked
    * readout needs no second documents scan. */
  private[graft] def dsirScores(s: SparkSession, dir: String): DataFrame = {
    val bg = dsirBg(s, dir)
    bg.join(broadcast(dsirLr(bg)), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(first(col("lang")).as("lang"),
        sum(col("lr_micro")).as("score_micro"),
        count(lit(1)).as("n_bigrams"))
  }

  private def profileSql(tbl: String, c: String, kind: String): String = {
    val (mn, mx) = kind match {
      case "long" => (s"CAST(min($c) AS BIGINT)", s"CAST(max($c) AS BIGINT)")
      case "str" => (s"CAST(min(length($c)) AS BIGINT)",
        s"CAST(max(length($c)) AS BIGINT)")
      case "double" =>
        (s"CAST(floor(min($c) * 1000000.0 + 0.5) AS BIGINT)",
          s"CAST(floor(max($c) * 1000000.0 + 0.5) AS BIGINT)")
      case "ts" => (s"epoch_us(min($c))", s"epoch_us(max($c))")
    }
    val len = if (kind == "str") s"CAST(sum(length($c)) AS BIGINT)"
      else "CAST(NULL AS BIGINT)"
    s"""SELECT '$tbl' AS tbl, '$c' AS col,
       |  CAST(count($c) AS BIGINT) AS n_nonnull,
       |  CAST(count(*) - count($c) AS BIGINT) AS n_null,
       |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
       |  $mn AS min_q, $mx AS max_q, $len AS sum_len
       |FROM $tbl""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_shard_manifest" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      w -> len(w) > 0)) AS BIGINT) AS tok,
        |    (((doc_id % 1000003) * 2654435761) % 1000000007) % 16 AS shard
        |  FROM documents)
        |SELECT CAST(shard AS BIGINT) AS shard,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(tok) AS BIGINT) AS n_tokens,
        |  md5(array_to_string(list_transform(list_sort(list(doc_id)),
        |    x -> CAST(x AS VARCHAR)), ',')) AS ids_md5
        |FROM d GROUP BY shard
        |ORDER BY shard""".stripMargin,

    "q_dsir_select" ->
      """WITH d AS (SELECT doc_id, lang, list_filter(string_split(text,' '),
        |             t -> length(t) > 0) AS w FROM documents),
        |bg AS (SELECT doc_id, lang,
        |         CAST(('0x' || substr(md5(unnest(list_transform(
        |           range(1, len(w)), i -> w[i] || ' ' || w[i+1]))),1,8))
        |           AS UBIGINT) % 8192 AS b
        |       FROM d WHERE len(w) >= 2),
        |cs AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY b),
        |ct AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM bg
        |       WHERE lang = 'en' GROUP BY b),
        |tot AS (SELECT (SELECT CAST(sum(c) AS BIGINT) FROM cs) AS ns,
        |               (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) FROM ct)
        |                 AS nt),
        |lr AS (SELECT cs.b,
        |         CAST(floor((ln((coalesce(ct.c, 0) + 1.0) / (tot.nt + 8192.0))
        |                   - ln((cs.c + 1.0) / (tot.ns + 8192.0)))
        |              * 1000000.0 + 0.5) AS BIGINT) AS lr_micro
        |       FROM cs LEFT JOIN ct ON ct.b = cs.b CROSS JOIN tot),
        |sc AS (SELECT bg.doc_id, CAST(sum(lr.lr_micro) AS BIGINT)
        |         AS score_micro,
        |       CAST(count(*) AS BIGINT) AS n_bigrams
        |       FROM bg JOIN lr ON lr.b = bg.b GROUP BY bg.doc_id),
        |top AS (SELECT doc_id, score_micro, n_bigrams FROM sc
        |        ORDER BY score_micro DESC, doc_id LIMIT 20)
        |SELECT CAST(row_number()
        |         OVER (ORDER BY t.score_micro DESC, t.doc_id) AS BIGINT)
        |         AS rnk,
        |       t.doc_id AS doc_id, dd.lang, t.score_micro, t.n_bigrams
        |FROM top t JOIN (SELECT DISTINCT doc_id, lang FROM documents) dd
        |  ON dd.doc_id = t.doc_id
        |ORDER BY rnk""".stripMargin,

    // the sampling face: same score CTEs, then the Madow midpoint
    // closed form over shifted-positive weights (validated against
    // direct rational enumeration at both oracle SFs)
    "q_dsir_resample" ->
      """WITH d AS (SELECT doc_id, lang, list_filter(string_split(text,' '),
        |             t -> length(t) > 0) AS w FROM documents),
        |bg AS (SELECT doc_id, lang,
        |         CAST(('0x' || substr(md5(unnest(list_transform(
        |           range(1, len(w)), i -> w[i] || ' ' || w[i+1]))),1,8))
        |           AS UBIGINT) % 8192 AS b
        |       FROM d WHERE len(w) >= 2),
        |cs AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY b),
        |ct AS (SELECT b, CAST(count(*) AS BIGINT) AS c FROM bg
        |       WHERE lang = 'en' GROUP BY b),
        |tot AS (SELECT (SELECT CAST(sum(c) AS BIGINT) FROM cs) AS ns,
        |               (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) FROM ct)
        |                 AS nt),
        |lr AS (SELECT cs.b,
        |         CAST(floor((ln((coalesce(ct.c, 0) + 1.0) / (tot.nt + 8192.0))
        |                   - ln((cs.c + 1.0) / (tot.ns + 8192.0)))
        |              * 1000000.0 + 0.5) AS BIGINT) AS lr_micro
        |       FROM cs LEFT JOIN ct ON ct.b = cs.b CROSS JOIN tot),
        |sc AS (SELECT bg.doc_id, CAST(sum(lr.lr_micro) AS BIGINT) AS score
        |       FROM bg JOIN lr ON lr.b = bg.b GROUP BY bg.doc_id),
        |wt AS (SELECT doc_id, score - (SELECT min(score) FROM sc) + 1 AS w
        |       FROM sc),
        |pre AS (SELECT doc_id, w,
        |          coalesce(sum(w) OVER (ORDER BY doc_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |            AS c0,
        |          (SELECT CAST(sum(w) AS BIGINT) FROM wt) AS tw
        |        FROM wt)
        |SELECT doc_id, w,
        |  CAST(((c0 + w) * 200 + tw - 1) // tw // 2
        |     - (c0 * 200 + tw - 1) // tw // 2 AS BIGINT) AS n_hits
        |FROM pre
        |WHERE ((c0 + w) * 200 + tw - 1) // tw // 2
        |    - (c0 * 200 + tw - 1) // tw // 2 > 0
        |ORDER BY doc_id""".stripMargin,

    // the equivalence gate: the FULL per-source recompute — maintenance
    // changes what is scanned, never the answer
    "q_ivm_tokens" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(list_filter(string_split(text, ' '),
        |    w -> len(w) > 0))) AS BIGINT) AS tokens_total
        |FROM documents GROUP BY 1 ORDER BY source""".stripMargin,

    "q_token_budget_mix" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      w -> len(w) > 0)) AS BIGINT) AS tok,
        |    ((doc_id % 1000003) * 2654435761) % 1000000 AS h
        |  FROM documents),
        |t AS (SELECT source, CAST(sum(tok) AS BIGINT) AS tokens_total,
        |             CAST(count(*) AS BIGINT) AS n_docs
        |      FROM d GROUP BY source),
        |g AS (SELECT CAST(sum(tokens_total) // 2 AS BIGINT) AS b_total,
        |             CAST(count(*) AS BIGINT) AS n_src FROM t),
        |f AS (
        |  SELECT t.source, t.n_docs, t.tokens_total,
        |    CAST(least(1000000,
        |      (g.b_total // g.n_src) * 1000000 // t.tokens_total)
        |      AS BIGINT) AS keep_frac_micro
        |  FROM t, g)
        |SELECT f.source, f.n_docs, f.tokens_total, f.keep_frac_micro,
        |  CAST(sum(CASE WHEN d.h < f.keep_frac_micro THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN d.h < f.keep_frac_micro THEN d.tok ELSE 0 END)
        |    AS BIGINT) AS tokens_kept
        |FROM d JOIN f USING (source)
        |GROUP BY f.source, f.n_docs, f.tokens_total, f.keep_frac_micro
        |ORDER BY f.source""".stripMargin,

    // same shared quality CTEs; same div-1000 bucket (score ≥ 0, so
    // // == Spark's truncating div), same offset + within-bucket
    // row_number rank and (rank−1)·10 div N stage split
    "q_curriculum" ->
      s"""WITH ${TextQueries.qualitySql},
         |dq AS (SELECT d.doc_id, d.n_chars, q.quality_micro,
         |         q.quality_micro // 1000 AS qb
         |       FROM documents d JOIN q USING (doc_id)),
         |g AS (SELECT qb, count(*) AS cnt FROM dq GROUP BY 1),
         |cum AS (SELECT qb,
         |         coalesce(sum(cnt) OVER (ORDER BY qb DESC
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |           0) AS cb
         |        FROM g),
         |tot AS (SELECT count(*) AS n_total FROM dq),
         |rk AS (SELECT dq.n_chars, dq.quality_micro,
         |         cum.cb + row_number() OVER (PARTITION BY dq.qb
         |           ORDER BY dq.quality_micro DESC, dq.doc_id) AS grank,
         |         t.n_total
         |       FROM dq JOIN cum USING (qb) CROSS JOIN tot t),
         |st AS (SELECT 1 + (grank - 1) * 10 // n_total AS stage,
         |         n_chars, quality_micro FROM rk),
         |agg AS (SELECT CAST(stage AS BIGINT) AS stage,
         |          CAST(count(*) AS BIGINT) AS n_docs,
         |          CAST(sum(n_chars) AS BIGINT) AS char_budget,
         |          CAST(min(quality_micro) AS BIGINT) AS min_quality_micro,
         |          CAST(max(quality_micro) AS BIGINT) AS max_quality_micro
         |        FROM st GROUP BY 1)
         |SELECT stage, n_docs, char_budget, min_quality_micro,
         |  max_quality_micro,
         |  CAST(sum(char_budget) OVER (ORDER BY stage
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    AS BIGINT) AS cum_chars
         |FROM agg ORDER BY stage""".stripMargin,

    "q_sample_quality" -> {
      def wgtSql(v: String): String = TextQueries.wgtSqlDuck(v)
      s"""WITH w0 AS (
         |  SELECT doc_id, source,
         |         list_filter(string_split(text, ' '),
         |                     tk -> length(tk) > 0) AS w
         |  FROM documents),
         |b AS (
         |  SELECT doc_id, source, w,
         |         list_transform(range(1, len(w)),
         |                        i -> w[i] || '_' || w[i + 1]) AS bg
         |  FROM w0),
         |sc AS (
         |  SELECT doc_id, source, w,
         |    COALESCE(CAST(list_sum(list_transform(w,
         |      tk -> ${wgtSql("tk")})) AS BIGINT), 0)
         |    + COALESCE(CAST(list_sum(list_transform(bg,
         |      tk -> ${wgtSql("tk")})) AS BIGINT), 0) AS score
         |  FROM b),
         |k AS (
         |  SELECT doc_id, source, w,
         |    CASE WHEN score >= 0 THEN 'high' ELSE 'low' END AS bucket,
         |    ((doc_id % 1000003) * 2654435761) % 100
         |      < CASE WHEN score >= 0 THEN 90 ELSE 20 END AS kept
         |  FROM sc)
         |SELECT source, bucket,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN kept THEN len(w) ELSE 0 END) AS BIGINT)
         |    AS tokens_kept
         |FROM k GROUP BY source, bucket
         |ORDER BY source, bucket""".stripMargin
    },

    // same classifier canon; exact confusion counts, then the one
    // fixed-order kappa formula per group, each stage micro-floored
    "q_label_kappa" -> {
      def wgtSql(v: String): String = TextQueries.wgtSqlDuck(v)
      s"""WITH w0 AS (
         |  SELECT doc_id, source, n_chars,
         |         list_filter(string_split(text, ' '),
         |                     tk -> length(tk) > 0) AS w
         |  FROM documents),
         |b AS (
         |  SELECT doc_id, source, n_chars, w,
         |         list_transform(range(1, len(w)),
         |                        i -> w[i] || '_' || w[i + 1]) AS bg
         |  FROM w0),
         |sc AS (
         |  SELECT doc_id, source, n_chars,
         |    COALESCE(CAST(list_sum(list_transform(w,
         |      tk -> ${wgtSql("tk")})) AS BIGINT), 0)
         |    + COALESCE(CAST(list_sum(list_transform(bg,
         |      tk -> ${wgtSql("tk")})) AS BIGINT), 0) AS score
         |  FROM b),
         |lab AS (
         |  SELECT source, score >= 0 AS a, n_chars >= 300 AS b FROM sc),
         |cm AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n11,
         |    CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n10,
         |    CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n01,
         |    CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n00
         |  FROM lab GROUP BY source),
         |p AS (
         |  SELECT *,
         |    CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE) AS po,
         |    CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE) AS pa,
         |    CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE) AS pb
         |  FROM cm),
         |e AS (SELECT *, pa * pb + (1.0 - pa) * (1.0 - pb) AS pe FROM p)
         |SELECT source, n, n11, n10, n01, n00,
         |  CAST(floor(po * 1000000.0 + 0.5) AS BIGINT) AS po_micro,
         |  CAST(floor(pe * 1000000.0 + 0.5) AS BIGINT) AS pe_micro,
         |  CAST(floor((po - pe) / (1.0 - pe) * 1000000.0 + 0.5) AS BIGINT)
         |    AS kappa_micro
         |FROM e ORDER BY source""".stripMargin
    },

    // the oracle computes the plain per-source cumulative sum — the
    // distributed prefix-sum decomposition must be algebraically
    // invisible
    // mirrors the Spark side's exact-rational hit count; the window
    // cumsum replaces the distributed block decomposition (same sums)
    "q_sample_systematic" ->
      """WITH d AS (SELECT doc_id, n_chars AS w FROM documents),
        |c AS (SELECT doc_id, w,
        |        sum(w) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED
        |                     PRECEDING AND CURRENT ROW) - w AS c0 FROM d),
        |tot AS (SELECT sum(w) AS tw FROM d)
        |SELECT doc_id, CAST(w AS BIGINT) AS w,
        |       CAST(n_hits AS BIGINT) AS n_hits FROM (
        |  SELECT doc_id, w,
        |    ((200*(c0+w) + tw - 1) // tw) // 2
        |      - ((200*c0 + tw - 1) // tw) // 2 AS n_hits
        |  FROM c, tot) t
        |WHERE n_hits > 0 ORDER BY doc_id""".stripMargin,

    "q_pack_chop" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      w -> len(w) > 0)) AS BIGINT) AS tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, tok,
        |    COALESCE(sum(tok) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS prev_cum
        |  FROM d)
        |SELECT source, CAST(prev_cum // 256 AS BIGINT) AS seq_id,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(tok) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN tok > 0
        |      AND (prev_cum + tok - 1) // 256 > prev_cum // 256
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_straddle,
        |  CAST(min(doc_id) AS BIGINT) AS first_doc
        |FROM c GROUP BY source, seq_id
        |ORDER BY source, seq_id""".stripMargin,

    "q_profile_columns" -> (Seq(
      ("documents", "doc_id", "long"), ("documents", "text", "str"),
      ("documents", "lang", "str"), ("documents", "source", "str"),
      ("documents", "n_chars", "long"),
      ("events", "event_id", "long"), ("events", "ts", "ts"),
      ("events", "user_id", "long"), ("events", "event_type", "str"),
      ("events", "value", "double"))
      .map { case (tb, c, k) => profileSql(tb, c, k) }
      .mkString("", "\nUNION ALL\n", "\nORDER BY tbl, col")),
    // IS NULL arm matches the anti-join's semantics: a NULL source never
    // equi-matches the blocklist, so the row SURVIVES — bare NOT IN
    // would evaluate NULL and silently drop it (engines would diverge on
    // the first null-source corpus)
    "q_filter_blocklist" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents
        |WHERE source IS NULL OR source NOT IN ('src3', 'src7', 'src13')
        |GROUP BY source
        |ORDER BY source""".stripMargin,

    "q_vocab" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |SELECT tok, count(*) AS tf, count(DISTINCT doc_id) AS df
        |FROM tok GROUP BY tok ORDER BY tf DESC, tok""".stripMargin,

    "q_source_cap" ->
      s"""WITH ${TextQueries.qualitySql},
         |ranked AS (
         |  SELECT d.source, d.doc_id, d.n_chars, q.quality_micro,
         |         row_number() OVER (PARTITION BY d.source
         |                            ORDER BY q.quality_micro DESC, d.doc_id) AS rk
         |  FROM documents d JOIN q USING (doc_id))
         |SELECT source,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN rk <= 15 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(min(CASE WHEN rk <= 15 THEN quality_micro END) AS BIGINT) AS cap_quality_micro,
         |  CAST(sum(CASE WHEN rk <= 15 THEN n_chars END) AS BIGINT) AS kept_chars
         |FROM ranked GROUP BY source ORDER BY source""".stripMargin,

    // exact counts cross-checked; the TRUE literals are the expectation
    // that Spark's count-min estimates respect their bound (see query)
    "q_approx_topk" ->
      """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |c AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok)
        |SELECT tok, CAST(cnt AS BIGINT) AS exact_cnt, TRUE AS cms_within_bound
        |FROM c ORDER BY exact_cnt DESC, tok LIMIT 10""".stripMargin,

    "q_bigram_pmi" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |bigrams AS (
        |  SELECT a, b FROM (
        |    SELECT unnest([w[i] FOR i IN range(1, greatest(len(w) - 1, 1) + 1)]) AS a,
        |           unnest([w[i + 1] FOR i IN range(1, greatest(len(w) - 1, 1) + 1)]) AS b
        |    FROM d)
        |  WHERE b IS NOT NULL),
        |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM bigrams),
        |pair AS (SELECT a, b, count(*) AS n_ab FROM bigrams GROUP BY a, b HAVING count(*) >= 5),
        |la AS (SELECT a, count(*) AS n_a FROM bigrams GROUP BY a),
        |rb AS (SELECT b, count(*) AS n_b FROM bigrams GROUP BY b)
        |SELECT p.a, p.b, p.n_ab,
        |       round(ln((p.n_ab * t.n) / (la.n_a::DOUBLE * rb.n_b::DOUBLE)), 6) AS pmi
        |FROM pair p, tot t
        |JOIN la ON la.a = p.a
        |JOIN rb ON rb.b = p.b
        |ORDER BY p.a, p.b""".stripMargin,

    "q_train_split" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CASE WHEN ((doc_id % 1000003) * 2654435761) % 100 < 80 THEN 'train'
        |         WHEN ((doc_id % 1000003) * 2654435761) % 100 < 90 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT split, count(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM s GROUP BY split ORDER BY split""".stripMargin,

    "q_sample_mix" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    0.5 + (CAST(regexp_extract(source, '[0-9]+') AS INT) % 4) * 0.75 AS w,
        |    ((doc_id % 1000003) * 2654435761) % 100 AS h
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, source,
        |    CAST(floor(w) AS INT)
        |      + (CASE WHEN h < CAST((w - floor(w)) * 100 AS INT) THEN 1 ELSE 0 END)
        |      AS n_epochs
        |  FROM d)
        |SELECT doc_id, source, CAST(unnest(range(1, n_epochs + 1)) AS INT) AS epoch
        |FROM n WHERE n_epochs > 0
        |ORDER BY doc_id, epoch""".stripMargin,

    "q_export_shards" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         ((doc_id % 1000003) * 2654435761) % 1000000007 AS h
        |  FROM documents)
        |SELECT doc_id,
        |       CAST(h % 16 AS BIGINT) AS shard,
        |       CAST(row_number() OVER (PARTITION BY h % 16 ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
        |FROM d ORDER BY shard, pos""".stripMargin,

    "q_lang_temperature" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |p AS (
        |  SELECT lang, n,
        |    CAST(n AS DOUBLE) / sum(n) OVER (ORDER BY lang
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS p
        |  FROM c),
        |q AS (
        |  SELECT lang, n, p,
        |    sqrt(p) / sum(sqrt(p)) OVER (ORDER BY lang
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS q
        |  FROM p)
        |SELECT lang, n,
        |  CAST(floor(p * 1000000.0 + 0.5) AS BIGINT) AS p_micro,
        |  CAST(floor(q * 1000000.0 + 0.5) AS BIGINT) AS q_micro,
        |  CAST(floor(q / p * 1000000.0 + 0.5) AS BIGINT) AS boost_micro
        |FROM q ORDER BY lang""".stripMargin,

    "q_pack_sequences" ->
      """WITH RECURSIVE d AS (
        |  SELECT source, doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |  FROM documents),
        |pack(source, rn, doc_id, n_tok, seq_id, used) AS (
        |  SELECT source, rn, doc_id, n_tok, CAST(0 AS BIGINT), n_tok
        |  FROM d WHERE rn = 1
        |  UNION ALL
        |  SELECT d.source, d.rn, d.doc_id, d.n_tok,
        |         CASE WHEN p.used + d.n_tok <= 256 THEN p.seq_id ELSE p.seq_id + 1 END,
        |         CASE WHEN p.used + d.n_tok <= 256 THEN p.used + d.n_tok ELSE d.n_tok END
        |  FROM pack p JOIN d ON d.source = p.source AND d.rn = p.rn + 1)
        |SELECT source, doc_id, n_tok, CAST(seq_id AS BIGINT) AS seq_id,
        |       CAST(used - n_tok AS BIGINT) AS tok_offset
        |FROM pack ORDER BY source, doc_id""".stripMargin,

    "q_pipeline_clean" -> {
      def wgtSql(v: String): String = TextQueries.wgtSqlDuck(v)
      s"""WITH w0 AS (
         |  SELECT doc_id, text, source, n_chars,
         |         list_filter(string_split(text, ' '),
         |                     tk -> length(tk) > 0) AS w
         |  FROM documents),
         |w1 AS (
         |  -- bigram STRINGS materialize before weighting: wgt's inner
         |  -- lambda binds `i` for char positions and would capture an
         |  -- outer index variable (the q_text_classifier oracle shape)
         |  SELECT doc_id, text, source, n_chars, w,
         |         list_transform(range(1, len(w)),
         |                        i -> w[i] || '_' || w[i + 1]) AS bg
         |  FROM w0),
         |sc AS (
         |  SELECT doc_id, text, source, n_chars,
         |    COALESCE(CAST(list_sum(list_transform(w,
         |      tk -> ${wgtSql("tk")})) AS BIGINT), 0)
         |    + COALESCE(CAST(list_sum(list_transform(bg,
         |      tk -> ${wgtSql("tk")})) AS BIGINT), 0)
         |      AS quality,
         |    doc_id % 20 = 0 AS is_bench,
         |    COALESCE(source IN ('src3', 'src7', 'src13'), FALSE) AS blocked
         |  FROM w1),
         |k AS (
         |  SELECT md5(text) AS h, min(doc_id) AS keep_id
         |  FROM sc WHERE NOT is_bench AND NOT blocked AND quality >= 0
         |  GROUP BY md5(text)),
         |shg AS (
         |  SELECT doc_id,
         |         unnest([array_to_string(ww[i:i+4], ' ')
         |                 FOR i IN range(1, greatest(len(ww) - 4, 1) + 1)]) AS sh
         |  FROM (SELECT doc_id, string_split(text, ' ') AS ww FROM documents)),
         |sets AS (SELECT DISTINCT doc_id, sh FROM shg),
         |ct AS (
         |  SELECT DISTINCT c.doc_id FROM sets c
         |  JOIN sets b ON b.sh = c.sh AND b.doc_id % 20 = 0
         |  WHERE c.doc_id % 20 <> 0),
         |st AS (
         |  SELECT sc.source, sc.n_chars,
         |    CASE WHEN sc.is_bench THEN 'bench'
         |         WHEN sc.blocked THEN 'blocked'
         |         WHEN sc.quality < 0 THEN 'low_quality'
         |         WHEN sc.doc_id <> k.keep_id THEN 'duplicate'
         |         WHEN ct.doc_id IS NOT NULL THEN 'contaminated'
         |         ELSE 'kept' END AS stage
         |  FROM sc LEFT JOIN k ON md5(sc.text) = k.h
         |          LEFT JOIN ct ON ct.doc_id = sc.doc_id)
         |SELECT source,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(coalesce(sum(CASE WHEN stage = 'bench' THEN 1 END), 0) AS BIGINT) AS n_bench,
         |  CAST(coalesce(sum(CASE WHEN stage = 'blocked' THEN 1 END), 0) AS BIGINT) AS n_blocked,
         |  CAST(coalesce(sum(CASE WHEN stage = 'low_quality' THEN 1 END), 0) AS BIGINT) AS n_lowq,
         |  CAST(coalesce(sum(CASE WHEN stage = 'duplicate' THEN 1 END), 0) AS BIGINT) AS n_dup,
         |  CAST(coalesce(sum(CASE WHEN stage = 'contaminated' THEN 1 END), 0) AS BIGINT) AS n_contam,
         |  CAST(coalesce(sum(CASE WHEN stage = 'kept' THEN 1 END), 0) AS BIGINT) AS n_kept,
         |  CAST(coalesce(sum(CASE WHEN stage = 'kept' THEN n_chars END), 0) AS BIGINT) AS kept_chars
         |FROM st GROUP BY source ORDER BY source""".stripMargin
    },

    // same md5 draw order; quota ceil(n/10) in pure integer math
    "q_stratified_sample" ->
      """WITH r AS (
        |  SELECT source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk,
        |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_src
        |  FROM documents)
        |SELECT source, max(n_src) AS n_docs,
        |  CAST(count(CASE WHEN rk <= (n_src + 9) // 10 THEN 1 END)
        |    AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN rk <= (n_src + 9) // 10 THEN n_chars END)
        |    AS BIGINT) AS kept_chars,
        |  CAST(max(CASE WHEN rk <= (n_src + 9) // 10 THEN doc_id END)
        |    AS BIGINT) AS max_kept_id
        |FROM r GROUP BY source ORDER BY source""".stripMargin,

    "q_chunk_windows" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |c AS (
        |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tok, w,
        |    unnest(generate_series(1, greatest(CAST(len(w) AS BIGINT), 1), 48))
        |      AS st
        |  FROM d)
        |SELECT doc_id,
        |  CAST((st - 1) // 48 AS BIGINT) AS chunk_idx,
        |  CAST(st AS BIGINT) AS tok_start,
        |  CAST(len(w[st:least(st + 63, n_tok)]) AS BIGINT) AS n_tokens,
        |  md5(array_to_string(w[st:least(st + 63, n_tok)], ' ')) AS chunk_fp
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    "q_rebalance" ->
      """WITH r AS (
        |  SELECT label, vec_id,
        |         row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
        |  FROM embeddings)
        |SELECT label, count(*) AS n_kept, max(vec_id) AS max_kept_id
        |FROM r WHERE rn <= 30 GROUP BY label ORDER BY label""".stripMargin
  )
}
