package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Structural scale guards over EVERY declared query's physical plan — the
  * automated version of the `graft.Explain` audit. Regressions that run fine
  * at test scale but die at 100 TB (a cartesian product, a filter that
  * stopped reaching the parquet scan) fail here instead of in production.
  */
class PlanAuditSpec extends SparkSpec {

  private lazy val plans: Map[String, String] =
    SparkEntry.queries.map { case (name, q) =>
      name -> q(spark, sf0001).queryExecution.executedPlan.toString
    }

  test("no declared query plans a CartesianProduct") {
    // crossJoin is only ever used against broadcast single-row/centroid
    // frames, which plan as BroadcastNestedLoopJoin over a tiny build side —
    // an unhinted CartesianProduct means a join lost its equi-condition.
    val offenders = plans.filter(_._2.contains("CartesianProduct")).keys.toSeq
    assert(offenders.isEmpty, s"cartesian product in: $offenders")
  }

  test("filter queries push predicates into the parquet scan") {
    assert(plans("q04_filter").contains("PushedFilters: ["))
    assert(plans("q04_filter").matches("(?s).*PushedFilters: \\[[^]]*GreaterThan\\(l_quantity,45.*"))
  }

  test("scans are column-pruned: q01 reads only the 3 projected event columns") {
    val scanSchema = "ReadSchema: [^\n]*".r.findFirstIn(plans("q01_project")).get
    assert(!scanSchema.contains("value"), scanSchema) // unused wide column stays unread
    assert(scanSchema.contains("event_id") && scanSchema.contains("event_type"))
  }

  test("top-k queries use TakeOrderedAndProject, not a global sort") {
    Seq("q08_join_topk", "q18_wordcount", "q19_cosine_topk").foreach { n =>
      assert(plans(n).contains("TakeOrderedAndProject"), n)
    }
  }

  test("dimension joins broadcast the small side") {
    assert(plans("q07_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("no window sort in the IVF assignment path") {
    assert(!plans("sim_ivf_topk").contains("RunningWindowFunction"))
    assert(!plans("sim_ivf_topk").contains("row_number"))
  }

  test("mixture sampling is a stateless filter: no hash shuffle before the final sort") {
    // only the oracle-determinism orderBy may exchange (range partitioning)
    assert(!plans("mix_sample").contains("hashpartitioning"), plans("mix_sample"))
  }

  test("decontamination broadcasts the holdout side") {
    assert(plans("dedup_decontam").contains("BroadcastHashJoin"))
  }

  test("pack_shards windows over (source, chunk), never the whole source") {
    // the r2 scale-killer: a single Window.partitionBy(source) caps
    // parallelism at the source count. Two-level packing must show the chunk
    // column in every row-level window partition spec.
    val p = plans("pack_shards")
    assert(!"windowspecdefinition\\(source#\\d+, doc_id#".r.findFirstIn(p).isDefined,
      "row-level window partitioned by source alone")
    assert("windowspecdefinition\\(source#\\d+, chunk#".r.findFirstIn(p).isDefined, p)
  }

  test("skew join salts the shuffle key and stays on the sort-merge path") {
    val p = plans("q30_skew_join")
    assert(p.contains("SortMergeJoin"), p)
    assert(p.contains("_salt"), p)
  }

  test("bucketed staging join runs exchange-free") {
    val p = plans("q31_bucketed_join")
    assert(p.contains("SelectedBucketsCount"), p) // really a bucketed scan
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange hashpartitioning"),
      "join or aggregation re-shuffled a bucketed key:\n" + p)
  }

  test("staged ANN probes prune buckets: the scan reads only probe buckets") {
    // the r3 `weak`: single-query ANN lookups that scan the full corpus.
    // The staged variants make the LSH code / IVF list id a STORAGE key, so
    // the probe's IN() literals must prune the bucketed scan — strictly
    // fewer buckets read than exist (9 probe codes can touch at most 9 of
    // 16 LSH buckets; 2 probe lists at most 2 of 8 IVF buckets).
    // the lexical index is the same move for text: a 3-term literal probe
    // reads at most 3 of the postings table's 8 term buckets
    // sim_batch_staged: 3 queries × 9 probe codes = ≤27 literals over 16
    // buckets — the bound is "strictly fewer than all" (sel < total below)
    // mm_search: the cross-modal typed probe reads at most its nprobe=4
    // inverted lists' buckets, kind predicate inside the pruned scan
    Seq("sim_lsh_staged" -> 9, "sim_ivf_staged" -> 2, "sim_ivfpq_staged" -> 2,
        "sim_ivf_trained_staged" -> 2,
        // adaptive arm: 2 probe lists over kc buckets (16 at the floor —
        // bucket count tracks list count, that's the whole point)
        "sim_ivf_staged_adaptive" -> 2,
        // the routed-assignment twin probes identically
        "sim_ivf_staged_2level" -> 2,
        // batch IVF probe: union of 3 queries' 2-list probe sets, ≤ 6
        // literal cids over 8 buckets
        "sim_batch_ivf_staged" -> 6,
        // the rerank's pool comes off the same 2-list pruned code scan
        "sim_ivfpq_staged_rerank" -> 2,
        // the deletion lifecycles' declared results are the plain
        // post-apply probes — still pruned scans (2 lists for the IVF
        // arms, the 9-code Hamming-1 ball for LSH)
        "sim_index_delete" -> 2,
        "sim_ivfpq_delete" -> 2,
        "sim_lsh_delete" -> 9,
        // frame probe: ≤ nprobe·|query frames| literal cids, must still
        // read strictly fewer than all 8 cid buckets
        "mm_search_maxsim" -> 7,
        "sim_batch_staged" -> (SimilarityQueries.stagedLshBuckets - 1),
        "search_lexical_staged" -> RetrievalQueries.lexTerms.length,
        "mm_search" -> MultimodalQueries.searchNprobe).foreach { case (n, maxSel) =>
      val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plans(n))
      assert(m.isDefined, s"$n probe scan is not bucket-pruned:\n${plans(n)}")
      val (sel, total) = (m.get.group(1).toInt, m.get.group(2).toInt)
      assert(sel <= maxSel && sel < total, s"$n read $sel of $total buckets")
    }
  }

  test("filtered ANN probe still bucket-prunes with the widened ball") {
    // Hamming ≤2 at width p is 1 + p + C(p,2) literal codes; over 16 buckets
    // the scan must still read strictly fewer buckets than exist
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(plans("sim_filter_topk"))
    assert(m.isDefined, s"filtered probe not bucket-pruned:\n${plans("sim_filter_topk")}")
    assert(m.get.group(1).toInt < m.get.group(2).toInt, m.get.group(0))
    // and the label predicate is applied in the scan, not after the top-k
    assert(plans("sim_filter_topk").contains("label"), plans("sim_filter_topk"))
    // the IVF arm (r12 — the arm whose filtered recall holds at sf1): 4
    // probe lists over 8 cid buckets, predicate in the pruned scan
    val mi = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(plans("sim_filter_ivf"))
    assert(mi.isDefined, s"filtered IVF probe not bucket-pruned:\n${plans("sim_filter_ivf")}")
    val (isel, itot) = (mi.get.group(1).toInt, mi.get.group(2).toInt)
    assert(isel <= SimilarityQueries.filterNprobe && isel < itot,
      s"filtered IVF probe read $isel of $itot buckets")
    assert(plans("sim_filter_ivf").contains("label"), plans("sim_filter_ivf"))
  }

  test("zone-map range query prunes the time-clustered scan to its zones") {
    // the 6-day window overlaps 3 of the fixture's 3-day zones, so the
    // bucket-pruned probe must read at most 3 of the 8 zone buckets
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(plans("q101_zonemap"))
    assert(m.isDefined, s"zone probe scan is not bucket-pruned:\n${plans("q101_zonemap")}")
    val (sel, total) = (m.get.group(1).toInt, m.get.group(2).toInt)
    assert(sel <= 3 && sel < total, s"zone probe read $sel of $total buckets")
  }

  test("funnel stages are thin aggregates, not a window over the event history") {
    // the scale shape: three filtered groupBy(min)s joined on user_id. A
    // window over each user's full event sequence would buffer the history
    // per user; the aggregate form shuffles one row per (user, stage).
    val p = plans("q42_funnel")
    assert(!p.contains("windowspecdefinition"), p)
    assert(p.contains("partial_min") || p.contains("HashAggregate"), p)
  }

  test("duplicate-span detection never joins documents to documents") {
    // spans are found by AGGREGATING on the span hash — any join in this
    // plan means a doc-to-doc comparison crept in, which is the O(n²) shape
    // the operator exists to avoid.
    assert(!plans("dedup_spans").contains("Join"), plans("dedup_spans"))
  }

  test("tfidf and bm25 corpus stats ride a broadcast, not a driver collect or shuffle") {
    // N / avgdl are single-row aggregates crossJoined back in; they must
    // plan as BroadcastNestedLoopJoin (tiny build side), never a cartesian
    // or a hash-exchange of the token stream against a one-row frame.
    Seq("text_tfidf", "text_bm25").foreach { n =>
      assert(plans(n).contains("BroadcastNestedLoopJoin"), n)
    }
  }

  test("weighted sampling is a stateless filter: no hash shuffle before the final sort") {
    assert(!plans("mix_weighted").contains("hashpartitioning"), plans("mix_weighted"))
  }

  test("range window uses a RangeFrame over the epoch key, not a row frame") {
    assert(plans("q43_range_window").contains("RangeFrame"), plans("q43_range_window"))
  }

  test("unpivot plans a single Expand over one scan, not a self-union") {
    val p = plans("q36_unpivot")
    assert(p.contains("Expand"), p)
    assert("Scan parquet".r.findAllIn(p).length == 1, "lineitem scanned more than once")
  }

  test("reduced-space similarity search keeps the TakeOrdered top-k shape") {
    assert(plans("sim_rp_topk").contains("TakeOrderedAndProject"))
  }

  test("PQ ranking: kernel encode/ADC keep the plan map-only — no exchange, no window, top-k is TakeOrdered") {
    // pre-r16 these arms broadcast the codebook/LUT into join-aggregate
    // chains; the r16 kernels fold the bounded artifacts inside a single
    // projection, so the whole ranking must plan with NO exchange of any
    // kind before the TakeOrdered
    Seq("sim_pq_topk", "sim_ivfpq_topk").foreach { n =>
      val p = plans(n)
      assert(!p.contains("Exchange hashpartitioning"), n)
      assert(!p.contains("windowspecdefinition"), n)
      assert(p.contains("TakeOrderedAndProject"), n)
    }
  }

  test("decontamination filters raw shingles broadcast-side before any dedup shuffle") {
    val p = plans("dedup_decontam")
    // the CORPUS branch — the text between the BroadcastHashJoin node and
    // its BroadcastExchange build side — must contain no hashpartitioning
    // exchange: the raw shingle stream meets the broadcast filter inside the
    // scan stage, and the set-semantics distinct runs on survivors only
    // (above the join). The holdout build side may dedup itself — it's tiny.
    val joinIdx = p.indexOf("BroadcastHashJoin")
    val buildIdx = p.indexOf("BroadcastExchange", joinIdx)
    assert(joinIdx >= 0 && buildIdx > joinIdx, p)
    val corpusBranch = p.substring(joinIdx, buildIdx)
    assert(!corpusBranch.contains("Exchange hashpartitioning"),
      "corpus shingles shuffled before the holdout filter:\n" + p)
  }

  test("incremental dedup pushes the old/new cross filter below the band self-join") {
    // at scale this is the difference between banding the whole corpus
    // against itself and banding old×new only: both branches of the
    // candidate self-join must carry their side's doc_id filter.
    val p = plans("dedup_incr")
    assert("Filter [^\n]*doc_id#\\d+L? < 250".r.findFirstIn(p).isDefined, p)
    assert("Filter [^\n]*doc_id#\\d+L? >= 250".r.findFirstIn(p).isDefined, p)
  }

  test("stats profile is one scan + one aggregate: no join, no window") {
    val p = plans("q44_stats")
    assert("Scan parquet".r.findAllIn(p).length == 1, "lineitem scanned more than once")
    assert(!p.contains("Join") && !p.contains("windowspecdefinition"), p)
  }

  test("grouped OLS regression is one scan + one aggregate, and its closed forms are right") {
    val p = plans("q62_regression")
    assert("Scan parquet".r.findAllIn(p).length == 1, "events scanned more than once")
    assert(!p.contains("Join") && !p.contains("windowspecdefinition"), p)
    // closed forms against a hand-computed fixture: y = 2x + 1 exactly,
    // so slope 2, intercept 1, r2 1 with no float slack
    import spark.implicits._
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond
    val fix = Seq((1L, "lin"), (2L, "lin"), (3L, "lin"))
      .map { case (x, t) => (t, java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(base + x)), 2.0 * x + 1.0) }
      .toDF("event_type", "ts", "value")
      .withColumn("event_id", org.apache.spark.sql.functions.lit(0L))
    val dir = java.nio.file.Files.createTempDirectory("q62fix").toString
    fix.select("event_id", "ts", "event_type", "value").write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val r = graft.queries.CoreQueries.q62(spark, dir).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Double]("slope") === 2.0)
    assert(r(0).getAs[Double]("intercept") === 1.0)
    assert(r(0).getAs[Double]("r2") === 1.0)
  }

  test("histogram and LM-score broadcast their single-row stats, never shuffle against them") {
    Seq("q45_histogram", "text_lm_score").foreach { n =>
      assert(plans(n).contains("BroadcastNestedLoopJoin"), n)
    }
  }

  test("outlier fences ride a broadcast hash join back over the scan") {
    assert(plans("q46_outliers").contains("BroadcastHashJoin"), plans("q46_outliers"))
  }

  test("z-order cell profile is aggregation-only: the bitwise fold never plans a join") {
    val p = plans("q47_zorder")
    assert(!p.contains("Join"), p)
    assert("Scan parquet".r.findAllIn(p).length == 1, p)
  }

  test("vocabulary ranking is a TakeOrdered top-k; the id window runs above it") {
    val p = plans("text_vocab")
    assert(p.contains("TakeOrderedAndProject"), p)
    // the single-partition id window must consume the top-k output (bounded
    // by vocabSize), not the full token-frequency table: in the bottom-up
    // plan string the TakeOrdered node appears BELOW (after) the Window node
    assert(p.indexOf("TakeOrderedAndProject") > p.indexOf("Window"),
      "row_number window planned below the top-k limit:\n" + p)
  }

  test("heavy hitters aggregate partially: the sketch combines map-side") {
    val p = plans("text_heavy")
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial_freq_items_agg"), p)
  }

  test("hybrid fusion: each arm ends in a TakeOrdered; rank windows run above the limits") {
    val p = plans("search_hybrid")
    // both arms' top-k (corpus is never globally sorted)
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 2, p)
    // the unpartitioned rank windows are fed by the armDepth-row limits, so
    // every Window in this plan sits above a limit, never above a scan
    assert(p.contains("windowspecdefinition"), p)
  }

  test("merge upsert is one full-outer equi-join: no row read twice, no cartesian") {
    val p = plans("q48_merge_upsert")
    assert(p.contains("FullOuter"), p)
    assert("SortMergeJoin|ShuffledHashJoin".r.findFirstIn(p).isDefined, p)
  }

  test("redaction is scan-local: a regexp chain with no shuffle before the TakeOrdered") {
    val p = plans("text_redact")
    assert(!p.contains("hashpartitioning"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("quality normalization and reservoir sampling window per-source, never globally") {
    Seq("text_quality_norm", "mix_reservoir").foreach { n =>
      val p = plans(n)
      assert("windowspecdefinition\\(source#\\d+".r.findFirstIn(p).isDefined,
        s"$n window is not partitioned by source:\n$p")
    }
  }

  test("drift profile: two broadcast envelopes, filtered-count aggregates, no window, no wide shuffle") {
    val p = plans("curate_drift")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("windowspecdefinition"), p)
    // the only hash shuffle keys on source (driftBins+1 numbers per source)
    assert(p.contains("HashAggregate"), p)
  }

  test("column profile is a single Expand over one scan, then one aggregation") {
    val p = plans("q49_profile")
    assert(p.contains("Expand"), p)
    assert(!p.contains("Join"), p) // per-column UNION of scans would join/union; unpivot must not
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
  }

  test("source overlap joins distinct (source, span) pairs — fan-out bounded by sources, not docs") {
    val p = plans("dedup_overlap")
    // the distinct must sit below the self-join on both branches
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("sequence packing fans out via Generate (explode), never a token-row join") {
    val p = plans("pack_seqs")
    assert(p.contains("Generate"), p)      // sequence() explode — bounded fan-out
    assert(!p.contains("CartesianProduct"), p)
    // same two-level window backbone as pack_shards: windows partition by
    // (source, chunk) / (source), never a global (empty-key) window
    assert(!p.matches("(?s).*Window.*partitionBy=\\[\\].*"), p)
  }

  test("semantic dedup pairs join per-cluster on cid — an equi-join, not a corpus cross join") {
    val p = plans("dedup_semantic")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("retention rollup is join + partial-aggregable distinct count, no per-user window") {
    val p = plans("q50_retention")
    assert(!p.contains("Window"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p) // partial + final
  }

  test("recall harness: both arms end in TakeOrdered; the intersection joins two k-row frames") {
    val p = plans("sim_recall")
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 2, p)
  }

  test("edit-distance verify spreads its quadratic work: the pair frame is explicitly repartitioned") {
    // the pair frame is tiny in bytes but each row costs O(len²) — AQE's
    // size-based coalescing would serialize the Levenshtein pass onto one
    // task; the explicit numPartitions (REPARTITION_BY_NUM) pins the spread
    val p = plans("dedup_editdist")
    assert(p.contains("REPARTITION_BY_NUM"), p)
  }

  test("chunking is scan-local: explode fan-out with no shuffle before the output sort") {
    val p = plans("chunk_docs")
    assert(p.contains("Generate"), p)
    // the only Exchange is the final rangepartitioning for the ORDER BY —
    // chunk computation itself never shuffles
    val exchanges = "Exchange [a-z]+partitioning".r.findAllIn(p).toSeq
    assert(exchanges.forall(_.contains("rangepartitioning")), p)
  }

  test("epoch sampling: broadcast rate table + bounded explode, no wide shuffle") {
    val p = plans("mix_epochs")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("Generate"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("tokenizer analytics keep their scale shapes: PMI TakeOrdered, OOV broadcast anti-join") {
    assert(plans("text_pmi").contains("TakeOrderedAndProject"), plans("text_pmi"))
    val oov = plans("text_oov")
    assert(oov.contains("BroadcastHashJoin LeftAnti") ||
      oov.matches("(?s).*BroadcastHashJoin.*LeftAnti.*"), oov)
  }

  test("growth accounting: the cumulative window follows aggregation, no per-user window") {
    val p = plans("q53_growth")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p) // partial + final
    assert("Window".r.findAllIn(p).size <= 2, p)        // day-axis running sum only
  }

  test("end-to-end dump adds no shuffle beyond its member stages") {
    val p = plans("pipeline_dump")
    assert(!p.contains("CartesianProduct"), p)
    // the packer's two-level windows partition by (source[, chunk]) — no
    // empty-key global window anywhere in the composed plan
    assert(!p.matches("(?s).*Window.*partitionBy=\\[\\].*"), p)
  }

  test("bloom join: the might_contain prefilter sits below the join, in the fact scan stage") {
    val p = plans("q54_bloom_join")
    assert(p.contains("graft_might_contain"), p)
    // the probe must run BEFORE the join — i.e. appear later in the plan
    // string (deeper in the tree) than the join operator itself
    val joinAt = p.indexOf("Join")
    val probeAt = p.indexOf("graft_might_contain")
    assert(joinAt >= 0 && probeAt > joinAt,
      s"probe filter not below the join (join@$joinAt, probe@$probeAt)")
  }

  test("dsir selection: bounded log-ratio table broadcasts, staged features, no window") {
    val p = plans("mix_dsir")
    assert(p.contains("BroadcastHashJoin"), p)
    // the gram explode runs ONCE inside the eager feature staging (the
    // dedup shingle pattern); the declared plan reads the checkpointed
    // feature frame — so no Generate may appear here, and no window either
    assert(p.contains("ExistingRDD") || p.contains("LogicalRDD") ||
      p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("Generate"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("ship priority (Q3 shape): date filters reach the scans, customer broadcasts, top-k is TakeOrdered") {
    val p = plans("q58_ship_priority")
    assert(p.matches("(?s).*PushedFilters: \\[[^]]*LessThan\\(o_orderdate.*"), p)
    assert(p.matches("(?s).*PushedFilters: \\[[^]]*GreaterThan\\(l_shipdate.*"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("pooling and profiling stay aggregate-only: no window, no join wider than the bounded matrix") {
    // mean-pooling and the dim profile must partial-aggregate (decimal
    // moment sums) — a Window or corpus-side join here would mean the
    // pooling shape regressed to a per-row sort
    Seq("sim_dim_profile", "q56_skew_profile", "q57_table_checksum").foreach { n =>
      assert(!plans(n).contains("Window"), s"$n plans a Window:\n${plans(n)}")
    }
    assert(!plans("sim_dim_profile").contains("Join"), plans("sim_dim_profile"))
    assert(!plans("q57_table_checksum").contains("Join"), plans("q57_table_checksum"))
    // quantile bins: cuts are embedded literals (selection ran eagerly), so
    // the declared plan is scan → bin → partial agg, windowless and joinless
    assert(!plans("q55_quantile_bins").contains("Window"), plans("q55_quantile_bins"))
    assert(!plans("q55_quantile_bins").contains("Join"), plans("q55_quantile_bins"))
  }

  test("scd2 stays single-shuffle: one exchange, no join") {
    // a pure window/rollup pipeline keyed on one column — a Join or a
    // second hashpartitioning would mean the gaps-and-islands construction
    // regressed into self-joins (quadratic at 100 TB)
    val p = plans("q63_scd2")
    assert(!p.contains("Join"), s"q63 plans a join:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"q63 has $exchanges hash exchanges:\n$p")
  }

  test("transition matrix is window-only and snapshot diff joins exactly once") {
    val t = plans("q66_transitions")
    assert(!t.contains("Join"), s"q66 must not self-join the stream:\n$t")
    // user-keyed window + the (tiny, partial-agg'd) pair-count exchange —
    // anything beyond those two means the lag regressed into a self-join
    assert("Exchange hashpartitioning".r.findAllIn(t).size <= 2, t)
    assert(t.contains("Window"), t)
    val d = plans("q67_snapshot_diff")
    assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(d).size == 1,
      s"q67 must diff through ONE key join:\n$d")
  }

  test("gap audit is closed-form: no calendar explode, no join, windowless") {
    val p = plans("q65_gap_audit")
    assert(!p.contains("Generate"), s"expected-hours must not explode:\n$p")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
  }

  test("interval coverage and SNM are window pipelines: no join anywhere") {
    // both are single-sort-key constructions — a Join means the islands
    // merge (q68) or the neighborhood pairing (snm) regressed into a
    // self-join, which is the quadratic shape these operators exist to avoid
    Seq("q68_interval_coverage", "dedup_snm").foreach { n =>
      val p = plans(n)
      assert(!p.contains("Join"), s"$n plans a join:\n$p")
      assert(p.contains("Window"), s"$n lost its window:\n$p")
    }
  }

  test("MAD outliers broadcast the stats frames back; the events never re-shuffle") {
    val p = plans("q69_mad_outliers")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"per-type stats must broadcast, not shuffle the events:\n$p")
  }

  test("movers/EWMA windows run on the aggregate, never the fact scan") {
    // the window partition column must be the post-rollup key; a window
    // whose spec carries the raw fact key (o_orderkey / event_id) would mean
    // the lag smoothing regressed onto the unaggregated stream
    Seq("q70_pop_movers", "q71_ewma").foreach { n =>
      val p = plans(n)
      assert(p.contains("Window"), s"$n lost its window:\n$p")
      assert(!p.contains("event_id#") || !"windowspecdefinition\\([^)]*event_id#".r
        .findFirstIn(p).isDefined, s"$n windows over the raw stream:\n$p")
      assert(p.contains("partial_"), s"$n lost partial aggregation:\n$p") // map-side combine before the rollup shuffle
    }
  }

  test("incremental agg merges two partial states through a union, no join") {
    val p = plans("q72_incr_agg")
    assert(p.contains("Union"), p)
    assert(!p.contains("Join"), s"state merge must not join:\n$p")
  }

  test("triangle census closes edges over adjacency arrays: no wedge rows in any exchange") {
    val p = plans("graph_triangles")
    // r13: the closure count is the codegen'd sorted-merge expression, not
    // the generic hash-set array_intersect
    assert(p.contains("sortedlongintersectcount"),
      s"closure must merge-count adjacency arrays in-project:\n$p")
    assert(!p.contains("LeftSemi"),
      s"the wedge-materializing semi-join shape is retired:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("zipf fit and budget selection window over per-source aggregates") {
    Seq("text_zipf", "curate_budget").foreach { n =>
      val p = plans(n)
      assert(!p.contains("Join"), s"$n plans a join:\n$p")
      assert("windowspecdefinition\\(source#".r.findFirstIn(p).isDefined,
        s"$n must window per source:\n$p")
    }
  }

  test("rolling WAU never plans a distinct-over-window: bounded explode + one count") {
    val p = plans("q73_rolling_wau")
    assert(!p.contains("Join"), s"WAU must not join days to activity:\n$p")
    assert(p.contains("Generate"), s"lost the coverage-interval explode:\n$p")
    assert(p.contains("partial_count"), s"day rollup lost map-side combine:\n$p")
  }

  test("Pareto cumsum is two-level: within-band windows, band offsets broadcast") {
    val p = plans("q74_pareto")
    assert("windowspecdefinition\\(band#".r.findFirstIn(p).isDefined,
      s"part-level cumsum must partition by band:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"band offsets and the total must broadcast:\n$p")
  }

  test("basket pairs come from ONE co-partitioned equi-self-join; ranking is top-k") {
    val p = plans("q75_basket")
    assert(p.contains("TakeOrderedAndProject"), s"lift ranking must be top-k:\n$p")
    val sortMerges = "SortMergeJoin".r.findAllIn(p).length
    val shuffledHash = "ShuffledHashJoin".r.findAllIn(p).length
    // The orderkey pair self-join plus at most the two part-count joins:
    // pc is deliberately UNHINTED (part-catalog-sized at 100 TB — r8 ADVICE),
    // so the static plan may shuffle it and AQE demotes to broadcast at
    // runtime when it measures small.
    assert(sortMerges + shuffledHash <= 3,
      s"only the orderkey pair join and the unhinted part-count joins may shuffle:\n$p")
  }

  test("cohort LTV windows partition by cohort; cohort sizes broadcast") {
    val p = plans("q76_cohort_ltv")
    assert("windowspecdefinition\\(cohort#".r.findFirstIn(p).isDefined,
      s"cumulative must partition by cohort:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"cohort sizes must broadcast:\n$p")
  }

  test("stat tests are single-scan moment rollups") {
    // chi2: contingency margins broadcast back, never a fact re-shuffle
    val chi = plans("q77_chi2")
    assert(!chi.contains("SortMergeJoin") && !chi.contains("ShuffledHashJoin"), chi)
    // corr: NO join at all — one aggregate row unfolds into the pair rows
    val corr = plans("q79_corr")
    assert(!corr.contains("Join"), s"corr matrix must be join-free:\n$corr")
    assert(corr.contains("Generate"), s"pair unfold lost its explode:\n$corr")
    // all three partial-aggregate before their single shuffle
    Seq("q77_chi2", "q78_abtest", "q79_corr").foreach { n =>
      assert(plans(n).contains("partial_"), s"$n lost map-side combine")
    }
  }

  test("novelty shuffles gram keys only: explode, partial min, one gram join") {
    val p = plans("text_novelty")
    assert(p.contains("Generate"), s"lost the 3-gram explode:\n$p")
    assert(p.contains("partial_min"), s"first-occurrence min lost partials:\n$p")
  }

  test("attribution first-touch is a packed-min aggregate, not a row_number window") {
    val p = plans("q80_attribution")
    assert(!p.contains("row_number"), s"first touch must partial-aggregate:\n$p")
    assert(p.contains("partial_min"), s"packed-min lost map-side combine:\n$p")
  }

  test("window funnel is one pass: single user shuffle, no self-join") {
    val p = plans("q81_window_funnel")
    assert(!p.contains("Join"), s"funnel chains must not self-join:\n$p")
    val shuffles = "hashpartitioning\\(user_id".r.findAllIn(p).length
    assert(shuffles <= 1, s"cascaded windows must share one user exchange:\n$p")
  }

  test("fill-rate joins the facts co-partitioned; ratio-report broadcasts dims") {
    assert(!plans("q82_fill_rate").contains("CartesianProduct"))
    val p = plans("q83_ratio_report")
    assert(p.contains("BroadcastHashJoin"), s"dims must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no fact-fact shuffle join here:\n$p")
  }

  test("event paths: window lags then partial-aggregated top-k") {
    val p = plans("q84_paths")
    assert(p.contains("TakeOrderedAndProject"), s"path ranking must be top-k:\n$p")
    assert(p.contains("partial_count"), s"path count lost map-side combine:\n$p")
  }

  test("integrity audit: dim parents broadcast their anti-joins") {
    val p = plans("q85_integrity")
    assert("BroadcastHashJoin [^\n]*LeftAnti".r.findFirstIn(p).isDefined, p)
  }

  test("winsorize broadcasts its fences; clamped balance pushes the part filter") {
    val w = plans("q86_winsorize")
    assert(w.contains("BroadcastHashJoin") && !w.contains("SortMergeJoin"), w)
    val b = plans("q87_clamped_balance")
    assert(b.matches("(?s).*PushedFilters: \\[[^]]*LessThan\\(l_partkey,50.*"),
      s"part bound must reach the scan:\n$b")
    assert("windowspecdefinition\\(l_partkey#".r.findFirstIn(b).isDefined, b)
  }

  test("rolling median keeps its bounded frame under the banded rewrite") {
    val p = plans("q88_rolling_median")
    assert(p.contains("specifiedwindowframe(RowFrame, -20, -1)"),
      s"median frame must stay bounded:\n$p")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("sessionize rides the staged sorted user buckets: no hash exchange left") {
    // The staged events tables (EventsBackbone) are bucketed on the window
    // key and in-bucket sorted by (key, ts, event_id) with one file per
    // bucket, so the scan itself satisfies WindowExec's distribution AND
    // ordering. The only exchange the plan may carry is the final
    // oracle-determinism range sort.
    val p = plans("q51_sessionize")
    assert(p.contains("graft_ev_"), s"q51 must read the staged events table:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"q51 re-shuffled events the staging exists to avoid:\n$p")
  }

  test("type-keyed windows are BANDED: (event_type, band) parallelism, not 5 serial tasks") {
    // r9's named scale-killer: a window partitioned by the 5-value
    // event_type serializes the whole table into 5 tasks. The banded
    // rewrite (BandedWindow) must (a) cluster window work by the two-level
    // (type, _bkt) key and (b) NOT read the type-bucketed backbone —
    // HashPartitioning(type) satisfies ClusteredDistribution(type, _bkt),
    // so riding the backbone would silently collapse back to 5 tasks.
    Seq("q64_rolling_anomaly", "q88_rolling_median", "q92_twap").foreach { n =>
      val p = plans(n)
      assert(raw"hashpartitioning\(event_type#\d+, _bkt#\d+".r.findFirstIn(p).isDefined,
        s"$n must partition window work by (event_type, _bkt):\n$p")
      assert(!p.contains("graft_ev_type"),
        s"$n must scan raw events — the type-bucketed backbone would " +
          s"satisfy the two-level clustering and serialize the walk:\n$p")
    }
  }

  test("RFM never plans a global ntile: cut points broadcast, scores are stateless") {
    val p = plans("q90_rfm")
    assert("\\bntile\\(".r.findFirstIn(p).isEmpty,
      s"global ntile is a single-partition sort:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"cuts and anchor must broadcast:\n$p")
  }

  test("conversion lag is one packed-min rollup: no window, no join") {
    val p = plans("q91_conversion_lag")
    assert(!p.contains("windowspecdefinition"), s"first touches must be aggregates:\n$p")
    assert(!p.contains("Join"), p)
  }

  test("q96 lifecycle: append degrades the sorted contract, compact restores it") {
    // the r9 "demo staging vs durable event log" gap: the full declared
    // cycle must show stage (no local sort) → append (the window regains a
    // LOCAL sort while bucketing still elides the exchange) → compact
    // (local sort gone again). The final ORDER BY's global range sort is
    // present in all three plans; `], false, 0` is the local-sort marker.
    val t = EventsBackbone.lifecycleStageBase(spark, sf0001)
    def plan = EventsBackbone.lifecycleReadout(spark, t)
      .queryExecution.executedPlan.toString
    def localSorts(p: String) = "\\], false, 0".r.findAllIn(p).size
    val staged = plan
    assert(localSorts(staged) == 0, s"staged scan must satisfy the window order:\n$staged")
    assert(!staged.contains("Exchange hashpartitioning"), staged)
    EventsBackbone.lifecycleAppendBatch(spark, sf0001)
    val degraded = plan
    assert(localSorts(degraded) > 0,
      s"a second file per bucket must void the reported ordering:\n$degraded")
    assert(!degraded.contains("Exchange hashpartitioning"),
      s"bucketing must keep eliding the exchange even degraded:\n$degraded")
    EventsBackbone.lifecycleCompact(spark, sf0001)
    val restored = plan
    assert(localSorts(restored) == 0, s"compaction must restore sort elision:\n$restored")
    assert(!restored.contains("Exchange hashpartitioning"), restored)
    // and the cycled table still answers with all 5 types present
    assert(EventsBackbone.lifecycleReadout(spark, t).count() == 5)
  }

  test("r9-wired events queries never re-shuffle on user_id off the user buckets") {
    // q12/q13: window directly on the bucketed scan (ordering satisfied);
    // q42: all three funnel-stage rollups + joins ride the user key;
    // q50/q53: first-touch min and the cohort join back, same key (their
    // (cohort, week)/day rollups legitimately exchange on OTHER keys).
    // The staging's contract is precisely: no exchange keyed on user_id.
    Seq("q12_window_rank", "q13_window_frame", "q42_funnel",
      "q50_retention", "q53_growth").foreach { n =>
      val p = plans(n)
      assert(p.contains("graft_ev_user"), s"$n must read the staged user table:\n$p")
      assert("Exchange hashpartitioning\\(user_id#".r.findFirstIn(p).isEmpty,
        s"$n re-shuffled events on user_id — the exchange staging exists to avoid:\n$p")
    }
  }

  test("session-cohort join is fully co-partitioned: one hash exchange total") {
    // window + two user rollups + the fact-fact join all ride the bucket
    // partitioning; only the months-sized cohort rollup may hash-exchange
    val p = plans("q95_session_cohort")
    assert(p.contains("graft_ev_user"), s"q95 must read the staged user table:\n$p")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx <= 1, s"q95 must shuffle only the cohort rollup ($hashEx):\n$p")
    assert(!p.contains("BroadcastHashJoin"),
      s"the user-keyed join must be co-partitioned, not a broadcast that would " +
        s"break at 100 TB user counts:\n$p")
  }

  test("user entropy is two rollups off the staged user buckets: no join, no window") {
    val p = plans("q94_user_entropy")
    assert(!p.contains("Join") && !p.contains("windowspecdefinition"), p)
    assert(p.contains("graft_ev_user"), s"q94 must read the staged user table:\n$p")
  }

  test("seasonality joins nothing; the share window runs on the cell aggregate") {
    val p = plans("q93_seasonality")
    assert(!p.contains("Join"), p)
    assert("windowspecdefinition\\(dow#".r.findFirstIn(p).isDefined, p)
  }

  test("cluster-size audit and dedup-weighted mixture ride the shared components tier") {
    // both must read the checkpointed components (Scan ExistingRDD), not
    // re-run the candidate/verify/fixpoint chain
    Seq("dedup_cluster_sizes", "mix_cluster_weight").foreach { n =>
      val p = plans(n)
      assert(p.contains("Scan ExistingRDD"), s"$n rebuilt the dedup chain:\n$p")
      assert(!p.contains("posexplode"), s"$n re-ran banding:\n$p")
    }
  }

  test("bounce rate and TTR partial-aggregate their rollups") {
    assert(plans("q89_bounce").contains("partial_count"))
    assert(plans("text_ttr").contains("partial_count"))
  }

  test("driver contract: every declared query carries a DuckDB oracle") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"queries without oracle: $noOracle")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without query: $orphans")
  }

  test("determinism contract: every oracle has a total ORDER BY unless it returns one row") {
    // the hash compare is order-insensitive only because the driver sorts
    // rows — but a query without a total order can still tie-break floats
    // differently across engines; the contract (FIXTURES §3) requires an
    // explicit ORDER BY everywhere except single-aggregate-row outputs.
    val singleRow = Set("q06_distinct", "q10_anti_join", "q16_dedup_distinct",
      "q23_approx_distinct", "sim_recall", "sim_recall_ivf", "sim_recall_multi",
      "sim_recall_filter", "sim_recall_filter_ivf", "sim_recall_pq",
      "sim_recall_ivfpq", "sim_recall_pq_rerank", "stream_sessions",
      "stream_twap", "stream_wau", "stream_anomaly", "stream_heavy",
      "stream_expectations", "stream_dedup", "stream_distinct",
      "stream_percentiles", "stream_quality", "stream_index_ann",
      "stream_index_lex", "stream_index_ivf", "stream_index_compact",
      "stream_index_delete", "stream_join",
      "q52_sketch_intersect", "q56_skew_profile", "graph_triangles",
      "q91_conversion_lag", "q101_zonemap", "q105_zone_append", "mm_dedup",
      "graph_assortativity", "stream_gram")
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      if (!singleRow(name))
        assert(sql.toUpperCase.contains("ORDER BY"), s"$name oracle lacks ORDER BY")
    }
  }

  test("q107 prunes fact partitions at runtime (dynamic partition pruning)") {
    // the weekend day-set lives in the dim table, so only a
    // DynamicPruningExpression in the fact scan's PartitionFilters can
    // prune — a static filter would prove nothing
    val p = plans("q107_dpp")
    assert(p.toLowerCase.contains("dynamicpruning"), p)
  }

  test("q104 expectations evaluate the whole rule suite in one unpivot scan") {
    // rules are data: the plan must show exactly one lineitem scan feeding
    // the rule join (adding a rule must never add a scan)
    val p = plans("q104_expectations")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"expected 1 fact scan, saw $scans:\n$p")
    assert(p.contains("BroadcastHashJoin"), p) // rules ride a broadcast
  }
}
