package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.sources.Sources

/** Plan-shape assertions for the 100 TB posture (SURVEY §5). */
class ScaleSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  test("saltedAgg matches the direct aggregation exactly") {
    // skewed data: key "hot" holds 90% of rows
    val d = (1 to 1000).map(i => (if (i <= 900) "hot" else s"k${i % 7}", i.toDouble))
      .toDF("k", "v")
    val direct = d.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v").cast("decimal(18,4)")).cast("double").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Relational.saltedAgg(d, Seq("k"), saltBuckets = 8,
        Seq(("n", count(lit(1)), sum(_)),
          ("s", sum(col("v").cast("decimal(18,4)")), (c: org.apache.spark.sql.Column) =>
            sum(c).cast("double"))))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == direct)
  }

  test("chunkDocuments plans with zero exchanges (pure per-row fan-out)") {
    val docs = Seq((1L, "a" * 100), (2L, "b" * 10)).toDF("doc_id", "text")
    val out = graft.operators.Features.chunkDocuments(docs, "doc_id", "text", 30, 5)
    val shuffles = collect(out.queryExecution.executedPlan) {
      case s: ShuffleExchangeLike => s
    }
    assert(shuffles.isEmpty, s"chunking must not shuffle, found $shuffles")
    assert(out.count() == 4 + 1)
  }

  test("balancedSample's literal quota rewrites the rank window to WindowGroupLimit") {
    val d = (1 to 60).map(i => (if (i <= 40) "big" else "small", i.toLong))
      .toDF("cls", "id")
    val out = graft.operators.Features.balancedSample(d, "cls", "id")
    // the min-count literal makes rank <= k visible to the optimizer:
    // both the partial (map-side) and final WindowGroupLimit must appear
    val limits = collect(out.queryExecution.executedPlan) {
      case p if p.nodeName.contains("WindowGroupLimit") => p
    }
    assert(limits.size >= 2,
      s"expected partial+final WindowGroupLimit, got:\n${out.queryExecution.executedPlan}")
    assert(out.count() == 40L) // 20 per class
  }

  test("saltedJoin is row-identical to the plain join on skewed keys") {
    // 90% of the big side shares one key; small side has duplicate keys
    // so replication must not multiply matches
    val big = (1 to 1000).map(i => (if (i <= 900) "hot" else s"k${i % 7}", i))
      .toDF("k", "v")
    val small = Seq(("hot", 1.0), ("hot", 2.0), ("k1", 3.0), ("miss", 9.0))
      .toDF("k", "w")
    for (joinType <- Seq("inner", "left")) {
      val plain = big.join(small, Seq("k"), joinType)
        .collect().map(r => (r.getString(0), r.getInt(1), String.valueOf(r.get(2)))).sorted.toSeq
      val salted = Relational.saltedJoin(big, small, Seq("k"), saltBuckets = 8, joinType)
        .collect().map(r => (r.getString(0), r.getInt(1), String.valueOf(r.get(2)))).sorted.toSeq
      assert(salted == plain, s"joinType=$joinType")
    }
  }

  test("bucketed tables join with zero shuffle") {
    val t = sources.Tables(spark, sf0001)
    for (tbl <- Seq("b_orders", "b_lineitem")) {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = new java.io.File(s"spark-warehouse/$tbl")
      if (loc.isDirectory) {
        loc.listFiles().foreach(_.delete()); loc.delete()
      }
    }
    Sources.writeBucketed(t.orders.select("o_orderkey", "o_custkey", "o_totalprice"),
      "b_orders", Seq("o_orderkey"), 4)
    Sources.writeBucketed(t.lineitem.select("l_orderkey", "l_quantity"),
      "b_lineitem", Seq("l_orderkey"), 4)
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey").agg(sum("l_quantity").as("q"))
    // AQE off for a deterministic final plan shape in the assertion
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan
      joined.write.format("noop").mode("overwrite").save()
      val shufflesBeforeAgg = collect(plan) { case s: ShuffleExchangeLike => s }
      // the join itself must not shuffle; only the final groupBy(o_custkey) may
      assert(shufflesBeforeAgg.size <= 1,
        s"expected bucketed join to avoid shuffling, got:\n$plan")
      assert(joined.count() == t.orders.select("o_custkey").distinct().count())
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("star join broadcasts every dimension (fact side never shuffles)") {
    val q = SparkEntry.queries("q22_star_join_agg")(spark, sf0001)
    q.write.format("noop").mode("overwrite").save()
    val plan = q.queryExecution.executedPlan
    val shuffles = collect(plan) { case s: ShuffleExchangeLike => s }
    // one exchange for the final aggregation; all joins broadcast
    assert(shuffles.size <= 1, s"star join should shuffle once at most:\n$plan")
  }

  test("projection+filter queries push predicates into the parquet scan") {
    val q = SparkEntry.queries("q03_project_filter")(spark, sf0001)
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThanOrEqual(l_shipdate"),
      s"filter not pushed:\n$scan")
    assert(!scan.contains("l_comment"), "unused columns must be pruned from ReadSchema")
  }

  test("fkIntegrity audits N relations in ONE fact scan; only small dims are hint-broadcast") {
    val q = SparkEntry.queries("q120_fk_orphans")(spark, sf0001)
    val plan = q.queryExecution.executedPlan
    val factScans = plan.collectLeaves().count(_.toString.contains("lineitem"))
    assert(factScans == 1, s"fact must be scanned once, found $factScans:\n$plan")
    // exactly ONE forced broadcast hint (the part dim); the fact-sized
    // orders key set must NOT carry a hint — its strategy is AQE's call
    val hints = q.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.size == 1,
      s"expected exactly one broadcast hint (small dim only), got ${hints.size}:\n" +
        q.queryExecution.analyzed)
    assert(plan.toString.contains("BroadcastHashJoin"),
      s"small dim must broadcast:\n$plan")
  }

  test("setSimilarityJoin never goes all-pairs and computes the ordered frame once") {
    try {
      val q = SparkEntry.queries("q135_ssjoin_prefix")(spark, sf0001)
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("Cross"),
        s"prefix filtering must not fall back to a cross product:\n$plan")
      // the 4-branch ordered frame must come from the persisted cache,
      // not four vocab-join + sort-aggregate recomputations
      assert(plan.contains("InMemoryTableScan"),
        s"ordered token frame should be cached across branches:\n$plan")
    } finally spark.catalog.clearCache()
  }

  test("copurchase/lmScore self-joins reuse one exchange when both sides shuffle") {
    // at scale neither side broadcasts; the join's two branches are the
    // SAME subplan shuffled on the same key, so AQE must plan the second
    // as a ReusedExchange (one scan + one shuffle of the big frame, not
    // two) — the claim both operators' Scaladocs make
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Seq("q148_copurchase", "q155_lm_score").foreach { name =>
        val q = SparkEntry.queries(name)(spark, sf0001)
        q.collect()
        val plan = q.queryExecution.executedPlan
        val reused = collect(plan) {
          case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r
        }
        assert(reused.nonEmpty,
          s"$name: the self-join's duplicate exchange must be reused:\n$plan")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("runtime bloom-filter pruning injects might_contain for selective shuffled joins") {
    // the posture for 100 TB fact↔filtered-dim joins too big to
    // broadcast: Spark builds a bloom filter from the selective side
    // and semi-prunes the fact BEFORE its shuffle
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val tt = graft.sources.Tables(spark, sf0001)
      val joined = tt.lineitem.join(
        tt.part.filter(col("p_retailprice") > 1500), // selective creation side
        col("l_partkey") === col("p_partkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no runtime bloom filter injected:\n$optimized")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("aucExact's only windows run over the value-aggregated frame, never the fact") {
    val q = SparkEntry.queries("q177_auc_exact")(spark, sf0001)
    q.collect()
    val plan = q.queryExecution.executedPlan
    val windows = collect(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, s"expected a cumulative window:\n$plan")
    // every window input must sit above an aggregation (the per-value
    // cells frame) — a window directly over the scan would be the
    // global per-row rank this operator exists to avoid. String check:
    // AQE hides the subtree behind a leaf QueryStageExec, which tree
    // traversal does not enter.
    windows.foreach { w =>
      assert(w.child.toString.contains("HashAggregate"),
        s"window runs on the raw fact, not the aggregated frame:\n$plan")
    }
  }

  test("changepoint runs all analytic passes on ONE key shuffle") {
    val q = SparkEntry.queries("q190_changepoint")(spark, sf0001)
    q.collect()
    val plan = q.queryExecution.executedPlan
    val shuffles = collect(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.size == 1,
      s"changepoint must reuse one event_type partitioning for every window, got ${shuffles.size}:\n$plan")
  }

  test("incrementalDedup's bloom prefilter reaches both scans; only bloom hits join") {
    val q = SparkEntry.queries("q181_incremental_dedup")(spark, sf0001)
    q.collect()
    val optimized = q.queryExecution.optimizedPlan
    // the batch splits on might_contain: the no-join branch carries the
    // negation, the join branch the positive — both next to the scan
    val filters = optimized.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.toString.contains("might_contain") => f
    }
    assert(filters.size >= 2,
      s"expected bloom prefilters on both batch branches:\n$optimized")
    val antiJoins = optimized.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if j.joinType.toString == "LeftAnti" => j
    }
    assert(antiJoins.size == 1, s"exactly one confirm anti-join:\n$optimized")
    // and the anti-join's probe child must sit ABOVE a bloom filter
    // (only candidates pay the join), not the raw batch
    assert(antiJoins.head.left.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.toString.contains("might_contain") => f
    }.nonEmpty, s"anti-join probe side is not bloom-prefiltered:\n$optimized")
  }

  test("the driver's entry smoke contract holds: flagship query returns rows at sf0.001") {
    // the driver calls SparkEntry.entry(spark) and requires rows > 0 —
    // pin it here so a refactor can't silently break the contract
    assert(SparkEntry.entry(spark).count() > 0L)
  }

  test("naiveBayesSource never force-broadcasts the vocabulary-sized counts frame") {
    val q = SparkEntry.queries("q232_naive_bayes")(spark, sf0001)
    val hints = q.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    // the (class, token) counts/terms frames (output column __gc or
    // __gseen) grow with corpus VOCABULARY — any broadcast hint on
    // them is the q120/q232 OOM-at-100TB pattern; their join strategy
    // must stay AQE's call
    val vocabSized = hints.filter(_.child.output.exists(
      a => a.name == "__gc" || a.name == "__gseen"))
    assert(vocabSized.isEmpty,
      s"vocabulary-sized counts frame carries a forced broadcast hint:\n" +
        q.queryExecution.analyzed)
    // the genuinely bounded frames (per-class totals/priors, 1-row
    // vocab/doc counts) DO keep their hints
    assert(hints.nonEmpty, "bounded class/prior frames should stay hinted")
  }

  test("cohortRetention never force-broadcasts the per-user cohort frame") {
    val q = SparkEntry.queries("q94_cohort_retention")(spark, sf0001)
    val hints = q.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    // the cohort frame is one row PER USER — user-dimension-sized, the
    // q120/q232 OOM-at-100TB pattern if hinted; AQE owns the strategy
    assert(hints.isEmpty,
      s"user-dimension-sized frame carries a forced hint:\n${q.queryExecution.analyzed}")
  }

  test("q241/q242 banded self-joins read a persisted signature frame and never go cartesian") {
    for (name <- Seq("q241_simhash_md5", "q242_hyperplane_md5")) {
      val q = SparkEntry.queries(name)(spark, sf0001)
      try {
        val opt = q.queryExecution.optimizedPlan
        // both sides of the bucket self-join must come off the SAME
        // cached signature/bucket frame (q151 rule), not re-derive it
        val cacheReads = opt.collectLeaves().count(
          _.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryRelation])
        assert(cacheReads == 2, s"$name: expected 2 cache reads, got $cacheReads:\n$opt")
        val plan = q.queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct"),
          s"$name: banded join must stay keyed, never all-pairs:\n$plan")
      } finally spark.catalog.clearCache()
    }
  }

  test("q243/q244 construct-then-parse queries are pure projections: zero exchanges, pruned scan") {
    for (name <- Seq("q243_video_meta", "q244_frame_sample")) {
      val q = SparkEntry.queries(name)(spark, sf0001)
      val plan = q.queryExecution.executedPlan
      val shuffles = collect(plan) { case s: ShuffleExchangeLike => s }
      assert(shuffles.isEmpty, s"$name: per-row metadata work must not shuffle:\n$plan")
      val scan = plan.collectLeaves().head.toString
      assert(scan.contains("doc_id") && !scan.contains("text"),
        s"$name: only doc_id/n_chars should be read, text must be pruned:\n$scan")
    }
  }

  test("goldenRecord computes the records⋈labels frame once; branches read the cache") {
    val records = Seq(
      (1L, "ann", "nyc"), (2L, "ann", "sf"), (3L, "bob", "sf"),
      (4L, "cat", null.asInstanceOf[String]),
    ).toDF("id", "name", "city")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("id", "cluster")
    val q = operators.Dedup.goldenRecord(records, labels, "id", Seq("name", "city"))
    try {
      val rows = q.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getString(3), r.getString(4))).toSet
      // cluster 1: mode(name)=ann (2 votes), mode(city) tie nyc/sf -> nyc
      assert(rows == Set((1L, 2L, 1L, "ann", "nyc"), (3L, 1L, 3L, "bob", "sf"),
        (4L, 1L, 4L, "cat", null)))
      // the q151/cacheSets multi-branch rule: the joined frame feeds the
      // base aggregate + one election per value column — every branch
      // must read the CACHE, never re-run the records⋈labels join
      // (leaf inspection on the LOGICAL plan: executedPlan strings
      // render the cached relation's internal scans too)
      val leaves = q.queryExecution.optimizedPlan.collectLeaves()
      val cacheReads = leaves.count(
        _.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryRelation])
      assert(cacheReads >= 3,
        s"expected base + 2 election branches on the cache, got $cacheReads:\n" +
          q.queryExecution.optimizedPlan)
      assert(cacheReads == leaves.size,
        s"records/labels re-scanned outside the cached join:\n" +
          q.queryExecution.optimizedPlan)
    } finally spark.catalog.clearCache()
  }

  test("embeddingNearDups auto width tracks the scale step: 6 bits at sf0.1, 13 at sf10") {
    import graft.operators.Similarity
    // the q73/q34 entries pass bits=0, so the width embeddingNearDups
    // runs with is chosenBits(frame, 0) = autoBits(count). Replicate the
    // scale-step sizes as cheap range frames (chosenBits only counts):
    // 2k vectors (sf0.1 embeddings) -> 6 bits, 200k (sf10) -> 13 — a
    // fixed 6-bit signature at sf10 would put ~100x occupancy^2 work in
    // every bucket (the measured 17.4x q73 cliff before autoBits).
    assert(Similarity.chosenBits(spark.range(2000).toDF(), 0) == 6)
    assert(Similarity.chosenBits(spark.range(200000).toDF(), 0) ==
      Similarity.autoBits(200000))
    assert(Similarity.autoBits(200000) == 13)
    // explicit bits always win (the recall-tuned deployment contract)
    assert(Similarity.chosenBits(spark.range(200000).toDF(), 8) == 8)
  }

  test("RangeRank's cutover takes the bucketed path at scale-step sizes") {
    import graft.operators.RangeRank
    // useBucketed reads only Catalyst's size estimate — no execution.
    // Pin the threshold EXPLICITLY (round-9 advice): the old form
    // leaned on Spark's internal Range stats (8 bytes/row) against the
    // 256 MiB default, so a Spark upgrade changing stats estimation
    // would flip the assert without any graft behavior change. With
    // the conf pinned, the test tracks graft's own config contract:
    // rows × 8 bytes vs graft.rank.rangeBytes.
    spark.conf.set("graft.rank.rangeBytes", (8L * 10000000).toString)
    try {
      assert(!RangeRank.useBucketed(spark.range(1000000).toDF()))
      assert(RangeRank.useBucketed(spark.range(40000000).toDF()))
    } finally spark.conf.unset("graft.rank.rangeBytes")
    // and the shipped default still cuts where the sf10 3-arm A/B
    // (bench/BENCH_SCALE_RANK_AB.json, bucketed 26% faster) measured:
    // ~320 MB of 8-byte rows crosses 256 MiB whatever the estimator,
    // as long as it stays within 4x of the true width either way
    assert(RangeRank.useBucketed(spark.range(160000000).toDF()))
  }

  test("RangeRank's ROWS clause fires on narrow frames the byte gate misses") {
    import graft.operators.RangeRank
    // The q96 shape: a single-column projection of a compressed scan
    // estimates far under 256 MiB while carrying tens of millions of
    // rows — the thing a single-partition window sort actually pays
    // for (sf10 lineitem discount: 147 MB estimated, 60 M rows, 207 s
    // in one window task; ~6 s bucketed). 3 M 8-byte rows = 24 MB:
    // under every byte threshold, over the 2 M default row threshold.
    assert(RangeRank.useBucketed(spark.range(3000000).toDF()))
    // the rows clause is conf-governed like the byte clause
    spark.conf.set("graft.rank.rangeRows", "10000000")
    try assert(!RangeRank.useBucketed(spark.range(3000000).toDF()))
    finally spark.conf.unset("graft.rank.rangeRows")
  }
}
