package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, ResolvedHint}
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

/** Scale-hygiene plan audit (SURVEY.md §5): broadcast hints must be
  * limited to fixed-cardinality relations. `customer`, `part`,
  * `supplier` (and anything fact-derived without aggregation) grow
  * with scale factor — at 100 TB they are not broadcastable, and an
  * explicit hint overrides AQE unconditionally. The Impala analog
  * picks broadcast vs partitioned per cost in DistributedPlanner
  * (apache-impala-4.1.0/fe/src/main/java/org/apache/impala/planner/
  * DistributedPlanner.java); AQE + autoBroadcastJoinThreshold is the
  * Spark twin, so un-hinted joins are left to it.
  */
class PlanAuditSpec extends SparkSpec {

  /** Tables whose row count grows linearly with scale factor. */
  private val linearGrowth =
    Seq("customer", "part", "supplier", "orders", "lineitem", "events", "documents", "embeddings")

  private val tpchSuite = Seq(
    "q01_pricing_summary", "q03_shipping_priority", "q04_order_priority",
    "q05_local_supplier", "q06_forecast_revenue", "q07_volume_shipping",
    "q08_market_share", "q09_product_profit", "q10_returned_items",
    "q12_priority_by_linestatus", "q13_customer_distribution",
    "q14_promo_revenue", "q15_top_supplier", "q16_supplier_count",
    "q17_small_quantity", "q18_large_volume", "q19_discount_revenue",
    "q21_multi_supplier_orders", "q22_dormant_customers", "join_inner") ++
    graft.operators.TpcdsQueries.queries.keys.toSeq.sorted

  /** Every physical node of `p` — including the plans behind AQE
    * wrappers and crucially the CACHED plans behind
    * InMemoryTableScanExec: a subtree persisted through CacheSlot
    * becomes an InMemoryRelation that plain `collect` treats as a leaf,
    * which silently exempted anything cached from the suite-wide gates
    * (round-7 verdict #3). Gates walk THIS, so a cartesian or global
    * window cannot hide behind a persist. */
  private def physicalNodes(p: SparkPlan): Seq[SparkPlan] =
    p.collect { case n => n }.flatMap {
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        Seq(s) ++ physicalNodes(s.relation.cachedPlan)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a) ++ physicalNodes(a.inputPlan)
      case n => Seq(n)
    }

  /** The physical nodes of every CACHED subtree reachable from a
    * logical plan (the InMemoryRelation equivalent for logical-level
    * gates): cached subtrees carry an already-planned PHYSICAL plan,
    * so logical walks must audit those nodes physically. */
  private def cachedPhysicalNodes(p: LogicalPlan): Seq[SparkPlan] =
    p.collectWithSubqueries {
      case imr: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        physicalNodes(imr.cachedPlan)
    }.flatten

  /** Root paths of parquet scans inside a logical subtree. */
  private def scanNames(p: LogicalPlan): Seq[String] = p.collect {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => fs.location.rootPaths.map(_.getName)
      case _ => Seq.empty[String]
    }
  }.flatten

  private def hasAggregate(p: LogicalPlan): Boolean =
    p.collectFirst { case a: Aggregate => a }.isDefined

  test("broadcast hints only on fixed-cardinality or aggregated relations (TPC-H suite + entry)") {
    val dfs: Seq[(String, DataFrame)] =
      tpchSuite.map(n => n -> SparkEntry.queries(n)(spark, sf0001)) :+
        ("entry" -> SparkEntry.entry(spark))
    dfs.foreach { case (name, df) =>
      val hints = df.queryExecution.analyzed.collect { case h: ResolvedHint => h }
      hints.foreach { h =>
        // A hint is scale-safe iff its subtree only scans bounded dims
        // (nation=25, region=5) OR reduces a fact with an aggregation
        // (scalar aggregates / bounded group domains like p_brand).
        val scans = scanNames(h.child)
        val rawLinear = scans.filter(s => linearGrowth.exists(s.startsWith))
        assert(rawLinear.isEmpty || hasAggregate(h.child),
          s"$name broadcasts un-aggregated linear-growth relation(s) $rawLinear:\n${h.child.treeString.take(1500)}")
      }
    }
  }

  /** The X5 rule extended to the WHOLE inventory (round-10: ds_q37's
    * first draft hinted a FILTERED part dim — a constant fraction of a
    * linear-growth relation, exactly the 100 TB hazard, and the
    * TPC-H-only audit above never saw it). Same criterion: a hint
    * subtree may scan linear-growth tables only beneath an aggregation. */
  test("broadcast hints only on fixed-cardinality or aggregated relations (full inventory)") {
    // Hints whose subtree is bounded by a WINDOW top-k filter rather
    // than an Aggregate — the criterion below can't see that bound, so
    // each gets a documented allowance (two-way: stale entries fail):
    //  - pipe_source_cap: the hinted side is the salted two-phase
    //    top-k's survivor set, <= |sources|·k rows by the rn <= k
    //    filters (Curation.sourceCap scaladoc)
    val windowBounded = Set("pipe_source_cap")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val hints = fn(spark, sf0001).queryExecution.analyzed
        .collect { case h: ResolvedHint => h }
      hints.flatMap { h =>
        val rawLinear = scanNames(h.child).filter(s => linearGrowth.exists(s.startsWith))
        if (rawLinear.nonEmpty && !hasAggregate(h.child)) Some(name -> rawLinear)
        else None
      }
    }
    val bad = offenders.filterNot { case (n, _) => windowBounded(n) }
    assert(bad.isEmpty, s"un-aggregated linear-growth broadcast hints: $bad")
    assert(windowBounded.subsetOf(offenders.map(_._1).toSet),
      s"stale window-bounded allowance: ${windowBounded -- offenders.map(_._1).toSet}")
  }

  test("hot-path queries stay inside whole-stage codegen, custom exprs included") {
    // the brief's codegen rule: hot expressions must not fall out of
    // WholeStageCodegen (a non-codegen Expression in the scan path
    // de-vectorizes the whole stage at 100 TB)
    Seq("q01_pricing_summary", "q06_forecast_revenue", "fn_fnv_hash", "text_fingerprint",
      "pipe_chunking", "ds_q49_return_rank", "layout_zorder")
      .foreach { name =>
        val df = SparkEntry.queries(name)(spark, sf0001)
        df.collect() // AQE only annotates codegen spans in the FINAL plan
        val simple = df.queryExecution.explainString(
          org.apache.spark.sql.execution.SimpleMode)
        val spans = "\\*\\(".r.findAllIn(simple).length
        assert(spans >= 1, s"$name has no WholeStageCodegen span:\n${simple.take(1200)}")
      }
  }

  /** Physical check: with size-based broadcast disabled, the only
    * BroadcastHashJoins left are hint-forced — their build sides must
    * not scan customer/part/supplier, and the nation/region hints must
    * still produce broadcasts. */
  test("q05/q09/q10: no forced broadcast builds from customer/part/supplier; dims still broadcast") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Seq("q05_local_supplier", "q09_product_profit", "q10_returned_items").foreach { name =>
        val df = SparkEntry.queries(name)(spark, sf0001)
        val bhj = df.queryExecution.sparkPlan.collect { case b: BroadcastHashJoinExec => b }
        val buildScans = bhj.flatMap { b =>
          val build: SparkPlan = b.buildSide match {
            case BuildLeft => b.left
            case BuildRight => b.right
          }
          build.collect { case f: FileSourceScanExec =>
            f.relation.location.rootPaths.map(_.getName)
          }.flatten
        }
        val bad = buildScans.filter(s =>
          Seq("customer", "part", "supplier").exists(s.startsWith))
        assert(bad.isEmpty, s"$name: forced broadcast build side scans $bad")
        assert(buildScans.exists(s => s.startsWith("nation") || s.startsWith("region")),
          s"$name: expected nation/region dim broadcasts to survive, saw $buildScans")
      }
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  /** Impala pushes runtime filters (bloom/min-max) from a join's build
    * side into the probe scan (apache-impala-4.1.0/be/src/runtime/
    * runtime-filter.h). Spark's twin is the injected runtime bloom
    * filter: a selective dim filter spawns a `might_contain` predicate
    * on the fact side of a shuffle join. The application-side size
    * threshold defaults to 10 GB, so the test pins it to 0 — the rule,
    * not the threshold, is what's audited. */
  test("runtime bloom filter injected from selective dim into fact side (Impala runtime-filter parity)") {
    import org.apache.spark.sql.functions.col
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val t = Tables(spark, sf0001)
      val df = t.lineitem
        .join(t.part.filter(col("p_size") === 5), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand").count()
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain"),
        s"no runtime bloom filter in optimized plan:\n${opt.take(1500)}")
    } finally {
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  /** Impala's runtime-filter bank also serves IN-LIST filters (4.1:
    * apache-impala-4.1.0/be/src/runtime/runtime-filter-bank.h:49 routes
    * bloom, min-max AND in-list filters from build to probe scan).
    * Spark HAD the row-level twin — InjectRuntimeFilter's semi-join
    * reduction branch (`spark.sql.optimizer.runtimeFilter
    * .semiJoinReduction.enabled`) — and REMOVED it in 4.0: setting the
    * conf now throws "runtime filter cannot be an IN subquery now"
    * (upstream judged the bloom branch strictly dominant: same
    * probe-side reduction without materializing exact key sets). So
    * the IN-list filter is a REASONED DESCOPE, pinned here so a future
    * Spark that reintroduces the branch fails this test and we revisit:
    * (1) the removal is asserted verbatim, and (2) the surviving
    * row-level channel (the runtime bloom filter, audited above) plus
    * the partition-level IN channel (DPP's InSubqueryExec, audited in
    * SourcesSpec S7) remain the engine's runtime-filter parity story. */
  test("IN-list runtime filter: Spark 4 REMOVED semi-join reduction (descope pinned); no semi under default config") {
    import org.apache.spark.sql.functions.col
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.conf.set("spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled", "true")
    }
    assert(e.getMessage.contains("removed in the version 4.0.0"), e.getMessage)
    // and the default config injects no semi-join on the S8b shape —
    // the plan a user gets is the plain join (+ bloom when enabled)
    val t = Tables(spark, sf0001)
    val q = t.lineitem
      .join(t.part.filter(col("p_size") === 5), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand").count()
    val semis = q.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
    }
    assert(semis.isEmpty, "unexpected semi-join under default config")
  }

  /** The contamination check's scale contract: candidate matching is an
    * EQUI-join on the gram key. If the join condition ever degraded to
    * contains()/LIKE, Spark would plan a nested-loop product — the
    * O(docs × benchmark) shape the operator exists to avoid. */
  test("pipe_contamination joins grams by key — no nested-loop/cartesian anywhere") {
    val df = SparkEntry.queries("pipe_contamination")(spark, sf0001)
    val plan = df.queryExecution.sparkPlan
    val bad = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j.nodeName
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j.nodeName
    }
    assert(bad.isEmpty, s"non-equi join in contamination plan: $bad")
  }

  test("q20: correlated subquery decorrelates to aggregate joins — no per-row subquery, no cartesian blowup") {
    val df = SparkEntry.queries("q20_potential_promotion")(spark, sf0001)
    val plan = df.queryExecution.sparkPlan
    // Catalyst must rewrite the correlated scalar subquery into an
    // aggregate + join (RewriteCorrelatedScalarSubquery); a surviving
    // per-row subquery would execute lineitem once per (part, supplier)
    val scalarSubs = df.queryExecution.optimizedPlan.collect {
      case p if p.expressions.exists(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.ScalarSubquery])) => p
    }
    assert(scalarSubs.isEmpty, s"correlated subquery not decorrelated:\n${df.queryExecution.optimizedPlan}")
    // the only nested-loop join allowed is the 1-row supplier-count
    // broadcast (the synthesized-partsupp scaffold), never a fact table
    val nlJoins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j
    }
    assert(nlJoins.forall(!_.toString.contains("lineitem")),
      s"fact-side nested-loop join in q20 plan: $nlJoins")
  }

  test("src_nested_parquet: orderkey filter pushes down to the nested file's scan") {
    import graft.sources.NestedParquet
    // materialize the nested file, then audit the read-back plan
    val df = SparkEntry.queries("src_nested_parquet")(spark, sf0001)
    df.limit(1).collect()
    val scans = df.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec if s.relation.location.rootPaths.exists(
        _.toString.contains("graft_nested_parquet")) => s.metadata.toString + s.toString
    }
    assert(scans.nonEmpty, "no scan over the nested file found")
    assert(scans.exists(s => s.contains("PushedFilters") && s.contains("l_orderkey")),
      s"l_orderkey predicate not pushed to the nested parquet scan:\n${scans.head.take(800)}")
  }

  /** The 100 TB skew story (SURVEY §5.8) must be more than a config
    * line: build a join where one key holds ~10% of the left side,
    * lower the AQE skew thresholds to match test-data volume, and
    * assert the FINAL adaptive plan actually split the hot partition.
    * (Impala parity: its hash-join fragments have no runtime skew
    * split — this is a Spark-side win the salting helper complements.) */
  test("AQE splits the skewed partition of a shuffle join at runtime") {
    val dir = java.nio.file.Files.createTempDirectory("graft_skew").toString
    // ~20k rows share key 0; the rest are unique → one fat partition.
    spark.range(200000).selectExpr(
      "CASE WHEN id % 10 = 0 THEN 0 ELSE id END AS k", "id AS v")
      .write.mode("overwrite").parquet(s"$dir/left")
    spark.range(2000).selectExpr("id AS k", "id * 2 AS w")
      .write.mode("overwrite").parquet(s"$dir/right")
    val confs = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "50KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val j = spark.read.parquet(s"$dir/left")
        .join(spark.read.parquet(s"$dir/right"), "k")
      j.collect() // AQE decides skew splits only in the final plan
      val fin = j.queryExecution.executedPlan.toString
      assert(fin.toLowerCase.contains("skew"),
        s"no skew split in final adaptive plan:\n$fin")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** The third AQE leg (after skew split and join re-plan): a shuffle
    * whose output is far smaller than shuffle.partitions must be
    * COALESCED at runtime, so the same partitioning config serves
    * sf0.001 tests and 100 TB runs without retuning. */
  test("AQE coalesces a small aggregate's shuffle partitions at runtime") {
    val t = Tables(spark, sf0001)
    val df = t.nation.groupBy("n_regionkey")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    df.collect() // final adaptive plan only
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AQEShuffleRead") && plan.contains("coalesced"),
      s"no runtime partition coalescing in final plan:\n${plan.take(900)}")
  }

  /** A global ORDER BY must plan a sample-based range exchange feeding
    * per-partition sorts (Impala's parallel sort: sort-node.cc fed by
    * an exchange) — never a single-partition global sort. TopN must
    * instead collapse to TakeOrderedAndProject (no full sort at all). */
  test("global sort plans a range exchange; TopN collapses to TakeOrderedAndProject") {
    val t = Tables(spark, sf0001)
    // executedPlan: exchanges are inserted by EnsureRequirements, after
    // sparkPlan
    val sorted = t.lineitem.orderBy(col("l_extendedprice"))
    val plan = sorted.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"),
      s"global sort lacks range exchange:\n${plan.take(800)}")
    val topn = t.lineitem.orderBy(col("l_extendedprice")).limit(10)
    val topPlan = topn.queryExecution.executedPlan.toString
    assert(topPlan.contains("TakeOrderedAndProject"),
      s"TopN did not collapse:\n${topPlan.take(800)}")
  }

  /** Verify's per-query spill attribution drains the listener bus via
    * reflection (listenerBus/waitUntilEmpty are private[spark], public
    * at the bytecode level) and DEGRADES SILENTLY if the method moves —
    * this pin turns a Spark-upgrade rename into a loud test failure
    * instead of quietly approximate spill numbers in the cert. */
  test("the listener-bus drain reflection Verify relies on resolves and runs") {
    val sc = spark.sparkContext
    val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
    bus.getClass.getMethod("waitUntilEmpty").invoke(bus) // throws if renamed
  }

  /** R19's whole point is driving the EXTERNAL-SORT path: the query
    * must plan a range exchange feeding per-partition SortExec — if a
    * refactor ever introduced a limit, Catalyst would collapse it to
    * TakeOrderedAndProject and the spill_cert sort pin would silently
    * stop exercising UnsafeExternalSorter. */
  test("rel_sort_external plans a full range-partitioned sort — never a TopN collapse") {
    val df = graft.SparkEntry.queries("rel_sort_external")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"),
      s"rel_sort_external lacks the range exchange:\n${plan.take(800)}")
    assert(plan.contains("Sort "),
      s"rel_sort_external lacks SortExec:\n${plan.take(800)}")
    assert(!plan.contains("TakeOrderedAndProject"),
      s"rel_sort_external collapsed to TopN — the spill pin is dead:\n${plan.take(800)}")
  }

  /** q49's rank windows partitioned by channel (2–3 distinct values)
    * would serialize the whole aggregate onto 2–3 tasks at any cluster
    * size. The rewrite computes top-10 per axis with a bounded TopK
    * Aggregator + a candidate-rank pass — the plan must contain NO
    * window operator at all, and only one lineitem scan. */
  test("ds_q49_return_rank: no window exec, single fact scan (low-cardinality partition fix)") {
    val df = SparkEntry.queries("ds_q49_return_rank")(spark, sf0001)
    val wins = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w.nodeName
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w.nodeName
    }
    assert(wins.isEmpty, s"window operator survived the TopK rewrite: $wins")
    val factScans = df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec if f.relation.location.rootPaths.exists(
        _.getName.startsWith("lineitem")) => f
    }
    // the fact feeds ONE persisted aggregate (InMemoryRelation), so no
    // raw lineitem file scan may survive in the downstream plan more
    // than once (0 when the cached copy is already materialized)
    assert(factScans.size <= 1,
      s"expected ≤ 1 lineitem scan (persisted aggregate reused), got ${factScans.size}")
  }

  /** The q49 persist is slot-replacing (CacheSlot): repeated calls in a
    * long-lived session must not accumulate pinned RDDs — and the
    * repeat-same-plan case must KEEP its cache (CacheSlot's sameResult
    * guard; without it the second call's no-op persist + unpersist
    * drops the shared entry and runs uncached). */
  test("ds_q49_return_rank: repeated calls neither leak persisted RDDs nor lose the cache") {
    def run(): Long = {
      SparkEntry.queries("ds_q49_return_rank")(spark, sf0001).count()
      spark.sparkContext.getPersistentRDDs.size.toLong
    }
    val afterFirst = run()
    val afterSecond = run()
    assert(afterSecond <= afterFirst,
      s"persisted RDD count grew across calls: $afterFirst -> $afterSecond")
    // cache retained for the identical plan: the aggregate subtree is
    // served from InMemoryRelation on the repeat call
    val df = SparkEntry.queries("ds_q49_return_rank")(spark, sf0001)
    val mem = df.queryExecution.sparkPlan.collect {
      case c: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => c
    }
    assert(mem.nonEmpty, "repeat call lost the persisted aggregate (uncached plan)")
  }

  /** q76's literal channel-UNION form is 3 fact joins; the disjoint
    * slice predicates collapse to one CASE-tagged pass. */
  test("ds_q76_channel_union: single fact scan, not one per channel slice") {
    val df = SparkEntry.queries("ds_q76_channel_union")(spark, sf0001)
    val factScans = df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec if f.relation.location.rootPaths.exists(
        _.getName.startsWith("lineitem")) => f
    }
    assert(factScans.size == 1, s"expected 1 lineitem scan, got ${factScans.size}")
  }

  /** The r8 single-pass rewrites must stay single-pass: each literal
    * TPC-DS form re-scans the fact (q17's return chain twice, q9's
    * five band subqueries five times); the shipped window/conditional
    * rewrites read lineitem exactly once. */
  test("r8 DS rewrites: ds_q17/ds_q9/ds_q65/ds_q75 each scan the fact exactly once") {
    Seq("ds_q17_stats_chain", "ds_q9_quantity_buckets",
        "ds_q65_cheap_items", "ds_q75_yoy_decline").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf0001)
      val factScans = df.queryExecution.sparkPlan.collect {
        case f: FileSourceScanExec if f.relation.location.rootPaths.exists(
          _.getName.startsWith("lineitem")) => f
      }
      assert(factScans.size == 1, s"$name: expected 1 lineitem scan, got ${factScans.size}")
    }
  }

  /** The r8-continuation single-pass rewrites: q32's correlated
    * per-part average runs as one window over the fact (the literal
    * form evaluates two correlated subqueries per row); q94 folds
    * EXISTS + NOT-EXISTS into one grouped membership pass (literal:
    * two subquery scans); q38/q87 fold the three-year INTERSECT/EXCEPT
    * chains into one membership-flag pass over orders (literal: three
    * DISTINCT scans each). */
  test("r8 continuation rewrites: ds_q32/ds_q94 one lineitem scan; ds_q38/ds_q87 one orders scan") {
    def scansOf(name: String, table: String): Int =
      SparkEntry.queries(name)(spark, sf0001).queryExecution.sparkPlan.collect {
        case f: FileSourceScanExec if f.relation.location.rootPaths.exists(
          _.getName.startsWith(table)) => f
      }.size
    assert(scansOf("ds_q32_excess_discount", "lineitem") == 1)
    assert(scansOf("ds_q2_wow_pivot", "lineitem") == 1) // lag window, not a grain self-join
    assert(scansOf("ds_q94_unreturned_orders", "lineitem") == 1)
    assert(scansOf("ds_q38_customer_overlap", "orders") == 1)
    assert(scansOf("ds_q87_customer_except", "orders") == 1)
    // the two-pass exact heavy hitter is DESIGNED as two corpus passes
    // (MG summary + candidate recount) — pin that it stays exactly 2
    assert(scansOf("text_heavy_hitters", "documents") == 2)
    // r11 heavy-tail rewrites (pinned r12): q64 consumes the grain
    // ONCE via window-total gate + conditional year pivot — the
    // literal form's pushed-down year filters defeat ReuseExchange
    // (seven lineitem scans on the first draft); q72's SECOND fact
    // pass is the DESIGNED inventory join — exactly 2; q95 folds the
    // double-EXISTS into one fact aggregate — exactly 1
    assert(scansOf("ds_q64_rebuy_chain", "lineitem") == 1)
    assert(scansOf("ds_q72_inventory_gap", "lineitem") == 2)
    assert(scansOf("ds_q95_double_exists", "lineitem") == 1)
  }

  /** q14's literal INTERSECT chain scans the fact 4× (3 joins + main).
    * The conditional-aggregation rewrite must leave exactly 2 lineitem
    * scans: the bool_or priority cut and the 1997 main query. */
  test("ds_q14_cross_items: conditional-agg cut keeps fact scans at 2, not 4") {
    val df = SparkEntry.queries("ds_q14_cross_items")(spark, sf0001)
    val factScans = df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec if f.relation.location.rootPaths.exists(
        _.getName.startsWith("lineitem")) => f
    }
    assert(factScans.size <= 2, s"expected ≤ 2 lineitem scans, got ${factScans.size}")
  }

  /** M6: stats-driven planning — the reference's planner consumes
    * COMPUTE STATS results (table row counts + per-column NDV/nulls/
    * min/max) for distribution and join decisions; Spark's twin is
    * ANALYZE TABLE feeding the CBO. Assert the whole chain: both
    * ANALYZE forms populate the catalog, the optimizer's relation
    * stats carry exact rowCount and per-column NDV/null/min-max, and
    * the 25-row analyzed dim plans as the broadcast side. */
  test("M6: ANALYZE TABLE surfaces row and column statistics to the optimizer (COMPUTE STATS parity)") {
    val t = Tables(spark, sf0001)
    spark.sql("DROP TABLE IF EXISTS m6_dim")
    t.nation.write.saveAsTable("m6_dim")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      spark.sql("ANALYZE TABLE m6_dim COMPUTE STATISTICS")
      spark.sql("ANALYZE TABLE m6_dim COMPUTE STATISTICS FOR ALL COLUMNS")
      val rel = spark.table("m6_dim").queryExecution.optimizedPlan
      assert(rel.stats.rowCount.contains(BigInt(25)), s"rowCount=${rel.stats.rowCount}")
      val key = rel.stats.attributeStats.find(_._1.name == "n_nationkey")
        .map(_._2).getOrElse(fail("no column stats for n_nationkey"))
      assert(key.distinctCount.contains(BigInt(25)))
      assert(key.nullCount.contains(BigInt(0)))
      assert(key.min.contains(0) && key.max.contains(24))
      val joined = t.lineitem.join(spark.table("m6_dim"),
        col("l_suppkey") % 25 === col("n_nationkey"))
      assert(joined.queryExecution.sparkPlan.collectFirst {
        case j: BroadcastHashJoinExec => j }.isDefined,
        "analyzed 25-row dim must plan as the broadcast side")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.sql("DROP TABLE IF EXISTS m6_dim")
    }
  }

  /** Impala exposes per-join distribution control (STRAIGHT_JOIN plus
    * the +broadcast / +shuffle plan hints — fe/.../planner/
    * DistributedPlanner.java); Spark's twin is the join-strategy hint
    * family. Audit that each hint actually selects its physical
    * operator. */
  test("join strategy hints map to their physical operators (Impala hint parity)") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val t = Tables(spark, sf0001)
      val probe = t.lineitem.select("l_partkey")
      def planOf(hint: String) =
        probe.join(t.part.hint(hint), col("l_partkey") === col("p_partkey"))
          .queryExecution.sparkPlan
      assert(planOf("broadcast").collectFirst {
        case j: BroadcastHashJoinExec => j }.isDefined, "broadcast hint ignored")
      assert(planOf("shuffle_hash").collectFirst {
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j }.isDefined,
        "shuffle_hash hint ignored")
      assert(planOf("merge").collectFirst {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j }.isDefined,
        "merge hint ignored")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  /** Window-cardinality rule (§5.11): an unpartitioned Window moves ALL
    * rows to one task — a scale-killer unless its input is bounded by
    * construction. Exactly two queries are allowed to plan one, each
    * with a proof of bounded input:
    *   - agg_equidepth_hist: input filtered to o_orderkey < 20000
    *     before the global ntile (AggQueries.scala)
    *   - sim_ivf_topk: the global window seeds centroids over ≤ cells
    *     rows (Similarity.scala)
    * Every other query in the registry must partition every window (or
    * use the bounded TopK aggregator instead — the ds_q49 treatment).
    * This closes the round-5 "WindowExec: No Partition Defined" tail:
    * the allowed set is enumerated here, so a NEW offender fails CI
    * instead of scrolling past as a warning. */
  test("only the documented bounded-input queries plan an unpartitioned window") {
    // The walk is PHYSICAL and descends into cached plans
    // (allPhysicalNodes), so a persist cannot hide a global window.
    // Allowed, each with a proof of bounded input:
    //   - agg_equidepth_hist: input filtered to o_orderkey < 20000
    //     before the global ntile (AggQueries.scala)
    //   - sim_ivf_topk: the global window seeds centroids over <= cells
    //     rows (Similarity.scala)
    //   - dedup_semantic: same bounded centroid seeding (row_number over
    //     limit(cells) <= 16 rows) — its assignment subtree sits behind
    //     the slot cache since round 7, visible again now that the walk
    //     recurses into InMemoryRelation (round-7 verdict #3).
    //   - ds_q70_rollup_rank: the q70 top-k prefilter ranks the NATION
    //     aggregate (25 rows, fixed domain) and the rank-within-parent
    //     window partitions by a GROUPING() level whose top level is
    //     one global row group over rollup output (<= 25x5 + 26 rows)
    val allowed = Set("agg_equidepth_hist", "sim_ivf_topk", "dedup_semantic",
      "ds_q70_rollup_rank")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val df = fn(spark, sf0001)
      import org.apache.spark.sql.catalyst.plans.logical.Window
      val logicalGlobal = df.queryExecution.optimizedPlan.collectWithSubqueries {
        case w: Window if w.partitionSpec.isEmpty => w
      }
      val cachedGlobal = cachedPhysicalNodes(df.queryExecution.optimizedPlan).collect {
        case w: org.apache.spark.sql.execution.window.WindowExecBase
          if w.partitionSpec.isEmpty => w
      }
      if (logicalGlobal.nonEmpty || cachedGlobal.nonEmpty) Some(name) else None
    }
    assert(offenders.toSet == allowed,
      s"undocumented global windows: ${offenders.toSet -- allowed}; " +
        s"stale allowance: ${allowed -- offenders.toSet}")
  }

  /** The round-7 verdict's #3: a deliberately-offending subtree behind
    * a persist must still trip the walkers — prove the naive walk is
    * blind (documents WHY allPhysicalNodes exists) and the recursive
    * walk is not. */
  test("suite-wide walkers see through persisted (InMemoryRelation) subtrees") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    val offending = Tables(spark, sf0001).region
      .withColumn("rn", row_number().over(Window.orderBy("r_regionkey")))
      .persist()
    try {
      val reread = offending.filter(col("rn") >= 1)
      val naive = reread.queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExecBase
          if w.partitionSpec.isEmpty => w
      }
      assert(naive.isEmpty,
        "expected the naive walk to be cache-blind (it saw the window; blind-spot test is stale)")
      val through = physicalNodes(reread.queryExecution.sparkPlan).collect {
        case w: org.apache.spark.sql.execution.window.WindowExecBase
          if w.partitionSpec.isEmpty => w
      }
      assert(through.nonEmpty,
        "physicalNodes failed to find the global window behind the InMemoryRelation")
      // and the logical-level equivalent used by the window gate
      val throughLogical = cachedPhysicalNodes(reread.queryExecution.optimizedPlan).collect {
        case w: org.apache.spark.sql.execution.window.WindowExecBase
          if w.partitionSpec.isEmpty => w
      }
      assert(throughLogical.nonEmpty,
        "cachedPhysicalNodes failed to find the global window behind the InMemoryRelation")
    } finally offending.unpersist()
  }

  /** Suite-wide non-equi-join gate: a CartesianProduct or
    * BroadcastNestedLoopJoin anywhere in a query plan is a 100 TB
    * scale bug unless one side is provably bounded (a constant,
    * centroid, sample, or config relation — never corpus-sized).
    * Every allowance below must name its bounded side; the assert is
    * two-way, so a stale allowance fails too. */
  /** The round-10 q28 lesson as a CI gate: Expand multiplies its input
    * N ways (multi-DISTINCT aggregates, ROLLUP/CUBE/GROUPING SETS), so
    * an Expand whose input is the raw FACT is a plan smell — the first
    * ds_q28 draft ran six count-DISTINCT filters of one 6M-row scan
    * through a 7× Expand (4.5 s; the (band, price) grain rewrite runs
    * 0.7–1.4 s). Every query whose physical plan carries an Expand must
    * be documented here with WHY its Expand input is bounded — either
    * the input is pre-aggregated to a small grain before Expand, or the
    * exact multi-distinct semantics genuinely need the fact (and the
    * deliberate-contrast entries say so). Two-way assert: an
    * undocumented Expand fails, and so does a stale allowance. */
  test("every Expand in the query inventory has a documented bounded input") {
    val allowed = Set(
      // grouping-set families: Expand IS the grouping-sets operator;
      // inputs are pre-aggregated to the finest grain first (the §5
      // partial-sums discipline), so the multiplier rides a small grain
      "agg_rollup", "agg_cube", "agg_grouping_sets", "agg_grouping_fn",
      "agg_grouping_id", "ds_q27_rollup_profile",
      "ds_q5_channel_rollup", "ds_q67_rollup_topn", "ds_q36_margin_rank",
      // q70: rollup over the pre-aggregated (nation, segment) grain
      // (<= 25x5 rows through the Expand), ranked within rollup levels
      "ds_q70_rollup_rank",
      // UNPIVOT is literally Expand — one copy per unpivoted column,
      // multiplier = the fixed column list
      "rel_unpivot",
      // MULTI-distinct aggregates (>= 2 distinct key sets — a single
      // countDistinct plans WITHOUT Expand): the exact semantics demand
      // the per-key-set replication. agg_multi_distinct/agg_filter/
      // agg_count_semantics are the Impala distinct/FILTER surface
      // itself; corpus_data_card is the occasional-audit report whose
      // per-dimension distincts have no smaller grain; the seqfile
      // round-trip aggregate runs on a 5-row input
      "agg_multi_distinct", "agg_filter", "agg_count_semantics",
      "corpus_data_card", "src_seqfile_roundtrip",
      // the DELIBERATE exact/Expand contrast kept beside its M1b HLL
      // twin (stats_table_ndv) — the inventory's documented anti-pattern
      "stats_table",
      // mixed-format round trip: two distinct key sets (doc_id, source)
      // per lang over the bounded 5-partition table
      "src_mixed_formats")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val has = physicalNodes(fn(spark, sf0001).queryExecution.sparkPlan).exists {
        case _: org.apache.spark.sql.execution.ExpandExec => true
        case _ => false
      }
      if (has) Some(name) else None
    }
    assert(offenders.toSet.subsetOf(allowed) && allowed.subsetOf(offenders.toSet),
      s"undocumented Expand: ${offenders.toSet -- allowed}; " +
        s"stale allowance: ${allowed -- offenders.toSet}")
  }

  test("no unbounded cartesian/nested-loop joins anywhere in the query inventory") {
    val allowed = Set(
      // the CROSS JOIN relational operator itself (R7): 5-row region side
      "join_cross",
      // scalar-subquery shapes: the nested-loop side is a 1-row global
      // aggregate (avg/total threshold) broadcast to the fact side
      "q02_min_cost_supplier", "q11_important_stock", "q20_potential_promotion",
      "q22_dormant_customers", "agg_theta_overlap", "ds_q88_multi_count",
      // 1-row model/config broadcasts: trained weights, BPE merge table,
      // mixture spec, df totals — each folds to ONE broadcast row
      "pipe_dsir_select", "pipe_mixture", "pipe_end_to_end", "pipe_bpe_tokenize",
      "pipe_unigram_tokenize", // r8: unigram vocab, the same 1-row fold as BPE
      "pipe_token_fertility", // r9: the same 1-row unigram-vocab broadcast
      "pipe_token_fertility_pinned", // r10: P63b pinned analytic vocab, same 1-row broadcast
      "pipe_unigram_tokenize_pinned", // r13: P50b, the same pinned-vocab 1-row broadcast
      "pipe_bpe_tokenize_pinned", // r12: P38b pinned merge table, same 1-row broadcast
      "text_lm_perplexity", "text_quality_classifier", "text_ppl_buckets",
      "text_tfidf_terms",
      // r8: N-total and Z-normalizer are 1-row global aggregates crossed
      // onto the 5-row stratum table (the corpus side joins by equi-key)
      "pipe_temperature_mix",
      // bounded centroid/codebook sides: <= cells (16) or codebook (<= 256)
      // rows broadcast against the corpus; assignment itself is row-local.
      // dedup_semantic's bounded centroid crossJoin sits behind its slot
      // cache — visible again since the walk recurses into
      // InMemoryRelation (round-7 verdict #3).
      "sim_ivf_topk", "sim_ivf_persisted", "sim_pq_topk", "sim_pq_persisted",
      "dedup_semantic",
      // r13: the pinned-quantizer variants — the SAME bounded literal
      // centroid (16 rows) / codebook (256 rows) broadcasts as their
      // trained siblings above, from an analytic LocalRelation
      "sim_ivf_topk_pinned", "sim_pq_topk_pinned", "dedup_semantic_pinned",
      // documented bounded-query brute-force baseline (SURVEY P7)
      "sim_brute_topk")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val bad = physicalNodes(fn(spark, sf0001).queryExecution.sparkPlan).collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j.nodeName
        case j: org.apache.spark.sql.execution.joins.CartesianProductExec => j.nodeName
      }
      if (bad.nonEmpty) Some(name) else None
    }
    assert(offenders.toSet == allowed,
      s"undocumented non-equi joins: ${offenders.toSet -- allowed}; " +
        s"stale allowance: ${allowed -- offenders.toSet}")
  }

  /** The guide-§2.5 input-spread exchange Tables.fact() adds when the
    * file layout cannot feed the session's parallelism (the bench's
    * single-row-group parquet inputs): a round-robin repartition
    * DIRECTLY over a bare file scan — nothing but the scan (possibly
    * codegen-wrapped) below it. The scan-bound pins below ignore
    * exactly this shape and nothing else: a keyed exchange (hash or
    * range partitioning), or a round-robin above real compute, still
    * fails the pin. On any layout with >= cores input splits the
    * spread is not planned at all, so at scale the pins are unchanged. */
  private def isInputSpread(
      e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec): Boolean =
    e.outputPartitioning.isInstanceOf[
      org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning] &&
      e.child.collect { case n => n }.forall {
        case _: FileSourceScanExec => true
        case _: org.apache.spark.sql.execution.InputAdapter => true
        case _: org.apache.spark.sql.execution.WholeStageCodegenExec => true
        case _: org.apache.spark.sql.execution.ColumnarToRowExec => true
        case _ => false
      }

  /** Round-8 third-session plan shapes: P53 is pure per-row expression
    * work (its only exchange in the registry query is the final
    * orderBy), and P56's best-fit packing shuffles the corpus exactly
    * once, on the shard key. A regression that reintroduces a
    * corpus-wide exchange into either — e.g. the repetition stats
    * turning into a groupBy, or the packer adding a sort shuffle —
    * fails here before it can reach a driver artifact. */
  test("P53 is scan-bound; P56 shuffles once on the shard key") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val docs = Tables(spark, sf0001).documents
    val rep = graft.pipeline.TextAnalysis.gopherRepetition(spark,
      graft.pipeline.TextAnalysis.reflowParagraphs(docs))
    val repShuffles = rep.queryExecution.sparkPlan
      .collect { case e: ShuffleExchangeExec => e }.filterNot(isInputSpread)
    assert(repShuffles.isEmpty,
      s"P53 must be scan-bound:\n${rep.queryExecution.sparkPlan}")
    // the groupByKey exchange appears at EnsureRequirements time, and
    // under AQE only in the FINAL plan (as shuffle query stages) — run
    // the query, then walk the adaptive result
    val packed = graft.pipeline.Curation.packBestFit(docs)
    packed.collect()
    val fin = packed.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // query stages are LEAF wrappers — recurse into their plans
    def walk(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      p.collect { case n => n }.flatMap {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q) ++ walk(q.plan)
        case n => Seq(n)
      }
    val packShuffles = walk(fin).collect { case e: ShuffleExchangeExec => e }
      .filterNot(isInputSpread)
    assert(packShuffles.size == 1,
      s"P56 must shuffle exactly once (shard key):\n$fin")
  }

  /** IVF cell assignment must be shuffle-free on the corpus side
    * (round-6 verdict #2): the centroid set is folded into ONE
    * broadcast row and the argmax computed row-locally, so the path
    * from the embeddings scan to the join carries no Exchange. A
    * crossJoin + groupBy(vec_id) regression would reintroduce a
    * full-corpus shuffle per Lloyd iteration and fail here. */
  test("IVF centroid assignment keeps the corpus side exchange-free") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    val emb = Tables(spark, sf0001).embeddings
    val cent = emb.orderBy("vec_id").limit(4)
      .select((org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("vec_id")) - 1)
        .cast("long").as("cell"), col("embedding").as("cvec"))
    val assigned = graft.pipeline.Similarity.assignCells(emb, cent)
    val plan = assigned.queryExecution.sparkPlan
    val join = plan.collectFirst { case j: BroadcastNestedLoopJoinExec => j }
    assert(join.isDefined, s"expected broadcast join in assignment plan:\n$plan")
    val streamed = join.get.buildSide match {
      case BuildRight => join.get.left
      case BuildLeft => join.get.right
    }
    val shuffles = streamed.collect { case e: ShuffleExchangeExec => e }
      .filterNot(isInputSpread)
    assert(shuffles.isEmpty,
      s"corpus side of IVF assignment shuffles:\n$streamed")
    // and NOTHING above the join shuffles either (the argmax is a
    // per-row projection, not an aggregate)
    val above = plan.collect { case e: ShuffleExchangeExec => e }
      .filterNot(isInputSpread)
    val centShuffles = join.get.buildSide match {
      case BuildRight => join.get.right.collect { case e: ShuffleExchangeExec => e }
      case BuildLeft => join.get.left.collect { case e: ShuffleExchangeExec => e }
    }
    assert(above.size == centShuffles.filterNot(isInputSpread).size,
      s"exchange above the assignment join (corpus-wide shuffle):\n$plan")
  }
}
