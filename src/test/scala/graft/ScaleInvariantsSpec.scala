package graft

import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, CollectList, CollectSet, Percentile}
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.exchange.{Exchange, ReusedExchangeExec}

/** Mechanical single-task-hazard sweep over EVERY gate query.
  *
  * The r13/r14 q119 lesson, generalized: plan shapes that funnel a
  * corpus-proportional row stream into ONE task are invisible at test
  * scale and fatal at 10^9 documents, and hand audits keep missing
  * them — q119 shipped for three rounds, and this sweep's first runs
  * falsified the r13 audit's "q119 was the only one" three more
  * times (q152's corpus/10-point fold, q165's joint-vocabulary fold,
  * q121's filterless rank window). So the invariant is mechanical:
  * every `SparkEntry.queries` plan is checked for FOUR shapes, and
  * the legitimate uses are CLOSED allowlists with per-entry
  * justifications, compared for exact equality — adding a new device
  * or dropping an allowlisted one fails CI until the list is
  * consciously edited (the MemoStabilitySpec / OperatorIndexSpec
  * drift-guard contract).
  *
  *  1. UNGROUPED collect_list/collect_set: the whole input
  *     materializes as one array in one task.
  *  2. Exact Percentile: buffers every group value in one task
  *     (group-row-sized; banned outright since q64's histogram
  *     rank device left zero users).
  *  3. GLOBAL windows (empty partition spec = single-partition sort)
  *     over un-aggregated, un-limited input.
  *  4. Windows partitioned ONLY by categorical keys (source, lang,
  *     event_type — corpus/|categories| rows per sort task) over
  *     such input.
  *  5. collect_list/collect_set GROUPED only by categorical keys over
  *     such input — corpus/|categories| rows per array buffer, and
  *     unlike a sort, an aggregation ARRAY cannot spill.
  *  6. Cartesian products with an unbounded side (rows-squared).
  *
  * Boundary: memoized index BUILD plans materialize inside the first
  * construction (IndexMemo) and are not visible to this sweep — their
  * shapes are audited per-index in IndexMemoSpec and the plan-shape
  * gates of PlanShapeSpec.
  *
  * What "bounded" means for the window gates: input that (modulo
  * sort/exchange/project/filter/codegen plumbing) comes from an
  * Aggregate (grouping-cardinality-sized), a Limit, Catalyst's own
  * WindowGroupLimit (the rank-limit pushdown — see NOTE below), a
  * generate/union/join of such inputs, or another window over one.
  * A cut() table (RDDScanExec) is opaque to the traversal, so the
  * queries windowing over cut HISTOGRAMS are allowlisted by name.
  */
class ScaleInvariantsSpec extends SparkTestBase {

  /** Gate queries whose plan legitimately carries an ungrouped
    * collect_list/collect_set — every entry's input is bounded by
    * construction, NOT corpus-proportional. Keep justifications
    * honest: this list is compared for EXACT equality. */
  private val boundedUngroupedCollects: Map[String, String] = Map(
    "q113_neyman_alloc" ->
      "per-stratum (lang) weight partials — category-sized",
    "q117_zipf_fit" ->
      "top-500 vocabulary after limit",
    "q135_chi2_independence" ->
      "lang x source contingency cells — category-sized",
    "q152_heaps_fit" ->
      "<=4096 doc_id-residue fold partials (two-level fold)",
    "q160_mutual_info" ->
      "lang x source contingency cells — category-sized",
    "q165_jsd" ->
      "<=4096 md5-bucket fold partials (two-level fold)",
    "q168_cramers_v" ->
      "lang x source contingency cells — category-sized")

  /** Gate queries whose (global or categorical) window input traces
    * to a cut() table the traversal cannot see past — each cut is a
    * value-range- or time-range-sized HISTOGRAM aggregate, bounded by
    * the value domain, never by corpus rows. */
  private val cutFedWindows: Map[String, String] = Map(
    "q136_conversion_latency" ->
      "cut per-second latency histogram (groupBy lat_s counts)",
    "q155_autocorr" ->
      "cut hourly-count buckets (time-range x types) densify join",
    "q182_order_gaps" ->
      "cut gap-day histogram (groupBy gap counts)")

  /** Same cut-opacity, for categorical-GROUPED collects: the collect's
    * input is a cut HISTOGRAM with constant rows per category. */
  private val cutFedCategoricalCollects: Map[String, String] = Map(
    "q150_psi_drift" ->
      "cut types x 24 hour-of-day cells (constant per type)")

  /** Partition keys that are CATEGORICAL (a handful of values at any
    * corpus size), so a window partitioned ONLY by them concentrates
    * corpus/|categories| rows into single sort tasks unless its input
    * is already bounded. High-cardinality keys (doc_id, user_id,
    * hashes, buckets, salts) are exempt: their groups are small and
    * the window's parallelism is the key's cardinality. */
  private val CategoricalKeys =
    Set("source", "lang", "event_type", "kind")

  // NOTE on rank-limit windows: `row_number().over(...)` followed by
  // `filter(rn <= k)` is NOT a hazard — Catalyst's InferWindowGroupLimit
  // rewrites it with a map-side WindowGroupLimit(Partial) BEFORE the
  // exchange, so the shuffle and the per-group task carry k rows per
  // map partition, not the group (verified on the q99 plan). bounded()
  // treats WindowGroupLimitExec as a terminal OK, which mechanically
  // REQUIRES the filter pattern: a rank consumed without the filter
  // (the pre-r14 kmvDistinct `max(when(rn === k))` shape) gets no
  // group-limit and fails here.

  private def hasCollect(a: Aggregate): Boolean =
    a.aggregateExpressions.exists(_.collectFirst {
      case e: AggregateExpression
          if e.aggregateFunction.isInstanceOf[CollectList] ||
            e.aggregateFunction.isInstanceOf[CollectSet] => e
    }.isDefined)

  private def hasUngroupedCollect(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Boolean =
    plan.collectFirst {
      case a: Aggregate if a.groupingExpressions.isEmpty &&
          hasCollect(a) => a
    }.isDefined

  /** Logical-plan boundedness (the physical bounded() can't adjudicate
    * a grouped collect: its own partial/final agg pair satisfies the
    * aggregate terminal). Same house rules, logical nodes. */
  private def boundedL(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    p match {
      case _: Aggregate => true
      case _: GlobalLimit | _: LocalLimit => true
      case _: WindowGroupLimit => true
      case u: Union => u.children.forall(boundedL)
      case j: Join => j.children.forall(boundedL)
      case _: Project | _: Filter | _: Sort | _: Window | _: Generate |
          _: RepartitionOperation | _: SubqueryAlias =>
        boundedL(p.children.head)
      case _ => false
    }
  }

  /** Aggregates GROUPED only by categorical keys whose functions
    * include a collect over un-bounded input: corpus/|categories|
    * rows in one in-memory array buffer (and unlike a sort, an
    * aggregation array cannot spill). Returns the offending
    * aggregates for cut-fed classification. */
  private def categoricalCollectHazards(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Seq[Aggregate] =
    plan.collect {
      case a: Aggregate if a.groupingExpressions.nonEmpty &&
          a.groupingExpressions.forall {
            case ar: org.apache.spark.sql.catalyst.expressions
                .AttributeReference => CategoricalKeys(ar.name)
            case _ => false
          } && hasCollect(a) && !boundedL(a.child) => a
    }

  /** Is a global window's input bounded (never corpus-row-sized)?
    * Terminal OKs: aggregates and limits. Unions and broadcast
    * nested-loop (cross) joins are bounded iff every input is.
    * RDDScanExec (cut tables) is opaque: handled by allowlist. */
  private def bounded(p: SparkPlan): Boolean = p match {
    case _: aggregate.BaseAggregateExec => true
    case _: GlobalLimitExec | _: LocalLimitExec |
        _: TakeOrderedAndProjectExec => true
    // Catalyst's rank-limit pushdown: the window's input is already
    // group-limited to k rows per map partition (see NOTE above)
    case _: org.apache.spark.sql.execution.window.WindowGroupLimitExec =>
      true
    case r: ReusedExchangeExec => bounded(r.child)
    case _: SortExec | _: Exchange | _: ProjectExec | _: FilterExec |
        _: WholeStageCodegenExec | _: InputAdapter | _: CoalesceExec |
        _: GenerateExec |
        _: org.apache.spark.sql.execution.window.WindowExec =>
      bounded(p.children.head)
    case u: UnionExec => u.children.forall(bounded)
    // a join of bounded inputs is bounded (by their product at worst)
    case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
      j.children.forall(bounded)
    case _ => false
  }

  test("no gate query funnels corpus-proportional rows into one task") {
    val d = sf("")
    // static plans: AQE wraps the physical tree in an opaque
    // AdaptiveSparkPlanExec (same reasoning as PlanShapeSpec)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val collectOffenders = Seq.newBuilder[String]
    val windowOffenders = Seq.newBuilder[String]
    val percentileOffenders = Seq.newBuilder[String]
    val cartesianOffenders = Seq.newBuilder[String]
    val collectUsers = Set.newBuilder[String]
    val cutWindowUsers = Set.newBuilder[String]
    val catCutUsers = Set.newBuilder[String]
    try {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val df = fn(spark, d)
        // exact Percentile buffers EVERY group value in one task —
        // group-row-sized state. Zero gate queries use it since q64
        // moved to the value-histogram rank device; keep it that way.
        if (df.queryExecution.optimizedPlan.exists(_.expressions.exists(
            _.collectFirst { case e: AggregateExpression
              if e.aggregateFunction.isInstanceOf[Percentile] => e
            }.isDefined)))
          percentileOffenders += name
        // a cartesian product with both sides corpus-scaled is the
        // rows-squared cousin of the single-task funnels (broadcast
        // crosses of scalar/strata tables plan as BNLJ and are fine)
        df.queryExecution.executedPlan.collect {
          case c: org.apache.spark.sql.execution.joins
              .CartesianProductExec if !c.children.forall(bounded) =>
            cartesianOffenders += name
        }
        if (hasUngroupedCollect(df.queryExecution.optimizedPlan)) {
          collectUsers += name
          if (!boundedUngroupedCollects.contains(name))
            collectOffenders += name
        }
        categoricalCollectHazards(df.queryExecution.optimizedPlan)
          .foreach { a =>
            val feedsCut = a.child.collectFirst {
              case l: org.apache.spark.sql.execution.LogicalRDD => l
            }.isDefined
            if (feedsCut) catCutUsers += name
            if (!(feedsCut && cutFedCategoricalCollects.contains(name)))
              collectOffenders += s"$name(categorical-grouped collect)"
          }

        val windows = df.queryExecution.executedPlan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec => w
        }
        windows.foreach { w =>
          // global windows (single-partition sort of the WHOLE input)
          // and windows partitioned only by categorical keys (single
          // sort task per category, corpus/|categories| rows) must
          // both sit over bounded input
          val categorical = w.partitionSpec.nonEmpty &&
            w.partitionSpec.forall {
              case a: org.apache.spark.sql.catalyst.expressions
                  .AttributeReference => CategoricalKeys(a.name)
              case _ => false
            }
          if ((w.partitionSpec.isEmpty || categorical) &&
              !bounded(w.child)) {
            val feedsCut = w.child.collectFirst {
              case r: RDDScanExec => r }.isDefined
            if (feedsCut) cutWindowUsers += name
            val excused = feedsCut && cutFedWindows.contains(name)
            if (!excused)
              windowOffenders +=
                s"$name(window by ${w.partitionSpec.mkString(",")} " +
                  s"over ${w.child.getClass.getSimpleName})"
          }
        }
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(collectOffenders.result().isEmpty,
      "ungrouped corpus collect outside the justified allowlist " +
        s"(partition it or justify here): ${collectOffenders.result()}")
    assert(percentileOffenders.result().isEmpty,
      "exact Percentile (group-row-sized buffer) in a gate plan — " +
        "use the q64 value-histogram rank device: " +
        percentileOffenders.result())
    assert(cartesianOffenders.result().isEmpty,
      "cartesian product with an unbounded side in a gate plan: " +
        cartesianOffenders.result())
    assert(windowOffenders.result().isEmpty,
      "global window over un-aggregated, un-limited input " +
        s"(single-partition corpus sort): ${windowOffenders.result()}")
    // staleness: the allowlists must match reality EXACTLY, so a
    // rewrite that removes a justified use also prunes its entry
    assert(collectUsers.result() == boundedUngroupedCollects.keySet,
      "ungrouped-collect allowlist is stale: " +
        s"actual=${collectUsers.result().toSeq.sorted} " +
        s"listed=${boundedUngroupedCollects.keySet.toSeq.sorted}")
    assert(cutWindowUsers.result() == cutFedWindows.keySet,
      "cut-fed-window allowlist is stale: " +
        s"actual=${cutWindowUsers.result().toSeq.sorted} " +
        s"listed=${cutFedWindows.keySet.toSeq.sorted}")
    assert(catCutUsers.result() == cutFedCategoricalCollects.keySet,
      "cut-fed-categorical-collect allowlist is stale: " +
        s"actual=${catCutUsers.result().toSeq.sorted} " +
        s"listed=${cutFedCategoricalCollects.keySet.toSeq.sorted}")
  }
}
