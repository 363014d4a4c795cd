package graft

import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, CollectList, CollectSet, Percentile}
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.exchange.{Exchange, ReusedExchangeExec}

/** Mechanical single-task-hazard sweep over EVERY gate query.
  *
  * The r13/r14 q119 lesson, generalized: the two plan shapes that
  * funnel a corpus-proportional row stream into ONE task — an
  * UNGROUPED collect_list/collect_set aggregate (the whole input
  * materializes as one array in one task) and a GLOBAL window (empty
  * partition spec = single-partition sort) over un-aggregated rows —
  * are invisible at test scale and fatal at 10^9 documents. Hand
  * audits caught q119 only after three rounds shipped it, and this
  * sweep's first run immediately found two more members of the class
  * the manual audit had cleared (q152's corpus/10-point regression
  * fold, q165's joint-vocabulary fold — both since rewritten as
  * two-level folds). So the invariant is now mechanical: every
  * `SparkEntry.queries` plan is checked, and the legitimate uses are
  * a CLOSED allowlist with per-entry justifications. Adding a new
  * ungrouped collect — or dropping an allowlisted one — fails the
  * sweep until the list is consciously edited, the same
  * drift-guard contract as MemoStabilitySpec and OperatorIndexSpec.
  *
  * What "bounded" means for the window gate: a global window is
  * allowed only when its input (modulo sort/exchange/project/filter/
  * codegen plumbing) comes from an Aggregate (grouping-cardinality-
  * sized: subsplit counts, strata, contingency cells), a Limit
  * (top-K), a union / broadcast-nested-loop cross of such inputs, or
  * another global window over one. A cut() table (RDDScanExec) is
  * opaque to the traversal, so the two queries that window over a cut
  * HISTOGRAM are allowlisted by name instead.
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

  /** Gate queries whose global window reads a cut() table the
    * traversal cannot see past — each cut is a value-range-sized
    * HISTOGRAM aggregate, bounded by the value domain. */
  private val cutFedGlobalWindows: Map[String, String] = Map(
    "q136_conversion_latency" ->
      "cut per-second latency histogram (groupBy lat_s counts)",
    "q182_order_gaps" ->
      "cut gap-day histogram (groupBy gap counts)")

  private def hasUngroupedCollect(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Boolean =
    plan.collectFirst {
      case a: Aggregate if a.groupingExpressions.isEmpty &&
          a.aggregateExpressions.exists(_.collectFirst {
            case e: AggregateExpression
                if e.aggregateFunction.isInstanceOf[CollectList] ||
                  e.aggregateFunction.isInstanceOf[CollectSet] => e
          }.isDefined) => a
    }.isDefined

  /** Is a global window's input bounded (never corpus-row-sized)?
    * Terminal OKs: aggregates and limits. Unions and broadcast
    * nested-loop (cross) joins are bounded iff every input is.
    * RDDScanExec (cut tables) is opaque: handled by allowlist. */
  private def bounded(p: SparkPlan): Boolean = p match {
    case _: aggregate.BaseAggregateExec => true
    case _: GlobalLimitExec | _: LocalLimitExec |
        _: TakeOrderedAndProjectExec => true
    case r: ReusedExchangeExec => bounded(r.child)
    case _: SortExec | _: Exchange | _: ProjectExec | _: FilterExec |
        _: WholeStageCodegenExec | _: InputAdapter | _: CoalesceExec |
        _: org.apache.spark.sql.execution.window.WindowExec =>
      bounded(p.children.head)
    case u: UnionExec => u.children.forall(bounded)
    case j: org.apache.spark.sql.execution.joins
        .BroadcastNestedLoopJoinExec => j.children.forall(bounded)
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
    val collectUsers = Set.newBuilder[String]
    val cutWindowUsers = Set.newBuilder[String]
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
        if (hasUngroupedCollect(df.queryExecution.optimizedPlan)) {
          collectUsers += name
          if (!boundedUngroupedCollects.contains(name))
            collectOffenders += name
        }
        val globals = df.queryExecution.executedPlan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec
              if w.partitionSpec.isEmpty => w
        }
        globals.foreach { w =>
          if (!bounded(w.child)) {
            val feedsCut = w.child.collectFirst {
              case r: RDDScanExec => r }.isDefined
            if (feedsCut) cutWindowUsers += name
            if (!(feedsCut && cutFedGlobalWindows.contains(name)))
              windowOffenders +=
                s"$name(window over ${w.child.getClass.getSimpleName})"
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
    assert(windowOffenders.result().isEmpty,
      "global window over un-aggregated, un-limited input " +
        s"(single-partition corpus sort): ${windowOffenders.result()}")
    // staleness: the allowlists must match reality EXACTLY, so a
    // rewrite that removes a justified use also prunes its entry
    assert(collectUsers.result() == boundedUngroupedCollects.keySet,
      "ungrouped-collect allowlist is stale: " +
        s"actual=${collectUsers.result().toSeq.sorted} " +
        s"listed=${boundedUngroupedCollects.keySet.toSeq.sorted}")
    assert(cutWindowUsers.result() == cutFedGlobalWindows.keySet,
      "cut-fed-window allowlist is stale: " +
        s"actual=${cutWindowUsers.result().toSeq.sorted} " +
        s"listed=${cutFedGlobalWindows.keySet.toSeq.sorted}")
  }
}
