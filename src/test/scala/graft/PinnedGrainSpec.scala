package graft

/** Mechanical pinned-grain audit (VERDICT r17 task 2): every memoized
  * index build must pin caches at or above the right-sizing policy's
  * floor ([[GraftSession.compactParts]] — ~64k rows per partition,
  * capped at the session's shuffle parallelism), because a pinned
  * cache below the floor serializes every consumer scan on one core —
  * the quantEmb defect class that shipped for two rounds (an
  * AQE-coalesced or single-split build pinning ONE partition of a
  * corpus-scaled table) and that hand audits keep missing.
  *
  * Swept at sf0.1, the SF where floors actually bite (every sf0.001
  * pinned table is under one 64k-row partition, so the invariant is
  * vacuous there): the full gate surface is constructed once, which
  * triggers every build, then each live pinned DataFrame is measured.
  * The session's shuffle parallelism (4 in tests) caps the floor, so
  * the assertion is session-relative — the same build on the bench's
  * 32-thread session must clear the same rule with floor up to 32,
  * and at cluster scale the floor clamp makes the rule a no-op by
  * construction. Like ScaleInvariantsSpec, failures name the tag:
  * fix the build (persistCompact lifts as well as compacts since
  * r18) rather than widening any allowlist — there is none.
  */
class PinnedGrainSpec extends SparkTestBase {

  test("no memoized build pins a cache below the right-sizing floor " +
      "at sf0.1") {
    val d = "/root/testdata/sf0.1"
    // a clean registry: earlier suites' sf0.001 builds must not be
    // audited against sf0.1 expectations (and their pins are released
    // so this heavy pass has the heap to itself)
    graft.ops.IndexMemo.clear()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      fn(spark, d)
    }
    val pinned = graft.ops.IndexMemo.pinnedSnapshot
    assert(pinned.nonEmpty, "no pinned caches were registered — the " +
      "pinnedSnapshot seam or the build trigger is broken")
    val offenders = Seq.newBuilder[String]
    pinned.foreach { case (tag, df) =>
      val rows = df.count()
      val parts = df.rdd.getNumPartitions
      val floor = GraftSession.compactParts(spark, rows)
      if (parts < floor)
        offenders += s"$tag(rows=$rows parts=$parts floor=$floor)"
    }
    assert(offenders.result().isEmpty,
      "pinned cache below the right-sizing floor — every consumer " +
        s"scan of it is serialized: ${offenders.result()}")
    // release the sf0.1 caches: later suites rebuild at their own SF
    graft.ops.IndexMemo.clear()
  }
}
