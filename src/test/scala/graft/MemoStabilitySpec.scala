package graft

import graft.ops.IndexMemo

/** Mechanical memo-key stability sweep over EVERY gate query.
  *
  * The r12 q119 regression class: a memoized operator whose memo key
  * is derived from an UNSTABLE plan (there, an eager localCheckpoint
  * inside the memoized expression — a fresh `LogicalRDD`, so a fresh
  * `semanticHash`, every call) never hits its own cache, silently
  * rebuilding a corpus-scale index per invocation while staying
  * hash-correct. Per-instance lifecycle tests (IndexMemoSpec) only
  * guard the memos someone remembered to test — q119 broke precisely
  * because `pplScores` had none. This sweep is tag-agnostic: it
  * constructs every `SparkEntry.queries` entry twice and asserts the
  * second construction neither runs a build block (buildNanos frozen)
  * nor registers a cache entry (size frozen) — so ANY current or
  * future memo with an unstable key fails here mechanically, without
  * a per-tag spec.
  *
  * Construction (not execution) is the right probe: `getOrBuild` runs
  * at DataFrame-construction time and every build block materializes
  * eagerly inside it, so an unstable key moves the counters before
  * any action. Queries that never touch the memo cost only plan
  * analysis on the second pass.
  *
  * Deliberately NOT asserted: raw persistent-RDD growth. ~50 queries
  * legitimately grow `getPersistentRDDs` per construction — every
  * `GraftSession.cut` mints a call-scoped localCheckpoint RDD that
  * the ContextCleaner reclaims once the plan is unreachable
  * (GC-bounded, unlike a memo entry's strong pin) — so that invariant
  * false-positives by design; the per-instance lifecycle tests in
  * IndexMemoSpec assert pinned-storage stability where it IS the
  * contract (memoized index builds).
  */
class MemoStabilitySpec extends SparkTestBase {

  test("every memo-backed query holds a stable memo key across calls") {
    val d = sf("")
    val unstable = Seq.newBuilder[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      fn(spark, d) // first construction: may build + register
      val size1 = IndexMemo.size
      val nanos1 = IndexMemo.buildNanos
      fn(spark, d) // second construction: must be pure memo hits
      val rebuilt = IndexMemo.buildNanos != nanos1
      val grew = IndexMemo.size != size1
      if (rebuilt || grew)
        unstable += s"$name(${if (rebuilt) "rebuilt" else ""}" +
          s"${if (grew) " new-entry" else ""})"
    }
    val bad = unstable.result()
    assert(bad.isEmpty,
      s"memo keys unstable across identical calls: ${bad.mkString(", ")}")
  }
}
