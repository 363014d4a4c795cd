package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus-curation operators for a training-data pipeline: deterministic
  * sampling, normalization, PII redaction, benchmark-contamination
  * checks, tf-idf salience, and an oracle-checkable MinHash variant.
  *
  * Everything here is hash- or expression-driven and deterministic —
  * no RNG state, so re-runs and retried tasks produce identical output
  * (the property that makes sampling at 100 TB reproducible). md5 is
  * used where a DuckDB oracle must mirror the hash bit-for-bit;
  * xxhash64 (cheaper, codegen'd) remains the production default in
  * [[Dedup]].
  */
object Curation {

  /** Deterministic keep-decision: first two hex chars of md5(id) vs a
    * two-hex-digit rate threshold ("33" keeps ~20%). Lexicographic
    * compare == numeric compare for fixed-width lowercase hex. */
  def hashKeep(id: Column, rateHex: Column): Column =
    substring(md5(id.cast("string")), 1, 2) <= rateHex

  /** Stratified sampling: even-numbered sources keep ~8% ("14"),
    * odd-numbered ~20% ("33") — per-stratum rates without a shuffle,
    * reproducible across runs and engines. */
  def stratifiedSample(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("rate_hex",
        when(substring(col("source"), 4, 10).cast("int") % 2 === 0, "14")
          .otherwise("33"))
      .filter(hashKeep(col("doc_id"), col("rate_hex")))
      .select(col("doc_id"), col("source"), col("lang"))

  /** Per-source token-stream layout: each document's token span start
    * (`cum_before`) in a deterministic md5(doc_id)-ordered stream — the
    * shared substrate of [[budgetFill]] and [[packSequences]].
    *
    * TWO-LEVEL window: a single per-source window serializes a giant
    * source (one partition sorts the whole source — the 100 TB
    * bottleneck), so the stream is cut within SUBSPLITS first and
    * corrected after. The subsplit is the first two hex chars of the
    * md5 order key — a PREFIX of the key, so ordering by (sub, k)
    * IS ordering by k and the decomposition is exact:
    *
    *   cum_before(doc) = cum_in_sub(doc) + sub_offset(source, sub)
    *
    * where cum_in_sub comes from a window over (source, sub) — 256-way
    * parallel per source — and sub_offset (tokens in all lower
    * subsplits of the source) comes from a window over the tiny
    * per-(source, sub) subtotal table, broadcast back. Equality with
    * the single-window formulation is property-tested at sf0.01
    * (CurationSpec). Costs one extra map-side-combined aggregation pass
    * for the subtotals; buys the heavy sort 256x the parallelism. */
  private def tokenStream(s: SparkSession, d: String): DataFrame =
    tokenStreamOf(Tables.documents(s, d))

  private[graft] def tokenStreamOf(docs: DataFrame): DataFrame = {
    val tok = TextOps.tokenCount(col("text")).cast("long")
    val key = md5(col("doc_id").cast("string"))
    val base = docs
      .select(col("doc_id"), col("source"), tok.as("n_tok"), key.as("k"))
      .withColumn("sub", substring(col("k"), 1, 2))
    val wSub = Window.partitionBy(col("source"), col("sub"))
      .orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val inSub = base.withColumn("cum_in_sub",
      coalesce(sum(col("n_tok")).over(wSub), lit(0L)))
    // subtotal table: sources x <=256 rows; its window is trivial
    val wOff = Window.partitionBy(col("source")).orderBy(col("sub"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("source"), col("sub"))
      .agg(sum(col("n_tok")).as("sub_tok"))
      .withColumn("sub_offset",
        coalesce(sum(col("sub_tok")).over(wOff), lit(0L)))
      .select(col("source"), col("sub"), col("sub_offset"))
    inSub.join(broadcast(offsets), Seq("source", "sub"))
      .withColumn("cum_before", col("sub_offset") + col("cum_in_sub"))
      .select(col("doc_id"), col("source"), col("n_tok"), col("k"),
        col("cum_before"))
  }

  /** The single-window formulation of [[tokenStreamOf]] — the
    * correctness reference the two-level decomposition is
    * property-tested against; not used in any query path. */
  private[graft] def tokenStreamSingleWindow(docs: DataFrame): DataFrame = {
    val tok = TextOps.tokenCount(col("text")).cast("long")
    val key = md5(col("doc_id").cast("string"))
    val w = Window.partitionBy(col("source")).orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col("doc_id"), col("source"), tok.as("n_tok"), key.as("k"))
      .withColumn("cum_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
  }

  /** Token-budget fill: deterministically select documents per source
    * until each source's token budget is exhausted — the "fill a 10B-token
    * training mix" step. Documents are consumed in md5(doc_id) order (the
    * same retry-stable key as [[stratifiedSample]], so the selection is
    * identical across runs, engines, and partial re-runs); a document is
    * kept iff the budget was not yet exhausted when it starts, so every
    * source overshoots by at most one document.
    *
    * Scale shape: the two-level subsplit window of [[tokenStreamOf]] —
    * an order-dependent cut whose heavy sort runs 256-way parallel per
    * source, so one giant source can no longer serialize the pass. */
  def budgetFill(s: SparkSession, d: String,
      budgetTokens: Long = 3000L): DataFrame =
    tokenStream(s, d)
      .filter(col("cum_before") < budgetTokens)
      .select(col("doc_id"), col("source"), col("n_tok"),
        (col("cum_before") + col("n_tok")).as("cum_tok"))

  /** GPT-style sequence packing: concatenate each source's documents into
    * one token stream (deterministic md5 order, see [[tokenStream]]) and
    * cut it every `contextTokens` tokens — documents split across context
    * boundaries, exactly like pre-training batch assembly. Emits one row
    * per (bin, document) overlap with the token count the document
    * contributes to that bin, so downstream can both reassemble bins and
    * account attention-mask segments.
    *
    * Shape: the window pass from [[tokenStream]] plus a codegen'd
    * `sequence`+`explode` over each doc's bin range — fan-out bounded by
    * ceil(doc_tokens / context) per doc, never a join. At 100 TB the
    * stream cut is embarrassingly parallel after the one window shuffle. */
  def packSequences(s: SparkSession, d: String,
      contextTokens: Int = 512): DataFrame = {
    val c = lit(contextTokens.toLong)
    tokenStream(s, d)
      .filter(col("n_tok") >= 1)
      .withColumn("bin_id", explode(sequence(
        expr(s"cum_before div $contextTokens"),
        expr(s"(cum_before + n_tok - 1) div $contextTokens"))))
      .select(col("source"), col("bin_id"), col("doc_id"),
        (least(col("cum_before") + col("n_tok"), (col("bin_id") + 1) * c) -
          greatest(col("cum_before"), col("bin_id") * c)).as("n_in_bin"))
  }

  /** Training-text normalization: casefold, strip non-alphanumerics,
    * collapse whitespace — one codegen'd scan projection. */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  def normalizeQuery(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), normalize(col("text")).as("norm_text"))

  /** PII redaction: emails and phone numbers masked in one pass.
    * The synthetic contact lines are derived from customer so the
    * oracle builds the identical input. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text,
        "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "[EMAIL]"),
      "\\+[0-9]{2} [0-9]{4} [0-9]{4}", "[PHONE]")

  def piiRedactQuery(s: SparkSession, d: String): DataFrame = {
    val raw = concat(
      lit("contact "), lower(regexp_replace(col("c_name"), "[# ]", "")),
      lit("@example.com or +45 "),
      lpad((col("c_custkey") % 10000).cast("string"), 4, "0"),
      lit(" "),
      lpad((col("c_custkey") * 7 % 10000).cast("string"), 4, "0"),
      lit(" office"))
    Tables.customer(s, d)
      .select(col("c_custkey"), raw.as("raw"), redactPii(raw).as("redacted"))
  }

  /** Benchmark-contamination check: non-benchmark documents sharing at
    * least one token 8-gram with the benchmark subset (doc_id % 97 == 0
    * stands in for the eval set). The benchmark gram set is tiny ->
    * broadcast; the corpus side streams its grams through the join, so
    * the full-corpus cost is one scan + one broadcast hash join, never
    * a corpus self-join. */
  /** Exploded (doc_id, gram-hash) pairs, fully codegen'd: tokens
    * explode with their position, hash once, and k consecutive token
    * hashes combine through a lead-window into one 64-bit gram key —
    * no interpreted higher-order slicing, no gram strings. Two grams
    * are equal iff their token sequences are (modulo 2^-64
    * collisions), so set arithmetic over these keys matches set
    * arithmetic over gram strings. */
  private def posGramHashes(df: DataFrame, k: Int,
      regrain: Boolean = true): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    // re-grain doc rows by the window's partition key BEFORE the token
    // explode (r17): the lead-window's exchange moves 5k doc rows
    // instead of the exploded token stream, and a 1-split scan no
    // longer serializes the explode+hash stage. Opt-out for WARM
    // per-query callers (contamination): the regrain's extra stage
    // round-trip only pays for itself on cold build-once paths.
    (if (regrain) graft.GraftSession.fanoutRegrain(df, col("doc_id"))
     else df)
      .select(col("doc_id"), posexplode(split(col("text"), " "))
        .as(Seq("pos", "t")))
      .select(col("doc_id"), col("pos"), xxhash64(col("t")).as("h"))
      .select(col("doc_id"), col("pos"),
        xxhash64((0 until k).map(j => lead(col("h"), j).over(w)): _*)
          .as("gh"),
        lead(col("h"), k - 1).over(w).as("tl"))
      .filter(col("tl").isNotNull) // docs shorter than k tokens drop out
      .select(col("doc_id"), col("pos"), col("gh"))
  }

  private def gramHashes(df: DataFrame, k: Int): DataFrame =
    // regrain off: the only caller (contamination) gram-ifies per
    // query execution, where the warm repeat cost dominates
    posGramHashes(df, k, regrain = false)
      .select(col("doc_id"), col("gh"))

  def contamination(s: SparkSession, d: String, k: Int = 8): DataFrame = {
    val docs = Tables.documents(s, d)
    // only the 1%-sized benchmark side is gram-ified before its filter
    // (never the whole corpus twice); the join key is a fixed-width
    // 64-bit gram hash, not a gram string
    val benchGrams = gramHashes(docs.filter(col("doc_id") % 97 === 0), k)
      .select(col("gh")).distinct()
    gramHashes(docs.filter(col("doc_id") % 97 =!= 0), k)
      // benchGrams is a fixed FRACTION of the corpus, not a fixed
      // size — the join strategy stays with stats/AQE (broadcast at
      // test scale, shuffle on fixed-width gh at 100 TB)
      .join(benchGrams, "gh")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gh")).as("n_shared_grams"))
  }

  /** Cross-document duplicated-substring signal (the exact substring
    * dedup statistic of Lee et al. 2022, "Deduplicating Training Data
    * Makes Language Models Better"): for each document, how many of its
    * token k-gram positions carry a gram that also occurs in at least
    * one OTHER document, and what fraction of the document's tokens the
    * union of those duplicated spans covers — the per-doc number a
    * substring-dedup pass thresholds on.
    *
    * Scale shape: one gram-hash scan (the codegen'd lead-window combine
    * above — 64-bit keys, no gram strings), one aggregation to find
    * cross-doc grams, one SHUFFLE equi-join back (the duplicated-gram
    * set grows with the corpus, so it is deliberately not broadcast),
    * then a bounded k-fold explode for span-union coverage. No
    * self-join of the corpus at any point. */
  /** Memoized duplicated-gram positions (doc_id, pos): the gram-hash
    * window, the cross-doc frequency aggregation, and the join back are
    * all build-once work shared by [[dupSpans]] and [[dedupSubstrings]]
    * (statistic and transform over the SAME table) — without the memo
    * each DataFrame reuse re-runs the most expensive stage, the
    * per-doc gram window, because Catalyst does not share subplans
    * across branches. Same ownership rules as the banded indexes:
    * one persisted copy per (app, input plan, k), FIFO-bounded,
    * released by [[Dedup.clearLshCache]]. */
  private def dupGramPositions(s: SparkSession, d: String,
      k: Int): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    IndexMemo.getOrBuild[DataFrame]("dupGramPos", k.toString, Seq(docs)) {
      val grams = posGramHashes(docs, k)
      val dup = grams.groupBy(col("gh"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2).select(col("gh"))
      val dp = grams.join(dup, "gh")
        .select(col("doc_id"), col("pos")).persist()
      (dp, Seq(dp))
    }
  }

  def dupSpans(s: SparkSession, d: String, k: Int = 8): DataFrame = {
    val dp = dupGramPositions(s, d, k)
    // one pass: gram positions are unique per doc, so the gram count is
    // a distinct-count too, and both distincts share one aggregation
    val agg = dp.select(col("doc_id"), col("pos"),
        explode(sequence(col("pos"), col("pos") + lit(k - 1))).as("cp"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("pos")).as("n_dup_grams"),
        countDistinct(col("cp")).as("n_cov_tokens"))
    val ntok = Tables.documents(s, d).select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    agg.join(ntok, "doc_id")
      .select(col("doc_id"), col("n_dup_grams"), col("n_cov_tokens"),
        round(col("n_cov_tokens") / col("n_tokens"), 6).as("dup_frac"))
      .orderBy(col("doc_id"))
  }

  /** The REMOVAL transform [[dupSpans]] is the statistic for: rewrite
    * each document with every token covered by a cross-document
    * duplicated k-gram span dropped (Lee et al.'s ExactSubstr dedup,
    * reshaped to token spans). Documents that lose nothing pass through
    * unchanged; a fully-duplicated document survives as an empty string
    * rather than vanishing, so downstream row counts are stable.
    *
    * Same scale shape as the statistic — gram-hash scan, one agg, one
    * shuffle join back, bounded k-fold explode — plus one
    * reassembly aggregation whose concat is ordered by token position
    * (sort_array over (pos, token) structs), so the rebuilt text is
    * deterministic and the DuckDB mirror (string_agg ORDER BY pos)
    * matches byte-for-byte. */
  def dedupSubstrings(s: SparkSession, d: String, k: Int = 8): DataFrame = {
    val docs = Tables.documents(s, d)
    val toks = docs
      .select(col("doc_id"), posexplode(split(col("text"), " "))
        .as(Seq("pos", "t")))
    val covered = dupGramPositions(s, d, k)
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(k - 1))).as("pos"))
      .distinct()
    val kept = toks.join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(concat_ws(" ",
        transform(sort_array(collect_list(struct(col("pos"), col("t")))),
          st => st.getField("t"))).as("clean_text"))
    docs.select(col("doc_id")).join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy(col("doc_id"))
  }

  /** Neyman allocation: split a sampling budget across strata
    * proportionally to N_h * S_h (stratum size x std dev of the target
    * variable) — the minimum-variance allocation for a stratified
    * estimate, and the statistically-principled way to mix corpus
    * strata. Integerized by largest-remainder (Hamilton) rounding so
    * allocations sum to the budget exactly.
    *
    * Exactly oracle-able because the float work is minimal BY
    * CONSTRUCTION: N_h * S_h simplifies to sqrt(N_h*Σx² - (Σx)²),
    * whose argument is exact BIGINT arithmetic and whose sqrt is
    * IEEE-correctly-rounded in both engines (unlike ln); the only
    * order-sensitive sum — total weight across strata — folds in lang
    * order (the q106 device). Scale shape: one map-side-combined
    * moment aggregation over the corpus; everything after runs on the
    * strata table (a handful of rows). */
  def neymanAllocation(s: SparkSession, d: String,
      budget: Int = 1000): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("lang"), col("n_chars").cast("long").as("x"))
    // quadratic terms in DECIMAL(38,0) (HUGEINT in the oracle): with
    // x ~ doc chars and web-scale strata, sx² crosses BIGINT max early
    // (same exact-128-bit move as hourlyAnomalies)
    val dec = "decimal(38,0)"
    val strata = docs.groupBy(col("lang")).agg(
        count(lit(1)).as("n_h"),
        sum(col("x")).as("sx"),
        sum(col("x").cast(dec) * col("x")).as("sx2"))
      .withColumn("w", sqrt(
        (col("sx2") * col("n_h") - col("sx").cast(dec) * col("sx"))
          .cast("double")))
    val tot = strata.agg(
      aggregate(
        transform(sort_array(collect_list(struct(col("lang"), col("w")))),
          st => st.getField("w")),
        lit(0.0), (a, x) => a + x).as("sw"))
    val based = strata.crossJoin(broadcast(tot))
      .withColumn("share", lit(budget.toDouble) * col("w") / col("sw"))
      .withColumn("base", floor(col("share")))
      .withColumn("rem", col("share") - col("base"))
    val baseSum = based.agg(sum(col("base")).as("bs"))
    based.crossJoin(broadcast(baseSum))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rem").desc, col("lang"))))
      .select(col("lang"), col("n_h"), round(col("w"), 6).as("weight"),
        (col("base") + when(col("rk") <= lit(budget.toLong) - col("bs"),
          lit(1L)).otherwise(lit(0L))).as("alloc"))
      .orderBy(col("lang"))
  }

  /** UniMax budget allocation (water-filling): split a character budget
    * across language strata so every language gets an equal share,
    * except that no language is sampled past `epochCap` epochs of its
    * data — the published remedy for proportional sampling starving
    * low-resource languages and uniform sampling over-epoching them.
    *
    * The sequential "give the smallest language its cap, re-split the
    * remainder" loop has a closed form over capacity-sorted strata:
    * a stratum is saturated iff its cap times the number of strata at
    * or after it (in ascending cap order) fits the budget left after
    * all earlier caps; the unsaturated strata split the post-cap
    * remainder equally. Saturation is prefix-monotone in that order,
    * so a running-min flag over a window computes the breakpoint —
    * every comparison is exact BIGINT; the only float ops are the two
    * final divisions (level, epochs), identical single IEEE ops in
    * both engines. Scale shape: one map-side-combined sum per
    * language, then windows over the strata table (a handful of
    * rows). */
  def unimaxAllocation(s: SparkSession, d: String,
      budget: Long = 250000L, epochCap: Int = 2): DataFrame = {
    val caps = Tables.documents(s, d)
      .groupBy(col("lang"))
      .agg(sum(col("n_chars")).as("sz"))
      .withColumn("cap", col("sz") * epochCap)
    val w = Window.orderBy(col("cap"), col("lang"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val m = caps.agg(count(lit(1)).as("m"))
    val flagged = caps.crossJoin(broadcast(m))
      .withColumn("rk", row_number().over(w))
      .withColumn("prefix", sum(col("cap")).over(run))
      .withColumn("satflag",
        when(col("cap") * (col("m") - col("rk") + 1) <=
          lit(budget) - (col("prefix") - col("cap")), 1L).otherwise(0L))
      .withColumn("sat", min(col("satflag")).over(run))
    val agg = flagged.agg(sum(col("sat")).as("t"),
      sum(col("sat") * col("cap")).as("capsum"))
    val level = (lit(budget) - col("capsum")).cast("double") /
      (col("m") - col("t")).cast("double")
    flagged.crossJoin(broadcast(agg))
      .select(col("lang"), col("sz"), col("cap"),
        col("sat").as("saturated"),
        round(when(col("sat") === 1L, col("cap").cast("double"))
          .otherwise(level), 6).as("alloc"),
        round(when(col("sat") === 1L, col("cap").cast("double"))
          .otherwise(level) / col("sz").cast("double"), 6).as("epochs"))
      .orderBy(col("lang"))
  }

  /** DSIR-style importance weights: score every document by how much
    * its hashed-bigram profile looks like a target slice versus the
    * raw corpus (Data Selection via Importance Resampling). Bigrams
    * hash into `buckets` cells via the oracle-mirrorable md5 nibble
    * device ([[Sketches.md5BucketCol]]); the target (here lang='en')
    * and raw corpora each induce an add-1-smoothed bucket unigram
    * model; a document's log-weight is the sum over its bigrams of
    * ln(p_target/p_raw) for the bigram's bucket.
    *
    * Oracle-able because the bucket models are exact BIGINT counts,
    * each bucket's log-ratio is a single ln of a single division, and
    * the per-document sum folds in position order (the q106 device) —
    * round-6 absorbs ln ulp differences between engines. Scale shape:
    * the bucket tables are `buckets` rows → broadcast; the gram stream
    * is already hash-partitioned by doc_id from the lead window, so
    * the per-document fold reuses that exchange. */
  def dsirWeights(s: SparkSession, d: String,
      buckets: Int = 256): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("text"))
    // the hashed gram stream feeds BOTH the model aggregation and the
    // scoring fold; memoize one persisted copy (same discipline as
    // dupGramPositions) so the md5-per-bigram window runs once, not
    // twice, per corpus
    val grams = IndexMemo.getOrBuild[DataFrame]("dsirGrams",
      buckets.toString, Seq(docs)) {
      val g = docs
        .select(col("doc_id"), col("lang"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "t")))
        .select(col("doc_id"), col("lang"), col("pos"),
          concat_ws(" ", col("t"), lead(col("t"), 1).over(w)).as("g"),
          lead(col("t"), 1).over(w).as("nx"))
        .filter(col("nx").isNotNull)
        .select(col("doc_id"), col("lang"), col("pos"),
          Sketches.md5BucketCol(0, col("g"), buckets).as("b"))
        .persist()
      (g, Seq(g))
    }
    // both bucket models in ONE corpus aggregation (conditional count),
    // totals from the buckets-row table — one model-building pass, not
    // four, over a 100 TB gram stream
    val cnt = grams.groupBy(col("b")).agg(
      count(lit(1)).as("cq"),
      count(when(col("lang") === "en", 1)).as("ct"))
    val tots = cnt.agg(sum(col("cq")).as("qt"), sum(col("ct")).as("tt"))
    val ratio = cnt.crossJoin(broadcast(tots))
      .select(col("b"),
        (log((col("ct") + 1).cast("double") /
            (col("tt") + buckets).cast("double")) -
          log((col("cq") + 1).cast("double") /
            (col("qt") + buckets).cast("double"))).as("lrv"))
    grams.join(broadcast(ratio), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        round(aggregate(
          transform(
            sort_array(collect_list(struct(col("pos"), col("lrv")))),
            st => st.getField("lrv")),
          lit(0.0), (acc, x) => acc + x), 6).as("logw"))
      .orderBy(col("doc_id"))
  }

  /** CCNet-style perplexity bucketing: label every document
    * head/middle/tail by its LM score ([[TextOps.bigramNll]]), with
    * the two cutoffs computed from a deterministic md5 sample — the
    * shape CCNet itself uses (cutoffs from a sampled histogram), and
    * the shape that scales: bucket assignment is a broadcast-compare
    * map-side `when`, never a global sort of the corpus. The sample
    * is `hashKeep(doc_id, "3f")` (~25%); cutoffs are the sampled
    * scores at ranks ceil(m/3) and ceil(2m/3) in (score, doc_id)
    * order — the q108 rank device, so both engines pick the same two
    * constants (scores are already round-6). Returns per
    * (lang, bucket) counts with round-6 score min/max.
    *
    * The rank lookup is [[sampledTercileCuts]] — the q64 value-
    * histogram rank device: the value at a given rank depends only on
    * the value MULTISET (ties are interchangeable), so the cutoffs
    * come from the sampled score HISTOGRAM, never from ranking sample
    * ROWS. Per-task rows are bounded by distinct round-6 scores per
    * 1/64-wide subsplit (<= 15,626, a constant of the encoding) at
    * ANY score distribution — including the degenerate near-constant
    * corpus that re-concentrated the r14 row-rank form's owning
    * subsplit into one task (r14 verdict). Rank arithmetic and
    * tie-break semantics are unchanged, so the oracle hash cannot
    * move. */
  def perplexityBuckets(s: SparkSession, d: String): DataFrame = {
    // the LM score table feeds both the cutoff branch and the labeling
    // branch; bigramNll memoizes one persisted copy internally (keyed
    // on the pre-cut token plan — see its doc for why keying on the
    // returned plan can never hit), so both reads here are cache scans
    val nll = graft.ops.TextOps.bigramNll(s, d)
    val cuts = sampledTercileCuts(
      nll.filter(hashKeep(col("doc_id"), lit("3f")))
        .select(col("mean_nll")))
    nll
      .join(Tables.documents(s, d).select(col("doc_id"), col("lang")),
        Seq("doc_id"))
      .crossJoin(broadcast(cuts))
      .withColumn("bucket",
        when(col("mean_nll") <= col("c1"), "head")
          .when(col("mean_nll") <= col("c2"), "middle")
          .otherwise("tail"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("mean_nll")).as("min_nll"),
        max(col("mean_nll")).as("max_nll"))
      .orderBy(col("lang"), col("bucket"))
  }

  /** Tercile cutoffs (the scores at ranks ceil(m/3) and ceil(2m/3) of
    * the ascending sample) via the value-histogram rank device: the
    * value at rank r is the smallest v whose cumulative histogram
    * count reaches r — no row ever gets an individual rank, so the
    * tie-break key is unnecessary and a degenerate (constant-score)
    * sample is a ONE-ROW histogram instead of a one-task sort.
    *
    * Two-level, like the r14 device it replaces: histogram rows split
    * by `floor(mean_nll * 64)` (a prefix of the value order — the
    * decomposition is exact); the tiny per-subsplit count table
    * yields each subsplit's exclusive offset and identifies WHICH 1-2
    * subsplits own the target ranks; only those subsplits' histogram
    * rows (<= 15,626 each for round-6 scores) cumulate. Non-owning
    * subsplit rows that pass the `cum >= r` predicate carry strictly
    * larger values than the owning row, so the `min` is untouched.
    * Returns one row (c1, c2); both NULL on an empty sample (the
    * labeling branch then sends every doc to "tail", as before). */
  private[graft] def sampledTercileCuts(sample: DataFrame): DataFrame = {
    val hist = sample.groupBy(col("mean_nll")).agg(count(lit(1)).as("c"))
      .withColumn("sub", floor(col("mean_nll") * lit(64.0)).cast("long"))
    val wOff = Window.orderBy(col("sub"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(col("sub"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // (sub, off, r1, r2): global-rank offsets over the tiny count
    // table; then keep only the subsplit(s) owning the target ranks
    val targets = hist.groupBy(col("sub"))
      .agg(sum(col("c")).as("sub_n"))
      .select(col("sub"), col("sub_n"),
        coalesce(sum(col("sub_n")).over(wOff), lit(0L)).as("off"),
        sum(col("sub_n")).over(wAll).as("m"))
      .select(col("sub"), col("off"),
        ceil(col("m") / lit(3.0)).as("r1"),
        ceil(col("m") * 2 / lit(3.0)).as("r2"), col("sub_n"))
      .filter(
        (col("r1") > col("off") && col("r1") <= col("off") + col("sub_n")) ||
        (col("r2") > col("off") && col("r2") <= col("off") + col("sub_n")))
      .select(col("sub"), col("off"), col("r1"), col("r2"))
    val wCum = Window.partitionBy(col("sub")).orderBy(col("mean_nll"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .join(broadcast(targets), "sub")
      .withColumn("cum", col("off") + sum(col("c")).over(wCum))
      .agg(
        min(when(col("cum") >= col("r1"), col("mean_nll"))).as("c1"),
        min(when(col("cum") >= col("r2"), col("mean_nll"))).as("c2"))
  }

  /** Cross-source vocabulary overlap: pairwise Jaccard similarity of
    * the sources' distinct-term sets — the diagnostic a corpus mixer
    * reads to spot near-identical domains (mirror sites, syndicated
    * feeds) before weighting them as independent. The self-join is on
    * the TERM key, so cost is one (source, term) distinct shuffle plus
    * per-term source pairing — bounded by vocabulary x sources², never
    * documents²; the number of sources in a corpus mix is O(100) by
    * construction, so the pair fan-out per term is small and the
    * output matrix tiny. */
  def sourceOverlap(s: SparkSession, d: String): DataFrame = {
    val st = Tables.documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .distinct()
    val sizes = st.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val shared = st.as("a").join(st.as("b"),
        col("a.term") === col("b.term") &&
          col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col("source").as("s1"), col("n").as("n1")), "s1")
      .join(sizes.select(col("source").as("s2"), col("n").as("n2")), "s2")
      .select(col("s1"), col("s2"), col("shared"),
        round(col("shared").cast("double") /
          (col("n1") + col("n2") - col("shared")).cast("double"), 6)
          .as("jaccard"))
      .orderBy(col("s1"), col("s2"))
  }

  /** Per-document most-salient term by tf-idf. One exploded-token
    * aggregation for tf, one term aggregation for df, a shuffled
    * equi-join on `term` to score (raw web vocabulary — typos, URLs,
    * numbers — grows into the billions, so df is NOT broadcast; AQE
    * still broadcasts it when it actually fits), and a 1-row broadcast
    * for the corpus doc count. */
  def tfidfTopTerm(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val tf = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("term").as("top_term"),
        round(col("score"), 6).as("tfidf"))
  }

  /** Oracle-checkable MinHash: 8 signature components, each the
    * lexicographic min of md5(seed || '|' || token-3-gram) — the same
    * min-over-hashed-shingles structure as [[Dedup.signatureIndex]]
    * but with a hash DuckDB mirrors exactly. Flat string columns so
    * the verification dump stays hashable. */
  /** Word-trigram gram table (doc_id, g): gram strings assemble
    * through a lead-window over exploded tokens (codegen'd) instead of
    * interpreted array slicing; identical strings to strictTokenGrams
    * for docs of >= 3 tokens. */
  private[graft] def tokenTrigramGrams(s: SparkSession,
      d: String): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    // re-grain doc rows by the window's own partition key BEFORE the
    // token explode: the lead-window then finds its required
    // partitioning satisfied (no gram-level exchange), and the explode
    // runs cluster-wide even off a 1-split scan
    graft.GraftSession.fanoutRegrain(Tables.documents(s, d),
      col("doc_id"))
      .select(col("doc_id"), posexplode(split(col("text"), " "))
        .as(Seq("pos", "t")))
      .select(col("doc_id"),
        concat_ws(" ", col("t"), lead(col("t"), 1).over(w),
          lead(col("t"), 2).over(w)).as("g"),
        lead(col("t"), 2).over(w).as("tl"))
      .filter(col("tl").isNotNull)
      .select(col("doc_id"), col("g"))
  }

  /** Character k-gram table (doc_id, g): 1-based positions so the
    * DuckDB mirror (`substr(text, i, k)` over `range(1, len-k+2)`) is
    * literally the same arithmetic; both engines count CHARACTERS, so
    * Danish text grams identically. Docs shorter than k characters
    * contribute nothing on either engine. */
  private[graft] def charGrams(s: SparkSession, d: String,
      k: Int): DataFrame =
    // re-grain the COMPACT doc rows before the ~n_chars-per-doc
    // explode: a 1-split scan would otherwise run the whole gram
    // fan-out (and the md5 folds fused behind it) on one core
    graft.GraftSession.fanoutRegrain(
      Tables.documents(s, d).filter(length(col("text")) >= k),
      col("doc_id"))
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("text")) - (k - 1))).as("i"),
        col("text"))
      .select(col("doc_id"), col("text").substr(col("i"), lit(k)).as("g"))

  def minhashMd5(s: SparkSession, d: String, numHashes: Int = 8): DataFrame = {
    val grams = tokenTrigramGrams(s, d)
    val sigs = (0 until numHashes).map(j =>
      min(md5(concat(lit(s"$j|"), col("g")))).as(s"sig_$j"))
    grams.groupBy(col("doc_id")).agg(sigs.head, sigs.tail: _*)
  }

  /** Banded-LSH candidate pairs over the md5 MinHash signatures — the
    * SAME banded self-join shape as [[Dedup.lshNearDupPairsFromHashes]]
    * (signature -> per-band bucket key -> equi-join on (band, key)),
    * but built entirely from md5 so a DuckDB oracle reproduces every
    * bucket key bit-for-bit. Output: candidate pair + how many of the
    * `numHashes / rowsPerBand` bands matched. The signature index is
    * memoized per (context, corpus, numHashes) — cache-read on repeat
    * calls, released by [[Dedup.clearLshCache]] — and the
    * join moves only (doc_id, band, key): fixed-width rows, shuffle
    * volume independent of document size. */
  def bandedMd5Pairs(s: SparkSession, d: String, numHashes: Int = 8,
      rowsPerBand: Int = 2, maxBucketSize: Int = 1000): DataFrame = {
    val raw = minhashMd5(s, d, numHashes)
    val bands = numHashes / rowsPerBand
    // Memoized CAPPED banded key table: the signatures, the band keys,
    // and the degenerate-bucket cap ([[Dedup.lshNearDupPairsFromHashes]]'s
    // guard — a bucket of B members is B^2/2 candidate pairs) are all
    // build-once work; per-call cost is just the equi-join over the
    // cached fixed-width keys. The cap is mirrored in the DuckDB
    // oracle, so the guard itself is hash-checked; no sf0.01 bucket
    // approaches it, so the oracle result is the uncapped one.
    val banded = IndexMemo.getOrBuild[DataFrame]("md5BandIdx",
      s"$numHashes,$rowsPerBand,$maxBucketSize", Seq(raw)) {
      val idx = raw.select(col("doc_id"),
        posexplode(array((0 until bands).map { b =>
          md5(concat_ws("|",
            lit(b.toString) +:
              (0 until rowsPerBand).map(r => col(s"sig_${b * rowsPerBand + r}")): _*))
        }: _*)).as(Seq("band", "bkey")))
        .withColumn("bsz", count(lit(1)).over(
          Window.partitionBy(col("band"), col("bkey"))))
        .filter(col("bsz") <= maxBucketSize)
        .select(col("doc_id"), col("band"), col("bkey"))
        .persist()
      (idx, Seq(idx))
    }
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_bands"))
  }

  /** Largest prime below 2^60: the modulus of the 2-universal MinHash
    * permutation family below. */
  private[graft] val MinHashP = 1152921504606846883L

  /** Banded-MinHash candidates VERIFIED by exact Jaccard over the gram
    * sets — the full near-dup pipeline shape of the xxhash64 operators
    * (Dedup.minHashNearDupPairs / lshNearDupPairsFromHashes: signature
    * -> banded equi-join -> exact set verification -> threshold), in
    * oracle-expressible md5 arithmetic end to end. q38 runs it over
    * word trigrams, q39 over character 5-grams; both hash-match DuckDB.
    *
    * ONE md5 per gram, not one per hash function: the gram's md5
    * yields two independent 60-bit values (hex nibbles 1-15 and
    * 16-30), and signature j takes min over (h1 + j*h2) mod P — the
    * classic 2-universal permutation family, plain BIGINT arithmetic
    * both engines share (the sum is bounded by 8*2^60 < 2^63, so it
    * never overflows). Measured 30x cheaper than hashing each gram
    * numHashes+1 times on the 32M-gram char corpus at sf0.1.
    *
    * Scale shape, mirroring the xxhash64 path: the banded join ships
    * (doc_id, band, bkey) only, degenerate buckets are capped (windowed
    * bsz guard, mirrored in the oracle), and the verify joins the
    * CANDIDATE list back onto per-doc BOUNDED key sketches (~#docs
    * rows, array payload <= `kmvBuckets` regardless of document
    * length; intersection via codegen'd array_intersect) instead of
    * re-scanning the #grams-rows key table per call. The banded table
    * + per-doc sketches are built once and memoized per (context,
    * corpus, params) via [[IndexMemo]] (released by
    * [[Dedup.clearLshCache]]). The oracle computes the same
    * intersection with an equivalent join-based count.
    *
    * The verify sketch (r17, VERDICT r16 task 1): each doc keeps the
    * MINIMUM h1 per bucket `h1 % kmvBuckets` — a one-permutation-
    * hashing sketch — instead of its full gram-key set, and the
    * reported jaccard is `|matching bucket minima| / |occupied buckets
    * of the pair's union|`. Per occupied union bucket, the union's
    * minimum is a uniform draw from the union's restriction, and it
    * matches iff that draw lies in the intersection — so the per-pair
    * estimate is unbiased for exact Jaccard, and for pairs whose union
    * has no intra-bucket collision (docs small vs `kmvBuckets`) it IS
    * exact Jaccard. Two build consequences, both measured: per-doc
    * state is capped at `kmvBuckets` values however long the document
    * (the 100 TB bound — the former collect_set held #distinct-grams
    * values), and the #grams-row fold now runs entirely in codegen'd
    * primitive min-aggregation with map-side combine (level 1 below);
    * only the tiny <= kmvBuckets-rows-per-doc level-2 fold pays
    * object-mode aggregation. The old form's 32M-row object fold was
    * the build's dominant cost (VARIANCE_r16 A/B). */
  private[graft] def verifiedMd5NearDups(grams: DataFrame, seed: String,
      numHashes: Int, rowsPerBand: Int, threshold: Double,
      maxBucketSize: Int, kmvBuckets: Int = 128): DataFrame = {
    // both engines drop a candidate pair with ZERO shared buckets (the
    // oracle via its inner bucket-join, this side via the filter), so
    // the threshold must exclude estimate 0
    require(threshold > 0.0, "threshold must be positive")
    val bands = numHashes / rowsPerBand
    val (cand, gset, nCand) = IndexMemo.getOrBuild[
        (DataFrame, DataFrame, java.lang.Long)]("verifiedMd5Idx",
      s"$seed,$numHashes,$rowsPerBand,$maxBucketSize,$kmvBuckets",
      Seq(grams)) {
      // one codegen'd base-16 parse of the 15-hex-char window —
      // value-identical to the oracle's per-nibble decode (60 bits
      // fits a BIGINT), and ~15x fewer expressions than the former
      // substring/ascii chain on the build's hottest path
      def nibs(from: Int): Column =
        conv(substring(col("hh"), from, 15), 16, 10).cast("long")
      val hashed = grams
        .select(col("doc_id"), md5(concat(lit(seed), col("g"))).as("hh"))
        .select(col("doc_id"), nibs(1).as("h1"), nibs(16).as("h2"))
      // ONE scan for BOTH artifacts (r16), in TWO aggregation levels
      // (r17): level 1 groups by (doc_id, h1 % kmvBuckets) and takes
      // pure mins — the per-bucket partial of every signature (min is
      // associative, so min-of-bucket-mins == the global min) plus the
      // bucket's minimum h1, all codegen'd primitive aggregation with
      // map-side combine over the #grams rows. Level 2 folds only the
      // <= kmvBuckets bucket rows per doc: the mins finalize the
      // signatures and collect_set gathers the bounded OPH sketch.
      // The former single-level form ran the whole #grams-row fold
      // inside object-mode aggregation (collect_set disables codegen
      // and trips the 128-key sort-based fallback), which the r16 A/B
      // measured as the build's dominant cost.
      val psigs = (0 until numHashes).map(j =>
        min((col("h1") + lit(j.toLong) * col("h2")) % MinHashP)
          .as(s"ps_$j"))
      val lvl1 = hashed
        .groupBy(col("doc_id"),
          (col("h1") % lit(kmvBuckets.toLong)).as("bkt"))
        .agg(psigs.head, (psigs.tail :+ min(col("h1")).as("mh")): _*)
      val sigs = (0 until numHashes).map(j =>
        min(col(s"ps_$j")).as(s"sig_$j"))
      val combined = lvl1.groupBy(col("doc_id"))
        .agg(sigs.head,
          (sigs.tail :+ collect_set(col("mh")).as("hs")): _*)
        .persist()
      val bandedIdx = combined.select(col("doc_id"),
        posexplode(array((0 until bands).map { b =>
          md5(concat_ws("|",
            lit(b.toString) +:
              (0 until rowsPerBand).map(r =>
                col(s"sig_${b * rowsPerBand + r}").cast("string")): _*))
        }: _*)).as(Seq("band", "bkey")))
        .withColumn("bsz", count(lit(1)).over(
          Window.partitionBy(col("band"), col("bkey"))))
        .filter(col("bsz") <= maxBucketSize)
        .select(col("doc_id"), col("band"), col("bkey"))
        .persist()
      // the deduplicated candidate list is the build-once/probe-many
      // artifact (bounded by the bucket cap); materialize it, measure
      // it, and drop the banded intermediates — exactly the
      // Dedup.buildLshPairIndex lifecycle
      val p = bandedIdx.as("a")
        .join(bandedIdx.as("b"),
          col("a.band") === col("b.band") &&
            col("a.bkey") === col("b.bkey") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .distinct()
        .persist()
      val n = p.count()
      bandedIdx.unpersist()
      // per-DOC key sets (corpus-cardinality rows with a bounded array
      // payload), not an exploded key table: the verify step joins the
      // small candidate list back to ~#docs rows, never re-scanning
      // #grams rows per call — the same sets-join-back-onto-candidates
      // shape as the xxhash64 path (Dedup.lshNearDupPairsFromHashes)
      val gs = combined.select(col("doc_id"), col("hs"),
        size(col("hs")).cast("long").as("n"))
      ((p, gs, java.lang.Long.valueOf(n)), Seq(p, combined))
    }
    // broadcast the candidate list when its MEASURED size allows, so
    // the verify joins never shuffle the per-doc set table (its array
    // payload is the one wide column in this pipeline)
    val candSide =
      if (nCand.longValue() <= 5000000L) broadcast(cand) else cand
    // matches: bucket minima that agree (value equality implies the
    // same bucket); occupied union buckets: na + nb - shared buckets.
    // A sketch value's bucket is recoverable as value % kmvBuckets, so
    // no second array is pinned.
    val ni = size(array_intersect(col("ha"), col("hb"))).cast("long")
    def bkts(a: Column): Column =
      transform(a, x => x % lit(kmvBuckets.toLong))
    val nsb = size(array_intersect(bkts(col("ha")), bkts(col("hb"))))
      .cast("long")
    val jac = col("ni").cast("double") /
      (col("na") + col("nb") - col("nsb")).cast("double")
    candSide
      .join(gset.select(col("doc_id").as("id_a"), col("hs").as("ha"),
        col("n").as("na")), "id_a")
      .join(gset.select(col("doc_id").as("id_b"), col("hs").as("hb"),
        col("n").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"), ni.as("ni"), nsb.as("nsb"),
        col("na"), col("nb"))
      .filter(jac >= threshold)
      .select(col("id_a"), col("id_b"), round(jac, 6).as("jaccard_est"))
  }

  /** q38: MinHash near-dup pairs over word trigrams, verified by the
    * bounded OPH sketch estimate at 0.5 (exact Jaccard for pairs with
    * no intra-bucket collision; unbiased estimate beyond) — the md5
    * re-declaration of the xxhash64 pipeline (which remains API +
    * ScalaTest-covered in Dedup). */
  def minhashVerifiedPairs(s: SparkSession, d: String): DataFrame =
    verifiedMd5NearDups(tokenTrigramGrams(s, d), "mh|",
      numHashes = 8, rowsPerBand = 2, threshold = 0.5,
      maxBucketSize = 1000)

  /** q39: character-5-gram Jaccard near-dup pairs, banded + verified
    * by the bounded OPH sketch estimate at 0.7 — the md5
    * re-declaration of the char-shingle pipeline. */
  def charJaccardVerifiedPairs(s: SparkSession, d: String): DataFrame =
    verifiedMd5NearDups(charGrams(s, d, 5), "cg|",
      numHashes = 8, rowsPerBand = 2, threshold = 0.7,
      maxBucketSize = 1000)

  /** Shared DuckDB oracle body for [[verifiedMd5NearDups]]: takes a
    * CTE named `grams(doc_id, g)` and mirrors the single-md5 2-universal
    * signatures, band keys, bucket cap, the bounded OPH verify sketch
    * (min h1 per `h1 % kmvBuckets` bucket), and the estimate's
    * threshold. */
  private def verifiedMd5PairsSql(gramsCte: String, seed: String,
      numHashes: Int, rowsPerBand: Int, threshold: Double,
      maxBucketSize: Int, kmvBuckets: Int = 128): String = {
    val bands = numHashes / rowsPerBand
    def nibs(from: Int): String = (0 until 15).map { i =>
      val nib = s"substr(hh, ${from + i}, 1)"
      s"CAST(ascii($nib) - CASE WHEN $nib <= '9' THEN 48 ELSE 87 END" +
        s" AS BIGINT) * ${1L << (4 * (14 - i))}"
    }.mkString(" + ")
    val sigCols = (0 until numHashes).map(j =>
      s"min((h1 + $j * h2) % $MinHashP) AS sig_$j")
      .mkString(",\n         ")
    val bandRows = (0 until bands).map { b =>
      val key = (0 until rowsPerBand)
        .map(r => s"CAST(sig_${b * rowsPerBand + r} AS VARCHAR)")
        .mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, md5('$b' || '|' || $key) AS bkey FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH $gramsCte,
       |hashed AS (
       |  SELECT doc_id, (${nibs(1)}) AS h1, (${nibs(16)}) AS h2
       |  FROM (SELECT doc_id, md5('$seed' || g) AS hh FROM grams)),
       |sig AS (SELECT doc_id,
       |         $sigCols
       |        FROM hashed GROUP BY doc_id),
       |banded0 AS (
       |  $bandRows),
       |banded AS (
       |  SELECT doc_id, band, bkey FROM (
       |    SELECT doc_id, band, bkey,
       |      COUNT(*) OVER (PARTITION BY band, bkey) AS bsz
       |    FROM banded0) s
       |  WHERE bsz <= $maxBucketSize),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bkey = b.bkey
       |    AND a.doc_id < b.doc_id),
       |gset AS (SELECT doc_id, min(h1) AS h FROM hashed
       |         GROUP BY doc_id, h1 % $kmvBuckets),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM gset GROUP BY 1),
       |inter AS (
       |  SELECT c.id_a, c.id_b,
       |    CAST(SUM(CASE WHEN ga.h = gb.h THEN 1 ELSE 0 END)
       |      AS BIGINT) AS ni,
       |    CAST(COUNT(*) AS BIGINT) AS nsb
       |  FROM cand c
       |  JOIN gset ga ON ga.doc_id = c.id_a
       |  JOIN gset gb ON gb.doc_id = c.id_b
       |    AND gb.h % $kmvBuckets = ga.h % $kmvBuckets
       |  GROUP BY 1, 2)
       |SELECT i.id_a, i.id_b,
       |  round(CAST(i.ni AS DOUBLE)
       |    / CAST(sa.n + sb.n - i.nsb AS DOUBLE), 6) AS jaccard_est
       |FROM inter i
       |JOIN sizes sa ON sa.doc_id = i.id_a
       |JOIN sizes sb ON sb.doc_id = i.id_b
       |WHERE CAST(i.ni AS DOUBLE) / CAST(sa.n + sb.n - i.nsb AS DOUBLE)
       |  >= $threshold
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** DuckDB oracle for [[minhashVerifiedPairs]] (word trigrams via the
    * q138-style position self-join). */
  def minhashVerifiedPairsSql: String =
    verifiedMd5PairsSql(
      """tok AS (SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS t,
        |    unnest(range(0, len(string_split(text, ' ')))) AS p
        |  FROM documents),
        |grams AS (SELECT t0.doc_id,
        |            t0.t || ' ' || t1.t || ' ' || t2.t AS g
        |          FROM tok t0
        |          JOIN tok t1 ON t1.doc_id = t0.doc_id AND t1.p = t0.p + 1
        |          JOIN tok t2 ON t2.doc_id = t0.doc_id AND t2.p = t0.p + 2)"""
        .stripMargin,
      "mh|", numHashes = 8, rowsPerBand = 2, threshold = 0.5,
      maxBucketSize = 1000)

  /** DuckDB oracle for [[charJaccardVerifiedPairs]]. */
  def charJaccardVerifiedPairsSql: String =
    verifiedMd5PairsSql(
      """grams AS (SELECT doc_id,
        |    unnest(list_transform(range(1, len(text) - 3),
        |      i -> substr(text, i, 5))) AS g
        |  FROM documents WHERE len(text) >= 5)""".stripMargin,
      "cg|", numHashes = 8, rowsPerBand = 2, threshold = 0.7,
      maxBucketSize = 1000)

  /** DuckDB fragment decoding the first 8 hex chars of a column
    * named `h` into the same BIGINT [[md5Frac32]] computes — ONE
    * definition for every md5-draw oracle (this arithmetic existed in
    * five inline copies; a fix applied to four of them would silently
    * diverge the fifth engine's hashes). */
  private[graft] def md5NibbleSumSql: String =
    (1 to 8).map { i =>
      s"CAST(ascii(substr(h, $i, 1)) - CASE WHEN substr(h, $i, 1)" +
        s" <= '9' THEN 48 ELSE 87 END AS BIGINT) * ${1L << (4 * (8 - i))}"
    }.mkString(" + ")

  /** 32-bit uniform hash fraction from the first 8 hex nibbles of
    * md5(id), decoded with the same ascii arithmetic both engines
    * share — the deterministic "random" draw behind oracle-checkable
    * sampling at arbitrary (non-hex-boundary) rates. */
  private[graft] def md5Frac32(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long").cast("double") / 4294967296.0

  /** Temperature-based source mixing (the pre-training data-balancing
    * step): down-sample each source so expected kept counts are
    * proportional to n_s^alpha — rare sources keep everything, the
    * head of the source distribution shrinks. With alpha = 1/2 the
    * per-source keep rate is sqrt(min_n / n_s) (sqrt rather than pow
    * for bit-identical cross-engine arithmetic). Deterministic per
    * doc: the draw is a pure md5 hash of the id, so re-runs and
    * retried tasks keep exactly the same rows. One count aggregation,
    * one join back on source (AQE broadcasts while the source table
    * fits; web-scale domain tables shuffle), zero RNG state. The
    * default mixing key is the language column (visibly skewed in the
    * corpus); domains/sources mix identically by passing `byCol`. */
  def temperatureSample(s: SparkSession, d: String,
      byCol: String = "lang"): DataFrame = {
    val docs = Tables.documents(s, d)
    val counts = docs.groupBy(col(byCol))
      .agg(count(lit(1)).as("n_s"))
    val minN = counts.agg(min(col("n_s")).as("min_n"))
    val rated = counts.crossJoin(broadcast(minN))
      .withColumn("rate",
        sqrt(col("min_n").cast("double") / col("n_s").cast("double")))
    docs.select(col("doc_id"), col(byCol))
      .join(rated.select(col(byCol), col("rate")), byCol)
      .filter(md5Frac32(col("doc_id")) < col("rate"))
      .select(col("doc_id"), col(byCol))
  }

  /** Weighted sampling without replacement (Efraimidis–Spiraki A-ES
    * keys): each document draws a deterministic uniform u from
    * md5("ws|" || id) and gets priority ln(u) / w — the monotone
    * transform of the classic u^(1/w) key, so the k largest priorities
    * per stratum are EXACTLY a weighted sample without replacement with
    * inclusion probability proportional to w (here w = n_chars: longer
    * documents are proportionally likelier, the "sample by token mass"
    * step of a corpus mixer).
    *
    * Deterministic end to end — the draw is pure md5 arithmetic both
    * engines share, so the selected SET is oracle-checkable in DuckDB
    * and stable under re-runs and task retries. Scale shape: one scan
    * computes the priority (codegen'd hash + arithmetic, no RNG
    * state), one shuffle on the stratum key for the per-stratum top-k
    * window; the priority column never leaves the window (the output
    * is the selected rows only), so a last-ulp libm divergence between
    * JVM log and C ln could only flip a selection at a rank BOUNDARY —
    * probability ~2^-30 per stratum on 32-bit draws. */
  def weightedSample(s: SparkSession, d: String, k: Int = 5,
      byCol: String = "lang"): DataFrame = {
    val priority = log(md5Frac32(concat(lit("ws|"),
      col("doc_id").cast("string")))) /
      greatest(col("n_chars"), lit(1L)).cast("double")
    Tables.documents(s, d)
      .select(col("doc_id"), col(byCol), col("n_chars"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(byCol))
          .orderBy(priority.desc, col("doc_id"))))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col(byCol), col("n_chars"))
      .orderBy(col(byCol), col("doc_id"))
  }

  /** Per-source quota cap (the domain-cap step of a corpus mixer: no
    * single domain may contribute more than `cap` documents, however
    * large its crawl). Which documents survive is decided by a
    * deterministic md5 draw — not arrival order — so the kept set is
    * unbiased within the source, identical across re-runs/retries, and
    * exactly mirrorable in DuckDB (the order key is the md5 HEX STRING
    * itself: fixed-width lowercase hex compares identically in both
    * engines, no decode needed). One shuffle on the source key; the
    * rank column never leaves the window. */
  def domainCap(s: SparkSession, d: String, cap: Int = 50): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(
          md5(concat(lit("dc|"), col("doc_id").cast("string"))),
          col("doc_id"))))
      .filter(col("rn") <= cap)
      .select(col("doc_id"), col("source"))
      .orderBy(col("source"), col("doc_id"))

  /** End-to-end curation funnel, every stage exactly mirrorable: the
    * quality gate of [[TextOps.qualityScore]] (map-only projection, so
    * it prunes BEFORE any shuffle), then exact dedup keep-first on
    * sha256 (one shuffle, on the digest), then the md5 domain cap (one
    * shuffle, on the source). Composing the three turns three green
    * unit oracles (q36/q32/q99) into one hash-checked DAG — the check a
    * real pipeline needs, because stage composition is where silent
    * breakage hides (a filter reordered past a window changes the kept
    * set without failing any unit test).
    *
    * Stage order IS the 100 TB design: the cheap projection gate runs
    * at scan time and cuts shuffle input; dedup must precede the cap
    * (duplicates would otherwise eat a domain's quota); the cap's
    * window ranks only dedup survivors. */
  def pipelineFunnel(s: SparkSession, d: String, cap: Int = 10): DataFrame = {
    val gated = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
      .withColumn("quality", round(TextOps.qualityScore(col("text")), 6))
      .filter(col("quality") >= 0.5)
    val deduped = gated
      .withColumn("h", sha2(col("text"), 256))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("h")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
    deduped
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source")).orderBy(
          md5(concat(lit("pf|"), col("doc_id").cast("string"))),
          col("doc_id"))))
      .filter(col("rk") <= cap)
      .select(col("doc_id"), col("source"), col("lang"), col("quality"))
      .orderBy(col("doc_id"))
  }

  /** Funnel observability: one row of per-stage survivor counts for
    * [[pipelineFunnel]] — the numbers an operator watches to catch a
    * stage suddenly eating the corpus. Counts are collected as
    * `Observation` metrics on a SINGLE pass of the funnel DAG (the A2
    * pattern): one scan, the funnel's own two shuffles, zero extra
    * jobs — where four separate `agg`s would re-scan the corpus four
    * times at 100 TB. The capped count is the terminal action itself. */
  def funnelCounts(s: SparkSession, d: String, cap: Int = 10): DataFrame = {
    import org.apache.spark.sql.Observation
    val oTotal = Observation()
    val oQuality = Observation()
    val oUnique = Observation()
    val capped = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("text"))
      .observe(oTotal, count(lit(1)).as("n"))
      .withColumn("quality", round(TextOps.qualityScore(col("text")), 6))
      .filter(col("quality") >= 0.5)
      .observe(oQuality, count(lit(1)).as("n"))
      .withColumn("h", sha2(col("text"), 256))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("h")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
      .observe(oUnique, count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source")).orderBy(
          md5(concat(lit("pf|"), col("doc_id").cast("string"))),
          col("doc_id"))))
      .filter(col("rk") <= cap)
    val nCapped = capped.count()
    import s.implicits._
    Seq((oTotal.get("n").asInstanceOf[Long],
      oQuality.get("n").asInstanceOf[Long],
      oUnique.get("n").asInstanceOf[Long], nCapped))
      .toDF("n_total", "n_quality", "n_unique", "n_capped")
  }

  /** Oracle-checkable SimHash: a 60-bit sketch whose bits come from
    * the first 15 hex nibbles of md5(token) — the same per-bit
    * majority vote as [[Dedup.simHashDf]], with a hash both engines
    * share. Nibble value decodes arithmetically (ascii of the hex
    * char), so the whole sketch is plain integer arithmetic DuckDB
    * mirrors exactly; one explode + one aggregation, map-side
    * partials, zero UDFs. `seed` domain-separates the token hash
    * (md5(seed || token)) so several sketch families can coexist in
    * one pipeline without colliding — q40 runs the seeded variant,
    * q72 the bare one; both hash-match their oracles. */
  def simhashMd5(s: SparkSession, d: String, seed: String = ""): DataFrame = {
    // hash INSIDE the generator: explode(transform(..., md5)) makes h
    // a Generate output, so CollapseProject cannot inline the md5 into
    // all 60 vote aggregates (the expression-fanout trap)
    val toks = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(transform(split(col("text"), " "),
          t => md5(concat(lit(seed), t)))).as("h"))
    // vote_j = sum over tokens of +-1 on bit j; bit j lives in hex
    // nibble j/4 (1-indexed substr), position j%4
    val voteAggs = (0 until 60).map { j =>
      val nibble = ascii(substring(col("h"), 1 + j / 4, 1)) -
        when(substring(col("h"), 1 + j / 4, 1) <= "9", 48).otherwise(87)
      sum(when(shiftright(nibble, j % 4).bitwiseAND(1) === 1, 1L)
        .otherwise(-1L)).as(s"v$j")
    }
    val grouped = toks.groupBy(col("doc_id"))
      .agg(voteAggs.head, voteAggs.tail: _*)
    val packed = (0 until 60).map(j =>
      when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _) // disjoint bits: sum == OR
    grouped.select(col("doc_id"), packed.as("simhash60"))
  }

  /** Pigeonhole Hamming join over the oracle-checkable 60-bit md5
    * SimHash ([[simhashMd5]]): the exact join shape of
    * [[Dedup.simHashNearDups]] — explode each sketch into 4 x 15-bit
    * chunks, equi-join on (chunk, key), verify with an exact XOR
    * popcount — built entirely from md5 arithmetic so a DuckDB oracle
    * reproduces every chunk key and popcount bit-for-bit. Any pair
    * within Hamming <= 3 differs in at most 3 of the 4 chunks, so the
    * banded join finds exactly the all-pairs answer — which is what the
    * oracle checks (pigeonhole completeness as a hash-match, not just a
    * ScalaTest invariant). The sketch table is memoized per (context,
    * corpus) like the other sketch indexes and released by
    * [[Dedup.clearLshCache]]. */
  def simhashMd5Pairs(s: SparkSession, d: String,
      maxHamming: Int = 3, maxBucketSize: Int = 1000,
      seed: String = ""): DataFrame = {
    val raw = simhashMd5(s, d, seed)
    // Memoized CAPPED chunk table: sketching, chunk explosion, and the
    // degenerate-bucket cap (the same guard as
    // [[Dedup.simHashNearDups]]) happen once; per-call cost is the
    // equi-join over cached fixed-width keys plus the popcount filter.
    // Because the cap is plain windowed arithmetic, the DuckDB oracle
    // mirrors IT too, so the scale guard itself is hash-checked (at
    // sf0.01 no bucket approaches the cap; results are identical to
    // the uncapped join).
    val chunked = IndexMemo.getOrBuild[DataFrame]("simhash60Chunks",
      s"$maxBucketSize,$seed", Seq(raw)) {
      val idx = raw.select(col("doc_id"), col("simhash60"),
        posexplode(transform(sequence(lit(0), lit(3)),
          c => call_function("shiftright", col("simhash60"), c * 15)
            .bitwiseAND(0x7FFF)))
          .as(Seq("chunk", "ckey")))
        .withColumn("bsz", count(lit(1)).over(
          Window.partitionBy(col("chunk"), col("ckey"))))
        .filter(col("bsz") <= maxBucketSize)
        .select(col("doc_id"), col("simhash60"), col("chunk"), col("ckey"))
        .persist()
      (idx, Seq(idx))
    }
    val l = chunked.select(col("chunk"), col("ckey"),
      col("doc_id").as("id_a"), col("simhash60").as("sh_a"))
    val r = chunked.select(col("chunk"), col("ckey"),
      col("doc_id").as("id_b"), col("simhash60").as("sh_b"))
    l.join(r, Seq("chunk", "ckey"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming",
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** k-anonymity audit over the (nation, market-segment)
    * quasi-identifier: the single number k (the smallest group any
    * record hides in), the group census, and the re-identification
    * exposure — rows in groups smaller than `kMin`. The release gate
    * a curation pipeline runs before publishing joined metadata. One
    * map-side-combined groupBy (QI-cardinality rows, never the
    * table) plus a 1-row agg; all counts exact BIGINTs, the exposure
    * share one rounded division. */
  def kAnonymity(s: SparkSession, d: String, kMin: Int = 5): DataFrame = {
    val groups = Tables.customer(s, d)
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("gsz"))
    groups.agg(count(lit(1)).as("n_groups"),
        min(col("gsz")).as("k_anonymity"),
        sum(col("gsz")).as("n_rows"),
        coalesce(sum(when(col("gsz") < kMin, col("gsz"))), lit(0L))
          .as("rows_at_risk"))
      .select(col("n_groups"), col("k_anonymity"),
        col("rows_at_risk"),
        round(col("rows_at_risk").cast("double")
          / col("n_rows").cast("double"), 6).as("risk_share"))
  }

  /** DuckDB oracle for [[kAnonymity]]. */
  def kAnonymitySql(kMin: Int = 5): String =
    s"""WITH g AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS gsz
       |           FROM customer GROUP BY 1, 2)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       |  CAST(MIN(gsz) AS BIGINT) AS k_anonymity,
       |  CAST(COALESCE(SUM(CASE WHEN gsz < $kMin THEN gsz END), 0)
       |    AS BIGINT) AS rows_at_risk,
       |  round(CAST(COALESCE(SUM(CASE WHEN gsz < $kMin THEN gsz END), 0)
       |      AS DOUBLE) / CAST(SUM(gsz) AS DOUBLE), 6) AS risk_share
       |FROM g""".stripMargin

  /** l-diversity audit over the same quasi-identifier: within each
    * (nation, segment) group, how many DISTINCT sensitive values
    * (account-balance kilobuckets) appear — a group can be large yet
    * still leak if everyone in it shares one sensitive value. Emits
    * the worst group's l and the count of groups below `lMin`.
    * Two-level aggregation over (QI, bucket) pairs — distinct-sized,
    * never the table — all exact integers. */
  def lDiversity(s: SparkSession, d: String, lMin: Int = 3): DataFrame = {
    val perGroup = Tables.customer(s, d)
      .select(col("c_nationkey"), col("c_mktsegment"),
        expr("CAST(floor(c_acctbal / 1000.0) AS BIGINT)").as("sens"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count_distinct(col("sens")).as("l"))
    perGroup.agg(count(lit(1)).as("n_groups"),
      min(col("l")).as("l_diversity"),
      coalesce(sum(when(col("l") < lMin, 1L)), lit(0L))
        .as("groups_below_l"))
  }

  /** Deterministic train/val/test split manifest: every document is
    * assigned by its md5 first nibble (0-d train ≈ 87.5%, e val,
    * f test ≈ 6.25% each) — the [[hashKeep]] coin widened to a
    * 3-way partition, so the split is reproducible across runs,
    * engines and re-shards, needs no stored assignment table, and
    * any two documents land independently. Emits per-split doc and
    * whitespace-token counts — the manifest a training run records
    * before it starts. Map-side: one md5 + one regexp count per row,
    * then a 3-group agg. */
  def splitManifest(s: SparkSession, d: String): DataFrame = {
    val nib = substring(md5(col("doc_id").cast("string")), 1, 1)
    Tables.documents(s, d)
      .select(
        when(nib === "f", lit("test"))
          .when(nib === "e", lit("val"))
          .otherwise(lit("train")).as("split"),
        TextOps.tokenCount(col("text")).cast("long").as("toks"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
      .orderBy(col("split"))
  }

  /** DuckDB oracle for [[splitManifest]]. */
  def splitManifestSql: String =
    """WITH t AS (SELECT
      |    CASE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
      |      WHEN 'f' THEN 'test' WHEN 'e' THEN 'val'
      |      ELSE 'train' END AS split,
      |    len(regexp_extract_all(text, '[^ ]+')) AS toks
      |  FROM documents)
      |SELECT split, COUNT(*) AS n_docs,
      |  CAST(SUM(toks) AS BIGINT) AS n_tokens
      |FROM t GROUP BY split ORDER BY split""".stripMargin

  /** Split-leakage audit: the near-dup pair census of the corpus
    * grouped by which [[splitManifest]] partitions the two documents
    * land in. A cross-split near-dup pair (leak = true) is test/val
    * contamination — the document the model is evaluated on has a
    * near-copy in train — exactly what a deduplicate-THEN-split
    * pipeline must verify is absent. Rides the memoized winnowing
    * fingerprint pairs (q139's capped banded join; no new shuffle
    * shape), then one map-side md5 per endpoint and a ≤6-group agg;
    * the split assignment is recomputed from the id rather than
    * joined from a manifest table, so the audit adds NO join at any
    * scale. */
  def splitLeakage(s: SparkSession, d: String): DataFrame = {
    def splitOf(c: Column): Column = {
      val nib = substring(md5(c.cast("string")), 1, 1)
      when(nib === "f", lit("test"))
        .when(nib === "e", lit("val"))
        .otherwise(lit("train"))
    }
    TextOps.winnowingNearDupPairs(s, d)
      .select(splitOf(col("doc_a")).as("sa"), splitOf(col("doc_b")).as("sb"))
      .select(least(col("sa"), col("sb")).as("split_lo"),
        greatest(col("sa"), col("sb")).as("split_hi"))
      .groupBy(col("split_lo"), col("split_hi"))
      .agg(count(lit(1)).as("n_pairs"))
      .select(col("split_lo"), col("split_hi"), col("n_pairs"),
        (col("split_lo") =!= col("split_hi")).as("leak"))
      .orderBy(col("split_lo"), col("split_hi"))
  }

  /** DuckDB oracle for [[splitLeakage]]: the q139 pair chain as a
    * derived table, endpoints mapped through the same md5-nibble
    * split rule. */
  def splitLeakageSql: String =
    s"""SELECT split_lo, split_hi,
       |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  split_lo <> split_hi AS leak
       |FROM (
       |  SELECT least(
       |      CASE substr(md5(CAST(doc_a AS VARCHAR)), 1, 1)
       |        WHEN 'f' THEN 'test' WHEN 'e' THEN 'val'
       |        ELSE 'train' END,
       |      CASE substr(md5(CAST(doc_b AS VARCHAR)), 1, 1)
       |        WHEN 'f' THEN 'test' WHEN 'e' THEN 'val'
       |        ELSE 'train' END) AS split_lo,
       |    greatest(
       |      CASE substr(md5(CAST(doc_a AS VARCHAR)), 1, 1)
       |        WHEN 'f' THEN 'test' WHEN 'e' THEN 'val'
       |        ELSE 'train' END,
       |      CASE substr(md5(CAST(doc_b AS VARCHAR)), 1, 1)
       |        WHEN 'f' THEN 'test' WHEN 'e' THEN 'val'
       |        ELSE 'train' END) AS split_hi
       |  FROM (${TextOps.winnowingNearDupPairsSql()}) pairs) t
       |GROUP BY split_lo, split_hi
       |ORDER BY split_lo, split_hi""".stripMargin

  /** DuckDB oracle for [[lDiversity]]. */
  def lDiversitySql(lMin: Int = 3): String =
    s"""WITH g AS (SELECT c_nationkey, c_mktsegment,
       |    COUNT(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT))
       |      AS l
       |  FROM customer GROUP BY 1, 2)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       |  CAST(MIN(l) AS BIGINT) AS l_diversity,
       |  CAST(COALESCE(SUM(CASE WHEN l < $lMin THEN 1 END), 0)
       |    AS BIGINT) AS groups_below_l
       |FROM g""".stripMargin

  private val log2 = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Data-constrained epoch WATER-FILLING across sources: allocate a
    * training-token budget `budgetX`× the corpus size to sources
    * proportionally to √n (the temperature-mix target) but capped at
    * `maxEpochs` passes over any single source — the allocator behind
    * "we want T tokens at temperature 0.5 but may repeat nothing more
    * than E times" (the data-constrained-scaling regime). Solved in
    * closed form by the sorted-threshold scan: a source saturates its
    * cap exactly when the water level λ ≥ E·n/√n = E·√n, so sources
    * cap in ascending-√n order; windows over the SOURCE table (tiny,
    * aggregated) find the unique boundary where
    * λ = (T − E·Σ_capped n) / Σ_uncapped √n is consistent with both
    * sides. All comparisons are the same double ops in both engines;
    * allocations round half-up to BIGINT tokens at the end. Emits per
    * source: n_tokens, allocation, epochs. */
  def epochWaterfill(s: SparkSession, d: String, budgetX: Double = 2.0,
      maxEpochs: Double = 4.0): DataFrame = {
    // budgets at or past maxEpochs x corpus would cap EVERY source
    // (the boundary row's denominator is 0 — there is no water level)
    require(budgetX < maxEpochs,
      s"budgetX ($budgetX) must be < maxEpochs ($maxEpochs)")
    val src = Tables.documents(s, d)
      .groupBy(col("source")).agg(sum(col("n_chars")).as("n"))
    val w = Window.orderBy(col("n"), col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // cum sums in ascending-(n, source) order over the aggregated
    // source table; sqrt folds in that DETERMINISTIC order, so the
    // totals (read off the scan's maxima, order-insensitive) are the
    // same doubles in both engines — an agg-side sum of sqrt would
    // fold in partition order and break hash parity
    val scan = graft.GraftSession.cut(src
      .select(col("source"), col("n"), sqrt(col("n").cast("double")).as("sw"))
      .withColumn("cum_n", sum(col("n")).over(w))
      .withColumn("cum_w", sum(col("sw")).over(w)))
    val tot = scan.agg(max(col("cum_w")).as("tw"),
      max(col("cum_n")).cast("double").as("tnd"))
    // boundary candidate: this source is the LAST capped one; its
    // boundary lambda must still cap it (the threshold scan — caps
    // happen in ascending-sqrt(n) order)
    val candidates = scan.crossJoin(broadcast(tot))
      .withColumn("lam",
        (lit(budgetX) * col("tnd")
          - lit(maxEpochs) * col("cum_n").cast("double"))
          / nullif(col("tw") - col("cum_w"), lit(0.0)))
      .withColumn("caps",
        col("lam") * col("sw") >= lit(maxEpochs) * col("n").cast("double"))
    val lamRow = candidates.filter(col("caps"))
      .orderBy(col("n").desc, col("source").desc).limit(1)
      .select(col("lam")).collect()
    val lamV =
      if (lamRow.nonEmpty) lamRow(0).getDouble(0)
      else tot.select((lit(budgetX) * col("tnd") / col("tw")).as("lam"))
        .head().getDouble(0)
    src
      .select(col("source"), col("n").as("n_tokens"),
        expr(s"CAST(round(least($lamV * sqrt(CAST(n AS DOUBLE)), " +
          s"$maxEpochs * CAST(n AS DOUBLE))) AS LONG)").as("alloc_tokens"))
      .select(col("source"), col("n_tokens"), col("alloc_tokens"),
        round(col("alloc_tokens").cast("double")
          / col("n_tokens").cast("double"), 6).as("epochs"))
      .orderBy(col("source"))
  }

  /** DuckDB oracle for [[epochWaterfill]]: the same threshold scan. */
  def epochWaterfillSql(budgetX: Double = 2.0,
      maxEpochs: Double = 4.0): String =
    s"""WITH src AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS n
       |             FROM documents GROUP BY source),
       |scan AS (SELECT source, n, sqrt(CAST(n AS DOUBLE)) AS sw,
       |    SUM(n) OVER (ORDER BY n, source
       |      ROWS UNBOUNDED PRECEDING) AS cum_n,
       |    SUM(sqrt(CAST(n AS DOUBLE))) OVER (ORDER BY n, source
       |      ROWS UNBOUNDED PRECEDING) AS cum_w
       |  FROM src),
       |tot AS (SELECT MAX(cum_w) AS tw,
       |          CAST(MAX(cum_n) AS DOUBLE) AS tnd FROM scan),
       |cand AS (SELECT scan.*, tot.tnd, tot.tw,
       |    ($budgetX * tnd - $maxEpochs * CAST(cum_n AS DOUBLE))
       |      / nullif(tw - cum_w, 0.0) AS lam
       |  FROM scan, tot),
       |capped AS (SELECT lam FROM cand
       |  WHERE lam * sw >= $maxEpochs * CAST(n AS DOUBLE)
       |  ORDER BY n DESC, source DESC LIMIT 1),
       |lam0 AS (SELECT $budgetX * tnd / tw AS lam FROM tot),
       |eff AS (SELECT COALESCE((SELECT lam FROM capped),
       |                        (SELECT lam FROM lam0)) AS lam)
       |SELECT source, n AS n_tokens,
       |  CAST(round(least(lam * sqrt(CAST(n AS DOUBLE)),
       |    $maxEpochs * CAST(n AS DOUBLE))) AS BIGINT) AS alloc_tokens,
       |  round(CAST(CAST(round(least(lam * sqrt(CAST(n AS DOUBLE)),
       |      $maxEpochs * CAST(n AS DOUBLE))) AS BIGINT) AS DOUBLE)
       |    / CAST(n AS DOUBLE), 6) AS epochs
       |FROM src, eff ORDER BY source""".stripMargin

  /** Weighted sampling WITHOUT replacement by exponential priority
    * keys (Efraimidis-Spirakis): each order draws a deterministic
    * md5-uniform u and is ranked by ln(u)/w — the top-k under that
    * key is an exact weight-proportional sample, the one-pass
    * distributed answer to "sample k orders proportional to spend"
    * (reservoir semantics with no sequential state; top-k is a
    * bounded TakeOrdered, never a sort of the corpus). u is shifted
    * to (0, 1) exactly ((n32 + 1)/(2^32 + 1)) so ln never sees 0;
    * the key is quantized to 1e-18 BIGINTs before ranking — double
    * ulp on ln sits ~4 orders below the quantization step, so both
    * engines rank identical integers. */
  def prioritySample(s: SparkSession, d: String, k: Int = 30): DataFrame = {
    val u = (md5Frac32(col("o_orderkey")) * lit(4294967296.0) + lit(1.0)) /
      lit(4294967297.0)
    val ranked = Tables.orders(s, d)
      .select(col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS LONG)").as("weight_cents"))
      .filter(col("weight_cents") > 0L)
      .withColumn("key_q",
        // clamped: a 1-cent weight with a tiny u pushes the scaled
        // key past Long range, where Spark's cast clamps but DuckDB's
        // errors — the floor keeps both engines in-range and ordering
        // for legitimate keys (~1e12 magnitude) untouched
        round(greatest(log(u) / col("weight_cents").cast("double")
          * lit(1e18), lit(-9.0e18)), 0).cast("long"))
      .orderBy(col("key_q").desc, col("o_orderkey"))
      .limit(k)
    val w2 = Window.orderBy(col("key_q").desc, col("o_orderkey"))
    ranked.withColumn("rank", row_number().over(w2).cast("long"))
      .select(col("rank"), col("o_orderkey"), col("weight_cents"))
      .orderBy(col("rank"))
  }

  /** DuckDB oracle for [[prioritySample]]. */
  def prioritySampleSql(k: Int = 30): String = {
    val nibbleSum = md5NibbleSumSql
    s"""WITH f AS (SELECT o_orderkey,
       |    CAST(round(o_totalprice * 100) AS BIGINT) AS weight_cents,
       |    (CAST(($nibbleSum) AS DOUBLE) / 4294967296.0
       |      * 4294967296.0 + 1.0) / 4294967297.0 AS u
       |  FROM (SELECT o_orderkey, o_totalprice,
       |          md5(CAST(o_orderkey AS VARCHAR)) AS h FROM orders)
       |  WHERE CAST(round(o_totalprice * 100) AS BIGINT) > 0),
       |kq AS (SELECT o_orderkey, weight_cents,
       |    CAST(round(greatest(ln(u) / CAST(weight_cents AS DOUBLE)
       |      * 1e18, -9.0e18)) AS BIGINT) AS key_q
       |  FROM f),
       |top AS (SELECT o_orderkey, weight_cents, key_q FROM kq
       |        ORDER BY key_q DESC, o_orderkey LIMIT $k)
       |SELECT CAST(row_number() OVER (ORDER BY key_q DESC, o_orderkey)
       |    AS BIGINT) AS rank,
       |  o_orderkey, weight_cents
       |FROM top ORDER BY rank""".stripMargin
  }

  /** Asymmetric CONTAINMENT near-dup pairs: document pairs ranked by
    * |grams(A) ∩ grams(B)| / min(|grams(A)|, |grams(B)|) — the
    * statistic that catches a short document EMBEDDED in a long one,
    * which resemblance (Jaccard) scores near zero because the union is
    * dominated by the long side (Broder's containment vs resemblance
    * distinction; the quote/boilerplate-inclusion case MinHash-Jaccard
    * dedup systematically misses). Candidates come from an equi-join
    * on distinct 64-bit token-k-gram hashes; grams occurring in more
    * than `maxDf` documents are dropped first with a logged count (the
    * stop-gram cap — a boilerplate gram shared by half the corpus
    * would otherwise quadratically explode the join), and the SAME
    * capped gram set feeds both the intersection counts and the
    * per-doc sizes, so the score is self-consistent and the oracle
    * mirrors it exactly. Shuffles carry (gh, doc_id) pairs only. */
  /** Memoized capped gram set behind the containment family: the
    * expensive pass (tokenize + lead-window + distinct + df join),
    * pinned per (session, k, maxDf) like the q102/q139 gram tables. */
  private def containGramTable(s: SparkSession, d: String, k: Int,
      maxDf: Int): DataFrame = {
    def docs = Tables.documents(s, d)
    IndexMemo.getOrBuild[DataFrame](
      "containGrams", s"$k#$maxDf", Seq(docs)) {
      // build-local persists (r16): gramDoc feeds the df census AND
      // the kept join, and dfc feeds the hot count AND the cap filter
      // — unpersisted, the tokenize + lead-window + distinct pipeline
      // (the build's dominant cost) re-ran for every consumer. Both
      // intermediates are released before the build returns; only the
      // capped gram set stays pinned.
      val gramDoc = posGramHashes(docs, k)
        .select(col("doc_id"), col("gh")).distinct().persist()
      val dfc = gramDoc.groupBy(col("gh")).agg(count(lit(1)).as("df"))
        .persist()
      val hot = dfc.filter(col("df") > maxDf).count()
      if (hot > 0)
        log2.warn(s"containment: dropped $hot grams in more than " +
          s"$maxDf docs (stop-gram cap)")
      // persistCompactBy(gh) (r18): the containment pair self-join
      // keys on gh over this pin, so the gh hash pin co-partitions
      // both join sides and the pair census plans no exchange; the
      // doc-keyed size fold pays its doc_id exchange as before
      val kept = graft.GraftSession.persistCompactBy(
        gramDoc.join(dfc.filter(col("df") <= maxDf)
          .select(col("gh")), "gh"), col("gh"))
      gramDoc.unpersist()
      dfc.unpersist()
      (kept, Seq(kept))
    }
  }

  /** The scored containment pair table (pre-top-k): shared-gram
    * counts over the memoized capped gram set, containment =
    * shared / min(|A|, |B|). */
  private def containmentScored(s: SparkSession, d: String, k: Int,
      maxDf: Int, minShared: Int): DataFrame = {
    val keptCut = containGramTable(s, d, k, maxDf)
    val sizes = keptCut.groupBy(col("doc_id")).agg(count(lit(1)).as("ng"))
    keptCut.select(col("gh"), col("doc_id").as("doc_a"))
      .join(keptCut.select(col("gh"), col("doc_id").as("doc_b")), "gh")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared_grams"))
      .filter(col("shared_grams") >= minShared)
      .join(sizes.select(col("doc_id").as("doc_a"), col("ng").as("na")),
        "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("ng").as("nb")),
        "doc_b")
      .select(col("doc_a"), col("doc_b"), col("shared_grams"),
        round(col("shared_grams").cast("double")
          / least(col("na"), col("nb")).cast("double"), 6)
          .as("containment"))
  }

  def containmentPairs(s: SparkSession, d: String, k: Int = 8,
      maxDf: Int = 100, minShared: Int = 3, topK: Int = 50): DataFrame =
    containmentScored(s, d, k, maxDf, minShared)
      .orderBy(col("containment").desc, col("doc_a"), col("doc_b"))
      .limit(topK)

  /** Containment-cluster census: connected components over the
    * containment pairs at `thr`, via the same fixed-round min-label
    * propagation as the co-purchase components — the grouping a
    * boilerplate-family dedup pass acts on (keep one representative
    * per cluster). Only documents with at least one qualifying pair
    * participate; the emitted histogram is cluster size →
    * cluster count. */
  def containmentClusters(s: SparkSession, d: String, k: Int = 8,
      maxDf: Int = 100, minShared: Int = 3, thr: Double = 0.5,
      rounds: Int = 6): DataFrame = {
    val pairs = containmentScored(s, d, k, maxDf, minShared)
      .filter(col("containment") >= thr)
      .select(col("doc_a"), col("doc_b"))
    val und = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .unionAll(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
    Graph.componentLabels(und, rounds)
      .groupBy(col("lab")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .orderBy(col("cluster_size"))
  }

  /** DuckDB oracle for [[containmentClusters]]: the gram-string pair
    * mirror plus `rounds` unrolled min-label steps. */
  def containmentClustersSql(k: Int = 8, maxDf: Int = 100,
      minShared: Int = 3, thr: Double = 0.5, rounds: Int = 6): String = {
    val head =
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk
         |              FROM documents),
         |p AS (SELECT doc_id, tk,
         |        unnest(range(1, len(tk) - ${k - 2})) AS pos
         |      FROM toks WHERE len(tk) >= $k),
         |g0 AS (SELECT DISTINCT doc_id,
         |         array_to_string(tk[pos:pos+${k - 1}], ' ') AS g
         |       FROM p),
         |dfc AS (SELECT g, COUNT(*) AS df FROM g0 GROUP BY g),
         |kept AS (SELECT g0.doc_id, g0.g FROM g0
         |         JOIN dfc ON dfc.g = g0.g AND dfc.df <= $maxDf),
         |sizes AS (SELECT doc_id, COUNT(*) AS ng FROM kept GROUP BY 1),
         |pr AS (SELECT doc_a, doc_b FROM (
         |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |      COUNT(*) AS sh
         |    FROM kept a JOIN kept b
         |      ON a.g = b.g AND a.doc_id < b.doc_id
         |    GROUP BY 1, 2 HAVING COUNT(*) >= $minShared) s
         |  JOIN sizes na ON na.doc_id = s.doc_a
         |  JOIN sizes nb ON nb.doc_id = s.doc_b
         |  WHERE round(CAST(sh AS DOUBLE)
         |    / CAST(least(na.ng, nb.ng) AS DOUBLE), 6)
         |    >= CAST($thr AS DOUBLE)),
         |und AS (SELECT doc_a AS u, doc_b AS v FROM pr
         |        UNION ALL SELECT doc_b, doc_a FROM pr),
         |lab0 AS (SELECT DISTINCT u AS node, u AS lab FROM und)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s"""lab$i AS (SELECT node, MIN(lab) AS lab FROM (
         |  SELECT e.v AS node, l.lab
         |  FROM und e JOIN lab${i - 1} l ON l.node = e.u
         |  UNION ALL SELECT node, lab FROM lab${i - 1})
         |  GROUP BY node)""".stripMargin
    }
    val tail =
      s"""SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
         |FROM (SELECT lab, CAST(COUNT(*) AS BIGINT) AS cluster_size
         |      FROM lab$rounds GROUP BY lab)
         |GROUP BY cluster_size ORDER BY cluster_size""".stripMargin
    (Seq(head) ++ steps).mkString(",\n") + "\n" + tail
  }

  /** SimHash calibration curve: for the verified near-dup pairs,
    * mean/min/max 60-bit SimHash Hamming distance per exact-Jaccard
    * decile — the empirical answer to "what Hamming cutoff
    * corresponds to the Jaccard threshold I actually care about",
    * read before picking the pigeonhole band radius. Joins the
    * bounded verified pair table against the per-doc sketches
    * (ids + one BIGINT each through the shuffle); every Hamming
    * count is exact integer popcount, the only float is the mean. */
  def simhashCalibration(s: SparkSession, d: String): DataFrame = {
    val pairs = charJaccardVerifiedPairs(s, d)
    val sig = simhashMd5(s, d)
    pairs
      .join(sig.select(col("doc_id").as("id_a"),
        col("simhash60").as("sa")), "id_a")
      .join(sig.select(col("doc_id").as("id_b"),
        col("simhash60").as("sb")), "id_b")
      .select(col("jaccard_est"),
        expr("CAST(bit_count(sa ^ sb) AS LONG)").as("hamming"))
      .withColumn("jaccard_decile",
        expr("CAST(floor(jaccard_est * 10.0 + 1e-9) AS LONG)"))
      .groupBy(col("jaccard_decile"))
      .agg(count(lit(1)).as("n_pairs"),
        round(sum(col("hamming")).cast("double")
          / count(lit(1)).cast("double"), 6).as("mean_hamming"),
        min(col("hamming")).as("min_hamming"),
        max(col("hamming")).as("max_hamming"))
      .orderBy(col("jaccard_decile"))
  }

  /** Dedup ROI curve: for each candidate Jaccard threshold, how many
    * verified near-dup pairs fire, how many documents a keep-smallest
    * policy removes (every doc that appears as the LARGER id of a
    * qualifying pair — the direct-pair simplification of cluster
    * dedup, mirrored identically in the oracle), and the character
    * mass that removal frees — the number you read before committing
    * to a threshold. Pairs come from the memoized verified-LSH index;
    * the sweep is a 3-literal explode over its bounded output. */
  def dedupRoiCurve(s: SparkSession, d: String,
      thresholds: Seq[Double] = Seq(0.7, 0.8, 0.9)): DataFrame = {
    val pairs = charJaccardVerifiedPairs(s, d)
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"))
    val tot = docs.agg(sum(col("n_chars")).as("total_chars"))
    val sweep = pairs
      .select(col("id_a"), col("id_b"), col("jaccard_est"),
        explode(array(thresholds.map(lit(_)): _*)).as("threshold"))
      .filter(col("jaccard_est") >= col("threshold"))
    val nPairs = sweep.groupBy(col("threshold"))
      .agg(count(lit(1)).as("n_pairs"))
    val removed = sweep.select(col("threshold"), col("id_b")).distinct()
      .join(docs.select(col("doc_id").as("id_b"), col("n_chars")),
        "id_b")
      .groupBy(col("threshold"))
      .agg(count(lit(1)).as("n_docs_removed"),
        sum(col("n_chars")).as("chars_removed"))
    // drive from the threshold literals: a threshold at which zero
    // pairs fire must still emit its 0-row — an inner start would
    // silently drop curve points
    val ths = s.range(1).select(
      explode(array(thresholds.map(lit(_)): _*)).as("threshold"))
    ths.join(nPairs, Seq("threshold"), "left")
      .join(removed, Seq("threshold"), "left")
      .crossJoin(broadcast(tot))
      .select(col("threshold"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs_removed"), lit(0L)).as("n_docs_removed"),
        coalesce(col("chars_removed"), lit(0L)).as("chars_removed"),
        round(coalesce(col("chars_removed"), lit(0L)).cast("double")
          / col("total_chars").cast("double"), 6)
          .as("frac_chars_removed"))
      .orderBy(col("threshold"))
  }

  /** DuckDB oracle for [[dedupRoiCurve]]: rides the q39 pair oracle
    * as a subquery. */
  def dedupRoiCurveSql(
      thresholds: Seq[Double] = Seq(0.7, 0.8, 0.9)): String = {
    val vals = thresholds.map(t => s"(CAST($t AS DOUBLE))").mkString(", ")
    s"""WITH pr AS (SELECT * FROM (${charJaccardVerifiedPairsSql}) q),
       |ths(threshold) AS (VALUES $vals),
       |sweep AS (SELECT threshold, id_a, id_b, jaccard_est
       |          FROM pr JOIN ths ON jaccard_est >= threshold),
       |np AS (SELECT threshold, COUNT(*) AS n_pairs
       |       FROM sweep GROUP BY threshold),
       |rem AS (SELECT threshold, COUNT(*) AS n_docs_removed,
       |    CAST(SUM(n_chars) AS BIGINT) AS chars_removed
       |  FROM (SELECT DISTINCT threshold, id_b FROM sweep) f
       |  JOIN documents dd ON dd.doc_id = f.id_b
       |  GROUP BY threshold),
       |tot AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS total_chars
       |        FROM documents)
       |SELECT threshold,
       |  COALESCE(n_pairs, 0) AS n_pairs,
       |  COALESCE(n_docs_removed, 0) AS n_docs_removed,
       |  COALESCE(chars_removed, 0) AS chars_removed,
       |  round(CAST(COALESCE(chars_removed, 0) AS DOUBLE)
       |    / CAST(total_chars AS DOUBLE), 6) AS frac_chars_removed
       |FROM ths LEFT JOIN np USING (threshold)
       |LEFT JOIN rem USING (threshold), tot
       |ORDER BY threshold""".stripMargin
  }

  /** DuckDB oracle for [[containmentPairs]]: gram STRINGS stand in
    * for the 64-bit gram hashes (equal sets modulo hash collisions —
    * the q102 device). */
  def containmentPairsSql(k: Int = 8, maxDf: Int = 100,
      minShared: Int = 3, topK: Int = 50): String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk
       |              FROM documents),
       |p AS (SELECT doc_id, tk,
       |        unnest(range(1, len(tk) - ${k - 2})) AS pos
       |      FROM toks WHERE len(tk) >= $k),
       |g0 AS (SELECT DISTINCT doc_id,
       |         array_to_string(tk[pos:pos+${k - 1}], ' ') AS g
       |       FROM p),
       |dfc AS (SELECT g, COUNT(*) AS df FROM g0 GROUP BY g),
       |kept AS (SELECT g0.doc_id, g0.g FROM g0
       |         JOIN dfc ON dfc.g = g0.g AND dfc.df <= $maxDf),
       |sizes AS (SELECT doc_id, COUNT(*) AS ng FROM kept GROUP BY 1),
       |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         COUNT(*) AS shared_grams
       |       FROM kept a JOIN kept b
       |         ON a.g = b.g AND a.doc_id < b.doc_id
       |       GROUP BY 1, 2 HAVING COUNT(*) >= $minShared)
       |SELECT doc_a, doc_b, shared_grams,
       |  round(CAST(shared_grams AS DOUBLE)
       |    / CAST(least(na.ng, nb.ng) AS DOUBLE), 6) AS containment
       |FROM pr
       |JOIN sizes na ON na.doc_id = doc_a
       |JOIN sizes nb ON nb.doc_id = doc_b
       |ORDER BY containment DESC, doc_a, doc_b LIMIT $topK""".stripMargin
}
