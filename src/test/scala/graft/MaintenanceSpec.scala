package graft

import org.apache.spark.sql.functions._

import graft.ops.{Maintenance, Relational}

/** Table maintenance + snapshot diff. */
class MaintenanceSpec extends SparkTestBase {
  import spark.implicits._

  test("compact rewrites a many-small-files dir into few files, same rows") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact_")
    val in = s"$base/in"
    val out = s"$base/out"
    (1 to 1000).toDF("n").repartition(50).write.parquet(in)
    val smallFiles = spark.read.parquet(in).inputFiles.length
    assert(smallFiles >= 40)
    val parts = Maintenance.compact(spark, in, out, targetFileMB = 128)
    assert(parts == 1)
    val compacted = spark.read.parquet(out)
    assert(compacted.inputFiles.length == 1)
    assert(compacted.agg(sum($"n")).head().getLong(0) == 500500L)
  }

  test("compactClustered yields disjoint sorted key ranges per file") {
    val base = java.nio.file.Files.createTempDirectory("graft_cluster_")
    val in = s"$base/in"
    val out = s"$base/out"
    // shuffled keys across many small files: no pruning possible
    (1 to 4000).map(i => (i * 2654435761L % 4096, i)).toDF("k", "v")
      .repartition(40).write.parquet(in)
    Maintenance.compactClustered(spark, in, out, Seq("k"), targetFileMB = 1)
    val files = spark.read.parquet(out).inputFiles.sorted
    assert(files.length >= 1)
    // per-file ranges must be disjoint (range partitioning) and rows
    // sorted inside each file (row-group stats monotone)
    val ranges = files.map { f =>
      val ks = spark.read.parquet(f).select("k").collect().map(_.getLong(0))
      assert(ks.sameElements(ks.sorted), s"unsorted file $f")
      (ks.min, ks.max)
    }
    ranges.sortBy(_._1).sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2)
      case _ =>
    }
    // nothing lost
    assert(spark.read.parquet(out).count() == 4000)
  }

  test("snapshotDiff classifies added, removed, changed; drops unchanged") {
    val prev = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "fp")
    val cur = Seq((2L, 20.0), (3L, 31.0), (4L, 40.0)).toDF("k", "fp")
    val out = Relational.snapshotDiff(prev, cur, "k")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("zorderKey2 matches a reference bit-interleave, bit for bit") {
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, j) =>
        acc | (((x >> j) & 1L) << (2 * j)) | (((y >> j) & 1L) << (2 * j + 1))
      }
    val cases = for (x <- Seq(0L, 1L, 2L, 3L, 7L, 100L, 65535L, 70000L);
                     y <- Seq(0L, 1L, 5L, 255L, 65535L)) yield (x, y)
    val out = cases.toDF("x", "y")
      .select($"x", $"y", Maintenance.zorderKey2($"x", $"y").as("z"))
      .collect()
    out.foreach { r =>
      val want = ref(r.getLong(0) & 65535L, r.getLong(1) & 65535L, 16)
      assert(r.getLong(2) == want, s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
    // interleave is a bijection on the masked domain: keys all distinct
    assert(out.map(_.getLong(2)).distinct.length
      == cases.map { case (x, y) => (x & 65535L, y & 65535L) }.distinct.size)
  }

  test("compactZOrder round-trips rows and sorts files by the Morton key") {
    val base = java.nio.file.Files.createTempDirectory("graft_zorder_")
    val in = s"$base/in"
    val out = s"$base/out"
    val rows = for (x <- 0 until 64; y <- 0 until 16) yield (x.toLong, y.toLong)
    rows.toDF("x", "y").repartition(8).write.parquet(in)
    Maintenance.compactZOrder(spark, in, out, "x", "y")
    val back = spark.read.parquet(out)
    assert(back.count() == rows.length)
    assert(back.columns.sorted.sameElements(Array("x", "y")))
    // the physical order within the output is z-order, which keeps both
    // dimensions local: any contiguous half of the data spans at most
    // half of each dimension's range (quadrant property), unlike a
    // lexicographic sort where the trailing dim spans everything
    val seq = back.select(Maintenance.zorderKey2($"x", $"y").as("z"))
      .collect().map(_.getLong(0))
    // file order is not guaranteed by read, so check sortedness per file
    val perFile = back
      .select(org.apache.spark.sql.functions
        .input_file_name().as("f"),
        Maintenance.zorderKey2($"x", $"y").as("z"))
      .collect().groupBy(_.getString(0))
    perFile.values.foreach { rs =>
      val zs = rs.map(_.getLong(1))
      assert(zs.sameElements(zs.sorted), "file not z-sorted")
    }
    assert(seq.length == rows.length)
  }

  test("constraintChecks: six constraints, zero violations, true counts") {
    val d = "/root/testdata/sf0.001"
    val rows = Maintenance.constraintChecks(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Set("orders_pk_unique", "orders_fk_customer",
      "lineitem_fk_orders", "lineitem_qty_positive",
      "orders_date_not_null", "lineitem_discount_range"))
    // TPC-H-ish generator data satisfies every constraint
    rows.foreach { case (name, (_, v)) =>
      assert(v == 0L, s"$name violated")
    }
    val nOrders = graft.Tables.orders(spark, d).count()
    val nLi = graft.Tables.lineitem(spark, d).count()
    assert(rows("orders_pk_unique")._1 == nOrders)
    assert(rows("orders_fk_customer")._1 == nOrders)
    assert(rows("lineitem_fk_orders")._1 == nLi)
    assert(rows("lineitem_qty_positive")._1 == nLi)
  }

  test("constraintChecks flags an injected orphan and dup key") {
    // copy orders shrunk to 50 rows with a known-bad custkey and a
    // duplicated orderkey; customer/lineitem untouched
    val d = "/root/testdata/sf0.001"
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-constraints").toString
    for (t <- Seq("customer", "lineitem")) {
      val src = java.nio.file.Paths.get(s"$d/$t.parquet")
      val dst = java.nio.file.Paths.get(s"$tmp/$t.parquet")
      java.nio.file.Files.copy(src, dst)
    }
    val orders = graft.Tables.orders(spark, d).limit(50)
    val bad = orders.limit(1)
      .withColumn("o_custkey", org.apache.spark.sql.functions.lit(-1L))
    orders.unionAll(bad).coalesce(1).write.mode("overwrite")
      .parquet(s"$tmp/orders.parquet")
    val rows = Maintenance.constraintChecks(spark, tmp).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows("orders_pk_unique") == (51L, 1L))
    assert(rows("orders_fk_customer") == (51L, 1L))
  }

  test("constraintChecks: NULL FK keys are not FK violations") {
    // A NULL o_custkey is the not-null rule's concern; the FK rule
    // must skip it — matching the NOT EXISTS oracle, where a NULL
    // probe row can never correlate. Regression for the anti-join
    // counting NULL keys as orphans.
    val d = "/root/testdata/sf0.001"
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-constraints-null").toString
    for (t <- Seq("customer", "lineitem")) {
      val src = java.nio.file.Paths.get(s"$d/$t.parquet")
      val dst = java.nio.file.Paths.get(s"$tmp/$t.parquet")
      java.nio.file.Files.copy(src, dst)
    }
    val orders = graft.Tables.orders(spark, d).limit(50)
    val nullFk = orders.limit(2).withColumn("o_custkey",
      lit(null).cast("long"))
    val orphan = orders.limit(1).withColumn("o_custkey", lit(-1L))
    orders.unionAll(nullFk).unionAll(orphan).coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val rows = Maintenance.constraintChecks(spark, tmp).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // 53 checked; only the -1 orphan violates FK, the two NULLs don't
    assert(rows("orders_fk_customer") == (53L, 1L))
  }

  test("pruningAudit: brute min/max bucket stats; clustering wins") {
    val d = sf("orders")
    val got = Maintenance.pruningAudit(spark, d).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val o = graft.Tables.orders(spark, d)
      .select($"o_orderkey",
        datediff($"o_orderdate".cast("date"), lit("1970-01-01").cast("date"))
          .cast("long"))
      .as[(Long, Long)].collect()
    val lo = java.time.LocalDate.parse("1997-01-01").toEpochDay
    val hi = java.time.LocalDate.parse("1998-01-01").toEpochDay
    def audit(bucket: ((Long, Long)) => Long): (Long, Long) = {
      val stats = o.groupBy(bucket).map { case (_, v) =>
        (v.map(_._2).min, v.map(_._2).max) }
      (stats.size.toLong,
        stats.count { case (mn, mx) => mx < lo || mn >= hi }.toLong)
    }
    val nat = audit { case (k, _) => k / 512 }
    val clu = audit { case (_, day) => day / 64 }
    assert(got("1_natural") ==
      (nat._1, nat._2, BigDecimal(nat._2.toDouble / nat._1)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(got("2_date_clustered")._1 == clu._1 &&
      got("2_date_clustered")._2 == clu._2)
    // the point of the audit: clustering on the filter column prunes
    // strictly more buckets (fraction-wise) than insertion order
    assert(got("2_date_clustered")._3 > got("1_natural")._3)
  }
}
