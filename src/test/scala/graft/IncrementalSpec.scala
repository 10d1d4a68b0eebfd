package graft

import org.apache.spark.sql.functions._
import graft.mat.{Incremental, Snapshot, SchemaEvolution}

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("id", "name", "amt")

  private def staged = Seq(
    (2L, "B2", 22.0), (4L, "d", 40.0)
  ).toDF("id", "name", "amt")

  test("append keeps everything (incremental.sql:145-149)") {
    val out = Incremental.append(target, staged)
    assert(out.count() == 5)
  }

  test("delete+insert: delete matched keys then insert staged (incremental.sql:112-150)") {
    val out = Incremental.deleteInsert(target, staged, Seq("id"))
      .orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(out(1).getString(1) == "B2") // replaced
    assert(out(2).getString(1) == "c")  // untouched
  }

  test("delete+insert with predicates scopes the delete (incremental.sql:123-127)") {
    // predicate amt > 25 → id=2 (amt=20) is NOT deleted even though key matches;
    // staged rows still insert, producing a duplicate id=2 — exactly what the
    // reference SQL would do.
    val out = Incremental.deleteInsert(target, staged, Seq("id"),
      Seq(col("amt") > 25))
    assert(out.count() == 5)
    assert(out.filter($"id" === 2L).count() == 2)
  }

  test("delete+insert composite keys use columnwise IN, not tuple equality (incremental.sql:116-127)") {
    val t = Seq((1L, "x", 1.0), (1L, "y", 2.0), (2L, "x", 3.0))
      .toDF("k1", "k2", "v")
    val s = Seq((1L, "x", 9.0)).toDF("k1", "k2", "v")
    // columnwise: delete where k1 IN (1) AND k2 IN ('x') → deletes (1,x) AND (2,x)? no:
    // k1 IN (1) excludes k1=2 → deletes only (1,x). But (1,y): k2='y' not in ('x') → kept.
    val out = Incremental.deleteInsert(t, s, Seq("k1", "k2")).orderBy("k1", "k2")
    val rows = out.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows.toSeq == Seq((1L, "x", 9.0), (1L, "y", 2.0), (2L, "x", 3.0)))
  }

  test("delete+insert null keys are never deleted (SQL IN semantics)") {
    val t = Seq((Some(1L), "a"), (None, "n")).toDF("id", "name")
    val s = Seq((Some(1L), "A"), (None, "N")).toDF("id", "name")
    val out = Incremental.deleteInsert(t, s, Seq("id"))
    // target null-key row kept; staged rows both inserted → 3 rows
    assert(out.count() == 3)
    assert(out.filter($"name" === "n").count() == 1)
  }

  test("merge updates matched, inserts unmatched (incremental.sql:152-205)") {
    val out = Incremental.merge(target, staged, Seq("id"))
      .orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(out(1).getString(1) == "B2" && out(1).getDouble(2) == 22.0)
  }

  test("merge honors update-column subsetting (incremental.sql:156-158)") {
    val out = Incremental.merge(target, staged, Seq("id"),
      updateColumns = Seq("amt")).orderBy("id").collect()
    // name NOT updated, amt updated
    assert(out(1).getString(1) == "b" && out(1).getDouble(2) == 22.0)
    val out2 = Incremental.merge(target, staged, Seq("id"),
      excludeColumns = Seq("amt")).orderBy("id").collect()
    assert(out2(1).getString(1) == "B2" && out2(1).getDouble(2) == 20.0)
  }

  test("merge without unique key degenerates to insert (incremental.sql:198-204)") {
    assert(Incremental.merge(target, staged, Nil).count() == 5)
  }

  test("merge incremental_predicates scope the ON condition (incremental.sql:152-153)") {
    // target: (1,a,10) (2,b,20) (3,c,30); staged id=2 and id=3.
    // predicate t.amt < 25 → id=2 matches+updates; id=3 fails the
    // predicate: target row passes through AND staged row inserts.
    val s2 = Seq((2L, "B2", 22.0), (3L, "C2", 33.0)).toDF("id", "name", "amt")
    val out = Incremental.merge(target, s2, Seq("id"),
      predicates = Seq(col("t.amt") < 25)).cache()
    assert(out.count() == 4)
    assert(out.filter($"id" === 3L).count() == 2)
    assert(out.filter($"id" === 2L).head.getString(1) == "B2")
    assert(out.filter($"id" === 3L && $"name" === "c").count() == 1)
  }

  test("SCD2 check_cols strategy: changed iff any checked column differs") {
    val t0v = Seq((1L, "a", "x"), (2L, "b", "y")).toDF("id", "v", "w")
    val now0 = to_timestamp(lit("2024-01-01 00:00:00"))
    val now1 = to_timestamp(lit("2024-02-01 00:00:00"))
    val snap0 = Snapshot.initialCheck(t0v, Seq("id"), now0)
    assert(snap0.filter($"dbt_valid_to".isNull).count() == 2)
    // id=1 changes w only; id=2 unchanged; id=3 new
    val t1v = Seq((1L, "a", "x2"), (2L, "b", "y"), (3L, "c", "z"))
      .toDF("id", "v", "w")
    val snap1 = Snapshot.runCheck(snap0, t1v, Seq("id"), Seq("v", "w"),
      now1).cache()
    val open = snap1.filter($"dbt_valid_to".isNull).orderBy("id").collect()
    assert(open.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(open(0).getString(2) == "x2")
    val closed = snap1.filter($"dbt_valid_to".isNotNull).collect()
    assert(closed.length == 1 && closed(0).getLong(0) == 1L &&
      closed(0).getString(2) == "x")
    // unchanged row keeps its original valid_from
    assert(open(1).getAs[java.sql.Timestamp]("dbt_valid_from").toString
      .startsWith("2024-01-01"))
    // idempotent: same source again stages nothing
    assert(Snapshot.runCheck(snap1, t1v, Seq("id"), Seq("v", "w"),
      to_timestamp(lit("2024-03-01 00:00:00"))).count() == snap1.count())
  }

  test("SCD2 snapshot full cycle (snapshot.sql:13-34)") {
    val t0 = Seq((1L, "a", "2024-01-01 00:00:00"),
      (2L, "b", "2024-01-01 00:00:00")).toDF("id", "v", "updated_at")
      .withColumn("updated_at", $"updated_at".cast("timestamp"))
    val snap0 = Snapshot.initial(t0, Seq("id"), "updated_at")
    assert(snap0.filter($"dbt_valid_to".isNull).count() == 2)

    // id=2 changes, id=3 appears
    val t1 = Seq((1L, "a", "2024-01-01 00:00:00"),
      (2L, "b2", "2024-02-01 00:00:00"),
      (3L, "c", "2024-02-01 00:00:00")).toDF("id", "v", "updated_at")
      .withColumn("updated_at", $"updated_at".cast("timestamp"))
    val snap1 = Snapshot.run(snap0, t1, Seq("id"), "updated_at")
    val open = snap1.filter($"dbt_valid_to".isNull).orderBy("id").collect()
    assert(open.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(open(1).getString(1) == "b2")
    val closed = snap1.filter($"dbt_valid_to".isNotNull).collect()
    assert(closed.length == 1 && closed(0).getLong(0) == 2L &&
      closed(0).getString(1) == "b")
    // idempotent: re-running with same source changes nothing
    assert(Snapshot.run(snap1, t1, Seq("id"), "updated_at").count() ==
      snap1.count())
  }

  test("SCD2 hard deletes close rows when enabled") {
    val t0 = Seq((1L, "a", "2024-01-01 00:00:00"))
      .toDF("id", "v", "updated_at")
      .withColumn("updated_at", $"updated_at".cast("timestamp"))
    val snap0 = Snapshot.initial(t0, Seq("id"), "updated_at")
    val t1 = t0.filter($"id" =!= 1L)
    val now = to_timestamp(lit("2024-03-01 00:00:00"))
    val snap1 = Snapshot.run(snap0, t1, Seq("id"), "updated_at",
      invalidateHardDeletes = true, now = now)
    val r = snap1.collect()
    assert(r.length == 1 && r(0).getAs[java.sql.Timestamp]("dbt_valid_to") != null)
  }

  test("on_schema_change modes (incremental.sql:83-86)") {
    val t = Seq((1L, "a")).toDF("id", "name")
    val sNew = Seq((2L, "b", 5.0)).toDF("id", "name", "extra")
    // ignore: extra dropped
    assert(SchemaEvolution.processSchemaChanges("ignore", t, sNew)
      .columns.toSeq == Seq("id", "name"))
    // fail: throws
    intercept[IllegalStateException] {
      SchemaEvolution.processSchemaChanges("fail", t, sNew)
    }
    // append_new_columns: extra kept
    assert(SchemaEvolution.processSchemaChanges("append_new_columns", t, sNew)
      .columns.toSeq == Seq("id", "name", "extra"))
    // removed column: ignore keeps target shape with nulls
    val sMissing = Seq(Tuple1(3L)).toDF("id")
    val out = SchemaEvolution.processSchemaChanges("ignore", t, sMissing)
    assert(out.columns.toSeq == Seq("id", "name") &&
      out.collect()(0).isNullAt(1))
  }

  test("insert_overwrite replaces exactly the staged partitions") {
    val target = Seq(
      (1L, "p1", 10.0), (2L, "p1", 20.0), (3L, "p2", 30.0), (4L, "p3", 40.0)
    ).toDF("id", "part", "amt")
    val staged = Seq((9L, "p1", 99.0)).toDF("id", "part", "amt")
    val out = Incremental.insertOverwrite(target, staged, Seq("part"))
      .orderBy("id").collect()
    // p1 fully replaced by the single staged row; p2/p3 untouched
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((3L, "p2"), (4L, "p3"), (9L, "p1")))
  }

  test("insert_overwrite: composite partition key matches as a tuple") {
    val target = Seq(
      (1L, "a", 1, 10.0), (2L, "a", 2, 20.0), (3L, "b", 1, 30.0)
    ).toDF("id", "p1", "p2", "amt")
    // staged touches only (a,1); (a,2) and (b,1) must survive even
    // though each shares ONE partition column with the batch
    val staged = Seq((9L, "a", 1, 99.0)).toDF("id", "p1", "p2", "amt")
    val out = Incremental.insertOverwrite(target, staged, Seq("p1", "p2"))
    assert(out.orderBy("id").collect().map(_.getLong(0)).toSeq ==
      Seq(2L, 3L, 9L))
    intercept[IllegalArgumentException] {
      Incremental.insertOverwrite(target, staged, Nil)
    }
  }

  test("insert_overwrite: NULL partition value is a real partition and is replaced") {
    val target = Seq(
      (1L, Some("a"), 10.0), (2L, None, 20.0), (3L, None, 30.0)
    ).toDF("id", "part", "amt")
    val staged = Seq((9L, Option.empty[String], 99.0))
      .toDF("id", "part", "amt")
    // dynamic partition overwrite replaces the DEFAULT (null) partition;
    // a non-null-safe anti-join would keep ids 2 and 3 alongside 9
    val out = Incremental.insertOverwrite(target, staged, Seq("part"))
    assert(out.orderBy("id").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 9L))
  }

  test("merge raises on duplicate staged unique keys (SQL MERGE multi-match)") {
    val dupStaged = Seq((2L, "B2", 22.0), (2L, "B3", 23.0), (4L, "d", 40.0))
      .toDF("id", "name", "amt")
    val e = intercept[Exception] {
      Incremental.merge(target, dupStaged, Seq("id")).collect()
    }
    assert(e.getMessage.contains("multiple source rows matched") ||
      (e.getCause != null &&
        e.getCause.getMessage.contains("multiple source rows matched")))
    // unique staged keys still merge cleanly through the guard
    assert(Incremental.merge(target, staged, Seq("id")).count() == 4)
  }

  test("merge: duplicate NULL-keyed staged rows are exempt from the guard") {
    val t = Seq((Some(1L), "a")).toDF("id", "name")
    val s = Seq((Option.empty[Long], "n1"), (None, "n2"), (Some(1L), "A"))
      .toDF("id", "name")
    // NULL keys never equi-match → both null rows insert, no raise
    val out = Incremental.merge(t, s, Seq("id")).collect()
    assert(out.length == 3)
    assert(out.count(_.isNullAt(0)) == 2)
  }

  test("snapshot stage raises on duplicate source unique keys") {
    import java.sql.Timestamp
    val t0 = Seq((1L, "a", Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("id", "v", "updated_at")
    val snap0 = Snapshot.initial(t0, Seq("id"), "updated_at")
    val dupSrc = Seq(
      (1L, "b", Timestamp.valueOf("2024-01-02 00:00:00")),
      (1L, "c", Timestamp.valueOf("2024-01-03 00:00:00"))
    ).toDF("id", "v", "updated_at")
    val e = intercept[Exception] {
      Snapshot.run(snap0, dupSrc, Seq("id"), "updated_at").collect()
    }
    assert(e.getMessage.contains("multiple source rows matched") ||
      (e.getCause != null &&
        e.getCause.getMessage.contains("multiple source rows matched")))
  }

  test("incremental agg: merge(aggregate(history), batch) == full recompute") {
    import graft.mat.IncrementalAgg
    import graft.mat.IncrementalAgg.Spec
    val all = Tables.load(spark, sf, "lineitem")
      .select($"l_returnflag", $"l_quantity", $"l_shipdate")
    val history = all.filter(hash($"l_quantity", $"l_shipdate") % 4 =!= 0)
    val batch = all.filter(hash($"l_quantity", $"l_shipdate") % 4 === 0)
    val specs = Seq(Spec("sq", "sum", "l_quantity"), Spec("n", "count", ""),
      Spec("mn", "min", "l_shipdate"), Spec("mx", "max", "l_shipdate"))
    val keys = Seq("l_returnflag")
    val merged = IncrementalAgg.merge(
      IncrementalAgg.aggregate(history, keys, specs), batch, keys, specs)
    val full = IncrementalAgg.aggregate(all, keys, specs)
    assert(merged.orderBy($"l_returnflag").collect().toSeq ==
      full.orderBy($"l_returnflag").collect().toSeq)
    // keys only in the batch appear; keys only in history survive
    val histOnly = Seq(("x", 1.0)).toDF("k", "v")
    val batchOnly = Seq(("y", 2.0), ("y", 3.0)).toDF("k", "v")
    val s2 = Seq(Spec("sv", "sum", "v"), Spec("n", "count", ""))
    val m2 = IncrementalAgg.merge(
      IncrementalAgg.aggregate(histOnly, Seq("k"), s2), batchOnly, Seq("k"), s2)
      .orderBy($"k").as[(String, Double, Long)].collect().toSeq
    assert(m2 == Seq(("x", 1.0, 1L), ("y", 5.0, 2L)))
    // non-mergeable aggregates are rejected at construction
    intercept[IllegalArgumentException] { Spec("bad", "median", "v") }
  }

  test("expandColumnTypes widens decimals only upward (incremental.sql:79-81)") {
    import org.apache.spark.sql.types._
    val t = Seq(Tuple1(BigDecimal("1.5"))).toDF("d")
      .select($"d".cast(DecimalType(10, 2)).as("d"))
    val s = Seq(Tuple1(BigDecimal("1.5"))).toDF("d")
      .select($"d".cast(DecimalType(20, 4)).as("d"))
    val widened = SchemaEvolution.expandColumnTypes(t, s)
    assert(widened.schema("d").dataType == DecimalType(20, 4))
    // no narrowing the other way
    assert(SchemaEvolution.expandColumnTypes(s, t).schema("d").dataType ==
      DecimalType(20, 4))
  }
}
