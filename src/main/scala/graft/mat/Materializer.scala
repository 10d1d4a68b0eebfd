package graft.mat

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.model.{ColumnModel, Relation, RelationType}
import scala.collection.mutable

/** The reference adapter's top-level operators — the materialization state
  * machines of `dbt/include/extrica/macros/materializations/` — driven
  * against the Spark catalog (`saveAsTable` + `spark.catalog` +
  * `ALTER TABLE … RENAME TO`).
  *
  * All writes are distributed (`df.write`); the state machine itself is
  * pure catalog orchestration (metadata ops), so nothing here caps scale.
  */
final class Materializer(spark: SparkSession) {

  import spark.implicits._

  // ------------------------------------------------------------------
  // table materialization (table.sql:1-70)
  // ------------------------------------------------------------------

  /** CTAS with swap. `onTableExists`:
    *  - "rename" (default): CTAS to `__dbt_tmp` → rename old → `__dbt_backup`
    *    → rename tmp → target → drop backup (table.sql:12-48);
    *  - "drop": drop old, then CTAS (table.sql:50-59);
    *  - anything else: logged fallback to rename (table.sql:3-7).
    */
  def table(rel: Relation, df: DataFrame,
            onTableExists: String = "rename"): Unit = {
    val mode = onTableExists match {
      case "rename" | "drop" => onTableExists
      case other =>
        // table.sql:3-7: invalid value logs and falls back to rename
        System.err.println(
          s"[graft] invalid on_table_exists '$other', falling back to rename")
        "rename"
    }
    val name = rel.render
    if (!spark.catalog.tableExists(name)) {
      df.write.saveAsTable(name)
    } else if (mode == "drop") {
      dropRelation(rel)
      df.write.saveAsTable(name)
    } else {
      val tmp = rel.suffixed("__dbt_tmp")
      val backup = rel.suffixed("__dbt_backup")
      dropRelation(tmp); dropRelation(backup)
      df.write.saveAsTable(tmp.render)
      spark.sql(s"ALTER TABLE ${name} RENAME TO ${backup.render}")
      spark.sql(s"ALTER TABLE ${tmp.render} RENAME TO ${name}")
      dropRelation(backup)
    }
  }

  /** create_table_as with an enforced contract (adapters.sql:107-124):
    * assert the model's schema matches the expected column list before any
    * write; mismatch aborts with the dbt-style error. */
  def tableWithContract(rel: Relation, df: DataFrame,
                        contract: Seq[ColumnModel]): Unit = {
    val got = df.schema.fields.map(f =>
      (f.name.toLowerCase, ColumnModel.fromSparkType(f.dataType)))
    val want = contract.map(c =>
      (c.name.toLowerCase, ColumnModel.fromSparkType(c.sparkType)))
    if (got.toSeq != want)
      throw new IllegalArgumentException(
        s"contract violation: model columns ${got.mkString(",")} != contract ${want.mkString(",")}")
    table(rel, df)
  }

  // ------------------------------------------------------------------
  // view materialization (view.sql + adapters.sql:136-153,266-295)
  // ------------------------------------------------------------------

  /** `create or replace view … security {definer|invoker}` — the security
    * clause has no Spark equivalent; it is validated (invalid values fall
    * back to definer, adapters.sql:141-147) and recorded, not enforced. */
  def view(rel: Relation, sql: String, security: String = "definer"): Unit = {
    val sec = security.toLowerCase match {
      case "definer" | "invoker" => security.toLowerCase
      case other =>
        System.err.println(
          s"[graft] invalid view security '$other', falling back to definer")
        "definer"
    }
    viewSecurity(rel.render.toLowerCase) = sec
    // adapters.sql:279-282: drop a non-view object of the same name first
    if (spark.catalog.tableExists(rel.render)) {
      val t = spark.catalog.getTable(rel.render)
      if (t.tableType != "VIEW") dropRelation(rel)
    }
    spark.sql(s"CREATE OR REPLACE VIEW ${rel.render} AS $sql")
  }

  private val viewSecurity = mutable.Map.empty[String, String]
  def securityOf(rel: Relation): Option[String] =
    viewSecurity.get(rel.render.toLowerCase)

  // ------------------------------------------------------------------
  // materialized view (materialized_view.sql:1-35)
  // ------------------------------------------------------------------
  // No vanilla-Spark MV → physically refreshed table + recorded defining
  // query; `refresh` re-runs the stored query (SURVEY §2.1).

  private val mvQueries = mutable.Map.empty[String, String]

  def materializedView(rel: Relation, definingSql: String): Unit = {
    mvQueries(rel.render.toLowerCase) = definingSql
    table(rel, spark.sql(definingSql))
  }

  /** `refresh materialized view` (materialized_view.sql:33-35). */
  def refreshMaterializedView(rel: Relation): Unit = {
    val sql = mvQueries.getOrElse(rel.render.toLowerCase,
      throw new IllegalArgumentException(s"not a materialized view: ${rel.render}"))
    table(rel, spark.sql(sql))
  }

  def materializedViewQuery(rel: Relation): Option[String] =
    mvQueries.get(rel.render.toLowerCase)

  // ------------------------------------------------------------------
  // seed materialization (seeds/helpers.sql + adapters.sql:52-90)
  // ------------------------------------------------------------------

  /** Load a CSV into a typed table. Column types come from the
    * agate-mirroring inference (ColumnModel.inferSeedType ← impl.py:52-66)
    * unless overridden via `columnTypes` (the dbt `column_types` config,
    * adapters.sql:59,67). Full reset: drop + recreate (adapters.sql:52-55).
    * The reference's 1000-row INSERT batching is a wire-protocol detail
    * with no Spark analogue (single distributed write). */
  def seed(rel: Relation, csvPath: String,
           columnTypes: Map[String, String] = Map.empty): Unit = {
    val raw = spark.read.option("header", "true").csv(csvPath)
    val inferred = inferSeedTypes(raw)
    val typed = raw.schema.fieldNames.foldLeft(raw) { (df, c) =>
      val declared = columnTypes.get(c).map(ColumnModel.translateLabel)
        .getOrElse(inferred(c))
      df.withColumn(c, df(c).cast(ColumnModel.toSparkType(declared)))
    }
    dropRelation(rel)
    typed.write.saveAsTable(rel.render)
  }

  /** Distributed seed type inference: ONE aggregate pass over the whole
    * CSV computing, per column, the non-null count plus an all-match flag
    * per agate value class — no rows ever reach the driver (seeds are
    * small by contract, but the plan scales regardless). Decision rules
    * identical to ColumnModel.inferSeedType (impl.py:52-66). */
  def inferSeedTypes(raw: org.apache.spark.sql.DataFrame)
      : Map[String, String] = {
    import org.apache.spark.sql.functions._
    val fields = raw.schema.fieldNames.toIndexedSeq
    if (fields.isEmpty) return Map.empty
    val classes = Seq(
      "bool" -> Seq(ColumnModel.SeedBoolRe),
      "int" -> Seq(ColumnModel.SeedIntRe),
      "num" -> Seq(ColumnModel.SeedIntRe, ColumnModel.SeedNumRe),
      "date" -> Seq(ColumnModel.SeedDateRe),
      "ts" -> Seq(ColumnModel.SeedTsRe, ColumnModel.SeedDateRe))
    val aggs = fields.flatMap { c =>
      val present = col(c).isNotNull && col(c) =!= ""
      count(when(present, 1)).as(s"${c}__n") +: classes.map { case (k, res) =>
        val m = res.map(re => col(c).rlike(re)).reduce(_ || _)
        coalesce(bool_and(when(present, m)), lit(true)).as(s"${c}__$k")
      }
    }
    val r = raw.agg(aggs.head, aggs.tail: _*).head()
    fields.map { c =>
      val n = r.getAs[Long](s"${c}__n")
      def ok(k: String) = r.getAs[Boolean](s"${c}__$k")
      val t =
        if (n == 0) "VARCHAR"
        else if (ok("bool")) "BOOLEAN"
        else if (ok("int")) "INTEGER"
        else if (ok("num")) "DOUBLE"
        else if (ok("date")) "DATE"
        else if (ok("ts")) "TIMESTAMP"
        else "VARCHAR"
      c -> t
    }.toMap
  }

  // ------------------------------------------------------------------
  // incremental materialization driver (incremental.sql:21-110)
  // ------------------------------------------------------------------

  /** The incremental state machine: first run / full refresh → CTAS;
    * else stage → schema-change handling → strategy → rewrite.
    *
    * On vanilla parquet the delete+insert/merge strategies rewrite the
    * whole table; the write goes to a tmp table then swaps (never
    * overwrite a table from a plan that reads it — SURVEY §7.3 caution).
    */
  def incremental(
      rel: Relation,
      model: DataFrame,
      strategy: String = "append",
      uniqueKeys: Seq[String] = Nil,
      onSchemaChange: String = "ignore",
      fullRefresh: Boolean = false,
      predicates: Seq[org.apache.spark.sql.Column] = Nil): Unit = {
    val name = rel.render
    val exists = spark.catalog.tableExists(name)
    if (!exists || fullRefresh) {
      table(rel, model) // incremental.sql:48-66
      return
    }
    // incremental.sql:79-81: widen target column types so staged values
    // fit (decimal precision/scale grow, never shrink), THEN handle
    // on_schema_change — same order as the reference
    val widened = SchemaEvolution.expandColumnTypes(spark.table(name), model)
    val staged = SchemaEvolution.processSchemaChanges(
      onSchemaChange, widened, model)
    // the staged frame now carries the POST-change schema
    // (append_new_columns adds columns, sync_all_columns adds+removes);
    // evolve the target to that same schema — existing rows get typed
    // NULLs for added columns, removed columns drop — so the strategy
    // rewrites below (which align to the target's columns) keep the
    // evolution instead of silently projecting it away
    val target = widened.select(staged.schema.fields.map { f =>
      if (widened.columns.exists(_.equalsIgnoreCase(f.name)))
        org.apache.spark.sql.functions.col(f.name)
      else
        org.apache.spark.sql.functions.lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
    val result = strategy match {
      case "append" => Incremental.append(target, staged)
      case "delete+insert" =>
        if (uniqueKeys.isEmpty) Incremental.append(target, staged)
        else Incremental.deleteInsert(target, staged, uniqueKeys, predicates)
      case "merge" =>
        Incremental.merge(target, staged, uniqueKeys, predicates = predicates)
      case other =>
        throw new IllegalArgumentException(
          s"invalid incremental strategy: $other") // impl.py:80-81
    }
    // materialize the rewritten plan before replacing its own input
    val tmp = rel.suffixed("__dbt_tmp")
    dropRelation(tmp)
    result.write.saveAsTable(tmp.render)
    val backup = rel.suffixed("__dbt_backup")
    dropRelation(backup)
    spark.sql(s"ALTER TABLE $name RENAME TO ${backup.render}")
    spark.sql(s"ALTER TABLE ${tmp.render} RENAME TO $name")
    dropRelation(backup)
  }

  // ------------------------------------------------------------------
  // shared DDL helpers (adapters.sql)
  // ------------------------------------------------------------------

  /** drop {table|view} if exists (adapters.sql:156-159). */
  def dropRelation(rel: Relation): Unit = {
    if (spark.catalog.tableExists(rel.render)) {
      val t = spark.catalog.getTable(rel.render)
      if (t.tableType == "VIEW") spark.sql(s"DROP VIEW IF EXISTS ${rel.render}")
      else spark.sql(s"DROP TABLE IF EXISTS ${rel.render}")
    }
  }

  /** alter {type} x rename to y (adapters.sql:188-193). */
  def renameRelation(from: Relation, to: Relation): Unit =
    spark.sql(s"ALTER TABLE ${from.render} RENAME TO ${to.render}")
}
