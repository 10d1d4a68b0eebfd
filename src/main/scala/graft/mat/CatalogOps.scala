package graft.mat

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.{ColumnModel, Relation, RelationType}
import scala.collection.mutable

/** Metadata/catalog operators (reference macros/adapters.sql,
  * macros/catalog.sql, macros/apply_grants.sql) over `spark.catalog`.
  *
  * The reference issues information_schema SQL round-trips to Trino; the
  * Spark catalog API answers the same questions in-process.
  */
final class CatalogOps(spark: SparkSession) {

  /** Max columns per relation — introspection guard (adapters.sql:12-19). */
  val MaxColumns = 10000

  /** get_columns_in_relation (adapters.sql:6-26, impl.py:71-78):
    * DESCRIBE → ColumnModels; missing relation → empty list;
    * >10,000 columns → error, mirroring the reference guard. */
  def getColumnsInRelation(rel: Relation): Seq[ColumnModel] = {
    if (!spark.catalog.tableExists(rel.render)) return Nil
    val cols = spark.table(rel.render).schema.fields
    if (cols.length > MaxColumns)
      throw new IllegalStateException(
        s"Too many columns in relation ${rel.render}! (> $MaxColumns)")
    cols.toIndexedSeq.map(f =>
      ColumnModel(f.name, ColumnModel.fromSparkType(f.dataType)))
  }

  /** list_relations_without_caching (adapters.sql:29-49):
    * (database, name, schema, type) per relation in a schema. */
  def listRelations(schema: String): Seq[Relation] = {
    if (!spark.catalog.databaseExists(schema)) return Nil
    // temp views also appear in listTables(db) but live outside any
    // schema (empty namespace) — the reference lists a schema's OWN
    // relations (information_schema.tables), so exclude them
    spark.catalog.listTables(schema).collect().toIndexedSeq
      .filterNot(_.isTemporary)
      .map { t =>
        val tpe =
          if (t.tableType == "VIEW") RelationType.View else RelationType.Table
        Relation(Option(t.catalog),
          Option(t.namespace).filter(_.nonEmpty).map(_.mkString(".")),
          t.name, tpe)
      }
  }

  /** list_schemas (adapters.sql:214-220). */
  def listSchemas(): Seq[String] =
    spark.catalog.listDatabases().collect().map(_.name).toIndexedSeq

  /** check_schema_exists (adapters.sql:223-231). */
  def schemaExists(schema: String): Boolean =
    spark.catalog.databaseExists(schema)

  /** create_schema / drop_schema. Trino lacks DROP SCHEMA CASCADE so the
    * reference enumerates and drops relations first (adapters.sql:172-185);
    * Spark has real CASCADE — used directly, same observable result. */
  def createSchema(schema: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $schema")
  def dropSchema(schema: String): Unit =
    spark.sql(s"DROP DATABASE IF EXISTS $schema CASCADE")

  /** get_catalog (catalog.sql:1-175): one row per column across the given
    * schemas — (table_database, table_schema, table_name, table_type,
    * column_name, column_index, column_type), ordered by ordinal. */
  def getCatalog(schemas: Seq[String]): DataFrame = {
    import spark.implicits._
    val rows = for {
      schema <- schemas
      rel <- listRelations(schema)
      (c, i) <- getColumnsInRelation(rel).zipWithIndex
    } yield (rel.catalog.getOrElse("spark_catalog"),
      rel.schema.getOrElse(schema), rel.identifier, rel.relType.name,
      c.name, i + 1, c.declaredType)
    rows.toDF("table_database", "table_schema", "table_name", "table_type",
      "column_name", "column_index", "column_type")
      .orderBy($"table_schema", $"table_name", $"column_index")
  }

  /** get_catalog_relations — the by-relation variant (catalog.sql:23-42,
    * 90-121, 151-175): same per-column rows as [[getCatalog]] but filtered
    * to an explicit relation list (dbt passes one on every docs generate).
    * The reference pushes `(table_schema, table_name)` pairs into the
    * information_schema WHERE clause (catalog.sql:151-175); here the
    * filter applies before any column introspection, so only the listed
    * relations are described. Matching is case-insensitive
    * (relation.py:11-13). */
  def getCatalogRelations(relations: Seq[Relation]): DataFrame = {
    import spark.implicits._
    // a schema-less relation refers to the current database (same
    // resolution Spark applies to the bare name)
    val resolved = relations.map(r =>
      if (r.schema.isEmpty) r.copy(schema = Some(spark.catalog.currentDatabase))
      else r)
    val wanted = resolved.map(r =>
      (r.schema.map(_.toLowerCase), r.identifier.toLowerCase)).toSet
    val bySchema = resolved.flatMap(_.schema).distinct
    val rows = for {
      schema <- bySchema
      rel <- listRelations(schema)
      if wanted.contains((rel.schema.map(_.toLowerCase),
        rel.identifier.toLowerCase))
      (c, i) <- getColumnsInRelation(rel).zipWithIndex
    } yield (rel.catalog.getOrElse("spark_catalog"),
      rel.schema.getOrElse(schema), rel.identifier, rel.relType.name,
      c.name, i + 1, c.declaredType)
    rows.toDF("table_database", "table_schema", "table_name", "table_type",
      "column_name", "column_index", "column_type")
      .orderBy($"table_schema", $"table_name", $"column_index")
  }

  // ---- comments (adapters.sql:196-211) ----

  def setTableComment(rel: Relation, comment: String): Unit =
    spark.sql(s"COMMENT ON TABLE ${rel.render} IS '${comment.replace("'", "''")}'")

  /** Per-column comments; only for columns that exist (adapters.sql:207). */
  def setColumnComments(rel: Relation, comments: Map[String, String]): Unit = {
    val existing = spark.table(rel.render).columns.map(_.toLowerCase).toSet
    comments.foreach { case (c, txt) =>
      if (existing(c.toLowerCase))
        spark.sql(s"ALTER TABLE ${rel.render} ALTER COLUMN $c COMMENT '${txt.replace("'", "''")}'")
    }
  }

  // ---- grants (apply_grants.sql) ----
  // OSS Spark has no SQL-standard authorization; grants are recorded as
  // intent (SURVEY §2.3 disposition), honoring the reference's shape:
  // one grant per grantee (apply_grants.sql:29-37), revoke+grant diffing.

  private val grants =
    mutable.Map.empty[String, mutable.Map[String, Set[String]]]

  /** apply_grants with dbt-core's `should_revoke` protocol:
    *  - `shouldRevoke = true` (object survived — incremental run, view
    *    replace): read current grants back, revoke what's no longer
    *    wanted, grant what's missing (diff_of_two_dicts both ways);
    *  - `shouldRevoke = false` (object is new, or fully replaced with
    *    `copy_grants() = False`, apply_grants.sql:11-23): no read-back,
    *    grant-only pass over the wanted config.
    * One grantee per DCL statement (apply_grants.sql:25-45) — modeled
    * here as per-grantee set updates on the intent record. */
  def applyGrants(rel: Relation, wanted: Map[String, Set[String]],
                  shouldRevoke: Boolean = true): Unit = {
    val key = rel.render.toLowerCase
    val cur = grants.getOrElseUpdate(key, mutable.Map.empty)
    if (shouldRevoke) {
      // revoke what's no longer wanted, grant what's missing — one
      // grantee at a time, as the reference does
      for ((priv, grantees) <- cur.toSeq; g <- grantees
           if !wanted.get(priv).exists(_.contains(g)))
        cur(priv) = cur(priv) - g
    }
    for ((priv, grantees) <- wanted; g <- grantees)
      cur(priv) = cur.getOrElse(priv, Set.empty) + g
  }

  /** A fully-replaced object loses its grants (`copy_grants() = False` —
    * apply_grants.sql:11-23: grants are never copied on replace). The
    * materializer calls this on every replace before re-applying the
    * model's grant config. */
  def clearGrants(rel: Relation): Unit =
    grants.remove(rel.render.toLowerCase)

  def showGrants(rel: Relation): Map[String, Set[String]] =
    grants.get(rel.render.toLowerCase)
      .map(_.toMap.filter(_._2.nonEmpty)).getOrElse(Map.empty)
}
