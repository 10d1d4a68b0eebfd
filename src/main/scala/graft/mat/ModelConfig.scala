package graft.mat

/** The slice of a dbt model's config the materialization state machines
  * consume: hooks, grants, persist_docs, and table properties.
  *
  * Reference: `table.sql:30,62-67` (hook/docs/grants order for table),
  * `incremental.sql:39-106` (its different order: post-hooks before
  * grants before docs), `adapters.sql:277-295` (view), `adapters.sql:
  * 81-110` (`properties(...)` → `WITH (k = v, ...)`),
  * `apply_grants.sql:1-45` (grant/revoke protocol, one grantee per
  * statement, `copy_grants() = False`).
  */
final case class ModelConfig(
    /** `pre_hook` SQL statements, run before the main build. */
    preHooks: Seq[String] = Nil,
    /** `post_hook` SQL statements, run after the build (table: after
      * docs+grants; incremental: before grants+docs — reference order). */
    postHooks: Seq[String] = Nil,
    /** `grants`: privilege → grantees. Empty map = unmanaged (dbt skips
      * apply_grants entirely, leaving existing grants untouched). */
    grants: Map[String, Set[String]] = Map.empty,
    /** Model description → relation comment when [[persistDocs]]. */
    description: Option[String] = None,
    /** Column descriptions → column comments when [[persistDocs]]. */
    columnComments: Map[String, String] = Map.empty,
    /** dbt `persist_docs` switch (comment() macro, adapters.sql:92-101). */
    persistDocs: Boolean = false,
    /** `properties` config → `WITH (...)` / TBLPROPERTIES
      * (adapters.sql:102-110, materialized_view.sql:4). */
    properties: Map[String, String] = Map.empty)

object ModelConfig {
  val empty: ModelConfig = ModelConfig()
}
