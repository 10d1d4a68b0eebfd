package graft.model

import org.apache.spark.sql.SparkSession

/** The reference's connection/session profile surface (SURVEY §1.4,
  * reference connections.py:83-99,281-300) mapped onto one local
  * SparkSession:
  *
  *  - `catalog`/`schema` → current database (created if absent);
  *  - `timezone` → `spark.sql.session.timeZone`;
  *  - `session_properties` → recorded under `spark.graft.session.*`
  *    (Trino engine knobs like query_max_run_time have no Spark twin —
  *    recorded for introspection, documented no-op, mirroring how the
  *    adapter forwards them opaquely);
  *  - `threads` → N/A: dbt used N client threads against a remote
  *    engine; Spark's own scheduler IS the parallelism;
  *  - auth (JWT/email/password), http_headers, retries → wire-protocol
  *    concerns with no local meaning (N/A, SURVEY §2.3 disposition).
  */
final case class Profile(
    catalog: Option[String] = None,
    schema: Option[String] = None,
    sessionProperties: Map[String, String] = Map.empty,
    timezone: Option[String] = None,
    threads: Int = 1)

object Profile {

  /** Apply the profile's locally-meaningful knobs to the session. */
  def configure(spark: SparkSession, p: Profile): Unit = {
    p.timezone.foreach(tz =>
      spark.conf.set("spark.sql.session.timeZone", tz))
    p.sessionProperties.foreach { case (k, v) =>
      spark.conf.set(s"spark.graft.session.$k", v)
    }
    p.schema.foreach { sc =>
      if (!spark.catalog.databaseExists(sc))
        spark.sql(s"CREATE DATABASE $sc")
      spark.catalog.setCurrentDatabase(sc)
    }
  }

  /** Read back a recorded session property. */
  def sessionProperty(spark: SparkSession, key: String): Option[String] =
    spark.conf.getOption(s"spark.graft.session.$key")
}
