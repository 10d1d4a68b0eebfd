package graft.model

import org.apache.spark.SparkException

/** The reference's exception taxonomy (connections.py:236-258, verified
  * by its test_adapter.py:87-116) re-anchored on Spark's exceptions:
  *
  *  - trino `ProgrammingError`   → `DbtDatabaseError`   ≙ [[DatabaseError]]
  *    (bad SQL / bad relation — Spark `AnalysisException`, parse errors)
  *  - `OperationalError("Failed to establish…")` → `FailedToConnectError`
  *    ≙ [[ConnectError]] (source unreachable — missing path/file)
  *  - anything else              → `DbtRuntimeError`    ≙ [[RuntimeError]]
  */
sealed abstract class GraftError(msg: String, cause: Throwable)
    extends RuntimeException(msg, cause)

final class DatabaseError(msg: String, cause: Throwable)
    extends GraftError(msg, cause)
final class ConnectError(msg: String, cause: Throwable)
    extends GraftError(msg, cause)
final class RuntimeError(msg: String, cause: Throwable)
    extends GraftError(msg, cause)

object Errors {

  /** Run `body`, translating engine exceptions per the taxonomy. */
  def translate[T](body: => T): T =
    try body
    catch {
      case e: GraftError => throw e
      case e: org.apache.spark.sql.AnalysisException
          if Option(e.getCondition).exists(_.contains("PATH_NOT_FOUND")) ||
            e.getMessage.contains("Path does not exist") =>
        // Spark reports an unreachable source as an analysis error;
        // the reference classes it as a connect failure
        throw new ConnectError(e.getMessage, e)
      case e: org.apache.spark.sql.AnalysisException =>
        // includes PARSE_SYNTAX_ERROR, unresolved relations/columns —
        // the ProgrammingError class of failures
        throw new DatabaseError(e.getMessage, e)
      case e: java.io.FileNotFoundException =>
        throw new ConnectError(e.getMessage, e)
      case e: SparkException
          if e.getMessage != null &&
            (e.getMessage.contains("Path does not exist") ||
              e.getMessage.contains("FileNotFound")) =>
        throw new ConnectError(e.getMessage, e)
      case scala.util.control.NonFatal(e) =>
        throw new RuntimeError(String.valueOf(e.getMessage), e)
    }
}
