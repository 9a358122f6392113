package graft.model

/** SQL-identifier validation for every surface that interpolates a name
  * into SQL or an object-store path (ref internal/api/services/query.go:
  * 18-53: `^[a-zA-Z_][a-zA-Z0-9_]*$`, rejected BEFORE any SQL is built,
  * to prevent injection). Shared by the catalog DDL entry points (S11)
  * and the ingest router's table validation (whose violations
  * dead-letter as the `validation` class).
  */
object Identifiers {

  private val Re = "^[A-Za-z_][A-Za-z0-9_]*$".r

  /** Returns the name if valid; throws IllegalArgumentException (the
    * DLQ's `validation` error class) otherwise. `kind` labels the
    * message like the reference's identifierType. */
  def validate(name: String, kind: String): String = {
    require(name != null && name.nonEmpty, s"$kind name cannot be empty")
    require(Re.matches(name),
      s"invalid $kind name: must contain only alphanumeric characters " +
        "and underscores, and start with a letter or underscore")
    name
  }

  def isValid(name: String): Boolean =
    name != null && Re.matches(name)
}
