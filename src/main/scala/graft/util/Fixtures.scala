package graft.util

/** Single source of truth for where self-test fixtures land: relative to
  * the process working directory by default (the repo root for sbt and
  * the driver), overridable for environments with a read-only checkout.
  */
object Fixtures {
  lazy val dir: String =
    sys.env.getOrElse("GRAFT_FIXTURE_DIR", "target/fixtures")

  /** Path-safe tag of an sf data directory. Scopes per-run oracle-side
    * dumps (the a12/mm2-family exact-side-dump pattern) by the sf they
    * were computed from, so two Verify runs sharing a cwd — the
    * x10/x100 pair, or sf0.01 beside sf0.1 — can never clobber each
    * other's dumps between the engine run and the DuckDB compare
    * (r13 advice). The oracle SQL carries the literal `{{SF_TAG}}`
    * placeholder; Verify substitutes this tag when it writes
    * oracle_sql.json, so the driver's DuckDB reads exactly the files
    * the same run's engine query wrote. */
  def sfTag(sfDir: String): String =
    sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
}
