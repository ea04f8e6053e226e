package graft.util

/** Single source of truth for where self-test fixtures land: relative to
  * the process working directory by default (the repo root for sbt and
  * the driver), overridable for environments with a read-only checkout.
  */
object Fixtures {
  lazy val dir: String =
    sys.env.getOrElse("GRAFT_FIXTURE_DIR", "target/fixtures")
}
