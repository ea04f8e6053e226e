package graft.util

/** P7 — CLI-surface scalar coercion (reference `daxos/utils.py:5-29`,
  * `scripts/predict.py:138`): permissive bool parsing, None-like
  * detection, and path normalization (collapse duplicate slashes). Not
  * an engine op — config-layer hygiene shared by the entry points.
  */
object Config {

  /** "true"/"t"/"yes"/"y"/"1" → true; "false"/"f"/"no"/"n"/"0" → false;
    * case/whitespace-insensitive; anything else is an error (silent
    * false for a typo'd "ture" is how configs rot). */
  def parseBool(s: String): Boolean = s.trim.toLowerCase match {
    case "true" | "t" | "yes" | "y" | "1" => true
    case "false" | "f" | "no" | "n" | "0" => false
    case other => throw new IllegalArgumentException(s"not a bool: '$other'")
  }

  /** "none"/"null"/"" → None, else Some(trimmed). */
  def parseOpt(s: String): Option[String] = s.trim match {
    case "" => None
    case v if v.equalsIgnoreCase("none") || v.equalsIgnoreCase("null") => None
    case v => Some(v)
  }

  /** Collapse runs of '/' (keeps a leading scheme's "//", e.g.
    * hdfs://, s3a://). */
  def normalizePath(p: String): String = {
    val schemeSplit = p.split("://", 2)
    if (schemeSplit.length == 2)
      schemeSplit(0) + "://" + schemeSplit(1).replaceAll("/{2,}", "/")
    else p.replaceAll("/{2,}", "/")
  }
}
