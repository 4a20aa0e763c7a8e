package graft

/** The reference module's data-semantics config surface, 1:1
  * (/root/reference/variables.tf:1-96, read as env vars at
  * /root/reference/lambda/main.py:23-36). Infra-only knobs (memory, timeout,
  * runtime, tags, ...) have no meaning here and are omitted.
  */
case class PipelineConfig(
    pathPrefix: String = "logs",            // LOG_S3_PREFIX
    logIdField: String = "log_id",          // LOG_ID_FIELD      (variables.tf:55-58)
    logTypeField: String = "log_type",      // LOG_TYPE_FIELD    (variables.tf:60-63)
    timestampField: String = "time",        // LOG_TIMESTAMP_FIELD (variables.tf:70-73)
    unknownPrefix: String = "unknown",      // LOG_TYPE_UNKNOWN_PREFIX (variables.tf:65-68)
    whitelist: Seq[String] = Nil,           // LOG_TYPE_WHITELIST; empty ⇒ process all
    timezone: String = "UTC",               // TZ (variables.tf:1-4) — partition path rendering
    timestampRequired: Boolean = true,      // lambda/main.py:63
    // Deterministic fallback partition date for failed records whose `time`
    // is absent/unparseable (the reference keys those by arrival time; we
    // inject the "arrival" clock so tests are reproducible).
    fallbackDate: String = "1970-01-01")

object PipelineConfig {

  /** Build from the reference's env-var names. Implements the DOCUMENTED
    * whitelist semantics ("if empty, all log types will be processed",
    * /root/reference/README.md:70): an unset or empty LOG_TYPE_WHITELIST
    * yields an empty list. The reference code as written turns "" into the
    * one-element set {""} via `"".split(",")` (lambda/main.py:32-36 — its
    * `len==0` branch is dead code); SURVEY.md §2.1 O8 flags this as a bug,
    * and we encode the intent, with the divergence unit-tested.
    */
  def fromEnv(env: Map[String, String]): PipelineConfig = {
    val wl = env.getOrElse("LOG_TYPE_WHITELIST", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    PipelineConfig(
      pathPrefix = env.getOrElse("LOG_S3_PREFIX", "logs"),
      logIdField = env.getOrElse("LOG_ID_FIELD", "log_id"),
      logTypeField = env.getOrElse("LOG_TYPE_FIELD", "log_type"),
      timestampField = env.getOrElse("LOG_TIMESTAMP_FIELD", "time"),
      unknownPrefix = env.getOrElse("LOG_TYPE_UNKNOWN_PREFIX", "unknown"),
      whitelist = wl,
      timezone = env.getOrElse("TZ", "UTC"))
  }
}
