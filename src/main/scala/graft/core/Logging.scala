package graft.core

import org.slf4j.{Logger, LoggerFactory}

/** S14: per-class slf4j/log4j2 logger — the working version of the
  * reference's LoggingMixin (whose log4j branch could never run outside a
  * notebook, B8). @transient so closures serialize cleanly. */
trait Logging {
  @transient protected lazy val logger: Logger =
    LoggerFactory.getLogger(getClass.getName.stripSuffix("$"))
}
