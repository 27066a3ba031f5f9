package graft.util

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{Filter, LoggerContext}
import org.apache.logging.log4j.core.config.LoggerConfig
import org.apache.logging.log4j.core.filter.RegexFilter

/** Targeted log suppression for the harness mains (Bench/Verify).
  *
  * Freeing a superseded CC round's localCheckpoint emits one expected
  * WARN per unpersist ("... truncated and cannot be recomputed after
  * unpersisting") — by design: that RDD is never referenced again
  * (graft.text.Dedup round lifecycle). Earlier rounds silenced the
  * whole `MapPartitionsRDD` logger at ERROR, which also hid any
  * UNexpected persistence/recomputation warning from every RDD of that
  * class in the session (ADVICE r7). This installs a message-scoped
  * RegexFilter instead: only the expected truncation line is dropped;
  * every other WARN from the same logger still surfaces.
  */
object LogFilters {

  /** Matches the deliberate-unpersist truncation WARN from
    * org.apache.spark.rdd.RDD#unpersist on a localCheckpointed RDD. */
  private val TruncationRegex =
    ".*truncated and cannot be recomputed after unpersisting.*"

  def suppressExpectedCheckpointTruncationWarns(): Unit = {
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val conf = ctx.getConfiguration
    // the WARN is logged by the concrete RDD subclass's logger
    // (MapPartitionsRDD today) — attach at the PACKAGE ancestor
    // instead: every o.a.s.rdd.* subclass logger resolves here, so the
    // filter keeps working if a plan change materializes the
    // checkpoint as a different RDD class (CoalescedRDD, ShuffledRDD,
    // ...), and the regex still confines suppression to the one
    // expected message (non-matching WARNs pass as NEUTRAL). ADVICE r8.
    val loggerName = "org.apache.spark.rdd"
    // DEPENDENCY PIN: this createFilter(String, String[], Boolean,
    // Result, Result) factory is deprecated log4j-core API — present in
    // Spark 4.1.2's bundled log4j 2.24.x, removed/reworked in 2.25+.
    // On a Spark/log4j bump, rebuild via RegexFilter.newBuilder().
    val filter = RegexFilter.createFilter(
      TruncationRegex, null, java.lang.Boolean.FALSE,
      Filter.Result.DENY, Filter.Result.NEUTRAL)
    val existing = conf.getLoggerConfig(loggerName)
    val lc =
      if (existing.getName == loggerName) existing
      else {
        // WARN = the root level the harness runs at; only the regex
        // narrows what this logger emits relative to its siblings
        val created = new LoggerConfig(loggerName, Level.WARN, true)
        conf.addLogger(loggerName, created)
        created
      }
    lc.addFilter(filter)
    ctx.updateLoggers()
  }
}
