package graft

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Property

/** Captures Spark `CodeGenerator` ERROR events while a block runs — the
  * detection half of the VERDICT r16 #2 pin. Spark's janino compile
  * failures are SILENT at the result level (it falls back to interpreted
  * execution and the query still answers correctly); the only artifact is
  * the ERROR log line. A spec that wants to assert "this plan runs
  * compiled, not interpreted" runs the action under [[collect]] and
  * asserts the returned list is empty.
  */
object CodegenTrap {
  def collect[T](body: => T): (T, Seq[String]) = {
    val msgs = scala.collection.mutable.ArrayBuffer.empty[String]
    val app = new AbstractAppender("graft-codegen-trap", null, null, true,
        Property.EMPTY_ARRAY) {
      override def append(ev: LogEvent): Unit =
        if (ev.getLevel.isMoreSpecificThan(Level.ERROR) &&
            ev.getLoggerName.contains("CodeGenerator"))
          msgs.synchronized {
            msgs += ev.getMessage.getFormattedMessage
          }
    }
    app.start()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    cfg.getRootLogger.addAppender(app, Level.ERROR, null)
    ctx.updateLoggers()
    try {
      val out = body
      (out, msgs.synchronized(msgs.toSeq))
    } finally {
      cfg.getRootLogger.removeAppender("graft-codegen-trap")
      ctx.updateLoggers()
      app.stop()
    }
  }
}
