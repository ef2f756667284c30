package graft

/** Shared helpers for the streaming twins. */
package object streaming {

  /** Microsecond epoch of a Timestamp — the precision the BATCH twins
    * order by (`events.ts` is TIMESTAMP_MICROS), so every streaming
    * twin's `(ts, …)` sort key must use it too. ONE definition (r10
    * review: four identical private copies, plus StreamingAsof
    * truncating to milliseconds — sub-millisecond event pairs there
    * sorted by (side, id) instead of time, diverging view attribution
    * from the batch plan). */
  private[streaming] def tsMicros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
}
