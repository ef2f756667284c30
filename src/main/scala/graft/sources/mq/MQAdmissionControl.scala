package graft.sources.mq

import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}

/** Shared admission-control / Trigger.AvailableNow contract of the MQ
  * sources — ONE definition (r12 review: [[SpoolMQStream]] and
  * [[HttpMQStream]] carried the ~30-line cap/drain block byte-for-byte;
  * the next read-limit fix would have had to land twice or silently
  * diverge the two flavors the format-string-swap contract promises
  * are identical).
  *
  * NATIVE Trigger.AvailableNow support: Spark's fallback wrapper for
  * non-native sources IGNORES read limits (its latestOffset returns
  * the prepared target verbatim), so the cap only holds if the source
  * prepares its own drain target and bounds each batch itself.
  *
  * Implementors supply [[tailNow]] (the uncapped current message
  * count) and `maxPerTrigger`.
  */
private[mq] trait MQAdmissionControl
    extends MicroBatchStream
    with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  /** Uncapped current tail — message count visible at the transport. */
  protected def tailNow(): Long
  protected def maxPerTrigger: Long

  private var availableTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableTarget = Some(tailNow())
  override def initialOffset(): Offset = SpoolOffset(0L)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(maxPerTrigger)
  /** The TRUE tail, uncapped — Trigger.AvailableNow's wrapper captures
    * this as the drain target, then the capped latestOffset below
    * advances toward it batch by batch. */
  override def reportLatestOffset(): Offset = SpoolOffset(tailNow())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val rawTail = tailNow()
    val a = start.asInstanceOf[SpoolOffset].n
    // TAIL-REWIND GUARD (r12 review): offsets are message COUNTS, so
    // the transport's tail must be monotone. A tail below the
    // checkpointed start means messages were REMOVED under a live
    // checkpoint (spool files deleted; a broker that truncated past
    // the committed offset) — the offset→message mapping is broken and
    // silently continuing would skip and/or re-deliver. Fail the
    // trigger loudly instead (the r10 listing-failure guard covered
    // only the cannot-list case; this covers the listed-but-shrunk
    // case).
    if (rawTail < a)
      throw new IllegalStateException(
        s"mq tail $rawTail is below the checkpointed offset $a - messages were " +
          "removed under a live checkpoint, which remaps offset->message; " +
          "restore the removed messages or reset the checkpoint")
    val tail = availableTarget.fold(rawTail)(t => math.min(rawTail, t))
    // ReadAllAvailable is UNCAPPED — Trigger.AvailableNow's wrapper
    // fixes its drain target by calling this with allAvailable();
    // treating it as the default cap froze the whole drain at one
    // batch's worth. Saturating arithmetic: a + maxRows may overflow.
    val end = limit match {
      case r: ReadMaxRows =>
        if (tail - a <= r.maxRows()) tail else a + r.maxRows()
      case _: org.apache.spark.sql.connector.read.streaming.ReadAllAvailable => tail
      case _ => if (tail - a <= maxPerTrigger) tail else a + maxPerTrigger
    }
    SpoolOffset(end)
  }

  override def deserializeOffset(json: String): Offset = SpoolOffset(json.toLong)
  /** Non-destructive ack — consumed messages stay for replay/audit. */
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
