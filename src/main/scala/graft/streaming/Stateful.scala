package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Spark 4 arbitrary-state streaming (`transformWithState`, the
  * successor of mapGroupsWithState): typed per-key state handles backed
  * by the RocksDB state store. Used here for incremental corpus
  * accounting — the running (documents, tokens) totals per source that
  * a continuously-ingesting training pipeline reports after every
  * micro-batch.
  *
  * Scale: state is one (Long, Long) per source key in RocksDB —
  * off-heap, incrementally checkpointed; emitting only on update keeps
  * the output stream proportional to the number of ACTIVE keys per
  * batch, not total keys.
  */
object Stateful {

  final case class DocEvent(source: String, n_tokens: Long)
  final case class SourceTotals(source: String, n_docs: Long,
                                n_tokens: Long)

  /** Running per-source totals; emits the updated totals for each key
    * that received rows in the micro-batch.
    */
  class CorpusTotalsProcessor
      extends StatefulProcessor[String, DocEvent, SourceTotals] {

    @transient private var totals: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Long)]("totals",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[DocEvent],
                                 timerValues: TimerValues)
        : Iterator[SourceTotals] = {
      val (d0, t0) = if (totals.exists()) totals.get() else (0L, 0L)
      var d = d0
      var t = t0
      rows.foreach { e => d += 1; t += e.n_tokens }
      totals.update((d, t))
      Iterator.single(SourceTotals(key, d, t))
    }
  }

  /** Wire a typed doc-event stream through the processor.
    * Requires the RocksDB state store provider:
    * `spark.sql.streaming.stateStore.providerClass =
    *  org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`
    */
  def runningTotals(events: Dataset[DocEvent]): Dataset[SourceTotals] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.source)
      .transformWithState(new CorpusTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
