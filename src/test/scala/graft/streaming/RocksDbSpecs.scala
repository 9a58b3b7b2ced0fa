package graft.streaming

/** The full streaming suites re-run under RocksDB state storage.
  *
  * The default HDFS-backed provider keeps every state map on the JVM heap;
  * at 100 TB-scale key cardinality (one state entry per (band, bucket) for
  * the dedup index, per key for the pattern machines) the heap is the
  * limit, and the production deployment runs
  * `spark.sql.streaming.stateStore.providerClass =
  * RocksDBStateStoreProvider` instead (off-heap, spills to local SSD,
  * changelog-checkpoints to the fault-tolerant store). RocksDB round-trips
  * state through UnsafeRow serialization on EVERY access rather than
  * holding live JVM objects, so any encoder / mutable-state-object gap in
  * our `flatMapGroupsWithState` machines that the on-heap provider would
  * mask surfaces here — including across the checkpoint-restart tests,
  * which exercise RocksDB snapshot upload + recovery.
  */
class StreamingRocksDbSpec extends StreamingSpec {
  override protected def stateStoreProvider: Option[String] =
    Some("org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
}

/** [[StreamingDedupSpec]] under RocksDB state storage — see
  * [[StreamingRocksDbSpec]].
  */
class StreamingDedupRocksDbSpec extends StreamingDedupSpec {
  override protected def stateStoreProvider: Option[String] =
    Some("org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
}

/** [[StreamingAsofSpec]] under RocksDB state storage — see
  * [[StreamingRocksDbSpec]].
  */
class StreamingAsofRocksDbSpec extends StreamingAsofSpec {
  override protected def stateStoreProvider: Option[String] =
    Some("org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
}

/** [[StreamingIntervalSpec]] under RocksDB state storage — the
  * Array[IvWindow]-valued state round-trips through UnsafeRow here.
  */
class StreamingIntervalRocksDbSpec extends StreamingIntervalSpec {
  override protected def stateStoreProvider: Option[String] =
    Some("org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
}

/** [[StreamingSketchSpec]] under RocksDB state storage — the
  * Array[Long]-valued KMV survivor state round-trips through UnsafeRow.
  */
class StreamingSketchRocksDbSpec extends StreamingSketchSpec {
  override protected def stateStoreProvider: Option[String] =
    Some("org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
}

/** [[StreamingCusumSpec]] under RocksDB state storage. */
class StreamingCusumRocksDbSpec extends StreamingCusumSpec {
  override protected def stateStoreProvider: Option[String] =
    Some("org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
}

/** [[StreamingEwmaSpec]] under RocksDB state storage. */
class StreamingEwmaRocksDbSpec extends StreamingEwmaSpec {
  override protected def stateStoreProvider: Option[String] =
    Some("org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
}

/** [[StreamingTopKSpec]] under RocksDB state storage. */
class StreamingTopKRocksDbSpec extends StreamingTopKSpec {
  override protected def stateStoreProvider: Option[String] =
    Some("org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
}

/** [[StreamingQuantileSpec]] under RocksDB state storage — the parallel
  * (Array[Long], Array[Double]) sample state round-trips through UnsafeRow.
  */
class StreamingQuantileRocksDbSpec extends StreamingQuantileSpec {
  override protected def stateStoreProvider: Option[String] =
    Some("org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
}

/** [[StreamingReorderSpec]] under RocksDB state storage — the ordered
  * variants' pending-buffer arrays (Array[AsofPend] etc.) round-trip
  * through UnsafeRow here, including across the checkpoint restart with
  * events still pending in the reorder buffer.
  */
class StreamingReorderRocksDbSpec extends StreamingReorderSpec {
  override protected def stateStoreProvider: Option[String] =
    Some("org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
}

/** [[CorpusRelationalStreamSpec]] under RocksDB state storage — the
  * corpus-replay lock for the relational asof/interval streams (verdict
  * r11 item 8).
  */
class CorpusRelationalStreamRocksDbSpec extends CorpusRelationalStreamSpec {
  override protected def stateStoreProvider: Option[String] =
    Some("org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
}

/** [[StreamingSampleSpec]] under RocksDB state storage — the (md5-hex
  * string, id) survivor arrays round-trip through UnsafeRow here.
  */
class StreamingSampleRocksDbSpec extends StreamingSampleSpec {
  override protected def stateStoreProvider: Option[String] =
    Some("org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
}

/** [[StreamingTrendSpec]] under RocksDB state storage. */
class StreamingTrendRocksDbSpec extends StreamingTrendSpec {
  override protected def stateStoreProvider: Option[String] =
    Some("org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
}
