package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession construction for the Verify/Bench mains and tests.
  *
  * Settings that matter:
  *  - shuffle.partitions sized to local cores (not the 200 default);
  *  - AQE on: runtime partition coalescing + skew-join splitting is the
  *    posture we want at 100 TB, so we test under it;
  *  - UTC session timezone for oracle parity;
  *  - nanosAsLong: early fixture generations shipped events.ts as
  *    TIMESTAMP(NANOS) parquet, which Spark's reader otherwise rejects;
  *    [[Tables.events]] normalizes every encoding the driver has used
  *    (nanos-long AND the round-10 TIMESTAMP(MICROS)/NTZ form).
  */
object Sessions {
  def local(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // point-lookup pushdown: the incremental reconcile's closure
      // hops push collected key sets as IN filters into the parquet
      // scans of the sh64-sorted postings / id-sorted doc_shingles
      // folds. Above this threshold Spark degrades IN to a [min,max]
      // range filter, which prunes NOTHING for uniformly-hashed keys —
      // the whole file-group-pruning design rides on the native IN
      // predicate reaching the footer stats, so the threshold must sit
      // above the frontier guard's key bound.
      .config("spark.sql.parquet.pushdown.inFilterThreshold", "1000000")
      // streaming state on RocksDB: keyed state (cross-batch compaction,
      // corpus dedup, quotas, sketches) must be disk-backed with bounded
      // heap at real key cardinalities — the in-memory default holds
      // every key on-heap. Tests run under the same provider production
      // would use.
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
