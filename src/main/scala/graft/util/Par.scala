package graft.util

import org.apache.spark.sql.DataFrame

/** Parallelism plumbing shared by the CPU-heavy operators. */
object Par {

  /** Decouple compute parallelism from input split count.
    *
    * A small table (one parquet file, one row-group) arrives as ONE
    * partition, which pins every downstream map-side stage — shingling,
    * hashing, vector math — to a single core no matter how many the
    * cluster has. `spread` repartitions UP to the session default
    * parallelism when (and only when) the plan has fewer partitions;
    * inputs that already carry enough splits (the 100 TB case) pass
    * through untouched, so no gratuitous shuffle is ever added.
    *
    * The split count is ESTIMATED from optimizer statistics
    * (size-in-bytes / maxPartitionBytes) rather than materializing
    * `df.rdd`: the RDD conversion forces full physical planning of the
    * upstream plan at build time for every spread call — cheap on toy
    * plans, avoidable overhead on 100×-complexity ones. The estimate
    * errs small only near the boundary, where an extra repartition of
    * an already-small input costs little.
    */
  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    val maxSplit = math.max(1L, spark.sessionState.conf.filesMaxPartitionBytes)
    val sizeBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val estSplits = (sizeBytes / maxSplit).toLong + 1
    if (estSplits < p) df.repartition(p) else df
  }
}
