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
    */
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
