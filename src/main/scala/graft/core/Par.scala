package graft.core

import org.apache.spark.sql.DataFrame

/** Input-parallelism floor for compute-heavy narrow kernels.
  *
  * The driver testdata ships each table as ONE parquet file with ONE row
  * group, so every scan is a single unsplittable split — the
  * optimization guide's "input skew" case (§2.5: one huge unsplittable
  * file → repartition immediately after the read). Everything narrow
  * above such a scan (tokenize, shingle-hash, n-gram kernels, vector
  * math, map-side partial aggregation) runs in ONE task regardless of
  * executor cores: at local[32] the whole cluster idles behind one
  * thread until the first exchange.
  *
  * [[ensure]] floors a frame's partition count at the session's default
  * parallelism with one deterministic round-robin exchange
  * (sort-before-repartition keeps row→partition assignment stable under
  * retries). It is a NO-OP whenever the input already has that many
  * partitions — the production / 100 TB case, where scans have thousands
  * of splits — so the extra exchange exists exactly where the scan
  * itself cannot provide parallelism, and the plan at scale is unchanged.
  * Callers place it UNDER a per-row kernel whose cost dominates the
  * bytes moved (raw rows cross the exchange once; the kernel then runs
  * on all cores).
  */
object Par {
  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
