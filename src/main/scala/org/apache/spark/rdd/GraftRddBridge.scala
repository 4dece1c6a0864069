package org.apache.spark.rdd

/** `private[rdd]` access shim (same pattern as graftbridge):
  * `RDD.isLocallyCheckpointed` tells Checkpoints.cut which RDDs of its
  * registration delta are the cut's own localCheckpoint blocks, as
  * opposed to cache RDDs that happened to first materialize — and so
  * register — inside the cut's eager job (ADVICE r11). Cache RDDs are
  * never locally checkpointed, so the predicate separates the two
  * exactly.
  */
object GraftRddBridge {
  def isLocallyCheckpointed(rdd: RDD[_]): Boolean = rdd.isLocallyCheckpointed
}
