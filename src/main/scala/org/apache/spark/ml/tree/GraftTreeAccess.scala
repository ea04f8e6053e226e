package org.apache.spark.ml.tree

/** Narrow access shim: MLlib's `Node.impurityStats` (per-node weighted
  * sample counts) is `private[ml]`, but tree-traversal importances (M5:
  * cover/total_cover) and TreeSHAP (M3) need the node weights that
  * MLlib's own `featureImportances` uses internally. This file lives in
  * the `org.apache.spark.ml.tree` package purely to re-export that one
  * accessor; nothing here alters Spark behavior.
  */
object GraftTreeAccess {
  /** Weighted number of training samples that reached this node. */
  def nodeCount(n: Node): Double = n.impurityStats.count.toDouble

  def split(n: InternalNode): Split = n.split

  /** Continuous-split threshold; genotype/feature matrices are all
    * continuous (§1.2), categorical splits are rejected upstream. */
  def threshold(s: Split): Double = s match {
    case c: ContinuousSplit => c.threshold
    case other => throw new IllegalArgumentException(
      s"only continuous splits supported, got ${other.getClass.getSimpleName}")
  }
}
