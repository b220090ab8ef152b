package graft.ops

/** The pluggable frame-feature model contract — what a deployment
  * implements to run a REAL vision tower inside the `frame-features`
  * curation stage (config: `model-class = "com.example.Tower"`,
  * no-arg constructor; the instance is built once on the driver at
  * assembly and ships serialized to executors).
  *
  * Called with BOUNDED batches of (frame blob, frame index) pairs —
  * the [[BatchInfer]] transport — and must return exactly one
  * feature string per input pair. The model must be ROW-LOCAL
  * (feature_i depends only on pair_i): batch boundaries depend on
  * partitioning, so a cross-pair model would make output depend on
  * the shuffle and break replay/oracle determinism. */
trait FrameFeatureModel extends Serializable {
  def featureBatch(frames: Seq[(Array[Byte], Int)]): Seq[String]
}
