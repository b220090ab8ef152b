package graft.ops

/** Thrown by the kernel compile gates ([[NbClassifier.compileBinary]],
  * [[LangModel.compileModel]]) when the pruned model exceeds
  * `maxModelRows`. A DEDICATED type so callers with a relational
  * fallback (the `nb-filter`/`lm-filter` curation stages) can catch
  * exactly the size gate and let every other
  * `IllegalArgumentException` — a malformed key, a bad parameter —
  * propagate as the misconfiguration it is instead of silently
  * downgrading to the join path. */
final class ModelTooLargeException(msg: String)
    extends IllegalArgumentException(msg)
