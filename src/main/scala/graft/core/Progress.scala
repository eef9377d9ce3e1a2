package graft.core

/** Progress-reporting shim mirroring the reference's module-level
  * listener (feldman.py:28-39): a host UI registers a listener, the
  * pipelines report coarse progress, everything is a no-op when unset.
  *
  * The reference reports per-row because pandas iterates rows on the
  * driver; here whole phases execute as single Spark actions, so the
  * natural granularity is the phase boundary — same signal ("what is
  * the pipeline doing and roughly how far along"), honest about the
  * execution model.
  */
object Progress {

  trait Listener {
    def setValueAndText(value: Double, text: String): Unit
    def clear(): Unit
  }

  @volatile private var listener: Option[Listener] = None

  /** feldman.py:30-34 — registering clears the listener's display. */
  def setProgressListener(pl: Listener): Unit = { listener = Some(pl); pl.clear() }

  def clearProgressListener(): Unit = listener = None

  /** feldman.py:36-39 — silently dropped when no listener is set. */
  def report(value: Double, text: String): Unit =
    listener.foreach(_.setValueAndText(value, text))
}
