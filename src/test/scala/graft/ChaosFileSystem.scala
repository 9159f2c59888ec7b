package graft

import java.io.{IOException, OutputStream}
import java.net.URI
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}
import org.apache.hadoop.fs.{Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Failure-injecting local filesystem for the chaos suite (test-only analog of
  * the reference's chaos_suite/ fault points). Registered under the `chaos:`
  * scheme via META-INF/services so every `FileSystem.get` — Spark tasks,
  * Manifest.save's fresh Configuration, binaryFile scans — resolves it without
  * per-Configuration wiring. Paths behave exactly like the local FS (no CRC
  * sidecars, RawLocalFileSystem), except that `create` throws once when armed.
  */
class ChaosFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "chaos"
  override def getUri: URI = URI.create("chaos:///")

  override protected def createOutputStreamWithMode(
      f: Path, append: Boolean, permission: FsPermission): OutputStream = {
    ChaosFileSystem.maybeFail(f)
    super.createOutputStreamWithMode(f, append, permission)
  }
}

object ChaosFileSystem {
  private val segmentCreates = new AtomicInteger(0)
  private val remainingFailures = new AtomicInteger(0)
  private val firedCount = new AtomicInteger(0)
  @volatile private var failAtSegmentCreate: Int = -1

  /** Fail segment-file creates with IOExceptions, starting at the N-th
    * create, `times` times total. `times = 1` kills one task attempt (the
    * retry succeeds); `times >= spark's maxFailures` kills the whole job —
    * the restart-recovery scenario.
    */
  def armSegmentCreateFailure(n: Int, times: Int = 1): Unit = {
    segmentCreates.set(0)
    firedCount.set(0)
    remainingFailures.set(times)
    failAtSegmentCreate = n
  }

  private val pathCreates = new AtomicInteger(0)
  private val pathRemaining = new AtomicInteger(0)
  @volatile private var failPathSubstring: Option[String] = None
  @volatile private var failPathStartAt: Int = 1

  /** Fail creates whose path contains `substr`, starting at the `startAt`-th
    * matching create, `times` times total — the generic analog of
    * [[armSegmentCreateFailure]] for non-segment writes (e.g. the reliable
    * checkpoint part files inside the connected-components loop).
    */
  def armPathCreateFailure(substr: String, startAt: Int = 1, times: Int = 1): Unit = {
    pathCreates.set(0)
    firedCount.set(0)
    pathRemaining.set(times)
    failPathStartAt = startAt
    failPathSubstring = Some(substr)
  }

  def disarm(): Unit = { failAtSegmentCreate = -1; failPathSubstring = None }

  /** True iff the armed failure actually fired (spec sanity check). */
  def failureFired: Boolean = firedCount.get() > 0

  /** How many injected failures actually threw. */
  def failuresFired: Int = firedCount.get()

  private def maybeFail(f: Path): Unit = {
    if (failAtSegmentCreate >= 0 && f.getName.startsWith("segment-") &&
        segmentCreates.incrementAndGet() >= failAtSegmentCreate &&
        remainingFailures.getAndDecrement() > 0) {
      firedCount.incrementAndGet()
      throw new IOException(s"chaos: injected create failure for $f")
    }
    failPathSubstring match {
      case Some(sub) if f.toString.contains(sub) =>
        if (pathCreates.incrementAndGet() >= failPathStartAt &&
            pathRemaining.getAndDecrement() > 0) {
          firedCount.incrementAndGet()
          throw new IOException(s"chaos: injected create failure for $f")
        }
      case _ => ()
    }
  }
}
