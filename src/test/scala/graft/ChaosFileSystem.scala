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
  private val fired = new AtomicBoolean(false)
  @volatile private var failAtSegmentCreate: Int = -1

  /** Fail the N-th segment-file create with an IOException — exactly once. */
  def armSegmentCreateFailure(n: Int): Unit = {
    segmentCreates.set(0)
    fired.set(false)
    failAtSegmentCreate = n
  }

  def disarm(): Unit = failAtSegmentCreate = -1

  /** True iff the armed failure actually fired (spec sanity check). */
  def failureFired: Boolean = fired.get()

  private def maybeFail(f: Path): Unit =
    if (failAtSegmentCreate >= 0 && f.getName.startsWith("segment-") &&
        segmentCreates.incrementAndGet() == failAtSegmentCreate &&
        fired.compareAndSet(false, true))
      throw new IOException(s"chaos: injected create failure for $f")
}
