package graft.validation

import java.nio.charset.StandardCharsets
import java.security.{KeyPair, KeyPairGenerator, MessageDigest, Signature}
import java.util.Base64

/** Signed evidence report (K9, evidence/report.rs + evidence/signing.rs):
  * canonical JSON (sorted keys, no whitespace) → SHA-256 content hash →
  * Ed25519 signature over the hash. JDK 17's java.security provides Ed25519
  * natively; PDF rendering is presentation-only and out of scope.
  */
case class EvidenceReport(
    backup_id: String,
    created_at: Long,
    total_records: Long,
    total_segments: Long,
    offset_digest: String, // Validation.evidenceDigest output
    checks: Map[String, String]) // check name → outcome

object Evidence {

  /** Canonical JSON: keys sorted, no whitespace — byte-stable across runs
    * (evidence/report.rs:134-156).
    */
  def canonicalJson(r: EvidenceReport): String = {
    // shared escaper: canonicalization needs DETERMINISM, not a specific
    // escape spelling — \n as "\\n" vs "\\u000a" both parse to the same
    // string; what matters is every writer/verifier using the same one
    def js(s: String) = graft.util.Json.escape(s)
    val checkFields = r.checks.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${js(k)}:${js(v)}" }.mkString("{", ",", "}")
    // top-level keys in sorted order
    Seq(
      "backup_id" -> js(r.backup_id),
      "checks" -> checkFields,
      "created_at" -> r.created_at.toString,
      "offset_digest" -> js(r.offset_digest),
      "total_records" -> r.total_records.toString,
      "total_segments" -> r.total_segments.toString)
      .map { case (k, v) => s"${js(k)}:$v" }.mkString("{", ",", "}")
  }

  def contentHash(r: EvidenceReport): String = {
    val d = MessageDigest.getInstance("SHA-256")
      .digest(canonicalJson(r).getBytes(StandardCharsets.UTF_8))
    d.map("%02x".format(_)).mkString
  }

  def generateKeyPair(): KeyPair =
    KeyPairGenerator.getInstance("Ed25519").generateKeyPair()

  /** Sign the content hash (hex string bytes, matching the reference's
    * sign-the-digest flow, evidence/signing.rs:79-130).
    */
  def sign(r: EvidenceReport, keyPair: KeyPair): String = {
    val sig = Signature.getInstance("Ed25519")
    sig.initSign(keyPair.getPrivate)
    sig.update(contentHash(r).getBytes(StandardCharsets.UTF_8))
    Base64.getEncoder.encodeToString(sig.sign())
  }

  def verify(r: EvidenceReport, signatureB64: String,
             publicKey: java.security.PublicKey): Boolean = {
    val sig = Signature.getInstance("Ed25519")
    sig.initVerify(publicKey)
    sig.update(contentHash(r).getBytes(StandardCharsets.UTF_8))
    try sig.verify(Base64.getDecoder.decode(signatureB64))
    catch { case _: Exception => false }
  }
}

/** St12 circuit breaker (circuit_breaker.rs:1-344): opens after
  * `failureThreshold` consecutive failures, half-opens after `resetAfterMs`,
  * closes again on success. Driver-side guard for admin/storage calls.
  */
final class CircuitBreaker(failureThreshold: Int, resetAfterMs: Long,
                           clock: () => Long = () => System.currentTimeMillis()) {
  private var failures = 0
  private var openedAt = -1L

  def state: String = synchronized {
    if (openedAt < 0) "closed"
    else if (clock() - openedAt >= resetAfterMs) "half-open"
    else "open"
  }

  def call[T](f: => T): T = synchronized {
    if (state == "open") throw new IllegalStateException("circuit breaker open")
    try {
      val r = f
      failures = 0; openedAt = -1L
      r
    } catch {
      case e: Throwable =>
        failures += 1
        if (failures >= failureThreshold) openedAt = clock()
        throw e
    }
  }
}
