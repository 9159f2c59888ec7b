package graft.validation

import java.nio.charset.StandardCharsets
import java.security.{KeyPair, KeyPairGenerator, MessageDigest, Signature}
import java.util.Base64

/** Signed evidence report (K9, evidence/report.rs + evidence/signing.rs):
  * canonical JSON (sorted keys, no whitespace) → SHA-256 content hash →
  * Ed25519 signature over the hash. JDK 17's java.security provides Ed25519
  * natively; PDF rendering is presentation-only and out of scope.
  */
/** Compliance control mappings carried inside the signed report
  * (evidence/report.rs:95-129): which validation checks satisfy which
  * audit control, plus the evidence-retention story (SOX wants ~7 years;
  * `configured_days` records what the deployment actually set).
  */
case class SoxMapping(
    control: String,
    satisfied_by: Seq[String],
    evidence_retention_required_years: Int,
    evidence_retention_configured_days: Int)
case class CmmcMapping(control: String, description: String,
                       satisfied_by: Seq[String])
case class GdprMapping(control: String, satisfied_by: Seq[String],
                       test_frequency: String,
                       rto_demonstrated_seconds: Option[Long])
case class ComplianceMappings(
    sox_itgc: Option[SoxMapping],
    cmmc_l2: Option[CmmcMapping],
    gdpr_art32: Option[GdprMapping])

case class EvidenceReport(
    backup_id: String,
    created_at: Long,
    total_records: Long,
    total_segments: Long,
    offset_digest: String, // Validation.evidenceDigest output
    checks: Map[String, String], // check name → outcome
    compliance: Option[ComplianceMappings] = None)

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
    // nested compliance block, keys sorted at every level (the reference's
    // serde_json Value path serializes through BTreeMaps — sorted — and
    // omits None fields); reports WITHOUT compliance serialize exactly as
    // before, so historical signatures keep verifying
    def strArr(xs: Seq[String]) = xs.map(js).mkString("[", ",", "]")
    val complianceField = r.compliance.map { c =>
      val parts = Seq(
        c.cmmc_l2.map(m => "cmmc_l2" -> Seq(
          "control" -> js(m.control),
          "description" -> js(m.description),
          "satisfied_by" -> strArr(m.satisfied_by))),
        c.gdpr_art32.map(m => "gdpr_art32" -> (Seq(
          "control" -> js(m.control)) ++
          m.rto_demonstrated_seconds.map(s =>
            "rto_demonstrated_seconds" -> s.toString) ++ Seq(
          "satisfied_by" -> strArr(m.satisfied_by),
          "test_frequency" -> js(m.test_frequency)))),
        c.sox_itgc.map(m => "sox_itgc" -> Seq(
          "control" -> js(m.control),
          "evidence_retention_configured_days" ->
            m.evidence_retention_configured_days.toString,
          "evidence_retention_required_years" ->
            m.evidence_retention_required_years.toString,
          "satisfied_by" -> strArr(m.satisfied_by)))).flatten
      parts.map { case (k, fields) =>
        s"${js(k)}:" + fields.map { case (fk, fv) => s"${js(fk)}:$fv" }
          .mkString("{", ",", "}")
      }.mkString("{", ",", "}")
    }
    // top-level keys in sorted order
    (Seq("backup_id" -> js(r.backup_id), "checks" -> checkFields) ++
      complianceField.map("compliance" -> _) ++ Seq(
      "created_at" -> r.created_at.toString,
      "offset_digest" -> js(r.offset_digest),
      "total_records" -> r.total_records.toString,
      "total_segments" -> r.total_segments.toString))
      .map { case (k, v) => s"${js(k)}:$v" }.mkString("{", ",", "}")
  }

  def contentHash(r: EvidenceReport): String = {
    val d = MessageDigest.getInstance("SHA-256")
      .digest(canonicalJson(r).getBytes(StandardCharsets.UTF_8))
    d.map("%02x".format(_)).mkString
  }

  /** The standard control mappings from the checks that ran
    * (evidence/report.rs:160-193 build_compliance_mappings verbatim): SOX
    * ITGC and GDPR Art. 32 are satisfied only by the count/offset-range
    * checks; CMMC RE.3.139 ("Regularly perform and test data back-ups") by
    * every check. `retentionDays` default 2555 ≈ the 7-year SOX horizon;
    * `rtoSeconds` records a demonstrated recovery time when a timed restore
    * produced one.
    */
  def buildComplianceMappings(checkNames: Seq[String],
                              retentionDays: Int = 2555,
                              rtoSeconds: Option[Long] = None): ComplianceMappings = {
    val core = checkNames.filter(n =>
      n == "MessageCountCheck" || n == "OffsetRangeCheck")
    ComplianceMappings(
      sox_itgc = Some(SoxMapping(
        control = "IT General Controls - Backup and Recovery",
        satisfied_by = core,
        evidence_retention_required_years = 7,
        evidence_retention_configured_days = retentionDays)),
      cmmc_l2 = Some(CmmcMapping(
        control = "RE.3.139",
        description = "Regularly perform and test data back-ups",
        satisfied_by = checkNames)),
      gdpr_art32 = Some(GdprMapping(
        control = "Article 32 - Testing technical measures",
        satisfied_by = core,
        test_frequency = "on-demand",
        rto_demonstrated_seconds = rtoSeconds)))
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
