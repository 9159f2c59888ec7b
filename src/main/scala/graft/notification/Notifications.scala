package graft.notification

import graft.validation.EvidenceReport
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

/** Validation-outcome notifications (K11, reference notification/slack.rs +
  * pagerduty.rs): success/failure fan-out after an evidence run. Pure JDK
  * HTTP (java.net.http); payload builders are separated from the send so
  * tests assert exact JSON without a network.
  */
trait NotificationSender {
  def sendSuccess(report: EvidenceReport, evidenceUrl: String): Unit
  def sendFailure(report: EvidenceReport, evidenceUrl: String): Unit
}

final class NotificationException(msg: String) extends RuntimeException(msg)

private[notification] object Http {
  lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10)).build()

  /** POST JSON; non-2xx → NotificationException with status + body (the
    * reference's warn-and-error behavior, slack.rs:24-44).
    */
  def postJson(url: String, json: String): Unit = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofSeconds(30))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(json, StandardCharsets.UTF_8))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() < 200 || resp.statusCode() >= 300)
      throw new NotificationException(
        s"webhook returned ${resp.statusCode()}: ${resp.body().take(500)}")
  }

  def js(s: String): String = graft.util.Json.escape(s)
}

/** Slack incoming-webhook sender using Block Kit (slack.rs:46-76): a header
  * block with the verdict emoji + a section of mrkdwn fields.
  */
final class SlackNotifier(webhookUrl: String) extends NotificationSender {
  import Http._

  private[notification] def payload(report: EvidenceReport, evidenceUrl: String,
                                    emoji: String, result: String): String = {
    val passed = report.checks.values.count(_ == "Passed")
    val total = report.checks.size
    s"""{"blocks":[""" +
      s"""{"type":"header","text":{"type":"plain_text",""" +
      s""""text":${js(s"$emoji Kafka Backup Validation $result")}}},""" +
      s"""{"type":"section","fields":[""" +
      s"""{"type":"mrkdwn","text":${js(s"*Backup ID:*\n${report.backup_id}")}},""" +
      s"""{"type":"mrkdwn","text":${js(s"*Result:*\n$result ($passed/$total checks)")}},""" +
      s"""{"type":"mrkdwn","text":${js(s"*Records:*\n${report.total_records}")}},""" +
      s"""{"type":"mrkdwn","text":${js(s"*Evidence:*\n<$evidenceUrl|Download Report>")}}]}]}"""
  }

  override def sendSuccess(report: EvidenceReport, evidenceUrl: String): Unit =
    postJson(webhookUrl, payload(report, evidenceUrl, "✅", "PASSED"))
  override def sendFailure(report: EvidenceReport, evidenceUrl: String): Unit =
    postJson(webhookUrl, payload(report, evidenceUrl, "❌", "FAILED"))
}

/** PagerDuty Events API v2 sender (pagerduty.rs): success resolves, failure
  * triggers; dedup key ties both to the backup id so a later success clears
  * the open incident. `eventsUrl` is injectable for tests (the production
  * default is PagerDuty's public enqueue endpoint).
  */
final class PagerDutyNotifier(
    integrationKey: String,
    severity: String = "error",
    eventsUrl: String = "https://events.pagerduty.com/v2/enqueue")
    extends NotificationSender {
  import Http._

  private[notification] def payload(report: EvidenceReport, evidenceUrl: String,
                                    action: String, sev: String, verdict: String): String = {
    val passed = report.checks.values.count(_ == "Passed")
    s"""{"routing_key":${js(integrationKey)},"event_action":${js(action)},""" +
      s""""dedup_key":${js(s"kafka-backup-validation-${report.backup_id}")},""" +
      s""""payload":{"summary":${js(s"Kafka backup validation $verdict: ${report.backup_id}")},""" +
      s""""severity":${js(sev)},"source":"kafka-backup",""" +
      s""""component":${js(report.backup_id)},""" +
      s""""custom_details":{"checks_passed":$passed,"checks_total":${report.checks.size},""" +
      s""""total_records":${report.total_records},"evidence_url":${js(evidenceUrl)}}},""" +
      s""""links":[{"href":${js(evidenceUrl)},"text":"Evidence Report"}]}"""
  }

  override def sendSuccess(report: EvidenceReport, evidenceUrl: String): Unit =
    postJson(eventsUrl, payload(report, evidenceUrl, "resolve", "info", "PASSED"))
  override def sendFailure(report: EvidenceReport, evidenceUrl: String): Unit =
    postJson(eventsUrl, payload(report, evidenceUrl, "trigger", severity, "FAILED"))
}

/** Fan a report out to several senders; failures are collected, not
  * short-circuited (one dead webhook must not mute the rest).
  */
final class CompositeNotifier(senders: Seq[NotificationSender]) extends NotificationSender {
  private def fan(f: NotificationSender => Unit): Unit = {
    val errs = senders.flatMap(s =>
      try { f(s); None } catch { case e: Exception => Some(e.getMessage) })
    if (errs.nonEmpty)
      throw new NotificationException(errs.mkString("; "))
  }
  override def sendSuccess(r: EvidenceReport, url: String): Unit = fan(_.sendSuccess(r, url))
  override def sendFailure(r: EvidenceReport, url: String): Unit = fan(_.sendFailure(r, url))
}
