package graft.validation

import java.nio.charset.StandardCharsets

/** Evidence-report PDF rendering (reference evidence/pdf.rs:1-464). The
  * reference uses printpdf; here the one-page report is emitted directly as a
  * minimal PDF 1.4 document (catalog → pages → page → Helvetica text
  * objects + xref) — pure JDK, no dependency, same content layout: title,
  * overall result, metadata lines, backup summary, and the per-check table.
  */
object EvidencePdf {

  private val PageW = 595 // A4 points
  private val PageH = 842
  private val Margin = 50

  /** PDF string escape: backslash, parens; non-latin1 replaced (the builtin
    * Helvetica encoding is WinAnsi — close enough for report text).
    */
  private def esc(s: String): String = s.flatMap {
    case '\\' => "\\\\"
    case '(' => "\\("
    case ')' => "\\)"
    case c if c >= ' ' && c < 256 => c.toString
    case _ => "?"
  }

  private case class Line(text: String, size: Int, bold: Boolean, gapAfter: Int = 0)

  /** Render the report to PDF bytes. Layout mirrors pdf.rs's cover page. */
  def render(report: EvidenceReport): Array[Byte] = {
    val passed = report.checks.values.count(_ == "Passed")
    val warned = report.checks.values.count(_ == "Warning")
    val total = report.checks.size
    // same three-level verdict as Validation.summary: Warning outcomes are
    // not failures — a warnings-only report must not print FAILED
    val overall =
      if (passed + warned < total) "FAILED"
      else if (warned > 0) "WARNING"
      else "PASSED"
    val lines =
      Seq(
        Line("Kafka Backup Validation", 18, bold = true),
        Line("Evidence Report", 18, bold = true, gapAfter = 8),
        Line(s"Overall Result: $overall ($passed/$total checks)", 13, bold = true, gapAfter = 6),
        Line(s"Backup ID: ${report.backup_id}", 10, bold = false),
        Line(s"Created: ${report.created_at}", 10, bold = false),
        Line(s"Content hash: ${Evidence.contentHash(report)}", 8, bold = false, gapAfter = 6),
        Line("Backup Summary", 13, bold = true),
        Line(s"Total records: ${report.total_records}", 10, bold = false),
        Line(s"Total segments: ${report.total_segments}", 10, bold = false),
        Line(s"Offset digest: ${report.offset_digest.take(32)}...", 8, bold = false, gapAfter = 6),
        Line("Validation Checks", 13, bold = true)) ++
        report.checks.toSeq.sortBy(_._1).map { case (name, outcome) =>
          Line(f"$name%-28s $outcome", 10, bold = false)
        } ++
        // compliance sections (pdf.rs:338-410), same order: SOX → CMMC →
        // GDPR; '-' instead of the reference's em dash (outside latin1)
        report.compliance.toSeq.flatMap { c =>
          Seq(Line("", 10, bold = false, gapAfter = 4),
            Line("Compliance Mappings", 13, bold = true)) ++
          c.sox_itgc.toSeq.flatMap(m => Seq(
            Line("SOX ITGC", 11, bold = true),
            Line(s"Control: ${m.control}", 9, bold = false),
            Line(s"Satisfied by: ${m.satisfied_by.mkString(", ")}", 9, bold = false),
            Line(s"Retention: ${m.evidence_retention_configured_days} days " +
              s"configured / ${m.evidence_retention_required_years} years required",
              9, bold = false, gapAfter = 3))) ++
          c.cmmc_l2.toSeq.flatMap(m => Seq(
            Line("CMMC Level 2", 11, bold = true),
            Line(s"Control: ${m.control} - ${m.description}", 9, bold = false),
            Line(s"Satisfied by: ${m.satisfied_by.mkString(", ")}", 9,
              bold = false, gapAfter = 3))) ++
          c.gdpr_art32.toSeq.flatMap(m => Seq(
            Line("GDPR Article 32", 11, bold = true),
            Line(s"Control: ${m.control}", 9, bold = false),
            Line(s"Satisfied by: ${m.satisfied_by.mkString(", ")}", 9, bold = false),
            Line(s"Test frequency: ${m.test_frequency}" +
              m.rto_demonstrated_seconds.map(s => s"; RTO demonstrated: ${s}s")
                .getOrElse(""), 9, bold = false)))
        }

    val content = {
      val sb = new StringBuilder
      var y = PageH - Margin
      var dropped = 0
      lines.foreach { l =>
        val advance = l.size * 3 / 2 + l.gapAfter
        // one-page layout: rows past the MediaBox would render invisibly in
        // every viewer while the PDF stays structurally valid — truncate
        // LOUDLY instead (reserve one row for the truncation notice). Once
        // any line misses the fit check, stop rendering entirely: letting a
        // later, shorter line through would silently omit a MIDDLE row and
        // present the remainder as contiguous — truncation must be strictly
        // a tail cut matching the "...N more rows" notice.
        if (dropped > 0 || y - advance < Margin + 12) dropped += 1
        else {
          val font = if (l.bold) "/F2" else "/F1"
          sb.append(s"BT $font ${l.size} Tf $Margin $y Td (${esc(l.text)}) Tj ET\n")
          y -= advance
        }
      }
      if (dropped > 0)
        sb.append(s"BT /F2 10 Tf $Margin ${Margin} Td " +
          s"(${esc(s"... $dropped more rows: see the JSON report for the full table")}) Tj ET\n")
      sb.result()
    }

    val objects = Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 $PageW $PageH] " +
        "/Resources << /Font << /F1 4 0 R /F2 5 0 R >> >> /Contents 6 0 R >>",
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold >>",
      s"<< /Length ${content.getBytes(StandardCharsets.ISO_8859_1).length} >>\n" +
        s"stream\n${content}endstream")

    val out = new StringBuilder("%PDF-1.4\n")
    val offsets = objects.zipWithIndex.map { case (body, i) =>
      val off = out.length
      out.append(s"${i + 1} 0 obj\n$body\nendobj\n")
      off
    }
    val xrefOff = out.length
    out.append(s"xref\n0 ${objects.size + 1}\n")
    out.append("0000000000 65535 f \n")
    offsets.foreach(o => out.append(f"$o%010d 00000 n \n"))
    out.append(s"trailer\n<< /Size ${objects.size + 1} /Root 1 0 R >>\n")
    out.append(s"startxref\n$xrefOff\n%%EOF\n")
    out.result().getBytes(StandardCharsets.ISO_8859_1)
  }
}
