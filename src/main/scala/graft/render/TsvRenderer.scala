package graft.render

import graft.exec.ResultSet

/** Text rendering of result sets, with the reference's two formats:
  *
  *  - TSV: cells joined by tabs (`@tsv`, /root/reference/aws-athena.sh:45-46)
  *  - aligned: fixed-width columns like `column -s $'\t' -t`
  *    (aws-athena.sh:141,156,194-195) — each column padded to its own
  *    max width, two-space gutter, no trailing padding on the last
  *    column
  *  - fixed-width report rows: `printf "%-30s | %-8s | %-60s | %-10s"`
  *    (aws-athena-workgroup.sh:28-29,54)
  */
object TsvRenderer {

  def toTsv(rs: ResultSet): String =
    (rs.labels +: rs.rows).map(_.mkString("\t")).mkString("\n")

  /** `column -t`-style alignment over header + rows. */
  def aligned(rs: ResultSet): String = {
    val table = rs.labels +: rs.rows
    if (table.forall(_.isEmpty)) return ""
    val widths = rs.labels.indices.map { i =>
      table.map(r => if (i < r.size) r(i).length else 0).max
    }
    table.map { r =>
      r.zipWithIndex.map { case (cell, i) =>
        if (i == r.size - 1) cell else cell.padTo(widths(i), ' ')
      }.mkString("  ")
    }.mkString("\n")
  }

  /** One printf-style fixed-width row: `%-w1s | %-w2s | ...`
    * (aws-athena-workgroup.sh:54). Cells longer than their width are
    * not truncated, matching printf semantics.
    */
  def fixedWidthRow(widths: Seq[Int], cells: Seq[String]): String =
    cells.zip(widths).map { case (c, w) => c.padTo(w, ' ') }.mkString(" | ")
}
