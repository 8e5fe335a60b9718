package graft.config

import scala.collection.concurrent.TrieMap
import graft.render.TsvRenderer

/** Workgroups — named execution-config namespaces, the reference's
  * control plane (/root/reference/aws-athena-workgroup.sh).
  *
  * A workgroup has a state, an optional result OutputLocation and an
  * optional EncryptionOption (aws-athena-workgroup.sh:37-46); a group
  * may have no Configuration at all (aws-athena-workgroup.sh:48-51).
  * The default group is `primary`, selected via ATHENA_WORKGROUP
  * (aws-athena.sh:8).
  */
final case class WorkGroup(
    name: String,
    state: String = "ENABLED",
    configuration: Option[WorkGroupConfig] = None)

final case class WorkGroupConfig(
    outputLocation: Option[String] = None,
    encryptionOption: Option[String] = None)

final class WorkGroupRegistry {
  private val groups = TrieMap[String, WorkGroup]()
  register(WorkGroup("primary")) // Athena's always-present default

  def register(wg: WorkGroup): Unit = groups.put(wg.name, wg)
  def get(name: String): Option[WorkGroup] = groups.get(name)
  def names: Seq[String] = groups.keys.toSeq.sorted
  def isEmpty: Boolean = groups.isEmpty

  /** The fixed-width report of aws-athena-workgroup.sh:28-55, with its
    * exact header, defaults ("未設定" for a configured group without an
    * output location, "なし" for no encryption,
    * "設定なし (Default使用)" for a group with no Configuration), and
    * empty-registry message (aws-athena-workgroup.sh:22-25).
    */
  def report(): String = {
    if (groups.isEmpty) return "⚠️ ワークグループが見つかりませんでした。"
    val widths = Seq(30, 8, 60, 10)
    val header = TsvRenderer.fixedWidthRow(widths,
      Seq("ワークグループ名", "状態", "S3結果出力先 (OutputLocation)", "暗号化"))
    val rule =
      "--------------------------------|----------|--------------------------------------------------------------|------------"
    val lines = names.map { n =>
      val wg = groups(n)
      val (loc, enc) = wg.configuration match {
        case Some(c) =>
          (c.outputLocation.getOrElse("未設定"), c.encryptionOption.getOrElse("なし"))
        case None => ("設定なし (Default使用)", "なし")
      }
      TsvRenderer.fixedWidthRow(widths, Seq(wg.name, wg.state, loc, enc))
    }
    (header +: rule +: lines).mkString("\n")
  }
}
