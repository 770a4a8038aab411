package graft.operators

import graft.model.FilterDef
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.collection.concurrent.TrieMap

/** Filter registry with JSON-file persistence — replaces the
  * reference's BoltDB `"filters"` bucket
  * (`supervisor/filter_manager.go:358-398,578-614`) and its HTTP
  * create/list/delete API (`supervisor/supervisor.go:416-448`).
  *
  * Filters are *data*, not plans: the streaming fan-out re-reads the
  * registry per micro-batch (the reference reloads over HTTP on a 1 s
  * tick, `MatchBolt.java:89-97`), so registering a filter mid-stream
  * starts matching on the next batch without restarting anything.
  *
  * Temporary filters (`__tmp__<unixts>` names, created by interactive
  * `select`/`tail` with an unknown name) expire after 1 h —
  * `cli/cloudpelican-lsd.go:29`, `storm/.../Filter.java:64-75`.
  */
final class FilterRegistry(persistPath: Option[String] = None,
    clock: () => Long = () => System.currentTimeMillis()) {

  val TempPrefix = "__tmp__"
  val TempTtlMillis: Long = 3600 * 1000L // 1 h, Filter.java:70

  private val filters = TrieMap.empty[String, FilterDef]
  persistPath.foreach(load)

  private def validName(n: String): Boolean =
    n.matches("^[a-z0-9_]+$") // cli/cloudpelican-lsd.go:393-398

  def create(name: String, regex: String, clientHost: String = ""): FilterDef = {
    require(validName(name), s"invalid filter name: $name")
    java.util.regex.Pattern.compile(regex) // validate, like supervisor.go:426
    val f = FilterDef(java.util.UUID.randomUUID().toString, name, regex,
      clientHost, temp = name.startsWith(TempPrefix))
    filters.put(f.id, f)
    persist()
    f
  }

  /** Temp filter for an interactive query — name `__tmp__<unixts>`
    * (`cli/cloudpelican-lsd.go:500-524`).
    */
  def createTemp(regex: String): FilterDef =
    create(s"$TempPrefix${clock() / 1000}", regex)

  def drop(id: String): Boolean = {
    val removed = filters.remove(id).isDefined
    if (removed) persist()
    removed
  }

  /** Lookup through [[list]] so expired temp filters are never
    * resolvable — `select` against a >1 h-old `__tmp__` name fails the
    * same way the reference's expired-filter lookup does.
    */
  def byName(name: String): Option[FilterDef] =
    list().find(_.name == name)

  /** Live filters after expiring stale temp ones —
    * `cli/supervisorcon.go:258-280`.
    */
  def list(): Seq[FilterDef] = {
    val now = clock()
    val (stale, live) = filters.values.toSeq.partition { f =>
      f.temp && tempCreatedAtMillis(f).exists(now - _ > TempTtlMillis)
    }
    stale.foreach(f => filters.remove(f.id))
    if (stale.nonEmpty) persist()
    live.sortBy(_.name)
  }

  private def tempCreatedAtMillis(f: FilterDef): Option[Long] =
    f.name.stripPrefix(TempPrefix).toLongOption.map(_ * 1000L)

  // --- JSON persistence (one object per line: id, name, regex, host) ---

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def persist(): Unit = persistPath.foreach { p =>
    val body = filters.values.toSeq.sortBy(_.name).map { f =>
      s"""{"id":"${esc(f.id)}","name":"${esc(f.name)}","regex":"${esc(f.regex)}","client_host":"${esc(f.clientHost)}"}"""
    }.mkString("", "\n", "\n")
    val path = Paths.get(p)
    Option(path.getParent).foreach(Files.createDirectories(_))
    Files.write(path, body.getBytes(StandardCharsets.UTF_8))
  }

  private def load(p: String): Unit = {
    val path = Paths.get(p)
    if (!Files.exists(path)) return
    val Line =
      """\{"id":"(.*?)","name":"(.*?)","regex":"(.*?)","client_host":"(.*?)"\}""".r
    Files.readAllLines(path).forEach {
      case Line(id, name, regex, host) =>
        filters.put(unesc(id), FilterDef(unesc(id), unesc(name), unesc(regex),
          unesc(host), temp = unesc(name).startsWith(TempPrefix)))
      case _ => ()
    }
  }

  /** Sequential JSON-string unescape — exact inverse of [[esc]]
    * (naive chained replace() corrupts backslash sequences and never
    * reverses \\uXXXX).
    */
  private def unesc(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"'  => out += '"'; i += 2
          case '\\' => out += '\\'; i += 2
          case 'n'  => out += '\n'; i += 2
          case 'u' if i + 5 < s.length &&
              s.substring(i + 2, i + 6).forall(ch =>
                Character.digit(ch, 16) >= 0) =>
            out += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
            i += 6
          case other => out += '\\'; out += other; i += 2
        }
      } else { out += c; i += 1 }
    }
    out.result()
  }
}
