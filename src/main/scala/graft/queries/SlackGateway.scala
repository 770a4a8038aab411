package graft.queries

/** Slack slash-command surface — the engine-facing semantics of the
  * reference's `/cloudpelican` handler (`supervisor/supervisor.go:111-273`),
  * minus the HTTP/webhook transport (host I/O, out of engine scope):
  *
  *   - `+share` anywhere in the text is a routing flag, stripped from
  *     the command before execution (`supervisor.go:125-132`);
  *   - the command runs through the one-shot console executor — the
  *     CLI's `-e` mode (`supervisor.go:155-160`);
  *   - output is wrapped in a fenced code block and truncated at 12 KiB
  *     with a `WARN! TRUNCATED OUTPUT` marker (`supervisor.go:190-207`);
  *   - shared responses go to the channel (`#chan`) unless the origin
  *     is a DM; unshared responses go back to the user (`@user`)
  *     (`supervisor.go:222-229`).
  *
  * Pure function over an injected executor, so the routing/formatting
  * contract is testable without any network.
  */
object SlackGateway {

  /** Response char budget before truncation (`supervisor.go:193`). */
  val ResponseCharLimit: Int = 12 * 1024

  val TruncationMarker = "WARN! TRUNCATED OUTPUT"

  /** Where the rendered text goes and what it says. */
  final case class SlackResponse(destination: String, text: String)

  /** Extract the `+share` flag and the cleaned command
    * (`supervisor.go:125-132`: flag test first, then first-occurrence
    * removal and trim).
    */
  def parseShare(input: String): (String, Boolean) = {
    val share = input.contains("+share")
    val cleaned =
      if (share) input.replaceFirst(java.util.regex.Pattern.quote("+share"), "").trim
      else input
    (cleaned, share)
  }

  /** Line-wise accumulation with the reference's truncation rule: stop
    * once accumulated characters (line lengths, excluding newlines —
    * `supervisor.go:199-205` counts `len(txt)`) reach the 12 KiB limit,
    * appending the marker.
    */
  def truncate(output: String): String = {
    val sb = new StringBuilder
    var chars = 0L
    val it = output.linesIterator
    var truncated = false
    while (it.hasNext && !truncated) {
      val line = it.next()
      sb ++= line += '\n'
      chars += line.length
      if (chars >= ResponseCharLimit) {
        sb ++= TruncationMarker += '\n'
        truncated = true
      }
    }
    sb.result()
  }

  /** Route per `supervisor.go:222-229`: share → the originating
    * channel (unless it is already a DM), otherwise a DM to the user.
    */
  def destination(share: Boolean, user: String, channel: String): String =
    if (share && !channel.startsWith("@")) s"#$channel" else s"@$user"

  /** Full request handling: parse the flag, execute the cleaned
    * command, fence + truncate, route.
    */
  def handle(input: String, user: String, channel: String)
      (exec: String => String): SlackResponse = {
    val (cmd, share) = parseShare(input)
    val body = truncate(exec(cmd))
    SlackResponse(destination(share, user, channel), s"```$body```")
  }
}
