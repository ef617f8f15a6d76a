package graft.core

import scala.util.matching.Regex

/** Text-level utilities shared by the SQL transform and the REPL layer.
  * Semantics mirror the reference:
  *  - `${key}` / `${key=default}` placeholder substitution (Common.scala:151-160)
  *  - quote-aware argument splitting for magic lines (ArcInterpreter.scala:663-677)
  *  - `k=v` env parsing (ArcInterpreter.scala:650-660)
  *  - inline-secret rejection (ArcInterpreter.scala:74, :400-402)
  */
object Params {

  private val placeholder: Regex = """\$\{\s*([A-Za-z0-9_.-]+)\s*(?:=\s*([^}]*))?\}""".r

  /** Substitute `${key}` / `${key=default}` into SQL text. Unknown keys with
    * no default are left verbatim (Spark will then raise a parse error that
    * names the missing key — same failure surface as the reference).
    */
  def injectParameters(sql: String, params: Map[String, String]): String =
    placeholder.replaceAllIn(
      sql,
      m => {
        val key = m.group(1)
        val default = Option(m.group(2))
        val replacement = params.get(key).orElse(default).getOrElse(m.matched)
        Regex.quoteReplacement(replacement)
      }
    )

  /** Split a magic argument line into `k=v` tokens, keeping quoted values
    * (single or double) intact; quotes are stripped from the value.
    */
  def parseArgs(line: String): Map[String, String] = {
    val token = """([A-Za-z0-9_]+)=(?:"([^"]*)"|'([^']*)'|(\S+))""".r
    token
      .findAllMatchIn(line)
      .map { m =>
        val v = Option(m.group(2)).orElse(Option(m.group(3))).getOrElse(m.group(4))
        m.group(1) -> v
      }
      .toMap
  }

  /** Parse `%env`-style bodies: one `k=v` per whitespace-separated token;
    * value may be quoted. Lines without `=` are ignored.
    */
  def parseEnv(body: String): Map[String, String] = parseArgs(body)

  /** The reference refuses to execute any cell that contains what looks like
    * an inline secret (ArcInterpreter.scala:74).
    */
  private val secretPattern: Regex =
    """"(token|signature|accessKey|secret|secretAccessKey)"\s*:\s*".+"""".r

  def containsInlineSecret(code: String): Boolean =
    secretPattern.findFirstIn(code).isDefined

  /** Mask secret values for echo (reference ArcInterpreter.scala:504, :517). */
  def maskSecrets(text: String, params: Map[String, ConfigValue]): String =
    params.valuesIterator.filter(_.secret).foldLeft(text) { (acc, cv) =>
      if (cv.value.nonEmpty) acc.replace(cv.value, "*" * 6) else acc
    }
}
