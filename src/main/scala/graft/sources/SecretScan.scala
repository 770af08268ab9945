package graft.sources

/** Committed-credential detection and redaction — the sanitization
  * stage a public code corpus runs before training (the published
  * Stack pipeline redacts secrets the same way: shape rules + hex
  * runs). Every rule is a hand-rolled scanner (no regex), first match
  * wins at each position, one bounded pass, never throws. Redaction
  * replaces the secret with `[REDACTED:<kind>]` so downstream stages
  * keep the surrounding context.
  *
  * Kinds:
  *   - `aws_key`: `AKIA` + 16 × [A-Z0-9], word-bounded.
  *   - `github_token`: `ghp_` + 36 × [A-Za-z0-9], word-bounded.
  *   - `private_key`: a `-----BEGIN …PRIVATE KEY-----` header line,
  *     redacted through the closing `…PRIVATE KEY-----` (or EOS).
  *   - `hex_secret`: ≥ 32 contiguous hex chars, any case (upper,
  *     lower, or mixed), word-bounded (digest-shaped API secrets).
  *   - `generic_token`: `password|secret|token|api_key|apikey` (any
  *     case, word-bounded) + `=`/`:` + a quoted value of ≥ 8 chars —
  *     only the quoted VALUE is redacted.
  *
  * This is a detector for sanitizing data, not a harvester: output is
  * the redacted text + what kinds were found, never the secret itself.
  */
object SecretScan {

  final case class Scanned(redacted: String, kinds: Seq[String])

  private val Keywords = Array("password", "api_key", "apikey", "secret", "token")

  def scan(text: String): Scanned = {
    if (text == null) return Scanned(null, Seq.empty)
    val n = text.length
    val sb = new java.lang.StringBuilder(n)
    val kinds = Seq.newBuilder[String]
    var i = 0
    def isAlnum(c: Char): Boolean =
      (c >= '0' && c <= '9') || (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
    def isHexDigit(c: Char): Boolean =
      (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
    def boundedBefore(p: Int): Boolean = p == 0 || !isAlnum(text.charAt(p - 1))
    def boundedAfter(p: Int): Boolean = p >= n || !isAlnum(text.charAt(p))

    while (i < n) {
      var matched = false
      val c = text.charAt(i)

      // aws_key
      if (!matched && c == 'A' && boundedBefore(i) && text.startsWith("AKIA", i) && i + 20 <= n) {
        var ok = true
        var j = i + 4
        while (j < i + 20 && ok) {
          val d = text.charAt(j)
          if (!((d >= 'A' && d <= 'Z') || (d >= '0' && d <= '9'))) ok = false
          j += 1
        }
        if (ok && boundedAfter(i + 20)) {
          sb.append("[REDACTED:aws_key]"); kinds += "aws_key"; i += 20; matched = true
        }
      }

      // github_token
      if (!matched && c == 'g' && boundedBefore(i) && text.startsWith("ghp_", i) && i + 40 <= n) {
        var ok = true
        var j = i + 4
        while (j < i + 40 && ok) { if (!isAlnum(text.charAt(j))) ok = false; j += 1 }
        if (ok && boundedAfter(i + 40)) {
          sb.append("[REDACTED:github_token]"); kinds += "github_token"; i += 40; matched = true
        }
      }

      // private_key block
      if (!matched && c == '-' && text.startsWith("-----BEGIN ", i)) {
        var eol = text.indexOf('\n', i)
        if (eol < 0) eol = n
        if (text.substring(i, eol).endsWith("PRIVATE KEY-----")) {
          val closer = text.indexOf("PRIVATE KEY-----", eol)
          val end = if (closer < 0) n else closer + "PRIVATE KEY-----".length
          sb.append("[REDACTED:private_key]"); kinds += "private_key"; i = end; matched = true
        }
      }

      // hex_secret — any case: uppercase and mixed-case 32+ char hex
      // digests (SHA dumps, API secrets) redact too
      if (!matched && (isHexDigit(c))) {
        if (boundedBefore(i)) {
          var j = i
          while (j < n && isHexDigit(text.charAt(j))) j += 1
          if (j - i >= 32 && boundedAfter(j)) {
            sb.append("[REDACTED:hex_secret]"); kinds += "hex_secret"; i = j; matched = true
          }
        }
      }

      // generic_token: keyword [=:] 'value'
      if (!matched && boundedBefore(i)) {
        var k = 0
        while (k < Keywords.length && !matched) {
          val kw = Keywords(k)
          if (i + kw.length <= n && text.regionMatches(true, i, kw, 0, kw.length) &&
              boundedAfter(i + kw.length) &&
              (i + kw.length >= n || text.charAt(i + kw.length) != '_')) {
            var j = i + kw.length
            while (j < n && (text.charAt(j) == ' ' || text.charAt(j) == '\t')) j += 1
            if (j < n && (text.charAt(j) == '=' || text.charAt(j) == ':')) {
              j += 1
              while (j < n && (text.charAt(j) == ' ' || text.charAt(j) == '\t')) j += 1
              if (j < n && (text.charAt(j) == '"' || text.charAt(j) == '\'')) {
                val q = text.charAt(j)
                val close = text.indexOf(q, j + 1)
                if (close > j && close - j - 1 >= 8) {
                  sb.append(text, i, j + 1)
                  sb.append("[REDACTED:generic_token]")
                  sb.append(q)
                  kinds += "generic_token"
                  i = close + 1
                  matched = true
                }
              }
            }
          }
          k += 1
        }
      }

      if (!matched) { sb.append(c); i += 1 }
    }
    Scanned(sb.toString, kinds.result())
  }
}
