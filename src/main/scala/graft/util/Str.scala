package graft.util

/** Bounds-safe string helpers with the reference's exact semantics
  * (`utils/StringUtil.java`). The two-arg substring is INCLUSIVE of endIndex
  * (`StringUtil.java:106-112`) — a deliberate porting trap covered by goldens
  * (`test/StringUtilTest.java:13-24`). */
object Str {

  /** `StringUtil.substring(text, beginIndex)` `StringUtil.java:92-96`. */
  def substring(text: String, beginIndex: Int): String = {
    if (text == null || text.isEmpty || beginIndex <= 0) return text
    if (beginIndex > text.length - 1) return ""
    text.substring(beginIndex)
  }

  /** Inclusive-end substring, `StringUtil.java:106-112`. */
  def substring(text: String, beginIndex: Int, endIndex: Int): String = {
    if (text == null || text.isEmpty) return text
    val s = if (beginIndex <= 0) 0 else beginIndex
    val e = if (endIndex >= text.length - 1) text.length - 1 else endIndex
    if (s > e) return ""
    if (s == 0 && e == text.length - 1) return text
    text.substring(s, e + 1)
  }

  /** `StringUtil.head` `StringUtil.java:79-83`. */
  def head(text: String, length: Int): String = {
    if (text == null || text.length <= length) return text
    if (length <= 0) return ""
    text.substring(0, length)
  }

  /** `StringUtil.tail` `StringUtil.java:66-70`. */
  def tail(text: String, length: Int): String = {
    if (text == null || text.length <= length) return text
    if (length <= 0) return ""
    text.substring(text.length - length)
  }

  /** Char-set strip, `StringUtil.java:19-35`. */
  def removeChars(text: String, chars: Set[Char]): String = {
    if (text == null || text.isEmpty || chars.isEmpty) return text
    val sb = new java.lang.StringBuilder(text.length)
    var removed = false
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (chars.contains(c)) removed = true else sb.append(c)
      i += 1
    }
    if (removed) sb.toString else text
  }

  /** `StringUtil.isNumericChars` `StringUtil.java:202-209`. */
  def isNumericChars(text: String): Boolean = {
    if (text == null || text.isEmpty) return false
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c < '0' || c > '9') return false
      i += 1
    }
    true
  }

  /** `StringUtil.isAnsiChars` `StringUtil.java:216-223`. */
  def isAnsiChars(text: String): Boolean = {
    if (text == null || text.isEmpty) return false
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (!((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))) return false
      i += 1
    }
    true
  }

  /** All longest common substrings of s1 and s2, in the reference's
    * discovery order (`StringUtil.lcs` `StringUtil.java:233-289`: outer scan
    * over s2, inner scan over s1 descending; a strictly longer match resets
    * the tie list, equal-length matches append — duplicates included; at
    * most max(len1, len2) ties are kept). Rolling-row dynamic program. */
  def lcs(s1: String, s2: String): Seq[String] = {
    val len1 = s1.length
    val len2 = s2.length
    val maxLen = math.max(len1, len2)
    if (maxLen == 0) return Seq.empty
    val c = new Array[Int](maxLen)
    var best = 0
    // End indices (in s1) of the tied longest matches, capped at maxLen.
    val ends = new scala.collection.mutable.ArrayBuffer[Int](8)
    var i = 0
    while (i < len2) {
      var j = len1 - 1
      while (j >= 0) {
        c(j) =
          if (s2.charAt(i) == s1.charAt(j)) {
            if (i == 0 || j == 0) 1 else c(j - 1) + 1
          } else 0
        if (c(j) > best) {
          best = c(j)
          ends.clear()
          ends += j
        } else if (best > 0 && c(j) == best && ends.length < maxLen) {
          ends += j
        }
        j -= 1
      }
      i += 1
    }
    ends.iterator.map(e => s1.substring(e - best + 1, e + 1)).toSeq
  }
}
