package graft.analyse

import scala.collection.mutable.ArrayBuffer

import graft.util.Str

/** Pluggable tokenizer seam, mirroring the reference's `Segmenter` interface
  * (`similarity/segment/Segmenter.java:11-18`, with IK/SmartCN/word impls out
  * of scope — SURVEY.md §2 A16). Implementations must be serializable: the
  * segmenter ships inside broadcast dictionaries / mapPartitions closures. */
trait Segmentation extends Serializable {
  def segment(text: String): Seq[String]
}

/** Tokenization: single CJK chars; consecutive ASCII digit runs and letter
  * runs as single tokens (`similarity/segment/SimpleSegmenter.java:15-48`). */
object Segmenter extends Segmentation {
  def segment(text: String): Seq[String] = {
    if (text == null || text.isEmpty) return Seq.empty
    val tokens = new ArrayBuffer[String](text.length)
    var digitNum = 0
    var ansiCharNum = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c >= '0' && c <= '9') {
        if (ansiCharNum > 0) {
          tokens += Str.substring(text, i - ansiCharNum, i - 1)
          ansiCharNum = 0
        }
        digitNum += 1
      } else if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) {
        if (digitNum > 0) {
          tokens += Str.substring(text, i - digitNum, i - 1)
          digitNum = 0
        }
        ansiCharNum += 1
      } else {
        if (digitNum > 0 || ansiCharNum > 0) {
          tokens += Str.substring(text, i - digitNum - ansiCharNum, i - 1)
          digitNum = 0; ansiCharNum = 0
        }
        tokens += String.valueOf(c)
      }
      i += 1
    }
    if (digitNum > 0 || ansiCharNum > 0)
      tokens += Str.substring(text, text.length - digitNum - ansiCharNum)
    tokens.toSeq
  }

  /** Chinese-numeral road-number translation
    * (`SimilarityComputer.translateRoadNum` `:262-323`): ASCII + full-width
    * digits first; else CJK numerals with positional 十 logic. */
  def translateRoadNum(text: String): Int = {
    if (text == null || text.isEmpty) return 0
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c >= '0' && c <= '9') sb.append(c)
      else c match {
        case '０' => sb.append(0)
        case '１' => sb.append(1)
        case '２' => sb.append(2)
        case '３' => sb.append(3)
        case '４' => sb.append(4)
        case '５' => sb.append(5)
        case '６' => sb.append(6)
        case '７' => sb.append(7)
        case '８' => sb.append(8)
        case '９' => sb.append(9)
        case _   =>
      }
      i += 1
    }
    if (sb.length > 0) return java.lang.Integer.parseInt(sb.toString)

    var isTen = false
    i = 0
    var break = false
    while (i < text.length && !break) {
      val c = text.charAt(i)
      if (isTen) {
        val pre = sb.length > 0
        val post = c == '一' || c == '二' || c == '三' || c == '四' || c == '五' ||
          c == '六' || c == '七' || c == '八' || c == '九'
        if (pre) { if (!post) sb.append('0') }
        else { if (post) sb.append('1') else sb.append("10") }
        isTen = false
      }
      c match {
        case '一' => sb.append(1)
        case '二' => sb.append(2)
        case '三' => sb.append(3)
        case '四' => sb.append(4)
        case '五' => sb.append(5)
        case '六' => sb.append(6)
        case '七' => sb.append(7)
        case '八' => sb.append(8)
        case '九' => sb.append(9)
        case '十' => isTen = true
        case _   => if (sb.length > 0) break = true
      }
      i += 1
    }
    if (isTen) {
      if (sb.length > 0) sb.append('0') else sb.append("10")
    }
    if (sb.length > 0) java.lang.Integer.parseInt(sb.toString) else 0
  }
}
