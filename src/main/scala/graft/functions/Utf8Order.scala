package graft.functions

/** Spark's string sort order for JVM-side replication: UTF8 BINARY
  * bytes compared unsigned, nulls first under `asc` (the default
  * null ordering). `java.lang.String.compareTo` is NOT it — UTF-16
  * code units rank supplementary characters (surrogate range, lead
  * 0xD800-0xDBFF) below high-BMP characters (≥ 0xE000) where UTF-8
  * byte order ranks them above ALL BMP characters. Every bounded
  * aggregate that replicates a window's string ordering
  * ([[graft.engine.FirstKViolations]], [[TopKTerms]]) must go through
  * this. */
object Utf8Order {

  /** < 0 iff `a` sorts before `b` ascending; null first. */
  def cmpStrings(a: String, b: String): Int = {
    if (a == null || b == null)
      return if (a == null && b == null) 0 else if (a == null) -1 else 1
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }
}
