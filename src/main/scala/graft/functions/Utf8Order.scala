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

  /** < 0 iff `a` sorts before `b` ascending; null first.
    *
    * Allocation-free fast path: UTF-16 code-unit order equals UTF-8
    * byte order whenever the first differing code unit is not a
    * surrogate on either side (UTF-8 byte order ≡ code-point order,
    * and non-surrogate code units ARE their code points) — so the
    * common case compares chars directly; the byte-encoding slow path
    * (two transient arrays) fires only when an astral character sits
    * exactly at the divergence point. Matters because this comparator
    * runs O(log k) times per input row inside [[BoundedTopK.reduce]]'s
    * map-side hot loop. */
  def cmpStrings(a: String, b: String): Int = {
    if (a == null || b == null)
      return if (a == null && b == null) 0 else if (a == null) -1 else 1
    val nc = math.min(a.length, b.length)
    var i = 0
    while (i < nc && a.charAt(i) == b.charAt(i)) i += 1
    if (i == nc) return a.length - b.length
    val ca = a.charAt(i)
    val cb = b.charAt(i)
    if (!Character.isSurrogate(ca) && !Character.isSurrogate(cb))
      return ca - cb
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var j = 0
    while (j < n) {
      val c = (x(j) & 0xff) - (y(j) & 0xff)
      if (c != 0) return c
      j += 1
    }
    x.length - y.length
  }
}
