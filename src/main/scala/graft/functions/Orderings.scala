package graft.functions

/** Kernel-side orderings that must agree with Spark's distributed sorts. */
object Orderings {

  /** String ordering by UTF-8 bytes compared unsigned — identical to Spark's
    * UTF8String binary comparison (what `array_sort`/`ORDER BY` apply) and
    * DuckDB varchar ordering. Java's `String.compareTo` (UTF-16 code units)
    * diverges from this when supplementary characters (emoji, code points
    * above U+FFFF) mix with characters in U+E000–U+FFFF: the surrogate range
    * D800–DFFF sorts below E000–FFFF in UTF-16 but encodes to 4-byte
    * sequences (F0-F4 lead) that sort ABOVE 3-byte E000–FFFF (E0-EF lead) in
    * UTF-8. Any kernel that mirrors a distributed string sort must compare
    * through this ordering, not `compareTo`. */
  val utf8: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int = {
      val ab = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val bb = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val n = math.min(ab.length, bb.length)
      var i = 0
      while (i < n) {
        val d = (ab(i) & 0xff) - (bb(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      ab.length - bb.length
    }
  }
}
