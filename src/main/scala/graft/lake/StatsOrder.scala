package graft.lake

import java.nio.charset.StandardCharsets

/** String ordering for commit-stats comparisons: unsigned UTF-8 byte order.
  *
  * This is the order that PRODUCED every "str"-kind sidecar bound — Spark's
  * min/max aggregate strings as UTF8String (byte-wise unsigned) and parquet
  * footer stats order BINARY/UTF8 the same way. Scala's `String` comparison
  * is UTF-16 code-unit order, which diverges for code points in
  * [U+E000, U+FFFF] vs supplementary characters (surrogate pairs sort LOWER
  * than 0xE000+ code units in UTF-16, but their UTF-8 encoding 0xF0.. sorts
  * HIGHER than 0xEE..). Comparing probes against sidecar bounds in the wrong
  * order can falsely prune a commit that holds matches — which, via the
  * MERGE plan phase, becomes silent duplicate keys rather than just a wrong
  * read. Every stats comparison therefore routes through here.
  */
private[lake] object StatsOrder {

  def utf8Compare(a: String, b: String): Int =
    java.util.Arrays.compareUnsigned(
      a.getBytes(StandardCharsets.UTF_8), b.getBytes(StandardCharsets.UTF_8))

  def leq(a: String, b: String): Boolean = utf8Compare(a, b) <= 0
  def geq(a: String, b: String): Boolean = utf8Compare(a, b) >= 0
  def lt(a: String, b: String): Boolean = utf8Compare(a, b) < 0

  /** Collision-free internal column name: `base` unless the frame already
    * has it (a user table may genuinely contain `_graft_commit`), else the
    * first `base_N` the schema lacks. A colliding tag would silently
    * shadow the user column in scan-to-plan phases.
    */
  def freshTag(existing: Seq[String], base: String = "_graft_commit"): String = {
    val taken = existing.toSet
    if (!taken.contains(base)) base
    else Iterator.from(1).map(i => s"${base}_$i").find(n => !taken.contains(n)).get
  }
}
