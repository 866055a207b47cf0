package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Run-stable hashing for columns and driver-side values.
  *
  * The reference's stable hash is md5-over-pickle
  * (ref: oarphpy/util/misc.py:89-122); pickle has no portable JVM
  * encoding, so — as SURVEY §7.4.3 prescribes — this engine defines its
  * own canonical encoding (UTF-8 string form) and documents the
  * divergence. Two surfaces:
  *
  *   - `stableHashCol`: codegen'd, engine-portable: Spark's `md5` over
  *     the column cast to string. DuckDB computes the identical value
  *     (`md5(CAST(x AS VARCHAR))`), which makes it oracle-checkable.
  *   - `stableHash64`: fast 64-bit variant via `xxhash64` for
  *     partitioning/dedup keys where hex strings are wasteful.
  *
  * Scale notes: both are native Catalyst expressions inside whole-stage
  * codegen — no UDF boundary on the 100 TB path.
  */
object StableHash {

  /** Portable hex digest of a column (matches DuckDB md5(CAST .. AS VARCHAR)). */
  def stableHashCol(c: Column): Column = md5(c.cast("string"))

  /** 64-bit hash for shuffle keys / dedup buckets (Spark-internal only —
    * xxhash64 seed/spec is Spark's; do not oracle-compare). */
  def stableHash64(cs: Column*): Column = xxhash64(cs: _*)

  /** Driver-side stable hash of a string, same definition as
    * stableHashCol: hex md5 of UTF-8 bytes. */
  def stableHash(s: String): String = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    d.map(b => f"$b%02x").mkString
  }

  /** Reference-parity value→color hash (ref: oarphpy/plotting.py:20-35):
    * md5-derived hue via Knuth multiplicative step, HSV→RGB. Input is the
    * value's string form, UTF-8 encoded — reproduces the reference's
    * golden RGB triples. */
  def hashToRgb(x: Any): (Int, Int, Int) = {
    // Full 128-bit md5 digest as an unsigned integer, Knuth multiplicative
    // modulus for the hue, HSV→RGB, TRUNCATED to ints — reproduces the
    // reference's golden RGB triples exactly (e.g. "moof" → 145,40,204).
    val d = MessageDigest.getInstance("MD5")
      .digest(String.valueOf(x).getBytes(StandardCharsets.UTF_8))
    val h128 = BigInt(1, d) // positive, big-endian — matches hexdigest int
    val hue = (h128 mod BigInt(2654435769L)).toDouble / 2654435769.0
    hsvToRgb(hue, 0.8, 0.8)
  }

  private def hsvToRgb(h: Double, s: Double, v: Double): (Int, Int, Int) = {
    // colorsys.hsv_to_rgb semantics (standard HSV sector formula).
    val i = (h * 6).toInt
    val f = h * 6 - i
    val p = v * (1 - s); val q = v * (1 - s * f); val t = v * (1 - s * (1 - f))
    val (r, g, b) = (i % 6) match {
      case 0 => (v, t, p); case 1 => (q, v, p); case 2 => (p, v, t)
      case 3 => (p, q, v); case 4 => (t, p, v); case _ => (v, p, q)
    }
    ((r * 255).toInt, (g * 255).toInt, (b * 255).toInt)
  }
}
