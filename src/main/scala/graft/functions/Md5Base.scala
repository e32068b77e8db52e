package graft.functions

/** The engine's shared hash basis: the first 8 bytes of an md5 digest as
  * a big-endian long. Every sketch primitive (MinHash, SimHash, rolling
  * fingerprint, HLL) derives from this one fold so the convention — and
  * its SQL-oracle twin `CAST('0x'||substring(md5(x),1,16) AS ...)` /
  * the top-60-bit `>>> 4` variant — lives in exactly one place.
  */
private[graft] object Md5Base {

  def newDigest(): java.security.MessageDigest =
    java.security.MessageDigest.getInstance("MD5")

  /** First 8 digest bytes, big-endian. Resets `md` before use. */
  def be64(md: java.security.MessageDigest, bytes: Array[Byte]): Long = {
    md.reset()
    val d = md.digest(bytes)
    var be = 0L
    var j = 0
    while (j < 8) { be = (be << 8) | (d(j) & 0xFFL); j += 1 }
    be
  }
}
