package graft.util

import java.security.MessageDigest

/** Reference-compatible row-key hash (reference tools/Hasher.java:8-38):
  * SHA-1 over UTF-8, each digest byte mapped to a 2-char lowercase pair.
  *
  * The pair table is generated rather than listed: entry(i) =
  * ('a'+i%26, 'a'+2*(i/26)) — i.e. first char cycles a..z, second char steps
  * a,c,e,…,s every 26 entries, which reproduces the reference's 256-entry
  * table exactly ("aa","ba",…,"vs").
  *
  * The index quirk is replicated deliberately: the reference maps byte b via
  * `(b > 0) ? b : 255 + b`, so byte 0 lands on index 255 ("vs") and negative
  * bytes are shifted by 255 (not 256) — keys built by the reference can only
  * be reproduced with the same off-by-one.
  */
object RefHasher {
  private val byte2chars: Array[String] =
    Array.tabulate(256)(i => s"${('a' + i % 26).toChar}${('a' + 2 * (i / 26)).toChar}")

  def hash(x: String): String = {
    val md = MessageDigest.getInstance("SHA-1")
    md.reset()
    md.update(x.getBytes("UTF-8"))
    val digest = md.digest()
    val sb = new StringBuilder(40)
    var i = 0
    while (i < digest.length) {
      val b = digest(i)
      sb.append(byte2chars(if (b > 0) b else 255 + b))
      i += 1
    }
    sb.toString
  }
}
