package graft.ml

/** Hashing primitives chosen to be EXACTLY reproducible in ANSI SQL engines
  * (the driver's DuckDB oracle), unlike JVM-private murmur3:
  *
  *  - [[h60]]: the first 15 hex chars (60 bits, big-endian) of md5 — in
  *    DuckDB `('0x' || substr(md5(s), 1, 15))::BIGINT`, in Spark SQL
  *    `conv(substr(md5(s), 1, 15), 16, 10)`. 60 bits keeps every value in
  *    positive BIGINT range under ANSI overflow checking on both engines.
  *  - [[affine]]: the classic (a·x + b) mod p universal family over the
  *    Mersenne prime p = 2³¹−1, with a,b derived from the function index by
  *    fixed integer arithmetic — every intermediate fits in a signed 64-bit
  *    product (a,x < 2³¹ ⇒ a·x < 2⁶²), so SQL BIGINT math reproduces it
  *    exactly. One md5 per input + K cheap mixes replaces the round-1 design
  *    of K full murmur passes per shingle.
  */
object PortableHash {

  /** Mersenne prime 2³¹ − 1 — the affine family's modulus. */
  val P: Long = 2147483647L

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def md5hex(s: String): String = {
    val d = md5Local.get()
    d.reset()
    val bytes = d.digest(s.getBytes("UTF-8"))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < bytes.length) {
      sb.append(Character.forDigit((bytes(i) >> 4) & 0xF, 16))
      sb.append(Character.forDigit(bytes(i) & 0xF, 16))
      i += 1
    }
    sb.toString
  }

  /** 60-bit md5 prefix hash (always ≥ 0). */
  def h60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)

  /** a-coefficient of hash function i (same formula inlined in oracle SQL). */
  def aOf(i: Int): Long = ((i + 1).toLong * 2654435761L) % P

  /** b-coefficient of hash function i. */
  def bOf(i: Int): Long = ((i + 1).toLong * 1779033703L) % P

  /** i-th universal hash of a 60-bit value: (a_i·(h mod p) + b_i) mod p. */
  def affine(i: Int, h: Long): Long = (aOf(i) * (h % P) + bOf(i)) % P
}
