package graft.text

/** Porter 1980 stemmer — M.F. Porter, "An algorithm for suffix stripping",
  * Program 14(3), 1980 (public algorithm). This is the canonical revision
  * with both published DEPARTURE rules (bli→ble, logi→log) and the Bug-1 /
  * Bug-2 guards, matching the variant the reference bundles
  * (reference: Project/src/cis5550/external/PorterStemmer.java, used by
  * jobs/Indexer.java:65-72 and backend/Backend.java:484-489) so stemmed
  * terms are identical for rank-identity.
  *
  * Stateless entry point: [[PorterStemmer.stem]].
  */
object PorterStemmer {

  /** Stem a (lowercase) word. Words of length ≤ 2 are returned unchanged. */
  def stem(word: String): String = {
    if (word.length <= 2) return word
    new Impl(word.toCharArray).run()
  }

  private final class Impl(private var b: Array[Char]) {
    private var k = b.length - 1
    private var j = 0

    private def cons(i: Int): Boolean = b(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y' =>
        // identical to the published rule (y at 0 is a consonant, otherwise
        // 'y' flips the previous position's answer) computed ITERATIVELY:
        // the textbook one-recursion-per-'y' form overflowed the stack on
        // adversarial y-runs reaching the query path, which has no length
        // cap. Walk to the first non-'y' and fold the alternation parity.
        var p = i - 1
        while (p >= 0 && b(p) == 'y') p -= 1
        if (p < 0) (i % 2) == 0 // all-'y' prefix: cons(0)=true, alternating
        else {
          val base = b(p) match {
            case 'a' | 'e' | 'i' | 'o' | 'u' => false
            case _ => true
          }
          if (((i - p) % 2) == 1) !base else base
        }
      case _ => true
    }

    /** Number of consonant-vowel sequences in b[0..j]. */
    private def m(): Int = {
      var n = 0
      var i = 0
      while (i <= j && cons(i)) i += 1
      if (i > j) return n
      i += 1
      while (true) {
        while (i <= j && !cons(i)) i += 1
        if (i > j) return n
        i += 1
        n += 1
        while (i <= j && cons(i)) i += 1
        if (i > j) return n
        i += 1
      }
      n
    }

    private def vowelInStem(): Boolean = {
      var i = 0
      while (i <= j) { if (!cons(i)) return true; i += 1 }
      false
    }

    private def doublec(jj: Int): Boolean =
      jj >= 1 && b(jj) == b(jj - 1) && cons(jj)

    private def cvc(i: Int): Boolean = {
      if (i < 2 || !cons(i) || cons(i - 1) || !cons(i - 2)) false
      else {
        val ch = b(i)
        ch != 'w' && ch != 'x' && ch != 'y'
      }
    }

    private def ends(s: String): Boolean = {
      val l = s.length
      val o = k - l + 1
      if (o < 0) return false
      var i = 0
      while (i < l) { if (b(o + i) != s.charAt(i)) return false; i += 1 }
      j = k - l
      true
    }

    private def setto(s: String): Unit = {
      val l = s.length
      val o = j + 1
      var i = 0
      while (i < l) { b(o + i) = s.charAt(i); i += 1 }
      k = j + l
    }

    private def r(s: String): Unit = if (m() > 0) setto(s)

    /** Plurals and -ed / -ing. */
    private def step1(): Unit = {
      if (b(k) == 's') {
        if (ends("sses")) k -= 2
        else if (ends("ies")) setto("i")
        else if (b(k - 1) != 's') k -= 1
      }
      if (ends("eed")) { if (m() > 0) k -= 1 }
      else if ((ends("ed") || ends("ing")) && vowelInStem()) {
        k = j
        if (ends("at")) setto("ate")
        else if (ends("bl")) setto("ble")
        else if (ends("iz")) setto("ize")
        else if (doublec(k)) {
          k -= 1
          val ch = b(k)
          if (ch == 'l' || ch == 's' || ch == 'z') k += 1
        }
        else if (m() == 1 && cvc(k)) setto("e")
      }
    }

    /** Terminal y → i when there is another vowel in the stem. */
    private def step2(): Unit = if (ends("y") && vowelInStem()) b(k) = 'i'

    /** Double suffices → single (ization→ize etc.); requires m() > 0. */
    private def step3(): Unit = {
      if (k == 0) return // Bug 1 guard
      b(k - 1) match {
        case 'a' =>
          if (ends("ational")) r("ate")
          else if (ends("tional")) r("tion")
        case 'c' =>
          if (ends("enci")) r("ence")
          else if (ends("anci")) r("ance")
        case 'e' =>
          if (ends("izer")) r("ize")
        case 'l' =>
          if (ends("bli")) r("ble") // DEPARTURE
          else if (ends("alli")) r("al")
          else if (ends("entli")) r("ent")
          else if (ends("eli")) r("e")
          else if (ends("ousli")) r("ous")
        case 'o' =>
          if (ends("ization")) r("ize")
          else if (ends("ation")) r("ate")
          else if (ends("ator")) r("ate")
        case 's' =>
          if (ends("alism")) r("al")
          else if (ends("iveness")) r("ive")
          else if (ends("fulness")) r("ful")
          else if (ends("ousness")) r("ous")
        case 't' =>
          if (ends("aliti")) r("al")
          else if (ends("iviti")) r("ive")
          else if (ends("biliti")) r("ble")
        case 'g' =>
          if (ends("logi")) r("log") // DEPARTURE
        case _ => ()
      }
    }

    /** -ic-, -full, -ness etc. */
    private def step4(): Unit = b(k) match {
      case 'e' =>
        if (ends("icate")) r("ic")
        else if (ends("ative")) r("")
        else if (ends("alize")) r("al")
      case 'i' =>
        if (ends("iciti")) r("ic")
      case 'l' =>
        if (ends("ical")) r("ic")
        else if (ends("ful")) r("")
      case 's' =>
        if (ends("ness")) r("")
      case _ => ()
    }

    /** -ant, -ence etc. in context <c>vcvc<v>; strips when m() > 1. */
    private def step5(): Unit = {
      if (k == 0) return // Bug 1 guard
      val matched = b(k - 1) match {
        case 'a' => ends("al")
        case 'c' => ends("ance") || ends("ence")
        case 'e' => ends("er")
        case 'i' => ends("ic")
        case 'l' => ends("able") || ends("ible")
        case 'n' => ends("ant") || ends("ement") || ends("ment") || ends("ent")
        case 'o' => (ends("ion") && j >= 0 && (b(j) == 's' || b(j) == 't')) || // Bug 2 guard
                    ends("ou")
        case 's' => ends("ism")
        case 't' => ends("ate") || ends("iti")
        case 'u' => ends("ous")
        case 'v' => ends("ive")
        case 'z' => ends("ize")
        case _ => false
      }
      if (matched && m() > 1) k = j
    }

    /** Final -e removal and -ll reduction when m() > 1. */
    private def step6(): Unit = {
      j = k
      if (b(k) == 'e') {
        val a = m()
        if (a > 1 || (a == 1 && !cvc(k - 1))) k -= 1
      }
      if (b(k) == 'l' && doublec(k) && m() > 1) k -= 1
    }

    def run(): String = {
      if (k > 1) { step1(); step2(); step3(); step4(); step5(); step6() }
      new String(b, 0, k + 1)
    }
  }
}
