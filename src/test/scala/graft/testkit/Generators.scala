package graft.testkit

import scala.util.Random

/** Ports of the reference's synthetic workload *contracts* (FIXTURES.md A1/
  * A2) — same shape and skew, original vocabulary and RNG (the reference's
  * exact word list / Python RNG stream is neither copyable nor needed: the
  * golden assertion is engine-vs-in-memory equality on identically
  * distributed data, not byte equality with the reference).
  *
  * WC input: lines of 20 space-separated words, Gaussian-skewed over a
  * 100-word vocabulary (`int(abs(gauss(0,1))/3*100)`, rejects >= 100) —
  * heavy hot-key skew toward low word ids (reference
  * `test-files/generate-wc.py:119-125`).
  *
  * RWLG input: `source,target` CSV edges; source = random 10-char alnum,
  * target Gaussian-skewed over 100 fixed 6-digit ids (reference
  * `test-files/generate-rwlg.py:17-28`).
  */
object Generators {

  val vocab: IndexedSeq[String] =
    (0 until 100).map(i => f"term$i%03d")

  private def skewedIndex(rng: Random): Int = {
    var idx = -1
    while (idx < 0 || idx >= 100) {
      idx = (math.abs(rng.nextGaussian()) / 3 * 100).toInt
    }
    idx
  }

  def wcLines(seed: Long, draws: Int = 150000, wordsPerLine: Int = 20): Seq[String] = {
    val rng = new Random(seed)
    (0 until draws).map(_ => vocab(skewedIndex(rng)))
      .grouped(wordsPerLine).map(_.mkString(" ")).toSeq
  }

  val linkIds: IndexedSeq[String] =
    (0 until 100).map(i => f"${100000 + i * 137}%06d")

  def rwlgEdges(seed: Long, draws: Int = 116000): Seq[String] = {
    val rng = new Random(seed)
    (0 until draws).map { _ =>
      val src = (0 until 10).map(_ => alnum(rng)).mkString
      s"$src,${linkIds(skewedIndex(rng))}"
    }
  }

  private val alphabet =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
  private def alnum(rng: Random): Char = alphabet(rng.nextInt(alphabet.length))
}
