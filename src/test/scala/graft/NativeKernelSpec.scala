package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** The native codegen kernels (MinhashOps, HyperplaneOps) pinned against
  * independent plain-Scala reimplementations of the ORACLE arithmetic
  * (md5-hex parsing via BigInt, sign from first-hex-char parity) — the same
  * math the DuckDB SQL replays. Pure unit tests, no SparkSession.
  */
class NativeKernelSpec extends AnyFunSuite {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  test("MinhashOps.signature matches the oracle's hex arithmetic") {
    val rnd = new scala.util.Random(11)
    (1 to 20).foreach { _ =>
      val shingles = Seq.fill(1 + rnd.nextInt(40))(
        Seq.fill(4)("w" + rnd.nextInt(50)).mkString(" ")).distinct
      // oracle form: h1/h2 = integer value of md5-hex chars 1-13 / 14-26
      val seeds = shingles.map { sh =>
        val h = md5hex(sh)
        (BigInt(h.substring(0, 13), 16).toLong, BigInt(h.substring(13, 26), 16).toLong)
      }
      val want = (0 until 16).map { k =>
        seeds.map { case (h1, h2) => h1 + k.toLong * h2 }.min
      }
      val got = graft.functions.MinhashOps.signature(
        new GenericArrayData(shingles.map(s => UTF8String.fromString(s): Any).toArray), 16)
      assert((0 until 16).forall(i => got.getLong(i) == want(i)),
        s"shingles=$shingles got=$got want=$want")
    }
  }

  test("SimhashOps.fingerprint matches the oracle's hex-nibble arithmetic") {
    val rnd = new scala.util.Random(23)
    (1 to 30).foreach { _ =>
      // duplicates on purpose: the kernel must dedup like array_distinct
      val tokens = Seq.fill(1 + rnd.nextInt(60))("t" + rnd.nextInt(25))
      // oracle form: bit b of token t is bit (b%4) of the value of hex
      // char floor(b/4) of md5(t); +1/-1 votes; keep positive bits
      val acc = new Array[Int](32)
      tokens.distinct.foreach { t =>
        val h = md5hex(t)
        (0 until 32).foreach { b =>
          val nib = "0123456789abcdef".indexOf(h(b / 4))
          if (((nib >> (b % 4)) & 1) == 1) acc(b) += 1 else acc(b) -= 1
        }
      }
      val want = (0 until 32).foldLeft(0L) { (fp, b) =>
        if (acc(b) > 0) fp | (1L << b) else fp
      }
      val got = graft.functions.SimhashOps.fingerprint(
        new GenericArrayData(tokens.map(s => UTF8String.fromString(s): Any).toArray))
      assert(got == want, s"tokens=$tokens got=$got want=$want")
    }
  }

  test("ShingleOps.shingles matches the distinct-transform-concat_ws form") {
    val rnd = new scala.util.Random(17)
    (1 to 30).foreach { _ =>
      val n = 2 + rnd.nextInt(3)
      val toks = Seq.fill(rnd.nextInt(30))("w" + rnd.nextInt(8))
      // oracle form: distinct (first occurrence) space-joined n-grams
      val want =
        if (toks.size < n) Seq.empty
        else toks.sliding(n).map(_.mkString(" ")).toSeq.distinct
      val got = graft.functions.ShingleOps.shingles(
        new GenericArrayData(toks.map(t => UTF8String.fromString(t): Any).toArray), n)
      val gotSeq = (0 until got.numElements()).map(i => got.getUTF8String(i).toString)
      assert(gotSeq == want, s"n=$n toks=$toks got=$gotSeq want=$want")
    }
  }

  test("HyperplaneOps.bucket matches the oracle's md5-parity signs") {
    val rnd = new scala.util.Random(23)
    (1 to 20).foreach { _ =>
      val dims = 64
      val emb = Array.fill(dims)((rnd.nextFloat() - 0.5f))
      val want = (0 until 4).map { p =>
        val dot = (0 until dims).map { d =>
          val firstHex = Integer.parseInt(md5hex(s"$p:$d").substring(0, 1), 16)
          emb(d).toDouble * (if (firstHex % 2 == 0) 1.0 else -1.0)
        }.sum
        if (dot > 0) 1 << p else 0
      }.sum
      val got = graft.functions.HyperplaneOps.bucket(
        new GenericArrayData(emb.map(f => Float.box(f): Any)), 4)
      assert(got == want, s"got=$got want=$want")
    }
  }

  test("CharNgramOps.ngrams matches the positional sliding-window form") {
    val rnd = new scala.util.Random(37)
    val alphabets = Seq("ab c", "αβγ δε", "xyz")
    (1 to 30).foreach { _ =>
      val alpha = alphabets(rnd.nextInt(alphabets.size))
      val n = 2 + rnd.nextInt(3)
      val text = Seq.fill(rnd.nextInt(20))(alpha(rnd.nextInt(alpha.length))).mkString
      // oracle form: substr(text, i, n) for i in 1..len-n+1 (all, non-distinct)
      val want =
        if (text.length < n) Seq.empty
        else (0 to text.length - n).map(i => text.substring(i, i + n))
      val got = graft.functions.CharNgramOps.ngrams(UTF8String.fromString(text), n)
      val gotSeq = (0 until got.numElements()).map(i => got.getUTF8String(i).toString)
      assert(gotSeq == want, s"n=$n text='$text' got=$gotSeq want=$want")
    }
  }

  test("VectorOps.l2Sq matches the sequential-fold HOF form bit-exactly") {
    val rnd = new scala.util.Random(31)
    (1 to 30).foreach { _ =>
      val n = 1 + rnd.nextInt(64)
      val a = Array.fill(n)(rnd.nextFloat() - 0.5f)
      val b = Array.fill(n)(rnd.nextFloat() - 0.5f)
      // oracle form: left-to-right fold of (CAST(x AS DOUBLE)-CAST(y AS DOUBLE))²
      var want = 0.0
      (0 until n).foreach { i =>
        val d = a(i).toDouble - b(i).toDouble
        want += d * d
      }
      val got = graft.functions.VectorOps.l2Sq(
        new GenericArrayData(a.map(f => Float.box(f): Any)),
        new GenericArrayData(b.map(f => Float.box(f): Any)))
      assert(got == want, s"n=$n got=$got want=$want (must be bit-identical)")
    }
  }

  test("CdcOps.boundaries matches the O(8)-per-position oracle fold") {
    val rnd = new scala.util.Random(41)
    // codepoints above ASCII on purpose: Spark's ascii(substr(text, j, 1))
    // is codePointAt(0) of the 1-char substring, so the kernel must fold
    // codepoints, not bytes or UTF-16 units (δ is 2 UTF-8 bytes, 𝕏 is a
    // surrogate pair)
    val alphabets = Seq("abcdefgh", "aβcδ𝕏fgh", "0123456789abcdef")
    (1 to 40).foreach { _ =>
      val alpha = alphabets(rnd.nextInt(alphabets.size))
      val cps0 = alpha.codePoints().toArray()
      val n = rnd.nextInt(400)
      val text = new String(
        Array.fill(n)(cps0(rnd.nextInt(cps0.length))), 0, n)
      val cps = text.codePoints().toArray()
      // oracle form: fresh Horner fold with mod at each step, window
      // [i-7, i] for 1-based i in [8, len-1]
      val want =
        if (cps.length <= 8) Seq.empty
        else (8 to cps.length - 1).filter { i =>
          var a = 0L
          ((i - 8) until i).foreach(j => a = (a * 31 + cps(j)) % 1000003L)
          a % 64 == 0
        }
      val got = graft.functions.CdcOps.boundaries(UTF8String.fromString(text))
      val gotSeq = (0 until got.numElements()).map(got.getInt)
      assert(gotSeq == want, s"text.len=${cps.length} got=$gotSeq want=$want")
    }
    // the n = 8 edge: sequence(8, n-1) is empty there, so must the kernel be
    assert(graft.functions.CdcOps.boundaries(
      UTF8String.fromString("exactly8")).numElements() == 0)
  }

  test("TokenOps.maxMultiplicity matches the nested-HOF multiplicity form") {
    val rnd = new scala.util.Random(29)
    (1 to 40).foreach { _ =>
      val toks = Seq.fill(1 + rnd.nextInt(60))("w" + rnd.nextInt(12))
      // oracle form: max over distinct tokens of the count of that token
      val want = toks.distinct.map(d => toks.count(_ == d)).max
      val got = graft.functions.TokenOps.maxMultiplicity(
        new GenericArrayData(toks.map(t => UTF8String.fromString(t): Any).toArray))
      assert(got == want, s"toks=$toks got=$got want=$want")
    }
    assert(graft.functions.TokenOps.maxMultiplicity(
      new GenericArrayData(new Array[Any](0))) == 0)
  }
}
