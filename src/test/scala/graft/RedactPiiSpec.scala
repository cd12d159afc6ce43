package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expr.RedactPii

/** The RedactPii scanner must be BIT-IDENTICAL to the
  * java.util.regex fold it replaced (which is also what the DuckDB
  * oracle computes) — redacted text and all four counts, on
  * adversarial inputs built from the patterns' own alphabet.
  */
class RedactPiiSpec extends AnyFunSuite {

  private def check(s: String): Unit = {
    val ref = RedactPii.runReference(s)
    val got = RedactPii.runScanner(s)
    assert(got == ref, s"mismatch on <<$s>>\n ref=$ref\n got=$got")
  }

  test("hand cases: each rule, boundaries, fold-order interactions") {
    Seq(
      "", "no pii here", "a@b.com", "x 1.2.3.4 y", "1234567890123456",
      "555-123-4567", "call 555-1234-4567 now",
      // boundary failures (word char adjacency kills \b)
      "a1.2.3.4", "1.2.3.4a", "_1234567890123456_", "x555-123-4567",
      "555-123-45678", "5555-123-4567", "555-12-4567", "555-123-456",
      // fold-order observables: email replacement exposes a boundary
      "a@b.com1.2.3.4", "a@b.com51.2.3.4", "5@x.com1.2.3.4",
      // ip steals phone's first segment on the fold text
      "1.2.3.456-789-0123",
      // greedy/backtracking shapes
      "12345.1.1.1", "1.2.3.456.7.8.9", "1.2.3.4.5.6.7.8", "1.2.3.4.5",
      "999.999.999.999", "1..2.3.4", "1.2.3.4567",
      "123-4567-8901-234-5678", "123-456-789-0123", "123-456-7890123",
      // email corners
      "a@@b.com", "a@b@c.com", "@x.com", "a@", "a@.com", "a@b.c",
      "x@y.comA@b.com", "a.b-c%d+e@f-g.h.ij", "a@b.com.", "a@b.com-x",
      "1.2.3.4@foo.com", "a@b.comc@d.com", "a@b.co9m.net7.org",
      // 16-digit runs next to chains
      "1234567890123456.1.2.3", "12345678901234567", "1234567890123456-123-4567",
      // adjacent matches
      "1.2.3.4 5.6.7.8", "1234567890123456 1234567890123456",
      "555-123-4567 555-123-4567", "a@b.com c@d.net",
      // the bench injection shape
      "some doc text contact user42@example.com via 10.0.42.7 or 555-123-4567"
    ).foreach(check)
  }

  test("fuzz: 3000 adversarial strings equal the regex fold") {
    val rnd = new Random(42)
    val atoms = Array(
      "1", "12", "123", "1234", "12345", "1234567890123456",
      "123456789012345", "12345678901234567",
      ".", "..", "-", "--", "@", " ", "a", "ab", "com", "_", "%", "+",
      "<", ">", "a@b.com", "1.2.3.4", "555-123-4567", "x.y", "9.9",
      "0.0.0", "no", "A")
    (1 to 3000).foreach { _ =>
      val n = 1 + rnd.nextInt(14)
      val s = (1 to n).map(_ => atoms(rnd.nextInt(atoms.length)))
        .mkString(if (rnd.nextBoolean()) "" else " ")
      check(s)
    }
  }

  test("fuzz: random digit/separator soup") {
    val rnd = new Random(7)
    val chars = "0123456789.-@abc _%+<>".toCharArray
    (1 to 2000).foreach { _ =>
      val n = 1 + rnd.nextInt(40)
      check(new String(Array.fill(n)(chars(rnd.nextInt(chars.length)))))
    }
  }
}
