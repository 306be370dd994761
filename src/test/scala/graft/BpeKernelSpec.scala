package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BpeKernel

/** The native BPE apply kernel must replay the sequential
  * literal-replace fold (the oracle's exact semantics) bit-for-bit —
  * the heap-ordered algorithm is an optimization, never a semantic
  * change. Property-tested against the reference fold over adversarial
  * small-alphabet inputs (dense pair collisions, cascading merges,
  * overlapping occurrences), plus the specific shapes the q60/q61
  * docs call out.
  */
class BpeKernelSpec extends AnyFunSuite {
  import TestSpark._

  private def count(merges: Seq[(String, String)], token: String): Int =
    new BpeKernel(merges).countSymbols(token, 0, token.length)

  private def ref(merges: Seq[(String, String)], token: String): Int =
    new BpeKernel(merges).countSymbolsBySequentialReplace(token)

  test("adjacent repeats merge left-to-right, non-overlapping") {
    // "a b a b" -> "ab ab"
    assert(count(Seq(("a", "b")), "abab") == 2)
    // "a a a" -> "aa a" (non-overlapping), "a a a a" -> "aa aa"
    assert(count(Seq(("a", "a")), "aaa") == 2)
    assert(count(Seq(("a", "a")), "aaaa") == 2)
    assert(count(Seq(("a", "a")), "aaaaa") == 3)
  }

  test("cascading merges build on earlier outputs in rank order") {
    // 1:(a,b)->ab, 2:(ab,c)->abc: "abc" -> 1 symbol
    assert(count(Seq(("a", "b"), ("ab", "c")), "abc") == 1)
    // reversed ranks: (ab,c) can never fire before ab exists ->
    // sequential order leaves "ab c"? No: 1:(ab,c) finds no pair on
    // chars; 2:(a,b) merges -> 2 symbols
    assert(count(Seq(("ab", "c"), ("a", "b")), "abc") == 2)
  }

  test("a re-formed lower-rank pair stays unmerged (sequential-pass contract)") {
    // 1:(b,c)->bc, 2:(a,bc)->abc. "abcbc": chars a b c b c
    // rank1 pass: "a bc bc"; rank2 pass: "abc bc" -> 2
    assert(count(Seq(("b", "c"), ("a", "bc")), "abcbc") == 2)
    assert(ref(Seq(("b", "c"), ("a", "bc")), "abcbc") == 2)
  }

  test("duplicate merge entries re-fire for pairs re-formed between the two ranks") {
    // 1:(a,a), 2:(aa,a) -> aaa, 3:(a,a) again: "aaaaa" ->
    // r1: "aa aa a"; r2: no (aa,a) adjacency? "aa aa a": pairs
    // (aa,aa),(aa,a) -> r2 merges (aa,a)? The SECOND aa pairs with a.
    // sequential replace decides — just assert kernel == reference.
    val m = Seq(("a", "a"), ("aa", "a"), ("a", "a"))
    for (len <- 1 to 9) {
      val t = "a" * len
      assert(count(m, t) == ref(m, t), s"len=$len")
    }
  }

  test("property: kernel equals the sequential fold on adversarial random inputs") {
    val rnd = new scala.util.Random(42)
    val alphabet = "ab c".replace(" ", "") // dense 3-letter alphabet
    def randToken(maxLen: Int): String =
      (0 until (1 + rnd.nextInt(maxLen))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    for (trial <- 0 until 300) {
      // random merge list: pairs over single chars and concatenations
      // of earlier-learnable symbols (some unreachable, some dups)
      var syms = alphabet.map(_.toString).toVector
      val merges = (0 until (1 + rnd.nextInt(10))).map { _ =>
        val a = syms(rnd.nextInt(syms.length))
        val b = syms(rnd.nextInt(syms.length))
        syms = (syms :+ (a + b)).distinct
        (a, b)
      }
      for (_ <- 0 until 10) {
        val t = randToken(12)
        assert(count(merges, t) == ref(merges, t),
          s"trial=$trial merges=$merges token=$t")
      }
    }
  }

  test("countDoc: whitespace split (empties dropped) summed over tokens; empty and multi-space docs") {
    val k = new BpeKernel(Seq(("a", "b")))
    assert(k.countDoc("") == 0)
    assert(k.countDoc("   ") == 0)
    assert(k.countDoc("ab") == 1)
    assert(k.countDoc("ab  ab   c") == 3) // ab(1) + ab(1) + c(1)
    assert(k.countDoc(" abc ab ") == 3) // a+b merged,c (2) + ab (1)
  }

  test("q61 kernel plan equals the literal-replace fold on real corpus docs, and stays shuffle-free") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val merges = graft.queries.TextQ.bpeMerges(spark, sfDir).toSeq
    assert(merges.nonEmpty)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").limit(200)
    val kernel = docs.select($"doc_id",
      graft.functions.BpeTokenCount.bpeTokenCount($"text", merges).as("n"))
    // the pre-kernel q61 formula, verbatim
    def symCountOf(w: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val applied = merges.foldLeft(regexp_replace(w, "(.)", " $1 ")) {
        case (c, (a, b)) =>
          call_function("replace", c, lit(" " + a + "  " + b + " "), lit(" " + a + b + " "))
      }
      ((length(applied) - length(call_function("replace", applied, lit(" "), lit("")))) / 2)
        .cast("int")
    }
    val fold = docs.select($"doc_id",
      aggregate(graft.functions.TextFunctions.tokens($"text"), lit(0),
        (acc, x) => acc + symCountOf(x)).as("n"))
    val got = kernel.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = fold.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == want)
    // zero exchanges in the kernel apply scan
    val plan = kernel.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"apply scan must be shuffle-free:\n$plan")
  }
}
