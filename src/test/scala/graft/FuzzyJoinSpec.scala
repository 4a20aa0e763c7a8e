package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.FuzzyJoin

/** Edit-distance join: exact parity with the brute-force definition on a
  * corpus that exercises substitutions, insertions, deletions, repeated
  * characters, empty and near-empty strings; plan stays equi-join shaped.
  */
class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Deterministic corpus: seed words plus single/double edits of them,
    * short strings (below the gram-path floor), and repeated-gram strings.
    */
  private lazy val corpus: Seq[(Long, String)] = {
    val seeds = Seq("distributed", "levenshtein", "spark-engine",
      "aaaaaaaaaa", "mississippi", "deduplicate")
    val edited = seeds.zipWithIndex.flatMap { case (w, i) =>
      Seq(
        w.updated(i % w.length, 'x'),              // substitution
        w.substring(0, i % w.length) + w.substring((i % w.length) + 1), // deletion
        w.substring(0, i % w.length) + "q" + w.substring(i % w.length)) // insertion
    }
    val shorts = Seq("ab", "ac", "b", "", "abcd", "abce", "xyz")
    (seeds ++ edited ++ shorts).zipWithIndex.map { case (w, i) => (i.toLong, w) }
  }

  private def brute(d: Int): Set[(Long, Long, Int)] = {
    def lev(a: String, b: String): Int = {
      val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      m(a.length)(b.length)
    }
    (for {
      (ia, sa) <- corpus; (ib, sb) <- corpus
      if ia < ib && lev(sa, sb) <= d
    } yield (ia, ib, lev(sa, sb))).toSet
  }

  private def got(d: Int): Set[(Long, Long, Int)] =
    FuzzyJoin.editDistancePairs(corpus.toDF("id", "s"), "id", "s", d)
      .select("id_a", "id_b", "dist")
      .as[(Long, Long, Int)].collect().toSet

  test("exact parity with brute force at d=1") {
    val want = brute(1)
    assert(want.nonEmpty)
    assert(got(1) == want)
  }

  test("exact parity with brute force at d=2") {
    val want = brute(2)
    assert(want.nonEmpty)
    assert(got(2) == want)
  }

  test("exact parity with brute force at d=3 (deep deletion neighborhood)") {
    assert(got(3) == brute(3))
  }

  test("all-identical strings produce the full clique with dist 0") {
    val dup = (0L until 6L).map(i => (i, "samestring")).toDF("id", "s")
    val pairs = FuzzyJoin.editDistancePairs(dup, "id", "s", 1)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    assert(pairs == (for (a <- 0L until 6L; b <- a + 1 until 6L)
      yield (a, b, 0)).toSet)
  }

  test("del1_sigs kernel == deletion-transform dag sig set (incl. unicode)") {
    // the pre-r11 d=1 variant dag, verbatim; the kernel must produce the
    // same DISTINCT sig set per id (duplicates collapse either way)
    val rows = (corpus ++ Seq((100L, "Héllo"), (101L, "日本語"),
      (102L, "a" + new String(Character.toChars(0x1F4A9)) + "b")))
      .toDF("id", "s")
    val dag = rows.select(col("id"), col("s").as("variant"))
      .unionByName(rows.select(col("id"),
        explode(expr(
          "transform(sequence(1, length(s)), p -> " +
            "concat(substring(s, 1, p - 1), substring(s, p + 1, length(s))))"))
          .as("variant")))
      .select(col("id"), xxhash64(col("variant")).as("sig")).distinct()
    val ker = rows.select(col("id"),
        explode(graft.functions.gfn.del1_sigs(col("s"))).as("sig")).distinct()
    assert(ker.exceptAll(dag).isEmpty && dag.exceptAll(ker).isEmpty,
      "del1_sigs diverged from the deletion-transform dag")
  }

  test("plan is equi-join shaped: no cartesian or nested-loop join") {
    val plan = FuzzyJoin.editDistancePairs(corpus.toDF("id", "s"), "id", "s", 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
