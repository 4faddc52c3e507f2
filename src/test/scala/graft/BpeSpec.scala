package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins llm_bpe_train's trainer semantics: the left-to-right
  * non-overlapping merge fold and merge-order determinism under ties. */
class BpeSpec extends SparkSpec {

  private def fold(word: String, pa: String, pb: String): String = {
    val tail = "regexp_extract(acc, '([^ ]+)$', 1)"
    spark.sql(
      s"SELECT aggregate(slice(syms, 2, size(syms) - 1), element_at(syms, 1), " +
        s"(acc, x) -> CASE WHEN $tail = '$pa' AND x = '$pb' " +
        s"THEN concat(substring(acc, 1, length(acc) - length($tail)), " +
        s"'$pa', '$pb') ELSE concat(acc, ' ', x) END) AS ws " +
        s"FROM (SELECT split('$word', ' ') AS syms)").head().getString(0)
  }

  test("merge fold is left-to-right non-overlapping (the real BPE rule)") {
    assert(fold("a a a", "a", "a") == "aa a")
    assert(fold("a a a a", "a", "a") == "aa aa")
    assert(fold("l o w o w", "o", "w") == "l ow ow")
    assert(fold("x", "a", "b") == "x")
    assert(fold("a b", "a", "b") == "ab")
  }

  test("merged token does not cascade within the same round") {
    // merge (a,b): 'a b b' → [ab, b] — the fused 'ab' must not re-merge
    // with the following b in the SAME round (that would be pair (ab,b),
    // a different symbol pair belonging to a later round).
    assert(fold("a b b", "a", "b") == "ab b")
  }

  test("pair election breaks count ties on pair text (merge-order determinism)") {
    import spark.implicits._
    val counts = Seq(("en", "x y", 7L), ("en", "a b", 7L), ("en", "c d", 3L))
      .toDF("lang", "pair", "n")
    val w = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("pair"))
    val elected = counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select(col("pair")).head().getString(0)
    assert(elected == "a b", "equal counts must elect the lexicographically first pair")
  }
}
