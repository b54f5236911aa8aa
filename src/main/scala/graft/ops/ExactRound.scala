package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic cross-engine rounding of EXACT RATIONALS.
  *
  * The hazard this closes (round-11 judge root cause of the q169
  * driver-only hash flip): `round(S / n, 6)` where S and n are exact
  * BIGINTs first performs an IEEE division — whose result can land
  * exactly on a .5 tie of the 6-decimal grid when the true rational
  * does — and then rounds that tie. Spark's `Round` goes through
  * `BigDecimal.valueOf(double)` (shortest-decimal), while a precise
  * decimal `round` (newer DuckDB) rounds the double's exact binary
  * expansion: the two disagree on exactly those ties (5 of 10 tie docs
  * at sf0.01 flipped, reordering the q169 tercile).
  *
  * The fix is to finish the job in INTEGER arithmetic: round half-up
  * BEFORE any floating division —
  *
  *   round(num/den to the integer grid) = (2·num + den) DIV (2·den)
  *
  * for num ≥ 0, den > 0 (integral DIV truncates toward zero, which for
  * non-negative operands equals floor, i.e. half-up). The single
  * remaining floating op is a division of an exact integer ≤ 2⁵³ by a
  * power of ten — one correctly-rounded IEEE operation, identical on
  * every engine.
  *
  * Every helper has a Spark (`Column`) and a DuckDB (`String`) twin so
  * oracle SQL replays bit-for-bit. DuckDB `sum(BIGINT)` widens to
  * HUGEINT and `//` floors — same value for non-negative operands; the
  * twins cast back to BIGINT.
  */
object ExactRound {

  /** Half-up rounded integer quotient of `num / den` (num ≥ 0, den > 0,
    * both BIGINT expressions by NAME — post-agg aliases work). Staged
    * through DECIMAL(38,0) like [[gridMicro]]: `2·num + den` can exceed
    * int64 when num is a PRODUCT of counts (kmvIntersection's
    * `n_both · eu4`), and non-ANSI Spark would wrap silently where
    * DuckDB's HUGEINT arithmetic stays exact — the staging keeps both
    * twins exact up to 10^38. The rounded QUOTIENT must still fit
    * BIGINT (callers' quotients are grid values ≪ 2^63). */
  def halfUpDiv(num: String, den: String): Column =
    expr(s"(CASE WHEN ($den) = 0 THEN CAST(NULL AS BIGINT) " +
      s"ELSE CAST((2 * CAST($num AS DECIMAL(38,0)) + CAST($den AS DECIMAL(38,0))) " +
      s"DIV (2 * CAST($den AS DECIMAL(38,0))) AS BIGINT) END)")

  /** DuckDB twin of [[halfUpDiv]] (explicit HUGEINT staging, mirroring
    * the Spark twin's DECIMAL(38,0); `//` floors, cast narrows back). */
  def halfUpDivSql(num: String, den: String): String =
    s"(CASE WHEN ($den) = 0 THEN CAST(NULL AS BIGINT) " +
      s"ELSE CAST((2 * CAST($num AS HUGEINT) + CAST($den AS HUGEINT)) " +
      s"// (2 * CAST($den AS HUGEINT)) AS BIGINT) END)"

  /** `round(num/den, k)` as a deterministic double: half-up in integer
    * space at the 10^k grid, then ONE exact-integer-by-power-of-ten IEEE
    * division. Stages through DECIMAL(38,0) so `2·num·10^k` cannot
    * overflow int64 (the q222-class guard: num can be a corpus-sized
    * token sum). Requires num ≥ 0, den > 0. */
  def ratioRounded(num: String, den: String, k: Int): Column =
    expr(s"CAST(${gridSpark(num, den, k)} AS DOUBLE) / ${pow10(k)}.0")

  /** DuckDB twin of [[ratioRounded]] — HUGEINT staging. */
  def ratioRoundedSql(num: String, den: String, k: Int): String =
    s"(${gridSql(num, den, k)}::DOUBLE / ${pow10(k)}.0)"

  /** [[ratioRounded]] for a numerator of EITHER sign (den > 0 still):
    * HALF_UP rounds ties away from zero, so the negative branch mirrors
    * the positive one — `-halfUp(-num/den)`. (Plain DIV truncation and
    * DuckDB's floor `//` DISAGREE on negatives; the mirror sidesteps
    * both.) */
  def ratioRoundedSigned(num: String, den: String, k: Int): Column =
    expr(s"CAST(CASE WHEN ($num) >= 0 THEN ${gridSpark(num, den, k)} " +
      s"ELSE -${gridSpark(s"-($num)", den, k)} END AS DOUBLE) " +
      s"/ ${pow10(k)}.0")

  /** DuckDB twin of [[ratioRoundedSigned]]. */
  def ratioRoundedSignedSql(num: String, den: String, k: Int): String =
    s"((CASE WHEN ($num) >= 0 THEN ${gridSql(num, den, k)} " +
      s"ELSE -${gridSql(s"-($num)", den, k)} END)::DOUBLE / ${pow10(k)}.0)"

  /** The half-up 10^k-grid integer `halfUp(num·10^k / den)` (num ≥ 0) as
    * a BIGINT column — use when downstream arithmetic (means, sums,
    * tercile sorts) should stay in integer space. */
  def gridMicro(num: String, den: String, k: Int): Column =
    expr(gridSpark(num, den, k))

  /** DuckDB twin of [[gridMicro]]. */
  def gridMicroSql(num: String, den: String, k: Int): String =
    gridSql(num, den, k)

  /** Column-native [[gridMicro]] (for call sites built from `Column`s,
    * not name strings) — `div` is Spark's registered IntegralDivide.
    *
    * Bound contract (shared by every grid builder here): the DECIMAL(38,0)
    * staging keeps the INTERMEDIATE `2·num·10^k + den` exact, but the
    * final grid value `halfUp(num·10^k / den)` must itself fit int64 —
    * i.e. `num/den ≤ ~9.2e18 / 10^k`. Past that bound the engines
    * DIVERGE IN FAILURE MODE, not in value: non-ANSI Spark's
    * `cast(decimal as long)` returns NULL silently while DuckDB's
    * `CAST(... AS BIGINT)` raises. All call sites are ratios (≤ 1),
    * shares, or per-row means whose quotients sit ~12 orders of
    * magnitude under the k=6 bound; a new caller with an unbounded
    * ratio (e.g. an estimator with a vanishing denominator) must clamp
    * the ratio first. */
  def gridMicroCol(num: Column, den: Column, k: Int): Column = {
    require(k >= 0 && k <= 15, s"grid 10^$k outside exact-double range")
    val d38 = "decimal(38,0)"
    when(den === 0, lit(null).cast("long")).otherwise(
      call_function("div",
        num.cast(d38) * lit(2L) * lit(pow10(k)) + den.cast(d38),
        den.cast(d38) * lit(2L)).cast("long"))
  }

  /** Column-native [[ratioRounded]]. */
  def ratioRoundedCol(num: Column, den: Column, k: Int): Column =
    gridMicroCol(num, den, k).cast("double") / lit(pow10(k)).cast("double")

  /** JVM scalar twin of [[halfUpDivCol]] for the per-row streaming
    * scorers (requires num ≥ 0, den > 0 and 2·num inside int64 — the
    * micro-nat sum contract; the Column/SQL twins stage through
    * DECIMAL(38,0)/HUGEINT for corpus-sized numerators instead). */
  def halfUpDivJvm(num: Long, den: Long): Long = {
    require(num >= 0L && den > 0L,
      s"halfUpDivJvm requires num >= 0 and den > 0, got $num / $den")
    (2L * num + den) / (2L * den)
  }

  /** Column-native [[halfUpDiv]] — DECIMAL(38,0)-staged like the string
    * twin (the kmvIntersection guard: num is a product of counts). */
  def halfUpDivCol(num: Column, den: Column): Column = {
    val d38 = "decimal(38,0)"
    when(den === 0, lit(null).cast("long")).otherwise(
      call_function("div", num.cast(d38) * lit(2L) + den.cast(d38),
        den.cast(d38) * lit(2L)).cast("long"))
  }

  // Every builder NULL-guards den = 0 (ANSI integral divide errors on
  // zero, where the old double division produced NaN/Inf — callers that
  // want a sentinel coalesce it themselves).
  private def gridSpark(num: String, den: String, k: Int): String = {
    require(k >= 0 && k <= 15, s"grid 10^$k outside exact-double range")
    s"(CASE WHEN ($den) = 0 THEN CAST(NULL AS BIGINT) ELSE " +
      s"CAST((2 * CAST($num AS DECIMAL(38,0)) * ${pow10(k)}L " +
      s"+ CAST($den AS DECIMAL(38,0))) " +
      s"DIV (2 * CAST($den AS DECIMAL(38,0))) AS BIGINT) END)"
  }

  private def gridSql(num: String, den: String, k: Int): String = {
    require(k >= 0 && k <= 15, s"grid 10^$k outside exact-double range")
    s"(CASE WHEN ($den) = 0 THEN CAST(NULL AS BIGINT) ELSE " +
      s"CAST((2 * CAST($num AS HUGEINT) * ${pow10(k)} " +
      s"+ CAST($den AS HUGEINT)) " +
      s"// (2 * CAST($den AS HUGEINT)) AS BIGINT) END)"
  }

  private def pow10(k: Int): Long = (0 until k).foldLeft(1L)((a, _) => a * 10)
}
