package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing primitives.
  *
  * Sketch operators (MinHash/SimHash) need a seeded hash family that an
  * external oracle can reproduce exactly. Spark's `hash()` (Murmur3) has no
  * SQL-standard twin, so we derive 60-bit integers from MD5 hex prefixes:
  * `md5` is identical everywhere, and 15 hex digits stay inside a signed
  * int64. DuckDB twin: `('0x' || substr(md5(x || '#' || seed), 1, 15))::BIGINT`.
  *
  * All of this is codegen-friendly built-in expression composition — no UDFs,
  * so whole-stage codegen keeps the hot path fused at scale.
  */
object PortableHash {

  /** Seeded 60-bit hash of a string column. */
  def md5Long(c: Column, seed: Int): Column =
    conv(substring(md5(concat(c, lit("#" + seed))), 1, 15), 16, 10).cast("long")

  /** Polynomial rolling hash over characters: fold of
    * `acc = (acc * 31 + ord(char)) mod 1e9+7`. Character-order sensitive —
    * the document-fingerprinting primitive (distinct from bag-of-words
    * hashes). This composable formulation is kept as the executable spec
    * of the native [[RollingHash]] expression (OpsSpec pins equality); NOT
    * for pipelines — the per-character `substr` makes it O(L²) per row and
    * it materializes an L-long array. */
  def rollingHashComposable(c: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(c)), i => ascii(c.substr(i, lit(1))).cast("long")),
      lit(0L),
      (acc, ch) => pmod(acc * 31L + ch, lit(1000000007L)))

  /** DuckDB SQL twin of [[RollingHash]] (for oracle construction). */
  def rollingHashSql(col: String): String =
    s"""list_reduce(list_prepend(0::BIGINT,
       | list_transform(generate_series(1, length($col)), i -> ord(substr($col, i, 1))::BIGINT)),
       | (a, b) -> (a * 31 + b) % 1000000007)""".stripMargin

  /** DuckDB SQL twin of [[md5Long]]. */
  def md5LongSql(col: String, seed: Int): String =
    s"('0x' || substr(md5($col || '#$seed'), 1, 15))::BIGINT"

  /** Derived hash family for MinHash: ONE md5 per value, then k affine
    * transforms `(a_j * h + b_j) mod P` in a 30-bit space — md5 is the
    * expensive step, so k hash functions cost 1 digest + k multiplies
    * instead of k digests. P prime < 2^30 keeps every product < 2^60
    * (overflow-safe in strict-int64 engines). */
  val MinhashP: Long = 1073741789L

  def baseHash(c: Column): Column = pmod(md5Long(c, 0), lit(MinhashP))

  def derivedA(j: Int): Long = (((j + 1) * 0x9E3779B1L) % MinhashP + MinhashP) % MinhashP | 1L
  def derivedB(j: Int): Long = (((j + 1) * 0x85EBCA6BL) % MinhashP + MinhashP) % MinhashP

  def derivedHash(h: Column, j: Int): Column =
    pmod(h * derivedA(j) + derivedB(j), lit(MinhashP))

  def baseHashSql(col: String): String =
    s"(${md5LongSql(col, 0)}) % $MinhashP"

  def derivedHashSql(h: String, j: Int): String =
    s"(($h) * ${derivedA(j)} + ${derivedB(j)}) % $MinhashP"

  /** JVM-side twins of the Column forms above, for native expressions'
    * eval/codegen paths. ONE copy of the md5-prefix machinery: the
    * cross-engine bit-equality of every sketch rests on these exact bytes,
    * so the sketch expressions ([[MinHashSketch]], [[MinHashSignature]],
    * [[SimHash64]]) must all call here rather than keep private copies. */
  object Jvm {
    import org.apache.spark.unsafe.types.UTF8String

    private val digests: ThreadLocal[java.security.MessageDigest] =
      ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
    private val Suffix = "#0".getBytes("UTF-8")

    /** Same value as `md5Long(c, 0)`: first 15 hex chars of md5(s + "#0")
      * as int64 (7 bytes + high nibble, big-endian like the hex string). */
    def md5Long60(s: UTF8String): Long = {
      val digest = digests.get()
      digest.reset()
      digest.update(s.getBytes)
      digest.update(Suffix)
      val d = digest.digest()
      var h = 0L
      var i = 0
      while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      (h << 4) | ((d(7) & 0xf0L) >> 4)
    }

    /** Same value as [[PortableHash.baseHash]]. */
    def baseHash(s: UTF8String): Long = md5Long60(s) % MinhashP

    /** Same value as `md5Long(c, seed)` for a JVM string — the seeded
      * general-purpose variant (the UTF8String overload above is the
      * seed-0 sketch fast path). Used where driver/executor JVM code must
      * reproduce the Column-side hash order exactly (e.g. streaming
      * admission replaying [[graft.ops.Sampling.budgetPerGroup]]'s order). */
    def md5Long60(s: String, seed: Int): Long = {
      val digest = digests.get()
      digest.reset()
      val d = digest.digest((s + "#" + seed).getBytes("UTF-8"))
      var h = 0L
      var i = 0
      while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      (h << 4) | ((d(7) & 0xf0L) >> 4)
    }
  }
}
